"""LTX-2 family handler (19B / 22B dev + distilled, joint audio+video).

Reference: /root/reference/models/ltx2/ltx2_handler.py (_ARCH_SPECS:66,
model-type table), configs/ltx2_19b_config.json / ltx2_22b_config.json.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.ltx2.dit import LTX2Config, init_ltx2_dit
from ..models.ltx2.pipeline import (LTX2Pipeline, LTX2SamplingConfig,
                                    DISTILLED_SIGMA_VALUES)

# transformer.* of configs/ltx2_{19b,22b}_config.json
_ARCH: Dict[str, Dict[str, Any]] = {
    "ltx2_19B": dict(num_layers=48, num_heads=32, head_dim=128,
                     audio_num_heads=32, audio_head_dim=64),
    "ltx2_22B": dict(num_layers=48, num_heads=32, head_dim=128,
                     audio_num_heads=32, audio_head_dim=64,
                     gated_attention=True, cross_attention_adaln=True),
}
_TYPES = {
    "ltx2_19B": ("ltx2_19B", False),
    "ltx2_distilled": ("ltx2_19B", True),
    "ltx2_22B": ("ltx2_22B", False),
    "ltx2_22B_distilled": ("ltx2_22B", True),
}


class LTX2FamilyHandler:
    family = "ltx2"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES.keys())

    @staticmethod
    def query_family_infos():
        return {"ltx2": (9, "LTX-2")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        arch, distilled = _TYPES[base_model_type]
        return {"image_outputs": False, "group": "ltx2",
                "vae_stride": (8, 32, 32), "audio_outputs": True,
                "distilled": distilled,
                "fps": 24}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        _, distilled = _TYPES[base_model_type]
        return {"prompt": "", "resolution": "768x512",
                "video_length": 121,
                "num_inference_steps": 8 if distilled else 40,
                "guidance_scale": 1.0 if distilled else 4.0,
                "audio_guidance_scale": 1.0 if distilled else 7.0,
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        return [{"role": "transformer", "urls": model_def.get("URLs", [])}]

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> LTX2Pipeline:
        arch_name, distilled = _TYPES[base_model_type]
        cfg = LTX2Config(compute_dtype=dtype, **_ARCH[arch_name])
        if init_random:
            params = init_ltx2_dit(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_state_dict
            from ..io.ltx2_checkpoint import load_ltx2_params
            sd = load_state_dict(checkpoints["transformer"])
            params, leftover = load_ltx2_params(sd, cfg, dtype)
            core = [k for k in leftover if "transformer_blocks" in k]
            if core:
                raise ValueError(f"unmapped transformer keys: {core[:8]}")
        vae_decode = cls._load_video_vae(arch_name, checkpoints)
        audio_decode, vocoder = cls._load_audio_vae(checkpoints)
        sampling = LTX2SamplingConfig(
            sigmas=DISTILLED_SIGMA_VALUES if distilled else
            tuple(__import__("numpy").linspace(1.0, 0.0, 41).tolist()),
            guide_scale=1.0 if distilled else 4.0,
            audio_guide_scale=1.0 if distilled else 7.0)
        return LTX2Pipeline(params, cfg, text_fn=None,
                            vae_decode=vae_decode,
                            audio_vae_decode=audio_decode, vocoder=vocoder,
                            sampling=sampling, attn_backend=attn_backend)

    @staticmethod
    def _load_video_vae(arch_name, checkpoints):
        if not checkpoints or "video_vae" not in checkpoints:
            return None
        from ..io.safetensors_reader import load_state_dict
        from ..models.ltx2.vae import (LTX2_19B_VAE, LTX2_22B_VAE,
                                       load_ltx2_vae_params,
                                       ltx2_vae_decode)
        vcfg = LTX2_19B_VAE if arch_name == "ltx2_19B" else LTX2_22B_VAE
        sd = load_state_dict(checkpoints["video_vae"])
        vp = load_ltx2_vae_params(sd, vcfg)

        def decode(z):
            return ltx2_vae_decode(vp, vcfg, z)
        return decode

    @staticmethod
    def _load_audio_vae(checkpoints):
        if not checkpoints or "audio_vae" not in checkpoints:
            return None, None
        from ..io.safetensors_reader import load_state_dict
        from ..models.ltx2.audio_vae import (
            LTX2AudioVAEConfig, LTX2VocoderConfig, ltx2_audio_decode,
            ltx2_vocoder, load_ltx2_audio_vae_params,
            load_ltx2_vocoder_params)
        acfg = LTX2AudioVAEConfig()
        ap = load_ltx2_audio_vae_params(
            load_state_dict(checkpoints["audio_vae"]), acfg)

        def decode(z):
            return ltx2_audio_decode(ap, acfg, z)

        voc = None
        if "vocoder" in checkpoints:
            vcfg = LTX2VocoderConfig()
            vparams = load_ltx2_vocoder_params(
                load_state_dict(checkpoints["vocoder"]), vcfg)

            def voc(mel):
                return ltx2_vocoder(vparams, vcfg, mel)
        return decode, voc
