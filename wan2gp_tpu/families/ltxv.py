"""LTX-Video family handler (0.9.x 2B / 13B)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.ltxv.dit import LTXVConfig, init_ltxv
from ..models.ltxv.pipeline import LTXVPipeline

_ARCH: Dict[str, Dict[str, Any]] = {
    # LTXV 0.9.x (reference models/ltx_video/configs/*.yaml checkpoints)
    "ltxv_2B": dict(inner_dim=2048, num_heads=32, num_layers=28),
    "ltxv_13B": dict(inner_dim=4096, num_heads=32, num_layers=48),
    "ltxv_distilled": dict(inner_dim=4096, num_heads=32, num_layers=48,
                           distilled=True),
}


class LTXVFamilyHandler:
    family = "ltxv"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_ARCH.keys())

    @staticmethod
    def query_family_infos():
        return {"ltxv": (10, "LTX Video")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": False, "group": "ltxv",
                "vae_stride": (8, 32, 32),
                "distilled": _ARCH[base_model_type].get("distilled", False)}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        distilled = _ARCH[base_model_type].get("distilled", False)
        return {"prompt": "", "resolution": "768x512", "video_length": 97,
                "num_inference_steps": 8 if distilled else 30,
                "guidance_scale": 1.0 if distilled else 3.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        return [{"role": "transformer", "urls": model_def.get("URLs", [])}]

    @classmethod
    def generate_video(cls, pipe, merged, width, height, frame_num, seed):
        """Service adapter: reference ltxv_handler defaults (STG skip-layer
        guidance scale, distilled sigma table when the model def says so).
        """
        import numpy as np
        import jax.numpy as jnp
        from ..models.ltxv.pipeline import LTXVSamplingConfig
        model_def = merged.get("_model_def") or {}
        stg_scale = float(merged.get("stg_scale", 0.0) or 0)
        n_layers = pipe.dit_cfg.num_layers
        sampling = LTXVSamplingConfig(
            steps=int(merged.get("num_inference_steps", 30)),
            guide_scale=float(merged.get("guidance_scale", 3.0)),
            stg_scale=stg_scale,
            stg_layers=(tuple(i for i in (19,) if i < n_layers)
                        if stg_scale else ()),
            distilled=bool(model_def.get("distilled")))
        kw = {}
        if merged.get("_caption") is not None:
            kw.update(caption=merged["_caption"],
                      caption_null=merged.get("_caption_null"))
        elif pipe.text_encode_fn is None:
            cap = jnp.zeros((1, 128, pipe.dit_cfg.caption_channels),
                            jnp.float32)
            kw.update(caption=cap, caption_null=cap)
        out = np.asarray(pipe.generate(
            prompt=merged.get("prompt", ""), width=width, height=height,
            frame_num=frame_num, seed=seed, sampling=sampling, **kw))
        if out.ndim == 5 and out.shape[-1] > 4:
            # undecoded latents [1, F, H, W, C] (no VAE attached):
            # -> [B, C, F, H, W] for the service's latent preview path
            out = out.transpose(0, 4, 1, 2, 3)
        return {"video": out,
                "fps": int(merged.get("fps", 30) or 30)}

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> LTXVPipeline:
        arch = {k: v for k, v in _ARCH[base_model_type].items()
                if k != "distilled"}
        cfg = LTXVConfig(compute_dtype=dtype, **arch)
        text_fn = None
        if init_random:
            params = init_ltxv(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.ltxv_checkpoint import load_ltxv_params
            params, left = load_ltxv_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed ltxv keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
        vae_fn = None
        if not init_random and checkpoints and checkpoints.get("vae"):
            vae_fn = cls._load_vae(checkpoints)
        return LTXVPipeline(params, cfg, vae_decode_fn=vae_fn,
                            text_encode_fn=text_fn,
                            attn_backend=attn_backend)

    @staticmethod
    def _load_vae(checkpoints, vae_config=None):
        """LTXV causal video autoencoder (models/ltxv/vae.py); block
        config via `vae_config` (checkpoint-metadata dict) when the
        layout differs from the 0.9.x default."""
        from ..io.safetensors_reader import load_weights
        from ..models.ltxv.vae import (LTXVVAEConfig, load_ltxv_vae_params,
                                       ltxv_vae_decode)
        cfg = LTXVVAEConfig(**(vae_config or {}))
        params, _ = load_ltxv_vae_params(load_weights(checkpoints["vae"]),
                                         cfg)

        def decode(z):
            import jax.numpy as jnp
            return jnp.clip(ltxv_vae_decode(params, cfg, z), -1.0, 1.0)
        return decode

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype):
        """T5-XXL v1.1 encoder (LTXV conditions on T5 states)."""
        from ..io.safetensors_reader import load_weights
        from ..io.wan_checkpoint import load_hf_t5_params
        from ..models.wan.t5 import T5Config, t5_encode
        from ..utils.tokenizer import load_tokenizer
        t5_cfg = T5Config(vocab_size=32128, dim=4096, dim_attn=4096,
                          dim_ffn=10240, num_heads=64, num_layers=24,
                          shared_pos=True, compute_dtype=dtype)
        t5_params, _ = load_hf_t5_params(
            load_weights(checkpoints["text_encoder"]), t5_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))

        def embed(prompts, seq_len=256):
            ids, mask = tok(prompts, seq_len)
            out = t5_encode(t5_params, t5_cfg, jnp.asarray(ids),
                            jnp.asarray(mask))
            return (out * (jnp.asarray(mask)[..., None] > 0)
                    ).astype(jnp.float32)

        def enc(prompt):
            # pipeline contract: (caption, caption_null)
            return embed([prompt]), embed([""])
        return enc
