"""Kandinsky 5 family handler (k5_lite_t2v/i2v, k5_pro_t2v/i2v).

Mirrors /root/reference/models/kandinsky5/kandinsky_handler.py; arch dims
from configs/k5_lite_t2v_5s_sft_sd.yaml and k5_pro_t2v_5s_sft_hd.yaml.
Text conditioning = Qwen2.5-VL-7B states (max 256) + CLIP-L pooled; VAE =
Hunyuan-Video causal 3D VAE (yaml vae.name 'hunyuan').
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.kandinsky5.dit import Kandinsky5Config, init_kandinsky5
from ..models.kandinsky5.pipeline import (Kandinsky5Pipeline,
                                          Kandinsky5SamplingConfig)

_ARCH: Dict[str, Dict[str, Any]] = {
    "k5_lite_t2v": dict(model_dim=1792, ff_dim=7168, time_dim=512,
                        num_visual_blocks=32, visual_cond=True),
    "k5_lite_i2v": dict(model_dim=1792, ff_dim=7168, time_dim=512,
                        num_visual_blocks=32, visual_cond=True),
    "k5_pro_t2v": dict(model_dim=4096, ff_dim=16384, time_dim=1024,
                       num_visual_blocks=60, visual_cond=True),
    "k5_pro_i2v": dict(model_dim=4096, ff_dim=16384, time_dim=1024,
                       num_visual_blocks=60, visual_cond=True),
}


class Kandinsky5FamilyHandler:
    family = "kandinsky5"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_ARCH.keys())

    @staticmethod
    def query_family_infos():
        return {"kandinsky5": (700, "Kandinsky 5")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": False, "group": "kandinsky5",
                "i2v": base_model_type.endswith("i2v")}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "768x512", "video_length": 121,
                "num_inference_steps": 50, "guidance_scale": 5.0,
                "flow_shift": 10.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/Kandinsky5/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "text_encoder", "urls": [
                    base + "Qwen2.5-VL-7B_text_bf16.safetensors"]},
                {"role": "clip", "urls": [
                    base + "clip_vit_large_patch14.safetensors"]},
                {"role": "vae", "urls": [base + "hunyuan_vae.safetensors"]}]

    @classmethod
    def dit_config(cls, base_model_type, dtype=jnp.bfloat16):
        return Kandinsky5Config(**_ARCH[base_model_type],
                                compute_dtype=dtype)

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = cls.dit_config(base_model_type, dtype)
        text_fn = None
        if init_random:
            params = init_kandinsky5(jax.random.key(seed), cfg, dtype)
            text_fn = cls._random_text_encoder(cfg, seed)
        else:
            from ..io.safetensors_reader import load_weights as load_safetensors
            from ..io.kandinsky_checkpoint import load_kandinsky5_params
            params, left = load_kandinsky5_params(
                load_safetensors(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed kandinsky keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
        vae_fn = None
        if not init_random and checkpoints and checkpoints.get("vae"):
            vae_fn = cls._load_vae(checkpoints)
        return Kandinsky5Pipeline(params, cfg, vae_decode_fn=vae_fn,
                                  text_encode_fn=text_fn,
                                  attn_backend=attn_backend)

    @staticmethod
    def _load_vae(checkpoints):
        """Kandinsky 5 reuses the Hunyuan 884-16c causal VAE; its latents
        are channels-last [B, T, H, W, C]."""
        from ..io.safetensors_reader import load_weights
        from ..io.hyvideo_checkpoint import load_hunyuan_vae_params
        from ..models.hyvideo.vae import (HunyuanVAEConfig,
                                          hunyuan_vae_decode)
        cfg = HunyuanVAEConfig()
        params, _ = load_hunyuan_vae_params(
            load_weights(checkpoints["vae"]), cfg)

        def decode(z_tlast):
            z = z_tlast.transpose(0, 4, 1, 2, 3)   # -> [B, C, T, H, W]
            return jnp.clip(hunyuan_vae_decode(params, cfg, z), -1.0, 1.0)
        return decode

    @classmethod
    def _load_text_encoder(cls, checkpoints, tokenizer, dtype):
        """Qwen2.5-VL (last hidden state, chat template) + CLIP-L pooled
        (text_embedders.py:29-37,126-160)."""
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, make_qwen_text_encode_fn,
            QWEN25_VL_7B_TEXT)
        from ..utils.tokenizer import load_tokenizer
        lm_cfg = QwenLMConfig(**QWEN25_VL_7B_TEXT, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_safetensors(checkpoints["text_encoder"]), lm_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))
        qwen_enc = make_qwen_text_encode_fn(lm_params, lm_cfg, tok,
                                            max_len=256)
        clip_fn = None
        if checkpoints.get("clip"):
            from ..io.flux_checkpoint import load_clip_text_params
            from ..models.flux.clip import ClipTextConfig, clip_text_encode
            ccfg = ClipTextConfig()
            cparams, _ = load_clip_text_params(
                load_safetensors(checkpoints["clip"]), ccfg)
            ctok = load_tokenizer(checkpoints.get("tokenizer_clip"))

            def clip_fn(prompts):
                ids, _ = ctok(prompts, ccfg.max_len)
                _, pooled = clip_text_encode(cparams, ccfg,
                                             jnp.asarray(ids))
                return pooled.astype(jnp.float32)

        def enc(prompts):
            states, _ = qwen_enc(prompts)
            pooled = (clip_fn(prompts) if clip_fn is not None
                      else jnp.zeros((len(prompts), 768), jnp.float32))
            return states, pooled
        return enc

    @staticmethod
    def generate_video(pipe, merged, width, height, frame_num, seed):
        sampling = Kandinsky5SamplingConfig(
            steps=int(merged.get("num_inference_steps", 50)),
            guidance=float(merged.get("guidance_scale", 5.0)),
            scheduler_scale=float(merged.get("flow_shift", 10.0)))
        out = pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            width=width, height=height, frame_num=frame_num,
            sampling=sampling, seed=seed,
            context=merged.get("_context"),
            context_pooled=merged.get("_context_pooled"),
            first_frame=merged.get("_first_frame"))
        if pipe.vae_decode_fn is None:
            # no VAE wired yet: preview-quality RGB projection of latents
            import numpy as np
            from ..postprocessing.latent_preview import latent_to_rgb
            z = np.asarray(out)[0].transpose(3, 0, 1, 2)   # [C, T, H, W]
            rgb = latent_to_rgb(z).astype(np.float32) / 127.5 - 1.0
            return jnp.asarray(rgb)                        # [T, H, W, 3]
        return out

    @classmethod
    def _random_text_encoder(cls, cfg, seed):
        def enc(prompts, _seed=seed):
            keys = [jax.random.key(hash((p, _seed)) & 0x7FFFFFFF)
                    for p in prompts]
            states = jnp.stack([jax.random.normal(
                k, (64, cfg.in_text_dim), jnp.float32) for k in keys])
            pooled = jnp.stack([jax.random.normal(
                jax.random.key(hash((p, _seed, 1)) & 0x7FFFFFFF),
                (cfg.in_text_dim2,), jnp.float32) for p in prompts])
            return states, pooled
        return enc
