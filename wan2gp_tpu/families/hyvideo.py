"""Hunyuan Video family handler."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.hyvideo.dit import (make_hunyuan_config, init_hunyuan,
                                  HUNYUAN_VIDEO_CONFIGS)
from ..models.hyvideo.pipeline import HunyuanPipeline


class HunyuanFamilyHandler:
    family = "hunyuan"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(HUNYUAN_VIDEO_CONFIGS.keys())

    @staticmethod
    def query_family_infos():
        return {"hunyuan": (20, "Hunyuan Video"),
                "hunyuan_1_5": (21, "Hunyuan Video 1.5")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        hv15 = "1_5" in base_model_type
        return {"image_outputs": False,
                "group": "hunyuan_1_5" if hv15 else "hunyuan",
                "vae_stride": (4, 16, 16) if hv15 else (4, 8, 8),
                "i2v_class": "i2v" in base_model_type}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        hv15 = "1_5" in base_model_type
        return {"prompt": "", "resolution": "832x480",
                "video_length": 97, "num_inference_steps": 30,
                "guidance_scale": 6.0 if hv15 else 1.0,
                "embedded_guidance_scale": 0.0 if hv15 else 6.0,
                "flow_shift": 5.0 if hv15 else 7.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/HunyuanVideo/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "vae", "urls": [base + "hunyuan_video_VAE_fp32.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> HunyuanPipeline:
        cfg = make_hunyuan_config(base_model_type, compute_dtype=dtype)
        vae_fn = None
        if init_random:
            params = init_hunyuan(jax.random.key(seed), cfg, dtype)
        else:
            raise NotImplementedError(
                "hunyuan DiT checkpoint key-mapping lands with its loader")
        if not init_random and checkpoints and checkpoints.get("vae") \
                and "1_5" not in base_model_type:
            vae_fn = cls._load_vae(checkpoints)
        vae_stride = (4, 16, 16) if "1_5" in base_model_type else (4, 8, 8)
        return HunyuanPipeline(params, cfg, vae_stride=vae_stride,
                               vae_decode_fn=vae_fn,
                               attn_backend=attn_backend)

    @staticmethod
    def _load_vae(checkpoints):
        """Hunyuan 884-16c causal VAE (models/hyvideo/vae.py)."""
        from ..io.safetensors_reader import load_weights
        from ..io.hyvideo_checkpoint import load_hunyuan_vae_params
        from ..models.hyvideo.vae import (HunyuanVAEConfig,
                                          hunyuan_vae_decode)
        cfg = HunyuanVAEConfig()
        params, _ = load_hunyuan_vae_params(
            load_weights(checkpoints["vae"]), cfg)

        def decode(z):
            return jnp.clip(hunyuan_vae_decode(params, cfg, z), -1.0, 1.0)
        return decode
