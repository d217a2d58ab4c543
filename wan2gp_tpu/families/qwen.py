"""Qwen-Image family handler."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.qwen.dit import QwenImageConfig, init_qwen_image
from ..models.qwen.pipeline import QwenImagePipeline

_TYPES = ["qwen_image_20B", "qwen_image_edit_20B"]


class QwenImageFamilyHandler:
    family = "qwen"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"qwen": (30, "Qwen Image")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": True, "group": "qwen"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "1024x1024",
                "num_inference_steps": 25, "guidance_scale": 4.0,
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        return [{"role": "transformer", "urls": model_def.get("URLs", [])}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = QwenImageConfig(compute_dtype=dtype)
        if init_random:
            params = init_qwen_image(jax.random.key(seed), cfg, dtype)
        else:
            raise NotImplementedError(
                "qwen checkpoint key-mapping lands with its loader")
        return QwenImagePipeline(params, cfg, attn_backend=attn_backend)

    @staticmethod
    def generate_image(pipe, merged, width, height, seed):
        from ..models.qwen.pipeline import QwenSamplingConfig
        sampling = QwenSamplingConfig(
            steps=int(merged.get("num_inference_steps", 25)),
            true_cfg_scale=float(merged.get("guidance_scale", 4.0)))
        return pipe.generate(prompt=merged.get("prompt", ""),
                             width=width, height=height,
                             sampling=sampling, seed=seed,
                             text=merged.get("_context"),
                             text_null=merged.get("_context_null"))
