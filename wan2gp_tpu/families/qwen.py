"""Qwen-Image family handler."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.qwen.dit import QwenImageConfig, init_qwen_image
from ..models.qwen.pipeline import QwenImagePipeline

_TYPES = ["qwen_image_20B", "qwen_image_edit_20B",
          "qwen_image_layered_20B"]


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
        from ._image_vae import load_image_vae
        cfg = QwenImageConfig(compute_dtype=dtype)
        text_fn = None
        if init_random:
            params = init_qwen_image(jax.random.key(seed), cfg, dtype)
            text_fn = cls._random_text_encoder(cfg, seed)
        else:
            from ..io.safetensors_reader import load_weights as load_safetensors
            from ..io.qwen_checkpoint import load_qwen_image_params
            params, left = load_qwen_image_params(
                load_safetensors(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed qwen keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
        vae_fn = load_image_vae(checkpoints, init_random, seed)
        return QwenImagePipeline(params, cfg, vae_decode_fn=vae_fn,
                                 text_encode_fn=text_fn,
                                 attn_backend=attn_backend)

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype):
        """Qwen2.5-VL-7B text tower with the Qwen-Image chat template
        (pipeline_qwenimage.py:191-266: last hidden state, drop_idx 34).
        Returns fn(prompt) -> (text, text_null) for true-CFG sampling."""
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, make_qwen_text_encode_fn,
            QWEN25_VL_7B_TEXT)
        from ..utils.tokenizer import load_tokenizer
        lm_cfg = QwenLMConfig(**QWEN25_VL_7B_TEXT, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_safetensors(checkpoints["text_encoder"]), lm_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))
        enc = make_qwen_text_encode_fn(lm_params, lm_cfg, tok)

        def text_fn(prompt):
            pos, _ = enc([prompt])
            neg, _ = enc([" "])
            return pos, neg
        return text_fn

    @staticmethod
    def _random_text_encoder(cfg, seed):
        def text_fn(prompt, _seed=seed):
            k1 = jax.random.key(hash((prompt, _seed)) & 0x7FFFFFFF)
            k2 = jax.random.key(hash((prompt, _seed, 1)) & 0x7FFFFFFF)
            pos = jax.random.normal(k1, (1, 64, cfg.joint_attention_dim),
                                    jnp.float32)
            neg = jax.random.normal(k2, (1, 64, cfg.joint_attention_dim),
                                    jnp.float32)
            return pos, neg
        return text_fn

    @staticmethod
    def generate_image(pipe, merged, width, height, seed):
        from ..models.qwen.pipeline import QwenSamplingConfig
        sampling = QwenSamplingConfig(
            steps=int(merged.get("num_inference_steps", 25)),
            true_cfg_scale=float(merged.get("guidance_scale", 4.0)))
        if merged.get("model_type", "").startswith("qwen_image_layered") \
                or merged.get("base_model_type", "") == \
                "qwen_image_layered_20B":
            # layered decomposition: one RGBA image per layer; the
            # service saves the first composite (layers via API)
            out = pipe.generate_layered(
                prompt=merged.get("prompt", ""),
                num_layers=int(merged.get("batch_size", 4) or 4),
                width=width, height=height, sampling=sampling,
                seed=seed, text=merged.get("_context"),
                text_null=merged.get("_context_null"))
            return out[0] if out.ndim == 4 else out
        return pipe.generate(prompt=merged.get("prompt", ""),
                             width=width, height=height,
                             sampling=sampling, seed=seed,
                             text=merged.get("_context"),
                             text_null=merged.get("_context_null"))
