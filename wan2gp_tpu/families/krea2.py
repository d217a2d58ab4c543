"""Krea 2 family handler (krea2_raw / krea2_turbo).

Mirrors the reference's models/krea2/krea2_handler.py: raw = 52 steps with
CFG (guidance 3.5 -> true scale 4.5), turbo = 8 steps distilled (guidance
0).  Edit variants (reference-image grounding) are a later round.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.krea2.dit import Krea2Config, init_krea2
from ..models.krea2.pipeline import Krea2Pipeline, Krea2SamplingConfig

_TYPES = ["krea2_raw", "krea2_turbo"]


class Krea2FamilyHandler:
    family = "krea2"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"krea2": (1150, "Krea 2")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": True, "group": "krea2"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        # krea2_handler.py:197-201 update_default_settings
        turbo = base_model_type == "krea2_turbo"
        return {"prompt": "", "resolution": "1024x1024",
                "num_inference_steps": 8 if turbo else 52,
                "guidance_scale": 0 if turbo else 3.5, "seed": -1,
                "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/krea-2/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "text_encoder", "urls": [
                    base + "Qwen3-VL-4B-Instruct_text_bf16.safetensors"]},
                {"role": "vae", "urls": [base + "qwen_vae.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        from ._image_vae import load_image_vae
        cfg = Krea2Config(compute_dtype=dtype)
        text_fn = None
        if init_random:
            params = init_krea2(jax.random.key(seed), cfg, dtype)
            text_fn = cls._random_text_encoder(cfg, seed)
        else:
            from ..io.safetensors_reader import load_weights as load_safetensors
            from ..io.krea2_checkpoint import load_krea2_params
            params, left = load_krea2_params(
                load_safetensors(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed krea2 keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
        vae_fn = load_image_vae(checkpoints, init_random, seed)
        return Krea2Pipeline(params, cfg, vae_decode_fn=vae_fn,
                             text_encode_fn=text_fn,
                             attn_backend=attn_backend)

    @staticmethod
    def generate_image(pipe, merged: Dict[str, Any], width: int,
                       height: int, seed: int):
        sampling = Krea2SamplingConfig(
            steps=int(merged.get("num_inference_steps", 28)),
            guidance=float(merged.get("guidance_scale", 4.5)))
        return pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            width=width, height=height, sampling=sampling, seed=seed,
            context=merged.get("_context"),
            context_mask=merged.get("_context_mask"),
            context_neg=merged.get("_context_neg"),
            context_neg_mask=merged.get("_context_neg_mask"))

    # Qwen3-VL-4B text stack: 12 selected hidden layers feed the text
    # fusion transformer (krea2_main.py:27 _TEXT_ENCODER_SELECT_LAYERS)
    SELECT_LAYERS = (2, 5, 8, 11, 14, 17, 20, 23, 26, 29, 32, 35)

    @classmethod
    def _load_text_encoder(cls, checkpoints, tokenizer, dtype):
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, make_qwen_text_encode_fn,
            QWEN3_4B)
        from ..utils.tokenizer import load_tokenizer
        lm_cfg = QwenLMConfig(**QWEN3_4B, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_safetensors(checkpoints["text_encoder"]), lm_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))
        return make_qwen_text_encode_fn(
            lm_params, lm_cfg, tok,
            template="<|im_start|>user\n{}<|im_end|>\n"
                     "<|im_start|>assistant\n",
            drop_idx=0, max_len=512,
            collect_layers=list(cls.SELECT_LAYERS))

    @classmethod
    def _random_text_encoder(cls, cfg, seed):
        def enc(prompts, _seed=seed):
            keys = [jax.random.key(hash((p, _seed)) & 0x7FFFFFFF)
                    for p in prompts]
            ctx = jnp.stack([jax.random.normal(
                k, (64, cfg.txtlayers, cfg.txtdim), jnp.float32)
                for k in keys])
            return ctx, jnp.ones((len(prompts), 64), jnp.int32)
        return enc
