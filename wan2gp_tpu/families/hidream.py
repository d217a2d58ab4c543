"""HiDream-O1 family handler (pixel-space t2i/edit on a Qwen3-VL
backbone).

Mirrors /root/reference/models/hidream/hidream_main.py: one checkpoint
(Qwen3VLForConditionalGeneration + pixel-DiT extras), no VAE, no
separate text encoder.  Reference-image edit mode conditions on the
Qwen3-VL vision tower (models/hidream/vision.py) plus clean reference
pixel patches (pipeline.py:190-330).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..models.hidream.model import (HiDreamConfig, QWEN3_VL_8B,
                                    init_hidream_extras)
from ..models.hidream.vision import (Qwen3VLVisionConfig,
                                     init_qwen3_vision)
from ..models.hidream.pipeline import HiDreamPipeline, HiDreamSamplingConfig
from ..models.qwen.text_encoder import QwenLMConfig, init_qwen_lm

_TYPES = ["hidream_o1"]

# chat-template prefix + <|boi_token|><|tms_token|> (pipeline.py:46-55)
HIDREAM_TEMPLATE = ("<|im_start|>user\n{}<|im_end|>\n"
                    "<|im_start|>assistant\n")
BOI_TOKEN_ID = 151672
TMS_TOKEN_ID = 151673


class HiDreamFamilyHandler:
    family = "hidream"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"hidream": (1150, "HiDream O1")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": True, "group": "hidream"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "1024x1024",
                "num_inference_steps": 50, "guidance_scale": 5.0,
                "flow_shift": 3.0, "sample_solver": "default",
                "seed": -1, "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        return [{"role": "transformer", "urls": model_def.get("URLs", [])}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        lm_cfg = QwenLMConfig(**QWEN3_VL_8B, compute_dtype=dtype)
        hcfg = HiDreamConfig()
        vis_cfg = Qwen3VLVisionConfig(out_hidden_size=lm_cfg.dim)
        if init_random:
            params = {"lm": init_qwen_lm(jax.random.key(seed), lm_cfg,
                                         dtype),
                      "vision": init_qwen3_vision(
                          jax.random.key(seed + 2), vis_cfg, dtype),
                      **init_hidream_extras(jax.random.key(seed + 1),
                                            lm_cfg, hcfg, dtype)}
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.hidream_checkpoint import load_hidream_params
            params, left = load_hidream_params(
                load_weights(checkpoints["transformer"]), lm_cfg, dtype)
            if left:
                raise ValueError(f"unconsumed hidream keys: {left[:8]}")
        build_prompt_fn = cls._build_prompt_fn(tokenizer, hcfg)
        return HiDreamPipeline(params, lm_cfg, hcfg,
                               build_prompt_fn=build_prompt_fn,
                               attn_backend=attn_backend,
                               vision_cfg=vis_cfg)

    @staticmethod
    def _build_prompt_fn(tokenizer, hcfg: HiDreamConfig):
        """ids = template(prompt) + <boi> + <tms> (tms is replaced in the
        forward by the timestep embedding)."""
        def build(prompt):
            if tokenizer is None:
                # deterministic hash ids for random-weight smoke runs
                rng = np.random.default_rng(abs(hash(prompt)) % (2 ** 31))
                ids = rng.integers(0, 1000, (1, 16))
            else:
                txt = HIDREAM_TEMPLATE.format(prompt)
                ids, mask = tokenizer([txt], 1024)
                ids = np.asarray(ids)[:, :int(np.asarray(mask).sum())]
            ids = np.concatenate(
                [ids, [[BOI_TOKEN_ID, hcfg.tms_token_id]]], axis=1)
            return jnp.asarray(ids, jnp.int32)
        return build

    @staticmethod
    def generate_image(pipe, merged: Dict[str, Any], width: int,
                       height: int, seed: int):
        sampling = HiDreamSamplingConfig(
            steps=int(merged.get("num_inference_steps", 50)),
            guidance=float(merged.get("guidance_scale", 5.0)),
            shift=float(merged.get("flow_shift", 3.0)),
            scheduler=str(merged.get("sample_solver", "default")
                          or "default"))
        refs = merged.get("image_refs") or []
        if refs:
            ref_arrays = []
            for r in refs:
                a = np.asarray(r, np.float32)
                if a.max() > 1.5:        # uint8 -> [-1, 1]
                    a = a / 127.5 - 1.0
                ref_arrays.append(a)
            img = pipe.generate_edit(prompt=merged.get("prompt", ""),
                                     ref_images=ref_arrays,
                                     height=height, width=width,
                                     sampling=sampling, seed=seed)
        else:
            img = pipe.generate(prompt=merged.get("prompt", ""),
                                height=height, width=width,
                                sampling=sampling, seed=seed)
        # [1, 3, H, W] in [0,1] -> [H, W, 3] in [-1, 1]
        return img[0].transpose(1, 2, 0) * 2.0 - 1.0
