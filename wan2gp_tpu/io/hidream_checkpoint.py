"""HiDream-O1 checkpoint mapping.

One checkpoint holds the whole model (qwen3_vl_transformers.py
Qwen3VLForConditionalGeneration): the Qwen3-VL-8B language model
(loaded via the shared load_qwen_lm_params), the pixel-DiT extras
(t_embedder1, x_embedder BottleneckPatchEmbed, final_layer2), and a
vision tower (``visual.*``, used only for reference-image edits —
skipped here until the edit path lands).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.qwen.text_encoder import load_qwen_lm_params


def load_hidream_params(sd: Dict[str, np.ndarray], lm_cfg,
                        dtype=jnp.bfloat16) -> Tuple[Dict[str, Any], list]:
    sd = dict(sd)
    for pre in ("model.", ""):
        if any(k.startswith(pre + "language_model.") for k in sd):
            break

    def grab(suffix):
        for cand in (pre + suffix, suffix):
            if cand in sd:
                return np.asarray(sd.pop(cand), np.float32)
        raise KeyError(suffix)

    def lin(name):
        return {"w": jnp.asarray(grab(f"{name}.weight").T).astype(dtype),
                "b": jnp.asarray(grab(f"{name}.bias")).astype(dtype)}

    extras = {
        "t_embedder": {"mlp0": lin("t_embedder1.mlp.0"),
                       "mlp2": lin("t_embedder1.mlp.2")},
        "x_embedder": {
            "proj1": {"w": jnp.asarray(
                grab("x_embedder.proj1.weight").T).astype(dtype)},
            "proj2": lin("x_embedder.proj2")},
        "final": lin("final_layer2.linear"),
    }
    vision = [k for k in sd if "visual." in k]
    for k in vision:
        sd.pop(k)
    lm_sd = {k: v for k, v in sd.items()}
    lm_params, leftover = load_qwen_lm_params(lm_sd, lm_cfg, dtype)
    return {"lm": lm_params, **extras}, leftover
