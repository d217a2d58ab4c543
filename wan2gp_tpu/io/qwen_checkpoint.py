"""Qwen-Image transformer checkpoint loading.

Key layout from the reference (diffusers QwenImageTransformer2DModel,
/root/reference/models/qwen/transformer_qwenimage.py:772-794):
img_in, txt_norm, txt_in, time_text_embed.timestep_embedder.linear_{1,2},
transformer_blocks.N.{img_mod.1, txt_mod.1, attn.{to_q,to_k,to_v,
add_q_proj,add_k_proj,add_v_proj,norm_q,norm_k,norm_added_q,norm_added_k,
to_out.0,to_add_out}, img_mlp.net.{0.proj,2}, txt_mlp.net.{0.proj,2}},
norm_out.linear, proj_out.  Also accepts quanto int8 entries
(weight._data / weight._scale) like the Wan loader.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    wq = sd.pop(f"{name}.weight._data", None)
    if wq is not None:
        scale = np.asarray(sd.pop(f"{name}.weight._scale"), np.float32)
        p = {"w_q": jnp.asarray(np.asarray(wq).T),
             "scale": jnp.asarray(scale.reshape(-1))}
    else:
        w = np.asarray(sd.pop(f"{name}.weight"))
        p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _w(sd, name):
    return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"), np.float32))


def load_qwen_image_params(sd: Dict[str, np.ndarray], cfg,
                           dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: QwenImageConfig.  Returns (params, leftover)."""
    sd = dict(sd)
    if any(k.startswith("model.diffusion_model.") for k in sd):
        p = "model.diffusion_model."
        sd = {k[len(p):] if k.startswith(p) else k: v for k, v in sd.items()}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        blocks.append({
            "img_mod": _lin(sd, f"{pre}.img_mod.1", dtype),
            "txt_mod": _lin(sd, f"{pre}.txt_mod.1", dtype),
            "img_attn": {
                "q": _lin(sd, f"{pre}.attn.to_q", dtype),
                "k": _lin(sd, f"{pre}.attn.to_k", dtype),
                "v": _lin(sd, f"{pre}.attn.to_v", dtype),
                "norm_q": _w(sd, f"{pre}.attn.norm_q"),
                "norm_k": _w(sd, f"{pre}.attn.norm_k"),
            },
            "txt_attn": {
                "q": _lin(sd, f"{pre}.attn.add_q_proj", dtype),
                "k": _lin(sd, f"{pre}.attn.add_k_proj", dtype),
                "v": _lin(sd, f"{pre}.attn.add_v_proj", dtype),
                "norm_q": _w(sd, f"{pre}.attn.norm_added_q"),
                "norm_k": _w(sd, f"{pre}.attn.norm_added_k"),
            },
            "to_out": _lin(sd, f"{pre}.attn.to_out.0", dtype),
            "to_add_out": _lin(sd, f"{pre}.attn.to_add_out", dtype),
            "img_mlp1": _lin(sd, f"{pre}.img_mlp.net.0.proj", dtype),
            "img_mlp2": _lin(sd, f"{pre}.img_mlp.net.2", dtype),
            "txt_mlp1": _lin(sd, f"{pre}.txt_mlp.net.0.proj", dtype),
            "txt_mlp2": _lin(sd, f"{pre}.txt_mlp.net.2", dtype),
        })

    params = {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_norm": _w(sd, "txt_norm"),
        "txt_in": _lin(sd, "txt_in", dtype),
        "time_embed": {
            "in": _lin(sd, "time_text_embed.timestep_embedder.linear_1",
                       jnp.float32),
            "out": _lin(sd, "time_text_embed.timestep_embedder.linear_2",
                        jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out": _lin(sd, "norm_out.linear", jnp.float32),
        "proj_out": _lin(sd, "proj_out", jnp.float32),
    }
    return params, sorted(sd.keys())
