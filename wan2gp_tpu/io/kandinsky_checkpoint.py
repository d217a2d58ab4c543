"""Kandinsky 5 checkpoint loading (DiffusionTransformer3D key space).

Key layout (/root/reference/models/kandinsky5/kandinsky/models/dit.py,
nn.py): time_embeddings.{in_layer,out_layer}, text_embeddings.{in_layer,
norm}, pooled_text_embeddings.{in_layer,norm}, visual_embeddings.in_layer,
text_transformer_blocks.N.{text_modulation.out_layer, self_attention.{
to_query,to_key,to_value,out_layer,query_norm,key_norm}, feed_forward.{
in_layer,out_layer}}, visual_transformer_blocks.N.{visual_modulation
.out_layer, self_attention.*, cross_attention.*, feed_forward.*},
out_layer.{modulation.out_layer, out_layer}.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"))
    p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _w(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def _attn(sd, pre, dtype):
    return {"q": _lin(sd, f"{pre}.to_query", dtype),
            "k": _lin(sd, f"{pre}.to_key", dtype),
            "v": _lin(sd, f"{pre}.to_value", dtype),
            "o": _lin(sd, f"{pre}.out_layer", dtype),
            "q_norm": _w(sd, f"{pre}.query_norm.weight"),
            "k_norm": _w(sd, f"{pre}.key_norm.weight")}


def _ff(sd, pre, dtype):
    return {"in": _lin(sd, f"{pre}.in_layer", dtype),
            "out": _lin(sd, f"{pre}.out_layer", dtype)}


def load_kandinsky5_params(sd: Dict[str, np.ndarray], cfg,
                           dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: Kandinsky5Config.  Returns (params, leftover)."""
    sd = dict(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[6:] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    text_blocks = []
    for i in range(cfg.num_text_blocks):
        pre = f"text_transformer_blocks.{i}"
        text_blocks.append({
            "mod": _lin(sd, f"{pre}.text_modulation.out_layer", dtype),
            "attn": _attn(sd, f"{pre}.self_attention", dtype),
            "ff": _ff(sd, f"{pre}.feed_forward", dtype)})

    visual_blocks = []
    for i in range(cfg.num_visual_blocks):
        pre = f"visual_transformer_blocks.{i}"
        visual_blocks.append({
            "mod": _lin(sd, f"{pre}.visual_modulation.out_layer", dtype),
            "self_attn": _attn(sd, f"{pre}.self_attention", dtype),
            "cross_attn": _attn(sd, f"{pre}.cross_attention", dtype),
            "ff": _ff(sd, f"{pre}.feed_forward", dtype)})

    params = {
        "time_embeddings": {
            "in": _lin(sd, "time_embeddings.in_layer", jnp.float32),
            "out": _lin(sd, "time_embeddings.out_layer", jnp.float32)},
        "text_embeddings": {
            "lin": _lin(sd, "text_embeddings.in_layer", dtype),
            "ln_w": _w(sd, "text_embeddings.norm.weight"),
            "ln_b": _w(sd, "text_embeddings.norm.bias")},
        "pooled_text_embeddings": {
            "lin": _lin(sd, "pooled_text_embeddings.in_layer", jnp.float32),
            "ln_w": _w(sd, "pooled_text_embeddings.norm.weight"),
            "ln_b": _w(sd, "pooled_text_embeddings.norm.bias")},
        "visual_embeddings": _lin(sd, "visual_embeddings.in_layer", dtype),
        "text_blocks": stack(text_blocks),
        "visual_blocks": stack(visual_blocks),
        "out_layer": {
            "mod": _lin(sd, "out_layer.modulation.out_layer", jnp.float32),
            "lin": _lin(sd, "out_layer.out_layer", dtype)},
    }
    return params, sorted(sd.keys())
