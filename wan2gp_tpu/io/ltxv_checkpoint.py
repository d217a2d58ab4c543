"""LTX-Video transformer checkpoint loading (Transformer3DModel key space).

Keys (/root/reference/models/ltx_video/models/transformers/transformer3d.py
:91-155, attention.py): patchify_proj, adaln_single.{emb.timestep_embedder
.linear_{1,2}, linear}, caption_projection.linear_{1,2},
transformer_blocks.N.{attn1.{to_q,to_k,to_v,to_out.0,q_norm,k_norm},
attn2.{...}, ff.net.0.proj, ff.net.2, scale_shift_table [6, d]},
scale_shift_table [2, d], proj_out.  adaptive_norm 'single_scale_shift'
(6-param tables) only.
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


def load_ltxv_params(sd: Dict[str, np.ndarray], cfg,
                     dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: LTXVConfig.  Returns (params, leftover)."""
    sd = dict(sd)
    for pre in ("model.diffusion_model.", "transformer."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
    if "vae" in {k.split(".")[0] for k in sd}:
        sd = {k: v for k, v in sd.items() if not k.startswith("vae.")}

    def attn(pre):
        return {"q": _lin(sd, f"{pre}.to_q", dtype),
                "k": _lin(sd, f"{pre}.to_k", dtype),
                "v": _lin(sd, f"{pre}.to_v", dtype),
                "o": _lin(sd, f"{pre}.to_out.0", dtype),
                "norm_q": _w(sd, f"{pre}.q_norm"),
                "norm_k": _w(sd, f"{pre}.k_norm")}

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        table = np.asarray(sd.pop(f"{pre}.scale_shift_table"), np.float32)
        if table.shape[0] != 6:
            raise ValueError("only adaptive_norm single_scale_shift "
                             "(6-param) checkpoints are supported")
        blocks.append({
            "attn1": attn(f"{pre}.attn1"),
            "attn2": attn(f"{pre}.attn2"),
            "ff1": _lin(sd, f"{pre}.ff.net.0.proj", dtype),
            "ff2": _lin(sd, f"{pre}.ff.net.2", dtype),
            "scale_shift_table": jnp.asarray(table),
        })

    params = {
        "patchify_proj": _lin(sd, "patchify_proj", dtype),
        "adaln": {
            "emb": {"in": _lin(sd, "adaln_single.emb.timestep_embedder."
                               "linear_1", jnp.float32),
                    "out": _lin(sd, "adaln_single.emb.timestep_embedder."
                                "linear_2", jnp.float32)},
            "linear": _lin(sd, "adaln_single.linear", jnp.float32)},
        "caption_projection": {
            "fc1": _lin(sd, "caption_projection.linear_1", dtype),
            "fc2": _lin(sd, "caption_projection.linear_2", dtype)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "scale_shift_table": jnp.asarray(np.asarray(
            sd.pop("scale_shift_table"), np.float32)),
        "proj_out": _lin(sd, "proj_out", jnp.float32),
    }
    return params, sorted(sd.keys())
