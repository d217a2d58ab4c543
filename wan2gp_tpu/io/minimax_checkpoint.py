"""MiniMax H3 checkpoint loading (MiniMaxH3Model key space).

Keys (/root/reference/models/minimax_h3/transformer.py:443-489):
video_patch_proj, audio_patch_proj, condition_proj, time_embedder
.proj_{in,out}, token_refiner.{blocks.N.{norm1, attn.{qkv_proj, q_norm,
k_norm, out_proj}, norm2, mlp.{fc1,fc2}}, final_norm}, blocks.N.{...,
adaln_proj.linear}, final_layer.{norm, adaln_proj.linear, video_out,
audio_out}.  Split q/k/v checkpoints are fused back (transformer.py:64-67
interleaves per head; plain concat handled here for the exported form).
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


def _attn(sd, pre, dtype):
    return {"qkv": _lin(sd, f"{pre}.qkv_proj", dtype),
            "o": _lin(sd, f"{pre}.out_proj", dtype),
            "q_norm": _w(sd, f"{pre}.q_norm"),
            "k_norm": _w(sd, f"{pre}.k_norm")}


def load_minimax_h3_params(sd: Dict[str, np.ndarray], cfg,
                           dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    sd = dict(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[6:] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    refiner = []
    for i in range(cfg.token_refiner_num_layers):
        pre = f"token_refiner.blocks.{i}"
        refiner.append({"norm1": _w(sd, f"{pre}.norm1"),
                        "attn": _attn(sd, f"{pre}.attn", dtype),
                        "norm2": _w(sd, f"{pre}.norm2"),
                        "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                                "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype)}})

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        blocks.append({"norm1": _w(sd, f"{pre}.norm1"),
                       "attn": _attn(sd, f"{pre}.attn", dtype),
                       "norm2": _w(sd, f"{pre}.norm2"),
                       "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                               "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype)},
                       "adaln": _lin(sd, f"{pre}.adaln_proj.linear",
                                     jnp.float32)})

    params = {
        "video_patch_proj": _lin(sd, "video_patch_proj", jnp.float32),
        "audio_patch_proj": _lin(sd, "audio_patch_proj", jnp.float32),
        "condition_proj": _lin(sd, "condition_proj", dtype),
        "time_embedder": {"in": _lin(sd, "time_embedder.proj_in",
                                     jnp.float32),
                          "out": _lin(sd, "time_embedder.proj_out",
                                      jnp.float32)},
        "token_refiner": {"blocks": stack(refiner),
                          "final_norm": _w(sd, "token_refiner.final_norm")},
        "blocks": stack(blocks),
        "final": {"norm": _w(sd, "final_layer.norm"),
                  "adaln": _lin(sd, "final_layer.adaln_proj.linear",
                                jnp.float32),
                  "video_out": _lin(sd, "final_layer.video_out",
                                    jnp.float32),
                  "audio_out": _lin(sd, "final_layer.audio_out",
                                    jnp.float32)},
    }
    return params, sorted(sd.keys())
