"""Wan StandIn: identity-preserved generation via in-model LoRA +
reference-kv self-attention.

TPU-native re-implementation of the reference mechanism:
- model.py LoRALinearLayer:125 — rank-128 bias-free down/up pairs on each
  block's self-attn q/k/v (down ~ N(0, 1/rank), up zero-init -> exact
  no-op until trained weights load), attached model.py:1215-1219;
- model.py:1781-1789 — the VAE-encoded reference face image is patch
  embedded, runs the block stack with t=0 modulation in "phase 1"
  (LoRA-augmented q/k/v), and the roped per-block (k, v) are cached;
- model.py:351-357 — in "phase 2" every self-attention concatenates the
  cached reference kv to its own keys/values;
- any2video.py:1086 — the reference tokens take RoPE positions OFFSET by
  the full video extent on the H and W axes (get_nd_rotary_pos_embed
  target (-1, h, w) inside (-1, h+rh, w+rw)) so they never collide with
  video positions.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.rope import _axis_freqs


def build_standin_ref_rope(video_grid_hw: Tuple[int, int],
                           ref_grid_hw: Tuple[int, int],
                           head_dim: int = 128, theta: float = 10000.0,
                           dtype=jnp.float32):
    """RoPE tables for the reference-face tokens: frame 0, rows offset by
    the video grid height, cols offset by the video grid width
    (any2video.py:1086).  Returns (cos, sin) [rh*rw, head_dim//2]."""
    vh, vw = (int(v) for v in video_grid_hw)
    rh, rw = (int(v) for v in ref_grid_hw)
    if head_dim == 128:
        dims = (44, 42, 42)
    else:
        d_sp = 2 * ((head_dim // 6) // 2) * 2
        dims = (head_dim - 2 * d_sp, d_sp, d_sp)

    tf = _axis_freqs(dims[0], np.zeros(1), theta)            # frame 0
    th = _axis_freqs(dims[1], np.arange(vh, vh + rh), theta)
    tw = _axis_freqs(dims[2], np.arange(vw, vw + rw), theta)
    full = np.concatenate([
        np.broadcast_to(tf[:, None, None, :], (1, rh, rw, tf.shape[-1])),
        np.broadcast_to(th[None, :, None, :], (1, rh, rw, th.shape[-1])),
        np.broadcast_to(tw[None, None, :, :], (1, rh, rw, tw.shape[-1])),
    ], axis=-1).reshape(rh * rw, head_dim // 2)
    return (jnp.asarray(np.cos(full), dtype=dtype),
            jnp.asarray(np.sin(full), dtype=dtype))


def init_standin_loras(key, dim: int, num_layers: int, rank: int = 128,
                       dtype=jnp.float32, zero_up: bool = True):
    """Stacked per-block {q,k,v} LoRA params (model.py:1215-1219 rank 128;
    LoRALinearLayer init: down N(0, 1/rank), up zeros)."""
    keys = iter(jax.random.split(key, num_layers * 6 + 1))

    def lora():
        down = (jax.random.normal(next(keys), (dim, rank), jnp.float32)
                / rank).astype(dtype)
        if zero_up:
            up = jnp.zeros((rank, dim), dtype)
        else:
            up = (jax.random.normal(next(keys), (rank, dim), jnp.float32)
                  * 0.02).astype(dtype)
        return {"down": {"w": down}, "up": {"w": up}}

    blocks = [{m: lora() for m in ("q", "k", "v")}
              for _ in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def load_standin_module_params(sd: Dict[str, np.ndarray], num_layers: int,
                               dtype=jnp.bfloat16):
    """Stand-In module safetensors: blocks.N.self_attn.{q,k,v}_loras.
    {down,up}.weight (module attribute paths from model.py:1215-1219)."""
    sd = dict(sd)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T).astype(dtype)}

    blocks: List[Dict[str, Any]] = []
    for i in range(num_layers):
        pre = f"blocks.{i}.self_attn"
        blocks.append({m: {"down": lin(f"{pre}.{m}_loras.down"),
                           "up": lin(f"{pre}.{m}_loras.up")}
                       for m in ("q", "k", "v")})
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return stacked, sorted(sd.keys())
