"""Qwen3-VL vision tower (HiDream edit-mode image conditioning).

Re-implementation of the vision model in
/root/reference/models/hidream/qwen3_vl_transformers.py:805-1000
(Qwen3VLVisionModel) with the Qwen3VLVisionConfig defaults
(qwen3_vl_configuration.py:6-41): depth 27, hidden 1152,
gelu-tanh MLP 4304, 16 heads, patch 16 (temporal 2), learned absolute
position embedding bilinearly interpolated from a 48x48 grid
(fast_pos_embed_interpolate:883-945), 2D axial rotary embedding over
full-resolution (row, col) (rot_pos_emb:844-881), LayerNorm blocks with
fused-qkv full attention per image, and a 2x2 patch merger MLP to the
LM hidden size.  Deepstack mergers (postshuffle-norm variants at layers
8/16/24) are returned for completeness; the HiDream edit pipeline only
consumes the final merger output (pipeline.py:309-313).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Qwen3VLVisionConfig:
    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 4096     # Qwen3-VL-8B LM width
    num_position_embeddings: int = 2304   # 48 x 48
    deepstack_indexes: Tuple[int, ...] = (8, 16, 24)

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def grid_side(self):
        return int(self.num_position_embeddings ** 0.5)

    @classmethod
    def tiny(cls):
        return cls(depth=2, hidden_size=32, intermediate_size=64,
                   num_heads=4, patch_size=8, temporal_patch_size=2,
                   out_hidden_size=32, num_position_embeddings=16,
                   deepstack_indexes=(1,))


def _lin(key, din, dout, dtype, bias=True, std=0.02):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32) * std
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _ln(x, p, eps=1e-6):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _init_ln(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "bias": jnp.zeros((d,), dtype)}


def init_qwen3_vision(key, cfg: Qwen3VLVisionConfig, dtype=jnp.float32):
    h = cfg.hidden_size
    pd = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    mu = cfg.spatial_merge_size ** 2
    keys = iter(jax.random.split(key, cfg.depth * 4 + 16))
    blocks = []
    for _ in range(cfg.depth):
        blocks.append({
            "norm1": _init_ln(h, dtype), "norm2": _init_ln(h, dtype),
            "qkv": _lin(next(keys), h, 3 * h, dtype),
            "proj": _lin(next(keys), h, h, dtype),
            "fc1": _lin(next(keys), h, cfg.intermediate_size, dtype),
            "fc2": _lin(next(keys), cfg.intermediate_size, h, dtype)})

    def merger(postshuffle):
        return {"norm": _init_ln(h * mu if postshuffle else h, dtype),
                "fc1": _lin(next(keys), h * mu, h * mu, dtype),
                "fc2": _lin(next(keys), h * mu, cfg.out_hidden_size,
                            dtype),
                "postshuffle": postshuffle}

    return {"patch_embed": _lin(next(keys), pd, h, dtype),
            "pos_embed": (jax.random.normal(
                next(keys), (cfg.num_position_embeddings, h)) * 0.02
                ).astype(dtype),
            "blocks": blocks,
            "merger": merger(False),
            "deepstack": [merger(True) for _ in cfg.deepstack_indexes]}


def _interp_pos_embed(table, cfg: Qwen3VLVisionConfig, gh: int, gw: int):
    """Bilinear interpolation of the 48x48 learned grid to (gh, gw),
    then reorder to merge-block order (fast_pos_embed_interpolate)."""
    side = cfg.grid_side
    hi = np.linspace(0, side - 1, gh)
    wi = np.linspace(0, side - 1, gw)
    hf = np.floor(hi).astype(np.int64)
    wf = np.floor(wi).astype(np.int64)
    hc = np.clip(hf + 1, 0, side - 1)
    wc = np.clip(wf + 1, 0, side - 1)
    dh = (hi - hf)[:, None]
    dw = (wi - wf)[None, :]
    idx = lambda a, b: (a[:, None] * side + b[None, :]).reshape(-1)
    w00 = ((1 - dh) * (1 - dw)).reshape(-1, 1)
    w01 = ((1 - dh) * dw).reshape(-1, 1)
    w10 = (dh * (1 - dw)).reshape(-1, 1)
    w11 = (dh * dw).reshape(-1, 1)
    pe = (table[idx(hf, wf)] * w00 + table[idx(hf, wc)] * w01
          + table[idx(hc, wf)] * w10 + table[idx(hc, wc)] * w11)
    # row-major -> merge-block order
    m = cfg.spatial_merge_size
    pe = pe.reshape(gh // m, m, gw // m, m, -1).transpose(0, 2, 1, 3, 4)
    return pe.reshape(gh * gw, -1)


def _rope_cos_sin(cfg: Qwen3VLVisionConfig, gh: int, gw: int):
    """2D axial rope over full-res (row, col) in merge-block order
    (rot_pos_emb:844-881); returns [N, head_dim//2] cos/sin."""
    dim = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float32)
                             / dim))
    m = cfg.spatial_merge_size
    rows = (np.arange(gh // m)[:, None, None, None] * m
            + np.arange(m)[None, None, :, None])
    cols = (np.arange(gw // m)[None, :, None, None] * m
            + np.arange(m)[None, None, None, :])
    rows = np.broadcast_to(rows, (gh // m, gw // m, m, m)).reshape(-1)
    cols = np.broadcast_to(cols, (gh // m, gw // m, m, m)).reshape(-1)
    fr = np.outer(rows, inv)
    fc = np.outer(cols, inv)
    freqs = np.concatenate([fr, fc], axis=-1)     # [N, head_dim//2]
    return (jnp.asarray(np.cos(freqs), jnp.float32),
            jnp.asarray(np.sin(freqs), jnp.float32))


def _apply_vis_rope(x, cos, sin):
    """x [N, heads, hd]; rotate-half convention with freqs repeated
    (apply_rotary_pos_emb_vision)."""
    c = jnp.concatenate([cos, cos], axis=-1)[:, None]
    s = jnp.concatenate([sin, sin], axis=-1)[:, None]
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * c + rot * s


def qwen3_vision_forward(params, cfg: Qwen3VLVisionConfig, patches,
                         grid_h: int, grid_w: int):
    """patches [N, t*p*p*3] flattened pixel patches of ONE image in
    merge-block order; returns (embeds [N/4, out_hidden], deepstack
    list).  N = grid_h * grid_w."""
    x = _dense(jnp.asarray(patches), params["patch_embed"])
    x = x + _interp_pos_embed(np.asarray(params["pos_embed"],
                                         np.float32), cfg, grid_h,
                              grid_w).astype(x.dtype)
    cos, sin = _rope_cos_sin(cfg, grid_h, grid_w)
    n = x.shape[0]
    heads, hd = cfg.num_heads, cfg.head_dim
    deep = []
    for i, blk in enumerate(params["blocks"]):
        y = _ln(x, blk["norm1"])
        qkv = _dense(y, blk["qkv"]).reshape(n, 3, heads, hd)
        q = _apply_vis_rope(qkv[:, 0], cos, sin)
        k = _apply_vis_rope(qkv[:, 1], cos, sin)
        v = qkv[:, 2]
        w = jax.nn.softmax(
            jnp.einsum("lhd,shd->hls", q, k).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(x.dtype)
        o = jnp.einsum("hls,shd->lhd", w, v).reshape(n, heads * hd)
        x = x + _dense(o, blk["proj"])
        y = _ln(x, blk["norm2"])
        x = x + _dense(jax.nn.gelu(_dense(y, blk["fc1"]),
                                   approximate=True), blk["fc2"])
        if i in cfg.deepstack_indexes:
            mi = cfg.deepstack_indexes.index(i)
            deep.append(_merger(params["deepstack"][mi], cfg, x))
    return _merger(params["merger"], cfg, x), deep


def _merger(p, cfg: Qwen3VLVisionConfig, x):
    mu = cfg.spatial_merge_size ** 2
    if p["postshuffle"]:
        y = _ln(x.reshape(-1, x.shape[-1] * mu), p["norm"])
    else:
        y = _ln(x, p["norm"]).reshape(-1, x.shape[-1] * mu)
    return _dense(jax.nn.gelu(_dense(y, p["fc1"]), approximate=False),
                  p["fc2"])


def image_to_vision_patches(img: np.ndarray, cfg: Qwen3VLVisionConfig):
    """img [H, W, 3] float in [-1, 1] -> (patches [N, t*p*p*3] in
    merge-block order, grid_h, grid_w).  The temporal axis repeats the
    frame (Qwen3VLVisionPatchEmbed on stills)."""
    p, m = cfg.patch_size, cfg.spatial_merge_size
    h, w = img.shape[:2]
    gh, gw = h // p, w // p
    x = np.asarray(img, np.float32)[:gh * p, :gw * p]
    x = x.transpose(2, 0, 1)                           # [3, H, W]
    x = np.repeat(x[:, None], cfg.temporal_patch_size, 1)  # [3,t,H,W]
    x = x.reshape(3, cfg.temporal_patch_size, gh, p, gw, p)
    # merge-block ordering: (gh/m, gw/m, m, m) patches
    x = x.transpose(2, 4, 1, 0, 3, 5)   # [gh, gw, t, 3, p, p]
    x = x.reshape(gh // m, m, gw // m, m, cfg.temporal_patch_size, 3,
                  p, p)
    x = x.transpose(0, 2, 1, 3, 4, 5, 6, 7)
    # channel-major per patch: (3, t, p, p) flattened as conv3d expects
    x = x.transpose(0, 1, 2, 3, 5, 4, 6, 7)
    return (x.reshape(gh * gw, 3 * cfg.temporal_patch_size * p * p),
            gh, gw)
