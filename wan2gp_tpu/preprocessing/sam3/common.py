"""Shared SAM3 building blocks: sine position encodings, MLPs, attention.

Formula sources (cited for parity checking, no code copied):
- sine image grid / point / box encodings: reference
  preprocessing/sam3/model/position_encoding.py:60-131
  (PositionEmbeddingSine._encode_xy / encode_boxes / forward);
- query sine embedding: model/model_misc.py:960-997
  (gen_sineembed_for_position);
- MLP head: model/model_misc.py MLP (ReLU between layers);
- attention: torch nn.MultiheadAttention semantics (separate q/k/v/out
  projections here; checkpoint in_proj weights are split at load time).

Layout conventions are TPU-native: batch-first [B, L, C] sequences and
NHWC images throughout (the reference is seq-first / NCHW).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import layer_norm


def linear(x, p):
    return x @ p["w"] + p["b"]


def init_linear(key, din, dout, dtype=jnp.float32, std=0.02):
    kw, _ = jax.random.split(key)
    return {"w": (jax.random.normal(kw, (din, dout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((dout,), dtype)}


def init_ln(dim, dtype=jnp.float32):
    return {"scale": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def ln(x, p, eps: float = 1e-5):
    return layer_norm(x, p["scale"], p["bias"], eps=eps)


def init_mlp(key, din, dhidden, dout, num_layers, dtype=jnp.float32):
    """model_misc.py MLP: num_layers linears, ReLU between all but last."""
    dims = [din] + [dhidden] * (num_layers - 1) + [dout]
    keys = jax.random.split(key, num_layers)
    return {"layers": [init_linear(keys[i], dims[i], dims[i + 1], dtype)
                       for i in range(num_layers)]}


def mlp(x, p):
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = linear(x, lp)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------

def init_mha(key, d_model, num_heads, kv_dim=None, dtype=jnp.float32):
    kv_dim = kv_dim or d_model
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {"q": init_linear(kq, d_model, d_model, dtype),
            "k": init_linear(kk, kv_dim, d_model, dtype),
            "v": init_linear(kv, kv_dim, d_model, dtype),
            "o": init_linear(ko, d_model, d_model, dtype)}


def mha(p, q, k, v, num_heads, key_padding_mask=None, attn_bias=None,
        is_causal=False):
    """Multi-head attention, [B, L, C] batch-first.

    key_padding_mask: [B, S] bool, True = PADDING (torch convention).
    attn_bias: additive [B, H, L, S] (boxRPB) or [L, S].
    """
    nh = num_heads
    b, l, _ = q.shape
    s = k.shape[1]
    qh = linear(q, p["q"]).reshape(b, l, nh, -1).transpose(0, 2, 1, 3)
    kh = linear(k, p["k"]).reshape(b, s, nh, -1).transpose(0, 2, 1, 3)
    vh = linear(v, p["v"]).reshape(b, s, nh, -1).transpose(0, 2, 1, 3)
    scale = 1.0 / math.sqrt(qh.shape[-1])
    logits = jnp.einsum("bhld,bhsd->bhls", qh.astype(jnp.float32),
                        kh.astype(jnp.float32)) * scale
    if attn_bias is not None:
        logits = logits + attn_bias.astype(jnp.float32)
    if is_causal:
        cm = jnp.tril(jnp.ones((l, s), bool))
        logits = jnp.where(cm[None, None], logits, -jnp.inf)
    if key_padding_mask is not None:
        logits = jnp.where(key_padding_mask[:, None, None, :], -jnp.inf,
                           logits)
    w = jax.nn.softmax(logits, axis=-1)
    # fully-masked rows (empty prompt) produce NaN otherwise
    w = jnp.nan_to_num(w)
    out = jnp.einsum("bhls,bhsd->bhld", w, vh.astype(jnp.float32))
    out = out.transpose(0, 2, 1, 3).reshape(b, l, -1).astype(q.dtype)
    return linear(out, p["o"])


# ---------------------------------------------------------------------------
# sine position encodings (PositionEmbeddingSine)
# ---------------------------------------------------------------------------

def sine_grid_pos(h: int, w: int, num_pos_feats: int = 256,
                  temperature: float = 10000.0):
    """Image-grid sine embedding [H, W, C] (position_encoding.py:96-131,
    normalize=True, scale=2*pi).  Channel order: (y-part, x-part)."""
    npf = num_pos_feats // 2
    scale = 2.0 * math.pi
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32) / (h + eps) * scale)
    x = (np.arange(1, w + 1, dtype=np.float32) / (w + eps) * scale)
    dim_t = np.arange(npf, dtype=np.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / npf)
    py = y[:, None] / dim_t          # [H, npf]
    px = x[:, None] / dim_t          # [W, npf]

    def interleave(v):
        return np.stack([np.sin(v[..., 0::2]), np.cos(v[..., 1::2])],
                        axis=-1).reshape(*v.shape[:-1], -1)

    py = interleave(py)              # [H, npf]
    px = interleave(px)              # [W, npf]
    grid = np.concatenate(
        [np.broadcast_to(py[:, None, :], (h, w, npf)),
         np.broadcast_to(px[None, :, :], (h, w, npf))], axis=-1)
    return jnp.asarray(grid)


def sine_xy(x, y, num_pos_feats: int = 256, temperature: float = 10000.0):
    """Normalized point coords -> (pos_x, pos_y) each [..., npf]
    (position_encoding.py:60-77)."""
    npf = num_pos_feats // 2
    scale = 2.0 * math.pi
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = temperature ** (2.0 * (dim_t // 2) / npf)
    px = (x * scale)[..., None] / dim_t
    py = (y * scale)[..., None] / dim_t

    def interleave(v):
        return jnp.stack([jnp.sin(v[..., 0::2]), jnp.cos(v[..., 1::2])],
                         axis=-1).reshape(*v.shape[:-1], -1)

    return interleave(px), interleave(py)


def sine_box_embed(boxes_cxcywh, num_pos_feats: int = 256):
    """encode_boxes (position_encoding.py:79-83): cat(pos_y, pos_x, h, w)
    -> [..., num_pos_feats + 2]."""
    cx, cy, w, h = jnp.split(boxes_cxcywh, 4, axis=-1)
    px, py = sine_xy(cx[..., 0], cy[..., 0], num_pos_feats)
    return jnp.concatenate([py, px, h, w], axis=-1)


def gen_sineembed_for_position(pos, num_feats: int = 256):
    """model_misc.py:960-997 — query sine embedding for cxcywh boxes
    [..., 4] -> [..., 2*num_feats]; or points [..., 2] -> [..., num_feats].
    Output order: (y, x[, w, h])."""
    npf = num_feats // 2
    scale = 2.0 * math.pi
    dim_t = jnp.arange(npf, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * (dim_t // 2) / npf)

    def enc(v):
        e = (v * scale)[..., None] / dim_t
        return jnp.stack([jnp.sin(e[..., 0::2]), jnp.cos(e[..., 1::2])],
                         axis=-1).reshape(*v.shape, -1)

    parts = [enc(pos[..., 1]), enc(pos[..., 0])]
    if pos.shape[-1] == 4:
        parts += [enc(pos[..., 2]), enc(pos[..., 3])]
    return jnp.concatenate(parts, axis=-1)


def inverse_sigmoid(x, eps: float = 1e-3):
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h,
                            cx + 0.5 * w, cy + 0.5 * h], axis=-1)
