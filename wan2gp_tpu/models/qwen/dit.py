"""Qwen-Image 20B MMDiT, TPU-native.

Functional re-implementation of the reference QwenImageTransformer2DModel
(/root/reference/models/qwen/transformer_qwenimage.py:671): 60 dual-stream
blocks (dim 3072, 24 heads x 128) where BOTH streams keep separate QKV
projections and the joint attention runs over [text, image] order
(:440-455); RMS qk-norm per head; 6-way SiLU modulations per stream; final
AdaLayerNormContinuous head.  RoPE: per-axis (16,56,56) tables with
scale_rope centering — spatial positions run [-(n-n//2) .. n//2) and text
tokens continue at max(h//2, w//2) (:188-252).

Text conditioning comes from Qwen2.5-VL hidden states (joint_attention_dim
3584) after an RMSNorm + linear (:776-779).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm
from ..flux.dit import timestep_embedding, rope_from_ids


@dataclasses.dataclass(frozen=True)
class QwenImageConfig:
    patch_size: int = 2
    in_channels: int = 64
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584
    axes_dims_rope: Sequence[int] = (16, 56, 56)
    eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    @property
    def inner_dim(self):
        return self.num_attention_heads * self.attention_head_dim


def qwen_rope(grid_fhw, txt_len: int, cfg: QwenImageConfig):
    """(cos, sin) [txt_len + sum(f*h*w), head_dim/2] in [txt, img...] order.

    grid_fhw: one (f, h, w) grid or a list of grids — Qwen-Image-Edit packs
    the output grid plus one grid per conditioning image, each with frame
    coordinate = its list index (transformer_qwenimage.py:204-213
    _compute_video_freqs(idx)); txt ids continue at the max spatial extent
    over all grids (:217-223)."""
    grids = grid_fhw if isinstance(grid_fhw, list) else [grid_fhw]
    parts = []
    max_vid = 0
    for idx, (f, h, w) in enumerate(grids):
        ids = np.zeros((f * h * w, 3))
        ff, hh, ww = np.meshgrid(np.arange(f) + idx,
                                 np.arange(h) - (h - h // 2),
                                 np.arange(w) - (w - w // 2), indexing="ij")
        ids[:, 0] = ff.ravel()
        ids[:, 1] = hh.ravel()
        ids[:, 2] = ww.ravel()
        parts.append(ids)
        max_vid = max(max_vid, h // 2, w // 2)
    txt_ids = np.stack([max_vid + np.arange(txt_len)] * 3, axis=-1)
    all_ids = np.concatenate([txt_ids, *parts], axis=0)
    return rope_from_ids(all_ids, cfg.axes_dims_rope, 10000)


def _linear(key, din, dout, dtype, bias=True):
    limit = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def init_qwen_image(key, cfg: QwenImageConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 16))
    d = cfg.inner_dim
    hd = cfg.attention_head_dim

    def stream_attn(ks):
        return {"q": _linear(next(ks), d, d, dtype),
                "k": _linear(next(ks), d, d, dtype),
                "v": _linear(next(ks), d, d, dtype),
                "norm_q": jnp.ones((hd,), jnp.float32),
                "norm_k": jnp.ones((hd,), jnp.float32)}

    def block(key):
        ks = iter(jax.random.split(key, 16))
        return {
            "img_mod": _linear(next(ks), d, 6 * d, dtype),
            "txt_mod": _linear(next(ks), d, 6 * d, dtype),
            "img_attn": stream_attn(ks),
            "txt_attn": stream_attn(ks),
            "to_out": _linear(next(ks), d, d, dtype),
            "to_add_out": _linear(next(ks), d, d, dtype),
            "img_mlp1": _linear(next(ks), d, 4 * d, dtype),
            "img_mlp2": _linear(next(ks), 4 * d, d, dtype),
            "txt_mlp1": _linear(next(ks), d, 4 * d, dtype),
            "txt_mlp2": _linear(next(ks), 4 * d, d, dtype),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.num_layers)]
    return {
        "img_in": _linear(next(keys), cfg.in_channels, d, dtype),
        "txt_norm": jnp.ones((cfg.joint_attention_dim,), jnp.float32),
        "txt_in": _linear(next(keys), cfg.joint_attention_dim, d, dtype),
        "time_embed": {"in": _linear(next(keys), 256, d, jnp.float32),
                       "out": _linear(next(keys), d, d, jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm_out": _linear(next(keys), d, 2 * d, jnp.float32),
        "proj_out": _linear(next(keys), d,
                            cfg.patch_size ** 2 * cfg.out_channels,
                            jnp.float32),
    }


def _dense(x, p, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p or "w_q4" in p:
        from ...ops.quant import dense_quant
        return dense_quant(x, p, dtype)
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _apply_rope_slice(x, cos, sin):
    from ...ops.rope import apply_rope
    return apply_rope(x, cos, sin)


def _mod6(p, vec):
    m = _dense(jax.nn.silu(vec.astype(jnp.float32)), p, jnp.float32)
    return jnp.split(m[:, None, :], 6, axis=-1)


def _block(bp, img, txt, vec, cos, sin, txt_len, cfg, attn_backend):
    cdt = cfg.compute_dtype
    n = cfg.num_attention_heads
    i_sh1, i_sc1, i_g1, i_sh2, i_sc2, i_g2 = _mod6(bp["img_mod"], vec)
    t_sh1, t_sc1, t_g1, t_sh2, t_sc2, t_g2 = _mod6(bp["txt_mod"], vec)

    def qkv(p, x):
        q = rms_norm(_heads(_dense(x.astype(cdt), p["q"], cdt), n),
                     p["norm_q"], cfg.eps)
        k = rms_norm(_heads(_dense(x.astype(cdt), p["k"], cdt), n),
                     p["norm_k"], cfg.eps)
        v = _heads(_dense(x.astype(cdt), p["v"], cdt), n)
        return q, k, v

    img_n = layer_norm(img, eps=cfg.eps) * (1 + i_sc1) + i_sh1
    txt_n = layer_norm(txt, eps=cfg.eps) * (1 + t_sc1) + t_sh1
    iq, ik, iv = qkv(bp["img_attn"], img_n)
    tq, tk, tv = qkv(bp["txt_attn"], txt_n)
    q = jnp.concatenate([tq, iq], axis=1)   # [text, image] order
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tv, iv], axis=1)
    q = _apply_rope_slice(q, cos, sin)
    k = _apply_rope_slice(k, cos, sin)
    o = attention(q, k, v, backend=attn_backend)
    o = o.reshape(*o.shape[:2], cfg.inner_dim)
    txt_o, img_o = o[:, :txt_len], o[:, txt_len:]

    img = img + i_g1 * _dense(img_o, bp["to_out"], cdt).astype(jnp.float32)
    txt = txt + t_g1 * _dense(txt_o, bp["to_add_out"], cdt
                              ).astype(jnp.float32)

    def mlp(p1, p2, y):
        h = _dense(y.astype(cdt), p1, cdt)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
        return _dense(h, p2, cdt)

    y = layer_norm(img, eps=cfg.eps) * (1 + i_sc2) + i_sh2
    img = img + i_g2 * mlp(bp["img_mlp1"], bp["img_mlp2"], y
                           ).astype(jnp.float32)
    y = layer_norm(txt, eps=cfg.eps) * (1 + t_sc2) + t_sh2
    txt = txt + t_g2 * mlp(bp["txt_mlp1"], bp["txt_mlp2"], y
                           ).astype(jnp.float32)
    return img, txt


def qwen_image_forward(params, cfg: QwenImageConfig, img_tokens, t,
                       text_states, rope_cos, rope_sin,
                       attn_backend: str = "auto"):
    """img_tokens: [B, L, 64] packed 2x2 latent patches; t: [B] in [0, 1];
    text_states: [B, Lt, 3584] Qwen2.5-VL hidden states.
    Returns [B, L, patch^2*out_channels] (fp32)."""
    cdt = cfg.compute_dtype
    txt_len = text_states.shape[1]
    img = _dense(img_tokens.astype(cdt), params["img_in"], cdt
                 ).astype(jnp.float32)
    txt = rms_norm(text_states.astype(jnp.float32), params["txt_norm"], 1e-6)
    txt = _dense(txt.astype(cdt), params["txt_in"], cdt).astype(jnp.float32)

    e = timestep_embedding(t, 256)
    vec = _dense(e, params["time_embed"]["in"], jnp.float32)
    vec = _dense(jax.nn.silu(vec), params["time_embed"]["out"], jnp.float32)

    def body(carry, bp):
        img, txt = carry
        img, txt = _block(bp, img, txt, vec, rope_cos, rope_sin, txt_len,
                          cfg, attn_backend)
        return (img, txt), None

    (img, txt), _ = jax.lax.scan(body, (img, txt), params["blocks"])

    m = _dense(jax.nn.silu(vec), params["norm_out"], jnp.float32)
    # diffusers AdaLayerNormContinuous order: (scale, shift)
    scale, shift = jnp.split(m[:, None, :], 2, axis=-1)
    img = layer_norm(img, eps=cfg.eps) * (1 + scale) + shift
    return _dense(img, params["proj_out"], jnp.float32)
