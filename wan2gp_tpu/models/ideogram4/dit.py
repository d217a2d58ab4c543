"""Ideogram 4 transformer, TPU-native.

Functional re-implementation of the reference Ideogram4Transformer
(/root/reference/models/ideogram4/modeling_ideogram4.py): a packed
[text, image] single-stream DiT with
- Qwen2-VL-style interleaved MRoPE (:62-91): the first
  ``3 * max(mrope_section[1:])`` rotary frequencies interleave
  (t, h, w) axes with stride 3, the remainder stay temporal;
- per-head q/k RMSNorm before rope (:105-137);
- tanh-gated 4-way adaLN per block with sandwich RMSNorms (:180-228);
- a 13-layer Qwen3-VL hidden-state concatenation as the text
  conditioning stream, RMS-normed then projected (:300-303);
- a 2-entry "image indicator" embedding added to every token (:306).

TPU-first layout: rope cos/sin and the packed-sequence masks are
host-precomputed (see pipeline.build_ideogram_layout) and consumed as
plain arrays; the 34 blocks run under lax.scan over stacked params; the
segment/padding attention mask maps onto the Pallas kv_mask flash
kernel (real tokens all share one segment, so key validity is the only
constraint that matters for surviving rows — pad rows are discarded).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class Ideogram4Config:
    dim: int = 4608
    n_layers: int = 34
    n_heads: int = 18
    ffn_dim: int = 12288
    adaln_dim: int = 512
    in_channels: int = 128
    llm_hidden: int = 4096
    llm_taps: int = 13
    rope_theta: float = 5_000_000.0
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    norm_eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def llm_features_dim(self):
        return self.llm_hidden * self.llm_taps


# reference constants.py indicator codes
OUTPUT_IMAGE_INDICATOR = 2
LLM_TOKEN_INDICATOR = 3
IMAGE_POSITION_OFFSET = 65536


def ideogram_rope_tables(cfg: Ideogram4Config,
                         position_ids: np.ndarray) -> Tuple[np.ndarray,
                                                            np.ndarray]:
    """position_ids: [B, L, 3] (t, h, w) -> cos/sin [B, L, head_dim//2].

    Interleave per modeling_ideogram4.py:83-88: freq index j belongs to
    axis (j % 3) for j < 3*section[axis] (h at offset 1, w at offset 2),
    temporal otherwise.
    """
    half = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2,
                                              dtype=np.float64) /
                                    cfg.head_dim))
    pos = position_ids.astype(np.float64)              # [B, L, 3]
    freqs = pos[..., None, :] * inv[None, None, :, None]   # [B, L, half, 3]
    axis_of = np.zeros((half,), np.int64)
    for axis in (1, 2):
        idx = np.arange(axis, cfg.mrope_section[axis] * 3, 3)
        axis_of[idx] = axis
    ft = np.take_along_axis(
        freqs, axis_of[None, None, :, None], axis=-1)[..., 0]
    return np.cos(ft).astype(np.float32), np.sin(ft).astype(np.float32)


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def _apply_half_rope(x, cos, sin):
    """x: [B, L, H, D]; cos/sin: [B, L, D//2] (split-half rotation)."""
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    return jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)


def _block(p, cfg: Ideogram4Config, x, adaln, cos, sin, kv_mask,
           attn_backend):
    b, l, d = x.shape
    n, hd = cfg.n_heads, cfg.head_dim
    mod = jnp.dot(adaln, p["adaln"]["w"].astype(x.dtype)) + \
        p["adaln"]["b"].astype(x.dtype)                  # [B, 1, 4D]
    s_msa, g_msa, s_mlp, g_mlp = jnp.split(mod, 4, axis=-1)
    s_msa, s_mlp = s_msa + 1.0, s_mlp + 1.0
    g_msa, g_mlp = jnp.tanh(g_msa), jnp.tanh(g_mlp)

    h = _rms(x, p["attention_norm1"], cfg.norm_eps) * s_msa
    q = jnp.dot(h, p["q"].astype(h.dtype)).reshape(b, l, n, hd)
    k = jnp.dot(h, p["k"].astype(h.dtype)).reshape(b, l, n, hd)
    v = jnp.dot(h, p["v"].astype(h.dtype)).reshape(b, l, n, hd)
    q = _rms(q, p["norm_q"], 1e-5)
    k = _rms(k, p["norm_k"], 1e-5)
    q = _apply_half_rope(q, cos, sin)
    k = _apply_half_rope(k, cos, sin)
    o = attention(q, k, v, backend=attn_backend, kv_mask=kv_mask)
    o = jnp.dot(o.reshape(b, l, d), p["o"].astype(x.dtype))
    x = x + _rms(o, p["attention_norm2"], cfg.norm_eps) * g_msa

    f = _rms(x, p["ffn_norm1"], cfg.norm_eps) * s_mlp
    f = jax.nn.silu(jnp.dot(f, p["w1"].astype(f.dtype))) * \
        jnp.dot(f, p["w3"].astype(f.dtype))
    f = jnp.dot(f, p["w2"].astype(x.dtype))
    x = x + _rms(f, p["ffn_norm2"], cfg.norm_eps) * g_mlp
    return x


def _t_embedding(p, cfg: Ideogram4Config, t):
    """t: [B] in [0, 1] -> [B, dim] (Ideogram4EmbedScalar, range (0, 1),
    sinusoid of 1e4 * t with scale 1e4)."""
    dim = cfg.dim
    half = dim // 2
    scaled = 1e4 * t.astype(jnp.float32)
    freq = jnp.exp(jnp.arange(half, dtype=jnp.float32) *
                   (-math.log(1e4) / (half - 1)))
    emb = scaled[:, None] * freq[None]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    emb = emb.astype(cfg.compute_dtype)
    emb = jax.nn.silu(jnp.dot(emb, p["mlp_in"]["w"]) + p["mlp_in"]["b"])
    return jnp.dot(emb, p["mlp_out"]["w"]) + p["mlp_out"]["b"]


def ideogram_forward(params, cfg: Ideogram4Config, img_latents, t,
                     llm_features, text_valid, cos, sin, kv_mask,
                     attn_backend: str = "auto"):
    """img_latents: [B, Ni, 128]; llm_features: [B, Nt, llm_feat] (may have
    Nt == 0 for the unconditional transformer); text_valid: [B, Nt] float
    (1 on real text tokens); cos/sin: [B, Nt+Ni, head_dim//2]; kv_mask:
    [B, Nt+Ni] bool.  Returns velocity over image tokens [B, Ni, 128].

    Packed-stream assembly per modeling_ideogram4.py:313-345: text rows =
    proj(RMS(llm_features)) + indicator_embed[0], image rows =
    input_proj(z) + indicator_embed[1]; pad rows carry indicator_embed[0]
    only and are excluded from attention keys via kv_mask.
    """
    cdt = cfg.compute_dtype
    nt = llm_features.shape[1]
    ind = params["embed_image_indicator"].astype(cdt)    # [2, dim]

    img = jnp.dot(img_latents.astype(cdt), params["input_proj"]["w"]) + \
        params["input_proj"]["b"]
    img = img + ind[1]
    if nt > 0:
        txt = llm_features.astype(cdt) * text_valid[:, :, None].astype(cdt)
        txt = _rms(txt, params["llm_cond_norm"], 1e-6)
        txt = jnp.dot(txt, params["llm_cond_proj"]["w"]) + \
            params["llm_cond_proj"]["b"]
        txt = txt * text_valid[:, :, None].astype(cdt)
        x = jnp.concatenate([txt + ind[0], img], axis=1)
    else:
        x = img

    t_cond = _t_embedding(params["t_embedding"], cfg, t)[:, None]  # [B,1,D]
    adaln = jax.nn.silu(jnp.dot(t_cond, params["adaln_proj"]["w"]) +
                        params["adaln_proj"]["b"])

    def body(h, lp):
        return _block(lp, cfg, h, adaln, cos, sin, kv_mask,
                      attn_backend), None
    x, _ = jax.lax.scan(body, x, params["layers"])

    fl = params["final_layer"]
    scale = jnp.dot(jax.nn.silu(adaln), fl["adaln"]["w"].astype(cdt)) + \
        fl["adaln"]["b"].astype(cdt)
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    x = ((x32 - mean) * jax.lax.rsqrt(var + 1e-6)).astype(cdt)
    x = x * (1.0 + scale)
    out = jnp.dot(x, fl["linear"]["w"]) + fl["linear"]["b"]
    return out[:, nt:].astype(jnp.float32)


# ---------------------------------------------------------------------------
# init (random, for tests)
# ---------------------------------------------------------------------------

def init_ideogram4(key, cfg: Ideogram4Config, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    d, hd = cfg.dim, cfg.head_dim
    keys = iter(jax.random.split(key, 16))

    def lin(key, din, dout, bias=True):
        s = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                     -s, s).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def mat(key, din, dout):
        s = math.sqrt(6.0 / (din + dout))
        return jax.random.uniform(key, (din, dout), jnp.float32,
                                  -s, s).astype(dtype)

    def layer(key):
        ks = iter(jax.random.split(key, 8))
        return {"q": mat(next(ks), d, d), "k": mat(next(ks), d, d),
                "v": mat(next(ks), d, d), "o": mat(next(ks), d, d),
                "norm_q": jnp.ones((hd,), dtype),
                "norm_k": jnp.ones((hd,), dtype),
                "attention_norm1": jnp.ones((d,), dtype),
                "attention_norm2": jnp.ones((d,), dtype),
                "ffn_norm1": jnp.ones((d,), dtype),
                "ffn_norm2": jnp.ones((d,), dtype),
                "w1": mat(next(ks), d, cfg.ffn_dim),
                "w3": mat(next(ks), d, cfg.ffn_dim),
                "w2": mat(next(ks), cfg.ffn_dim, d),
                "adaln": lin(next(ks), cfg.adaln_dim, 4 * d)}

    lkeys = jax.random.split(next(keys), cfg.n_layers)
    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[layer(k) for k in lkeys])
    return {"input_proj": lin(next(keys), cfg.in_channels, d),
            "llm_cond_norm": jnp.ones((cfg.llm_features_dim,), dtype),
            "llm_cond_proj": lin(next(keys), cfg.llm_features_dim, d),
            "t_embedding": {"mlp_in": lin(next(keys), d, d),
                            "mlp_out": lin(next(keys), d, d)},
            "adaln_proj": lin(next(keys), d, cfg.adaln_dim),
            "embed_image_indicator":
                jax.random.normal(next(keys), (2, d)).astype(dtype) * 0.02,
            "layers": layers,
            "final_layer": {"linear": lin(next(keys), d, cfg.in_channels),
                            "adaln": lin(next(keys), cfg.adaln_dim, d)}}
