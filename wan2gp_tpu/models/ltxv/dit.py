"""LTX-Video transformer (0.9.x 2B/13B), TPU-native.

Functional re-implementation of the reference Transformer3DModel
(/root/reference/models/ltx_video/models/transformers/transformer3d.py:46):
PixArt-style blocks with per-block scale_shift_table adaLN (6 params,
attention.py:  ada_values = table + per-token timestep embedding), self-attn
with RMS qk-norm and LTX fractional RoPE (transformer3d.py:192-256: exp-
spaced frequencies over per-token fractional (t,y,x) positions mapped to
[-1,1], applied over the FULL inner_dim before head split), T5 cross-attn,
GEGLU feed-forward, and a final scale_shift_table[2] output head.

Supports STG skip-layer guidance via a per-layer mask that zeroes the
self-attention contribution (pipelines/pipeline_ltx_video.py STG).
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
from ..flux.dit import timestep_embedding


@dataclasses.dataclass(frozen=True)
class LTXVConfig:
    inner_dim: int = 2048
    num_heads: int = 32
    num_layers: int = 28
    in_channels: int = 128
    out_channels: int = 128
    caption_channels: int = 4096
    cross_attention_dim: int = 2048
    rope_theta: float = 10000.0
    max_pos: Sequence[int] = (20, 2048, 2048)   # (t, h, w) frame/pixel units
    eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.inner_dim // self.num_heads


def ltxv_rope(indices_grid, cfg: LTXVConfig, spacing: str = "exp"):
    """indices_grid: [3, L] per-token (t, y, x) coordinates.
    Returns (cos, sin) [L, inner_dim] (exp spacing, transformer3d.py:202)."""
    dim = cfg.inner_dim
    theta = cfg.rope_theta
    frac = np.stack([np.asarray(indices_grid[i], np.float64)
                     / cfg.max_pos[i] for i in range(3)], axis=-1)  # [L, 3]
    n = dim // 6
    indices = theta ** np.linspace(0.0, 1.0, n)       # exp spacing 1..theta
    indices = indices * math.pi / 2.0
    # [L, 3, n] -> transpose -> [L, n, 3] -> flatten [L, 3n]
    freqs = (indices[None, None, :] * (frac[..., None] * 2.0 - 1.0))
    freqs = freqs.transpose(0, 2, 1).reshape(frac.shape[0], -1)
    cos = np.repeat(np.cos(freqs), 2, axis=-1)
    sin = np.repeat(np.sin(freqs), 2, axis=-1)
    pad = dim % 6
    if pad:
        cos = np.concatenate([np.ones((cos.shape[0], pad)), cos], axis=-1)
        sin = np.concatenate([np.zeros((sin.shape[0], pad)), sin], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def make_indices_grid(f, h, w, fps_scale: float = 1.0):
    """[3, f*h*w] token coordinates (latent grid units)."""
    tt, yy, xx = np.meshgrid(np.arange(f) * fps_scale, np.arange(h),
                             np.arange(w), indexing="ij")
    return np.stack([tt.ravel(), yy.ravel(), xx.ravel()])


def _apply_ltxv_rope(x, cos, sin):
    """x: [B, L, D_inner] — interleaved-pair rotation over the full dim."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    c = cos[None, :, 0::2]
    s = sin[None, :, 0::2]
    y0 = x0 * c - x1 * s
    y1 = x1 * c + x0 * s
    y = jnp.stack([y0, y1], axis=-1).reshape(xf.shape)
    return y.astype(dtype)


# ---------------------------------------------------------------------------

def _linear(key, din, dout, dtype, bias=True):
    limit = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def init_ltxv(key, cfg: LTXVConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 16))
    d = cfg.inner_dim
    hd = cfg.head_dim

    def block(key):
        ks = iter(jax.random.split(key, 12))
        def attn(din_kv):
            return {"q": _linear(next(ks), d, d, dtype, bias=True),
                    "k": _linear(next(ks), din_kv, d, dtype, bias=True),
                    "v": _linear(next(ks), din_kv, d, dtype, bias=True),
                    "o": _linear(next(ks), d, d, dtype, bias=True),
                    "norm_q": jnp.ones((d,), jnp.float32),
                    "norm_k": jnp.ones((d,), jnp.float32)}
        return {
            "attn1": attn(d),
            "attn2": attn(cfg.cross_attention_dim),
            "ff1": _linear(next(ks), d, 8 * d, dtype),   # geglu: 2x4d
            "ff2": _linear(next(ks), 4 * d, d, dtype),
            "scale_shift_table": (jax.random.normal(
                next(ks), (6, d), jnp.float32) / math.sqrt(d)),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.num_layers)]
    return {
        "patchify_proj": _linear(next(keys), cfg.in_channels, d, dtype),
        "adaln": {
            "emb": {"in": _linear(next(keys), 256, d, jnp.float32),
                    "out": _linear(next(keys), d, d, jnp.float32)},
            "linear": _linear(next(keys), d, 6 * d, jnp.float32),
        },
        "caption_projection": {
            "fc1": _linear(next(keys), cfg.caption_channels, d, dtype),
            "fc2": _linear(next(keys), d, d, dtype),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "scale_shift_table": (jax.random.normal(next(keys), (2, d),
                                                jnp.float32) / math.sqrt(d)),
        "proj_out": _linear(next(keys), d, cfg.out_channels, jnp.float32),
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


def _attention(p, x, context, cfg, rope=None, attn_backend="auto"):
    # qk RMSNorm over the FULL inner dim (not per head), eps 1e-5, applied
    # BEFORE rope (attention.py:472-473, :1034-1049)
    cdt = cfg.compute_dtype
    q = _dense(x.astype(cdt), p["q"], cdt)
    k = _dense(context.astype(cdt), p["k"], cdt)
    v = _dense(context.astype(cdt), p["v"], cdt)
    q = rms_norm(q, p["norm_q"], 1e-5)
    k = rms_norm(k, p["norm_k"], 1e-5)
    if rope is not None:
        cos, sin = rope
        q = _apply_ltxv_rope(q, cos, sin)
        k = _apply_ltxv_rope(k, cos, sin)
    q = _heads(q, cfg.num_heads)
    k = _heads(k, cfg.num_heads)
    v = _heads(v, cfg.num_heads)
    o = attention(q, k, v, backend=attn_backend)
    o = o.reshape(*x.shape[:2], cfg.inner_dim)
    return _dense(o, p["o"], cdt)


def ltxv_forward(params, cfg: LTXVConfig, latents_tokens, t, caption,
                 rope_cos, rope_sin, skip_layer_mask=None,
                 attn_backend: str = "auto"):
    """latents_tokens: [B, L, in_channels] (LTXV patchifies to voxel tokens);
    t: [B] sigma*1000; caption: [B, Lc, 4096];
    skip_layer_mask: optional [num_layers] 1.0/0.0 — STG zeroes the
    self-attention contribution of masked layers.
    Returns [B, L, out_channels] velocity (fp32)."""
    cdt = cfg.compute_dtype
    b = latents_tokens.shape[0]
    x = _dense(latents_tokens.astype(cdt), params["patchify_proj"], cdt)
    x = x.astype(jnp.float32)

    # AdaLayerNormSingle: t_emb -> silu -> linear(6*dim)
    te = timestep_embedding(t, 256, time_factor=1.0)
    emb = _dense(te, params["adaln"]["emb"]["in"], jnp.float32)
    emb = _dense(jax.nn.silu(emb), params["adaln"]["emb"]["out"], jnp.float32)
    six = _dense(jax.nn.silu(emb), params["adaln"]["linear"], jnp.float32)
    six = six.reshape(b, 1, 6, cfg.inner_dim)

    cap = _dense(caption.astype(cdt), params["caption_projection"]["fc1"], cdt)
    cap = jax.nn.gelu(cap.astype(jnp.float32), approximate=True).astype(cdt)
    cap = _dense(cap, params["caption_projection"]["fc2"], cdt)

    if skip_layer_mask is None:
        skip_layer_mask = jnp.ones((cfg.num_layers,), jnp.float32)
    rope = (rope_cos, rope_sin)

    def body(x, xs):
        bp, keep = xs
        ada = bp["scale_shift_table"][None, None] + six  # [B,1,6,D]
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
            ada[:, :, i] for i in range(6))
        y = layer_norm(x, eps=cfg.eps) * (1 + sc_msa) + sh_msa
        a = _attention(bp["attn1"], y, y, cfg, rope=rope,
                       attn_backend=attn_backend)
        x = x + keep * g_msa * a.astype(jnp.float32)
        # cross-attn (no adaLN, no norm affine — attention.py norm2)
        y = layer_norm(x, eps=cfg.eps)
        x = x + _attention(bp["attn2"], y, cap, cfg,
                           attn_backend=attn_backend).astype(jnp.float32)
        # GEGLU feed-forward
        y = layer_norm(x, eps=cfg.eps) * (1 + sc_mlp) + sh_mlp
        h = _dense(y.astype(cdt), bp["ff1"], cdt)
        h1, h2 = jnp.split(h, 2, axis=-1)
        h = h1 * jax.nn.gelu(h2.astype(jnp.float32),
                             approximate=True).astype(cdt)
        x = x + g_mlp * _dense(h, bp["ff2"], cdt).astype(jnp.float32)
        return x, None

    x, _ = jax.lax.scan(body, x, (params["blocks"], skip_layer_mask))

    table = params["scale_shift_table"][None] + emb[:, None]  # [B,2,D]
    shift, scale = table[:, 0][:, None], table[:, 1][:, None]
    x = layer_norm(x, eps=1e-6) * (1 + scale) + shift
    return _dense(x, params["proj_out"], jnp.float32)
