"""Normalization and modulation primitives.

Numerics match the reference implementations (fp32 accumulation, output cast
back to the input dtype):
  - WanRMSNorm      -> rms_norm          (/root/reference/models/wan/modules/model.py:151)
  - WanLayerNorm    -> layer_norm        (model.py:193, eps=1e-6, affine optional)
  - T5LayerNorm     -> rms_norm          (t5.py:56: no mean subtraction, weight outside)
  - adaLN-zero      -> modulate          (model.py:626-632: y = norm(x)*(1+scale)+shift)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


# above this many elements one rms_norm's fp32 upcast gets chunked over the
# token axis (1.44 GB at Wan-14B/720p QK-norm dims [1, 75600, 5120]);
# bit-identical math, fp32 temps become loop-local
_NORM_CHUNK_ELEMS = 64 * 1024 * 1024


def rms_norm(x, weight=None, eps: float = 1e-5):
    """RMS norm with fp32 accumulation: x * rsqrt(mean(x^2) + eps) * weight.
    weight=None -> plain normalization (LTX-2 shared/utils rms_norm).
    Large inputs are processed in token chunks to bound fp32 temps."""
    if (x.ndim >= 3 and x.size > _NORM_CHUNK_ELEMS
            and x.dtype != jnp.float32):
        ax, n, lc = _chunk_axis(x)
        if n > 1:
            def body(i, out):
                xs = jax.lax.dynamic_slice_in_dim(x, i * lc, lc, axis=ax)
                return jax.lax.dynamic_update_slice_in_dim(
                    out, _rms_norm_full(xs, weight, eps), i * lc, axis=ax)

            return jax.lax.fori_loop(0, n, body, jnp.empty_like(x))
    return _rms_norm_full(x, weight, eps)


def _rms_norm_full(x, weight, eps):
    dtype = x.dtype
    y = x.astype(jnp.float32)
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6,
               out_dtype=None):
    """LayerNorm with fp32 accumulation; affine params optional.
    out_dtype: output cast (default x.dtype) — pass the consumer's compute
    dtype when the consumer casts anyway (bit-identical, halves the
    buffer).  Large inputs chunk over the longest middle axis (exact:
    stats are per-last-dim) so the centered fp32 temp stays loop-local."""
    out_dtype = out_dtype or x.dtype
    if x.ndim >= 3 and x.size > _NORM_CHUNK_ELEMS:
        ax, n, lc = _chunk_axis(x)
        if n > 1:
            def body(i, out):
                xs = jax.lax.dynamic_slice_in_dim(x, i * lc, lc, axis=ax)
                return jax.lax.dynamic_update_slice_in_dim(
                    out, _layer_norm_full(xs, weight, bias, eps, out_dtype),
                    i * lc, axis=ax)

            return jax.lax.fori_loop(
                0, n, body, jnp.empty(x.shape, out_dtype))
    return _layer_norm_full(x, weight, bias, eps, out_dtype)


def modulated_layer_norm(x, shift, scale, eps: float = 1e-6,
                         out_dtype=None):
    """Fused adaLN: layer_norm(x) * (1 + scale) + shift, cast to out_dtype,
    chunked over axis 1 for large inputs.

    Bit-identical to the unfused norm -> modulate -> astype chain when the
    consumer casts to out_dtype anyway (the q/k/v and FFN denses do), but
    the fp32 intermediates stay loop-local and the materialized buffer is
    out_dtype-sized (738 MB bf16 instead of 2x 1.44 GB fp32 at
    Wan-14B/720p).  shift/scale: broadcastable over x (e.g. [B, T, 1, C])."""
    out_dtype = out_dtype or x.dtype

    def one(xs, i0, ax):
        y = _layer_norm_full(xs, None, None, eps, jnp.float32)
        sh = shift if shift.shape[ax] == 1 else \
            jax.lax.dynamic_slice_in_dim(shift, i0, xs.shape[ax], axis=ax)
        sc = scale if scale.shape[ax] == 1 else \
            jax.lax.dynamic_slice_in_dim(scale, i0, xs.shape[ax], axis=ax)
        return (y * (1.0 + sc) + sh).astype(out_dtype)

    if x.ndim >= 3 and x.size > _NORM_CHUNK_ELEMS:
        ax, n, lc = _chunk_axis(x)
        if n > 1:
            def body(i, out):
                xs = jax.lax.dynamic_slice_in_dim(x, i * lc, lc, axis=ax)
                return jax.lax.dynamic_update_slice_in_dim(
                    out, one(xs, i * lc, ax), i * lc, axis=ax)

            return jax.lax.fori_loop(
                0, n, body, jnp.empty(x.shape, out_dtype))
    return one(x, 0, 1)


def _chunk_axis(x):
    """Chunk over the longest middle axis — adaLN inputs arrive as
    [B, T_mod, L, C] with T_mod == 1, where chunking axis 1 silently
    disabled and two full-size fp32 temps survived (observed r05:
    2x 1.25 GB at 14B/32.7k tokens)."""
    ax = max(range(1, x.ndim - 1), key=lambda a: x.shape[a])
    want = -(-x.size // _NORM_CHUNK_ELEMS)
    l = x.shape[ax]
    n = next((k for k in range(max(2, want), l + 1) if l % k == 0), 1)
    return ax, n, (l // n if n > 1 else l)


def _layer_norm_full(x, weight, bias, eps, out_dtype=None):
    out_dtype = out_dtype or x.dtype
    y = x.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    y = y - mean
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift, broadcasting over tokens.

    x:     [..., L, C]
    shift: [..., C] or [..., 1, C] (broadcastable)
    scale: same as shift
    """
    return x * (1.0 + scale) + shift
