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


def rms_norm(x, weight=None, eps: float = 1e-5):
    """RMS norm with fp32 accumulation: x * rsqrt(mean(x^2) + eps) * weight.
    weight=None -> plain normalization (LTX-2 shared/utils rms_norm)."""
    dtype = x.dtype
    y = x.astype(jnp.float32)
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    return y.astype(dtype)


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm with fp32 accumulation; affine params optional."""
    dtype = x.dtype
    y = x.astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    y = y - mean
    var = jnp.mean(y * y, axis=-1, keepdims=True)
    y = y * jax.lax.rsqrt(var + eps)
    if weight is not None:
        y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(dtype)


def modulate(x, shift, scale):
    """adaLN modulation: x * (1 + scale) + shift, broadcasting over tokens.

    x:     [..., L, C]
    shift: [..., C] or [..., 1, C] (broadcastable)
    scale: same as shift
    """
    return x * (1.0 + scale) + shift
