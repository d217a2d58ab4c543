"""Classifier-free guidance variants, jit-compatible.

  - standard CFG + CFG-Zero* rescale (reference models/wan/any2video.py:67
    `optimized_scale` and :1664-1679; note the reference's zeroing branch at
    :1674 is dead code — the final combine always runs — so the effective
    behavior is: alpha-rescale the uncond branch only when step > zero_step).
  - APG, adaptive projected guidance with momentum buffer
    (any2video.py:33-66, MomentumBuffer + adaptive_projected_guidance;
    defaults momentum -0.75, norm_threshold 55, any2video.py:1444-1446).
"""
from __future__ import annotations

import jax.numpy as jnp


def optimized_scale(positive, negative, eps: float = 1e-8):
    """Per-sample projection scale <pos,neg>/||neg||^2 (any2video.py:67)."""
    b = positive.shape[0]
    pos = positive.reshape(b, -1).astype(jnp.float32)
    neg = negative.reshape(b, -1).astype(jnp.float32)
    dot = jnp.sum(pos * neg, axis=1)
    sq = jnp.sum(neg * neg, axis=1) + eps
    return (dot / sq).reshape(b, *([1] * (positive.ndim - 1)))


def cfg_combine(v_cond, v_uncond, guide_scale, use_alpha):
    """noise_pred = uncond' + g*(cond - uncond'); uncond' = alpha*uncond when
    use_alpha (CFG-Zero*), else uncond."""
    alpha = optimized_scale(v_cond, v_uncond)
    u = jnp.where(use_alpha, alpha * v_uncond, v_uncond)
    return u + guide_scale * (v_cond - u)


def apg_init(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def apg_update(diff, pred_cond, momentum_buf, momentum: float = -0.75,
               norm_threshold: float = 55.0, eta: float = 0.0):
    """One APG step.  Returns (guidance_term, new_momentum_buf).

    Mirrors multitalk_utils.py:339-380: momentum buffer
    running = diff + momentum*running; clip by L2 norm over all non-batch
    dims; project out (keep eta of) the component parallel to pred_cond,
    where pred_cond is L2-normalized over all non-batch dims.
    """
    axes = tuple(range(1, diff.ndim))
    diff = diff.astype(jnp.float32)
    buf = diff + momentum * momentum_buf
    d = buf
    norm = jnp.sqrt(jnp.sum(d * d, axis=axes, keepdims=True))
    d = d * jnp.minimum(1.0, norm_threshold / jnp.maximum(norm, 1e-12))
    v1 = pred_cond.astype(jnp.float32)
    v1 = v1 / jnp.maximum(
        jnp.sqrt(jnp.sum(v1 * v1, axis=axes, keepdims=True)), 1e-12)
    parallel = jnp.sum(d * v1, axis=axes, keepdims=True) * v1
    return (d - parallel) + eta * parallel, buf
