"""LTX-2 rotary embeddings: fractional-position RoPE, interleaved + split.

Re-derivation of /root/reference/models/ltx2/ltx_core/model/transformer/
rope.py (precompute_freqs_cis:489, generate_freq_grid_pytorch:477,
interleaved_freqs_cis:531, split_freqs_cis:516) as host-precomputed numpy
tables; the device-side apply is a plain rotate-pairs (TPU-friendly — no
strided in-place views).

Conventions:
  positions: [n_axes, T] absolute (fractional) grid coordinates per token.
  Tables are returned as (cos, sin) with shape [T, H, half] where
  half = head_dim // 2, ready to rotate [B, T, H, head_dim] activations:
    interleaved: pairs are adjacent features (2i, 2i+1)
    split:       pairs are (i, i + half)
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import jax.numpy as jnp


def video_token_positions(grid, fps: float = 24.0,
                          strides=(8, 32, 32), causal_fix: bool = True,
                          use_middle: bool = True, frame_offset: int = 0):
    """[3, T] (seconds, y_px, x_px) positions for an (F, H, W) latent grid.

    Mirrors patchifiers.py get_patch_grid_bounds + get_pixel_coords:137 +
    tools.py:130-135: latent [start, end) bounds x VAE strides, causal-fix
    on the temporal axis (first frame has unit stride), temporal axis in
    seconds, middle-of-extent positions (use_middle_indices_grid)."""
    f, h, w = grid
    st, sh, sw = strides

    def axis_pos(n, stride, causal=False):
        start = np.arange(n, dtype=np.float64) * stride
        end = start + stride
        if causal and causal_fix:
            start = np.maximum(start + 1 - stride, 0.0)
            end = np.maximum(end + 1 - stride, 0.0)
        return (start + end) / 2.0 if use_middle else start

    tpos = axis_pos(f + frame_offset, st, causal=True)[frame_offset:] / fps
    ypos = axis_pos(h, sh)
    xpos = axis_pos(w, sw)
    ff, yy, xx = np.meshgrid(tpos, ypos, xpos, indexing="ij")
    return np.stack([ff.ravel(), yy.ravel(), xx.ravel()])


def audio_token_positions(t_tokens: int, tokens_per_second: float,
                          use_middle: bool = True, offset: float = 0.0):
    """[1, T] positions in seconds for an audio latent sequence."""
    pos = np.arange(t_tokens, dtype=np.float64)[None]
    if use_middle:
        pos = pos + 0.5
    return pos / tokens_per_second + offset


def _freq_indices(theta: float, n_axes: int, inner_dim: int):
    """generate_freq_grid_pytorch (rope.py:477): theta**linspace(0..1) over
    inner_dim // (2*n_axes) elements, times pi/2."""
    n = inner_dim // (2 * n_axes)
    exps = np.linspace(0.0, 1.0, n, dtype=np.float64)
    return (theta ** exps) * (math.pi / 2.0)


def build_ltx_rope(positions: np.ndarray, inner_dim: int, num_heads: int,
                   max_pos: Sequence[float], theta: float = 10000.0,
                   rope_type: str = "split"):
    """(cos, sin) tables of shape [T, H, half], half = head_dim // 2.

    freqs = indices * (2*pos/max_pos - 1) per axis, interleaved across axes
    per the reference's transpose(-1,-2).flatten(2)."""
    n_axes, t = positions.shape
    head_dim = inner_dim // num_heads
    half = head_dim // 2
    indices = _freq_indices(theta, n_axes, inner_dim)       # [n]
    frac = positions / np.asarray(max_pos, np.float64)[:, None]
    # [T, n_axes, n] -> [T, n*n_axes] with axis-major interleave
    fr = (frac.T[:, :, None] * 2.0 - 1.0) * indices[None, None, :]
    freqs = fr.transpose(0, 2, 1).reshape(t, -1)            # [T, n*n_axes]

    if rope_type == "interleaved":
        cos = np.repeat(np.cos(freqs), 2, axis=-1)          # [T, 2*n*n_axes]
        sin = np.repeat(np.sin(freqs), 2, axis=-1)
        pad = inner_dim - cos.shape[-1]
        if pad:
            cos = np.concatenate([np.ones((t, pad)), cos], axis=-1)
            sin = np.concatenate([np.zeros((t, pad)), sin], axis=-1)
        # adjacent pairs (2i, 2i+1) share one frequency -> keep even cols
        cos = cos.reshape(t, num_heads, head_dim)[..., 0::2]
        sin = sin.reshape(t, num_heads, head_dim)[..., 0::2]
    elif rope_type == "split":
        cos = np.cos(freqs)
        sin = np.sin(freqs)
        pad = num_heads * half - cos.shape[-1]
        if pad:
            cos = np.concatenate([np.ones((t, pad)), cos], axis=-1)
            sin = np.concatenate([np.zeros((t, pad)), sin], axis=-1)
        cos = cos.reshape(t, num_heads, half)
        sin = sin.reshape(t, num_heads, half)
    else:
        raise ValueError(rope_type)
    return (jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32))


def apply_ltx_rope(x, cos, sin, rope_type: str = "split"):
    """Rotate x [B, T, H, head_dim] by (cos, sin) [T, H, half]."""
    half = cos.shape[-1]
    c = cos[None].astype(jnp.float32)
    s = sin[None].astype(jnp.float32)
    xf = x.astype(jnp.float32)
    if rope_type == "interleaved":
        x0 = xf[..., 0::2]
        x1 = xf[..., 1::2]
        r0 = x0 * c - x1 * s
        r1 = x1 * c + x0 * s
        out = jnp.stack([r0, r1], axis=-1).reshape(x.shape)
    else:  # split: pairs (i, i + half)
        x0 = xf[..., :half]
        x1 = xf[..., half:]
        r0 = x0 * c - x1 * s
        r1 = x1 * c + x0 * s
        out = jnp.concatenate([r0, r1], axis=-1)
    return out.astype(x.dtype)
