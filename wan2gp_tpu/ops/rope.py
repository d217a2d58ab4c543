"""3D rotary position embeddings (Wan / HunyuanVideo convention).

The reference builds per-axis 1D RoPE tables over the (t, h, w) token grid and
concatenates them along the feature dim (rope_dim_list=[44,42,42] for
head_dim=128), using the *interleaved-pair* convention with cos/sin tables
repeat-interleaved by 2:

    out[2i]   = x[2i]   * cos[2i]   - x[2i+1] * sin[2i]
    out[2i+1] = x[2i+1] * cos[2i+1] + x[2i]   * sin[2i+1]

(cos[2i] == cos[2i+1], likewise sin.)  See
/root/reference/models/wan/modules/posemb_layers.py:346 (get_nd_rotary_pos_embed),
:231 (_apply_rope_inplace_inner), :492 (get_rotary_pos_embed: patch (1,2,2),
theta 10000, rope_dim_list [44,42,42]), and model.py:81 (rope_params_riflex).

Instead of repeat-interleaved [S, D] tables we store compact [S, D/2] cos/sin
tables and rotate (even, odd) lanes explicitly — fewer bytes of HBM traffic and
a layout Pallas kernels can consume directly.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _axis_freqs(dim: int, positions: np.ndarray, theta: float = 10000.0,
                riflex_k: int | None = None, riflex_L: int | None = None):
    """Per-axis inverse frequencies and angle table [len(positions), dim//2]."""
    assert dim % 2 == 0
    inv = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    if riflex_k is not None:
        # RIFLEx: pin the intrinsic frequency so one period covers ~90% of L.
        inv[riflex_k - 1] = 0.9 * 2.0 * np.pi / riflex_L
    return np.outer(positions.astype(np.float64), inv)


def build_rope_3d(grid_fhw, head_dim: int = 128, theta: float = 10000.0,
                  enable_riflex: bool = False, riflex_k: int = 6,
                  dtype=jnp.float32, offsets=(0, 0, 0)):
    """Build compact cos/sin RoPE tables for a 3D token grid.

    grid_fhw: (F, H, W) token-grid sizes (after patchification).
    offsets:  per-axis starting positions — segments of a composite grid
    (reference posemb_layers.py get_nd_rotary_pos_embed takes
    (start, end) position ranges; e.g. MoCha's reference-image tokens sit
    at t=0 with shifted spatial windows, any2video.py:400-410).
    Returns (cos, sin), each [F*H*W, head_dim//2] in `dtype`.

    Feature-dim split per reference: t-axis gets head_dim//2 - 2*(head_dim//6
    rounded to even pairs) -> for 128: [44, 42, 42] (see posemb_layers.py:492
    with rope_dim_list default [44, 42, 42]).
    """
    f, h, w = (int(v) for v in grid_fhw)
    f0, h0, w0 = (int(v) for v in offsets)
    if head_dim == 128:
        dims = (44, 42, 42)
    else:
        # General split mirroring the [D-4*(D//6 rounded), 2*(..), 2*(..)] shape.
        d_sp = 2 * ((head_dim // 6) // 2) * 2  # even, pairs of 2
        dims = (head_dim - 2 * d_sp, d_sp, d_sp)
    assert sum(dims) == head_dim

    tf = _axis_freqs(dims[0], np.arange(f0, f0 + f), theta,
                     riflex_k=riflex_k if enable_riflex else None,
                     riflex_L=f if enable_riflex else None)  # [F, d0/2]
    th = _axis_freqs(dims[1], np.arange(h0, h0 + h), theta)   # [H, d1/2]
    tw = _axis_freqs(dims[2], np.arange(w0, w0 + w), theta)   # [W, d2/2]

    # Broadcast to the full grid and concatenate along feature dim.
    full = np.concatenate([
        np.broadcast_to(tf[:, None, None, :], (f, h, w, tf.shape[-1])),
        np.broadcast_to(th[None, :, None, :], (f, h, w, th.shape[-1])),
        np.broadcast_to(tw[None, None, :, :], (f, h, w, tw.shape[-1])),
    ], axis=-1).reshape(f * h * w, head_dim // 2)

    return (jnp.asarray(np.cos(full), dtype=dtype),
            jnp.asarray(np.sin(full), dtype=dtype))


# above this many elements the fp32 intermediates of one rope application
# (~6x the bf16 input) get chunked over the sequence axis: at Wan-14B/720p
# dims ([1, 75600, 40, 64]) the unchunked temps are 2x 1.44 GB fp32, which
# is what pushed the TeaCache bench over a 16 GB v5e's HBM
_ROPE_CHUNK_ELEMS = 64 * 1024 * 1024


def apply_rope(x, cos, sin):
    """Apply interleaved-pair RoPE.

    x:   [B, L, N, D] (or any shape with L in axis 1 and D last)
    cos: [L, D//2] shared, or [B, L, D//2] per-batch-element tables
         (sub-parallel windows use different frame offsets per window)

    Computation in fp32 (matches reference USE_FP32_ROPE_FREQS=True path,
    posemb_layers.py:262-270), output cast back to x.dtype.  Large inputs
    are processed in sequence chunks (bit-identical math) to bound the
    fp32 intermediates.
    """
    if x.size > _ROPE_CHUNK_ELEMS and x.ndim >= 3:
        return _apply_rope_chunked(x, cos, sin)
    return _apply_rope_full(x, cos, sin)


def _seq_chunks(length: int, want: int) -> int:
    """Smallest chunk count >= want that divides length evenly (so every
    chunk is the same static shape); 1 when length has no such divisor."""
    for c in range(max(2, want), length + 1):
        if length % c == 0:
            return c
    return 1


def _apply_rope_chunked(x, cos, sin):
    n = _seq_chunks(x.shape[1], -(-x.size // _ROPE_CHUNK_ELEMS))
    if n <= 1:
        return _apply_rope_full(x, cos, sin)
    lc = x.shape[1] // n
    ax = 1 if cos.ndim == 3 else 0

    def body(i, out):
        start = i * lc
        xs = jax.lax.dynamic_slice_in_dim(x, start, lc, axis=1)
        cs = jax.lax.dynamic_slice_in_dim(cos, start, lc, axis=ax)
        ss = jax.lax.dynamic_slice_in_dim(sin, start, lc, axis=ax)
        return jax.lax.dynamic_update_slice_in_dim(
            out, _apply_rope_full(xs, cs, ss), start, axis=1)

    return jax.lax.fori_loop(0, n, body, jnp.empty_like(x))


def _apply_rope_full(x, cos, sin):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    x_pairs = xf.reshape(*xf.shape[:-1], -1, 2)
    x0 = x_pairs[..., 0]
    x1 = x_pairs[..., 1]
    extra = x0.ndim - 2
    if cos.ndim == 3:  # [B, L, D/2] -> [B, L, 1, D/2]
        shape = (cos.shape[0], cos.shape[1]) + (1,) * (extra - 1) \
            + (cos.shape[2],)
    else:              # [L, D/2] -> [1, L, 1, D/2]
        shape = (1, cos.shape[0]) + (1,) * (extra - 1) + (cos.shape[1],)
    c = cos.astype(jnp.float32).reshape(shape)
    s = sin.astype(jnp.float32).reshape(shape)
    y0 = x0 * c - x1 * s
    y1 = x1 * c + x0 * s
    y = jnp.stack([y0, y1], axis=-1).reshape(xf.shape)
    return y.astype(dtype)
