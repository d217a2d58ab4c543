"""MoCha — single-character replacement in a source video.

TPU-native re-implementation of the reference MoCha support
(models/wan/any2video.py:387-412 _build_mocha_latents, :1123-1125):
the conditioning is pure input construction on a standard Wan 14B t2v
DiT — the source video's latents, a first-frame mask latent, and up to
two reference-image latents are concatenated on TIME after the noisy
latents, with segment-wise rope positions:

  target   tokens at t in [1, 1+T),   spatial offsets (1, 1)
  source   tokens at t in [1, 1+Ts),  spatial offsets (1, 1)
  mask     token  at t = 1,           spatial offsets (1, 1)
  ref #1   token  at t = 0,           spatial offsets (1, 1)
  ref #2   token  at t = 0,           spatial offsets (1+h, 1+w)

The scheduler steps on the first T latent frames of the prediction
(any2video.py:1689).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ...ops.rope import build_rope_3d


def nearest_resize_2d(img: np.ndarray, out_h: int, out_w: int
                      ) -> np.ndarray:
    """torch F.interpolate(mode='nearest') on the last two dims."""
    h, w = img.shape[-2:]
    ys = np.floor(np.arange(out_h) * h / out_h).astype(int)
    xs = np.floor(np.arange(out_w) * w / out_w).astype(int)
    return img[..., ys[:, None], xs[None, :]]


def build_mocha_latents(source_latents, mask_frame, ref_latents: List
                        ) -> jnp.ndarray:
    """Conditioning stack [1, 16, Ts+1+R, h, w]
    (any2video.py:387-396): source latents, the first-frame mask
    nearest-resized to the latent grid and broadcast over all 16
    channels as one frame, then the reference-image latents."""
    src = jnp.asarray(source_latents, jnp.float32)
    _, c, _, lat_h, lat_w = src.shape
    m = np.asarray(mask_frame, np.float32)
    if m.ndim == 3:
        m = m[0] if m.shape[0] in (1, 3) else m[..., 0]
    m = nearest_resize_2d(m, lat_h, lat_w)
    mask_lat = jnp.broadcast_to(jnp.asarray(m)[None, None, None],
                                (1, c, 1, lat_h, lat_w))
    refs = [jnp.asarray(r, jnp.float32) for r in ref_latents]
    return jnp.concatenate([src, mask_lat] + refs, axis=2)


def build_mocha_rope(lat_frames: int, src_frames: int, n_ref: int,
                     h_tok: int, w_tok: int, head_dim: int = 128
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Segment-wise rope tables (any2video.py:398-412 append_freq)."""
    segs = [((lat_frames, h_tok, w_tok), (1, 1, 1)),   # target
            ((src_frames, h_tok, w_tok), (1, 1, 1)),   # source video
            ((1, h_tok, w_tok), (1, 1, 1)),            # mask frame
            ((1, h_tok, w_tok), (0, 1, 1))]            # ref 1
    if n_ref > 1:
        segs.append(((1, h_tok, w_tok), (0, 1 + h_tok, 1 + w_tok)))
    cos_parts, sin_parts = [], []
    for grid, off in segs:
        c, s = build_rope_3d(grid, head_dim=head_dim, offsets=off)
        cos_parts.append(c)
        sin_parts.append(s)
    return (jnp.concatenate(cos_parts, axis=0),
            jnp.concatenate(sin_parts, axis=0))
