"""SCAIL-2 — reference-driven character animation with mask-token
conditioning.

TPU-native re-implementation of the reference SCAIL-2 integration
(models/wan/scail2/__init__.py):
- extract_and_compress_mask_to_latent:140-182 — an RGB color-coded mask
  video becomes 28 binary latent channels: 7 one-hot color combos
  (white/r/g/b/yellow/magenta/cyan at >225/255), area-pooled 8x
  spatially, first frame repeated 4x then folded 4-into-channels;
- build_scail2_pose_tokens:508-521 — pose latents (+ones mask, 20ch)
  through `pose_patch_embedding` PLUS driving masks (28ch) through
  `mask_patch_embedding`, appended to the token stream;
- prepare_scail2_conditioning:701-821 — the matted reference image's
  latent (+ones mask) is PREPENDED on time, its 28-ch mask embedding is
  ADDED to the tokens, and the output slice drops the reference frames
  (modules/model.py:1578-1585, 1610-1614); pose rope = temporal offset
  after the refs, width offset 120, full-res then 2x2 avg-pooled.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

# (r, g, b) on-bits per channel: white, red, green, blue, yellow,
# magenta, cyan (scail2/__init__.py:185 SCAIL2_COLOR_BITS)
COLOR_BITS = ((True, True, True), (True, False, False),
              (False, True, False), (False, False, True),
              (True, True, False), (True, False, True),
              (False, True, True))


def adaptive_avg_pool_2d(x: np.ndarray, out_h: int, out_w: int
                         ) -> np.ndarray:
    """torch F.interpolate(mode='area') / adaptive_avg_pool2d on the
    last two dims."""
    h, w = x.shape[-2:]
    out = np.empty((*x.shape[:-2], out_h, out_w), np.float32)
    for i in range(out_h):
        y0, y1 = (i * h) // out_h, -(-((i + 1) * h) // out_h)
        for j in range(out_w):
            x0, x1 = (j * w) // out_w, -(-((j + 1) * w) // out_w)
            out[..., i, j] = x[..., y0:y1, x0:x1].mean(axis=(-2, -1))
    return out


def compress_mask_to_latent(mask_thwc: np.ndarray,
                            temporal_stride: int = 4) -> np.ndarray:
    """RGB mask video [T, H, W, 3] in [-1, 1] -> [28, T_lat, h, w]
    binary latent channels (scail2/__init__.py:140-182)."""
    m = np.asarray(mask_thwc, np.float32)
    if m.ndim == 3:
        m = np.repeat(m[..., None], 3, axis=-1)
    t, h, w, _ = m.shape
    thr = (225.0 - 127.5) / 127.5
    bits = m > thr                                    # [T, H, W, 3]
    chans = []
    for r, g, b in COLOR_BITS:
        c = np.ones((t, h, w), bool)
        for k, want in enumerate((r, g, b)):
            c &= bits[..., k] if want else ~bits[..., k]
        chans.append(c.astype(np.float32))
    m7 = np.stack(chans, axis=1)                      # [T, 7, H, W]

    h_lat, w_lat = h, w
    for _ in range(3):
        h_lat = (h_lat + 1) // 2
        w_lat = (w_lat + 1) // 2
    m7 = adaptive_avg_pool_2d(m7, h_lat, w_lat)

    t_lat = (t - 1) // temporal_stride + 1
    target_t = t_lat * temporal_stride
    padded = np.concatenate([np.repeat(m7[:1], temporal_stride, axis=0),
                             m7[1:]], axis=0)
    if padded.shape[0] < target_t:
        padded = np.concatenate(
            [padded, np.repeat(padded[-1:],
                               target_t - padded.shape[0], axis=0)])
    else:
        padded = padded[:target_t]
    out = padded.reshape(t_lat, temporal_stride * 7, h_lat, w_lat)
    return out.transpose(1, 0, 2, 3)


def with_ones_mask(latents) -> jnp.ndarray:
    """[1, 16, t, h, w] -> [1, 20, t, h, w] (ones 4-ch mask appended,
    scail2/__init__.py:516-517, model.py:1582-1583)."""
    z = jnp.asarray(latents, jnp.float32)
    ones = jnp.ones((z.shape[0], 4, *z.shape[2:]), jnp.float32)
    return jnp.concatenate([z, ones], axis=1)


def build_scail2_main_rope(n_ref: int, lat_t: int, h_tok: int,
                           w_tok: int, head_dim: int = 128,
                           replace: bool = False
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Main-token rope (scail2/__init__.py:805-814): refs+video share a
    continuous temporal axis, except in replace mode where the refs sit
    at t=0 with a spatial height offset of 120."""
    from ...ops.rope import build_rope_3d
    if not replace:
        return build_rope_3d((n_ref + lat_t, h_tok, w_tok),
                             head_dim=head_dim)
    rc, rs = build_rope_3d((n_ref, h_tok, w_tok), head_dim=head_dim,
                           offsets=(0, 120, 0))
    vc, vs = build_rope_3d((lat_t, h_tok, w_tok), head_dim=head_dim)
    return (jnp.concatenate([rc, vc]), jnp.concatenate([rs, vs]))
