"""SCAIL — 3D-pose-guided character animation.

TPU-native re-implementation of the reference SCAIL integration:
- models/wan/scail/model_scail.py:8-37 build_scail_pose_tokens — the
  pose video's latents (+ an all-ones 4-ch mask -> 20 channels) go
  through a dedicated `pose_patch_embedding` Conv3d and are APPENDED to
  the main token stream;
- models/wan/any2video.py:850-899 — the reference image's latent is the
  first latent frame (kept noise-free each step, with a tiny
  sigma=exp(N(-5,0.5)) perturbation before encoding), the conditioning
  mask marks only that frame, the pose video is downsampled 0.5x before
  VAE encode, and the pose tokens take rope positions with temporal
  offset 1, spatial width offset 120, built at FULL latent resolution
  then 2x2 average-pooled (any2video.py:884-894);
- output: the tokens past the video span are dropped before the head
  (model.py:1999 x[:, :real_seq]) and the ref latent frame is trimmed
  after decode.

The driving pose video is expected pre-rendered (the reference runs an
NLF 3D-pose extractor + cylinder renderer in preprocessing; any skeleton
renderer — e.g. preprocessing/dwpose — can feed this).
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.rope import build_rope_3d


def downsample_half(frames: np.ndarray) -> np.ndarray:
    """Bilinear 0.5x spatial downsample of [T, H, W, 3]
    (any2video.py:876 smpl_downsample)."""
    t, h, w, c = frames.shape
    return np.asarray(jax.image.resize(
        jnp.asarray(frames, jnp.float32),
        (t, max(1, h // 2), max(1, w // 2), c), "bilinear"))


def scail_pose_input(pose_latents) -> jnp.ndarray:
    """[1, 16, t, h, w] -> [1, 20, t, h, w] with the all-ones mask
    (model_scail.py:27-35)."""
    z = jnp.asarray(pose_latents, jnp.float32)
    ones = jnp.ones((z.shape[0], 4, *z.shape[2:]), jnp.float32)
    return jnp.concatenate([z, ones], axis=1)


def build_scail_pose_rope(pose_grid_t: int, h_tok: int, w_tok: int,
                          head_dim: int = 128, t_offset: int = 1
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pose-token rope (any2video.py:884-894): positions
    (t in [t_offset, t_offset+T), h in [0, H), w in [120, 120+W)) built
    on the FULL latent token grid, then 2x2 average-pooled to the
    half-res pose grid.  SCAIL-2 reuses this with t_offset = number of
    reference frames (scail2/__init__.py:804,814)."""
    cos, sin = build_rope_3d((pose_grid_t, h_tok, w_tok),
                             head_dim=head_dim,
                             offsets=(t_offset, 0, 120))
    d = cos.shape[-1]

    def pool(tab):
        t4 = np.asarray(tab).reshape(pose_grid_t, h_tok, w_tok, d)
        t4 = t4[:, :h_tok - h_tok % 2, :w_tok - w_tok % 2]
        t4 = t4.reshape(pose_grid_t, h_tok // 2, 2, w_tok // 2, 2, d)
        return jnp.asarray(t4.mean(axis=(2, 4)).reshape(-1, d))

    return pool(cos), pool(sin)


def build_scail_masks(lat_t: int, lat_h: int, lat_w: int) -> jnp.ndarray:
    """y = [msk_ref(1 frame, kept) | msk_control(lat_t, generated)]
    (any2video.py:871-874 get_i2v_mask folds)."""
    ref = np.ones((4, 1, lat_h, lat_w), np.float32)
    ctl = np.zeros((4, lat_t, lat_h, lat_w), np.float32)
    return jnp.asarray(np.concatenate([ref, ctl], axis=1))[None]
