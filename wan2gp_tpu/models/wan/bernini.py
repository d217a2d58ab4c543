"""Bernini — compositional multi-source guidance video editing.

TPU-native re-implementation of the reference Bernini support:
- sources (models/wan/any2video.py:950-966): the control video's and
  each reference image's VAE latents are patch-embedded with the MAIN
  patch embedding and appended to the token stream
  (modules/model.py:1587-1605), each under the standard grid rope
  ROTATED by a constant per-source phase
  (posemb_layers.py:484-490 apply_rotary_source_id — a 1D rotary at
  position `source_id` multiplied into the whole table);
- guidance (any2video.py:1567-1583, 1604-1607): branch decomposition
  with coefficients (1-ωv, ωv-ωi, ωi-ωti, ωti) over source subsets
  ("", V, VI) and cond/null contexts; the prediction is the
  coefficient-weighted sum of the branches;
- the appended source tokens are dropped before the head
  (model.py:1997 bernini_output_slices).
"""
from __future__ import annotations

from typing import List, Tuple

import numpy as np
import jax.numpy as jnp


def rotate_rope_source(cos, sin, source_id: int):
    """Apply the per-source constant phase (posemb_layers.py:484-490):
    angle addition with theta_j = source_id / 10000^(2j/d) over the
    compact [S, D/2] tables."""
    if source_id in (None, 0):
        return cos, sin
    d2 = cos.shape[-1]
    inv = 1.0 / (10000.0 ** (np.arange(d2, dtype=np.float64) / d2))
    ang = source_id * inv
    sc = jnp.asarray(np.cos(ang), cos.dtype)
    ss = jnp.asarray(np.sin(ang), cos.dtype)
    return cos * sc - sin * ss, sin * sc + cos * ss


def bernini_branch_defs(has_video: bool, has_images: bool,
                        omega_v: float, omega_i: float, omega_ti: float
                        ) -> List[Tuple[float, str, bool]]:
    """(coefficient, source-subset key, use_cond_context) per branch
    (any2video.py:1569-1578); zero-coefficient branches dropped."""
    if has_video and has_images:
        defs = [(1 - omega_v, "", False), (omega_v - omega_i, "V", False),
                (omega_i - omega_ti, "VI", False), (omega_ti, "VI", True)]
    elif has_video:
        defs = [(1 - omega_ti, "V", False), (omega_ti, "V", True)]
    elif has_images:
        defs = [(1 - omega_i, "", False), (omega_i - omega_ti, "I", False),
                (omega_ti, "I", True)]
    else:
        defs = [(1 - omega_ti, "", False), (omega_ti, "", True)]
    return [d for d in defs if d[0] != 0]


def sources_for_key(key: str, video_sources, image_sources):
    """Source subset per branch key (any2video.py:963-966):
    V -> videos with ids 1..nv; I -> images with ids 1..ni;
    VI -> videos 1..nv then images nv+1.."""
    if key == "V":
        return [(lat, i + 1) for i, lat in enumerate(video_sources)]
    if key == "I":
        return [(lat, i + 1) for i, lat in enumerate(image_sources)]
    if key == "VI":
        nv = len(video_sources)
        return ([(lat, i + 1) for i, lat in enumerate(video_sources)]
                + [(lat, nv + i + 1)
                   for i, lat in enumerate(image_sources)])
    return []
