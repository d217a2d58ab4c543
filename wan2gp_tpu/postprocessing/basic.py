"""Basic post-processing: film grain, spatial upscaling, temporal
interpolation.

Reference: postprocessing/film_grain.py:34 (LTX film grain: channel-weighted
gaussian grain with saturation mix), postprocessing/spatial_upsamplers.py
(lanczos 1.5x/2x), postprocessing/temporal_upsamplers.py (RIFE x2/x4 — here
a motion-free linear-blend interpolator as the dependency-free baseline;
model-based interpolation plugs into the same interface).
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def add_film_grain(frames: np.ndarray, grain_intensity: float = 0.0,
                   saturation: float = 0.5,
                   rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """frames: [T, H, W, 3] in [-1, 1] (or uint8).  Matches
    film_grain.py:12-34: R grain x2, B grain x3, blended toward the G grain
    by (1 - saturation), applied in [0, 1] space."""
    if grain_intensity <= 0:
        return frames
    rng = rng or np.random.default_rng(0)
    was_uint8 = frames.dtype == np.uint8
    x = frames.astype(np.float32)
    if was_uint8:
        x = x / 255.0 * 2.0 - 1.0
    x = (x + 1.0) / 2.0
    grain = rng.standard_normal(x.shape).astype(np.float32)
    grain[..., 0] *= 2.0
    grain[..., 2] *= 3.0
    grain = grain * saturation + grain[..., 1:2] * (1.0 - saturation)
    x = np.clip(x + grain_intensity * grain, 0.0, 1.0)
    x = x * 2.0 - 1.0
    if was_uint8:
        return np.clip((x + 1.0) * 127.5, 0, 255).astype(np.uint8)
    return x


def lanczos_upscale(frames: np.ndarray, scale: float = 2.0) -> np.ndarray:
    """[T, H, W, 3] Lanczos resampling via PIL (spatial_upsamplers.py
    lanczos 1.5x/2x)."""
    from PIL import Image
    from ..utils.media import to_uint8
    u8 = to_uint8(frames)
    t, h, w, _ = u8.shape
    nh, nw = int(round(h * scale)), int(round(w * scale))
    out = np.stack([
        np.asarray(Image.fromarray(f).resize((nw, nh), Image.LANCZOS))
        for f in u8])
    if frames.dtype == np.uint8:
        return out
    return out.astype(np.float32) / 127.5 - 1.0


def temporal_interpolate(frames: np.ndarray, factor: int = 2) -> np.ndarray:
    """Insert factor-1 linearly blended frames between each pair
    (baseline for the RIFE x2/x4 slots; same [T,H,W,C] interface)."""
    if factor <= 1:
        return frames
    x = frames.astype(np.float32)
    out = []
    for i in range(len(x) - 1):
        out.append(x[i])
        for j in range(1, factor):
            a = j / factor
            out.append(x[i] * (1 - a) + x[i + 1] * a)
    out.append(x[-1])
    result = np.stack(out)
    if frames.dtype == np.uint8:
        return np.clip(result, 0, 255).astype(np.uint8)
    return result
