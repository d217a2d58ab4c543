"""Wan-Move: point-trajectory motion control on the Wan i2v base.

TPU-native re-implementation of /root/reference/models/wan/wanmove/
trajectory.py and its pipeline integration (any2video.py:779-790,
1518-1524):
- tracks [T, N, 2] (x, y pixel coords per output frame; normalized
  inputs are scaled by width/height) are downsampled to latent frames
  and latent-grid cells -> track_pos [N, T', 2] ((y, x), -1 when the
  point is invisible/out of frame);
- replace_feature (trajectory.py:133): for every track and latent frame
  >= 1, the FIRST frame's image-conditioning latent at the track's
  source cell is copied into the track's cell at that frame — dragging
  frame-0 content along the trajectory inside the i2v conditioning
  channels y[4:20];
- CFG runs [y_cond (dragged), y_uncond (untouched)] with
  [context, context_null] (any2video.py:1520-1524).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def tracks_to_latent_pos(tracks: np.ndarray, height: int, width: int,
                         strides: Tuple[int, int, int] = (4, 8, 8),
                         visibility: Optional[np.ndarray] = None
                         ) -> np.ndarray:
    """tracks: [T, N, 2] (x, y) pixel coords (or [0,1]-normalized).
    Returns track_pos [N, T', 2] latent-cell (y, x), -1 = invalid
    (trajectory.py create_pos_feature_map:62, sample strategy)."""
    tracks = np.asarray(tracks, np.float64)
    if tracks.ndim == 4:
        tracks = tracks[0]
    if tracks.size and tracks.max() <= 1.0 + 1e-6:
        tracks = np.round(tracks * np.asarray([width, height]))
    t, n, _ = tracks.shape
    td, hd, wd = strides
    t_lat = (t - 1) // td + 1
    pos = -np.ones((n, t_lat, 2), np.int64)
    for t_idx in range(0, t, td):
        cur = tracks[t_idx]                       # [N, 2] (x, y)
        vis = (visibility[t_idx] if visibility is not None
               else np.ones(n, bool))
        ok = (vis & (cur[:, 0] >= 0) & (cur[:, 1] >= 0)
              & (cur[:, 0] < width) & (cur[:, 1] < height))
        xi = (cur[:, 0] // wd).astype(np.int64)
        yi = (cur[:, 1] // hd).astype(np.int64)
        pos[ok, t_idx // td, 0] = yi[ok]
        pos[ok, t_idx // td, 1] = xi[ok]
    return pos


def replace_track_features(feat: np.ndarray,
                           track_pos: np.ndarray) -> np.ndarray:
    """feat: [C, T', H', W'] image-conditioning latents (the y[4:20]
    slice).  For each track with a valid frame-0 source cell, copy the
    frame-0 feature into the track's cell at every later valid frame
    (trajectory.py replace_feature:133).  Returns a modified copy."""
    feat = np.array(feat)
    n, t_lat, _ = track_pos.shape
    for i in range(n):
        ys, xs = track_pos[i, 0]
        if ys < 0 or xs < 0:
            continue
        src = feat[:, 0, ys, xs]
        for tt in range(1, t_lat):
            yt, xt = track_pos[i, tt]
            if yt < 0 or xt < 0:
                continue
            feat[:, tt, yt, xt] = src
    return feat
