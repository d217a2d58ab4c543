"""Video chore tools for the agent (reference shared/deepy/
video_tools.py — merge/extract/trim/frame/audio/resize).

The reference shells out to ffmpeg; this environment has none, so every
operation is implemented over the in-repo AVI/WAV container code
(utils/media.py) and numpy — same capabilities, no subprocesses."""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from . import media


def video_info(path: str) -> Dict[str, Any]:
    """Frame count / fps / resolution / audio presence."""
    frames = media.read_mjpeg_avi(path)
    meta = media.read_video_metadata(path) or {}
    audio = media.read_avi_audio(path)
    fps = int(meta.get("fps", 16)) if isinstance(meta, dict) else 16
    return {"path": path, "frames": int(frames.shape[0]),
            "height": int(frames.shape[1]), "width": int(frames.shape[2]),
            "fps": fps, "duration_s": frames.shape[0] / max(fps, 1),
            "has_audio": audio is not None}


def _read(path: str):
    frames = media.read_mjpeg_avi(path)
    meta = media.read_video_metadata(path) or {}
    fps = int(meta.get("fps", 16)) if isinstance(meta, dict) else 16
    audio = media.read_avi_audio(path)
    return frames, fps, audio, (meta if isinstance(meta, dict) else {})


def merge_videos(first: str, second: str, output_path: str) -> str:
    """Concatenate two clips (video_tools.py merge_videos:129)."""
    f1, fps, a1, meta = _read(first)
    f2, _, a2, _ = _read(second)
    if f1.shape[1:] != f2.shape[1:]:
        f2 = resize_frames(f2, f1.shape[1], f1.shape[2])
    frames = np.concatenate([f1, f2], axis=0)
    audio = None
    sr = 16000
    if a1 is not None and a2 is not None:
        w1, sr = a1
        w2, sr2 = a2
        if w1.ndim == 1:
            w1 = w1[:, None]
        if w2.ndim == 1:
            w2 = w2[:, None]
        c = max(w1.shape[1], w2.shape[1])
        w1 = np.broadcast_to(w1, (w1.shape[0], c))
        w2 = np.broadcast_to(w2, (w2.shape[0], c))
        audio = np.concatenate([w1, w2], axis=0)
    media.save_video(frames, output_path, fps=fps, metadata=meta,
                     audio=audio, audio_sample_rate=sr)
    return output_path


def extract_video(source: str, output_path: str,
                  start_time: float = 0.0,
                  end_time: Optional[float] = None) -> str:
    """Trim a clip by time (video_tools.py extract_video:171)."""
    frames, fps, audio, meta = _read(source)
    i0 = max(int(round(start_time * fps)), 0)
    i1 = (int(round(end_time * fps)) if end_time is not None
          else frames.shape[0])
    frames = frames[i0:i1]
    wave = sr = None
    if audio is not None:
        w, sr = audio
        s0 = int(start_time * sr)
        s1 = int(end_time * sr) if end_time is not None else w.shape[0]
        wave = w[s0:s1]
    media.save_video(frames, output_path, fps=fps, metadata=meta,
                     audio=wave, audio_sample_rate=sr or 16000)
    return output_path


def extract_video_frame(source: str, output_path: str,
                        frame_no: Optional[int] = None,
                        time_seconds: Optional[float] = None) -> str:
    """One frame as PNG (video_tools.py extract_video_frame:222)."""
    frames, fps, _, meta = _read(source)
    if frame_no is None:
        frame_no = int(round((time_seconds or 0.0) * fps))
    frame_no = int(np.clip(frame_no, 0, frames.shape[0] - 1))
    media.save_image(frames[frame_no], output_path, metadata=meta)
    return output_path


def extract_audio(source: str, output_path: str) -> str:
    """Audio track as WAV (video_tools.py extract_audio:193)."""
    audio = media.read_avi_audio(source)
    if audio is None:
        raise ValueError(f"{source} carries no audio track")
    wave, sr = audio
    media.save_audio(wave, output_path, sample_rate=sr)
    return output_path


def resize_frames(frames: np.ndarray, height: int, width: int
                  ) -> np.ndarray:
    """Bilinear resize of a uint8 frame stack."""
    t, h, w, c = frames.shape
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    fy = np.clip(ys - y0, 0, 1)[None, :, None, None]
    fx = np.clip(xs - x0, 0, 1)[None, None, :, None]
    f = frames.astype(np.float32)
    top = f[:, y0][:, :, x0] * (1 - fx) + f[:, y0][:, :, x1] * fx
    bot = f[:, y1][:, :, x0] * (1 - fx) + f[:, y1][:, :, x1] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def resize_video(source: str, output_path: str, height: int,
                 width: int) -> str:
    frames, fps, audio, meta = _read(source)
    frames = resize_frames(frames, height, width)
    wave, sr = (audio if audio is not None else (None, 16000))
    media.save_video(frames, output_path, fps=fps, metadata=meta,
                     audio=wave, audio_sample_rate=sr)
    return output_path
