"""Media output: images with embedded settings metadata, video files.

The reference saves videos via ffmpeg/av and embeds the generation settings
JSON in the output file metadata so settings can be re-extracted later
(/root/reference/shared/utils/audio_video.py, wgp.py:9742
extract_and_apply_source_images).  This environment has no ffmpeg/PyAV, so:

  - images  -> PNG with a `wan2gp` tEXt chunk holding the settings JSON
  - videos  -> MJPEG-in-AVI written by a pure-Python RIFF muxer (universally
    decodable), plus a sidecar .json with the settings; GIF also supported.
"""
from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Dict, List, Optional

import numpy as np

METADATA_KEY = "wan2gp"


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 (reference _vae_float_to_cpu_uint8,
    models/wan/modules/vae.py:18)."""
    if frames.dtype == np.uint8:
        return frames
    f = np.clip(np.asarray(frames, dtype=np.float32), -1.0, 1.0)
    return np.clip(np.round((f + 1.0) * 127.5), 0, 255).astype(np.uint8)


def save_image(arr: np.ndarray, path: str,
               metadata: Optional[Dict[str, Any]] = None):
    """arr: [H, W, 3] uint8 or [-1,1] float."""
    from PIL import Image
    from PIL.PngImagePlugin import PngInfo
    img = Image.fromarray(to_uint8(arr))
    if path.lower().endswith((".png",)):
        info = PngInfo()
        if metadata is not None:
            info.add_text(METADATA_KEY, json.dumps(metadata))
        img.save(path, pnginfo=info)
    else:
        img.save(path)
        if metadata is not None:
            _write_sidecar(path, metadata)


def read_image_metadata(path: str) -> Optional[Dict[str, Any]]:
    from PIL import Image
    with Image.open(path) as img:
        txt = img.info.get(METADATA_KEY)
    if txt is None:
        return _read_sidecar(path)
    return json.loads(txt)


def _write_sidecar(path: str, metadata: Dict[str, Any]):
    with open(path + ".json", "w") as f:
        json.dump(metadata, f, indent=1)


def _read_sidecar(path: str) -> Optional[Dict[str, Any]]:
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            return json.load(f)
    return None


def _jpeg_bytes(frame: np.ndarray, quality: int) -> bytes:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(frame).save(buf, format="JPEG", quality=quality)
    return buf.getvalue()


def save_video(frames: np.ndarray, path: str, fps: int = 16,
               metadata: Optional[Dict[str, Any]] = None,
               quality: int = 92):
    """frames: [T, H, W, 3] uint8 or [-1,1] float."""
    frames = to_uint8(np.asarray(frames))
    if path.lower().endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    elif path.lower().endswith(".avi"):
        _write_mjpeg_avi(frames, path, fps, quality)
    else:
        raise ValueError(f"unsupported video container: {path}")
    if metadata is not None:
        _write_sidecar(path, metadata)


def read_video_metadata(path: str) -> Optional[Dict[str, Any]]:
    return _read_sidecar(path)


def _write_mjpeg_avi(frames: np.ndarray, path: str, fps: int, quality: int):
    t, h, w, _ = frames.shape
    jpegs: List[bytes] = [_jpeg_bytes(f, quality) for f in frames]

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        data = payload + (b"\x00" if len(payload) % 2 else b"")
        return fourcc + struct.pack("<I", len(payload)) + data

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", int(1e6 / fps), max_bytes * fps, 0, 0x10,  # AVIF_HASINDEX
        t, 0, 1, max_bytes, w, h, 0, 0, 0, 0)
    # AVISTREAMHEADER: flags, priority, language, initial, scale, rate,
    # start, length, bufsize, quality, samplesize + rcFrame
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, t,
                          max_bytes, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

    movi_payload = b"movi"
    offsets = []
    for j in jpegs:
        offsets.append(len(movi_payload))
        movi_payload += chunk(b"00dc", j)
    movi = chunk(b"LIST", movi_payload)

    idx = b""
    for off, j in zip(offsets, jpegs):
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(j))
    idx1 = chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)


def read_mjpeg_avi(path: str) -> np.ndarray:
    """Decode an MJPEG AVI written by save_video (for tests/round-trips)."""
    from PIL import Image
    with open(path, "rb") as f:
        data = f.read()
    frames = []
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        if fourcc == b"LIST":
            kind = data[pos + 8:pos + 12]
            if kind == b"movi":
                sub = pos + 12
                end = pos + 8 + size
                while sub + 8 <= end:
                    cc = data[sub:sub + 4]
                    sz = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                    if cc == b"00dc":
                        jpg = data[sub + 8:sub + 8 + sz]
                        frames.append(np.asarray(
                            Image.open(io.BytesIO(jpg)).convert("RGB")))
                    sub += 8 + sz + (sz % 2)
        pos += 8 + size + (size % 2)
    return np.stack(frames)
