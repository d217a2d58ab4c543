"""Media output: images/videos with embedded settings metadata, audio files.

The reference saves videos via ffmpeg/av, writes audio tracks with
`save_audio_file` and muxes them into the video with
`combine_video_with_audio_tracks` (/root/reference/shared/utils/
audio_video.py:377,:613), embedding the generation-settings JSON in the
output file metadata so settings can be re-extracted later (wgp.py:9742
extract_and_apply_source_images).  This environment has no ffmpeg/PyAV, so
everything is a pure-Python muxer:

  - images -> PNG with a `wan2gp` tEXt chunk holding the settings JSON
  - audio  -> PCM16 WAV written by a pure RIFF writer
  - videos -> MJPEG-in-AVI written by a pure RIFF muxer (universally
    decodable), with an interleaved PCM16 audio stream when a waveform is
    provided (the mux step), and the settings JSON inside the container
    (INFO/ICMT chunk); GIF also supported (no audio/metadata).
"""
from __future__ import annotations

import io
import json
import os
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

METADATA_KEY = "wan2gp"


def to_uint8(frames: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> uint8 (reference _vae_float_to_cpu_uint8,
    models/wan/modules/vae.py:18)."""
    if frames.dtype == np.uint8:
        return frames
    from .. import native
    if native.available():
        # threaded clamp+quantize (native/fastio.cc wg_f32_to_u8); the
        # kernel clamps to [0, 255] so the [-1, 1] pre-clip is implied
        return native.f32_to_u8(np.asarray(frames, np.float32))
    f = np.clip(np.asarray(frames, dtype=np.float32), -1.0, 1.0)
    return np.clip(np.round((f + 1.0) * 127.5), 0, 255).astype(np.uint8)


def to_pcm16(wave: np.ndarray) -> np.ndarray:
    """float [-1, 1] (or int16) [T] / [T, C] / [C, T] -> int16 [T, C]."""
    w = np.asarray(wave)
    if w.ndim == 1:
        w = w[:, None]
    elif w.ndim == 2 and w.shape[0] <= 8 < w.shape[1]:
        w = w.T                       # [C, T] -> [T, C]
    if w.dtype == np.int16:
        return w
    w = np.clip(w.astype(np.float32), -1.0, 1.0)
    return np.round(w * 32767.0).astype(np.int16)


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


# ---------------------------------------------------------------------------
# audio: WAV (save_audio_file equivalent, audio_video.py:377)
# ---------------------------------------------------------------------------

def save_audio(wave: np.ndarray, path: str, sample_rate: int = 16000,
               metadata: Optional[Dict[str, Any]] = None) -> str:
    """Write a PCM16 WAV.  wave: [T], [T, C] or [C, T], float [-1,1] or
    int16.  Returns the (possibly extension-fixed) path."""
    if not path.lower().endswith(".wav"):
        path = os.path.splitext(path)[0] + ".wav"
    pcm = to_pcm16(wave)
    t, c = pcm.shape
    block = 2 * c
    data = pcm.tobytes()
    fmt = struct.pack("<HHIIHH", 1, c, sample_rate, sample_rate * block,
                      block, 16)
    payload = (b"WAVE"
               + b"fmt " + struct.pack("<I", len(fmt)) + fmt
               + b"data" + struct.pack("<I", len(data)) + data)
    if len(data) % 2:
        payload += b"\x00"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(payload)) + payload)
    if metadata is not None:
        _write_sidecar(path, metadata)
    return path


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM16 WAV -> (int16 [T, C], sample_rate)."""
    with open(path, "rb") as f:
        data = f.read()
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE", "not a WAV"
    pos, rate, channels, pcm = 12, 16000, 1, b""
    while pos + 8 <= len(data):
        cc = data[pos:pos + 4]
        sz = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        body = data[pos + 8:pos + 8 + sz]
        if cc == b"fmt ":
            _, channels, rate = struct.unpack("<HHI", body[:8])
        elif cc == b"data":
            pcm = body
        pos += 8 + sz + (sz % 2)
    arr = np.frombuffer(pcm, np.int16).reshape(-1, channels)
    return arr, rate


# ---------------------------------------------------------------------------
# video: MJPEG AVI with optional interleaved PCM audio + in-container
# settings metadata (combine_video_with_audio_tracks equivalent)
# ---------------------------------------------------------------------------

def save_video(frames: np.ndarray, path: str, fps: int = 16,
               metadata: Optional[Dict[str, Any]] = None,
               quality: int = 92, audio: Optional[np.ndarray] = None,
               audio_sample_rate: int = 16000,
               codec_type: Optional[str] = None,
               container: Optional[str] = None,
               hdr: bool = False):
    """frames: [T, H, W, 3] uint8 or [-1,1] float.  audio: optional
    waveform ([T], [T, C] or [C, T]) muxed as an interleaved PCM16 track.

    codec_type/container select the encoder per the reference's codec
    table (shared/utils/video_codecs.py; server_config keys
    video_output_codec / video_container, wgp.py:7967).  hdr=True treats
    `frames` as LINEAR float HDR and writes a tagged 10-bit HEVC HDR10
    file (audio_video.py:754 save_hdr_video)."""
    if hdr:
        from .video_codecs import save_hdr_video
        return save_hdr_video(frames, path, fps=fps, codec_type=codec_type,
                              container=container, audio=audio,
                              audio_sample_rate=audio_sample_rate,
                              metadata=metadata)
    if container and not path.lower().endswith(".gif"):
        # the container choice governs the output extension (reference
        # get_video_container_extension); falls back to MJPEG-AVI below
        # when no ffmpeg is present
        from .video_codecs import get_video_container_extension
        ext = get_video_container_extension(container)
        if not path.lower().endswith(ext):
            path = os.path.splitext(path)[0] + ext
    frames = to_uint8(np.asarray(frames))
    if path.lower().endswith(".gif"):
        from PIL import Image
        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(path, save_all=True, append_images=imgs[1:],
                     duration=int(1000 / fps), loop=0)
    elif path.lower().endswith(".avi"):
        _write_mjpeg_avi(frames, path, fps, quality,
                         audio=audio, audio_rate=audio_sample_rate,
                         metadata=metadata)
    elif path.lower().endswith((".mp4", ".mkv", ".mov")):
        # Encoded containers need an external encoder (reference
        # shared/utils/video_codecs.py uses ffmpeg); opt-in when the
        # binary exists, otherwise fall back to MJPEG-AVI next to it.
        if not _write_video_ffmpeg(frames, path, fps, audio,
                                   audio_sample_rate, codec_type,
                                   container, metadata):
            alt = os.path.splitext(path)[0] + ".avi"
            _write_mjpeg_avi(frames, alt, fps, quality, audio=audio,
                             audio_rate=audio_sample_rate,
                             metadata=metadata)
            path = alt
    else:
        raise ValueError(f"unsupported video container: {path}")
    if metadata is not None:
        _write_sidecar(path, metadata)
    return path


def _write_video_ffmpeg(frames: np.ndarray, path: str, fps: int,
                        audio: Optional[np.ndarray],
                        audio_rate: int,
                        codec_type: Optional[str] = None,
                        container: Optional[str] = None,
                        metadata: Optional[Dict[str, Any]] = None) -> bool:
    """Encode via an external ffmpeg when available, with the codec/
    container selection table of shared/utils/video_codecs.py.  Returns
    False when ffmpeg is not installed."""
    import shutil
    import subprocess
    import tempfile
    from .video_codecs import get_video_encode_args
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        return False
    if container is None:
        container = os.path.splitext(path)[1].lstrip(".")
    t, h, w, _ = frames.shape
    cmd = [ffmpeg, "-y", "-loglevel", "error",
           "-f", "rawvideo", "-pix_fmt", "rgb24",
           "-s", f"{w}x{h}", "-r", str(fps), "-i", "pipe:0"]
    wav_tmp = None
    try:
        if audio is not None:
            a = np.asarray(audio)
            if a.ndim == 2 and a.shape[0] < a.shape[1]:
                a = a.T
            fd, wav_tmp = tempfile.mkstemp(suffix=".wav")
            os.close(fd)
            save_audio(a, wav_tmp, sample_rate=audio_rate)
            cmd += ["-i", wav_tmp, "-c:a", "aac", "-shortest"]
        cmd += get_video_encode_args(codec_type, container)
        if metadata is not None:
            cmd += ["-metadata",
                    "comment=" + json.dumps({METADATA_KEY: metadata})]
        cmd += [path]
        proc = subprocess.run(cmd, input=frames.tobytes(),
                              capture_output=True)
        return proc.returncode == 0 and os.path.exists(path)
    finally:
        if wav_tmp and os.path.exists(wav_tmp):
            os.remove(wav_tmp)


def read_video_metadata(path: str) -> Optional[Dict[str, Any]]:
    if path.lower().endswith(".avi") and os.path.exists(path):
        meta = _read_avi_metadata(path)
        if meta is not None:
            return meta
    return _read_sidecar(path)


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    data = payload + (b"\x00" if len(payload) % 2 else b"")
    return fourcc + struct.pack("<I", len(payload)) + data


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def _write_mjpeg_avi(frames: np.ndarray, path: str, fps: int, quality: int,
                     audio: Optional[np.ndarray] = None,
                     audio_rate: int = 16000,
                     metadata: Optional[Dict[str, Any]] = None):
    t, h, w, _ = frames.shape
    jpegs: List[bytes] = [_jpeg_bytes(f, quality) for f in frames]

    pcm = to_pcm16(audio) if audio is not None else None
    n_streams = 1 + (pcm is not None)

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I", int(1e6 / fps), max_bytes * fps, 0, 0x110,  # HASINDEX|ISINTERLEAVED
        t, 0, n_streams, max_bytes, w, h, 0, 0, 0, 0)
    strh_v = (b"vids" + b"MJPG"
              + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, t,
                            max_bytes, 0, 0)
              + struct.pack("<4H", 0, 0, w, h))
    strf_v = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                         w * h * 3, 0, 0, 0, 0)
    strl = _list(b"strl", _chunk(b"strh", strh_v) + _chunk(b"strf", strf_v))

    audio_chunks: List[bytes] = []
    if pcm is not None:
        ta, c = pcm.shape
        block = 2 * c
        # split per video frame for interleaving
        bounds = np.linspace(0, ta, t + 1).round().astype(int)
        audio_chunks = [pcm[bounds[i]:bounds[i + 1]].tobytes()
                        for i in range(t)]
        strh_a = (b"auds" + b"\x00" * 4
                  + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, block,
                                audio_rate * block, 0, ta, audio_rate * block,
                                0, block)
                  + struct.pack("<4H", 0, 0, 0, 0))
        strf_a = struct.pack("<HHIIHH", 1, c, audio_rate,
                             audio_rate * block, block, 16)
        strl += _list(b"strl", _chunk(b"strh", strh_a)
                      + _chunk(b"strf", strf_a))

    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl)
    info = b""
    if metadata is not None:
        payload = json.dumps({METADATA_KEY: metadata}).encode() + b"\x00"
        info = _list(b"INFO", _chunk(b"ICMT", payload))

    movi_payload = b"movi"
    index: List[Tuple[bytes, int, int]] = []
    for i, j in enumerate(jpegs):
        index.append((b"00dc", len(movi_payload), len(j)))
        movi_payload += _chunk(b"00dc", j)
        if audio_chunks:
            a = audio_chunks[i]
            index.append((b"01wb", len(movi_payload), len(a)))
            movi_payload += _chunk(b"01wb", a)
    movi = _chunk(b"LIST", movi_payload)

    idx = b"".join(cc + struct.pack("<III", 0x10, off, ln)
                   for cc, off, ln in index)
    idx1 = _chunk(b"idx1", idx)

    riff_payload = b"AVI " + hdrl + info + movi + idx1
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload)


def _iter_avi_chunks(data: bytes):
    """Yield (fourcc, list_kind|None, payload_start, size) top-level."""
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        kind = data[pos + 8:pos + 12] if fourcc == b"LIST" else None
        yield fourcc, kind, pos + 8, size
        pos += 8 + size + (size % 2)


def _read_avi_metadata(path: str) -> Optional[Dict[str, Any]]:
    with open(path, "rb") as f:
        data = f.read()
    if data[:4] != b"RIFF":
        return None
    for fourcc, kind, start, size in _iter_avi_chunks(data):
        if fourcc == b"LIST" and kind == b"INFO":
            sub = start + 4
            end = start + size
            while sub + 8 <= end:
                cc = data[sub:sub + 4]
                sz = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                if cc == b"ICMT":
                    try:
                        txt = data[sub + 8:sub + 8 + sz].rstrip(b"\x00")
                        return json.loads(txt.decode())[METADATA_KEY]
                    except Exception:
                        return None
                sub += 8 + sz + (sz % 2)
    return None


def read_mjpeg_avi(path: str) -> np.ndarray:
    """Decode the MJPEG frames of an AVI written by save_video."""
    from PIL import Image
    with open(path, "rb") as f:
        data = f.read()
    frames = []
    for fourcc, kind, start, size in _iter_avi_chunks(data):
        if fourcc == b"LIST" and kind == b"movi":
            sub = start + 4
            end = start + size
            while sub + 8 <= end:
                cc = data[sub:sub + 4]
                sz = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                if cc == b"00dc":
                    jpg = data[sub + 8:sub + 8 + sz]
                    frames.append(np.asarray(
                        Image.open(io.BytesIO(jpg)).convert("RGB")))
                sub += 8 + sz + (sz % 2)
    return np.stack(frames)


def read_first_frame(path: str) -> Optional[np.ndarray]:
    """First MJPEG frame of an AVI without decoding the whole clip
    (gallery thumbnails)."""
    from PIL import Image
    with open(path, "rb") as f:
        data = f.read()
    for fourcc, kind, start, size in _iter_avi_chunks(data):
        if fourcc == b"LIST" and kind == b"movi":
            sub = start + 4
            end = start + size
            while sub + 8 <= end:
                cc = data[sub:sub + 4]
                sz = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                if cc == b"00dc":
                    jpg = data[sub + 8:sub + 8 + sz]
                    return np.asarray(
                        Image.open(io.BytesIO(jpg)).convert("RGB"))
                sub += 8 + sz + (sz % 2)
    return None


def read_avi_audio(path: str) -> Optional[Tuple[np.ndarray, int]]:
    """Extract the interleaved PCM track -> (int16 [T, C], rate), or None."""
    with open(path, "rb") as f:
        data = f.read()
    rate, channels = None, 1
    # find the audio strf (WAVEFORMAT) inside hdrl
    for fourcc, kind, start, size in _iter_avi_chunks(data):
        if fourcc == b"LIST" and kind == b"hdrl":
            blob = data[start + 4:start + size]
            i = blob.find(b"auds")
            if i >= 0:
                j = blob.find(b"strf", i)
                if j >= 0:
                    _, channels, rate = struct.unpack(
                        "<HHI", blob[j + 8:j + 16])
    if rate is None:
        return None
    pcm = b""
    for fourcc, kind, start, size in _iter_avi_chunks(data):
        if fourcc == b"LIST" and kind == b"movi":
            sub = start + 4
            end = start + size
            while sub + 8 <= end:
                cc = data[sub:sub + 4]
                sz = struct.unpack("<I", data[sub + 4:sub + 8])[0]
                if cc == b"01wb":
                    pcm += data[sub + 8:sub + 8 + sz]
                sub += 8 + sz + (sz % 2)
    arr = np.frombuffer(pcm, np.int16).reshape(-1, channels)
    return arr, rate


def combine_video_with_audio(video_frames: np.ndarray, audio: np.ndarray,
                             path: str, fps: int = 16,
                             audio_sample_rate: int = 16000,
                             metadata: Optional[Dict[str, Any]] = None,
                             quality: int = 92) -> str:
    """Reference combine_video_with_audio_tracks equivalent: write one AVI
    holding both streams (audio_video.py:613)."""
    save_video(video_frames, path, fps=fps, metadata=metadata,
               quality=quality, audio=audio,
               audio_sample_rate=audio_sample_rate)
    return path


def composite_checkerboard(frames_rgba: np.ndarray, size: int = 30,
                           color1: int = 140, color2: int = 113
                           ) -> np.ndarray:
    """Blend RGBA frames over a checkerboard preview background
    (reference models/wan/alpha/utils.py render_video:150-162).
    frames_rgba: [T, H, W, 4] uint8 or [-1,1] float -> [T, H, W, 3]
    uint8."""
    frames = to_uint8(frames_rgba[..., :3])
    alpha = frames_rgba[..., 3:]
    if alpha.dtype != np.uint8:
        alpha = to_uint8(np.repeat(alpha, 3, axis=-1))[..., :1]
    alpha = alpha.astype(np.float32) / 255.0
    t, h, w = frames.shape[:3]
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    board = np.where(((yy // size + xx // size) % 2 == 0),
                     color2, color1).astype(np.float32)[None, :, :, None]
    out = frames.astype(np.float32) * alpha + board * (1.0 - alpha)
    return out.astype(np.uint8)


def save_rgba_zip(frames_rgba: np.ndarray, path: str,
                  metadata: Optional[Dict[str, Any]] = None) -> str:
    """RGBA frame sequence as a zip of PNGs (reference alpha/utils.py
    write_zip_file:176 — the transparent-video delivery format)."""
    import io
    import zipfile
    from PIL import Image
    frames = frames_rgba
    if frames.dtype != np.uint8:
        frames = to_uint8(frames)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        for i, f in enumerate(frames):
            buf = io.BytesIO()
            Image.fromarray(f, mode="RGBA").save(buf, format="PNG")
            zf.writestr(f"img_{i:03d}.png", buf.getvalue())
        if metadata is not None:
            zf.writestr("settings.json", json.dumps(metadata, indent=1))
    return path
