"""Video codec selection + HDR10 output.

Behavior parity with the reference's codec layer:
  * shared/utils/video_codecs.py — codec keys (libx264_8/10,
    libx265_28/8, libx264_lossless, prores_422, dnxhr_hq), container
    rules (mp4/mov/mkv), ffmpeg arg synthesis, output validation.
  * shared/utils/hdr.py — LogC3 log-encoding used to carry linear HDR
    through the [-1, 1] VAE range, linear->sRGB tonemap, and the HDR10
    (SMPTE-2084 / BT.2020) mastering metadata constants.
  * shared/utils/audio_video.py:344 get_hdr_video_encode_args /
    :754 save_hdr_video — 10-bit HEVC HDR encode via ffmpeg zscale.

The codec/filter argument tables are behavior constants that must match
the reference for identical output files; everything around them
(numpy transfer math, the fallback policy, the raw gbrp pipe) is this
repo's own design.  Encoding itself requires an external ffmpeg (as in
the reference); without one, `save_hdr_video` falls back to a
tonemapped SDR MJPEG-AVI next to the requested path so the generation
is never lost.
"""
from __future__ import annotations

import os
import shutil
import struct
import subprocess
import tempfile
from typing import Iterable, List, Optional, Tuple

import numpy as np

# -- codec / container tables (shared/utils/video_codecs.py:1-20) ----------

SDR_VIDEO_CODEC_CHOICES = [
    ("x265 CRF 28 (Balanced)", "libx265_28"),
    ("x264 Level 8 (Balanced)", "libx264_8"),
    ("x265 CRF 8 (High Quality)", "libx265_8"),
    ("x264 Level 10 (High Quality)", "libx264_10"),
    ("x264 Lossless", "libx264_lossless"),
    ("ProRes 422 (editing)", "prores_422"),
    ("DNxHR HQ (editing)", "dnxhr_hq"),
]

VIDEO_CONTAINER_CHOICES = [("MP4", "mp4"), ("MOV / QuickTime", "mov"),
                           ("MKV / Matroska", "mkv")]
SUPPORTED_VIDEO_CONTAINERS = {"mkv", "mov", "mp4"}
PROFESSIONAL_VIDEO_CODECS = {"prores_422", "dnxhr_hq"}
QUICKTIME_AUDIO_CODEC_KEYS = {"aac_128", "aac_192", "aac_256", "aac_320",
                              "alac"}

# -- HDR10 constants (shared/utils/hdr.py:10-25) ----------------------------

HDR_REFERENCE_WHITE_NITS = 203.0
HDR10_MASTER_DISPLAY = ("G(13250,34500)B(7500,3000)R(34000,16000)"
                        "WP(15635,16450)L(10000000,1)")
HDR10_MAX_CLL = "10000,400"
VIDEO_PROMPT_HDR_OUTPUT_FLAG = "&"


def normalize_video_container(container: Optional[str]) -> str:
    return str(container or "mp4").strip().lower() or "mp4"


def normalize_video_codec(codec_key: Optional[str]) -> str:
    return str(codec_key or "libx264_8").strip().lower() or "libx264_8"


def normalize_video_audio_codec(codec_key: Optional[str]) -> str:
    return str(codec_key or "aac_128").strip().lower() or "aac_128"


def get_video_container_extension(container: Optional[str]) -> str:
    container = normalize_video_container(container)
    return (f".{container}" if container in SUPPORTED_VIDEO_CONTAINERS
            else ".mp4")


def _video_codec_spec(codec_key: Optional[str], container: Optional[str]
                      ) -> Tuple[str, str, List[str]]:
    """(ffmpeg codec, pixel format, extra args) — the reference's
    _get_video_codec_spec table (video_codecs.py:40-59)."""
    codec_key = normalize_video_codec(codec_key)
    container = normalize_video_container(container)
    table = {
        "libx264_8": ("libx264", "yuv420p", ["-crf", "10"]),
        "libx264_10": ("libx264", "yuv420p", ["-crf", "0"]),
        "libx265_28": ("libx265", "yuv420p",
                       ["-crf", "28", "-x265-params", "log-level=none"]),
        "libx265_8": ("libx265", "yuv420p",
                      ["-crf", "8", "-x265-params", "log-level=none"]),
        "prores_422": ("prores_ks", "yuv422p10le", ["-profile:v", "2"]),
        "dnxhr_hq": ("dnxhd", "yuv422p", ["-profile:v", "dnxhr_hq"]),
    }
    if codec_key == "libx264_lossless":
        if container == "mkv":
            return "ffv1", "rgb24", []
        return "libx264", "yuv444p", ["-crf", "0"]
    return table.get(codec_key, table["libx264_8"])


def get_video_encode_args(codec_key: Optional[str],
                          container: Optional[str]) -> List[str]:
    codec, pix, extra = _video_codec_spec(codec_key, container)
    return ["-c:v", codec, *extra, "-pix_fmt", pix]


def validate_video_output_settings(video_codec: Optional[str],
                                   video_container: Optional[str],
                                   audio_codec: Optional[str] = None,
                                   width: Optional[int] = None,
                                   height: Optional[int] = None,
                                   ) -> Optional[str]:
    """Returns an error string or None (video_codecs.py:72-85)."""
    video_codec = normalize_video_codec(video_codec)
    video_container = normalize_video_container(video_container)
    audio_codec = normalize_video_audio_codec(audio_codec)
    if video_container not in SUPPORTED_VIDEO_CONTAINERS:
        return f"Unsupported video container: {video_container}."
    if (video_codec in PROFESSIONAL_VIDEO_CODECS
            and video_container not in {"mkv", "mov"}):
        return ("ProRes 422 and DNxHR HQ require the MOV / QuickTime or "
                "MKV container.")
    if (video_container in {"mp4", "mov"}
            and audio_codec not in QUICKTIME_AUDIO_CODEC_KEYS):
        return (f"{video_container.upper()} output does not support audio "
                f"codec setting '{audio_codec}'.")
    if (video_codec == "dnxhr_hq" and width is not None
            and height is not None
            and (int(width) < 256 or int(height) < 120)):
        return "DNxHR HQ output requires a resolution of at least 256x120."
    return None


# -- HDR transfer math (numpy ports of shared/utils/hdr.py LogC3) ------------

class LogC3:
    """ARRI LogC3 curve used as the HDR<->[-1,1] carrier transform."""
    A, B, C, D = 5.555556, 0.052272, 0.247190, 0.385537
    E, F, CUT = 5.367655, 0.092809, 0.010591

    def compress(self, hdr: np.ndarray) -> np.ndarray:
        x = np.clip(np.asarray(hdr, np.float32), 0.0, None)
        log_part = self.C * np.log10(self.A * x + self.B) + self.D
        lin_part = self.E * x + self.F
        return np.clip(np.where(x >= self.CUT, log_part, lin_part), 0.0, 1.0)

    def decompress(self, logc: np.ndarray) -> np.ndarray:
        logc = np.clip(np.asarray(logc, np.float32), 0.0, 1.0)
        cut_log = self.E * self.CUT + self.F
        lin_from_log = (np.power(10.0, (logc - self.D) / self.C)
                        - self.B) / self.A
        lin_from_lin = (logc - self.F) / self.E
        return np.clip(np.where(logc >= cut_log, lin_from_log, lin_from_lin),
                       0.0, None)


def hdr_linear_to_vae_range(frames: np.ndarray,
                            transform: str = "logc3") -> np.ndarray:
    if transform != "logc3":
        raise ValueError(f"Unsupported HDR transform: {transform}")
    return LogC3().compress(frames) * 2.0 - 1.0


def vae_range_to_hdr_linear(frames: np.ndarray,
                            transform: str = "logc3") -> np.ndarray:
    if transform != "logc3":
        raise ValueError(f"Unsupported HDR transform: {transform}")
    x = np.clip((np.asarray(frames, np.float32) + 1.0) * 0.5, 0.0, 1.0)
    return LogC3().decompress(x)


def linear_to_srgb(linear: np.ndarray) -> np.ndarray:
    x = np.clip(np.asarray(linear, np.float32), 0.0, 1.0)
    low = x * 12.92
    high = 1.055 * np.power(np.maximum(x, 1e-12), 1.0 / 2.4) - 0.055
    return np.clip(np.where(x <= 0.0031308, low, high), 0.0, 1.0)


def tonemap_hdr_to_uint8(video: np.ndarray, exposure: float = 0.0
                         ) -> np.ndarray:
    """Linear HDR [T, H, W, 3] float -> display-referred sRGB uint8
    (hdr.py tonemap_hdr_tensor_to_uint8, channel-last layout)."""
    scale = float(2.0 ** float(exposure))
    srgb = linear_to_srgb(np.asarray(video, np.float32) * scale)
    return np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8)


# -- HDR10 encode (audio_video.py:344,:754) ---------------------------------

def hdr10_zscale_filter(reference_white_nits: float =
                        HDR_REFERENCE_WHITE_NITS) -> str:
    return ("zscale=pin=709:tin=linear:min=gbr:rin=full:"
            f"p=2020:t=smpte2084:m=2020_ncl:r=limited:"
            f"npl={float(reference_white_nits):.12g},format=yuv420p10le")


def hdr10_x265_params() -> str:
    return (f"hdr10=1:repeat-headers=1:master-display={HDR10_MASTER_DISPLAY}"
            f":max-cll={HDR10_MAX_CLL}:log-level=none")


def _crf_from_video_codec(codec_key: Optional[str],
                          default: str = "18") -> str:
    codec, _pix, extra = _video_codec_spec(codec_key, "mp4")
    if "-crf" in extra:
        return extra[extra.index("-crf") + 1]
    return default


def get_hdr_video_encode_args(codec_key: Optional[str],
                              container: Optional[str]) -> List[str]:
    """10-bit HEVC HDR10 regardless of the SDR codec choice; only the
    CRF carries over (audio_video.py:344-357)."""
    crf = _crf_from_video_codec(codec_key, default="18")
    return ["-vf", hdr10_zscale_filter(),
            "-c:v", "libx265",
            "-preset", "medium",
            "-crf", crf,
            "-pix_fmt", "yuv420p10le",
            "-tag:v", "hvc1",
            "-x265-params", hdr10_x265_params()]


def _iter_gbrpf32_frames(video: np.ndarray) -> Iterable[bytes]:
    """[T, H, W, 3] linear float RGB -> raw planar GBR float32 frames
    (the gbrpf32le rawvideo layout ffmpeg's zscale path consumes)."""
    v = np.asarray(video, np.float32)
    for frame in v:
        gbr = np.ascontiguousarray(frame[..., [1, 2, 0]].transpose(2, 0, 1))
        yield gbr.tobytes()


def save_hdr_video(video: np.ndarray, path: str, fps: int = 16,
                   codec_type: Optional[str] = "libx264_8",
                   container: Optional[str] = "mp4",
                   audio: Optional[np.ndarray] = None,
                   audio_sample_rate: int = 16000,
                   metadata=None) -> str:
    """Save linear HDR [T, H, W, 3] float frames as a tagged 10-bit
    HEVC HDR10 file (reference save_hdr_video audio_video.py:754).

    Returns the written path.  Without an external ffmpeg, falls back
    to a tonemapped SDR MJPEG-AVI (the generation is never dropped)."""
    from . import media
    v = np.asarray(video, np.float32)
    if v.ndim != 4 or v.shape[-1] != 3:
        raise ValueError(f"Expected [T, H, W, 3] HDR frames, got {v.shape}")
    t, h, w, _ = v.shape
    if not (h and w):
        raise RuntimeError("Unable to determine HDR video dimensions.")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        alt = os.path.splitext(path)[0] + ".avi"
        media.save_video(tonemap_hdr_to_uint8(v), alt, fps=fps,
                         metadata=metadata, audio=audio,
                         audio_sample_rate=audio_sample_rate)
        return alt
    ext = get_video_container_extension(container)
    if not path.lower().endswith(ext):
        path = os.path.splitext(path)[0] + ext
    cmd = [ffmpeg, "-y", "-loglevel", "error",
           "-f", "rawvideo", "-pix_fmt", "gbrpf32le",
           "-s", f"{w}x{h}", "-r", str(fps), "-i", "pipe:0"]
    wav_tmp = None
    try:
        if audio is not None:
            fd, wav_tmp = tempfile.mkstemp(suffix=".wav")
            os.close(fd)
            media.save_audio(audio, wav_tmp, sample_rate=audio_sample_rate)
            cmd += ["-i", wav_tmp, "-c:a", "aac", "-shortest"]
        cmd += get_hdr_video_encode_args(codec_type, container)
        if metadata is not None:
            import json
            cmd += ["-metadata",
                    "comment=" + json.dumps({media.METADATA_KEY: metadata})]
        cmd += [path]
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stderr=subprocess.PIPE)
        for frame_bytes in _iter_gbrpf32_frames(v):
            proc.stdin.write(frame_bytes)
        proc.stdin.close()
        stderr = proc.stderr.read().decode(errors="replace")
        if proc.wait() != 0 or not os.path.exists(path):
            raise RuntimeError(stderr or "ffmpeg HDR encode failed")
    finally:
        if wav_tmp and os.path.exists(wav_tmp):
            os.remove(wav_tmp)
    if metadata is not None:
        media._write_sidecar(path, metadata)
    return path
