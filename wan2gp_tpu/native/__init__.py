"""Native host-IO runtime (C++ `fastio.cc`, loaded via ctypes).

The compute path is jax/XLA/Pallas on the TPU; this module covers the
HOST side — checkpoint page-in and bulk dtype/pixel conversion — where
single-threaded numpy is the bottleneck (the reference leans on
mmgp/torch native loops for the same work).

The shared object is compiled on first use with the system g++ and
cached under ``native/_build`` keyed by a source hash; every wrapper
falls back to numpy when the toolchain or build is unavailable, so the
framework never hard-depends on the extension.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "fastio.cc")
_BUILD_DIR = os.path.join(_DIR, "_build")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False
_THREADS = max(1, min(16, os.cpu_count() or 1))


def _build() -> Optional[str]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    so = os.path.join(_BUILD_DIR, f"fastio-{tag}.so")
    if os.path.exists(so):
        return so
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = so + f".tmp{os.getpid()}"
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
           _SRC, "-o", tmp]
    try:
        subprocess.run(cmd, check=True, capture_output=True,
                       timeout=120)
        os.replace(tmp, so)
        return so
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("WAN2GP_NO_NATIVE"):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
            lib.wg_version.restype = ctypes.c_int
            if lib.wg_version() != 1:
                return None
            lib.wg_parallel_read.restype = ctypes.c_longlong
            lib.wg_parallel_read.argtypes = [
                ctypes.c_char_p, ctypes.c_longlong, ctypes.c_longlong,
                ctypes.c_void_p, ctypes.c_int]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def _ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.c_void_p)


def bf16_to_f32(arr: np.ndarray) -> np.ndarray:
    """ml_dtypes.bfloat16 [..] -> float32, threaded; numpy fallback."""
    lib = _load()
    src = np.ascontiguousarray(arr)
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, np.float32)
    lib.wg_bf16_to_f32(_ptr(src.view(np.uint16)), _ptr(out),
                       ctypes.c_longlong(src.size),
                       ctypes.c_int(_THREADS))
    return out


def f16_to_f32(arr: np.ndarray) -> np.ndarray:
    lib = _load()
    src = np.ascontiguousarray(arr)
    if lib is None:
        return src.astype(np.float32)
    out = np.empty(src.shape, np.float32)
    lib.wg_f16_to_f32(_ptr(src.view(np.uint16)), _ptr(out),
                      ctypes.c_longlong(src.size),
                      ctypes.c_int(_THREADS))
    return out


def f32_to_bf16(arr: np.ndarray) -> np.ndarray:
    """float32 -> ml_dtypes.bfloat16 with round-to-nearest-even."""
    import ml_dtypes
    lib = _load()
    src = np.ascontiguousarray(arr, np.float32)
    if lib is None:
        return src.astype(ml_dtypes.bfloat16)
    out = np.empty(src.shape, np.uint16)
    lib.wg_f32_to_bf16(_ptr(src), _ptr(out),
                       ctypes.c_longlong(src.size),
                       ctypes.c_int(_THREADS))
    return out.view(ml_dtypes.bfloat16)


def u8_to_f32(arr: np.ndarray, scale: float = 1.0 / 127.5,
              shift: float = -1.0) -> np.ndarray:
    """uint8 pixels -> scale*x + shift (default [-1, 1]), threaded."""
    lib = _load()
    src = np.ascontiguousarray(arr, np.uint8)
    if lib is None:
        return src.astype(np.float32) * scale + shift
    out = np.empty(src.shape, np.float32)
    lib.wg_u8_to_f32_scale(_ptr(src), _ptr(out),
                           ctypes.c_longlong(src.size),
                           ctypes.c_float(scale), ctypes.c_float(shift),
                           ctypes.c_int(_THREADS))
    return out


def f32_to_u8(arr: np.ndarray, scale: float = 127.5,
              shift: float = 127.5) -> np.ndarray:
    """float pixels -> clamp(round(scale*x + shift)) uint8 (default
    [-1, 1] -> [0, 255]), threaded."""
    lib = _load()
    src = np.ascontiguousarray(arr, np.float32)
    if lib is None:
        return np.clip(np.round(src * scale + shift), 0, 255) \
            .astype(np.uint8)
    out = np.empty(src.shape, np.uint8)
    lib.wg_f32_to_u8(_ptr(src), _ptr(out),
                     ctypes.c_longlong(src.size),
                     ctypes.c_float(scale), ctypes.c_float(shift),
                     ctypes.c_int(_THREADS))
    return out


def parallel_read(path: str, offset: int, nbytes: int
                  ) -> Optional[np.ndarray]:
    """Threaded pread of a file region into a fresh uint8 buffer; None
    when the extension is unavailable (callers fall back to mmap)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(int(nbytes), np.uint8)
    got = lib.wg_parallel_read(path.encode(), int(offset), int(nbytes),
                               _ptr(out), _THREADS)
    if got != nbytes:
        return None
    return out


def prefetch_file(path: str, max_bytes: int = 64 << 30) -> bool:
    """Warm the page cache for a checkpoint with threaded reads so the
    subsequent mmap-based tensor reads hit RAM.  Returns True when the
    native read ran."""
    lib = _load()
    if lib is None:
        return False
    try:
        n = min(os.path.getsize(path), max_bytes)
    except OSError:
        return False
    # read into a small rotating buffer purely for page-cache warmth
    buf = np.empty(min(n, 256 << 20), np.uint8)
    off = 0
    while off < n:
        step = min(n - off, buf.size)
        got = lib.wg_parallel_read(path.encode(), off, int(step),
                                   _ptr(buf), _THREADS)
        if got != step:
            return False
        off += step
    return True
