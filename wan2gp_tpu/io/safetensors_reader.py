"""Minimal zero-copy safetensors reader.

The reference loads checkpoints through mmgp's safetensors2
(/root/reference — mmgp is an external pip package); here we parse the format
directly: 8-byte little-endian header length, JSON header of
{name: {dtype, shape, data_offsets}}, then a flat byte buffer.  We mmap the
file and expose lazy per-tensor reads so sharded/streaming loads don't
materialize the whole checkpoint in host RAM.

bf16/fp8 tensors map to ml_dtypes numpy dtypes (jax-native).
"""
from __future__ import annotations

import json
import mmap
from typing import Dict, List

import numpy as np
import ml_dtypes

_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "BF16": ml_dtypes.bfloat16,
    "F8_E4M3": ml_dtypes.float8_e4m3fn, "F8_E5M2": ml_dtypes.float8_e5m2,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "U16": np.uint16, "U32": np.uint32, "U64": np.uint64,
    "BOOL": np.bool_,
}


class SafetensorsFile:
    def __init__(self, path: str):
        self.path = path
        self._f = open(path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        header_len = int.from_bytes(self._mm[:8], "little")
        header = json.loads(self._mm[8:8 + header_len].decode("utf-8"))
        self.metadata = header.pop("__metadata__", {})
        self._entries = header
        self._data_start = 8 + header_len

    def keys(self) -> List[str]:
        return list(self._entries.keys())

    def shape(self, name):
        return tuple(self._entries[name]["shape"])

    def dtype(self, name):
        return np.dtype(_DTYPES[self._entries[name]["dtype"]])

    def read(self, name: str) -> np.ndarray:
        e = self._entries[name]
        start, end = e["data_offsets"]
        buf = self._mm[self._data_start + start:self._data_start + end]
        arr = np.frombuffer(buf, dtype=_DTYPES[e["dtype"]])
        return arr.reshape(e["shape"])

    def close(self):
        self._mm.close()
        self._f.close()


def load_weights(path: str) -> Dict[str, np.ndarray]:
    """Extension-dispatching loader: .safetensors (mmap) or .gguf
    (parsed + dequantized to float32, gguf_reader.py).  Scaled-FP8,
    bnb-NF4 and asym-W4A8 checkpoints are dequantized on load
    (quant_formats.py)."""
    if path.endswith(".gguf"):
        from .gguf_reader import load_gguf
        return load_gguf(path)
    from .quant_formats import normalize_quant_formats
    return normalize_quant_formats(
        normalize_scaled_fp8(load_safetensors(path)))


def normalize_scaled_fp8(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Dequantize scaled-FP8 entries (reference shared/qtypes/
    scaled_fp8.py:572: per-module '<name>.scale_weight' next to an
    fp8_e4m3/e5m2 '<name>.weight'; optional 'scaled_fp8' marker tensor).
    Host-side one-time cost; weights then stage to HBM in bf16/f32."""
    scale_keys = [k for k in sd if k.endswith(".scale_weight")]
    if not scale_keys and "scaled_fp8" not in sd:
        return sd
    sd = dict(sd)
    sd.pop("scaled_fp8", None)
    for sk in scale_keys:
        wk = sk[:-len("scale_weight")] + "weight"
        scale = np.asarray(sd.pop(sk), np.float32)
        if wk in sd:
            w = np.asarray(sd[wk]).astype(np.float32)
            sd[wk] = w * scale.reshape(
                scale.shape + (1,) * (w.ndim - scale.ndim)) \
                if scale.ndim and scale.size > 1 else w * float(
                    scale.reshape(-1)[0])
        sd.pop(sk[:-len("scale_weight")] + "scale_input", None)
    return sd


def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    import os
    try:
        if os.path.getsize(path) > (256 << 20):
            # cold-cache page-in at full NVMe bandwidth (native
            # threaded pread); mmap reads below then hit RAM
            from .. import native
            native.prefetch_file(path)
    except OSError:
        pass
    f = SafetensorsFile(path)
    return {k: f.read(k) for k in f.keys()}


def save_safetensors(path: str, tensors: Dict[str, np.ndarray],
                     metadata: Dict[str, str] | None = None):
    """Writer (used for tests and quantized-checkpoint export)."""
    inv = {np.dtype(v): k for k, v in _DTYPES.items()}
    header = {}
    offset = 0
    order = list(tensors.keys())
    for k in order:
        a = np.ascontiguousarray(tensors[k])
        tensors[k] = a
        n = a.nbytes
        header[k] = {"dtype": inv[a.dtype], "shape": list(a.shape),
                     "data_offsets": [offset, offset + n]}
        offset += n
    if metadata:
        header["__metadata__"] = metadata
    hdr = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        for k in order:
            f.write(tensors[k].tobytes())
