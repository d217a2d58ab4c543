"""GGUF reader tests: container parsing + dequant vs scalar references."""
import struct

import numpy as np
import pytest

from wan2gp_tpu.io.gguf_reader import (
    GGUFFile, load_gguf, dequantize, GGML_F32, GGML_F16, GGML_BF16,
    GGML_Q8_0, GGML_Q4_0, GGML_Q4_1, GGML_Q5_0, GGML_Q5_1, GGML_Q4_K,
    GGML_Q5_K, GGML_Q6_K)


def _gguf_bytes(tensors, metadata=None):
    """Minimal GGUF v3 writer: tensors = [(name, dims_fastest_first,
    ggml_type, raw_bytes)]."""
    out = bytearray()
    out += b"GGUF"
    out += struct.pack("<I", 3)
    out += struct.pack("<Q", len(tensors))
    md = {"general.alignment": 32, **(metadata or {})}
    out += struct.pack("<Q", len(md))

    def put_str(s):
        b = s.encode()
        out.extend(struct.pack("<Q", len(b)) + b)

    for k, v in md.items():
        put_str(k)
        if isinstance(v, int):
            out += struct.pack("<I", 4) + struct.pack("<I", v)   # uint32
        else:
            out += struct.pack("<I", 8)
            put_str(v)

    offset = 0
    for name, dims, ttype, raw in tensors:
        put_str(name)
        out += struct.pack("<I", len(dims))
        for d in dims:
            out += struct.pack("<Q", d)
        out += struct.pack("<I", ttype)
        out += struct.pack("<Q", offset)
        offset += (len(raw) + 31) // 32 * 32

    while len(out) % 32:
        out.append(0)
    for _, _, _, raw in tensors:
        out += raw
        while len(out) % 32:
            out.append(0)
    return bytes(out)


def test_parse_f32_f16_bf16(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((8,)).astype(np.float16)
    c32 = rng.standard_normal((2, 2)).astype(np.float32)
    c_bf16 = (c32.view(np.uint32) >> 16).astype(np.uint16)
    data = _gguf_bytes([
        ("a.weight", [4, 3], GGML_F32, a.tobytes()),     # dims reversed
        ("b.weight", [8], GGML_F16, b.tobytes()),
        ("c.weight", [2, 2], GGML_BF16, c_bf16.tobytes()),
    ], metadata={"general.architecture": "test"})
    path = tmp_path / "t.gguf"
    path.write_bytes(data)
    g = GGUFFile(str(path))
    assert g.metadata["general.architecture"] == "test"
    np.testing.assert_array_equal(g.get("a.weight"), a)
    np.testing.assert_allclose(g.get("b.weight"), b.astype(np.float32))
    got_c = g.get("c.weight")
    np.testing.assert_allclose(got_c, c_bf16.astype(np.uint32).__lshift__(16)
                               .view(np.float32).reshape(2, 2))
    sd = load_gguf(str(path))
    assert set(sd) == {"a.weight", "b.weight", "c.weight"}
    assert g.tensor_type_name("a.weight") == "F32"


def _q8_0_block(d, q):
    return np.float16(d).tobytes() + np.asarray(q, np.int8).tobytes()


def test_q8_0_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    q = rng.integers(-127, 128, 64, dtype=np.int8)
    raw = _q8_0_block(0.5, q[:32]) + _q8_0_block(0.25, q[32:])
    data = _gguf_bytes([("w", [64], GGML_Q8_0, raw)])
    path = tmp_path / "q8.gguf"
    path.write_bytes(data)
    got = GGUFFile(str(path)).get("w")
    expect = np.concatenate([q[:32] * np.float32(np.float16(0.5)),
                             q[32:] * np.float32(np.float16(0.25))])
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_q4_0_layout():
    # one block: elems 0..15 = low nibbles, 16..31 = high (llama.cpp)
    qs = np.arange(16, dtype=np.uint8) | (np.uint8(5) << 4)
    raw = np.frombuffer(np.float16(2.0).tobytes() + qs.tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q4_0, 32)
    np.testing.assert_allclose(out[:16], (np.arange(16) - 8) * 2.0)
    np.testing.assert_allclose(out[16:], np.full(16, (5 - 8) * 2.0))


def test_q4_1_q5_0_q5_1_scalar_reference():
    rng = np.random.default_rng(2)
    for ttype, bsize in ((GGML_Q4_1, 20), (GGML_Q5_0, 22), (GGML_Q5_1, 24)):
        raw = rng.integers(0, 256, 2 * bsize, dtype=np.uint8)
        # force sane f16 scale/min fields
        raw = raw.copy()
        for blk in range(2):
            raw[blk * bsize:blk * bsize + 2] = np.frombuffer(
                np.float16(0.1 * (blk + 1)).tobytes(), np.uint8)
            if ttype in (GGML_Q4_1, GGML_Q5_1):
                raw[blk * bsize + 2:blk * bsize + 4] = np.frombuffer(
                    np.float16(-0.3).tobytes(), np.uint8)
        out = dequantize(raw, ttype, 64)

        # scalar mirror of the public llama.cpp dequant loops
        expect = np.zeros(64, np.float32)
        for blk in range(2):
            b = raw[blk * bsize:(blk + 1) * bsize]
            d = np.frombuffer(b[:2].tobytes(), np.float16)[0].astype(
                np.float32)
            if ttype == GGML_Q4_1:
                m = np.frombuffer(b[2:4].tobytes(), np.float16)[0]
                qs = b[4:20]
                for i in range(16):
                    expect[blk * 32 + i] = d * int(qs[i] & 0xF) \
                        + np.float32(m)
                    expect[blk * 32 + 16 + i] = d * int(qs[i] >> 4) \
                        + np.float32(m)
            else:
                off = 2 if ttype == GGML_Q5_0 else 4
                m = 0.0 if ttype == GGML_Q5_0 else np.float32(
                    np.frombuffer(b[2:4].tobytes(), np.float16)[0])
                qh = int.from_bytes(b[off:off + 4].tobytes(), "little")
                qs = b[off + 4:off + 20]
                for i in range(16):
                    q_lo = int(qs[i] & 0xF) | (((qh >> i) & 1) << 4)
                    q_hi = int(qs[i] >> 4) | (((qh >> (i + 16)) & 1) << 4)
                    if ttype == GGML_Q5_0:
                        expect[blk * 32 + i] = d * (q_lo - 16)
                        expect[blk * 32 + 16 + i] = d * (q_hi - 16)
                    else:
                        expect[blk * 32 + i] = d * q_lo + m
                        expect[blk * 32 + 16 + i] = d * q_hi + m
        np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def _scale_min_k4(scales, j):
    if j < 4:
        return scales[j] & 63, scales[j + 4] & 63
    return ((scales[j + 4] & 0xF) | ((scales[j - 4] >> 6) << 4),
            (scales[j + 4] >> 4) | ((scales[j] >> 6) << 4))


def test_q4_k_scalar_reference():
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 256, 144, dtype=np.uint8)
    raw[:2] = np.frombuffer(np.float16(0.02).tobytes(), np.uint8)
    raw[2:4] = np.frombuffer(np.float16(0.01).tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q4_K, 256)

    d, dmin = 0.02, 0.01
    d = np.float32(np.float16(d))
    dmin = np.float32(np.float16(dmin))
    scales = raw[4:16]
    qs = raw[16:144]
    expect = np.zeros(256, np.float32)
    is_ = 0
    pos = 0
    qoff = 0
    for j in range(0, 256, 64):
        sc1, m1 = _scale_min_k4(scales, is_)
        sc2, m2 = _scale_min_k4(scales, is_ + 1)
        for l in range(32):
            expect[pos + l] = d * sc1 * int(qs[qoff + l] & 0xF) \
                - dmin * m1
            expect[pos + 32 + l] = d * sc2 * int(qs[qoff + l] >> 4) \
                - dmin * m2
        is_ += 2
        pos += 64
        qoff += 32
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_q5_k_scalar_reference():
    rng = np.random.default_rng(4)
    raw = rng.integers(0, 256, 176, dtype=np.uint8)
    raw[:2] = np.frombuffer(np.float16(0.02).tobytes(), np.uint8)
    raw[2:4] = np.frombuffer(np.float16(0.01).tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q5_K, 256)

    d = np.float32(np.float16(0.02))
    dmin = np.float32(np.float16(0.01))
    scales = raw[4:16]
    qh = raw[16:48]
    qs = raw[48:176]
    expect = np.zeros(256, np.float32)
    is_ = 0
    u1, u2 = 1, 2
    pos = 0
    qoff = 0
    for j in range(0, 256, 64):
        sc1, m1 = _scale_min_k4(scales, is_)
        sc2, m2 = _scale_min_k4(scales, is_ + 1)
        for l in range(32):
            q1 = int(qs[qoff + l] & 0xF) + (16 if qh[l] & u1 else 0)
            q2 = int(qs[qoff + l] >> 4) + (16 if qh[l] & u2 else 0)
            expect[pos + l] = d * sc1 * q1 - dmin * m1
            expect[pos + 32 + l] = d * sc2 * q2 - dmin * m2
        is_ += 2
        u1 <<= 2
        u2 <<= 2
        pos += 64
        qoff += 32
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_q6_k_scalar_reference():
    rng = np.random.default_rng(5)
    raw = rng.integers(0, 256, 210, dtype=np.uint8)
    raw[208:210] = np.frombuffer(np.float16(0.05).tobytes(), np.uint8)
    out = dequantize(raw, GGML_Q6_K, 256)

    d = np.float32(np.float16(0.05))
    ql = raw[:128]
    qh = raw[128:192]
    sc = raw[192:208].view(np.int8)
    expect = np.zeros(256, np.float32)
    for half in range(2):
        yoff = half * 128
        qloff = half * 64
        qhoff = half * 32
        soff = half * 8
        for l in range(32):
            q1 = int(ql[qloff + l] & 0xF) | ((int(qh[qhoff + l]) >> 0 & 3) << 4)
            q2 = int(ql[qloff + l + 32] & 0xF) | ((int(qh[qhoff + l]) >> 2 & 3) << 4)
            q3 = int(ql[qloff + l] >> 4) | ((int(qh[qhoff + l]) >> 4 & 3) << 4)
            q4 = int(ql[qloff + l + 32] >> 4) | ((int(qh[qhoff + l]) >> 6 & 3) << 4)
            expect[yoff + l] = d * int(sc[soff + l // 16]) * (q1 - 32)
            expect[yoff + l + 32] = d * int(sc[soff + 2 + l // 16]) * (q2 - 32)
            expect[yoff + l + 64] = d * int(sc[soff + 4 + l // 16]) * (q3 - 32)
            expect[yoff + l + 96] = d * int(sc[soff + 6 + l // 16]) * (q4 - 32)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)
