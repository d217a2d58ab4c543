"""NF4 / W4A8 load-time dequantization vs torch oracles of the reference
math (shared/qtypes/{bnb_nf4,asym_w4a8_int8,int8_convrot}.py)."""
import json

import numpy as np
import pytest
import torch

from wan2gp_tpu.io.quant_formats import (
    NF4_QUANT_MAP, dequantize_nf4_sd, dequantize_w4a8_sd,
    normalize_quant_formats, regular_hadamard)


def test_regular_hadamard_matches_reference():
    # int8_convrot.py:171-192 — kron powers of the 4x4 seed, orthonormal
    h4 = torch.tensor([[1, 1, 1, -1], [1, 1, -1, 1],
                       [1, -1, 1, 1], [-1, 1, 1, 1]], dtype=torch.float64)
    ref = torch.kron(h4, h4) * (16 ** -0.5)
    got = regular_hadamard(16)
    np.testing.assert_allclose(got, ref.numpy(), atol=1e-6)
    h = regular_hadamard(256)
    np.testing.assert_allclose(h @ h.T, np.eye(256), atol=1e-4)
    np.testing.assert_allclose(h, h.T, atol=1e-7)      # symmetric


def _nf4_pack(w, blocksize=4):
    """Quantize a float matrix to bnb-NF4 layout (high nibble first)."""
    out_f, in_f = w.shape
    flat = w.reshape(-1, blocksize)
    absmax = np.abs(flat).max(1)
    absmax = np.where(absmax == 0, 1.0, absmax)
    norm = flat / absmax[:, None]
    codes = np.abs(norm[..., None] - NF4_QUANT_MAP[None, None]).argmin(-1)
    codes = codes.reshape(-1).astype(np.uint8)
    packed = (codes[0::2] << 4) | codes[1::2]
    deq = (NF4_QUANT_MAP[codes].reshape(-1, blocksize) *
           absmax[:, None]).reshape(out_f, in_f)
    return packed, absmax.astype(np.float32), deq.astype(np.float32)


def test_nf4_dequant_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    packed, absmax, expect = _nf4_pack(w, blocksize=4)
    state = json.dumps({"shape": [8, 16], "blocksize": 4}).encode()
    sd = {"layer.weight": packed.reshape(-1, 1),
          "layer.weight.absmax": absmax,
          "layer.weight.quant_map": NF4_QUANT_MAP,
          "layer.weight.quant_state.bitsandbytes__nf4":
              np.frombuffer(state, np.uint8),
          "other.weight": np.ones((2, 2), np.float32)}
    out = dequantize_nf4_sd(sd)
    assert out["layer.weight"].shape == (8, 16)
    np.testing.assert_allclose(out["layer.weight"], expect, atol=1e-6)
    # untouched keys survive; quant sidecars consumed
    assert "other.weight" in out
    assert not any("quant_map" in k or "absmax" in k for k in out)


def test_nf4_double_quant():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((4, 8)).astype(np.float32)
    packed, absmax, _ = _nf4_pack(w, blocksize=4)
    # nested-quantize absmax with an identity-ish codebook
    offset = float(absmax.mean())
    shifted = absmax - offset
    nested_bs = 8
    nb = -(-shifted.size // nested_bs)
    padded = np.pad(shifted, (0, nb * nested_bs - shifted.size))
    nested_absmax = np.abs(padded.reshape(nb, nested_bs)).max(1)
    nested_absmax = np.where(nested_absmax == 0, 1, nested_absmax)
    qmap256 = np.linspace(-1, 1, 256).astype(np.float32)
    codes = np.abs(padded.reshape(nb, nested_bs) /
                   nested_absmax[:, None] - qmap256[None, None].T.reshape(
                       256, 1, 1)).argmin(0).astype(np.uint8)
    state = json.dumps({"shape": [4, 8], "blocksize": 4,
                        "nested_blocksize": nested_bs,
                        "nested_offset": offset}).encode()
    sd = {"m.weight": packed,
          "m.weight.absmax": codes.reshape(-1)[:absmax.size],
          "m.weight.nested_absmax": nested_absmax,
          "m.weight.nested_quant_map": qmap256,
          "m.weight.quant_map": NF4_QUANT_MAP,
          "m.weight.quant_state.bitsandbytes__nf4":
              np.frombuffer(state, np.uint8)}
    out = dequantize_nf4_sd(sd)
    assert out["m.weight"].shape == (4, 8)
    assert np.isfinite(out["m.weight"]).all()


def test_w4a8_dequant_matches_reference_decode():
    """Float-equivalent weight reproduces the reference decode + scaled
    int8 matmul semantics (asym_w4a8_int8.py _decode_w4a8_torch)."""
    rng = np.random.default_rng(2)
    n, k, group = 4, 512, 128
    packed = rng.integers(-128, 128, (n, k // 2)).astype(np.int8)
    s_rel = (rng.random((n, k // group)).astype(np.float32) + 0.5) * 20
    s_channel = rng.random(n).astype(np.float32) * 0.01
    codebook = np.sort(rng.standard_normal(16)).astype(np.float32) * 6

    # reference decode (torch mirror)
    qdata = torch.from_numpy(packed)
    pk = qdata.to(torch.uint8)
    indices = torch.empty((n, k), dtype=torch.uint8)
    indices[:, 0::2] = pk & 0xF
    indices[:, 1::2] = pk >> 4
    values = torch.from_numpy(codebook)[indices.long()]
    values = values.view(n, -1, group)
    values = values.mul(torch.from_numpy(s_rel).unsqueeze(-1)) \
        .round_().clamp_(-127, 127).view(n, -1)
    w_ref_rot = values.numpy() * s_channel[:, None]

    sd = {"l.weight": packed, "l.weight_s_rel": s_rel,
          "l.weight_s_channel": s_channel, "l.weight_codebook": codebook}
    out = dequantize_w4a8_sd(sd)
    w = out["l.weight"]
    assert w.shape == (n, k)
    # counter-rotation: W_plain @ x == W_rot @ (x rotated per 256 group)
    x = rng.standard_normal(k).astype(np.float32)
    h = regular_hadamard(256)
    x_rot = (x.reshape(-1, 256) @ h).reshape(-1)
    np.testing.assert_allclose(w @ x, w_ref_rot @ x_rot, rtol=2e-4,
                               atol=2e-3)


def test_w4a8_correction_term():
    """correction[g, n] adds per-group constants to the effective weight
    (asym_w4a8_int8.py:286-307 addmm of activation group sums)."""
    rng = np.random.default_rng(3)
    n, k, group = 2, 256, 64
    packed = np.zeros((n, k // 2), np.int8)      # all-zero nibbles
    s_rel = np.ones((n, k // group), np.float32)
    s_channel = np.ones(n, np.float32)
    corr = rng.standard_normal((k // group, n)).astype(np.float32)
    sd = {"l.weight": packed, "l.weight_s_rel": s_rel,
          "l.weight_s_channel": s_channel, "l.weight_correction": corr}
    out = dequantize_w4a8_sd(sd)
    # zero nibble -> value -8 -> decoded -8; W_rot = -8 + corr term
    expect_rot = np.full((n, k), -8.0, np.float32) + \
        np.repeat(corr.T, group, axis=1)
    h = regular_hadamard(256)
    expect = (expect_rot.reshape(n, 1, 256) @ h).reshape(n, k)
    np.testing.assert_allclose(out["l.weight"], expect, atol=1e-4)


def test_normalize_passthrough():
    sd = {"a.weight": np.ones((2, 2), np.float32)}
    out = normalize_quant_formats(sd)
    np.testing.assert_allclose(out["a.weight"], 1.0)


def test_nvfp4_dequant_matches_reference_lut():
    """FP4-e2m1 nibble LUT + per-16-block scales + global scale
    (nvfp4.py:505-601), verified against a torch re-derivation."""
    import torch
    from wan2gp_tpu.io.quant_formats import dequant_nvfp4, normalize_nvfp4
    rng = np.random.default_rng(0)
    m, k = 4, 64
    w = rng.integers(0, 256, (m, k // 2), dtype=np.uint8)
    scale = rng.uniform(0.5, 2.0, (m, k // 16)).astype(np.float32)
    g = 0.37
    got = dequant_nvfp4(w, scale, g)

    lut = torch.tensor([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0,
                        0.0, -0.5, -1.0, -1.5, -2.0, -3.0, -4.0, -6.0])
    b = torch.tensor(w.astype(np.int32))
    vals = torch.empty((m, k))
    vals[:, 0::2] = lut[b & 0x0F]
    vals[:, 1::2] = lut[b >> 4]
    vals = vals.view(m, k // 16, 16) * torch.tensor(scale)[:, :, None]
    ref = (vals.view(m, k) * g).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6)

    sd = {"blocks.0.attn.q.weight": w,
          "blocks.0.attn.q.weight_scale": scale,
          "blocks.0.attn.q.weight_scale_2": np.float32(g),
          "blocks.0.attn.q.bias": np.zeros(m, np.float32)}
    out = normalize_nvfp4(sd)
    np.testing.assert_allclose(out["blocks.0.attn.q.weight"], ref,
                               rtol=1e-6)
    assert "blocks.0.attn.q.weight_scale" not in out
    assert "blocks.0.attn.q.bias" in out
