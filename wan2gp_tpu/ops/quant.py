"""Quantized weights: int8 per-channel storage + Pallas dequant-fused matmul.

Replaces the reference's quanto-int8 path (shared/qtypes + mmgp quant_router,
checkpoints named *_quanto_*_int8.safetensors) the TPU way: weights stay int8
in HBM (halving weight memory AND the HBM read traffic of every matmul); the
Pallas kernel dequantizes tiles in VMEM right before the MXU.

Layout: w_q int8 [K, N] with per-output-channel scale [N] so
y = (x @ w_q) * scale == x @ (w_q * scale).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def quantize_int8(w, axis: int = -1):
    """Per-output-channel symmetric int8 quantization of [K, N] -> (w_q,
    scale[N])."""
    w = np.asarray(w, np.float32)
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale[None, :]), -127, 127).astype(np.int8)
    return w_q, scale


def _w8_kernel(x_ref, w_ref, s_ref, o_ref, acc):
    k_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot(
        x_ref[:], w_ref[:].astype(x_ref.dtype),
        preferred_element_type=jnp.float32)

    @pl.when(k_i == nk - 1)
    def _():
        o_ref[:] = (acc[:] * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def matmul_w8(x, w_q, scale, block_m: int = 512, block_n: int = 512,
              block_k: int = 512, interpret: bool = False):
    """x: [M, K] bf16/f32; w_q: [K, N] int8; scale: [N] -> [M, N] x.dtype."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2

    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)
    bk = min(block_k, k)

    def pad(a, axis, mult):
        r = a.shape[axis] % mult
        if r == 0:
            return a
        padding = [(0, 0)] * a.ndim
        padding[axis] = (0, mult - r)
        return jnp.pad(a, padding)

    xp = pad(x, 0, bm)
    xp = pad(xp, 1, bk)
    wp = pad(pad(w_q, 0, bk), 1, bn)
    sp = pad(scale.reshape(1, -1), 1, bn)
    mp, kp = xp.shape
    np_ = wp.shape[1]

    out = pl.pallas_call(
        _w8_kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size * 2 + wp.size + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, wp, sp)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# int4 (w4) path: 4-bit weights packed two-per-byte, Pallas dequant-fused
# matmul.  Quarters weight HBM footprint/traffic vs bf16 — this is what lets
# Wan 14B (dim 5120, 40 layers, ~14.05B params -> ~7.0 GB) fit on a single
# 16 GB v5e chip together with 720p x 81f activations.
#
# Packing is split-K: packed[r, n] holds original rows r (low nibble) and
# r + KP/2 (high nibble), so the kernel unpacks WITHOUT any sublane
# interleave — it just runs two dots against two x row-blocks.
# ---------------------------------------------------------------------------

W4_BLOCK_K = 512  # packed-row block; one grid step covers 2*W4_BLOCK_K K rows


def quantize_int4(w, block_k: int = W4_BLOCK_K):
    """Per-output-channel symmetric int4 quantization of [K, N] ->
    (packed int8 [KP/2, N], scale [N]) with KP padded to 2*block_k."""
    w = np.asarray(w, np.float32)
    k, n = w.shape
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 7.0, 1.0).astype(np.float32)
    w_q = np.clip(np.round(w / scale[None, :]), -7, 7).astype(np.int8)
    kp = -(-k // (2 * block_k)) * (2 * block_k)
    if kp != k:
        w_q = np.pad(w_q, ((0, kp - k), (0, 0)))
    lo = w_q[: kp // 2].astype(np.uint8) & 0xF
    hi = (w_q[kp // 2:].astype(np.uint8) & 0xF) << 4
    return (lo | hi).view(np.int8), scale


def _w4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc):
    k_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:].astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(xlo_ref.dtype)   # sign-extended low nibble
    hi = (p >> 4).astype(xhi_ref.dtype)            # arithmetic shift: signed
    acc[:] += jax.lax.dot(xlo_ref[:], lo, preferred_element_type=jnp.float32)
    acc[:] += jax.lax.dot(xhi_ref[:], hi, preferred_element_type=jnp.float32)

    @pl.when(k_i == nk - 1)
    def _():
        o_ref[:] = (acc[:] * s_ref[0].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k_orig", "block_m", "block_n",
                                             "block_k", "interpret"))
def matmul_w4(x, w_p, scale, k_orig: int, block_m: int = 512,
              block_n: int = 512, block_k: int = W4_BLOCK_K,
              interpret: bool = False):
    """x: [M, K] bf16/f32; w_p: packed int8 [KP/2, N] from quantize_int4
    (same block_k); scale: [N].  Returns [M, N] in x.dtype."""
    m, k = x.shape
    assert k == k_orig
    kp2, n = w_p.shape
    kp = 2 * kp2
    assert kp % (2 * block_k) == 0

    bm = min(block_m, max(8, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)

    def pad(a, axis, mult):
        r = a.shape[axis] % mult
        if r == 0:
            return a
        padding = [(0, 0)] * a.ndim
        padding[axis] = (0, mult - r)
        return jnp.pad(a, padding)

    xp = pad(x, 0, bm)
    if kp != k:
        xp = jnp.pad(xp, ((0, 0), (0, kp - k)))
    wp = pad(w_p, 1, bn)
    sp = pad(scale.reshape(1, -1), 1, bn)
    mp = xp.shape[0]
    np_ = wp.shape[1]
    nk = kp2 // block_k

    out = pl.pallas_call(
        _w4_kernel,
        grid=(mp // bm, np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, block_k), lambda i, j, kk, _nk=nk:
                         (i, kk + _nk)),
            pl.BlockSpec((block_k, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size * 2 + wp.size + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, wp, sp)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# int8 activations (A8).  Per-token dynamic symmetric quantization; the
# s8 x s8 -> s32 MXU path runs at 2x the bf16 rate (v5e: 394 TOPS int8 vs
# 197 TFLOPs bf16), halving matmul time for the W8A8/W4A8 configs — the
# TPU-native analog of the reference's asym W4A8 qtype
# (/root/reference/shared/qtypes/asym_w4a8_int8.py: int8 activations
# against 4-bit weights, Triton decode kernel).
# ---------------------------------------------------------------------------

_ACT_QUANT = "bf16"


def set_act_quant(mode: str):
    """Process-wide activation-quantization policy consumed by dense_quant
    at TRACE time ("bf16" | "int8").  Set before the first compile of a
    pipeline (bench BENCH_A8=1; service quantize_activations setting)."""
    global _ACT_QUANT
    _ACT_QUANT = "int8" if str(mode) in ("int8", "a8", "8", "1", "true") \
        else "bf16"


def quantize_act_int8(x):
    """x: [M, K] float -> (x_q int8 [M, K], sx fp32 [M, 1]) per-row
    symmetric (SmoothQuant-style dynamic per-token scales).

    The absmax reduce and the divide chain run over a bf16 view of x:
    int8 rounding dominates the error budget, and reducing over a fp32
    copy of a [75600, 5120] activation materializes 1.4 GB twice (the
    reduce operand + a layout copy) — measured OOM at 14B/720p with the
    TeaCache residual stacks resident (bench_tea r04)."""
    xb = x if x.dtype == jnp.bfloat16 else x.astype(jnp.bfloat16)
    absmax = jnp.max(jnp.abs(xb), axis=-1, keepdims=True).astype(jnp.float32)
    sx = jnp.maximum(absmax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xb.astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    return xq, sx


def _w8a8_kernel(x_ref, w_ref, sw_ref, sx_ref, o_ref, acc):
    k_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    acc[:] += jax.lax.dot(x_ref[:], w_ref[:],
                          preferred_element_type=jnp.int32)

    @pl.when(k_i == nk - 1)
    def _():
        # both scales fold in-kernel so the HBM output stays bf16
        # (a fp32 [M, N] intermediate OOMed the 14B/720p config)
        o_ref[:] = (acc[:].astype(jnp.float32)
                    * sw_ref[0].astype(jnp.float32)
                    * sx_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k",
                                             "interpret"))
def matmul_w8a8(x, w_q, scale, block_m: int = 512, block_n: int = 512,
                block_k: int = 512, interpret: bool = False):
    """x: [M, K] float; w_q: [K, N] int8; scale: [N] -> [M, N] x.dtype.
    Activations quantize per-row on device; the kernel accumulates in
    int32 on the MXU s8 path and folds both scales before the bf16
    writeback."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2
    xq, sx = quantize_act_int8(x)

    bm = min(block_m, max(32, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)
    bk = min(block_k, k)

    xp = _pad2(xq, bm, bk)
    wp = _pad2(w_q, bk, bn)
    sp = _pad2(scale.reshape(1, -1), 1, bn)
    sxp = _pad2(sx, bm, 1)
    mp, kp = xp.shape
    np_ = wp.shape[1]

    out = pl.pallas_call(
        _w8a8_kernel,
        grid=(mp // bm, np_ // bn, kp // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size + wp.size + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, wp, sp, sxp)
    return out[:m, :n]


def _w4a8_kernel(xlo_ref, xhi_ref, w_ref, sw_ref, sx_ref, o_ref, acc):
    k_i = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    p = w_ref[:].astype(jnp.int32)
    lo = ((p << 28) >> 28).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    acc[:] += jax.lax.dot(xlo_ref[:], lo, preferred_element_type=jnp.int32)
    acc[:] += jax.lax.dot(xhi_ref[:], hi, preferred_element_type=jnp.int32)

    @pl.when(k_i == nk - 1)
    def _():
        o_ref[:] = (acc[:].astype(jnp.float32)
                    * sw_ref[0].astype(jnp.float32)
                    * sx_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k_orig", "block_m", "block_n",
                                             "block_k", "interpret"))
def matmul_w4a8(x, w_p, scale, k_orig: int, block_m: int = 512,
                block_n: int = 512, block_k: int = W4_BLOCK_K,
                interpret: bool = False):
    """x: [M, K] float; w_p: packed int4 [KP/2, N] (quantize_int4 layout);
    scale: [N] -> [M, N] x.dtype.  int8 activations against in-kernel
    nibble-unpacked int4 weights, int32 accumulation, scales folded
    before the bf16 writeback."""
    m, k = x.shape
    assert k == k_orig
    kp2, n = w_p.shape
    kp = 2 * kp2
    assert kp % (2 * block_k) == 0
    xq, sx = quantize_act_int8(x)

    bm = min(block_m, max(32, 1 << (m - 1).bit_length()))
    bn = min(block_n, n)

    xp = _pad2(xq, bm, 1)
    if kp != k:
        xp = jnp.pad(xp, ((0, 0), (0, kp - k)))
    wp = _pad2(w_p, 1, bn)
    sp = _pad2(scale.reshape(1, -1), 1, bn)
    sxp = _pad2(sx, bm, 1)
    mp = xp.shape[0]
    np_ = wp.shape[1]
    nk = kp2 // block_k

    out = pl.pallas_call(
        _w4a8_kernel,
        grid=(mp // bm, np_ // bn, nk),
        in_specs=[
            pl.BlockSpec((bm, block_k), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bm, block_k), lambda i, j, kk, _nk=nk:
                         (i, kk + _nk)),
            pl.BlockSpec((block_k, bn), lambda i, j, kk: (kk, j)),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j)),
            pl.BlockSpec((bm, 1), lambda i, j, kk: (i, 0)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=xp.size + wp.size + mp * np_ * 2,
            transcendentals=0),
        interpret=interpret,
    )(xp, xp, wp, sp, sxp)
    return out[:m, :n]


def _pad2(a, m0, m1):
    """Pad a 2D array so dims are multiples of (m0, m1)."""
    pads = []
    for axis, mult in enumerate((m0, m1)):
        r = a.shape[axis] % mult
        pads.append((0, mult - r) if r else (0, 0))
    if pads[0] == (0, 0) and pads[1] == (0, 0):
        return a
    return jnp.pad(a, pads)


def unpack_int4(w_p, scale, k_orig: int):
    """Dequantize packed int4 back to fp32 [K, N] (reference/test path)."""
    p = np.asarray(w_p).view(np.uint8)
    lo = (p & 0xF).astype(np.int8)
    lo = np.where(lo > 7, lo - 16, lo)
    hi = (p >> 4).astype(np.int8)
    hi = np.where(hi > 7, hi - 16, hi)
    w_q = np.concatenate([lo, hi], axis=0)[:k_orig]
    return w_q.astype(np.float32) * np.asarray(scale, np.float32)[None, :]


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def dense_quant(x, p, dtype=None, backend: str = "auto"):
    """Dense layer over quantized params {w_q|w_q4, scale[, b]}.

    x: [..., K]; returns [..., N] in `dtype` (default x.dtype).
    When the process activation policy is "int8" (set_act_quant), the
    Pallas path runs the W8A8/W4A8 kernels (int8 activations, int32 MXU
    accumulation) instead of bf16 activations."""
    dtype = dtype or x.dtype
    lead = x.shape[:-1]
    k = x.shape[-1]
    xk = x.reshape(-1, k).astype(dtype)
    use_pallas = backend in ("pallas", "pallas_interpret") or (
        backend == "auto" and _on_tpu())
    interp = backend == "pallas_interpret"
    a8 = _ACT_QUANT == "int8"
    if "w_q4" in p:
        if use_pallas and a8:
            y = matmul_w4a8(xk, p["w_q4"], p["scale"], k_orig=k,
                            interpret=interp)
        elif use_pallas:
            y = matmul_w4(xk, p["w_q4"], p["scale"], k_orig=k,
                          interpret=interp).astype(jnp.float32)
        else:
            pp = p["w_q4"].view(jnp.uint8)
            lo = (pp & 0xF).astype(jnp.int8)
            lo = jnp.where(lo > 7, lo - 16, lo)
            hi = (pp >> 4).astype(jnp.int8)
            hi = jnp.where(hi > 7, hi - 16, hi)
            w_q = jnp.concatenate([lo, hi], axis=0)[:k]
            w = w_q.astype(dtype) * p["scale"].astype(dtype)[None, :]
            y = jnp.dot(xk, w, preferred_element_type=jnp.float32)
    elif use_pallas and a8:
        y = matmul_w8a8(xk, p["w_q"], p["scale"], interpret=interp)
    elif use_pallas:
        y = matmul_w8(xk, p["w_q"], p["scale"],
                      interpret=interp)
        y = y.astype(jnp.float32)
    else:
        w = p["w_q"].astype(dtype) * p["scale"].astype(dtype)[None, :]
        y = jnp.dot(xk, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.reshape(*lead, -1).astype(dtype)


def quantize_params_tree(params, predicate=None, bits: int = 8,
                         min_dim: int = 0):
    """Convert {"w": [K, N], ...} leaves to {"w_q"|"w_q4", "scale", ...}
    across a param tree.  predicate(path) -> bool selects which linears to
    quantize (default: every 2D+ 'w' except embeddings).  bits: 8 or 4.
    min_dim: skip linears whose K or N is below this (norm-affines, small
    adapters — the reference's do_quantize likewise only converts the
    transformer's large linears)."""
    assert bits in (8, 4)
    qfn = quantize_int8 if bits == 8 else quantize_int4
    key = "w_q" if bits == 8 else "w_q4"

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") \
                    and node["w"].ndim >= 2 \
                    and min(node["w"].shape[-2:]) >= min_dim \
                    and (predicate is None or predicate(path)):
                w = np.asarray(node["w"], np.float32)
                if w.ndim == 2:
                    w_q, scale = qfn(w)
                else:  # stacked [L, K, N]
                    qs = [qfn(w[i]) for i in range(w.shape[0])]
                    w_q = np.stack([q for q, _ in qs])
                    scale = np.stack([s for _, s in qs])
                out = {k: v for k, v in node.items() if k != "w"}
                out[key] = jnp.asarray(w_q)
                out["scale"] = jnp.asarray(scale)
                return out
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params)
