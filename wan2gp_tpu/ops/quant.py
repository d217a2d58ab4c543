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


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def dense_quant(x, p, dtype=None, backend: str = "auto"):
    """Dense layer over quantized params {w_q, scale[, b]}.

    x: [..., K]; returns [..., N] in `dtype` (default x.dtype)."""
    dtype = dtype or x.dtype
    lead = x.shape[:-1]
    xk = x.reshape(-1, x.shape[-1]).astype(dtype)
    use_pallas = backend in ("pallas", "pallas_interpret") or (
        backend == "auto" and _on_tpu())
    if use_pallas:
        y = matmul_w8(xk, p["w_q"], p["scale"],
                      interpret=backend == "pallas_interpret")
        y = y.astype(jnp.float32)
    else:
        w = p["w_q"].astype(dtype) * p["scale"].astype(dtype)[None, :]
        y = jnp.dot(xk, w, preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.reshape(*lead, -1).astype(dtype)


def quantize_params_tree(params, predicate=None):
    """Convert {"w": [K, N], ...} leaves to {"w_q", "scale", ...} across a
    param tree.  predicate(path) -> bool selects which linears to quantize
    (default: every 2D+ 'w' except embeddings)."""

    def walk(node, path=""):
        if isinstance(node, dict):
            if "w" in node and hasattr(node["w"], "ndim") \
                    and node["w"].ndim >= 2 \
                    and (predicate is None or predicate(path)):
                w = np.asarray(node["w"], np.float32)
                if w.ndim == 2:
                    w_q, scale = quantize_int8(w)
                else:  # stacked [L, K, N]
                    qs = [quantize_int8(w[i]) for i in range(w.shape[0])]
                    w_q = np.stack([q for q, _ in qs])
                    scale = np.stack([s for _, s in qs])
                out = {k: v for k, v in node.items() if k != "w"}
                out["w_q"] = jnp.asarray(w_q)
                out["scale"] = jnp.asarray(scale)
                return out
            return {k: walk(v, f"{path}/{k}") for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, f"{path}/{i}") for i, v in enumerate(node)]
        return node

    return walk(params)
