"""Attention ops: Pallas TPU flash-attention kernel + XLA reference path.

This is the single attention entry point for every model in the framework —
the TPU-native analog of the reference's `pay_attention` dispatcher
(/root/reference/shared/attention.py:360).  Semantics: plain scaled dot-product
attention over [B, L, N, D] tensors with softmax in fp32 and default scale
1/sqrt(D), exactly what the reference's SDPA/flash/sage backends compute.

The Pallas kernel is an online-softmax flash attention, blocked over
(batch, heads, q-blocks, kv-blocks) with the kv axis innermost so the running
max / denominator / accumulator live in VMEM scratch across kv iterations.
It consumes the model-native [B, L, N, D] layout directly (BlockSpec slices
the head axis) — no transpose passes.  q is pre-scaled outside the kernel so
the hot loop does no per-tile scaling.  Measured 0.68 MFU at the 14B/720p
shape (L=75,600, 40 heads, D=128) on TPU v5e with the default (2048, 1024)
blocks — the v5e sweep: (1024,1024) 0.65, (2048,1024) 0.68, (512,1024) 0.58,
(2048,512) 0.41; (2048,2048)+ exceeds VMEM.
"""
from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, s_actual, block_kv, masked):
    kv_i = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]  # [BQ, D]
    k = k_ref[0]  # [BK, D]
    v = v_ref[0]  # [BK, D]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # [BQ, BK]

    if masked:
        # only the final kv block can contain padded keys
        col = kv_i * block_kv + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where((kv_i < n_kv - 1) | (col < s_actual), s, _NEG_INF)

    m_prev = m_scr[:, :1]                                   # [BQ, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)              # [BQ, 1]
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)                         # [BQ, 1]
    p = jnp.exp(s - m_new)                                  # [BQ, BK]

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(kv_i == n_kv - 1)
    def _done():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _flash_kernel_kvmask(q_ref, k_ref, v_ref, kvm_ref, o_ref,
                         m_scr, l_scr, acc_scr):
    """Flash attention with an explicit per-key validity mask.

    kvm_ref block is [1, 8, BK] fp32 (the 8-row sublane axis exists only
    to satisfy the TPU (8, 128) tile constraint — every row is the same
    mask); row 0 is read."""
    kv_i = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_i == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = jnp.where(kvm_ref[0, 0][None, :] > 0, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    # fully-masked block: m_new stays _NEG_INF and p would be exp(0)=1
    p = jnp.where(m_new > _NEG_INF / 2, p, 0.0)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc_scr[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(kv_i == n_kv - 1)
    def _done():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    rem = size % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, multiple - rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_q", "block_kv", "interpret"))
def _flash_attention(q, k, v, scale: float, block_q: int, block_kv: int,
                     interpret: bool = False, kv_mask=None):
    """q: [B, L, N, D], k/v: [B, S, N, D] -> [B, L, N, D].

    kv_mask: optional [B, S] bool/int key-validity mask (False = padded key,
    e.g. padded text positions inside a packed [txt, img] sequence)."""
    b, l_actual, n, d = q.shape
    s_actual = k.shape[1]

    block_q = min(block_q, max(128, 1 << (l_actual - 1).bit_length()))
    block_kv = min(block_kv, max(128, 1 << (s_actual - 1).bit_length()))

    q = _pad_to(q * jnp.asarray(scale, q.dtype), 1, block_q)
    k = _pad_to(k, 1, block_kv)
    v = _pad_to(v, 1, block_kv)
    l_pad, s_pad = q.shape[1], k.shape[1]

    # [B, L, N, D] -> [B*N, L, D]: contiguous per-head sequences give the DMA
    # full-row bursts (measured faster than strided head-column slicing).
    qf = q.transpose(0, 2, 1, 3).reshape(b * n, l_pad, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, s_pad, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, s_pad, d)

    grid = (b * n, l_pad // block_q, s_pad // block_kv)

    scratch = [
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, 128), jnp.float32),
        pltpu.VMEM((block_q, d), jnp.float32),
    ]
    cost = pl.CostEstimate(
        flops=4 * b * n * l_pad * s_pad * d,
        bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
        transcendentals=b * n * l_pad * s_pad,
    )
    out_spec = pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0))
    qkv_specs = [
        pl.BlockSpec((1, block_q, d), lambda g, i, j: (g, i, 0)),
        pl.BlockSpec((1, block_kv, d), lambda g, i, j: (g, j, 0)),
        pl.BlockSpec((1, block_kv, d), lambda g, i, j: (g, j, 0)),
    ]

    if kv_mask is not None:
        # [B, S] -> [B, 8, S] fp32: the TPU tile constraint wants the
        # last two block dims (8k, 128m); a [1, S] int8 block is rejected
        # by Mosaic (observed on v5e — CPU interpret mode accepts it, so
        # only hardware runs caught this).  index_map uses lax.div: the
        # python `g // n` floor-division lowers with a negative-correction
        # select that Mosaic also rejects.
        kvm = _pad_to(kv_mask.astype(jnp.float32), 1, block_kv)
        kvm = jnp.broadcast_to(kvm[:, None, :], (b, 8, kvm.shape[1]))
        out = pl.pallas_call(
            _flash_kernel_kvmask,
            grid=grid,
            in_specs=qkv_specs + [
                pl.BlockSpec((1, 8, block_kv),
                             lambda g, i, j, n=n: (jax.lax.div(g, n), 0,
                                                   j))],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b * n, l_pad, d), q.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=interpret,
        )(qf, kf, vf, kvm)
    else:
        out = pl.pallas_call(
            functools.partial(_flash_kernel, s_actual=s_actual,
                              block_kv=block_kv, masked=s_pad != s_actual),
            grid=grid,
            in_specs=qkv_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b * n, l_pad, d), q.dtype),
            scratch_shapes=scratch,
            cost_estimate=cost,
            interpret=interpret,
        )(qf, kf, vf)
    return out.reshape(b, n, l_pad, d).transpose(0, 2, 1, 3)[:, :l_actual]


def _xla_attention(q, k, v, scale, kv_mask=None):
    """Reference path: einsum attention with fp32 softmax. q/k/v: [B,L,N,D]."""
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) * scale
    if kv_mask is not None:
        s = jnp.where(kv_mask[:, None, None, :] > 0, s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bnls,bsnd->blnd", p.astype(v.dtype), v)
    return out.astype(q.dtype)


def _on_tpu():
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


@functools.lru_cache(maxsize=32)
def _structured_block_mask(spec: str, l: int, s: int, block_q: int,
                           block_kv: int):
    """Host-static [nQb, nKb] block mask for a parameterized sparse
    backend string.

    Specs (the TPU analog of the reference's attention-mode config,
    shared/attention.py:294 resolve_attention_mode; radial hook
    models/wan/modules/model.py:374-379):
      "radial:<frames>:<tokens_per_frame>[:<decay_base>]"
      "swa:<window_blocks>[:<sink_blocks>]"
    Returns the mask or None when the spec does not apply to the (l, s)
    shape — the caller then falls back to dense attention (e.g.
    cross-attention, extra-kv variants)."""
    from .sparse_attention import (radial_band_block_mask,
                                   local_window_block_mask)
    parts = spec.split(":")
    kind, args = parts[0], parts[1:]
    if l != s:
        return None
    if kind == "radial":
        if len(args) < 2:
            return None
        frames, tpf = int(args[0]), int(args[1])
        decay = int(args[2]) if len(args) > 2 else 1
        if frames * tpf != l or frames < 2:
            return None
        return radial_band_block_mask(frames, tpf, block=block_q,
                                      decay_base=decay, block_kv=block_kv)
    if kind == "swa":
        window = int(args[0]) if args else 4
        sink = int(args[1]) if len(args) > 1 else 1
        nkb = -(-l // block_kv)
        m = local_window_block_mask(nkb * block_kv, block_kv, window, sink)
        rq = block_q // block_kv
        if rq > 1:                      # group kv-granularity rows (any)
            pad = -len(m) % rq
            if pad:
                m = np.concatenate([m, np.zeros((pad, m.shape[1]), bool)])
            m = m.reshape(-1, rq, m.shape[1]).any(axis=1)
        return m
    return None


def _structured_sparse(q, k, v, backend: str, scale: float,
                       block_q: int = 512, block_kv: int = 256):
    """Dispatch a "radial:…"/"swa:…" backend; None when not applicable.

    Tile defaults from the v5e sweep at 21x3600 tokens (81f 720p):
    (512, 256) with kv_fetch 8 runs 1.45x faster than the dense b1024
    flash kernel at radial density 0.455.  The kv-index table rides the
    kernel's scalar-prefetch SMEM (~1 MB); when it would crowd that
    budget the kv block size is promoted."""
    from .sparse_attention import sparse_attention, compress_block_mask
    mask = _structured_block_mask(backend, q.shape[1], k.shape[1],
                                  block_q, block_kv)
    if mask is None:
        return None
    while block_kv < 1024:
        kv_idx, _ = compress_block_mask(np.asarray(mask))
        if kv_idx.size * 4 <= 400 * 1024:
            break
        block_kv *= 2
        mask = _structured_block_mask(backend, q.shape[1], k.shape[1],
                                      block_q, block_kv)
        if mask is None:
            return None
    return sparse_attention(q, k, v, mask, scale=scale, block_q=block_q,
                            block_kv=block_kv)


def attention(q, k, v, scale: float | None = None, backend: str = "auto",
              block_q: int = 2048, block_kv: int = 1024, kv_mask=None):
    """Scaled dot-product attention.

    q: [B, L, N, D]; k, v: [B, S, N, D] (same head count).
    Returns [B, L, N, D] in q.dtype.  softmax accumulates in fp32.
    backend: "auto" (pallas on TPU, xla elsewhere), "xla", "pallas",
             "pallas_interpret" (for CPU testing of the kernel).
    kv_mask: optional [B, S] key-validity mask (False = padded key); with
             the ring backend, pass the LOCAL mask shard — it rotates
             around the ring with its K/V shard.
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    if backend.startswith(("radial", "swa")):
        # structured block-sparse self-attention (radial analog);
        # non-matching shapes (cross-attention, extra-kv variants) and
        # masked calls fall back to the dense default
        if kv_mask is None:
            out = _structured_sparse(q, k, v, backend, scale)
            if out is not None:
                return out
        backend = "auto"
    if backend.startswith("sol"):
        # data-dependent Sol-Attn: QK-stat threshold routing + centroid
        # fallback (reference shared/sol_attn/, interface.py:69);
        # "sol[:tau[:budget[:thresh_type]]]" — self-attention only,
        # cross/masked calls fall back to dense
        if kv_mask is None and q.shape[1] == k.shape[1] \
                and q.shape[1] >= 1024:
            from .sol_attention import sol_attention, parse_sol_backend
            return sol_attention(q, k, v, scale=scale,
                                 **parse_sol_backend(backend))
        backend = "auto"
    if backend.startswith("ring"):
        # context-parallel ring attention inside shard_map; backend
        # "ring" or "ring:<axis>" (default axis 'cp')
        from ..parallel.ring_attention import ring_attention
        axis = backend.split(":", 1)[1] if ":" in backend else "cp"
        return ring_attention(q, k, v, axis_name=axis, scale=scale,
                              kv_mask=kv_mask)
    if backend.startswith("ulysses"):
        # all-to-all sequence parallelism inside shard_map; backend
        # "ulysses" or "ulysses:<axis>" (default axis 'sp')
        from ..parallel.ulysses import ulysses_attention
        axis = backend.split(":", 1)[1] if ":" in backend else "sp"
        return ulysses_attention(q, k, v, axis_name=axis, scale=scale,
                                 kv_mask=kv_mask)
    interpret = backend == "pallas_interpret"
    use_pallas = backend in ("pallas", "pallas_interpret") or (
        backend == "auto" and _on_tpu())
    if not use_pallas:
        return _xla_attention(q, k, v, scale, kv_mask=kv_mask)
    return _flash_attention(q, k, v, scale, block_q, block_kv,
                            interpret=interpret, kv_mask=kv_mask)
