"""Block-sparse flash attention (Pallas TPU) + structured mask builders.

TPU-native replacement for the reference's sparse-attention family —
Sol-Attn (models/wan/sol_attn), Radial attention, and Chipmunk-style
block sparsity — which are CUDA kernels selecting which key/value BLOCKS
each query block attends.  On TPU the same win comes from a flash kernel
whose kv loop runs only over each query block's active kv blocks:

- host side: a [nQb, nKb] boolean block mask is compressed into a dense
  per-q-block index table kv_idx [nQb, maxA] plus counts [nQb], where
  maxA = max active kv blocks over all rows;
- the Pallas grid is (batch*heads, nQb, maxA) and the K/V BlockSpec
  index maps read kv_idx via scalar prefetch, so only active blocks are
  ever DMA'd — FLOPs and HBM traffic scale with the mask density, not
  with L*S.  Padded slots re-point at the row's first active block and
  are neutralized with -inf scores.

Mask builders mirror the reference patterns:
- local_window_block_mask: banded attention (Sol-Attn style);
- radial_video_block_mask: per-frame window that decays with temporal
  distance plus an always-attended sink frame (radial attention style,
  reference models/wan/radial_attn design: full attention at distance 0,
  halved spatial coverage per doubling of |frame gap|).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30


# ---------------------------------------------------------------------------
# host-side mask compression
# ---------------------------------------------------------------------------

def compress_block_mask(block_mask: np.ndarray
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """[nQb, nKb] bool -> (kv_idx [nQb, maxA] int32, counts [nQb] int32).

    Rows with zero active blocks get count 0 (their output is zeros —
    matches fully-masked softmax convention in ops/attention.py)."""
    nqb, nkb = block_mask.shape
    counts = block_mask.sum(axis=1).astype(np.int32)
    max_a = max(1, int(counts.max()))
    kv_idx = np.zeros((nqb, max_a), np.int32)
    for i in range(nqb):
        act = np.nonzero(block_mask[i])[0]
        kv_idx[i, :len(act)] = act
        if len(act):
            kv_idx[i, len(act):] = act[0]     # padded slots re-read block 0
    return kv_idx, counts


def local_window_block_mask(seq_len: int, block: int,
                            window_blocks: int,
                            sink_blocks: int = 1) -> np.ndarray:
    """Banded mask: each q block attends kv blocks within +-window_blocks,
    plus the first sink_blocks blocks (attention sink)."""
    n = (seq_len + block - 1) // block
    i = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    mask = np.abs(i - j) <= window_blocks
    mask[:, :sink_blocks] = True
    return mask


def radial_video_block_mask(frames: int, tokens_per_frame: int, block: int,
                            decay_base: int = 1) -> np.ndarray:
    """Radial sparsity over a [frames * tokens_per_frame] video sequence.

    Frame pairs at temporal distance d keep a fraction 1/2^level of their
    kv blocks (level = floor(log2(d / decay_base)) + 1, level 0 at d <=
    decay_base), strided so coverage stays spatially uniform; frame 0 is
    an always-attended sink."""
    assert tokens_per_frame % block == 0, \
        "tokens_per_frame must be a multiple of the block size"
    bpf = tokens_per_frame // block
    n = frames * bpf
    mask = np.zeros((n, n), bool)
    for fq in range(frames):
        for fk in range(frames):
            d = abs(fq - fk)
            if d <= decay_base:
                stride = 1
            else:
                stride = 1 << (int(math.log2(d / decay_base)) + 1)
            qs = slice(fq * bpf, (fq + 1) * bpf)
            if stride >= 2 * bpf:
                continue
            sel = np.arange(fk * bpf, (fk + 1) * bpf)[::stride]
            mask[qs, sel] = True
    mask[:, :bpf] = True                      # sink: first frame
    for i in range(frames):                   # always keep the diagonal
        mask[i * bpf:(i + 1) * bpf, i * bpf:(i + 1) * bpf] = True
    return mask


def _frame_segments(n_tok: int, tpf: int, block: int):
    """Per-block (frame, in-frame position range) segments, up to two per
    block (a block straddling one frame boundary contributes two narrow
    segments; blocks wider than a frame fall back to the full range).
    Returns (seg_f, seg_plo, seg_phi) each [nb, 2]."""
    nb = -(-n_tok // block)
    starts = np.arange(nb) * block
    ends = np.minimum(starts + block, n_tok) - 1
    f_lo, f_hi = starts // tpf, ends // tpf
    straddle = f_hi > f_lo
    wide = (f_hi - f_lo) > 1                       # tpf < block
    seg_f = np.stack([f_lo, np.where(straddle, f_lo + 1, f_lo)], 1)
    seg_plo = np.stack([starts % tpf,
                        np.where(straddle, 0, starts % tpf)], 1)
    seg_phi = np.stack([np.where(straddle, tpf - 1, ends % tpf),
                        ends % tpf], 1)
    seg_plo[wide] = 0
    seg_phi[wide] = tpf - 1
    return seg_f, seg_plo, seg_phi


def radial_band_block_mask(frames: int, tokens_per_frame: int,
                           block: int = 128, decay_base: int = 1,
                           sink_frames: int = 1,
                           block_kv: int | None = None) -> np.ndarray:
    """Radial sparsity for ANY block size (blocks may straddle frame
    boundaries — the 720p grid's 3,600 tokens/frame is not a multiple of
    128).

    Band semantics (radial attention paper / reference
    shared/radial_attention/attn_mask.py): a (q, k) frame pair at temporal
    distance d attends a spatially-local band of width tokens_per_frame /
    2^level around the query's in-frame position (level = 0 full attention
    at d <= decay_base, then +1 per doubling of d).  Block granularity is
    conservative: a block pair is active if ANY spanned (token_q, token_k)
    pair is inside the band.  Frame 0 is an always-attended sink and the
    same-frame diagonal is always dense.
    """
    tpf = tokens_per_frame
    n_tok = frames * tpf
    bk = block_kv or block
    qf, qlo, qhi = _frame_segments(n_tok, tpf, block)
    kf, klo, khi = _frame_segments(n_tok, tpf, bk)
    nqb, nkb = qf.shape[0], kf.shape[0]

    def _band_half(d):
        level = np.zeros_like(d)
        far = d > decay_base
        level[far] = (np.floor(np.log2(d[far] / decay_base))
                      .astype(np.int64) + 1)
        return np.where(level == 0, tpf,            # d==0: dense
                        np.maximum(tpf >> (level + 1), bk // 2))

    # block pair active iff ANY (q segment, k segment) combination has an
    # in-frame position pair inside the band at their frame distance
    mask = np.zeros((nqb, nkb), bool)
    for a in range(2):
        for c in range(2):
            d = np.abs(qf[:, a][:, None] - kf[None, :, c])
            half = _band_half(d)
            p_min = np.maximum(
                0, np.maximum(
                    qlo[:, a][:, None] - khi[None, :, c],
                    klo[None, :, c] - qhi[:, a][:, None]))
            mask |= p_min <= half
    mask[:, :-(-sink_frames * tpf // bk)] = True           # sink frame(s)
    return mask


# ---------------------------------------------------------------------------
# kernel
# ---------------------------------------------------------------------------

def _sparse_flash_kernel(kv_idx_ref, counts_ref, q_ref, *refs, s_actual,
                         block_kv, kv_fetch):
    """Grid step = one q block x `kv_fetch` active kv blocks.

    Fetching several kv blocks per step amortizes the per-step fixed cost
    (scratch rescale + grid bookkeeping, ~1 us on v5e) over kv_fetch *
    block_kv keys — measured necessary to actually beat the dense b1024
    flash kernel: at (512, 512) single-fetch tiles the overhead cancels
    the ~2x FLOP saving of the radial mask."""
    k_refs = refs[:kv_fetch]
    v_refs = refs[kv_fetch:2 * kv_fetch]
    o_ref = refs[2 * kv_fetch]
    m_scr, l_scr, acc_scr = refs[2 * kv_fetch + 1:]

    qb = pl.program_id(1)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    parts = []
    for c in range(kv_fetch):
        s = jax.lax.dot_general(q, k_refs[c][0], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        valid = j * kv_fetch + c < counts_ref[qb]
        s = jnp.where(valid, s, _NEG_INF)
        if s_actual is not None:
            # ragged tail: keys past the true sequence end live in the
            # last kv block; mask them by global column index
            col = (kv_idx_ref[qb, j * kv_fetch + c] * block_kv
                   + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
            s = jnp.where(col < s_actual, s, _NEG_INF)
        parts.append(s)
    s = parts[0] if kv_fetch == 1 else jnp.concatenate(parts, axis=-1)

    m_prev = m_scr[:, :1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    p = jnp.where(m_new > _NEG_INF / 2, p, 0.0)

    l_new = l_scr[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if kv_fetch == 1:
        pv = jax.lax.dot_general(
            p.astype(v_refs[0].dtype), v_refs[0][0],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        v_all = jnp.concatenate([vr[0] for vr in v_refs], axis=0)
        pv = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc_scr[:] * alpha + pv

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    acc_scr[:] = acc

    @pl.when(j == n_j - 1)
    def _done():
        denom = l_scr[:, :1]
        denom = jnp.where(denom == 0.0, 1.0, denom)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv",
                                             "interpret", "s_actual",
                                             "kv_fetch"))
def _sparse_flash(q, k, v, kv_idx, counts, scale, block_q, block_kv,
                  interpret=False, s_actual=None, kv_fetch=1):
    """s_actual: the true (unpadded) key count when k/v carry a padded
    ragged tail — keys at column >= s_actual are masked inside the
    kernel.  kv_fetch: kv blocks consumed per grid step (see kernel)."""
    b, l, n, d = q.shape
    s_len = k.shape[1]
    assert l % block_q == 0 and s_len % block_kv == 0
    nqb, max_a = kv_idx.shape
    if max_a % kv_fetch:
        pad = kv_fetch - max_a % kv_fetch
        kv_idx = jnp.concatenate(
            [kv_idx, jnp.broadcast_to(kv_idx[:, :1], (nqb, pad))], axis=1)
        max_a += pad

    qf = (q * jnp.asarray(scale, q.dtype)).transpose(0, 2, 1, 3) \
        .reshape(b * n, l, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * n, s_len, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * n, s_len, d)

    if s_actual is not None and s_actual >= s_len:
        s_actual = None
    grid = (b * n, nqb, max_a // kv_fetch)

    def kv_spec(c):
        return pl.BlockSpec(
            (1, block_kv, d),
            lambda g, i, j, idx, cnt, c=c: (g, idx[i, j * kv_fetch + c], 0))

    out = pl.pallas_call(
        functools.partial(_sparse_flash_kernel, s_actual=s_actual,
                          block_kv=block_kv, kv_fetch=kv_fetch),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=(
                [pl.BlockSpec((1, block_q, d),
                              lambda g, i, j, idx, cnt: (g, i, 0))]
                + [kv_spec(c) for c in range(kv_fetch)]      # k fetches
                + [kv_spec(c) for c in range(kv_fetch)]),    # v fetches
            out_specs=pl.BlockSpec((1, block_q, d),
                                   lambda g, i, j, idx, cnt: (g, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, 128), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b * n, l, d), q.dtype),
        interpret=interpret,
    )(kv_idx, counts, qf, *([kf] * kv_fetch), *([vf] * kv_fetch))
    return out.reshape(b, n, l, d).transpose(0, 2, 1, 3)


def sparse_attention(q, k, v, block_mask: np.ndarray,
                     scale: float | None = None,
                     block_q: int = 128, block_kv: int = 128,
                     backend: str = "auto", interpret: bool = False,
                     kv_fetch: int | None = None):
    """Block-sparse attention.  q/k/v: [B, L, N, D]; block_mask:
    numpy [ceil(L/block_q), ceil(S/block_kv)] bool (host-static).

    backend "xla" (or any non-TPU platform) falls back to dense einsum
    attention with the expanded mask — bit-identical semantics, used as
    the test oracle."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    l, s_len = q.shape[1], k.shape[1]

    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "xla" or \
            (backend == "auto" and not (on_tpu or interpret)):
        mask = np.kron(block_mask,
                       np.ones((block_q, block_kv), bool))[:l, :s_len]
        sc = jnp.einsum("blnd,bsnd->bnls", q, k,
                        preferred_element_type=jnp.float32) * scale
        sc = jnp.where(jnp.asarray(mask)[None, None], sc, _NEG_INF)
        p = jax.nn.softmax(sc, axis=-1)
        row_any = jnp.asarray(mask.any(axis=1))[None, None, :, None]
        p = jnp.where(row_any, p, 0.0)
        return jnp.einsum("bnls,bsnd->blnd", p.astype(q.dtype), v)

    # pad sequences up to whole blocks; padded keys in the tail block are
    # masked inside the kernel by global column (s_actual)
    def padup(x, blk):
        rem = x.shape[1] % blk
        if rem:
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, blk - rem)
            x = jnp.pad(x, pad)
        return x
    q_p, k_p, v_p = padup(q, block_q), padup(k, block_kv), padup(v, block_kv)
    kv_idx, counts = compress_block_mask(np.asarray(block_mask, bool))
    if kv_fetch is None:
        # ~2k keys per softmax rescale amortizes the per-step fixed cost
        kv_fetch = max(1, 2048 // block_kv)
    out = _sparse_flash(q_p, k_p, v_p, jnp.asarray(kv_idx),
                        jnp.asarray(counts), scale, block_q, block_kv,
                        interpret=interpret,
                        s_actual=(s_len if s_len % block_kv else None),
                        kv_fetch=kv_fetch)
    return out[:, :l]


# ---------------------------------------------------------------------------
# Chipmunk-style dynamic block selection (reference models/wan/modules/
# model.py:886-905 setup_chipmunk + the external `chipmunk` package's
# voxel-order sparse-diff attention)
# ---------------------------------------------------------------------------

def voxel_order(grid, chunk=(4, 6, 8)):
    """Token permutation mapping row-major (f, h, w) order to voxel-chunk
    order (model.py:886: voxel_shape (4, 6, 8)) so that spatially local
    tokens land in the same attention block.  Returns (perm, inv_perm)
    int32 arrays of length f*h*w; grids not divisible by the chunk fall
    back to ragged tail voxels."""
    f, h, w = grid
    cf, ch, cw = chunk
    idx = np.arange(f * h * w).reshape(f, h, w)
    out = []
    for f0 in range(0, f, cf):
        for h0 in range(0, h, ch):
            for w0 in range(0, w, cw):
                out.append(idx[f0:f0 + cf, h0:h0 + ch,
                               w0:w0 + cw].ravel())
    perm = np.concatenate(out).astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def chipmunk_block_topk(q, k, block_q: int, block_kv: int, topk: int,
                        scale: float | None = None):
    """Derive per-q-block top-k kv-block index tables FROM THE DATA — the
    dynamic half of the chipmunk policy: block-mean queries and keys score
    every block pair; each query block keeps its top-k mass blocks.

    q, k: [B, L, N, D] (voxel-ordered).  Returns (kv_idx [nQb, topk] int32,
    counts [nQb] int32) device arrays consumable by _sparse_flash — the
    tables are runtime inputs (scalar prefetch), so mask updates between
    denoise steps do NOT recompile the kernel."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    l, s_len = q.shape[1], k.shape[1]
    nqb = -(-l // block_q)
    nkb = -(-s_len // block_kv)
    topk = min(topk, nkb)

    def pool(x, blk, nblk):
        pad = nblk * blk - x.shape[1]
        if pad:
            x = jnp.pad(x, [(0, 0), (0, pad), (0, 0), (0, 0)])
        return x.reshape(x.shape[0], nblk, blk, *x.shape[2:]).mean(axis=2)

    qb = pool(q.astype(jnp.float32), block_q, nqb)     # [B, nQb, N, D]
    kb = pool(k.astype(jnp.float32), block_kv, nkb)
    # mass over batch and heads (one shared mask, like the reference's
    # per-layer cached mask)
    s = jnp.einsum("bqnd,bknd->qk", qb, kb) * scale
    _, idx = jax.lax.top_k(s, topk)                    # [nQb, topk]
    counts = jnp.full((nqb,), topk, jnp.int32)
    return idx.astype(jnp.int32), counts


def chipmunk_attention(q, k, v, kv_idx, counts, block_q: int = 128,
                       block_kv: int = 128, scale: float | None = None,
                       interpret: bool = False, backend: str = "auto"):
    """Block-sparse attention over RUNTIME index tables (the chipmunk
    sparse step; pair with chipmunk_block_topk refreshed every
    `full_step_every` steps).  q/k/v: [B, L, N, D]."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    l, s_len = q.shape[1], k.shape[1]
    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "xla" or (backend == "auto" and not (on_tpu or interpret)):
        # dense fallback honoring the tables (oracle path)
        nqb = kv_idx.shape[0]
        nkb = -(-s_len // block_kv)
        onehot = jax.nn.one_hot(kv_idx, nkb, dtype=jnp.float32).sum(1) > 0
        mask = jnp.repeat(jnp.repeat(onehot, block_q, 0), block_kv, 1)
        mask = mask[:l, :s_len]
        sc = jnp.einsum("blnd,bsnd->bnls", q, k,
                        preferred_element_type=jnp.float32) * scale
        sc = jnp.where(mask[None, None], sc, _NEG_INF)
        p = jax.nn.softmax(sc, axis=-1)
        return jnp.einsum("bnls,bsnd->blnd", p.astype(q.dtype), v)

    def padup(x, blk):
        rem = x.shape[1] % blk
        if rem:
            pad = [(0, 0)] * x.ndim
            pad[1] = (0, blk - rem)
            x = jnp.pad(x, pad)
        return x
    q_p, k_p, v_p = padup(q, block_q), padup(k, block_kv), padup(v, block_kv)
    out = _sparse_flash(q_p, k_p, v_p, kv_idx, counts, scale, block_q,
                        block_kv, interpret=interpret)
    return out[:, :l]


# ---------------------------------------------------------------------------
# Chipmunk delta-caching step policy (the dynamic half of the chipmunk
# package's SparseDiffAttn consumed by reference models/wan/modules/
# model.py:886-905: a dense "calibration" step every `full_step_every`
# steps refreshes the top-k block tables AND caches the residual between
# the dense and sparse outputs; intermediate steps run only the sparse
# kernel and add the cached residual back)
# ---------------------------------------------------------------------------

def chipmunk_schedule(num_steps: int, full_step_every: int = 4
                      ) -> np.ndarray:
    """Host-side dense/sparse plan: step 0 and every `full_step_every`th
    step run dense (True)."""
    steps = np.arange(max(1, int(num_steps)))
    return (steps % max(1, int(full_step_every))) == 0


def init_chipmunk_state(batch: int, seq: int, heads: int, head_dim: int,
                        topk: int, block_q: int = 128,
                        block_kv: int = 128, dtype=jnp.float32):
    """Zero state pytree with static shapes for scan carries: index
    tables select block 0 until the first dense step refreshes them."""
    nqb = -(-seq // block_q)
    return {
        "kv_idx": jnp.zeros((nqb, topk), jnp.int32),
        "counts": jnp.full((nqb,), topk, jnp.int32),
        "delta": jnp.zeros((batch, seq, heads, head_dim), dtype),
    }


def chipmunk_step(q, k, v, state, is_dense, topk: int,
                  block_q: int = 128, block_kv: int = 128,
                  scale: float | None = None, backend: str = "auto",
                  interpret: bool = False):
    """One attention step under the chipmunk policy.

    is_dense may be a Python bool (host loop) or a traced scalar (the
    branch runs through `lax.cond`; both branches have static shapes).
    Returns (output [B, L, N, D], new_state)."""
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    def dense_branch(_):
        from .attention import attention
        o_d = attention(q, k, v, backend="xla" if interpret
                        else backend)
        kv_idx, counts = chipmunk_block_topk(q, k, block_q, block_kv,
                                             topk, scale)
        # pad tables to the static top-k width (small grids clamp)
        pad = topk - kv_idx.shape[1]
        if pad > 0:
            kv_idx_p = jnp.pad(kv_idx, ((0, 0), (0, pad)))
        else:
            kv_idx_p = kv_idx
        o_s = chipmunk_attention(q, k, v, kv_idx, counts, block_q,
                                 block_kv, scale, backend=backend,
                                 interpret=interpret)
        new = {"kv_idx": kv_idx_p.astype(jnp.int32),
               "counts": jnp.minimum(counts, kv_idx.shape[1]
                                     ).astype(jnp.int32),
               "delta": (o_d - o_s).astype(state["delta"].dtype)}
        return o_d, new

    def sparse_branch(_):
        o_s = chipmunk_attention(q, k, v, state["kv_idx"],
                                 state["counts"], block_q, block_kv,
                                 scale, backend=backend,
                                 interpret=interpret)
        return o_s + state["delta"].astype(o_s.dtype), state

    if isinstance(is_dense, (bool, np.bool_)):
        return dense_branch(None) if is_dense else sparse_branch(None)
    return jax.lax.cond(is_dense, dense_branch, sparse_branch, None)
