"""Sol-Attn: DATA-DEPENDENT block-sparse attention with centroid fallback.

TPU-native reimplementation of the reference's Sol-Attn (NVlabs Sana
variant bundled at shared/sol_attn/: preprocess.py builds per-block
summaries + routing thresholds, triton_kernels/fwd.py:80-180 routes each
(q-block, kv-block) pair EXACT or APPROXIMATE inside one online softmax,
interface.py:69 `sol_attn` is the public entry).  Semantics preserved:

- K/V are pooled per kv block: kc = block MEAN of K, vm = block MEAN of V
  (the reference stores the block SUM vc; sum = mean * block_len and the
  length shows up below).
- A per-(batch, head, q-block) routing threshold is derived from QK
  statistics (preprocess.py:465 `prepare`):
    * "diag":  thr = qc.mean_kc * s  +  tau * sqrt((qc^2).var_kc) * s
      where qc is the q-block centroid, mean_kc/var_kc are the
      per-dimension mean/variance of kc across kv blocks (a diagonal-
      covariance approximation of the block-score distribution);
    * "exact": the block scores qc.kc^T * s are materialized and
      thr = mean + tau * std over kv blocks, per q block.
- A kv block is EXACT for a q block when its routing score
  mean_rows(q.kc^T) * s exceeds the threshold, when it is within +-1
  block of the diagonal, or when it is in the sink range (fwd.py:101-110).
  Exact blocks get full per-key attention.
- Every other block contributes a single super-token: per-row score
  q.kc * s with softmax weight multiplied by the block length
  (fwd.py:112-136: probability * vc where vc is the V block SUM and the
  denominator adds probability * block_len) — mass is approximated, not
  dropped.
- Both contributions merge in one online softmax.

TPU mapping: the exact set is a per-(batch*head) runtime index table
consumed by the block-sparse flash kernel in ops/sparse_attention.py
(scalar prefetch — mask changes between steps do NOT recompile), which
returns the per-row logsumexp; the approximate branch is a dense XLA
attention over the tiny centroid sequence (nKb ~ L/block: <1% of the
dense FLOPs), chunked over queries to bound the [L, nKb] temporaries;
the two partial softmaxes merge by lse.

Static-shape note (the one real deviation from the CUDA kernel): a jit
program cannot have a data-dependent FLOP count, so the exact table has
a fixed per-row width W = ceil(budget * nKb).  Rows where fewer blocks
pass the threshold mask the tail slots (compute is spent but masked);
rows where more pass keep the top-W by routing margin and the rest fall
back to the (mathematically covered) centroid path.  `budget` is the
compute knob; the data decides WHICH blocks are exact.
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


# ---------------------------------------------------------------------------
# block summaries + thresholds (reference preprocess.py `prepare`)
# ---------------------------------------------------------------------------

def block_pool(x, block: int):
    """[B, S, H, D] -> (means [B, nb, H, D] f32, lens [nb] f32).

    Accumulates in f32 WITHOUT materializing a f32 copy of x (a bf16
    [75600, 40, 128] activation would copy 1.5 GB otherwise)."""
    b, s, h, d = x.shape
    nb = -(-s // block)
    pad = nb * block - s
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
    sums = x.reshape(b, nb, block, h, d).sum(axis=2, dtype=jnp.float32)
    lens = np.full((nb,), block, np.float32)
    if pad:
        lens[-1] = block - pad
    return sums / jnp.asarray(lens)[None, :, None, None], lens


def sol_thresholds(qc, kc, scale: float, tau: float,
                   thresh_type: str = "diag"):
    """Per-(batch, head, q-block) routing threshold.

    qc: [B, nQb, H, D] query-block centroids; kc: [B, nKb, H, D].
    Returns thr [B, H, nQb] f32 (natural-log score scale — the reference
    works in log2 space; both sides of the comparison scale together so
    the routing decision is identical)."""
    if thresh_type == "exact":
        # preprocess.py _exact_fused_threshold_kernel: materialize the
        # block-score table and take mean + tau * std per q block
        s = jnp.einsum("bqhd,bkhd->bhqk", qc, kc) * scale
        mean = s.mean(axis=-1)
        var = jnp.maximum(s.var(axis=-1), 0.0)
        return mean + tau * jnp.sqrt(var + 1e-6)
    # "diag" (preprocess.py _diag_threshold_kernel): diagonal-covariance
    # approximation — per-dim mean/var of kc across blocks
    kc_mean = kc.mean(axis=1)                       # [B, H, D] over blocks
    kc_var = jnp.maximum(kc.var(axis=1), 0.0)
    mean = jnp.einsum("bqhd,bhd->bhq", qc, kc_mean) * scale
    var = jnp.einsum("bqhd,bhd->bhq", qc * qc, kc_var) * (scale * scale)
    return mean + tau * jnp.sqrt(var + 1e-6)


def sol_route(q, k, scale: float, tau: float, block_q: int, block_kv: int,
              thresh_type: str = "diag", sink_blocks: int = 1,
              budget: float = 0.35):
    """Build per-(batch*head) exact-block index tables from the data.

    Returns (kv_idx [G, nQb, W] i32, counts [G, nQb] i32,
             exact [B, H, nQb, nKb] bool, kc, vm_placeholder_none) where
    G = B * H and W = ceil(budget * nKb) (static).  `exact` marks the
    blocks actually selected into the tables (threshold-passing, top-W by
    margin) so the approximate branch can exclude them."""
    b, l, h, d = q.shape
    s_len = k.shape[1]
    qc, _ = block_pool(q, block_q)                   # [B, nQb, H, D]
    kc, _ = block_pool(k, block_kv)                  # [B, nKb, H, D]
    nqb, nkb = qc.shape[1], kc.shape[1]

    thr = sol_thresholds(qc, kc, scale, tau, thresh_type)   # [B, H, nQb]
    scores = jnp.einsum("bqhd,bkhd->bhqk", qc, kc) * scale  # [B,H,nQb,nKb]

    iq = jnp.arange(nqb)[:, None]
    ik = jnp.arange(nkb)[None, :]
    # diagonal band scaled to the q/kv block ratio (fwd.py:103:
    # |q_block - kv_block| <= 1 at equal 64-token blocks)
    qpos = iq * block_q
    kpos = ik * block_kv
    diag = (kpos + block_kv > qpos - block_kv) & \
           (kpos - block_q < qpos + block_q)
    forced = diag | (ik < sink_blocks)                       # [nQb, nKb]

    passing = (scores > thr[..., None]) | forced[None, None]

    w = max(1, min(nkb, int(math.ceil(budget * nkb))))
    # rank by routing margin with forced blocks pinned on top; take the
    # static top-W, then mark selected = top-W AND passing
    margin = scores - thr[..., None]
    rank = jnp.where(forced[None, None], jnp.inf, 0.0) + margin
    _, top_idx = jax.lax.top_k(rank, w)                      # [B,H,nQb,W]
    sel_pass = jnp.take_along_axis(passing, top_idx, axis=-1)
    counts = sel_pass.sum(axis=-1).astype(jnp.int32)         # [B, H, nQb]
    # compact: passing slots first (stable sort keeps margin order inside
    # each group) so counts-prefix slots are exactly the selected blocks
    order = jnp.argsort(~sel_pass, axis=-1, stable=True)
    kv_idx = jnp.take_along_axis(top_idx, order, axis=-1)

    # selected = counts-prefix of each row's table (scatter, tiny)
    slot_ok = jnp.arange(w)[None, None, None] < counts[..., None]
    rows = jnp.repeat(jnp.arange(b * h * nqb), w)
    exact = jnp.zeros((b * h * nqb, nkb), bool).at[
        rows, kv_idx.reshape(-1)].max(slot_ok.reshape(-1))
    exact = exact.reshape(b, h, nqb, nkb)

    g_idx = kv_idx.reshape(b * h, nqb, w).astype(jnp.int32)
    g_cnt = counts.reshape(b * h, nqb)
    return g_idx, g_cnt, exact, kc


# ---------------------------------------------------------------------------
# exact branch: per-head table-driven block-sparse flash WITH lse output
# ---------------------------------------------------------------------------

def _sol_flash_kernel(kv_idx_ref, counts_ref, q_ref, *refs, s_actual,
                      block_kv, kv_fetch):
    k_refs = refs[:kv_fetch]
    v_refs = refs[kv_fetch:2 * kv_fetch]
    o_ref, lse_ref = refs[2 * kv_fetch], refs[2 * kv_fetch + 1]
    m_scr, l_scr, acc_scr = refs[2 * kv_fetch + 2:]

    g = pl.program_id(0)
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
        valid = j * kv_fetch + c < counts_ref[g, qb]
        s = jnp.where(valid, s, _NEG_INF)
        if s_actual is not None:
            col = (kv_idx_ref[g, qb, j * kv_fetch + c] * block_kv
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
        lnum = l_scr[:, :1]
        denom = jnp.where(lnum == 0.0, 1.0, lnum)
        o_ref[0] = (acc_scr[:] / denom).astype(o_ref.dtype)
        lse = jnp.where(lnum > 0.0, m_scr[:, :1] + jnp.log(denom), _NEG_INF)
        lse_ref[0] = jnp.broadcast_to(lse.T, lse_ref.shape[1:])


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_kv",
                                             "interpret", "s_actual",
                                             "kv_fetch"))
def _sol_flash(q, k, v, kv_idx, counts, scale, block_q, block_kv,
               interpret=False, s_actual=None, kv_fetch=1):
    """Per-head table-driven sparse flash.  q/k/v: [B, L, N, D] (padded
    up to whole blocks); kv_idx [G=B*N, nQb, W], counts [G, nQb].
    Returns (out [B, L, N, D], lse [B, N, L] f32)."""
    b, l, n, d = q.shape
    s_len = k.shape[1]
    assert l % block_q == 0 and s_len % block_kv == 0
    g_n, nqb, max_a = kv_idx.shape
    assert g_n == b * n
    if max_a % kv_fetch:
        pad = kv_fetch - max_a % kv_fetch
        kv_idx = jnp.concatenate(
            [kv_idx, jnp.broadcast_to(kv_idx[:, :, :1], (g_n, nqb, pad))],
            axis=2)
        max_a += pad

    if s_actual is not None and s_actual >= s_len:
        s_actual = None

    def kv_spec(c):
        return pl.BlockSpec(
            (1, block_kv, d),
            lambda g, i, j, idx, cnt, c=c: (g, idx[g, i, j * kv_fetch + c],
                                            0))

    def call(idx_c, cnt_c, qf_c, kf_c, vf_c):
        gc = idx_c.shape[0]
        return pl.pallas_call(
            functools.partial(_sol_flash_kernel, s_actual=s_actual,
                              block_kv=block_kv, kv_fetch=kv_fetch),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,
                grid=(gc, nqb, max_a // kv_fetch),
                in_specs=(
                    [pl.BlockSpec((1, block_q, d),
                                  lambda g, i, j, idx, cnt: (g, i, 0))]
                    + [kv_spec(c) for c in range(kv_fetch)]
                    + [kv_spec(c) for c in range(kv_fetch)]),
                out_specs=[
                    pl.BlockSpec((1, block_q, d),
                                 lambda g, i, j, idx, cnt: (g, i, 0)),
                    pl.BlockSpec((1, 8, block_q),
                                 lambda g, i, j, idx, cnt: (g, 0, i)),
                ],
                scratch_shapes=[
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, 128), jnp.float32),
                    pltpu.VMEM((block_q, d), jnp.float32),
                ],
            ),
            out_shape=[jax.ShapeDtypeStruct((gc, l, d), q.dtype),
                       jax.ShapeDtypeStruct((gc, 8, l), jnp.float32)],
            interpret=interpret,
        )(idx_c, cnt_c, qf_c, *([kf_c] * kv_fetch), *([vf_c] * kv_fetch))

    # scalar-prefetch operands live in SMEM (1 MB on v5e, minus compiler
    # reservations): at 14B/720p the full [G, nQb, W] i32 table is ~3 MB,
    # so chunk the call over head-groups to keep each table under budget
    # (observed hard failure: "would exceed memory (size=1048576)" smem,
    # prefetched operand 3,112,960 B).
    smem_budget = 0.4 * 1024 * 1024
    per_g = kv_idx.nbytes / g_n + counts.nbytes / g_n
    g_chunk = max(1, min(g_n, int(smem_budget // max(per_g, 1))))

    # flatten [B, L, N, D] -> per-chunk [Gc, L, D] INSIDE the loop so
    # only chunk-sized head-major temps exist (full-size qf/kf/vf copies
    # plus per-chunk slices pushed the 14B/720p bench 26 MB over the
    # 16 GB chip).  Head chunks map to contiguous (b, n) pairs only when
    # b == 1; for b > 1 fall back to whole-G flats (small G there).
    scale_c = jnp.asarray(scale, q.dtype)
    if b > 1:
        g_chunk = g_n

    def flats(a, g0, g1, do_scale=False):
        if b == 1:
            part = a[:, :, g0:g1]
        else:
            part = a
        if do_scale:
            part = part * scale_c
        f = part.transpose(0, 2, 1, 3)
        return f.reshape(-1, f.shape[2], d)

    outs, lses = [], []
    for g0 in range(0, g_n, g_chunk):
        g1 = min(g0 + g_chunk, g_n)
        o, s = call(kv_idx[g0:g1], counts[g0:g1],
                    flats(q, g0, g1, do_scale=True),
                    flats(k, g0, g1), flats(v, g0, g1))
        outs.append(o)
        lses.append(s)
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
    lse = lses[0] if len(lses) == 1 else jnp.concatenate(lses, axis=0)
    return (out.reshape(b, n, l, d).transpose(0, 2, 1, 3),
            lse[:, 0].reshape(b, n, l))


# ---------------------------------------------------------------------------
# approximate branch (XLA, chunked over queries) + merge
# ---------------------------------------------------------------------------

def _approx_branch(q, kc, vm, lens, exact, scale: float, chunk: int,
                   block_q: int):
    """Length-weighted centroid attention over NON-exact blocks.

    q [B, L, H, D]; kc/vm [B, nKb, H, D]; lens [nKb] f32;
    exact [B, H, nQb, nKb] bool (True blocks are excluded here).
    Returns (out [B, L, H, D] f32, lse [B, H, L] f32)."""
    b, l, h, d = q.shape
    nkb = kc.shape[1]
    nqb = exact.shape[2]
    loglen = jnp.log(jnp.asarray(lens))                      # [nKb]

    kc_t = kc.transpose(0, 2, 1, 3)                          # [B, H, nKb, D]
    vm_t = vm.transpose(0, 2, 1, 3)
    n_chunks = -(-l // chunk)
    pad = n_chunks * chunk - l
    qp = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0))) if pad else q

    def one_chunk(c):
        # slice the chunk and gather its per-row exclusion from the block
        # mask in-loop: a materialized [L, nKb] row mask is ~900 MB bool
        # at the 720p sequence
        qc_chunk = jax.lax.dynamic_slice_in_dim(qp, c * chunk, chunk, 1)
        rb = jnp.clip((c * chunk + jnp.arange(chunk)) // block_q,
                      0, nqb - 1)
        excl = jnp.take(exact, rb, axis=2)     # [B, H, C, nKb] bool
        s = jnp.einsum("bchd,bhkd->bhck", qc_chunk.astype(jnp.float32),
                       kc_t) * scale + loglen[None, None, None]
        s = jnp.where(excl, _NEG_INF, s)
        m = jnp.max(s, axis=-1, keepdims=True)
        m_safe = jnp.maximum(m, _NEG_INF / 2)
        p = jnp.where(m > _NEG_INF / 2, jnp.exp(s - m_safe), 0.0)
        denom = p.sum(axis=-1)                               # [B, H, C]
        out = jnp.einsum("bhck,bhkd->bchd", p, vm_t)
        out = out / jnp.maximum(denom, 1e-30)[..., None].transpose(0, 2, 1, 3)
        lse = jnp.where(denom > 0.0, m[..., 0] + jnp.log(
            jnp.maximum(denom, 1e-30)), _NEG_INF)
        return out, lse

    outs, lses = jax.lax.map(one_chunk, jnp.arange(n_chunks))
    out = outs.transpose(1, 0, 2, 3, 4).reshape(b, n_chunks * chunk, h, d)
    lse = lses.transpose(1, 2, 0, 3).reshape(b, h, n_chunks * chunk)
    return out[:, :l], lse[..., :l]


def _merge_softmax(out_e, lse_e, out_a, lse_a):
    """Merge two normalized partial softmaxes by their logsumexp."""
    m = jnp.maximum(lse_e, lse_a)
    m = jnp.maximum(m, _NEG_INF / 2)
    we = jnp.exp(jnp.maximum(lse_e, _NEG_INF) - m)
    wa = jnp.exp(jnp.maximum(lse_a, _NEG_INF) - m)
    tot = jnp.maximum(we + wa, 1e-30)
    we, wa = we / tot, wa / tot
    return (out_e.astype(jnp.float32) * we[..., None]
            + out_a.astype(jnp.float32) * wa[..., None])


def sol_attention(q, k, v, scale: float | None = None, tau: float = 1.0,
                  thresh_type: str = "diag", budget: float = 0.35,
                  block_q: int = 512, block_kv: int = 256,
                  sink_blocks: int = 1, chunk: int = 8192,
                  backend: str = "auto", interpret: bool = False):
    """Sol-Attn self-attention.  q/k/v: [B, L, N, D] -> [B, L, N, D].

    backend "xla" (or non-TPU "auto") runs the exact branch as a dense
    masked attention — bit-identical semantics, the test oracle."""
    b, l, n, d = q.shape
    s_len = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)

    kv_idx, counts, exact, kc = sol_route(
        q, k, scale, tau, block_q, block_kv, thresh_type=thresh_type,
        sink_blocks=sink_blocks, budget=budget)
    vm, lens = block_pool(v, block_kv)

    on_tpu = jax.devices()[0].platform == "tpu"
    if backend == "xla" or (backend == "auto" and not (on_tpu or interpret)):
        # oracle: dense masked attention for the exact branch
        nqb, nkb = exact.shape[2], exact.shape[3]
        row_block = (jnp.arange(l) // block_q).clip(0, nqb - 1)
        col_block = (jnp.arange(s_len) // block_kv).clip(0, nkb - 1)
        mask = exact[:, :, row_block][:, :, :, col_block]    # [B,N,L,S]
        s = jnp.einsum("blnd,bsnd->bnls", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        s = jnp.where(mask, s, _NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        m_safe = jnp.maximum(m, _NEG_INF / 2)
        p = jnp.where(m > _NEG_INF / 2, jnp.exp(s - m_safe), 0.0)
        denom = p.sum(axis=-1)
        out_e = jnp.einsum("bnls,bsnd->blnd", p, v.astype(jnp.float32))
        out_e = out_e / jnp.maximum(denom, 1e-30).transpose(0, 2, 1)[..., None]
        lse_e = jnp.where(denom > 0.0,
                          m[..., 0] + jnp.log(jnp.maximum(denom, 1e-30)),
                          _NEG_INF)                          # [B, N, L]
    else:
        def padup(x, blk):
            rem = x.shape[1] % blk
            if rem:
                p_ = [(0, 0)] * x.ndim
                p_[1] = (0, blk - rem)
                x = jnp.pad(x, p_)
            return x
        q_p = padup(q, block_q)
        k_p, v_p = padup(k, block_kv), padup(v, block_kv)
        kv_fetch = max(1, 2048 // block_kv)
        out_e, lse_e = _sol_flash(
            q_p, k_p, v_p, kv_idx, counts, scale, block_q, block_kv,
            interpret=interpret,
            s_actual=(s_len if s_len % block_kv else None),
            kv_fetch=kv_fetch)
        out_e, lse_e = out_e[:, :l], lse_e[..., :l]

    out_a, lse_a = _approx_branch(q, kc, vm, lens, exact, scale, chunk,
                                  block_q)

    merged = _merge_softmax(
        out_e.astype(jnp.float32).transpose(0, 2, 1, 3), lse_e,
        out_a.transpose(0, 2, 1, 3), lse_a)
    return merged.transpose(0, 2, 1, 3).astype(q.dtype)


def parse_sol_backend(spec: str) -> dict:
    """"sol[:tau[:budget[:thresh_type]]]" -> sol_attention kwargs."""
    parts = spec.split(":")
    kw = {}
    if len(parts) > 1 and parts[1]:
        kw["tau"] = float(parts[1])
    if len(parts) > 2 and parts[2]:
        kw["budget"] = float(parts[2])
    if len(parts) > 3 and parts[3]:
        kw["thresh_type"] = parts[3]
    return kw
