"""Sol-Attn data-dependent sparse attention tests.

Oracle = a direct numpy transcription of the reference semantics
(shared/sol_attn/triton_kernels/fwd.py:80-180: exact blocks get per-key
attention, non-routed blocks contribute one length-weighted centroid
super-token, all in one softmax; preprocess.py `prepare` thresholds)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.ops.sol_attention import (
    block_pool, sol_attention, sol_route, sol_thresholds,
    parse_sol_backend, _sol_flash)
from wan2gp_tpu.ops.attention import attention


def _rand_qkv(b=1, l=300, h=2, d=32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(
        rng.standard_normal((b, l, h, d)), jnp.float32)
    return mk(), mk(), mk()


def _numpy_sol_oracle(q, k, v, exact, scale, block_q, block_kv):
    """Reference-semantics softmax given a routing decision `exact`
    [B, H, nQb, nKb]: exact blocks per-key, others one super-token with
    weight block_len (fwd.py:112-136 adds probability * block_len to the
    denominator and probability * vc to the numerator, vc = V block sum)."""
    q, k, v = map(np.asarray, (q, k, v))
    b, l, h, d = q.shape
    s_len = k.shape[1]
    nkb = -(-s_len // block_kv)
    out = np.zeros_like(q)
    for bi in range(b):
        for hi in range(h):
            for row in range(l):
                qb = min(row // block_q, exact.shape[2] - 1)
                scores, vals, weights = [], [], []
                for kb in range(nkb):
                    lo, hi_ = kb * block_kv, min((kb + 1) * block_kv, s_len)
                    if exact[bi, hi, qb, kb]:
                        for kk in range(lo, hi_):
                            scores.append(
                                q[bi, row, hi] @ k[bi, kk, hi] * scale)
                            vals.append(v[bi, kk, hi])
                            weights.append(1.0)
                    else:
                        kc = k[bi, lo:hi_, hi].mean(axis=0)
                        vc = v[bi, lo:hi_, hi].mean(axis=0)
                        scores.append(q[bi, row, hi] @ kc * scale)
                        vals.append(vc)
                        weights.append(float(hi_ - lo))
                scores = np.asarray(scores)
                m = scores.max()
                p = np.exp(scores - m) * np.asarray(weights)
                out[bi, row, hi] = (p[:, None] * np.asarray(vals)
                                    ).sum(0) / p.sum()
    return out


def test_parse_sol_backend():
    assert parse_sol_backend("sol") == {}
    assert parse_sol_backend("sol:2.5") == {"tau": 2.5}
    assert parse_sol_backend("sol:1.0:0.5") == {"tau": 1.0, "budget": 0.5}
    assert parse_sol_backend("sol:1:0.5:exact") == {
        "tau": 1.0, "budget": 0.5, "thresh_type": "exact"}


def test_block_pool_means_and_lens():
    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10, 1, 1)
    means, lens = block_pool(x, 4)
    assert list(lens) == [4.0, 4.0, 2.0]
    np.testing.assert_allclose(
        np.asarray(means)[0, :, 0, 0], [1.5, 5.5, 8.5])


def test_all_exact_equals_dense():
    """tau -> -inf with budget 1.0 routes every block exact: sol must
    equal plain dense attention."""
    q, k, v = _rand_qkv()
    ref = attention(q, k, v, backend="xla")
    out = sol_attention(q, k, v, tau=-1e9, budget=1.0,
                        block_q=64, block_kv=64, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_oracle_matches_numpy_reference():
    q, k, v = _rand_qkv(l=200, h=2, d=16, seed=3)
    scale = 1.0 / math.sqrt(16)
    _, _, exact, _ = sol_route(q, k, scale, tau=0.5, block_q=64,
                               block_kv=64, budget=0.6)
    out = sol_attention(q, k, v, tau=0.5, budget=0.6,
                        block_q=64, block_kv=64, backend="xla")
    ref = _numpy_sol_oracle(q, k, v, np.asarray(exact), scale, 64, 64)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_kernel_matches_oracle():
    """The Pallas kernel path (interpret mode) == the XLA oracle path."""
    q, k, v = _rand_qkv(l=256, h=2, d=32, seed=4)
    ref = sol_attention(q, k, v, tau=0.5, budget=0.6, block_q=64,
                        block_kv=64, backend="xla")
    out = sol_attention(q, k, v, tau=0.5, budget=0.6, block_q=64,
                        block_kv=64, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_kernel_ragged_tail():
    """Sequence not a block multiple: padded keys must not leak."""
    q, k, v = _rand_qkv(l=200, h=1, d=32, seed=5)
    ref = sol_attention(q, k, v, tau=-1e9, budget=1.0, block_q=64,
                        block_kv=64, backend="xla")
    out = sol_attention(q, k, v, tau=-1e9, budget=1.0, block_q=64,
                        block_kv=64, backend="pallas", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_sol_flash_lse_matches_dense():
    """Full tables through the kernel: out == dense, lse == true lse."""
    b, l, h, d = 1, 128, 2, 32
    q, k, v = _rand_qkv(b=b, l=l, h=h, d=d, seed=6)
    scale = 1.0 / math.sqrt(d)
    nkb = l // 64
    kv_idx = jnp.broadcast_to(jnp.arange(nkb, dtype=jnp.int32),
                              (b * h, l // 64, nkb))
    counts = jnp.full((b * h, l // 64), nkb, jnp.int32)
    out, lse = _sol_flash(q, k, v, kv_idx, counts, scale, 64, 64,
                          interpret=True, kv_fetch=1)
    ref = attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    s = np.einsum("blnd,bsnd->bnls", np.asarray(q), np.asarray(k)) * scale
    ref_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) \
        + s.max(-1)
    np.testing.assert_allclose(np.asarray(lse), ref_lse,
                               rtol=1e-4, atol=1e-4)


def test_routing_is_data_dependent():
    """A kv block whose keys align with a q block's queries must be routed
    exact for that row; an anti-aligned far block must not."""
    b, l, h, d = 1, 512, 1, 32
    rng = np.random.default_rng(7)
    direction = rng.standard_normal(d).astype(np.float32)
    direction /= np.linalg.norm(direction)
    q = rng.standard_normal((b, l, h, d)).astype(np.float32) * 0.1
    k = rng.standard_normal((b, l, h, d)).astype(np.float32) * 0.1
    # q block 0 points along `direction`; kv block 6 matches, block 4 is
    # anti-aligned
    q[0, :64, 0] += 4.0 * direction
    k[0, 6 * 64:7 * 64, 0] += 4.0 * direction
    k[0, 4 * 64:5 * 64, 0] -= 4.0 * direction
    scale = 1.0 / math.sqrt(d)
    _, _, exact, _ = sol_route(jnp.asarray(q), jnp.asarray(k), scale,
                               tau=1.0, block_q=64, block_kv=64,
                               budget=0.5)
    exact = np.asarray(exact)
    assert exact[0, 0, 0, 6], "aligned block should be routed exact"
    assert not exact[0, 0, 0, 4], "anti-aligned block should be approximate"
    # diagonal +-1 and sink block 0 are always exact (fwd.py:101-110)
    assert exact[0, 0, 3, 2] and exact[0, 0, 3, 3] and exact[0, 0, 3, 4]
    assert exact[0, 0, 5, 0]


def test_exact_thresh_type():
    q, k, v = _rand_qkv(l=256, seed=8)
    out = sol_attention(q, k, v, tau=1.0, thresh_type="exact",
                        block_q=64, block_kv=64, backend="xla")
    ref = attention(q, k, v, backend="xla")
    # iid gaussian q/k is the adversarial worst case for centroid
    # approximation (random key-block centroids are near zero, so the
    # fallback flattens the peaky true softmax); real attention maps are
    # structured.  Bound the worst case and require finiteness — routing
    # quality on structured data is test_routing_is_data_dependent.
    err = np.abs(np.asarray(out) - np.asarray(ref)).mean()
    denom = np.abs(np.asarray(ref)).mean()
    assert err / denom < 0.8
    assert np.isfinite(np.asarray(out)).all()


def test_thresholds_diag_vs_exact_agree_on_iid():
    """On iid gaussian blocks the diagonal-covariance approximation should
    land near the exact block-score statistics."""
    rng = np.random.default_rng(9)
    qc = jnp.asarray(rng.standard_normal((1, 8, 2, 32)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((1, 16, 2, 32)), jnp.float32)
    t_diag = np.asarray(sol_thresholds(qc, kc, 0.2, 1.0, "diag"))
    t_exact = np.asarray(sol_thresholds(qc, kc, 0.2, 1.0, "exact"))
    assert np.corrcoef(t_diag.ravel(), t_exact.ravel())[0, 1] > 0.7


def test_dispatcher_sol_backend():
    """attention(backend="sol:...") routes through sol_attention for large
    self-attention and falls back to dense for cross-attention."""
    q, k, v = _rand_qkv(l=1024, h=1, d=32, seed=10)
    out = attention(q, k, v, backend="sol:-1000000000:1.0")
    ref = attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)
    # cross-attention shape falls back to dense
    kc, vc = k[:, :77], v[:, :77]
    out_x = attention(q, kc, vc, backend="sol")
    ref_x = attention(q, kc, vc, backend="xla")
    np.testing.assert_allclose(np.asarray(out_x), np.asarray(ref_x),
                               rtol=2e-4, atol=2e-5)
