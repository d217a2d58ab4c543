"""Attention tests: Pallas flash kernel (interpret mode on CPU) vs the XLA
reference path, plus numerics vs a numpy softmax."""
import numpy as np
import jax.numpy as jnp
import pytest

from wan2gp_tpu.ops.attention import attention


def _numpy_attention(q, k, v, scale=None):
    d = q.shape[-1]
    scale = scale or 1.0 / np.sqrt(d)
    s = np.einsum("blnd,bsnd->bnls", q.astype(np.float64),
                  k.astype(np.float64)) * scale
    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("bnls,bsnd->blnd", p, v.astype(np.float64))


def test_xla_attention_matches_numpy():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((2, 33, 3, 64)).astype(np.float32)
    k = rng.standard_normal((2, 17, 3, 64)).astype(np.float32)
    v = rng.standard_normal((2, 17, 3, 64)).astype(np.float32)
    out = np.asarray(attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               backend="xla"))
    np.testing.assert_allclose(out, _numpy_attention(q, k, v), rtol=2e-4,
                               atol=2e-4)


@pytest.mark.parametrize("l,s", [(128, 128), (200, 300), (256, 512)])
def test_pallas_flash_matches_xla(l, s):
    rng = np.random.default_rng(1)
    q = rng.standard_normal((1, l, 2, 128)).astype(np.float32)
    k = rng.standard_normal((1, s, 2, 128)).astype(np.float32)
    v = rng.standard_normal((1, s, 2, 128)).astype(np.float32)
    args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    ref = np.asarray(attention(*args, backend="xla"))
    got = np.asarray(attention(*args, backend="pallas_interpret",
                               block_q=128, block_kv=128))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_pallas_flash_bf16():
    rng = np.random.default_rng(2)
    q = rng.standard_normal((1, 128, 1, 128)).astype(np.float32)
    k = rng.standard_normal((1, 128, 1, 128)).astype(np.float32)
    v = rng.standard_normal((1, 128, 1, 128)).astype(np.float32)
    qb, kb, vb = (jnp.asarray(a, dtype=jnp.bfloat16) for a in (q, k, v))
    ref = _numpy_attention(q, k, v)
    got = np.asarray(attention(qb, kb, vb, backend="pallas_interpret",
                               block_q=128, block_kv=128)).astype(np.float32)
    np.testing.assert_allclose(got, ref, rtol=0.1, atol=0.05)
