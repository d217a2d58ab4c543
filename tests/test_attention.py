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


def test_kv_mask_xla_vs_pallas_interpret():
    import numpy as np
    import jax.numpy as jnp
    from wan2gp_tpu.ops.attention import attention
    rng = np.random.default_rng(7)
    b, l, s, n, d = 2, 16, 24, 2, 8
    q = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, n, d)), jnp.float32)
    mask = np.ones((b, s), bool)
    mask[0, 5:9] = False      # interior padding (packed txt segment)
    mask[1, -6:] = False
    mask = jnp.asarray(mask)

    ref = attention(q, k, v, backend="xla", kv_mask=mask)
    got = attention(q, k, v, backend="pallas_interpret", kv_mask=mask,
                    block_q=8, block_kv=8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    # masked keys must not influence: perturb masked k/v rows
    k2 = k.at[0, 6].set(100.0)
    v2 = v.at[0, 6].set(-50.0)
    got2 = attention(q, k2, v2, backend="xla", kv_mask=mask)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)
