"""Ulysses all-to-all sequence parallelism vs full attention."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from wan2gp_tpu.parallel.ulysses import (ulysses_attention,
                                         scatter_heads_gather_seq,
                                         scatter_seq_gather_heads)
from wan2gp_tpu.ops.attention import attention

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")


@pytest.mark.parametrize("n_sp", [2, 4])
def test_ulysses_matches_full(n_sp):
    mesh = Mesh(np.asarray(jax.devices()[:n_sp]).reshape(n_sp), ("sp",))
    rng = np.random.default_rng(0)
    b, l, n, d = 2, 8 * n_sp, 4, 16
    q = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)

    ref = attention(q, k, v, backend="xla")

    fn = shard_map(
        lambda q, k, v: ulysses_attention(q, k, v, axis_name="sp",
                                          backend="xla"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"))
    got = jax.jit(fn)(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_all_to_all_roundtrip():
    n_sp = 4
    mesh = Mesh(np.asarray(jax.devices()[:n_sp]).reshape(n_sp), ("sp",))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 4)), jnp.float32)

    def rt(x):
        y = scatter_heads_gather_seq(x, "sp")
        return scatter_seq_gather_heads(y, "sp")

    fn = shard_map(rt, mesh=mesh, in_specs=P(None, "sp"),
                   out_specs=P(None, "sp"))
    got = jax.jit(fn)(x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), atol=1e-6)
