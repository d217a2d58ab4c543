"""Pipeline-parallel inference schedule tests (SURVEY §2.7 P7): the
GPipe fill-drain schedule over a 'pp' mesh axis must equal the
single-device layer stack bit-for-bit."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from wan2gp_tpu.parallel.pipeline import split_stages, pipeline_apply


def _mlp_params(l, d, seed=0):
    rng = np.random.default_rng(seed)
    return {"w": jnp.asarray(rng.standard_normal((l, d, d)) * 0.2,
                             jnp.float32),
            "b": jnp.asarray(rng.standard_normal((l, d)) * 0.1,
                             jnp.float32)}


def _all_layers(params, h):
    def body(h, lp):
        return jnp.tanh(h @ lp["w"] + lp["b"]), None
    h, _ = jax.lax.scan(body, h, params)
    return h


def _mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]).reshape(n), ("pp",))


@pytest.mark.parametrize("stages,micro", [(2, 2), (4, 4), (4, 8)])
def test_pipeline_matches_sequential(stages, micro):
    l, d = 8, 12
    params = _mlp_params(l, d)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (micro * 2, 5, d)), jnp.float32)
    ref = _all_layers(params, x)
    mesh = _mesh(stages)
    out = pipeline_apply(mesh, split_stages(params, stages), x,
                         _all_layers, n_microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=0.0)


def test_split_stages_shapes():
    params = _mlp_params(8, 4)
    staged = split_stages(params, 4)
    assert staged["w"].shape == (4, 2, 4, 4)
    assert staged["b"].shape == (4, 2, 4)
    with pytest.raises(AssertionError):
        split_stages(params, 3)


def test_attention_like_stage():
    """A self-attention stage (full sequence per microbatch) pipelines
    exactly — PP splits layers, not the sequence."""
    l, d, heads = 4, 16, 4
    rng = np.random.default_rng(2)
    params = {"qkv": jnp.asarray(rng.standard_normal((l, d, 3 * d))
                                 * 0.1, jnp.float32),
              "o": jnp.asarray(rng.standard_normal((l, d, d)) * 0.1,
                               jnp.float32)}

    def stage(params, h):
        def body(h, lp):
            b, t, _ = h.shape
            qkv = (h @ lp["qkv"]).reshape(b, t, 3, heads, d // heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum("bthd,bshd->bhts", q, k) / np.sqrt(
                d // heads)
            a = jax.nn.softmax(s, -1)
            o = jnp.einsum("bhts,bshd->bthd", a, v).reshape(b, t, d)
            return h + o @ lp["o"], None
        h, _ = jax.lax.scan(body, h, params)
        return h

    x = jnp.asarray(rng.standard_normal((4, 6, d)), jnp.float32)
    ref = stage(params, x)
    mesh = _mesh(2)
    out = pipeline_apply(mesh, split_stages(params, 2), x, stage,
                         n_microbatches=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-6)
