"""Chunked VAE decode must equal the full-sequence decode exactly."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae, vae_decode
from wan2gp_tpu.models.wan.vae_scan import vae_decode_chunked

TINY = WanVAEConfig(dim=8, num_res_blocks=1)


@pytest.fixture(scope="module")
def setup():
    params = init_wan_vae(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 16)), jnp.float32)
    return params, z


def test_chunked_equals_full(setup):
    params, z = setup
    full = vae_decode(params, TINY, z)
    chunked = vae_decode_chunked(params, TINY, z)
    assert chunked.shape == full.shape == (1, 13, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-4)


def test_chunked_single_frame(setup):
    params, z = setup
    full = vae_decode(params, TINY, z[:, :1])
    chunked = vae_decode_chunked(params, TINY, z[:, :1])
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(full),
                               rtol=1e-4, atol=1e-4)
