"""Wan VAE tests on a tiny config (full towers are too slow for CI CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.vae import (
    WanVAEConfig, init_wan_vae, vae_encode, vae_decode, causal_conv3d,
    VAE_MEAN, VAE_STD)

TINY = WanVAEConfig(dim=8, z_dim=16, dim_mult=(1, 2, 4, 4),
                    num_res_blocks=1)


@pytest.fixture(scope="module")
def vae_params():
    return init_wan_vae(jax.random.key(0), TINY)


def _video(t=9, h=32, w=32, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-1, 1, (1, t, h, w, 3)), jnp.float32)


def test_encode_decode_shapes(vae_params):
    v = _video(t=9, h=32, w=32)
    z = vae_encode(vae_params, TINY, v)
    # stride (4, 8, 8): 9 frames -> 1 + (9-1)/4 = 3 latents
    assert z.shape == (1, 3, 4, 4, 16)
    out = vae_decode(vae_params, TINY, z)
    assert out.shape == (1, 9, 32, 32, 3)
    assert np.abs(np.asarray(out)).max() <= 1.0


def test_single_frame_image(vae_params):
    v = _video(t=1)
    z = vae_encode(vae_params, TINY, v)
    assert z.shape == (1, 1, 4, 4, 16)
    out = vae_decode(vae_params, TINY, z)
    assert out.shape == (1, 1, 32, 32, 3)


def test_encoder_temporal_causality(vae_params):
    """Latent frame i depends only on input frames <= 4i (causal convs +
    first-frame-special downsampling)."""
    v1 = _video(t=9, seed=1)
    v2 = v1.at[:, 5:].set(0.0)  # change frames 5..8
    z1 = vae_encode(vae_params, TINY, v1)
    z2 = vae_encode(vae_params, TINY, v2)
    np.testing.assert_allclose(np.asarray(z1[:, :2]), np.asarray(z2[:, :2]),
                               atol=1e-5)
    assert np.abs(np.asarray(z1[:, 2]) - np.asarray(z2[:, 2])).max() > 1e-4


def test_decoder_temporal_causality(vae_params):
    z1 = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 3, 4, 4, 16)), jnp.float32)
    z2 = z1.at[:, 2:].set(0.0)
    o1 = vae_decode(vae_params, TINY, z1)
    o2 = vae_decode(vae_params, TINY, z2)
    # frames 0..4 come from latents 0..1 only
    np.testing.assert_allclose(np.asarray(o1[:, :5]), np.asarray(o2[:, :5]),
                               atol=1e-5)


def test_causal_conv3d_is_causal():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((3, 1, 1, 4, 4)) * 0.1, jnp.float32)
    x1 = jnp.asarray(rng.standard_normal((1, 6, 2, 2, 4)), jnp.float32)
    x2 = x1.at[:, 4:].set(9.0)
    y1 = causal_conv3d(x1, w, None)
    y2 = causal_conv3d(x2, w, None)
    np.testing.assert_allclose(np.asarray(y1[:, :4]), np.asarray(y2[:, :4]),
                               atol=1e-6)


def test_latent_normalization_constants():
    assert VAE_MEAN.shape == (16,) and VAE_STD.shape == (16,)
    assert abs(VAE_MEAN[0] + 0.7571) < 1e-6
    assert abs(VAE_STD[-1] - 1.9160) < 1e-6
