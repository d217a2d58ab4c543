"""Wan 2.2 VAE tests (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.vae2_2 import (
    Wan22VAEConfig, init_wan22_vae, wan22_vae_encode, wan22_vae_decode,
    avg_down3d, dup_up3d, _patchify, _unpatchify, WAN22_MEAN, WAN22_STD)

TINY = Wan22VAEConfig(dim=8, dec_dim=8, z_dim=48, num_res_blocks=1)


def test_constants():
    assert WAN22_MEAN.shape == (48,) and WAN22_STD.shape == (48,)
    assert abs(WAN22_MEAN[0] + 0.2289) < 1e-6
    assert abs(WAN22_STD[-1] - 0.7744) < 1e-6


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 8, 8, 3)), jnp.float32)
    p = _patchify(x)
    assert p.shape == (1, 2, 4, 4, 12)
    back = _unpatchify(p)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_avg_down3d_matches_naive():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 4, 8)), jnp.float32)
    out = avg_down3d(x, out_channels=8, factor_t=2, factor_s=2)
    assert out.shape == (1, 3, 2, 2, 8)
    # identity case: factors 1 and same channels -> passthrough
    same = avg_down3d(x, 8, 1, 1)
    np.testing.assert_allclose(np.asarray(same), np.asarray(x), atol=1e-6)
    # first temporal pair includes the zero pad: out[0] = x[0]/2 avg'd
    x1 = jnp.ones((1, 1, 2, 2, 4), jnp.float32)
    o = avg_down3d(x1, 4, 2, 1)
    np.testing.assert_allclose(np.asarray(o), 0.5)


def test_dup_up3d_shapes():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 3, 2, 2, 8)), jnp.float32)
    out = dup_up3d(x, out_channels=4, factor_t=2, factor_s=2,
                   first_chunk=True)
    assert out.shape == (1, 5, 4, 4, 4)   # 2*3-1 frames
    out2 = dup_up3d(x, out_channels=8, factor_t=1, factor_s=2,
                    first_chunk=True)
    assert out2.shape == (1, 3, 4, 4, 8)


@pytest.mark.parametrize("t", [1, 9])
def test_encode_decode_shapes(t):
    params = init_wan22_vae(jax.random.key(0), TINY)
    rng = np.random.default_rng(3)
    v = jnp.asarray(rng.uniform(-1, 1, (1, t, 32, 32, 3)), jnp.float32)
    z = wan22_vae_encode(params, TINY, v)
    t_lat = (t - 1) // 4 + 1
    assert z.shape == (1, t_lat, 2, 2, 48)   # stride (4, 16, 16)
    out = wan22_vae_decode(params, TINY, z)
    assert out.shape == (1, t, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_encoder_causality():
    params = init_wan22_vae(jax.random.key(1), TINY)
    rng = np.random.default_rng(4)
    v1 = jnp.asarray(rng.uniform(-1, 1, (1, 9, 32, 32, 3)), jnp.float32)
    v2 = v1.at[:, 5:].set(0.0)
    z1 = wan22_vae_encode(params, TINY, v1)
    z2 = wan22_vae_encode(params, TINY, v2)
    np.testing.assert_allclose(np.asarray(z1[:, :2]), np.asarray(z2[:, :2]),
                               atol=1e-5)


def test_tiled_decode_matches_full():
    """The tile grid / crop / blend orchestration must reproduce the
    full decode exactly when the decoder is spatially local (a 16x
    nearest upsample stand-in) — this pins the stitch math of the
    reference's spatial_tiled_decode (vae2_2.py:894-935) without the
    receptive-field approximation the real decoder adds at tile edges."""
    from wan2gp_tpu.models.wan.vae2_2 import wan22_vae_decode_tiled

    def fake_decode(z):
        # [B,T,h,w,48] -> [B,T,16h,16w,3]: local, so tiles are exact
        x = jnp.repeat(jnp.repeat(z[..., :3], 16, axis=2), 16, axis=3)
        return x

    z = jax.random.normal(jax.random.key(4), (1, 2, 6, 8, 48)) * 0.5
    full = fake_decode(z)
    # tile_size 64 -> latent tile 4, so the 6x8 grid genuinely tiles
    tiled = wan22_vae_decode_tiled(None, TINY, z, tile_size=64,
                                   decode_fn=fake_decode)
    assert tiled.shape == full.shape
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(full),
                               atol=1e-6)


def test_tiled_decode_real_seams_bounded():
    """With the real (random-weight) decoder the tiled output must stay
    continuous: the inter-tile seam jump in the tiled output must not
    exceed ~2x the typical local gradient of the full decode."""
    from wan2gp_tpu.models.wan.vae2_2 import wan22_vae_decode_tiled
    params = init_wan22_vae(jax.random.key(3), TINY)
    z = jax.random.normal(jax.random.key(4), (1, 2, 6, 8, 48)) * 0.5
    tiled = np.asarray(wan22_vae_decode_tiled(params, TINY, z,
                                              tile_size=64))
    full = np.asarray(wan22_vae_decode(params, TINY, z))
    assert tiled.shape == full.shape
    # seam after crop: first tile contributes row_limit=48 pixel rows
    seam = np.abs(np.diff(tiled, axis=2))[:, :, 46:49].max()
    grad = np.abs(np.diff(full, axis=2)).max()
    assert seam <= 2.0 * grad + 1e-3
