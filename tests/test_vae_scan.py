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


def test_spatial_tiled_stitch_exact_for_local_decoder():
    """The tile grid / crop / seam-blend machinery must be exact: with a
    purely local decoder (pointwise 8x nearest upsample — no receptive
    field crossing tile borders) overlapping tiles agree on the overlap
    band, so blending is an identity and tiled == full bit-for-bit.
    (Real-VAE seam quality is a property of trained weights — the blend
    ramp itself is pinned by the vae_tile_blend golden.)"""
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_spatial_tiled

    def local_decode(z):
        px = jnp.repeat(jnp.repeat(z[..., :3], 8, axis=2), 8, axis=3)
        return jnp.repeat(px, 4, axis=1)

    cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 2, 20, 28, 16)), jnp.float32)
    full = np.asarray(local_decode(z))
    tiled = np.asarray(vae_decode_spatial_tiled(
        None, cfg, z, tile_size=64, decode_fn=local_decode))
    assert tiled.shape == full.shape
    np.testing.assert_allclose(tiled, full, rtol=0, atol=1e-6)


def test_sharded_decode_equals_full(setup):
    """vae_decode_sharded on an 8-device virtual mesh must equal the
    single-device decode bit-for-bit (same program, sharded data)."""
    from jax.sharding import Mesh
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_sharded
    params, z = setup
    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.asarray(devs[:4]).reshape(4), ("cp",))
    with mesh:
        out = vae_decode_sharded(params, TINY, z, mesh)
    full = vae_decode(params, TINY, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_sharded_decode_indivisible_width(setup):
    """W not divisible by the axis falls back to replicated layout but
    still runs and matches."""
    from jax.sharding import Mesh
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_sharded
    params, _ = setup
    devs = jax.devices()
    if len(devs) < 3:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(np.asarray(devs[:3]).reshape(3), ("cp",))
    rng = np.random.default_rng(1)
    z = jnp.asarray(rng.standard_normal((1, 2, 4, 5, 16)), jnp.float32)
    with mesh:
        out = vae_decode_sharded(params, TINY, z, mesh)
    full = vae_decode(params, TINY, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                               rtol=1e-5, atol=1e-5)


def test_bf16_decode_close_to_fp32(setup):
    """dtype=bf16 (reference vae_precision '16' policy) stays within a
    reduced-precision tolerance of the fp32 decode and returns fp32."""
    from wan2gp_tpu.models.wan.vae_scan import vae_decode_chunked
    params, _ = setup
    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.standard_normal((1, 3, 6, 6, 16)) * 0.5,
                    jnp.float32)
    full = np.asarray(vae_decode_chunked(params, TINY, z))
    half = vae_decode_chunked(params, TINY, z, dtype=jnp.bfloat16)
    assert half.dtype == jnp.float32
    half = np.asarray(half)
    assert half.shape == full.shape
    # bf16 has ~3 decimal digits; pixel range is [-1, 1] (random-init
    # weights are a worst case vs a trained VAE's smooth activations)
    assert np.abs(half - full).mean() < 2e-2
    assert np.abs(half - full).max() < 1e-1

    from wan2gp_tpu.models.wan.vae import vae_decode as vd
    half2 = vd(params, TINY, z, dtype=jnp.bfloat16)
    assert half2.dtype == jnp.float32
    # chunked and full-sequence accumulate in different orders; in bf16
    # that costs a couple of ulps per conv
    assert np.abs(np.asarray(half2) - half).max() < 1e-1
    assert np.abs(np.asarray(half2) - half).mean() < 2e-2
