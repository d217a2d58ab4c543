"""Chain-of-Zoom recursive SR (postprocessing/chain_of_zoom/)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.flux.vae import FluxVAEConfig, init_flux_vae
from wan2gp_tpu.postprocessing.chain_of_zoom import (
    SD3Config, init_sd3_mmdit, sd3_mmdit, grid_positions,
    gaussian_weights, coz_sr_step, chain_of_zoom_upscale,
    COZ_STEP_FACTORS)


TINY_VAE = FluxVAEConfig(ch=8, ch_mult=(1, 1, 1, 1), num_res_blocks=1,
                         z_channels=4, scale_factor=1.5305,
                         shift_factor=0.0)


@pytest.fixture(scope="module")
def sd3():
    cfg = SD3Config.tiny()
    return init_sd3_mmdit(jax.random.key(0), cfg, jnp.float32), cfg


@pytest.fixture(scope="module")
def vae():
    return init_flux_vae(jax.random.key(1), TINY_VAE)


def test_grid_positions_cover_flush():
    assert grid_positions(10, 4, 3) == [0, 3, 6]
    assert grid_positions(11, 4, 3) == [0, 3, 6, 7]
    assert grid_positions(3, 4, 3) == [0]


def test_gaussian_weights_peak_center():
    w = gaussian_weights(9, 9)
    assert w.shape == (9, 9)
    assert w.argmax() // 9 in (4, 5) and w.argmax() % 9 == 4
    assert (w > 0).all()


def test_mmdit_shapes_and_conditioning(sd3):
    params, cfg = sd3
    b, h, w = 2, 8, 8
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(b, h, w, cfg.in_channels), jnp.float32)
    t = jnp.full((b,), 1000.0)
    ctx = jnp.asarray(rs.randn(b, 3, cfg.joint_dim), jnp.float32)
    pooled = jnp.asarray(rs.randn(b, cfg.pooled_dim), jnp.float32)
    v = sd3_mmdit(params, cfg, x, t, ctx, pooled)
    assert v.shape == (b, h, w, cfg.out_channels)
    assert bool(jnp.isfinite(v).all())
    # text conditioning must reach the image stream via joint attention
    # (additive perturbation — LayerNorm makes pure scaling invisible)
    ctx_p = ctx + jnp.asarray(rs.randn(*ctx.shape), jnp.float32)
    v2 = sd3_mmdit(params, cfg, x, t, ctx_p, pooled)
    assert float(jnp.abs(v - v2).max()) > 1e-8
    # pooled conditioning flows through AdaLN
    v3 = sd3_mmdit(params, cfg, x, t, ctx, pooled * 2.0)
    assert float(jnp.abs(v - v3).max()) > 1e-8


def test_mmdit_rectangular(sd3):
    params, cfg = sd3
    x = jnp.zeros((1, 8, 12, cfg.in_channels))
    v = sd3_mmdit(params, cfg, x, jnp.ones((1,)),
                  jnp.zeros((1, 2, cfg.joint_dim)),
                  jnp.zeros((1, cfg.pooled_dim)))
    assert v.shape == (1, 8, 12, cfg.out_channels)


def test_sr_step_tiled(sd3, vae):
    params, cfg = sd3
    img = np.random.RandomState(1).randint(
        0, 255, (32, 32, 3), np.uint8)
    # tile 2 with overlap 1 over a 8x8 latent grid -> many tiles blended
    out = coz_sr_step(params, cfg, vae, TINY_VAE, img, 64, 64,
                      tile_latent=4, overlap=1, tile_batch=4)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_chain_two_steps(sd3, vae):
    params, cfg = sd3
    img = np.random.RandomState(2).randint(
        0, 255, (16, 16, 3), np.uint8)
    assert COZ_STEP_FACTORS[8.0] == (4, 2)
    out = chain_of_zoom_upscale(params, cfg, vae, TINY_VAE, img, 8.0,
                                tile_latent=4, overlap=1)
    assert out.shape == (128, 128, 3)


def test_prompt_hooks_route_per_tile(sd3, vae):
    params, cfg = sd3
    img = np.random.RandomState(3).randint(
        0, 255, (32, 32, 3), np.uint8)
    seen = []

    def tile_prompt_fn(context, tile):
        assert context.shape == img.shape
        seen.append(tile.shape)
        return f"tile{len(seen) % 2}"

    def encode_prompts_fn(prompts):
        n = len(prompts)
        return (np.random.RandomState(4).randn(
                    n, 2, cfg.joint_dim).astype(np.float32),
                np.zeros((n, cfg.pooled_dim), np.float32))

    out = coz_sr_step(params, cfg, vae, TINY_VAE, img, 64, 64,
                      context_image=img, tile_prompt_fn=tile_prompt_fn,
                      encode_prompts_fn=encode_prompts_fn,
                      tile_latent=4, overlap=1)
    assert out.shape == (64, 64, 3)
    assert len(seen) > 1          # one prompt per tile
    assert all(s == (32, 32, 3) for s in seen)


def test_service_dispatch_coz():
    from wan2gp_tpu.runtime.service import _apply_spatial_upsampling
    cfg = SD3Config.tiny()
    merged = {"spatial_upsampling": "coz2",
              "_coz_params": {"sd3": init_sd3_mmdit(jax.random.key(0),
                                                    cfg, jnp.float32),
                              "vae": init_flux_vae(jax.random.key(1),
                                                   TINY_VAE)},
              "_coz_cfg": cfg, "_coz_vae_cfg": TINY_VAE}
    video = np.random.RandomState(5).randint(
        0, 255, (1, 16, 16, 3), np.uint8)
    out = _apply_spatial_upsampling(video, merged)
    assert out.shape == (1, 32, 32, 3)
