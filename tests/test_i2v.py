"""i2v conditioning tests: mask/latent y construction + CLIP vision tower."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
from wan2gp_tpu.models.wan.clip_vision import (
    ClipVisionConfig, init_clip_vision, clip_vision_encode, preprocess_image)

DIT_I2V = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=32, text_len=8,
                       model_type="i2v", in_dim=36)
VAE = WanVAEConfig(dim=8, num_res_blocks=1)
CLIP_TINY = ClipVisionConfig(image_size=28, patch_size=14, dim=32,
                             num_heads=4, num_layers=3,
                             compute_dtype=jnp.float32)


def test_clip_vision_tokens():
    params = init_clip_vision(jax.random.key(0), CLIP_TINY,
                              dtype=jnp.float32)
    pixels = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 28, 28, 3)), jnp.float32)
    out = clip_vision_encode(params, CLIP_TINY, pixels)
    assert out.shape == (1, 2 * 2 + 1, 32)
    assert np.isfinite(np.asarray(out)).all()
    # use_31_block: last block excluded -> different from full run
    out_full = clip_vision_encode(params, CLIP_TINY, pixels,
                                  use_31_block=False)
    assert np.abs(np.asarray(out) - np.asarray(out_full)).max() > 1e-6


def test_preprocess_image_range():
    img = jnp.zeros((64, 48, 3), jnp.float32)  # mid-gray in [-1,1]
    out = preprocess_image(img)
    assert out.shape == (1, 224, 224, 3)
    # (-0 + .5 - mean)/std for channel 0: (0.5-0.48145)/0.26863
    np.testing.assert_allclose(float(out[0, 0, 0, 0]), 0.069, atol=0.01)


def test_i2v_conditioning_shapes_and_mask():
    dit = init_wan_dit(jax.random.key(0), DIT_I2V)
    vae = init_wan_vae(jax.random.key(1), VAE)
    pipe = WanPipeline(dit, DIT_I2V, vae_params=vae, vae_cfg=VAE,
                       attn_backend="xla")
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    y, clip_fea = pipe.build_i2v_conditioning(img, frame_num=9, height=32,
                                              width=32)
    assert y.shape == (1, 20, 3, 4, 4)
    assert clip_fea is None  # no clip params configured
    msk = np.asarray(y[0, :4])
    # first latent frame fully 1 (first pixel frame repeated 4x), rest 0
    np.testing.assert_allclose(msk[:, 0], 1.0)
    np.testing.assert_allclose(msk[:, 1:], 0.0)


def test_i2v_generate_end_to_end():
    dit = init_wan_dit(jax.random.key(0), DIT_I2V)
    vae = init_wan_vae(jax.random.key(1), VAE)
    clip = init_clip_vision(jax.random.key(2), CLIP_TINY, dtype=jnp.float32)
    pipe = WanPipeline(dit, DIT_I2V, vae_params=vae, vae_cfg=VAE,
                       clip_params=clip, clip_cfg=CLIP_TINY,
                       attn_backend="xla")
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    sampling = SamplingConfig(solver="unipc", steps=2, guide_scale=3.0)
    # tiny clip outputs 5 tokens x 32 dims; the i2v img_emb expects 1280 —
    # patch the dit's clip usage by passing precomputed clip_fea of the
    # right shape instead
    clip_fea = jnp.asarray(rng.standard_normal((1, 257, 1280)), jnp.float32)
    y, _ = pipe.build_i2v_conditioning(img, 5, 32, 32)
    lat_shape = pipe.latent_shape(5, 32, 32)
    latents = jax.random.normal(jax.random.key(0), lat_shape, jnp.float32)
    x = pipe.denoise(latents, ctx, ctxn, sampling, y=y, clip_fea=clip_fea,
                     width=32, height=32)
    assert x.shape == lat_shape
    assert np.isfinite(np.asarray(x)).all()
