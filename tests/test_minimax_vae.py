"""MiniMax H3 video VAE tests (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.minimax.video_vae import (
    MiniMaxVideoVAEConfig, init_minimax_video_vae, minimax_vae_encode,
    minimax_vae_decode, minimax_vae_encode_clip, minimax_vae_decode_clip)

TINY = MiniMaxVideoVAEConfig(
    latent_channels=4, block_out_channels=(8, 8, 16),
    layers_per_block=1, spatial_factors=(2, 2, 1),
    temporal_factors=(1, 2, 1), norm_groups=4,
    decoder_layers=2, decoder_heads=2, decoder_head_dim=8,
    num_register_tokens=2, ffn_mult=2, clip_length=5, token_drop=1)
# spatial ratio 4, temporal ratio 2; clip 5 frames -> ceil(5/2)=3 tokens


def test_geometry_constants():
    cfg = MiniMaxVideoVAEConfig()
    assert cfg.spatial_ratio == 16 and cfg.temporal_ratio == 4
    # clip 17 @ ratio 4: pre-pad 3, 5 tokens/chunk, overlap 2 tokens
    assert (-cfg.clip_length) % cfg.temporal_ratio == 3
    import math
    assert math.ceil(cfg.clip_length / cfg.temporal_ratio) == 5
    assert (-cfg.token_drop) % 5 == 2


def test_encode_clip_shapes():
    params = init_minimax_video_vae(jax.random.key(0), TINY)
    vid = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 5, 16, 16)), jnp.float32) * 0.1
    z = minimax_vae_encode_clip(params, TINY, vid)
    # temporal: 5 frames, pad 2 front @ level1 stride2 -> 3 tokens
    assert z.shape == (1, 4, 3, 4, 4)


def test_decode_clip_shapes():
    params = init_minimax_video_vae(jax.random.key(1), TINY)
    z = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 4, 3, 2, 2)), jnp.float32)
    vid = minimax_vae_decode_clip(params, TINY, z, attn_backend="xla")
    assert vid.shape == (1, 3, 6, 8, 8)
    assert np.isfinite(np.asarray(vid)).all()


def test_chunked_encode_decode_roundtrip_shapes():
    params = init_minimax_video_vae(jax.random.key(2), TINY)
    rng = np.random.default_rng(2)
    # 2 clips worth of frames: 10 -> tokens 2*3 - drop 1 = 5
    vid = jnp.asarray(rng.standard_normal((1, 3, 10, 16, 16)),
                      jnp.float32) * 0.1
    z = minimax_vae_encode(params, TINY, vid)
    assert z.shape[2] == 5
    out = minimax_vae_decode(params, TINY, z, attn_backend="xla")
    assert out.shape[0:2] == (1, 3)
    assert out.shape[3:] == (16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_latent_normalization():
    params = init_minimax_video_vae(jax.random.key(3), TINY)
    params["latents_std"] = jnp.full((4,), 2.0)
    params["latents_mean"] = jnp.full((4,), 0.25)
    rng = np.random.default_rng(3)
    vid = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)),
                      jnp.float32) * 0.1
    z = minimax_vae_encode_clip(params, TINY, vid)
    p2 = dict(params)
    p2["latents_std"] = jnp.ones((4,))
    p2["latents_mean"] = jnp.zeros((4,))
    z_raw = minimax_vae_encode_clip(p2, TINY, vid)
    np.testing.assert_allclose(np.asarray(z), (np.asarray(z_raw) - 0.25) / 2,
                               rtol=1e-5, atol=1e-5)
