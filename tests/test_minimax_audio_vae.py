"""MiniMax audio VAE tests (torch oracles for resamplers + tiny e2e)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.models.minimax.audio_vae import (
    MiniMaxAudioVAEConfig, kaiser_sinc_filter, upsample2x, downsample2x,
    snake, snake_beta, conv_transpose1d, init_minimax_audio_vae,
    audio_encode, audio_decode)


def _torch_kaiser(cutoff, half_width, kernel_size):
    # scalar mirror of the reference filter (audio_autoencoder.py:102-127)
    half_size = kernel_size // 2
    att = 2.285 * (half_size - 1) * math.pi * (4 * half_width) + 7.95
    if att > 50.0:
        beta = 0.1102 * (att - 8.7)
    elif att >= 21.0:
        beta = 0.5842 * (att - 21) ** 0.4 + 0.07886 * (att - 21.0)
    else:
        beta = 0.0
    window = torch.kaiser_window(kernel_size, beta=beta, periodic=False)
    if kernel_size % 2 == 0:
        time = torch.arange(-half_size, half_size) + 0.5
    else:
        time = torch.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * torch.sinc(2 * cutoff * time)
    return (filt / filt.sum()).float()


def test_kaiser_filter_matches_torch():
    for cutoff, hw, k in ((0.25, 0.3, 12), (0.1, 0.12, 24)):
        ref = _torch_kaiser(cutoff, hw, k).numpy()
        got = kaiser_sinc_filter(cutoff, hw, k)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_upsample2x_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 20, 3)).astype(np.float32)
    filt = kaiser_sinc_filter(0.25, 0.3, 12)
    # reference UpSample1d (audio_autoencoder.py:179-201)
    ratio, k = 2, 12
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    tx = torch.tensor(x.transpose(0, 2, 1))
    tf = torch.tensor(filt).view(1, 1, -1).expand(3, -1, -1)
    ref = F.pad(tx, (pad, pad), mode="replicate")
    ref = ratio * F.conv_transpose1d(ref, tf, stride=ratio, groups=3)
    ref = ref[..., pad_left:-pad_right].numpy().transpose(0, 2, 1)
    got = upsample2x(jnp.asarray(x), jnp.asarray(filt))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_downsample2x_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 24, 2)).astype(np.float32)
    filt = kaiser_sinc_filter(0.25, 0.3, 12)
    k = 12
    even = k % 2 == 0
    tx = torch.tensor(x.transpose(0, 2, 1))
    tf = torch.tensor(filt).view(1, 1, -1).expand(2, -1, -1)
    ref = F.pad(tx, (k // 2 - int(even), k // 2), mode="replicate")
    ref = F.conv1d(ref, tf, stride=2, groups=2).numpy().transpose(0, 2, 1)
    got = downsample2x(jnp.asarray(x), jnp.asarray(filt))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_snake_activations():
    x = jnp.asarray([[1.0, -0.5]])
    a = jnp.asarray([2.0, 2.0])
    expect = np.asarray(x) + np.sin(2.0 * np.asarray(x)) ** 2 / 2.0
    np.testing.assert_allclose(np.asarray(snake(x, a)), expect, rtol=1e-6)
    # snake_beta with zero logs == snake with alpha 1
    sb = snake_beta(x, jnp.zeros(2), jnp.zeros(2))
    expect2 = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(np.asarray(sb), expect2, rtol=1e-6)


def test_tiny_roundtrip_shapes():
    cfg = MiniMaxAudioVAEConfig(
        encoder_dim=4, encoder_rates=(2, 2), latent_dim=32,
        latent_channels=8, num_attention_heads=2, decoder_dim=16,
        decoder_rates=(2, 2), decoder_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    params = init_minimax_audio_vae(jax.random.key(0), cfg)
    wave = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 1, 16)), jnp.float32) * 0.1
    z = audio_encode(params, cfg, wave)
    assert z.shape == (1, 8, 4)          # hop 4
    out = audio_decode(params, cfg, z)
    assert out.shape == (1, 1, 16)
    assert np.abs(np.asarray(out)).max() <= 1.0
