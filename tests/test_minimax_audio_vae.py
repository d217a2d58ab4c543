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


def test_loader_roundtrip():
    """Synthetic torch-keyed state dict (weight_g/weight_v) -> params ->
    encode/decode runs, no leftover keys."""
    import torch
    from wan2gp_tpu.models.minimax.audio_vae import (
        MiniMaxAudioVAEConfig, load_minimax_audio_vae_params,
        audio_encode, audio_decode)

    cfg = MiniMaxAudioVAEConfig(
        encoder_dim=8, encoder_rates=(2, 2), latent_dim=16,
        latent_channels=4, num_attention_heads=2, decoder_dim=16,
        decoder_rates=(2, 2), decoder_kernel_sizes=(4, 4),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),))
    g = torch.Generator().manual_seed(7)
    sd = {}

    def wn_conv(name, cin, cout, k, bias=True):
        sd[f"{name}.weight_v"] = torch.randn(cout, cin, k, generator=g) * .2
        sd[f"{name}.weight_g"] = torch.rand(cout, 1, 1, generator=g) + .5
        if bias:
            sd[f"{name}.bias"] = torch.randn(cout, generator=g) * .01

    def conv(name, cin, cout, k):
        sd[f"{name}.weight"] = torch.randn(cout, cin, k, generator=g) * .2
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * .01

    def wn_tconv(name, cin, cout, k):
        sd[f"{name}.weight_v"] = torch.randn(cin, cout, k, generator=g) * .2
        sd[f"{name}.weight_g"] = torch.rand(cin, 1, 1, generator=g) + .5
        sd[f"{name}.bias"] = torch.randn(cout, generator=g) * .01

    def norm(name, d):
        sd[f"{name}.weight"] = torch.ones(d)
        sd[f"{name}.bias"] = torch.zeros(d)

    def lin(name, din, dout):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * .1
        sd[f"{name}.bias"] = torch.zeros(dout)

    d = cfg.encoder_dim
    wn_conv("encoder.block.0", 1, d, 7)
    for i, s in enumerate(cfg.encoder_rates):
        pre = f"encoder.block.{i + 1}.block"
        for j in range(3):
            sd[f"{pre}.{j}.block.0.alpha"] = torch.ones(1, d, 1)
            wn_conv(f"{pre}.{j}.block.1", d, d, 7)
            sd[f"{pre}.{j}.block.2.alpha"] = torch.ones(1, d, 1)
            wn_conv(f"{pre}.{j}.block.3", d, d, 1)
        sd[f"{pre}.3.alpha"] = torch.ones(1, d, 1)
        wn_conv(f"{pre}.4", d, 2 * d, 2 * s)
        d *= 2
    n = len(cfg.encoder_rates)
    sd[f"encoder.block.{n + 1}.alpha"] = torch.ones(1, d, 1)
    wn_conv(f"encoder.block.{n + 2}", d, cfg.latent_dim, 3)

    ld, lc = cfg.latent_dim, cfg.latent_channels
    norm("pre_block.norm1", ld)
    norm("pre_block.norm3", ld)
    norm("pre_block.norm2", lc)
    norm("pre_block.mlp.norm", lc)
    sd["pre_block.attn.qkv.weight"] = torch.randn(3 * ld, ld,
                                                  generator=g) * .05
    sd["pre_block.attn.q_bias"] = torch.zeros(ld)
    sd["pre_block.attn.v_bias"] = torch.zeros(ld)
    sd["pre_block.attn.zero_k_bias"] = torch.zeros(ld)
    lin("pre_block.attn.proj", lc, lc)
    lin("pre_block.proj", ld, lc)
    lin("pre_block.mlp.w0", lc, 2 * lc)
    lin("pre_block.mlp.w1", lc, 2 * lc)
    lin("pre_block.mlp.w2", 2 * lc, lc)
    conv("mean_proj", lc, lc, 1)
    conv("logs_proj", lc, lc, 1)
    conv("dec_in_proj", lc, ld, 1)

    dd = cfg.decoder_dim
    wn_conv("decoder.conv_pre", ld, dd, 7)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, kernel) in enumerate(zip(cfg.decoder_rates,
                                           cfg.decoder_kernel_sizes)):
        ch = dd // (2 ** (i + 1))
        wn_tconv(f"decoder.ups.{i}.0", dd // (2 ** i), ch, kernel)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilations)):
            rb = f"decoder.resblocks.{i * nk + j}"
            for m in range(len(rd)):
                wn_conv(f"{rb}.convs1.{m}", ch, ch, rk)
                wn_conv(f"{rb}.convs2.{m}", ch, ch, rk)
                sd[f"{rb}.activations.{2 * m}.act.alpha"] = torch.zeros(ch)
                sd[f"{rb}.activations.{2 * m}.act.beta"] = torch.zeros(ch)
                sd[f"{rb}.activations.{2 * m + 1}.act.alpha"] = \
                    torch.zeros(ch)
                sd[f"{rb}.activations.{2 * m + 1}.act.beta"] = \
                    torch.zeros(ch)
    sd["decoder.activation_post.act.alpha"] = torch.zeros(ch)
    sd["decoder.activation_post.act.beta"] = torch.zeros(ch)
    wn_conv("decoder.conv_post", ch, 1, 7, bias=False)

    npsd = {k: v.numpy() for k, v in sd.items()}
    params, leftover = load_minimax_audio_vae_params(npsd, cfg)
    assert leftover == [], leftover

    hop = cfg.hop_length
    wave = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 1, 8 * hop)).astype(np.float32)) * 0.1
    lat = audio_encode(params, cfg, wave)
    assert lat.shape == (1, lc, 8)
    out = audio_decode(params, cfg, lat)
    assert out.shape == (1, 1, 8 * hop)
    assert np.isfinite(np.asarray(out)).all()

    # weight-norm fusion is exact: ||w_row|| == g for the first conv
    from wan2gp_tpu.models.minimax.audio_vae import \
        load_minimax_audio_vae_params as _  # noqa: F401
    w = np.asarray(params["encoder"]["conv_in"]["w"])   # [k, 1, d]
    gg = sd["encoder.block.0.weight_g"].numpy().reshape(-1)
    assert np.allclose(np.sqrt((w ** 2).sum(axis=(0, 1))), gg, atol=1e-5)
