"""Oobleck waveform VAE for ACE-Step 1.5 (reference
models/TTS/ace_step15/models/autoencoder_oobleck.py — the Stable-Audio
autoencoder: snake activations, dilated residual units, strided
up/down blocks; hop = prod(ratios) = 2048, latent 64).

NTC layout; weight-norm is folded into plain conv weights at load.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OobleckConfig:
    # ace_step_v1_5_audio_vae_config.json: hop 1920 @ 48 kHz = 25 Hz
    encoder_hidden: int = 128
    ratios: Tuple[int, ...] = (2, 4, 4, 6, 10)
    multiples: Tuple[int, ...] = (1, 2, 4, 8, 16)
    decoder_channels: int = 128
    latent_dim: int = 64
    audio_channels: int = 2
    sample_rate: int = 48000

    @property
    def hop(self) -> int:
        return int(np.prod(self.ratios))

    @classmethod
    def tiny(cls):
        return cls(encoder_hidden=8, ratios=(2, 4), multiples=(1, 2),
                   decoder_channels=8, latent_dim=8, sample_rate=800)


def _init_conv(key, cin, cout, k, dtype, bias=True):
    std = 1.0 / np.sqrt(cin * k)
    p = {"w": (jax.random.normal(key, (k, cin, cout), jnp.float32)
               * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _conv(x, p, stride=1, dilation=1, pad=0):
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), "VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _conv_t(x, p, stride, pad):
    """torch ConvTranspose1d(k, stride, padding=pad) equivalence:
    VALID conv_transpose (spatially flipped kernel) then trim `pad`
    from both ends."""
    y = jax.lax.conv_transpose(
        x, p["w"][::-1].astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    if pad:
        y = y[:, pad:-pad]
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _init_snake(dim):
    # logscale: alpha/beta stored as log values, zeros -> exp = 1
    return {"alpha": jnp.zeros((dim,), jnp.float32),
            "beta": jnp.zeros((dim,), jnp.float32)}


def _snake(x, p):
    """x + sin^2(alpha x) / beta (autoencoder_oobleck.py:31-63)."""
    a = jnp.exp(p["alpha"]).astype(jnp.float32)
    b = jnp.exp(p["beta"]).astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    s = jnp.sin(x32 * a)
    return (x32 + s * s / (b + 1e-9)).astype(x.dtype)


def _init_res_unit(key, dim, dilation, dtype):
    k1, k2 = jax.random.split(key)
    return {"snake1": _init_snake(dim),
            "conv1": _init_conv(k1, dim, dim, 7, dtype),
            "snake2": _init_snake(dim),
            "conv2": _init_conv(k2, dim, dim, 1, dtype),
            "_dil": dilation}


def _res_unit(x, p):
    d = p["_dil"]
    h = _conv(_snake(x, p["snake1"]), p["conv1"], dilation=d,
              pad=3 * d)
    h = _conv(_snake(h, p["snake2"]), p["conv2"])
    return x + h


def init_oobleck(key, cfg: OobleckConfig, dtype=jnp.float32):
    eh = cfg.encoder_hidden
    mult = (1,) + tuple(cfg.multiples)
    keys = iter(jax.random.split(key, 64))

    enc_blocks = []
    for i, s in enumerate(cfg.ratios):
        cin, cout = eh * mult[i], eh * mult[i + 1]
        ks = iter(jax.random.split(next(keys), 4))
        enc_blocks.append({
            "res": [_init_res_unit(next(ks), cin, d, dtype)
                    for d in (1, 3, 9)],
            "snake": _init_snake(cin),
            "down": dict(_init_conv(next(ks), cin, cout, 2 * s, dtype),
                         _stride=s, _pad=math.ceil(s / 2)),
        })
    d_top = eh * mult[-1]
    dc = cfg.decoder_channels
    dmult = (1,) + tuple(cfg.multiples)
    dec_blocks = []
    n = len(cfg.ratios)
    for i, s in enumerate(tuple(reversed(cfg.ratios))):
        cin = dc * dmult[n - i]
        cout = dc * dmult[n - i - 1]
        ks = iter(jax.random.split(next(keys), 4))
        dec_blocks.append({
            "snake": _init_snake(cin),
            "up": dict(_init_conv(next(ks), cin, cout, 2 * s, dtype),
                       _stride=s, _pad=math.ceil(s / 2)),
            "res": [_init_res_unit(next(ks), cout, d, dtype)
                    for d in (1, 3, 9)],
        })
    return {
        "enc_in": _init_conv(next(keys), cfg.audio_channels, eh, 7,
                             dtype),
        "enc_blocks": enc_blocks,
        "enc_snake": _init_snake(d_top),
        # encoder head emits mean+logvar (OobleckDiagonalGaussian)
        "enc_out": _init_conv(next(keys), d_top, 2 * cfg.latent_dim, 3,
                              dtype),
        "dec_in": _init_conv(next(keys), cfg.latent_dim,
                             dc * dmult[-1], 7, dtype),
        "dec_blocks": dec_blocks,
        "dec_snake": _init_snake(dc),
        "dec_out": _init_conv(next(keys), dc, cfg.audio_channels, 7,
                              dtype, bias=False),
    }


def oobleck_encode(params, cfg: OobleckConfig, audio,
                   sample_key=None):
    """audio [B, T, C] (T multiple of hop) -> latents
    [B, T/hop, latent_dim] (mean, or sampled when sample_key given)."""
    x = _conv(audio, params["enc_in"], pad=3)
    for bp in params["enc_blocks"]:
        for rp in bp["res"]:
            x = _res_unit(x, rp)
        x = _snake(x, bp["snake"])
        x = _conv(x, bp["down"], stride=bp["down"]["_stride"],
                  pad=bp["down"]["_pad"])
    x = _snake(x, params["enc_snake"])
    x = _conv(x, params["enc_out"], pad=1)
    mean, scale = jnp.split(x, 2, axis=-1)
    if sample_key is None:
        return mean
    # OobleckDiagonalGaussianDistribution: std = softplus(scale)+1e-4
    std = jax.nn.softplus(scale.astype(jnp.float32)) + 1e-4
    return mean + (std * jax.random.normal(
        sample_key, mean.shape, jnp.float32)).astype(mean.dtype)


def oobleck_decode(params, cfg: OobleckConfig, latents):
    """latents [B, N, latent_dim] -> audio [B, N*hop, C]."""
    x = _conv(latents, params["dec_in"], pad=3)
    for bp in params["dec_blocks"]:
        x = _snake(x, bp["snake"])
        x = _conv_t(x, bp["up"], bp["up"]["_stride"], bp["up"]["_pad"])
        for rp in bp["res"]:
            x = _res_unit(x, rp)
    x = _snake(x, params["dec_snake"])
    return _conv(x, params["dec_out"], pad=3)
