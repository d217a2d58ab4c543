"""Stable-Audio-Open Oobleck VAE for MAGI audio conditioning/decoding.

TPU-native re-implementation of /root/reference/models/magi_human/
upstream/inference/model/sa_audio/sa_audio_module.py:
- SnakeBeta:19 (log-scale per-channel alpha/beta) activations;
- ResidualUnit:103 (snake-conv(d7,dil)-snake-conv(k1) + skip),
  EncoderBlock:143 (3 residual units + strided conv k=2s,
  pad ceil(s/2)), DecoderBlock:175 (snake + ConvTranspose k=2s + 3
  residual units);
- OobleckEncoder:224 / OobleckDecoder:281 (channels 128, c_mults
  [1,2,4,8,16], strides [2,4,4,8,8] -> x2048 at 44.1 kHz stereo);
- VAEBottleneck:58 — encoder emits 2*latent chunks (mean, scale);
  deterministic encoding takes the mean (magi feeds latents as
  conditioning, magi_human_model.py:440);
- all convs weight-normalized (WNConv1d:75), fused at load."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SAAudioConfig:
    io_channels: int = 2
    channels: int = 128
    latent_dim: int = 64
    c_mults: Tuple[int, ...] = (1, 2, 4, 8, 16)
    strides: Tuple[int, ...] = (2, 4, 4, 8, 8)
    sample_rate: int = 44100
    final_tanh: bool = True


def _conv1d(x, p, stride=1, dilation=1, padding=0):
    """x [B, T, C]; w [k, cin, cout] (torch pad semantics)."""
    if padding:
        x = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _tconv1d(x, p, stride, padding):
    """torch ConvTranspose1d k, stride, padding; w pre-flipped
    [k, cin, cout]."""
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), [(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _snake_beta(x, p):
    """x [B, T, C]; log-scale alpha/beta (sa_audio_module.py:15-46)."""
    a = jnp.exp(p["alpha"])
    b = jnp.exp(p["beta"])
    return x + (1.0 / (b + 1e-9)) * jnp.sin(x * a) ** 2


def _init_conv(key, cin, cout, k, bias=True):
    lim = math.sqrt(6.0 / (cin * k + cout))
    p = {"w": jax.random.uniform(key, (k, cin, cout), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _init_snake(c):
    return {"alpha": jnp.zeros((c,), jnp.float32),
            "beta": jnp.zeros((c,), jnp.float32)}


def _init_res_unit(key, c):
    k1, k2 = jax.random.split(key)
    return {"s1": _init_snake(c), "c1": _init_conv(k1, c, c, 7),
            "s2": _init_snake(c), "c2": _init_conv(k2, c, c, 1)}


def _res_unit(p, x, dilation):
    y = _snake_beta(x, p["s1"])
    y = _conv1d(y, p["c1"], dilation=dilation,
                padding=(dilation * 6) // 2)
    y = _snake_beta(y, p["s2"])
    y = _conv1d(y, p["c2"])
    return y + x


def init_sa_audio(key, cfg: SAAudioConfig = SAAudioConfig()
                  ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    cm = (1,) + tuple(cfg.c_mults)
    ch = cfg.channels
    enc_blocks, dec_blocks = [], []
    for i in range(len(cm) - 1):
        cin, cout = cm[i] * ch, cm[i + 1] * ch
        enc_blocks.append({
            "res": [_init_res_unit(next(keys), cin) for _ in range(3)],
            "snake": _init_snake(cin),
            "down": _init_conv(next(keys), cin, cout,
                               2 * cfg.strides[i])})
    for i in range(len(cm) - 1, 0, -1):
        cin, cout = cm[i] * ch, cm[i - 1] * ch
        dec_blocks.append({
            "snake": _init_snake(cin),
            "up": _init_conv(next(keys), cin, cout,
                             2 * cfg.strides[i - 1]),
            "res": [_init_res_unit(next(keys), cout) for _ in range(3)]})
    return {
        "enc_in": _init_conv(next(keys), cfg.io_channels, ch, 7),
        "enc_blocks": enc_blocks,
        "enc_snake": _init_snake(cm[-1] * ch),
        "enc_out": _init_conv(next(keys), cm[-1] * ch,
                              2 * cfg.latent_dim, 3),
        "dec_in": _init_conv(next(keys), cfg.latent_dim, cm[-1] * ch, 7),
        "dec_blocks": dec_blocks,
        "dec_snake": _init_snake(ch),
        "dec_out": _init_conv(next(keys), ch, cfg.io_channels, 7,
                              bias=False),
    }


def sa_audio_encode(params, cfg: SAAudioConfig, wave):
    """wave: [B, T, io_channels] -> mean latents [B, T/2048, latent]
    (deterministic VAE bottleneck mean, sa_audio_module.py:58-68)."""
    x = _conv1d(wave.astype(jnp.float32), params["enc_in"], padding=3)
    for i, bp in enumerate(params["enc_blocks"]):
        for j, rp in enumerate(bp["res"]):
            x = _res_unit(rp, x, (1, 3, 9)[j])
        x = _snake_beta(x, bp["snake"])
        s = cfg.strides[i]
        x = _conv1d(x, bp["down"], stride=s,
                    padding=math.ceil(s / 2))
    x = _snake_beta(x, params["enc_snake"])
    x = _conv1d(x, params["enc_out"], padding=1)
    mean, _scale = jnp.split(x, 2, axis=-1)
    return mean


def sa_audio_decode(params, cfg: SAAudioConfig, latents):
    """latents: [B, T_lat, latent] -> wave [B, T_lat*2048, io_channels]
    (OobleckDecoder:281, final tanh)."""
    x = _conv1d(latents.astype(jnp.float32), params["dec_in"],
                padding=3)
    rev_strides = list(cfg.strides)[::-1]
    for i, bp in enumerate(params["dec_blocks"]):
        x = _snake_beta(x, bp["snake"])
        s = rev_strides[i]
        x = _tconv1d(x, bp["up"], stride=s, padding=math.ceil(s / 2))
        for j, rp in enumerate(bp["res"]):
            x = _res_unit(rp, x, (1, 3, 9)[j])
    x = _snake_beta(x, params["dec_snake"])
    x = _conv1d(x, params["dec_out"], padding=3)
    return jnp.tanh(x) if cfg.final_tanh else x


def _wn_fuse(sd, prefix):
    for gk, vk in ((f"{prefix}.weight_g", f"{prefix}.weight_v"),
                   (f"{prefix}.parametrizations.weight.original0",
                    f"{prefix}.parametrizations.weight.original1")):
        if gk in sd:
            g = np.asarray(sd.pop(gk), np.float32)
            v = np.asarray(sd.pop(vk), np.float32)
            norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd.pop(f"{prefix}.weight"), np.float32)


def load_sa_audio_params(sd: Dict[str, np.ndarray],
                         cfg: SAAudioConfig = SAAudioConfig()):
    """stable-audio-open vae keys: encoder.layers.N... /
    decoder.layers.N... with nn.Sequential indices (Oobleck layout)."""
    sd = dict(sd)
    pre = ""
    for cand in ("pretransform.model.", "vae_model.", "model."):
        if any(k.startswith(cand) for k in sd):
            pre = cand
            break
    sd = {k[len(pre):] if k.startswith(pre) else k: v
          for k, v in sd.items()}

    def conv(prefix, transpose=False, bias=True):
        w = _wn_fuse(sd, prefix)           # torch [out,in,k]/[in,out,k]
        if transpose:
            w = np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])
        else:
            w = w.transpose(2, 1, 0)
        p = {"w": jnp.asarray(np.ascontiguousarray(w))}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{prefix}.bias"),
                                            np.float32))
        return p

    def snake(prefix):
        return {"alpha": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.alpha"), np.float32).reshape(-1)),
                "beta": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.beta"), np.float32).reshape(-1))}

    def res_unit(prefix):
        return {"s1": snake(f"{prefix}.layers.0"),
                "c1": conv(f"{prefix}.layers.1"),
                "s2": snake(f"{prefix}.layers.2"),
                "c2": conv(f"{prefix}.layers.3")}

    n = len(cfg.c_mults)
    enc_blocks = []
    for i in range(n):
        bp = f"encoder.layers.{i + 1}.layers"
        enc_blocks.append({
            "res": [res_unit(f"{bp}.{j}") for j in range(3)],
            "snake": snake(f"{bp}.3"),
            "down": conv(f"{bp}.4")})
    dec_blocks = []
    for i in range(n):
        bp = f"decoder.layers.{i + 1}.layers"
        dec_blocks.append({
            "snake": snake(f"{bp}.0"),
            "up": conv(f"{bp}.1", transpose=True),
            "res": [res_unit(f"{bp}.{j + 2}") for j in range(3)]})
    params = {
        "enc_in": conv("encoder.layers.0"),
        "enc_blocks": enc_blocks,
        "enc_snake": snake(f"encoder.layers.{n + 1}"),
        "enc_out": conv(f"encoder.layers.{n + 2}"),
        "dec_in": conv("decoder.layers.0"),
        "dec_blocks": dec_blocks,
        "dec_snake": snake(f"decoder.layers.{n + 1}"),
        "dec_out": conv(f"decoder.layers.{n + 2}", bias=False),
    }
    return params, sorted(sd.keys())
