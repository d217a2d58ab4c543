"""ACE-Step audio stack: music DCAE + log-mel front end + ADaMoS HiFiGAN.

Re-implementation of /root/reference/models/TTS/ace_step/music_dcae/
(music_dcae_pipeline.py MusicDCAE:25, music_vocoder.py ADaMoSHiFiGANV1:495
= ConvNeXtEncoder:191 backbone + HiFiGANGenerator:371 head,
music_log_mel.py LogMelSpectrogram).

The latent <-> mel autoencoder is the SANA deep-compression autoencoder
(diffusers AutoencoderDC, dc-ae f8c8 over [B, 2, 128, T] stereo log-mels:
latent [B, 8, 16, T/8]).  Implemented config-driven: ResBlocks
(conv-act-conv + RMSNorm, residual), downsample convs with
space-to-channel shortcuts, decoder upsamples via conv + pixel-shuffle
with channel-average shortcuts (DCAE paper arXiv:2410.10733 residual
up/downsampling).  The loader adapts to the diffusers key space.

MusicDCAE constants (music_dcae_pipeline.py:73-80): mel range
[-11, 3] normalized to [-1, 1], latent scale 0.1786 / shift -1.9091,
44.1 kHz, hop 512.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

SCALE_FACTOR = 0.1786
SHIFT_FACTOR = -1.9091
MIN_MEL, MAX_MEL = -11.0, 3.0


# ---------------------------------------------------------------------------
# DCAE (decoder-focused; encoder included for audio2audio / retake)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class MusicDCAEConfig:
    in_channels: int = 2
    latent_channels: int = 8
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: Tuple[int, ...] = (2, 2, 2, 2)
    eps: float = 1e-5


def _c2(key, cin, cout, k=3, dtype=jnp.float32, bias=True):
    s = 1.0 / math.sqrt(cin * k * k)
    p = {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                 -s, s).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def _conv2d(x, p, stride=1, pad=None):
    """x [B, H, W, C]; w [kh, kw, cin, cout]; same padding by default."""
    k = p["w"].shape[0]
    if pad is None:
        pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms2d(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _res_block(p, x, eps):
    """DCAE ResBlock: conv3x3 -> silu -> conv3x3(no bias) -> RMSNorm ->
    + residual."""
    h = _conv2d(x, p["conv1"])
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _conv2d(h, p["conv2"])
    h = _rms2d(h, p["norm"], eps)
    return x + h


def init_music_dcae(key, cfg: MusicDCAEConfig = MusicDCAEConfig(),
                    dtype=jnp.float32):
    keys = iter(jax.random.split(key, 512))
    chs = cfg.block_out_channels

    def res(c):
        return {"conv1": _c2(next(keys), c, c, dtype=dtype),
                "conv2": _c2(next(keys), c, c, dtype=dtype, bias=False),
                "norm": jnp.ones((c,), jnp.float32)}

    enc_stages, dec_stages = [], []
    for i, c in enumerate(chs):
        stage = {"blocks": [res(c) for _ in range(cfg.layers_per_block[i])]}
        if i < len(chs) - 1:
            stage["down"] = _c2(next(keys), c, chs[i + 1], dtype=dtype)
        enc_stages.append(stage)
    for i, c in reversed(list(enumerate(chs))):
        stage = {"blocks": [res(c) for _ in range(cfg.layers_per_block[i])]}
        if i > 0:
            # pixel-shuffle upsample: conv to 4*next channels then shuffle
            stage["up"] = _c2(next(keys), c, chs[i - 1] * 4, dtype=dtype)
        dec_stages.append(stage)
    cz = cfg.latent_channels
    return {
        "encoder": {
            "conv_in": _c2(next(keys), cfg.in_channels, chs[0], dtype=dtype),
            "stages": enc_stages,
            "conv_out": _c2(next(keys), chs[-1], cz, dtype=dtype),
        },
        "decoder": {
            "conv_in": _c2(next(keys), cz, chs[-1], dtype=dtype),
            "stages": dec_stages,
            "norm_out": jnp.ones((chs[0],), jnp.float32),
            "conv_out": _c2(next(keys), chs[0], cfg.in_channels,
                            dtype=dtype),
        },
    }


def dcae_encode(params, cfg: MusicDCAEConfig, mels):
    """mels: [B, C=2, 128, T] normalized to [-1, 1].  Returns scaled
    latents [B, 8, 16, T/8] (MusicDCAE.encode:96-132)."""
    x = mels.transpose(0, 2, 3, 1)
    enc = params["encoder"]
    x = _conv2d(x, enc["conv_in"])
    for stage in enc["stages"]:
        for bp in stage["blocks"]:
            x = _res_block(bp, x, cfg.eps)
        if "down" in stage:
            # conv stride-2 downsample + space-to-channel mean shortcut
            y = _conv2d(x, stage["down"], stride=2)
            b, h, w, c = x.shape
            sc = x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))
            cout = y.shape[-1]
            rep = -(-cout // c)
            sc = jnp.tile(sc, (1, 1, 1, rep))[..., :cout]
            x = y + sc
    z = _conv2d(x, enc["conv_out"])
    z = z.transpose(0, 3, 1, 2)
    return (z - SHIFT_FACTOR) * SCALE_FACTOR


def dcae_decode(params, cfg: MusicDCAEConfig, latents):
    """latents: [B, 8, 16, T'] scaled.  Returns mels [B, 2, 128, T'*8]
    in the raw log-mel range (MusicDCAE.decode:134-148)."""
    z = latents / SCALE_FACTOR + SHIFT_FACTOR
    x = z.transpose(0, 2, 3, 1)
    dec = params["decoder"]
    x = _conv2d(x, dec["conv_in"])
    for stage in dec["stages"]:
        for bp in stage["blocks"]:
            x = _res_block(bp, x, cfg.eps)
        if "up" in stage:
            y = _conv2d(x, stage["up"])
            b, h, w, c4 = y.shape
            c = c4 // 4
            y = y.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(b, h * 2, w * 2, c)
            # channel-group-average + nearest-upsample shortcut
            cin = x.shape[-1]
            g = cin // c if cin >= c else 1
            sc = x[..., :g * c].reshape(b, h, w, g, c).mean(axis=3) \
                if cin >= c else jnp.tile(x, (1, 1, 1, -(-c // cin)))[..., :c]
            sc = jnp.repeat(jnp.repeat(sc, 2, axis=1), 2, axis=2)
            x = y + sc
    x = _rms2d(x, dec["norm_out"], cfg.eps)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = _conv2d(x, dec["conv_out"])
    mels = x.transpose(0, 3, 1, 2)
    # [-1,1] -> raw log-mel range
    mels = mels * 0.5 + 0.5
    return mels * (MAX_MEL - MIN_MEL) + MIN_MEL


# ---------------------------------------------------------------------------
# log-mel front end (music_log_mel.py, 44.1 kHz hop 512 n_fft 2048)
# ---------------------------------------------------------------------------

def log_mel_spectrogram(wave, sr=44100, n_fft=2048, hop=512, win=2048,
                        n_mels=128, fmin=40.0, fmax=16000.0):
    """wave: [B, T] mono in [-1, 1] -> log-mel [B, n_mels, T/hop]
    (LinearSpectrogram pow2_sqrt + MelScale + log clamp 1e-5)."""
    from ..ltx2.audio_vae import mel_filterbank
    b, t = wave.shape
    pad = (win - hop) // 2
    x = jnp.pad(wave, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[1] - win) // hop
    idx = (np.arange(win)[None] + hop * np.arange(n_frames)[:, None])
    frames = x[:, idx] * jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    mag = jnp.sqrt(jnp.abs(spec) ** 2 + 1e-12)
    fb = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("btf,mf->bmt", mag, fb)
    return jnp.log(jnp.clip(mel, 1e-5, None))


# ---------------------------------------------------------------------------
# ADaMoS HiFiGAN vocoder (music_vocoder.py): ConvNeXt backbone + HiFiGAN
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ADaMoSConfig:
    input_channels: int = 128
    depths: Tuple[int, ...] = (3, 3, 9, 3)
    dims: Tuple[int, ...] = (128, 256, 384, 512)
    convnext_kernel: int = 7
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11, 13)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 4
    head_in: int = 512                    # num_mels arg == dims[-1]
    upsample_initial_channel: int = 1024
    pre_conv_kernel: int = 13
    post_conv_kernel: int = 13
    sampling_rate: int = 44100
    eps: float = 1e-6


def _c1(key, cin, cout, k, dtype=jnp.float32, groups=1):
    s = 1.0 / math.sqrt(cin // groups * k)
    return {"w": jax.random.uniform(key, (k, cin // groups, cout),
                                    jnp.float32, -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def init_adamos_vocoder(key, cfg: ADaMoSConfig = ADaMoSConfig(),
                        dtype=jnp.float32):
    keys = iter(jax.random.split(key, 1024))

    def convnext_block(d):
        return {
            "dwconv": _c1(next(keys), d, d, cfg.convnext_kernel, dtype,
                          groups=d),
            "norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "pw1": {"w": (jax.random.normal(next(keys), (d, 4 * d),
                                            jnp.float32) * 0.02
                          ).astype(dtype), "b": jnp.zeros((4 * d,), dtype)},
            "pw2": {"w": (jax.random.normal(next(keys), (4 * d, d),
                                            jnp.float32) * 0.02
                          ).astype(dtype), "b": jnp.zeros((d,), dtype)},
            "gamma": jnp.full((d,), 1e-6, jnp.float32),
        }

    dims = cfg.dims
    backbone = {
        "stem": _c1(next(keys), cfg.input_channels, dims[0], 7, dtype),
        "stem_ln": {"w": jnp.ones((dims[0],)), "b": jnp.zeros((dims[0],))},
        "mid": [{"ln": {"w": jnp.ones((dims[i],)),
                        "b": jnp.zeros((dims[i],))},
                 "conv": _c1(next(keys), dims[i], dims[i + 1], 1, dtype)}
                for i in range(len(dims) - 1)],
        "stages": [[convnext_block(dims[i]) for _ in range(cfg.depths[i])]
                   for i in range(len(dims))],
        "norm": {"w": jnp.ones((dims[-1],)), "b": jnp.zeros((dims[-1],))},
    }

    ups = []
    ch = cfg.upsample_initial_channel
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        stage = {"conv": _c1(next(keys), ch, ch // 2, k, dtype)}
        ch //= 2
        stage["resblocks"] = []
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilations):
            stage["resblocks"].append({
                "convs1": [_c1(next(keys), ch, ch, rk, dtype)
                           for _ in dils],
                "convs2": [_c1(next(keys), ch, ch, rk, dtype)
                           for _ in dils]})
        ups.append(stage)
    head = {
        "conv_pre": _c1(next(keys), cfg.head_in,
                        cfg.upsample_initial_channel,
                        cfg.pre_conv_kernel, dtype),
        "ups": ups,
        "conv_post": _c1(next(keys), ch, 1, cfg.post_conv_kernel, dtype),
    }
    return {"backbone": backbone, "head": head}


def _conv1(x, p, stride=1, dilation=1, pad=0, groups=1, pad_mode=None):
    if pad:
        x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)],
                    mode=pad_mode or "constant")
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), "VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    return y + p["b"].astype(y.dtype)


def _convt1(x, p, stride, padding):
    """ConvTranspose1d with torch-layout-converted weight [k, cin, cout]
    pre-flipped by the loader."""
    k = p["w"].shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"].astype(y.dtype)


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (((x32 - mu) * jax.lax.rsqrt(var + eps)) * p["w"] + p["b"]
            ).astype(x.dtype)


def adamos_vocode(params, cfg: ADaMoSConfig, mel):
    """mel: [B, n_mels, T] raw log-mel.  Returns waveform [B, T * 512]
    mono in [-1, 1] (ADaMoSHiFiGANV1.decode:562)."""
    x = mel.transpose(0, 2, 1)                 # [B, T, C]
    bb = params["backbone"]
    x = _conv1(x, bb["stem"], pad=3, pad_mode="edge")
    x = _ln(x, bb["stem_ln"], cfg.eps)
    for i, stage in enumerate(bb["stages"]):
        if i > 0:
            mid = bb["mid"][i - 1]
            x = _ln(x, mid["ln"], cfg.eps)
            x = _conv1(x, mid["conv"])
        for blk in stage:
            h = _conv1(x, blk["dwconv"], pad=cfg.convnext_kernel // 2,
                       groups=x.shape[-1], pad_mode="edge")
            h = _ln(h, blk["norm"], cfg.eps)
            h = (jnp.dot(h, blk["pw1"]["w"].astype(h.dtype))
                 + blk["pw1"]["b"].astype(h.dtype))
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False
                            ).astype(x.dtype)
            h = (jnp.dot(h, blk["pw2"]["w"].astype(h.dtype))
                 + blk["pw2"]["b"].astype(h.dtype))
            x = x + h * blk["gamma"].astype(h.dtype)
    x = _ln(x, bb["norm"], cfg.eps)

    hd = params["head"]
    x = _conv1(x, hd["conv_pre"], pad=cfg.pre_conv_kernel // 2)
    for stage, r, k in zip(hd["ups"], cfg.upsample_rates,
                           cfg.upsample_kernel_sizes):
        x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
        x = _convt1(x, stage["conv"], stride=r, padding=(k - r) // 2)
        acc = None
        for rp, rk, dils in zip(stage["resblocks"],
                                cfg.resblock_kernel_sizes,
                                cfg.resblock_dilations):
            h = x
            for i, d in enumerate(dils):
                y = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
                y = _conv1(y, rp["convs1"][i], dilation=d,
                           pad=(rk - 1) // 2 * d)
                y = jax.nn.silu(y.astype(jnp.float32)).astype(y.dtype)
                y = _conv1(y, rp["convs2"][i], pad=(rk - 1) // 2)
                h = h + y
            acc = h if acc is None else acc + h
        x = acc / len(stage["resblocks"])
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = _conv1(x, hd["conv_post"], pad=cfg.post_conv_kernel // 2)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# checkpoint loaders
# ---------------------------------------------------------------------------

def _wn(sd, name):
    """Resolve weight-norm conv params (weight_g/weight_v or plain)."""
    if f"{name}.weight_g" in sd or f"{name}.parametrizations.weight.original0" in sd:
        gk = (f"{name}.weight_g" if f"{name}.weight_g" in sd
              else f"{name}.parametrizations.weight.original0")
        vk = (f"{name}.weight_v" if f"{name}.weight_v" in sd
              else f"{name}.parametrizations.weight.original1")
        g = np.asarray(sd.pop(gk), np.float32)
        v = np.asarray(sd.pop(vk), np.float32)
        norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
        return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd.pop(f"{name}.weight"), np.float32)


def load_adamos_params(sd: Dict[str, np.ndarray],
                       cfg: ADaMoSConfig = ADaMoSConfig(),
                       dtype=jnp.float32):
    """music_vocoder.py key space: backbone.{channel_layers.N, stages.N.M},
    head.{conv_pre, ups.N, resblocks.N*K+M, conv_post}."""
    sd = dict(sd)

    def c1(name, transpose=False, wnorm=True):
        w = _wn(sd, name) if wnorm else np.asarray(
            sd.pop(f"{name}.weight"), np.float32)
        if transpose:            # ConvTranspose1d [cin, cout, k]
            w = w.transpose(2, 0, 1)[::-1].copy()
        else:                    # Conv1d [cout, cin, k]
            w = w.transpose(2, 1, 0)
        return {"w": jnp.asarray(w).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def ln(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
            sd.pop(f"{name}.weight"), np.float32).T).astype(dtype),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32)).astype(dtype)}

    dims = cfg.dims
    backbone = {
        "stem": c1("backbone.channel_layers.0.0", wnorm=False),
        "stem_ln": ln("backbone.channel_layers.0.1"),
        "mid": [{"ln": ln(f"backbone.channel_layers.{i + 1}.0"),
                 "conv": c1(f"backbone.channel_layers.{i + 1}.1",
                            wnorm=False)}
                for i in range(len(dims) - 1)],
        "stages": [], "norm": ln("backbone.norm"),
    }
    for i in range(len(dims)):
        stage = []
        for j in range(cfg.depths[i]):
            pre = f"backbone.stages.{i}.{j}"
            stage.append({
                "dwconv": c1(f"{pre}.dwconv", wnorm=False),
                "norm": ln(f"{pre}.norm"),
                "pw1": lin(f"{pre}.pwconv1"),
                "pw2": lin(f"{pre}.pwconv2"),
                "gamma": jnp.asarray(np.asarray(sd.pop(f"{pre}.gamma"),
                                                np.float32)),
            })
        backbone["stages"].append(stage)

    nk = len(cfg.resblock_kernel_sizes)
    ups = []
    for i in range(len(cfg.upsample_rates)):
        stage = {"conv": c1(f"head.ups.{i}", transpose=True),
                 "resblocks": []}
        for j in range(nk):
            pre = f"head.resblocks.{i * nk + j}"
            nd = len(cfg.resblock_dilations[j])
            stage["resblocks"].append({
                "convs1": [c1(f"{pre}.convs1.{m}") for m in range(nd)],
                "convs2": [c1(f"{pre}.convs2.{m}") for m in range(nd)]})
        ups.append(stage)
    head = {"conv_pre": c1("head.conv_pre"), "ups": ups,
            "conv_post": c1("head.conv_post")}
    leftover = [k for k in sd if "mel_transform" not in k]
    return {"backbone": backbone, "head": head}, sorted(leftover)
