"""Seed-VC — zero-shot voice conversion (speech mode v1).

TPU-native re-implementation of /root/reference/postprocessing/seedvc/
(speech preset configs/presets/config_dit_mel_seed_uvit_whisper_small_
wavenet.yml + seed_vc_wrapper.py convert_voice:316-460):

* content: Whisper-small encoder states of the 16 kHz source/reference
  (768-d at 50 Hz; encoder re-expressed here as log-mel conv subsample
  + pre-LN transformer, modules equivalent of
  transformers.WhisperModel.encoder);
* style: CAMPPlus x-vector (192-d) of the reference kaldi-fbank —
  reuses models/tts/s3gen.py campplus;
* length regulator (modules/length_regulator.py:27-160): linear 768->
  512, nearest-interpolate to the target mel length (length_adjust),
  4x [conv3-GroupNorm-Mish] + 1x1 conv;
* CFM estimator (modules/diffusion_transformer.py DiT + flow_matching
  .py solve_euler): hidden 512, 13 non-causal llama-style blocks with
  adaptive-RMS timestep conditioning and u-vit skip connections, input
  merge [x, prompt_x, content, style] -> 512, long skip connection,
  WaveNet final head (gated dilated convs conditioned on t) + adaLN
  final layer; Euler ODE with dual-batch CFG (rate 0.7) and the prompt
  mel region pinned to the reference;
* vocoder: BigVGAN v2 22 kHz 80-band 256x — reuses
  postprocessing/mmaudio_vae.py bigvgan with 22.05 kHz rates.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.chatterbox import mel_filterbank, stft_mag
from ..models.tts.s3gen import (S3GenConfig, init_campplus,
                                campplus_embed)
from .mmaudio_vae import BigVGANConfig, bigvgan_vocode


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class WhisperEncConfig:
    # openai/whisper-small encoder
    n_mels: int = 80
    d_model: int = 768
    heads: int = 12
    layers: int = 12
    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160

    @classmethod
    def tiny(cls):
        return cls(n_mels=16, d_model=32, heads=4, layers=2, n_fft=64,
                   hop=32)


@dataclasses.dataclass(frozen=True)
class SeedVCConfig:
    sample_rate: int = 22050
    n_fft: int = 1024
    win: int = 1024
    hop: int = 256
    n_mels: int = 80
    # length regulator
    lr_channels: int = 512
    content_dim: int = 768      # whisper-small hidden
    # DiT estimator
    hidden: int = 512
    depth: int = 13
    heads: int = 8
    style_dim: int = 192
    # wavenet head
    wn_hidden: int = 512
    wn_layers: int = 8
    wn_kernel: int = 5
    norm_eps: float = 1e-5
    default_steps: int = 25
    default_cfg_rate: float = 0.7
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        return cls(n_mels=16, lr_channels=24, content_dim=32, hidden=32,
                   depth=3, heads=4, style_dim=16, wn_hidden=24,
                   wn_layers=2, wn_kernel=3, n_fft=256, win=256,
                   hop=64, default_steps=2)


def _lin(key, din, dout, dtype, bias=True, std=0.02):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32) * std
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _conv1d(x, p, stride=1, dilation=1, groups=1, padding="SAME"):
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups) + p["b"]


def _init_conv1d(key, k, cin, cout, dtype, std=0.05):
    return {"w": (jax.random.normal(key, (k, cin, cout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


# ---------------------------------------------------------------------------
# mel front-ends
# ---------------------------------------------------------------------------

def seedvc_mel(wav, cfg: SeedVCConfig):
    """22.05 kHz wav [B, L] -> log-mel [B, T, n_mels] (center=False,
    log-clamped as modules/audio.py mel_spectrogram)."""
    pad = (cfg.n_fft - cfg.hop) // 2
    wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    mag = stft_mag(wav, cfg.n_fft, cfg.hop, cfg.win, center=False)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft,
                                    cfg.n_mels))
    mel = jnp.einsum("btn,mn->btm", mag, fb)
    return jnp.log(jnp.maximum(mel, 1e-5))


def whisper_mel(wav, cfg: WhisperEncConfig):
    """Whisper log10-mel features [B, T, n_mels] ((x+4)/4 normalized)."""
    mag = stft_mag(wav, cfg.n_fft, cfg.hop, cfg.n_fft, center=True,
                   power=2.0)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft,
                                    cfg.n_mels))
    mel = jnp.einsum("btn,mn->btm", mag, fb)
    log = jnp.log10(jnp.maximum(mel, 1e-10))
    log = jnp.maximum(log, log.max() - 8.0)
    return (log + 4.0) / 4.0


# ---------------------------------------------------------------------------
# whisper encoder
# ---------------------------------------------------------------------------

def init_whisper_encoder(key, cfg: WhisperEncConfig, dtype=jnp.float32):
    d = cfg.d_model
    keys = iter(jax.random.split(key, cfg.layers * 8 + 8))
    ln = lambda: {"scale": jnp.ones((d,), dtype),
                  "bias": jnp.zeros((d,), dtype)}
    layers = []
    for _ in range(cfg.layers):
        layers.append({"ln1": ln(),
                       "q": _lin(next(keys), d, d, dtype),
                       "k": _lin(next(keys), d, d, dtype, bias=False),
                       "v": _lin(next(keys), d, d, dtype),
                       "o": _lin(next(keys), d, d, dtype),
                       "ln2": ln(),
                       "fc1": _lin(next(keys), d, 4 * d, dtype),
                       "fc2": _lin(next(keys), 4 * d, d, dtype)})
    return {"conv1": _init_conv1d(next(keys), 3, cfg.n_mels, d, dtype),
            "conv2": _init_conv1d(next(keys), 3, d, d, dtype),
            "layers": layers, "ln_post": ln()}


def _ln_f(x, p, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def whisper_encode(params, cfg: WhisperEncConfig, wav16):
    """wav [B, L] 16 kHz -> encoder states [B, L/320, d] (whisper conv
    stack halves the 100 Hz mel rate to 50 Hz)."""
    mel = whisper_mel(wav16, cfg)
    x = jax.nn.gelu(_conv1d(mel, params["conv1"]), approximate=True)
    x = jax.nn.gelu(_conv1d(x, params["conv2"], stride=2),
                    approximate=True)
    t, d = x.shape[1], cfg.d_model
    # sinusoidal positions (whisper convention)
    half = d // 2
    freqs = np.exp(-np.log(10000.0) * np.arange(half) / (half - 1))
    ang = np.arange(t)[:, None] * freqs[None]
    pos = np.concatenate([np.sin(ang), np.cos(ang)], axis=1)
    x = x + jnp.asarray(pos, x.dtype)
    heads = cfg.heads
    hd = d // heads
    for lp in params["layers"]:
        h = _ln_f(x, lp["ln1"])
        q = _dense(h, lp["q"]).reshape(*h.shape[:2], heads, hd)
        k = _dense(h, lp["k"]).reshape(*h.shape[:2], heads, hd)
        v = _dense(h, lp["v"]).reshape(*h.shape[:2], heads, hd)
        w = jax.nn.softmax(
            jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(x.dtype)
        o = jnp.einsum("bhls,bshd->blhd", w, v).reshape(h.shape)
        x = x + _dense(o, lp["o"])
        h = _ln_f(x, lp["ln2"])
        x = x + _dense(jax.nn.gelu(_dense(h, lp["fc1"]),
                                   approximate=True), lp["fc2"])
    return _ln_f(x, params["ln_post"])


# ---------------------------------------------------------------------------
# length regulator
# ---------------------------------------------------------------------------

def init_length_regulator(key, cfg: SeedVCConfig, dtype=jnp.float32):
    c = cfg.lr_channels
    keys = iter(jax.random.split(key, 8))
    return {"in_proj": _lin(next(keys), cfg.content_dim, c, dtype),
            "convs": [{"conv": _init_conv1d(next(keys), 3, c, c, dtype),
                       "gn": {"scale": jnp.ones((c,), dtype),
                              "bias": jnp.zeros((c,), dtype)}}
                      for _ in range(4)],
            "out": _init_conv1d(next(keys), 1, c, c, dtype)}


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def length_regulate(params, cfg: SeedVCConfig, content, ylen: int):
    """content [B, T, content_dim] -> [B, ylen, lr_channels]
    (length_regulator.py:90-160, nearest interpolation)."""
    x = _dense(content, params["in_proj"])
    idx = (jnp.arange(ylen) * x.shape[1] / ylen).astype(jnp.int32)
    x = x[:, idx]
    for st in params["convs"]:
        y = _conv1d(x, st["conv"])
        m = jnp.mean(y, axis=(1, 2), keepdims=True)
        v = jnp.var(y, axis=(1, 2), keepdims=True)
        y = (y - m) * jax.lax.rsqrt(v + 1e-5) * st["gn"]["scale"] \
            + st["gn"]["bias"]
        x = _mish(y)
    return _conv1d(x, params["out"])


# ---------------------------------------------------------------------------
# CFM estimator
# ---------------------------------------------------------------------------

def init_seedvc_dit(key, cfg: SeedVCConfig, dtype=jnp.float32):
    d = cfg.hidden
    mel = cfg.n_mels
    keys = iter(jax.random.split(key, cfg.depth * 12 + 32))

    def ada_rms():
        return {"proj": _lin(next(keys), d, 2 * d, dtype),
                "g": jnp.ones((d,), jnp.float32)}

    layers = []
    for _ in range(cfg.depth):
        layers.append({
            "attn_norm": ada_rms(),
            "q": _lin(next(keys), d, d, dtype, bias=False),
            "k": _lin(next(keys), d, d, dtype, bias=False),
            "v": _lin(next(keys), d, d, dtype, bias=False),
            "o": _lin(next(keys), d, d, dtype, bias=False),
            "ffn_norm": ada_rms(),
            "w1": _lin(next(keys), d, 4 * d, dtype, bias=False),
            "w3": _lin(next(keys), d, 4 * d, dtype, bias=False),
            "w2": _lin(next(keys), 4 * d, d, dtype, bias=False),
            "skip_in": _lin(next(keys), 2 * d, d, dtype)})

    wn = []
    for i in range(cfg.wn_layers):
        wn.append({"in": _init_conv1d(next(keys), cfg.wn_kernel,
                                      cfg.wn_hidden, 2 * cfg.wn_hidden,
                                      dtype),
                   "g": _lin(next(keys), cfg.wn_hidden,
                             2 * cfg.wn_hidden, dtype),
                   "rs": _init_conv1d(
                       next(keys), 1, cfg.wn_hidden,
                       (2 if i < cfg.wn_layers - 1 else 1)
                       * cfg.wn_hidden, dtype)})
    return {
        "t_embed": {"fc1": _lin(next(keys), 256, d, dtype),
                    "fc2": _lin(next(keys), d, d, dtype)},
        "t_embed2": {"fc1": _lin(next(keys), 256, cfg.wn_hidden, dtype),
                     "fc2": _lin(next(keys), cfg.wn_hidden,
                                 cfg.wn_hidden, dtype)},
        "merge": _lin(next(keys),
                      2 * mel + cfg.lr_channels + cfg.style_dim,
                      d, dtype),
        "layers": layers,
        "final_norm": ada_rms(),
        "long_skip": _lin(next(keys), d + mel, d, dtype),
        "wn_in": _lin(next(keys), d, cfg.wn_hidden, dtype),
        "wn": wn,
        "wn_res": _lin(next(keys), d, cfg.wn_hidden, dtype),
        "final_ada": _lin(next(keys), d, 2 * cfg.wn_hidden, dtype),
        "final_ln": {"scale": jnp.ones((cfg.wn_hidden,), dtype),
                     "bias": jnp.zeros((cfg.wn_hidden,), dtype)},
        "final_proj": _lin(next(keys), cfg.wn_hidden, cfg.wn_hidden,
                           dtype),
        "out_conv": _init_conv1d(next(keys), 1, cfg.wn_hidden, mel,
                                 dtype)}


def _t_embed(p, t, dim=256):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = (t * 1000.0)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)
    return _dense(jax.nn.silu(_dense(emb, p["fc1"])), p["fc2"])


def _ada_rms(x, p, c, eps):
    wb = _dense(c, p["proj"])
    w, b = jnp.split(wb, 2, axis=-1)
    return w[:, None] * _rms(x, p["g"], eps) + b[:, None]


def _rope_pairs(t, hd):
    inv = 1.0 / (10000.0 ** (np.arange(0, hd, 2, dtype=np.float32)
                             / hd))
    ang = np.outer(np.arange(t, dtype=np.float32), inv)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_rope_pairs(x, cos, sin):
    x0, x1 = x[..., 0::2], x[..., 1::2]
    c = cos[None, :, None]
    s = sin[None, :, None]
    return jnp.stack([x0 * c - x1 * s, x1 * c + x0 * s],
                     axis=-1).reshape(x.shape)


def seedvc_estimator(params, cfg: SeedVCConfig, x, prompt_x, t, style,
                     content):
    """x/prompt_x [B, T, mel]; t [B]; style [B, 192]; content
    [B, T, lr_channels] -> velocity [B, T, mel]
    (diffusion_transformer.py:486-536)."""
    b, tlen, mel = x.shape
    d, heads = cfg.hidden, cfg.heads
    hd = d // heads
    t1 = _t_embed(params["t_embed"], t)
    x_in = jnp.concatenate(
        [x, prompt_x, content,
         jnp.broadcast_to(style[:, None], (b, tlen, style.shape[-1]))],
        axis=-1)
    h = _dense(x_in, params["merge"])

    cos, sin = _rope_pairs(tlen, hd)
    n_l = len(params["layers"])
    skips = []
    for i, lp in enumerate(params["layers"]):
        if i > n_l // 2 and skips:
            h = _dense(jnp.concatenate([h, skips.pop()], axis=-1),
                       lp["skip_in"])
        a = _ada_rms(h, lp["attn_norm"], t1, cfg.norm_eps)
        q = _dense(a, lp["q"]).reshape(b, tlen, heads, hd)
        k = _dense(a, lp["k"]).reshape(b, tlen, heads, hd)
        v = _dense(a, lp["v"]).reshape(b, tlen, heads, hd)
        q = _apply_rope_pairs(q, cos, sin)
        k = _apply_rope_pairs(k, cos, sin)
        w = jax.nn.softmax(
            jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
            / math.sqrt(hd), axis=-1).astype(h.dtype)
        o = jnp.einsum("bhls,bshd->blhd", w, v).reshape(b, tlen, d)
        h = h + _dense(o, lp["o"])
        f = _ada_rms(h, lp["ffn_norm"], t1, cfg.norm_eps)
        h = h + _dense(jax.nn.silu(_dense(f, lp["w1"]))
                       * _dense(f, lp["w3"]), lp["w2"])
        if i < n_l // 2:
            skips.append(h)
    h = _ada_rms(h, params["final_norm"], t1, cfg.norm_eps)
    h = _dense(jnp.concatenate([h, x], axis=-1), params["long_skip"])

    # wavenet head (wavenet.py WN gated convs, g = t2)
    t2 = _t_embed(params["t_embed2"], t)
    wx = _dense(h, params["wn_in"])
    out_acc = jnp.zeros_like(wx[..., :cfg.wn_hidden])
    for i, wl in enumerate(params["wn"]):
        z = _conv1d(wx, wl["in"]) + _dense(t2, wl["g"])[:, None]
        za, zb = jnp.split(z, 2, axis=-1)
        act = jnp.tanh(za) * jax.nn.sigmoid(zb)
        rs = _conv1d(act, wl["rs"])
        if i < cfg.wn_layers - 1:
            res, skip = jnp.split(rs, 2, axis=-1)
            wx = wx + res
            out_acc = out_acc + skip
        else:
            out_acc = out_acc + rs
    wn_out = out_acc + _dense(h, params["wn_res"])
    # final adaLN (FinalLayer) + projection
    wb = _dense(jax.nn.silu(t1), params["final_ada"])
    w, bsh = jnp.split(wb, 2, axis=-1)
    f = _ln_f(wn_out, params["final_ln"])
    f = f * (1 + w[:, None]) + bsh[:, None]
    f = _dense(f, params["final_proj"])
    return _conv1d(f, params["out_conv"])


def cfm_convert(params, cfg: SeedVCConfig, cond, prompt_mel, style,
                steps: int, cfg_rate: float, key):
    """flow_matching.py solve_euler: generate mel for [prompt; source]
    with the prompt region pinned; returns the source part only."""
    b = cond.shape[0]
    tlen = cond.shape[1]
    p_len = prompt_mel.shape[1]
    mel = cfg.n_mels
    x = jax.random.normal(key, (b, tlen, mel), jnp.float32)
    prompt_x = jnp.zeros((b, tlen, mel), jnp.float32)
    prompt_x = prompt_x.at[:, :p_len].set(prompt_mel)
    x = x.at[:, :p_len].set(0.0)
    ts = jnp.linspace(0.0, 1.0, steps + 1)

    def step(x, i):
        dt = ts[i + 1] - ts[i]
        tt = jnp.full((2 * b,), ts[i], jnp.float32)
        xx = jnp.concatenate([x, x], axis=0)
        pp = jnp.concatenate([prompt_x, jnp.zeros_like(prompt_x)],
                             axis=0)
        ss = jnp.concatenate([style, jnp.zeros_like(style)], axis=0)
        cc = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        v = seedvc_estimator(params, cfg, xx, pp, tt, ss, cc)
        v = (1.0 + cfg_rate) * v[:b] - cfg_rate * v[b:]
        x = x + dt * v
        return x.at[:, :p_len].set(0.0), None

    x, _ = jax.lax.scan(step, x, jnp.arange(steps))
    return x[:, p_len:]


# ---------------------------------------------------------------------------
# converter
# ---------------------------------------------------------------------------

def init_seedvc(key, cfg: SeedVCConfig = SeedVCConfig(),
                wcfg: WhisperEncConfig = WhisperEncConfig(),
                dtype=jnp.float32):
    keys = jax.random.split(key, 5)
    cam_cfg = S3GenConfig(mel_dim=80, spk_dim=cfg.style_dim,
                          cam_channels=32, cam_growth=32, cam_init=128,
                          cam_layers=(12, 24, 16),
                          cam_dilations=(1, 2, 2)) \
        if cfg.style_dim >= 192 else S3GenConfig.tiny()
    voc_cfg = (BigVGANConfig(sample_rate=cfg.sample_rate,
                             num_mels=cfg.n_mels)
               if cfg.n_mels >= 80 else
               BigVGANConfig(num_mels=cfg.n_mels,
                             upsample_initial_channel=32,
                             upsample_rates=(4, 4, 4),
                             upsample_kernel_sizes=(8, 8, 8),
                             resblock_kernel_sizes=(3,),
                             resblock_dilation_sizes=((1, 3, 5),),
                             sample_rate=cfg.sample_rate))
    from .mmaudio_vae import init_bigvgan_vocoder
    return {"whisper": init_whisper_encoder(keys[0], wcfg, dtype),
            "regulator": init_length_regulator(keys[1], cfg, dtype),
            "dit": init_seedvc_dit(keys[2], cfg, dtype),
            "campplus": init_campplus(keys[3], cam_cfg, dtype),
            "vocoder": init_bigvgan_vocoder(keys[4], voc_cfg, dtype),
            "_cam_cfg": cam_cfg, "_voc_cfg": voc_cfg}


class SeedVCConverter:
    """convert_voice (seed_vc_wrapper.py:316-460) on one chunk."""

    def __init__(self, params, cfg: SeedVCConfig = SeedVCConfig(),
                 wcfg: WhisperEncConfig = WhisperEncConfig()):
        self.params = params
        self.cfg = cfg
        self.wcfg = wcfg

    @staticmethod
    def _resample(wav, sr_from, sr_to):
        if sr_from == sr_to:
            return wav
        n = int(round(wav.shape[-1] * sr_to / sr_from))
        xi = np.linspace(0, wav.shape[-1] - 1, n)
        return np.interp(xi, np.arange(wav.shape[-1]), wav).astype(
            np.float32)

    def convert(self, source_wav: np.ndarray, source_sr: int,
                target_wav: np.ndarray, target_sr: int,
                diffusion_steps: Optional[int] = None,
                length_adjust: float = 1.0,
                inference_cfg_rate: Optional[float] = None,
                seed: int = 0):
        """source/target: mono float waveforms.  Returns (wav 22.05 kHz
        float32, sample_rate)."""
        cfg, wcfg = self.cfg, self.wcfg
        steps = diffusion_steps or cfg.default_steps
        cfg_rate = (cfg.default_cfg_rate if inference_cfg_rate is None
                    else inference_cfg_rate)
        src = self._resample(np.asarray(source_wav, np.float32),
                             source_sr, cfg.sample_rate)
        ref = self._resample(np.asarray(target_wav, np.float32),
                             target_sr, cfg.sample_rate)
        ref = ref[:cfg.sample_rate * 25]
        src16 = self._resample(src, cfg.sample_rate, wcfg.sample_rate)
        ref16 = self._resample(ref, cfg.sample_rate, wcfg.sample_rate)

        s_alt = whisper_encode(self.params["whisper"], wcfg,
                               jnp.asarray(src16)[None])
        s_ori = whisper_encode(self.params["whisper"], wcfg,
                               jnp.asarray(ref16)[None])
        mel_src = seedvc_mel(jnp.asarray(src)[None], cfg)
        mel_ref = seedvc_mel(jnp.asarray(ref)[None], cfg)

        # style from reference fbank (kaldi 80-mel approximated by the
        # same slaney filterbank at 16 kHz)
        cam_cfg = self.params["_cam_cfg"]
        fb = whisper_mel(jnp.asarray(ref16)[None],
                         dataclasses.replace(wcfg,
                                             n_mels=cam_cfg.mel_dim))
        fb = fb - jnp.mean(fb, axis=1, keepdims=True)
        style = campplus_embed(self.params["campplus"], cam_cfg, fb)

        tgt_len = int(mel_src.shape[1] * length_adjust)
        cond = length_regulate(self.params["regulator"], cfg, s_alt,
                               tgt_len)
        prompt_cond = length_regulate(self.params["regulator"], cfg,
                                      s_ori, mel_ref.shape[1])
        cat_cond = jnp.concatenate([prompt_cond, cond], axis=1)
        vc_mel = cfm_convert(self.params["dit"], cfg, cat_cond, mel_ref,
                             style, steps, cfg_rate,
                             jax.random.key(seed))
        wave = bigvgan_vocode(self.params["vocoder"],
                              self.params["_voc_cfg"], vc_mel)
        return np.asarray(wave[0]), cfg.sample_rate
