"""LTX-2 audio VAE (mel-spectrogram VQGAN-style 2D autoencoder) + BigVGAN
vocoder, TPU-native.

Re-implementation of /root/reference/models/ltx2/ltx_core/model/audio_vae/
(audio_vae.py AudioEncoder/AudioDecoder, causal_conv_2d.py, downsample.py,
upsample.py, resnet.py, vocoder.py) per the ltx2_19b_config.json
audio_vae.* block: stereo (2ch) mel spectrograms (64 bins, hop 160 @16 kHz),
ch 128 with ch_mult (1, 2, 4), 2 res blocks/level, pixel_norm, z=8,
causality along the TIME axis; latent frame rate = mel rate / 4.

Layout: channels-last [B, T, M, C] on device (torch reference is NCHW with
H=time, W=mel).  The vocoder reuses the alias-free snake components from
models/minimax/audio_vae.py (BigVGAN family).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..minimax.audio_vae import (conv1d, conv_transpose1d, snake, snake_beta,
                                 alias_free_snake_beta, kaiser_sinc_filter)


@dataclasses.dataclass(frozen=True)
class LTX2AudioVAEConfig:
    in_channels: int = 2          # stereo spectrogram
    out_channels: int = 2
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    z_channels: int = 8
    mel_bins: int = 64
    sample_rate: int = 16000
    hop_length: int = 160
    n_fft: int = 1024
    win_length: int = 1024
    latent_downsample: int = 4    # LATENT_DOWNSAMPLE_FACTOR (audio_vae.py:18)
    causal: bool = True
    eps: float = 1e-8             # PixelNorm eps (normalization.py:22)

    @property
    def mel_compressed(self):
        return self.mel_bins // (2 ** (len(self.ch_mult) - 1))

    @property
    def stats_dim(self):
        # per-channel statistics act on (z x compressed-mel) features
        return self.z_channels * self.mel_compressed

    @property
    def latents_per_second(self):
        return self.sample_rate / self.hop_length / self.latent_downsample


# ---------------------------------------------------------------------------
# primitives ([B, T, M, C])
# ---------------------------------------------------------------------------

def _pixel_norm(x, eps=1e-8):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)).astype(x.dtype)


def conv2d_causal(x, p, stride=(1, 1), causal=True, pad=None):
    """kernel [kt, km, cin, cout]; causal: full front pad on time; mel
    symmetric (causal_conv_2d.py:34-47)."""
    kt, km = p["w"].shape[:2]
    if pad is None:
        if causal:
            pad = [(kt - 1, 0), (km // 2, km - 1 - km // 2)]
        else:
            pad = [((kt - 1) // 2, kt - 1 - (kt - 1) // 2),
                   (km // 2, km - 1 - km // 2)]
    x = jnp.pad(x, [(0, 0), pad[0], pad[1], (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _resblock(p, x, eps):
    h = _pixel_norm(x, eps)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d_causal(h, p["conv1"])
    h = _pixel_norm(h, eps)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = conv2d_causal(h, p["conv2"])
    if "nin_shortcut" in p:
        x = conv2d_causal(x, p["nin_shortcut"])
    return x + h


def _downsample(p, x):
    """stride-2 conv, pad (time front 2, mel right 1) (downsample.py:44)."""
    return conv2d_causal(x, p["conv"], stride=(2, 2),
                         pad=[(2, 0), (0, 1)])


def _upsample(p, x):
    """nearest 2x both axes, causal conv, drop first time row
    (upsample.py:26-56)."""
    b, t, m, c = x.shape
    x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    x = conv2d_causal(x, p["conv"])
    return x[:, 1:]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _c2(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k * k)
    return {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _res_p(key, cin, cout, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 3))
    p = {"conv1": _c2(next(ks), cin, cout, dtype=dtype),
         "conv2": _c2(next(ks), cout, cout, dtype=dtype)}
    if cin != cout:
        p["nin_shortcut"] = _c2(next(ks), cin, cout, k=1, dtype=dtype)
    return p


def init_ltx2_audio_vae(key, cfg: LTX2AudioVAEConfig = LTX2AudioVAEConfig(),
                        dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    nl = len(cfg.ch_mult)

    def levels(down=True):
        out = []
        ch_in = cfg.ch
        mult = cfg.ch_mult if down else None
        if down:
            for lvl in range(nl):
                ch_out = cfg.ch * cfg.ch_mult[lvl]
                blocks = []
                for _ in range(cfg.num_res_blocks):
                    blocks.append(_res_p(next(keys), ch_in, ch_out, dtype))
                    ch_in = ch_out
                level = {"block": blocks}
                if lvl != nl - 1:
                    level["downsample"] = {"conv": _c2(next(keys), ch_in,
                                                       ch_in, dtype=dtype)}
                out.append(level)
            return out, ch_in
        ch_in = cfg.ch * cfg.ch_mult[-1]
        for lvl in reversed(range(nl)):
            ch_out = cfg.ch * cfg.ch_mult[lvl]
            blocks = []
            for _ in range(cfg.num_res_blocks + 1):
                blocks.append(_res_p(next(keys), ch_in, ch_out, dtype))
                ch_in = ch_out
            level = {"block": blocks}
            if lvl != 0:
                level["upsample"] = {"conv": _c2(next(keys), ch_in, ch_in,
                                                 dtype=dtype)}
            out.append(level)
        return out, ch_in

    down, enc_ch = levels(True)
    up, dec_ch = levels(False)
    mid_ch = cfg.ch * cfg.ch_mult[-1]
    return {
        "encoder": {
            "conv_in": _c2(next(keys), cfg.in_channels, cfg.ch, dtype=dtype),
            "down": down,
            "mid": {"block_1": _res_p(next(keys), enc_ch, enc_ch, dtype),
                    "block_2": _res_p(next(keys), enc_ch, enc_ch, dtype)},
            "conv_out": _c2(next(keys), enc_ch, 2 * cfg.z_channels,
                            dtype=dtype),
        },
        "decoder": {
            "conv_in": _c2(next(keys), cfg.z_channels, mid_ch, dtype=dtype),
            "mid": {"block_1": _res_p(next(keys), mid_ch, mid_ch, dtype),
                    "block_2": _res_p(next(keys), mid_ch, mid_ch, dtype)},
            "up": up,
            "conv_out": _c2(next(keys), dec_ch, cfg.out_channels,
                            dtype=dtype),
        },
        "std_of_means": jnp.ones((cfg.stats_dim,), jnp.float32),
        "mean_of_means": jnp.zeros((cfg.stats_dim,), jnp.float32),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def ltx2_audio_encode(params, cfg: LTX2AudioVAEConfig, spectrogram):
    """spectrogram: [B, C=2, T, M].  Returns normalized latents
    [B, z, T', M'] with T' ~ ceil(T/4), M' = M/4."""
    x = spectrogram.transpose(0, 2, 3, 1)
    enc = params["encoder"]
    h = conv2d_causal(x, enc["conv_in"])
    for lvl in enc["down"]:
        for bp in lvl["block"]:
            h = _resblock(bp, h, cfg.eps)
        if "downsample" in lvl:
            h = _downsample(lvl["downsample"], h)
    h = _resblock(enc["mid"]["block_1"], h, cfg.eps)
    h = _resblock(enc["mid"]["block_2"], h, cfg.eps)
    h = _pixel_norm(h, cfg.eps)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = conv2d_causal(h, enc["conv_out"])
    means = h[..., :cfg.z_channels]               # [B, T', M', z]
    b, t, m, z = means.shape
    flat = means.reshape(b, t, m * z)
    flat = (flat - params["mean_of_means"]) / params["std_of_means"]
    means = flat.reshape(b, t, m, z)
    return means.transpose(0, 3, 1, 2)


def ltx2_audio_decode(params, cfg: LTX2AudioVAEConfig, latents):
    """latents: [B, z, T', M'] normalized.  Returns spectrogram
    [B, C, T, M] with T = T'*4 - 3 (causal trim, audio_vae.py:385-390)."""
    z = latents.transpose(0, 2, 3, 1)
    b, t, m, zc = z.shape
    flat = z.reshape(b, t, m * zc)
    flat = flat * params["std_of_means"] + params["mean_of_means"]
    z = flat.reshape(b, t, m, zc)
    dec = params["decoder"]
    h = conv2d_causal(z, dec["conv_in"])
    h = _resblock(dec["mid"]["block_1"], h, cfg.eps)
    h = _resblock(dec["mid"]["block_2"], h, cfg.eps)
    for lvl in dec["up"]:
        for bp in lvl["block"]:
            h = _resblock(bp, h, cfg.eps)
        if "upsample" in lvl:
            h = _upsample(lvl["upsample"], h)
    h = _pixel_norm(h, cfg.eps)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(h.dtype)
    h = conv2d_causal(h, dec["conv_out"])
    target_t = t * cfg.latent_downsample
    if cfg.causal:
        target_t = max(target_t - (cfg.latent_downsample - 1), 1)
    out = h[:, :target_t, :cfg.mel_bins]
    pad_t = target_t - out.shape[1]
    if pad_t > 0:
        out = jnp.pad(out, [(0, 0), (0, pad_t), (0, 0), (0, 0)])
    return out.transpose(0, 3, 1, 2)


# ---------------------------------------------------------------------------
# mel front-end (preprocessing.stft/mel keys in the config)
# ---------------------------------------------------------------------------

def mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=8000.0):
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (librosa default)."""
    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3.0 * f / 200.0
        log_reg = f >= 1000.0
        mel = np.where(log_reg,
                       15.0 + np.log(np.maximum(f, 1e-9) / 1000.0)
                       / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = 200.0 * m / 3.0
        log_reg = m >= 15.0
        f = np.where(log_reg, 1000.0 * np.exp((np.log(6.4) / 27.0)
                                              * (m - 15.0)), f)
        return f

    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz = mel_to_hz(mels)
    bins = np.fft.rfftfreq(n_fft, 1.0 / sr)
    fb = np.zeros((n_mels, len(bins)))
    for i in range(n_mels):
        lo, ctr, hi = hz[i], hz[i + 1], hz[i + 2]
        up = (bins - lo) / max(ctr - lo, 1e-9)
        down = (hi - bins) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        norm = hi - lo
        if norm > 0:
            fb[i] *= 2.0 / norm
    return fb.astype(np.float32)


def log_mel_spectrogram(wave, cfg: LTX2AudioVAEConfig, causal_padding=3):
    """wave: [B, C, N] in [-1, 1] -> log-mel [B, C, frames, mel_bins].

    Causal STFT (stft.causal in the config): front-pad win-hop samples."""
    b, c, n = wave.shape
    hop, win, nfft = cfg.hop_length, cfg.win_length, cfg.n_fft
    window = jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)
    pad_front = (win - hop) if causal_padding else (win // 2)
    x = jnp.pad(wave.reshape(b * c, n), [(0, 0), (pad_front, win)])
    n_frames = 1 + (x.shape[1] - win) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(win)[None, :])
    frames = x[:, idx] * window
    spec = jnp.abs(jnp.fft.rfft(frames, n=nfft, axis=-1))
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, nfft, cfg.mel_bins))
    mel = jnp.einsum("btf,mf->btm", spec, fb)
    logmel = jnp.log(jnp.clip(mel, 1e-5))
    return logmel.reshape(b, c, n_frames, cfg.mel_bins)


# ---------------------------------------------------------------------------
# BigVGAN vocoder (vocoder.py; config vocoder.*: resblock "1",
# upsample_rates (6,5,2,2,2), kernel_sizes (16,15,8,4,4), initial 1024,
# resblock kernels (3,7,11) dilations (1,3,5), stereo)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LTX2VocoderConfig:
    mel_bins: int = 64
    upsample_initial_channel: int = 1024
    upsample_rates: Tuple[int, ...] = (6, 5, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 15, 8, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    stereo: bool = True
    use_tanh_at_final: bool = False

    @property
    def out_channels(self):
        return 2 if self.stereo else 1


def init_ltx2_vocoder(key, cfg: LTX2VocoderConfig = LTX2VocoderConfig(),
                      dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))

    def c1(cin, cout, k):
        s = 1.0 / math.sqrt(cin * k)
        return {"w": jax.random.uniform(next(keys), (k, cin, cout),
                                        jnp.float32, -s, s).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    ups = []
    ch = cfg.upsample_initial_channel
    for r, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        ups.append({"conv": c1(ch, ch // 2, k)})
        ch //= 2
        res = []
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilations):
            convs1 = [c1(ch, ch, rk) for _ in dils]
            convs2 = [c1(ch, ch, rk) for _ in dils]
            res.append({
                "convs1": convs1, "convs2": convs2,
                "alpha1": [jnp.zeros((ch,), jnp.float32) for _ in dils],
                "beta1": [jnp.zeros((ch,), jnp.float32) for _ in dils],
                "alpha2": [jnp.zeros((ch,), jnp.float32) for _ in dils],
                "beta2": [jnp.zeros((ch,), jnp.float32) for _ in dils],
            })
        ups[-1]["resblocks"] = res
    return {
        "conv_pre": c1(cfg.mel_bins, cfg.upsample_initial_channel, 7),
        "ups": ups,
        "alpha_post": jnp.zeros((ch,), jnp.float32),
        "beta_post": jnp.zeros((ch,), jnp.float32),
        "conv_post": c1(ch, cfg.out_channels, 7),
    }


def _amp_resblock(p, x, kernel, dilations):
    """BigVGAN AMPBlock1: (snake-beta -> dilated conv -> snake-beta ->
    conv) x len(dilations), residual each."""
    for i, d in enumerate(dilations):
        h = alias_free_snake_beta(x, p["alpha1"][i], p["beta1"][i])
        k = p["convs1"][i]["w"].shape[0]
        h = conv1d(h, p["convs1"][i]["w"], p["convs1"][i]["b"],
                   dilation=d, padding=(k - 1) // 2 * d)
        h = alias_free_snake_beta(h, p["alpha2"][i], p["beta2"][i])
        k = p["convs2"][i]["w"].shape[0]
        h = conv1d(h, p["convs2"][i]["w"], p["convs2"][i]["b"],
                   padding=(k - 1) // 2)
        x = x + h
    return x


def ltx2_vocoder(params, cfg: LTX2VocoderConfig, mel):
    """mel: [B, mel_bins, T] log-mel.  Returns waveform
    [B, out_channels, T * prod(upsample_rates)]."""
    x = mel.transpose(0, 2, 1)                     # [B, T, C]
    x = conv1d(x, params["conv_pre"]["w"], params["conv_pre"]["b"],
               padding=3)
    for stage, r in zip(params["ups"], cfg.upsample_rates):
        k = stage["conv"]["w"].shape[0]
        x = conv_transpose1d(x, stage["conv"]["w"], stage["conv"]["b"],
                             stride=r, padding=(k - r) // 2)
        acc = None
        for rp, rk, dils in zip(stage["resblocks"],
                                cfg.resblock_kernel_sizes,
                                cfg.resblock_dilations):
            y = _amp_resblock(rp, x, rk, dils)
            acc = y if acc is None else acc + y
        x = acc / len(stage["resblocks"])
    x = alias_free_snake_beta(x, params["alpha_post"], params["beta_post"])
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"],
               padding=3)
    if cfg.use_tanh_at_final:
        x = jnp.tanh(x)
    else:
        x = jnp.clip(x, -1.0, 1.0)
    return x.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------

def _t_c2(w):
    """torch Conv2d [Cout, Cin, kh, kw] -> [kh, kw, Cin, Cout]."""
    return jnp.asarray(np.asarray(w, np.float32).transpose(2, 3, 1, 0))


def _t_c1(w):
    """torch Conv1d [Cout, Cin, k] -> [k, Cin, Cout]."""
    return jnp.asarray(np.asarray(w, np.float32).transpose(2, 1, 0))


def _t_ct1(w):
    """torch ConvTranspose1d [Cin, Cout, k] -> flipped [k, Cin, Cout]
    for the lhs-dilated conv in conv_transpose1d."""
    return jnp.asarray(
        np.asarray(w, np.float32).transpose(2, 0, 1)[::-1].copy())


def load_ltx2_audio_vae_params(sd, cfg: LTX2AudioVAEConfig,
                               dtype=jnp.float32):
    """Map the reference AudioEncoder/AudioDecoder state dict
    (ltx_core/model/audio_vae/audio_vae.py; VQGAN-style keys
    encoder.down.N / decoder.up.LEVEL with up inserted at the front,
    upsample.py:104) onto the init_ltx2_audio_vae tree."""
    sd = dict(sd)
    for pre in ("audio_vae.", "vae."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}

    def c2(name):
        return {"w": _t_c2(sd.pop(f"{name}.weight")).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def res(name):
        p = {"conv1": c2(f"{name}.conv1"), "conv2": c2(f"{name}.conv2")}
        if f"{name}.nin_shortcut.weight" in sd:
            p["nin_shortcut"] = c2(f"{name}.nin_shortcut")
        return p

    nl = len(cfg.ch_mult)
    down = []
    for lvl in range(nl):
        level = {"block": [res(f"encoder.down.{lvl}.block.{j}")
                           for j in range(cfg.num_res_blocks)]}
        if f"encoder.down.{lvl}.downsample.conv.weight" in sd:
            level["downsample"] = {
                "conv": c2(f"encoder.down.{lvl}.downsample.conv")}
        down.append(level)
    up = []
    for i, lvl in enumerate(reversed(range(nl))):
        level = {"block": [res(f"decoder.up.{lvl}.block.{j}")
                           for j in range(cfg.num_res_blocks + 1)]}
        if f"decoder.up.{lvl}.upsample.conv.weight" in sd:
            level["upsample"] = {
                "conv": c2(f"decoder.up.{lvl}.upsample.conv")}
        up.append(level)

    def stats(which):
        for k in (f"per_channel_statistics.{which}-of-means",
                  f"encoder.per_channel_statistics.{which}-of-means",
                  f"decoder.per_channel_statistics.{which}-of-means",
                  f"{which}-of-means", f"{which}_of_means"):
            if k in sd:
                v = jnp.asarray(np.asarray(sd.pop(k), np.float32))
                # drop duplicates under the other prefix
                for k2 in list(sd):
                    if k2.endswith(f"{which}-of-means"):
                        sd.pop(k2)
                return v
        return (jnp.ones if which == "std" else jnp.zeros)(
            (cfg.stats_dim,), jnp.float32)

    return {
        "encoder": {
            "conv_in": c2("encoder.conv_in"),
            "down": down,
            "mid": {"block_1": res("encoder.mid.block_1"),
                    "block_2": res("encoder.mid.block_2")},
            "conv_out": c2("encoder.conv_out"),
        },
        "decoder": {
            "conv_in": c2("decoder.conv_in"),
            "mid": {"block_1": res("decoder.mid.block_1"),
                    "block_2": res("decoder.mid.block_2")},
            "up": up,
            "conv_out": c2("decoder.conv_out"),
        },
        "std_of_means": stats("std"),
        "mean_of_means": stats("mean"),
    }


def load_ltx2_vocoder_params(sd, cfg: LTX2VocoderConfig,
                             dtype=jnp.float32):
    """Map the reference Vocoder state dict (vocoder.py: conv_pre, ups.N
    ConvTranspose1d, resblocks.{N*K+M} AMPBlock1 with convs1/convs2 +
    acts1/acts2 Activation1d(SnakeBeta), act_post, conv_post) onto the
    init_ltx2_vocoder tree."""
    sd = dict(sd)
    for pre in ("vocoder.", "generator."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}

    def c1(name, transpose=False):
        conv = _t_ct1 if transpose else _t_c1
        return {"w": conv(sd.pop(f"{name}.weight")).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32))

    nk = len(cfg.resblock_kernel_sizes)
    ups = []
    for i in range(len(cfg.upsample_rates)):
        stage = {"conv": c1(f"ups.{i}", transpose=True), "resblocks": []}
        for j in range(nk):
            r = f"resblocks.{i * nk + j}"
            nd = len(cfg.resblock_dilations[j])
            stage["resblocks"].append({
                "convs1": [c1(f"{r}.convs1.{m}") for m in range(nd)],
                "convs2": [c1(f"{r}.convs2.{m}") for m in range(nd)],
                "alpha1": [vec(f"{r}.acts1.{m}.act.alpha")
                           for m in range(nd)],
                "beta1": [vec(f"{r}.acts1.{m}.act.beta")
                          for m in range(nd)],
                "alpha2": [vec(f"{r}.acts2.{m}.act.alpha")
                           for m in range(nd)],
                "beta2": [vec(f"{r}.acts2.{m}.act.beta")
                          for m in range(nd)],
            })
        ups.append(stage)
    return {
        "conv_pre": c1("conv_pre"),
        "ups": ups,
        "alpha_post": vec("act_post.act.alpha"),
        "beta_post": vec("act_post.act.beta"),
        "conv_post": c1("conv_post"),
    }
