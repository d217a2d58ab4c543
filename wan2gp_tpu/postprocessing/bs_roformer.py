"""BS-RoFormer vocal/instrumental separation — the model behind the
reference's `audio_separator` dependency (reference
preprocessing/extract_vocals.py:58-66 loads
model_bs_roformer_ep_317_sdr_12.9755 via the external package;
postprocessing/audio_background_removal/audio_processor.py:36 routes
"remove background" through it).

Band-split RoFormer (Lu et al. 2023): stereo STFT (n_fft 2048, hop
512) -> per-band flatten(re, im, channels) -> per-band RMSNorm+Linear
into a shared dim -> alternating TIME-axis and BAND-axis rotary
transformer blocks -> per-band GLU mask MLP -> complex mask on the mix
STFT -> iSTFT vocals; instrumental = mix - vocals.

TPU-native: the two attention axes are pure reshapes around one dense
attention; the whole network is a single jit with static band table.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def default_bands() -> Tuple[int, ...]:
    """freqs_per_bands of the released checkpoint: 62 bands over 1025
    rfft bins."""
    return tuple([2] * 24 + [4] * 12 + [12] * 8 + [24] * 8
                 + [48] * 8 + [128, 129])


@dataclasses.dataclass(frozen=True)
class BSRoformerConfig:
    sample_rate: int = 44100
    n_fft: int = 2048
    hop: int = 512
    channels: int = 2
    dim: int = 384
    depth: int = 12
    heads: int = 8
    ff_mult: int = 4
    bands: Tuple[int, ...] = dataclasses.field(
        default_factory=default_bands)
    eps: float = 1e-6

    @property
    def n_bins(self) -> int:
        return self.n_fft // 2 + 1

    @classmethod
    def tiny(cls):
        return cls(sample_rate=8000, n_fft=64, hop=16, dim=16,
                   depth=2, heads=2, ff_mult=2,
                   bands=(4, 4, 8, 17))


# ---------------------------------------------------------------------------
# stft / istft
# ---------------------------------------------------------------------------

def _hann(n):
    return 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)


def stft(wav, cfg: BSRoformerConfig):
    """wav [B, T, C] -> complex [B, frames, bins, C] (center pad)."""
    n, hop = cfg.n_fft, cfg.hop
    b, t, c = wav.shape
    x = jnp.pad(wav, ((0, 0), (n // 2, n // 2), (0, 0)),
                mode="reflect")
    n_frames = 1 + (x.shape[1] - n) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n)[None]).astype(np.int32)
    frames = x[:, idx] * jnp.asarray(_hann(n), jnp.float32)[None, None,
                                                            :, None]
    return jnp.fft.rfft(frames.transpose(0, 1, 3, 2),
                        axis=-1).transpose(0, 1, 3, 2)


def istft(spec, cfg: BSRoformerConfig, length: int):
    """complex [B, frames, bins, C] -> wav [B, length, C]
    (overlap-add with window-square normalization)."""
    n, hop = cfg.n_fft, cfg.hop
    b, nf, _, c = spec.shape
    frames = jnp.fft.irfft(spec.transpose(0, 1, 3, 2), n=n,
                           axis=-1)                     # [B,F,C,n]
    win = jnp.asarray(_hann(n), jnp.float32)
    frames = frames * win[None, None, None, :]
    total = n + hop * (nf - 1)
    idx = (np.arange(nf)[:, None] * hop + np.arange(n)[None]).reshape(-1)
    out = jnp.zeros((b, c, total), jnp.float32)
    out = out.at[:, :, idx].add(
        frames.transpose(0, 2, 1, 3).reshape(b, c, -1))
    norm = jnp.zeros((total,), jnp.float32)
    norm = norm.at[idx].add(jnp.tile(win * win, nf))
    out = out / jnp.maximum(norm, 1e-8)[None, None]
    out = out[:, :, n // 2:n // 2 + length]
    return out.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# model
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32)
               * 0.02).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


def _rope(x):
    """rotary over the sequence axis of [B, N, H, D]."""
    n, d = x.shape[1], x.shape[-1]
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2) / d))
    ang = jnp.asarray(np.outer(np.arange(n), inv), jnp.float32)
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], -1)
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], -1)
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], -1)
    return (x * cos[None, :, None, :]
            + rot * sin[None, :, None, :]).astype(x.dtype)


def _init_block(key, cfg: BSRoformerConfig, dtype):
    d = cfg.dim
    ks = iter(jax.random.split(key, 6))
    return {
        "attn_norm": jnp.ones((d,), jnp.float32),
        "qkv": _lin(next(ks), d, 3 * d, dtype, bias=False),
        "attn_out": _lin(next(ks), d, d, dtype, bias=False),
        "ff_norm": jnp.ones((d,), jnp.float32),
        "ff1": _lin(next(ks), d, cfg.ff_mult * d, dtype),
        "ff2": _lin(next(ks), cfg.ff_mult * d, d, dtype),
    }


def _block(x, bp, cfg: BSRoformerConfig):
    """One rotary transformer block over axis 1 of [B*, N, dim]."""
    b, n, d = x.shape
    h = cfg.heads
    hd = d // h
    y = _rms(x, bp["attn_norm"], cfg.eps)
    qkv = _dense(y, bp["qkv"]).reshape(b, n, 3, h, hd)
    q = _rope(qkv[:, :, 0])
    k = _rope(qkv[:, :, 1])
    v = qkv[:, :, 2]
    s = jnp.einsum("blhd,bshd->bhls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhls,bshd->blhd", a, v).reshape(b, n, d)
    x = x + _dense(o, bp["attn_out"])
    y = _rms(x, bp["ff_norm"], cfg.eps)
    return x + _dense(jax.nn.gelu(_dense(y, bp["ff1"]),
                                  approximate=False), bp["ff2"])


def init_bs_roformer(key, cfg: BSRoformerConfig, dtype=jnp.float32):
    assert sum(cfg.bands) == cfg.n_bins, (sum(cfg.bands), cfg.n_bins)
    keys = iter(jax.random.split(key, 8))
    split, mask = [], []
    for nb in cfg.bands:
        din = nb * 2 * cfg.channels            # re/im x channels
        k1, k2, k3 = jax.random.split(next(keys), 3)
        split.append({"norm": jnp.ones((din,), jnp.float32),
                      "proj": _lin(k1, din, cfg.dim, dtype)})
        mask.append({"norm": jnp.ones((cfg.dim,), jnp.float32),
                     "mlp1": _lin(k2, cfg.dim, 4 * cfg.dim, dtype),
                     "mlp2": _lin(k3, 4 * cfg.dim, 2 * din, dtype)})
    return {
        "split": split,
        "time_blocks": [_init_block(k, cfg, dtype) for k in
                        jax.random.split(next(keys), cfg.depth)],
        "band_blocks": [_init_block(k, cfg, dtype) for k in
                        jax.random.split(next(keys), cfg.depth)],
        "final_norm": jnp.ones((cfg.dim,), jnp.float32),
        "mask": mask,
    }


def bs_roformer_mask(params, cfg: BSRoformerConfig, spec):
    """complex spec [B, T, bins, C] -> complex vocal mask of the same
    shape."""
    b, t, _, c = spec.shape
    feats = []
    start = 0
    ri = jnp.stack([spec.real, spec.imag], axis=-1)   # [B,T,bins,C,2]
    for nb, sp in zip(cfg.bands, params["split"]):
        band = ri[:, :, start:start + nb].reshape(b, t, -1)
        feats.append(_dense(_rms(band.astype(jnp.float32),
                                 sp["norm"], cfg.eps), sp["proj"]))
        start += nb
    x = jnp.stack(feats, axis=2)                      # [B, T, nb, d]
    n_bands = x.shape[2]
    for tb, bb in zip(params["time_blocks"], params["band_blocks"]):
        # time axis
        xt = x.transpose(0, 2, 1, 3).reshape(b * n_bands, t, cfg.dim)
        xt = _block(xt, tb, cfg)
        x = xt.reshape(b, n_bands, t, cfg.dim).transpose(0, 2, 1, 3)
        # band axis
        xb = x.reshape(b * t, n_bands, cfg.dim)
        xb = _block(xb, bb, cfg)
        x = xb.reshape(b, t, n_bands, cfg.dim)
    x = _rms(x, params["final_norm"], cfg.eps)
    masks = []
    for i, (nb, mp) in enumerate(zip(cfg.bands, params["mask"])):
        h = _rms(x[:, :, i], mp["norm"], cfg.eps)
        h = jnp.tanh(_dense(h, mp["mlp1"]).astype(jnp.float32)
                     ).astype(h.dtype)
        h = _dense(h, mp["mlp2"])                     # [B,T,2*din]
        a, g = jnp.split(h, 2, axis=-1)
        m = a * jax.nn.sigmoid(g.astype(jnp.float32)).astype(a.dtype)
        masks.append(m.reshape(b, t, nb, c, 2))
    m = jnp.concatenate(masks, axis=2)
    return jax.lax.complex(m[..., 0].astype(jnp.float32),
                           m[..., 1].astype(jnp.float32))


def separate_vocals(params, cfg: BSRoformerConfig, wav,
                    chunk_seconds: float = 8.0,
                    overlap: float = 0.25):
    """wav [T] or [T, C] float -> (vocals [T, C], background [T, C]).
    Chunked with triangular cross-fade like the separator package."""
    w = jnp.asarray(wav, jnp.float32)
    if w.ndim == 1:
        w = jnp.stack([w] * cfg.channels, axis=-1)
    if w.shape[-1] != cfg.channels:
        w = jnp.repeat(w[..., :1], cfg.channels, axis=-1)
    t = w.shape[0]
    chunk = max(cfg.hop * 8, int(chunk_seconds * cfg.sample_rate))
    step = max(1, int(chunk * (1.0 - overlap)))
    out = np.zeros((t, cfg.channels), np.float32)
    weight = np.zeros((t, 1), np.float32)
    pos = 0
    while pos < t:
        end = min(pos + chunk, t)
        seg = w[pos:end]
        if seg.shape[0] < cfg.n_fft:
            seg = jnp.pad(seg, ((0, cfg.n_fft - seg.shape[0]), (0, 0)))
        spec = stft(seg[None], cfg)
        mask = bs_roformer_mask(params, cfg, spec)
        voc = istft(spec * mask, cfg, seg.shape[0])[0]
        n = end - pos
        fade = np.minimum(np.arange(1, n + 1),
                          np.arange(n, 0, -1)).astype(np.float32)
        out[pos:end] += np.asarray(voc)[:n] * fade[:, None]
        weight[pos:end] += fade[:, None]
        if end == t:
            break
        pos += step
    vocals = out / np.maximum(weight, 1e-8)
    background = np.asarray(w) - vocals
    return vocals, background


def init_default_separator(key=None, tiny: bool = False):
    """Random-init separator (checkpoint fetch is stubbed in this
    env); returns (params, cfg)."""
    cfg = BSRoformerConfig.tiny() if tiny else BSRoformerConfig()
    params = init_bs_roformer(key if key is not None
                              else jax.random.key(0), cfg)
    return params, cfg
