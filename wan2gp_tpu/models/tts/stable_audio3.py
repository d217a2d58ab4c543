"""Stable Audio 3 — text-to-audio / audio-edit latent diffusion.

TPU-native re-design of /root/reference/models/TTS/stable_audio3/
(models/dit.py DiffusionTransformer + models/transformer.py
ContinuousTransformer + models/autoencoders.py SAMEEncoder/Decoder +
inference/sampling.py + inference/distribution_shift.py):

* DiT (small config configs/stable_audio3_small_config.json): latent
  io 256, embed 1024, 20 blocks, 16 heads, RMS norms + per-head q/k RMS,
  partial rotary (dim 32), 64 learned memory tokens, T5Gemma cross
  attention every block, adaLN global conditioning combining the expo-
  Fourier timestep embedding with the seconds_total embedding through a
  shared (Linear-SiLU-Linear -> 6*dim) embedder plus a per-block
  scale/shift/gate parameter; gates are sigmoid(1 - g)
  (transformer.py:928-951).  The 20 homogeneous blocks are ONE
  `lax.scan` over stacked params;
* local additive conditioning (dim 257 = inpaint mask + masked latent)
  through per-block zero-init MLPs (transformer.py:852-866);
* rf_denoiser objective with denoised-space CFG + APG projection and
  optional rescale (dit.py:479-625);
* samplers: pingpong (denoise + renoise, sampling.py:320-366) and Euler,
  on a seq-len shifted schedule (distribution_shift.py DistributionShift
  base 0.5 -> max 1.15 over 256..4096 tokens);
* TAAE v2 autoencoder (SAME): 256-sample patching of 44.1 kHz stereo ->
  one transformer resampling stage (512 -> 768 ch, stride 16, 6 DyT/
  differential-attention blocks over 34-token chunks with midpoint
  shift), learned per-segment "new tokens" become the latents; the
  decoder mirrors with 16 new tokens per latent
  (autoencoders.py:34-348).  Total downsampling 4096 samples/latent.

Text conditioning uses the repo's shared T5Gemma encoder via a hook
(`text_encode_fn([str]) -> [B, L, 768]`); this module stays
checkpoint-free.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SA3DiTConfig:
    io_channels: int = 256
    embed: int = 1024
    depth: int = 20
    heads: int = 16
    differential: bool = False     # medium config attn_kwargs
    cond_token_dim: int = 768      # T5Gemma-b hidden
    global_cond_dim: int = 768
    local_add_dim: int = 257       # inpaint mask + masked latent
    memory_tokens: int = 64
    rotary_dim: int = 32           # max(head_dim//2, 32)
    ff_mult: float = 4.0
    t_features: int = 256
    norm_eps: float = 1e-6
    sample_rate: int = 44100
    downsampling: int = 4096       # patch 256 * stride 16
    # schedule shift (config distribution_shift_options type "full")
    shift_min_len: int = 256
    shift_max_len: int = 4096

    @property
    def head_dim(self) -> int:
        return self.embed // self.heads

    @classmethod
    def medium(cls):
        """configs/stable_audio3_medium_config.json: embed 1536,
        depth 24, heads 24, differential self-attention."""
        return cls(embed=1536, depth=24, heads=24, differential=True)

    @classmethod
    def tiny(cls, differential: bool = False):
        return cls(io_channels=8, embed=32, depth=3, heads=4,
                   cond_token_dim=12, global_cond_dim=12,
                   local_add_dim=9, memory_tokens=4, rotary_dim=4,
                   t_features=16, downsampling=32, sample_rate=4096,
                   differential=differential)


@dataclasses.dataclass(frozen=True)
class TAAEConfig:
    """configs/...json pretransform: patched(256) + taae_v2 stride 16."""
    audio_channels: int = 2
    patch: int = 256
    channels: int = 768            # c_mult 6 * 128
    latent_dim: int = 256
    stride: int = 16
    depth: int = 6
    chunk: int = 32                # latent chunk size
    dim_heads: int = 64
    ff_mult: float = 3.0
    sample_rate: int = 44100

    @property
    def in_dim(self) -> int:
        return self.audio_channels * self.patch

    @classmethod
    def medium(cls):
        """SAME-L (medium config encoder: channels 256 * c_mult 6,
        depth 12)."""
        return cls(channels=1536, depth=12)

    @classmethod
    def tiny(cls):
        return cls(patch=8, channels=16, latent_dim=8, stride=4,
                   depth=2, chunk=8, dim_heads=8, sample_rate=4096)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, std=0.02, bias=True, zero=False):
    w = (jnp.zeros((din, dout), jnp.float32) if zero else
         jax.random.normal(key, (din, dout), jnp.float32) * std)
    p = {"w": w.astype(dtype)}
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


def _dyt(x, p):
    """DynamicTanh norm (transformer.py:322-331)."""
    return (jnp.tanh(p["alpha"] * x.astype(jnp.float32)) * p["gamma"]
            + p["beta"]).astype(x.dtype)


def _init_dyt(dim, init_alpha=4.0):
    return {"alpha": jnp.asarray(init_alpha, jnp.float32),
            "gamma": jnp.ones((dim,), jnp.float32),
            "beta": jnp.zeros((dim,), jnp.float32)}


def _rotary_freqs(seq_len: int, rot_dim: int):
    """RotaryEmbedding(rot_dim//2).forward_from_seq_len: freqs doubled
    (transformer.py:236-291)."""
    inv = 1.0 / (10000.0 ** (np.arange(0, rot_dim, 2) / rot_dim))
    f = np.outer(np.arange(seq_len), inv)
    return jnp.asarray(np.concatenate([f, f], axis=-1), jnp.float32)


def _apply_partial_rope(x, freqs):
    """GPT-J partial rotary with rotate-half
    (transformer.py:293-318). x: [B, H, N, D]."""
    rot = freqs.shape[-1]
    t, rest = x[..., :rot], x[..., rot:]
    t32 = t.astype(jnp.float32)
    half = rot // 2
    t1, t2 = t32[..., :half], t32[..., half:]
    rh = jnp.concatenate([-t2, t1], axis=-1)
    out = t32 * jnp.cos(freqs) + rh * jnp.sin(freqs)
    return jnp.concatenate([out.astype(x.dtype), rest], axis=-1)


def _expo_fourier(t, dim, min_freq=0.5, max_freq=10000.0):
    """ExpoFourierFeatures (blocks.py:50-78)."""
    half = dim // 2
    ramp = np.linspace(0.0, 1.0, half)
    freqs = jnp.asarray(
        np.exp(np.log(min_freq)
               + ramp * (np.log(max_freq) - np.log(min_freq))),
        jnp.float32)
    ang = 2.0 * math.pi * t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def init_sa3_dit(key, cfg: SA3DiTConfig, dtype=jnp.float32
                 ) -> Dict[str, Any]:
    d = cfg.embed
    hd = cfg.head_dim
    keys = iter(jax.random.split(key, 32))

    n_qkv = 5 if cfg.differential else 3

    def block(k):
        ks = iter(jax.random.split(k, 12))
        return {
            "pre_norm": jnp.ones((d,), jnp.float32),
            "qkv": _lin(next(ks), d, n_qkv * d, dtype, bias=False),
            "qn": jnp.ones((hd,), jnp.float32),
            "kn": jnp.ones((hd,), jnp.float32),
            "attn_out": _lin(next(ks), d, d, dtype, bias=False,
                             zero=True),
            "x_norm": jnp.ones((d,), jnp.float32),
            # differential cross-attn doubles q and adds a second k
            # (transformer.py:545-546)
            "ca_q": _lin(next(ks), d, (2 if cfg.differential else 1)
                         * d, dtype, bias=False),
            "ca_kv": _lin(next(ks), d, (3 if cfg.differential else 2)
                          * d, dtype, bias=False),
            "ca_qn": jnp.ones((hd,), jnp.float32),
            "ca_kn": jnp.ones((hd,), jnp.float32),
            "ca_out": _lin(next(ks), d, d, dtype, bias=False,
                           zero=True),
            "ff_norm": jnp.ones((d,), jnp.float32),
            # SwiGLU (transformer.py:457 glu=True default): proj to
            # 2*inner, gate with SiLU
            "ff1": _lin(next(ks), d, 2 * int(d * cfg.ff_mult), dtype),
            "ff2": _lin(next(ks), int(d * cfg.ff_mult), d, dtype,
                        zero=True),
            "ssg": (jax.random.normal(next(ks), (6 * d,), jnp.float32)
                    / math.sqrt(d)).astype(dtype),
            "local1": _lin(next(ks), cfg.local_add_dim, d, dtype),
            "local2": _lin(next(ks), d, d, dtype, zero=True),
        }

    def stack(fn, n):
        ks = jax.random.split(next(keys), n)
        leaves = [fn(k) for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    def mlp(k, din, dout, bias=True):
        k1, k2 = jax.random.split(k)
        return {"l1": _lin(k1, din, dout, dtype, bias=bias),
                "l2": _lin(k2, dout, dout, dtype, bias=bias)}

    return {
        "project_in": _lin(next(keys), cfg.io_channels, d, dtype,
                           bias=False),
        "project_out": _lin(next(keys), d, cfg.io_channels, dtype,
                            bias=False),
        "preprocess": jnp.zeros((cfg.io_channels, cfg.io_channels),
                                dtype),
        "postprocess": jnp.zeros((cfg.io_channels, cfg.io_channels),
                                 dtype),
        "t_embed": mlp(next(keys), cfg.t_features, d),
        "to_cond": mlp(next(keys), cfg.cond_token_dim, d, bias=False),
        "to_global": mlp(next(keys), cfg.global_cond_dim, d,
                         bias=False),
        "global_embedder": {
            "l1": _lin(next(keys), d, d, dtype),
            "l2": _lin(next(keys), d, 6 * d, dtype)},
        "memory": (jax.random.normal(
            next(keys), (cfg.memory_tokens, d), jnp.float32) * 0.02
        ).astype(dtype),
        "blocks": stack(block, cfg.depth),
    }


def _mlp2(x, p, act=jax.nn.silu):
    return _dense(act(_dense(x, p["l1"])), p["l2"])


def _attn(q, k, v, heads, scale=None):
    """q [B,Nq,D] k/v [B,Nk,D] pre-split per head [B,N,H,hd]."""
    hd = q.shape[-1]
    w = jax.nn.softmax(
        jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v)


def sa3_dit(params, cfg: SA3DiTConfig, x, t, cross_cond, global_cond,
            local_add=None):
    """x: [B, T, io]; t [B] in [0,1]; cross_cond [B, L, cond_token_dim];
    global_cond [B, global_cond_dim]; local_add [B, T, local_add_dim]
    or None -> velocity [B, T, io] (dit.py:_forward, global adaLN)."""
    b, n, _ = x.shape
    d, heads, hd = cfg.embed, cfg.heads, cfg.head_dim
    mem = cfg.memory_tokens

    # zero-init residual 1x1 convs (dit.py:131-134)
    x = x @ params["preprocess"].astype(x.dtype) + x

    t_emb = _mlp2(_expo_fourier(t, cfg.t_features), params["t_embed"])
    g = _mlp2(global_cond, params["to_global"]) + t_emb
    # transformer-level global embedder -> 6*dim (transformer.py:1033)
    g6 = _dense(jax.nn.silu(_dense(g, params["global_embedder"]["l1"])),
                params["global_embedder"]["l2"])

    ctx = _mlp2(cross_cond, params["to_cond"])

    h = _dense(x, params["project_in"])
    h = jnp.concatenate(
        [jnp.broadcast_to(params["memory"].astype(h.dtype)[None],
                          (b, mem, d)), h], axis=1)
    freqs = _rotary_freqs(h.shape[1], cfg.rotary_dim)

    if local_add is None:
        local_add = jnp.zeros((b, n, cfg.local_add_dim), x.dtype)

    def body(h, lp):
        ssg = (lp["ssg"].astype(jnp.float32) + g6)[:, None]
        sc_s, sh_s, gt_s, sc_f, sh_f, gt_f = jnp.split(ssg, 6, -1)
        # self-attention with adaLN (transformer.py:928-937)
        a = _rms(h, lp["pre_norm"], cfg.norm_eps)
        a = a * (1 + sc_s) + sh_s
        n_qkv = 5 if cfg.differential else 3
        qkv = _dense(a, lp["qkv"]).reshape(b, -1, n_qkv, heads, hd)

        def prep(u, norm):
            return _apply_partial_rope(
                _rms(u, norm).transpose(0, 2, 1, 3),
                freqs).transpose(0, 2, 1, 3)

        q = prep(qkv[:, :, 0], lp["qn"])
        k = prep(qkv[:, :, 1], lp["kn"])
        o = _attn(q, k, qkv[:, :, 2], heads)
        if cfg.differential:
            # medium attn_kwargs differential: subtract a second
            # attention map sharing v (transformer.py:642-699)
            o = o - _attn(prep(qkv[:, :, 3], lp["qn"]),
                          prep(qkv[:, :, 4], lp["kn"]),
                          qkv[:, :, 2], heads)
        o = o.reshape(b, -1, d)
        h = h + _dense(o, lp["attn_out"]) \
            * jax.nn.sigmoid(1.0 - gt_s).astype(h.dtype)
        # cross attention (no adaLN branch)
        ca = _rms(h, lp["x_norm"], cfg.norm_eps)
        if cfg.differential:
            qq = _dense(ca, lp["ca_q"]).reshape(b, -1, 2, heads, hd)
            kv = _dense(ctx, lp["ca_kv"]).reshape(b, -1, 3, heads, hd)
            q1 = _rms(qq[:, :, 0], lp["ca_qn"])
            q2 = _rms(qq[:, :, 1], lp["ca_qn"])
            k1 = _rms(kv[:, :, 0], lp["ca_kn"])
            k2 = _rms(kv[:, :, 1], lp["ca_kn"])
            o = _attn(q1, k1, kv[:, :, 2], heads) \
                - _attn(q2, k2, kv[:, :, 2], heads)
            o = o.reshape(b, -1, d)
        else:
            q = _rms(_dense(ca, lp["ca_q"]).reshape(b, -1, heads, hd),
                     lp["ca_qn"])
            kv = _dense(ctx, lp["ca_kv"]).reshape(b, -1, 2, heads, hd)
            kk = _rms(kv[:, :, 0], lp["ca_kn"])
            o = _attn(q, kk, kv[:, :, 1], heads).reshape(b, -1, d)
        h = h + _dense(o, lp["ca_out"])
        # local additive conditioning, left-padded past memory tokens
        lc = _dense(jax.nn.silu(_dense(local_add, lp["local1"])),
                    lp["local2"])
        h = h + jnp.pad(lc, ((0, 0), (mem, 0), (0, 0)))
        # feedforward with adaLN — SwiGLU (FeedForward glu=True,
        # transformer.py:472: GLU(dim, inner, SiLU))
        f = _rms(h, lp["ff_norm"], cfg.norm_eps)
        f = f * (1 + sc_f) + sh_f
        fx, fg = jnp.split(_dense(f, lp["ff1"]), 2, axis=-1)
        f = _dense(fx * jax.nn.silu(fg.astype(jnp.float32)
                                    ).astype(fx.dtype), lp["ff2"])
        h = h + f * jax.nn.sigmoid(1.0 - gt_f).astype(h.dtype)
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    out = _dense(h[:, mem:], params["project_out"])
    return out @ params["postprocess"].astype(out.dtype) + out


# ---------------------------------------------------------------------------
# CFG / APG (dit.py:311-343, 479-625) in denoised space
# ---------------------------------------------------------------------------

def sa3_cfg_denoise(params, cfg: SA3DiTConfig, x, t, cross_cond,
                    global_cond, local_add=None, cfg_scale: float = 6.0,
                    apg_scale: float = 1.0, rescale: float = 0.0,
                    neg_cross_cond=None):
    """Returns the guided VELOCITY for the rf_denoiser objective.
    neg_cross_cond replaces the zeroed null embedding when a negative
    prompt is given (dit.py:517-519)."""
    b = x.shape[0]
    sig = t[:, None, None]
    if cfg_scale == 1.0:
        return sa3_dit(params, cfg, x, t, cross_cond, global_cond,
                       local_add)
    xx = jnp.concatenate([x, x], 0)
    tt = jnp.concatenate([t, t], 0)
    null = (jnp.zeros_like(cross_cond) if neg_cross_cond is None
            else jnp.broadcast_to(
                neg_cross_cond[:, :cross_cond.shape[1]],
                cross_cond.shape)
            if neg_cross_cond.shape[1] >= cross_cond.shape[1]
            else jnp.pad(neg_cross_cond,
                         ((0, 0),
                          (0, cross_cond.shape[1]
                           - neg_cross_cond.shape[1]), (0, 0))))
    cc = jnp.concatenate([cross_cond, null.astype(cross_cond.dtype)], 0)
    gg = jnp.concatenate([global_cond, global_cond], 0)
    la = (jnp.concatenate([local_add, local_add], 0)
          if local_add is not None else None)
    v = sa3_dit(params, cfg, xx, tt, cc, gg, la)
    v_c, v_u = v[:b], v[b:]
    den_c = x - v_c * sig
    den_u = x - v_u * sig
    diff = den_c - den_u
    if apg_scale > 0.0:
        v1 = den_c.astype(jnp.float32)
        v1n = v1 / jnp.maximum(
            jnp.sqrt(jnp.sum(v1 * v1, axis=(1, 2), keepdims=True)),
            1e-8)
        par = jnp.sum(diff.astype(jnp.float32) * v1n, axis=(1, 2),
                      keepdims=True) * v1n
        orth = diff - par.astype(diff.dtype)
        diff = apg_scale * orth + (1.0 - apg_scale) * diff
    den = den_c + (cfg_scale - 1.0) * diff
    out = (x - den) / sig
    if rescale != 0.0:
        std_c = jnp.std(v_c, axis=1, keepdims=True)
        std_o = jnp.std(out, axis=1, keepdims=True)
        out = rescale * (out * std_c / jnp.maximum(std_o, 1e-8)) \
            + (1 - rescale) * out
    return out


# ---------------------------------------------------------------------------
# schedule + samplers
# ---------------------------------------------------------------------------

def build_schedule(steps: int, seq_len: int, cfg: SA3DiTConfig,
                   sigma_max: float = 1.0, base_shift: float = 0.5,
                   max_shift: float = 1.15) -> np.ndarray:
    """Linear sigma_max..0 warped by the seq-len shift
    (distribution_shift.py:85-132)."""
    t = np.linspace(sigma_max, 0.0, steps + 1)
    sl = min(max(seq_len, cfg.shift_min_len), cfg.shift_max_len)
    mu = -(base_shift + (max_shift - base_shift)
           * (sl - cfg.shift_min_len)
           / (cfg.shift_max_len - cfg.shift_min_len))
    with np.errstate(divide="ignore"):
        t_out = 1.0 - np.exp(mu) / (np.exp(mu)
                                    + (1.0 / (1.0 - t) - 1.0))
    t_out[t >= 1.0] = 1.0
    t_out[t <= 0.0] = 0.0
    t_out[0] = sigma_max
    return t_out


def sample_pingpong(denoise_fn, noise, sigmas, key):
    """sampling.py:320-366: denoise then renoise to the next level."""
    x = noise
    for i in range(len(sigmas) - 1):
        t_cur, t_next = float(sigmas[i]), float(sigmas[i + 1])
        t_vec = jnp.full((x.shape[0],), t_cur, jnp.float32)
        denoised = x - t_cur * denoise_fn(x, t_vec)
        if t_next > 0:
            key, ke = jax.random.split(key)
            x = (1.0 - t_next) * denoised \
                + t_next * jax.random.normal(ke, x.shape, x.dtype)
        else:
            x = denoised
    return x


def sample_euler(denoise_fn, noise, sigmas, key=None):
    """sampling.py:147-192 discrete Euler."""
    x = noise
    for i in range(len(sigmas) - 1):
        t_cur, t_next = float(sigmas[i]), float(sigmas[i + 1])
        t_vec = jnp.full((x.shape[0],), t_cur, jnp.float32)
        v = denoise_fn(x, t_vec)
        x = x + (t_next - t_cur) * v
    return x


# ---------------------------------------------------------------------------
# seconds_total conditioner (conditioners.py NumberConditioner, expo)
# ---------------------------------------------------------------------------

def init_number_conditioner(key, out_dim: int, dtype=jnp.float32,
                            fourier_dim: int = 256):
    return {"proj": _lin(key, fourier_dim, out_dim, dtype),
            "fourier_dim": fourier_dim}


def number_embed(params, values, min_val: float = 0.0,
                 max_val: float = 512.0):
    v = jnp.clip(jnp.asarray(values, jnp.float32), min_val, max_val)
    v = (v - min_val) / (max_val - min_val)
    return _dense(_expo_fourier(v, params["fourier_dim"]),
                  params["proj"])


# ---------------------------------------------------------------------------
# TAAE autoencoder (SAME)
# ---------------------------------------------------------------------------

def init_taae_block(key, dim, cfg: TAAEConfig, dtype=jnp.float32):
    """TransformerBlock with DyT norms + differential attention
    (autoencoders.py:60-74 kwargs)."""
    hd = cfg.dim_heads
    ks = iter(jax.random.split(key, 8))
    return {
        "pre_norm": _init_dyt(dim),
        "qkv": _lin(next(ks), dim, 5 * dim, dtype, bias=False),
        "qn": _init_dyt(hd), "kn": _init_dyt(hd),
        "attn_out": _lin(next(ks), dim, dim, dtype, bias=False,
                         zero=True),
        "ff_norm": _init_dyt(dim),
        # SwiGLU like the DiT blocks (shared TransformerBlock recipe)
        "ff1": _lin(next(ks), dim, 2 * int(dim * cfg.ff_mult), dtype),
        "ff2": _lin(next(ks), int(dim * cfg.ff_mult), dim, dtype,
                    zero=True),
    }


def _taae_block(bp, x, cfg: TAAEConfig):
    """Differential attention: out = attn(q,k,v) - attn(q',k',v)
    (transformer.py:642-699) with partial rope."""
    b, n, dim = x.shape
    hd = cfg.dim_heads
    heads = dim // hd
    rot = max(hd // 2, 4)
    a = _dyt(x, bp["pre_norm"])
    qkv = _dense(a, bp["qkv"]).reshape(b, n, 5, heads, hd)
    freqs = _rotary_freqs(n, rot)

    def prep(u, norm):
        u = _dyt(u, norm)
        return _apply_partial_rope(u.transpose(0, 2, 1, 3),
                                   freqs).transpose(0, 2, 1, 3)

    q = prep(qkv[:, :, 0], bp["qn"])
    k = prep(qkv[:, :, 1], bp["kn"])
    v = qkv[:, :, 2]
    qd = prep(qkv[:, :, 3], bp["qn"])
    kd = prep(qkv[:, :, 4], bp["kn"])
    o = _attn(q, k, v, heads) - _attn(qd, kd, v, heads)
    x = x + _dense(o.reshape(b, n, dim), bp["attn_out"])
    f = _dyt(x, bp["ff_norm"])
    fx, fg = jnp.split(_dense(f, bp["ff1"]), 2, axis=-1)
    x = x + _dense(fx * jax.nn.silu(fg.astype(jnp.float32)
                                    ).astype(fx.dtype), bp["ff2"])
    return x


def init_taae(key, cfg: TAAEConfig, dtype=jnp.float32):
    ch = cfg.channels
    keys = iter(jax.random.split(key, 16))
    return {
        "enc_map": _lin(next(keys), cfg.in_dim, ch, dtype),
        "enc_blocks": [init_taae_block(k, ch, cfg, dtype)
                       for k in jax.random.split(next(keys), cfg.depth)],
        "enc_new": (jax.random.normal(next(keys), (1, 1, ch),
                                      jnp.float32) * 1e-5).astype(dtype),
        "enc_out": _lin(next(keys), ch, cfg.latent_dim, dtype),
        "dec_in": _lin(next(keys), cfg.latent_dim, ch, dtype),
        "dec_blocks": [init_taae_block(k, ch, cfg, dtype)
                       for k in jax.random.split(next(keys), cfg.depth)],
        "dec_new": (jax.random.normal(next(keys), (1, cfg.stride, ch),
                                      jnp.float32) * 1e-5).astype(dtype),
        "dec_map": _lin(next(keys), ch, cfg.in_dim, dtype),
    }


def _chunked_transform(x, blocks, cfg: TAAEConfig, chunk_tokens: int,
                       midpoint_shift: bool = True):
    """Run blocks over fixed chunks; second half on half-chunk-shifted
    windows (autoencoders.py:162-195 chunk_midpoint_shift)."""
    b, n, d = x.shape
    pad = (-n) % chunk_tokens
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    nt = x.shape[1]
    split = len(blocks) // 2 if midpoint_shift else len(blocks)

    def run(x, blks, ct):
        xc = x.reshape(b * (x.shape[1] // ct), ct, d)
        for bp in blks:
            xc = _taae_block(bp, xc, cfg)
        return xc.reshape(b, -1, d)

    x = run(x, blocks[:split], chunk_tokens)
    if midpoint_shift and split < len(blocks):
        shift = chunk_tokens // 2
        x = jnp.concatenate([x[:, :shift], x, x[:, -shift:]], axis=1)
        x = run(x, blocks[split:], chunk_tokens)
        x = x[:, shift:-shift]
    return x[:, :n]


def taae_encode(params, cfg: TAAEConfig, audio):
    """audio [B, T, 2] -> latents [B, T/(patch*stride), latent_dim]
    (SAMEEncoder: patch -> map -> segments+new token -> chunked
    transformer -> per-segment token -> linear)."""
    b, t, c = audio.shape
    pad = (-t) % (cfg.patch * cfg.stride)
    if pad:
        audio = jnp.pad(audio, ((0, 0), (0, pad), (0, 0)))
    tokens = audio.reshape(b, -1, cfg.patch * c)
    x = _dense(tokens, params["enc_map"])          # [B, N, ch]
    n_seg = x.shape[1] // cfg.stride
    x = x.reshape(b, n_seg, cfg.stride, cfg.channels)
    new = jnp.broadcast_to(params["enc_new"].astype(x.dtype)[None],
                           (b, n_seg, 1, cfg.channels))
    x = jnp.concatenate([x, new], axis=2)          # [B, n, s+1, ch]
    x = x.reshape(b, n_seg * (cfg.stride + 1), cfg.channels)
    chunk_tokens = cfg.chunk * (cfg.stride + 1) // cfg.stride
    x = _chunked_transform(x, params["enc_blocks"], cfg, chunk_tokens)
    x = x.reshape(b, n_seg, cfg.stride + 1, cfg.channels)[:, :, -1]
    return _dense(x, params["enc_out"])


def taae_decode(params, cfg: TAAEConfig, latents):
    """latents [B, n, latent_dim] -> audio [B, n*patch*stride, 2]
    (SAMEDecoder: per-latent segment of 1 token + stride new tokens)."""
    b, n_seg, _ = latents.shape
    x = _dense(latents, params["dec_in"])          # [B, n, ch]
    new = jnp.broadcast_to(params["dec_new"].astype(x.dtype)[None],
                           (b, n_seg, cfg.stride, cfg.channels))
    x = jnp.concatenate([x[:, :, None], new], axis=2)
    x = x.reshape(b, n_seg * (cfg.stride + 1), cfg.channels)
    chunk_tokens = (cfg.chunk // cfg.stride) * (cfg.stride + 1)
    x = _chunked_transform(x, params["dec_blocks"], cfg, chunk_tokens)
    x = x.reshape(b, n_seg, cfg.stride + 1,
                  cfg.channels)[:, :, 1:]          # last stride tokens
    x = x.reshape(b, n_seg * cfg.stride, cfg.channels)
    audio = _dense(x, params["dec_map"])
    return audio.reshape(b, -1, cfg.audio_channels)
