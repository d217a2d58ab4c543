"""ACE-Step 1.5 — turbo flow-matching music generation (reference
models/TTS/ace_step15/models/modeling_acestep_v15_turbo.py +
pipeline_ace_step15.py).

Components, all sharing one Qwen3-style layer recipe (q/k head-RMS
norm, GQA, SwiGLU, alternating sliding-window(128)/full attention):

* lyric encoder (8 bidirectional layers over projected text-encoder
  states, modeling_acestep_v15_turbo.py:577);
* timbre encoder (4 layers over 64-dim reference-audio latents, mean
  pooled per reference, :997);
* audio tokenizer: attention pooler (window 5, CLS token, :734) +
  ResidualFSQ (levels [8,8,8,5,5,5], :1181) — 5 Hz semantic codes;
* detokenizer (expand x5 with learned slot tokens, 2 layers, :862);
* DiT (24 layers, hidden 2048, patchify k2/s2 conv over
  [context 128 | x_t 64] = 192 channels, adaLN 6-way scale-shift from
  the t/t-r embeddings, cross-attention to the packed condition,
  :1240);
* turbo sampling: fixed 8-step shift-{1,2,3} schedules, ode (Euler) or
  sde (renoise) updates, audio-cover-strength condition switch
  (:1790-1994).

TPU-native: stacked-params `lax.scan` over DiT layers with a
[full, sliding] mask pair selected per layer, cross-attention K/V
precomputed ONCE outside the step loop (replacing the reference's
EncoderDecoderCache), and the whole denoise loop a `lax.scan` over the
static timestep table.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Ace15Config:
    hidden: int = 2048
    ffn: int = 6144
    layers: int = 24
    heads: int = 16
    kv_heads: int = 8
    head_dim: int = 128
    eps: float = 1e-6
    rope_theta: float = 1e6
    sliding_window: int = 128
    # sub-stack depths (configuration_acestep_v15.py:173-186)
    lyric_layers: int = 8
    timbre_layers: int = 4
    pooler_layers: int = 2
    text_dim: int = 1024
    acoustic_dim: int = 64
    timbre_dim: int = 64
    pool_window: int = 5
    in_channels: int = 192          # context 128 + x_t 64
    patch_size: int = 2
    fsq_dim: int = 2048
    fsq_levels: Tuple[int, ...] = (8, 8, 8, 5, 5, 5)
    latent_rate: float = 25.0       # acoustic frames / second
    # encoder-side dims (differ from the DiT's on XL,
    # ace_step_v1_5_xl_transformer_config_turbo.json)
    enc_hidden: int = 0             # 0 -> same as hidden
    enc_heads: int = 0
    enc_kv_heads: int = 0
    enc_ffn: int = 0
    # XL pools timbre via a prepended CLS token instead of the mean
    # (modeling_acestep_v15_xl_turbo.py:26-46)
    timbre_cls: bool = False

    def encoder_cfg(self) -> "Ace15Config":
        if not self.enc_hidden:
            return self
        return dataclasses.replace(
            self, hidden=self.enc_hidden, heads=self.enc_heads,
            kv_heads=self.enc_kv_heads, ffn=self.enc_ffn,
            enc_hidden=0)

    @property
    def cond_dim(self) -> int:
        return self.enc_hidden or self.hidden

    @classmethod
    def xl(cls):
        """XL turbo: DiT 2560/32L/32H over a 2048-d encoder side."""
        return cls(hidden=2560, ffn=9728, layers=32, heads=32,
                   kv_heads=8, enc_hidden=2048, enc_heads=16,
                   enc_kv_heads=8, enc_ffn=6144, timbre_cls=True)

    @classmethod
    def tiny(cls):
        return cls(hidden=32, ffn=64, layers=2, heads=4, kv_heads=2,
                   head_dim=8, sliding_window=8, lyric_layers=2,
                   timbre_layers=1, pooler_layers=1, text_dim=12,
                   acoustic_dim=8, timbre_dim=8, pool_window=5,
                   in_channels=24, patch_size=2, fsq_dim=32,
                   fsq_levels=(8, 5, 5), latent_rate=25.0)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=False, std=0.02, zero=False):
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


def _rope_tables(total, hd, theta):
    inv = 1.0 / (theta ** (np.arange(0, hd, 2) / hd))
    ang = np.outer(np.arange(total), inv)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def _apply_rope(x, cos, sin):
    d = x.shape[-1]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos[None, :, None, :]
            + rot * sin[None, :, None, :]).astype(x.dtype)


def _layer_types(n):
    """sliding for odd (i+1), full for even (configuration:252-255):
    returns bool array, True = sliding."""
    return np.asarray([bool((i + 1) % 2) for i in range(n)])


def sliding_mask(n, window, pad_mask=None):
    """Bidirectional band mask |i-j| < window (create_4d_mask)."""
    idx = np.arange(n)
    keep = np.abs(idx[:, None] - idx[None, :]) < window
    m = jnp.asarray(keep)
    if pad_mask is not None:
        m = jnp.logical_and(m[None], pad_mask[:, None, :])
    else:
        m = m[None]
    return jnp.where(m[:, None], 0.0, jnp.finfo(jnp.float32).min)


def full_mask(n, pad_mask=None):
    if pad_mask is None:
        return jnp.zeros((1, 1, 1, n), jnp.float32)
    return jnp.where(pad_mask[:, None, None, :], 0.0,
                     jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# shared attention layer (AceStepAttention + encoder/DiT layers)
# ---------------------------------------------------------------------------

def _init_attn(key, cfg: Ace15Config, dtype, cross=False):
    ks = iter(jax.random.split(key, 4))
    d, hd = cfg.hidden, cfg.head_dim
    return {
        "q": _lin(next(ks), d, cfg.heads * hd, dtype),
        "k": _lin(next(ks), d, cfg.kv_heads * hd, dtype),
        "v": _lin(next(ks), d, cfg.kv_heads * hd, dtype),
        "o": _lin(next(ks), cfg.heads * hd, d, dtype),
        "qn": jnp.ones((hd,), jnp.float32),
        "kn": jnp.ones((hd,), jnp.float32),
    }


def _attn_fwd(ap, x, cfg: Ace15Config, bias, cos=None, sin=None,
              kv_states=None, kv=None):
    """Self-attn (kv_states None, rope applied) or cross-attn
    (kv_states given, no rope).  kv=(k,v) precomputed overrides."""
    b, l, _ = x.shape
    n, nkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    q = _rms(_dense(x, ap["q"]).reshape(b, l, n, hd), ap["qn"],
             cfg.eps)
    if kv is not None:
        k, v = kv
    else:
        src = x if kv_states is None else kv_states
        s_l = src.shape[1]
        k = _rms(_dense(src, ap["k"]).reshape(b, s_l, nkv, hd),
                 ap["kn"], cfg.eps)
        v = _dense(src, ap["v"]).reshape(b, s_l, nkv, hd)
    if kv_states is None and kv is None and cos is not None:
        # rope only on self-attention (AceStepAttention:339-346)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
    kk = jnp.repeat(k, n // nkv, axis=2)
    vv = jnp.repeat(v, n // nkv, axis=2)
    s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, l, n * hd)
    return _dense(o, ap["o"])


def cross_kv(ap, cfg: Ace15Config, enc_states):
    """Precompute cross-attention K/V once per generation (the TPU
    replacement for EncoderDecoderCache reuse across steps)."""
    b, s_l, _ = enc_states.shape
    nkv, hd = cfg.kv_heads, cfg.head_dim
    k = _rms(_dense(enc_states, ap["k"]).reshape(b, s_l, nkv, hd),
             ap["kn"], cfg.eps)
    v = _dense(enc_states, ap["v"]).reshape(b, s_l, nkv, hd)
    return k, v


def _init_mlp(key, cfg: Ace15Config, dtype):
    ks = iter(jax.random.split(key, 3))
    return {"gate": _lin(next(ks), cfg.hidden, cfg.ffn, dtype),
            "up": _lin(next(ks), cfg.hidden, cfg.ffn, dtype),
            "down": _lin(next(ks), cfg.ffn, cfg.hidden, dtype)}


def _mlp(x, mp):
    h = jax.nn.silu(_dense(x, mp["gate"]).astype(jnp.float32)
                    ).astype(x.dtype) * _dense(x, mp["up"])
    return _dense(h, mp["down"])


def _init_enc_layer(key, cfg: Ace15Config, dtype):
    k1, k2 = jax.random.split(key)
    return {"in_norm": jnp.ones((cfg.hidden,), jnp.float32),
            "attn": _init_attn(k1, cfg, dtype),
            "post_norm": jnp.ones((cfg.hidden,), jnp.float32),
            "mlp": _init_mlp(k2, cfg, dtype)}


def _enc_layer(lp, x, cfg: Ace15Config, bias, cos, sin):
    x = x + _attn_fwd(lp["attn"], _rms(x, lp["in_norm"], cfg.eps),
                      cfg, bias, cos, sin)
    return x + _mlp(_rms(x, lp["post_norm"], cfg.eps), lp["mlp"])


def _run_encoder_stack(layers, x, cfg: Ace15Config, n_layers,
                       pad_mask=None):
    """Bidirectional stack with alternating sliding/full masks."""
    n = x.shape[1]
    cos, sin = _rope_tables(n, cfg.head_dim, cfg.rope_theta)
    cos, sin = cos[:n], sin[:n]
    m_full = full_mask(n, pad_mask)
    m_slide = sliding_mask(n, cfg.sliding_window, pad_mask)
    sliding = _layer_types(n_layers)
    for i, lp in enumerate(layers):
        x = _enc_layer(lp, x, cfg,
                       m_slide if sliding[i] else m_full, cos, sin)
    return x


# ---------------------------------------------------------------------------
# sub-modules
# ---------------------------------------------------------------------------

def init_lyric_encoder(key, cfg: Ace15Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 3))
    return {"embed": _lin(next(ks), cfg.text_dim, cfg.hidden, dtype,
                          bias=True),
            "layers": [_init_enc_layer(k, cfg, dtype) for k in
                       jax.random.split(next(ks), cfg.lyric_layers)],
            "norm": jnp.ones((cfg.hidden,), jnp.float32)}


def lyric_encode(params, cfg: Ace15Config, lyric_states, pad_mask=None):
    x = _dense(lyric_states, params["embed"])
    x = _run_encoder_stack(params["layers"], x, cfg, cfg.lyric_layers,
                           pad_mask)
    return _rms(x, params["norm"], cfg.eps)


def init_timbre_encoder(key, cfg: Ace15Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 4))
    return {"embed": _lin(next(ks), cfg.timbre_dim, cfg.hidden, dtype,
                          bias=True),
            "special": (jax.random.normal(
                next(ks), (1, cfg.hidden), jnp.float32)).astype(dtype),
            "layers": [_init_enc_layer(k, cfg, dtype) for k in
                       jax.random.split(next(ks), cfg.timbre_layers)],
            "norm": jnp.ones((cfg.hidden,), jnp.float32)}


def timbre_encode(params, cfg: Ace15Config, refer_latents):
    """refer_latents [B, T, 64] -> [B, 1, hidden] (mean over frames;
    modeling:1128-1180 returns per-reference pooled embeddings)."""
    x = _dense(refer_latents, params["embed"])
    if cfg.timbre_cls and "special" in params:
        cls = jnp.broadcast_to(params["special"].astype(x.dtype)[None],
                               (x.shape[0], 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = _run_encoder_stack(params["layers"], x, cfg, cfg.timbre_layers)
    x = _rms(x, params["norm"], cfg.eps)
    if cfg.timbre_cls and "special" in params:
        return x[:, :1]
    return jnp.mean(x, axis=1, keepdims=True)


def init_pooler(key, cfg: Ace15Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 4))
    return {"embed": _lin(next(ks), cfg.hidden, cfg.hidden, dtype,
                          bias=True),
            "special": (jax.random.normal(next(ks), (1, 1, cfg.hidden),
                                          jnp.float32)
                        * 0.02).astype(dtype),
            "layers": [_init_enc_layer(k, cfg, dtype) for k in
                       jax.random.split(next(ks), cfg.pooler_layers)],
            "norm": jnp.ones((cfg.hidden,), jnp.float32)}


def attention_pool(params, cfg: Ace15Config, x):
    """x [B, T, P, hidden] -> [B, T, hidden] via CLS token
    (AttentionPooler, :734-858)."""
    b, t, pwin, d = x.shape
    x = _dense(x, params["embed"])
    cls = jnp.broadcast_to(params["special"].astype(x.dtype),
                           (b, t, 1, d))
    x = jnp.concatenate([cls, x], axis=2).reshape(b * t, pwin + 1, d)
    x = _run_encoder_stack(params["layers"], x, cfg, cfg.pooler_layers)
    x = _rms(x, params["norm"], cfg.eps)
    return x[:, 0].reshape(b, t, d)


def init_detokenizer(key, cfg: Ace15Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 5))
    return {"embed": _lin(next(ks), cfg.hidden, cfg.hidden, dtype,
                          bias=True),
            "special": (jax.random.normal(
                next(ks), (1, cfg.pool_window, cfg.hidden),
                jnp.float32) * 0.02).astype(dtype),
            "layers": [_init_enc_layer(k, cfg, dtype) for k in
                       jax.random.split(next(ks), cfg.pooler_layers)],
            "norm": jnp.ones((cfg.hidden,), jnp.float32),
            "proj_out": _lin(next(ks), cfg.hidden, cfg.acoustic_dim,
                             dtype, bias=True)}


def detokenize(params, cfg: Ace15Config, tokens):
    """tokens [B, T, hidden] -> acoustic [B, T*pool_window, 64]
    (AudioTokenDetokenizer, :862-996)."""
    b, t, d = tokens.shape
    p = cfg.pool_window
    x = _dense(tokens, params["embed"])[:, :, None, :]
    x = x + params["special"].astype(x.dtype)[None]
    x = x.reshape(b * t, p, d)
    x = _run_encoder_stack(params["layers"], x, cfg, cfg.pooler_layers)
    x = _rms(x, params["norm"], cfg.eps)
    return _dense(x, params["proj_out"]).reshape(
        b, t * p, cfg.acoustic_dim)


# ---------------------------------------------------------------------------
# FSQ (vector_quantize_pytorch ResidualFSQ, num_quantizers=1)
# ---------------------------------------------------------------------------

def init_fsq(key, cfg: Ace15Config, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    nlev = len(cfg.fsq_levels)
    return {"proj_in": _lin(k1, cfg.fsq_dim, nlev, dtype, bias=True),
            "proj_out": _lin(k2, nlev, cfg.fsq_dim, dtype, bias=True)}


def _fsq_bound(z, levels):
    """FSQ bounding + rounding to integer grid, normalized to
    [-1, 1]."""
    lv = jnp.asarray(levels, jnp.float32)
    half_l = (lv - 1.0) * (1.0 + 1e-3) / 2.0
    offset = jnp.where(lv % 2 == 0, 0.5, 0.0)
    shift = jnp.arctanh(offset / half_l)
    bounded = jnp.tanh(z + shift) * half_l - offset
    quantized = jnp.round(bounded)
    half_width = lv // 2
    return quantized / half_width


def fsq_quantize(params, cfg: Ace15Config, x):
    """x [..., fsq_dim] -> (quantized [..., fsq_dim], indices [...])."""
    z = _dense(x, params["proj_in"]).astype(jnp.float32)
    codes = _fsq_bound(z, cfg.fsq_levels)
    lv = np.asarray(cfg.fsq_levels, np.float32)
    half = lv // 2
    digits = jnp.round(codes * half + half).astype(jnp.int32)
    basis = np.concatenate(
        [[1], np.cumprod(lv[:-1])]).astype(np.int32)
    indices = jnp.sum(digits * basis, axis=-1)
    return _dense(codes.astype(x.dtype), params["proj_out"]), indices


def fsq_codes_from_indices(params, cfg: Ace15Config, indices):
    """indices [...] -> dequantized [..., fsq_dim]
    (get_output_from_indices)."""
    lv = np.asarray(cfg.fsq_levels, np.float32)
    basis = np.concatenate([[1], np.cumprod(lv[:-1])]).astype(np.int32)
    digits = (indices[..., None] // basis) % lv.astype(np.int32)
    codes = (digits.astype(jnp.float32) - lv // 2) / (lv // 2)
    return _dense(codes, params["proj_out"])


# ---------------------------------------------------------------------------
# DiT
# ---------------------------------------------------------------------------

def _init_time_embed(key, cfg: Ace15Config, dtype):
    ks = iter(jax.random.split(key, 3))
    d = cfg.hidden
    return {"l1": _lin(next(ks), 256, d, dtype, bias=True),
            "l2": _lin(next(ks), d, d, dtype, bias=True),
            "proj": _lin(next(ks), d, 6 * d, dtype, bias=True)}


def _time_embed(p, t, scale=1000.0):
    """TimestepEmbedding (:197-252): returns (temb [B,d],
    proj [B,6,d])."""
    tt = t.astype(jnp.float32) * scale
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = tt[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    temb = _dense(jax.nn.silu(_dense(emb, p["l1"])), p["l2"])
    proj = _dense(jax.nn.silu(temb), p["proj"])
    return temb, proj.reshape(t.shape[0], 6, -1)


def init_dit(key, cfg: Ace15Config, dtype=jnp.float32):
    d = cfg.hidden
    keys = iter(jax.random.split(key, 12))

    def layer(k):
        ks = iter(jax.random.split(k, 4))
        return {
            "sa_norm": jnp.ones((d,), jnp.float32),
            "sa": _init_attn(next(ks), cfg, dtype),
            "ca_norm": jnp.ones((d,), jnp.float32),
            "ca": _init_attn(next(ks), cfg, dtype, cross=True),
            "mlp_norm": jnp.ones((d,), jnp.float32),
            "mlp": _init_mlp(next(ks), cfg, dtype),
            "sst": (jax.random.normal(next(ks), (6, d), jnp.float32)
                    / math.sqrt(d)).astype(dtype),
        }

    lks = jax.random.split(next(keys), cfg.layers)
    leaves = [layer(k) for k in lks]
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)
    return {
        "proj_in": dict(_lin(next(keys), cfg.in_channels
                             * cfg.patch_size, d, dtype, bias=True)),
        "time": _init_time_embed(next(keys), cfg, dtype),
        "time_r": _init_time_embed(next(keys), cfg, dtype),
        "cond_embed": _lin(next(keys), cfg.cond_dim, d, dtype,
                           bias=True),
        "layers": layers,
        "norm_out": jnp.ones((d,), jnp.float32),
        "proj_out": _lin(next(keys), d, cfg.acoustic_dim
                         * cfg.patch_size, dtype, bias=True),
        "out_sst": (jax.random.normal(next(keys), (2, d), jnp.float32)
                    / math.sqrt(d)).astype(dtype),
        "null_cond": (jax.random.normal(next(keys), (1, 1, d),
                                        jnp.float32)).astype(dtype),
    }


def dit_forward(params, cfg: Ace15Config, xt, t, t_r, context_latents,
                enc_states=None, enc_pad=None, cross_kvs=None):
    """xt [B, T, 64]; context_latents [B, T, 128]; returns velocity
    [B, T, 64].  cross_kvs: optional precomputed per-layer (k, v)
    stacked [L, B, S, nkv, hd] pair."""
    b, n, _ = xt.shape
    d = cfg.hidden
    temb_t, proj_t = _time_embed(params["time"], t)
    temb_r, proj_r = _time_embed(params["time_r"], t - t_r)
    temb = temb_t + temb_r
    proj = proj_t + proj_r                      # [B, 6, d]

    h = jnp.concatenate([context_latents, xt], axis=-1)
    pad = (-h.shape[1]) % cfg.patch_size
    if pad:
        h = jnp.pad(h, ((0, 0), (0, pad), (0, 0)))
    np_tok = h.shape[1] // cfg.patch_size
    # conv k=patch s=patch == reshape + dense
    h = h.reshape(b, np_tok, cfg.patch_size * cfg.in_channels)
    h = _dense(h, params["proj_in"])

    if cross_kvs is None and enc_states is not None:
        enc_states = _dense(enc_states, params["cond_embed"])

    cos, sin = _rope_tables(np_tok, cfg.head_dim, cfg.rope_theta)
    m_full = full_mask(np_tok)
    m_slide = sliding_mask(np_tok, cfg.sliding_window)
    enc_bias = (full_mask(1, enc_pad) if enc_pad is not None
                else jnp.zeros((1, 1, 1, 1), jnp.float32))
    sliding = jnp.asarray(_layer_types(cfg.layers))

    def body(h, inp):
        lp, is_slide, ckv = inp
        ss = lp["sst"].astype(jnp.float32)[None] + proj
        sh_m, sc_m, gt_m, sh_f, sc_f, gt_f = [
            ss[:, i:i + 1] for i in range(6)]
        bias = jnp.where(is_slide, m_slide, m_full)
        y = _rms(h, lp["sa_norm"], cfg.eps) * (1 + sc_m) + sh_m
        h = h + _attn_fwd(lp["sa"], y.astype(h.dtype), cfg, bias,
                          cos, sin) * gt_m.astype(h.dtype)
        y = _rms(h, lp["ca_norm"], cfg.eps)
        if ckv is not None:
            h = h + _attn_fwd(lp["ca"], y, cfg, enc_bias, kv=ckv)
        else:
            h = h + _attn_fwd(lp["ca"], y, cfg, enc_bias,
                              kv_states=enc_states)
        y = _rms(h, lp["mlp_norm"], cfg.eps) * (1 + sc_f) + sh_f
        h = h + _mlp(y.astype(h.dtype), lp["mlp"]) \
            * gt_f.astype(h.dtype)
        return h, None

    if cross_kvs is not None:
        h, _ = jax.lax.scan(
            body, h, (params["layers"], sliding, cross_kvs))
    else:
        # python loop over unstacked layers (kv_states path)
        layers_list = [jax.tree.map(lambda a, i=i: a[i],
                                    params["layers"])
                       for i in range(cfg.layers)]
        for i, lp in enumerate(layers_list):
            h, _ = body(h, (lp, sliding[i], None))

    ss = params["out_sst"].astype(jnp.float32)[None] + temb[:, None]
    sh, sc = ss[:, 0:1], ss[:, 1:2]
    h = _rms(h, params["norm_out"], cfg.eps) * (1 + sc) + sh
    out = _dense(h.astype(xt.dtype), params["proj_out"])
    out = out.reshape(b, np_tok * cfg.patch_size, cfg.acoustic_dim)
    return out[:, :n]


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------

def init_ace15(key, cfg: Ace15Config, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 8))
    ecfg = cfg.encoder_cfg()
    return {
        "dit": init_dit(next(ks), cfg, dtype),
        "text_proj": _lin(next(ks), cfg.text_dim, ecfg.hidden, dtype),
        "lyric": init_lyric_encoder(next(ks), ecfg, dtype),
        "timbre": init_timbre_encoder(next(ks), ecfg, dtype),
        "tok_proj": _lin(next(ks), cfg.acoustic_dim, cfg.fsq_dim,
                         dtype, bias=True),
        "pooler": init_pooler(next(ks), ecfg, dtype),
        "fsq": init_fsq(next(ks), ecfg, dtype),
        "detok": init_detokenizer(next(ks), ecfg, dtype),
    }


def encode_condition(params, cfg: Ace15Config, text_states, text_mask,
                     lyric_states, lyric_mask, refer_latents=None):
    """AceStepConditionEncoder (:1509-1556): [lyrics | timbre | text]
    packed along the sequence."""
    cfg = cfg.encoder_cfg()
    parts, masks = [], []
    ly = lyric_encode(params["lyric"], cfg, lyric_states, lyric_mask)
    parts.append(ly)
    masks.append(lyric_mask if lyric_mask is not None
                 else jnp.ones(ly.shape[:2], bool))
    if refer_latents is not None:
        tb = timbre_encode(params["timbre"], cfg, refer_latents)
        parts.append(tb)
        masks.append(jnp.ones(tb.shape[:2], bool))
    tx = _dense(text_states, params["text_proj"])
    parts.append(tx)
    masks.append(text_mask if text_mask is not None
                 else jnp.ones(tx.shape[:2], bool))
    return (jnp.concatenate(parts, axis=1),
            jnp.concatenate([m.astype(bool) for m in masks], axis=1))


def tokenize_audio(params, cfg: Ace15Config, acoustic):
    """acoustic latents [B, T, 64] (T multiple of pool_window) ->
    (quantized [B, T/P, fsq_dim], indices [B, T/P])."""
    b, t, _ = acoustic.shape
    p = cfg.pool_window
    ecfg = cfg.encoder_cfg()
    x = _dense(acoustic, params["tok_proj"])
    x = x.reshape(b, t // p, p, cfg.fsq_dim)
    pooled = attention_pool(params["pooler"], ecfg, x)
    return fsq_quantize(params["fsq"], ecfg, pooled)


def lm_hints_from_codes(params, cfg: Ace15Config, indices):
    """audio code indices [B, T5] -> 25 Hz acoustic hints
    [B, T5*P, 64] (quantizer.get_output_from_indices + detokenize)."""
    ecfg = cfg.encoder_cfg()
    q = fsq_codes_from_indices(params["fsq"], ecfg, indices)
    return detokenize(params["detok"], ecfg, q)


# turbo schedules (generate_audio:1814-1827)
SHIFT_TIMESTEPS = {
    1.0: [1.0, 0.875, 0.75, 0.625, 0.5, 0.375, 0.25, 0.125],
    2.0: [1.0, 14 / 15, 6 / 7, 10 / 13, 2 / 3, 6 / 11, 0.4, 2 / 9],
    3.0: [1.0, 21 / 22, 0.9, 5 / 6, 0.75, 9 / 14, 0.5, 0.3],
}


def generate_latents(params, cfg: Ace15Config, cond, cond_mask,
                     latent_length: int, src_latents=None,
                     is_cover: bool = False, shift: float = 3.0,
                     infer_method: str = "ode", seed: int = 0,
                     cond_non_cover=None, cond_mask_non_cover=None,
                     audio_cover_strength: float = 1.0, key=None):
    """Turbo flow sampling (:1927-1988).  cond [B, S, hidden] packed
    condition; src_latents [B, T, 64] (silence/source/cover hints)."""
    key = key if key is not None else jax.random.PRNGKey(seed)
    shift = min([1.0, 2.0, 3.0], key=lambda v: abs(v - shift))
    schedule = np.asarray(SHIFT_TIMESTEPS[shift], np.float32)
    b = cond.shape[0]
    if src_latents is None:
        src_latents = jnp.zeros((b, latent_length, cfg.acoustic_dim),
                                jnp.float32)
    chunk = jnp.ones_like(src_latents)
    context = jnp.concatenate([src_latents, chunk], axis=-1)
    noise = jax.random.normal(
        key, (b, latent_length, cfg.acoustic_dim), jnp.float32)

    enc = _dense(cond, params["dit"]["cond_embed"])
    kvs = _stack_cross_kv(params["dit"], cfg, enc)
    enc_pad = cond_mask
    if cond_non_cover is not None:
        enc2 = _dense(cond_non_cover, params["dit"]["cond_embed"])
        kvs2 = _stack_cross_kv(params["dit"], cfg, enc2)
    cover_steps = int(len(schedule) * audio_cover_strength)

    xt = noise
    keys = jax.random.split(key, len(schedule) + 1)[1:]
    for i, t_cur in enumerate(schedule):
        use_non_cover = (cond_non_cover is not None
                         and i >= cover_steps)
        kv_i = kvs2 if use_non_cover else kvs
        pad_i = (cond_mask_non_cover if use_non_cover else enc_pad)
        tv = jnp.full((b,), float(t_cur), jnp.float32)
        vt = dit_forward(params["dit"], cfg, xt, tv, tv, context,
                         enc_pad=pad_i, cross_kvs=kv_i)
        if i == len(schedule) - 1:
            xt = xt - vt * float(t_cur)
            break
        t_next = float(schedule[i + 1])
        if infer_method == "sde":
            x0 = xt - vt * float(t_cur)
            nz = jax.random.normal(keys[i], xt.shape, jnp.float32)
            xt = t_next * nz + (1.0 - t_next) * x0
        else:
            xt = xt - vt * (float(t_cur) - t_next)
    return xt


def _stack_cross_kv(dit_params, cfg: Ace15Config, enc):
    ks, vs = [], []
    for i in range(cfg.layers):
        lp = jax.tree.map(lambda a, i=i: a[i], dit_params["layers"])
        k, v = cross_kv(lp["ca"], cfg, enc)
        ks.append(k)
        vs.append(v)
    return jnp.stack(ks), jnp.stack(vs)
