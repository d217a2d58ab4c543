"""Chatterbox multilingual TTS — T3 token LM + voice encoder.

TPU-native re-implementation of /root/reference/models/TTS/chatterbox/:

* T3 (models/t3/t3.py): a LLaMA-520M backbone (llama_configs.py: dim
  1024, 30 layers, 16 heads, ffn 4096, llama3-scaled RoPE base 500k
  factor 8) consuming [cond; text; speech] embedding streams with
  learned positional embeddings per stream
  (modules/learned_pos_emb.py), conditioned on a speaker embedding,
  perceiver-resampled prompt-speech embeddings and an emotion-
  exaggeration scalar (modules/cond_enc.py T3CondEnc).  Inference
  (t3.py:227-394): dual-batch CFG (uncond row zeroes the text
  embeddings), repetition penalty, min-p + top-p sampling, stop on
  stop_speech_token.
* Voice encoder (models/voice_encoder/voice_encoder.py): 3-layer LSTM
  over 40-mel frames -> last hidden -> Linear -> ReLU -> L2 norm.
* Perceiver prompt resampler (modules/perceiver.py): 32 learned
  queries, one shared AttentionBlock2 applied as cross- then
  self-attention.

The speech-token decoder lives in s3gen.py (CosyVoice2 flow-matching
token->mel->wav).  Generation is a jitted prefill + lax.scan decode
with a KV cache (same structure as heartmula.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .heartmula import (llama3_scaled_rope, _apply_rope, _rms, _dense)


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class T3Config:
    # llama 520M backbone (llama_configs.py)
    dim: int = 1024
    n_layers: int = 30
    n_heads: int = 16
    ffn_dim: int = 4096
    rope_base: float = 500_000.0
    rope_scale_factor: int = 8
    eps: float = 1e-5
    # token spaces (modules/t3_config.py; 2454 = multilingual)
    text_vocab_size: int = 2454
    speech_vocab_size: int = 8194
    start_text_token: int = 255
    stop_text_token: int = 0
    start_speech_token: int = 6561
    stop_speech_token: int = 6562
    max_text_tokens: int = 2048
    max_speech_tokens: int = 4096
    speaker_embed_size: int = 256
    # perceiver resampler
    perceiver_queries: int = 32
    perceiver_heads: int = 4
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @classmethod
    def tiny(cls):
        return cls(dim=64, n_layers=2, n_heads=4, ffn_dim=128,
                   text_vocab_size=96, speech_vocab_size=80,
                   start_text_token=90, stop_text_token=0,
                   start_speech_token=64, stop_speech_token=65,
                   speaker_embed_size=16, perceiver_queries=4,
                   perceiver_heads=2)


@dataclasses.dataclass(frozen=True)
class VoiceEncConfig:
    # models/voice_encoder/config.py
    num_mels: int = 40
    sample_rate: int = 16000
    speaker_embed_size: int = 256
    hidden_size: int = 256
    n_fft: int = 400
    hop_size: int = 160
    win_size: int = 400

    @classmethod
    def tiny(cls):
        return cls(num_mels=8, speaker_embed_size=16, hidden_size=16,
                   n_fft=64, hop_size=32, win_size=64)


# ---------------------------------------------------------------------------
# mel front-end (voice_encoder/melspec.py analog)
# ---------------------------------------------------------------------------

def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank [n_mels, n_fft//2+1] (librosa
    formula, used by both the VE mel and s3gen mel)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = 3 * f / 200.0
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
    freqs = mel_to_hz(mels)
    fft_f = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_mels, n_fft // 2 + 1))
    for i in range(n_mels):
        lo, ce, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_f - lo) / max(ce - lo, 1e-9)
        dn = (hi - fft_f) / max(hi - ce, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, dn))
        # Slaney normalization
        fb[i] *= 2.0 / max(hi - lo, 1e-9)
    return fb.astype(np.float32)


def stft_mag(wav, n_fft: int, hop: int, win: int, center: bool = True,
             power: float = 1.0):
    """wav [B, L] -> magnitude [B, F, n_fft//2+1] (hann window)."""
    w = jnp.asarray(np.hanning(win + 1)[:-1].astype(np.float32))
    if center:
        pad = n_fft // 2
        wav = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (wav.shape[1] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    frames = wav[:, idx] * w                     # [B, F, n_fft]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    return mag if power == 1.0 else mag ** power


def voice_encoder_mels(wav, cfg: VoiceEncConfig):
    """16 kHz wav [B, L] -> [B, F, num_mels] amp-mels
    (voice_encoder/melspec.py: power-2 STFT -> mel -> sqrt ≈ amp)."""
    mag = stft_mag(wav, cfg.n_fft, cfg.hop_size, cfg.win_size, power=2.0)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft,
                                    cfg.num_mels))
    mel = jnp.einsum("bfn,mn->bfm", mag, fb)
    return jnp.sqrt(jnp.maximum(mel, 1e-8))


# ---------------------------------------------------------------------------
# voice encoder (LSTM speaker embedding)
# ---------------------------------------------------------------------------

def init_voice_encoder(key, cfg: VoiceEncConfig = VoiceEncConfig(),
                       dtype=jnp.float32):
    keys = jax.random.split(key, 7)
    h = cfg.hidden_size
    layers = []
    for i in range(3):
        din = cfg.num_mels if i == 0 else h
        lim = 1.0 / math.sqrt(h)
        layers.append({
            "wi": (jax.random.uniform(keys[2 * i], (din, 4 * h),
                                      jnp.float32, -lim, lim)
                   ).astype(dtype),
            "wh": (jax.random.uniform(keys[2 * i + 1], (h, 4 * h),
                                      jnp.float32, -lim, lim)
                   ).astype(dtype),
            "b": jnp.zeros((4 * h,), dtype),
        })
    return {"lstm": layers,
            "proj": {"w": (jax.random.normal(keys[6],
                                             (h, cfg.speaker_embed_size))
                           * 0.02).astype(dtype),
                     "b": jnp.zeros((cfg.speaker_embed_size,), dtype)}}


def _lstm_layer(p, x):
    """x [B, T, D] -> (outputs [B, T, H], last hidden [B, H]).
    torch LSTM gate order i, f, g, o."""
    b, t, _ = x.shape
    h = p["wh"].shape[0]
    pre = jnp.einsum("btd,dk->btk", x, p["wi"]) + p["b"]

    def step(carry, u):
        hprev, cprev = carry
        z = u + hprev @ p["wh"]
        i, f, g, o = jnp.split(z, 4, axis=-1)
        c = jax.nn.sigmoid(f) * cprev + jax.nn.sigmoid(i) * jnp.tanh(g)
        hh = jax.nn.sigmoid(o) * jnp.tanh(c)
        return (hh, c), hh

    init = (jnp.zeros((b, h), x.dtype), jnp.zeros((b, h), x.dtype))
    (hl, _), outs = jax.lax.scan(step, init, pre.transpose(1, 0, 2))
    return outs.transpose(1, 0, 2), hl


def voice_encoder_embed(params, mels):
    """mels [B, T, num_mels] -> L2-normalized speaker embeds [B, E]
    (voice_encoder.py:139-160)."""
    x = mels
    for lp in params["lstm"]:
        x, h_last = _lstm_layer(lp, x)
    e = jax.nn.relu(h_last @ params["proj"]["w"] + params["proj"]["b"])
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True),
                           1e-8)


# ---------------------------------------------------------------------------
# perceiver prompt resampler
# ---------------------------------------------------------------------------

def init_perceiver(key, cfg: T3Config, dtype=jnp.float32):
    d, nq = cfg.dim, cfg.perceiver_queries
    keys = jax.random.split(key, 6)
    lim = math.sqrt(3.0) * math.sqrt(2.0 / (nq + nq))
    lin = lambda k: {"w": (jax.random.normal(k, (d, d), jnp.float32)
                           * 0.02).astype(dtype),
                     "b": jnp.zeros((d,), dtype)}
    return {"query": jax.random.uniform(keys[0], (nq, d), jnp.float32,
                                        -lim, lim).astype(dtype),
            "norm": {"scale": jnp.ones((d,), dtype),
                     "bias": jnp.zeros((d,), dtype)},
            "q": lin(keys[1]), "k": lin(keys[2]), "v": lin(keys[3]),
            "o": lin(keys[4])}


def _pln(x, p):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]


def _perceiver_block(p, x1, x2, heads):
    """AttentionBlock2 (perceiver.py:113-170): shared LN on both
    inputs, MHA, out proj, residual on x1."""
    a = _pln(x1, p["norm"])
    b = _pln(x2, p["norm"])
    q = _dense(a, p["q"])
    k = _dense(b, p["k"])
    v = _dense(b, p["v"])
    bq, lq, d = q.shape
    hd = d // heads
    q = q.reshape(bq, lq, heads, hd).transpose(0, 2, 1, 3)
    k = k.reshape(bq, -1, heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(bq, -1, heads, hd).transpose(0, 2, 1, 3)
    w = jax.nn.softmax(
        jnp.einsum("bhld,bhsd->bhls", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(q.dtype)
    o = jnp.einsum("bhls,bhsd->bhld", w, v)
    o = o.transpose(0, 2, 1, 3).reshape(bq, lq, d)
    return x1 + _dense(o, p["o"])


def perceiver_resample(p, cfg: T3Config, h):
    """prompt speech embeds [B, T, d] -> [B, n_queries, d]
    (perceiver.py:173-230: cross- then self-attention, shared block)."""
    q = jnp.broadcast_to(p["query"], (h.shape[0],) + p["query"].shape)
    pre = _perceiver_block(p, q, h, cfg.perceiver_heads)
    return _perceiver_block(p, pre, pre, cfg.perceiver_heads)


# ---------------------------------------------------------------------------
# T3 llama backbone
# ---------------------------------------------------------------------------

def _init_layer(key, cfg: T3Config, dtype):
    keys = iter(jax.random.split(key, 8))
    d, f = cfg.dim, cfg.ffn_dim

    def lin(din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(next(keys), (din, dout),
                                        jnp.float32, -lim, lim
                                        ).astype(dtype)}

    return {"q": lin(d, d), "k": lin(d, d), "v": lin(d, d),
            "o": lin(d, d),
            "sa_norm": jnp.ones((d,), jnp.float32),
            "mlp_norm": jnp.ones((d,), jnp.float32),
            "w1": lin(d, f), "w3": lin(d, f), "w2": lin(f, d)}


def init_t3(key, cfg: T3Config = T3Config(), dtype=jnp.float32):
    keys = jax.random.split(key, 12)
    d = cfg.dim
    layers = [_init_layer(k, cfg, dtype)
              for k in jax.random.split(keys[0], cfg.n_layers)]
    emb = lambda k, n: (jax.random.normal(k, (n, d)) * 0.02).astype(dtype)
    return {
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.ones((d,), jnp.float32),
        "text_emb": emb(keys[1], cfg.text_vocab_size),
        "speech_emb": emb(keys[2], cfg.speech_vocab_size),
        "text_pos_emb": emb(keys[3], cfg.max_text_tokens),
        "speech_pos_emb": emb(keys[4], cfg.max_speech_tokens),
        "text_head": {"w": (jax.random.normal(
            keys[5], (d, cfg.text_vocab_size)) * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.text_vocab_size,), dtype)},
        "speech_head": {"w": (jax.random.normal(
            keys[6], (d, cfg.speech_vocab_size)) * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.speech_vocab_size,), dtype)},
        "spkr_enc": {"w": (jax.random.normal(
            keys[7], (cfg.speaker_embed_size, d)) * 0.02).astype(dtype),
            "b": jnp.zeros((d,), dtype)},
        "emotion_fc": {"w": (jax.random.normal(keys[8], (1, d)) * 0.02
                             ).astype(dtype)},
        "perceiver": init_perceiver(keys[9], cfg, dtype),
    }


def _t3_layer(x, lp, cos, sin, bias, cfg, kv=None, pos=None,
              return_kv: bool = False):
    """One llama block.  With kv=(k_cache, v_cache), x is the 1-token
    decode input at absolute position `pos`; with return_kv the fresh
    per-token k/v are returned for cache construction."""
    b, l, _ = x.shape
    n, hd = cfg.n_heads, cfg.head_dim
    y = _rms(x, lp["sa_norm"], cfg.eps)
    q = _dense(y, lp["q"]).reshape(b, l, n, hd)
    k = _dense(y, lp["k"]).reshape(b, l, n, hd)
    v = _dense(y, lp["v"]).reshape(b, l, n, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    k_new, v_new = k, v
    if kv is not None:
        k_cache, v_cache = kv
        k_cache = jax.lax.dynamic_update_slice(
            k_cache, k, (0, pos, 0, 0))
        v_cache = jax.lax.dynamic_update_slice(
            v_cache, v, (0, pos, 0, 0))
        k, v = k_cache, v_cache
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, n * hd)
    x = x + _dense(o, lp["o"])
    y = _rms(x, lp["mlp_norm"], cfg.eps)
    hsw = jax.nn.silu(_dense(y, lp["w1"]).astype(jnp.float32)
                      ).astype(x.dtype) * _dense(y, lp["w3"])
    x = x + _dense(hsw, lp["w2"])
    if kv is not None:
        return x, (k, v)
    if return_kv:
        return x, (k_new, v_new)
    return x


def t3_conditioning(params, cfg: T3Config, speaker_emb,
                    prompt_speech_tokens=None, emotion_adv: float = 0.5):
    """cond_enc forward (modules/cond_enc.py:63-99): [spkr(1); prompt
    (n_queries, optional); emotion(1)] -> [B, Lc, d]."""
    spkr = _dense(speaker_emb, params["spkr_enc"])[:, None]   # [B,1,d]
    parts = [spkr]
    if prompt_speech_tokens is not None:
        pe = params["speech_emb"][prompt_speech_tokens]
        pe = pe + params["speech_pos_emb"][
            jnp.arange(prompt_speech_tokens.shape[1])]
        parts.append(perceiver_resample(params["perceiver"], cfg, pe))
    emo = jnp.full((spkr.shape[0], 1, 1), emotion_adv, jnp.float32)
    parts.append(_dense(emo, params["emotion_fc"]).astype(spkr.dtype))
    return jnp.concatenate(parts, axis=1)


def t3_generate(params, cfg: T3Config, text_tokens, speaker_emb,
                prompt_speech_tokens=None, emotion_adv: float = 0.5,
                max_new_tokens: int = 256, temperature: float = 0.8,
                cfg_weight: float = 0.5, top_p: float = 0.95,
                min_p: float = 0.05, repetition_penalty: float = 1.2,
                key=None):
    """AR speech-token generation (t3.py:227-394).

    text_tokens: [1, Lt] WITH start/stop text tokens already added;
    speaker_emb: [1, E].  Returns (tokens [max_new_tokens] int32,
    valid [max_new_tokens] bool — False at/after stop token)."""
    cdt = cfg.compute_dtype
    use_cfg = cfg_weight > 0.0
    b = 2 if use_cfg else 1

    cond = t3_conditioning(params, cfg, speaker_emb,
                           prompt_speech_tokens, emotion_adv)
    text = params["text_emb"][text_tokens] \
        + params["text_pos_emb"][jnp.arange(text_tokens.shape[1])]
    if use_cfg:
        # row 1 = uncond: zeroed text embeddings (t3.py:97)
        text = jnp.concatenate([text, jnp.zeros_like(text)], axis=0)
        cond = jnp.broadcast_to(cond, (2,) + cond.shape[1:])
    bos = params["speech_emb"][jnp.full((b, 1), cfg.start_speech_token)]
    bos = bos + params["speech_pos_emb"][0]
    x = jnp.concatenate([cond.astype(cdt), text.astype(cdt),
                         bos.astype(cdt)], axis=1)

    l0 = x.shape[1]
    total = l0 + max_new_tokens
    cos_all, sin_all = llama3_scaled_rope(
        total, cfg.head_dim, cfg.rope_base, cfg.rope_scale_factor)
    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0,
                      jnp.finfo(jnp.float32).min)

    def prefill(x, lp):
        xo, (k, v) = _t3_layer(x, lp, cos_all[:l0], sin_all[:l0],
                               bias0, cfg, return_kv=True)
        pad = jnp.zeros((b, max_new_tokens, cfg.n_heads, cfg.head_dim),
                        k.dtype)
        return xo, (jnp.concatenate([k, pad], axis=1),
                    jnp.concatenate([v, pad], axis=1))

    x, (k_cache, v_cache) = jax.lax.scan(prefill, x, params["layers"])
    h_last = _rms(x[:, -1:], params["norm"], cfg.eps)

    def logits_of(h):
        return _dense(h[:, 0], params["speech_head"]).astype(jnp.float32)

    def sample(logits, counts, kf):
        """CFG combine + repetition penalty + temperature + min_p +
        top_p (t3.py:335-366)."""
        if use_cfg:
            logits = logits[0] + cfg_weight * (logits[0] - logits[1])
        else:
            logits = logits[0]
        seen = counts > 0
        pen = jnp.where(logits > 0, logits / repetition_penalty,
                        logits * repetition_penalty)
        logits = jnp.where(seen, pen, logits)
        logits = logits / max(temperature, 1e-5)
        probs = jax.nn.softmax(logits)
        # min_p: drop tokens below min_p * max prob
        keep = probs >= min_p * probs.max()
        logits = jnp.where(keep, logits, -jnp.inf)
        # top_p nucleus
        if top_p < 1.0:
            order = jnp.argsort(-logits)
            sp = jax.nn.softmax(logits[order])
            cum = jnp.cumsum(sp)
            cut = cum - sp > top_p
            logits = logits.at[order].set(
                jnp.where(cut, -jnp.inf, logits[order]))
        if kf is None:
            return jnp.argmax(logits).astype(jnp.int32)
        return jax.random.categorical(kf, logits).astype(jnp.int32)

    keys = (jax.random.split(key, max_new_tokens)
            if key is not None else None)

    def step(carry, i):
        h, kc, vc, counts, stopped = carry
        kf = None if keys is None else keys[i]
        tok = sample(logits_of(h), counts, kf)
        tok = jnp.where(stopped, cfg.stop_speech_token, tok)
        counts = counts.at[tok].add(1)
        stopped = jnp.logical_or(stopped, tok == cfg.stop_speech_token)
        pos = l0 + i
        emb = params["speech_emb"][tok][None, None]
        emb = emb + params["speech_pos_emb"][i + 1]
        xx = jnp.broadcast_to(emb, (b, 1, cfg.dim)).astype(cdt)
        cos_i = jax.lax.dynamic_slice(cos_all, (pos, 0),
                                      (1, cos_all.shape[1]))
        sin_i = jax.lax.dynamic_slice(sin_all, (pos, 0),
                                      (1, sin_all.shape[1]))
        valid = (jnp.arange(total) <= pos)
        bias = jnp.where(valid[None, None, None], 0.0,
                         jnp.finfo(jnp.float32).min)

        def dec_layer(xx, lkv):
            lp, kc_l, vc_l = lkv
            xo, (k2, v2) = _t3_layer(xx, lp, cos_i, sin_i, bias, cfg,
                                     kv=(kc_l, vc_l), pos=pos)
            return xo, (k2, v2)

        xx, (kc, vc) = jax.lax.scan(dec_layer, xx,
                                    (params["layers"], kc, vc))
        h = _rms(xx[:, -1:], params["norm"], cfg.eps)
        return (h, kc, vc, counts, stopped), (tok, stopped)

    counts0 = jnp.zeros((cfg.speech_vocab_size,), jnp.int32)
    (_, _, _, _, _), (toks, stop_flags) = jax.lax.scan(
        step, (h_last, k_cache, v_cache, counts0, jnp.asarray(False)),
        jnp.arange(max_new_tokens))
    valid = ~stop_flags
    return toks, valid
