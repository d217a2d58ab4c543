"""Whisper speech transcription — the agent's transcribe tool backend
(reference wangp-agent transcription.py:40 loads faster-whisper
medium; the repo's agent exposes `transcribe_fn(path) -> text` as a
hook, agent.py:144-204).

Implements the Whisper DECODER on top of the encoder already shared
with seed-vc (postprocessing/seedvc.py whisper_encode): token + learned
position embeddings, pre-LN blocks with causal self-attention and
cross-attention to the 50 Hz encoder states, logits tied to the token
embedding.  Greedy decode with the standard special-token prelude
<|sot|><|lang|><|transcribe|><|notimestamps|> ... <|eot|>.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..postprocessing.seedvc import (WhisperEncConfig,
                                     init_whisper_encoder,
                                     whisper_encode)


@dataclasses.dataclass(frozen=True)
class WhisperDecConfig:
    vocab: int = 51865             # whisper multilingual
    d_model: int = 768             # small
    heads: int = 12
    layers: int = 12
    max_tokens: int = 448
    # special ids (openai/whisper tokenizer)
    eot: int = 50257
    sot: int = 50258
    lang_en: int = 50259
    task_transcribe: int = 50359
    no_timestamps: int = 50363

    @classmethod
    def tiny(cls):
        return cls(vocab=300, d_model=32, heads=4, layers=2,
                   max_tokens=32, eot=257, sot=258, lang_en=259,
                   task_transcribe=260, no_timestamps=261)


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


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def init_whisper_decoder(key, cfg: WhisperDecConfig,
                         dtype=jnp.float32):
    d = cfg.d_model
    keys = iter(jax.random.split(key, cfg.layers * 12 + 8))
    ln = lambda: {"scale": jnp.ones((d,), dtype),
                  "bias": jnp.zeros((d,), dtype)}
    layers = []
    for _ in range(cfg.layers):
        layers.append({
            "ln1": ln(),
            "q": _lin(next(keys), d, d, dtype),
            "k": _lin(next(keys), d, d, dtype, bias=False),
            "v": _lin(next(keys), d, d, dtype),
            "o": _lin(next(keys), d, d, dtype),
            "ln_ca": ln(),
            "ca_q": _lin(next(keys), d, d, dtype),
            "ca_k": _lin(next(keys), d, d, dtype, bias=False),
            "ca_v": _lin(next(keys), d, d, dtype),
            "ca_o": _lin(next(keys), d, d, dtype),
            "ln2": ln(),
            "fc1": _lin(next(keys), d, 4 * d, dtype),
            "fc2": _lin(next(keys), 4 * d, d, dtype),
        })
    return {
        "tok_emb": (jax.random.normal(next(keys), (cfg.vocab, d),
                                      jnp.float32) * 0.02
                    ).astype(dtype),
        "pos_emb": (jax.random.normal(next(keys), (cfg.max_tokens, d),
                                      jnp.float32) * 0.01
                    ).astype(dtype),
        "layers": layers,
        "ln_post": ln(),
    }


def _mha(q, k, v, heads, causal=False):
    b, lq, d = q.shape
    hd = d // heads
    q = q.reshape(b, lq, heads, hd)
    k = k.reshape(b, -1, heads, hd)
    v = v.reshape(b, -1, heads, hd)
    s = jnp.einsum("blhd,bshd->bhls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((lq, lq), bool))
        s = jnp.where(mask[None, None], s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhls,bshd->blhd", a, v).reshape(b, lq, d)


def whisper_decode_logits(params, cfg: WhisperDecConfig, tokens,
                          enc_states):
    """tokens [B, L] -> logits [B, L, vocab] (full forward; transcribe
    re-runs the prefix per step — fine for short clips)."""
    x = params["tok_emb"][tokens] \
        + params["pos_emb"][:tokens.shape[1]][None]
    for lp in params["layers"]:
        h = _ln(x, lp["ln1"])
        x = x + _dense(_mha(_dense(h, lp["q"]), _dense(h, lp["k"]),
                            _dense(h, lp["v"]), cfg.heads,
                            causal=True), lp["o"])
        h = _ln(x, lp["ln_ca"])
        x = x + _dense(_mha(_dense(h, lp["ca_q"]),
                            _dense(enc_states, lp["ca_k"]),
                            _dense(enc_states, lp["ca_v"]),
                            cfg.heads), lp["ca_o"])
        h = _ln(x, lp["ln2"])
        x = x + _dense(jax.nn.gelu(_dense(h, lp["fc1"]),
                                   approximate=True), lp["fc2"])
    x = _ln(x, params["ln_post"])
    return jnp.einsum("bld,vd->blv", x, params["tok_emb"])


def transcribe_tokens(dec_params, cfg: WhisperDecConfig, enc_states,
                      max_new: int = 64) -> List[int]:
    """Greedy decode; returns the text token ids (special prelude and
    eot stripped)."""
    prelude = [cfg.sot, cfg.lang_en, cfg.task_transcribe,
               cfg.no_timestamps]
    toks = list(prelude)
    for _ in range(min(max_new, cfg.max_tokens - len(prelude) - 1)):
        ids = jnp.asarray([toks], jnp.int32)
        logits = whisper_decode_logits(dec_params, cfg, ids,
                                       enc_states)
        nxt = int(jnp.argmax(logits[0, -1]))
        if nxt == cfg.eot:
            break
        toks.append(nxt)
    return toks[len(prelude):]


class WhisperTranscriber:
    """End-to-end transcriber; detokenize_fn maps token ids to text
    (a real BPE when the tokenizer asset is present, byte fallback
    otherwise)."""

    def __init__(self, enc_params=None, dec_params=None,
                 enc_cfg: Optional[WhisperEncConfig] = None,
                 dec_cfg: Optional[WhisperDecConfig] = None,
                 detokenize_fn: Optional[Callable] = None,
                 tiny: bool = False, seed: int = 0):
        self.enc_cfg = enc_cfg or (WhisperEncConfig.tiny() if tiny
                                   else WhisperEncConfig())
        self.dec_cfg = dec_cfg or (WhisperDecConfig.tiny() if tiny
                                   else WhisperDecConfig())
        k1, k2 = jax.random.split(jax.random.key(seed))
        self.enc_params = enc_params or init_whisper_encoder(
            k1, self.enc_cfg)
        self.dec_params = dec_params or init_whisper_decoder(
            k2, self.dec_cfg)
        self.detokenize_fn = detokenize_fn

    def transcribe_wave(self, wav: np.ndarray, sample_rate: int,
                        max_new: int = 64) -> str:
        w = np.asarray(wav, np.float32)
        if w.ndim == 2:
            w = w.mean(axis=-1)
        sr = self.enc_cfg.sample_rate
        if sample_rate != sr:
            n = int(round(w.shape[0] * sr / sample_rate))
            xi = np.linspace(0, w.shape[0] - 1, n)
            w = np.interp(xi, np.arange(w.shape[0]), w) \
                .astype(np.float32)
        if w.shape[0] < self.enc_cfg.n_fft:
            w = np.pad(w, (0, self.enc_cfg.n_fft - w.shape[0]))
        enc = whisper_encode(self.enc_params, self.enc_cfg,
                             jnp.asarray(w)[None])
        ids = transcribe_tokens(self.dec_params, self.dec_cfg, enc,
                                max_new=max_new)
        if self.detokenize_fn is not None:
            return self.detokenize_fn(ids)
        # byte fallback: printable ascii range only
        return "".join(chr(i % 95 + 32) for i in ids)

    def __call__(self, audio_path: str) -> str:
        """agent.py transcribe_fn contract: path -> text."""
        from . import media
        wav, sr = media.read_wav(audio_path)
        dur = wav.shape[0] / max(sr, 1)
        # ~8 tokens per second of speech bounds the greedy loop
        return self.transcribe_wave(wav, sr,
                                    max_new=min(64, int(dur * 8) + 4))


def make_transcribe_fn(tiny: bool = False) -> Callable[[str], str]:
    return WhisperTranscriber(tiny=tiny)
