"""IndexTTS-2 — emotion-controllable zero-shot TTS (reference
models/TTS/index_tts2/: gpt/model_v2.py UnifiedVoice, infer_v2.py,
utils/maskgct/models/codec/kmeans/repcodec_model.py,
configs/config.yaml).

Stages:
1. w2v-bert 2.0 features of the reference voice -> RepCodec semantic
   codes (FVQ, codebook 8192 x dim 8, l2-normalized) + conditioning
   mel;
2. UnifiedVoice GPT-2 (24 x 1280, 20 heads, learned positions):
   [conformer+perceiver speaker latents (32) + emotion vector,
   speed embeddings, text tokens, start_mel] -> AR semantic codes;
   emotion comes from an emotion-audio conformer+perceiver(1), an
   8-way emotion-weight matrix, or a Qwen-emo text hook
   (config.yaml emo_num [3,17,2,8,4,5,10,24]);
3. s2mel: codebook embeddings of the codes + gpt-latent projection ->
   length regulator (x1.72) -> seed-vc CFM DiT conditioned on the
   CAMPPlus style embedding -> 22.05 kHz mel (infer_v2.py:724-758) —
   the DiT/regulator/wavenet stack is SHARED with
   postprocessing/seedvc.py (config.yaml s2mel == seed-vc arch);
4. BigVGAN v2 22 kHz 80-band 256x (shared AMP-block vocoder,
   postprocessing/mmaudio_vae.py BigVGANConfig).

TPU-native: the GPT decode is one `lax.scan` with a preallocated KV
cache; conditioning encoders run once per prompt.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .lyric_encoder import (ConformerConfig, init_conformer,
                            conformer_forward)


@dataclasses.dataclass(frozen=True)
class IndexGPTConfig:
    # configs/config.yaml gpt:
    dim: int = 1280
    layers: int = 24
    heads: int = 20
    text_vocab: int = 12001        # number_text_tokens * types + 1
    mel_vocab: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    start_text_token: int = 0
    stop_text_token: int = 1
    max_text_tokens: int = 600
    max_mel_tokens: int = 1815
    cond_latents: int = 32
    cond_dim: int = 512            # conformer output_size
    cond_blocks: int = 6
    cond_ffn: int = 2048
    cond_heads: int = 8
    emo_dim: int = 512
    emo_blocks: int = 4
    emo_ffn: int = 1024
    emo_heads: int = 4
    w2v_dim: int = 1024            # w2v-bert hidden
    eps: float = 1e-5
    # emotion matrix groups (config.yaml emo_num)
    emo_num: Tuple[int, ...] = (3, 17, 2, 8, 4, 5, 10, 24)
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        return cls(dim=32, layers=2, heads=4, text_vocab=64,
                   mel_vocab=34, start_mel_token=32, stop_mel_token=33,
                   max_text_tokens=32, max_mel_tokens=64,
                   cond_latents=4, cond_dim=16, cond_blocks=1,
                   cond_ffn=32, cond_heads=2, emo_dim=16,
                   emo_blocks=1, emo_ffn=32, emo_heads=2, w2v_dim=12,
                   emo_num=(2, 2, 2, 2, 2, 2, 2, 2))


@dataclasses.dataclass(frozen=True)
class RepCodecConfig:
    # configs/config.yaml semantic_codec:
    codebook_size: int = 8192
    hidden: int = 1024             # w2v-bert feature dim
    codebook_dim: int = 8
    vocos_dim: int = 384
    vocos_ffn: int = 2048
    vocos_layers: int = 12

    @classmethod
    def tiny(cls):
        return cls(codebook_size=32, hidden=12, codebook_dim=4,
                   vocos_dim=16, vocos_ffn=32, vocos_layers=2)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True, std=0.02):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32)
               * std).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _ln(x, p, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return (y * p["w"] + p["b"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# RepCodec semantic codec (repcodec_model.py:34-141)
# ---------------------------------------------------------------------------

def _init_convnext(key, cfg: RepCodecConfig, dtype):
    """One VocosBackbone ConvNeXt block: dwconv k7 + LN + pw-ffn."""
    ks = iter(jax.random.split(key, 3))
    d = cfg.vocos_dim
    return {
        "dw": {"w": (jax.random.normal(next(ks), (7, 1, d), jnp.float32)
                     * 0.02).astype(dtype),
               "b": jnp.zeros((d,), dtype)},
        "norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "pw1": _lin(next(ks), d, cfg.vocos_ffn, dtype),
        "pw2": _lin(next(ks), cfg.vocos_ffn, d, dtype),
        "gamma": jnp.full((d,), 1e-6, jnp.float32),
    }


def _convnext(x, p):
    h = jnp.pad(x, ((0, 0), (3, 3), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, p["dw"]["w"].astype(x.dtype), (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1])
    h = h + p["dw"]["b"].astype(h.dtype)
    h = _ln(h, p["norm"])
    h = _dense(jax.nn.gelu(_dense(h, p["pw1"]), approximate=False),
               p["pw2"])
    return x + h * p["gamma"].astype(h.dtype)


def _init_vocos(key, cfg: RepCodecConfig, dtype):
    ks = iter(jax.random.split(key, 4))
    return {
        "embed": {"w": (jax.random.normal(
            next(ks), (7, cfg.hidden, cfg.vocos_dim), jnp.float32)
            * 0.02).astype(dtype),
            "b": jnp.zeros((cfg.vocos_dim,), dtype)},
        "norm": {"w": jnp.ones((cfg.vocos_dim,)),
                 "b": jnp.zeros((cfg.vocos_dim,))},
        "blocks": [_init_convnext(k, cfg, dtype)
                   for k in jax.random.split(next(ks),
                                             cfg.vocos_layers)],
        "final_norm": {"w": jnp.ones((cfg.vocos_dim,)),
                       "b": jnp.zeros((cfg.vocos_dim,))},
        "out": _lin(next(ks), cfg.vocos_dim, cfg.hidden, dtype),
    }


def _vocos(x, p):
    h = jnp.pad(x, ((0, 0), (3, 3), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, p["embed"]["w"].astype(x.dtype), (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    h = h + p["embed"]["b"].astype(h.dtype)
    h = _ln(h, p["norm"])
    for bp in p["blocks"]:
        h = _convnext(h, bp)
    return _dense(_ln(h, p["final_norm"]), p["out"])


def init_repcodec(key, cfg: RepCodecConfig, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 5))
    cb = jax.random.normal(next(ks),
                           (cfg.codebook_size, cfg.codebook_dim),
                           jnp.float32)
    return {
        "encoder": _init_vocos(next(ks), cfg, dtype),
        "decoder": _init_vocos(next(ks), cfg, dtype),
        "vq_in": _lin(next(ks), cfg.hidden, cfg.codebook_dim, dtype,
                      bias=False),
        "vq_out": _lin(next(ks), cfg.codebook_dim, cfg.hidden, dtype,
                       bias=False),
        "codebook": cb,
    }


def repcodec_encode(params, cfg: RepCodecConfig, features):
    """w2v features [B, T, hidden] -> codes [B, T] (FVQ with
    l2-normalized codebook, amphion_codec/quantize FactorizedVQ)."""
    h = _vocos(features, params["encoder"])
    z = _dense(h, params["vq_in"]).astype(jnp.float32)
    z = z / jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True),
                        1e-8)
    cb = params["codebook"]
    cb = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True),
                          1e-8)
    sim = jnp.einsum("btd,cd->btc", z, cb)
    return jnp.argmax(sim, axis=-1).astype(jnp.int32)


def repcodec_vq2emb(params, cfg: RepCodecConfig, codes):
    """codes [B, T] -> quantized feature embeddings [B, T, hidden]
    (quantizer.vq2emb, infer_v2.py:739)."""
    cb = params["codebook"]
    cb = cb / jnp.maximum(jnp.linalg.norm(cb, axis=-1, keepdims=True),
                          1e-8)
    return _dense(cb[codes], params["vq_out"])


def repcodec_decode(params, cfg: RepCodecConfig, codes):
    """codes -> reconstructed w2v-bert features."""
    return _vocos(repcodec_vq2emb(params, cfg, codes),
                  params["decoder"])


# ---------------------------------------------------------------------------
# perceiver resampler (gpt/perceiver.py; generic latents x dim)
# ---------------------------------------------------------------------------

def init_perceiver(key, n_latents, dim, ctx_dim, dtype=jnp.float32,
                   heads=8):
    ks = iter(jax.random.split(key, 8))
    return {
        "latents": (jax.random.normal(next(ks), (n_latents, dim),
                                      jnp.float32) * 0.02).astype(dtype),
        "ctx_proj": _lin(next(ks), ctx_dim, dim, dtype),
        "norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        "q": _lin(next(ks), dim, dim, dtype),
        "k": _lin(next(ks), dim, dim, dtype),
        "v": _lin(next(ks), dim, dim, dtype),
        "o": _lin(next(ks), dim, dim, dtype),
        "ff_norm": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
        "ff1": _lin(next(ks), dim, 2 * dim, dtype),
        "ff2": _lin(next(ks), 2 * dim, dim, dtype),
        "_heads": heads,
    }


def perceiver_pool(p, ctx):
    """ctx [B, T, ctx_dim] -> [B, n_latents, dim]."""
    b = ctx.shape[0]
    heads = p["_heads"]
    ctx = _dense(ctx, p["ctx_proj"])
    q0 = jnp.broadcast_to(p["latents"].astype(ctx.dtype)[None],
                          (b,) + p["latents"].shape)
    kv = jnp.concatenate([q0, ctx], axis=1)
    a = _ln(q0, p["norm"])
    bkv = _ln(kv, p["norm"])
    d = a.shape[-1]
    hd = d // heads
    q = _dense(a, p["q"]).reshape(b, -1, heads, hd)
    k = _dense(bkv, p["k"]).reshape(b, -1, heads, hd)
    v = _dense(bkv, p["v"]).reshape(b, -1, heads, hd)
    w = jax.nn.softmax(
        jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(v.dtype)
    o = jnp.einsum("bhls,bshd->blhd", w, v).reshape(b, -1, d)
    x = q0 + _dense(o, p["o"])
    h = _ln(x, p["ff_norm"])
    return x + _dense(jax.nn.gelu(_dense(h, p["ff1"]),
                                  approximate=False), p["ff2"])


# ---------------------------------------------------------------------------
# UnifiedVoice GPT
# ---------------------------------------------------------------------------

def init_unified_voice(key, cfg: IndexGPTConfig, dtype=jnp.float32):
    d = cfg.dim
    keys = iter(jax.random.split(key, 24))

    def block(k):
        ks = iter(jax.random.split(k, 6))
        return {
            "ln1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "q": _lin(next(ks), d, d, dtype),
            "k": _lin(next(ks), d, d, dtype),
            "v": _lin(next(ks), d, d, dtype),
            "o": _lin(next(ks), d, d, dtype),
            "ln2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "fc": _lin(next(ks), d, 4 * d, dtype),
            "proj": _lin(next(ks), 4 * d, d, dtype),
        }

    lks = jax.random.split(next(keys), cfg.layers)
    leaves = [block(k) for k in lks]
    cond_conf = ConformerConfig(dim=cfg.cond_dim,
                                n_heads=cfg.cond_heads,
                                ffn_dim=cfg.cond_ffn,
                                n_layers=cfg.cond_blocks)
    emo_conf = ConformerConfig(dim=cfg.emo_dim, n_heads=cfg.emo_heads,
                               ffn_dim=cfg.emo_ffn,
                               n_layers=cfg.emo_blocks)
    n_emo = int(sum(cfg.emo_num))
    return {
        "text_emb": (jax.random.normal(
            next(keys), (cfg.text_vocab, d), jnp.float32)
            * 0.02).astype(dtype),
        "mel_emb": (jax.random.normal(
            next(keys), (cfg.mel_vocab, d), jnp.float32)
            * 0.02).astype(dtype),
        "text_pos": (jax.random.normal(
            next(keys), (cfg.max_text_tokens + 2, d), jnp.float32)
            * 0.02).astype(dtype),
        "mel_pos": (jax.random.normal(
            next(keys), (cfg.max_mel_tokens + 2, d), jnp.float32)
            * 0.02).astype(dtype),
        "speed_emb": (jax.random.normal(next(keys), (2, d), jnp.float32)
                      * 0.02).astype(dtype),
        "cond_in": _lin(next(keys), cfg.w2v_dim, cfg.cond_dim, dtype),
        "cond_conformer": init_conformer(next(keys), cond_conf, dtype),
        "cond_perceiver": init_perceiver(next(keys), cfg.cond_latents,
                                         d, cfg.cond_dim, dtype,
                                         heads=cfg.cond_heads),
        "emo_in": _lin(next(keys), cfg.w2v_dim, cfg.emo_dim, dtype),
        "emo_conformer": init_conformer(next(keys), emo_conf, dtype),
        "emo_perceiver": init_perceiver(next(keys), 1, cfg.w2v_dim,
                                        cfg.emo_dim, dtype,
                                        heads=cfg.emo_heads),
        "emovec_layer": _lin(next(keys), cfg.w2v_dim, d, dtype),
        "emo_layer": _lin(next(keys), d, d, dtype),
        # emotion direction matrix (feat2.pt, grouped by emo_num)
        "emo_matrix": (jax.random.normal(next(keys), (n_emo,
                                                      cfg.w2v_dim),
                                         jnp.float32)).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
        "ln_f": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        # the reference stacks GPT2's ln_f with UnifiedVoice's own
        # final_norm (model_v2.py:565, :676)
        "final_norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "mel_head": _lin(next(keys), d, cfg.mel_vocab, dtype),
        "_cond_conf": cond_conf,
        "_emo_conf": emo_conf,
    }


def _gpt_block(x, bp, cfg, bias, kv=None, pos=None, return_kv=False):
    b, l, d = x.shape
    n = cfg.heads
    hd = d // n
    y = _ln(x, bp["ln1"], cfg.eps)
    q = _dense(y, bp["q"]).reshape(b, l, n, hd)
    k = _dense(y, bp["k"]).reshape(b, l, n, hd)
    v = _dense(y, bp["v"]).reshape(b, l, n, hd)
    k_new, v_new = k, v
    if kv is not None:
        kc, vc = kv
        kc = jax.lax.dynamic_update_slice(kc, k, (0, pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, pos, 0, 0))
        k, v = kc, vc
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, d)
    x = x + _dense(o, bp["o"])
    y = _ln(x, bp["ln2"], cfg.eps)
    x = x + _dense(jax.nn.gelu(_dense(y, bp["fc"]),
                               approximate=False), bp["proj"])
    if kv is not None:
        return x, (k, v)
    if return_kv:
        return x, (k_new, v_new)
    return x


def get_speaker_conditioning(params, cfg: IndexGPTConfig, w2v_feats):
    """w2v features [B, T, w2v_dim] -> [B, 32, dim]
    (conformer_perceiver, model_v2.py:519-530)."""
    x = _dense(w2v_feats, params["cond_in"])
    x = conformer_forward(params["cond_conformer"],
                          params["_cond_conf"], x)
    return perceiver_pool(params["cond_perceiver"], x)


def get_emo_vector(params, cfg: IndexGPTConfig, w2v_feats):
    """Emotion audio -> 1024-d emo vector (emo conformer +
    1-latent perceiver, model_v2.py:excerpt inference_speech)."""
    x = _dense(w2v_feats, params["emo_in"])
    x = conformer_forward(params["emo_conformer"], params["_emo_conf"],
                          x)
    return perceiver_pool(params["emo_perceiver"], x)[:, 0]


def emo_vector_from_weights(params, cfg: IndexGPTConfig, weights):
    """8 emotion weights -> blended 1024-d vector via the grouped
    emotion matrix (infer_v2 emo_vec path; feat2.pt + emo_num)."""
    w = jnp.asarray(weights, jnp.float32)
    mat = params["emo_matrix"].astype(jnp.float32)
    bounds = np.concatenate([[0], np.cumsum(cfg.emo_num)])
    parts = [mat[bounds[i]:bounds[i + 1]].mean(axis=0)
             for i in range(len(cfg.emo_num))]
    return jnp.einsum("e,ed->d", w, jnp.stack(parts))[None]


def unified_voice_generate(params, cfg: IndexGPTConfig, text_tokens,
                           spk_cond, emo_vec, use_speed: bool = False,
                           max_new_tokens: int = 256,
                           temperature: float = 0.8, top_k: int = 30,
                           key=None):
    """AR semantic-code generation (model_v2.py inference_speech).

    text_tokens [1, Lt] raw ids (start/stop added here); spk_cond
    [1, 32, dim]; emo_vec [1, w2v_dim].  Returns (codes
    [max_new_tokens], valid mask, gpt latents [max_new_tokens, dim])."""
    cdt = cfg.compute_dtype
    b = 1
    d = cfg.dim
    emo = _dense(_dense(emo_vec, params["emovec_layer"]),
                 params["emo_layer"])
    conds = spk_cond + emo[:, None]
    # both speed embeddings are appended (inference_speech:
    # duration_emb_half then duration_emb)
    dur_half = params["speed_emb"][1][None, None]
    dur = params["speed_emb"][0][None, None]
    conds = jnp.concatenate(
        [conds, dur_half.astype(conds.dtype),
         dur.astype(conds.dtype)], axis=1)

    ids = jnp.concatenate(
        [jnp.full((1, 1), cfg.start_text_token, jnp.int32),
         text_tokens.astype(jnp.int32),
         jnp.full((1, 1), cfg.stop_text_token, jnp.int32)], axis=1)
    lt = ids.shape[1]
    text = params["text_emb"][ids] + params["text_pos"][:lt][None]
    bos = params["mel_emb"][jnp.full((1, 1), cfg.start_mel_token)] \
        + params["mel_pos"][0]
    x = jnp.concatenate([conds.astype(cdt), text.astype(cdt),
                         bos.astype(cdt)], axis=1)

    l0 = x.shape[1]
    total = l0 + max_new_tokens
    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0,
                      jnp.finfo(jnp.float32).min)

    def prefill(x, bp):
        xo, (k, v) = _gpt_block(x, bp, cfg, bias0, return_kv=True)
        pad = jnp.zeros((b, max_new_tokens, cfg.heads, d // cfg.heads),
                        k.dtype)
        return xo, (jnp.concatenate([k, pad], 1),
                    jnp.concatenate([v, pad], 1))

    def final_norm(y):
        y = _ln(y, params["ln_f"], cfg.eps)
        if "final_norm" in params:
            # the reference stacks LayerNorms: GPT2 ln_f then the
            # UnifiedVoice final_norm (model_v2.py:565, :676)
            y = _ln(y, params["final_norm"], cfg.eps)
        return y

    x, (kc, vc) = jax.lax.scan(prefill, x, params["blocks"])
    h = final_norm(x[:, -1:])

    keys = (jax.random.split(key, max_new_tokens)
            if key is not None else None)

    def step(carry, i):
        h, kc, vc, stopped = carry
        logits = _dense(h[:, 0], params["mel_head"]) \
            .astype(jnp.float32)[0]
        # never emit start token
        logits = logits.at[cfg.start_mel_token].set(-jnp.inf)
        if keys is None:
            tok = jnp.argmax(logits).astype(jnp.int32)
        else:
            lg = logits / max(temperature, 1e-5)
            if top_k and top_k < cfg.mel_vocab:
                kth = jnp.sort(lg)[-top_k]
                lg = jnp.where(lg < kth, -jnp.inf, lg)
            tok = jax.random.categorical(keys[i], lg).astype(jnp.int32)
        tok = jnp.where(stopped, cfg.stop_mel_token, tok)
        stopped = jnp.logical_or(stopped, tok == cfg.stop_mel_token)
        pos = l0 + i
        emb = params["mel_emb"][tok][None, None] \
            + params["mel_pos"][i + 1]
        xx = emb.astype(cdt)
        att = jnp.arange(total) <= pos
        bias = jnp.where(att[None, None, None], 0.0,
                         jnp.finfo(jnp.float32).min)

        def dec(xx, lkv):
            bp, kcl, vcl = lkv
            xo, (k2, v2) = _gpt_block(xx, bp, cfg, bias, kv=(kcl, vcl),
                                      pos=pos)
            return xo, (k2, v2)

        xx, (kc, vc) = jax.lax.scan(dec, xx,
                                    (params["blocks"], kc, vc))
        h = final_norm(xx[:, -1:])
        # gpt latent for s2mel = final-norm hidden at this position
        return (h, kc, vc, stopped), (tok, stopped, h[0, 0])

    (h, kc, vc, _), (toks, stops, latents) = jax.lax.scan(
        step, (h, kc, vc, jnp.asarray(False)),
        jnp.arange(max_new_tokens))
    valid = jnp.logical_and(jnp.logical_not(stops),
                            toks != cfg.stop_mel_token)
    return toks, valid, latents
