"""YuE — lyrics-to-song music generation (two-stage LM + xcodec).

TPU-native re-implementation of /root/reference/models/TTS/yue/:

* mm token space (codecmanipulator.py:6-66 + mmtokenizer.py): llama
  text tokens, special tokens (<SOA> 32001, <EOA> 32002, <stage_1>
  32013, <xcodec> 32016, <stage_2> 32017), xcodec audio tokens at
  global offset 45334 (12 codebooks x 1024; stage 1 emits codebook 0
  only, stage 2 fills codebooks 1..7).
* Stage 1 (pipeline.py:417-560 _stage1_inference): a llama-7B CoT LM
  generates dual-track (vocal/instrumental interleaved) codebook-0
  tokens segment by segment — prompt head "Generate music from the
  given lyrics segment by segment.\\n[Genre] ..." then per segment
  [start_of_segment] lyrics [SOA] <xcodec> ... [EOA], with
  BlockTokenRangeProcessor masking non-audio ids, top-p sampling,
  repetition penalty 1.2, CFG guidance 1.5/1.2.
* Stage 2 (pipeline.py:570-660 _stage2_generate): a llama-1B
  upsampler; per 50 Hz frame the stage-1 codebook-0 token is teacher-
  forced and exactly 7 tokens (codebooks 1..7) are decoded greedily,
  blocked to the xcodec range.
* Decode (pipeline.py:736-760): 8-codebook RVQ lookup -> conv
  upsampling decoder (xcodec_mini_infer soundstream), per-track
  Vocos-style upsampling vocoders, low-frequency energy-matched mix.

The llama blocks reuse the chatterbox T3 stack (_t3_layer) with plain
RoPE (scale factor 1).  Tiny configs shrink every id range coherently
for tests.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .heartmula import llama3_scaled_rope, _rms, _dense
from .chatterbox import _t3_layer


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class YuEConfig:
    # stage-1 llama-7B dims (YuE-s1-7B)
    dim: int = 4096
    n_layers: int = 32
    n_heads: int = 32
    ffn_dim: int = 11008
    # stage-2 llama-1B dims (YuE-s2-1B-general)
    s2_dim: int = 2048
    s2_layers: int = 22
    s2_heads: int = 32
    s2_ffn: int = 5632
    rope_base: float = 10000.0
    eps: float = 1e-5
    # token space (codecmanipulator.py mm_v0_2_cfg)
    vocab_size: int = 83734
    soa: int = 32001
    eoa: int = 32002
    stage1_tok: int = 32013
    xcodec_sep: int = 32016
    stage2_tok: int = 32017
    xcodec_offset: int = 45334
    codebook_size: int = 1024
    n_codebooks: int = 8
    codec_fps: int = 50
    # codec decoder
    codec_dim: int = 512
    codec_rates: Tuple[int, ...] = (5, 4, 4, 2, 2)   # 16 kHz, hop 320
    sample_rate: int = 16000
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @classmethod
    def tiny(cls):
        return cls(dim=64, n_layers=2, n_heads=4, ffn_dim=128,
                   s2_dim=48, s2_layers=2, s2_heads=4, s2_ffn=96,
                   vocab_size=400, soa=101, eoa=102, stage1_tok=103,
                   xcodec_sep=104, stage2_tok=105, xcodec_offset=120,
                   codebook_size=16, n_codebooks=4, codec_dim=24,
                   codec_rates=(4, 2), sample_rate=16000)


@dataclasses.dataclass(frozen=True)
class _LayerCfg:
    """Shim so _t3_layer sees the right dims for either stage."""
    dim: int
    n_heads: int
    eps: float

    @property
    def head_dim(self):
        return self.dim // self.n_heads


# ---------------------------------------------------------------------------
# llama stacks
# ---------------------------------------------------------------------------

def _init_llama(key, dim, n_layers, ffn, dtype):
    def lin(k, din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(k, (din, dout), jnp.float32,
                                        -lim, lim).astype(dtype)}

    layers = []
    for lk in jax.random.split(key, n_layers):
        ks = iter(jax.random.split(lk, 8))
        layers.append({"q": lin(next(ks), dim, dim),
                       "k": lin(next(ks), dim, dim),
                       "v": lin(next(ks), dim, dim),
                       "o": lin(next(ks), dim, dim),
                       "sa_norm": jnp.ones((dim,), jnp.float32),
                       "mlp_norm": jnp.ones((dim,), jnp.float32),
                       "w1": lin(next(ks), dim, ffn),
                       "w3": lin(next(ks), dim, ffn),
                       "w2": lin(next(ks), ffn, dim)})
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def init_yue(key, cfg: YuEConfig = YuEConfig(), dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    emb = lambda k, n, d: (jax.random.normal(k, (n, d)) * 0.02
                           ).astype(dtype)
    return {
        "s1": {"layers": _init_llama(keys[0], cfg.dim, cfg.n_layers,
                                     cfg.ffn_dim, dtype),
               "norm": jnp.ones((cfg.dim,), jnp.float32),
               "embed": emb(keys[1], cfg.vocab_size, cfg.dim),
               "head": {"w": emb(keys[2], cfg.vocab_size, cfg.dim).T}},
        "s2": {"layers": _init_llama(keys[3], cfg.s2_dim, cfg.s2_layers,
                                     cfg.s2_ffn, dtype),
               "norm": jnp.ones((cfg.s2_dim,), jnp.float32),
               "embed": emb(keys[4], cfg.vocab_size, cfg.s2_dim),
               "head": {"w": emb(keys[5], cfg.vocab_size,
                                 cfg.s2_dim).T}},
        "codec": init_xcodec_decoder(keys[6], cfg, dtype),
    }


def _lm_generate(stack, cfg_l: _LayerCfg, rope_base, embed, head, norm,
                 prompt_ids, max_new_tokens: int, eos_id: int,
                 allow_mask, temperature: float = 1.0,
                 top_p: float = 0.93, repetition_penalty: float = 1.2,
                 min_new_tokens: int = 0, cfg_scale: float = 1.0,
                 uncond_prefix_len: int = 0, key=None,
                 eps: float = 1e-5):
    """Shared AR loop: prefill + scan decode with KV cache, constrained
    sampling (BlockTokenRangeProcessor -> allow_mask), repetition
    penalty, nucleus sampling, dual-batch CFG whose uncond row drops
    the first uncond_prefix_len prompt tokens (vendored HF generate's
    guidance path)."""
    vocab = embed.shape[0]
    use_cfg = cfg_scale != 1.0
    b = 2 if use_cfg else 1
    l0 = prompt_ids.shape[1]
    total = l0 + max_new_tokens
    cos_all, sin_all = llama3_scaled_rope(
        total, cfg_l.head_dim, rope_base, scale_factor=1)
    cdt = jnp.float32

    ids_b = jnp.broadcast_to(prompt_ids, (b, l0))
    x = embed[ids_b].astype(cdt)
    if use_cfg and uncond_prefix_len > 0:
        # uncond row: replace the head prompt with repeated padding of
        # its last token (context without the conditioning text)
        pos = jnp.arange(l0)
        x = x.at[1].set(jnp.where(
            (pos < uncond_prefix_len)[:, None],
            embed[prompt_ids[0, uncond_prefix_len]].astype(cdt),
            x[1]))
    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0,
                      jnp.finfo(jnp.float32).min)

    def prefill(x, lp):
        xo, (k, v) = _t3_layer(x, lp, cos_all[:l0], sin_all[:l0],
                               bias0, cfg_l, return_kv=True)
        pad = jnp.zeros((b, max_new_tokens, cfg_l.n_heads,
                         cfg_l.head_dim), k.dtype)
        return xo, (jnp.concatenate([k, pad], axis=1),
                    jnp.concatenate([v, pad], axis=1))

    x, (kc, vc) = jax.lax.scan(prefill, x, stack)
    h = _rms(x[:, -1:], norm, eps)
    keys = (jax.random.split(key, max_new_tokens)
            if key is not None else None)
    neg = jnp.finfo(jnp.float32).min

    def sample(logits, counts, i, kf):
        if use_cfg:
            logits = logits[1] + cfg_scale * (logits[0] - logits[1])
        else:
            logits = logits[0]
        seen = counts > 0
        pen = jnp.where(logits > 0, logits / repetition_penalty,
                        logits * repetition_penalty)
        logits = jnp.where(seen, pen, logits)
        logits = jnp.where(allow_mask, logits, neg)
        # min_new_tokens: forbid EOS early
        logits = jnp.where(
            (jnp.arange(vocab) == eos_id) & (i < min_new_tokens),
            neg, logits)
        logits = logits / max(temperature, 1e-5)
        if top_p < 1.0 and kf is not None:
            order = jnp.argsort(-logits)
            sp = jax.nn.softmax(logits[order])
            cum = jnp.cumsum(sp)
            cut = cum - sp > top_p
            logits = logits.at[order].set(jnp.where(cut, neg,
                                                    logits[order]))
        if kf is None:
            return jnp.argmax(logits).astype(jnp.int32)
        return jax.random.categorical(kf, logits).astype(jnp.int32)

    def step(carry, i):
        h, kc, vc, counts, stopped = carry
        kf = None if keys is None else keys[i]
        logits = _dense(h[:, 0], head).astype(jnp.float32)
        tok = sample(logits, counts, i, kf)
        tok = jnp.where(stopped, eos_id, tok)
        counts = counts.at[tok].add(1)
        stopped = jnp.logical_or(stopped, tok == eos_id)
        pos = l0 + i
        xx = jnp.broadcast_to(embed[tok][None, None],
                              (b, 1, cfg_l.dim)).astype(cdt)
        cos_i = jax.lax.dynamic_slice(cos_all, (pos, 0),
                                      (1, cos_all.shape[1]))
        sin_i = jax.lax.dynamic_slice(sin_all, (pos, 0),
                                      (1, sin_all.shape[1]))
        bias = jnp.where((jnp.arange(total) <= pos)[None, None, None],
                         0.0, neg)

        def dec(xx, lkv):
            lp, kl, vl = lkv
            xo, (k2, v2) = _t3_layer(xx, lp, cos_i, sin_i, bias, cfg_l,
                                     kv=(kl, vl), pos=pos)
            return xo, (k2, v2)

        xx, (kc, vc) = jax.lax.scan(dec, xx, (stack, kc, vc))
        h = _rms(xx[:, -1:], norm, eps)
        return (h, kc, vc, counts, stopped), (tok, stopped)

    counts0 = jnp.zeros((vocab,), jnp.int32)
    _, (toks, stop_flags) = jax.lax.scan(
        step, (h, kc, vc, counts0, jnp.asarray(False)),
        jnp.arange(max_new_tokens))
    return toks, ~stop_flags


# ---------------------------------------------------------------------------
# stage 1: lyrics -> interleaved codebook-0 tokens
# ---------------------------------------------------------------------------

def stage1_generate(params, cfg: YuEConfig, head_tokens,
                    segment_tokens: List[np.ndarray],
                    max_new_tokens: int = 512, temperature: float = 1.0,
                    key=None) -> List[Dict[str, np.ndarray]]:
    """head_tokens: np [Lh] text ids of the CoT head prompt; each
    segment_tokens[i]: np [Ls] ids of one lyrics section.  Returns per
    segment dict(vocal [T], inst [T]) codebook-0 codes (de-offset).

    Mirrors _stage1_inference (pipeline.py:417-560): context grows
    across segments; audio ids constrained to codebook 0 + EOA."""
    cfg_l = _LayerCfg(cfg.dim, cfg.n_heads, cfg.eps)
    s1 = params["s1"]
    vocab = cfg.vocab_size
    allow = np.zeros((vocab,), bool)
    lo = cfg.xcodec_offset
    # The reference blocks only text/special ranges (pipeline.py:516-521
    # BlockTokenRangeProcessor(0, 32002) + (32016, 32017)); we constrain
    # to the codebook-0 range the model is trained to emit, plus EOA.
    allow[lo:lo + cfg.codebook_size] = True
    allow[cfg.eoa] = True
    allow = jnp.asarray(allow)

    sos = np.asarray([cfg.soa, cfg.xcodec_sep], np.int32)
    context = list(np.asarray(head_tokens, np.int32))
    outputs = []
    for i, seg in enumerate(segment_tokens):
        guidance = 1.5 if i == 0 else 1.2
        seg_ids = list(np.asarray(seg, np.int32)) + list(sos)
        prompt = jnp.asarray(context + seg_ids, jnp.int32)[None]
        uncond_len = len(np.asarray(head_tokens)) if i == 0 else 0
        toks, valid = _lm_generate(
            s1["layers"], cfg_l, cfg.rope_base, s1["embed"],
            s1["head"], s1["norm"], prompt, max_new_tokens, cfg.eoa,
            allow,
            temperature=temperature, top_p=0.93,
            repetition_penalty=1.2, min_new_tokens=4,
            cfg_scale=guidance, uncond_prefix_len=uncond_len,
            key=None if key is None else jax.random.fold_in(key, i),
            eps=cfg.eps)
        toks = np.asarray(toks)
        n = int(np.asarray(valid).sum())
        codec_ids = toks[:n]
        codec_ids = codec_ids[:2 * (len(codec_ids) // 2)]
        pair = codec_ids.reshape(-1, 2)           # (n b) -> [T, 2]
        vocal = pair[:, 0] - lo
        inst = pair[:, 1] - lo
        outputs.append({"vocal": np.clip(vocal, 0,
                                         cfg.codebook_size - 1),
                        "inst": np.clip(inst, 0,
                                        cfg.codebook_size - 1)})
        context = context + seg_ids + list(codec_ids) + [cfg.eoa]
    return outputs


# ---------------------------------------------------------------------------
# stage 2: codebook-0 -> 8 codebooks
# ---------------------------------------------------------------------------

def stage2_generate(params, cfg: YuEConfig, cb0_codes):
    """cb0_codes: np [T] de-offset codebook-0 codes of ONE track ->
    [n_codebooks, T] codes (pipeline.py:570-660: per frame the cb0
    token is teacher-forced, 7 tokens decoded greedily constrained to
    the codebook-1..7 ranges)."""
    cfg_l = _LayerCfg(cfg.s2_dim, cfg.s2_heads, cfg.eps)
    s2 = params["s2"]
    t = int(np.asarray(cb0_codes).shape[0])
    nq = cfg.n_codebooks
    lo = cfg.xcodec_offset
    cb0 = jnp.asarray(np.asarray(cb0_codes), jnp.int32) + lo

    prompt = jnp.concatenate([
        jnp.asarray([cfg.soa, cfg.stage1_tok], jnp.int32), cb0,
        jnp.asarray([cfg.stage2_tok], jnp.int32)])[None]
    l0 = prompt.shape[1]
    total = l0 + t * nq
    cos_all, sin_all = llama3_scaled_rope(total, cfg_l.head_dim,
                                          cfg.rope_base, scale_factor=1)
    # per-codebook allowed ranges (BlockTokenRangeProcessor blocks
    # everything outside codebooks 1..7)
    vocab = cfg.vocab_size
    allow_rows = np.zeros((nq, vocab), bool)
    for q in range(1, nq):
        base = lo + q * cfg.codebook_size
        allow_rows[q, base:base + cfg.codebook_size] = True
    allow_rows = jnp.asarray(allow_rows)
    neg = jnp.finfo(jnp.float32).min

    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0, neg)
    x = s2["embed"][prompt].astype(jnp.float32)

    def prefill(x, lp):
        xo, (k, v) = _t3_layer(x, lp, cos_all[:l0], sin_all[:l0],
                               bias0, cfg_l, return_kv=True)
        pad = jnp.zeros((1, t * nq, cfg_l.n_heads, cfg_l.head_dim),
                        k.dtype)
        return xo, (jnp.concatenate([k, pad], axis=1),
                    jnp.concatenate([v, pad], axis=1))

    x, (kc, vc) = jax.lax.scan(prefill, x, s2["layers"])
    h = _rms(x[:, -1:], s2["norm"], cfg.eps)

    def step(carry, inp):
        h, kc, vc = carry
        frame_idx, q, pos = inp
        logits = _dense(h[:, 0], s2["head"]).astype(jnp.float32)[0]
        logits = jnp.where(allow_rows[q], logits, neg)
        sampled = jnp.argmax(logits).astype(jnp.int32)
        tok = jnp.where(q == 0, cb0[frame_idx], sampled)
        xx = s2["embed"][tok][None, None].astype(jnp.float32)
        cos_i = jax.lax.dynamic_slice(cos_all, (pos, 0),
                                      (1, cos_all.shape[1]))
        sin_i = jax.lax.dynamic_slice(sin_all, (pos, 0),
                                      (1, sin_all.shape[1]))
        bias = jnp.where((jnp.arange(total) <= pos)[None, None, None],
                         0.0, neg)

        def dec(xx, lkv):
            lp, kl, vl = lkv
            xo, (k2, v2) = _t3_layer(xx, lp, cos_i, sin_i, bias, cfg_l,
                                     kv=(kl, vl), pos=pos)
            return xo, (k2, v2)

        xx, (kc, vc) = jax.lax.scan(dec, xx, (s2["layers"], kc, vc))
        h = _rms(xx[:, -1:], s2["norm"], cfg.eps)
        return (h, kc, vc), tok

    frames = jnp.repeat(jnp.arange(t), nq)
    qs = jnp.tile(jnp.arange(nq), t)
    positions = l0 + jnp.arange(t * nq)
    (_, _, _), toks = jax.lax.scan(
        step, (h, kc, vc), (frames, qs, positions))
    toks = np.asarray(toks).reshape(t, nq).T       # [nq, T]
    codes = toks - lo - np.arange(nq)[:, None] * cfg.codebook_size
    # out-of-range fix-up: majority value per row (pipeline.py:724-731)
    codes = np.asarray(codes)
    for r in range(nq):
        bad = (codes[r] < 0) | (codes[r] >= cfg.codebook_size)
        if bad.any():
            vals, cnt = np.unique(codes[r][~bad], return_counts=True)
            fill = vals[np.argmax(cnt)] if vals.size else 0
            codes[r][bad] = fill
    return codes


# ---------------------------------------------------------------------------
# xcodec decoder (soundstream_hubert RVQ + conv upsampler)
# ---------------------------------------------------------------------------

def init_xcodec_decoder(key, cfg: YuEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 4 + 2 * len(cfg.codec_rates)))
    d = cfg.codec_dim
    cbs = (jax.random.normal(next(keys),
                             (cfg.n_codebooks, cfg.codebook_size, d))
           * 0.02).astype(dtype)
    ups = []
    ch = d
    for r in cfg.codec_rates:
        # repeat-x r then conv k=2r+1 (length-exact transposed-conv
        # equivalent that XLA fuses cleanly)
        ups.append({"w": (jax.random.normal(
            next(keys), (2 * r + 1, ch, max(ch // 2, 8))) * 0.05
            ).astype(dtype),
            "b": jnp.zeros((max(ch // 2, 8),), dtype), "r": r})
        ch = max(ch // 2, 8)
    return {"codebooks": cbs,
            "conv_in": {"w": (jax.random.normal(next(keys), (7, d, d))
                              * 0.05).astype(dtype),
                        "b": jnp.zeros((d,), dtype)},
            "ups": ups,
            "conv_out": {"w": (jax.random.normal(next(keys), (7, ch, 1))
                               * 0.05).astype(dtype),
                         "b": jnp.zeros((1,), dtype)}}


def xcodec_decode(params, cfg: YuEConfig, codes):
    """codes [nq, T] -> wav [T * prod(rates)] (RVQ sum + transposed-
    conv upsampling, xcodec_mini_infer soundstream decoder shape)."""
    emb = params["codebooks"][jnp.arange(cfg.n_codebooks)[:, None],
                              jnp.asarray(codes)]
    x = jnp.sum(emb, axis=0)[None]                 # [1, T, d]
    x = jax.lax.conv_general_dilated(
        x, params["conv_in"]["w"], (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC")) + params["conv_in"]["b"]
    for up in params["ups"]:
        x = jax.nn.elu(x)
        x = jnp.repeat(x, up["r"], axis=1)
        x = jax.lax.conv_general_dilated(
            x, up["w"], (1,), "SAME",
            dimension_numbers=("NHC", "HIO", "NHC")) + up["b"]
    x = jax.nn.elu(x)
    x = jax.lax.conv_general_dilated(
        x, params["conv_out"]["w"], (1,), "SAME",
        dimension_numbers=("NHC", "HIO", "NHC")) + params["conv_out"]["b"]
    return jnp.tanh(x[0, :, 0])
