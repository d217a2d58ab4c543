"""Qwen3-TTS (12 Hz) speech generation, TPU-native.

Re-implementation of /root/reference/models/TTS/qwen3/core/:
- models/modeling_qwen3_tts.py — the TALKER, a Qwen3-style decoder
  (GQA + per-head qk RMSNorm + SwiGLU, Qwen3TTSTalkerAttention:781) that
  autoregressively emits the FIRST codec-group token per 12 Hz frame
  (codec_head) while a 5-layer CODE-PREDICTOR sub-decoder
  (Qwen3TTSTalkerCodePredictorModel:1069) expands each frame to all
  `num_code_groups` tokens (MTP: inputs [projected talker hidden,
  emb(code_0), per-group embs...], one lm_head per group,
  forward_sub_talker_finetune:1975 shows the layout);
- tokenizer_12hz/modeling_qwen3_tts_tokenizer_v2.py — the codec decoder:
  split residual VQ (semantic 1 + acoustic rest, EuclideanCodebook decode
  embedding_sum / cluster_usage), causal pre-conv, an 8-layer
  sliding-window(72) transformer with LayerScale, ConvNeXt upsampling
  (x2 x2) and a DAC-style SnakeBeta decoder stack (upsample rates
  (8, 5, 4, 3)) -> 24 kHz waveform.

TPU notes: the talker frame loop is a `lax.scan` carrying the KV cache;
each frame's 31-step code-predictor expansion runs as an inner scan over
a fixed 1+32-token buffer (full attention with a causal mask — the
sequence is tiny).  The codec decoder is one jit over static shapes.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# configs (configuration_qwen3_tts.py:372-440; tokenizer v2 config:74-114)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class TalkerConfig:
    vocab_size: int = 4206           # codec vocab incl. control ids
    hidden_size: int = 1024
    intermediate_size: int = 2048
    n_layers: int = 20
    n_heads: int = 16
    n_kv_heads: int = 2
    head_dim: int = 128
    rope_theta: float = 10000.0
    eps: float = 1e-6
    num_code_groups: int = 32
    text_vocab_size: int = 151936
    text_hidden_size: int = 2048
    codec_eos_token_id: int = 4198
    codec_pad_id: int = 4196
    codec_bos_id: int = 4197
    compute_dtype: Any = jnp.float32


@dataclasses.dataclass(frozen=True)
class CodePredictorConfig:
    vocab_size: int = 2048
    hidden_size: int = 1024
    intermediate_size: int = 3072
    n_layers: int = 5
    n_heads: int = 16
    n_kv_heads: int = 16
    head_dim: int = 128
    rope_theta: float = 10000.0
    eps: float = 1e-6


@dataclasses.dataclass(frozen=True)
class CodecDecoderConfig:
    codebook_size: int = 2048
    codebook_dim: int = 512
    hidden_size: int = 1024
    latent_dim: int = 1024
    num_quantizers: int = 16
    n_heads: int = 16
    n_kv_heads: int = 16
    head_dim: int = 64
    intermediate_size: int = 3072
    n_layers: int = 8
    sliding_window: int = 72
    rope_theta: float = 10000.0
    eps: float = 1e-5
    layer_scale_init: float = 0.01
    upsample_rates: Tuple[int, ...] = (8, 5, 4, 3)
    upsampling_ratios: Tuple[int, ...] = (2, 2)
    decoder_dim: int = 1536
    sample_rate: int = 24000


# ---------------------------------------------------------------------------
# shared Qwen3 decoder-layer machinery
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _lin_p(key, din, dout, dtype, bias=False):
    lim = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _rope_tables(seq_len, head_dim, theta):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                           / head_dim))
    ang = np.outer(np.arange(seq_len), inv)
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_rope(x, cos, sin):
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s
            ).astype(x.dtype)


def _init_layer(key, dim, ffn, n, nkv, hd, dtype, qk_norm=True):
    ks = iter(jax.random.split(key, 8))
    p = {
        "input_norm": jnp.ones((dim,), jnp.float32),
        "q": _lin_p(next(ks), dim, n * hd, dtype),
        "k": _lin_p(next(ks), dim, nkv * hd, dtype),
        "v": _lin_p(next(ks), dim, nkv * hd, dtype),
        "o": _lin_p(next(ks), n * hd, dim, dtype),
        "post_norm": jnp.ones((dim,), jnp.float32),
        "gate": _lin_p(next(ks), dim, ffn, dtype),
        "up": _lin_p(next(ks), dim, ffn, dtype),
        "down": _lin_p(next(ks), ffn, dim, dtype),
    }
    if qk_norm:
        p["q_norm"] = jnp.ones((hd,), jnp.float32)
        p["k_norm"] = jnp.ones((hd,), jnp.float32)
    return p


def _layer_fwd(lp, x, cos, sin, bias, n, nkv, hd, eps, scale=None,
               layer_scales=None):
    b, l, _ = x.shape
    y = _rms(x, lp["input_norm"], eps)
    q = _dense(y, lp["q"]).reshape(b, l, n, hd)
    k = _dense(y, lp["k"]).reshape(b, l, nkv, hd)
    v = _dense(y, lp["v"]).reshape(b, l, nkv, hd)
    if "q_norm" in lp:
        q = _rms(q, lp["q_norm"], eps)
        k = _rms(k, lp["k_norm"], eps)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    if nkv != n:
        k = jnp.repeat(k, n // nkv, axis=2)
        v = jnp.repeat(v, n // nkv, axis=2)
    sc = 1.0 / math.sqrt(hd) if scale is None else scale
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) * sc
    a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, n * hd)
    o = _dense(o, lp["o"])
    if layer_scales is not None:
        o = o * layer_scales[0]
    x = x + o
    y = _rms(x, lp["post_norm"], eps)
    h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                    ).astype(x.dtype) * _dense(y, lp["up"])
    h = _dense(h, lp["down"])
    if layer_scales is not None:
        h = h * layer_scales[1]
    return x + h


# ---------------------------------------------------------------------------
# talker + code predictor
# ---------------------------------------------------------------------------

def init_talker(key, cfg: TalkerConfig, pcfg: CodePredictorConfig,
                dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    h, ph = cfg.hidden_size, pcfg.hidden_size

    def stack(fn, n):
        leaves = [fn(k) for k in jax.random.split(next(keys), n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    talker_layers = stack(
        lambda k: _init_layer(k, h, cfg.intermediate_size, cfg.n_heads,
                              cfg.n_kv_heads, cfg.head_dim, dtype),
        cfg.n_layers)
    pred_layers = stack(
        lambda k: _init_layer(k, ph, pcfg.intermediate_size, pcfg.n_heads,
                              pcfg.n_kv_heads, pcfg.head_dim, dtype),
        pcfg.n_layers)
    g = cfg.num_code_groups
    return {
        "codec_embedding": (jax.random.normal(
            next(keys), (cfg.vocab_size, h)) * 0.02).astype(dtype),
        "text_embedding": (jax.random.normal(
            next(keys), (cfg.text_vocab_size, cfg.text_hidden_size))
            * 0.02).astype(dtype),
        "text_projection": {
            "fc1": _lin_p(next(keys), cfg.text_hidden_size,
                          cfg.text_hidden_size, dtype, bias=True),
            "fc2": _lin_p(next(keys), cfg.text_hidden_size, h, dtype,
                          bias=True)},
        "layers": talker_layers,
        "norm": jnp.ones((h,), jnp.float32),
        "codec_head": _lin_p(next(keys), h, cfg.vocab_size, dtype),
        "predictor": {
            "proj": _lin_p(next(keys), h, ph, dtype, bias=True),
            # group-0 embedding reuses the talker codec_embedding
            # (get_input_embeddings, forward_sub_talker_finetune:1986)
            "codec_embedding": (jax.random.normal(
                next(keys), (g - 1, pcfg.vocab_size, ph)) * 0.02
                ).astype(dtype),
            "layers": pred_layers,
            "norm": jnp.ones((ph,), jnp.float32),
            "lm_head": (jax.random.normal(
                next(keys), (g - 1, ph, pcfg.vocab_size)) * 0.02
                ).astype(dtype),
        },
    }


def text_to_talker_embeds(params, cfg: TalkerConfig, text_ids):
    """text ids -> projected talker-space embeds (text_embedding +
    ResizeMLP text_projection, modeling:1761-1763)."""
    e = params["text_embedding"][text_ids].astype(jnp.float32)
    h = _dense(e, params["text_projection"]["fc1"])
    h = jax.nn.silu(h)
    return _dense(h, params["text_projection"]["fc2"])


def _predict_groups(params, cfg: TalkerConfig, pcfg: CodePredictorConfig,
                    talker_hidden, code0, key=None, temperature=0.0):
    """Expand one frame: talker hidden [B, H] + code_0 [B] ->
    codes [B, G] (sequential MTP over groups 1..G-1)."""
    pp = params["predictor"]
    g = cfg.num_code_groups
    b = code0.shape[0]
    ph = pcfg.hidden_size
    buf_len = g + 1
    cos, sin = _rope_tables(buf_len, pcfg.head_dim, pcfg.rope_theta)

    h0 = _dense(talker_hidden.astype(jnp.float32), pp["proj"])
    # group-0 embedding comes from the TALKER codec table (hidden sizes
    # match in the shipped config; forward_sub_talker_finetune:1986)
    e0 = params["codec_embedding"][code0].astype(jnp.float32)
    if e0.shape[-1] != ph:
        e0 = e0[..., :ph]
    buf = jnp.zeros((b, buf_len, ph), jnp.float32)
    buf = buf.at[:, 0].set(h0)
    buf = buf.at[:, 1].set(e0)

    causal = jnp.tril(jnp.ones((buf_len, buf_len), bool))
    codes0 = jnp.zeros((b, g), jnp.int32).at[:, 0].set(code0)

    def group_step(carry, i):
        buf, codes = carry
        # positions beyond i+1 are zero but masked out by causality for
        # the row we read (i+1)
        bias = jnp.where(causal[None, None], 0.0,
                         jnp.finfo(jnp.float32).min)
        x = buf
        for li in range(pcfg.n_layers):
            lp = jax.tree.map(lambda a: a[li], pp["layers"])
            x = _layer_fwd(lp, x, cos, sin, bias, pcfg.n_heads,
                           pcfg.n_kv_heads, pcfg.head_dim, pcfg.eps)
        hli = _rms(x[:, i + 1], pp["norm"], pcfg.eps)
        logits = jnp.einsum("bh,hv->bv", hli.astype(jnp.float32),
                            jnp.take(pp["lm_head"], i, axis=0
                                     ).astype(jnp.float32))
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        codes = jax.lax.dynamic_update_index_in_dim(
            codes.T, nxt, jnp.asarray(i) + 1, axis=0).T
        emb = jnp.take(pp["codec_embedding"], i, axis=0)[nxt]
        # write emb at position i+2 (next group's input)
        def write(buf):
            return jax.lax.dynamic_update_slice(
                buf, emb.astype(jnp.float32)[:, None],
                (0, i + 2, 0))
        buf = jax.lax.cond(i + 2 < buf_len, write, lambda b_: b_, buf)
        return (buf, codes), None

    (_, codes), _ = jax.lax.scan(group_step, (buf, codes0),
                                 jnp.arange(g - 1))
    return codes


def talker_generate(params, cfg: TalkerConfig, pcfg: CodePredictorConfig,
                    text_ids, max_frames: int = 64,
                    temperature: float = 0.0, key=None):
    """text_ids: [B, L] token ids.  Returns codes [B, T, G] int32 and a
    validity mask [B, T] (frames before the codec EOS).

    The loop mirrors generate_stepwise (modeling:1836-1965): prefill =
    projected text embeds + codec BOS embed; each step samples code_0 from
    codec_head, expands groups via the code predictor, feeds
    emb(code_0) + pad embed back."""
    cdt = cfg.compute_dtype
    b, l0 = text_ids.shape
    h = cfg.hidden_size
    n, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    total = l0 + 1 + max_frames
    cos_all, sin_all = _rope_tables(total, hd, cfg.rope_theta)

    text_emb = text_to_talker_embeds(params, cfg, text_ids)
    bos = params["codec_embedding"][cfg.codec_bos_id].astype(jnp.float32)
    pad = params["codec_embedding"][cfg.codec_pad_id].astype(jnp.float32)
    x = jnp.concatenate([text_emb,
                         jnp.broadcast_to(bos, (b, 1, h))], axis=1)
    lp0 = l0 + 1

    causal = jnp.tril(jnp.ones((lp0, lp0), bool))
    bias = jnp.where(causal[None, None], 0.0, jnp.finfo(jnp.float32).min)

    # ---- prefill with padded KV cache --------------------------------
    def prefill_layer(x, lp):
        y = _rms(x, lp["input_norm"], cfg.eps)
        q = _dense(y, lp["q"]).reshape(b, lp0, n, hd)
        k = _dense(y, lp["k"]).reshape(b, lp0, nkv, hd)
        v = _dense(y, lp["v"]).reshape(b, lp0, nkv, hd)
        if "q_norm" in lp:
            q = _rms(q, lp["q_norm"], cfg.eps)
            k = _rms(k, lp["k_norm"], cfg.eps)
        q = _apply_rope(q, cos_all[:lp0], sin_all[:lp0])
        k = _apply_rope(k, cos_all[:lp0], sin_all[:lp0])
        kk = jnp.repeat(k, n // nkv, axis=2) if nkv != n else k
        vv = jnp.repeat(v, n // nkv, axis=2) if nkv != n else v
        s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, lp0, n * hd)
        x = x + _dense(o, lp["o"])
        y = _rms(x, lp["post_norm"], cfg.eps)
        hh = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                         ).astype(x.dtype) * _dense(y, lp["up"])
        x = x + _dense(hh, lp["down"])
        padk = jnp.zeros((b, max_frames, nkv, hd), k.dtype)
        return x, (jnp.concatenate([k, padk], axis=1),
                   jnp.concatenate([v, padk], axis=1))

    x = x.astype(cdt)
    x, (k_cache, v_cache) = jax.lax.scan(prefill_layer, x,
                                         params["layers"])
    hidden_last = _rms(x[:, -1], params["norm"], cfg.eps)
    logits = _dense(hidden_last.astype(jnp.float32),
                    params["codec_head"])

    def sample(logits, k):
        if temperature <= 0 or k is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(
            k, logits / temperature, axis=-1).astype(jnp.int32)

    keys = (jax.random.split(key, max_frames) if key is not None
            else jnp.zeros((max_frames, 2), jnp.uint32))

    def frame_step(carry, xs):
        logits, hidden, pos, k_cache, v_cache, done = carry
        kf = xs
        code0 = sample(logits, kf if key is not None else None)
        code0 = jnp.where(done, cfg.codec_eos_token_id, code0)
        new_done = done | (code0 == cfg.codec_eos_token_id)
        codes = _predict_groups(params, cfg, pcfg, hidden, code0)

        # next talker input: codec emb + pad text embed (streaming tail)
        emb = (params["codec_embedding"][code0].astype(jnp.float32)
               + pad)[:, None].astype(cdt)
        key_valid = jnp.arange(total)[None] <= pos[:, None]
        kbias = jnp.where(key_valid[:, None, None, :], 0.0,
                          jnp.finfo(jnp.float32).min)

        def dec_layer(carry, xs):
            x = carry
            lp, kc, vc = xs
            y = _rms(x, lp["input_norm"], cfg.eps)
            q = _dense(y, lp["q"]).reshape(b, 1, n, hd)
            kx = _dense(y, lp["k"]).reshape(b, 1, nkv, hd)
            vx = _dense(y, lp["v"]).reshape(b, 1, nkv, hd)
            if "q_norm" in lp:
                q = _rms(q, lp["q_norm"], cfg.eps)
                kx = _rms(kx, lp["k_norm"], cfg.eps)
            c = jax.lax.dynamic_slice_in_dim(cos_all, pos[0], 1, 0)
            s_ = jax.lax.dynamic_slice_in_dim(sin_all, pos[0], 1, 0)
            q = _apply_rope(q, c, s_)
            kx = _apply_rope(kx, c, s_)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, kx, pos[0], 1)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, vx, pos[0], 1)
            kk = jnp.repeat(kc, n // nkv, axis=2) if nkv != n else kc
            vv = jnp.repeat(vc, n // nkv, axis=2) if nkv != n else vc
            s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                           preferred_element_type=jnp.float32
                           ) / math.sqrt(hd)
            a = jax.nn.softmax(s + kbias, axis=-1).astype(x.dtype)
            o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, 1, n * hd)
            x = x + _dense(o, lp["o"])
            y = _rms(x, lp["post_norm"], cfg.eps)
            hh = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                             ).astype(x.dtype) * _dense(y, lp["up"])
            x = x + _dense(hh, lp["down"])
            return x, (kc, vc)

        xx, (k_cache, v_cache) = jax.lax.scan(
            dec_layer, emb, (params["layers"], k_cache, v_cache))
        hidden = _rms(xx[:, 0], params["norm"], cfg.eps)
        logits = _dense(hidden.astype(jnp.float32), params["codec_head"])
        out = (codes, jnp.logical_not(new_done))
        return (logits, hidden, pos + 1, k_cache, v_cache, new_done), out

    pos0 = jnp.full((b,), lp0, jnp.int32)
    done0 = jnp.zeros((b,), bool)
    carry = (logits, hidden_last, pos0, k_cache, v_cache, done0)
    _, (codes, valid) = jax.lax.scan(frame_step, carry, keys)
    return codes.transpose(1, 0, 2), valid.T  # [B, T, G], [B, T]


# ---------------------------------------------------------------------------
# codec decoder (tokenizer v2)
# ---------------------------------------------------------------------------

def _causal_conv1d(x, p, stride=1, dilation=1, groups=1):
    """Causal Conv1d with the reference's left pad + right extra pad
    (CausalConvNet:164-197).  x: [B, T, C]; w: [k, cin/groups, cout]."""
    k = p["w"].shape[0]
    eff_k = (k - 1) * dilation + 1
    padding = eff_k - stride
    length = x.shape[1]
    n_frames = (length - eff_k + padding) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (eff_k - padding)
    extra = int(ideal - length)
    x = jnp.pad(x, [(0, 0), (padding, max(extra, 0)), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), "VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _causal_tconv1d(x, p, kernel, stride):
    """CausalTransConvNet:200-213: full transpose conv then trim
    pad = k - stride from BOTH sides (w pre-flipped [k, cin, cout])."""
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    pad = k - stride
    if pad > 0:
        y = y[:, pad:y.shape[1] - pad]
    return y


def _snake_beta(x, alpha, beta):
    """SnakeBeta with log-scale parameters (tokenizer v2 :582-621)."""
    a = jnp.exp(alpha.astype(jnp.float32))
    bb = jnp.exp(beta.astype(jnp.float32))
    x32 = x.astype(jnp.float32)
    return (x32 + (1.0 / (bb + 1e-9)) * jnp.sin(a * x32) ** 2
            ).astype(x.dtype)


def init_codec_decoder(key, cfg: CodecDecoderConfig = CodecDecoderConfig(),
                       dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))

    def c1(cin, cout, k):
        s = 1.0 / math.sqrt(cin * k)
        return {"w": jax.random.uniform(next(keys), (k, cin, cout),
                                        jnp.float32, -s, s).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    half = cfg.codebook_dim // 2
    layers = [_init_layer(k, cfg.hidden_size, cfg.intermediate_size,
                          cfg.n_heads, cfg.n_kv_heads, cfg.head_dim,
                          dtype, qk_norm=False)
              for k in jax.random.split(next(keys), cfg.n_layers)]
    params = {
        # split RVQ: semantic (1) + acoustic (num_quantizers - 1)
        "rvq_first": {
            "embedding_sum": jax.random.normal(
                next(keys), (1, cfg.codebook_size, half)) * 0.02,
            "cluster_usage": jnp.ones((1, cfg.codebook_size)),
            "out_proj": c1(half, cfg.codebook_dim, 1),
        },
        "rvq_rest": {
            "embedding_sum": jax.random.normal(
                next(keys), (cfg.num_quantizers - 1, cfg.codebook_size,
                             half)) * 0.02,
            "cluster_usage": jnp.ones((cfg.num_quantizers - 1,
                                       cfg.codebook_size)),
            "out_proj": c1(half, cfg.codebook_dim, 1),
        },
        "pre_conv": c1(cfg.codebook_dim, cfg.latent_dim, 3),
        "transformer": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "layer_scales": jax.random.normal(
            next(keys), (cfg.n_layers, 2, cfg.hidden_size)) * 0.0
        + cfg.layer_scale_init,
        "upsample": [
            {"tconv": c1(cfg.latent_dim, cfg.latent_dim, f),
             "convnext": {
                 "dwconv": c1(1, cfg.latent_dim, 7),
                 "norm": {"w": jnp.ones((cfg.latent_dim,)),
                          "b": jnp.zeros((cfg.latent_dim,))},
                 "pw1": _lin_p(next(keys), cfg.latent_dim,
                               4 * cfg.latent_dim, dtype, bias=True),
                 "pw2": _lin_p(next(keys), 4 * cfg.latent_dim,
                               cfg.latent_dim, dtype, bias=True),
                 "gamma": jnp.full((cfg.latent_dim,), 1e-6)}}
            for f in cfg.upsampling_ratios],
        "dec_pre": c1(cfg.latent_dim, cfg.decoder_dim, 7),
        "dec_blocks": [],
        "dec_post_alpha": None, "dec_post_beta": None, "dec_out": None,
    }
    dim = cfg.decoder_dim
    for i, r in enumerate(cfg.upsample_rates):
        out = dim // 2
        blk = {"alpha": jnp.zeros((dim,)), "beta": jnp.zeros((dim,)),
               "tconv": c1(dim, out, 2 * r),
               "units": [{"alpha1": jnp.zeros((out,)),
                          "beta1": jnp.zeros((out,)),
                          "conv1": c1(out, out, 7),
                          "alpha2": jnp.zeros((out,)),
                          "beta2": jnp.zeros((out,)),
                          "conv2": c1(out, out, 1)}
                         for _ in (1, 3, 9)]}
        params["dec_blocks"].append(blk)
        dim = out
    params["dec_post_alpha"] = jnp.zeros((dim,))
    params["dec_post_beta"] = jnp.zeros((dim,))
    params["dec_out"] = c1(dim, 1, 7)
    return params


def codec_decode(params, cfg: CodecDecoderConfig, codes):
    """codes: [B, T, num_quantizers] int32 -> waveform [B, T * 960]
    (12.5 Hz frames -> 24 kHz; total upsample = prod(rates + ratios))."""
    b, t, nq = codes.shape
    half = cfg.codebook_dim // 2

    def rvq(p, c):
        # EuclideanCodebook decode + 1x1 out proj, summed over quantizers
        emb = p["embedding_sum"] / jnp.clip(
            p["cluster_usage"], 1e-5, None)[..., None]
        # gather per quantizer: emb [Q, V, half]; c [B, T, Q]
        gathered = jnp.stack(
            [emb[i][c[:, :, i]] for i in range(c.shape[2])], axis=0)
        summed = gathered.sum(axis=0)              # [B, T, half]
        return _causal_conv1d(summed, p["out_proj"])

    hidden = rvq(params["rvq_first"], codes[:, :, :1])
    if nq > 1:
        hidden = hidden + rvq(params["rvq_rest"], codes[:, :, 1:])

    hidden = _causal_conv1d(hidden, params["pre_conv"])

    # sliding-window transformer (window 72, no qk norm, LayerScale)
    cos, sin = _rope_tables(hidden.shape[1], cfg.head_dim, cfg.rope_theta)
    idx = jnp.arange(hidden.shape[1])
    band = (idx[None] <= idx[:, None]) & (idx[None]
                                          > idx[:, None] - cfg.sliding_window)
    bias = jnp.where(band[None, None], 0.0, jnp.finfo(jnp.float32).min)

    def tbody(x, xs):
        lp, ls = xs
        return _layer_fwd(lp, x, cos, sin, bias, cfg.n_heads,
                          cfg.n_kv_heads, cfg.head_dim, cfg.eps,
                          layer_scales=(ls[0], ls[1])), None

    hidden, _ = jax.lax.scan(tbody, hidden,
                             (params["transformer"],
                              params["layer_scales"]))

    for i, stage in enumerate(params["upsample"]):
        f = cfg.upsampling_ratios[i]
        hidden = _causal_tconv1d(hidden, stage["tconv"], f, f)
        cn = stage["convnext"]
        y = _causal_conv1d(hidden, cn["dwconv"],
                           groups=hidden.shape[-1])
        mu = y.astype(jnp.float32).mean(-1, keepdims=True)
        var = y.astype(jnp.float32).var(-1, keepdims=True)
        y = ((y - mu) * jax.lax.rsqrt(var + 1e-6)) * cn["norm"]["w"] \
            + cn["norm"]["b"]
        y = _dense(y.astype(hidden.dtype), cn["pw1"])
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False
                        ).astype(hidden.dtype)
        y = _dense(y, cn["pw2"]) * cn["gamma"].astype(hidden.dtype)
        hidden = hidden + y

    wav = _causal_conv1d(hidden, params["dec_pre"])
    for i, blk in enumerate(params["dec_blocks"]):
        r = cfg.upsample_rates[i]
        wav = _snake_beta(wav, blk["alpha"], blk["beta"])
        wav = _causal_tconv1d(wav, blk["tconv"], 2 * r, r)
        for unit, dil in zip(blk["units"], (1, 3, 9)):
            y = _snake_beta(wav, unit["alpha1"], unit["beta1"])
            y = _causal_conv1d(y, unit["conv1"], dilation=dil)
            y = _snake_beta(y, unit["alpha2"], unit["beta2"])
            y = _causal_conv1d(y, unit["conv2"])
            wav = wav + y
    wav = _snake_beta(wav, params["dec_post_alpha"],
                      params["dec_post_beta"])
    wav = _causal_conv1d(wav, params["dec_out"])
    return jnp.clip(wav[..., 0], -1.0, 1.0)
