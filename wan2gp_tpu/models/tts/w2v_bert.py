"""w2v-BERT 2.0 speech encoder — the semantic feature tower of
IndexTTS-2 (reference models/TTS/index_tts2/infer_v2.py:125-186 loads
facebook/w2v-bert-2.0 via transformers Wav2Vec2BertModel; HF
modeling_wav2vec2_bert.py is the numerical oracle).

Conformer encoder (24 x 1024 for the released checkpoint): macaron
FFN halves, self-attention with relative_key distance embeddings
(clamped [-64, 8]), causal depthwise conv module (k31, GLU in,
LayerNorm + swish), pre-LN everywhere.  Input features are 80-mel
fbanks stacked x2 -> 160-d frames at 50 Hz
(SeamlessM4TFeatureExtractor stride-2 stacking).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class W2VBertConfig:
    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    intermediate: int = 4096
    input_dim: int = 160           # 80 mel x 2 stacked
    dw_kernel: int = 31
    left_max: int = 64
    right_max: int = 8
    eps: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @classmethod
    def tiny(cls):
        return cls(hidden=32, layers=2, heads=4, intermediate=64,
                   input_dim=16, dw_kernel=7, left_max=4, right_max=2)


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
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["w"]
            + p["b"]).astype(x.dtype)


def _ln_p(dim):
    return {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}


def init_w2v_bert(key, cfg: W2VBertConfig, dtype=jnp.float32):
    d = cfg.hidden
    keys = iter(jax.random.split(key, 8))

    def ffn(k):
        k1, k2 = jax.random.split(k)
        return {"ln": _ln_p(d),
                "in": _lin(k1, d, cfg.intermediate, dtype),
                "out": _lin(k2, cfg.intermediate, d, dtype)}

    def layer(k):
        ks = iter(jax.random.split(k, 12))
        n_pos = cfg.left_max + cfg.right_max + 1
        return {
            "ffn1": ffn(next(ks)),
            "attn_ln": _ln_p(d),
            "q": _lin(next(ks), d, d, dtype),
            "k": _lin(next(ks), d, d, dtype),
            "v": _lin(next(ks), d, d, dtype),
            "o": _lin(next(ks), d, d, dtype),
            "dist_emb": (jax.random.normal(
                next(ks), (n_pos, cfg.head_dim), jnp.float32)
                * 0.02).astype(dtype),
            "conv_ln": _ln_p(d),
            "pw1": _lin(next(ks), d, 2 * d, dtype, bias=False),
            "dw": (jax.random.normal(next(ks),
                                     (cfg.dw_kernel, 1, d),
                                     jnp.float32) * 0.05).astype(dtype),
            "dw_ln": _ln_p(d),
            "pw2": _lin(next(ks), d, d, dtype, bias=False),
            "ffn2": ffn(next(ks)),
            "final_ln": _ln_p(d),
        }

    lks = jax.random.split(next(keys), cfg.layers)
    leaves = [layer(k) for k in lks]
    return {
        "fp_ln": _ln_p(cfg.input_dim),
        "fp_proj": _lin(next(keys), cfg.input_dim, d, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
    }


def _ffn_half(x, p, eps):
    h = _ln(x, p["ln"], eps)
    h = _dense(jax.nn.silu(_dense(h, p["in"]).astype(jnp.float32)
                           ).astype(x.dtype), p["out"])
    return x + 0.5 * h


def _rel_attn(lp, x, cfg: W2VBertConfig):
    """relative_key attention (modeling_wav2vec2_bert.py
    Wav2Vec2BertSelfAttention, distance clamped [-left, right])."""
    b, n, d = x.shape
    heads, hd = cfg.heads, cfg.head_dim
    y = _ln(x, lp["attn_ln"], cfg.eps)
    q = _dense(y, lp["q"]).reshape(b, n, heads, hd)
    k = _dense(y, lp["k"]).reshape(b, n, heads, hd)
    v = _dense(y, lp["v"]).reshape(b, n, heads, hd)
    s = jnp.einsum("blhd,bshd->bhls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    pos_l = np.arange(n)[:, None]
    pos_r = np.arange(n)[None, :]
    dist = np.clip(pos_r - pos_l, -cfg.left_max, cfg.right_max)
    pe = lp["dist_emb"][jnp.asarray(dist + cfg.left_max)]  # [L,R,hd]
    rel = jnp.einsum("blhd,lrd->bhlr", q.astype(jnp.float32),
                     pe.astype(jnp.float32)) / math.sqrt(hd)
    a = jax.nn.softmax(s + rel, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhls,bshd->blhd", a, v).reshape(b, n, d)
    return x + _dense(o, lp["o"])


def _conv_module(lp, x, cfg: W2VBertConfig):
    h = _ln(x, lp["conv_ln"], cfg.eps)
    h = _dense(h, lp["pw1"])
    a, g = jnp.split(h, 2, axis=-1)
    h = a * jax.nn.sigmoid(g.astype(jnp.float32)).astype(a.dtype)
    # causal left padding (modeling: pad (k-1, 0))
    h = jnp.pad(h, ((0, 0), (cfg.dw_kernel - 1, 0), (0, 0)))
    h = jax.lax.conv_general_dilated(
        h, lp["dw"].astype(h.dtype), (1,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=cfg.hidden)
    h = _ln(h, lp["dw_ln"], cfg.eps)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _dense(h, lp["pw2"])
    return x + h


def w2v_bert_encode(params, cfg: W2VBertConfig, features):
    """features [B, T, input_dim] (stacked fbanks) -> hidden states
    [B, T, hidden]."""
    x = _dense(_ln(features, params["fp_ln"], cfg.eps),
               params["fp_proj"])

    def body(x, lp):
        x = _ffn_half(x, lp["ffn1"], cfg.eps)
        x = _rel_attn(lp, x, cfg)
        x = _conv_module(lp, x, cfg)
        x = _ffn_half(x, lp["ffn2"], cfg.eps)
        return _ln(x, lp["final_ln"], cfg.eps), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return x


def stack_fbanks(mels):
    """80-mel frames [B, T, 80] -> stacked [B, T//2, 160]
    (SeamlessM4TFeatureExtractor stride-2 stacking)."""
    b, t, f = mels.shape
    t2 = t // 2
    return mels[:, :t2 * 2].reshape(b, t2, 2 * f)


def load_w2v_bert_params(sd: Dict[str, np.ndarray], cfg: W2VBertConfig,
                         dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """HF Wav2Vec2BertModel key space: feature_projection.{layer_norm,
    projection}, encoder.layers.N.{ffn1_layer_norm, ffn1.{intermediate,
    output}_dense, self_attn_layer_norm, self_attn.{linear_q,k,v,out,
    distance_embedding}, conv_module.{layer_norm, pointwise_conv1,
    depthwise_conv, depthwise_layer_norm, pointwise_conv2},
    ffn2_layer_norm, ffn2.*, final_layer_norm}."""
    sd = dict(sd)
    for pre in ("model.", "wav2vec2_bert."):
        if any(k.startswith(pre + "encoder.layers.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    def lin(name, bias=True):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        if w.ndim == 3:                  # Conv1d k1 [out, in, 1]
            w = w[..., 0]
        p = {"w": jnp.asarray(w.T).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)
                                 ).astype(dtype)
        return p

    def lnp(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.weight"), np.float32)),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.bias"), np.float32))}

    def ffn(pre, ln_name):
        return {"ln": lnp(ln_name),
                "in": lin(f"{pre}.intermediate_dense"),
                "out": lin(f"{pre}.output_dense")}

    layers = []
    for i in range(cfg.layers):
        b = f"encoder.layers.{i}"
        dw = np.asarray(sd.pop(f"{b}.conv_module.depthwise_conv"
                               ".weight"), np.float32)
        layers.append({
            "ffn1": ffn(f"{b}.ffn1", f"{b}.ffn1_layer_norm"),
            "attn_ln": lnp(f"{b}.self_attn_layer_norm"),
            "q": lin(f"{b}.self_attn.linear_q"),
            "k": lin(f"{b}.self_attn.linear_k"),
            "v": lin(f"{b}.self_attn.linear_v"),
            "o": lin(f"{b}.self_attn.linear_out"),
            "dist_emb": jnp.asarray(np.asarray(
                sd.pop(f"{b}.self_attn.distance_embedding.weight"),
                np.float32)).astype(dtype),
            "conv_ln": lnp(f"{b}.conv_module.layer_norm"),
            "pw1": lin(f"{b}.conv_module.pointwise_conv1",
                       bias=False),
            "dw": jnp.asarray(dw.transpose(2, 1, 0)).astype(dtype),
            "dw_ln": lnp(f"{b}.conv_module.depthwise_layer_norm"),
            "pw2": lin(f"{b}.conv_module.pointwise_conv2",
                       bias=False),
            "ffn2": ffn(f"{b}.ffn2", f"{b}.ffn2_layer_norm"),
            "final_ln": lnp(f"{b}.final_layer_norm"),
        })
    params = {
        "fp_ln": lnp("feature_projection.layer_norm"),
        "fp_proj": lin("feature_projection.projection"),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }
    leftover = [k for k in sorted(sd)
                if not k.startswith(("masked_spec_embed", "adapter",
                                     "encoder.layers"))]
    return params, leftover
