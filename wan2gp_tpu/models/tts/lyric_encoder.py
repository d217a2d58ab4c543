"""ACE-Step lyric encoder: transformer with ESPnet relative-position
attention (Transformer-XL style), TPU-native.

Re-implementation of /root/reference/models/TTS/ace_step/models/
lyrics_utils/lyric_encoder.py: ConformerEncoder:902 configured with
use_cnn_module=False / macaron_style=False (ace_step_transformer.py:292
builds it with static_chunk_size=0 = full attention), i.e. a pre-norm
transformer whose attention adds the Dai et al. (2019) relative position
term: scores = (q + u) k^T + rel_shift((q + v) p^T) with the ESPnet
+/-(T-1) sinusoid table (EspnetRelPositionalEncoding:715,
RelPositionMultiHeadedAttention:325, rel_shift:349).

Input embedding: Linear(idim, odim) + LayerNorm, x scaled by sqrt(d)
(LinearEmbed:812 + EspnetRelPositionalEncoding.forward xscale).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ConformerConfig:
    dim: int = 1024
    n_heads: int = 16
    ffn_dim: int = 4096
    n_layers: int = 6
    eps: float = 1e-5
    # SiLU ("swish") activation in the FFN (ACTIVATION_CLASSES["swish"])
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.dim // self.n_heads


def init_conformer(key, cfg: ConformerConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 16 * cfg.n_layers + 8))
    d = cfg.dim

    def lin(d_in, d_out, bias=True):
        lim = math.sqrt(6.0 / (d_in + d_out))
        p = {"w": jax.random.uniform(next(keys), (d_in, d_out), jnp.float32,
                                     -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((d_out,), dtype)
        return p

    def layer():
        return {
            "norm_mha": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d),
            "pos": lin(d, d, bias=False),
            "pos_bias_u": jax.random.normal(
                next(keys), (cfg.n_heads, cfg.head_dim),
                jnp.float32) * 0.02,
            "pos_bias_v": jax.random.normal(
                next(keys), (cfg.n_heads, cfg.head_dim),
                jnp.float32) * 0.02,
            "norm_ff": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "ff1": lin(d, cfg.ffn_dim), "ff2": lin(cfg.ffn_dim, d),
        }

    return {
        "embed": lin(d, d),
        "embed_ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "layers": [layer() for _ in range(cfg.n_layers)],
        "after_norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps)) * p["w"] + p["b"]


def _dense(x, p):
    y = jnp.dot(x.astype(jnp.float32), p["w"].astype(jnp.float32))
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y


def espnet_rel_pos(seq_len: int, d_model: int):
    """[2T-1, D] table: positions T-1 .. 0 .. -(T-1)
    (EspnetRelPositionalEncoding.extend_pe:738-770)."""
    pos = np.arange(seq_len, dtype=np.float32)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                 * -(math.log(10000.0) / d_model))
    pe_pos = np.zeros((seq_len, d_model), np.float32)
    pe_pos[:, 0::2] = np.sin(pos * div)
    pe_pos[:, 1::2] = np.cos(pos * div)
    pe_neg = np.zeros((seq_len, d_model), np.float32)
    pe_neg[:, 0::2] = np.sin(-pos * div)
    pe_neg[:, 1::2] = np.cos(-pos * div)
    # flip positive part (reversed, ending at pos 0), skip duplicate 0
    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)
    return jnp.asarray(pe)           # [2T-1, D]


def _rel_shift(x):
    """rel_shift (lyric_encoder.py:349-368): [B, H, T, 2T-1] ->
    [B, H, T, T] keeping relative positions 0..-(T-1) per row."""
    b, h, t1, t2 = x.shape
    zero = jnp.zeros((b, h, t1, 1), x.dtype)
    xp = jnp.concatenate([zero, x], axis=-1)
    xp = xp.reshape(b, h, t2 + 1, t1)
    x = xp[:, :, 1:].reshape(b, h, t1, t2)
    return x[:, :, :, :t2 // 2 + 1]


def conformer_forward(params, cfg: ConformerConfig, x, mask=None):
    """x: [B, T, dim] lyric token embeddings; mask: [B, T] (1 = keep).
    Returns [B, T, dim]."""
    b, t, d = x.shape
    n, hd = cfg.n_heads, cfg.head_dim
    x = _dense(x, params["embed"])
    x = _ln(x, params["embed_ln"], cfg.eps)
    x = x * math.sqrt(d)
    pos_emb = espnet_rel_pos(t, d)                 # [2T-1, D]

    bias = None
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                         -jnp.inf)

    for lp in params["layers"]:
        # relative-position self-attention (pre-norm)
        y = _ln(x, lp["norm_mha"], cfg.eps)
        q = _dense(y, lp["q"]).reshape(b, t, n, hd)
        k = _dense(y, lp["k"]).reshape(b, t, n, hd)
        v = _dense(y, lp["v"]).reshape(b, t, n, hd)
        p = _dense(pos_emb, lp["pos"]).reshape(-1, n, hd)   # [2T-1, H, D]
        qu = q + lp["pos_bias_u"][None, None]
        qv = q + lp["pos_bias_v"][None, None]
        ac = jnp.einsum("btnd,bsnd->bnts", qu, k)
        bd = jnp.einsum("btnd,pnd->bntp", qv, p)            # [B,H,T,2T-1]
        bd = _rel_shift(bd)
        scores = (ac + bd) / math.sqrt(hd)
        if bias is not None:
            scores = scores + bias
        attn = jax.nn.softmax(scores, axis=-1)
        if mask is not None:
            attn = jnp.where(mask[:, None, None, :] > 0, attn, 0.0)
        o = jnp.einsum("bnts,bsnd->btnd", attn, v).reshape(b, t, d)
        x = x + _dense(o, lp["o"])

        # FFN (pre-norm, swish)
        y = _ln(x, lp["norm_ff"], cfg.eps)
        h = jax.nn.silu(_dense(y, lp["ff1"]))
        x = x + _dense(h, lp["ff2"])

    return _ln(x, params["after_norm"], cfg.eps)


def load_conformer_params(sd: Dict[str, np.ndarray], cfg: ConformerConfig,
                          prefix: str = "", dtype=jnp.float32):
    """Map the reference ConformerEncoder state dict (encoders.N.self_attn.
    {linear_q,linear_k,linear_v,linear_out,linear_pos,pos_bias_u,pos_bias_v},
    encoders.N.{norm_mha,norm_ff}, encoders.N.feed_forward.{w_1,w_2},
    embed.out.0/1, after_norm)."""
    def lin(name, bias=True):
        p = {"w": jnp.asarray(np.asarray(
            sd.pop(f"{prefix}{name}.weight"), np.float32).T).astype(dtype)}
        if bias:
            p["b"] = jnp.asarray(np.asarray(
                sd.pop(f"{prefix}{name}.bias"), np.float32)).astype(dtype)
        return p

    def ln(name):
        return {"w": jnp.asarray(np.asarray(
            sd.pop(f"{prefix}{name}.weight"), np.float32)),
            "b": jnp.asarray(np.asarray(
                sd.pop(f"{prefix}{name}.bias"), np.float32))}

    layers = []
    for i in range(cfg.n_layers):
        pre = f"encoders.{i}"
        layers.append({
            "norm_mha": ln(f"{pre}.norm_mha"),
            "q": lin(f"{pre}.self_attn.linear_q"),
            "k": lin(f"{pre}.self_attn.linear_k"),
            "v": lin(f"{pre}.self_attn.linear_v"),
            "o": lin(f"{pre}.self_attn.linear_out"),
            "pos": lin(f"{pre}.self_attn.linear_pos", bias=False),
            "pos_bias_u": jnp.asarray(np.asarray(
                sd.pop(f"{prefix}{pre}.self_attn.pos_bias_u"), np.float32)),
            "pos_bias_v": jnp.asarray(np.asarray(
                sd.pop(f"{prefix}{pre}.self_attn.pos_bias_v"), np.float32)),
            "norm_ff": ln(f"{pre}.norm_ff"),
            "ff1": lin(f"{pre}.feed_forward.w_1"),
            "ff2": lin(f"{pre}.feed_forward.w_2"),
        })
    return {
        "embed": lin("embed.out.0"),
        "embed_ln": ln("embed.out.1"),
        "layers": layers,
        "after_norm": ln("after_norm"),
    }
