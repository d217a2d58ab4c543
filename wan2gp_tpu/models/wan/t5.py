"""UMT5-XXL text encoder (encoder-only), TPU-native.

Functional re-implementation of the reference's custom T5 stack
(/root/reference/models/wan/modules/t5.py): pre-norm blocks with unscaled
attention + per-layer relative position bias (UMT5: shared_pos=False,
t5.py:467-471: dim 4096, ffn 10240, 64 heads, 24 layers, 32 buckets),
gated-GELU feed-forward (t5.py:126: fc1(x) * gelu_tanh(gate(x))), and
RMS-style T5LayerNorm (no mean subtraction, t5.py:56).

Layers are stacked on a leading axis and iterated with lax.scan.
The downstream pipeline zeroes embeddings at padded positions, matching
the reference's truncate-then-zero-pad (any2video.py:585-589).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import rms_norm


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24
    num_buckets: int = 32
    max_dist: int = 128
    shared_pos: bool = False   # True: T5 v1.1 (one rel-pos table, layer 0);
                               # False: UMT5 (per-layer tables)
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim_attn // self.num_heads


def relative_position_buckets(length: int, num_buckets: int = 32,
                              max_dist: int = 128) -> np.ndarray:
    """Bidirectional T5 relative position buckets [L, L] (t5.py:253-268)."""
    rel = np.arange(length)[None, :] - np.arange(length)[:, None]
    half = num_buckets // 2
    buckets = (rel > 0).astype(np.int64) * half
    rel = np.abs(rel)
    max_exact = half // 2
    with np.errstate(divide="ignore"):
        large = max_exact + (
            np.log(np.maximum(rel, 1) / max_exact) / math.log(max_dist / max_exact)
            * (half - max_exact)).astype(np.int64)
    large = np.minimum(large, half - 1)
    buckets += np.where(rel < max_exact, rel, large)
    return buckets


def init_t5_encoder(key, cfg: T5Config, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))

    def lin(key, d_in, d_out, std):
        return {"w": (jax.random.normal(key, (d_in, d_out), jnp.float32)
                      * std).astype(dtype)}

    def block(key):
        ks = iter(jax.random.split(key, 8))
        d, da, dffn = cfg.dim, cfg.dim_attn, cfg.dim_ffn
        return {
            "norm1": jnp.ones((d,), jnp.float32),
            "attn": {
                "q": lin(next(ks), d, da, (d * da) ** -0.5),
                "k": lin(next(ks), d, da, d ** -0.5),
                "v": lin(next(ks), d, da, d ** -0.5),
                "o": lin(next(ks), da, d, (cfg.num_heads * cfg.head_dim) ** -0.5),
            },
            "pos_emb": (jax.random.normal(
                next(ks), (cfg.num_buckets, cfg.num_heads), jnp.float32)
                * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5),
            "norm2": jnp.ones((d,), jnp.float32),
            "ffn": {
                "gate": lin(next(ks), d, dffn, d ** -0.5),
                "fc1": lin(next(ks), d, dffn, d ** -0.5),
                "fc2": lin(next(ks), dffn, d, dffn ** -0.5),
            },
        }

    blocks = [block(next(keys)) for _ in range(cfg.num_layers)]
    p = {
        "token_embedding": jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim), jnp.float32
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": jnp.ones((cfg.dim,), jnp.float32),
    }
    if cfg.shared_pos:
        # HF-T5-v1.1 style: one rel-pos table on block 0 (t5_encode
        # reads params["shared_pos_emb"])
        p["shared_pos_emb"] = p["blocks"]["pos_emb"][0]
    return p


def _t5_norm(x, weight, eps=1e-6):
    """T5LayerNorm: x*rsqrt(mean(x^2)+eps) then weight (weight dtype wins)."""
    return rms_norm(x, weight, eps)


def _t5_attention(p, x, bias, cfg):
    cdt = cfg.compute_dtype
    b, l, _ = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    q = jnp.dot(x, p["q"]["w"].astype(cdt)).reshape(b, l, n, hd)
    k = jnp.dot(x, p["k"]["w"].astype(cdt)).reshape(b, l, n, hd)
    v = jnp.dot(x, p["v"]["w"].astype(cdt)).reshape(b, l, n, hd)
    # T5 does not scale by 1/sqrt(d) (t5.py:115)
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32)
    s = s + bias
    p_attn = jax.nn.softmax(s, axis=-1).astype(cdt)
    o = jnp.einsum("bnls,bsnd->blnd", p_attn, v).reshape(b, l, -1)
    return jnp.dot(o, p["o"]["w"].astype(cdt))


def _t5_ffn(p, x, cfg):
    cdt = cfg.compute_dtype
    gate = jnp.dot(x, p["gate"]["w"].astype(cdt))
    gate = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(cdt)
    h = jnp.dot(x, p["fc1"]["w"].astype(cdt)) * gate
    return jnp.dot(h, p["fc2"]["w"].astype(cdt))


def t5_encode(params, cfg: T5Config, ids, mask):
    """ids: [B, L] int32; mask: [B, L] (1 = real token).

    Returns [B, L, dim] final hidden states (compute dtype), with positions
    where mask==0 NOT zeroed (caller decides; the Wan pipeline zero-pads).
    """
    cdt = cfg.compute_dtype
    b, l = ids.shape
    x = params["token_embedding"][ids].astype(cdt)

    buckets = jnp.asarray(relative_position_buckets(
        l, cfg.num_buckets, cfg.max_dist))          # [L, L]
    mask_bias = jnp.where(mask[:, None, None, :] > 0, 0.0,
                          jnp.finfo(jnp.float32).min)  # [B,1,1,L]

    shared_bias = None
    if cfg.shared_pos:
        shared_bias = params["shared_pos_emb"][buckets].transpose(2, 0, 1)[
            None] + mask_bias

    def body(x, bp):
        if cfg.shared_pos:
            bias = shared_bias
        else:
            pos_bias = bp["pos_emb"][buckets]        # [L, L, N]
            bias = pos_bias.transpose(2, 0, 1)[None] + mask_bias
        y = _t5_norm(x, bp["norm1"])
        x = x + _t5_attention(bp["attn"], y, bias, cfg)
        y = _t5_norm(x, bp["norm2"])
        x = x + _t5_ffn(bp["ffn"], y, cfg)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    return _t5_norm(x, params["norm"])
