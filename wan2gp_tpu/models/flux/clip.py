"""CLIP ViT-L/14 text encoder (for the Flux `y` pooled vector).

The reference wraps transformers' CLIPTextModel
(/root/reference/models/flux/modules/conditioner.py HFEmbedder,
output_key "pooler_output").  Functional equivalent: 12 pre-norm blocks,
d=768, 12 heads, causal mask, quick-GELU MLP, learned position embeddings,
final layer norm; pooled output = final hidden state at the EOT token.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import layer_norm


@dataclasses.dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    dim: int = 768
    num_heads: int = 12
    num_layers: int = 12
    mlp_dim: int = 3072
    max_len: int = 77
    eos_token_id: int = 49407
    compute_dtype: Any = jnp.float32


def init_clip_text(key, cfg: ClipTextConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))

    def lin(key, din, dout):
        return {"w": (jax.random.normal(key, (din, dout), jnp.float32)
                      * 0.02).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def block(key):
        ks = iter(jax.random.split(key, 8))
        d = cfg.dim
        return {
            "ln1": {"w": jnp.ones((d,), jnp.float32),
                    "b": jnp.zeros((d,), jnp.float32)},
            "attn": {m: lin(next(ks), d, d) for m in ("q", "k", "v", "o")},
            "ln2": {"w": jnp.ones((d,), jnp.float32),
                    "b": jnp.zeros((d,), jnp.float32)},
            "mlp": {"fc1": lin(next(ks), d, cfg.mlp_dim),
                    "fc2": lin(next(ks), cfg.mlp_dim, d)},
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.num_layers)]
    return {
        "token_embedding": (jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "position_embedding": (jax.random.normal(
            next(keys), (cfg.max_len, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final_ln": {"w": jnp.ones((cfg.dim,), jnp.float32),
                     "b": jnp.zeros((cfg.dim,), jnp.float32)},
    }


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def clip_text_encode(params, cfg: ClipTextConfig, ids):
    """ids: [B, L] int32 (padded with eos).  Returns (hidden [B,L,d],
    pooled [B,d])."""
    b, l = ids.shape
    cdt = cfg.compute_dtype
    x = (params["token_embedding"][ids]
         + params["position_embedding"][None, :l]).astype(cdt)
    causal = jnp.tril(jnp.ones((l, l), bool))
    bias = jnp.where(causal, 0.0, jnp.finfo(jnp.float32).min)

    n, hd = cfg.num_heads, cfg.dim // cfg.num_heads

    def dense(x, p):
        return (jnp.dot(x, p["w"].astype(cdt),
                        preferred_element_type=jnp.float32)
                + p["b"]).astype(cdt)

    def body(x, bp):
        y = layer_norm(x, bp["ln1"]["w"], bp["ln1"]["b"], eps=1e-5)
        q = dense(y, bp["attn"]["q"]).reshape(b, l, n, hd)
        k = dense(y, bp["attn"]["k"]).reshape(b, l, n, hd)
        v = dense(y, bp["attn"]["v"]).reshape(b, l, n, hd)
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p_attn = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", p_attn, v).reshape(b, l, -1)
        x = x + dense(o, bp["attn"]["o"])
        y = layer_norm(x, bp["ln2"]["w"], bp["ln2"]["b"], eps=1e-5)
        y = dense(y, bp["mlp"]["fc1"])
        y = _quick_gelu(y.astype(jnp.float32)).astype(cdt)
        x = x + dense(y, bp["mlp"]["fc2"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = layer_norm(x, params["final_ln"]["w"], params["final_ln"]["b"],
                   eps=1e-5)
    eot = jnp.argmax((ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
    pooled = x[jnp.arange(b), eot]
    return x, pooled
