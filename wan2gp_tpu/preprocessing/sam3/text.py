"""SAM3 VE text encoder — CLIP-style causal transformer + resizer.

Reference: preprocessing/sam3/model/text_encoder_ve.py — TextTransformer
(context 32, vocab 49408, width 1024, 16 heads, 24 layers, causal mask,
GELU MLP, ln_final, output_tokens) wrapped by VETextEncoder with a
Linear resizer width->d_model (text_encoder_ve.py:255-331);
model_builder.py:611-622 fixes the dims.  Tokenization goes through
utils/tokenizer.load_tokenizer (HF tokenizer file when available, hash
fallback in checkpoint-free environments).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .common import init_linear, init_ln, init_mha, linear, ln, mha


@dataclasses.dataclass(frozen=True)
class TextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 32
    mlp_ratio: float = 4.0
    d_model: int = 256
    compute_dtype: Any = jnp.float32


def init_text_encoder(key, cfg: TextConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.layers + 3)
    w, m = cfg.width, int(cfg.width * cfg.mlp_ratio)

    def block(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"ln1": init_ln(w, dtype), "ln2": init_ln(w, dtype),
                "attn": init_mha(k1, w, cfg.heads, dtype=dtype),
                "fc": init_linear(k2, w, m, dtype),
                "proj": init_linear(k3, m, w, dtype)}

    blocks = [block(keys[i]) for i in range(cfg.layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    return {
        "tok": (jax.random.normal(keys[-1], (cfg.vocab_size, w), jnp.float32)
                * 0.02).astype(dtype),
        "pos": (jax.random.normal(keys[-2], (cfg.context_length, w),
                                  jnp.float32) * 0.01).astype(dtype),
        "blocks": stacked,
        "ln_final": init_ln(w, dtype),
        "resizer": init_linear(keys[-3], w, cfg.d_model, dtype),
    }


def text_encode(params, cfg: TextConfig, ids):
    """ids: [B, L] int32 (0 = padding) -> (tokens_resized [B, L, d_model],
    padding_mask [B, L] bool True=pad).  Causal mask as in
    text_encoder_ve.py:222-246."""
    b, l = ids.shape
    x = params["tok"][ids] + params["pos"][:l]
    x = x.astype(cfg.compute_dtype)

    def body(x, p):
        h = ln(x, p["ln1"])
        x = x + mha(p["attn"], h, h, h, cfg.heads, is_causal=True)
        h = ln(x, p["ln2"])
        x = x + linear(jax.nn.gelu(linear(h, p["fc"]), approximate=False),
                       p["proj"])
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = ln(x, params["ln_final"])
    tokens = linear(x, params["resizer"])
    pad = ids == 0
    return tokens, pad
