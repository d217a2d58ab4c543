"""VL fusion encoder — image tokens attend to the prompt sequence.

Reference: preprocessing/sam3/model/encoder.py TransformerEncoderLayer
(:15-271, pre_norm=True, pos_enc_at_attn=True for self-attention,
no pos enc on cross-attention queries/keys) stacked 6x by
TransformerEncoderFusion (:478-600, single feature level,
add_pooled_text_to_img_feat=False per model_builder.py:240-259).
Each layer: image-token self-attention (+sine pos), cross-attention
image->prompt (text + geometry tokens, prompt padding mask), ReLU FFN.
The prompt itself is returned unchanged (memory_text, encoder.py:594).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .common import init_linear, init_ln, init_mha, linear, ln, mha


def init_fusion_layer(key, d_model: int, ffn: int, heads: int, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"self": init_mha(k1, d_model, heads, dtype=dtype),
            "cross": init_mha(k2, d_model, heads, dtype=dtype),
            "norm1": init_ln(d_model, dtype),
            "norm2": init_ln(d_model, dtype),
            "norm3": init_ln(d_model, dtype),
            "fc1": init_linear(k3, d_model, ffn, dtype),
            "fc2": init_linear(k4, ffn, d_model, dtype)}


def fusion_layer(p, x, pos, prompt, prompt_pad, heads):
    """Pre-norm layer (encoder.py forward_pre:147-219): x [B, L, C]
    image tokens, pos [B, L, C], prompt [B, S, C], prompt_pad [B, S]."""
    h = ln(x, p["norm1"])
    q = h + pos
    x = x + mha(p["self"], q, q, h, heads)
    h = ln(x, p["norm2"])
    x = x + mha(p["cross"], h, prompt, prompt, heads,
                key_padding_mask=prompt_pad)
    h = ln(x, p["norm3"])
    x = x + linear(jax.nn.relu(linear(h, p["fc1"])), p["fc2"])
    return x


def init_fusion(key, d_model: int = 256, ffn: int = 2048, heads: int = 8,
                num_layers: int = 6, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers)
    layers = [init_fusion_layer(k, d_model, ffn, heads, dtype)
              for k in keys]
    return {"layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers)}


def fusion_forward(params, img_tokens, img_pos, prompt, prompt_pad,
                   heads: int = 8):
    """img_tokens/img_pos: [B, L, C]; prompt: [B, S, C]; prompt_pad:
    [B, S] True=pad.  Returns fused image memory [B, L, C]."""
    def body(x, p):
        return fusion_layer(p, x, img_pos, prompt, prompt_pad, heads), None

    x, _ = jax.lax.scan(body, img_tokens, params["layers"])
    return x
