"""MaskFormer segmentation head + pixel decoder + dot-product scoring.

Reference: preprocessing/sam3/model/maskformer_segmentation.py —
PixelDecoder (:184-233, 3 nearest-upsample FPN stages with 3x3 conv +
GroupNorm(8) + ReLU), UniversalSegmentationHead (:236-337: prompt
cross-attention on the encoder tokens, instance/semantic 1x1 heads,
MaskPredictor einsum of query mask-embeddings against pixel features);
DotProductScoring: model/model_misc.py:751-805 (masked mean-pooled
prompt -> projected dot product with projected queries, scaled by
1/sqrt(d_proj), clamped to +-12).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from .common import init_linear, init_ln, init_mha, init_mlp, linear, ln, \
    mha, mlp
from .neck import _conv, _init_conv


def init_seg_head(key, d_model: int = 256, stages: int = 3,
                  heads: int = 8, dtype=jnp.float32):
    keys = jax.random.split(key, stages + 5)
    return {
        "convs": [_init_conv(keys[i], 3, 3, d_model, d_model, dtype)
                  for i in range(stages)],
        "gn": [{"scale": jnp.ones((d_model,), dtype),
                "bias": jnp.zeros((d_model,), dtype)}
               for _ in range(stages)],
        "cross": init_mha(keys[-1], d_model, heads, dtype=dtype),
        "cross_norm": init_ln(d_model, dtype),
        "mask_embed": init_mlp(keys[-2], d_model, d_model, d_model, 3,
                               dtype),
        "instance_head": _init_conv(keys[-3], 1, 1, d_model, d_model,
                                    dtype),
        "semantic_head": _init_conv(keys[-4], 1, 1, d_model, 1, dtype),
    }


def _group_norm(x, p, groups: int = 8, eps: float = 1e-5):
    b, h, w, c = x.shape
    g = x.reshape(b, h, w, groups, c // groups)
    mu = g.mean(axis=(1, 2, 4), keepdims=True)
    var = g.var(axis=(1, 2, 4), keepdims=True)
    g = (g - mu) * jax.lax.rsqrt(var + eps)
    return g.reshape(b, h, w, c) * p["scale"] + p["bias"]


def pixel_decoder(params, feats: List[jnp.ndarray]):
    """feats: FPN levels high-res first, e.g. [288^2, 144^2, 72^2]
    NHWC; the LAST level is the fused encoder tokens.  FPN top-down with
    nearest 2x upsample (maskformer_segmentation.py:218-233)."""
    prev = feats[-1]
    for i, skip in enumerate(feats[:-1][::-1]):
        th, tw = skip.shape[1], skip.shape[2]
        fh, fw = th // prev.shape[1], tw // prev.shape[2]
        up = jnp.repeat(jnp.repeat(prev, fh, axis=1), fw, axis=2)
        prev = skip + up
        prev = _conv(prev, params["convs"][i])
        prev = jax.nn.relu(_group_norm(prev, params["gn"][i]))
    return prev


def seg_head_forward(params, backbone_feats, encoder_tokens, feat_hw,
                     queries, prompt, prompt_pad, heads: int = 8):
    """backbone_feats: neck levels [288, 144, 72] NHWC (pre-fusion);
    encoder_tokens: [B, L, C] fused 72^2 tokens; queries: [B, Q, C].
    Returns dict(pred_masks [B, Q, H, W], semantic_seg [B, H, W, 1],
    pixel_embed)."""
    b, l, c = encoder_tokens.shape
    h, w = feat_hw
    # prompt cross-attention on the encoder tokens (:300-309)
    t2 = ln(encoder_tokens, params["cross_norm"])
    t2 = mha(params["cross"], t2, prompt, prompt, heads,
             key_padding_mask=prompt_pad)
    tokens = t2 + encoder_tokens
    feats = list(backbone_feats[:-1]) + [tokens.reshape(b, h, w, c)]
    pixel_embed = pixel_decoder(params, feats)          # [B, H4, W4, C]
    inst = _conv(pixel_embed, params["instance_head"])
    sem = _conv(pixel_embed, params["semantic_head"])
    memb = mlp(queries, params["mask_embed"])           # [B, Q, C]
    masks = jnp.einsum("bqc,bhwc->bqhw", memb, inst)
    return {"pred_masks": masks, "semantic_seg": sem,
            "pixel_embed": pixel_embed}


def init_dot_scoring(key, d_model: int = 256, d_proj: int = 256,
                     dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"prompt_mlp": init_mlp(k1, d_model, 2048, d_model, 2, dtype),
            "prompt_mlp_norm": init_ln(d_model, dtype),
            "prompt_proj": init_linear(k2, d_model, d_proj, dtype),
            "hs_proj": init_linear(k3, d_model, d_proj, dtype)}


def dot_scoring(params, queries, prompt, prompt_pad):
    """queries: [B, Q, C]; prompt: [B, S, C]; prompt_pad: [B, S] True=pad
    -> logits [B, Q] (model_misc.py:780-805).  prompt_mlp is residual
    with an output LayerNorm (model_builder.py:314-325)."""
    p = mlp(prompt, params["prompt_mlp"])
    p = ln(prompt + p, params["prompt_mlp_norm"])
    valid = (~prompt_pad).astype(p.dtype)[..., None]
    denom = jnp.clip(valid.sum(axis=1), 1.0, None)
    pooled = (p * valid).sum(axis=1) / denom            # [B, C]
    pp = linear(pooled, params["prompt_proj"])          # [B, d]
    qp = linear(queries, params["hs_proj"])             # [B, Q, d]
    scores = jnp.einsum("bqd,bd->bq", qp, pp) / jnp.sqrt(
        jnp.asarray(qp.shape[-1], qp.dtype))
    return jnp.clip(scores, -12.0, 12.0)
