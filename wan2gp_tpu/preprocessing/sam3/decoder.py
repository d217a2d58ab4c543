"""DETR-style decoder with box refinement, log boxRPB, presence token.

Reference: preprocessing/sam3/model/decoder.py TransformerDecoderLayer
(:34-193) and TransformerDecoder (:196-618) in the builder config
(model_builder.py:279-311): 6 layers, 200 queries, d=256, 8 heads,
ffn 2048, box_refine, boxRPB="log", presence_token, text cross-attn,
use_normed_output_consistently.  DAC only affects training
(apply_dac = dac and training, sam3_image.py:268); at inference all
queries self-attend and num_o2m = 0.

Per layer (post-norm):
  1. self-attn over [presence; queries] with conditional query pos
     (sine(ref box) -> ref_point_head MLP; zeros for presence), +norm2
  2. cross-attn to prompt tokens (key padding mask), +catext_norm
  3. cross-attn to fused image memory with additive boxRPB bias
     (zero bias row for presence), keys carry sine pos, +norm1
  4. ReLU FFN, +norm3
then box refinement: ref <- sigmoid(bbox_mlp(norm(out)) + logit(ref)).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import (box_cxcywh_to_xyxy, gen_sineembed_for_position,
                     init_linear, init_ln, init_mha, init_mlp,
                     inverse_sigmoid, linear, ln, mha, mlp)


def init_decoder_layer(key, d_model: int, ffn: int, heads: int, dtype):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {"self": init_mha(k1, d_model, heads, dtype=dtype),
            "ca_text": init_mha(k2, d_model, heads, dtype=dtype),
            "cross": init_mha(k3, d_model, heads, dtype=dtype),
            "norm1": init_ln(d_model, dtype),
            "norm2": init_ln(d_model, dtype),
            "norm3": init_ln(d_model, dtype),
            "catext_norm": init_ln(d_model, dtype),
            "fc1": init_linear(k4, d_model, ffn, dtype),
            "fc2": init_linear(k5, ffn, d_model, dtype)}


def init_decoder(key, d_model: int = 256, ffn: int = 2048, heads: int = 8,
                 num_layers: int = 6, num_queries: int = 200,
                 dtype=jnp.float32):
    keys = jax.random.split(key, num_layers + 8)
    layers = [init_decoder_layer(keys[i], d_model, ffn, heads, dtype)
              for i in range(num_layers)]
    return {
        "layers": [l for l in layers],  # heterogeneous unroll (6 layers)
        "query_embed": (jax.random.normal(keys[-1], (num_queries, d_model))
                        ).astype(dtype),
        "reference_points": (jax.random.normal(
            keys[-2], (num_queries, 4)) * 0.5).astype(dtype),
        "ref_point_head": init_mlp(keys[-3], 2 * d_model, d_model, d_model,
                                   2, dtype),
        "bbox_embed": init_mlp(keys[-4], d_model, d_model, 4, 3, dtype),
        "rpb_x": init_mlp(keys[-5], 2, d_model, heads, 2, dtype),
        "rpb_y": init_mlp(keys[-6], 2, d_model, heads, 2, dtype),
        "norm": init_ln(d_model, dtype),
        "presence_token": (jax.random.normal(keys[-7], (d_model,)) * 0.02
                           ).astype(dtype),
        "presence_head": init_mlp(keys[-8], d_model, d_model, 1, 3, dtype),
        "presence_norm": init_ln(d_model, dtype),
    }


def _rpb_bias(params, ref_boxes, h: int, w: int):
    """Log-spaced box relative position bias (decoder.py:337-415).
    ref_boxes: [B, Q, 4] cxcywh in [0,1] -> [B, heads, Q, H*W]."""
    xyxy = box_cxcywh_to_xyxy(ref_boxes)                    # [B, Q, 4]
    cy = jnp.arange(h, dtype=jnp.float32) / h
    cx = jnp.arange(w, dtype=jnp.float32) / w
    dy = cy[None, None, :, None] - xyxy[:, :, None, 1:4:2]  # [B,Q,H,2]
    dx = cx[None, None, :, None] - xyxy[:, :, None, 0:3:2]  # [B,Q,W,2]

    def logmap(d):
        d = d * 8.0
        return jnp.sign(d) * jnp.log2(jnp.abs(d) + 1.0) / jnp.log2(8.0)

    bx = mlp(logmap(dx), params["rpb_x"])                   # [B,Q,W,heads]
    by = mlp(logmap(dy), params["rpb_y"])                   # [B,Q,H,heads]
    bias = by[:, :, :, None, :] + bx[:, :, None, :, :]      # [B,Q,H,W,nh]
    return bias.reshape(*bias.shape[:2], h * w, -1).transpose(0, 3, 1, 2)


def decoder_forward(params, memory, mem_pos, feat_hw: Tuple[int, int],
                    prompt, prompt_pad, num_layers: int = 6,
                    heads: int = 8):
    """memory: [B, L, C] fused image tokens; mem_pos: [B, L, C];
    prompt/prompt_pad: [B, S, C]/[B, S]; returns dict with
    queries [B, Q, C] (final-layer, normed), boxes [B, Q, 4] (cxcywh),
    presence_logit [B], plus per-layer stacks for parity tests."""
    b, l, c = memory.shape
    h, w = feat_hw
    q = params["query_embed"].shape[0]
    tgt = jnp.broadcast_to(params["query_embed"], (b, q, c)
                           ).astype(memory.dtype)
    ref = jax.nn.sigmoid(params["reference_points"])[None].repeat(b, 0)
    presence = jnp.broadcast_to(params["presence_token"], (b, 1, c)
                                ).astype(memory.dtype)

    inter_out, inter_ref, inter_presence = [], [ref], []
    for li in range(num_layers):
        p = params["layers"][li]
        sine = gen_sineembed_for_position(ref, c)            # [B, Q, 2C]
        query_pos = mlp(sine, params["ref_point_head"])      # [B, Q, C]

        # 1. self-attention over [presence; queries]
        cat = jnp.concatenate([presence, tgt], axis=1)
        cat_pos = jnp.concatenate([jnp.zeros_like(presence), query_pos],
                                  axis=1)
        qk = cat + cat_pos
        cat = cat + mha(p["self"], qk, qk, cat, heads)
        cat = ln(cat, p["norm2"])

        # 2. cross-attention to the prompt
        cat = cat + mha(p["ca_text"], cat + cat_pos, prompt, prompt,
                        heads, key_padding_mask=prompt_pad)
        cat = ln(cat, p["catext_norm"])

        # 3. cross-attention to image memory with boxRPB bias
        bias = _rpb_bias(params, ref, h, w)                  # [B,nh,Q,L]
        zero_row = jnp.zeros_like(bias[:, :, :1])
        bias = jnp.concatenate([zero_row, bias], axis=2)     # presence row
        cat = cat + mha(p["cross"], cat + cat_pos, memory + mem_pos,
                        memory, heads, attn_bias=bias)
        cat = ln(cat, p["norm1"])

        # 4. FFN
        cat = cat + linear(jax.nn.relu(linear(cat, p["fc1"])), p["fc2"])
        cat = ln(cat, p["norm3"])

        presence, tgt = cat[:, :1], cat[:, 1:]

        # box refinement on the normed output (decoder.py:561-580)
        normed = ln(tgt, params["norm"])
        delta = mlp(normed, params["bbox_embed"])
        new_ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
        ref = jax.lax.stop_gradient(new_ref)
        if li != num_layers - 1:
            inter_ref.append(new_ref)
        inter_out.append(normed)
        pl = mlp(ln(presence, params["presence_norm"]),
                 params["presence_head"])[:, 0, 0]
        inter_presence.append(jnp.clip(pl, -10.0, 10.0))

    return {"queries": inter_out[-1],
            "boxes": new_ref,
            "presence_logit": inter_presence[-1],
            "hs_stack": jnp.stack(inter_out),
            "ref_stack": jnp.stack(inter_ref),
            "presence_stack": jnp.stack(inter_presence)}
