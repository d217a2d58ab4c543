"""Geometry (point/box) prompt encoder.

Reference: preprocessing/sam3/model/geometry_encoders.py
SequenceGeometryEncoder (:470-838) in the builder configuration
(model_builder.py:352-412): points encoded as direct-projection +
feature pooling (grid_sample at the point) + sine pos-enc projection;
boxes as direct-projection + RoIAlign 7x7 pooling + sine box pos-enc;
positive/negative label embeddings; a CLS token; a final Linear+LN;
then 3 transformer layers (self-attn over the geometry sequence +
cross-attn to the 72x72 image tokens, encoder.py TransformerEncoderLayer
with pos_enc_at_cross_attn_keys=True) and a closing LayerNorm.

RoI pooling uses one bilinear sample per output bin (aligned=True bin
centers) — torchvision roi_align with sampling_ratio=1; the reference's
adaptive sampling_ratio=-1 averages more points per bin.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..raft import bilinear_sample
from .common import (box_cxcywh_to_xyxy, init_linear, init_ln, init_mha,
                     linear, ln, sine_box_embed, sine_xy)
from .fusion import init_fusion_layer


def init_geometry_encoder(key, d_model: int = 256, ffn: int = 2048,
                          heads: int = 8, num_layers: int = 3,
                          roi_size: int = 7, dtype=jnp.float32):
    keys = jax.random.split(key, num_layers + 9)
    layers = [init_fusion_layer(keys[i], d_model, ffn, heads, dtype)
              for i in range(num_layers)]
    return {
        "label_embed": (jax.random.normal(keys[-1], (2, d_model))
                        * 0.02).astype(dtype),
        "cls": (jax.random.normal(keys[-2], (d_model,)) * 0.02
                ).astype(dtype),
        "pt_direct": init_linear(keys[-3], 2, d_model, dtype),
        "pt_pool": init_linear(keys[-4], d_model, d_model, dtype),
        "pt_pos": init_linear(keys[-5], d_model, d_model, dtype),
        "bx_direct": init_linear(keys[-6], 4, d_model, dtype),
        # Conv2d(d, d, roi_size) == full-window linear over the RoI grid
        "bx_pool": init_linear(keys[-7], d_model * roi_size * roi_size,
                               d_model, dtype),
        "bx_pos": init_linear(keys[-8], d_model + 2, d_model, dtype),
        "final": init_linear(keys[-9], d_model, d_model, dtype),
        "final_norm": init_ln(d_model, dtype),
        "img_pre_norm": init_ln(d_model, dtype),
        "enc_norm": init_ln(d_model, dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
    }


def _roi_align(feat, boxes_xyxy, out: int):
    """feat: [B, H, W, C]; boxes_xyxy: [B, N, 4] in pixel units ->
    [B, N, out, out, C].  aligned=True bin centers, one sample per bin."""
    b, h, w, c = feat.shape
    n = boxes_xyxy.shape[1]
    x1, y1, x2, y2 = jnp.split(boxes_xyxy, 4, axis=-1)  # [B, N, 1]
    bw = (x2 - x1) / out
    bh = (y2 - y1) / out
    idx = jnp.arange(out, dtype=feat.dtype) + 0.5
    xs = x1[..., None] + bw[..., None] * idx - 0.5       # [B, N, 1, out]
    ys = y1[..., None] + bh[..., None] * idx - 0.5
    gx = jnp.broadcast_to(xs[:, :, 0, None, :], (b, n, out, out))
    gy = jnp.broadcast_to(ys[:, :, 0, :, None], (b, n, out, out))
    coords = jnp.stack([gx, gy], axis=-1).reshape(b, n * out * out, 2)
    samp = bilinear_sample(feat, coords)
    return samp.reshape(b, n, out, out, c)


def encode_geometry(params, points, point_labels, point_pad,
                    boxes, box_labels, box_pad, img_feat, img_pos,
                    d_model: int = 256, heads: int = 8):
    """points: [B, Np, 2] normalized xy; boxes: [B, Nb, 4] cxcywh
    normalized; labels int (1=positive, 0=negative); pads True=padding.
    img_feat/img_pos: [B, H, W, C] 72x72 level.  Returns
    (geo_tokens [B, Np+Nb+1, C], pad [B, Np+Nb+1])."""
    b, h, w, c = img_feat.shape
    feat_n = ln(img_feat, params["img_pre_norm"])
    parts, pads = [], []

    if points is not None and points.shape[1] > 0:
        emb = linear(points, params["pt_direct"])
        # grid_sample at the point (geometry_encoders.py:596-612,
        # align_corners=False): pixel coord = p * size - 0.5
        px = jnp.stack([points[..., 0] * w - 0.5,
                        points[..., 1] * h - 0.5], axis=-1)
        emb = emb + linear(bilinear_sample(feat_n, px), params["pt_pool"])
        ex, ey = sine_xy(points[..., 0], points[..., 1], d_model)
        emb = emb + linear(jnp.concatenate([ex, ey], -1), params["pt_pos"])
        emb = emb + params["label_embed"][point_labels.astype(jnp.int32)]
        parts.append(emb)
        pads.append(point_pad)

    if boxes is not None and boxes.shape[1] > 0:
        emb = linear(boxes, params["bx_direct"])
        scale = jnp.asarray([w, h, w, h], boxes.dtype)
        # roi_size is recovered from the pooling-projection weight shape so
        # it stays a static Python int under jit (not a traced pytree leaf)
        roi_size = int(round(
            (params["bx_pool"]["w"].shape[0] // c) ** 0.5))
        rois = _roi_align(feat_n, box_cxcywh_to_xyxy(boxes) * scale,
                          roi_size)
        emb = emb + linear(rois.reshape(*rois.shape[:2], -1),
                           params["bx_pool"])
        emb = emb + linear(sine_box_embed(boxes, d_model), params["bx_pos"])
        emb = emb + params["label_embed"][box_labels.astype(jnp.int32)]
        parts.append(emb)
        pads.append(box_pad)

    cls = jnp.broadcast_to(params["cls"], (b, 1, d_model)
                           ).astype(img_feat.dtype)
    parts.append(cls)
    pads.append(jnp.zeros((b, 1), bool))
    geo = jnp.concatenate(parts, axis=1)
    pad = jnp.concatenate(pads, axis=1)

    geo = ln(linear(geo, params["final"]), params["final_norm"])

    img_tokens = img_feat.reshape(b, h * w, c)
    pos_tokens = img_pos.reshape(b, h * w, c)

    def body(x, p):
        # pre-norm layer; keys carry sine pos (pos_enc_at_cross_attn_keys)
        hn = ln(x, p["norm1"])
        x = x + _masked_self(p, hn, pad)
        hn = ln(x, p["norm2"])
        from .common import mha
        x = x + mha(p["cross"], hn, img_tokens + pos_tokens,
                    img_tokens, heads)
        hn = ln(x, p["norm3"])
        x = x + linear(jax.nn.relu(linear(hn, p["fc1"])), p["fc2"])
        return x, None

    def _masked_self(p, hn, pad):
        from .common import mha
        return mha(p["self"], hn, hn, hn, heads, key_padding_mask=pad)

    geo, _ = jax.lax.scan(body, geo, params["layers"])
    geo = ln(geo, params["enc_norm"])
    return geo, pad
