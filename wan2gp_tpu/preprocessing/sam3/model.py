"""SAM3 image grounding model — orchestration and predictor API.

Reference: preprocessing/sam3/model/sam3_image.py Sam3Image
(forward_grounding :443-500: prepare prompt -> fusion encoder ->
DETR decoder -> segmentation heads) with the builder configuration
(model_builder.py build_sam3_image_model).  Input images are
(x - 0.5) / 0.5 normalized at 1008x1008 (model/io_utils.py:30-58).

The predictor mirrors the reference inference contract: text and/or
geometric prompts in, per-object masks + boxes + scores out, gated by
score * presence (multiplied probabilities, as in the demo predictor's
confidence = sigmoid(logits) * sigmoid(presence)).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .common import init_linear, linear
from .vit import ViTConfig, init_vit, vit_forward
from .neck import init_neck, neck_forward
from .text import TextConfig, init_text_encoder, text_encode
from .fusion import init_fusion, fusion_forward
from .geometry import init_geometry_encoder, encode_geometry
from .decoder import init_decoder, decoder_forward
from .seg_head import (init_seg_head, seg_head_forward, init_dot_scoring,
                       dot_scoring)


@dataclasses.dataclass(frozen=True)
class Sam3Config:
    img_size: int = 1008
    d_model: int = 256
    num_queries: int = 200
    fusion_layers: int = 6
    decoder_layers: int = 6
    geometry_layers: int = 3
    ffn_dim: int = 2048
    num_heads: int = 8
    vit: ViTConfig = ViTConfig()
    text: TextConfig = TextConfig()
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        """Small config for tests."""
        return cls(img_size=112, d_model=32, num_queries=8,
                   fusion_layers=2, decoder_layers=2, geometry_layers=1,
                   ffn_dim=64, num_heads=4,
                   vit=ViTConfig(img_size=112, patch_size=14, embed_dim=64,
                                 depth=4, num_heads=4, mlp_ratio=2.0,
                                 window_size=4, global_blocks=(1, 3),
                                 pretrain_img_size=56),
                   text=TextConfig(vocab_size=512, width=48, heads=4,
                                   layers=2, context_length=16,
                                   d_model=32))


def init_sam3(key, cfg: Sam3Config, dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    return {
        "vit": init_vit(keys[0], cfg.vit, dtype),
        "neck": init_neck(keys[1], cfg.vit.embed_dim, cfg.d_model,
                          dtype=dtype),
        "text": init_text_encoder(keys[2], cfg.text, dtype),
        "fusion": init_fusion(keys[3], cfg.d_model, cfg.ffn_dim,
                              cfg.num_heads, cfg.fusion_layers, dtype),
        "geometry": init_geometry_encoder(keys[4], cfg.d_model,
                                          cfg.ffn_dim, cfg.num_heads,
                                          cfg.geometry_layers,
                                          dtype=dtype),
        "decoder": init_decoder(keys[5], cfg.d_model, cfg.ffn_dim,
                                cfg.num_heads, cfg.decoder_layers,
                                cfg.num_queries, dtype),
        "seg": init_seg_head(keys[6], cfg.d_model, heads=cfg.num_heads,
                             dtype=dtype),
        "scoring": init_dot_scoring(keys[7], cfg.d_model, cfg.d_model,
                                    dtype),
    }


def sam3_detect(params, cfg: Sam3Config, image, text_ids=None,
                points=None, point_labels=None, boxes=None,
                box_labels=None, attn_backend: str = "auto"):
    """Single-image grounding.

    image: [B, H, W, 3] in [0, 1] at cfg.img_size resolution;
    text_ids: [B, S] int tokens (0 pad) or None;
    points: [B, Np, 2] normalized xy + point_labels [B, Np] (1=pos);
    boxes: [B, Nb, 4] normalized cxcywh + box_labels [B, Nb].

    Returns dict: masks [B, Q, H/4, W/4] logits, boxes [B, Q, 4] cxcywh,
    scores [B, Q] logits, presence [B] logit, semantic [B, H/4, W/4, 1].
    """
    b = image.shape[0]
    x = (image.astype(cfg.compute_dtype) - 0.5) / 0.5
    feats = vit_forward(params["vit"], cfg.vit, x, backend=attn_backend)
    levels, poss = neck_forward(params["neck"], feats, cfg.d_model)
    # scalp=1: drop the lowest-res level (vl_combiner.py:91-96)
    levels, poss = levels[:-1], poss[:-1]
    f72, p72 = levels[-1], poss[-1]
    h, w = f72.shape[1], f72.shape[2]

    # prompt: text tokens + geometry tokens (sam3_image.py:167-212)
    parts, pads = [], []
    if text_ids is not None:
        t_tokens, t_pad = text_encode(params["text"], cfg.text, text_ids)
        parts.append(t_tokens.astype(f72.dtype))
        pads.append(t_pad)
    p72b = jnp.broadcast_to(p72, f72.shape)
    geo, geo_pad = encode_geometry(
        params["geometry"], points, point_labels,
        None if points is None else jnp.zeros(points.shape[:2], bool),
        boxes, box_labels,
        None if boxes is None else jnp.zeros(boxes.shape[:2], bool),
        f72, p72b, cfg.d_model, heads=cfg.num_heads)
    parts.append(geo)
    pads.append(geo_pad)
    prompt = jnp.concatenate(parts, axis=1)
    prompt_pad = jnp.concatenate(pads, axis=1)

    # fusion encoder over the 72x72 level
    tokens = f72.reshape(b, h * w, cfg.d_model)
    pos_tok = p72b.reshape(b, h * w, cfg.d_model)
    memory = fusion_forward(params["fusion"], tokens, pos_tok, prompt,
                            prompt_pad, heads=cfg.num_heads)

    dec = decoder_forward(params["decoder"], memory, pos_tok, (h, w),
                          prompt, prompt_pad,
                          num_layers=cfg.decoder_layers,
                          heads=cfg.num_heads)
    scores = dot_scoring(params["scoring"], dec["queries"], prompt,
                         prompt_pad)
    seg = seg_head_forward(params["seg"], levels, memory, (h, w),
                           dec["queries"], prompt, prompt_pad,
                           heads=cfg.num_heads)
    return {"masks": seg["pred_masks"], "boxes": dec["boxes"],
            "scores": scores, "presence": dec["presence_logit"],
            "semantic": seg["semantic_seg"], "queries": dec["queries"],
            "memory": memory}


class Sam3ImagePredictor:
    """Convenience wrapper: numpy image + prompts -> binary masks.

    Mirrors the reference predictor contract (preprocessor.py
    _sam3_outputs_to_binary_mask + confidence gating): objects kept where
    sigmoid(score) * sigmoid(presence) >= threshold.
    """

    def __init__(self, params, cfg: Sam3Config, tokenizer=None,
                 threshold: float = 0.5, attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.threshold = threshold
        self.attn_backend = attn_backend
        if tokenizer is None:
            from ...utils.tokenizer import load_tokenizer
            tokenizer = load_tokenizer(None)
        self.tokenizer = tokenizer
        self._jit = jax.jit(
            lambda p, img, ids, pts, pl, bx, bl: sam3_detect(
                p, cfg, img, ids, pts, pl, bx, bl,
                attn_backend=attn_backend))

    def __call__(self, image: np.ndarray, text: Optional[str] = None,
                 points=None, point_labels=None, boxes=None,
                 box_labels=None, max_objects: int = 6):
        """image: [H, W, 3] uint8/float; returns dict with
        masks [N, H, W] bool, boxes [N, 4] xyxy pixels, scores [N]."""
        h0, w0 = image.shape[:2]
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        size = self.cfg.img_size
        # nearest-neighbour resize to the model resolution
        yi = (np.arange(size) * h0 / size).astype(np.int64)
        xi = (np.arange(size) * w0 / size).astype(np.int64)
        img = img[yi][:, xi]

        ids = None
        if text is not None:
            tok, _ = self.tokenizer([text], self.cfg.text.context_length)
            ids = jnp.asarray(tok, jnp.int32)
        pts = None if points is None else jnp.asarray(
            points, jnp.float32)[None]
        pl = None if point_labels is None else jnp.asarray(
            point_labels, jnp.float32)[None]
        bx = None if boxes is None else jnp.asarray(
            boxes, jnp.float32)[None]
        bl = None if box_labels is None else jnp.asarray(
            box_labels, jnp.float32)[None]
        out = self._jit(self.params, jnp.asarray(img)[None], ids, pts, pl,
                        bx, bl)
        scores = jax.nn.sigmoid(np.asarray(out["scores"][0]))
        presence = float(jax.nn.sigmoid(np.asarray(out["presence"][0])))
        conf = scores * presence
        order = np.argsort(-conf)[:max_objects]
        keep = order[conf[order] >= self.threshold]
        if keep.size == 0:
            keep = order[:1]  # always return the best hypothesis
        masks = np.asarray(out["masks"][0])[keep]          # [N, h4, w4]
        # nearest upsample back to the input resolution
        yi = (np.arange(h0) * masks.shape[1] / h0).astype(np.int64)
        xi = (np.arange(w0) * masks.shape[2] / w0).astype(np.int64)
        masks = masks[:, yi][:, :, xi] > 0.0
        bxs = np.asarray(out["boxes"][0])[keep]            # cxcywh [0,1]
        xyxy = np.stack([
            (bxs[:, 0] - bxs[:, 2] / 2) * w0,
            (bxs[:, 1] - bxs[:, 3] / 2) * h0,
            (bxs[:, 0] + bxs[:, 2] / 2) * w0,
            (bxs[:, 1] + bxs[:, 3] / 2) * h0], axis=-1)
        return {"masks": masks, "boxes": xyxy, "scores": conf[keep],
                "presence": presence}
