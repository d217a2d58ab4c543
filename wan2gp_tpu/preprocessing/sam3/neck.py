"""SimpleFPN neck (Sam3DualViTDetNeck) — multi-scale features from the
single ViT output.

Reference: preprocessing/sam3/model/necks.py:15-127 — per scale factor
{4: deconv2x+gelu+deconv2x, 2: deconv2x, 1: identity, 0.5: maxpool2x},
then 1x1 conv -> d_model and 3x3 conv, plus sine position encodings.
The VL combiner drops the lowest-resolution level (scalp=1,
vl_combiner.py:91-96), so the canonical SAM3 config yields levels at
4x, 2x, 1x the 72x72 token grid (288, 144, 72).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from .common import init_linear, sine_grid_pos


def _init_conv(key, kh, kw, cin, cout, dtype):
    return {"w": (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
                  * 0.02).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _conv(x, p, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def _deconv2x(x, p):
    y = jax.lax.conv_transpose(
        x, p["w"], (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["b"]


def init_neck(key, embed_dim: int, d_model: int,
              scale_factors=(4.0, 2.0, 1.0, 0.5), dtype=jnp.float32):
    params: List[Dict] = []
    keys = jax.random.split(key, len(scale_factors) * 4)
    ki = iter(keys)
    d = embed_dim
    for scale in scale_factors:
        stage: Dict[str, Any] = {}
        if scale == 4.0:
            stage["up0"] = _init_conv(next(ki), 2, 2, d, d // 2, dtype)
            stage["up1"] = _init_conv(next(ki), 2, 2, d // 2, d // 4, dtype)
            out = d // 4
        elif scale == 2.0:
            stage["up0"] = _init_conv(next(ki), 2, 2, d, d // 2, dtype)
            out = d // 2
        elif scale == 1.0:
            out = d
        elif scale == 0.5:
            out = d
        else:
            raise ValueError(f"unsupported neck scale {scale}")
        stage["conv1"] = _init_conv(next(ki), 1, 1, out, d_model, dtype)
        stage["conv3"] = _init_conv(next(ki), 3, 3, d_model, d_model, dtype)
        params.append(stage)
    return {"stages": params}


def neck_forward(params, x, d_model: int,
                 scale_factors=(4.0, 2.0, 1.0, 0.5)):
    """x: [B, h, w, embed_dim] ViT features -> (feats, pos) lists of
    [B, H_l, W_l, d_model] per scale factor."""
    feats, poss = [], []
    for scale, stage in zip(scale_factors, params["stages"]):
        y = x
        if scale == 4.0:
            y = _deconv2x(y, stage["up0"])
            y = jax.nn.gelu(y, approximate=False)
            y = _deconv2x(y, stage["up1"])
        elif scale == 2.0:
            y = _deconv2x(y, stage["up0"])
        elif scale == 0.5:
            y = jax.lax.reduce_window(
                y, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
        y = _conv(y, stage["conv1"])
        y = _conv(y, stage["conv3"])
        feats.append(y)
        poss.append(sine_grid_pos(y.shape[1], y.shape[2], d_model)[None]
                    .astype(y.dtype))
    return feats, poss
