"""CLIP ViT-H/14 vision tower for Wan i2v image conditioning.

Functional re-implementation of the reference's XLM-R CLIP visual branch
(/root/reference/models/wan/modules/clip.py:209 VisionTransformer with
dim 1280, 32 layers, 16 heads, patch 14, gelu, pre-norm;
CLIPModel.visual:534 resizes to 224 bicubic, maps [-1,1]->[0,1], normalizes
with the CLIP mean/std, and returns the *31-block* token sequence
(use_31_block=True) — 257 x 1280 features consumed by the DiT img_emb).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import layer_norm

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    dim: int = 1280
    mlp_ratio: int = 4
    num_heads: int = 16
    num_layers: int = 32
    eps: float = 1e-5
    compute_dtype: Any = jnp.bfloat16

    @property
    def num_tokens(self):
        return (self.image_size // self.patch_size) ** 2 + 1


def init_clip_vision(key, cfg: ClipVisionConfig = ClipVisionConfig(),
                     dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))
    d = cfg.dim
    gain = 1.0 / math.sqrt(d)

    def lin(key, din, dout):
        return {"w": (jax.random.normal(key, (din, dout), jnp.float32)
                      * 0.02).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    def block(key):
        ks = iter(jax.random.split(key, 4))
        return {
            "norm1": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "qkv": lin(next(ks), d, 3 * d),
            "proj": lin(next(ks), d, d),
            "norm2": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "mlp1": lin(next(ks), d, cfg.mlp_ratio * d),
            "mlp2": lin(next(ks), cfg.mlp_ratio * d, d),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.num_layers)]
    return {
        # pre_norm=True -> patch conv has no bias (clip.py:249-253)
        "patch_embedding": {"w": (jax.random.normal(
            next(keys), (cfg.patch_size, cfg.patch_size, 3, d), jnp.float32)
            * gain).astype(dtype)},
        "cls_embedding": (jax.random.normal(next(keys), (1, 1, d),
                                            jnp.float32) * gain),
        "pos_embedding": (jax.random.normal(
            next(keys), (1, cfg.num_tokens, d), jnp.float32) * gain),
        "pre_norm": {"w": jnp.ones((d,), jnp.float32),
                     "b": jnp.zeros((d,), jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


def preprocess_image(image, size: int = 224):
    """image: [H, W, 3] in [-1, 1] -> normalized [1, size, size, 3]."""
    img = jnp.asarray(image, jnp.float32)
    img = jax.image.resize(img, (size, size, 3), method="bicubic")
    img = (img * 0.5 + 0.5 - CLIP_MEAN) / CLIP_STD
    return img[None]


def clip_vision_encode(params, cfg: ClipVisionConfig, pixels,
                       use_31_block: bool = True):
    """pixels: [B, 224, 224, 3] normalized.  Returns [B, 257, 1280] tokens
    (31-block features, matching CLIPModel.visual)."""
    cdt = cfg.compute_dtype
    b = pixels.shape[0]
    x = jax.lax.conv_general_dilated(
        pixels.astype(cdt), params["patch_embedding"]["w"].astype(cdt),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(b, -1, cfg.dim)
    cls = jnp.broadcast_to(params["cls_embedding"].astype(cdt),
                           (b, 1, cfg.dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embedding"].astype(cdt)
    x = layer_norm(x, params["pre_norm"]["w"], params["pre_norm"]["b"],
                   eps=cfg.eps)

    n, hd = cfg.num_heads, cfg.dim // cfg.num_heads
    n_run = cfg.num_layers - 1 if use_31_block else cfg.num_layers

    def dense(x, p):
        return (jnp.dot(x, p["w"].astype(cdt),
                        preferred_element_type=jnp.float32)
                + p["b"]).astype(cdt)

    def body(carry, bp):
        x, i = carry

        def run(x):
            y = layer_norm(x, bp["norm1"]["w"], bp["norm1"]["b"], eps=cfg.eps)
            qkv = dense(y, bp["qkv"])
            l = x.shape[1]
            q, k, v = (u.squeeze(2) for u in jnp.split(
                qkv.reshape(b, l, 3, n, hd), 3, axis=2))
            s = jnp.einsum("blnd,bsnd->bnls", q, k,
                           preferred_element_type=jnp.float32) / np.sqrt(hd)
            p_attn = jax.nn.softmax(s, axis=-1).astype(cdt)
            o = jnp.einsum("bnls,bsnd->blnd", p_attn, v).reshape(b, l, -1)
            x = x + dense(o, bp["proj"])
            y = layer_norm(x, bp["norm2"]["w"], bp["norm2"]["b"], eps=cfg.eps)
            y = dense(y, bp["mlp1"])
            y = jax.nn.gelu(y.astype(jnp.float32),
                            approximate=False).astype(cdt)
            return x + dense(y, bp["mlp2"])

        x = jax.lax.cond(i < n_run, run, lambda x: x, x)
        return (x, i + 1), None

    (x, _), _ = jax.lax.scan(body, (x, jnp.asarray(0)), params["blocks"])
    return x
