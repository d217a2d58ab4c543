"""VideoPrism LVT — factorized video-text CLIP encoder (reference
postprocessing/prismaudio/vendor/videoprism/encoders.py:391-911,
models.py CONFIGS['videoprism_lvt_v1_large']).

ViViT model-2 factorized encoder: 18-px patches of 288x288 frames ->
spatial ViT (24 layers @ dim 1024 for large) per frame -> temporal
transformer (4 layers) across time at each spatial location ->
[B, T*N, D] spatiotemporal tokens.  Attentional token pooling (1
learned query) produces per-frame embeddings [B, T, D] and the global
contrastive video embedding [B, D]; a causal text tower with a class
token at the end gives the text embedding.  Attention logits are
tanh-capped at 50 (layers.py atten_logit_cap).

PrismAudio consumes: frame_embeddings (add tokens), video embedding
and text embedding (global conditioning) — runtime.py:232-247.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class VideoPrismConfig:
    image_size: int = 288
    patch: int = 18
    dim: int = 1024
    spatial_layers: int = 24
    temporal_layers: int = 4
    heads: int = 16
    mlp: int = 4096
    logit_cap: float = 50.0
    pos_frames: int = 8            # pos_emb_shape[0]
    vocab: int = 32000
    text_layers: int = 12
    text_max_len: int = 64
    eps: float = 1e-6

    @property
    def n_patches(self) -> int:
        return (self.image_size // self.patch) ** 2

    @classmethod
    def tiny(cls):
        return cls(image_size=36, patch=18, dim=16, spatial_layers=2,
                   temporal_layers=1, heads=2, mlp=32, pos_frames=4,
                   vocab=64, text_layers=2, text_max_len=16)


def _lin(key, din, dout, dtype, bias=True):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32)
               * 0.02).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return ((x32 - mu) * jax.lax.rsqrt(var + eps) * p["w"]
            + p["b"]).astype(x.dtype)


def _init_block(key, cfg: VideoPrismConfig, dtype):
    d = cfg.dim
    ks = iter(jax.random.split(key, 6))
    return {"ln1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "qkv": _lin(next(ks), d, 3 * d, dtype),
            "o": _lin(next(ks), d, d, dtype),
            "ln2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "fc1": _lin(next(ks), d, cfg.mlp, dtype),
            "fc2": _lin(next(ks), cfg.mlp, d, dtype)}


def _attn(q, k, v, heads, cap):
    b, lq, d = q.shape
    hd = d // heads
    q = q.reshape(b, lq, heads, hd)
    k = k.reshape(b, -1, heads, hd)
    v = v.reshape(b, -1, heads, hd)
    s = jnp.einsum("blhd,bshd->bhls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    if cap > 0:
        s = cap * jnp.tanh(s / cap)
    return s, v


def _block(x, bp, cfg: VideoPrismConfig, causal=False):
    b, n, d = x.shape
    y = _ln(x, bp["ln1"], cfg.eps)
    qkv = _dense(y, bp["qkv"]).reshape(b, n, 3, d)
    s, v = _attn(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], cfg.heads,
                 cfg.logit_cap)
    if causal:
        mask = jnp.tril(jnp.ones((n, n), bool))
        s = jnp.where(mask[None, None], s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
    o = jnp.einsum("bhls,bshd->blhd", a, v).reshape(b, n, d)
    x = x + _dense(o, bp["o"])
    y = _ln(x, bp["ln2"], cfg.eps)
    return x + _dense(jax.nn.gelu(_dense(y, bp["fc1"]),
                                  approximate=True), bp["fc2"])


def init_atten_pool(key, cfg: VideoPrismConfig, dtype):
    ks = iter(jax.random.split(key, 5))
    d = cfg.dim
    return {"query": (jax.random.normal(next(ks), (1, d), jnp.float32)
                      * 0.02).astype(dtype),
            "q": _lin(next(ks), d, d, dtype),
            "k": _lin(next(ks), d, d, dtype),
            "v": _lin(next(ks), d, d, dtype),
            "ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))}}


def atten_pool(p, cfg: VideoPrismConfig, tokens):
    """[B, T, D] -> [B, D] (AttenTokenPoolingLayer, 1 query)."""
    b = tokens.shape[0]
    q = _dense(jnp.broadcast_to(p["query"].astype(tokens.dtype)[None],
                                (b, 1, cfg.dim)), p["q"])
    k = _dense(tokens, p["k"])
    v = _dense(tokens, p["v"])
    s, vv = _attn(q, k, v, cfg.heads, cfg.logit_cap)
    a = jax.nn.softmax(s, axis=-1).astype(tokens.dtype)
    o = jnp.einsum("bhls,bshd->blhd", a, vv).reshape(b, 1, cfg.dim)
    return _ln(o, p["ln"], cfg.eps)[:, 0]


def init_videoprism(key, cfg: VideoPrismConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 12))
    n_side = cfg.image_size // cfg.patch
    return {
        "patch_embed": _lin(next(keys), cfg.patch * cfg.patch * 3,
                            cfg.dim, dtype),
        "spatial_pos": (jax.random.normal(
            next(keys), (n_side * n_side, cfg.dim), jnp.float32)
            * 0.02).astype(dtype),
        "temporal_pos": (jax.random.normal(
            next(keys), (cfg.pos_frames, cfg.dim), jnp.float32)
            * 0.02).astype(dtype),
        "spatial": [_init_block(k, cfg, dtype) for k in
                    jax.random.split(next(keys), cfg.spatial_layers)],
        "spatial_ln": {"w": jnp.ones((cfg.dim,)),
                       "b": jnp.zeros((cfg.dim,))},
        "temporal": [_init_block(k, cfg, dtype) for k in
                     jax.random.split(next(keys),
                                      cfg.temporal_layers)],
        "temporal_ln": {"w": jnp.ones((cfg.dim,)),
                        "b": jnp.zeros((cfg.dim,))},
        "pool": init_atten_pool(next(keys), cfg, dtype),
        "text_emb": (jax.random.normal(
            next(keys), (cfg.vocab, cfg.dim), jnp.float32)
            * 0.02).astype(dtype),
        "text_cls": (jax.random.normal(next(keys), (1, cfg.dim),
                                       jnp.float32) * 0.02
                     ).astype(dtype),
        "text_pos": (jax.random.normal(
            next(keys), (cfg.text_max_len + 1, cfg.dim), jnp.float32)
            * 0.02).astype(dtype),
        "text": [_init_block(k, cfg, dtype) for k in
                 jax.random.split(next(keys), cfg.text_layers)],
        "text_ln": {"w": jnp.ones((cfg.dim,)),
                    "b": jnp.zeros((cfg.dim,))},
    }


def _interp_pos(pos, n):
    if pos.shape[0] == n:
        return pos
    xi = jnp.linspace(0.0, pos.shape[0] - 1.0, n)
    i0 = jnp.floor(xi).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, pos.shape[0] - 1)
    w = (xi - i0)[:, None]
    return pos[i0] * (1 - w) + pos[i1] * w


def videoprism_encode(params, cfg: VideoPrismConfig, video):
    """video [B, T, H, W, 3] in [0,1] -> dict with
    spatiotemporal [B, T*N, D], frame_embeddings [B, T, D],
    video_embedding [B, D] (l2-normalized)."""
    b, t, h, w, _ = video.shape
    p = cfg.patch
    nh, nw = h // p, w // p
    n = nh * nw
    x = video.reshape(b * t, nh, p, nw, p, 3).transpose(0, 1, 3, 2, 4,
                                                        5)
    x = x.reshape(b * t, n, p * p * 3)
    x = _dense(x, params["patch_embed"])
    x = x + _interp_pos(params["spatial_pos"].astype(x.dtype),
                        n)[None]
    for bp in params["spatial"]:
        x = _block(x, bp, cfg)
    x = _ln(x, params["spatial_ln"], cfg.eps)
    # temporal attention at each spatial location (ViViT model-2)
    x = x.reshape(b, t, n, cfg.dim).transpose(0, 2, 1, 3) \
        .reshape(b * n, t, cfg.dim)
    x = x + _interp_pos(params["temporal_pos"].astype(x.dtype),
                        t)[None]
    for bp in params["temporal"]:
        x = _block(x, bp, cfg)
    x = _ln(x, params["temporal_ln"], cfg.eps)
    st = x.reshape(b, n, t, cfg.dim).transpose(0, 2, 1, 3) \
        .reshape(b, t * n, cfg.dim)

    video_emb = atten_pool(params["pool"], cfg, st)
    video_emb = video_emb / jnp.maximum(
        jnp.linalg.norm(video_emb.astype(jnp.float32), axis=-1,
                        keepdims=True), 1e-8).astype(video_emb.dtype)
    frames = st.reshape(b * t, n, cfg.dim)
    frame_emb = atten_pool(params["pool"], cfg, frames) \
        .reshape(b, t, cfg.dim)
    frame_emb = frame_emb / jnp.maximum(
        jnp.linalg.norm(frame_emb.astype(jnp.float32), axis=-1,
                        keepdims=True), 1e-8).astype(frame_emb.dtype)
    return {"spatiotemporal": st, "frame_embeddings": frame_emb,
            "video_embedding": video_emb}


def videoprism_encode_text(params, cfg: VideoPrismConfig, ids):
    """ids [B, L] -> text embedding [B, D] (causal tower, class token
    appended at the end, encoders.py:656-760)."""
    b, l = ids.shape
    x = params["text_emb"][ids]
    cls = jnp.broadcast_to(params["text_cls"].astype(x.dtype)[None],
                           (b, 1, cfg.dim))
    x = jnp.concatenate([x, cls], axis=1)
    x = x + params["text_pos"][:l + 1].astype(x.dtype)[None]
    for bp in params["text"]:
        x = _block(x, bp, cfg, causal=True)
    x = _ln(x, params["text_ln"], cfg.eps)
    emb = x[:, -1]
    return emb / jnp.maximum(
        jnp.linalg.norm(emb.astype(jnp.float32), axis=-1,
                        keepdims=True), 1e-8).astype(emb.dtype)
