"""Kandinsky 5 DiffusionTransformer3D, TPU-native.

Functional re-implementation of the reference
(/root/reference/models/kandinsky5/kandinsky/models/dit.py, nn.py):
a text encoder (2 modulated self-attn blocks over Qwen2.5-VL states with
1D RoPE) followed by 32/60 visual decoder blocks (self-attn with 3D RoPE,
cross-attn over the refined text, exact-GELU MLP), all modulated from a
timestep embedding summed with a CLIP pooled-text embedding
(dit.py:175-180).  Modulation layers are zero-initialised (nn.py:169-171),
scale used as (1 + scale), gates linear (no tanh).  Latents travel
channels-last [T, H, W, C] in the reference; here batch-first
[B, T, H, W, C] with tokens flattened to [B, L, D] under lax.scan.

Lite: model_dim 1792, ff 7168, 32 blocks, head_dim 64 (axes 16,24,24);
Pro: model_dim 4096, ff 16384, 60 blocks, time_dim 1024
(configs/k5_lite_t2v_5s_sft_sd.yaml, k5_pro_t2v_5s_sft_hd.yaml).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class Kandinsky5Config:
    in_visual_dim: int = 16
    out_visual_dim: int = 16
    in_text_dim: int = 3584          # Qwen2.5-VL hidden
    in_text_dim2: int = 768          # CLIP pooled
    time_dim: int = 512
    model_dim: int = 1792
    ff_dim: int = 7168
    num_text_blocks: int = 2
    num_visual_blocks: int = 32
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    axes_dims: Tuple[int, int, int] = (16, 24, 24)
    visual_cond: bool = True
    norm_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return sum(self.axes_dims)

    @property
    def visual_embed_dim(self):
        return (2 * self.in_visual_dim + 1 if self.visual_cond
                else self.in_visual_dim)


def _lin(key, din, dout, dtype, bias=True, zero=False):
    if zero:
        p = {"w": jnp.zeros((din, dout), dtype)}
    else:
        limit = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                     -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _attn_params(key, cfg, dtype):
    ks = iter(jax.random.split(key, 4))
    d = cfg.model_dim
    return {"q": _lin(next(ks), d, d, dtype),
            "k": _lin(next(ks), d, d, dtype),
            "v": _lin(next(ks), d, d, dtype),
            "o": _lin(next(ks), d, d, dtype),
            "q_norm": jnp.ones((cfg.head_dim,), jnp.float32),
            "k_norm": jnp.ones((cfg.head_dim,), jnp.float32)}


def _ff_params(key, cfg, dtype):
    k1, k2 = jax.random.split(key)
    return {"in": _lin(k1, cfg.model_dim, cfg.ff_dim, dtype, bias=False),
            "out": _lin(k2, cfg.ff_dim, cfg.model_dim, dtype, bias=False)}


def init_kandinsky5(key, cfg: Kandinsky5Config, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 16))

    def text_block(key):
        k1, k2 = jax.random.split(key)
        return {"mod": _lin(key, cfg.time_dim, 6 * cfg.model_dim, dtype,
                            zero=True),
                "attn": _attn_params(k1, cfg, dtype),
                "ff": _ff_params(k2, cfg, dtype)}

    def visual_block(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"mod": _lin(key, cfg.time_dim, 9 * cfg.model_dim, dtype,
                            zero=True),
                "self_attn": _attn_params(k1, cfg, dtype),
                "cross_attn": _attn_params(k2, cfg, dtype),
                "ff": _ff_params(k3, cfg, dtype)}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "time_embeddings": {
            "in": _lin(next(keys), cfg.model_dim, cfg.time_dim, jnp.float32),
            "out": _lin(next(keys), cfg.time_dim, cfg.time_dim,
                        jnp.float32)},
        "text_embeddings": {
            "lin": _lin(next(keys), cfg.in_text_dim, cfg.model_dim, dtype),
            "ln_w": jnp.ones((cfg.model_dim,), jnp.float32),
            "ln_b": jnp.zeros((cfg.model_dim,), jnp.float32)},
        "pooled_text_embeddings": {
            "lin": _lin(next(keys), cfg.in_text_dim2, cfg.time_dim,
                        jnp.float32),
            "ln_w": jnp.ones((cfg.time_dim,), jnp.float32),
            "ln_b": jnp.zeros((cfg.time_dim,), jnp.float32)},
        "visual_embeddings": _lin(
            next(keys), int(np.prod(cfg.patch_size)) * cfg.visual_embed_dim,
            cfg.model_dim, dtype),
        "text_blocks": stack([text_block(k) for k in jax.random.split(
            next(keys), cfg.num_text_blocks)]),
        "visual_blocks": stack([visual_block(k) for k in jax.random.split(
            next(keys), cfg.num_visual_blocks)]),
        "out_layer": {
            "mod": _lin(next(keys), cfg.time_dim, 2 * cfg.model_dim,
                        jnp.float32, zero=True),
            "lin": _lin(next(keys), cfg.model_dim,
                        int(np.prod(cfg.patch_size)) * cfg.out_visual_dim,
                        dtype)},
    }


# ---------------------------------------------------------------------------
# forward pieces
# ---------------------------------------------------------------------------

def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _ln(x, eps, w=None, b=None):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w + b
    return y


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _get_freqs(dim: int, max_period: float = 10000.0) -> np.ndarray:
    """utils.py:26: exponent arange(dim)/dim over dim entries."""
    return np.exp(-math.log(max_period) * np.arange(dim, dtype=np.float64)
                  / dim)


def kandinsky_time_embed(params, cfg: Kandinsky5Config, t, pooled_text):
    """t: [B] in [0,1] (no 1000x scale, nn.py:68); pooled_text: [B, 768]."""
    freqs = jnp.asarray(_get_freqs(cfg.model_dim // 2), jnp.float32)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    te = params["time_embeddings"]
    h = _dense(emb, te["in"])
    h = _dense(jax.nn.silu(h), te["out"])
    pe = params["pooled_text_embeddings"]
    p = _dense(pooled_text.astype(jnp.float32), pe["lin"])
    p = _ln(p, cfg.norm_eps, pe["ln_w"], pe["ln_b"])
    return h + p     # [B, time_dim] fp32


def build_kandinsky_rope(grid_thw, text_len: int, cfg: Kandinsky5Config,
                         scale_factor=(1.0, 2.0, 2.0)):
    """(visual cos/sin [L_vis, hd/2], text cos/sin [L_txt, hd/2]).

    Visual: per-axis outer(pos, freqs)/scale concatenated (nn.py:139-160);
    text: 1D rope over full head_dim (nn.py:109-126)."""
    t, h, w = grid_thw
    parts = []
    for i, (n, d, s) in enumerate(zip((t, h, w), cfg.axes_dims,
                                      scale_factor)):
        fr = _get_freqs(d // 2)
        args = np.outer(np.arange(n, dtype=np.float64), fr) / s  # [n, d/2]
        shape = [1, 1, 1, args.shape[1]]
        shape[i] = n
        parts.append(np.broadcast_to(args.reshape(shape),
                                     (t, h, w, args.shape[1])))
    vis = np.concatenate(parts, axis=-1).reshape(t * h * w, -1)
    fr = _get_freqs(cfg.head_dim // 2)
    txt = np.outer(np.arange(text_len, dtype=np.float64), fr)
    return ((jnp.asarray(np.cos(vis), jnp.float32),
             jnp.asarray(np.sin(vis), jnp.float32)),
            (jnp.asarray(np.cos(txt), jnp.float32),
             jnp.asarray(np.sin(txt), jnp.float32)))


def patchify_k5(x, patch):
    """[B, T, H, W, C] -> [B, T/pt * H/ph * W/pw, pt*ph*pw*C]
    (nn.py:95-107 VisualEmbeddings)."""
    b, t, h, w, c = x.shape
    pt, ph, pw = patch
    x = x.reshape(b, t // pt, pt, h // ph, ph, w // pw, pw, c)
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, (t // pt) * (h // ph) * (w // pw), pt * ph * pw * c)


def unpatchify_k5(x, grid_thw, patch, c):
    """inverse of OutLayer's unpatchify (nn.py:399-416)."""
    b = x.shape[0]
    t, h, w = grid_thw
    pt, ph, pw = patch
    x = x.reshape(b, t, h, w, c, pt, ph, pw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * pt, h * ph, w * pw, c)


def _mha(p, x, cond, cos, sin, cfg, backend):
    """RMS-qk-normed multihead attention; cond==x for self-attn."""
    b, l, d = x.shape
    n = d // cfg.head_dim
    q = _dense(x, p["q"]).reshape(b, l, n, cfg.head_dim)
    k = _dense(cond, p["k"]).reshape(b, cond.shape[1], n, cfg.head_dim)
    v = _dense(cond, p["v"]).reshape(b, cond.shape[1], n, cfg.head_dim)
    q = _rms(q, p["q_norm"])
    k = _rms(k, p["k_norm"])
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    o = attention(q, k, v, backend=backend).reshape(b, l, d)
    return _dense(o, p["o"])


def _ff(p, x):
    h = _dense(x, p["in"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(x.dtype)
    return _dense(h, p["out"])


def _mod_chunks(p, time_embed, n, dim):
    m = _dense(jax.nn.silu(time_embed.astype(jnp.float32)), p)
    return [m[:, None, i * dim:(i + 1) * dim] for i in range(n)]


def kandinsky5_forward(params, cfg: Kandinsky5Config, visual_tokens,
                       text_states, time_embed, vis_rope, txt_rope,
                       attn_backend: str = "auto"):
    """visual_tokens: [B, L_vis, prod(patch)*visual_embed_dim];
    text_states: [B, L_txt, in_text_dim]; time_embed: [B, time_dim] from
    kandinsky_time_embed.  Returns [B, L_vis, prod(patch)*out_visual_dim]."""
    cdt = cfg.compute_dtype
    eps = cfg.norm_eps
    d = cfg.model_dim

    te = params["text_embeddings"]
    txt = _dense(text_states.astype(cdt), te["lin"])
    txt = _ln(txt, eps, te["ln_w"], te["ln_b"]).astype(cdt)

    def text_block(txt, bp):
        sh, sc, g, sh2, sc2, g2 = _mod_chunks(bp["mod"], time_embed, 6, d)
        y = (_ln(txt, eps) * (sc + 1.0) + sh).astype(cdt)
        a = _mha(bp["attn"], y, y, txt_rope[0], txt_rope[1], cfg,
                 attn_backend)
        txt = (txt.astype(jnp.float32) + g * a.astype(jnp.float32)
               ).astype(cdt)
        y = (_ln(txt, eps) * (sc2 + 1.0) + sh2).astype(cdt)
        f = _ff(bp["ff"], y)
        return (txt.astype(jnp.float32) + g2 * f.astype(jnp.float32)
                ).astype(cdt), None

    txt, _ = jax.lax.scan(text_block, txt, params["text_blocks"])

    x = _dense(visual_tokens.astype(cdt), params["visual_embeddings"])

    def visual_block(x, bp):
        mods = _mod_chunks(bp["mod"], time_embed, 9, d)
        sh, sc, g = mods[0], mods[1], mods[2]
        y = (_ln(x, eps) * (sc + 1.0) + sh).astype(cdt)
        a = _mha(bp["self_attn"], y, y, vis_rope[0], vis_rope[1], cfg,
                 attn_backend)
        x = (x.astype(jnp.float32) + g * a.astype(jnp.float32)).astype(cdt)
        sh, sc, g = mods[3], mods[4], mods[5]
        y = (_ln(x, eps) * (sc + 1.0) + sh).astype(cdt)
        a = _mha(bp["cross_attn"], y, txt, None, None, cfg, attn_backend)
        x = (x.astype(jnp.float32) + g * a.astype(jnp.float32)).astype(cdt)
        sh, sc, g = mods[6], mods[7], mods[8]
        y = (_ln(x, eps) * (sc + 1.0) + sh).astype(cdt)
        f = _ff(bp["ff"], y)
        return (x.astype(jnp.float32) + g * f.astype(jnp.float32)
                ).astype(cdt), None

    x, _ = jax.lax.scan(visual_block, x, params["visual_blocks"])

    op = params["out_layer"]
    sh, sc = _mod_chunks(op["mod"], time_embed, 2, d)
    y = (_ln(x, eps) * (sc + 1.0) + sh).astype(cdt)
    return _dense(y, op["lin"]).astype(jnp.float32)
