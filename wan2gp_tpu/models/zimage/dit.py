"""Z-Image transformer (Lumina-lineage single-stream DiT), TPU-native.

Functional re-implementation of the reference's ZImageTransformer2DModel
(/root/reference/models/z_image/z_image_transformer2d.py): 30 sandwich-norm
blocks over a packed [img, cap] sequence, 2 modulated noise-refiner blocks on
image tokens, 2 unmodulated context-refiner blocks on caption tokens, adaLN
from a 256-dim timestep embedding (ADALN_EMBED_DIM, :40) with tanh gates
(:224-245), SwiGLU FFN (hidden = dim*8/3, :87), QK RMS-norm, and 3-axis RoPE
with theta 256 (:341-386).  Model time convention: timestep 1 = clean
(the pipeline feeds (1000-t)/1000, pipeline_z_image.py:897).

Padding is handled with learned pad tokens (x_pad_token / cap_pad_token,
:526-527) substituted at padded positions — padded tokens ARE attended
(reference uses all-ones attention masks), so no kv-mask is needed; shapes
stay static for XLA.
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
from ..flux.dit import rope_from_ids, timestep_embedding


@dataclasses.dataclass(frozen=True)
class ZImageConfig:
    # configs/z_image.json
    dim: int = 3840
    n_layers: int = 30
    n_refiner_layers: int = 2
    n_heads: int = 30
    in_channels: int = 16
    cap_feat_dim: int = 2560
    patch: int = 2
    theta: float = 256.0
    axes_dim: Tuple[int, ...] = (32, 48, 48)
    t_scale: float = 1000.0
    norm_eps: float = 1e-5
    adaln_dim: int = 256            # min(dim, ADALN_EMBED_DIM)
    t_mid_dim: int = 1024           # TimestepEmbedder mid_size
    seq_multiple: int = 32          # SEQ_MULTI_OF (:41)
    # ControlNet-style branch (z_image_transformer2d.py:561-594):
    # control blocks at every 2nd layer produce after_proj skips
    control: bool = False
    control_in_dim: int = 0         # 16 (v1) or 33 (v2 inpaint)
    n_control_refiner: int = 2
    compute_dtype: Any = jnp.bfloat16

    @property
    def control_places(self):
        return tuple(range(0, self.n_layers, 2))

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def ffn_dim(self):
        return int(self.dim / 3 * 8)


def _lin(key, din, dout, dtype, bias=True):
    limit = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _block_params(key, cfg: ZImageConfig, modulated: bool, dtype):
    ks = iter(jax.random.split(key, 10))
    d, hd = cfg.dim, cfg.head_dim
    p = {
        "to_q": _lin(next(ks), d, d, dtype, bias=False),
        "to_k": _lin(next(ks), d, d, dtype, bias=False),
        "to_v": _lin(next(ks), d, d, dtype, bias=False),
        "to_out": _lin(next(ks), d, d, dtype, bias=False),
        "norm_q": jnp.ones((hd,), jnp.float32),
        "norm_k": jnp.ones((hd,), jnp.float32),
        "attention_norm1": jnp.ones((d,), jnp.float32),
        "attention_norm2": jnp.ones((d,), jnp.float32),
        "ffn_norm1": jnp.ones((d,), jnp.float32),
        "ffn_norm2": jnp.ones((d,), jnp.float32),
        "w1": _lin(next(ks), d, cfg.ffn_dim, dtype, bias=False),
        "w3": _lin(next(ks), d, cfg.ffn_dim, dtype, bias=False),
        "w2": _lin(next(ks), cfg.ffn_dim, d, dtype, bias=False),
    }
    if modulated:
        p["adaln"] = _lin(next(ks), cfg.adaln_dim, 4 * d, dtype)
    return p


def init_zimage(key, cfg: ZImageConfig, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 24))

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "x_embedder": _lin(next(keys),
                           cfg.patch ** 2 * cfg.in_channels, cfg.dim, dtype),
        "cap_embedder": {
            "norm": jnp.ones((cfg.cap_feat_dim,), jnp.float32),
            "lin": _lin(next(keys), cfg.cap_feat_dim, cfg.dim, dtype)},
        "t_embedder": {
            "fc1": _lin(next(keys), 256, cfg.t_mid_dim, dtype),
            "fc2": _lin(next(keys), cfg.t_mid_dim, cfg.adaln_dim, dtype)},
        "x_pad_token": jax.random.normal(
            next(keys), (cfg.dim,), jnp.float32).astype(dtype) * 0.02,
        "cap_pad_token": jax.random.normal(
            next(keys), (cfg.dim,), jnp.float32).astype(dtype) * 0.02,
        "noise_refiner": stack([
            _block_params(k, cfg, True, dtype)
            for k in jax.random.split(next(keys), cfg.n_refiner_layers)]),
        "context_refiner": stack([
            _block_params(k, cfg, False, dtype)
            for k in jax.random.split(next(keys), cfg.n_refiner_layers)]),
        "layers": stack([
            _block_params(k, cfg, True, dtype)
            for k in jax.random.split(next(keys), cfg.n_layers)]),
        "final": {
            "linear": _lin(next(keys), cfg.dim,
                           cfg.patch ** 2 * cfg.in_channels, dtype),
            "adaln": _lin(next(keys), cfg.adaln_dim, cfg.dim, dtype)},
        **({} if not cfg.control else {
            "control_x_embedder": _lin(
                next(keys),
                cfg.patch ** 2 * (cfg.control_in_dim
                                  or cfg.in_channels), cfg.dim, dtype),
            "control_noise_refiner": stack([
                _block_params(k, cfg, True, dtype)
                for k in jax.random.split(next(keys),
                                          cfg.n_control_refiner)]),
            "control_layers": stack([
                dict(_block_params(k, cfg, True, dtype),
                     after_proj=_zero_lin(cfg.dim, cfg.dim, dtype))
                for k in jax.random.split(next(keys),
                                          len(cfg.control_places))]),
            "control_before_proj": _zero_lin(cfg.dim, cfg.dim, dtype),
        }),
    }


def _zero_lin(din, dout, dtype):
    return {"w": jnp.zeros((din, dout), dtype),
            "b": jnp.zeros((dout,), dtype)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _zi_attention(bp, x, cfg, cos, sin, backend):
    b, l, d = x.shape
    n, hd = cfg.n_heads, cfg.head_dim
    q = _dense(x, bp["to_q"]).reshape(b, l, n, hd)
    k = _dense(x, bp["to_k"]).reshape(b, l, n, hd)
    v = _dense(x, bp["to_v"]).reshape(b, l, n, hd)
    q = _rms(q, bp["norm_q"], cfg.norm_eps)
    k = _rms(k, bp["norm_k"], cfg.norm_eps)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    out = attention(q, k, v, backend=backend).reshape(b, l, d)
    return _dense(out, bp["to_out"])


def _ffn(bp, x):
    h = jax.nn.silu(_dense(x, bp["w1"]).astype(jnp.float32)).astype(x.dtype)
    return _dense(h * _dense(x, bp["w3"]), bp["w2"])


def _block(bp, x, cfg, cos, sin, adaln, backend):
    """Sandwich-norm block (z_image_transformer2d.py:224-255).

    adaln: [B, adaln_dim] or None (context refiner)."""
    eps = cfg.norm_eps
    if adaln is not None:
        m = _dense(adaln, bp["adaln"]).astype(jnp.float32)
        s_msa, g_msa, s_mlp, g_mlp = [
            m[:, None, i * cfg.dim:(i + 1) * cfg.dim] for i in range(4)]
        y = (_rms(x, bp["attention_norm1"], eps).astype(jnp.float32)
             * (1.0 + s_msa)).astype(x.dtype)
        a = _rms(_zi_attention(bp, y, cfg, cos, sin, backend),
                 bp["attention_norm2"], eps)
        x = x + (a.astype(jnp.float32) * jnp.tanh(g_msa)).astype(x.dtype)
        y = (_rms(x, bp["ffn_norm1"], eps).astype(jnp.float32)
             * (1.0 + s_mlp)).astype(x.dtype)
        f = _rms(_ffn(bp, y), bp["ffn_norm2"], eps)
        x = x + (f.astype(jnp.float32) * jnp.tanh(g_mlp)).astype(x.dtype)
    else:
        y = _rms(x, bp["attention_norm1"], eps)
        x = x + _rms(_zi_attention(bp, y, cfg, cos, sin, backend),
                     bp["attention_norm2"], eps)
        y = _rms(x, bp["ffn_norm1"], eps)
        x = x + _rms(_ffn(bp, y), bp["ffn_norm2"], eps)
    return x


def zimage_t_embedding(params, cfg: ZImageConfig, t, target_t=None):
    """t in [0,1], model convention 1 = clean.  Optional target timestep
    (unified/turbo sampler, transformer2d.py:996-1002)."""
    cdt = cfg.compute_dtype

    def emb(tv):
        f = timestep_embedding(tv, 256, time_factor=1.0).astype(cdt)
        h = jax.nn.silu(_dense(f, params["t_embedder"]["fc1"]
                               ).astype(jnp.float32)).astype(cdt)
        return _dense(h, params["t_embedder"]["fc2"])

    t_emb = emb(jnp.abs(t) * cfg.t_scale)
    if target_t is not None:
        t_emb = t_emb + emb((target_t - t) * cfg.t_scale) \
            * jnp.abs(t - target_t)[:, None].astype(t_emb.dtype)
    return t_emb


def build_zimage_rope(cap_len_pad: int, h_tok: int, w_tok: int,
                      cfg: ZImageConfig):
    """(cos, sin) for the packed [img, cap] sequence.

    Cap ids: axis0 = 1..cap_len (transformer2d.py:739 start=(1,0,0));
    img ids: axis0 = cap_len_pad+1 constant, (y, x) grid (:774);
    img padding rows id (0,0,0) (:779)."""
    l_img = h_tok * w_tok
    img_pad = (-l_img) % cfg.seq_multiple
    img_ids = np.zeros((l_img + img_pad, 3), np.float64)
    grid = np.zeros((h_tok, w_tok, 3), np.float64)
    grid[..., 0] = cap_len_pad + 1
    grid[..., 1] = np.arange(h_tok)[:, None]
    grid[..., 2] = np.arange(w_tok)[None, :]
    img_ids[:l_img] = grid.reshape(-1, 3)
    cap_ids = np.zeros((cap_len_pad, 3), np.float64)
    cap_ids[:, 0] = np.arange(1, cap_len_pad + 1)
    x_tabs = rope_from_ids(img_ids, cfg.axes_dim, cfg.theta)
    cap_tabs = rope_from_ids(cap_ids, cfg.axes_dim, cfg.theta)
    uni = (jnp.concatenate([x_tabs[0], cap_tabs[0]]),
           jnp.concatenate([x_tabs[1], cap_tabs[1]]))
    return x_tabs, cap_tabs, uni


def patchify_zimage(latents, patch: int):
    """[B, C, H, W] -> [B, (H/p)(W/p), p*p*C]; feature order (ph, pw, c)
    (transformer2d.py:766 'c f pf h ph w pw -> (f h w) (pf ph pw c)')."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // patch, patch, w // patch, patch)
    return x.transpose(0, 2, 4, 3, 5, 1).reshape(
        b, (h // patch) * (w // patch), patch * patch * c)


def unpatchify_zimage(tokens, h: int, w: int, patch: int, channels: int):
    b = tokens.shape[0]
    x = tokens.reshape(b, h // patch, w // patch, patch, patch, channels)
    return x.transpose(0, 5, 1, 3, 2, 4).reshape(b, channels, h, w)


def zimage_forward(params, cfg: ZImageConfig, img_tokens, cap_feats, t,
                   x_rope, cap_rope, uni_rope, cap_len: int,
                   img_len: Optional[int] = None,
                   target_t=None, attn_backend: str = "auto",
                   control_tokens=None, control_scale: float = 0.75):
    """img_tokens: [B, L_img(+pad to 32), p*p*C]; cap_feats: [B, L_cap_pad,
    cap_feat_dim] (padded by repeating the last real token, host side);
    cap_len / img_len: real lengths (static).  Returns velocity
    [B, L_img_pad, p*p*C] (only the first img_len rows are meaningful)."""
    cdt = cfg.compute_dtype
    b, l_img_pad, _ = img_tokens.shape
    l_cap_pad = cap_feats.shape[1]
    img_len = l_img_pad if img_len is None else img_len

    adaln = zimage_t_embedding(params, cfg, t, target_t)

    x = _dense(img_tokens.astype(cdt), params["x_embedder"])
    if img_len < l_img_pad:
        x_pad_mask = jnp.arange(l_img_pad)[None, :, None] >= img_len
        x = jnp.where(x_pad_mask,
                      params["x_pad_token"].astype(cdt)[None, None], x)
    cap = _rms(cap_feats.astype(cdt), params["cap_embedder"]["norm"],
               cfg.norm_eps)
    cap = _dense(cap, params["cap_embedder"]["lin"])
    if cap_len < l_cap_pad:
        cap_pad_mask = jnp.arange(l_cap_pad)[None, :, None] >= cap_len
        cap = jnp.where(cap_pad_mask,
                        params["cap_pad_token"].astype(cdt)[None, None], cap)

    def nr_body(x, bp):
        return _block(bp, x, cfg, x_rope[0], x_rope[1], adaln,
                      attn_backend), None

    x, _ = jax.lax.scan(nr_body, x, params["noise_refiner"])

    def cr_body(cap, bp):
        return _block(bp, cap, cfg, cap_rope[0], cap_rope[1], None,
                      attn_backend), None

    cap, _ = jax.lax.scan(cr_body, cap, params["context_refiner"])

    u = jnp.concatenate([x, cap], axis=1)

    hints = None
    if control_tokens is not None and "control_layers" in params:
        # control branch (z_image_transformer2d.py:850-907 v1): embed
        # the control latent, refine with control_noise_refiner, concat
        # cap, then run the control block stack; block 0 adds
        # before_proj(c) + unified input; each block's after_proj skip
        # is added after the matching main layer (every 2nd,
        # :312-320 BaseZImageTransformerBlock).
        c = _dense(control_tokens.astype(cdt),
                   params["control_x_embedder"])
        if img_len < l_img_pad:
            c_pad_mask = jnp.arange(l_img_pad)[None, :, None] >= img_len
            c = jnp.where(c_pad_mask,
                          params["x_pad_token"].astype(cdt)[None, None],
                          c)

        def cnr_body(c, bp):
            return _block(bp, c, cfg, x_rope[0], x_rope[1], adaln,
                          attn_backend), None

        c, _ = jax.lax.scan(cnr_body, c, params["control_noise_refiner"])
        c = jnp.concatenate([c, cap], axis=1)
        c = _dense(c, params["control_before_proj"]) + u

        def cl_body(c, bp):
            blk = {k: v for k, v in bp.items() if k != "after_proj"}
            c = _block(blk, c, cfg, uni_rope[0], uni_rope[1], adaln,
                       attn_backend)
            return c, _dense(c, bp["after_proj"])

        _, skips = jax.lax.scan(cl_body, c, params["control_layers"])
        hints = jnp.zeros((cfg.n_layers, *skips.shape[1:]), skips.dtype)
        hints = hints.at[jnp.asarray(cfg.control_places)].set(
            skips * control_scale)

    if hints is None:
        def body(u, bp):
            return _block(bp, u, cfg, uni_rope[0], uni_rope[1], adaln,
                          attn_backend), None

        u, _ = jax.lax.scan(body, u, params["layers"])
    else:
        def body(u, xs):
            bp, hint = xs
            u = _block(bp, u, cfg, uni_rope[0], uni_rope[1], adaln,
                       attn_backend)
            return u + hint.astype(u.dtype), None

        u, _ = jax.lax.scan(body, u, (params["layers"], hints))

    fp = params["final"]
    scale = 1.0 + _dense(jax.nn.silu(adaln.astype(jnp.float32)).astype(cdt),
                         fp["adaln"]).astype(jnp.float32)
    y = u[:, :l_img_pad].astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.var(y, axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + 1e-6)     # LayerNorm, no affine
    y = (y * scale[:, None]).astype(cdt)
    return _dense(y, fp["linear"]).astype(jnp.float32)
