"""LongCat-Video transformer, TPU-native.

Functional re-implementation of the reference
LongCatVideoTransformer3DModel
(/root/reference/models/longcat/modules/longcat_video_dit.py): a
48-layer single-stream video DiT with
- PER-FRAME timesteps (diffusion-forcing style): the adaLN modulation is
  computed from a [B, T] timestep grid, so condition frames can be pinned
  at t=0 while noise frames denoise (:96-105, longcat_main.py:911-914);
- 3D rope with the Wan (44, 42, 42) head-dim split, theta 10000
  (modules/rope_3d.py:76-105 — identical split to ops/rope.build_rope_3d);
- fused qkv with bias + per-head fp32 RMS q/k norms eps 1e-6
  (modules/attention.py:59-61);
- condition/noise split self-attention: condition-frame queries attend
  only condition keys, noise queries attend everything
  (modules/attention.py:100-115);
- cross-attention to UMT5 captions with per-sample valid lengths,
  applied to noise tokens only when condition frames exist (:125-136);
- SwiGLU FFN with hidden = round_up(2/3 * 4 * dim, 256)
  (modules/blocks.py:25-48), fp32 LayerNorm modulation.

TPU notes: blocks run under lax.scan over stacked params;
`num_cond_latents` is a static Python int (two attention slices, no
dynamic shapes); caption validity uses the Pallas kv_mask flash kernel.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.rope import build_rope_3d, apply_rope


@dataclasses.dataclass(frozen=True)
class LongCatConfig:
    dim: int = 4096
    n_layers: int = 48
    n_heads: int = 32
    mlp_ratio: int = 4
    adaln_dim: int = 512
    freq_dim: int = 256
    caption_dim: int = 4096
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_tokens_zero_pad: bool = True
    # LongCat Avatar (modules/avatar/longcat_video_dit_avatar.py:20-116):
    # per-block audio cross-attention over AudioProjModel context tokens
    # with a dedicated 3-way adaLN gate on the noise frames
    avatar: bool = False
    audio_dim: int = 768
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.dim // self.n_heads

    @property
    def ffn_dim(self):
        # FeedForwardSwiGLU: int(2 * (dim * mlp_ratio) / 3) rounded up to 256
        hidden = int(2 * self.dim * self.mlp_ratio / 3)
        return 256 * ((hidden + 255) // 256)


def _ln(x, eps=1e-6, w=None, b=None):
    """fp32 LayerNorm (modules/blocks.py LayerNorm_FP32)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, -1, keepdims=True)
    var = jnp.var(x32, -1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def timestep_embedding(t, dim: int, max_period: float = 10000.0):
    """t: [N] -> [N, dim], COS-first (modules/blocks.py:195-203)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _t_embed(p, cfg: LongCatConfig, t):
    """t: [B, T] per-frame timesteps -> [B, T, adaln_dim] (fp32)."""
    b, nt = t.shape
    emb = timestep_embedding(t.reshape(-1), cfg.freq_dim)
    emb = jax.nn.silu(jnp.dot(emb, p["mlp0"]["w"].astype(jnp.float32)) +
                      p["mlp0"]["b"].astype(jnp.float32))
    emb = jnp.dot(emb, p["mlp2"]["w"].astype(jnp.float32)) + \
        p["mlp2"]["b"].astype(jnp.float32)
    return emb.reshape(b, nt, -1)


def _self_attn(p, cfg: LongCatConfig, xm, cos, sin, ncl_thw: int,
               attn_backend):
    b, n, c = xm.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    qkv = jnp.dot(xm, p["qkv"]["w"].astype(xm.dtype)) + \
        p["qkv"]["b"].astype(xm.dtype)
    q, k, v = jnp.split(qkv.reshape(b, n, 3, nh, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    q = _rms(q, p["q_norm"])
    k = _rms(k, p["k_norm"])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    if ncl_thw > 0:
        # condition tokens attend among themselves; noise tokens attend all
        out_c = attention(q[:, :ncl_thw], k[:, :ncl_thw], v[:, :ncl_thw],
                          backend=attn_backend)
        out_n = attention(q[:, ncl_thw:], k, v, backend=attn_backend)
        out = jnp.concatenate([out_c, out_n], axis=1)
    else:
        out = attention(q, k, v, backend=attn_backend)
    return jnp.dot(out.reshape(b, n, c), p["proj"]["w"].astype(xm.dtype)) \
        + p["proj"]["b"].astype(xm.dtype)


def _cross_attn(p, cfg: LongCatConfig, x, ctx, ctx_mask, attn_backend):
    b, n, c = x.shape
    nh, hd = cfg.n_heads, cfg.head_dim
    q = (jnp.dot(x, p["q"]["w"].astype(x.dtype)) +
         p["q"]["b"].astype(x.dtype)).reshape(b, n, nh, hd)
    kv = jnp.dot(ctx, p["kv"]["w"].astype(x.dtype)) + \
        p["kv"]["b"].astype(x.dtype)
    k, v = jnp.split(kv.reshape(b, ctx.shape[1], 2, nh, hd), 2, axis=2)
    k, v = k[:, :, 0], v[:, :, 0]
    q = _rms(q, p["q_norm"])
    k = _rms(k, p["k_norm"])
    out = attention(q, k, v, backend=attn_backend, kv_mask=ctx_mask)
    return jnp.dot(out.reshape(b, n, c), p["proj"]["w"].astype(x.dtype)) + \
        p["proj"]["b"].astype(x.dtype)


def _audio_cross(p, cfg: LongCatConfig, x_noise, audio_ctx, nt_noise,
                 attn_backend, speaker_owner=None):
    """SingleStreamAttention (avatar/attention.py:291-338): per-frame
    cross-attn — q from the frame's video tokens, kv from that frame's
    audio context tokens.  Multi-speaker (Avatar Multi): audio_ctx holds
    both speakers' tokens concatenated per frame and ``speaker_owner``
    [hw] assigns each spatial token to speaker 0 / 1 / 2 (background);
    a token attends only its own speaker's half (background attends
    both), mirroring the speaker_token_masks attention mask
    (avatar/attention.py:408-415)."""
    b, n, c = x_noise.shape
    hw = n // nt_noise
    nh, hd = cfg.n_heads, cfg.head_dim
    q = (jnp.dot(x_noise, p["q"]["w"]) + p["q"]["b"]).reshape(
        b, nt_noise, hw, nh, hd)
    q = _rms(q, p["q_norm"])
    kv = jnp.dot(audio_ctx.astype(x_noise.dtype), p["kv"]["w"]) \
        + p["kv"]["b"]
    k, v = jnp.split(kv, 2, axis=-1)
    a = audio_ctx.shape[2]
    k = _rms(k.reshape(b, nt_noise, a, nh, hd), p["k_norm"])
    v = v.reshape(b, nt_noise, a, nh, hd)
    att = jnp.einsum("btqnd,btknd->btnqk", q, k) / math.sqrt(hd)
    att = att.astype(jnp.float32)
    if speaker_owner is not None:
        split = a // 2
        owner = jnp.asarray(speaker_owner)                  # [hw]
        is_first = jnp.arange(a) < split                    # [A]
        blocked = (is_first[None, :] & (owner[:, None] == 1)) | \
            (~is_first[None, :] & (owner[:, None] == 0))    # [hw, A]
        att = jnp.where(blocked[None, None, None], -1e9, att)
    att = jax.nn.softmax(att, axis=-1).astype(x_noise.dtype)
    o = jnp.einsum("btnqk,btknd->btqnd", att, v).reshape(b, n, c)
    return jnp.dot(o, p["proj"]["w"]) + p["proj"]["b"]


def _block(p, cfg: LongCatConfig, x, ctx, ctx_mask, t_emb, cos, sin,
           ncl: int, grid, attn_backend, audio_ctx=None,
           speaker_owner=None):
    """x: [B, N, C]; t_emb: [B, T, adaln]; per-frame 6-way modulation."""
    b, n, c = x.shape
    nt = grid[0]
    hw = n // nt
    mod = jnp.dot(jax.nn.silu(t_emb),
                  p["adaln"]["w"].astype(jnp.float32)) + \
        p["adaln"]["b"].astype(jnp.float32)           # [B, T, 6C] fp32
    mod = mod[:, :, None]                              # [B, T, 1, 6C]
    sh_a, sc_a, g_a, sh_m, sc_m, g_m = jnp.split(mod, 6, axis=-1)

    xt = x.reshape(b, nt, hw, c)
    xm = (_ln(xt) * (sc_a + 1.0) + sh_a).astype(x.dtype).reshape(b, n, c)
    attn = _self_attn(p["attn"], cfg, xm, cos, sin, ncl * hw, attn_backend)
    x = (xt.astype(jnp.float32) +
         attn.reshape(b, nt, hw, c).astype(jnp.float32) * g_a
         ).astype(x.dtype).reshape(b, n, c)

    cin = _ln(x, w=p["cross_norm"]["w"], b=p["cross_norm"]["b"]
              ).astype(x.dtype)
    if ncl > 0:
        co = _cross_attn(p["cross"], cfg, cin[:, ncl * hw:], ctx, ctx_mask,
                         attn_backend)
        x = jnp.concatenate([x[:, :ncl * hw], x[:, ncl * hw:] + co], axis=1)
    else:
        x = x + _cross_attn(p["cross"], cfg, cin, ctx, ctx_mask,
                            attn_backend)

    if audio_ctx is not None and "audio_adaln" in p:
        # audio cross-attn on the noise frames with its own 3-way
        # modulation (longcat_video_dit_avatar.py:189-213)
        amod = jnp.dot(jax.nn.silu(t_emb[:, ncl:]),
                       p["audio_adaln"]["w"].astype(jnp.float32)) + \
            p["audio_adaln"]["b"].astype(jnp.float32)
        amod = amod[:, :, None]
        a_sh, a_sc, a_g = jnp.split(amod, 3, axis=-1)
        nt_noise = nt - ncl
        x_noise = x[:, ncl * hw:]
        vin = _ln(x_noise, w=p["pre_video_norm"]["w"],
                  b=p["pre_video_norm"]["b"]).astype(x.dtype)
        ain = _ln(audio_ctx.astype(jnp.float32),
                  w=p["pre_audio_norm"]["w"],
                  b=p["pre_audio_norm"]["b"])
        ao = _audio_cross(p["audio_cross"], cfg, vin, ain, nt_noise,
                          attn_backend, speaker_owner=speaker_owner)
        aot = ao.reshape(b, nt_noise, hw, c)
        aom = (_ln(aot) * (a_sc + 1.0) + a_sh)
        xt = x.reshape(b, nt, hw, c).astype(jnp.float32)
        xt = xt.at[:, ncl:].add(aom * a_g)
        x = xt.astype(x.dtype).reshape(b, n, c)

    xt = x.reshape(b, nt, hw, c)
    fm = (_ln(xt) * (sc_m + 1.0) + sh_m).astype(x.dtype).reshape(b, n, c)
    f = jax.nn.silu(jnp.dot(fm, p["w1"].astype(fm.dtype))) * \
        jnp.dot(fm, p["w3"].astype(fm.dtype))
    f = jnp.dot(f, p["w2"].astype(fm.dtype))
    x = (xt.astype(jnp.float32) +
         f.reshape(b, nt, hw, c).astype(jnp.float32) * g_m
         ).astype(x.dtype).reshape(b, n, c)
    return x


def longcat_forward(params, cfg: LongCatConfig, latents, t, context,
                    context_mask=None, num_cond_latents: int = 0,
                    attn_backend: str = "auto", audio_ctx=None,
                    speaker_owner=None):
    """latents: [B, C, T, H, W]; t: [B] or [B, T] per-frame timesteps
    (0..1000 scale); context: [B, L, caption_dim]; context_mask: [B, L].
    Returns velocity [B, out, T, H, W] fp32."""
    cdt = cfg.compute_dtype
    b, _, nt, h, w = latents.shape
    pt, ph, pw = cfg.patch_size
    grid = (nt // pt, h // ph, w // pw)
    n = grid[0] * grid[1] * grid[2]

    x = latents.astype(cdt).reshape(
        b, cfg.in_channels, grid[0], pt, grid[1], ph, grid[2], pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7).reshape(
        b, n, cfg.in_channels * pt * ph * pw)
    x = jnp.dot(x, params["x_embed"]["w"]) + params["x_embed"]["b"]

    if t.ndim == 1:
        t = t[:, None] * jnp.ones((1, grid[0]), t.dtype)
    t_emb = _t_embed(params["t_embed"], cfg, t)        # [B, T, adaln] fp32

    ctx = context.astype(cdt)
    ctx = jnp.dot(jax.nn.gelu(
        jnp.dot(ctx, params["y_embed"]["fc1"]["w"]) +
        params["y_embed"]["fc1"]["b"], approximate=True),
        params["y_embed"]["fc2"]["w"]) + params["y_embed"]["fc2"]["b"]
    kv_mask = None
    if context_mask is not None:
        if cfg.text_tokens_zero_pad:
            ctx = ctx * context_mask[:, :, None].astype(cdt)
        kv_mask = context_mask.astype(bool)

    cos, sin = build_rope_3d(grid, head_dim=cfg.head_dim, theta=10000.0)

    def body(h_, lp):
        return _block(lp, cfg, h_, ctx, kv_mask, t_emb, cos, sin,
                      num_cond_latents, grid, attn_backend,
                      audio_ctx=audio_ctx,
                      speaker_owner=speaker_owner), None
    x, _ = jax.lax.scan(body, x, params["blocks"])

    fl = params["final"]
    mod = jnp.dot(jax.nn.silu(t_emb), fl["adaln"]["w"].astype(jnp.float32)) \
        + fl["adaln"]["b"].astype(jnp.float32)
    sh, sc = jnp.split(mod[:, :, None], 2, axis=-1)    # [B, T, 1, C]
    xt = x.reshape(b, grid[0], n // grid[0], cfg.dim)
    xm = (_ln(xt) * (sc + 1.0) + sh).reshape(b, n, cfg.dim)
    out = jnp.dot(xm, fl["linear"]["w"].astype(jnp.float32)) + \
        fl["linear"]["b"].astype(jnp.float32)
    # unpatchify, feature order (pt, ph, pw, c_out), c fastest (:358-377)
    out = out.reshape(b, *grid, pt, ph, pw, cfg.out_channels)
    out = out.transpose(0, 7, 1, 4, 2, 5, 3, 6)
    return out.reshape(b, cfg.out_channels, nt, h, w)


# ---------------------------------------------------------------------------
# init (random, for tests)
# ---------------------------------------------------------------------------

def init_longcat(key, cfg: LongCatConfig, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    d, hd = cfg.dim, cfg.head_dim
    keys = iter(jax.random.split(key, 16))

    def lin(key, din, dout, bias=True):
        s = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                     -s, s).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def mat(key, din, dout):
        s = math.sqrt(6.0 / (din + dout))
        return jax.random.uniform(key, (din, dout), jnp.float32,
                                  -s, s).astype(dtype)

    def block(key):
        ks = iter(jax.random.split(key, 16))
        return {"adaln": lin(next(ks), cfg.adaln_dim, 6 * d),
                "attn": {"qkv": lin(next(ks), d, 3 * d),
                         "q_norm": jnp.ones((hd,), dtype),
                         "k_norm": jnp.ones((hd,), dtype),
                         "proj": lin(next(ks), d, d)},
                "cross_norm": {"w": jnp.ones((d,), dtype),
                               "b": jnp.zeros((d,), dtype)},
                "cross": {"q": lin(next(ks), d, d),
                          "kv": lin(next(ks), d, 2 * d),
                          "q_norm": jnp.ones((hd,), dtype),
                          "k_norm": jnp.ones((hd,), dtype),
                          "proj": lin(next(ks), d, d)},
                "w1": mat(next(ks), d, cfg.ffn_dim),
                "w3": mat(next(ks), d, cfg.ffn_dim),
                "w2": mat(next(ks), cfg.ffn_dim, d),
                **({} if not cfg.avatar else {
                    "audio_adaln": lin(next(ks), cfg.adaln_dim, 3 * d),
                    "pre_video_norm": {"w": jnp.ones((d,), dtype),
                                       "b": jnp.zeros((d,), dtype)},
                    "pre_audio_norm": {
                        "w": jnp.ones((cfg.audio_dim,), jnp.float32),
                        "b": jnp.zeros((cfg.audio_dim,), jnp.float32)},
                    "audio_cross": {
                        "q": lin(next(ks), d, d),
                        "kv": lin(next(ks), cfg.audio_dim, 2 * d),
                        "q_norm": jnp.ones((hd,), dtype),
                        "k_norm": jnp.ones((hd,), dtype),
                        "proj": lin(next(ks), d, d)}})}

    pt, ph, pw = cfg.patch_size
    bkeys = jax.random.split(next(keys), cfg.n_layers)
    blocks = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[block(k) for k in bkeys])
    return {
        "x_embed": lin(next(keys), cfg.in_channels * pt * ph * pw, d),
        "t_embed": {"mlp0": lin(next(keys), cfg.freq_dim, cfg.adaln_dim),
                    "mlp2": lin(next(keys), cfg.adaln_dim, cfg.adaln_dim)},
        "y_embed": {"fc1": lin(next(keys), cfg.caption_dim, d),
                    "fc2": lin(next(keys), d, d)},
        "blocks": blocks,
        "final": {"adaln": lin(next(keys), cfg.adaln_dim, 2 * d),
                  "linear": lin(next(keys), d,
                                pt * ph * pw * cfg.out_channels)},
    }
