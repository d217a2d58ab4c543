"""Wan 2.1/2.2 diffusion transformer (DiT), TPU-native.

Functional re-implementation of the reference WanModel
(/root/reference/models/wan/modules/model.py:885): patch-embedding (1,2,2)
conv as a reshape+matmul, 30/40 adaLN-zero blocks with RMSNorm-QK
self-attention + 3D RoPE and text (+image for i2v) cross-attention, and an
adaLN head with unpatchify.

TPU-first design choices:
  - Params are a pytree; all transformer blocks are STACKED on a leading
    layer axis and the block loop is a `lax.scan` — one compiled block body,
    fast compile, and sharding annotations apply uniformly per layer.
  - Matmuls run in bf16 on the MXU; the residual stream / modulation math is
    fp32, mirroring the reference's mixed-precision mode
    (model.py lock_layers_dtypes + block forward: x fp32, attention bf16).
  - No data-dependent Python control flow: everything is jit-compatible.

Weight layout: all kernels are stored [in, out] (right-multiplication
x @ W + b), transposed from torch's [out, in] at checkpoint load.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm, modulated_layer_norm
from ...ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class WanDiTConfig:
    """Architecture hyperparameters (reference: models/wan/configs/*.py)."""
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    num_heads: int = 12
    num_layers: int = 30
    patch_size: tuple = (1, 2, 2)
    in_dim: int = 16
    out_dim: int = 16
    text_dim: int = 4096
    text_len: int = 512
    eps: float = 1e-6
    model_type: str = "t2v"          # 't2v' | 'i2v' (xlm-clip img branch)
    vace: bool = False               # VACE control branch (even layers)
    vace_in_dim: int = 96
    compute_dtype: Any = jnp.bfloat16
    residual_dtype: Any = jnp.float32

    @property
    def vace_layers(self):
        return tuple(range(0, self.num_layers, 2)) if self.vace else ()

    @property
    def head_dim(self):
        return self.dim // self.num_heads

    @property
    def i2v_cross_attn(self):
        return self.model_type == "i2v"


# ---------------------------------------------------------------------------
# Parameter initialization (random init; checkpoints overwrite these)
# ---------------------------------------------------------------------------

def _linear(key, d_in, d_out, dtype, bias=True, std=None):
    kw, kb = jax.random.split(key)
    if std is None:  # xavier uniform (reference init_weights, model.py:2048)
        limit = math.sqrt(6.0 / (d_in + d_out))
        w = jax.random.uniform(kw, (d_in, d_out), jnp.float32, -limit, limit)
    else:
        w = jax.random.normal(kw, (d_in, d_out), jnp.float32) * std
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_wan_dit(key, cfg: WanDiTConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    # split(key, n) is counter-mode: the first 64 keys are identical for
    # any n, so growing the bound preserves every existing init stream.
    # 40-layer VACE models consume ~70 keys (observed StopIteration at
    # 14B vace_multitalk: 40 blocks + 20 vace blocks + fixed params).
    n_keys = 24 + cfg.num_layers + (len(cfg.vace_layers) + 4
                                    if cfg.vace else 0)
    keys = iter(jax.random.split(key, max(64, n_keys)))
    d = cfg.dim
    pt, ph, pw = cfg.patch_size
    patch_in = cfg.in_dim * pt * ph * pw

    def stack(fn, n):
        leaves = [fn(next(keys)) for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    def attn_params(key, cross=False):
        ks = iter(jax.random.split(key, 8))
        p = {
            "q": _linear(next(ks), d, d, dtype),
            "k": _linear(next(ks), d, d, dtype),
            "v": _linear(next(ks), d, d, dtype),
            "o": _linear(next(ks), d, d, dtype),
            "norm_q": jnp.ones((d,), jnp.float32),
            "norm_k": jnp.ones((d,), jnp.float32),
        }
        if cross and cfg.i2v_cross_attn:
            p["k_img"] = _linear(next(ks), d, d, dtype)
            p["v_img"] = _linear(next(ks), d, d, dtype)
            p["norm_k_img"] = jnp.ones((d,), jnp.float32)
        return p

    def block_params(key):
        ks = iter(jax.random.split(key, 8))
        return {
            "self_attn": attn_params(next(ks)),
            "cross_attn": attn_params(next(ks), cross=True),
            "norm3": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            "ffn": {"fc1": _linear(next(ks), d, cfg.ffn_dim, dtype),
                    "fc2": _linear(next(ks), cfg.ffn_dim, d, dtype)},
            "modulation": (jax.random.normal(next(ks), (6, d), jnp.float32)
                           / math.sqrt(d)),
        }

    params = {
        "patch_embedding": _linear(next(keys), patch_in, d, jnp.float32),
        "text_embedding": {
            "fc1": _linear(next(keys), cfg.text_dim, d, dtype, std=0.02),
            "fc2": _linear(next(keys), d, d, dtype, std=0.02),
        },
        "time_embedding": {
            "fc1": _linear(next(keys), cfg.freq_dim, d, jnp.float32, std=0.02),
            "fc2": _linear(next(keys), d, d, jnp.float32, std=0.02),
        },
        "time_projection": _linear(next(keys), d, 6 * d, jnp.float32),
        "blocks": stack(block_params, cfg.num_layers),
        "head": {
            "head": _linear(next(keys), d,
                            cfg.out_dim * pt * ph * pw, jnp.float32),
            "modulation": (jax.random.normal(next(keys), (2, d), jnp.float32)
                           / math.sqrt(d)),
        },
    }
    if cfg.vace:
        # VACE control branch (model.py:787-822 VaceWanAttentionBlock):
        # parallel blocks at even layers; block 0 gets before_proj, every
        # vace block emits an after_proj skip added to the main stream.
        n_vace = len(cfg.vace_layers)
        params["vace_patch_embedding"] = _linear(
            next(keys), cfg.vace_in_dim * pt * ph * pw, d, jnp.float32)
        params["vace_blocks"] = stack(block_params, n_vace)
        params["vace_blocks"]["after_proj"] = jax.tree.map(
            lambda *xs: jnp.stack(xs),
            *[_linear(k, d, d, dtype)
              for k in jax.random.split(next(keys), n_vace)])
        params["vace_before_proj"] = _linear(next(keys), d, d, dtype)
    if cfg.i2v_cross_attn:
        # MLPProj (model.py:862-870): LN(1280) -> Linear(1280,1280) ->
        # GELU(exact) -> Linear(1280,dim) -> LN(dim)
        params["img_emb"] = {
            "norm1": {"w": jnp.ones((1280,), jnp.float32),
                      "b": jnp.zeros((1280,), jnp.float32)},
            "fc1": _linear(next(keys), 1280, 1280, dtype),
            "fc2": _linear(next(keys), 1280, d, dtype),
            "norm2": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
        }
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _dense(x, p, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p or "w_q4" in p:  # int8/int4 -> Pallas dequant-fused matmul
        from ...ops.quant import dense_quant
        return dense_quant(x, p, dtype)
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def sinusoidal_embedding_1d(dim: int, t):
    """Reference model.py:31 — cat([cos, sin], -1), freq 10000^(-i/half)."""
    half = dim // 2
    t = t.astype(jnp.float32)
    freqs = jnp.power(10000.0, -jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def patchify(latents, patch_size):
    """[B, C, F, H, W] -> [B, L, C*pt*ph*pw], feature order (c, dt, dh, dw)
    matching torch Conv3d(kernel=stride=patch) flattening."""
    b, c, f, h, w = latents.shape
    pt, ph, pw = patch_size
    x = latents.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # b, f, h, w, c, pt, ph, pw
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(x, grid, patch_size, out_dim):
    """[B, L, out*pt*ph*pw] -> [B, out, F, H, W] (model.py:2013)."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = x.transpose(0, 7, 1, 4, 2, 5, 3, 6)  # b, c, f, pt, h, ph, w, pw
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def _qkv_heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _lora_add(lp, x):
    """In-model LoRA (model.py LoRALinearLayer:125): up(down(x)), both
    bias-free."""
    return jnp.dot(jnp.dot(x, lp["down"]["w"].astype(x.dtype)),
                   lp["up"]["w"].astype(x.dtype))


def _self_attention(p, x, rope_cos, rope_sin, cfg, attn_backend,
                    extra_kv=None, qkv_loras=None, lynx_ref=None):
    """extra_kv: optional (k_ip, v_ip) already roped/headed — StandIn
    phase-2 reference kv concatenation (model.py:351-357).
    qkv_loras: optional per-block LoRA params added to q/k/v pre-norm —
    StandIn phase-1 (model.py:338-341).
    lynx_ref: optional (lp {k_ref, v_ref}, ref_feats [B, Lr, C], scale)
    — Lynx full reference attention with the un-roped normed query
    (model.py:323-335, :400-404), added pre-`o` scaled by
    lynx_ref_scale."""
    cdt = cfg.compute_dtype
    xc = x.astype(cdt)
    q = _dense(xc, p["q"], cdt)
    k = _dense(xc, p["k"], cdt)
    v = _dense(xc, p["v"], cdt)
    if qkv_loras is not None:
        q = q + _lora_add(qkv_loras["q"], xc)
        k = k + _lora_add(qkv_loras["k"], xc)
        v = v + _lora_add(qkv_loras["v"], xc)
    q = rms_norm(q, p["norm_q"], cfg.eps)
    k = rms_norm(k, p["norm_k"], cfg.eps)
    q = _qkv_heads(q, cfg.num_heads)
    k = _qkv_heads(k, cfg.num_heads)
    v = _qkv_heads(v, cfg.num_heads)
    ref_o = None
    if lynx_ref is not None:
        lp, ref_feats, ref_scale = lynx_ref
        rf = ref_feats.astype(cdt)
        k_r = rms_norm(_dense(rf, lp["k_ref"], cdt), p["norm_k"], cfg.eps)
        v_r = _dense(rf, lp["v_ref"], cdt)
        ref_o = attention(q, _qkv_heads(k_r, cfg.num_heads),
                          _qkv_heads(v_r, cfg.num_heads),
                          backend=attn_backend) * ref_scale
    q = apply_rope(q, rope_cos, rope_sin)
    k = apply_rope(k, rope_cos, rope_sin)
    k_all, v_all = k, v
    if extra_kv is not None:
        k_ip, v_ip = extra_kv
        k_all = jnp.concatenate([k, k_ip.astype(k.dtype)], axis=1)
        v_all = jnp.concatenate([v, v_ip.astype(v.dtype)], axis=1)
    o = attention(q, k_all, v_all, backend=attn_backend)
    if ref_o is not None:
        o = o + ref_o.astype(o.dtype)
    o = o.reshape(*x.shape[:2], cfg.dim)
    return _dense(o, p["o"], cdt), (k, v)


def _nag_combine(x_pos, x_neg, nag):
    """Negative attention guidance (model.py:276-292): extrapolate in
    attention-output space, clamp by L1-norm ratio tau, blend by alpha."""
    scale, tau, alpha = nag
    x_pos = x_pos.astype(jnp.float32)
    x_neg = x_neg.astype(jnp.float32)
    x_g = scale * x_pos + (1.0 - scale) * x_neg
    norm_pos = jnp.sum(jnp.abs(x_pos), axis=-1, keepdims=True)
    norm_g = jnp.sum(jnp.abs(x_g), axis=-1, keepdims=True)
    ratio = jnp.nan_to_num(norm_g / norm_pos, nan=10.0)
    factor = norm_pos * tau / (norm_g + 1e-7)
    x_g = jnp.where(ratio > tau, x_g * factor, x_g)
    return alpha * x_g + (1.0 - alpha) * x_pos


def _cross_attention(p, x, context, context_img, cfg, attn_backend,
                     context_neg=None, nag=None, fantasy=None,
                     lynx_ip=None):
    # ring (context-parallel) applies to self-attention only: cross-attn
    # kv (text) is replicated, so per-shard plain attention is exact
    if attn_backend.startswith("ring"):
        attn_backend = "xla"
    cdt = cfg.compute_dtype
    xc = x.astype(cdt)
    q = rms_norm(_dense(xc, p["q"], cdt), p["norm_q"], cfg.eps)
    q = _qkv_heads(q, cfg.num_heads)

    def text_attn(ctx):
        k = rms_norm(_dense(ctx, p["k"], cdt), p["norm_k"], cfg.eps)
        v = _dense(ctx, p["v"], cdt)
        return attention(q, _qkv_heads(k, cfg.num_heads),
                         _qkv_heads(v, cfg.num_heads), backend=attn_backend)

    o = text_attn(context)
    if nag is not None and context_neg is not None:
        o_neg = text_attn(context_neg)
        o = _nag_combine(o, o_neg, nag).astype(o.dtype)
    if context_img is not None:
        k_img = rms_norm(_dense(context_img, p["k_img"], cdt),
                         p["norm_k_img"], cfg.eps)
        v_img = _dense(context_img, p["v_img"], cdt)
        k_img = _qkv_heads(k_img, cfg.num_heads)
        v_img = _qkv_heads(v_img, cfg.num_heads)
        o = o + attention(q, k_img, v_img, backend=attn_backend)
    if lynx_ip is not None:
        # Lynx IP attention (model.py:411-441): to_k_ip/to_v_ip over the
        # resampled identity tokens (+16 registers for full), reusing the
        # text query; added pre-`o` scaled by lynx_ip_scale * active.
        lp, ip_embeds, ip_scale = lynx_ip
        ip = ip_embeds.astype(cdt)
        if "registers" in lp:
            reg = jnp.broadcast_to(lp["registers"],
                                   (ip.shape[0], *lp["registers"].shape[1:]))
            ip = jnp.concatenate([ip, reg.astype(cdt)], axis=1)
            k_ip = rms_norm(_dense(ip, lp["k_ip"], cdt), p["norm_k"],
                            cfg.eps)
        else:
            # lite: affine-free RMSNorm (attention_processor.py:39)
            k_ip = _dense(ip, lp["k_ip"], cdt)
            k32 = k_ip.astype(jnp.float32)
            k_ip = (k32 * jax.lax.rsqrt(
                jnp.mean(k32 * k32, axis=-1, keepdims=True)
                + 1e-5)).astype(cdt)
        v_ip = _dense(ip, lp["v_ip"], cdt)
        ip_o = attention(q, _qkv_heads(k_ip, cfg.num_heads),
                         _qkv_heads(v_ip, cfg.num_heads),
                         backend=attn_backend)
        o = o + (ip_scale * ip_o.astype(jnp.float32)).astype(o.dtype)
    if fantasy is not None:
        # FantasyTalking audio processor (fantasytalking/model.py:19-62,
        # modules/model.py:479-497): per-latent-frame attention reusing
        # the normed cross-attn query; zero-init k/v; added pre-`o` with
        # per-sample audio_scale.
        fp, actx, amask, ascale = fantasy
        b, l = x.shape[:2]
        n, hd = cfg.num_heads, cfg.head_dim
        f, la = actx.shape[1], actx.shape[2]
        s = l // f
        qf = q.reshape(b * f, s, n, hd)
        k_a = _dense(actx, fp["k"], cdt).reshape(b * f, la, n, hd)
        v_a = _dense(actx, fp["v"], cdt).reshape(b * f, la, n, hd)
        ao = attention(qf, k_a, v_a, backend=attn_backend,
                       kv_mask=jnp.broadcast_to(
                           amask, (b, f, la)).reshape(b * f, la))
        ao = ao.reshape(b, l, n, hd)
        o = o + ascale.reshape(b, 1, 1, 1).astype(o.dtype) * ao
    o = o.reshape(*x.shape[:2], cfg.dim)
    return _dense(o, p["o"], cdt)


# above this many fc1-intermediate elements the FFN runs in sequence
# chunks: at Wan-14B/720p (75,600 x 13,824) the unchunked intermediate is
# 1.95 GB bf16 (+ ~1 GB for its int8 copy on the a8 path) — chunking
# bounds it while each chunk's matmuls stay MXU-sized (>= ~9k rows)
_FFN_CHUNK_ELEMS = 256 * 1024 * 1024


def _ffn_once(p, y, cfg, cdt):
    h = _dense(y.astype(cdt), p["fc1"], cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
    return _dense(h, p["fc2"], cdt)


def _ffn(p, y, cfg):
    cdt = cfg.compute_dtype
    b, l, c = y.shape
    want = -(-(b * l * cfg.ffn_dim) // _FFN_CHUNK_ELEMS)
    if want <= 1:
        return _ffn_once(p, y, cfg, cdt)
    n = next((k for k in range(want, l + 1) if l % k == 0), 1)
    if n <= 1:
        return _ffn_once(p, y, cfg, cdt)
    lc = l // n

    def body(i, out):
        ys = jax.lax.dynamic_slice_in_dim(y, i * lc, lc, axis=1)
        return jax.lax.dynamic_update_slice_in_dim(
            out, _ffn_once(p, ys, cfg, cdt), i * lc, axis=1)

    return jax.lax.fori_loop(
        0, n, body, jnp.empty((b, l, c), cdt))


def _audio_cross_attention(ap, x, audio_ctx, n_frames, cfg, attn_backend):
    """Multitalk per-latent-frame audio cross-attention
    (multitalk/attention.py SingleStreamAttention:188, applied after the
    text cross-attention, multitalk_model.py:295-297).

    x: [B, L, C] with L = n_frames * S; audio_ctx: [B, n_frames, Na, Da].
    norm_x is an affine LayerNorm on the query input."""
    from ...ops.attention import attention
    cdt = cfg.compute_dtype
    b, l, c = x.shape
    s = l // n_frames
    y = layer_norm(x.astype(jnp.float32), ap["norm_x"]["w"],
                   ap["norm_x"]["b"], eps=cfg.eps)
    yq = y.reshape(b * n_frames, s, c).astype(cdt)
    q = _dense(yq, ap["q"], cdt)
    kv_in = audio_ctx.reshape(b * n_frames, audio_ctx.shape[2],
                              audio_ctx.shape[3]).astype(cdt)
    kv = _dense(kv_in, ap["kv"], cdt)
    k, v = jnp.split(kv, 2, axis=-1)
    n, hd = cfg.num_heads, cfg.head_dim
    o = attention(q.reshape(b * n_frames, s, n, hd),
                  k.reshape(b * n_frames, -1, n, hd),
                  v.reshape(b * n_frames, -1, n, hd),
                  backend=attn_backend)
    o = _dense(o.reshape(b * n_frames, s, c), ap["o"], cdt)
    return o.reshape(b, l, c)


def _block_standin(bp, lp, sx, e6_0, ref_cos, ref_sin, cfg, attn_backend):
    """StandIn phase-1 block pass over the reference-face tokens
    (model.py:1945-1947: full block with q/k/v LoRA adds, t=0 modulation,
    context=None so cross-attn is skipped).  Returns (new_sx, (k_ip,
    v_ip)) with the roped reference kv cached for phase 2."""
    mod = bp["modulation"].astype(jnp.float32)
    e = (e6_0 + mod[None, None])
    b, l, c = sx.shape

    def emod(i):
        return e[:, :, i]                       # [B, 1, C]

    y = layer_norm(sx.astype(jnp.float32), eps=cfg.eps)
    y = y * (1.0 + emod(1)) + emod(0)
    y, kv = _self_attention(bp["self_attn"], y, ref_cos, ref_sin, cfg,
                            attn_backend, qkv_loras=lp)
    sx = sx + y.astype(jnp.float32) * emod(2)
    y = layer_norm(sx, eps=cfg.eps)
    y = y * (1.0 + emod(4)) + emod(3)
    y = _ffn(bp["ffn"], y, cfg)
    sx = sx + y.astype(jnp.float32) * emod(5)
    return sx.astype(cfg.residual_dtype), kv


def _block(bp, x, e6, context, context_img, rope_cos, rope_sin, cfg,
           attn_backend, context_neg=None, nag=None, audio=None,
           fantasy=None, standin_kv=None, lynx=None, recam=None):
    """One WanAttentionBlock (model.py:574-718).  x fp32 [B, L, C];
    e6 fp32 [B, T_mod, 6, C] broadcast over tokens (T_mod=1 for scalar t).
    audio: optional (per-layer audio-attn params, audio_ctx, n_frames).
    fantasy: optional (per-layer k/v params, audio_ctx, kv_mask, scale).
    standin_kv: optional (k_ip, v_ip) reference kv appended to the
    self-attention keys/values (model.py:355-357).
    lynx: optional (lp per-layer params, ip_embeds, ref_feats | None,
    ip_scale, ref_scale) — Lynx IP + reference attention."""
    rdt = cfg.residual_dtype
    mod = bp["modulation"].astype(jnp.float32)  # [6, C]
    e = e6 + mod[None, None]                    # [B, T, 6, C]
    b, l, c = x.shape
    t_mod = e.shape[1]
    xr = x.reshape(b, t_mod, l // t_mod, c)

    def emod(i):
        return e[:, :, i][:, :, None, :]        # [B, T, 1, C]

    lynx_ref = lynx_ip = None
    if lynx is not None:
        lp, ip_embeds, ref_feats, ip_scale, ref_scale = lynx
        ip_scale = ip_scale * lp["active"]
        if "k_ref" in lp and ref_feats is not None:
            lynx_ref = (lp, ref_feats, ref_scale)
        lynx_ip = (lp, ip_embeds, ip_scale)

    # self-attention with adaLN-zero (fused norm+modulate+cast: the qkv
    # denses cast to compute_dtype anyway, so emitting bf16 here is
    # bit-identical and halves the materialized buffer — ops/norms.py)
    # the stream (x/xr) stays in rdt between ops: the norms upcast to
    # fp32 internally PER CHUNK (ops/norms.py), so casting at the call
    # site is bit-identical but materializes a full-stream fp32 temp
    # (640 MB at 14B/32.7k tokens — the r05 VACE-multitalk OOM); each
    # accumulation computes in fp32 and emits rdt (no-op when rdt=fp32)
    cdt = cfg.compute_dtype
    y = modulated_layer_norm(xr, emod(0), emod(1),
                             eps=cfg.eps, out_dtype=cdt).reshape(b, l, c)
    if recam is not None:
        # ReCamMaster (model.py:634-642): per-block camera-pose tokens
        # added to the MODULATED self-attn input.  cam_map=None means
        # the embedding is already per-token (Vista4D Plucker rays,
        # model.py:636-637).
        rp, cam_emb, cam_map = recam
        cam = cam_emb.astype(jnp.float32) @ rp["cam_w"] + rp["cam_b"]
        if cam_map is not None:
            cam = cam[:, cam_map]
        y = y + cam.astype(y.dtype)
    y, _ = _self_attention(bp["self_attn"], y, rope_cos, rope_sin, cfg,
                           attn_backend, extra_kv=standin_kv,
                           lynx_ref=lynx_ref)
    if recam is not None:
        # projector on the self-attn output (model.py:650)
        y = (y.astype(jnp.float32) @ recam[0]["proj_w"]
             + recam[0]["proj_b"]).astype(y.dtype)
    x = (xr.astype(jnp.float32)
         + y.astype(jnp.float32).reshape(b, t_mod, -1, c) * emod(2)
         ).astype(rdt)
    x = x.reshape(b, l, c)

    # cross-attention (norm3 has affine params; cross_attn_norm=True);
    # out_dtype=cdt is bit-identical (the q dense casts to cdt first)
    y = layer_norm(x, bp["norm3"]["w"], bp["norm3"]["b"],
                   eps=cfg.eps, out_dtype=cdt)
    x = (x.astype(jnp.float32)
         + _cross_attention(bp["cross_attn"], y, context, context_img, cfg,
                            attn_backend, context_neg=context_neg,
                            nag=nag, fantasy=fantasy,
                            lynx_ip=lynx_ip).astype(jnp.float32)
         ).astype(rdt)

    if audio is not None:
        ap, audio_ctx, n_frames = audio
        x = (x.astype(jnp.float32)
             + _audio_cross_attention(ap, x, audio_ctx, n_frames, cfg,
                                      attn_backend).astype(jnp.float32)
             ).astype(rdt)

    # FFN with adaLN-zero (same fused bf16 emission as the self-attn norm)
    xr = x.reshape(b, t_mod, l // t_mod, c)
    y = modulated_layer_norm(xr, emod(3), emod(4),
                             eps=cfg.eps, out_dtype=cdt).reshape(b, l, c)
    y = _ffn(bp["ffn"], y, cfg)
    x = (xr.astype(jnp.float32)
         + y.astype(jnp.float32).reshape(b, t_mod, -1, c) * emod(5))
    return x.reshape(b, l, c).astype(rdt)


def time_embedding_vec(params, cfg: WanDiTConfig, t):
    """Time-embedding e (pre-projection) — the TeaCache signature signal
    (model.py:1895: previous_modulated_input).  t: [B] -> [B, dim] fp32."""
    e = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1))
    e = _dense(e, params["time_embedding"]["fc1"], jnp.float32)
    return _dense(jax.nn.silu(e), params["time_embedding"]["fc2"],
                  jnp.float32)


def wan_dit_forward(params, cfg: WanDiTConfig, latents, t, context,
                    rope_cos, rope_sin, clip_fea=None, y=None,
                    attn_backend: str = "auto", skip_state=None,
                    context_neg=None, nag=None,
                    vace_context=None, vace_scale: float = 1.0,
                    fbc_state=None, fbc_threshold: float = 0.08,
                    audio_tokens=None, fantasy_audio=None, standin=None,
                    lynx=None, lynx_extract: bool = False,
                    shotplan=None, animate=None, steadydancer=None,
                    clip_fea_extra=None, cam_emb=None, scail_pose=None,
                    scail2=None, bernini=None, vista=None, kiwi=None):
    """Denoiser forward.

    latents:  [B, C, F, H, W] noisy latents
    t:        [B] or [B, F_lat] timesteps (0..1000 float)
    context:  [B, text_len, text_dim] text-encoder states (zero-padded)
    clip_fea: [B, 257, 1280] CLIP image features (i2v only)
    y:        [B, C_y, F, H, W] conditioning latents concatenated on channels
              (i2v mask+frames path, model.py:1576)
    Returns velocity prediction [B, C_out, F, H, W] (fp32).
    """
    b = latents.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (latents.shape[2] // pt, latents.shape[3] // ph,
            latents.shape[4] // pw)

    steady_keep = None
    x_in = latents if y is None else jnp.concatenate([latents, y], axis=1)
    if scail2 is not None and "mask_patch_embedding" in params:
        # SCAIL-2 (modules/model.py:1578-1585): the matted reference
        # latents (20ch) PREPEND on time; their 28-ch color-mask
        # embedding adds to the tokens; the output slice drops the
        # reference frames.
        ref = jnp.broadcast_to(scail2["ref"].astype(x_in.dtype),
                               (b, *scail2["ref"].shape[1:]))
        n_ref = ref.shape[2]
        x_in = jnp.concatenate([ref, x_in], axis=2)
    if steadydancer is not None and "patch_embedding_fuse" in params:
        # SteadyDancer condition-reconciliation (model.py:1638-1658):
        # fused/aligned pose conditions join the channel stack through a
        # dedicated patch embed; ref_x/ref_c tokens append as two extra
        # latent frames; the head reads only the real video tokens.
        from .steadydancer import steadydancer_fuse
        sd_cond, ref_x_lat, ref_c_lat = steadydancer
        fused, aligned = steadydancer_fuse(params, sd_cond, latents)
        x_in = jnp.concatenate(
            [x_in, fused.astype(x_in.dtype), aligned.astype(x_in.dtype)],
            axis=1)
        x = patchify(x_in.astype(jnp.float32), cfg.patch_size)
        x = _dense(x, params["patch_embedding_fuse"], jnp.float32)
        real_len = x.shape[1]
        rx = patchify(ref_x_lat.astype(jnp.float32), cfg.patch_size)
        rx = _dense(rx, params["patch_embedding"], jnp.float32)
        rc = patchify(ref_c_lat[:, :16].astype(jnp.float32),
                      cfg.patch_size)
        rc = _dense(rc, params["patch_embedding_ref_c"], jnp.float32)
        rx = jnp.broadcast_to(rx, (b, *rx.shape[1:]))
        rc = jnp.broadcast_to(rc, (b, *rc.shape[1:]))
        x = jnp.concatenate([x, rx, rc], axis=1)
        steady_keep = np.arange(real_len)
    else:
        x = patchify(x_in.astype(jnp.float32), cfg.patch_size)
        x = _dense(x, params["patch_embedding"], jnp.float32)
    x = x.astype(cfg.residual_dtype)

    if animate is not None and "pose_patch_embedding" in params:
        # Wan-Animate pose conditioning (model_animate.py:13-14): pose
        # latents are patch embedded and ADDED to the video tokens of
        # latent frames 1+.
        pose_latents, _ = animate
        if pose_latents is not None:
            pose_tok = patchify(pose_latents.astype(jnp.float32),
                                cfg.patch_size)
            pose_tok = _dense(pose_tok, params["pose_patch_embedding"],
                              jnp.float32)
            s_f = (latents.shape[3] // ph) * (latents.shape[4] // pw)
            if pose_tok.shape[0] != b:
                pose_tok = jnp.broadcast_to(pose_tok,
                                            (b, *pose_tok.shape[1:]))
            x = x.at[:, s_f:s_f + pose_tok.shape[1]].add(
                pose_tok.astype(x.dtype))

    shotplan_keep = steady_keep
    if scail2 is not None and "mask_patch_embedding" in params:
        s_f = (latents.shape[3] // ph) * (latents.shape[4] // pw)
        # 28-ch ref+null mask embedding ADDED over all main tokens
        # (model.py:1610-1614)
        mask_tok = patchify(scail2["ref_masks"].astype(jnp.float32),
                            cfg.patch_size)
        mask_tok = _dense(mask_tok, params["mask_patch_embedding"],
                          jnp.float32)
        x = x + jnp.broadcast_to(mask_tok.astype(x.dtype),
                                 x.shape)
        # pose tokens = pose embed + driving-mask embed, appended
        # (scail2/__init__.py:508-521)
        pose_tok = _dense(patchify(scail2["pose"].astype(jnp.float32),
                                   cfg.patch_size),
                          params["pose_patch_embedding"], jnp.float32)
        pose_tok = pose_tok + _dense(
            patchify(scail2["driving_masks"].astype(jnp.float32),
                     cfg.patch_size),
            params["mask_patch_embedding"], jnp.float32)
        pose_tok = jnp.broadcast_to(pose_tok, (b, *pose_tok.shape[1:]))
        main_end = x.shape[1]
        x = jnp.concatenate([x, pose_tok.astype(x.dtype)], axis=1)
        # keep only the video span (drop ref frames + pose tokens)
        shotplan_keep = np.arange(n_ref * s_f, main_end)
    if kiwi is not None:
        # Kiwi Edit (model.py:1616-1631): the source condition adds to
        # the tokens scaled by sigma = t/1000, the ref condition
        # concatenates one latent frame on time; the output slice
        # drops the ref frame.
        main_len = x.shape[1]
        if kiwi.get("source") is not None:
            src = kiwi["source"]                  # [1, Ts, H', W', C]
            t_x = latents.shape[2] // pt
            if src.shape[1] < t_x:
                src = jnp.concatenate(
                    [src, jnp.zeros((src.shape[0], t_x - src.shape[1],
                                     *src.shape[2:]), src.dtype)],
                    axis=1)
            src = src[:, :t_x].reshape(src.shape[0], -1, src.shape[-1])
            sigma = (t.reshape(-1)[0] / 1000.0).astype(jnp.float32)
            x = x + jnp.broadcast_to(src, x.shape).astype(x.dtype) \
                * sigma.astype(x.dtype)
        if kiwi.get("ref") is not None:
            ref = kiwi["ref"].reshape(kiwi["ref"].shape[0], -1,
                                      kiwi["ref"].shape[-1])
            ref = jnp.broadcast_to(ref, (b, *ref.shape[1:]))
            if kiwi.get("ref_pad_first"):
                x = jnp.concatenate([ref.astype(x.dtype), x], axis=1)
                shotplan_keep = np.arange(ref.shape[1],
                                          ref.shape[1] + main_len)
            else:
                x = jnp.concatenate([x, ref.astype(x.dtype)], axis=1)
                shotplan_keep = np.arange(main_len)
    if vista is not None and "vista_encoder" in params:
        # Vista4D (model.py:1661-1683): point-cloud and source token
        # streams append after the main tokens as
        # [main | point | source]; each stream = rgb patch embed +
        # zero-init mask patch embed (latent_encoder.py:100-127).
        ve = params["vista_encoder"]
        main_len = x.shape[1]

        def stream(rgb, mask, rk, mk):
            t_ = _dense(patchify(rgb.astype(jnp.float32),
                                 cfg.patch_size), ve[rk], jnp.float32)
            if mask is not None:
                t_ = t_ + _dense(patchify(mask.astype(jnp.float32),
                                          cfg.patch_size), ve[mk],
                                 jnp.float32)
            return jnp.broadcast_to(t_, (b, *t_.shape[1:]))

        point = stream(vista["point_latents"],
                       vista.get("point_mask_latents"),
                       "point_rgb", "point_mask")
        source = stream(vista["source_latents"],
                        vista.get("source_mask_latents"),
                        "source_rgb", "source_mask")
        x = jnp.concatenate([x, point.astype(x.dtype),
                             source.astype(x.dtype)], axis=1)
        shotplan_keep = np.arange(main_len)
        if vista.get("cam_emb") is not None and cam_emb is None:
            # per-token Plucker rays tiled over the 3 streams
            # (model.py:1679-1681)
            ce = vista["cam_emb"]
            ce = ce.reshape(ce.shape[0], -1, ce.shape[-1])
            cam_emb = jnp.tile(ce, (1, 3, 1))
    if bernini is not None and len(bernini) > 0:
        # Bernini sources (model.py:1587-1605): each source's latents go
        # through the MAIN patch embedding and append to the stream;
        # rope_cos/rope_sin must already cover (and phase-rotate) them.
        main_len = x.shape[1]
        toks = []
        for src in bernini:
            st = patchify(src.astype(jnp.float32), cfg.patch_size)
            st = _dense(st, params["patch_embedding"], jnp.float32)
            toks.append(jnp.broadcast_to(st, (b, *st.shape[1:])))
        x = jnp.concatenate([x] + [t_.astype(x.dtype) for t_ in toks],
                            axis=1)
        shotplan_keep = np.arange(main_len)
    if scail_pose is not None and "pose_patch_embedding" in params:
        # SCAIL pose tokens (model_scail.py:8-37): the 20-ch pose stack
        # goes through its own patch embed and is APPENDED to the main
        # tokens; rope_cos/rope_sin must already cover the extension and
        # the extra tokens are dropped before the head (model.py:1999).
        main_len = x.shape[1]
        pose_tok = patchify(scail_pose.astype(jnp.float32),
                            cfg.patch_size)
        pose_tok = _dense(pose_tok, params["pose_patch_embedding"],
                          jnp.float32)
        if pose_tok.shape[0] != b:
            pose_tok = jnp.broadcast_to(pose_tok, (b, *pose_tok.shape[1:]))
        x = jnp.concatenate([x, pose_tok.astype(x.dtype)], axis=1)
        shotplan_keep = np.arange(main_len)
    if shotplan is not None and "hardcut_embedding" in params:
        # ShotPlan hardcut-token injection (model.py:1724-1733): insert
        # learned tokens at the cut boundaries; they attend in every
        # block and are dropped before the head (model.py:1994-1995).
        hc = params["hardcut_embedding"].astype(x.dtype)
        cut = jnp.broadcast_to(hc.reshape(1, 1, -1),
                               (b, shotplan.n_cut, x.shape[-1]))
        x = jnp.concatenate([x, cut], axis=1)[:, shotplan.src_map]
        rope_cos, rope_sin = shotplan.cos, shotplan.sin
        shotplan_keep = shotplan.keep_idx

    # time embeddings (fp32 path, reference lock_layers_dtypes)
    t_flat = t.reshape(-1)                       # [B*T_mod]
    e = sinusoidal_embedding_1d(cfg.freq_dim, t_flat)
    e = _dense(e, params["time_embedding"]["fc1"], jnp.float32)
    e = _dense(jax.nn.silu(e), params["time_embedding"]["fc2"], jnp.float32)
    e0 = _dense(jax.nn.silu(e), params["time_projection"], jnp.float32)
    t_mod = t_flat.shape[0] // b
    e6 = e0.reshape(b, t_mod, 6, cfg.dim)
    e_head = e.reshape(b, t_mod, cfg.dim)

    # text embedding: Linear -> gelu(tanh) -> Linear (model.py:1122)
    cdt = cfg.compute_dtype
    def embed_text(c):
        h = _dense(c.astype(cdt), params["text_embedding"]["fc1"], cdt)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
        return _dense(h, params["text_embedding"]["fc2"], cdt)

    ctx = embed_text(context)
    ctx_neg = embed_text(context_neg) if context_neg is not None else None

    ctx_img = None
    if clip_fea is not None and cfg.i2v_cross_attn:
        ie = params["img_emb"]

        def img_emb(f):
            h = layer_norm(f.astype(jnp.float32), ie["norm1"]["w"],
                           ie["norm1"]["b"])
            h = _dense(h.astype(cdt), ie["fc1"], cdt)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=False).astype(cdt)
            h = _dense(h, ie["fc2"], cdt)
            return layer_norm(h.astype(jnp.float32), ie["norm2"]["w"],
                              ie["norm2"]["b"]).astype(cdt)

        ctx_img = img_emb(clip_fea)
        if clip_fea_extra is not None:
            # SteadyDancer pose-frame clip features added to the image
            # context (model.py:1644-1646 steadydancer_clip_fea_c)
            ctx_img = ctx_img + img_emb(clip_fea_extra)

    # VACE control branch (vace_model.py forward_vace): each vace block
    # emits an after_proj skip added to main layer 2i.  The hints are NOT
    # precomputed as a stacked [num_layers, B, L, D] array — at 14B/720p
    # CFG dims that stack is bf16[40, 2, 32760, 5120] = 26.8 GB (observed
    # r05 OOM on the 16 GB chip).  Instead the vace activation rides the
    # main scan's carry and each hint is produced just-in-time: the scan
    # walks layer PAIRS (vace_layers is every 2nd layer), running vace
    # block i then main layers 2i (+hint) and 2i+1.  O(1) hint memory.
    vace_on = vace_context is not None and cfg.vace
    if vace_on:
        if cfg.num_layers % 2:
            raise ValueError("interleaved VACE scan expects an even "
                             "number of layers (vace on every 2nd)")
        c_embed = patchify(vace_context.astype(jnp.float32), cfg.patch_size)
        c_embed = _dense(c_embed, params["vace_patch_embedding"],
                         jnp.float32)
        c_embed = _dense(c_embed.astype(cfg.compute_dtype),
                         params["vace_before_proj"]).astype(jnp.float32)

        def _vace_step(c, vbp):
            blk = {k: v for k, v in vbp.items() if k != "after_proj"}
            # the vace stream rides the scan carry in residual_dtype,
            # same as the main stream (fp32 default; bf16 at 14B bench
            # dims, where two fp32 [2, 32k, 5120] streams cost 2.7 GB)
            c = _block(blk, c, e6, ctx, ctx_img, rope_cos, rope_sin, cfg,
                       attn_backend).astype(cfg.residual_dtype)
            skip = _dense(c.astype(cfg.compute_dtype), vbp["after_proj"])
            return c, skip * vace_scale

    _zero_hint = jnp.zeros((1, 1, 1), jnp.float32)

    def _make_run_blocks(body, extra_stacks=(), wrap=None, unwrap=None):
        """Build run_blocks(x) from a per-layer body(carry, (bp, hint,
        *extras)).  Without VACE: one scan over the stacked blocks with a
        broadcast-zero hint.  With VACE: scan over layer pairs, threading
        the vace activation through the carry (see note above)."""
        wrap = wrap or (lambda x: x)
        unwrap = unwrap or (lambda c: c)
        if not vace_on:
            hints = jnp.zeros((cfg.num_layers, 1, 1, 1), jnp.float32)

            def run_blocks(x):
                out, _ = jax.lax.scan(
                    body, wrap(x), (params["blocks"], hints) + extra_stacks)
                return unwrap(out)
            return run_blocks

        n_v = cfg.num_layers // 2
        stacks2 = jax.tree.map(
            lambda a: a.reshape(n_v, 2, *a.shape[1:]),
            (params["blocks"],) + extra_stacks)

        def pair_body(carry, xs):
            bcar, c = carry
            vbp, row = xs
            c, skip = _vace_step(c, vbp)
            row0 = jax.tree.map(lambda a: a[0], row)
            row1 = jax.tree.map(lambda a: a[1], row)
            bcar, _ = body(bcar, (row0[0], skip) + tuple(row0[1:]))
            bcar, _ = body(bcar, (row1[0], _zero_hint) + tuple(row1[1:]))
            return (bcar, c), None

        def run_blocks(x):
            c0 = (jnp.broadcast_to(c_embed, x.shape) + x).astype(
                cfg.residual_dtype)
            (out, _), _ = jax.lax.scan(
                pair_body, (wrap(x), c0),
                (params["vace_blocks"], stacks2))
            return unwrap(out)
        return run_blocks

    # Multitalk audio conditioning: per-layer audio cross-attn params
    # scanned alongside the blocks (multitalk_model.py:295-297).
    use_audio = (audio_tokens is not None
                 and "audio_attn_blocks" in params)
    use_fantasy = (fantasy_audio is not None
                   and "fantasy_attn_blocks" in params)
    use_standin = standin is not None and "standin_loras" in params
    use_lynx = lynx is not None and "lynx_blocks" in params
    use_recam = cam_emb is not None and "recam_blocks" in params
    use_animate = (animate is not None and animate[1] is not None
                   and "face_adapter" in params)
    if lynx_extract:
        # Lynx reference feature extraction (model.py:645): collect each
        # block's MODULATED self-attn input over the face latents (t=0).
        def ebody(x, bp):
            mod = bp["modulation"].astype(jnp.float32)
            e_ = e6 + mod[None, None]
            bb, ll, cc = x.shape
            tm = e_.shape[1]
            xr_ = x.reshape(bb, tm, ll // tm, cc)
            ymod = layer_norm(xr_.astype(jnp.float32), eps=cfg.eps)
            ymod = (ymod * (1.0 + e_[:, :, 1][:, :, None, :])
                    + e_[:, :, 0][:, :, None, :]).reshape(bb, ll, cc)
            out = _block(bp, x, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend)
            return out, ymod.astype(cfg.compute_dtype)

        _, ys = jax.lax.scan(ebody, x, params["blocks"])
        return ys                               # [layers, B, L, C]
    if use_animate:
        # face-motion adapter at every 5th block (model.py:715-716)
        from .animate import face_block_forward
        _, motion_vec = animate
        if motion_vec.shape[0] != b:
            motion_vec = jnp.broadcast_to(motion_vec,
                                          (b, *motion_vec.shape[1:]))

        def body(carry, xs):
            bp, hint, ap = xs
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag)
            fb = face_block_forward(ap, out, motion_vec, cfg.num_heads)
            out = out + ap["active"] * fb.astype(out.dtype)
            return out + hint.astype(out.dtype), None

        run_blocks = _make_run_blocks(body, (params["face_adapter"],))
    elif use_lynx:
        ip_embeds, ref_buf, ip_scale, ref_scale = lynx

        def body(carry, xs):
            if ref_buf is not None:
                bp, hint, lp, rfeats = xs
            else:
                bp, hint, lp = xs
                rfeats = None
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag,
                         lynx=(lp, ip_embeds, rfeats, ip_scale, ref_scale))
            return out + hint.astype(out.dtype), None

        lynx_stacks = (params["lynx_blocks"],)
        if ref_buf is not None:
            lynx_stacks = lynx_stacks + (ref_buf,)
        run_blocks = _make_run_blocks(body, lynx_stacks)
    elif use_standin:
        # StandIn (model.py:1781-1789, 1945-1947): reference-face tokens
        # run a parallel phase-1 block stack (q/k/v LoRA, t=0 modulation,
        # ref-offset rope); each main block appends the roped reference
        # kv to its self-attention.
        st_lat, ref_cos, ref_sin = standin
        sx = patchify(st_lat.astype(jnp.float32), cfg.patch_size)
        sx = _dense(sx, params["patch_embedding"], jnp.float32)
        if sx.shape[0] != b:
            sx = jnp.broadcast_to(sx, (b, *sx.shape[1:]))
        e_st = sinusoidal_embedding_1d(cfg.freq_dim, jnp.zeros((b,)))
        e_st = _dense(e_st, params["time_embedding"]["fc1"], jnp.float32)
        e_st = _dense(jax.nn.silu(e_st), params["time_embedding"]["fc2"],
                      jnp.float32)
        e0_st = _dense(jax.nn.silu(e_st), params["time_projection"],
                       jnp.float32)
        e6_st = e0_st.reshape(b, 1, 6, cfg.dim)

        def body(carry, xs):
            x, sx = carry
            bp, hint, lp = xs
            new_sx, kv = _block_standin(bp, lp, sx, e6_st, ref_cos,
                                        ref_sin, cfg, attn_backend)
            out = _block(bp, x, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag,
                         standin_kv=kv)
            return (out + hint.astype(out.dtype), new_sx), None

        run_blocks = _make_run_blocks(
            body, (params["standin_loras"],),
            wrap=lambda x: (x, sx.astype(cfg.residual_dtype)),
            unwrap=lambda carry: carry[0])
    elif use_recam:
        # ReCamMaster (model.py:1196-1204): per-block zero-init camera
        # encoder + identity projector, scanned alongside the blocks.
        # Vista4D reuses the adapters with per-token 6-dim rays.
        from .recam import build_cam_frame_map
        cam = cam_emb if cam_emb.ndim == 3 else cam_emb[None]
        cam = jnp.broadcast_to(cam, (b, *cam.shape[1:]))
        if cam.shape[1] == x.shape[1]:
            cam_map = None
        else:
            cam_map = jnp.asarray(build_cam_frame_map(
                grid[0], cam.shape[1], grid[1], grid[2]))

        def body(carry, xs):
            bp, hint, rp = xs
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag,
                         recam=(rp, cam, cam_map))
            return out + hint.astype(out.dtype), None

        run_blocks = _make_run_blocks(body, (params["recam_blocks"],))
    elif use_audio:
        audio_ctx = audio_tokens.astype(cfg.compute_dtype)

        def body(carry, xs):
            bp, hint, ap = xs
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag,
                         audio=(ap, audio_ctx, grid[0]))
            return out + hint.astype(out.dtype), None

        run_blocks = _make_run_blocks(body, (params["audio_attn_blocks"],))
    elif use_fantasy:
        # FantasyTalking: per-block processor k/v over the projected audio
        # windows (model.py:1210-1213, modules/model.py:479-496)
        f_ctx, f_mask, f_scale = fantasy_audio
        f_ctx = f_ctx.astype(cfg.compute_dtype)

        def body(carry, xs):
            bp, hint, fp = xs
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag,
                         fantasy=(fp, f_ctx, f_mask, f_scale))
            return out + hint.astype(out.dtype), None

        run_blocks = _make_run_blocks(body,
                                      (params["fantasy_attn_blocks"],))
    else:
        def body(carry, xs):
            bp, hint = xs
            out = _block(bp, carry, e6, ctx, ctx_img, rope_cos, rope_sin,
                         cfg, attn_backend, context_neg=ctx_neg, nag=nag)
            return out + hint.astype(out.dtype), None

        run_blocks = _make_run_blocks(body)

    new_residual = None
    new_fbc = None
    if fbc_state is not None and (use_audio or use_fantasy or use_standin
                                  or use_lynx or use_recam):
        raise ValueError("first-block cache is not supported together "
                         "with audio/standin/lynx conditioning")
    if fbc_state is not None and vace_on:
        raise ValueError("first-block cache is not supported together "
                         "with VACE")
    if fbc_state is not None:
        # First-block cache (reference models/minimax_h3/first_block_cache.py
        # :6-54): run block 0, compare its output signature to the cached
        # one; below threshold reuse the cached block-stack tail residual.
        prev_sig, tail_res, allow_skip = fbc_state
        bp0 = jax.tree.map(lambda a: a[0], params["blocks"])
        x0_in = x
        x = _block(bp0, x, e6, ctx, ctx_img, rope_cos, rope_sin, cfg,
                   attn_backend, context_neg=ctx_neg, nag=nag)
        sig = x
        diff = jnp.abs(sig.astype(jnp.float32)
                       - prev_sig.astype(jnp.float32)).mean()
        ref = jnp.maximum(
            jnp.abs(prev_sig.astype(jnp.float32)).mean(), 1e-8)
        should_calc = jnp.logical_or(diff / ref > fbc_threshold,
                                     jnp.logical_not(allow_skip))

        def run_tail(x):
            blocks_tail = jax.tree.map(lambda a: a[1:], params["blocks"])
            zh = jnp.zeros((cfg.num_layers - 1, 1, 1, 1), jnp.float32)
            out, _ = jax.lax.scan(body, x, (blocks_tail, zh))
            return out

        x_head = x
        x = jax.lax.cond(should_calc, run_tail,
                         lambda x: x + tail_res.astype(x.dtype), x)
        new_tail = jnp.where(should_calc, x - x_head, tail_res)
        new_fbc = (sig, new_tail)
    elif skip_state is None:
        x = run_blocks(x)
    else:
        # TeaCache/MagCache skip: reuse the cached block-stack residual
        # (model.py:1917-1921); decision precomputed per step (caches.py).
        # The stored residual keeps the CALLER'S dtype (bf16 at 14B scale
        # — a fp32 [B, 75600, 5120] copy costs 1.5 GB of the 16 GB chip).
        should_calc, prev_residual = skip_state
        x0 = x
        if isinstance(should_calc, bool):
            # host-planned schedule baked in statically (host-loop driver):
            # no lax.cond barrier — the calc program keeps XLA's whole-
            # program buffer optimization and the skip program is tiny
            if should_calc:
                x = run_blocks(x)
                new_residual = (x - x0).astype(prev_residual.dtype)
            else:
                x = x + prev_residual.astype(x.dtype)
                new_residual = prev_residual
        else:
            x = jax.lax.cond(should_calc, run_blocks,
                             lambda x: x + prev_residual.astype(x.dtype), x)
            new_residual = jnp.where(should_calc,
                                     (x - x0).astype(prev_residual.dtype),
                                     prev_residual)

    if shotplan_keep is not None:
        x = x[:, shotplan_keep]

    # head (model.py Head.forward): adaLN with 2-way modulation, then linear
    hp = params["head"]
    mod = hp["modulation"].astype(jnp.float32)   # [2, C]
    eh = e_head[:, :, None, :] + mod[None, None]  # [B, T, 2, C]
    l = x.shape[1]
    xr = x.reshape(b, t_mod, l // t_mod, cfg.dim).astype(jnp.float32)
    xn = layer_norm(xr, eps=cfg.eps)
    xn = xn * (1.0 + eh[:, :, 1][:, :, None, :]) + eh[:, :, 0][:, :, None, :]
    out = _dense(xn.reshape(b, l, cfg.dim), hp["head"], jnp.float32)
    out = unpatchify(out, grid, cfg.patch_size, cfg.out_dim)
    if fbc_state is not None:
        return out, new_fbc
    if skip_state is not None:
        return out, new_residual
    return out
