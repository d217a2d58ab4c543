"""Ovi: joint audio+video generation via twin fused Wan stacks.

TPU-native re-implementation of /root/reference/models/wan/
ovi_fusion_engine.py + ovi/modules/fusion.py:
- two 5B-geometry Wan models (dim 3072, 30 layers): video ti2v (in 48,
  patch (1,2,2), Wan2.2 VAE) and audio t2a (in 20, patch (1,) over a
  1D token sequence, MMAudio latents @ ~31.25 Hz);
- audio rope (model.py rope_params_audio_real:47): rotary over the
  first d - 4*(d//6) = 44 head dims with inverse frequencies scaled by
  temporal_rope_scaling_factor 0.19676, identity on the rest;
- per block (fusion.py single_fusion_block_forward:176): audio
  self-attn -> video self-attn -> audio cross+ffn (fusing the UPDATED
  video sequence) -> video cross+ffn (fusing the UPDATED audio);
- fused cross attention (fusion.py:76-131): text attention with the
  un-roped query PLUS a fusion branch where the query (roped with its
  own tables) attends over k_fusion/v_fusion of the pre-LN'd other
  modality (k roped with the target's tables); both summed pre-`o`;
- CFG (ovi_fusion_engine.py:299-301): per-modality two-branch guidance
  with separate video/audio negative prompts."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm
from ...ops.rope import apply_rope, build_rope_3d
from .dit import (WanDiTConfig, init_wan_dit, sinusoidal_embedding_1d,
                  patchify, unpatchify, _dense, _qkv_heads)

OVI_VIDEO = dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                 in_dim=48, out_dim=48, model_type="t2v")
OVI_AUDIO = dict(dim=3072, ffn_dim=14336, num_heads=24, num_layers=30,
                 in_dim=20, out_dim=20, model_type="t2v")
AUDIO_ROPE_SCALING = 0.19676


def build_audio_rope(seq_len: int, head_dim: int = 128,
                     scaling: float = AUDIO_ROPE_SCALING,
                     theta: float = 10000.0):
    """Compact [T, head_dim//2] cos/sin tables: rotary on the first
    d - 4*(d//6) dims with scaled frequencies, identity passthrough on
    the rest (model.py rope_params_audio_real:47-60)."""
    rotary = head_dim - 4 * (head_dim // 6)
    inv = scaling * theta ** (-np.arange(0, rotary, 2,
                                         dtype=np.float64) / rotary)
    ang = np.outer(np.arange(seq_len), inv)        # [T, rotary/2]
    pad = head_dim // 2 - rotary // 2
    cos = np.concatenate([np.cos(ang), np.ones((seq_len, pad))], axis=1)
    sin = np.concatenate([np.sin(ang), np.zeros((seq_len, pad))], axis=1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def init_ovi_fusion(key, num_layers: int = 30, dim: int = 3072,
                    dtype=jnp.float32):
    """Stacked per-block fusion params for ONE stack
    (fusion.py inject_cross_attention_kv_projections:44-56)."""
    keys = iter(jax.random.split(key, num_layers * 2 + 1))

    def lin():
        lim = math.sqrt(6.0 / (2 * dim))
        return {"w": jax.random.uniform(next(keys), (dim, dim),
                                        jnp.float32, -lim,
                                        lim).astype(dtype),
                "b": jnp.zeros((dim,), dtype)}

    blocks = [{"k_fusion": lin(), "v_fusion": lin(),
               "pre_ln": {"w": jnp.ones((dim,), jnp.float32),
                          "b": jnp.zeros((dim,), jnp.float32)},
               "norm_k_fusion": jnp.ones((dim,), jnp.float32)}
              for _ in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def load_ovi_fusion_params(sd: Dict[str, np.ndarray], num_layers: int,
                           dtype=jnp.bfloat16):
    """blocks.N.cross_attn.{k_fusion,v_fusion,pre_attn_norm_fusion,
    norm_k_fusion} keys (consumed from a video/audio stack sd)."""
    blocks = []
    for i in range(num_layers):
        pre = f"blocks.{i}.cross_attn"
        blocks.append({
            "k_fusion": {"w": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.k_fusion.weight"),
                np.float32).T).astype(dtype),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.k_fusion.bias"), np.float32))},
            "v_fusion": {"w": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.v_fusion.weight"),
                np.float32).T).astype(dtype),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.v_fusion.bias"), np.float32))},
            "pre_ln": {"w": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.pre_attn_norm_fusion.weight"),
                np.float32)),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.pre_attn_norm_fusion.bias"),
                    np.float32))},
            "norm_k_fusion": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.norm_k_fusion.weight"), np.float32)),
        })
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def _self_attn(bp, y, cos, sin, cfg, backend):
    cdt = cfg.compute_dtype
    yc = y.astype(cdt)
    q = rms_norm(_dense(yc, bp["q"], cdt), bp["norm_q"], cfg.eps)
    k = rms_norm(_dense(yc, bp["k"], cdt), bp["norm_k"], cfg.eps)
    v = _dense(yc, bp["v"], cdt)
    q = apply_rope(_qkv_heads(q, cfg.num_heads), cos, sin)
    k = apply_rope(_qkv_heads(k, cfg.num_heads), cos, sin)
    o = attention(q, k, _qkv_heads(v, cfg.num_heads), backend=backend)
    return _dense(o.reshape(*y.shape[:2], cfg.dim), bp["o"], cdt)


def _fusion_cross_attn(cp, fp, y, ctx, target, src_cos, src_sin,
                       tgt_cos, tgt_sin, cfg, backend):
    """fusion.py:76-131: text attention (un-roped q) + fusion attention
    (roped q over roped k_fusion of the other modality), summed pre-o."""
    cdt = cfg.compute_dtype
    yc = y.astype(cdt)
    q = rms_norm(_dense(yc, cp["q"], cdt), cp["norm_q"], cfg.eps)
    q = _qkv_heads(q, cfg.num_heads)
    k = rms_norm(_dense(ctx, cp["k"], cdt), cp["norm_k"], cfg.eps)
    v = _dense(ctx, cp["v"], cdt)
    o = attention(q, _qkv_heads(k, cfg.num_heads),
                  _qkv_heads(v, cfg.num_heads), backend=backend)

    tgt = layer_norm(target.astype(jnp.float32), fp["pre_ln"]["w"],
                     fp["pre_ln"]["b"], eps=cfg.eps).astype(cdt)
    k_t = rms_norm(_dense(tgt, fp["k_fusion"], cdt),
                   fp["norm_k_fusion"], cfg.eps)
    v_t = _dense(tgt, fp["v_fusion"], cdt)
    q_r = apply_rope(q, src_cos, src_sin)
    k_t = apply_rope(_qkv_heads(k_t, cfg.num_heads), tgt_cos, tgt_sin)
    o = o + attention(q_r, k_t, _qkv_heads(v_t, cfg.num_heads),
                      backend=backend)
    return _dense(o.reshape(*y.shape[:2], cfg.dim), cp["o"], cdt)


def _ffn(bp, y, cfg):
    cdt = cfg.compute_dtype
    h = _dense(y.astype(cdt), bp["fc1"], cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
    return _dense(h, bp["fc2"], cdt)


def _cross_ffn(bp, fp, x, e, ctx, target, src_cos, src_sin, tgt_cos,
               tgt_sin, cfg, backend):
    """cross-attn + modulated FFN half-block (fusion.py:134-174)."""
    y = layer_norm(x.astype(jnp.float32), bp["norm3"]["w"],
                   bp["norm3"]["b"], eps=cfg.eps)
    x = x + _fusion_cross_attn(bp["cross_attn"], fp, y, ctx, target,
                               src_cos, src_sin, tgt_cos, tgt_sin, cfg,
                               backend).astype(jnp.float32)
    y = layer_norm(x, eps=cfg.eps)
    y = y * (1.0 + e[:, None, 4]) + e[:, None, 3]
    y = _ffn(bp["ffn"], y, cfg)
    return x + y.astype(jnp.float32) * e[:, None, 5]


def ovi_fusion_forward(vid_params, aud_params, vid_fusion, aud_fusion,
                       vcfg: WanDiTConfig, acfg: WanDiTConfig,
                       vid_lat, audio_lat, t, vid_ctx, audio_ctx,
                       vid_rope, audio_rope,
                       attn_backend: str = "auto"):
    """vid_lat: [B, 48, F, H, W]; audio_lat: [B, T_a, 20]; t: [B].
    Returns (vid_velocity, audio_velocity)."""
    b = vid_lat.shape[0]
    vcos, vsin = vid_rope
    acos, asin = audio_rope

    def prologue(params, cfg, tokens):
        e = sinusoidal_embedding_1d(cfg.freq_dim, t.reshape(-1))
        e = _dense(e, params["time_embedding"]["fc1"], jnp.float32)
        e = _dense(jax.nn.silu(e), params["time_embedding"]["fc2"],
                   jnp.float32)
        e0 = _dense(jax.nn.silu(e), params["time_projection"],
                    jnp.float32).reshape(b, 6, cfg.dim)
        cdt = cfg.compute_dtype

        def embed_text(c):
            h = _dense(c.astype(cdt), params["text_embedding"]["fc1"],
                       cdt)
            h = jax.nn.gelu(h.astype(jnp.float32),
                            approximate=True).astype(cdt)
            return _dense(h, params["text_embedding"]["fc2"], cdt)

        return e, e0, embed_text

    vx = patchify(vid_lat.astype(jnp.float32), vcfg.patch_size)
    vx = _dense(vx, vid_params["patch_embedding"], jnp.float32)
    ax = _dense(audio_lat.astype(jnp.float32),
                aud_params["patch_embedding"], jnp.float32)

    ve, ve0, v_embed = prologue(vid_params, vcfg, vx)
    ae, ae0, a_embed = prologue(aud_params, acfg, ax)
    vctx = v_embed(vid_ctx)
    actx = a_embed(audio_ctx)

    def body(carry, xs):
        vx, ax = carry
        vbp, abp, vfp, afp = xs
        # audio self-attention (fusion.py:212-221)
        a_mod = ae0 + abp["modulation"].astype(jnp.float32)[None]
        y = layer_norm(ax, eps=acfg.eps)
        y = y * (1.0 + a_mod[:, None, 1]) + a_mod[:, None, 0]
        y = _self_attn(abp["self_attn"], y, acos, asin, acfg,
                       attn_backend)
        ax = ax + y.astype(jnp.float32) * a_mod[:, None, 2]
        # video self-attention (:229-241)
        v_mod = ve0 + vbp["modulation"].astype(jnp.float32)[None]
        y = layer_norm(vx, eps=vcfg.eps)
        y = y * (1.0 + v_mod[:, None, 1]) + v_mod[:, None, 0]
        y = _self_attn(vbp["self_attn"], y, vcos, vsin, vcfg,
                       attn_backend)
        vx = vx + y.astype(jnp.float32) * v_mod[:, None, 2]
        # audio cross+ffn fusing the UPDATED video (:246-258)
        ax = _cross_ffn(abp, afp, ax, a_mod, actx, vx, acos, asin,
                        vcos, vsin, acfg, attn_backend)
        # video cross+ffn fusing the UPDATED audio (:266-278)
        vx = _cross_ffn(vbp, vfp, vx, v_mod, vctx, ax, vcos, vsin,
                        acos, asin, vcfg, attn_backend)
        return (vx, ax), None

    (vx, ax), _ = jax.lax.scan(
        body, (vx, ax),
        (vid_params["blocks"], aud_params["blocks"], vid_fusion,
         aud_fusion))

    def head(params, cfg, x, e):
        hp = params["head"]
        mod = hp["modulation"].astype(jnp.float32)
        eh = e[:, None, :] + mod[None]
        xn = layer_norm(x.astype(jnp.float32), eps=cfg.eps)
        xn = xn * (1.0 + eh[:, None, 1]) + eh[:, None, 0]
        return _dense(xn, hp["head"], jnp.float32)

    grid = (vid_lat.shape[2] // vcfg.patch_size[0],
            vid_lat.shape[3] // vcfg.patch_size[1],
            vid_lat.shape[4] // vcfg.patch_size[2])
    v_out = unpatchify(head(vid_params, vcfg, vx, ve), grid,
                       vcfg.patch_size, vcfg.out_dim)
    a_out = head(aud_params, acfg, ax, ae)      # [B, T_a, 20]
    return v_out, a_out


# ---------------------------------------------------------------------------
# pipeline (ovi_fusion_engine.py generate:129-331)
# ---------------------------------------------------------------------------

class OviPipeline:
    """Joint audio+video generation.  Latent lengths: 121 frames ->
    31 video / 157 audio latents (ovi_fusion_engine.py:215-220)."""

    def __init__(self, vid_params, aud_params, vid_fusion, aud_fusion,
                 vcfg: WanDiTConfig, acfg: WanDiTConfig,
                 text_encode_fn=None, vae_decode_fn=None,
                 vae_encode_fn=None, audio_vae_decode_fn=None,
                 attn_backend: str = "auto"):
        self.vid_params = vid_params
        self.aud_params = aud_params
        self.vid_fusion = vid_fusion
        self.aud_fusion = aud_fusion
        self.vcfg = vcfg
        self.acfg = acfg
        self.text_encode_fn = text_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.vae_encode_fn = vae_encode_fn
        self.audio_vae_decode_fn = audio_vae_decode_fn
        self.attn_backend = attn_backend

    def generate(self, prompt: str, n_prompt: str = "",
                 audio_n_prompt: str = "", width: int = 1280,
                 height: int = 720, frame_num: int = 121,
                 steps: int = 50, shift: float = 5.0,
                 guide_scale: float = 5.0,
                 audio_guide_scale: float = 4.0, seed: int = 0,
                 image_start=None, return_latents: bool = False):
        from ...schedulers import (make_schedule, init_solver_state,
                                   solver_step)
        n_prompt = n_prompt or \
            "jitter, bad hands, blur, distortion"
        audio_n_prompt = audio_n_prompt or \
            "robotic, muffled, echo, distorted"
        lat_f = 31 if frame_num == 121 else 61
        lat_a = 157 if frame_num == 121 else 314
        lat_h, lat_w = height // 16, width // 16

        ctx_pos = self.text_encode_fn([prompt])
        ctx_neg = self.text_encode_fn([n_prompt])
        actx_neg = self.text_encode_fn([audio_n_prompt])

        k1, k2 = jax.random.split(jax.random.key(seed))
        vid = jax.random.normal(k1, (1, self.vcfg.out_dim, lat_f,
                                     lat_h, lat_w), jnp.float32)
        aud = jax.random.normal(k2, (1, lat_a, self.acfg.out_dim),
                                jnp.float32)
        img_lat = None
        if image_start is not None and self.vae_encode_fn is not None:
            pix = jnp.asarray(image_start, jnp.float32)[None, None]
            img_lat = self.vae_encode_fn(pix).transpose(0, 4, 1, 2, 3)

        pt, ph, pw = self.vcfg.patch_size
        vid_rope = build_rope_3d((lat_f // pt, lat_h // ph, lat_w // pw),
                                 head_dim=self.vcfg.head_dim)
        audio_rope = build_audio_rope(lat_a, self.acfg.head_dim)
        schedule = make_schedule("unipc", steps, shift)

        g, ga = guide_scale, audio_guide_scale
        use_cfg = not (g == 1.0 and ga == 1.0)
        nb = 2 if use_cfg else 1
        vctx = (jnp.concatenate([ctx_pos, ctx_neg], axis=0)
                if use_cfg else ctx_pos)
        actx = (jnp.concatenate([ctx_pos, actx_neg], axis=0)
                if use_cfg else ctx_pos)

        import functools

        def scan(vid_params, vid, aud):
            def body(carry, xs):
                v, a, sv, sa = carry
                t, coeffs_i, i = xs
                if img_lat is not None:
                    v = v.at[:, :, :1].set(img_lat.astype(v.dtype))
                vb = jnp.concatenate([v] * nb, axis=0)
                ab = jnp.concatenate([a] * nb, axis=0)
                tb = jnp.broadcast_to(t, (nb,))
                pv, pa = ovi_fusion_forward(
                    vid_params, self.aud_params, self.vid_fusion,
                    self.aud_fusion, self.vcfg, self.acfg, vb, ab, tb,
                    vctx, actx, vid_rope, audio_rope,
                    attn_backend=self.attn_backend)
                if use_cfg:
                    pv = pv[1:] + g * (pv[:1] - pv[1:])
                    pa = pa[1:] + ga * (pa[:1] - pa[1:])
                v, sv = solver_step(schedule, i, coeffs_i, pv, v, sv)
                a, sa = solver_step(schedule, i, coeffs_i, pa, a, sa)
                return (v, a, sv, sa), None

            carry0 = (vid.astype(jnp.float32), aud.astype(jnp.float32),
                      init_solver_state(schedule, vid),
                      init_solver_state(schedule, aud))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (v, a, _, _), _ = jax.lax.scan(body, carry0, xs)
            return v, a

        vid, aud = jax.jit(scan)(self.vid_params, vid, aud)
        if img_lat is not None:
            vid = vid.at[:, :, :1].set(img_lat.astype(vid.dtype))
        if return_latents:
            return vid, aud
        video = (self.vae_decode_fn(vid.transpose(0, 2, 3, 4, 1))[0]
                 if self.vae_decode_fn is not None else vid)
        audio = (np.asarray(self.audio_vae_decode_fn(aud))[0]
                 if self.audio_vae_decode_fn is not None
                 else np.asarray(aud[0]))
        return video, audio
