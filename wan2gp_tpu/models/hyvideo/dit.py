"""Hunyuan Video diffusion transformer (HV1 + HV1.5), TPU-native.

Functional re-implementation of the reference HYVideoDiffusionTransformer
(/root/reference/models/hyvideo/modules/models.py:510): MMDiT double-stream
blocks (img/txt with separate 6-way adaLN modulation, models.py:34) plus
single-stream blocks (flux-style fused linear1/linear2), 3D RoPE over the
video token grid applied to IMG tokens only (txt tokens un-roped,
models.py:231-255), a 2-block token refiner projecting LLM text states
(token_refiner.py:165 SingleTokenRefiner), CLIP pooled vector + optional
embedded guidance in the modulation vec.

Variants (models.py:1280 HUNYUAN_VIDEO_CONFIG):
  HYVideo-T/2[-cfgdistill]: 20 double + 40 single, hidden 3072, 24 heads
  HYVideo-1_5:              54 double + 0 single,  hidden 2048, 16 heads

Blocks are stacked and scanned (lax.scan) like the other families.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm
from ...ops.rope import apply_rope
from ..flux.dit import timestep_embedding  # same sinusoidal convention


@dataclasses.dataclass(frozen=True)
class HunyuanConfig:
    hidden_size: int = 3072
    heads_num: int = 24
    mm_double_blocks_depth: int = 20
    mm_single_blocks_depth: int = 40
    rope_dim_list: Sequence[int] = (16, 56, 56)
    mlp_ratio: float = 4.0
    patch_size: Sequence[int] = (1, 2, 2)
    in_channels: int = 16
    out_channels: int = 16
    text_states_dim: int = 4096
    text_states_dim_2: int = 768     # CLIP pooled ("vector_in")
    guidance_embed: bool = False
    text_pool: bool = True           # False for HV1.5 (text_pool_type None)
    refiner_depth: int = 2
    glyph_byt5: bool = False         # HV1.5 byT5 glyph branch (models.py:653)
    byt5_in_dim: int = 1472
    byt5_hidden: int = 2048
    cond_type_embed: bool = False    # models.py:823 use_cond_type_embedding
    meanflow: bool = False           # models.py:723-727 time_r_in
    custom: bool = False             # HunyuanCustom (models.py:1306)
    avatar: bool = False             # HunyuanAvatar (models.py:1335)
    audio_condition: bool = False    # audio adapters (models.py:779)
    video_condition: bool = False    # custom-edit bg branch (models.py:773)
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_size // self.heads_num

    @property
    def mlp_hidden(self):
        return int(self.hidden_size * self.mlp_ratio)


HUNYUAN_VIDEO_CONFIGS = {
    "hunyuan": dict(guidance_embed=True),                     # T/2-cfgdistill
    "hunyuan_i2v": dict(guidance_embed=True, in_channels=33),
    "hunyuan_custom": dict(custom=True),
    "hunyuan_custom_audio": dict(custom=True, audio_condition=True),
    "hunyuan_custom_edit": dict(custom=True, video_condition=True),
    "hunyuan_avatar": dict(avatar=True, audio_condition=True),
    "hunyuan_1_5_t2v": dict(hidden_size=2048, heads_num=16,
                            mm_double_blocks_depth=54,
                            mm_single_blocks_depth=0, text_pool=False,
                            in_channels=32, out_channels=32,
                            glyph_byt5=True, cond_type_embed=True),
    "hunyuan_1_5_i2v": dict(hidden_size=2048, heads_num=16,
                            mm_double_blocks_depth=54,
                            mm_single_blocks_depth=0, text_pool=False,
                            in_channels=65, out_channels=32,
                            glyph_byt5=True, cond_type_embed=True),
    # SR-distilled upsampler DiT (models.py HYVideo-1_5-upsampler:1364:
    # meanflow time_r; in = 32 noise + 32 img + 1 mask + 32 lq + 1 mask)
    "hunyuan_1_5_upsampler": dict(hidden_size=2048, heads_num=16,
                                  mm_double_blocks_depth=54,
                                  mm_single_blocks_depth=0,
                                  text_pool=False, in_channels=98,
                                  out_channels=32, glyph_byt5=True,
                                  cond_type_embed=True, meanflow=True),
}


def make_hunyuan_config(base_model_type: str, **overrides) -> HunyuanConfig:
    kw = dict(HUNYUAN_VIDEO_CONFIGS.get(base_model_type, {}))
    kw.update(overrides)
    return HunyuanConfig(**kw)


def build_hunyuan_rope(grid_fhw, rope_dim_list=(16, 56, 56),
                       txt_len: int = 0, theta: float = 10000.0,
                       ref_mode: str = None):
    """cos/sin [img_len + txt_len, head_dim/2]; txt rows are identity
    (cos=1, sin=0) — HV applies RoPE to img tokens only.

    ref_mode (HunyuanCustom/Avatar, posemb_layers.py:295-317
    get_nd_rotary_pos_embed_new): 'timecat' prepends one frame of
    reference tokens at t = -1; 'timecat-w' additionally offsets their
    w positions by +W (OminiControl-style)."""
    f, h, w = grid_fhw

    def angles(tf, th_, tw_):
        parts = []
        for dim, pos in zip(rope_dim_list, (tf, th_, tw_)):
            omega = 1.0 / (theta ** (np.arange(0, dim, 2,
                                               np.float64) / dim))
            parts.append(pos[..., None] * omega)
        ff, hh, ww = len(tf), len(th_), len(tw_)
        return np.concatenate([
            np.broadcast_to(parts[0][:, None, None, :],
                            (ff, hh, ww, parts[0].shape[-1])),
            np.broadcast_to(parts[1][None, :, None, :],
                            (ff, hh, ww, parts[1].shape[-1])),
            np.broadcast_to(parts[2][None, None, :, :],
                            (ff, hh, ww, parts[2].shape[-1])),
        ], axis=-1).reshape(ff * hh * ww, -1)

    ang = angles(np.arange(f, dtype=np.float64),
                 np.arange(h, dtype=np.float64),
                 np.arange(w, dtype=np.float64))
    if ref_mode in ("timecat", "timecat-w"):
        w_off = float(w) if ref_mode == "timecat-w" else 0.0
        ref_ang = angles(np.asarray([-1.0]),
                         np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64) + w_off)
        ang = np.concatenate([ref_ang, ang], axis=0)
    cos = np.concatenate([np.cos(ang), np.ones((txt_len, ang.shape[1]))])
    sin = np.concatenate([np.sin(ang), np.zeros((txt_len, ang.shape[1]))])
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear(key, d_in, d_out, dtype, bias=True):
    limit = math.sqrt(6.0 / (d_in + d_out))
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _mlp_embedder(key, d_in, d_h, dtype):
    k1, k2 = jax.random.split(key)
    return {"in": _linear(k1, d_in, d_h, dtype),
            "out": _linear(k2, d_h, d_h, dtype)}


def init_hunyuan(key, cfg: HunyuanConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 40))
    h = cfg.hidden_size
    hd = cfg.head_dim

    def stream(key):
        ks = iter(jax.random.split(key, 8))
        return {
            "mod": _linear(next(ks), h, 6 * h, dtype),
            "qkv": _linear(next(ks), h, 3 * h, dtype),
            "norm_q": jnp.ones((hd,), jnp.float32),
            "norm_k": jnp.ones((hd,), jnp.float32),
            "proj": _linear(next(ks), h, h, dtype),
            "mlp1": _linear(next(ks), h, cfg.mlp_hidden, dtype),
            "mlp2": _linear(next(ks), cfg.mlp_hidden, h, dtype),
        }

    def double_block(key):
        k1, k2 = jax.random.split(key)
        return {"img": stream(k1), "txt": stream(k2)}

    def single_block(key):
        ks = iter(jax.random.split(key, 4))
        return {
            "mod": _linear(next(ks), h, 3 * h, dtype),
            "linear1": _linear(next(ks), h, 3 * h + cfg.mlp_hidden, dtype),
            "linear2": _linear(next(ks), h + cfg.mlp_hidden, h, dtype),
            "norm_q": jnp.ones((hd,), jnp.float32),
            "norm_k": jnp.ones((hd,), jnp.float32),
        }

    def refiner_block(key):
        ks = iter(jax.random.split(key, 6))
        return {
            "norm1": {"w": jnp.ones((h,), jnp.float32),
                      "b": jnp.zeros((h,), jnp.float32)},
            "qkv": _linear(next(ks), h, 3 * h, dtype),
            "proj": _linear(next(ks), h, h, dtype),
            "norm2": {"w": jnp.ones((h,), jnp.float32),
                      "b": jnp.zeros((h,), jnp.float32)},
            "mlp1": _linear(next(ks), h, cfg.mlp_hidden, dtype),
            "mlp2": _linear(next(ks), cfg.mlp_hidden, h, dtype),
            "ada": _linear(next(ks), h, 2 * h, jnp.float32),
        }

    def stack(fn, n):
        if n == 0:
            return None
        ks = jax.random.split(next(keys), n)
        return jax.tree.map(lambda *xs: jnp.stack(xs),
                            *[fn(k) for k in ks])

    pt, ph, pw = cfg.patch_size
    params = {
        "img_in": _linear(next(keys),
                          cfg.in_channels * pt * ph * pw, h, jnp.float32),
        "time_in": _mlp_embedder(next(keys), 256, h, jnp.float32),
        "txt_refiner": {
            "input_embedder": _linear(next(keys), cfg.text_states_dim, h,
                                      dtype),
            "t_embedder": _mlp_embedder(next(keys), 256, h, jnp.float32),
            "c_embedder": _mlp_embedder(next(keys), cfg.text_states_dim, h,
                                        jnp.float32),
            "blocks": stack(refiner_block, cfg.refiner_depth),
        },
        "double_blocks": stack(double_block, cfg.mm_double_blocks_depth),
        "single_blocks": stack(single_block, cfg.mm_single_blocks_depth),
        "final": {
            "mod": _linear(next(keys), h, 2 * h, jnp.float32),
            "linear": _linear(next(keys), h,
                              cfg.out_channels * pt * ph * pw, jnp.float32),
        },
    }
    if cfg.meanflow:
        # meanflow second timestep r (models.py:723-727 time_r_in)
        params["time_r_in"] = _mlp_embedder(next(keys), 256, h,
                                            jnp.float32)
    if cfg.text_pool:
        params["vector_in"] = _mlp_embedder(next(keys),
                                            cfg.text_states_dim_2, h,
                                            jnp.float32)
    if cfg.guidance_embed:
        params["guidance_in"] = _mlp_embedder(next(keys), 256, h,
                                              jnp.float32)
    if cfg.glyph_byt5:
        params["byt5_in"] = {
            "ln_w": jnp.ones((cfg.byt5_in_dim,), jnp.float32),
            "ln_b": jnp.zeros((cfg.byt5_in_dim,), jnp.float32),
            "fc1": _linear(next(keys), cfg.byt5_in_dim, cfg.byt5_hidden,
                           jnp.float32),
            "fc2": _linear(next(keys), cfg.byt5_hidden, cfg.byt5_hidden,
                           jnp.float32),
            "fc3": _linear(next(keys), cfg.byt5_hidden, h, jnp.float32),
        }
    if cfg.cond_type_embed:
        params["cond_type_embedding"] = jnp.zeros((3, h), jnp.float32)
    if cfg.video_condition:
        # custom-edit background branch (models.py:773-777)
        params["bg_in"] = _linear(next(keys),
                                  2 * cfg.in_channels * pt * ph * pw, h,
                                  jnp.float32)
        params["bg_proj"] = _linear(next(keys), h, h, jnp.float32)
    if cfg.avatar:
        params["ref_in"] = _linear(next(keys),
                                   cfg.in_channels * pt * ph * pw, h,
                                   jnp.float32)
        params["before_proj"] = _linear(next(keys), h, h, jnp.float32)
        params["motion_exp"] = _mlp_embedder(next(keys), 256, h // 4,
                                             jnp.float32)
        params["motion_pose"] = _mlp_embedder(next(keys), 256, h // 4,
                                              jnp.float32)
        params["fps_proj"] = _mlp_embedder(next(keys), 256, h,
                                           jnp.float32)
    if cfg.audio_condition:
        from .custom import (init_audio_proj, stack_audio_adapters,
                             AUDIO_LAYERS_AVATAR, AUDIO_LAYERS_CUSTOM)
        params["audio_proj"] = init_audio_proj(next(keys),
                                               output_dim=h)
        params["audio_adapters"] = stack_audio_adapters(
            next(keys), cfg.mm_double_blocks_depth,
            AUDIO_LAYERS_AVATAR if cfg.avatar else AUDIO_LAYERS_CUSTOM,
            dim=h)
    return params


def _byt5_mapper(p, x):
    """ByT5Mapper, use_residual=False (text_encoder/byT5/__init__.py:
    207-249): LN -> fc1 -> gelu -> fc2 -> gelu -> fc3."""
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["ln_w"] + p["ln_b"]
    y = jax.nn.gelu(_dense(y, p["fc1"], jnp.float32), approximate=False)
    y = _dense(y, p["fc2"], jnp.float32)
    y = jax.nn.gelu(y, approximate=False)
    return _dense(y, p["fc3"], jnp.float32)


def reorder_glyph_tokens(byt5_txt, txt, byt5_mask, text_mask):
    """Static-shape version of reorder_txt_token (models.py:910-945,
    zero_feat=True): per batch row, valid byt5 tokens first, then valid
    text tokens, then zeroed padding; returns (tokens, merged mask)."""
    cat = jnp.concatenate([byt5_txt, txt], axis=1)
    m = jnp.concatenate([byt5_mask, text_mask], axis=1).astype(bool)
    is_text = jnp.concatenate(
        [jnp.zeros(byt5_txt.shape[:2], jnp.int32),
         jnp.ones(txt.shape[:2], jnp.int32)], axis=1)
    key = jnp.where(m, 0, 2) + is_text     # byt5 valid < text valid < pads
    order = jnp.argsort(key, axis=1, stable=True)
    cat = jnp.where(m[..., None], cat, 0.0)
    cat = jnp.take_along_axis(cat, order[..., None], axis=1)
    newm = jnp.take_along_axis(m, order, axis=1)
    return cat, newm.astype(jnp.int32)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dense(x, p, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p or "w_q4" in p:
        from ...ops.quant import dense_quant
        return dense_quant(x, p, dtype)
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def _embed(p, x):
    h = _dense(x, p["in"], jnp.float32)
    return _dense(jax.nn.silu(h), p["out"], jnp.float32)


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _refine_text(params, cfg, text_states, text_mask, t):
    """SingleTokenRefiner (token_refiner.py:165): c = t_emb + c_emb(masked
    mean of text states); 2 pre-norm blocks with adaLN output gates."""
    rp = params["txt_refiner"]
    cdt = cfg.compute_dtype
    mask = text_mask[..., None].astype(jnp.float32)
    pooled = (text_states * mask).sum(1) / jnp.maximum(mask.sum(1), 1.0)
    c = _embed(rp["t_embedder"], timestep_embedding(t, 256, time_factor=1.0))
    c = c + _embed(rp["c_embedder"], pooled.astype(jnp.float32))
    x = _dense(text_states.astype(cdt), rp["input_embedder"], cdt)
    x = x.astype(jnp.float32)
    bias = jnp.where(text_mask[:, None, None, :] > 0, 0.0,
                     jnp.finfo(jnp.float32).min)
    n, hd = cfg.heads_num, cfg.head_dim

    def body(x, bp):
        gates = _dense(jax.nn.silu(c), bp["ada"], jnp.float32)
        gate_msa, gate_mlp = jnp.split(gates[:, None, :], 2, axis=-1)
        y = layer_norm(x, bp["norm1"]["w"], bp["norm1"]["b"])
        qkv = _dense(y.astype(cdt), bp["qkv"], cdt)
        q, k, v = (_heads(u, n) for u in jnp.split(qkv, 3, axis=-1))
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(hd)
        p_attn = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", p_attn, v).reshape(*x.shape[:2], -1)
        x = x + (_dense(o, bp["proj"], cdt) * gate_msa).astype(jnp.float32)
        y = layer_norm(x, bp["norm2"]["w"], bp["norm2"]["b"]).astype(cdt)
        y = _dense(y, bp["mlp1"], cdt)
        y = jax.nn.silu(y.astype(jnp.float32)).astype(cdt)
        y = _dense(y, bp["mlp2"], cdt)
        x = x + (y * gate_mlp).astype(jnp.float32)
        return x, None

    x, _ = jax.lax.scan(body, x, rp["blocks"])
    return x


def _mod6(p, vec):
    m = _dense(jax.nn.silu(vec.astype(jnp.float32)), p["mod"], jnp.float32)
    return jnp.split(m[:, None, :], 6, axis=-1)


def _stream_qkv(p, x, cfg):
    cdt = cfg.compute_dtype
    if "qkv" in p:
        qkv = _dense(x.astype(cdt), p["qkv"], cdt)
        q, k, v = (_heads(u, cfg.heads_num)
                   for u in jnp.split(qkv, 3, axis=-1))
    else:
        # unfused tensor-parallel layout (parallel/sharding.py
        # unfuse_fused_linears): per-head column splits align with 'tp'
        xc = x.astype(cdt)
        q = _heads(_dense(xc, p["q"], cdt), cfg.heads_num)
        k = _heads(_dense(xc, p["k"], cdt), cfg.heads_num)
        v = _heads(_dense(xc, p["v"], cdt), cfg.heads_num)
    q = rms_norm(q, p["norm_q"], 1e-6)
    k = rms_norm(k, p["norm_k"], 1e-6)
    return q, k, v


def _mlp(p, y, cfg):
    cdt = cfg.compute_dtype
    h = _dense(y.astype(cdt), p["mlp1"], cdt)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
    return _dense(h, p["mlp2"], cdt)


def _double_block(bp, img, txt, vec, cos, sin, img_len, cfg, attn_backend):
    cdt = cfg.compute_dtype
    i_s1, i_sc1, i_g1, i_s2, i_sc2, i_g2 = _mod6(bp["img"], vec)
    t_s1, t_sc1, t_g1, t_s2, t_sc2, t_g2 = _mod6(bp["txt"], vec)

    img_mod = layer_norm(img) * (1 + i_sc1) + i_s1
    txt_mod = layer_norm(txt) * (1 + t_sc1) + t_s1
    iq, ik, iv = _stream_qkv(bp["img"], img_mod, cfg)
    tq, tk, tv = _stream_qkv(bp["txt"], txt_mod, cfg)

    # img FIRST, rope on img only (identity rows cover txt)
    q = jnp.concatenate([iq, tq], axis=1)
    k = jnp.concatenate([ik, tk], axis=1)
    v = jnp.concatenate([iv, tv], axis=1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, backend=attn_backend)
    attn = attn.reshape(*attn.shape[:2], cfg.hidden_size)
    img_attn, txt_attn = attn[:, :img_len], attn[:, img_len:]

    img = img + i_g1 * _dense(img_attn, bp["img"]["proj"], cdt
                              ).astype(jnp.float32)
    y = layer_norm(img) * (1 + i_sc2) + i_s2
    img = img + i_g2 * _mlp(bp["img"], y, cfg).astype(jnp.float32)

    txt = txt + t_g1 * _dense(txt_attn, bp["txt"]["proj"], cdt
                              ).astype(jnp.float32)
    y = layer_norm(txt) * (1 + t_sc2) + t_s2
    txt = txt + t_g2 * _mlp(bp["txt"], y, cfg).astype(jnp.float32)
    return img, txt


def _single_block(bp, x, vec, cos, sin, cfg, attn_backend):
    cdt = cfg.compute_dtype
    m = _dense(jax.nn.silu(vec.astype(jnp.float32)), bp["mod"], jnp.float32)
    shift, scale, gate = jnp.split(m[:, None, :], 3, axis=-1)
    x_mod = layer_norm(x) * (1 + scale) + shift
    xc = x_mod.astype(cdt)
    if "linear1" in bp:
        h1 = _dense(xc, bp["linear1"], cdt)
        qkv = h1[..., :3 * cfg.hidden_size]
        mlp = h1[..., 3 * cfg.hidden_size:]
        q, k, v = (_heads(u, cfg.heads_num)
                   for u in jnp.split(qkv, 3, axis=-1))
    else:
        # unfused tensor-parallel layout (unfuse_fused_linears)
        q = _heads(_dense(xc, bp["l1_q"], cdt), cfg.heads_num)
        k = _heads(_dense(xc, bp["l1_k"], cdt), cfg.heads_num)
        v = _heads(_dense(xc, bp["l1_v"], cdt), cfg.heads_num)
        mlp = _dense(xc, bp["l1_mlp"], cdt)
    q = rms_norm(q, bp["norm_q"], 1e-6)
    k = rms_norm(k, bp["norm_k"], 1e-6)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, backend=attn_backend)
    attn = attn.reshape(*x.shape[:2], cfg.hidden_size)
    act = jax.nn.gelu(mlp.astype(jnp.float32), approximate=True).astype(cdt)
    if "linear1" in bp:
        out = _dense(jnp.concatenate([attn, act], axis=-1),
                     bp["linear2"], cdt)
    else:
        # summed row-parallel halves (bias lives on l2_attn)
        out = (_dense(attn, bp["l2_attn"], cdt).astype(jnp.float32)
               + _dense(act, bp["l2_mlp"], cdt).astype(jnp.float32)
               ).astype(cdt)
    return x + gate * out.astype(jnp.float32)


def hunyuan_forward(params, cfg: HunyuanConfig, latents, t, text_states,
                    text_mask, text_pooled=None, guidance=None,
                    rope_cos=None, rope_sin=None, attn_backend="auto",
                    byt5_states=None, byt5_mask=None, t_r=None,
                    ref_latents=None, bg_latents=None,
                    audio_prompts=None, face_mask=None,
                    motion_exp=None, motion_pose=None, fps=None,
                    audio_strength: float = 1.0):
    """latents: [B, C, F, H, W]; t: [B] in 0..1000 (reference feeds t
    directly to sinusoidal embedding); text_states: [B, L, 4096];
    text_pooled: [B, 768] CLIP pooled (HV1); guidance: [B] cfg_scale*1000;
    byt5_states/byt5_mask: [B, Lb, byt5_in_dim] glyph features (HV1.5
    byT5 branch, models.py:1056-1061) merged valid-first with the refined
    text.  Returns velocity [B, C_out, F, H, W] fp32."""
    from ..wan.dit import patchify
    b = latents.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (latents.shape[2] // pt, latents.shape[3] // ph,
            latents.shape[4] // pw)
    img = patchify(latents.astype(jnp.float32), cfg.patch_size)
    img = _dense(img, params["img_in"], jnp.float32)
    ref_len = 0
    if cfg.avatar and ref_latents is not None:
        # HunyuanAvatar identity (models.py:1032-1076): ref_in over the
        # full ref latents ADDS via before_proj; the first ref frame
        # (through img_in) PREPENDS.
        ref_tok = patchify(ref_latents.astype(jnp.float32),
                           cfg.patch_size)
        ref_tok = _dense(ref_tok, params["ref_in"], jnp.float32)
        img = img + _dense(ref_tok, params["before_proj"], jnp.float32)
        rf = patchify(ref_latents[:, :, :1].astype(jnp.float32),
                      cfg.patch_size)
        rf = _dense(rf, params["img_in"], jnp.float32)
        ref_len = rf.shape[1]
        img = jnp.concatenate([rf, img], axis=1)
    elif cfg.custom:
        if ref_latents is not None:
            rf = patchify(ref_latents.astype(jnp.float32),
                          cfg.patch_size)
            rf = _dense(rf, params["img_in"], jnp.float32)
            ref_len = rf.shape[1]
        if bg_latents is not None and cfg.video_condition:
            bg = patchify(bg_latents.astype(jnp.float32),
                          cfg.patch_size)
            bg = _dense(bg, params["bg_in"], jnp.float32)
            img = img + _dense(bg, params["bg_proj"], jnp.float32)
        if ref_latents is not None:
            img = jnp.concatenate([rf, img], axis=1)
    img_len = img.shape[1]
    txt_len = text_states.shape[1]
    if byt5_states is not None and params.get("byt5_in") is not None:
        txt_len = txt_len + byt5_states.shape[1]
    if rope_cos is None:
        rope_cos, rope_sin = build_hunyuan_rope(
            grid, cfg.rope_dim_list, txt_len,
            ref_mode=(None if ref_len == 0 else
                      ("timecat" if cfg.avatar else "timecat-w")))

    vec = _embed(params["time_in"], timestep_embedding(t, 256,
                                                       time_factor=1.0))
    if cfg.avatar:
        # motion/fps embedders (models.py:986-991): 4 values each map
        # to hidden/4 chunks concatenated back to hidden
        if motion_exp is not None:
            me = _embed(params["motion_exp"], timestep_embedding(
                motion_exp.reshape(-1), 256, time_factor=1.0))
            vec = vec + me.reshape(b, -1)
        if motion_pose is not None:
            mp = _embed(params["motion_pose"], timestep_embedding(
                motion_pose.reshape(-1), 256, time_factor=1.0))
            vec = vec + mp.reshape(b, -1)
        if fps is not None:
            vec = vec + _embed(params["fps_proj"], timestep_embedding(
                fps, 256, time_factor=1.0))
    if cfg.meanflow and t_r is not None and "time_r_in" in params:
        vec = vec + _embed(params["time_r_in"],
                           timestep_embedding(t_r, 256, time_factor=1.0))
    if cfg.text_pool and text_pooled is not None:
        vec = vec + _embed(params["vector_in"],
                           text_pooled.astype(jnp.float32))
    if cfg.guidance_embed and guidance is not None:
        vec = vec + _embed(params["guidance_in"],
                           timestep_embedding(guidance, 256,
                                              time_factor=1.0))

    txt = _refine_text(params, cfg, text_states, text_mask, t)
    cte = params.get("cond_type_embedding")
    if cte is not None:
        txt = txt + cte[0].astype(txt.dtype)            # models.py:1052
    if byt5_states is not None and params.get("byt5_in") is not None:
        bt = _byt5_mapper(params["byt5_in"],
                          byt5_states).astype(txt.dtype)
        if cte is not None:
            bt = bt + cte[1].astype(bt.dtype)           # models.py:1059
        txt, text_mask = reorder_glyph_tokens(bt, txt, byt5_mask,
                                              text_mask)

    use_audio = (audio_prompts is not None
                 and params.get("audio_adapters") is not None)
    if use_audio:
        # per-frame audio context tokens (models.py:992-995): project,
        # repeat the first frame 3x, fold 4 pixel frames per latent
        from .custom import audio_proj_forward, perceiver_ca
        af = audio_proj_forward(params["audio_proj"], audio_prompts)
        af = jnp.concatenate([jnp.repeat(af[:, :1], 3, axis=1), af],
                             axis=1)
        ot = grid[0]
        audio_tok = af[:, :4 * ot].reshape(b, ot, -1, af.shape[-1])
        face_w = (face_mask if face_mask is not None else 1.0)

        def dbody(carry, xs):
            img, txt = carry
            bp, ap = xs
            img, txt = _double_block(bp, img, txt, vec, rope_cos,
                                     rope_sin, img_len, cfg,
                                     attn_backend)
            real = img[:, ref_len:].reshape(b, ot, -1, img.shape[-1])
            delta = perceiver_ca(ap, audio_tok, real)
            delta = delta.reshape(b, -1, img.shape[-1]) * face_w \
                * audio_strength * ap["active"][0, 0, 0]
            img = img.at[:, ref_len:].add(delta.astype(img.dtype))
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(
            dbody, (img, txt),
            (params["double_blocks"], params["audio_adapters"]))
    else:
        def dbody(carry, bp):
            img, txt = carry
            img, txt = _double_block(bp, img, txt, vec, rope_cos,
                                     rope_sin, img_len, cfg,
                                     attn_backend)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(dbody, (img, txt),
                                     params["double_blocks"])

    if params.get("single_blocks") is not None:
        x = jnp.concatenate([img, txt], axis=1)

        def sbody(x, bp):
            return _single_block(bp, x, vec, rope_cos, rope_sin, cfg,
                                 attn_backend), None

        x, _ = jax.lax.scan(sbody, x, params["single_blocks"])
        img = x[:, :img_len]

    if ref_len:
        img = img[:, ref_len:]       # drop ref tokens (models.py:1219)
    fm = _dense(jax.nn.silu(vec), params["final"]["mod"], jnp.float32)
    shift, scale = jnp.split(fm[:, None, :], 2, axis=-1)
    img = layer_norm(img) * (1 + scale) + shift
    out = _dense(img, params["final"]["linear"], jnp.float32)
    return unpatchify_cmajor(out, grid, cfg.patch_size, cfg.out_channels)


def unpatchify_cmajor(x, grid, patch, c):
    """HV head feature order (c, pt, ph, pw) (models.py:1244
    'nthwcopq->nctohpwq') — unlike Wan's (pt, ph, pw, c)."""
    b = x.shape[0]
    t, h, w = grid
    pt, ph, pw = patch
    x = x.reshape(b, t, h, w, c, pt, ph, pw)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, c, t * pt, h * ph, w * pw)
