"""HiDream-O1 pixel-space DiT on a Qwen3-VL-8B backbone, TPU-native.

Functional re-implementation of the reference extensions in
/root/reference/models/hidream/qwen3_vl_transformers.py: the language
model itself denoises 32x32 PIXEL patches appended to the prompt —
there is no VAE and no separate text encoder.
- BottleneckPatchEmbed (:1214-1226): 3*32*32 -> hidden/4 -> hidden;
- TimestepEmbedder (:1251-1287): sinusoid(t * 1000, 256) -> mlp, written
  into the <tms> token slot (:~1480 t_emb masked_scatter);
- mixed attention (:98-200): the text prefix (token_types 0) is causal,
  the generation suffix (<tms> + image tokens) attends bidirectionally
  over the WHOLE sequence;
- interleaved MRoPE [24, 20, 20] with split-half rotation (:372-440) —
  the same convention as models/ideogram4 (ideogram_rope_tables);
- x-prediction head FinalLayer (:1228-1241): hidden -> 3*32*32, output
  rows are the image tokens only.

The Qwen3-VL-8B decoder weights/params reuse the shared Qwen LM stack
(models/qwen/text_encoder.py param layout), so load_qwen_lm_params
loads the backbone unchanged.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..qwen.text_encoder import QwenLMConfig, _rms, _dense
from ..ideogram4.dit import _apply_half_rope
from ...ops.attention import attention


# Qwen/Qwen3-VL-8B-Instruct text tower (same dict as families/ideogram4)
QWEN3_VL_8B = dict(vocab_size=151936, dim=4096, n_layers=36, n_heads=32,
                   n_kv_heads=8, head_dim=128, ffn_dim=12288,
                   rope_theta=5_000_000.0, qkv_bias=False, qk_norm=True)


@dataclasses.dataclass(frozen=True)
class HiDreamConfig:
    patch_size: int = 32
    in_channels: int = 3
    freq_dim: int = 256
    mrope_section: Tuple[int, int, int] = (24, 20, 20)
    tms_token_id: int = 151673
    image_position_offset: int = 4096   # utils.py fix_point
    noise_scale: float = 8.0            # pipeline.py NOISE_SCALE

    @property
    def patch_dim(self):
        return self.in_channels * self.patch_size * self.patch_size


def hidream_rope_tables(lm_cfg: QwenLMConfig, hcfg: HiDreamConfig,
                        text_len: int, grid_h: int, grid_w: int):
    """cos/sin [1, T+Ni, head_dim//2]: text positions arange(T) on all
    three axes; image tokens (0, h, w) + 4096 (utils.py
    get_rope_index_fix_point with skip_vision_start_token=[1])."""
    hw = np.stack(np.meshgrid(np.arange(grid_h), np.arange(grid_w),
                              indexing="ij"), -1).reshape(-1, 2)
    img = np.concatenate([np.zeros((grid_h * grid_w, 1), np.int64), hw], 1) \
        + hcfg.image_position_offset
    tp = np.arange(text_len)[:, None].repeat(3, 1)
    pos = np.concatenate([tp, img], 0).astype(np.float64)   # [L, 3]

    half = lm_cfg.head_dim // 2
    inv = 1.0 / (lm_cfg.rope_theta **
                 (np.arange(0, lm_cfg.head_dim, 2, dtype=np.float64) /
                  lm_cfg.head_dim))
    freqs = pos[:, None, :] * inv[None, :, None]            # [L, half, 3]
    axis_of = np.zeros((half,), np.int64)
    for axis in (1, 2):
        idx = np.arange(axis, hcfg.mrope_section[axis] * 3, 3)
        axis_of[idx] = axis
    ft = np.take_along_axis(freqs, axis_of[None, :, None], axis=-1)[..., 0]
    return (jnp.asarray(np.cos(ft), jnp.float32)[None],
            jnp.asarray(np.sin(ft), jnp.float32)[None])


def _mrope_tables_from_pos(lm_cfg: QwenLMConfig, hcfg: HiDreamConfig,
                           pos: np.ndarray):
    """pos [L, 3] -> interleaved-MRoPE cos/sin [1, L, head_dim//2]."""
    half = lm_cfg.head_dim // 2
    inv = 1.0 / (lm_cfg.rope_theta **
                 (np.arange(0, lm_cfg.head_dim, 2, dtype=np.float64) /
                  lm_cfg.head_dim))
    freqs = pos.astype(np.float64)[:, None, :] * inv[None, :, None]
    axis_of = np.zeros((half,), np.int64)
    for axis in (1, 2):
        idx = np.arange(axis, hcfg.mrope_section[axis] * 3, 3)
        axis_of[idx] = axis
    ft = np.take_along_axis(freqs, axis_of[None, :, None], axis=-1)[..., 0]
    return (jnp.asarray(np.cos(ft), jnp.float32)[None],
            jnp.asarray(np.sin(ft), jnp.float32)[None])


def hidream_edit_rope_tables(lm_cfg: QwenLMConfig, hcfg: HiDreamConfig,
                             segments):
    """Edit-mode position ids (utils.py:77-183
    get_rope_index_fix_point with skip_vision_start_token =
    [0]*K_cond + [1] + [1]*K_ref, fix_point 4096).

    segments: ordered list of ("text", n) | ("vlm", gh, gw) |
    ("fix", gh, gw).  "vlm" grids flow with the text cursor (their
    preceding <vision_start> counts as text); "fix" grids (target +
    refs) sit at absolute offsets starting at 4096."""
    rows = []
    p = 0                       # text cursor / st_idx
    fix_point = hcfg.image_position_offset
    for seg in segments:
        if seg[0] == "text":
            n = seg[1]
            tp = (np.arange(n) + p)[:, None].repeat(3, 1)
            rows.append(tp)
            p += n
        else:
            gh, gw = seg[1], seg[2]
            hw = np.stack(np.meshgrid(np.arange(gh), np.arange(gw),
                                      indexing="ij"), -1).reshape(-1, 2)
            grid = np.concatenate(
                [np.zeros((gh * gw, 1), np.int64), hw], 1)
            if seg[0] == "vlm":
                grid = grid + p
            else:                      # "fix": absolute placement
                if fix_point > 0:
                    offset = fix_point
                    fix_point = 0
                else:
                    offset = p
                grid = grid + offset
            rows.append(grid)
            p = int(grid.max()) + 1
    pos = np.concatenate(rows, 0)
    return _mrope_tables_from_pos(lm_cfg, hcfg, pos)


def _timestep_embed(p, t, freq_dim: int, dtype):
    """t in [0, 1]; sinusoid of t*1000, cos-first (:1266-1283)."""
    half = freq_dim // 2
    freqs = jnp.exp(-math.log(10000.0) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = (t.astype(jnp.float32) * 1000.0)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], -1).astype(dtype)
    emb = jax.nn.silu(_dense(emb, p["mlp0"]))
    return _dense(emb, p["mlp2"])


def _mixed_attention(q, k, v, ar_len: int, backend: str):
    """Prefix causal + generation-suffix full attention
    (qwen3_vl_transformers.py _pay_attention_token_types)."""
    b, l, n, hd = q.shape
    if ar_len <= 0:
        return attention(q, k, v, backend=backend)
    qa, ka, va = q[:, :ar_len], k[:, :ar_len], v[:, :ar_len]
    s = jnp.einsum("blnd,bsnd->bnls", qa, ka,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    causal = jnp.tril(jnp.ones((ar_len, ar_len), bool))
    s = jnp.where(causal[None, None], s, jnp.finfo(jnp.float32).min)
    out_ar = jnp.einsum("bnls,bsnd->blnd",
                        jax.nn.softmax(s, axis=-1).astype(q.dtype), va)
    out_gen = attention(q[:, ar_len:], k, v, backend=backend)
    return jnp.concatenate([out_ar, out_gen], axis=1)


def hidream_forward(params, lm_cfg: QwenLMConfig, hcfg: HiDreamConfig,
                    text_ids, vinputs, t, cos, sin, ar_len: int,
                    ref_patches=None, attn_backend: str = "auto"):
    """text_ids: [1, T] (prompt template + <boi> + <tms>); vinputs:
    [B, Ni, patch_dim] noisy pixel patches; t: [B] in [0, 1]; cos/sin:
    [1, T+Ni(+Nref), hd//2]; ar_len: causal text prefix length (T - 1).
    ref_patches: optional [1, Nref, patch_dim] clean reference patches
    appended after the target image tokens (edit mode).
    Returns x_pred [B, Ni, patch_dim] fp32 (x-prediction, not velocity)."""
    cdt = lm_cfg.compute_dtype
    lm = params["lm"]
    bsz = vinputs.shape[0]
    ni = vinputs.shape[1]

    emb = lm["embed_tokens"][text_ids[0]].astype(cdt)[None]   # [1, T, D]
    emb = jnp.broadcast_to(emb, (bsz,) + emb.shape[1:])
    t_emb = _timestep_embed(params["t_embedder"], t, hcfg.freq_dim, cdt)
    tms = (text_ids[0] == hcfg.tms_token_id)[None, :, None]
    emb = jnp.where(tms, t_emb[:, None], emb)

    vin = vinputs.astype(cdt)
    if ref_patches is not None:
        ref = jnp.broadcast_to(ref_patches.astype(cdt),
                               (bsz,) + ref_patches.shape[1:])
        vin = jnp.concatenate([vin, ref], axis=1)
    vemb = _dense(jnp.dot(vin, params["x_embedder"]["proj1"]["w"]
                          .astype(cdt)), params["x_embedder"]["proj2"])
    x = jnp.concatenate([emb, vemb], axis=1)

    b, l, _ = x.shape
    n, nkv, hd = lm_cfg.n_heads, lm_cfg.n_kv_heads, lm_cfg.head_dim

    def body(x, lp):
        y = _rms(x, lp["input_norm"], lm_cfg.norm_eps)
        q = _dense(y, lp["q"]).reshape(b, l, n, hd)
        k = _dense(y, lp["k"]).reshape(b, l, nkv, hd)
        v = _dense(y, lp["v"]).reshape(b, l, nkv, hd)
        if lm_cfg.qk_norm:
            q = _rms(q, lp["q_norm"], lm_cfg.norm_eps)
            k = _rms(k, lp["k_norm"], lm_cfg.norm_eps)
        q = _apply_half_rope(q, cos, sin)
        k = _apply_half_rope(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        o = _mixed_attention(q, k, v, ar_len, attn_backend)
        x = x + _dense(o.reshape(b, l, n * hd), lp["o"])
        y = _rms(x, lp["post_norm"], lm_cfg.norm_eps)
        h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                        ).astype(cdt) * _dense(y, lp["up"])
        x = x + _dense(h, lp["down"])
        return x, None

    x, _ = jax.lax.scan(body, x, lm["layers"])
    x = _rms(x, lm["norm"], lm_cfg.norm_eps)
    # prediction rows = target image tokens (first Ni vision rows)
    txt = text_ids.shape[1]
    h_img = x[:, txt:txt + ni]
    out = _dense(h_img.astype(jnp.float32),
                 {"w": params["final"]["w"].astype(jnp.float32),
                  "b": params["final"]["b"].astype(jnp.float32)})
    return out


def hidream_forward_edit(params, lm_cfg: QwenLMConfig,
                         hcfg: HiDreamConfig, prefix_emb, vinputs, t,
                         cos, sin, ref_patches=None,
                         attn_backend: str = "auto"):
    """Edit-mode forward: prefix_emb [1, Lp, D] is the prebuilt
    conditioning stream (chat text + vision-tower embeds for the VLM
    reference views + <boi> + <tms>); the <tms> slot (last row) is
    replaced by the timestep embedding.  vinputs [B, Ni, patch_dim]
    noisy target patches; ref_patches [1, Nr, patch_dim] clean
    reference patches appended after the target (token_types 2,
    pipeline.py:287-300).  Returns x_pred over the target rows."""
    cdt = lm_cfg.compute_dtype
    lm = params["lm"]
    bsz, ni = vinputs.shape[0], vinputs.shape[1]
    lp = prefix_emb.shape[1]

    emb = jnp.broadcast_to(prefix_emb.astype(cdt),
                           (bsz,) + prefix_emb.shape[1:])
    t_emb = _timestep_embed(params["t_embedder"], t, hcfg.freq_dim, cdt)
    tms = (jnp.arange(lp) == lp - 1)[None, :, None]
    emb = jnp.where(tms, t_emb[:, None], emb)

    vin = vinputs.astype(cdt)
    if ref_patches is not None:
        ref = jnp.broadcast_to(ref_patches.astype(cdt),
                               (bsz,) + ref_patches.shape[1:])
        vin = jnp.concatenate([vin, ref], axis=1)
    vemb = _dense(jnp.dot(vin, params["x_embedder"]["proj1"]["w"]
                          .astype(cdt)), params["x_embedder"]["proj2"])
    x = jnp.concatenate([emb, vemb], axis=1)

    b, l, _ = x.shape
    n, nkv, hd = lm_cfg.n_heads, lm_cfg.n_kv_heads, lm_cfg.head_dim

    def body(x, blk):
        y = _rms(x, blk["input_norm"], lm_cfg.norm_eps)
        q = _dense(y, blk["q"]).reshape(b, l, n, hd)
        k = _dense(y, blk["k"]).reshape(b, l, nkv, hd)
        v = _dense(y, blk["v"]).reshape(b, l, nkv, hd)
        if lm_cfg.qk_norm:
            q = _rms(q, blk["q_norm"], lm_cfg.norm_eps)
            k = _rms(k, blk["k_norm"], lm_cfg.norm_eps)
        q = _apply_half_rope(q, cos, sin)
        k = _apply_half_rope(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        o = _mixed_attention(q, k, v, lp - 1, attn_backend)
        x = x + _dense(o.reshape(b, l, n * hd), blk["o"])
        y = _rms(x, blk["post_norm"], lm_cfg.norm_eps)
        h = jax.nn.silu(_dense(y, blk["gate"]).astype(jnp.float32)
                        ).astype(cdt) * _dense(y, blk["up"])
        x = x + _dense(h, blk["down"])
        return x, None

    x, _ = jax.lax.scan(body, x, lm["layers"])
    x = _rms(x, lm["norm"], lm_cfg.norm_eps)
    h_img = x[:, lp:lp + ni]
    return _dense(h_img.astype(jnp.float32),
                  {"w": params["final"]["w"].astype(jnp.float32),
                   "b": params["final"]["b"].astype(jnp.float32)})


def init_hidream_extras(key, lm_cfg: QwenLMConfig, hcfg: HiDreamConfig,
                        dtype=None) -> Dict[str, Any]:
    """Random extras (the LM comes from init_qwen_lm)."""
    dtype = dtype or lm_cfg.compute_dtype
    d = lm_cfg.dim
    pca = d // 4
    pd = hcfg.patch_dim
    keys = iter(jax.random.split(key, 8))

    def lin(key, din, dout):
        s = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                        -s, s).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    return {"t_embedder": {"mlp0": lin(next(keys), hcfg.freq_dim, d),
                           "mlp2": lin(next(keys), d, d)},
            "x_embedder": {"proj1": {"w": jax.random.normal(
                               next(keys), (pd, pca)).astype(dtype) * 0.02},
                           "proj2": lin(next(keys), pca, d)},
            "final": lin(next(keys), d, pd)}
