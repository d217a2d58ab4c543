"""MiniMax H3 joint audio-video DiT, TPU-native (base T2VA path).

Functional re-implementation of the reference MiniMaxH3Model
(/root/reference/models/minimax_h3/transformer.py): one packed sequence of
[text, audio (2 stereo rows per latent), video] tokens runs through 50
blocks; every block modulates each (timestep, modality) segment with its
own adaLN row (AdalnProj modalities=3, :247-262; segment table built from
timestep-index*3 + token tag, :604-609), attention uses fused qkv + per-
head RMS-norm + a PARTIAL half-style rope over the first 2*48 dims
(:163-207, freqs = 3 position axes x 16 inv-freqs, packing.py grids), and
the final layer splits into separate fp32 video/audio heads (:330-374).

Dual sigmas: video and audio denoise on different shifted schedules; the
model receives timestep = 1 - sigma per modality (pipeline.py:502-534).
Reference conditioning (refs/keyframes) is a later round; the packed
layout here is the base [text, audio, video] case (packing.py:143-201).

Position ids (packing.py): text t = arange(L_txt); target t-grid advances
by 5/3 * time_scale * frames-per-token pattern (1,4,4,4,4) (:85-97);
spatial grid = sqrt-area-normalized linspace * 32 (:79-82,110-115); audio
rows share the video time origin with x = width_grid[0]/[-1] per stereo
channel (:118-125).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention

_FRAME_PER_TOKEN = (1, 4, 4, 4, 4)
_FRAME_RESCALE = 5.0 / 3.0
_INTERP = 32
AUDIO_CHANNELS = 2
VIDEO_TAG, TEXT_TAG, AUDIO_TAG = 0, 1, 2


@dataclasses.dataclass(frozen=True)
class MiniMaxH3Config:
    hidden_size: int = 5376
    num_layers: int = 50
    token_refiner_num_layers: int = 2
    num_heads: int = 56
    head_dim: int = 128
    ffn_hidden_size: int = 14336
    latents_dim: int = 24
    audio_latents_dim: int = 32
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 5120
    timestep_input_dim: int = 256
    time_embed_hidden_size: int = 5376
    time_embed_dim: int = 2688
    rope_inv_freq_len: int = 16
    rope_theta: float = 10000.0
    norm_eps: float = 1e-5
    sigma_shift_video: float = 12.0
    sigma_shift_audio: float = 3.0
    compute_dtype: Any = jnp.bfloat16

    @property
    def video_dim(self):
        return self.latents_dim * int(np.prod(self.patch_size))


# ---------------------------------------------------------------------------
# packing (host-static)
# ---------------------------------------------------------------------------

def _axis_from_sqrt_area(dim, patch, sqrt_area):
    ratio = dim / sqrt_area
    left = (1.0 - ratio) / 2.0
    return np.linspace(left, left + ratio, dim // patch,
                       endpoint=False) * _INTERP


def _video_t_grid(length, origin, time_scale=1.0):
    spans = np.array([_FRAME_RESCALE * time_scale
                      * _FRAME_PER_TOKEN[i % len(_FRAME_PER_TOKEN)]
                      for i in range(length)])
    return origin + np.concatenate([[0.0], np.cumsum(spans[:-1])])


def build_layout(text_len: int, latent_t: int, latent_h: int, latent_w: int,
                 audio_t: int, cfg: MiniMaxH3Config, fps: float = 24.0,
                 ref_grids=()):
    """Packed layout: positions [L, 3], per-row tags, and the
    (start, stop) spans of the text/(refs)/audio/video regions.

    ref_grids: Ref2VA image-reference latent grids [(h_lat, w_lat), ...] —
    each gets one integer time slot after the text origin with its own
    sqrt-area-normalized frame grid (packing.py
    build_ref2va_packed_sequence:230-238)."""
    _, ph, pw = cfg.patch_size
    rows_per_frame = (latent_h // ph) * (latent_w // pw)
    video_rows = latent_t * rows_per_frame
    audio_rows = audio_t * AUDIO_CHANNELS
    ref_row_counts = [(rh // ph) * (rw // pw) for rh, rw in ref_grids]
    ref_rows = sum(ref_row_counts)
    seq = text_len + ref_rows + audio_rows + video_rows

    pos = np.zeros((seq, 3), np.float64)
    pos[:text_len, 0] = np.arange(text_len)
    time_scale = 24.0 / fps
    time_cursor = float(text_len)

    r0 = text_len
    cursor = r0
    for (rh, rw), n_rows in zip(ref_grids, ref_row_counts):
        sa = math.sqrt(rh * rw)
        rhg = _axis_from_sqrt_area(rh, ph, sa)
        rwg = _axis_from_sqrt_area(rw, pw, sa)
        ryy, rxx = np.meshgrid(rhg, rwg, indexing="ij")
        pos[cursor:cursor + n_rows, 0] = time_cursor
        pos[cursor:cursor + n_rows, 1] = ryy.ravel()
        pos[cursor:cursor + n_rows, 2] = rxx.ravel()
        cursor += n_rows
        time_cursor += 1.0
    r1 = cursor
    origin = time_cursor

    sqrt_area = math.sqrt(latent_h * latent_w)
    hgrid = _axis_from_sqrt_area(latent_h, ph, sqrt_area)
    wgrid = _axis_from_sqrt_area(latent_w, pw, sqrt_area)
    yy, xx = np.meshgrid(hgrid, wgrid, indexing="ij")
    frame_grid = np.stack([yy.ravel(), xx.ravel()], axis=-1)

    a0, a1 = r1, r1 + audio_rows
    t_audio = origin + np.arange(audio_t, dtype=np.float64)
    pos[a0:a1, 0] = np.tile(t_audio, AUDIO_CHANNELS)
    pos[a0:a0 + audio_t, 2] = wgrid[0]
    pos[a0 + audio_t:a1, 2] = wgrid[-1]

    v0, v1 = a1, seq
    tgrid = _video_t_grid(latent_t, origin, time_scale)
    vid = pos[v0:v1].reshape(latent_t, rows_per_frame, 3)
    vid[:, :, 0] = tgrid[:, None]
    vid[:, :, 1:] = frame_grid[None]

    return {"seq": seq, "positions": pos,
            "text": (0, text_len), "refs": (r0, r1),
            "audio": (a0, a1), "video": (v0, v1)}


def build_minimax_rope(positions, cfg: MiniMaxH3Config):
    """(cos, sin) [L, 3*inv_freq_len] half-style tables (transformer.py
    :107-117: per-axis freqs concatenated; rotation covers the first
    2*pairs head dims)."""
    inv = 1.0 / (cfg.rope_theta ** (
        np.arange(0, 2 * cfg.rope_inv_freq_len, 2, dtype=np.float64)
        / (2 * cfg.rope_inv_freq_len)))
    ang = np.concatenate([positions[:, i:i + 1] * inv[None]
                          for i in range(3)], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_partial_rope(x, cos, sin):
    """x: [B, L, N, D]; rotate dims [0:p] with [p:2p] (transformer.py
    :196-205: first.mul_(cos) - second*sin; second.mul_(cos) + first*sin).
    """
    p = cos.shape[-1]
    first = x[..., :p].astype(jnp.float32)
    second = x[..., p:2 * p].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    f = first * c - second * s
    sec = second * c + first * s
    return jnp.concatenate([f.astype(x.dtype), sec.astype(x.dtype),
                            x[..., 2 * p:]], axis=-1)


def patchify_video_minimax(latent, patch):
    """[B, C, T, H, W] -> [T*h*w, C*pt*ph*pw] feature order (c, pt, ph, pw)
    (packing.py:58-64 'nctrhpwq->nthwcrpq')."""
    b, c, t, h, w = latent.shape
    pt, ph, pw = patch
    x = latent.reshape(b, c, t // pt, pt, h // ph, ph, w // pw, pw)
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)
    return x.reshape(b * (t // pt) * (h // ph) * (w // pw),
                     c * pt * ph * pw)


def unpatchify_video_minimax(rows, t, h, w, c, patch):
    pt, ph, pw = patch
    x = rows.reshape(1, t // pt, h // ph, w // pw, c, pt, ph, pw)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(1, c, t, h, w)


def pack_audio_minimax(latent):
    """[1, C_a, 2, T] -> [2*T, C_a] (transformer.py:56-57)."""
    return latent[0].transpose(1, 2, 0).reshape(-1, latent.shape[1])


def unpack_audio_minimax(rows, c_a):
    """Inverse of pack_audio_minimax: [2*T, C_a] -> [1, C_a, 2, T]
    (kept a strict roundtrip of this pipeline's latent layout)."""
    t = rows.shape[0] // AUDIO_CHANNELS
    return rows.reshape(AUDIO_CHANNELS, t, c_a).transpose(2, 0, 1)[None]


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True):
    s = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32, -s, s
                                 ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _attn_p(key, cfg, dtype):
    ks = iter(jax.random.split(key, 2))
    inner = cfg.num_heads * cfg.head_dim
    return {"qkv": _lin(next(ks), cfg.hidden_size, 3 * inner, dtype,
                        bias=False),
            "o": _lin(next(ks), inner, cfg.hidden_size, dtype, bias=False),
            "q_norm": jnp.ones((cfg.head_dim,), jnp.float32),
            "k_norm": jnp.ones((cfg.head_dim,), jnp.float32)}


def _mlp_p(key, cfg, dtype):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, cfg.hidden_size, 2 * cfg.ffn_hidden_size,
                        dtype, bias=False),
            "fc2": _lin(k2, cfg.ffn_hidden_size, cfg.hidden_size, dtype,
                        bias=False)}


def init_minimax_h3(key, cfg: MiniMaxH3Config, dtype=None):
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 16))
    h = cfg.hidden_size

    def refiner_block(key):
        k1, k2 = jax.random.split(key)
        return {"norm1": jnp.ones((h,), jnp.float32),
                "attn": _attn_p(k1, cfg, dtype),
                "norm2": jnp.ones((h,), jnp.float32),
                "mlp": _mlp_p(k2, cfg, dtype)}

    def dit_block(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"norm1": jnp.ones((h,), jnp.float32),
                "attn": _attn_p(k1, cfg, dtype),
                "norm2": jnp.ones((h,), jnp.float32),
                "mlp": _mlp_p(k2, cfg, dtype),
                "adaln": _lin(k3, cfg.time_embed_dim, 18 * h, jnp.float32)}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    return {
        "video_patch_proj": _lin(next(keys), cfg.video_dim, h, jnp.float32),
        "audio_patch_proj": _lin(next(keys), cfg.audio_latents_dim, h,
                                 jnp.float32),
        "condition_proj": _lin(next(keys), cfg.text_dim, h, dtype),
        "time_embedder": {
            "in": _lin(next(keys), cfg.timestep_input_dim,
                       cfg.time_embed_hidden_size, jnp.float32),
            "out": _lin(next(keys), cfg.time_embed_hidden_size,
                        cfg.time_embed_dim, jnp.float32)},
        "token_refiner": {
            "blocks": stack([refiner_block(k) for k in jax.random.split(
                next(keys), cfg.token_refiner_num_layers)]),
            "final_norm": jnp.ones((h,), jnp.float32)},
        "blocks": stack([dit_block(k) for k in jax.random.split(
            next(keys), cfg.num_layers)]),
        "final": {
            "norm": jnp.ones((h,), jnp.float32),
            "adaln": _lin(next(keys), cfg.time_embed_dim, 2 * h,
                          jnp.float32),
            "video_out": _lin(next(keys), h, cfg.video_dim, jnp.float32),
            "audio_out": _lin(next(keys), h, cfg.audio_latents_dim,
                              jnp.float32)},
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rms(x, w, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _mm_attention(p, x, cfg, rope, backend):
    l, h = x.shape
    n, hd = cfg.num_heads, cfg.head_dim
    qkv = _dense(x, p["qkv"])
    q, k, v = jnp.split(qkv.reshape(l, 3, n, hd), 3, axis=1)
    q = _rms(q[:, 0], p["q_norm"])[None]
    k = _rms(k[:, 0], p["k_norm"])[None]
    v = v[:, 0][None]
    if rope is not None:
        q = _apply_partial_rope(q, *rope)
        k = _apply_partial_rope(k, *rope)
    o = attention(q, k, v, backend=backend)[0].reshape(l, n * hd)
    return _dense(o, p["o"])


def _mm_mlp(p, x, cfg):
    h = _dense(x, p["fc1"])
    gate, value = jnp.split(h, 2, axis=-1)
    h = jax.nn.silu(gate.astype(jnp.float32)).astype(x.dtype) * value
    return _dense(h, p["fc2"])


def time_embedding_minimax(params, cfg: MiniMaxH3Config, timesteps):
    """timesteps: [K] in [0,1] (= 1 - sigma).  [K, time_embed_dim] fp32."""
    half = cfg.timestep_input_dim // 2
    freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
    ang = timesteps.astype(jnp.float32)[:, None] * jnp.asarray(
        freqs, jnp.float32)[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)
    te = params["time_embedder"]
    h = jax.nn.silu(_dense(emb, te["in"]).astype(jnp.float32))
    return _dense(h, te["out"])


def refine_text(params, cfg: MiniMaxH3Config, text_states,
                attn_backend="auto"):
    """[L, text_dim] -> [L, hidden] (condition_proj + TokenRefiner)."""
    cdt = cfg.compute_dtype
    x = _dense(text_states.astype(cdt), params["condition_proj"])

    def body(x, bp):
        x = x + _mm_attention(bp["attn"], _rms(x, bp["norm1"]), cfg, None,
                              attn_backend)
        x = x + _mm_mlp(bp["mlp"], _rms(x, bp["norm2"]), cfg)
        return x, None

    x, _ = jax.lax.scan(body, x, params["token_refiner"]["blocks"])
    return _rms(x, params["token_refiner"]["final_norm"])


# noise-augmentation timestep pinned on conditioning rows
# (packing.py:19 MINIMAX_H3_KEYFRAME_NOISE_AUG, transformer.py:555)
VISUAL_COND_TIMESTEP = 0.999


def minimax_h3_forward(params, cfg: MiniMaxH3Config, video_x, audio_x,
                       sigma_video, sigma_audio, text_hidden, layout,
                       rope, attn_backend: str = "auto", ref_rows=None):
    """video_x: [1, C, T, H, W]; audio_x: [1, C_a, 2, T_a]; text_hidden:
    [L_txt, hidden] refined text.  ref_rows: optional [R, patch_dim]
    Ref2VA conditioning rows (noise-augmented reference latents,
    pipeline.py _prepare_condition_rows:332-338) occupying
    layout["refs"].  Returns (video_velocity, audio_velocity)."""
    cdt = cfg.compute_dtype
    t0, t1 = layout["text"]
    a0, a1 = layout["audio"]
    v0, v1 = layout["video"]
    use_refs = ref_rows is not None

    video_rows = patchify_video_minimax(video_x.astype(jnp.float32),
                                        cfg.patch_size)
    audio_rows = pack_audio_minimax(audio_x.astype(jnp.float32))
    parts = [text_hidden.astype(cdt)]
    if use_refs:
        parts.append(_dense(ref_rows.astype(jnp.float32),
                            params["video_patch_proj"]).astype(cdt))
    parts += [
        _dense(audio_rows, params["audio_patch_proj"]).astype(cdt),
        _dense(video_rows, params["video_patch_proj"]).astype(cdt)]
    hidden = jnp.concatenate(parts, axis=0)

    # temb rows: [video_ts, audio_ts (+cond_ts with refs)]; adaLN row =
    # temb_idx*3 + tag, with text rows on the video timestep
    # (build_row_timesteps fill, tag 1); conditioning rows pin
    # max(1 - sigma_video, VISUAL_COND_TIMESTEP) (transformer.py:555)
    ts_list = [1.0 - sigma_video, 1.0 - sigma_audio]
    seg_rows = [(t0, t1, 0 * 3 + TEXT_TAG), (a0, a1, 1 * 3 + AUDIO_TAG),
                (v0, v1, 0 * 3 + VIDEO_TAG)]
    if use_refs:
        r0, r1 = layout["refs"]
        ts_list.append(jnp.maximum(1.0 - sigma_video,
                                   VISUAL_COND_TIMESTEP))
        seg_rows.append((r0, r1, 2 * 3 + VIDEO_TAG))
    ts = jnp.stack(ts_list)
    temb = time_embedding_minimax(params, cfg, ts)   # [n_temb, time_dim]
    seg_rows = tuple(seg_rows)
    n_rows = ts.shape[0] * 3

    h = cfg.hidden_size

    # adaln produces 6 chunks (shift/scale/gate msa + mlp) per (temb, mod):
    # linear out = [n_temb, 18h] -> view(-1, 6h) rows (temb_idx*3 + mod)
    # -> chunk 6 along features (transformer.py:256-261)
    def body(hidden, bp):
        m = _dense(jax.nn.silu(temb), bp["adaln"])       # [n_temb, 18h]
        m = m.reshape(n_rows, 6, h)  # [row, chunk, h]
        y = _rms(hidden, bp["norm1"])
        parts = [y[s:e].astype(jnp.float32) * (1.0 + m[r, 1]) + m[r, 0]
                 for s, e, r in seg_rows]
        y = jnp.concatenate(parts, axis=0).astype(hidden.dtype)
        a = _mm_attention(bp["attn"], y, cfg, rope, attn_backend)
        ga = jnp.concatenate([a[s:e].astype(jnp.float32) * m[r, 2]
                              for s, e, r in seg_rows], axis=0)
        hidden = (hidden.astype(jnp.float32) + ga).astype(hidden.dtype)
        y = _rms(hidden, bp["norm2"])
        parts = [y[s:e].astype(jnp.float32) * (1.0 + m[r, 4]) + m[r, 3]
                 for s, e, r in seg_rows]
        y = jnp.concatenate(parts, axis=0).astype(hidden.dtype)
        f = _mm_mlp(bp["mlp"], y, cfg)
        gf = jnp.concatenate([f[s:e].astype(jnp.float32) * m[r, 5]
                              for s, e, r in seg_rows], axis=0)
        return (hidden.astype(jnp.float32) + gf).astype(hidden.dtype), None

    hidden, _ = jax.lax.scan(body, hidden, params["blocks"])

    fp = params["final"]
    fm = _dense(jax.nn.silu(temb), fp["adaln"])         # [n_temb, 2h]
    fm = fm.reshape(-1, 2, h)                           # [temb, (s,sc)]
    y = _rms(hidden, fp["norm"]).astype(jnp.float32)
    vid = y[v0:v1] * (1.0 + fm[0, 1]) + fm[0, 0]
    aud = y[a0:a1] * (1.0 + fm[1, 1]) + fm[1, 0]
    video_out = _dense(vid, fp["video_out"])
    audio_out = _dense(aud, fp["audio_out"])
    t, hh, ww = video_x.shape[2], video_x.shape[3], video_x.shape[4]
    return (unpatchify_video_minimax(video_out, t, hh, ww,
                                     cfg.latents_dim, cfg.patch_size),
            unpack_audio_minimax(audio_out, cfg.audio_latents_dim))
