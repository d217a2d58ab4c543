"""MAGI-Human joint audio-video DiT, TPU-native.

Functional re-implementation of the reference DiTModel
(/root/reference/models/magi_human/upstream/inference/model/dit/
dit_module.py) at the MODEL_CONFIG in magi_human_model.py:36-53:
40 layers, 5120 wide, 40 q heads / 8 kv groups (head_dim 128).
- Packed token sequence [video | audio | text] with per-modality input
  embedders (Adapter, :693-713); the distilled model has NO timestep
  conditioning — the network is timestep-agnostic (the sampler's
  stochastic re-noising carries the schedule);
- element-wise Fourier positional embedding over 9-column coords
  (t, h, w, T, H, W, refT, refH, refW) with (ref-1)/(size-1) scaling and
  h/w centering (:147-226); the resulting [sin|cos] table rotates the
  first 6/8 of each head dim, split-half convention (:303-318);
- "multi-modality" layers (0-3, 36-39) hold separate video/audio/text
  expert weights for every linear and norm (:497-560);
- gated attention: per-head sigmoid gate on the attention output
  (:594-604); RMS norms store weight-minus-one (applied as w+1, :230);
- MLP: swiglu7 (interleaved GLU, clamp 7, +1 linear bias — GPT-OSS
  style, :60-70) on most layers; non-gated gelu7 on layers 0-3;
- separate final RMS+linear heads for video and audio (:866-880).

Layers are heterogeneous (expert counts and FFN shapes differ), so the
stack is a Python loop rather than lax.scan; all shapes stay static.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MagiConfig:
    dim: int = 5120
    n_layers: int = 40
    n_heads_q: int = 40
    n_heads_kv: int = 8
    head_dim: int = 128
    video_in: int = 192            # 48ch Wan2.2 latent * 2*2 patch
    audio_in: int = 64
    text_in: int = 3584            # T5Gemma
    mm_layers: Tuple[int, ...] = (0, 1, 2, 3, 36, 37, 38, 39)
    gelu7_layers: Tuple[int, ...] = (0, 1, 2, 3)
    attn_gating: bool = True
    rope_temperature: float = 10000.0
    patch_size: int = 2
    t_patch_size: int = 1
    compute_dtype: Any = jnp.bfloat16

    def ffn_dim(self, layer: int) -> int:
        if layer in self.gelu7_layers:
            return self.dim * 4                       # non-gated gelu7
        return int(self.dim * 4 * 2 / 3) // 4 * 4     # gated swiglu7

    @property
    def rope_bands(self):
        return self.head_dim // 8                      # 16 bands per axis


MODALITIES = ("video", "audio", "text")


def magi_coords(shape, ref_shape, offset_t: int = 0) -> np.ndarray:
    """[T*H*W, 9] (t, h, w, T, H, W, refT, refH, refW) (data_proxy.py
    get_coords)."""
    t, h, w = shape
    g = np.stack(np.meshgrid(np.arange(t) + offset_t, np.arange(h),
                             np.arange(w), indexing="ij"), -1).reshape(-1, 3)
    meta = np.asarray([t, h, w, *ref_shape], np.float64)
    return np.concatenate(
        [g.astype(np.float64), np.broadcast_to(meta, (g.shape[0], 6))], 1)


def magi_fourier_rope(cfg: MagiConfig, coords: np.ndarray):
    """coords [L, 9] -> (cos, sin) [L, 3*bands] split-half rope tables
    covering the first 6*bands dims of each head (dit_module.py:182-215,
    303-318: table = [sin | cos], tensor_split -> sin first)."""
    bands = 1.0 / (cfg.rope_temperature **
                   (np.arange(cfg.rope_bands, dtype=np.float64) /
                    cfg.rope_bands))
    xyz = coords[:, :3].copy()
    sizes, refs = coords[:, 3:6], coords[:, 6:9]
    with np.errstate(divide="ignore", invalid="ignore"):
        scales = (refs - 1.0) / (sizes - 1.0)
    scales[(refs == 1) & (sizes == 1)] = 1.0
    centers = (sizes - 1.0) / 2.0
    centers[:, 0] = 0.0
    xyz = xyz - centers
    proj = xyz[:, :, None] * scales[:, :, None] * bands[None, None]
    proj = proj.reshape(coords.shape[0], -1)          # [L, 3*bands]
    return (jnp.asarray(np.cos(proj), jnp.float32),
            jnp.asarray(np.sin(proj), jnp.float32))


def _apply_partial_half_rope(x, cos, sin):
    """x: [B, L, H, D]; rotate dims [0, 2*R) split-half, pass the rest."""
    r = cos.shape[-1]
    x1 = x[..., :r].astype(jnp.float32)
    x2 = x[..., r:2 * r].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    rot = jnp.concatenate([x1 * c - x2 * s, x2 * c + x1 * s], axis=-1)
    return jnp.concatenate([rot.astype(x.dtype), x[..., 2 * r:]], axis=-1)


def _rms_p1(x, w, eps=1e-6):
    """RMS norm with stored weight-minus-one (dit_module.py:230-265)."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * (w.astype(jnp.float32) + 1.0)).astype(x.dtype)


def swiglu7(x):
    """Interleaved GLU with clamp 7 and +1 linear bias (:60-70)."""
    x = x.astype(jnp.float32)
    x_glu = jnp.clip(x[..., ::2], None, 7.0)
    x_lin = jnp.clip(x[..., 1::2], -7.0, 7.0)
    return x_glu * jax.nn.sigmoid(1.702 * x_glu) * (x_lin + 1.0)


def gelu7(x):
    x = jnp.clip(x.astype(jnp.float32), None, 7.0)
    return x * jax.nn.sigmoid(1.702 * x)


def _per_modality(fn_params, x, sizes):
    """Apply expert weights to contiguous [video|audio|text] groups.
    fn_params: dict modality -> weight matrix (or None for shared)."""
    nv, na, nt = sizes
    parts = []
    for seg, name in zip((x[:, :nv], x[:, nv:nv + na], x[:, nv + na:]),
                         MODALITIES):
        if seg.shape[1]:
            parts.append(jnp.dot(seg, fn_params[name].astype(seg.dtype)))
    return jnp.concatenate(parts, axis=1)


def _maybe_expert(p, key, x, sizes, mm: bool):
    if mm:
        return _per_modality({m: p[f"{key}_{m}"] for m in MODALITIES},
                             x, sizes)
    return jnp.dot(x, p[key].astype(x.dtype))


def _norm_expert(p, key, x, sizes, mm: bool):
    if not mm:
        return _rms_p1(x, p[key])
    nv, na, nt = sizes
    segs = (x[:, :nv], x[:, nv:nv + na], x[:, nv + na:])
    return jnp.concatenate(
        [_rms_p1(s, p[f"{key}_{m}"]) for s, m in zip(segs, MODALITIES)
         if s.shape[1]], axis=1)


def magi_forward(params, cfg: MagiConfig, video_tokens, audio_tokens,
                 text_tokens, cos, sin, attn_backend: str = "auto"):
    """video_tokens: [B, Nv, video_in]; audio_tokens: [B, Na, audio_in];
    text_tokens: [B, Nt, text_in]; cos/sin from magi_fourier_rope over the
    packed coords.  Returns (video_pred [B, Nv, video_in],
    audio_pred [B, Na, audio_in]) fp32."""
    cdt = cfg.compute_dtype
    nv, na, nt = (video_tokens.shape[1], audio_tokens.shape[1],
                  text_tokens.shape[1])
    sizes = (nv, na, nt)
    ad = params["adapter"]

    def emb(tok, p):
        return jnp.dot(tok.astype(cdt), p["w"]) + p["b"]
    x = jnp.concatenate([emb(video_tokens, ad["video"]),
                         emb(audio_tokens, ad["audio"]),
                         emb(text_tokens, ad["text"])], axis=1)

    b, l, d = x.shape
    nq, nkv, hd = cfg.n_heads_q, cfg.n_heads_kv, cfg.head_dim
    for li in range(cfg.n_layers):
        p = params["layers"][li]
        mm = li in cfg.mm_layers
        h = _norm_expert(p, "attn_norm", x, sizes, mm)
        q = _maybe_expert(p, "q", h, sizes, mm).reshape(b, l, nq, hd)
        k = _maybe_expert(p, "k", h, sizes, mm).reshape(b, l, nkv, hd)
        v = _maybe_expert(p, "v", h, sizes, mm).reshape(b, l, nkv, hd)
        g = None
        if cfg.attn_gating:
            g = _maybe_expert(p, "g", h, sizes, mm).reshape(b, l, nq, 1)
        q = _qk_norm_expert(p, "q_norm", q, sizes, mm)
        k = _qk_norm_expert(p, "k_norm", k, sizes, mm)
        q = _apply_partial_half_rope(q, cos, sin)
        k = _apply_partial_half_rope(k, cos, sin)
        k = jnp.repeat(k, nq // nkv, axis=2)
        v = jnp.repeat(v, nq // nkv, axis=2)
        o = attention(q, k, v, backend=attn_backend)
        if g is not None:
            o = o * jax.nn.sigmoid(g.astype(jnp.float32)).astype(o.dtype)
        x = x + _maybe_expert(p, "proj", o.reshape(b, l, nq * hd), sizes,
                              mm)

        h = _norm_expert(p, "mlp_norm", x, sizes, mm)
        up = _maybe_expert(p, "up", h, sizes, mm)
        act = gelu7(up) if li in cfg.gelu7_layers else swiglu7(up)
        x = x + _maybe_expert(p, "down", act.astype(cdt), sizes, mm)

    xv = _rms_p1(x[:, :nv], params["final_norm_video"])
    xa = _rms_p1(x[:, nv:nv + na], params["final_norm_audio"])
    video = jnp.dot(xv.astype(jnp.float32),
                    params["final_video"].astype(jnp.float32))
    audio = jnp.dot(xa.astype(jnp.float32),
                    params["final_audio"].astype(jnp.float32))
    return video, audio


def _qk_norm_expert(p, key, q, sizes, mm: bool):
    """Per-head RMS over head_dim with expert weights on mm layers."""
    b, l, n, hd = q.shape
    if not mm:
        return _rms_p1(q, p[key])
    nv, na, nt = sizes
    segs = (q[:, :nv], q[:, nv:nv + na], q[:, nv + na:])
    return jnp.concatenate(
        [_rms_p1(s, p[f"{key}_{m}"]) for s, m in zip(segs, MODALITIES)
         if s.shape[1]], axis=1)


# ---------------------------------------------------------------------------
# init (random, for tests)
# ---------------------------------------------------------------------------

def init_magi(key, cfg: MagiConfig, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    d, hd = cfg.dim, cfg.head_dim
    keys = iter(jax.random.split(key, 8 + cfg.n_layers))

    def mat(key, din, dout):
        s = math.sqrt(6.0 / (din + dout))
        return jax.random.uniform(key, (din, dout), jnp.float32,
                                  -s, s).astype(dtype)

    def layer(key, li):
        mm = li in cfg.mm_layers
        ks = iter(jax.random.split(key, 24))
        fd = cfg.ffn_dim(li)
        up_out = fd * 2 if li not in cfg.gelu7_layers else fd
        p = {}
        names = {"q": (d, nqd), "k": (d, nkvd), "v": (d, nkvd),
                 "proj": (nqd, d), "up": (d, up_out), "down": (fd, d)}
        if cfg.attn_gating:
            names["g"] = (d, cfg.n_heads_q)
        for nm, (di, do) in names.items():
            if mm:
                for m in MODALITIES:
                    p[f"{nm}_{m}"] = mat(next(ks), di, do)
            else:
                p[nm] = mat(next(ks), di, do)
        for nm, dim_ in (("attn_norm", d), ("mlp_norm", d),
                         ("q_norm", hd), ("k_norm", hd)):
            if mm:
                for m in MODALITIES:
                    p[f"{nm}_{m}"] = jnp.zeros((dim_,), dtype)
            else:
                p[nm] = jnp.zeros((dim_,), dtype)
        return p

    nqd = cfg.n_heads_q * hd
    nkvd = cfg.n_heads_kv * hd

    def adapter(key, cin):
        s = math.sqrt(6.0 / (cin + d))
        return {"w": jax.random.uniform(key, (cin, d), jnp.float32,
                                        -s, s).astype(dtype),
                "b": jnp.zeros((d,), dtype)}

    return {"adapter": {"video": adapter(next(keys), cfg.video_in),
                        "audio": adapter(next(keys), cfg.audio_in),
                        "text": adapter(next(keys), cfg.text_in)},
            "layers": [layer(next(keys), li)
                       for li in range(cfg.n_layers)],
            "final_norm_video": jnp.zeros((d,), dtype),
            "final_norm_audio": jnp.zeros((d,), dtype),
            "final_video": mat(next(keys), d, cfg.video_in),
            "final_audio": mat(next(keys), d, cfg.audio_in)}
