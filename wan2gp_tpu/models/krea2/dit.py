"""Krea 2 single-stream MMDiT, TPU-native.

Functional re-implementation of the reference's Krea2 transformer
(/root/reference/models/krea2/krea2_mmdit.py SingleStreamDiT): 28
single-stream blocks over a packed [txt, img] sequence with GQA (48 query /
12 kv heads), per-block shared timestep modulation (one tproj output plus a
learned per-block bias, krea2_mmdit.py:433-445), sigmoid attention gating,
SwiGLU MLPs, QK RMS-norm, and 3-axis RoPE (axes [32,48,48], theta 1000,
krea2_mmdit.py:508-510).  Text conditioning is a TextFusionTransformer over
12 stacked Qwen3-VL hidden layers (2 layer-wise blocks per token, a 12->1
projector, 2 sequence refiner blocks, krea2_mmdit.py:379-400).

TPU mapping: blocks stacked on a leading axis and run under lax.scan; the
packed sequence is padded to a multiple of 256 at trace time with a static
key-validity mask consumed by the flash kernel's kv_mask path; RoPE tables
are host-precomputed from position ids.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.rope import apply_rope
from ..flux.dit import rope_from_ids, timestep_embedding


@dataclasses.dataclass(frozen=True)
class Krea2Config:
    # configs/krea2_transformer_config.json
    features: int = 6144
    tdim: int = 256
    txtdim: int = 2560
    heads: int = 48
    kvheads: int = 12
    multiplier: int = 4
    layers: int = 28
    patch: int = 2
    channels: int = 16
    theta: float = 1000.0
    txtlayers: int = 12          # stacked text-encoder hidden layers
    txtheads: int = 20
    txtkvheads: int = 20
    n_fusion_blocks: int = 2     # layerwise and refiner block counts
    seq_multiple: int = 256      # packed-sequence padding (mmdit.py:553)
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.features // self.heads

    @property
    def mlp_dim(self):
        # SwiGLU: round_up(int(2*features/3) * multiplier, 128)
        m = int(2 * self.features / 3) * self.multiplier
        return 128 * ((m + 127) // 128)

    @property
    def txt_mlp_dim(self):
        m = int(2 * self.txtdim / 3) * self.multiplier
        return 128 * ((m + 127) // 128)

    @property
    def axes_dim(self):
        hd = self.head_dim
        return (hd - 12 * (hd // 16), 6 * (hd // 16), 6 * (hd // 16))


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True):
    limit = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _attn_params(key, dim, heads, kvheads, dtype):
    ks = iter(jax.random.split(key, 6))
    hd = dim // heads
    return {
        "wq": _lin(next(ks), dim, hd * heads, dtype, bias=False),
        "wk": _lin(next(ks), dim, hd * kvheads, dtype, bias=False),
        "wv": _lin(next(ks), dim, hd * kvheads, dtype, bias=False),
        "gate": _lin(next(ks), dim, dim, dtype, bias=False),
        "wo": _lin(next(ks), dim, dim, dtype, bias=False),
        # RMSNorm weights stored as zero offsets (effective = w + 1)
        "qnorm": jnp.zeros((hd,), jnp.float32),
        "knorm": jnp.zeros((hd,), jnp.float32),
    }


def _swiglu_params(key, dim, mlp_dim, dtype):
    ks = iter(jax.random.split(key, 3))
    return {"gate": _lin(next(ks), dim, mlp_dim, dtype, bias=False),
            "up": _lin(next(ks), dim, mlp_dim, dtype, bias=False),
            "down": _lin(next(ks), mlp_dim, dim, dtype, bias=False)}


def _fusion_block(key, cfg: Krea2Config, dtype):
    k1, k2 = jax.random.split(key)
    return {"prenorm": jnp.zeros((cfg.txtdim,), jnp.float32),
            "postnorm": jnp.zeros((cfg.txtdim,), jnp.float32),
            "attn": _attn_params(k1, cfg.txtdim, cfg.txtheads,
                                 cfg.txtkvheads, dtype),
            "mlp": _swiglu_params(k2, cfg.txtdim, cfg.txt_mlp_dim, dtype)}


def _stream_block(key, cfg: Krea2Config, dtype):
    k1, k2 = jax.random.split(key)
    return {"mod": jnp.zeros((6 * cfg.features,), jnp.float32),
            "prenorm": jnp.zeros((cfg.features,), jnp.float32),
            "postnorm": jnp.zeros((cfg.features,), jnp.float32),
            "attn": _attn_params(k1, cfg.features, cfg.heads,
                                 cfg.kvheads, dtype),
            "mlp": _swiglu_params(k2, cfg.features, cfg.mlp_dim, dtype)}


def init_krea2(key, cfg: Krea2Config, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 16))
    f = cfg.features
    blocks = [_stream_block(k, cfg, dtype)
              for k in jax.random.split(next(keys), cfg.layers)]
    lw = [_fusion_block(k, cfg, dtype)
          for k in jax.random.split(next(keys), cfg.n_fusion_blocks)]
    rf = [_fusion_block(k, cfg, dtype)
          for k in jax.random.split(next(keys), cfg.n_fusion_blocks)]
    return {
        "first": _lin(next(keys), cfg.channels * cfg.patch ** 2, f, dtype),
        "tmlp": {"fc1": _lin(next(keys), cfg.tdim, f, dtype),
                 "fc2": _lin(next(keys), f, f, dtype)},
        "tproj": _lin(next(keys), f, 6 * f, dtype),
        "txtfusion": {
            "layerwise": jax.tree.map(lambda *xs: jnp.stack(xs), *lw),
            "projector": _lin(next(keys), cfg.txtlayers, 1, dtype,
                              bias=False),
            "refiner": jax.tree.map(lambda *xs: jnp.stack(xs), *rf),
        },
        "txtmlp": {"norm": jnp.zeros((cfg.txtdim,), jnp.float32),
                   "fc1": _lin(next(keys), cfg.txtdim, f, dtype),
                   "fc2": _lin(next(keys), f, f, dtype)},
        "last": {"norm": jnp.zeros((f,), jnp.float32),
                 "linear": _lin(next(keys), f,
                                cfg.patch ** 2 * cfg.channels, dtype),
                 "mod": jnp.zeros((2, f), jnp.float32)},
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _rms(x, w_offset, eps=1e-5):
    """Krea2 RMSNorm: weight stored as zero offset (mmdit.py:225)."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * (w_offset + 1.0)).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _swiglu(x, p):
    return _dense(jax.nn.silu(_dense(x, p["gate"]).astype(jnp.float32)
                              ).astype(x.dtype) * _dense(x, p["up"]), p["down"])


def _gqa_attention(p, x, heads, kvheads, cos, sin, kv_mask, backend,
                   x_gate=None):
    """QK-normed, roped, sigmoid-gated attention (mmdit.py Attention).

    cos/sin None -> no rope (text fusion blocks).  GQA handled by repeating
    kv heads (XLA turns the repeat into a broadcast feeding the MXU)."""
    b, l, dim = x.shape
    hd = dim // heads
    q = _dense(x, p["wq"]).reshape(b, l, heads, hd)
    k = _dense(x, p["wk"]).reshape(b, l, kvheads, hd)
    v = _dense(x, p["wv"]).reshape(b, l, kvheads, hd)
    q = _rms(q, p["qnorm"])
    k = _rms(k, p["knorm"])
    if cos is not None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)
    if kvheads != heads:
        rep = heads // kvheads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    out = attention(q, k, v, backend=backend, kv_mask=kv_mask)
    out = out.reshape(b, l, dim)
    gate = jax.nn.sigmoid(_dense(x if x_gate is None else x_gate,
                                 p["gate"]).astype(jnp.float32))
    return _dense(out * gate.astype(out.dtype), p["wo"])


def _fusion_block_fwd(bp, x, cfg, kv_mask, backend):
    y = _rms(x, bp["prenorm"])
    x = x + _gqa_attention(bp["attn"], y, cfg.txtheads, cfg.txtkvheads,
                           None, None, kv_mask, backend)
    y = _rms(x, bp["postnorm"])
    return x + _swiglu(y, bp["mlp"])


def prepare_context(params, cfg: Krea2Config, context, mask,
                    output_len: Optional[int] = None,
                    attn_backend: str = "auto"):
    """context: [B, L, n_layers, txtdim] stacked text hidden states;
    mask: [B, L] (1 = real token).  Returns [B, out_len, features]
    (mmdit.py:517-531 prepare_context)."""
    cdt = cfg.compute_dtype
    b, l, n, d = context.shape
    fp = params["txtfusion"]
    x = context.reshape(b * l, n, d).astype(cdt)

    def lw_body(x, bp):
        return _fusion_block_fwd(bp, x, cfg, None, attn_backend), None

    x, _ = jax.lax.scan(lw_body, x, fp["layerwise"])
    # project the layer axis away: [B*L, n, d] -> [B, L, d]
    x = jnp.einsum("bnd,no->bod", x, fp["projector"]["w"].astype(cdt))
    x = x.reshape(b, l, d)

    def rf_body(x, bp):
        return _fusion_block_fwd(bp, x, cfg, mask, attn_backend), None

    x, _ = jax.lax.scan(rf_body, x, fp["refiner"])

    tp = params["txtmlp"]
    x = _rms(x, tp["norm"])
    x = _dense(x, tp["fc1"])
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=True).astype(cdt)
    x = _dense(x, tp["fc2"])
    x = x * (mask[..., None] > 0)
    if output_len is not None and x.shape[1] < output_len:
        x = jnp.pad(x, ((0, 0), (0, output_len - x.shape[1]), (0, 0)))
    return x


def prepare_timestep(params, cfg: Krea2Config, t):
    """t: [B] in [0, 1].  Returns (tvec [B,F], modvec [B,6F])
    (mmdit.py:533-535; temb uses tfactor 1000, cos|sin order)."""
    cdt = cfg.compute_dtype
    emb = timestep_embedding(t, cfg.tdim).astype(cdt)
    h = _dense(emb, params["tmlp"]["fc1"])
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
    tvec = _dense(h, params["tmlp"]["fc2"])
    g = jax.nn.gelu(tvec.astype(jnp.float32), approximate=True).astype(cdt)
    return tvec, _dense(g, params["tproj"])


def build_krea2_rope(txt_len: int, h_tok: int, w_tok: int,
                     cfg: Krea2Config, pad_to: int):
    """Host-static RoPE tables for the packed [txt, img] sequence.

    Text positions are all-zero (krea2_main.py:63); img ids (0, y, x)."""
    ids = np.zeros((pad_to, 3), np.float64)
    img = np.zeros((h_tok, w_tok, 3), np.float64)
    img[..., 1] = np.arange(h_tok)[:, None]
    img[..., 2] = np.arange(w_tok)[None, :]
    ids[txt_len:txt_len + h_tok * w_tok] = img.reshape(-1, 3)
    return rope_from_ids(ids, cfg.axes_dim, cfg.theta)


def pack_image(latents, patch: int):
    """[B, C, H, W] -> [B, (H/p)(W/p), C*p*p] (krea2_main.py:69)."""
    b, c, h, w = latents.shape
    x = latents.reshape(b, c, h // patch, patch, w // patch, patch)
    return x.transpose(0, 2, 4, 1, 3, 5).reshape(
        b, (h // patch) * (w // patch), c * patch * patch)


def unpack_image(tokens, h: int, w: int, patch: int, channels: int):
    b = tokens.shape[0]
    x = tokens.reshape(b, h // patch, w // patch, channels, patch, patch)
    return x.transpose(0, 3, 1, 4, 2, 5).reshape(b, channels, h, w)


def krea2_forward(params, cfg: Krea2Config, img, context, t,
                  rope_cos, rope_sin, txt_mask,
                  attn_backend: str = "auto"):
    """img: [B, L_img, C*p*p] packed latents; context: [B, L_txt, features]
    already fused (prepare_context); t: [B] in [0,1]; txt_mask: [B, L_txt].

    Returns [B, L_img, C*p*p] velocity prediction (mmdit.py:563-586)."""
    cdt = cfg.compute_dtype
    b, l_img, _ = img.shape
    l_txt = context.shape[1]
    x_img = _dense(img.astype(cdt), params["first"])
    x = jnp.concatenate([context.astype(cdt), x_img], axis=1)

    full = l_txt + l_img
    pad = (-full) % cfg.seq_multiple
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    kv_mask = jnp.concatenate([
        txt_mask.astype(jnp.int8),
        jnp.ones((b, l_img), jnp.int8),
        jnp.zeros((b, pad), jnp.int8)], axis=1)

    tvec, modvec = prepare_timestep(params, cfg, t)
    mod6 = modvec.reshape(b, 6, cfg.features).astype(jnp.float32)

    def body(x, bp):
        m = mod6 + bp["mod"].reshape(6, cfg.features)[None]
        pre_s, pre_sh, pre_g, post_s, post_sh, post_g = [
            m[:, i, None, :] for i in range(6)]
        y = _rms(x, bp["prenorm"]).astype(jnp.float32)
        y = (y * (pre_s + 1.0) + pre_sh).astype(cdt)
        a = _gqa_attention(bp["attn"], y, cfg.heads, cfg.kvheads,
                           rope_cos, rope_sin, kv_mask, attn_backend)
        x = x + (a.astype(jnp.float32) * pre_g).astype(cdt)
        y = _rms(x, bp["postnorm"]).astype(jnp.float32)
        y = (y * (post_s + 1.0) + post_sh).astype(cdt)
        mlp = _swiglu(y, bp["mlp"])
        x = x + (mlp.astype(jnp.float32) * post_g).astype(cdt)
        return x, None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    x = x[:, l_txt:l_txt + l_img]
    lp = params["last"]
    mod = tvec[:, None, :].astype(jnp.float32) + lp["mod"][None]
    scale, shift = mod[:, 0, None], mod[:, 1, None]
    y = _rms(x, lp["norm"]).astype(jnp.float32)
    y = (y * (scale + 1.0) + shift).astype(cdt)
    return _dense(y, lp["linear"]).astype(jnp.float32)
