"""Wan Lynx: face-identity adapter (ByteDance Lynx on the Wan 2.1 base).

TPU-native re-implementation of /root/reference/models/wan/lynx/:
- resampler.py Resampler:110 — Perceiver resampler (16 learned query
  latents, depth 4, dim 1280, heads 20) mapping a 512-d ArcFace identity
  embedding to 16 IP context tokens (2048-d lite / 5120-d full);
- attention_processor.py setup_lynx_attention_layers:17 — per-block
  cross-attn to_k_ip/to_v_ip (first 20 blocks, bias-free for lite; all
  blocks with bias + 16 learned register tokens for full) and, full
  only, self-attn to_k_ref/to_v_ref;
- modules/model.py:411-441 — IP attention reuses the text cross-attn
  query; lite normalizes ip keys with an affine-free RMSNorm, full with
  the block's own norm_k; result added pre-`o` scaled by lynx_ip_scale;
- modules/model.py:323-335, :645 — full-variant reference branch: the
  face image's VAE latents run a t=0 forward whose per-block modulated
  self-attn inputs are buffered; during denoising each self-attn attends
  (un-roped normed q) over to_k_ref/to_v_ref of its buffered features,
  added with lynx_ref_scale.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Perceiver resampler (resampler.py:110-185; arc config any2video.py:1052)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ResamplerConfig:
    dim: int = 1280
    depth: int = 4
    dim_head: int = 64
    heads: int = 20
    num_queries: int = 16
    embedding_dim: int = 512
    output_dim: int = 5120      # 2048 for lynx lite
    ff_mult: int = 4


def init_resampler(key, cfg: ResamplerConfig = ResamplerConfig(),
                   dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.depth * 8 + 8))

    def lin(din, dout, bias=True):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(next(keys), (din, dout), jnp.float32,
                                     -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def ln(d):
        return {"w": jnp.ones((d,), jnp.float32),
                "b": jnp.zeros((d,), jnp.float32)}

    inner = cfg.dim_head * cfg.heads

    def layer():
        return {
            "norm1": ln(cfg.dim), "norm2": ln(cfg.dim),
            "to_q": lin(cfg.dim, inner, bias=False),
            "to_kv": lin(cfg.dim, inner * 2, bias=False),
            "to_out": lin(inner, cfg.dim, bias=False),
            "ff_norm": ln(cfg.dim),
            "ff1": lin(cfg.dim, cfg.dim * cfg.ff_mult, bias=False),
            "ff2": lin(cfg.dim * cfg.ff_mult, cfg.dim, bias=False),
        }

    return {
        "latents": jax.random.normal(
            next(keys), (1, cfg.num_queries, cfg.dim),
            jnp.float32) / math.sqrt(cfg.dim),
        "proj_in": lin(cfg.embedding_dim, cfg.dim),
        "proj_out": lin(cfg.dim, cfg.output_dim),
        "norm_out": ln(cfg.output_dim),
        "layers": [layer() for _ in range(cfg.depth)],
    }


def _ln(x, p):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["w"] + p["b"]


def _lin(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def resampler_forward(params, cfg: ResamplerConfig, x):
    """x: [B, N, embedding_dim] (ArcFace embed: N=1).  Returns
    [B, num_queries, output_dim]."""
    b = x.shape[0]
    lat = jnp.broadcast_to(params["latents"],
                           (b, *params["latents"].shape[1:]))
    x = _lin(x.astype(jnp.float32), params["proj_in"])
    n, hd = cfg.heads, cfg.dim_head
    for lp in params["layers"]:
        xn = _ln(x, lp["norm1"])
        ln_ = _ln(lat, lp["norm2"])
        q = _lin(ln_, lp["to_q"])
        kv_in = jnp.concatenate([xn, ln_], axis=1)
        kv = _lin(kv_in, lp["to_kv"])
        k, v = jnp.split(kv, 2, axis=-1)
        q = q.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, n, hd).transpose(0, 2, 1, 3)
        s = 1.0 / math.sqrt(math.sqrt(hd))
        w = jnp.einsum("bnld,bnsd->bnls", q * s, k * s)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1)
        o = jnp.einsum("bnls,bnsd->bnld", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, -1, n * hd)
        lat = _lin(o, lp["to_out"]) + lat
        h = _lin(jax.nn.gelu(_lin(_ln(lat, lp["ff_norm"]), lp["ff1"]),
                             approximate=False), lp["ff2"])
        lat = h + lat
    out = _lin(lat, params["proj_out"])
    return _ln(out, params["norm_out"])


def load_resampler_params(sd: Dict[str, np.ndarray],
                          cfg: ResamplerConfig, dtype=jnp.float32):
    """wan2.1_lynx_*_arc_resampler.safetensors (Resampler module keys)."""
    sd = dict(sd)

    def lin(name, bias=True):
        p = {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                         np.float32).T).astype(dtype)}
        if bias and f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)
        return p

    def ln(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    layers = []
    for i in range(cfg.depth):
        pre = f"layers.{i}"
        layers.append({
            "norm1": ln(f"{pre}.0.norm1"), "norm2": ln(f"{pre}.0.norm2"),
            "to_q": lin(f"{pre}.0.to_q", bias=False),
            "to_kv": lin(f"{pre}.0.to_kv", bias=False),
            "to_out": lin(f"{pre}.0.to_out", bias=False),
            "ff_norm": ln(f"{pre}.1.0"),
            "ff1": lin(f"{pre}.1.1", bias=False),
            "ff2": lin(f"{pre}.1.3", bias=False),
        })
    p = {"latents": jnp.asarray(np.asarray(sd.pop("latents"), np.float32)),
         "proj_in": lin("proj_in"), "proj_out": lin("proj_out"),
         "norm_out": ln("norm_out"), "layers": layers}
    return p, sorted(sd.keys())


# ---------------------------------------------------------------------------
# per-block adapter layers (attention_processor.py:17-39)
# ---------------------------------------------------------------------------

def init_lynx_layers(key, dim: int, num_layers: int, full: bool,
                     dtype=jnp.float32) -> Dict[str, Any]:
    """Stacked per-block lynx params.  Lite: to_k_ip/to_v_ip (2048->dim,
    bias-free) on the first 20 blocks (inactive blocks hold zeros and an
    active flag 0).  Full: all blocks with bias, 16 registers, and
    self-attn to_k_ref/to_v_ref."""
    ctx = 5120 if full else 2048
    n_active = num_layers if full else min(20, num_layers)
    keys = iter(jax.random.split(key, num_layers * 6 + 4))

    def lin(din, dout, bias):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(next(keys), (din, dout), jnp.float32,
                                     -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def zeros(din, dout, bias):
        p = {"w": jnp.zeros((din, dout), dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    blocks = []
    for i in range(num_layers):
        active = i < n_active
        bp = {"k_ip": (lin if active else zeros)(ctx, dim, full),
              "v_ip": (lin if active else zeros)(ctx, dim, full)}
        if full:
            bp["registers"] = jax.random.normal(
                next(keys), (1, 16, ctx), jnp.float32) / math.sqrt(dim)
            bp["k_ref"] = lin(dim, dim, True)
            bp["v_ref"] = lin(dim, dim, True)
        blocks.append(bp)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    stacked["active"] = jnp.asarray(
        [1.0 if i < n_active else 0.0 for i in range(num_layers)],
        jnp.float32)
    return stacked


def load_lynx_module_params(sd: Dict[str, np.ndarray], num_layers: int,
                            full: bool, dtype=jnp.bfloat16):
    """Lynx module safetensors: blocks.N.cross_attn.to_{k,v}_ip.*,
    full also blocks.N.cross_attn.registers + blocks.N.self_attn.
    to_{k,v}_ref.* (attention_processor.py attribute paths)."""
    sd = dict(sd)

    def lin(name, din, dout):
        if f"{name}.weight" not in sd:
            p = {"w": jnp.zeros((din, dout), dtype)}
            if full:
                p["b"] = jnp.zeros((dout,), dtype)
            return p, False
        p = {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                         np.float32).T).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p, True

    ctx = 5120 if full else 2048
    dim = None
    for k, v in sd.items():
        if k.endswith("to_k_ip.weight"):
            dim = int(np.asarray(v).shape[0])
            break
    blocks, active = [], []
    for i in range(num_layers):
        pre = f"blocks.{i}"
        k_ip, ok = lin(f"{pre}.cross_attn.to_k_ip", ctx, dim)
        v_ip, _ = lin(f"{pre}.cross_attn.to_v_ip", ctx, dim)
        bp = {"k_ip": k_ip, "v_ip": v_ip}
        if full:
            reg = sd.pop(f"{pre}.cross_attn.registers", None)
            bp["registers"] = (jnp.asarray(np.asarray(reg, np.float32))
                               if reg is not None
                               else jnp.zeros((1, 16, ctx), jnp.float32))
            bp["k_ref"], _ = lin(f"{pre}.self_attn.to_k_ref", dim, dim)
            bp["v_ref"], _ = lin(f"{pre}.self_attn.to_v_ref", dim, dim)
        blocks.append(bp)
        active.append(1.0 if ok else 0.0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
    stacked["active"] = jnp.asarray(active, jnp.float32)
    return stacked, sorted(sd.keys())
