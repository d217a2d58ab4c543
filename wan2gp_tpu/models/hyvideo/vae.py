"""Hunyuan-Video causal 3D VAE ("884-16c-hy"), TPU-native.

Functional re-implementation of the reference AutoencoderKLCausal3D
(/root/reference/models/hyvideo/vae/vae.py, unet_causal_3d_blocks.py):
block_out_channels (128, 256, 512, 512), 16 latent channels, time
compression 4, spatial 8, GroupNorm(32)+SiLU resnets, single-head mid-block
attention over all (t, h, w) tokens, and causal convs that pad the time
axis front-only with REPLICATE padding (unet_causal_3d_blocks.py:63 — the
spatial borders replicate too, unlike the Wan VAE's zero padding).
Temporal upsampling is nearest-2x on frames 1.. with frame 0 passed
through (UpsampleCausal3D:196-212).  scaling_factor 0.476986.

Layout: channels-last [B, T, H, W, C]; convs via lax.conv_general_dilated
(NDHWC/DHWIO) so the MXU sees [spatial, C_in] x [C_in, C_out] tiles.
Kandinsky 5 reuses this VAE (k5 yaml vae.name 'hunyuan').
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

HUNYUAN_VAE_SCALING = 0.476986


@dataclasses.dataclass(frozen=True)
class HunyuanVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 16
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    time_compression: int = 4
    spatial_compression: int = 8
    scaling_factor: float = HUNYUAN_VAE_SCALING
    compute_dtype: Any = jnp.float32


# ---------------------------------------------------------------------------
# primitive layers
# ---------------------------------------------------------------------------

def _causal_conv3d(x, w, b, stride=(1, 1, 1)):
    """x: [B, T, H, W, C]; w: [kt, kh, kw, Cin, Cout]; replicate padding,
    time front-only (k_t - 1)."""
    kt, kh, kw = w.shape[:3]
    pad = [(0, 0), (kt - 1, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
           (0, 0)]
    x = jnp.pad(x, pad, mode="edge")
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + b.astype(y.dtype)


def _group_norm(x, w, b, groups, eps=1e-6):
    c = x.shape[-1]
    orig = x.shape
    x32 = x.astype(jnp.float32).reshape(*orig[:-1], groups, c // groups)
    mean = jnp.mean(x32, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 3, 5), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(orig)
    return (y * w + b).astype(x.dtype)


def _resnet(p, x, groups):
    h = _group_norm(x, p["norm1"]["w"], p["norm1"]["b"], groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _causal_conv3d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = _group_norm(h, p["norm2"]["w"], p["norm2"]["b"], groups)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = _causal_conv3d(h, p["conv2"]["w"], p["conv2"]["b"])
    if "shortcut" in p:
        x = _causal_conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return x + h


def _mid_attention(p, x, groups):
    """Single-head attention over all (t,h,w) tokens with residual
    (diffusers deprecated attn block; unet_causal_3d_blocks.py:727-741)."""
    b, t, h, w, c = x.shape
    res = x
    y = _group_norm(x, p["group_norm"]["w"], p["group_norm"]["b"], groups)
    y = y.reshape(b, t * h * w, c)
    q = jnp.dot(y, p["to_q"]["w"].astype(y.dtype)) + p["to_q"]["b"]
    k = jnp.dot(y, p["to_k"]["w"].astype(y.dtype)) + p["to_k"]["b"]
    v = jnp.dot(y, p["to_v"]["w"].astype(y.dtype)) + p["to_v"]["b"]
    s = jnp.einsum("bld,bsd->bls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(c)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bls,bsd->bld", a, v)
    o = jnp.dot(o, p["to_out"]["w"].astype(o.dtype)) + p["to_out"]["b"]
    return res + o.reshape(b, t, h, w, c)


def _mid_block(p, x, groups):
    x = _resnet(p["resnets"][0], x, groups)
    x = _mid_attention(p["attention"], x, groups)
    return _resnet(p["resnets"][1], x, groups)


def _upsample(p, x, factor):
    """Causal nearest upsample: frame 0 spatial-only, frames 1.. full."""
    ft, fh, fw = factor
    if fh > 1 or ft > 1:
        first = x[:, :1]
        if fh > 1:
            first = jnp.repeat(jnp.repeat(first, fh, axis=2), fw, axis=3)
        rest = x[:, 1:]
        if rest.shape[1] > 0:
            if ft > 1:
                rest = jnp.repeat(rest, ft, axis=1)
            if fh > 1:
                rest = jnp.repeat(jnp.repeat(rest, fh, axis=2), fw, axis=3)
            x = jnp.concatenate([first, rest], axis=1)
        else:
            x = first
    return _causal_conv3d(x, p["w"], p["b"])


# ---------------------------------------------------------------------------
# plans
# ---------------------------------------------------------------------------

def _updown_plan(cfg: HunyuanVAEConfig, decode: bool):
    """Per-block (out_channels, spatial_2x, time_2x) — vae.py:85-95 (enc),
    :255-266 (dec), time_compression_ratio == 4 rules."""
    n = len(cfg.block_out_channels)
    n_sp = int(np.log2(cfg.spatial_compression))
    n_tm = int(np.log2(cfg.time_compression))
    plan = []
    if decode:
        rev = list(reversed(cfg.block_out_channels))
        for i in range(n):
            final = i == n - 1
            sp = i < n_sp
            tm = (i >= n - 1 - n_tm) and not final
            plan.append((rev[i], sp, tm))
    else:
        for i in range(n):
            final = i == n - 1
            sp = (i < n_sp) and not final
            tm = (i >= n - 1 - n_tm) and not final
            plan.append((cfg.block_out_channels[i], sp, tm))
    return plan


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    scale = 1.0 / math.sqrt(cin * k ** 3)
    return {"w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32,
                                    -scale, scale).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_p(c):
    return {"w": jnp.ones((c,), jnp.float32),
            "b": jnp.zeros((c,), jnp.float32)}


def _lin_p(key, c, dtype=jnp.float32):
    s = 1.0 / math.sqrt(c)
    return {"w": jax.random.uniform(key, (c, c), jnp.float32, -s, s
                                    ).astype(dtype),
            "b": jnp.zeros((c,), dtype)}


def _resnet_p(key, cin, cout, dtype):
    ks = iter(jax.random.split(key, 3))
    p = {"norm1": _norm_p(cin), "conv1": _conv_p(next(ks), cin, cout,
                                                 dtype=dtype),
         "norm2": _norm_p(cout), "conv2": _conv_p(next(ks), cout, cout,
                                                  dtype=dtype)}
    if cin != cout:
        p["shortcut"] = _conv_p(next(ks), cin, cout, k=1, dtype=dtype)
    return p


def _mid_p(key, c, dtype):
    ks = iter(jax.random.split(key, 8))
    return {"resnets": [_resnet_p(next(ks), c, c, dtype),
                        _resnet_p(next(ks), c, c, dtype)],
            "attention": {"group_norm": _norm_p(c),
                          "to_q": _lin_p(next(ks), c, dtype),
                          "to_k": _lin_p(next(ks), c, dtype),
                          "to_v": _lin_p(next(ks), c, dtype),
                          "to_out": _lin_p(next(ks), c, dtype)}}


def init_hunyuan_vae(key, cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                     dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    bo = cfg.block_out_channels
    z = cfg.latent_channels

    # encoder
    enc = {"conv_in": _conv_p(next(keys), cfg.in_channels, bo[0],
                              dtype=dtype),
           "down_blocks": [], "mid": _mid_p(next(keys), bo[-1], dtype),
           "norm_out": _norm_p(bo[-1]),
           "conv_out": _conv_p(next(keys), bo[-1], 2 * z, dtype=dtype)}
    cin = bo[0]
    for cout, sp, tm in _updown_plan(cfg, decode=False):
        blk = {"resnets": []}
        c = cin
        for _ in range(cfg.layers_per_block):
            blk["resnets"].append(_resnet_p(next(keys), c, cout, dtype))
            c = cout
        if sp or tm:
            blk["downsample"] = _conv_p(next(keys), cout, cout, dtype=dtype)
            blk["stride"] = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
        enc["down_blocks"].append(blk)
        cin = cout

    # decoder
    dec = {"conv_in": _conv_p(next(keys), z, bo[-1], dtype=dtype),
           "mid": _mid_p(next(keys), bo[-1], dtype),
           "up_blocks": [], "norm_out": _norm_p(bo[0]),
           "conv_out": _conv_p(next(keys), bo[0], cfg.out_channels,
                               dtype=dtype)}
    cin = bo[-1]
    for cout, sp, tm in _updown_plan(cfg, decode=True):
        blk = {"resnets": []}
        c = cin
        for _ in range(cfg.layers_per_block + 1):
            blk["resnets"].append(_resnet_p(next(keys), c, cout, dtype))
            c = cout
        if sp or tm:
            blk["upsample"] = _conv_p(next(keys), cout, cout, dtype=dtype)
            blk["factor"] = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
        dec["up_blocks"].append(blk)
        cin = cout

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv_p(next(keys), 2 * z, 2 * z, k=1,
                                  dtype=dtype),
            "post_quant_conv": _conv_p(next(keys), z, z, k=1, dtype=dtype)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def hunyuan_vae_decode(params, cfg: HunyuanVAEConfig, latents):
    """latents: [B, C_z, T, H, W] (scaled).  Returns video
    [B, 3, T_out, H*8, W*8] in [-1, 1] range (unclamped)."""
    g = cfg.norm_groups
    z = latents.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    z = z / cfg.scaling_factor
    z = _causal_conv3d(z, params["post_quant_conv"]["w"],
                       params["post_quant_conv"]["b"])
    p = params["decoder"]
    x = _causal_conv3d(z, p["conv_in"]["w"], p["conv_in"]["b"])
    x = _mid_block(p["mid"], x, g)
    for blk in p["up_blocks"]:
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g)
        if "upsample" in blk:
            x = _upsample(blk["upsample"], x, blk["factor"])
    x = _group_norm(x, p["norm_out"]["w"], p["norm_out"]["b"], g)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = _causal_conv3d(x, p["conv_out"]["w"], p["conv_out"]["b"])
    return x.transpose(0, 4, 1, 2, 3)


def hunyuan_vae_encode(params, cfg: HunyuanVAEConfig, video):
    """video: [B, 3, T, H, W] in [-1, 1].  Returns mode latents
    [B, C_z, T', H/8, W/8] (scaled by scaling_factor)."""
    g = cfg.norm_groups
    x = video.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    p = params["encoder"]
    x = _causal_conv3d(x, p["conv_in"]["w"], p["conv_in"]["b"])
    for blk in p["down_blocks"]:
        for rp in blk["resnets"]:
            x = _resnet(rp, x, g)
        if "downsample" in blk:
            # DownsampleCausal3D: stride-2 causal conv (no pre-pool)
            x = _causal_conv3d(x, blk["downsample"]["w"],
                               blk["downsample"]["b"], stride=blk["stride"])
    x = _mid_block(p["mid"], x, g)
    x = _group_norm(x, p["norm_out"]["w"], p["norm_out"]["b"], g)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = _causal_conv3d(x, p["conv_out"]["w"], p["conv_out"]["b"])
    x = _causal_conv3d(x, params["quant_conv"]["w"],
                       params["quant_conv"]["b"])
    mean = x[..., :cfg.latent_channels]
    return mean.transpose(0, 4, 1, 2, 3) * cfg.scaling_factor
