"""Wan 2.1 causal 3D VAE (z_dim 16, stride (4,8,8)), TPU-native.

Functional re-implementation of the reference WanVAE
(/root/reference/models/wan/modules/vae.py): encoder/decoder towers of causal
3D convs + RMS-normed residual blocks + per-frame single-head attention,
with the "first frame special" temporal resampling:

  - encode processes chunks [1, 4, 4, ...] through feature caches
    (vae.py:605-631); a downsample3d keeps the first frame unchanged and
    stride-2 convs the rest (vae.py:196-214).
  - decode processes one latent frame at a time (vae.py:643-672); an
    upsample3d keeps the first frame single and time-doubles the rest with
    the *first latent frame replaced by zeros* in the conv window
    (the 'Rep' cache sentinel, vae.py:150-190).

Those chunked/cached loops are mathematically equivalent to full-sequence
causal convolutions; this module implements the full-sequence form with
static shapes (the chunked scan variant for long videos lives in
`vae_scan.py`).  Layout is channels-last NDHWC for TPU conv efficiency.

Normalization constants (vae.py:948-957): latents = (mu - mean) / std.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention

VAE_MEAN = np.array([
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921],
    dtype=np.float32)
VAE_STD = np.array([
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160],
    dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class WanVAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)
    compute_dtype: Any = jnp.float32


# ---------------------------------------------------------------------------
# Primitive layers (channels-last)
# ---------------------------------------------------------------------------

def causal_conv3d(x, w, b, stride=(1, 1, 1), time_pad=None):
    """x: [B, T, H, W, Cin]; w: [kt, kh, kw, Cin, Cout].

    Temporal padding is causal: 2*pad zeros in front (reference
    CausalConv3d, vae.py:43-55); spatial padding symmetric (k//2).
    """
    kt, kh, kw = w.shape[:3]
    tp = 2 * (kt // 2) if time_pad is None else time_pad
    x = jnp.pad(x, ((0, 0), (tp, 0), (kh // 2, kh // 2), (kw // 2, kw // 2),
                    (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding="VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def conv2d(x, w, b, stride=(1, 1), padding="SAME"):
    """x: [B*T, H, W, Cin]; w: [kh, kw, Cin, Cout]."""
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    if b is not None:
        y = y + b
    return y.astype(x.dtype)


def vae_rms_norm(x, gamma):
    """Reference RMS_norm (vae.py:87): L2-normalize over channels * sqrt(C)
    * gamma — channels-last here, so normalize the last axis."""
    c = x.shape[-1]
    dtype = x.dtype
    y = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
    y = y / jnp.maximum(norm, 1e-12) * np.sqrt(c)
    return (y * gamma).astype(dtype)


def _resblock(p, x):
    """RMSnorm-SiLU-conv ×2 with shortcut (vae.py:240-276)."""
    h = vae_rms_norm(x, p["norm1"])
    h = jax.nn.silu(h)
    h = causal_conv3d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = vae_rms_norm(h, p["norm2"])
    h = jax.nn.silu(h)
    h = causal_conv3d(h, p["conv2"]["w"], p["conv2"]["b"])
    if "shortcut" in p:
        x = causal_conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return x + h


def _attnblock(p, x):
    """Per-frame single-head attention over H*W (vae.py:279-318)."""
    b, t, h, w, c = x.shape
    y = x.reshape(b * t, h, w, c)
    y = vae_rms_norm(y, p["norm"])
    qkv = conv2d(y, p["qkv"]["w"], p["qkv"]["b"])  # 1x1 conv -> 3c
    q, k, v = jnp.split(qkv.reshape(b * t, h * w, 1, 3 * c), 3, axis=-1)
    o = attention(q, k, v, backend="xla")
    o = o.reshape(b * t, h, w, c)
    o = conv2d(o, p["proj"]["w"], p["proj"]["b"])
    return x + o.reshape(b, t, h, w, c)


def _spatial(fn, x):
    b, t = x.shape[:2]
    y = fn(x.reshape(b * t, *x.shape[2:]))
    return y.reshape(b, t, *y.shape[1:])


def _down2d(p, x):
    """ZeroPad2d(0,1,0,1) + 3x3 stride-2 conv (vae.py:136-139)."""
    def f(y):
        y = jnp.pad(y, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv2d(y, p["conv"]["w"], p["conv"]["b"], stride=(2, 2),
                      padding="VALID")
    return _spatial(f, x)


def _down3d(p, x):
    """Spatial downsample then first-frame-passthrough temporal stride-2
    conv: windows (x0,x1,x2),(x2,x3,x4),... (vae.py:196-214 cache logic)."""
    x = _down2d(p, x)
    first = x[:, :1]
    rest = causal_conv3d(x, p["time_conv"]["w"], p["time_conv"]["b"],
                         stride=(2, 1, 1), time_pad=0)
    return jnp.concatenate([first, rest], axis=1)


def _upsample_nearest2x(y):
    bt, h, w, c = y.shape
    y = jnp.broadcast_to(y[:, :, None, :, None, :], (bt, h, 2, w, 2, c))
    return y.reshape(bt, 2 * h, 2 * w, c)


def _up2d(p, x):
    def f(y):
        y = _upsample_nearest2x(y)
        return conv2d(y, p["conv"]["w"], p["conv"]["b"])
    return _spatial(f, x)


def _up3d(p, x):
    """Temporal doubling with first-frame passthrough (vae.py:150-190):
    frame 0 stays single; frames 1.. go through a causal (3,1,1) conv with
    frame 0 replaced by zero in the window, output 2c channels interleaved
    as two consecutive frames.  Then spatial upsample (dim -> dim//2)."""
    b, t, h, w, c = x.shape
    first = x[:, :1]
    if t > 1:
        rest_in = x[:, 1:]
        rest = causal_conv3d(rest_in, p["time_conv"]["w"],
                             p["time_conv"]["b"])  # [B, T-1, H, W, 2c]
        rest = rest.reshape(b, t - 1, h, w, 2, c)
        rest = rest.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), h, w, c)
        x = jnp.concatenate([first, rest], axis=1)
    return _up2d(p, x)


# ---------------------------------------------------------------------------
# Tower plans (static op lists paired with param lists)
# ---------------------------------------------------------------------------

def encoder_plan(cfg: WanVAEConfig) -> List[Tuple[str, int, int]]:
    """[(op, in_dim, out_dim)] for the downsampling tower (vae.py:322-371)."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din
        for _ in range(cfg.num_res_blocks):
            plan.append(("res", d, dout))
            d = dout
        if i != len(cfg.dim_mult) - 1:
            plan.append(("down3d" if cfg.temporal_downsample[i] else "down2d",
                         dout, dout))
    return plan


def decoder_plan(cfg: WanVAEConfig) -> List[Tuple[str, int, int]]:
    """Upsampling tower (vae.py:429-478); upsample halves channels."""
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(cfg.dim_mult[::-1])]
    t_up = tuple(cfg.temporal_downsample[::-1])
    plan = []
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        d = din if i == 0 else din // 2
        for _ in range(cfg.num_res_blocks + 1):
            plan.append(("res", d, dout))
            d = dout
        if i != len(cfg.dim_mult) - 1:
            plan.append(("up3d" if t_up[i] else "up2d", dout, dout // 2))
    return plan


_TOWER_OPS = {"res": _resblock, "attn": _attnblock, "down2d": _down2d,
              "down3d": _down3d, "up2d": _up2d, "up3d": _up3d}


def _run_tower(plan, params, x):
    for (op, _, _), p in zip(plan, params):
        x = _TOWER_OPS[op](p, x)
    return x


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _conv_p(key, kt, kh, kw, cin, cout, dtype=jnp.float32):
    fan_in = kt * kh * kw * cin
    w = jax.random.normal(key, (kt, kh, kw, cin, cout), jnp.float32)
    w = w / np.sqrt(fan_in)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _conv2_p(key, kh, kw, cin, cout, dtype=jnp.float32):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    w = w / np.sqrt(kh * kw * cin)
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def _init_tower(keys, plan, dtype):
    out = []
    for op, din, dout in plan:
        k = next(keys)
        ks = iter(jax.random.split(k, 4))
        if op == "res":
            p = {"norm1": jnp.ones((din,), dtype),
                 "conv1": _conv_p(next(ks), 3, 3, 3, din, dout, dtype),
                 "norm2": jnp.ones((dout,), dtype),
                 "conv2": _conv_p(next(ks), 3, 3, 3, dout, dout, dtype)}
            if din != dout:
                p["shortcut"] = _conv_p(next(ks), 1, 1, 1, din, dout, dtype)
        elif op == "attn":
            p = {"norm": jnp.ones((din,), dtype),
                 "qkv": _conv2_p(next(ks), 1, 1, din, 3 * din, dtype),
                 "proj": _conv2_p(next(ks), 1, 1, din, din, dtype)}
        elif op in ("down2d", "down3d"):
            p = {"conv": _conv2_p(next(ks), 3, 3, din, dout, dtype)}
            if op == "down3d":
                p["time_conv"] = _conv_p(next(ks), 3, 1, 1, dout, dout, dtype)
        else:  # up2d / up3d
            p = {"conv": _conv2_p(next(ks), 3, 3, din, dout, dtype)}
            if op == "up3d":
                p["time_conv"] = _conv_p(next(ks), 3, 1, 1, din, 2 * din, dtype)
        out.append(p)
    return out


def init_wan_vae(key, cfg: WanVAEConfig = WanVAEConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 128))
    big = cfg.dim * cfg.dim_mult[-1]
    mid = lambda d: [  # noqa: E731
        _init_tower(keys, [("res", d, d)], dtype)[0],
        _init_tower(keys, [("attn", d, d)], dtype)[0],
        _init_tower(keys, [("res", d, d)], dtype)[0],
    ]
    return {
        "encoder": {
            "conv1": _conv_p(next(keys), 3, 3, 3, 3, cfg.dim, dtype),
            "down": _init_tower(keys, encoder_plan(cfg), dtype),
            "mid": mid(big),
            "head_norm": jnp.ones((big,), dtype),
            "head_conv": _conv_p(next(keys), 3, 3, 3, big, 2 * cfg.z_dim, dtype),
        },
        "conv1": _conv_p(next(keys), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim, dtype),
        "conv2": _conv_p(next(keys), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
        "decoder": {
            "conv1": _conv_p(next(keys), 3, 3, 3, cfg.z_dim, big, dtype),
            "mid": mid(big),
            "up": _init_tower(keys, decoder_plan(cfg), dtype),
            "head_norm": jnp.ones((cfg.dim,), dtype),
            "head_conv": _conv_p(next(keys), 3, 3, 3, cfg.dim, 3, dtype),
        },
    }


# ---------------------------------------------------------------------------
# Encode / decode (full-sequence)
# ---------------------------------------------------------------------------

def _mid(params, x):
    x = _resblock(params[0], x)
    x = _attnblock(params[1], x)
    return _resblock(params[2], x)


def vae_encode(params, cfg: WanVAEConfig, video):
    """video: [B, T, H, W, 3] in [-1, 1], T = 1 + 4k.
    Returns normalized latents [B, T_lat, H/8, W/8, 16]."""
    enc = params["encoder"]
    x = causal_conv3d(video, enc["conv1"]["w"], enc["conv1"]["b"])
    x = _run_tower(encoder_plan(cfg), enc["down"], x)
    x = _mid(enc["mid"], x)
    x = vae_rms_norm(x, enc["head_norm"])
    x = jax.nn.silu(x)
    x = causal_conv3d(x, enc["head_conv"]["w"], enc["head_conv"]["b"])
    x = causal_conv3d(x, params["conv1"]["w"], params["conv1"]["b"])
    mu = x[..., :cfg.z_dim]
    return (mu - VAE_MEAN) / VAE_STD


def cast_vae_params(params, dtype):
    """Reduced-precision VAE compute (the reference's vae_precision "16"
    server policy, wgp.py:2534-2580 — fp16 on CUDA, bf16 here: MXU convs
    run at 2x bf16 throughput while conv accumulation stays fp32 via
    preferred_element_type).  Floating leaves cast, everything else kept."""
    return jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        params)


def vae_decode(params, cfg: WanVAEConfig, latents, dtype=None):
    """latents: [B, T_lat, h, w, 16] (normalized).
    Returns video [B, 1+4*(T_lat-1), 8h, 8w, 3] clipped to [-1, 1].
    dtype: optional reduced compute precision (bf16) for the conv tower;
    output is always fp32."""
    if dtype is not None:
        params = cast_vae_params(params, dtype)
        latents = latents.astype(dtype)
    z = (latents * VAE_STD + VAE_MEAN).astype(latents.dtype)
    z = causal_conv3d(z, params["conv2"]["w"], params["conv2"]["b"])
    dec = params["decoder"]
    x = causal_conv3d(z, dec["conv1"]["w"], dec["conv1"]["b"])
    x = _mid(dec["mid"], x)
    x = _run_tower(decoder_plan(cfg), dec["up"], x)
    x = vae_rms_norm(x, dec["head_norm"])
    x = jax.nn.silu(x)
    x = causal_conv3d(x, dec["head_conv"]["w"], dec["head_conv"]["b"])
    return jnp.clip(x.astype(jnp.float32), -1.0, 1.0)
