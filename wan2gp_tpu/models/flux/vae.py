"""FLUX 2D autoencoder (SD-style), TPU-native channels-last.

Functional re-implementation of the reference AutoEncoder
(/root/reference/models/flux/modules/autoencoder.py): GroupNorm(32)+swish
resnet towers, single-head spatial attention in the mid block, asymmetric-pad
stride-2 downsample, nearest-2x upsample; latent normalization
z = scale_factor*(mean - shift_factor) (encode, :312) and the inverse on
decode.  flux-schnell params: ch 128, ch_mult [1,2,4,4], 2 res blocks,
z 16, scale 0.3611, shift 0.1159 (util.py:493-503).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class FluxVAEConfig:
    ch: int = 128
    out_ch: int = 3
    in_channels: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 16
    scale_factor: float = 0.3611
    shift_factor: float = 0.1159


def group_norm(x, w, b, groups: int = 32, eps: float = 1e-6):
    """Channels-last GroupNorm over [..., H, W, C]."""
    orig_shape = x.shape
    c = orig_shape[-1]
    groups = min(groups, c)  # real configs have c % 32 == 0; tiny tests don't
    dtype = x.dtype
    y = x.astype(jnp.float32).reshape(*orig_shape[:-1], groups, c // groups)
    red = tuple(range(1, len(orig_shape) - 1)) + (len(orig_shape),)
    mean = jnp.mean(y, axis=red, keepdims=True)
    var = jnp.mean((y - mean) ** 2, axis=red, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(orig_shape)
    return (y * w + b).astype(dtype)


def _conv(x, p, stride=(1, 1), padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["w"], window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    return (y + p["b"]).astype(x.dtype)


def _resblock(p, x):
    h = group_norm(x, p["norm1"]["w"], p["norm1"]["b"])
    h = jax.nn.silu(h)
    h = _conv(h, p["conv1"])
    h = group_norm(h, p["norm2"]["w"], p["norm2"]["b"])
    h = jax.nn.silu(h)
    h = _conv(h, p["conv2"])
    if "shortcut" in p:
        x = _conv(x, p["shortcut"])
    return x + h


def _attnblock(p, x):
    b, hh, ww, c = x.shape
    h = group_norm(x, p["norm"]["w"], p["norm"]["b"])
    q = _conv(h, p["q"]).reshape(b, hh * ww, 1, c)
    k = _conv(h, p["k"]).reshape(b, hh * ww, 1, c)
    v = _conv(h, p["v"]).reshape(b, hh * ww, 1, c)
    o = attention(q, k, v, backend="xla").reshape(b, hh, ww, c)
    return x + _conv(o, p["proj"])


def _down(p, x):
    x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
    return _conv(x, p["conv"], stride=(2, 2), padding="VALID")


def _up(p, x):
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    x = x.reshape(b, 2 * h, 2 * w, c)
    return _conv(x, p["conv"])


# ---------------------------------------------------------------------------

def _conv_p(key, kh, kw, cin, cout, dtype=jnp.float32):
    w = jax.random.normal(key, (kh, kw, cin, cout), jnp.float32)
    return {"w": (w / np.sqrt(kh * kw * cin)).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_p(c, dtype=jnp.float32):
    return {"w": jnp.ones((c,), dtype), "b": jnp.zeros((c,), dtype)}


def _res_p(keys, cin, cout, dtype):
    p = {"norm1": _norm_p(cin), "conv1": _conv_p(next(keys), 3, 3, cin, cout, dtype),
         "norm2": _norm_p(cout), "conv2": _conv_p(next(keys), 3, 3, cout, cout, dtype)}
    if cin != cout:
        p["shortcut"] = _conv_p(next(keys), 1, 1, cin, cout, dtype)
    return p


def _attn_p(keys, c, dtype):
    return {"norm": _norm_p(c),
            "q": _conv_p(next(keys), 1, 1, c, c, dtype),
            "k": _conv_p(next(keys), 1, 1, c, c, dtype),
            "v": _conv_p(next(keys), 1, 1, c, c, dtype),
            "proj": _conv_p(next(keys), 1, 1, c, c, dtype)}


def init_flux_vae(key, cfg: FluxVAEConfig = FluxVAEConfig(),
                  dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    n_res = len(cfg.ch_mult)
    in_mult = (1,) + tuple(cfg.ch_mult)

    enc_down = []
    for i in range(n_res):
        stage = {"blocks": []}
        cin, cout = cfg.ch * in_mult[i], cfg.ch * cfg.ch_mult[i]
        for _ in range(cfg.num_res_blocks):
            stage["blocks"].append(_res_p(keys, cin, cout, dtype))
            cin = cout
        if i != n_res - 1:
            stage["down"] = {"conv": _conv_p(next(keys), 3, 3, cout, cout, dtype)}
        enc_down.append(stage)
    big = cfg.ch * cfg.ch_mult[-1]

    dec_up = []
    cin = big
    for i in reversed(range(n_res)):
        stage = {"blocks": []}
        cout = cfg.ch * cfg.ch_mult[i]
        for _ in range(cfg.num_res_blocks + 1):
            stage["blocks"].append(_res_p(keys, cin, cout, dtype))
            cin = cout
        if i != 0:
            stage["up"] = {"conv": _conv_p(next(keys), 3, 3, cout, cout, dtype)}
        dec_up.insert(0, stage)

    def mid(c):
        return {"block_1": _res_p(keys, c, c, dtype),
                "attn_1": _attn_p(keys, c, dtype),
                "block_2": _res_p(keys, c, c, dtype)}

    return {
        "encoder": {
            "conv_in": _conv_p(next(keys), 3, 3, cfg.in_channels, cfg.ch, dtype),
            "down": enc_down,
            "mid": mid(big),
            "norm_out": _norm_p(big),
            "conv_out": _conv_p(next(keys), 3, 3, big, 2 * cfg.z_channels, dtype),
        },
        "decoder": {
            "conv_in": _conv_p(next(keys), 3, 3, cfg.z_channels, big, dtype),
            "mid": mid(big),
            "up": dec_up,
            "norm_out": _norm_p(cfg.ch * cfg.ch_mult[0]),
            "conv_out": _conv_p(next(keys), 3, 3, cfg.ch * cfg.ch_mult[0],
                                cfg.out_ch, dtype),
        },
    }


def _mid_fwd(p, x):
    x = _resblock(p["block_1"], x)
    x = _attnblock(p["attn_1"], x)
    return _resblock(p["block_2"], x)


def flux_vae_encode(params, cfg: FluxVAEConfig, img, sample_key=None):
    """img: [B, H, W, 3] in [-1, 1] -> latents [B, H/8, W/8, z] normalized.
    Deterministic (mean) unless sample_key is given."""
    e = params["encoder"]
    h = _conv(img, e["conv_in"])
    n_res = len(cfg.ch_mult)
    for i, stage in enumerate(e["down"]):
        for bp in stage["blocks"]:
            h = _resblock(bp, h)
        if i != n_res - 1:
            h = _down(stage["down"], h)
    h = _mid_fwd(e["mid"], h)
    h = jax.nn.silu(group_norm(h, e["norm_out"]["w"], e["norm_out"]["b"]))
    h = _conv(h, e["conv_out"])
    if "post_quant" in e:         # Flux2 encoder quant_conv (1x1)
        h = _conv(h, e["post_quant"])
    mean, logvar = jnp.split(h, 2, axis=-1)
    z = mean
    if sample_key is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            sample_key, mean.shape, mean.dtype)
    return cfg.scale_factor * (z - cfg.shift_factor)


def flux_vae_decode(params, cfg: FluxVAEConfig, z):
    """z: [B, h, w, z_channels] normalized -> [B, 8h, 8w, 3]."""
    z = z / cfg.scale_factor + cfg.shift_factor
    d = params["decoder"]
    if "pre_quant" in d:          # diffusers/Flux2 post_quant_conv (1x1)
        z = _conv(z, d["pre_quant"])
    h = _conv(z, d["conv_in"])
    h = _mid_fwd(d["mid"], h)
    for i in reversed(range(len(cfg.ch_mult))):
        stage = d["up"][i]
        for bp in stage["blocks"]:
            h = _resblock(bp, h)
        if i != 0:
            h = _up(stage["up"], h)
    h = jax.nn.silu(group_norm(h, d["norm_out"]["w"], d["norm_out"]["b"]))
    return _conv(h, d["conv_out"])
