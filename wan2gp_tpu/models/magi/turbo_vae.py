"""TurboVAED: distilled fast decoder for Wan 2.2 48-channel latents.

TPU-native re-implementation of /root/reference/models/magi_human/
upstream/inference/model/turbo_vaed/turbo_vaed_module.py:
- TurboVAEDCausalConv3d:157 — conv3d with symmetric REPLICATE temporal
  padding (despite the name: is_causal asserts False) and zero spatial
  SAME padding; depthwise-separable variant :207;
- TurboVAEDResnetBlock3d:264 — affine-free RMSNorm(1e-8) -> act ->
  conv -> norm -> silu -> conv with normalized conv-shortcut; blocks in
  upsampling stages use ReLU for the first activation
  (is_upsampler_modified, :336-340);
- WanResample:374 — upsample3d: (3,1,1) time conv doubling channels ->
  temporal interleave (dropping the first frame on the first chunk),
  then 2x nearest spatial upsample + conv2d;
- TurboVAEDDecoder3d:593 — conv_in -> mid (layers[0]) -> 4 up blocks
  (layers[1..4], reversed channel order) -> RMSNorm -> pixel-shuffle 2x
  upsampler -> channel RMSNorm -> silu -> conv_out;
- latent de-normalization z*std + mean with the Wan2.2 latent stats
  (:918-924, z_dim 48).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TurboVAEDConfig:
    latent_channels: int = 48
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: Tuple[int, ...] = (4, 3, 3, 3, 4)
    spatio_temporal_scaling: Tuple[bool, ...] = (True, True, True, False)
    spatio_only: Tuple[bool, ...] = (False, False, False, False)
    use_unpatchify: bool = False
    patch_size: int = 2
    eps: float = 1e-8


def _conv3d(x, p, groups=1):
    """x [B, C, T, H, W]; SYMMETRIC replicate temporal pad + zero SAME
    spatial pad (turbo_vaed_module.py:195-205)."""
    kt, kh, kw = p["w"].shape[2:]
    if kt > 1:
        n = (kt - 1) // 2
        left = jnp.repeat(x[:, :, :1], n, axis=2)
        right = jnp.repeat(x[:, :, -1:], n, axis=2)
        x = jnp.concatenate([left, x, right], axis=2)
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1, 1, 1),
        [(0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2)],
        feature_group_count=groups,
        dimension_numbers=("NCTHW", "OITHW", "NCTHW"))
    if "b" in p:
        y = y + p["b"].reshape(1, -1, 1, 1, 1)
    return y


def _apply_conv(p, x):
    """Plain or depthwise-separable causal conv3d."""
    if "dw" in p:
        c = x.shape[1]
        x = _conv3d(x, p["dw"], groups=c)
        return _conv3d(x, p["pw"])
    return _conv3d(x, p)


def _rms_c(x, eps=1e-8):
    """Affine-free RMSNorm over the channel axis (module RMSNorm:73 on
    dim=1 of NCTHW)."""
    var = jnp.mean(x.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    return (x * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _resnet(p, x, upsampler_modified=False):
    h = _rms_c(x)
    h = jax.nn.relu(h) if upsampler_modified else jax.nn.silu(h)
    h = _apply_conv(p["conv1"], h)
    h = jax.nn.silu(_rms_c(h))
    h = _apply_conv(p["conv2"], h)
    sc = x
    if "shortcut" in p:
        sc = _apply_conv(p["shortcut"], _rms_c(x, eps=1e-6))
    return h + sc


def _resample(p, x, spatio_only: bool, is_first_chunk: bool = True):
    b, c, t, h, w = x.shape
    if not spatio_only and "time_conv" in p:
        x = _conv3d(x, p["time_conv"])                   # [B, 2C, T, ...]
        x = x.reshape(b, 2, c, t, h, w).transpose(0, 2, 3, 1, 4, 5)
        x = x.reshape(b, c, t * 2, h, w)
        if is_first_chunk:
            x = x[:, :, 1:]
    b, c, t2, h, w = x.shape
    y = x.transpose(0, 2, 1, 3, 4).reshape(b * t2, c, h, w)
    y = jax.image.resize(y, (b * t2, c, 2 * h, 2 * w), method="nearest")
    y = jax.lax.conv_general_dilated(
        y, p["conv"]["w"], (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    y = y + p["conv"]["b"].reshape(1, -1, 1, 1)
    c2 = y.shape[1]
    return y.reshape(b, t2, c2, 2 * h, 2 * w).transpose(0, 2, 1, 3, 4)


def turbo_vaed_decode(params, cfg: TurboVAEDConfig, z,
                      is_first_chunk: bool = True):
    """z: [B, 48, T, H, W] NORMALIZED Wan2.2 latents.  Returns pixels
    [B, 3, T', H*16, W*16] (single chunk; the reference's sliding-window
    chunking is a memory optimization, turbo_vaed_module.py:918)."""
    if "mean" in params:
        z = z * params["std"].reshape(1, -1, 1, 1, 1) \
            + params["mean"].reshape(1, -1, 1, 1, 1)
    x = _apply_conv(params["conv_in"], z.astype(jnp.float32))
    for rp in params["mid"]:
        x = _resnet(rp, x)
    rev_sts = tuple(reversed(cfg.spatio_temporal_scaling))
    rev_so = tuple(reversed(cfg.spatio_only))
    for i, ub in enumerate(params["up_blocks"]):
        if "conv_in" in ub:
            x = _resnet(ub["conv_in"], x)
        if "resample" in ub:
            x = _resample(ub["resample"], x, rev_so[i],
                          is_first_chunk=is_first_chunk)
        for rp in ub["resnets"]:
            x = _resnet(rp, x, upsampler_modified=rev_sts[i])
    if not cfg.use_unpatchify:
        x = _rms_c(x)
        # per-frame conv2d + pixel shuffle 2x (Conv2dSplitUpsampler:117)
        b, c, t, h, w = x.shape
        y = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        y = jax.lax.conv_general_dilated(
            y, params["upsampler2d"]["w"], (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = y + params["upsampler2d"]["b"].reshape(1, -1, 1, 1)
        c2 = y.shape[1] // 4
        y = y.reshape(b * t, c2, 2, 2, h, w).transpose(0, 1, 4, 2, 5, 3)
        y = y.reshape(b * t, c2, 2 * h, 2 * w)
        x = y.reshape(b, t, c2, 2 * h, 2 * w).transpose(0, 2, 1, 3, 4)
    x = _rms_c(x)
    x = jax.nn.silu(x)
    x = _apply_conv(params["conv_out"], x)
    if cfg.use_unpatchify:
        p = cfg.patch_size
        b, c, t, h, w = x.shape
        co = c // (p * p)
        x = x.reshape(b, co, p, p, t, h, w).transpose(0, 1, 4, 5, 2, 6, 3)
        x = x.reshape(b, co, t, h * p, w * p)
    return x


# ---------------------------------------------------------------------------
# init + loader
# ---------------------------------------------------------------------------

def _init_c3(key, cin, cout, k=(3, 3, 3), dw=False):
    if dw:
        k1, k2 = jax.random.split(key)
        lim = math.sqrt(6.0 / (np.prod(k) + 1))
        return {"dw": {"w": jax.random.uniform(
                    k1, (cin, 1, *k), jnp.float32, -lim, lim),
                    "b": jnp.zeros((cin,), jnp.float32)},
                "pw": {"w": jax.random.uniform(
                    k2, (cout, cin, 1, 1, 1), jnp.float32, -0.05, 0.05),
                    "b": jnp.zeros((cout,), jnp.float32)}}
    lim = math.sqrt(6.0 / (cin * np.prod(k) + cout))
    return {"w": jax.random.uniform(key, (cout, cin, *k), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((cout,), jnp.float32)}


def _init_resnet(key, cin, cout):
    k1, k2, k3 = jax.random.split(key, 3)
    p = {"conv1": _init_c3(k1, cin, cout), "conv2": _init_c3(k2, cout,
                                                            cout)}
    if cin != cout:
        p["shortcut"] = _init_c3(k3, cin, cout, k=(1, 1, 1))
    return p


def init_turbo_vaed(key, cfg: TurboVAEDConfig = TurboVAEDConfig()
                    ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    rev_ch = tuple(reversed(cfg.block_out_channels))
    rev_layers = tuple(reversed(cfg.layers_per_block))
    rev_sts = tuple(reversed(cfg.spatio_temporal_scaling))
    out0 = rev_ch[0]
    params: Dict[str, Any] = {
        "conv_in": _init_c3(next(keys), cfg.latent_channels, out0),
        "mid": [_init_resnet(next(keys), out0, out0)
                for _ in range(rev_layers[0])],
    }
    up_blocks = []
    cin = out0
    for i, cout in enumerate(rev_ch):
        ub: Dict[str, Any] = {}
        if cin != cout:
            ub["conv_in"] = _init_resnet(next(keys), cin, cout)
        if rev_sts[i]:
            rs = {"conv": {"w": jax.random.uniform(
                        next(keys), (cout, cout, 3, 3), jnp.float32,
                        -0.05, 0.05),
                    "b": jnp.zeros((cout,), jnp.float32)}}
            if not tuple(reversed(cfg.spatio_only))[i]:
                rs["time_conv"] = _init_c3(next(keys), cout, 2 * cout,
                                           k=(3, 1, 1))
            ub["resample"] = rs
        ub["resnets"] = [_init_resnet(next(keys), cout, cout)
                         for _ in range(rev_layers[i + 1])]
        up_blocks.append(ub)
        cin = cout
    params["up_blocks"] = up_blocks
    if not cfg.use_unpatchify:
        # Conv2dSplitUpsampler keeps channels (out = in), pixel_shuffle
        # then divides by 4 (turbo_vaed_module.py:132-155)
        params["upsampler2d"] = {
            "w": jax.random.uniform(next(keys), (cin, cin, 3, 3),
                                    jnp.float32, -0.02, 0.02),
            "b": jnp.zeros((cin,), jnp.float32)}
        cin = cin // 4
        co = cfg.out_channels
    else:
        co = cfg.out_channels * cfg.patch_size ** 2
    params["conv_out"] = _init_c3(next(keys), cin, co)
    return params


def load_turbo_vaed_params(sd: Dict[str, np.ndarray],
                           cfg: TurboVAEDConfig = TurboVAEDConfig()):
    """decoder.* keys (TurboVAEDDecoder3d module paths) + optional
    mean/std latent stats buffers."""
    sd = dict(sd)
    pre = "decoder." if any(k.startswith("decoder.") for k in sd) else ""

    def pop(k):
        return np.asarray(sd.pop(pre + k), np.float32)

    def conv(name):
        if f"{pre}{name}.depthwise_conv.weight" in sd:
            return {"dw": {"w": jnp.asarray(
                        pop(f"{name}.depthwise_conv.weight")),
                        "b": jnp.asarray(
                        pop(f"{name}.depthwise_conv.bias"))},
                    "pw": {"w": jnp.asarray(
                        pop(f"{name}.pointwise_conv.weight")),
                        "b": jnp.asarray(
                        pop(f"{name}.pointwise_conv.bias"))}}
        return {"w": jnp.asarray(pop(f"{name}.conv.weight")),
                "b": jnp.asarray(pop(f"{name}.conv.bias"))}

    def resnet(name):
        p = {"conv1": conv(f"{name}.conv1"),
             "conv2": conv(f"{name}.conv2")}
        if f"{pre}{name}.conv_shortcut.conv.weight" in sd or \
                f"{pre}{name}.conv_shortcut.depthwise_conv.weight" in sd:
            p["shortcut"] = conv(f"{name}.conv_shortcut")
        return p

    rev_layers = tuple(reversed(cfg.layers_per_block))
    rev_sts = tuple(reversed(cfg.spatio_temporal_scaling))
    rev_so = tuple(reversed(cfg.spatio_only))
    params: Dict[str, Any] = {
        "conv_in": conv("conv_in"),
        "mid": [resnet(f"mid_block.resnets.{j}")
                for j in range(rev_layers[0])],
    }
    up_blocks = []
    for i in range(len(cfg.block_out_channels)):
        ub: Dict[str, Any] = {}
        if f"{pre}up_blocks.{i}.conv_in.conv1.conv.weight" in sd or \
                f"{pre}up_blocks.{i}.conv_in.conv1.depthwise_conv." \
                "weight" in sd:
            ub["conv_in"] = resnet(f"up_blocks.{i}.conv_in")
        if rev_sts[i]:
            rs = {"conv": {
                "w": jnp.asarray(pop(
                    f"up_blocks.{i}.upsamplers.0.resample.1.weight")),
                "b": jnp.asarray(pop(
                    f"up_blocks.{i}.upsamplers.0.resample.1.bias"))}}
            if not rev_so[i]:
                rs["time_conv"] = {
                    "w": jnp.asarray(pop(
                        f"up_blocks.{i}.upsamplers.0.time_conv.conv"
                        ".weight")),
                    "b": jnp.asarray(pop(
                        f"up_blocks.{i}.upsamplers.0.time_conv.conv"
                        ".bias"))}
            ub["resample"] = rs
        ub["resnets"] = [resnet(f"up_blocks.{i}.resnets.{j}")
                         for j in range(rev_layers[i + 1])]
        up_blocks.append(ub)
    params["up_blocks"] = up_blocks
    if not cfg.use_unpatchify:
        params["upsampler2d"] = {
            "w": jnp.asarray(pop("upsampler2d_1.conv.weight")),
            "b": jnp.asarray(pop("upsampler2d_1.conv.bias"))}
    params["conv_out"] = conv("conv_out")
    for k in ("mean", "std"):
        if k in sd:
            params[k] = jnp.asarray(np.asarray(sd.pop(k), np.float32))
    leftover = [k for k in sd if "norm" not in k]
    return params, sorted(leftover)
