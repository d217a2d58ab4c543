"""HV1.5 latent super-resolution upsamplers (720p / 1080p).

TPU-native re-implementation of /root/reference/models/hyvideo/modules/
upsample.py:
- SRTo720pUpsampler:70 — causal conv-in, N SRResidualCausalBlock3D
  (conv-silu-conv-silu-conv + skip), conv-out, optional global residual;
- SRTo1080pUpsampler:100 — bilinear pre-resize to the target shape,
  conv_in + channel repeat_interleave skip, per-level ResnetBlock stacks
  (HV1.5 VAE blocks), RMS norm + swish + conv_out;
- pipeline use (pipeline_hunyuan_video.py:1473-1488, 1602-1612): the
  SR'd latents are noise-mixed at 0.7, concatenated with a ones mask,
  and fed as extra conditioning channels that switch to zeros once
  t < 1000 * noise_scale; the upsampler DiT is meanflow-distilled
  (models.py:723-727 time_r_in) and takes the next timestep as r.

Latents are channels-last [B, T, H, W, C] (our VAE convention).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .vae import _causal_conv3d
from .vae15 import _res, _rms_ch


@dataclasses.dataclass(frozen=True)
class SR720Config:
    in_channels: int = 32
    out_channels: int = 32
    hidden_channels: int = 128
    num_blocks: int = 16
    global_residual: bool = False


@dataclasses.dataclass(frozen=True)
class SR1080Config:
    z_channels: int = 32
    out_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256)
    num_res_blocks: int = 2
    is_residual: bool = False


def _conv_p(key, cin, cout, k=3):
    lim = math.sqrt(6.0 / (cin * k ** 3 + cout))
    return {"w": jax.random.uniform(key, (k, k, k, cin, cout),
                                    jnp.float32, -lim, lim),
            "b": jnp.zeros((cout,), jnp.float32)}


def init_sr720(key, cfg: SR720Config = SR720Config()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, cfg.num_blocks * 3 + 4))
    return {
        "in_conv": _conv_p(next(keys), cfg.in_channels,
                           cfg.hidden_channels),
        "blocks": [[_conv_p(next(keys), cfg.hidden_channels,
                            cfg.hidden_channels) for _ in range(3)]
                   for _ in range(cfg.num_blocks)],
        "out_conv": _conv_p(next(keys), cfg.hidden_channels,
                            cfg.out_channels),
    }


def sr720_forward(params, cfg: SR720Config, z):
    """z: [B, T, H, W, C] latents -> refined latents (same shape)."""
    x = z.astype(jnp.float32)
    y = _causal_conv3d(x, params["in_conv"]["w"], params["in_conv"]["b"])
    for blk in params["blocks"]:
        h = _causal_conv3d(y, blk[0]["w"], blk[0]["b"])
        h = jax.nn.silu(h)
        h = _causal_conv3d(h, blk[1]["w"], blk[1]["b"])
        h = jax.nn.silu(h)
        h = _causal_conv3d(h, blk[2]["w"], blk[2]["b"])
        y = y + h
    y = _causal_conv3d(y, params["out_conv"]["w"],
                       params["out_conv"]["b"])
    if cfg.global_residual and y.shape == x.shape:
        y = y + x
    return y


def init_sr1080(key, cfg: SR1080Config = SR1080Config()
                ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))

    def res(cin, cout):
        p = {"norm1": {"gamma": jnp.ones((1, 1, 1, cin), jnp.float32)},
             "conv1": _conv_p(next(keys), cin, cout),
             "norm2": {"gamma": jnp.ones((1, 1, 1, cout), jnp.float32)},
             "conv2": _conv_p(next(keys), cout, cout)}
        if cin != cout:
            p["shortcut"] = _conv_p(next(keys), cin, cout, k=1)
        return p

    block_in = cfg.block_out_channels[0]
    levels = []
    cin = block_in
    for ch in cfg.block_out_channels:
        blocks = []
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res(cin, ch))
            cin = ch
        levels.append(blocks)
    return {
        "conv_in": _conv_p(next(keys), cfg.z_channels, block_in),
        "up": levels,
        "norm_out": {"gamma": jnp.ones((1, 1, 1, cin), jnp.float32)},
        "conv_out": _conv_p(next(keys), cin, cfg.out_channels),
    }


def sr1080_forward(params, cfg: SR1080Config, z, target_hw=None):
    """z: [B, T, H, W, C]; target_hw: optional (H', W') latent-grid
    bilinear pre-resize (upsample.py:137-150)."""
    x = z.astype(jnp.float32)
    if target_hw is not None and x.shape[2:4] != tuple(target_hw):
        b, t, h, w, c = x.shape
        x = jax.image.resize(x, (b, t, target_hw[0], target_hw[1], c),
                             method="bilinear")
    repeats = cfg.block_out_channels[0] // cfg.z_channels
    h = _causal_conv3d(x, params["conv_in"]["w"],
                       params["conv_in"]["b"]) \
        + jnp.repeat(x, repeats, axis=-1)
    for blocks in params["up"]:
        for bp in blocks:
            h = _res(bp, h)
    h = _rms_ch(h, params["norm_out"])
    h = jax.nn.silu(h.astype(jnp.float32))
    return _causal_conv3d(h, params["conv_out"]["w"],
                          params["conv_out"]["b"])


def _load_conv(sd, name):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    # torch [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
    return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32))}


def load_sr720_params(sd: Dict[str, np.ndarray],
                      cfg: SR720Config = SR720Config()):
    """SRTo720pUpsampler keys (in_conv/blocks.N.block.{0,2,4}/
    out_conv, CausalConv3d wraps a .conv)."""
    sd = dict(sd)

    def conv(name):
        cand = f"{name}.conv" if f"{name}.conv.weight" in sd else name
        return _load_conv(sd, cand)

    return {"in_conv": conv("in_conv"),
            "blocks": [[conv(f"blocks.{i}.block.{j}")
                        for j in (0, 2, 4)]
                       for i in range(cfg.num_blocks)],
            "out_conv": conv("out_conv")}, sorted(sd.keys())


def load_sr1080_params(sd: Dict[str, np.ndarray],
                       cfg: SR1080Config = SR1080Config()):
    """SRTo1080pUpsampler keys (conv_in/up.N.block.M.*/norm_out/
    conv_out; HV1.5 VAE ResnetBlock + RMS_norm layouts)."""
    sd = dict(sd)

    def conv(name):
        cand = f"{name}.conv" if f"{name}.conv.weight" in sd else name
        return _load_conv(sd, cand)

    def norm(name):
        g = np.asarray(sd.pop(f"{name}.gamma"), np.float32)
        p = {"gamma": jnp.asarray(g.reshape(1, 1, 1, -1))}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(
                sd.pop(f"{name}.bias"), np.float32).reshape(1, 1, 1, -1))
        return p

    levels = []
    for i in range(len(cfg.block_out_channels)):
        blocks = []
        for j in range(cfg.num_res_blocks + 1):
            pre = f"up.{i}.block.{j}"
            bp = {"norm1": norm(f"{pre}.norm1"),
                  "conv1": conv(f"{pre}.conv1"),
                  "norm2": norm(f"{pre}.norm2"),
                  "conv2": conv(f"{pre}.conv2")}
            for cand in (f"{pre}.nin_shortcut", f"{pre}.conv_shortcut"):
                if f"{cand}.weight" in sd or f"{cand}.conv.weight" in sd:
                    bp["shortcut"] = conv(cand)
            blocks.append(bp)
        levels.append(blocks)
    return {"conv_in": conv("conv_in"), "up": levels,
            "norm_out": norm("norm_out"),
            "conv_out": conv("conv_out")}, sorted(sd.keys())
