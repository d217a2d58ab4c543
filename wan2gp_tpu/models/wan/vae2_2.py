"""Wan 2.2 causal 3D VAE (z_dim 48, stride (4,16,16)), TPU-native.

Functional re-implementation of the reference Wan2_2_VAE
(/root/reference/models/wan/modules/vae2_2.py): input pixels are 2x2
spatially patchified (12 channels, vae2_2.py:299), the encoder/decoder
stages are residual towers with avg-pool / duplicate-upsample SHORTCUT paths
(AvgDown3D :335 — front-zero-padded temporal pairs regrouped into channels
then group-averaged; DupUp3D :389 — channel repeat reshaped into t/s
upsampling, first chunk drops the leading frame), plus the same
first-frame-special Resample time convs as the 2.1 VAE.  enc dim 160,
dec dim 256, temporal downsample (False, True, True).

Full-sequence formulation with static shapes (chunked/cached scan variant
can follow the 2.1 pattern in vae_scan.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .vae import (causal_conv3d, conv2d, vae_rms_norm, _resblock, _attnblock,
                  _up2d, _down2d, _conv_p, _conv2_p, _init_tower)

# Wan2.2 latent normalization constants (vae2_2.py:1161-1268)
WAN22_MEAN = np.array([
    -0.2289, -0.0052, -0.1323, -0.2339, -0.2799, 0.0174, 0.1838, 0.1557,
    -0.1382, 0.0542, 0.2813, 0.0891, 0.1570, -0.0098, 0.0375, -0.1825,
    -0.2246, -0.1207, -0.0698, 0.5109, 0.2665, -0.2108, -0.2158, 0.2502,
    -0.2055, -0.0322, 0.1109, 0.1567, -0.0729, 0.0899, -0.2799, -0.1230,
    -0.0313, -0.1649, 0.0117, 0.0723, -0.2839, -0.2083, -0.0520, 0.3748,
    0.0152, 0.1957, 0.1433, -0.2944, 0.3573, -0.0548, -0.1681, -0.0667],
    dtype=np.float32)
WAN22_STD = np.array([
    0.4765, 1.0364, 0.4514, 1.1677, 0.5313, 0.4990, 0.4818, 0.5013,
    0.8158, 1.0344, 0.5894, 1.0901, 0.6885, 0.6165, 0.8454, 0.4978,
    0.5759, 0.3523, 0.7135, 0.6804, 0.5833, 1.4146, 0.8986, 0.5659,
    0.7069, 0.5338, 0.4889, 0.4917, 0.4069, 0.4999, 0.6866, 0.4093,
    0.5709, 0.6065, 0.6415, 0.4944, 0.5726, 1.2042, 0.5458, 1.6887,
    0.3971, 1.0600, 0.3943, 0.5537, 0.5444, 0.4089, 0.7468, 0.7744],
    dtype=np.float32)


@dataclasses.dataclass(frozen=True)
class Wan22VAEConfig:
    dim: int = 160
    dec_dim: int = 256
    z_dim: int = 48
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    temporal_downsample: Tuple[bool, ...] = (False, True, True)


def _patchify(x, p: int = 2):
    """[B,T,H,W,C] -> [B,T,H/p,W/p,C*p*p], feature order (c, r, q) matching
    the reference rearrange 'b c (h q) (w r) -> b (c r q) h w'
    (vae2_2.py:304)."""
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)   # [b,t,h/p,w/p,c,r,q]
    return x.reshape(b, t, h // p, w // p, c * p * p)


def _unpatchify(x, p: int = 2):
    b, t, h, w, cpp = x.shape
    c = cpp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)     # [...,c,r,q]
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)   # [b,t,h,q,w,r,c]
    return x.reshape(b, t, h * p, w * p, c)


def avg_down3d(x, out_channels: int, factor_t: int, factor_s: int):
    """AvgDown3D (vae2_2.py:335): front-pad T to a multiple of factor_t,
    fold (t,s,s) factors into channels, group-average to out_channels."""
    b, t, h, w, c = x.shape
    pad_t = (factor_t - t % factor_t) % factor_t
    if pad_t:
        x = jnp.concatenate([jnp.zeros((b, pad_t, h, w, c), x.dtype), x],
                            axis=1)
        t = t + pad_t
    x = x.reshape(b, t // factor_t, factor_t, h // factor_s, factor_s,
                  w // factor_s, factor_s, c)
    # torch layout: channels-first view (C, ft, fh, fw) flattened as
    # C*factor with C outermost -> group over (ft, fh, fw) AND channel tail
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)   # [b, T, H, W, c, ft, fh, fw]
    factor = factor_t * factor_s * factor_s
    x = x.reshape(b, t // factor_t, h // factor_s, w // factor_s, c * factor)
    group = c * factor // out_channels
    x = x.reshape(*x.shape[:-1], out_channels, group)
    return x.mean(axis=-1)


def dup_up3d(x, out_channels: int, factor_t: int, factor_s: int,
             first_chunk: bool):
    """DupUp3D (vae2_2.py:389): channel repeat -> (t,s,s) duplication."""
    b, t, h, w, c = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_channels * factor // c
    x = jnp.repeat(x, repeats, axis=-1)  # channel-last repeat_interleave
    x = x.reshape(b, t, h, w, out_channels, factor_t, factor_s, factor_s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)  # b,t,ft,h,fh,w,fw,c
    x = x.reshape(b, t * factor_t, h * factor_s, w * factor_s, out_channels)
    if first_chunk:
        x = x[:, factor_t - 1:]
    return x


def _down3d_22(p, x):
    x = _down2d(p, x)
    first = x[:, :1]
    rest = causal_conv3d(x, p["time_conv"]["w"], p["time_conv"]["b"],
                         stride=(2, 1, 1), time_pad=0)
    return jnp.concatenate([first, rest], axis=1)


def _up3d_22(p, x):
    """2.2 upsample3d keeps channels (conv dim->dim, vae2_2.py:106-118);
    temporal doubling with first-frame passthrough as in 2.1."""
    b, t, h, w, c = x.shape
    first = x[:, :1]
    if t > 1:
        rest = causal_conv3d(x[:, 1:], p["time_conv"]["w"],
                             p["time_conv"]["b"])
        rest = rest.reshape(b, t - 1, h, w, 2, c)
        rest = rest.transpose(0, 1, 4, 2, 3, 5).reshape(b, 2 * (t - 1), h, w, c)
        x = jnp.concatenate([first, rest], axis=1)
    return _up2d_keep(p, x)


# ---------------------------------------------------------------------------

def init_wan22_vae(key, cfg: Wan22VAEConfig = Wan22VAEConfig(),
                   dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))

    def res_p(din, dout):
        return _init_tower(keys, [("res", din, dout)], dtype)[0]

    def stage_down(i, din, dout):
        tdown = cfg.temporal_downsample[i] if i < 3 else False
        down = i != len(cfg.dim_mult) - 1
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks):
            blocks.append(res_p(d, dout))
            d = dout
        p = {"blocks": blocks}
        if down:
            p["resample"] = {"conv": _conv2_p(next(keys), 3, 3, dout, dout,
                                              dtype)}
            if tdown:
                p["resample"]["time_conv"] = _conv_p(next(keys), 3, 1, 1,
                                                     dout, dout, dtype)
        return p

    def stage_up(i, din, dout):
        t_up = cfg.temporal_downsample[::-1]
        tup = t_up[i] if i < 3 else False
        up = i != len(cfg.dim_mult) - 1
        blocks = []
        d = din
        for _ in range(cfg.num_res_blocks + 1):
            blocks.append(res_p(d, dout))
            d = dout
        p = {"blocks": blocks}
        if up:
            p["resample"] = {"conv": _conv2_p(next(keys), 3, 3, dout, dout,
                                              dtype),
                             "time_conv": _conv_p(next(keys), 3, 1, 1, dout,
                                                  2 * dout, dtype)}
            if not tup:
                p["resample"].pop("time_conv")
        return p

    enc_dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    dec_dims = [cfg.dec_dim * u for u in (cfg.dim_mult[-1],)
                + tuple(cfg.dim_mult[::-1])]
    big_e, big_d = enc_dims[-1], dec_dims[0]

    def mid(d):
        return [res_p(d, d),
                _init_tower(keys, [("attn", d, d)], dtype)[0],
                res_p(d, d)]

    return {
        "encoder": {
            "conv1": _conv_p(next(keys), 3, 3, 3, 12, cfg.dim, dtype),
            "down": [stage_down(i, enc_dims[i], enc_dims[i + 1])
                     for i in range(4)],
            "mid": mid(big_e),
            "head_norm": jnp.ones((big_e,), dtype),
            "head_conv": _conv_p(next(keys), 3, 3, 3, big_e, 2 * cfg.z_dim,
                                 dtype),
        },
        "conv1": _conv_p(next(keys), 1, 1, 1, 2 * cfg.z_dim, 2 * cfg.z_dim,
                         dtype),
        "conv2": _conv_p(next(keys), 1, 1, 1, cfg.z_dim, cfg.z_dim, dtype),
        "decoder": {
            "conv1": _conv_p(next(keys), 3, 3, 3, cfg.z_dim, big_d, dtype),
            "mid": mid(big_d),
            "up": [stage_up(i, dec_dims[i], dec_dims[i + 1])
                   for i in range(4)],
            "head_norm": jnp.ones((dec_dims[-1],), dtype),
            "head_conv": _conv_p(next(keys), 3, 3, 3, dec_dims[-1], 12,
                                 dtype),
        },
    }


def _run_res_blocks(blocks, x):
    for bp in blocks:
        x = _resblock(bp, x)
    return x


def _mid(params, x):
    x = _resblock(params[0], x)
    x = _attnblock(params[1], x)
    return _resblock(params[2], x)


def wan22_vae_encode(params, cfg: Wan22VAEConfig, video):
    """video: [B, T, H, W, 3] in [-1, 1] -> latents [B, T_lat, H/16, W/16,
    48] normalized."""
    x = _patchify(jnp.asarray(video, jnp.float32))
    enc = params["encoder"]
    x = causal_conv3d(x, enc["conv1"]["w"], enc["conv1"]["b"])
    for i, stage in enumerate(enc["down"]):
        tdown = cfg.temporal_downsample[i] if i < 3 else False
        down = i != 3
        dout = stage["blocks"][0]["conv1"]["w"].shape[-1]
        shortcut = avg_down3d(x, dout, factor_t=2 if tdown else 1,
                              factor_s=2 if down else 1)
        x = _run_res_blocks(stage["blocks"], x)
        if down:
            x = _down3d_22(stage["resample"], x) if tdown \
                else _down2d(stage["resample"], x)
        x = x + shortcut
    x = _mid(enc["mid"], x)
    x = vae_rms_norm(x, enc["head_norm"])
    x = jax.nn.silu(x)
    x = causal_conv3d(x, enc["head_conv"]["w"], enc["head_conv"]["b"])
    x = causal_conv3d(x, params["conv1"]["w"], params["conv1"]["b"])
    mu = x[..., :cfg.z_dim]
    return (mu - WAN22_MEAN) / WAN22_STD


def wan22_vae_decode(params, cfg: Wan22VAEConfig, latents):
    """latents: [B, T_lat, h, w, 48] normalized -> video
    [B, 1+4*(T_lat-1), 16h, 16w, 3] in [-1, 1]."""
    z = latents * WAN22_STD + WAN22_MEAN
    z = causal_conv3d(z, params["conv2"]["w"], params["conv2"]["b"])
    dec = params["decoder"]
    x = causal_conv3d(z, dec["conv1"]["w"], dec["conv1"]["b"])
    x = _mid(dec["mid"], x)
    t_up = cfg.temporal_downsample[::-1]
    for i, stage in enumerate(dec["up"]):
        tup = t_up[i] if i < 3 else False
        up = i != 3
        x_in = x
        x = _run_res_blocks(stage["blocks"], x)
        if up:
            x = _up3d_22(stage["resample"], x) if tup \
                else _up2d_keep(stage["resample"], x)
            out_ch = x.shape[-1]
            shortcut = dup_up3d(x_in, out_ch, factor_t=2 if tup else 1,
                                factor_s=2, first_chunk=True)
            x = x + shortcut
    x = vae_rms_norm(x, dec["head_norm"])
    x = jax.nn.silu(x)
    x = causal_conv3d(x, dec["head_conv"]["w"], dec["head_conv"]["b"])
    x = _unpatchify(x)
    return jnp.clip(x, -1.0, 1.0)


def wan22_vae_decode_tiled(params, cfg: Wan22VAEConfig, latents,
                           tile_size: int = 256, decode_fn=None):
    """Spatially-tiled 2.2 decode with overlap blending — bounds decoder
    activation memory by pixel tile (reference vae2_2.py:894
    spatial_tiled_decode: latent tiles of tile_size/16 on a 0.75-overlap
    grid, seams blended over the 0.25 band, cropped to row_limit).

    The 16x spatial stride makes the full-clip decode at 720p/121f blow
    HBM on a 16 GB chip (observed in bench_ti2v_5b r05); tiling is the
    reference's own answer and each distinct tile shape compiles once."""
    from .vae_scan import blend_v, blend_h
    tl = tile_size // 16                      # latent tile (stride 16)
    overlap = int(tl * 0.75)                  # latent stride
    blend = int(tile_size * 0.25)             # pixel blend band
    row_limit = tile_size - blend
    h, w = latents.shape[2], latents.shape[3]
    if decode_fn is None:
        # params as a jit ARGUMENT, not a closure — closed-over weights
        # are captured as lowering constants (2.2 GB at the full 2.2 VAE,
        # observed r05) and re-shipped to the compiler per tile shape
        jdec = jax.jit(lambda p, z: wan22_vae_decode(p, cfg, z))
        dec = lambda z: jdec(params, z)
    else:
        dec = decode_fn
    if h <= tl and w <= tl:
        return dec(latents)
    rows = []
    for i in range(0, h, overlap):
        row = []
        for j in range(0, w, overlap):
            row.append(dec(latents[:, :, i:i + tl, j:j + tl]))
        rows.append(row)
    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = blend_v(rows[i - 1][j], tile, blend)
            if j > 0:
                tile = blend_h(row[j - 1], tile, blend)
            out_row.append(tile[:, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(out_row, axis=3))
    return jnp.concatenate(result_rows, axis=2)


def _up2d_keep(p, x):
    """2.2 spatial upsample keeps channel count (vae2_2.py:106-110)."""
    from .vae import _upsample_nearest2x, _spatial

    def f(y):
        y = _upsample_nearest2x(y)
        return conv2d(y, p["conv"]["w"], p["conv"]["b"])
    return _spatial(f, x)
