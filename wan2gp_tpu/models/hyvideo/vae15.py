"""Hunyuan-Video 1.5 VAE (AutoencoderKLConv3D), TPU-native.

Functional re-implementation of /root/reference/models/hyvideo/vae/
hunyuanvideo_15_vae.py: replicate-pad causal convs (:127-158), channel
RMS norms (:108-125), hierarchical pixel-shuffle Downsample/Upsample with
mean-grouped / repeat-interleave shortcuts and a causally-separated first
frame (:253-342), a frame-causal mid-block attention (:161-215), and
grouped-mean / repeat skip connections at conv_out / conv_in
(:425-428 encoder shortcut, :492 decoder z repeat).

Default geometry: ffactor 16 spatial / 4 temporal, 32 latent channels,
block_out (128, 256, 512, 1024, 1024) — the released
hunyuan_video_1_5_VAE.json; all dims are config-driven.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .vae import _causal_conv3d   # replicate-pad causal conv (NDHWC)


@dataclasses.dataclass(frozen=True)
class Hunyuan15VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 32
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 1024, 1024)
    layers_per_block: int = 2
    ffactor_spatial: int = 16
    ffactor_temporal: int = 4
    scaling_factor: float = 1.0
    shift_factor: float = 0.0
    compute_dtype: Any = jnp.float32


def _plan(cfg: Hunyuan15VAEConfig, decode: bool):
    """Per-level (out_ch, spatial2x, temporal2x) (vae15 :376-377 enc,
    :472-473 dec).  The decoder iterates block_out_channels REVERSED
    (vae15 :562 `block_out_channels=list(reversed(...))`): channels
    NARROW 1024 -> 128 as it upsamples — running it forward kept 1024
    channels at full spatial res (a 41 GB 480p/97f intermediate,
    observed r05) and mismatched every released checkpoint."""
    bo = (tuple(reversed(cfg.block_out_channels)) if decode
          else cfg.block_out_channels)
    nsp = int(np.log2(cfg.ffactor_spatial))
    ntm = int(np.log2(cfg.ffactor_temporal))
    plan = []
    for i in range(len(bo)):
        if decode:
            sp = i < nsp
            tm = i < ntm
        else:
            sp = i < nsp
            tm = sp and i >= (nsp - ntm)
        plan.append((bo[i], sp, tm))
    return plan


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _rms_ch(x, p, eps=1e-12):
    """RMS_norm(images=False): L2-normalize channels * sqrt(C) * gamma
    (+bias) (vae15 :108-125; F.normalize uses eps 1e-12)."""
    x32 = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(x32 * x32, axis=-1, keepdims=True))
    y = x32 / jnp.maximum(norm, eps) * math.sqrt(x.shape[-1])
    y = y * p["gamma"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def _res(p, x):
    h = jax.nn.silu(_rms_ch(x, p["norm1"]).astype(jnp.float32)
                    ).astype(x.dtype)
    h = _causal_conv3d(h, p["conv1"]["w"], p["conv1"]["b"])
    h = jax.nn.silu(_rms_ch(h, p["norm2"]).astype(jnp.float32)
                    ).astype(x.dtype)
    h = _causal_conv3d(h, p["conv2"]["w"], p["conv2"]["b"])
    if "shortcut" in p:
        x = _causal_conv3d(x, p["shortcut"]["w"], p["shortcut"]["b"])
    return x + h


def _mid_attn(p, x):
    """Frame-causal single-head attention (vae15 :184-215)."""
    b, t, h, w, c = x.shape
    y = _rms_ch(x, p["norm"])
    q = _causal_conv3d(y, p["q"]["w"], p["q"]["b"]).reshape(b, t * h * w, c)
    k = _causal_conv3d(y, p["k"]["w"], p["k"]["b"]).reshape(b, t * h * w, c)
    v = _causal_conv3d(y, p["v"]["w"], p["v"]["b"]).reshape(b, t * h * w, c)
    s = jnp.einsum("bld,bsd->bls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(c)
    frame_q = jnp.arange(t * h * w) // (h * w)
    causal = frame_q[:, None] >= frame_q[None, :]
    s = jnp.where(causal[None], s, jnp.finfo(jnp.float32).min)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bls,bsd->bld", a, v).reshape(b, t, h, w, c)
    o = _causal_conv3d(o, p["proj"]["w"], p["proj"]["b"])
    return x + o


def _mid(p, x):
    x = _res(p["block_1"], x)
    x = _mid_attn(p["attn"], x)
    return _res(p["block_2"], x)


def _s2d(x, st, sh, sw):
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // st, st, h // sh, sh, w // sw, sw, c)
    # torch '(c) (f r1)(h r2)(w r3) -> (r1 r2 r3 c)' channel order
    x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    return x.reshape(b, t // st, h // sh, w // sw, st * sh * sw * c)


def _d2s(x, st, sh, sw):
    b, t, h, w, cf = x.shape
    c = cf // (st * sh * sw)
    x = x.reshape(b, t, h, w, st, sh, sw, c)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
    return x.reshape(b, t * st, h * sh, w * sw, c)


def _downsample(p, x, cout, temporal):
    """vae15 :253-296: conv to cout/factor then space-to-depth, first frame
    handled spatially only; shortcut = grouped channel mean."""
    r1 = 2 if temporal else 1
    cin = x.shape[-1]
    factor = r1 * 4
    group = factor * cin // cout
    h = _causal_conv3d(x, p["w"], p["b"])
    if temporal:
        h_first = _s2d(h[:, :1], 1, 2, 2)
        h_first = jnp.concatenate([h_first, h_first], axis=-1)
        h_next = _s2d(h[:, 1:], 2, 2, 2)
        h = jnp.concatenate([h_first, h_next], axis=1)
        x_first = _s2d(x[:, :1], 1, 2, 2)
        b, t1, hh, ww, cf = x_first.shape
        x_first = x_first.reshape(b, t1, hh, ww, cout, group // 2).mean(-1)
        x_next = _s2d(x[:, 1:], 2, 2, 2)
        b, tn, hh, ww, cf = x_next.shape
        x_next = x_next.reshape(b, tn, hh, ww, cout, group).mean(-1)
        short = jnp.concatenate([x_first, x_next], axis=1)
    else:
        h = _s2d(h, 1, 2, 2)
        short = _s2d(x, 1, 2, 2)
        b, tn, hh, ww, cf = short.shape
        short = short.reshape(b, tn, hh, ww, cout, group).mean(-1)
    return h + short


def _upsample(p, x, cout, temporal):
    """vae15 :299-342: conv to cout*factor then depth-to-space; first frame
    spatial-only (half the channels); shortcut = repeat-interleave."""
    r1 = 2 if temporal else 1
    cin = x.shape[-1]
    factor = r1 * 4
    repeats = factor * cout // cin
    h = _causal_conv3d(x, p["w"], p["b"])
    if temporal:
        h_first = _d2s(h[:, :1], 1, 2, 2)          # [.., cout*2]
        h_first = h_first[..., :h_first.shape[-1] // 2]
        h_next = _d2s(h[:, 1:], 2, 2, 2)
        h = jnp.concatenate([h_first, h_next], axis=1)
        x_first = _d2s(x[:, :1], 1, 2, 2)
        x_first = jnp.repeat(x_first, repeats // 2, axis=-1)
        x_next = _d2s(x[:, 1:], 2, 2, 2)
        x_next = jnp.repeat(x_next, repeats, axis=-1)
        short = jnp.concatenate([x_first, x_next], axis=1)
    else:
        h = _d2s(h, 1, 2, 2)
        short = jnp.repeat(x, repeats, axis=-1)
        short = _d2s(short, 1, 2, 2)
    return h + short


# ---------------------------------------------------------------------------
# init / forward
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k ** 3)
    return {"w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _norm_p(c):
    return {"gamma": jnp.ones((c,), jnp.float32)}


def _res_p(key, cin, cout, dtype):
    ks = iter(jax.random.split(key, 3))
    p = {"norm1": _norm_p(cin),
         "conv1": _conv_p(next(ks), cin, cout, dtype=dtype),
         "norm2": _norm_p(cout),
         "conv2": _conv_p(next(ks), cout, cout, dtype=dtype)}
    if cin != cout:
        p["shortcut"] = _conv_p(next(ks), cin, cout, k=1, dtype=dtype)
    return p


def _mid_p(key, c, dtype):
    ks = iter(jax.random.split(key, 8))
    return {"block_1": _res_p(next(ks), c, c, dtype),
            "attn": {"norm": _norm_p(c),
                     "q": _conv_p(next(ks), c, c, k=1, dtype=dtype),
                     "k": _conv_p(next(ks), c, c, k=1, dtype=dtype),
                     "v": _conv_p(next(ks), c, c, k=1, dtype=dtype),
                     "proj": _conv_p(next(ks), c, c, k=1, dtype=dtype)},
            "block_2": _res_p(next(ks), c, c, dtype)}


def init_hunyuan15_vae(key, cfg: Hunyuan15VAEConfig = Hunyuan15VAEConfig(),
                       dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    bo = cfg.block_out_channels
    z = cfg.latent_channels

    enc = {"conv_in": _conv_p(next(keys), cfg.in_channels, bo[0],
                              dtype=dtype), "levels": []}
    cin = bo[0]
    for i, (cout, sp, tm) in enumerate(_plan(cfg, decode=False)):
        blk = {"res": []}
        c = cin
        for _ in range(cfg.layers_per_block):
            blk["res"].append(_res_p(next(keys), c, cout, dtype))
            c = cout
        if sp or tm:
            nxt = bo[i + 1]
            factor = (2 if tm else 1) * 4
            blk["down"] = _conv_p(next(keys), cout, nxt // factor,
                                  dtype=dtype)
            c = nxt
        enc["levels"].append(blk)
        cin = c
    enc["mid"] = _mid_p(next(keys), cin, dtype)
    enc["norm_out"] = _norm_p(cin)
    enc["conv_out"] = _conv_p(next(keys), cin, 2 * z, dtype=dtype)

    # decoder runs over block_out_channels REVERSED (vae15 :562):
    # conv_in z -> bo_r[0] (the widest), channels narrow to bo_r[-1]
    # as spatial/temporal res grows, upsample conv to bo_r[i+1]*factor
    # before the pixel shuffle divides them
    bo_r = tuple(reversed(bo))
    dec = {"conv_in": _conv_p(next(keys), z, bo_r[0], dtype=dtype),
           "mid": _mid_p(next(keys), bo_r[0], dtype), "levels": []}
    cin = bo_r[0]
    for i, (cout, sp, tm) in enumerate(_plan(cfg, decode=True)):
        blk = {"res": []}
        c = cin
        for _ in range(cfg.layers_per_block + 1):
            blk["res"].append(_res_p(next(keys), c, cout, dtype))
            c = cout
        if sp or tm:
            nxt = bo_r[i + 1]
            factor = (2 if tm else 1) * 4
            blk["up"] = _conv_p(next(keys), cout, nxt * factor, dtype=dtype)
            c = nxt
        dec["levels"].append(blk)
        cin = c
    dec["norm_out"] = _norm_p(cin)
    dec["conv_out"] = _conv_p(next(keys), cin, cfg.out_channels,
                              dtype=dtype)
    return {"encoder": enc, "decoder": dec}


def hunyuan15_vae_encode(params, cfg: Hunyuan15VAEConfig, video):
    """video: [B, 3, T, H, W] -> latents [B, z, T', H', W'] (mode of the
    posterior + encoder grouped-mean shortcut, vae15 :425-428)."""
    x = video.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    enc = params["encoder"]
    x = _causal_conv3d(x, enc["conv_in"]["w"], enc["conv_in"]["b"])
    # static per-level geometry comes from the config plan, NOT the
    # params tree — under jit every params leaf is a tracer, unusable
    # in `if temporal:` control flow
    bo = cfg.block_out_channels
    final_ch = bo[0]
    for blk, (i, (cout, sp, tm)) in zip(enc["levels"],
                                        enumerate(_plan(cfg, False))):
        for rp in blk["res"]:
            x = _res(rp, x)
        if "down" in blk:
            x = _downsample(blk["down"], x, bo[i + 1], tm)
            final_ch = bo[i + 1]
        else:
            final_ch = cout
    x = _mid(enc["mid"], x)
    group = final_ch // (2 * cfg.latent_channels)
    b, t, h, w, c = x.shape
    short = x.reshape(b, t, h, w, c // group, group).mean(-1)
    y = jax.nn.silu(_rms_ch(x, enc["norm_out"]).astype(jnp.float32)
                    ).astype(x.dtype)
    y = _causal_conv3d(y, enc["conv_out"]["w"], enc["conv_out"]["b"])
    y = y + short
    mean = y[..., :cfg.latent_channels]
    z = (mean - cfg.shift_factor) * cfg.scaling_factor
    return z.transpose(0, 4, 1, 2, 3)


def hunyuan15_vae_decode(params, cfg: Hunyuan15VAEConfig, latents):
    """latents: [B, z, T', H', W'] -> video [B, 3, T, H, W]."""
    z = latents.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    z = z / cfg.scaling_factor + cfg.shift_factor
    dec = params["decoder"]
    bo_r = tuple(reversed(cfg.block_out_channels))   # vae15 :562
    repeats = bo_r[0] // cfg.latent_channels
    x = _causal_conv3d(z, dec["conv_in"]["w"], dec["conv_in"]["b"]) \
        + jnp.repeat(z, repeats, axis=-1)
    x = _mid(dec["mid"], x)
    for blk, (i, (cout, sp, tm)) in zip(dec["levels"],
                                        enumerate(_plan(cfg, True))):
        for rp in blk["res"]:
            x = _res(rp, x)
        if "up" in blk:
            x = _upsample(blk["up"], x, bo_r[i + 1], tm)
    x = jax.nn.silu(_rms_ch(x, dec["norm_out"]).astype(jnp.float32)
                    ).astype(x.dtype)
    x = _causal_conv3d(x, dec["conv_out"]["w"], dec["conv_out"]["b"])
    return x.transpose(0, 4, 1, 2, 3)


def _blend_axis(prev, tile, extent: int, axis: int):
    """Linear seam blend along `axis` (same ramp as the reference's
    spatial tiled decode, models/hyvideo/vae/hunyuanvideo_15_vae.py
    blend_v/blend_h): the first `extent` slices of `tile` ramp from the
    last `extent` slices of `prev`."""
    extent = min(prev.shape[axis], tile.shape[axis], int(extent))
    if extent <= 0:
        return tile
    shape = [1] * tile.ndim
    shape[axis] = extent
    w = (jnp.arange(extent, dtype=tile.dtype) / extent).reshape(shape)
    head = [slice(None)] * axis + [slice(0, extent)]
    tail = [slice(None)] * axis + [slice(-extent, None)]
    mixed = tile[tuple(head)] * w + prev[tuple(tail)] * (1.0 - w)
    return tile.at[tuple(head)].set(mixed)


def hunyuan15_vae_decode_tiled(params, cfg: Hunyuan15VAEConfig, latents,
                               tile_size: int = 256, decode_fn=None):
    """Spatially-tiled decode with overlap blending — bounds decoder
    activation memory by pixel tile (the reference's spatial tiled
    decode strategy, as in vae2_2.py:894 spatial_tiled_decode: latent
    tiles of tile_size/16 on a 0.75-overlap grid, seams blended over
    the 0.25 band, cropped to row_limit).

    The full-clip 480p/97f decode allocates a 41 GB fused intermediate
    (f32[97,120,8,27,4096], observed r05 on the 16 GB chip); tiling is
    mandatory at video resolutions.  latents: [B, z, T', H', W'].
    Each distinct tile shape compiles once."""
    if decode_fn is None:
        # params as a jit ARGUMENT, not a closure — closed-over weights
        # are captured as lowering constants and re-shipped per tile shape
        jdec = jax.jit(lambda p, z: hunyuan15_vae_decode(p, cfg, z))
        dec = lambda z: jdec(params, z)
    else:
        dec = decode_fn
    tl = tile_size // cfg.ffactor_spatial       # latent tile
    stride = int(tl * 0.75)                     # latent stride
    blend = int(tile_size * 0.25)               # pixel blend band
    row_limit = tile_size - blend
    h, w = latents.shape[3], latents.shape[4]
    if h <= tl and w <= tl:
        return dec(latents)
    rows = []
    for i in range(0, h, stride):
        rows.append([dec(latents[:, :, :, i:i + tl, j:j + tl])
                     for j in range(0, w, stride)])
    result_rows = []
    for i, row in enumerate(rows):
        out_row = []
        for j, tile in enumerate(row):
            if i > 0:
                tile = _blend_axis(rows[i - 1][j], tile, blend, 3)
            if j > 0:
                tile = _blend_axis(row[j - 1], tile, blend, 4)
            out_row.append(tile[:, :, :, :row_limit, :row_limit])
        result_rows.append(jnp.concatenate(out_row, axis=4))
    return jnp.concatenate(result_rows, axis=3)


def load_hunyuan15_vae_params(sd: Dict[str, Any],
                              cfg: Hunyuan15VAEConfig = Hunyuan15VAEConfig(),
                              dtype=jnp.float32):
    """Torch key space (AutoencoderKLConv3D): {encoder,decoder}.{conv_in
    .conv, down/up.N.{block.M.{norm1.gamma, conv1.conv, norm2.gamma,
    conv2.conv, nin_shortcut}, downsample/upsample.conv.conv}, mid.
    {block_1, attn_1.{norm.gamma, q, k, v, proj_out}, block_2},
    norm_out.gamma, conv_out.conv} — CausalConv3d wraps its conv as
    `.conv`, the 1x1 attn/shortcut convs are plain Conv3d."""
    sd = {k[4:] if k.startswith("vae.") else k: v for k, v in sd.items()}

    def conv(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        return {"w": jnp.asarray(np.ascontiguousarray(
            w.transpose(2, 3, 4, 1, 0))).astype(dtype),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32)).astype(dtype)}

    def norm(name):
        p = {"gamma": jnp.asarray(np.asarray(sd.pop(f"{name}.gamma"),
                                             np.float32).reshape(-1))}
        if f"{name}.bias" in sd:
            p["bias"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                               np.float32).reshape(-1))
        return p

    def res(pre):
        p = {"norm1": norm(f"{pre}.norm1"),
             "conv1": conv(f"{pre}.conv1.conv"),
             "norm2": norm(f"{pre}.norm2"),
             "conv2": conv(f"{pre}.conv2.conv")}
        if f"{pre}.nin_shortcut.weight" in sd:
            p["shortcut"] = conv(f"{pre}.nin_shortcut")
        return p

    def mid(pre):
        return {"block_1": res(f"{pre}.block_1"),
                "attn": {"norm": norm(f"{pre}.attn_1.norm"),
                         "q": conv(f"{pre}.attn_1.q"),
                         "k": conv(f"{pre}.attn_1.k"),
                         "v": conv(f"{pre}.attn_1.v"),
                         "proj": conv(f"{pre}.attn_1.proj_out")},
                "block_2": res(f"{pre}.block_2")}

    bo = cfg.block_out_channels
    enc = {"conv_in": conv("encoder.conv_in.conv"), "levels": []}
    for i, (cout, sp, tm) in enumerate(_plan(cfg, decode=False)):
        blk = {"res": [res(f"encoder.down.{i}.block.{j}")
                       for j in range(cfg.layers_per_block)]}
        if sp or tm:
            blk["down"] = conv(f"encoder.down.{i}.downsample.conv.conv")
        enc["levels"].append(blk)
    enc["mid"] = mid("encoder.mid")
    enc["norm_out"] = norm("encoder.norm_out")
    enc["conv_out"] = conv("encoder.conv_out.conv")

    dec = {"conv_in": conv("decoder.conv_in.conv"),
           "mid": mid("decoder.mid"), "levels": []}
    for i, (cout, sp, tm) in enumerate(_plan(cfg, decode=True)):
        blk = {"res": [res(f"decoder.up.{i}.block.{j}")
                       for j in range(cfg.layers_per_block + 1)]}
        if sp or tm:
            blk["up"] = conv(f"decoder.up.{i}.upsample.conv.conv")
        dec["levels"].append(blk)
    dec["norm_out"] = norm("decoder.norm_out")
    dec["conv_out"] = conv("decoder.conv_out.conv")
    return {"encoder": enc, "decoder": dec}, sorted(sd.keys())
