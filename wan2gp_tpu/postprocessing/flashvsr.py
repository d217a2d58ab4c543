"""FlashVSR 4x diffusion video super-resolution, TPU-native.

Re-implementation of /root/reference/postprocessing/flashvsr/:
- a ONE-STEP distilled Wan-1.3B-class DiT (runtime.py:494: fixed timestep
  1000, single forward) conditioned on the low-quality video through
  Causal_LQ4x_Proj (utils.py:411 — 16x16 pixel-shuffle + two stride-2
  causal conv3d stages + per-block linears) whose output is ADDED to the
  token stream before block 0 (wan_video_dit.py:802, layer_num=1);
- TCDecoder (tcdecoder.py TAEHV): a tiny causal video decoder (MemBlock
  frame-memory convs, TGrow temporal upscale, nearest 2x spatial
  upsamples, identity-deepened ReLU stages) that decodes the denoised
  latents CONCATENATED with the pixel-shuffled LQ frames.

TPU notes: the reference streams 2-latent-frame chunks with KV caches and
top-k windowed sparse attention (Triton); here the whole clip is denoised
in ONE jitted forward — full attention replaces the top-k approximation
(exact rather than sparse; the clip is bounded by the upscaler use case).
MemBlock temporal memory becomes a frame-shifted concat.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.wan.dit import (WanDiTConfig, init_wan_dit, patchify,
                              unpatchify, _dense, _block,
                              sinusoidal_embedding_1d)
from ..models.wan.vae import causal_conv3d
from ..ops.rope import build_rope_3d


# ---------------------------------------------------------------------------
# LQ projection (utils.py Causal_LQ4x_Proj:411)
# ---------------------------------------------------------------------------

def pixel_shuffle_3d(x, ff, hh, ww):
    """[B, C, F, H, W] -> [B, C*ff*hh*ww, F/ff, H/hh, W/ww]; short F pads
    with the first frame at the FRONT (tcdecoder.py PixelShuffle3d:73)."""
    b, c, f, h, w = x.shape
    if f % ff != 0:
        first = jnp.repeat(x[:, :, :1], ff - f % ff, axis=2)
        x = jnp.concatenate([first, x], axis=2)
        f = x.shape[2]
    x = x.reshape(b, c, f // ff, ff, h // hh, hh, w // ww, ww)
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, c * ff * hh * ww, f // ff, h // hh, w // ww)


def init_lq_proj(key, out_dim: int = 1536, layer_num: int = 1,
                 dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8 + layer_num))
    in_c = 3 * 16 * 16
    h1, h2 = 2048, 3072

    def c3(cin, cout, kt, kh, kw):
        s = 1.0 / math.sqrt(cin * kt * kh * kw)
        return {"w": jax.random.uniform(
            next(keys), (kt, kh, kw, cin, cout), jnp.float32,
            -s, s).astype(dtype), "b": jnp.zeros((cout,), dtype)}

    def lin(cin, cout):
        s = 1.0 / math.sqrt(cin)
        return {"w": jax.random.uniform(next(keys), (cin, cout),
                                        jnp.float32, -s, s).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    return {
        "conv1": c3(in_c, h1, 4, 3, 3),
        "norm1": jnp.ones((h1,), jnp.float32),
        "conv2": c3(h1, h2, 4, 3, 3),
        "norm2": jnp.ones((h2,), jnp.float32),
        "linears": [lin(h2, out_dim) for _ in range(layer_num)],
    }


def _rms_last(x, g):
    c = x.shape[-1]
    y = x.astype(jnp.float32)
    n = jnp.sqrt(jnp.sum(y * y, axis=-1, keepdims=True))
    return (y / jnp.maximum(n, 1e-12) * math.sqrt(c) * g).astype(x.dtype)


def lq_proj_forward(params, video):
    """video: [B, 3, T, H, W] in [-1, 1] (LQ clip at the OUTPUT size).
    Returns per-block token additions: list of [B, L, out_dim] with
    L = ceil(T/4) * H/16 * W/16 (utils.py:437-469: 3 repeated first
    frames prepended, two stride-2 causal temporal convs; the first
    4-frame chunk only primes the conv2 cache)."""
    first = jnp.repeat(video[:, :, :1], 3, axis=2)
    video = jnp.concatenate([first, video], axis=2)
    x = pixel_shuffle_3d(video, 1, 16, 16)       # [B, 768, T+3, h, w]
    x = x.transpose(0, 2, 3, 4, 1)               # NTHWC
    # reference CausalConv3d pads 2*padding[0] = 2 on the time axis
    x = causal_conv3d(x, params["conv1"]["w"], params["conv1"]["b"],
                      stride=(2, 1, 1), time_pad=2)
    x = jax.nn.silu(_rms_last(x, params["norm1"]).astype(jnp.float32)
                    ).astype(x.dtype)
    x = causal_conv3d(x, params["conv2"]["w"], params["conv2"]["b"],
                      stride=(2, 1, 1), time_pad=2)
    x = jax.nn.silu(_rms_last(x, params["norm2"]).astype(jnp.float32)
                    ).astype(x.dtype)
    # drop the priming chunk's output frame (reference skips i == 0)
    x = x[:, 1:]
    b, f, h, w, c = x.shape
    tokens = x.reshape(b, f * h * w, c)
    out = []
    for lp in params["linears"]:
        y = jnp.dot(tokens.astype(jnp.float32), lp["w"].astype(jnp.float32))
        out.append(y + lp["b"].astype(jnp.float32))
    return out


# ---------------------------------------------------------------------------
# one-step DiT denoise
# ---------------------------------------------------------------------------

def flashvsr_step(dit_params, cfg: WanDiTConfig, noise, lq_adds, context,
                  attn_backend: str = "auto"):
    """noise: [B, 16, F, H, W] latents; lq_adds: list of [B, L, dim] token
    additions (one entry = before block 0 in the shipped config,
    wan_video_dit.py:802); context: [B, Lt, text_dim].
    One forward at t=1000; sigma-1 flow matching -> x0 = noise - velocity.
    """
    from ..ops.norms import layer_norm
    b = noise.shape[0]
    pt, ph, pw = cfg.patch_size
    grid = (noise.shape[2] // pt, noise.shape[3] // ph,
            noise.shape[4] // pw)
    rope_cos, rope_sin = build_rope_3d(grid, head_dim=cfg.head_dim)

    x = patchify(noise.astype(jnp.float32), cfg.patch_size)
    x = _dense(x, dit_params["patch_embedding"], jnp.float32)
    x = x + lq_adds[0].astype(x.dtype)

    t = jnp.full((1,), 1000.0, jnp.float32)
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = _dense(e, dit_params["time_embedding"]["fc1"], jnp.float32)
    e = _dense(jax.nn.silu(e), dit_params["time_embedding"]["fc2"],
               jnp.float32)
    e0 = _dense(jax.nn.silu(e), dit_params["time_projection"], jnp.float32)
    e6 = jnp.broadcast_to(e0.reshape(1, 1, 6, cfg.dim), (b, 1, 6, cfg.dim))

    cdt = cfg.compute_dtype
    ctx = _dense(context.astype(cdt),
                 dit_params["text_embedding"]["fc1"], cdt)
    ctx = jax.nn.gelu(ctx.astype(jnp.float32), approximate=True).astype(cdt)
    ctx = _dense(ctx, dit_params["text_embedding"]["fc2"], cdt)

    if len(lq_adds) > 1:
        lq_stack = jnp.stack([jnp.zeros_like(lq_adds[0])] + lq_adds[1:])

        def body(carry, xs):
            bp, lq_i = xs
            out = _block(bp, carry + lq_i.astype(carry.dtype), e6, ctx,
                         None, rope_cos, rope_sin, cfg, attn_backend)
            return out, None

        x, _ = jax.lax.scan(body, x, (dit_params["blocks"], lq_stack))
    else:
        def body(carry, bp):
            return _block(bp, carry, e6, ctx, None, rope_cos, rope_sin,
                          cfg, attn_backend), None

        x, _ = jax.lax.scan(body, x, dit_params["blocks"])

    hp = dit_params["head"]
    mod = hp["modulation"].astype(jnp.float32)
    eh = e.reshape(1, 1, 1, cfg.dim) + mod[None, None]   # [1, 1, 2, C]
    l = x.shape[1]
    xr = x.reshape(b, 1, l, cfg.dim).astype(jnp.float32)
    xn = layer_norm(xr, eps=cfg.eps)
    xn = xn * (1.0 + eh[:, :, 1][:, :, None, :]) + eh[:, :, 0][:, :, None, :]
    v = _dense(xn.reshape(b, l, cfg.dim), hp["head"], jnp.float32)
    v = unpatchify(v, grid, cfg.patch_size, cfg.out_dim)
    return noise.astype(jnp.float32) - v


# ---------------------------------------------------------------------------
# TCDecoder (tcdecoder.py TAEHV, decoder-only, identity-deepened)
# ---------------------------------------------------------------------------

TC_LAYOUT = [
    # (index, kind, extra) mirroring the deepened nn.Sequential
    (0, "clamp", None), (1, "conv", True), (2, "relu", None),
    (3, "idconv", None), (4, "relu", None),
    (5, "mem", None), (6, "mem", None), (7, "mem", None),
    (8, "up", None), (9, "tgrow", 1), (10, "conv", False),
    (11, "mem", None), (12, "mem", None), (13, "mem", None),
    (14, "up", None), (15, "tgrow", 2), (16, "conv", False),
    (17, "mem", None), (18, "mem", None), (19, "mem", None),
    (20, "up", None), (21, "tgrow", 2), (22, "conv", False),
    (23, "relu", None), (24, "idconv", None), (25, "relu", None),
    (26, "conv", True),
]


@dataclasses.dataclass(frozen=True)
class TCDecoderConfig:
    latent_channels: int = 16 + 3 * 4 * 8 * 8   # latents + shuffled LQ cond
    channels: Tuple[int, ...] = (512, 256, 128, 128)
    frames_to_trim: int = 3                     # 2^2 - 1


def init_tcdecoder(key, cfg: TCDecoderConfig = TCDecoderConfig(),
                   dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    nf = cfg.channels

    def c2(cin, cout, bias=True, k=3):
        s = 1.0 / math.sqrt(cin * k * k)
        p = {"w": jax.random.uniform(next(keys), (k, k, cin, cout),
                                     jnp.float32, -s, s).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((cout,), dtype)
        return p

    def mem(c):
        return {"conv0": c2(2 * c, c), "conv1": c2(c, c),
                "conv2": c2(c, c)}

    dims = [nf[0]] * 10 + [nf[1]] * 6 + [nf[2]] * 6 + [nf[3], nf[3], 3]
    params: Dict[int, Any] = {}
    cur = cfg.latent_channels
    for idx, kind, extra in TC_LAYOUT:
        if kind == "conv":
            out = {1: nf[0], 10: nf[1], 16: nf[2], 22: nf[3],
                   26: 3}[idx]
            params[idx] = c2(cur, out, bias=extra)
            cur = out
        elif kind == "idconv":
            params[idx] = c2(cur, cur, bias=False)
        elif kind == "mem":
            params[idx] = mem(cur)
        elif kind == "tgrow":
            s = 1.0 / math.sqrt(cur)
            params[idx] = {"w": jax.random.uniform(
                next(keys), (1, 1, cur, cur * extra), jnp.float32,
                -s, s).astype(dtype)}
    return params


def _conv2(x, p, groups=1):
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1),
        [(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def tcdecoder_decode(params, cfg: TCDecoderConfig, latents, lq_frames):
    """latents: [B, T, 16, H, W]; lq_frames: [B, 3, T*4, H*8, W*8] in
    [-1, 1] (the conditioning pixel-shuffle, decode_video:262).  Returns
    RGB frames [B, T*4 - trim, H*16, W*16, 3] in ~[0, 1]."""
    cond = pixel_shuffle_3d(lq_frames, 4, 8, 8)       # [B, 768, T, H, W]
    x = jnp.concatenate([cond.transpose(0, 2, 1, 3, 4), latents], axis=2)
    b, t, c, h, w = x.shape
    x = x.reshape(b * t, c, h, w).transpose(0, 2, 3, 1)   # NHWC per frame
    n_t = t

    for idx, kind, extra in TC_LAYOUT:
        if kind == "clamp":
            x = jnp.tanh(x / 3.0) * 3.0
        elif kind in ("conv", "idconv"):
            x = _conv2(x, params[idx])
        elif kind == "relu":
            x = jax.nn.relu(x)
        elif kind == "mem":
            # past = previous frame's features (zeros at t=0)
            bt, hh, ww, cc = x.shape
            xt = x.reshape(b, n_t, hh, ww, cc)
            past = jnp.concatenate(
                [jnp.zeros_like(xt[:, :1]), xt[:, :-1]], axis=1)
            inp = jnp.concatenate([xt, past], axis=-1).reshape(
                b * n_t, hh, ww, 2 * cc)
            mp = params[idx]
            y = jax.nn.relu(_conv2(inp, mp["conv0"]))
            y = jax.nn.relu(_conv2(y, mp["conv1"]))
            y = _conv2(y, mp["conv2"])
            x = jax.nn.relu(y + x)      # skip is identity (n_in == n_out)
        elif kind == "up":
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        elif kind == "tgrow":
            stride = extra
            y = _conv2(x, params[idx])                 # [BT, H, W, C*s]
            bt, hh, ww, cs = y.shape
            cc = cs // stride
            y = y.reshape(b, n_t, hh, ww, stride, cc)
            y = y.transpose(0, 1, 4, 2, 3, 5)
            n_t = n_t * stride
            x = y.reshape(b * n_t, hh, ww, cc)
    bt, hh, ww, cc = x.shape
    out = x.reshape(b, n_t, hh, ww, cc)
    return out[:, cfg.frames_to_trim:]


# ---------------------------------------------------------------------------
# orchestration
# ---------------------------------------------------------------------------

class FlashVSRPipeline:
    """LQ frames [T, H, W, 3] uint8 -> 4x upscaled frames (one-step)."""

    def __init__(self, dit_params, dit_cfg: WanDiTConfig, lq_params,
                 tc_params, tc_cfg: TCDecoderConfig, context=None,
                 attn_backend: str = "auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.lq_params = lq_params
        self.tc_params = tc_params
        self.tc_cfg = tc_cfg
        self.context = context
        self.attn_backend = attn_backend

    def upscale(self, frames: np.ndarray, seed: int = 0) -> np.ndarray:
        cfg = self.dit_cfg
        t, h, w, _ = frames.shape
        oh, ow = h * 4, w * 4
        lat_h, lat_w = oh // 8, ow // 8
        # pad with last-frame repeats so the decoded clip covers all T
        # frames: lat_f = (T'+3)//4 - 1 and output = lat_f*4 - 3
        # (reference _pad_conditioning_frames, runtime.py:136)
        t_in = t
        while ((t_in + 3) // 4 - 1) * 4 - 3 < t:
            t_in += 4
        if t_in > t:
            frames = np.concatenate(
                [frames, np.repeat(frames[-1:], t_in - t, axis=0)], axis=0)
        lq = jnp.asarray(frames, jnp.float32) / 127.5 - 1.0
        lq = lq.transpose(3, 0, 1, 2)[None]           # [1, 3, T', H, W]
        lq_up = jnp.repeat(jnp.repeat(lq, 4, axis=3), 4, axis=4)
        lq_adds = lq_proj_forward(self.lq_params, lq_up)
        # latent frame count follows the LQ-projection token grid
        lat_f = lq_adds[0].shape[1] // ((lat_h // 2) * (lat_w // 2))

        ctx = (self.context if self.context is not None else
               jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32))
        noise = jax.random.normal(
            jax.random.key(seed), (1, cfg.in_dim, lat_f, lat_h, lat_w),
            jnp.float32)
        latents = flashvsr_step(self.dit_params, cfg, noise, lq_adds, ctx,
                                self.attn_backend)
        # TCDecoder wants [B, T_lat, 16, h/2, w/2]-style NTCHW latents
        lat = latents.transpose(0, 2, 1, 3, 4)
        # pad/trim the LQ cond to exactly 4*T_lat frames
        need = lat_f * 4
        have = lq_up.shape[2]
        if need > have:
            lq_pad = jnp.concatenate(
                [lq_up, jnp.repeat(lq_up[:, :, -1:], need - have, axis=2)],
                axis=2)
        else:
            lq_pad = lq_up[:, :, :need]
        out = tcdecoder_decode(self.tc_params, self.tc_cfg, lat, lq_pad)
        out = np.asarray(jnp.clip(out[0], 0.0, 1.0))
        out = (out * 255).astype(np.uint8)
        return out[:t]


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------

def load_lq_proj_params(sd, dtype=jnp.float32):
    """utils.py Causal_LQ4x_Proj key space: conv1/conv2 (Conv3d),
    norm1/norm2 (RMS_norm gamma [C,1,1,1]), linear_layers.N."""
    sd = dict(sd)

    def c3(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def gamma(name):
        g = np.asarray(sd.pop(f"{name}.gamma"), np.float32)
        return jnp.asarray(g.reshape(-1))

    params = {"conv1": c3("conv1"), "norm1": gamma("norm1"),
              "conv2": c3("conv2"), "norm2": gamma("norm2"),
              "linears": []}
    i = 0
    while f"linear_layers.{i}.weight" in sd:
        params["linears"].append({
            "w": jnp.asarray(np.asarray(
                sd.pop(f"linear_layers.{i}.weight"),
                np.float32).T).astype(dtype),
            "b": jnp.asarray(np.asarray(
                sd.pop(f"linear_layers.{i}.bias"),
                np.float32)).astype(dtype)})
        i += 1
    return params, sorted(sd.keys())


def load_tcdecoder_params(sd, cfg: TCDecoderConfig = TCDecoderConfig(),
                          dtype=jnp.float32):
    """tcdecoder.py TAEHV decoder key space: decoder.N.{weight,bias} for
    convs / idconvs, decoder.N.conv.{0,2,4}.* + skip for MemBlocks,
    decoder.N.conv.weight for TGrow."""
    sd = {k[len("taehv."):] if k.startswith("taehv.") else k: v
          for k, v in dict(sd).items()}

    def c2(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    params = {}
    for idx, kind, extra in TC_LAYOUT:
        pre = f"decoder.{idx}"
        if kind in ("conv", "idconv"):
            params[idx] = c2(pre)
        elif kind == "mem":
            params[idx] = {"conv0": c2(f"{pre}.conv.0"),
                           "conv1": c2(f"{pre}.conv.2"),
                           "conv2": c2(f"{pre}.conv.4")}
            sd.pop(f"{pre}.skip.weight", None)
        elif kind == "tgrow":
            w = np.asarray(sd.pop(f"{pre}.conv.weight"), np.float32)
            params[idx] = {"w": jnp.asarray(
                w.transpose(2, 3, 1, 0)).astype(dtype)}
    leftover = [k for k in sd if "pixel_shuffle" not in k]
    return params, sorted(leftover)
