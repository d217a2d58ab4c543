"""RIFE HDv3 frame interpolation (IFNet), TPU-native.

Functional re-implementation of the reference temporal upsampler
(/root/reference/postprocessing/rife/IFNet_HDv3.py): three IFBlocks (c=90)
run coarse-to-fine at scales [4, 2, 1]; each block sees both warped frames
plus the running occlusion mask, predicts a bidirectional flow/mask update
(averaged with its mirrored call, :113-118), and frames are backward-warped
with border-padded align-corners bilinear sampling (:10-24 warp).  Output
= sigmoid-mask blend of the two warps.  x2/x4 upsampling inserts midpoints
recursively (inference.py:40-52).

Layout: NHWC; convs via lax.conv_general_dilated, transposed convs via
lhs-dilated convs with flipped kernels (validated against torch in
tests/test_rife.py).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# primitives (NHWC)
# ---------------------------------------------------------------------------

def conv2d(x, w, b, stride=1, padding=1):
    """x: [B,H,W,C]; w: [kh,kw,Cin,Cout] (torch layout converted)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def conv_transpose2d(x, w, b, stride=2, padding=1):
    """torch ConvTranspose2d(k, s, p) equivalent: lhs-dilated conv with a
    spatially-flipped, in/out-swapped kernel.  w: [kh,kw,Cout,Cin] stored
    pre-flipped by the loader (see load_rife_params)."""
    k = w.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b.astype(y.dtype)


def prelu(x, alpha):
    """Per-channel PReLU: x if x>0 else alpha*x."""
    return jnp.where(x > 0, x, x * alpha.astype(x.dtype))


def resize_bilinear(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[3]), "bilinear")


def warp(img, flow):
    """Backward warp, border padding, align_corners=True bilinear
    (IFNet_HDv3.py:10-24).  img: [B,H,W,C]; flow: [B,H,W,2] (x, y) in
    pixel units."""
    b, h, w, _ = img.shape
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gx = jnp.clip(xs + flow[..., 0], 0.0, w - 1.0)
    gy = jnp.clip(ys + flow[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = jnp.minimum(x0 + 1, w - 1.0)
    y1 = jnp.minimum(y0 + 1, h - 1.0)
    wx = (gx - x0)[..., None]
    wy = (gy - y0)[..., None]

    def gather(yc, xc):
        idx = (yc * w + xc).astype(jnp.int32).reshape(b, -1)
        flat = img.reshape(b, h * w, -1)
        return jnp.take_along_axis(flat, idx[..., None], axis=1
                                   ).reshape(b, h, w, -1)

    v00 = gather(y0, x0)
    v01 = gather(y0, x1)
    v10 = gather(y1, x0)
    v11 = gather(y1, x1)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# IFNet
# ---------------------------------------------------------------------------

IFBLOCK_C = 90


def _ifblock(p, x, flow, scale):
    b, h, w, _ = x.shape
    hs, ws = h // scale, w // scale
    x = resize_bilinear(x, hs, ws)
    flow = resize_bilinear(flow, hs, ws) / scale
    feat = jnp.concatenate([x, flow], axis=-1)
    feat = prelu(conv2d(feat, p["c0a"]["w"], p["c0a"]["b"], stride=2),
                 p["c0a"]["alpha"])
    feat = prelu(conv2d(feat, p["c0b"]["w"], p["c0b"]["b"], stride=2),
                 p["c0b"]["alpha"])
    for blk in ("cb0", "cb1", "cb2", "cb3"):
        y = feat
        for part in ("a", "b"):
            q = p[f"{blk}{part}"]
            y = prelu(conv2d(y, q["w"], q["b"]), q["alpha"])
        feat = feat + y
    f = prelu(conv_transpose2d(feat, p["up1a"]["w"], p["up1a"]["b"]),
              p["up1a"]["alpha"])
    f = conv_transpose2d(f, p["up1b"]["w"], p["up1b"]["b"])
    m = prelu(conv_transpose2d(feat, p["up2a"]["w"], p["up2a"]["b"]),
              p["up2a"]["alpha"])
    m = conv_transpose2d(m, p["up2b"]["w"], p["up2b"]["b"])
    f = resize_bilinear(f, h, w) * scale
    m = resize_bilinear(m, h, w)
    return f, m


def ifnet_forward(params, img0, img1, scale_list=(4, 2, 1)):
    """img0/img1: [B,H,W,3] in [0,1], H/W multiples of 32.
    Returns the interpolated middle frame [B,H,W,3]."""
    b, h, w, _ = img0.shape
    flow = jnp.zeros((b, h, w, 4), img0.dtype)
    mask = jnp.zeros((b, h, w, 1), img0.dtype)
    warped0, warped1 = img0, img1
    for i, scale in enumerate(scale_list):
        bp = params["blocks"][i]
        f0, m0 = _ifblock(bp, jnp.concatenate(
            [warped0, warped1, mask], axis=-1), flow, scale)
        f1, m1 = _ifblock(bp, jnp.concatenate(
            [warped1, warped0, -mask], axis=-1),
            jnp.concatenate([flow[..., 2:4], flow[..., :2]], axis=-1),
            scale)
        flow = flow + (f0 + jnp.concatenate(
            [f1[..., 2:4], f1[..., :2]], axis=-1)) / 2
        mask = mask + (m0 - m1) / 2
        warped0 = warp(img0, flow[..., :2])
        warped1 = warp(img1, flow[..., 2:4])
    m = jax.nn.sigmoid(mask)
    return warped0 * m + warped1 * (1 - m)


# ---------------------------------------------------------------------------
# init / load
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k * k)
    return {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype),
            "alpha": jnp.full((cout,), 0.25, jnp.float32)}


def init_rife(key, c: int = IFBLOCK_C, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))

    def block(in_planes):
        p = {"c0a": _conv_p(next(keys), in_planes, c // 2, dtype=dtype),
             "c0b": _conv_p(next(keys), c // 2, c, dtype=dtype)}
        for blk in ("cb0", "cb1", "cb2", "cb3"):
            p[f"{blk}a"] = _conv_p(next(keys), c, c, dtype=dtype)
            p[f"{blk}b"] = _conv_p(next(keys), c, c, dtype=dtype)
        p["up1a"] = _conv_p(next(keys), c, c // 2, k=4, dtype=dtype)
        p["up1b"] = _conv_p(next(keys), c // 2, 4, k=4, dtype=dtype)
        p["up1b"].pop("alpha")
        p["up2a"] = _conv_p(next(keys), c, c // 2, k=4, dtype=dtype)
        p["up2b"] = _conv_p(next(keys), c // 2, 1, k=4, dtype=dtype)
        p["up2b"].pop("alpha")
        p["up1a"]["alpha"] = jnp.full((c // 2,), 0.25, jnp.float32)
        p["up2a"]["alpha"] = jnp.full((c // 2,), 0.25, jnp.float32)
        return p

    return {"blocks": [block(7 + 4) for _ in range(3)]}


def load_rife_params(path_or_sd, dtype=jnp.float32):
    """Load flownet.pkl (torch state dict; key space IFNet_HDv3:
    blockN.conv0.M.0 conv / .1 PReLU, blockN.convblockM.{0,1}.{0,1},
    blockN.conv{1,2}.{0,2} ConvTranspose2d with .1 PReLU between).
    Transposed-conv kernels are spatially flipped and in/out swapped here
    so the forward runs them as plain dilated convs."""
    if isinstance(path_or_sd, (str,)):
        import torch
        sd = torch.load(path_or_sd, map_location="cpu", weights_only=True)
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = dict(path_or_sd)
    sd = {k.replace("module.", ""): v for k, v in sd.items()}

    def conv(pre, alpha_key=None):
        w = np.asarray(sd.pop(f"{pre}.weight"), np.float32)
        p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)).astype(dtype),
             "b": jnp.asarray(np.asarray(sd.pop(f"{pre}.bias"),
                                         np.float32)).astype(dtype)}
        if alpha_key:
            p["alpha"] = jnp.asarray(np.asarray(sd.pop(alpha_key),
                                                np.float32).reshape(-1))
        return p

    def tconv(pre, alpha_key=None):
        # torch ConvTranspose2d weight [Cin, Cout, kh, kw] -> flip spatial,
        # swap to [kh, kw, Cin->in of the dilated conv? ]
        w = np.asarray(sd.pop(f"{pre}.weight"), np.float32)
        w = w[:, :, ::-1, ::-1]                       # spatial flip
        p = {"w": jnp.asarray(np.ascontiguousarray(
                 w.transpose(2, 3, 0, 1))).astype(dtype),
             "b": jnp.asarray(np.asarray(sd.pop(f"{pre}.bias"),
                                         np.float32)).astype(dtype)}
        if alpha_key:
            p["alpha"] = jnp.asarray(np.asarray(sd.pop(alpha_key),
                                                np.float32).reshape(-1))
        return p

    blocks = []
    for i in range(3):
        pre = f"block{i}"
        p = {"c0a": conv(f"{pre}.conv0.0.0", f"{pre}.conv0.0.1.weight"),
             "c0b": conv(f"{pre}.conv0.1.0", f"{pre}.conv0.1.1.weight")}
        for j in range(4):
            p[f"cb{j}a"] = conv(f"{pre}.convblock{j}.0.0",
                                f"{pre}.convblock{j}.0.1.weight")
            p[f"cb{j}b"] = conv(f"{pre}.convblock{j}.1.0",
                                f"{pre}.convblock{j}.1.1.weight")
        p["up1a"] = tconv(f"{pre}.conv1.0", f"{pre}.conv1.1.weight")
        p["up1b"] = tconv(f"{pre}.conv1.2")
        p["up2a"] = tconv(f"{pre}.conv2.0", f"{pre}.conv2.1.weight")
        p["up2b"] = tconv(f"{pre}.conv2.2")
        blocks.append(p)
    # block_tea + optional caps are training-only leftovers
    leftover = [k for k in sd if not k.startswith("block_tea")]
    return {"blocks": blocks}, sorted(leftover)


# ---------------------------------------------------------------------------
# video interpolation
# ---------------------------------------------------------------------------

def interpolate_video(params, video, exp: int = 1):
    """video: [T, H, W, 3] float in [-1, 1].  Returns
    [ (T-1)*2^exp + 1, H, W, 3 ] with RIFE midpoints (inference.py
    make_inference midpoint recursion)."""
    x = (np.asarray(video, np.float32) + 1.0) / 2.0
    t, h, w, _ = x.shape
    ph = (h - 1) // 32 * 32 + 32 if h % 32 else h
    pw = (w - 1) // 32 * 32 + 32 if w % 32 else w
    pad = ((0, 0), (0, ph - h), (0, pw - w), (0, 0))
    xp = np.pad(x, pad)

    fwd = jax.jit(lambda a, b: ifnet_forward(params, a, b))

    def mids(i0, i1, n):
        if n <= 0:
            return []
        middle = np.asarray(fwd(i0[None], i1[None]))[0]
        if n == 1:
            return [middle]
        first = mids(i0, middle, n // 2)
        second = mids(middle, i1, n // 2)
        return ([*first, middle, *second] if n % 2
                else [*first, *second])

    out = [x[0]]
    per_gap = 2 ** exp - 1
    for i in range(t - 1):
        for m in mids(xp[i], xp[i + 1], per_gap):
            out.append(np.clip(m[:h, :w], 0.0, 1.0))
        out.append(x[i + 1])
    return np.stack(out) * 2.0 - 1.0
