"""RAFT optical flow, TPU-native (channels-last JAX).

Re-implementation of /root/reference/preprocessing/raft/ (raft.py:24 RAFT,
extractor.py BasicEncoder, corr.py CorrBlock, update.py BasicUpdateBlock,
utils/utils.py bilinear_sampler/coords_grid, utils/flow_viz.py): the
all-pairs correlation pyramid is indexed per GRU iteration with an
(2r+1)^2 bilinear lookup window; 12 iterations of SepConvGRU updates run
under `lax.scan`; the final 1/8-res flow is upsampled with the learned
convex-combination mask.

The flow preprocessor ("flow" control mode, wgp.py:5198 get_preprocessor)
renders the Middlebury color wheel (flow_viz.py) as control frames.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RAFTConfig:
    hidden_dim: int = 128
    context_dim: int = 128
    corr_levels: int = 4
    corr_radius: int = 4
    iters: int = 12

    @property
    def cor_planes(self):
        return self.corr_levels * (2 * self.corr_radius + 1) ** 2


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, pad=None):
    """x [B, H, W, C]; w [kh, kw, cin, cout]."""
    kh, kw = p["w"].shape[:2]
    if pad is None:
        pad = [(kh // 2, kh // 2), (kw // 2, kw // 2)]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def instance_norm(x, eps=1e-5):
    """InstanceNorm2d (affine=False, torch default): per-sample,
    per-channel normalization over H, W."""
    mu = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def bilinear_sample(img, coords):
    """grid_sample(align_corners=True, zeros padding) in pixel coords.

    img: [B, H, W, C]; coords: [B, N, 2] (x, y).  Returns [B, N, C]."""
    b, h, w, c = img.shape
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        valid = ((xi >= 0) & (xi <= w - 1) & (yi >= 0)
                 & (yi <= h - 1)).astype(img.dtype)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        flat = img.reshape(b, h * w, c)
        idx = yi * w + xi
        return jnp.take_along_axis(flat, idx[..., None], axis=1) \
            * valid[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy + v11 * wx * wy)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _c(key, kh, kw, cin, cout, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * kh * kw)
    return {"w": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _res_p(keys, cin, cout, stride):
    p = {"conv1": _c(next(keys), 3, 3, cin, cout),
         "conv2": _c(next(keys), 3, 3, cout, cout)}
    if stride != 1 or cin != cout:
        p["down"] = _c(next(keys), 1, 1, cin, cout)
    return p


def _encoder_p(keys, out_dim):
    return {
        "conv1": _c(next(keys), 7, 7, 3, 64),
        "layer1": [_res_p(keys, 64, 64, 1), _res_p(keys, 64, 64, 1)],
        "layer2": [_res_p(keys, 64, 96, 2), _res_p(keys, 96, 96, 1)],
        "layer3": [_res_p(keys, 96, 128, 2), _res_p(keys, 128, 128, 1)],
        "conv2": _c(next(keys), 1, 1, 128, out_dim),
    }


def init_raft(key, cfg: RAFTConfig = RAFTConfig()) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))
    hd = cfg.hidden_dim
    return {
        "fnet": _encoder_p(keys, 256),
        "cnet": _encoder_p(keys, cfg.hidden_dim + cfg.context_dim),
        "update": {
            "convc1": _c(next(keys), 1, 1, cfg.cor_planes, 256),
            "convc2": _c(next(keys), 3, 3, 256, 192),
            "convf1": _c(next(keys), 7, 7, 2, 128),
            "convf2": _c(next(keys), 3, 3, 128, 64),
            "conv": _c(next(keys), 3, 3, 256, 126),
            "convz1": _c(next(keys), 1, 5, 2 * hd + 128, hd),
            "convr1": _c(next(keys), 1, 5, 2 * hd + 128, hd),
            "convq1": _c(next(keys), 1, 5, 2 * hd + 128, hd),
            "convz2": _c(next(keys), 5, 1, 2 * hd + 128, hd),
            "convr2": _c(next(keys), 5, 1, 2 * hd + 128, hd),
            "convq2": _c(next(keys), 5, 1, 2 * hd + 128, hd),
            "flow1": _c(next(keys), 3, 3, hd, 256),
            "flow2": _c(next(keys), 3, 3, 256, 2),
            "mask1": _c(next(keys), 3, 3, 128, 256),
            "mask2": _c(next(keys), 1, 1, 256, 64 * 9),
        },
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _res_block(p, x, stride, norm=True):
    y = _conv(x, p["conv1"], stride=stride)
    y = jax.nn.relu(instance_norm(y) if norm else y)
    y = _conv(y, p["conv2"])
    y = jax.nn.relu(instance_norm(y) if norm else y)
    if "down" in p:
        x = _conv(x, p["down"], stride=stride)
        if norm:
            x = instance_norm(x)
    return jax.nn.relu(x + y)


def _encoder(p, x, norm=True):
    y = _conv(x, p["conv1"], stride=2)
    y = jax.nn.relu(instance_norm(y) if norm else y)
    for i, layer in enumerate(("layer1", "layer2", "layer3")):
        stride = 1 if i == 0 else 2
        y = _res_block(p[layer][0], y, stride, norm)
        y = _res_block(p[layer][1], y, 1, norm)
    return _conv(y, p["conv2"])


def _corr_pyramid(f1, f2, levels):
    """All-pairs correlation [B, H1*W1, H2, W2] + avg-pool pyramid."""
    b, h, w, d = f1.shape
    corr = jnp.einsum("bxd,byd->bxy", f1.reshape(b, h * w, d),
                      f2.reshape(b, h * w, d)) / math.sqrt(d)
    corr = corr.reshape(b * h * w, h, w, 1)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = jax.lax.reduce_window(
            corr, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
            "VALID") / 4.0
        pyramid.append(corr)
    return pyramid


def _corr_lookup(pyramid, coords, radius):
    """coords: [B, H, W, 2] pixel coords at 1/8 res.  Returns
    [B, H, W, levels*(2r+1)^2]."""
    b, h, w, _ = coords.shape
    r = radius
    dx = jnp.arange(-r, r + 1, dtype=jnp.float32)
    delta = jnp.stack(jnp.meshgrid(dx, dx, indexing="ij"),
                      axis=-1)                      # [2r+1, 2r+1, (y, x)]
    delta = delta[..., ::-1].reshape(-1, 2)        # -> (x, y)
    out = []
    for i, corr in enumerate(pyramid):
        c = coords.reshape(b * h * w, 1, 2) / (2 ** i) + delta[None]
        v = bilinear_sample(corr, c)               # [BHW, (2r+1)^2, 1]
        out.append(v.reshape(b, h, w, -1))
    return jnp.concatenate(out, axis=-1)


def raft_flow(params, cfg: RAFTConfig, image1, image2, iters=None):
    """image1/2: [B, H, W, 3] uint8-range floats (0..255).  H, W divisible
    by 8.  Returns flow [B, H, W, 2] (x, y) in pixels."""
    iters = iters or cfg.iters
    x1 = 2.0 * (image1.astype(jnp.float32) / 255.0) - 1.0
    x2 = 2.0 * (image2.astype(jnp.float32) / 255.0) - 1.0
    f1 = _encoder(params["fnet"], x1, norm=True).astype(jnp.float32)
    f2 = _encoder(params["fnet"], x2, norm=True).astype(jnp.float32)
    cnet = _encoder(params["cnet"], x1, norm=False)
    net = jnp.tanh(cnet[..., :cfg.hidden_dim])
    inp = jax.nn.relu(cnet[..., cfg.hidden_dim:])

    pyramid = _corr_pyramid(f1, f2, cfg.corr_levels)
    b, h, w, _ = f1.shape
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    coords0 = jnp.broadcast_to(jnp.stack([xs, ys], -1), (b, h, w, 2))
    up = params["update"]

    def gru_half(hx, x_in, z_p, r_p, q_p):
        hxx = jnp.concatenate([hx[0], x_in], axis=-1)
        z = jax.nn.sigmoid(_conv(hxx, z_p))
        r = jax.nn.sigmoid(_conv(hxx, r_p))
        q = jnp.tanh(_conv(jnp.concatenate([r * hx[0], x_in], -1), q_p))
        return ((1 - z) * hx[0] + z * q,)

    def step(carry, _):
        net, coords1 = carry
        corr = _corr_lookup(pyramid, coords1, cfg.corr_radius)
        flow = coords1 - coords0
        cor = jax.nn.relu(_conv(corr, up["convc1"]))
        cor = jax.nn.relu(_conv(cor, up["convc2"]))
        flo = jax.nn.relu(_conv(flow, up["convf1"]))
        flo = jax.nn.relu(_conv(flo, up["convf2"]))
        mot = jax.nn.relu(_conv(jnp.concatenate([cor, flo], -1),
                                up["conv"]))
        mot = jnp.concatenate([mot, flow], axis=-1)      # 128
        x_in = jnp.concatenate([inp, mot], axis=-1)      # 256
        net = gru_half((net,), x_in, up["convz1"], up["convr1"],
                       up["convq1"])[0]
        net = gru_half((net,), x_in, up["convz2"], up["convr2"],
                       up["convq2"])[0]
        delta = _conv(jax.nn.relu(_conv(net, up["flow1"])), up["flow2"])
        coords1 = coords1 + delta
        return (net, coords1), None

    (net, coords1), _ = jax.lax.scan(step, (net, coords0), None,
                                     length=iters)
    flow8 = coords1 - coords0

    # convex upsampling (raft.py upsample_flow)
    mask = 0.25 * _conv(jax.nn.relu(_conv(net, up["mask1"])), up["mask2"])
    mask = mask.reshape(b, h, w, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)
    # 3x3 neighborhood of 8*flow (zero-pad)
    fpad = jnp.pad(8.0 * flow8, [(0, 0), (1, 1), (1, 1), (0, 0)])
    neigh = jnp.stack([fpad[:, i:i + h, j:j + w]
                       for i in range(3) for j in range(3)],
                      axis=3)                        # [B, H, W, 9, 2]
    upf = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    upf = upf.transpose(0, 1, 3, 2, 4, 5).reshape(b, 8 * h, 8 * w, 2)
    return upf


# ---------------------------------------------------------------------------
# checkpoint loading (torch RAFT .pth: module.fnet..., nn convention)
# ---------------------------------------------------------------------------

def load_raft_params(sd: Dict[str, np.ndarray],
                     cfg: RAFTConfig = RAFTConfig()):
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}

    def c(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32))
        return p

    def res(pre, has_down):
        p = {"conv1": c(f"{pre}.conv1"), "conv2": c(f"{pre}.conv2")}
        if has_down:
            p["down"] = c(f"{pre}.downsample.0")
        return p

    def enc(pre):
        return {
            "conv1": c(f"{pre}.conv1"),
            "layer1": [res(f"{pre}.layer1.0", False),
                       res(f"{pre}.layer1.1", False)],
            "layer2": [res(f"{pre}.layer2.0", True),
                       res(f"{pre}.layer2.1", False)],
            "layer3": [res(f"{pre}.layer3.0", True),
                       res(f"{pre}.layer3.1", False)],
            "conv2": c(f"{pre}.conv2"),
        }

    params = {
        "fnet": enc("fnet"),
        "cnet": enc("cnet"),
        "update": {
            "convc1": c("update_block.encoder.convc1"),
            "convc2": c("update_block.encoder.convc2"),
            "convf1": c("update_block.encoder.convf1"),
            "convf2": c("update_block.encoder.convf2"),
            "conv": c("update_block.encoder.conv"),
            "convz1": c("update_block.gru.convz1"),
            "convr1": c("update_block.gru.convr1"),
            "convq1": c("update_block.gru.convq1"),
            "convz2": c("update_block.gru.convz2"),
            "convr2": c("update_block.gru.convr2"),
            "convq2": c("update_block.gru.convq2"),
            "flow1": c("update_block.flow_head.conv1"),
            "flow2": c("update_block.flow_head.conv2"),
            "mask1": c("update_block.mask.0"),
            "mask2": c("update_block.mask.2"),
        },
    }
    leftover = [k for k in sd if "num_batches" not in k
                and "running_" not in k]
    return params, sorted(leftover)


# ---------------------------------------------------------------------------
# flow visualization (utils/flow_viz.py Middlebury color wheel)
# ---------------------------------------------------------------------------

def _color_wheel():
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    cols = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    cols[:RY, 0] = 255
    cols[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    cols[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    cols[col:col + YG, 1] = 255
    col += YG
    cols[col:col + GC, 1] = 255
    cols[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    cols[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    cols[col:col + CB, 2] = 255
    col += CB
    cols[col:col + BM, 2] = 255
    cols[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    cols[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    cols[col:col + MR, 0] = 255
    return cols


def flow_to_rgb(flow: np.ndarray, clip_rad: float = None) -> np.ndarray:
    """flow: [H, W, 2] -> uint8 [H, W, 3] (flow_viz.py flow_to_image)."""
    u = np.asarray(flow[..., 0], np.float32)
    v = np.asarray(flow[..., 1], np.float32)
    rad = np.sqrt(u * u + v * v)
    rad_max = clip_rad or max(rad.max(), 1e-5)
    u = u / rad_max
    v = v / rad_max
    rad = np.sqrt(u * u + v * v)

    wheel = _color_wheel()
    ncols = wheel.shape[0]
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros((*u.shape, 3), np.uint8)
    for i in range(3):
        col0 = wheel[k0, i] / 255.0
        col1 = wheel[k1, i] / 255.0
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., i] = np.floor(255 * col)
    return img
