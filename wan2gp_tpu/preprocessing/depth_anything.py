"""Depth Anything V2 (DINOv2 + DPT head), TPU-native.

Functional re-implementation of the reference depth preprocessor
(/root/reference/preprocessing/depth_anything_v2/): a DINOv2 ViT (patch 14,
LayerScale init 1.0, GELU MLP, no registers, dinov2.py:397-412) feeding a
DPT head (per-level 1x1 projections, transpose/strided resizes, residual
conv units, top-down fusion with align-corners bilinear upsampling,
dpt.py:86-200).  Depth = relu of the final head; intermediate ViT layers
per encoder size (dpt.py:25-30).

Used for the 'depth' control-video preprocessing mode (the reference's
get_preprocessor wgp.py:5198 dispatch).  Layout NHWC.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DAv2Config:
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    intermediate_layers: Tuple[int, ...] = (4, 11, 17, 23)
    patch_size: int = 14
    pos_grid: int = 37               # 518 / 14
    mlp_ratio: float = 4.0
    compute_dtype: Any = jnp.float32


DAV2_CONFIGS = {
    # depth.py:25-29 model_configs + dpt.py:25-30 intermediate layers
    "vits": dict(embed_dim=384, depth=12, num_heads=6, features=64,
                 out_channels=(48, 96, 192, 384),
                 intermediate_layers=(2, 5, 8, 11)),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12, features=128,
                 out_channels=(96, 192, 384, 768),
                 intermediate_layers=(2, 5, 8, 11)),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16, features=256,
                 out_channels=(256, 512, 1024, 1024),
                 intermediate_layers=(4, 11, 17, 23)),
}

# ImageNet normalization (util/transform.py standard DAv2 preprocessing)
_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _conv(x, p, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _tconv(x, p, stride):
    """ConvTranspose2d(k=s, p=0): pure upsampling conv (kernel pre-flipped
    by the loader; with k == s no spatial overlap, so lhs dilation + full
    padding reproduces torch exactly)."""
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), [(k - 1, k - 1), (k - 1, k - 1)],
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y[:, :x.shape[1] * stride, :x.shape[2] * stride]
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _ln(x, p, eps=1e-6):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps) * p["w"] + p["b"]
            ).astype(x.dtype)


def _resize_ac(x, h, w):
    """align_corners=True bilinear (DPT fusion, blocks.py:148)."""
    b, hi, wi, c = x.shape
    ys = (jnp.arange(h) * ((hi - 1) / max(h - 1, 1))) if h > 1 else \
        jnp.zeros((1,))
    xs = (jnp.arange(w) * ((wi - 1) / max(w - 1, 1))) if w > 1 else \
        jnp.zeros((1,))
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, hi - 1)
    x1 = jnp.minimum(x0 + 1, wi - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = x[:, y0][:, :, x0]
    g01 = x[:, y0][:, :, x1]
    g10 = x[:, y1][:, :, x0]
    g11 = x[:, y1][:, :, x1]
    top = g * (1 - wx) + g01 * wx
    bot = g10 * (1 - wx) + g11 * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------------------
# DINOv2 encoder
# ---------------------------------------------------------------------------

def _vit_block(p, x, n_heads):
    b, l, d = x.shape
    hd = d // n_heads
    y = _ln(x, p["norm1"])
    qkv = (jnp.dot(y, p["qkv"]["w"].astype(y.dtype))
           + p["qkv"]["b"].astype(y.dtype))
    q, k, v = jnp.split(qkv.reshape(b, l, 3, n_heads, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, d)
    o = jnp.dot(o, p["proj"]["w"].astype(o.dtype)) + p["proj"]["b"]
    x = x + o * p["ls1"]
    y = _ln(x, p["norm2"])
    h = jnp.dot(y, p["fc1"]["w"].astype(y.dtype)) + p["fc1"]["b"]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(y.dtype)
    h = jnp.dot(h, p["fc2"]["w"].astype(h.dtype)) + p["fc2"]["b"]
    return x + h * p["ls2"]


def _interp_pos(pos_embed, grid: int, h_tok: int, w_tok: int):
    """Bicubic pos-embed interpolation (dinov2.py:178-209; 0.1 offset
    scale-factor trick reproduced via explicit output size)."""
    cls_pos = pos_embed[:, :1]
    patch = pos_embed[0, 1:].reshape(grid, grid, -1)
    if (h_tok, w_tok) != (grid, grid):
        patch = jax.image.resize(patch, (h_tok, w_tok, patch.shape[-1]),
                                 "bicubic")
    return jnp.concatenate([cls_pos, patch.reshape(1, h_tok * w_tok, -1)],
                           axis=1)


def dinov2_features(params, cfg: DAv2Config, img, layer_idx):
    """img: [B, H, W, 3] normalized.  Returns [(patch_tokens, cls)] per
    requested layer (post final-norm, dinov2.py:308-311)."""
    b, h, w, _ = img.shape
    h_tok, w_tok = h // cfg.patch_size, w // cfg.patch_size
    x = _conv(img, params["patch_embed"], stride=cfg.patch_size)
    x = x.reshape(b, h_tok * w_tok, cfg.embed_dim)
    cls = jnp.broadcast_to(params["cls_token"], (b, 1, cfg.embed_dim))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos(params["pos_embed"], cfg.pos_grid, h_tok, w_tok
                        ).astype(x.dtype)
    wanted = list(layer_idx)
    saved = {}
    for i in range(cfg.depth):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        x = _vit_block(bp, x, cfg.num_heads)
        if i in wanted:
            saved[i] = x
    outs = [_ln(saved[i], params["norm"]) for i in wanted]
    return [(o[:, 1:], o[:, 0]) for o in outs]


# ---------------------------------------------------------------------------
# DPT head
# ---------------------------------------------------------------------------

def _rcu(p, x):
    y = jax.nn.relu(x)
    y = _conv(y, p["conv1"], padding=1)
    y = jax.nn.relu(y)
    y = _conv(y, p["conv2"], padding=1)
    return x + y


def _fusion(p, x, res=None, size=None):
    if res is not None:
        x = x + _rcu(p["rcu1"], res)
    x = _rcu(p["rcu2"], x)
    if size is None:
        size = (x.shape[1] * 2, x.shape[2] * 2)
    x = _resize_ac(x, *size)
    return _conv(x, p["out_conv"])


def dpt_head(params, cfg: DAv2Config, features, h_tok, w_tok):
    outs = []
    for i, (tokens, _cls) in enumerate(features):
        b = tokens.shape[0]
        x = tokens.reshape(b, h_tok, w_tok, cfg.embed_dim)
        x = _conv(x, params["projects"][i])
        if i == 0:
            x = _tconv(x, params["resize0"], stride=4)
        elif i == 1:
            x = _tconv(x, params["resize1"], stride=2)
        elif i == 3:
            x = _conv(x, params["resize3"], stride=2, padding=1)
        outs.append(x)

    rn = [_conv(outs[i], params[f"layer{i + 1}_rn"], padding=1)
          for i in range(4)]
    p4 = _fusion(params["refinenet4"], rn[3],
                 size=rn[2].shape[1:3])
    p3 = _fusion(params["refinenet3"], p4, rn[2], size=rn[1].shape[1:3])
    p2 = _fusion(params["refinenet2"], p3, rn[1], size=rn[0].shape[1:3])
    p1 = _fusion(params["refinenet1"], p2, rn[0])
    out = _conv(p1, params["output_conv1"], padding=1)
    out = _resize_ac(out, h_tok * cfg.patch_size, w_tok * cfg.patch_size)
    out = jax.nn.relu(_conv(out, params["output_conv2a"], padding=1))
    out = jax.nn.relu(_conv(out, params["output_conv2b"]))
    return out[..., 0]


def depth_forward(params, cfg: DAv2Config, img):
    """img: [B, H, W, 3] in [0, 1] (H, W multiples of 14).
    Returns relative depth [B, H, W] (relu, unnormalized)."""
    x = (img - _MEAN) / _STD
    feats = dinov2_features(params["encoder"], cfg, x,
                            cfg.intermediate_layers)
    h_tok, w_tok = img.shape[1] // cfg.patch_size, \
        img.shape[2] // cfg.patch_size
    return dpt_head(params["head"], cfg, feats, h_tok, w_tok)


def infer_depth(params, cfg: DAv2Config, image, input_size: int = 518):
    """image: [H, W, 3] uint8 or [0,1] float.  Returns [H, W] float32
    normalized to [0, 1] (the preprocessor's control-map convention)."""
    img = np.asarray(image)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    h, w = img.shape[:2]
    scale = input_size / min(h, w)
    nh = max(int(round(h * scale / 14)) * 14, 14)
    nw = max(int(round(w * scale / 14)) * 14, 14)
    x = jax.image.resize(jnp.asarray(img), (nh, nw, 3), "bicubic")
    d = depth_forward(params, cfg, x[None])[0]
    d = _resize_ac(d[None, :, :, None], h, w)[0, :, :, 0]
    d = np.asarray(d)
    lo, hi = d.min(), d.max()
    return (d - lo) / (hi - lo + 1e-8)


# ---------------------------------------------------------------------------
# init / load
# ---------------------------------------------------------------------------

def _lin_p(key, din, dout, dtype=jnp.float32):
    s = math.sqrt(6.0 / (din + dout))
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32, -s, s
                                    ).astype(dtype),
            "b": jnp.zeros((dout,), dtype)}


def _conv_p(key, cin, cout, k, dtype=jnp.float32, bias=True):
    s = 1.0 / math.sqrt(cin * k * k)
    p = {"w": jax.random.uniform(key, (k, k, cin, cout), jnp.float32,
                                 -s, s).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((cout,), dtype)
    return p


def init_dav2(key, cfg: DAv2Config, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    d = cfg.embed_dim
    mlp = int(d * cfg.mlp_ratio)

    def block(key):
        ks = iter(jax.random.split(key, 4))
        return {"norm1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "qkv": _lin_p(next(ks), d, 3 * d, dtype),
                "proj": _lin_p(next(ks), d, d, dtype),
                "ls1": jnp.full((d,), 1.0, jnp.float32),
                "norm2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
                "fc1": _lin_p(next(ks), d, mlp, dtype),
                "fc2": _lin_p(next(ks), mlp, d, dtype),
                "ls2": jnp.full((d,), 1.0, jnp.float32)}

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.depth)]
    enc = {
        "patch_embed": _conv_p(next(keys), 3, d, cfg.patch_size, dtype),
        "cls_token": jnp.zeros((1, 1, d), dtype),
        "pos_embed": (jax.random.normal(
            next(keys), (1, cfg.pos_grid ** 2 + 1, d), jnp.float32) * 0.02
        ).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
    }

    f = cfg.features

    def fusion(key):
        ks = iter(jax.random.split(key, 5))
        return {"rcu1": {"conv1": _conv_p(next(ks), f, f, 3, dtype),
                         "conv2": _conv_p(next(ks), f, f, 3, dtype)},
                "rcu2": {"conv1": _conv_p(next(ks), f, f, 3, dtype),
                         "conv2": _conv_p(next(ks), f, f, 3, dtype)},
                "out_conv": _conv_p(next(ks), f, f, 1, dtype)}

    oc = cfg.out_channels
    head = {
        "projects": [_conv_p(next(keys), d, c, 1, dtype) for c in oc],
        "resize0": _conv_p(next(keys), oc[0], oc[0], 4, dtype),
        "resize1": _conv_p(next(keys), oc[1], oc[1], 2, dtype),
        "resize3": _conv_p(next(keys), oc[3], oc[3], 3, dtype),
        "layer1_rn": _conv_p(next(keys), oc[0], f, 3, dtype, bias=False),
        "layer2_rn": _conv_p(next(keys), oc[1], f, 3, dtype, bias=False),
        "layer3_rn": _conv_p(next(keys), oc[2], f, 3, dtype, bias=False),
        "layer4_rn": _conv_p(next(keys), oc[3], f, 3, dtype, bias=False),
        "refinenet1": fusion(next(keys)),
        "refinenet2": fusion(next(keys)),
        "refinenet3": fusion(next(keys)),
        "refinenet4": fusion(next(keys)),
        "output_conv1": _conv_p(next(keys), f, f // 2, 3, dtype),
        "output_conv2a": _conv_p(next(keys), f // 2, 32, 3, dtype),
        "output_conv2b": _conv_p(next(keys), 32, 1, 1, dtype),
    }
    return {"encoder": enc, "head": head}


def load_dav2_params(sd: Dict[str, np.ndarray], cfg: DAv2Config,
                     dtype=jnp.float32):
    """Torch key space (dpt.py/dinov2.py): pretrained.{patch_embed.proj,
    cls_token, pos_embed, blocks.N.{norm1, attn.qkv, attn.proj,
    ls1.gamma, norm2, mlp.fc1, mlp.fc2, ls2.gamma}, norm};
    depth_head.{projects.N, resize_layers.{0,1,3}, scratch.layerN_rn,
    scratch.refinenetN.{resConfUnit1/2.conv1/2, out_conv},
    scratch.output_conv1, scratch.output_conv2.{0,2}}."""
    sd = dict(sd)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def conv(name, bias=True, flip=False):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        if flip:   # ConvTranspose2d [Cin, Cout, k, k]
            w = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)
        else:
            w = w.transpose(2, 3, 1, 0)
        p = {"w": jnp.asarray(np.ascontiguousarray(w)).astype(dtype)}
        if bias:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)
        return p

    def norm(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    blocks = []
    for i in range(cfg.depth):
        pre = f"pretrained.blocks.{i}"
        blocks.append({
            "norm1": norm(f"{pre}.norm1"),
            "qkv": lin(f"{pre}.attn.qkv"),
            "proj": lin(f"{pre}.attn.proj"),
            "ls1": jnp.asarray(np.asarray(sd.pop(f"{pre}.ls1.gamma"),
                                          np.float32)),
            "norm2": norm(f"{pre}.norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
            "ls2": jnp.asarray(np.asarray(sd.pop(f"{pre}.ls2.gamma"),
                                          np.float32)),
        })
    sd.pop("pretrained.mask_token", None)
    enc = {
        "patch_embed": conv("pretrained.patch_embed.proj"),
        "cls_token": jnp.asarray(np.asarray(sd.pop("pretrained.cls_token"),
                                            np.float32)).astype(dtype),
        "pos_embed": jnp.asarray(np.asarray(sd.pop("pretrained.pos_embed"),
                                            np.float32)).astype(dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "norm": norm("pretrained.norm"),
    }
    head = {
        "projects": [conv(f"depth_head.projects.{i}") for i in range(4)],
        "resize0": conv("depth_head.resize_layers.0", flip=True),
        "resize1": conv("depth_head.resize_layers.1", flip=True),
        "resize3": conv("depth_head.resize_layers.3"),
        "layer1_rn": conv("depth_head.scratch.layer1_rn", bias=False),
        "layer2_rn": conv("depth_head.scratch.layer2_rn", bias=False),
        "layer3_rn": conv("depth_head.scratch.layer3_rn", bias=False),
        "layer4_rn": conv("depth_head.scratch.layer4_rn", bias=False),
        "output_conv1": conv("depth_head.scratch.output_conv1"),
        "output_conv2a": conv("depth_head.scratch.output_conv2.0"),
        "output_conv2b": conv("depth_head.scratch.output_conv2.2"),
    }
    for i in range(1, 5):
        pre = f"depth_head.scratch.refinenet{i}"
        head[f"refinenet{i}"] = {
            "rcu1": {"conv1": conv(f"{pre}.resConfUnit1.conv1"),
                     "conv2": conv(f"{pre}.resConfUnit1.conv2")},
            "rcu2": {"conv1": conv(f"{pre}.resConfUnit2.conv1"),
                     "conv2": conv(f"{pre}.resConfUnit2.conv2")},
            "out_conv": conv(f"{pre}.out_conv"),
        }
    return {"encoder": enc, "head": head}, sorted(sd.keys())
