"""Depth Anything V3 — dual-head metric depth (reference
preprocessing/depth_anything_v3/: model/dualdpt.py DualDPT,
depth.py DepthV3VideoAnnotator, wgp.py:3507 da3_metric_large variant).

Reuses the repo's DINOv2 encoder (preprocessing/depth_anything.py) and
adds the V3 DualDPT: two fully independent DPT fusion chains over the
same 4 intermediate layers — the MAIN head emits (depth, confidence)
with exp / exp+1 activations (dualdpt.py activation="exp",
conf_activation="expp1"), the AUX head emits a 7-channel ray map
(camera pose estimation; only the final pyramid level is returned).
The video annotator mirrors depth.py:276-287: per-chunk depth ->
disparity -> min-max normalized uint8 control frames.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .depth_anything import (DAv2Config, dinov2_features, _conv,
                             _tconv, _ln, _resize_ac, _rcu, _fusion,
                             _conv_p, _lin_p, init_dav2, _MEAN, _STD)


@dataclasses.dataclass(frozen=True)
class DAv3Config:
    # encoder dims ride on the DAv2 DINOv2 config (da3-large = ViT-L)
    enc: DAv2Config = dataclasses.field(default_factory=DAv2Config)
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    aux_channels: int = 7          # ray map (dualdpt.py output 7)
    metric: bool = True            # da3_metric_large

    @classmethod
    def tiny(cls):
        return cls(enc=DAv2Config(embed_dim=32, depth=4, num_heads=2,
                                  features=8,
                                  out_channels=(8, 16, 32, 32),
                                  intermediate_layers=(0, 1, 2, 3),
                                  pos_grid=4),
                   features=8, out_channels=(8, 16, 32, 32))


def _head_chain(key, cfg: DAv3Config, dtype, out_dim: int):
    """One independent DPT fusion chain + neck (projects/resizes are
    shared at the DualDPT level; this is refinenet1..4 + output
    convs)."""
    f = cfg.features
    ks = iter(jax.random.split(key, 64))

    def rcu():
        return {"conv1": _conv_p(next(ks), f, f, 3, dtype),
                "conv2": _conv_p(next(ks), f, f, 3, dtype)}

    def fusion(residual=True):
        p = {"rcu2": rcu(), "out_conv": _conv_p(next(ks), f, f, 1,
                                                dtype)}
        if residual:
            p["rcu1"] = rcu()
        return p

    return {
        "refinenet4": fusion(residual=False),
        "refinenet3": fusion(),
        "refinenet2": fusion(),
        "refinenet1": fusion(),
        "output_conv1": _conv_p(next(ks), f, f // 2, 3, dtype),
        "output_conv2a": _conv_p(next(ks), f // 2, 32, 3, dtype),
        "output_conv2b": _conv_p(next(ks), 32, out_dim, 1, dtype),
    }


def init_dav3(key, cfg: DAv3Config, dtype=jnp.float32):
    k_enc, k_shared, k_main, k_aux = jax.random.split(key, 4)
    enc_all = init_dav2(k_enc, cfg.enc, dtype)
    ks = iter(jax.random.split(k_shared, 16))
    oc = cfg.out_channels
    d = cfg.enc.embed_dim
    shared = {
        "norm": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "projects": [_conv_p(next(ks), d, c, 1, dtype) for c in oc],
        "resize0": _conv_p(next(ks), oc[0], oc[0], 4, dtype),
        "resize1": _conv_p(next(ks), oc[1], oc[1], 2, dtype),
        "resize3": _conv_p(next(ks), oc[3], oc[3], 3, dtype),
        "layer_rn": [_conv_p(next(ks), c, cfg.features, 3, dtype,
                             bias=False) for c in oc],
    }
    return {"encoder": enc_all["encoder"], "shared": shared,
            # main: depth + confidence (output_dim=2)
            "main": _head_chain(k_main, cfg, dtype, 2),
            "aux": _head_chain(k_aux, cfg, dtype, cfg.aux_channels)}


def _run_chain(chain, cfg: DAv3Config, rn, h_out, w_out):
    p4 = _fusion(chain["refinenet4"], rn[3], size=rn[2].shape[1:3])
    p3 = _fusion(chain["refinenet3"], p4, rn[2], size=rn[1].shape[1:3])
    p2 = _fusion(chain["refinenet2"], p3, rn[1], size=rn[0].shape[1:3])
    p1 = _fusion(chain["refinenet1"], p2, rn[0])
    out = _conv(p1, chain["output_conv1"], padding=1)
    out = _resize_ac(out, h_out, w_out)
    out = jax.nn.relu(_conv(out, chain["output_conv2a"], padding=1))
    return _conv(out, chain["output_conv2b"])


def dav3_forward(params, cfg: DAv3Config, img):
    """img [B, H, W, 3] in [0,1] (H, W multiples of 14) -> dict with
    depth [B, H, W], conf [B, H, W], ray [B, H, W, 7]
    (DualDPT.forward: exp depth, exp(+1) confidence)."""
    x = (img - _MEAN) / _STD
    ecfg = cfg.enc
    feats = dinov2_features(params["encoder"], ecfg, x,
                            ecfg.intermediate_layers)
    h_tok = img.shape[1] // ecfg.patch_size
    w_tok = img.shape[2] // ecfg.patch_size
    sh = params["shared"]
    outs = []
    for i, (tokens, _cls) in enumerate(feats):
        b = tokens.shape[0]
        t = _ln(tokens, sh["norm"])
        xi = t.reshape(b, h_tok, w_tok, ecfg.embed_dim)
        xi = _conv(xi, sh["projects"][i])
        if i == 0:
            xi = _tconv(xi, sh["resize0"], stride=4)
        elif i == 1:
            xi = _tconv(xi, sh["resize1"], stride=2)
        elif i == 3:
            xi = _conv(xi, sh["resize3"], stride=2, padding=1)
        outs.append(xi)
    rn = [_conv(outs[i], sh["layer_rn"][i], padding=1)
          for i in range(4)]
    h_out, w_out = img.shape[1], img.shape[2]
    main = _run_chain(params["main"], cfg, rn, h_out, w_out)
    aux = _run_chain(params["aux"], cfg, rn, h_out, w_out)
    depth = jnp.exp(jnp.clip(main[..., 0].astype(jnp.float32), -10,
                             10))
    conf = jnp.exp(jnp.clip(main[..., 1].astype(jnp.float32), -10,
                            10)) + 1.0
    return {"depth": depth, "conf": conf, "ray": aux}


class DepthV3VideoAnnotator:
    """depth.py:266-287: frames -> uint8 disparity control video,
    chunked over time for memory."""

    def __init__(self, params=None, cfg: Optional[DAv3Config] = None,
                 chunk_size: int = 8, process_res: int = 0,
                 seed: int = 0):
        self.cfg = cfg or DAv3Config()
        self.params = params if params is not None else init_dav3(
            jax.random.key(seed), self.cfg)
        self.chunk_size = max(1, chunk_size)
        self.process_res = process_res

    def forward(self, frames) -> List[np.ndarray]:
        video = np.stack([np.asarray(f) for f in frames], axis=0)
        if video.dtype == np.uint8:
            video = video.astype(np.float32) / 255.0
        t, h, w = video.shape[:3]
        ps = self.cfg.enc.patch_size
        res = self.process_res or min(h, w)
        scale = res / min(h, w)
        nh = max(int(round(h * scale / ps)) * ps, ps)
        nw = max(int(round(w * scale / ps)) * ps, ps)
        depths = []
        for i in range(0, t, self.chunk_size):
            chunk = jnp.asarray(video[i:i + self.chunk_size])
            chunk = jax.image.resize(
                chunk, (chunk.shape[0], nh, nw, 3), "bilinear")
            out = dav3_forward(self.params, self.cfg, chunk)
            depths.append(np.asarray(out["depth"]))
        depth = np.concatenate(depths, axis=0)
        disp = 1.0 / np.maximum(depth, 1e-6)
        # back to the source resolution BEFORE the clip-wide min-max
        # normalization (depth.py:281-284)
        disp = np.array(jax.image.resize(
            jnp.asarray(disp), (disp.shape[0], h, w), "bilinear"))
        disp -= disp.min()
        disp /= max(float(disp.max()), 1e-6)
        dv = (disp * 255.0).clip(0, 255).astype(np.uint8)
        return [np.repeat(f[..., None], 3, axis=2) for f in dv]
