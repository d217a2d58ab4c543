"""Wan SteadyDancer: pose-conditioned i2v with condition reconciliation.

TPU-native re-implementation of /root/reference/models/wan/steadydancer/
and its model integration (modules/model.py:1253-1278, 1638-1658;
any2video.py:793-809, 1535-1543, 1620-1628):
- small_archs.py FactorConv3d:5 — (2+1)D depthwise-spatial + temporal
  factored conv (two of them + SiLU = the Temporal Motion Coherence
  Module);
- mobilenetv2_dcd.py DYModule:17 — dynamic small-conv block (SE-gated
  dynamic phi matrix + scale) = the Spatial Structure Adaptive
  Extractor, run per frame;
- small_archs.py PoseRefNetNoBNV3:76 — per-frame cross attention of the
  noisy latents (query) over the fused pose condition (key/value) = the
  Frame-wise Attention Alignment Unit;
- hierarchical aggregation: fused = cond + temporal + spatial; x =
  patch_embedding_fuse(cat([x(+y), fused, aligned])), then ref_x /
  ref_c reference tokens appended as two extra latent frames; the head
  consumes only the real video tokens;
- DC-CFG (any2video.py:1620-1628): text CFG plus a pose-condition CFG
  term active only in the [10%, 50%) step window.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _hsigmoid(x):
    return jnp.clip(x + 3.0, 0.0, 6.0) / 6.0


def _conv3d(x, w, b=None, groups=1):
    """x [B, C, T, H, W]; w [O, I/g, kt, kh, kw]; SAME padding."""
    pads = [((k - 1) // 2, (k - 1) // 2) for k in w.shape[2:]]
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), pads, feature_group_count=groups,
        dimension_numbers=("NCTHW", "OITHW", "NCTHW"))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1, 1)
    return y


def _conv2d(x, w, b=None):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID" if w.shape[-1] == 1 else "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


# -- FactorConv3d (small_archs.py:5-51) -------------------------------------

def init_factor_conv3d(key, cin, cout, k=3):
    k1, k2 = jax.random.split(key)
    lim_s = math.sqrt(6.0 / (k * k + 1))
    lim_t = math.sqrt(6.0 / (cin * k + cout))
    return {"spatial": {"w": jax.random.uniform(
                k1, (cin, 1, 1, k, k), jnp.float32, -lim_s, lim_s)},
            "temporal": {"w": jax.random.uniform(
                k2, (cout, cin, k, 1, 1), jnp.float32, -lim_t, lim_t),
                "b": jnp.zeros((cout,), jnp.float32)}}


def factor_conv3d(p, x):
    c = x.shape[1]
    y = _conv3d(x, p["spatial"]["w"], groups=c)
    y = jax.nn.silu(y)
    return _conv3d(y, p["temporal"]["w"], p["temporal"]["b"])


# -- DYModule (mobilenetv2_dcd.py:17-72, inp == oup == 16 geometry) ---------

def dy_dims(inp: int, oup: int) -> Tuple[int, int, int]:
    mul = 4 if inp < oup else 1
    reduction = 8 if inp < oup else 2
    dim = min((inp * mul) // reduction, oup // reduction)
    while dim ** 2 > inp * mul * 2:
        reduction *= 2
        dim = min((inp * mul) // reduction, oup // reduction)
    dim = max(dim, 4)
    squeeze = max(max(inp * mul, dim ** 2) // 8, 4)
    return mul, dim, squeeze


def init_dy_module(key, inp=16, oup=16):
    mul, dim, squeeze = dy_dims(inp, oup)
    keys = iter(jax.random.split(key, 8))

    def w2d(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return jax.random.uniform(next(keys), (cout, cin, 1, 1),
                                  jnp.float32, -lim, lim)

    def lin(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return jax.random.uniform(next(keys), (cin, cout), jnp.float32,
                                  -lim, lim)

    return {"conv": w2d(inp, oup), "conv_q": w2d(inp, dim),
            "fc": lin(inp * mul, squeeze),
            "fc_se": lin(squeeze, squeeze),
            "fc_phi": lin(squeeze, dim * dim),
            "fc_scale": lin(squeeze, oup),
            "conv_p": w2d(dim, oup),
            "gn1": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))},
            "gn2": {"w": jnp.ones((dim,)), "b": jnp.zeros((dim,))}}


def _group_norm(x, p, groups=4, eps=1e-5):
    """x [B, C, ...]; GroupNorm over channel groups."""
    b, c = x.shape[:2]
    rest = x.shape[2:]
    xg = x.reshape(b, groups, c // groups, -1)
    mu = xg.mean(axis=(2, 3), keepdims=True)
    var = xg.var(axis=(2, 3), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + eps)
    x = xg.reshape(b, c, *rest)
    shape = (1, c) + (1,) * len(rest)
    return x * p["w"].reshape(shape) + p["b"].reshape(shape)


def dy_module_forward(p, x, inp=16, oup=16):
    """x: [B, C, H, W] (run per frame)."""
    mul, dim, squeeze = dy_dims(inp, oup)
    b, c, h, w = x.shape
    r = _conv2d(x, p["conv"])
    # avg_pool: adaptive 1x1 for inp >= oup (mobilenetv2_dcd.py:28)
    y = x.mean(axis=(2, 3))
    if mul == 4:
        raise NotImplementedError("inp < oup geometry unused by "
                                  "SteadyDancer (inp == oup == 16)")
    y = jnp.dot(y, p["fc"])
    y = y * _hsigmoid(jnp.dot(y, p["fc_se"]))     # SEModule_small
    phi = jnp.dot(y, p["fc_phi"]).reshape(b, dim, dim)
    scale = _hsigmoid(jnp.dot(y, p["fc_scale"])).reshape(b, -1, 1, 1)
    r = scale * r
    q = _conv2d(x, p["conv_q"])
    q = _group_norm(q, p["gn1"])
    qf = q.reshape(b, dim, h * w)
    qf = _group_norm(jnp.einsum("bij,bjl->bil", phi, qf),
                     p["gn2"]) + qf
    out = _conv2d(qf.reshape(b, dim, h, w), p["conv_p"])
    return out + r


# -- PoseRefNetNoBNV3 (small_archs.py:76-138) -------------------------------

def init_pose_refnet(key, cin_c=16, cin_x=16, hidden=128, heads=8):
    keys = iter(jax.random.split(key, 12))

    def w2d(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return {"w": jax.random.uniform(next(keys), (cout, cin, 1, 1),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    def lin(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return {"w": jax.random.uniform(next(keys), (cin, cout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    return {"proj_p": w2d(cin_c, hidden), "proj_r": w2d(cin_x, hidden),
            "proj_p_back": w2d(hidden, cin_c),
            "in_proj": lin(hidden, 3 * hidden),
            "out_proj": lin(hidden, hidden),
            "ffn1": w2d(hidden, hidden), "ffn2": w2d(hidden, hidden),
            "ln1": {"w": jnp.ones((hidden,)), "b": jnp.zeros((hidden,))},
            "ln2": {"w": jnp.ones((hidden,)), "b": jnp.zeros((hidden,))}}


def _ln2d(x, p, eps=1e-5):
    """LayerNorm2D (small_archs.py:53): normalize over C of [B,C,H,W]."""
    mu = x.mean(axis=1, keepdims=True)
    var = x.var(axis=1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + eps)
    return x * p["w"].reshape(1, -1, 1, 1) + p["b"].reshape(1, -1, 1, 1)


def pose_refnet_forward(p, pose, ref, heads: int = 8):
    """pose/ref: [B, C, T, H, W] -> [B, C_pose, T, H, W] aligned pose
    (query = ref latents, key/value = pose tokens, per frame)."""
    b, _, t, h, w = pose.shape
    hidden = p["out_proj"]["w"].shape[0]
    hd = hidden // heads

    def flat(v, proj):
        v = v.transpose(0, 2, 1, 3, 4).reshape(b * t, -1, h, w)
        v = _conv2d(v, proj["w"], proj["b"])
        return v.reshape(b * t, hidden, h * w).transpose(0, 2, 1)

    pt = flat(pose, p["proj_p"])        # [BT, L, hidden]
    rt = flat(ref, p["proj_r"])
    wq, wk, wv = jnp.split(p["in_proj"]["w"], 3, axis=1)
    bq, bk, bv = jnp.split(p["in_proj"]["b"], 3)
    q = (jnp.dot(rt, wq) + bq).reshape(b * t, -1, heads, hd)
    k = (jnp.dot(pt, wk) + bk).reshape(b * t, -1, heads, hd)
    v = (jnp.dot(pt, wv) + bv).reshape(b * t, -1, heads, hd)
    s = jnp.einsum("blnd,bsnd->bnls", q, k) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b * t, -1, hidden)
    o = jnp.dot(o, p["out_proj"]["w"]) + p["out_proj"]["b"]
    o = o.transpose(0, 2, 1).reshape(b * t, hidden, h, w)
    o = _ln2d(o, p["ln1"])
    f = _conv2d(jax.nn.silu(_conv2d(o, p["ffn1"]["w"], p["ffn1"]["b"])),
                p["ffn2"]["w"], p["ffn2"]["b"])
    o = _ln2d(o + f, p["ln2"])
    o = _conv2d(o, p["proj_p_back"]["w"], p["proj_p_back"]["b"])
    return o.reshape(b, t, -1, h, w).transpose(0, 2, 1, 3, 4)


# -- full condition module --------------------------------------------------

def init_steadydancer_modules(key, dim: int, in_dim: int = 36,
                              patch=(1, 2, 2)) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))
    pt, ph, pw = patch

    def patch_lin(cin):
        n = cin * pt * ph * pw
        lim = math.sqrt(6.0 / (n + dim))
        return {"w": jax.random.uniform(next(keys), (n, dim), jnp.float32,
                                        -lim, lim),
                "b": jnp.zeros((dim,), jnp.float32)}

    return {
        "patch_embedding_fuse": patch_lin(in_dim + 32),
        "patch_embedding_ref_c": patch_lin(16),
        "cond_spatial": init_dy_module(next(keys)),
        "cond_temporal": [init_factor_conv3d(next(keys), 16, 16),
                          init_factor_conv3d(next(keys), 16, 16)],
        "cond_align": init_pose_refnet(next(keys)),
    }


def steadydancer_fuse(p, condition, x_noise):
    """condition: [B, 16, F, h, w] pose latents; x_noise: [B, 16, F, h,
    w] current noisy latents.  Returns (fused, aligned) per
    model.py:1638-1649."""
    b, c, f, h, w = condition.shape
    ct = factor_conv3d(p["cond_temporal"][0], condition.astype(jnp.float32))
    ct = jax.nn.silu(ct)
    ct = factor_conv3d(p["cond_temporal"][1], ct)
    ct = jax.nn.silu(ct)
    cf = condition.transpose(0, 2, 1, 3, 4).reshape(b * f, c, h, w)
    cs = dy_module_forward(p["cond_spatial"], cf.astype(jnp.float32))
    cs = cs.reshape(b, f, c, h, w).transpose(0, 2, 1, 3, 4)
    fused = condition.astype(jnp.float32) + ct + cs
    aligned = pose_refnet_forward(p["cond_align"], fused,
                                  x_noise.astype(jnp.float32))
    return fused, aligned


# -- loader -----------------------------------------------------------------

def load_steadydancer_params(sd: Dict[str, np.ndarray], dim: int,
                             dtype=jnp.float32):
    """Consume patch_embedding_fuse / patch_embedding_ref_c /
    condition_embedding_* keys from the SteadyDancer dit checkpoint."""
    sd = dict(sd)

    def pop(k):
        return np.asarray(sd.pop(k), np.float32)

    def patch_lin(prefix):
        w = pop(f"{prefix}.weight")
        return {"w": jnp.asarray(w.reshape(w.shape[0], -1).T).astype(dtype),
                "b": jnp.asarray(pop(f"{prefix}.bias"))}

    def conv(prefix, bias=True):
        p = {"w": jnp.asarray(pop(f"{prefix}.weight"))}
        if bias and f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(pop(f"{prefix}.bias"))
        return p

    def lin_t(prefix):
        return {"w": jnp.asarray(pop(f"{prefix}.weight").T).astype(dtype),
                "b": jnp.asarray(pop(f"{prefix}.bias"))}

    out: Dict[str, Any] = {}
    if "patch_embedding_fuse.weight" in sd:
        out["patch_embedding_fuse"] = patch_lin("patch_embedding_fuse")
        out["patch_embedding_ref_c"] = patch_lin("patch_embedding_ref_c")
        dy_pre = "condition_embedding_spatial"
        out["cond_spatial"] = {
            "conv": jnp.asarray(pop(f"{dy_pre}.conv.weight")),
            "conv_q": jnp.asarray(pop(f"{dy_pre}.conv_q.weight")),
            "fc": jnp.asarray(pop(f"{dy_pre}.fc.0.weight").T),
            "fc_se": jnp.asarray(pop(f"{dy_pre}.fc.1.fc.0.weight").T),
            "fc_phi": jnp.asarray(pop(f"{dy_pre}.fc_phi.weight").T),
            "fc_scale": jnp.asarray(pop(f"{dy_pre}.fc_scale.weight").T),
            "conv_p": jnp.asarray(pop(f"{dy_pre}.conv_p.weight")),
            "gn1": {"w": jnp.asarray(pop(f"{dy_pre}.bn1.weight")),
                    "b": jnp.asarray(pop(f"{dy_pre}.bn1.bias"))},
            "gn2": {"w": jnp.asarray(pop(f"{dy_pre}.bn2.weight")),
                    "b": jnp.asarray(pop(f"{dy_pre}.bn2.bias"))},
        }
        fcs = []
        for i in (0, 2):  # Sequential: Factor, SiLU, Factor, SiLU
            pre = f"condition_embedding_temporal.{i}"
            fcs.append({"spatial": {"w": jnp.asarray(
                            pop(f"{pre}.spatial.weight"))},
                        "temporal": {"w": jnp.asarray(
                            pop(f"{pre}.temporal.weight")),
                            "b": jnp.asarray(pop(f"{pre}.temporal.bias"))}})
        out["cond_temporal"] = fcs
        al = "condition_embedding_align"
        out["cond_align"] = {
            "proj_p": conv(f"{al}.proj_p"),
            "proj_r": conv(f"{al}.proj_r"),
            "proj_p_back": conv(f"{al}.proj_p_back"),
            "in_proj": {"w": jnp.asarray(
                            pop(f"{al}.cross_attn.in_proj_weight").T),
                        "b": jnp.asarray(
                            pop(f"{al}.cross_attn.in_proj_bias"))},
            "out_proj": lin_t(f"{al}.cross_attn.out_proj"),
            "ffn1": conv(f"{al}.ffn_pose.0"),
            "ffn2": conv(f"{al}.ffn_pose.2"),
            "ln1": {"w": jnp.asarray(pop(f"{al}.norm1.weight").reshape(-1)),
                    "b": jnp.asarray(pop(f"{al}.norm1.bias").reshape(-1))},
            "ln2": {"w": jnp.asarray(pop(f"{al}.norm2.weight").reshape(-1)),
                    "b": jnp.asarray(pop(f"{al}.norm2.bias").reshape(-1))},
        }
    return out, sorted(sd.keys())
