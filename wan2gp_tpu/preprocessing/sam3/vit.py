"""ViTDet image backbone for SAM3 (windowed attention + axial RoPE).

Reference: preprocessing/sam3/model/vitdet.py — ViT(img_size=1008,
patch=14, dim=1024, depth=32, heads=16, mlp_ratio=4.625, window=24,
global_att_blocks=(7,15,23,31), use_rope+use_interp_rope,
tile_abs_pos from the 336px pretrain grid (24x24), ln_pre, qkv_bias,
no patch-embed bias); model_builder.py:191-219 fixes these dims.

TPU-native structure: NHWC layout, the 28 window blocks are scan-stacked
in 4 segments of 7 (one compiled block graph reused by lax.scan), the 4
global blocks run individually.  RoPE tables are precomputed per
resolution (axial complex rotation, vitdet.py:87-142), with
interpolation scaling rope_pt/input for global blocks
(vitdet.py:530-545 `rope_interp`).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from .common import init_linear, init_ln, linear, ln


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    img_size: int = 1008
    patch_size: int = 14
    embed_dim: int = 1024
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.625
    window_size: int = 24
    global_blocks: Tuple[int, ...] = (7, 15, 23, 31)
    pretrain_img_size: int = 336
    rope_theta: float = 10000.0
    compute_dtype: Any = jnp.float32

    @property
    def tokens_hw(self) -> int:
        return self.img_size // self.patch_size

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)


def rope_freqs(head_dim: int, end_x: int, end_y: int, theta: float = 1e4,
               scale_pos: float = 1.0):
    """Axial 2D rope table (vitdet.py compute_axial_cis:87-103): per-axis
    freqs theta^(-4i/dim), i < dim//4; token (x, y) angles stacked
    [L, dim/2] -> returns (cos, sin) float32 arrays."""
    n = head_dim // 4
    f = 1.0 / theta ** (np.arange(0, n, dtype=np.float32) * 4.0 / head_dim)
    t = np.arange(end_x * end_y, dtype=np.float32)
    tx = (t % end_x) * scale_pos
    ty = np.floor(t / end_x) * scale_pos
    ang = np.concatenate([np.outer(tx, f), np.outer(ty, f)], axis=-1)
    return jnp.asarray(np.cos(ang)), jnp.asarray(np.sin(ang))


def apply_rope(x, cos, sin):
    """x: [..., L, D]; rotate interleaved pairs (vitdet.py
    apply_rotary_enc:114-142 view_as_complex on (even, odd) pairs)."""
    xf = x.astype(jnp.float32)
    x0 = xf[..., 0::2]
    x1 = xf[..., 1::2]
    r0 = x0 * cos - x1 * sin
    r1 = x0 * sin + x1 * cos
    return jnp.stack([r0, r1], axis=-1).reshape(x.shape).astype(x.dtype)


def _init_block(key, cfg: ViTConfig, dtype):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    d, m = cfg.embed_dim, cfg.mlp_dim
    return {"norm1": init_ln(d, dtype), "norm2": init_ln(d, dtype),
            "qkv": init_linear(k1, d, 3 * d, dtype),
            "proj": init_linear(k2, d, d, dtype),
            "fc1": init_linear(k3, d, m, dtype),
            "fc2": init_linear(k4, m, d, dtype)}


def init_vit(key, cfg: ViTConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.depth + 4)
    d = cfg.embed_dim
    pre = cfg.pretrain_img_size // cfg.patch_size
    win_idx = [i for i in range(cfg.depth) if i not in cfg.global_blocks]
    win = [_init_block(keys[i], cfg, dtype) for i in win_idx]
    glb = [_init_block(keys[i], cfg, dtype) for i in cfg.global_blocks]
    nseg = len(cfg.global_blocks)
    per = len(win) // nseg
    # stack window blocks [nseg, per, ...] for a two-level scan
    win_stack = jax.tree.map(lambda *xs: jnp.stack(xs).reshape(
        nseg, per, *xs[0].shape), *win)
    return {
        "patch": {"w": (jax.random.normal(
            keys[-1], (cfg.patch_size, cfg.patch_size, 3, d), jnp.float32)
            * 0.02).astype(dtype)},
        # pretrain grid pos embed (tiled at runtime); +1 cls position kept
        # for checkpoint-shape parity, unused (pretrain_use_cls_token)
        "pos_embed": (jax.random.normal(keys[-2], (1 + pre * pre, d),
                                        jnp.float32) * 0.02).astype(dtype),
        "ln_pre": init_ln(d, dtype),
        "win": win_stack,
        "glb": glb,
    }


def _block_attn(p, x, cos, sin, num_heads, backend):
    """x: [B, L, C] -> attention with rope."""
    b, l, c = x.shape
    qkv = linear(x, p["qkv"]).reshape(b, l, 3, num_heads, -1)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, L, H, D]
    q = apply_rope(q.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
    k = apply_rope(k.transpose(0, 2, 1, 3), cos, sin).transpose(0, 2, 1, 3)
    o = attention(q, k, v, backend=backend).reshape(b, l, c)
    return linear(o, p["proj"])


def _block(p, x, cos, sin, cfg: ViTConfig, window: bool, backend: str):
    """x: [B, H, W, C].  Window partition for window blocks
    (vitdet.py Block.forward:730-747)."""
    b, h, w, c = x.shape
    shortcut = x
    y = ln(x, p["norm1"])
    if window:
        ws = cfg.window_size
        nh, nw = h // ws, w // ws
        y = y.reshape(b, nh, ws, nw, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b * nh * nw, ws * ws, c)
        y = _block_attn(p, y, cos, sin, cfg.num_heads, backend)
        y = y.reshape(b, nh, nw, ws, ws, c).transpose(0, 1, 3, 2, 4, 5)
        y = y.reshape(b, h, w, c)
    else:
        y = _block_attn(p, y.reshape(b, h * w, c), cos, sin,
                        cfg.num_heads, backend).reshape(b, h, w, c)
    x = shortcut + y
    y = ln(x, p["norm2"])
    y = linear(jax.nn.gelu(linear(y, p["fc1"]), approximate=False),
               p["fc2"])
    return x + y


def vit_forward(params, cfg: ViTConfig, images, backend: str = "auto"):
    """images: [B, H, W, 3] -> features [B, h, w, embed_dim]
    (h = H/patch).  Follows vitdet.py ViT.forward:956-1018: patch embed,
    tiled abs pos, ln_pre, blocks, ln_post after the last global block."""
    cdt = cfg.compute_dtype
    x = jax.lax.conv_general_dilated(
        images.astype(cdt), params["patch"]["w"].astype(cdt),
        window_strides=(cfg.patch_size, cfg.patch_size), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    b, h, w, d = x.shape

    # tiled absolute position embedding (get_abs_pos tiling=True,
    # vitdet.py:226-288): tile the 24x24 pretrain grid to (h, w)
    pre = cfg.pretrain_img_size // cfg.patch_size
    pos = params["pos_embed"][1:].reshape(pre, pre, d)
    reps_h = -(-h // pre)
    reps_w = -(-w // pre)
    pos = jnp.tile(pos, (reps_h, reps_w, 1))[:h, :w]
    x = x + pos.astype(cdt)
    x = ln(x, params["ln_pre"])

    ws = cfg.window_size
    win_cos, win_sin = rope_freqs(cfg.head_dim, ws, ws, cfg.rope_theta)
    # interp rope for global blocks: scale_pos = rope_pt/input
    glb_cos, glb_sin = rope_freqs(cfg.head_dim, w, h, cfg.rope_theta,
                                  scale_pos=ws / max(h, 1))

    nseg = len(cfg.global_blocks)

    def seg_body(carry, p):
        return _block(p, carry, win_cos, win_sin, cfg, True, backend), None

    for s in range(nseg):
        seg_params = jax.tree.map(lambda t, s=s: t[s], params["win"])
        x, _ = jax.lax.scan(seg_body, x, seg_params)
        x = _block(params["glb"][s], x, glb_cos, glb_sin, cfg, False,
                   backend)
    # builder sets ln_post=False (model_builder.py:214) — no final norm
    return x
