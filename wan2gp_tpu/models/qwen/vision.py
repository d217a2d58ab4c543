"""Qwen2.5-VL vision tower, TPU-native.

Re-implementation of the HF Qwen2_5_VisionTransformerPretrainedModel used
by the reference for image-conditioned prompts (Qwen-Image-Edit latent
conditioning and the VL prompt enhancer,
shared/prompt_enhancer/qwen35_vl.py; models/wan/kiwi/mllm.py):

- 14x14x(2-frame) patch embed (bias-free conv == matmul over flattened
  patches);
- 2D rotary position embeddings over (h, w) with the spatial-merge-block
  interleaved ordering (rot_pos_emb);
- windowed attention: tokens permuted into 112px windows (get_window_index)
  with full-attention layers at fullatt_block_indexes — realized here as a
  segment-id mask (same-window tokens attend);
- RMSNorm blocks, fused-qkv attention (bias), SwiGLU MLP (bias);
- 2x2 patch merger (RMSNorm + MLP) to the LLM hidden size, inverse-
  permuted back to row-major order.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QwenVisionConfig:
    patch_size: int = 14
    temporal_patch_size: int = 2
    in_channels: int = 3
    hidden_size: int = 1280
    depth: int = 32
    num_heads: int = 16
    intermediate_size: int = 3420
    out_hidden_size: int = 3584
    spatial_merge_size: int = 2
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)
    eps: float = 1e-6
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


def init_qwen_vision(key, cfg: QwenVisionConfig, dtype=None):
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 8))
    h = cfg.hidden_size

    def lin(k, din, dout, bias=True):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(k, (din, dout), jnp.float32,
                                     -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "norm1": jnp.ones((h,), jnp.float32),
            "qkv": lin(next(ks), h, 3 * h),
            "proj": lin(next(ks), h, h),
            "norm2": jnp.ones((h,), jnp.float32),
            "gate": lin(next(ks), h, cfg.intermediate_size),
            "up": lin(next(ks), h, cfg.intermediate_size),
            "down": lin(next(ks), cfg.intermediate_size, h),
        }

    blocks = [block(k) for k in jax.random.split(next(keys), cfg.depth)]
    merge_dim = h * cfg.spatial_merge_size ** 2
    return {
        "patch_embed": lin(next(keys),
                           cfg.in_channels * cfg.temporal_patch_size
                           * cfg.patch_size ** 2, h, bias=False),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": jnp.ones((h,), jnp.float32),
            "mlp0": lin(next(keys), merge_dim, merge_dim),
            "mlp2": lin(next(keys), merge_dim, cfg.out_hidden_size),
        },
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def vision_positions(grid_hw, merge: int) -> np.ndarray:
    """(h, w) position ids in the spatial-merge-block interleaved order
    (rot_pos_emb): h/w grids reshaped (h/m, m, w/m, m) -> (0, 2, 1, 3)."""
    h, w = grid_hw

    def order(grid):
        g = grid.reshape(h // merge, merge, w // merge, merge)
        return g.transpose(0, 2, 1, 3).ravel()

    hpos = np.broadcast_to(np.arange(h)[:, None], (h, w))
    wpos = np.broadcast_to(np.arange(w)[None, :], (h, w))
    return np.stack([order(hpos), order(wpos)], axis=-1)   # [h*w, 2]


def window_index(grid_hw, cfg: QwenVisionConfig):
    """(window_index over merge units, per-token window segment ids in
    the PERMUTED order) — get_window_index re-derived for one image."""
    h, w = grid_hw
    m = cfg.spatial_merge_size
    lh, lw = h // m, w // m
    win = cfg.window_size // m // cfg.patch_size
    pad_h = (-lh) % win
    pad_w = (-lw) % win
    idx = np.full((lh + pad_h, lw + pad_w), -1, np.int64)
    idx[:lh, :lw] = np.arange(lh * lw).reshape(lh, lw)
    nh, nw = (lh + pad_h) // win, (lw + pad_w) // win
    tiles = idx.reshape(nh, win, nw, win).transpose(0, 2, 1, 3)
    tiles = tiles.reshape(nh * nw, win * win)
    order = []
    seg_ids = []
    for wi, tile in enumerate(tiles):
        valid = tile[tile >= 0]
        order.append(valid)
        seg_ids.append(np.full(valid.size, wi))
    order = np.concatenate(order)
    seg_units = np.concatenate(seg_ids)
    # expand from merge units to tokens (spatial_merge_unit = m*m)
    seg_tokens = np.repeat(seg_units, m * m)
    return order.astype(np.int32), seg_tokens.astype(np.int32)


def qwen_vision_forward(params, cfg: QwenVisionConfig, patches, grid_hw):
    """patches: [L, C * tps * ps * ps] flattened patch pixels in row-major
    (h, w) order, L = h * w; grid_hw: (h, w) patch grid (one image, the
    temporal axis already folded into the patch channels).  Returns
    merged features [L / merge^2, out_hidden] in row-major order."""
    m = cfg.spatial_merge_size
    unit = m * m
    l = patches.shape[0]
    x = _dense(patches.astype(cfg.compute_dtype), params["patch_embed"])

    pos = vision_positions(grid_hw, m)                 # [L, 2]
    half = cfg.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, half, 2, dtype=np.float64)
                             / half))
    freqs = np.concatenate([np.outer(pos[:, 0], inv),
                            np.outer(pos[:, 1], inv)], axis=-1)  # [L, hd/2]

    order, seg_tokens = window_index(grid_hw, cfg)
    # permute tokens and rope by window order (merge-unit granularity)
    x = x.reshape(l // unit, unit, -1)[order].reshape(l, -1)
    fr = freqs.reshape(l // unit, unit, -1)[order].reshape(l, -1)
    emb = np.concatenate([fr, fr], axis=-1)
    cos = jnp.asarray(np.cos(emb), jnp.float32)
    sin = jnp.asarray(np.sin(emb), jnp.float32)

    seg = jnp.asarray(seg_tokens)
    win_mask = seg[:, None] == seg[None, :]
    full_mask = jnp.ones((l, l), bool)
    bias_win = jnp.where(win_mask, 0.0, jnp.finfo(jnp.float32).min)
    bias_full = jnp.zeros((l, l), jnp.float32)

    n, hd = cfg.num_heads, cfg.head_dim

    def rot(t):
        t32 = t.astype(jnp.float32)
        half_d = t.shape[-1] // 2
        r = jnp.concatenate([-t32[..., half_d:], t32[..., :half_d]], -1)
        return (t32 * cos[:, None] + r * sin[:, None]).astype(t.dtype)

    for i in range(cfg.depth):
        bp = jax.tree.map(lambda a: a[i], params["blocks"])
        bias = bias_full if i in cfg.fullatt_block_indexes else bias_win
        y = _rms(x, bp["norm1"], cfg.eps)
        qkv = _dense(y, bp["qkv"]).reshape(l, 3, n, hd)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        q, k = rot(q), rot(k)
        s = jnp.einsum("lnd,snd->nls", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        a = jax.nn.softmax(s + bias[None], axis=-1).astype(x.dtype)
        o = jnp.einsum("nls,snd->lnd", a, v).reshape(l, n * hd)
        x = x + _dense(o, bp["proj"])
        y = _rms(x, bp["norm2"], cfg.eps)
        hgate = jax.nn.silu(_dense(y, bp["gate"]).astype(jnp.float32)
                            ).astype(x.dtype) * _dense(y, bp["up"])
        x = x + _dense(hgate, bp["down"])

    mp = params["merger"]
    y = _rms(x, mp["ln_q"], cfg.eps).reshape(l // unit, -1)
    y = _dense(y, mp["mlp0"])
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False
                    ).astype(x.dtype)
    y = _dense(y, mp["mlp2"])
    inv_order = np.argsort(order)
    return y[jnp.asarray(inv_order)]


def load_qwen_vision_params(sd: Dict[str, np.ndarray],
                            cfg: QwenVisionConfig, dtype=jnp.float32):
    """HF key space: visual.{patch_embed.proj, blocks.N.{norm1, norm2,
    attn.{qkv,proj}, mlp.{gate_proj,up_proj,down_proj}}, merger.{ln_q,
    mlp.0, mlp.2}}."""
    sd = dict(sd)
    for pre in ("model.visual.", "visual."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    def lin(name, bias=True):
        p = {"w": jnp.asarray(np.asarray(
            sd.pop(f"{name}.weight"), np.float32).T).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                      np.float32))

    pe = np.asarray(sd.pop("patch_embed.proj.weight"), np.float32)
    patch_embed = {"w": jnp.asarray(
        pe.reshape(pe.shape[0], -1).T).astype(dtype)}

    blocks = []
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        blocks.append({
            "norm1": vec(f"{p}.norm1"),
            "qkv": lin(f"{p}.attn.qkv"),
            "proj": lin(f"{p}.attn.proj"),
            "norm2": vec(f"{p}.norm2"),
            "gate": lin(f"{p}.mlp.gate_proj"),
            "up": lin(f"{p}.mlp.up_proj"),
            "down": lin(f"{p}.mlp.down_proj"),
        })
    params = {
        "patch_embed": patch_embed,
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "merger": {
            "ln_q": vec("merger.ln_q"),
            "mlp0": lin("merger.mlp.0"),
            "mlp2": lin("merger.mlp.2"),
        },
    }
    return params, sorted(sd.keys())


def image_to_patches(img: np.ndarray, cfg: QwenVisionConfig):
    """[H, W, 3] float in [0, 1]-normalized space -> (patches
    [L, C*tps*ps*ps], grid (h, w)) matching the HF image processor's
    flatten order (channel, temporal, ph, pw)."""
    ps = cfg.patch_size
    h, w = img.shape[0] // ps, img.shape[1] // ps
    x = np.asarray(img, np.float32)[:h * ps, :w * ps]
    x = x.transpose(2, 0, 1)                                # [C, H, W]
    x = np.repeat(x[:, None], cfg.temporal_patch_size, 1)   # [C, tps, H, W]
    x = x.reshape(3, cfg.temporal_patch_size, h, ps, w, ps)
    x = x.transpose(2, 4, 0, 1, 3, 5)                       # h w C t ph pw
    return x.reshape(h * w, -1), (h, w)
