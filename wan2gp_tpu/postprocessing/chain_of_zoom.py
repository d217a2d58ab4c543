"""Chain-of-Zoom recursive super-resolution (SD3-medium one-step OSEDiff).

TPU-native re-design of /root/reference/postprocessing/chain_of_zoom/
(runtime.py ChainOfZoomRuntime + sd3_transformer.py SD3Transformer):

* the SD3-Medium MMDiT (joint image/text blocks with AdaLN-Zero, final
  context-pre-only block, SAI centered 2D sincos positions) is expressed
  channels-last with the first depth-1 homogeneous blocks as ONE
  `lax.scan` over stacked params;
* one zoom step (runtime.py:_sr_step) = Lanczos pre-upsample -> VAE
  encode -> overlapping 64x64-latent tiles -> one-step velocity
  prediction x - v at t=1000 -> Gaussian-blended accumulation -> VAE
  decode.  The reference loops tiles one by one on the GPU; here every
  tile is the batch axis of ONE jitted MMDiT call (chunked to bound
  memory) so the MXU sees a large batched matmul instead of 25 small
  launches;
* multi-scale-aware per-tile prompts (runtime.py phase 1: Qwen2.5-VL on
  [zoom-out context, tile] image pairs, then CLIP-L/G + T5 encoding) are
  pluggable callables — `tile_prompt_fn(context_img, tile_img) -> str`
  and `encode_prompts_fn([str]) -> (ctx [N,L,4096], pooled [N,2048])` —
  so the repo's Qwen2.5-VL tower + prompt-enhancer LM can be wired in
  without this module owning checkpoints; default embeddings are zeros;
* the zoom chain (runtime.py:upscale COZ_STEP_FACTORS) re-runs the step
  per factor against a constant zoom-out context image;
* VAE: the SD-style 16-channel autoencoder shared with FLUX
  (models/flux/vae.py) under the OSEDiff convention — scaling factor
  1.5305, no shift (runtime.py phase 3).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.flux.vae import (FluxVAEConfig, init_flux_vae,
                               flux_vae_encode, flux_vae_decode)

COZ_LATENT_TILE = 64
COZ_LATENT_OVERLAP = 16
COZ_STEP_FACTORS = {2.0: (2,), 4.0: (4,), 8.0: (4, 2), 16.0: (4, 4)}
COZ_TIMESTEP = 1000.0
COZ_CONTEXT_SIZE = 512

# OSEDiff: SD3 VAE scaling factor only, no shift (runtime.py:600)
SD3_VAE_CONFIG = FluxVAEConfig(scale_factor=1.5305, shift_factor=0.0)


@dataclasses.dataclass(frozen=True)
class SD3Config:
    """sd3_transformer.py SD3_MEDIUM_CONFIG."""
    heads: int = 24
    head_dim: int = 64
    depth: int = 24
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    joint_dim: int = 4096          # T5 width
    pooled_dim: int = 2048         # CLIP-L+G pooled
    pos_embed_max: int = 192
    sample_size: int = 128

    @property
    def dim(self) -> int:
        return self.heads * self.head_dim

    @classmethod
    def tiny(cls):
        return cls(heads=2, head_dim=8, depth=3, in_channels=4,
                   out_channels=4, joint_dim=16, pooled_dim=12,
                   pos_embed_max=16, sample_size=8)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def _linear(key, din, dout, dtype, std=0.02):
    return {"w": (jax.random.normal(key, (din, dout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((dout,), dtype)}


def _dense(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _ln(x, eps=1e-6):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, -1, keepdims=True)
    v = jnp.var(x32, -1, keepdims=True)
    return ((x32 - m) * jax.lax.rsqrt(v + eps)).astype(x.dtype)


def init_sd3_mmdit(key, cfg: SD3Config, dtype=jnp.bfloat16
                   ) -> Dict[str, Any]:
    d = cfg.dim
    keys = iter(jax.random.split(key, 16))

    def joint_block(k, last: bool):
        ks = iter(jax.random.split(k, 16))
        p = {"mod_x": _linear(next(ks), d, 6 * d, dtype),
             "x_q": _linear(next(ks), d, d, dtype),
             "x_k": _linear(next(ks), d, d, dtype),
             "x_v": _linear(next(ks), d, d, dtype),
             "x_o": _linear(next(ks), d, d, dtype),
             "x_ff1": _linear(next(ks), d, 4 * d, dtype),
             "x_ff2": _linear(next(ks), 4 * d, d, dtype),
             "c_q": _linear(next(ks), d, d, dtype),
             "c_k": _linear(next(ks), d, d, dtype),
             "c_v": _linear(next(ks), d, d, dtype)}
        if last:
            # context_pre_only: AdaLN-continuous on context, no ctx out
            p["mod_c"] = _linear(next(ks), d, 2 * d, dtype)
        else:
            p["mod_c"] = _linear(next(ks), d, 6 * d, dtype)
            p["c_o"] = _linear(next(ks), d, d, dtype)
            p["c_ff1"] = _linear(next(ks), d, 4 * d, dtype)
            p["c_ff2"] = _linear(next(ks), 4 * d, d, dtype)
        return p

    def stack(fn, n):
        ks = jax.random.split(next(keys), n)
        leaves = [fn(k) for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    return {
        "patch_in": _linear(next(keys),
                            cfg.patch_size ** 2 * cfg.in_channels, d,
                            dtype),
        "t_mlp1": _linear(next(keys), 256, d, dtype),
        "t_mlp2": _linear(next(keys), d, d, dtype),
        "pool_mlp1": _linear(next(keys), cfg.pooled_dim, d, dtype),
        "pool_mlp2": _linear(next(keys), d, d, dtype),
        "ctx_in": _linear(next(keys), cfg.joint_dim, d, dtype),
        "blocks": stack(lambda k: joint_block(k, False), cfg.depth - 1),
        "last": joint_block(next(keys), True),
        "norm_out": _linear(next(keys), d, 2 * d, dtype),
        "proj_out": _linear(next(keys), d,
                            cfg.patch_size ** 2 * cfg.out_channels,
                            dtype),
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _pos_embed_sai(dim: int, h: int, w: int, cfg: SD3Config
                   ) -> jnp.ndarray:
    """Centered-crop of the SAI sincos table (sd3_transformer.py:52-62:
    coords = arange(max)/4 - base/4, cropped to [h, w] around center)."""
    base = cfg.sample_size // cfg.patch_size
    coords = np.arange(cfg.pos_embed_max, dtype=np.float64) / 4.0 \
        - base / 4.0
    top = (cfg.pos_embed_max - h) // 2
    left = (cfg.pos_embed_max - w) // 2
    cy = coords[top:top + h]
    cx = coords[left:left + w]

    def emb1d(pos):
        half = dim // 4
        omega = 1.0 / 10000 ** (np.arange(half) / half)
        out = np.outer(pos, omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gy, gx = np.meshgrid(cy, cx, indexing="ij")
    # torch meshgrid order in the reference: grid[0]=w varies, grid[1]=h;
    # emb = [emb(grid[0]), emb(grid[1])] -> x-embedding first
    e = np.concatenate([emb1d(gx.reshape(-1)), emb1d(gy.reshape(-1))],
                       axis=1)
    return jnp.asarray(e, jnp.float32)


def _t_embed(t):
    """diffusers Timesteps(256, flip_sin_to_cos=True)."""
    half = 128
    ex = jnp.exp(jnp.arange(half, dtype=jnp.float32)
                 * (-math.log(10000.0) / half))
    ang = t.astype(jnp.float32)[:, None] * ex[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def _joint_attn(lp, cfg, ax, ac, img_only_out: bool):
    b, n, d = ax.shape
    heads, hd = cfg.heads, cfg.head_dim
    k = jnp.concatenate([_dense(ax, lp["x_k"]), _dense(ac, lp["c_k"])],
                        axis=1).reshape(b, -1, heads, hd)
    v = jnp.concatenate([_dense(ax, lp["x_v"]), _dense(ac, lp["c_v"])],
                        axis=1).reshape(b, -1, heads, hd)
    if img_only_out:
        q = _dense(ax, lp["x_q"]).reshape(b, n, heads, hd)
    else:
        q = jnp.concatenate([_dense(ax, lp["x_q"]),
                             _dense(ac, lp["c_q"])],
                            axis=1).reshape(b, -1, heads, hd)
    w = jax.nn.softmax(
        jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(ax.dtype)
    o = jnp.einsum("bhls,bshd->blhd", w, v)
    return o.reshape(b, o.shape[1], d)


def _mod6(lp_mod, temb):
    m = _dense(jax.nn.silu(temb), lp_mod)
    return jnp.split(m[:, None], 6, axis=-1)


def sd3_mmdit(params, cfg: SD3Config, x, t, ctx, pooled):
    """x: [B, H, W, C] latents (H, W multiples of patch); t [B];
    ctx [B, L, joint_dim]; pooled [B, pooled_dim] -> velocity
    [B, H, W, C] (sd3_transformer.py SD3Transformer.forward)."""
    b, hh, ww, c = x.shape
    p = cfg.patch_size
    gh, gw = hh // p, ww // p
    d = cfg.dim
    # patchify (NHWC -> [B, gh*gw, p*p*C])
    xp = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    xp = xp.reshape(b, gh * gw, p * p * c)
    h = _dense(xp, params["patch_in"])
    h = h + _pos_embed_sai(d, gh, gw, cfg).astype(h.dtype)[None]

    temb = _dense(jax.nn.silu(_dense(_t_embed(t), params["t_mlp1"])),
                  params["t_mlp2"]) \
        + _dense(jax.nn.silu(_dense(pooled, params["pool_mlp1"])),
                 params["pool_mlp2"])
    cemb = _dense(ctx, params["ctx_in"])

    def body(carry, lp):
        h, cemb = carry
        sx, scx, gx_, smx, ssx, gmx = _mod6(lp["mod_x"], temb)
        sc, scc, gc_, smc, ssc, gmc = _mod6(lp["mod_c"], temb)
        ax = _ln(h) * (1 + scx) + sx
        ac = _ln(cemb) * (1 + scc) + sc
        o = _joint_attn(lp, cfg, ax, ac, img_only_out=False)
        n = h.shape[1]
        h = h + gx_ * _dense(o[:, :n], lp["x_o"])
        cemb = cemb + gc_ * _dense(o[:, n:], lp["c_o"])
        fx = _ln(h) * (1 + ssx) + smx
        h = h + gmx * _dense(
            jax.nn.gelu(_dense(fx, lp["x_ff1"]), approximate=True),
            lp["x_ff2"])
        fc = _ln(cemb) * (1 + ssc) + smc
        cemb = cemb + gmc * _dense(
            jax.nn.gelu(_dense(fc, lp["c_ff1"]), approximate=True),
            lp["c_ff2"])
        return (h, cemb), None

    (h, cemb), _ = jax.lax.scan(body, (h, cemb), params["blocks"])

    # final context-pre-only block (sd3_transformer.py:190-227)
    lp = params["last"]
    sx, scx, gx_, smx, ssx, gmx = _mod6(lp["mod_x"], temb)
    mc = _dense(jax.nn.silu(temb), lp["mod_c"])
    scale_c, shift_c = jnp.split(mc[:, None], 2, axis=-1)
    ax = _ln(h) * (1 + scx) + sx
    ac = _ln(cemb) * (1 + scale_c) + shift_c
    o = _joint_attn(lp, cfg, ax, ac, img_only_out=True)
    h = h + gx_ * _dense(o, lp["x_o"])
    fx = _ln(h) * (1 + ssx) + smx
    h = h + gmx * _dense(
        jax.nn.gelu(_dense(fx, lp["x_ff1"]), approximate=True),
        lp["x_ff2"])

    # AdaLN-continuous out + unpatchify
    mo = _dense(jax.nn.silu(temb), params["norm_out"])
    scale, shift = jnp.split(mo[:, None], 2, axis=-1)
    h = _ln(h) * (1 + scale) + shift
    h = _dense(h, params["proj_out"])
    h = h.reshape(b, gh, gw, p, p, cfg.out_channels)
    h = h.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p,
                                              cfg.out_channels)
    return h


# ---------------------------------------------------------------------------
# tiling
# ---------------------------------------------------------------------------

def grid_positions(length: int, tile: int, stride: int) -> List[int]:
    """runtime.py:_grid_positions — cover [0, length) with the final
    position clamped flush to the end."""
    if length <= tile:
        return [0]
    pos = list(range(0, length - tile + 1, stride))
    if pos[-1] != length - tile:
        pos.append(length - tile)
    return pos


def gaussian_weights(height: int, width: int) -> np.ndarray:
    """runtime.py:_gaussian_weights — separable Gaussian bump over the
    tile (var 0.01 of normalized coords)."""
    var = 0.01
    mx = (width - 1) / 2
    xs = np.exp(-((np.arange(width) - mx) ** 2) / (width * width)
                / (2 * var)) / math.sqrt(2 * math.pi * var)
    my = height / 2
    ys = np.exp(-((np.arange(height) - my) ** 2) / (height * height)
                / (2 * var)) / math.sqrt(2 * math.pi * var)
    return np.outer(ys, xs).astype(np.float32)


# ---------------------------------------------------------------------------
# one zoom step
# ---------------------------------------------------------------------------

def _resize_lanczos(img: np.ndarray, w: int, h: int) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.fromarray(img).resize((w, h),
                                                  Image.LANCZOS))


def coz_sr_step(sd3_params, sd3_cfg: SD3Config, vae_params,
                vae_cfg: FluxVAEConfig, image: np.ndarray,
                out_w: int, out_h: int, *,
                context_image: Optional[np.ndarray] = None,
                tile_prompt_fn: Optional[Callable] = None,
                encode_prompts_fn: Optional[Callable] = None,
                tile_latent: int = COZ_LATENT_TILE,
                overlap: int = COZ_LATENT_OVERLAP,
                tile_batch: int = 8,
                seed: int = 0) -> np.ndarray:
    """One Chain-of-Zoom SR step on a uint8 [H, W, 3] image
    (runtime.py:_sr_step).  Returns uint8 [out_h, out_w, 3]."""
    up = _resize_lanczos(image, out_w, out_h)
    lh, lw = out_h // 8, out_w // 8
    th = min(tile_latent, lh)
    tw = min(tile_latent, lw)
    positions = [(y0, x0)
                 for y0 in grid_positions(lh, th, max(1, th - overlap))
                 for x0 in grid_positions(lw, tw, max(1, tw - overlap))]
    n_tiles = len(positions)

    # per-tile multi-scale prompts -> text embeddings
    if tile_prompt_fn is not None:
        prompts = [tile_prompt_fn(
            context_image if context_image is not None else image,
            up[y0 * 8:(y0 + th) * 8, x0 * 8:(x0 + tw) * 8])
            for y0, x0 in positions]
    else:
        prompts = [""] * n_tiles
    if encode_prompts_fn is not None:
        uniq = list(dict.fromkeys(prompts))
        ctx_u, pooled_u = encode_prompts_fn(uniq)
        idx = [uniq.index(p) for p in prompts]
        ctx = jnp.asarray(ctx_u)[jnp.asarray(idx)]
        pooled = jnp.asarray(pooled_u)[jnp.asarray(idx)]
    else:
        ctx = jnp.zeros((n_tiles, 1, sd3_cfg.joint_dim), jnp.float32)
        pooled = jnp.zeros((n_tiles, sd3_cfg.pooled_dim), jnp.float32)

    # VAE encode the whole pre-upsampled image once
    x_full = jnp.asarray(up, jnp.float32)[None] / 127.5 - 1.0
    z_full = flux_vae_encode(vae_params, vae_cfg, x_full,
                             sample_key=jax.random.key(seed))[0]

    # gather tiles -> ONE batched one-step denoise (chunked)
    tiles = jnp.stack([z_full[y0:y0 + th, x0:x0 + tw]
                       for y0, x0 in positions])
    t_vec = jnp.full((n_tiles,), COZ_TIMESTEP, jnp.float32)
    outs = []
    step = jax.jit(lambda xt, tt, cc, pp: xt - sd3_mmdit(
        sd3_params, sd3_cfg, xt, tt, cc, pp))
    for s in range(0, n_tiles, tile_batch):
        e = min(s + tile_batch, n_tiles)
        outs.append(step(tiles[s:e], t_vec[s:e], ctx[s:e], pooled[s:e]))
    denoised = jnp.concatenate(outs, axis=0).astype(jnp.float32)

    # Gaussian-blended scatter back (runtime.py phase 4)
    wgt = jnp.asarray(gaussian_weights(th, tw))[..., None]
    acc = jnp.zeros((lh, lw, z_full.shape[-1]), jnp.float32)
    norm = jnp.zeros((lh, lw, 1), jnp.float32)
    for i, (y0, x0) in enumerate(positions):
        acc = acc.at[y0:y0 + th, x0:x0 + tw].add(denoised[i] * wgt)
        norm = norm.at[y0:y0 + th, x0:x0 + tw].add(wgt)
    z_out = acc / (norm + 1e-10)

    out = flux_vae_decode(vae_params, vae_cfg, z_out[None])[0]
    out = jnp.clip(out, -1.0, 1.0)
    return np.asarray(jnp.round((out + 1.0) * 127.5)).astype(np.uint8)


def chain_of_zoom_upscale(sd3_params, sd3_cfg: SD3Config, vae_params,
                          vae_cfg: FluxVAEConfig, image: np.ndarray,
                          scale: float, *,
                          tile_prompt_fn: Optional[Callable] = None,
                          encode_prompts_fn: Optional[Callable] = None,
                          tile_latent: int = COZ_LATENT_TILE,
                          overlap: int = COZ_LATENT_OVERLAP,
                          seed: int = 0) -> np.ndarray:
    """Full zoom chain on uint8 [H, W, 3] (runtime.py:upscale): split
    `scale` into COZ_STEP_FACTORS, keep the original image as constant
    zoom-out context, round each intermediate size to /16."""
    if float(scale) not in COZ_STEP_FACTORS:
        raise ValueError(
            f"scale {scale} not in {sorted(COZ_STEP_FACTORS)}")
    factors = COZ_STEP_FACTORS[float(scale)]
    h, w = image.shape[:2]
    target_w = int(round(w * scale / 16) * 16)
    target_h = int(round(h * scale / 16) * 16)
    cs = COZ_CONTEXT_SIZE / min(h, w)
    context = _resize_lanczos(image, max(1, int(w * cs)),
                              max(1, int(h * cs)))
    cur = image
    for step_no, factor in enumerate(factors):
        if step_no == len(factors) - 1:
            sw, sh = target_w, target_h
        else:
            sw = int(round(cur.shape[1] * factor / 16) * 16)
            sh = int(round(cur.shape[0] * factor / 16) * 16)
        cur = coz_sr_step(sd3_params, sd3_cfg, vae_params, vae_cfg, cur,
                          sw, sh, context_image=context,
                          tile_prompt_fn=tile_prompt_fn,
                          encode_prompts_fn=encode_prompts_fn,
                          tile_latent=tile_latent, overlap=overlap,
                          seed=seed)
    return cur


def init_chain_of_zoom(key, sd3_cfg: SD3Config = SD3Config(),
                       vae_cfg: FluxVAEConfig = SD3_VAE_CONFIG,
                       dtype=jnp.bfloat16):
    k1, k2 = jax.random.split(key)
    return {"sd3": init_sd3_mmdit(k1, sd3_cfg, dtype),
            "vae": init_flux_vae(k2, vae_cfg)}
