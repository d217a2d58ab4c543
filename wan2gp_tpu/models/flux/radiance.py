"""Chroma-Radiance — pixel-space NeRF head for the Chroma DiT.

TPU-native re-implementation of models/flux/radiance.py:
- the model denoises RGB directly (no VAE): input tokens are 16x16
  pixel patches (out_channels=3 -> 768 features) projected by a Conv2d
  patchifier (inject_radiance_modules:110-121 img_in_patch);
- head (:53-107, :173-223): each patch's transformer token GENERATES
  the weights of `radiance_depth` GLU blocks (param_generator Linear ->
  3 column-normalized matrices; x = x + proj(silu(x@gate) * (x@value))
  after RMSNorm) applied to the patch's pixels embedded with DCT
  positional features (RadianceEmbedder:11-51), then a zero-init 3x3
  conv maps the folded 64-ch image to RGB velocity.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RadianceConfig:
    patch_size: int = 16
    hidden_size: int = 64        # radiance_hidden_size
    mlp_ratio: int = 4
    depth: int = 4
    max_freqs: int = 8
    out_channels: int = 3
    model_hidden: int = 3072


def dct_pos_features(patch_size: int, max_freqs: int) -> np.ndarray:
    """[patch^2, max_freqs^2] DCT features (radiance.py:22-38)."""
    pos = np.linspace(0, 1, patch_size)
    py, px = np.meshgrid(pos, pos, indexing="ij")
    px = px.reshape(-1, 1, 1)
    py = py.reshape(-1, 1, 1)
    freqs = np.linspace(0, max_freqs - 1, max_freqs)
    fx = freqs[None, :, None]
    fy = freqs[None, None, :]
    coeffs = 1.0 / (1.0 + fx * fy)
    dct = np.cos(px * fx * np.pi) * np.cos(py * fy * np.pi) * coeffs
    return dct.reshape(patch_size ** 2, max_freqs ** 2).astype(np.float32)


def _lin_init(key, din, dout):
    lim = (din + dout) ** -0.5
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dout,), jnp.float32)}


def init_radiance(key, cfg: RadianceConfig = RadianceConfig()
                  ) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 4 + cfg.depth))
    h = cfg.hidden_size
    return {
        "img_in_patch": {
            "w": jnp.zeros((cfg.out_channels * cfg.patch_size ** 2,
                            cfg.model_hidden), jnp.float32),
            "b": jnp.zeros((cfg.model_hidden,), jnp.float32)},
        "embedder": _lin_init(next(ks),
                              cfg.out_channels + cfg.max_freqs ** 2, h),
        "blocks": [{
            "param_generator": _lin_init(next(ks), cfg.model_hidden,
                                         3 * h * h * cfg.mlp_ratio),
            "norm": jnp.ones((h,), jnp.float32)}
            for _ in range(cfg.depth)],
        "final_norm": jnp.ones((h,), jnp.float32),
        "final_conv": {
            "w": jnp.zeros((cfg.out_channels, h, 3, 3), jnp.float32),
            "b": jnp.zeros((cfg.out_channels,), jnp.float32)},
    }


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    return (x32 * jax.lax.rsqrt(
        jnp.mean(x32 * x32, -1, keepdims=True) + eps) * w).astype(x.dtype)


def radiance_embed_tokens(params, cfg: RadianceConfig, img_tokens):
    """Pixel-patch tokens [B, L, C*p*p] -> model tokens [B, L, hidden]
    (model.py:391-407: fold to image, Conv2d(k=p, s=p) — with
    kernel==stride this is a dense over (c, p, p)-ordered features; our
    tokens are unfold-layout (c-major), matching F.unfold)."""
    return img_tokens @ params["img_in_patch"]["w"] \
        + params["img_in_patch"]["b"]


def apply_radiance_head(params, cfg: RadianceConfig, hidden_seq,
                        base_tokens, grid_hw):
    """hidden_seq: [B, L, model_hidden]; base_tokens: [B, L, C*p*p]
    unfold-layout current image patches.  Returns velocity tokens
    [B, L, C*p*p] (radiance.py:184-223)."""
    b, l, _ = hidden_seq.shape
    p2 = cfg.patch_size ** 2
    c = cfg.out_channels
    h = cfg.hidden_size
    r = cfg.mlp_ratio
    # unfold layout is channel-major: [C, p*p] per token -> [p*p, C]
    pix = base_tokens.reshape(b, l, c, p2).transpose(0, 1, 3, 2)
    dct = jnp.asarray(dct_pos_features(cfg.patch_size, cfg.max_freqs))
    x = jnp.concatenate(
        [pix.astype(jnp.float32),
         jnp.broadcast_to(dct[None, None], (b, l, p2, dct.shape[-1]))],
        axis=-1)
    x = x @ params["embedder"]["w"] + params["embedder"]["b"]
    for blk in params["blocks"]:
        gen = hidden_seq.astype(jnp.float32) \
            @ blk["param_generator"]["w"] + blk["param_generator"]["b"]
        gate, value, proj = jnp.split(gen, 3, axis=-1)

        def colnorm(m, rows, cols):
            m = m.reshape(b, l, rows, cols)
            return m / (jnp.linalg.norm(m, axis=2, keepdims=True)
                        + 1e-12)

        gate = colnorm(gate, h, h * r)
        value = colnorm(value, h, h * r)
        proj = colnorm(proj, h * r, h)
        y = _rms(x, blk["norm"])
        act = jax.nn.silu(jnp.einsum("blpd,blde->blpe", y, gate))
        gated = act * jnp.einsum("blpd,blde->blpe", y, value)
        x = x + jnp.einsum("blpe,bled->blpd", gated, proj)
    # fold to [B, H, W, h] image, 3x3 conv, unfold back
    gh, gw = grid_hw
    ps = cfg.patch_size
    img = x.reshape(b, gh, gw, ps, ps, h).transpose(0, 1, 3, 2, 4, 5)
    img = img.reshape(b, gh * ps, gw * ps, h)
    # RMSNorm over channels then conv (RadianceFinalLayerConv:88-99)
    img = _rms(img, params["final_norm"]).astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        img.transpose(0, 3, 1, 2), params["final_conv"]["w"],
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = out + params["final_conv"]["b"][None, :, None, None]
    out = out.reshape(b, c, gh, ps, gw, ps).transpose(0, 2, 4, 1, 3, 5)
    return out.reshape(b, l, c * p2)


def load_radiance_params(sd: Dict[str, np.ndarray],
                         cfg: RadianceConfig = RadianceConfig()):
    """img_in_patch (Conv2d k=s=p), nerf_image_embedder.embedder.0,
    nerf_blocks.N.{param_generator, norm}, nerf_final_layer_conv."""
    sd = dict(sd)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.weight"), np.float32).T),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.bias"), np.float32))}

    cw = np.asarray(sd.pop("img_in_patch.weight"), np.float32)
    params = {
        "img_in_patch": {
            "w": jnp.asarray(cw.reshape(cw.shape[0], -1).T),
            "b": jnp.asarray(np.asarray(sd.pop("img_in_patch.bias"),
                                        np.float32))},
        "embedder": lin("nerf_image_embedder.embedder.0"),
        "blocks": [{
            "param_generator": lin(
                f"nerf_blocks.{i}.param_generator"),
            "norm": jnp.asarray(np.asarray(
                sd.pop(f"nerf_blocks.{i}.norm.scale",
                       sd.pop(f"nerf_blocks.{i}.norm.weight", None)),
                np.float32))}
            for i in range(cfg.depth)],
        "final_conv": {
            "w": jnp.asarray(np.asarray(
                sd.pop("nerf_final_layer_conv.conv.weight"),
                np.float32)),
            "b": jnp.asarray(np.asarray(
                sd.pop("nerf_final_layer_conv.conv.bias"), np.float32))},
    }
    fn = sd.pop("nerf_final_layer_conv.norm.scale",
                sd.pop("nerf_final_layer_conv.norm.weight", None))
    params["final_norm"] = (jnp.asarray(np.asarray(fn, np.float32))
                            if fn is not None
                            else jnp.ones((cfg.hidden_size,),
                                          jnp.float32))
    return params, sorted(sd.keys())
