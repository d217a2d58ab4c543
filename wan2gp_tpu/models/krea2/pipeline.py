"""Krea 2 image generation pipeline.

Rectified-flow Euler sampling over the mu-shifted schedule
(/root/reference/models/krea2/krea2_main.py:45 _timesteps; the shift point
interpolates between token counts x1=(256/align)^2 and x2=(1280/align)^2,
y1=0.5, y2=1.15), with true CFG (guidance>0 -> scale = guidance+1,
krea2_main.py:329-330, pred = uncond + s*(cond-uncond)).  The per-step
model call and Euler update run as one jit-compiled lax.scan.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (Krea2Config, krea2_forward, prepare_context,
                  build_krea2_rope, pack_image, unpack_image)


def krea2_timesteps(seq_len: int, steps: int, align: int = 16,
                    y1: float = 0.5, y2: float = 1.15, sigma: float = 1.0,
                    mu: Optional[float] = None) -> np.ndarray:
    """[steps+1] descending 1..0 (krea2_main.py:45-51, x1/x2 at :348-349)."""
    x1 = (256 // align) ** 2
    x2 = (1280 // align) ** 2
    ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
    if mu is None:
        slope = (y2 - y1) / (x2 - x1)
        mu = slope * seq_len + (y1 - slope * x1)
    with np.errstate(divide="ignore"):
        ts = math.exp(mu) / (math.exp(mu) + (1.0 / ts - 1.0) ** sigma)
    ts[-1] = 0.0
    return ts


@dataclasses.dataclass(frozen=True)
class Krea2SamplingConfig:
    steps: int = 28
    guidance: float = 4.5     # cfg scale = guidance + 1 when > 0
    y1: float = 0.5
    y2: float = 1.15


def krea2_denoise_scan(params, cfg: Krea2Config, img, context, txt_mask,
                       timesteps, guidance: float, rope_cos, rope_sin,
                       context_neg=None, txt_mask_neg=None,
                       attn_backend: str = "auto"):
    """img: [B, L_img, C*p*p].  context: fused [B, L_txt, features]."""
    ts = jnp.asarray(timesteps, jnp.float32)
    use_cfg = guidance > 0
    scale = guidance + 1.0
    b = img.shape[0]
    if use_cfg:
        ctx = jnp.concatenate([context, context_neg], axis=0)
        msk = jnp.concatenate([txt_mask, txt_mask_neg], axis=0)
    else:
        ctx, msk = context, txt_mask

    def body(x, i):
        xb = jnp.concatenate([x, x], axis=0) if use_cfg else x
        t = jnp.broadcast_to(ts[i], (xb.shape[0],))
        v = krea2_forward(params, cfg, xb, ctx, t, rope_cos, rope_sin,
                          msk, attn_backend=attn_backend)
        if use_cfg:
            pred = v[b:] + scale * (v[:b] - v[b:])
        else:
            pred = v
        return x + (ts[i + 1] - ts[i]) * pred, None

    x, _ = jax.lax.scan(body, img.astype(jnp.float32),
                        jnp.arange(len(timesteps) - 1))
    return x


class Krea2Pipeline:
    """Text-to-image via the Krea2 MMDiT.

    The Qwen3-VL conditioner feeds `text_encode_fn(prompts) ->
    (states [B,L,12,2560], mask [B,L])`; vae_decode_fn decodes 16-channel
    latents (Krea2 reuses the Qwen/Wan2.1 image VAE, krea2_handler.py:145).
    """

    def __init__(self, dit_params, dit_cfg: Krea2Config,
                 vae_decode_fn=None, text_encode_fn=None,
                 attn_backend: str = "auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.attn_backend = attn_backend
        self.compression = 8
        self._cache: Dict[Any, Any] = {}

    def generate(self, prompt: str = "", negative_prompt: str = "",
                 width: int = 1024, height: int = 1024,
                 sampling: Krea2SamplingConfig = Krea2SamplingConfig(),
                 seed: int = 0, context=None, context_mask=None,
                 context_neg=None, context_neg_mask=None,
                 return_latents: bool = False):
        cfg = self.dit_cfg
        align = self.compression * cfg.patch
        if width % align or height % align:
            raise ValueError(f"width/height must be divisible by {align}")
        if context is None:
            context, context_mask = self.text_encode_fn([prompt])
        use_cfg = sampling.guidance > 0
        if use_cfg and context_neg is None:
            context_neg, context_neg_mask = self.text_encode_fn(
                [negative_prompt])

        h_lat, w_lat = height // self.compression, width // self.compression
        h_tok, w_tok = h_lat // cfg.patch, w_lat // cfg.patch
        l_img = h_tok * w_tok
        l_txt = context.shape[1]
        pad_to = l_txt + l_img + ((-(l_txt + l_img)) % cfg.seq_multiple)

        key = jax.random.key(seed)
        noise = jax.random.normal(key, (1, cfg.channels, h_lat, w_lat),
                                  jnp.float32)
        img = pack_image(noise, cfg.patch)

        cos, sin = build_krea2_rope(l_txt, h_tok, w_tok, cfg, pad_to)
        ts = krea2_timesteps(l_img, sampling.steps, align,
                             y1=sampling.y1, y2=sampling.y2)

        fused = prepare_context(self.dit_params, cfg, context, context_mask,
                                attn_backend=self.attn_backend)
        fused_neg = mask_neg = None
        if use_cfg:
            fused_neg = prepare_context(self.dit_params, cfg, context_neg,
                                        context_neg_mask,
                                        attn_backend=self.attn_backend)
            mask_neg = context_neg_mask

        sig = (sampling, img.shape, fused.shape)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                krea2_denoise_scan, cfg=cfg, timesteps=ts,
                guidance=sampling.guidance, rope_cos=cos, rope_sin=sin,
                attn_backend=self.attn_backend))
            self._cache[sig] = fn
        x = fn(self.dit_params, img=img, context=fused,
               txt_mask=jnp.asarray(context_mask),
               context_neg=fused_neg,
               txt_mask_neg=None if mask_neg is None
               else jnp.asarray(mask_neg))
        z = unpack_image(x, h_lat, w_lat, cfg.patch, cfg.channels)
        if return_latents or self.vae_decode_fn is None:
            return z
        return self.vae_decode_fn(z)
