"""Kandinsky 5 T2V/I2V generation pipeline.

Reference flow (/root/reference/models/kandinsky5/kandinsky/
generation_utils.py:150-245): timesteps = linspace(1, 0, N+1) transformed by
t' = s*t/(1+(s-1)*t) with scheduler_scale 10 (t2v_pipeline.py:39); per step
the model input is cat([img, visual_cond, cond_mask], -1) when visual_cond
(zeros for t2v; first-frame latents pinned with mask row 1 for i2v);
CFG pred = uncond + w*(cond - uncond); Euler x += dt * v.

The whole loop runs as one jit-compiled lax.scan; the i2v frame pinning is
a static branch (the pinned frame is re-written every step, so it stays a
where() on a host-fixed mask).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (Kandinsky5Config, kandinsky5_forward, kandinsky_time_embed,
                  build_kandinsky_rope, patchify_k5, unpatchify_k5)


def kandinsky_schedule(steps: int, scale: float = 10.0) -> np.ndarray:
    ts = np.linspace(1.0, 0.0, steps + 1, dtype=np.float64)
    return scale * ts / (1.0 + (scale - 1.0) * ts)


@dataclasses.dataclass(frozen=True)
class Kandinsky5SamplingConfig:
    steps: int = 50
    guidance: float = 5.0            # guidance_weight (k5 yaml model block)
    scheduler_scale: float = 10.0


def k5_denoise_scan(params, cfg: Kandinsky5Config, latents, text, text_null,
                    pooled, pooled_null, timesteps, guidance: float,
                    vis_rope, txt_rope, grid_thw, first_frame=None,
                    attn_backend: str = "auto"):
    """latents: [B, T, H, W, C] channels-last.  Returns final latents."""
    ts = jnp.asarray(timesteps, jnp.float32)
    b = latents.shape[0]
    use_cfg = abs(guidance - 1.0) > 1e-6
    if use_cfg:
        txt = jnp.concatenate([text, text_null], axis=0)
        pool = jnp.concatenate([pooled, pooled_null], axis=0)
    else:
        txt, pool = text, pooled

    pin = first_frame is not None
    if pin:
        frame_mask = (jnp.arange(latents.shape[1]) == 0
                      )[None, :, None, None, None]

    def body(x, i):
        if pin:
            x = jnp.where(frame_mask, first_frame, x)
        if cfg.visual_cond:
            cond = jnp.zeros_like(x)
            cmask = jnp.zeros((*x.shape[:-1], 1), x.dtype)
            if pin:
                cond = jnp.where(frame_mask, first_frame, cond)
                cmask = jnp.where(frame_mask, 1.0, cmask)
            model_in = jnp.concatenate([x, cond, cmask], axis=-1)
        else:
            model_in = x
        tokens = patchify_k5(model_in, cfg.patch_size)
        xb = jnp.concatenate([tokens, tokens], axis=0) if use_cfg else tokens
        t_embed = kandinsky_time_embed(
            params, cfg, jnp.broadcast_to(ts[i], (xb.shape[0],)), pool)
        v = kandinsky5_forward(params, cfg, xb, txt, t_embed,
                               vis_rope, txt_rope,
                               attn_backend=attn_backend)
        if use_cfg:
            v = v[b:] + guidance * (v[:b] - v[b:])
        v = unpatchify_k5(v, grid_thw, cfg.patch_size, cfg.out_visual_dim)
        return x + (ts[i + 1] - ts[i]) * v, None

    x, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                        jnp.arange(len(timesteps) - 1))
    if pin:
        x = jnp.where(frame_mask, first_frame, x)
    return x


class Kandinsky5Pipeline:
    """text_encode_fn(prompts) -> (qwen_states [B,L,3584],
    clip_pooled [B,768]); Kandinsky 5 uses the Hunyuan-Video causal VAE
    (k5 yaml vae.name 'hunyuan')."""

    def __init__(self, dit_params, dit_cfg: Kandinsky5Config,
                 vae_decode_fn=None, text_encode_fn=None,
                 attn_backend: str = "auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.attn_backend = attn_backend
        self.vae_stride = (4, 8, 8)
        self._cache: Dict[Any, Any] = {}

    def generate(self, prompt: str = "", negative_prompt: str = "",
                 width: int = 512, height: int = 512, frame_num: int = 25,
                 sampling: Kandinsky5SamplingConfig =
                 Kandinsky5SamplingConfig(),
                 seed: int = 0, scale_factor=(1.0, 2.0, 2.0),
                 context=None, context_pooled=None, context_null=None,
                 context_null_pooled=None, first_frame=None,
                 return_latents: bool = False):
        cfg = self.dit_cfg
        if context is None:
            context, context_pooled = self.text_encode_fn([prompt])
        use_cfg = abs(sampling.guidance - 1.0) > 1e-6
        if use_cfg and context_null is None:
            context_null, context_null_pooled = self.text_encode_fn(
                [negative_prompt])

        st, sh, sw = self.vae_stride
        t_lat = (frame_num - 1) // st + 1
        h_lat, w_lat = height // sh, width // sw
        pt, ph, pw = cfg.patch_size
        grid = (t_lat // pt, h_lat // ph, w_lat // pw)

        key = jax.random.key(seed)
        latents = jax.random.normal(
            key, (1, t_lat, h_lat, w_lat, cfg.in_visual_dim), jnp.float32)

        vis_rope, txt_rope = build_kandinsky_rope(
            grid, context.shape[1], cfg, scale_factor)
        ts = kandinsky_schedule(sampling.steps, sampling.scheduler_scale)

        sig = (sampling, latents.shape, context.shape,
               first_frame is not None)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                k5_denoise_scan, cfg=cfg, timesteps=ts,
                guidance=sampling.guidance, vis_rope=vis_rope,
                txt_rope=txt_rope, grid_thw=grid,
                attn_backend=self.attn_backend))
            self._cache[sig] = fn
        x = fn(self.dit_params, latents=latents, text=context,
               text_null=context_null, pooled=context_pooled,
               pooled_null=context_null_pooled, first_frame=first_frame)
        if return_latents or self.vae_decode_fn is None:
            return x
        return self.vae_decode_fn(x)
