"""LTX-Video generation pipeline.

Rectified-flow sampling with resolution-dependent timestep shift
(reference models/ltx_video/schedulers/rf.py: get_normal_shift over the
token count, SD3 time_shift, optional terminal stretch and the
linear-quadratic distilled schedule), jitted lax.scan denoise with CFG and
STG skip-layer guidance (pipelines/pipeline_ltx_video.py: a third perturbed
pass with masked self-attention layers;
pred = uncond + g*(cond-uncond) + stg*(cond-perturbed)).

The LTXV causal VAE + T5 caption encoder are external to this module; the
pipeline accepts caption embeddings and returns latents (token grid).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .dit import LTXVConfig, ltxv_forward, ltxv_rope, make_indices_grid


def ltxv_schedule(num_steps: int, num_tokens: int,
                  terminal: Optional[float] = 0.1,
                  min_shift: float = 0.95, max_shift: float = 2.05,
                  min_tokens: int = 1024, max_tokens: int = 4096):
    """Shifted sigma schedule [N+1] (rf.py:69-147)."""
    ts = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    m = (max_shift - min_shift) / (max_tokens - min_tokens)
    shift = math.exp(m * num_tokens + (min_shift - m * min_tokens))
    with np.errstate(divide="ignore"):
        ts = shift / (shift + (1.0 / ts - 1.0))
    ts[-1] = 0.0
    if terminal is not None:
        # stretch so the last nonzero sigma hits `terminal` (rf.py:85-109)
        one_minus = 1.0 - ts[:-1]
        scale = (1.0 - terminal) / max(one_minus[-1], 1e-6)
        ts[:-1] = 1.0 - one_minus * scale
        # keep final zero
    return ts


def linear_quadratic_schedule(num_steps: int,
                              threshold_noise: float = 0.025,
                              linear_steps: Optional[int] = None):
    """Distilled-model schedule (rf.py:25-46)."""
    if num_steps == 1:
        return np.array([1.0, 0.0])
    if linear_steps is None:
        linear_steps = num_steps // 2
    lin = [i * threshold_noise / linear_steps for i in range(linear_steps)]
    diff = linear_steps - threshold_noise * num_steps
    q = num_steps - linear_steps
    quad_coef = diff / (linear_steps * q ** 2)
    lin_coef = threshold_noise / linear_steps - 2 * diff / (q ** 2)
    const = quad_coef * linear_steps ** 2
    quad = [quad_coef * i ** 2 + lin_coef * i + const
            for i in range(linear_steps, num_steps)]
    # ascending noise levels 0..1 -> descending sigmas 1..0
    ts = np.array(lin + quad + [1.0])
    return 1.0 - ts


@dataclasses.dataclass(frozen=True)
class LTXVSamplingConfig:
    steps: int = 30
    guide_scale: float = 3.0
    stg_scale: float = 0.0
    stg_layers: Sequence[int] = (19,)   # layers skipped in the STG pass
    terminal: float = 0.1
    distilled: bool = False


def ltxv_denoise_scan(params, cfg: LTXVConfig, tokens, caption,
                      caption_null, sigmas,
                      sampling: LTXVSamplingConfig,
                      rope_cos, rope_sin, attn_backend="auto"):
    b = tokens.shape[0]
    g = sampling.guide_scale
    use_cfg = g != 1.0
    use_stg = sampling.stg_scale > 0
    sig = jnp.asarray(sigmas, jnp.float32)

    branches = 1 + int(use_cfg) + int(use_stg)
    caps = [caption]
    if use_cfg:
        caps.append(caption_null)
    if use_stg:
        caps.append(caption)
    cap_all = jnp.concatenate(caps, axis=0)

    stg_mask = np.ones((cfg.num_layers,), np.float32)
    for i in sampling.stg_layers:
        stg_mask[i] = 0.0
    # per-branch layer keep mask stacked over batch? ltxv applies the skip
    # only to the perturbed branch -> run that branch separately.

    def forward(x, t):
        xb = jnp.concatenate([x] * (1 + int(use_cfg)), axis=0)
        tb = jnp.broadcast_to(t, (xb.shape[0],))
        v = ltxv_forward(params, cfg, xb, tb,
                         cap_all[:xb.shape[0]], rope_cos, rope_sin,
                         attn_backend=attn_backend)
        v_cond = v[:b]
        v_uncond = v[b:2 * b] if use_cfg else None
        v_stg = None
        if use_stg:
            v_stg = ltxv_forward(params, cfg, x, jnp.broadcast_to(t, (b,)),
                                 caption, rope_cos, rope_sin,
                                 skip_layer_mask=jnp.asarray(stg_mask),
                                 attn_backend=attn_backend)
        return v_cond, v_uncond, v_stg

    def body(x, i):
        t = sig[i] * 1000.0
        v_cond, v_uncond, v_stg = forward(x, t)
        pred = v_cond
        if use_cfg:
            pred = v_uncond + g * (v_cond - v_uncond)
        if use_stg:
            pred = pred + sampling.stg_scale * (v_cond - v_stg)
        return x + pred * (sig[i + 1] - sig[i]), None

    x, _ = jax.lax.scan(body, tokens.astype(jnp.float32),
                        jnp.arange(len(sigmas) - 1))
    return x


class LTXVPipeline:
    def __init__(self, dit_params, dit_cfg: LTXVConfig,
                 vae_decode_fn=None, text_encode_fn=None,
                 vae_stride=(8, 32, 32), attn_backend="auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.vae_stride = vae_stride
        self.attn_backend = attn_backend
        self._cache: Dict[Any, Any] = {}

    def generate(self, prompt: str = "", width: int = 768, height: int = 512,
                 frame_num: int = 97, seed: int = 0,
                 sampling: LTXVSamplingConfig = LTXVSamplingConfig(),
                 caption=None, caption_null=None,
                 return_latents: bool = False):
        st, sh, sw = self.vae_stride
        f, h, w = (frame_num - 1) // st + 1, height // sh, width // sw
        n_tok = f * h * w
        tokens = jax.random.normal(jax.random.key(seed),
                                   (1, n_tok, self.dit_cfg.in_channels),
                                   jnp.float32)
        if caption is None:
            caption, caption_null = self.text_encode_fn(prompt)
        if caption_null is None:
            caption_null = caption
        sigmas = (linear_quadratic_schedule(sampling.steps)
                  if sampling.distilled
                  else ltxv_schedule(sampling.steps, n_tok,
                                     sampling.terminal))
        cos, sin = ltxv_rope(make_indices_grid(f, h, w), self.dit_cfg)

        sig = (sampling, tokens.shape, caption.shape)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                ltxv_denoise_scan, cfg=self.dit_cfg, sigmas=sigmas,
                sampling=sampling, rope_cos=cos, rope_sin=sin,
                attn_backend=self.attn_backend))
            self._cache[sig] = fn
        x = fn(self.dit_params, tokens=tokens, caption=caption,
               caption_null=caption_null)
        lat = x.reshape(1, f, h, w, self.dit_cfg.out_channels)
        if return_latents or self.vae_decode_fn is None:
            return lat
        return self.vae_decode_fn(lat)
