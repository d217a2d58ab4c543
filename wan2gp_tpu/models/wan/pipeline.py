"""Wan text/image-to-video generation pipeline.

The denoising loop — scheduler step + CFG + guidance included — is a single
jit-compiled `lax.scan` (per-step coefficient tables are the scan xs), the
TPU-native replacement for the reference's Python-stepped loop
(/root/reference/models/wan/any2video.py:1455-1706).

CFG runs as a joint pass: cond/uncond stacked on the batch axis, one forward
per step (reference joint_pass, any2video.py:1591-1602).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...guidance import cfg_combine, apg_update
from ...schedulers import Schedule, make_schedule, init_solver_state, solver_step
from ...ops.rope import build_rope_3d
from .dit import WanDiTConfig, wan_dit_forward
from .vae import WanVAEConfig, vae_decode, vae_encode
from .t5 import T5Config, t5_encode

# reference default negative prompt (models/wan/configs/shared_config.py:17)
DEFAULT_NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    solver: str = "unipc"
    steps: int = 50
    shift: float = 5.0
    guide_scale: float = 5.0
    cfg_star_switch: bool = False
    cfg_zero_step: int = -1
    apg_switch: bool = False
    apg_momentum: float = -0.75
    apg_norm_threshold: float = 55.0
    enable_riflex: bool = False
    # step-skipping cache: "" | "tea" | "mag" (caches.py)
    cache_type: str = ""
    cache_threshold: float = 0.0      # 0 -> auto from cache_speed_factor
    cache_speed_factor: float = 1.75
    cache_start_step: int = 0


def denoise_scan(dit_params, dit_cfg: WanDiTConfig, schedule: Schedule,
                 latents, context, context_null, sampling: SamplingConfig,
                 rope_cos, rope_sin, y=None, clip_fea=None,
                 attn_backend: str = "auto", skip_schedule=None):
    """Run the full denoising loop as one lax.scan.  Returns final latents.

    latents:      [B, C, F, H, W] initial noise (fp32)
    context:      [B, text_len, text_dim]
    context_null: same, negative prompt (ignored when guide_scale == 1)
    """
    b = latents.shape[0]
    g = sampling.guide_scale
    any_guidance = g != 1.0
    n = schedule.num_steps

    use_alpha = jnp.asarray(
        (np.arange(n) > sampling.cfg_zero_step)
        & bool(sampling.cfg_star_switch), dtype=jnp.bool_)

    if any_guidance:
        ctx_both = jnp.concatenate([context, context_null], axis=0)
        y_both = None if y is None else jnp.concatenate([y, y], axis=0)
        clip_both = (None if clip_fea is None
                     else jnp.concatenate([clip_fea, clip_fea], axis=0))
    else:
        ctx_both, y_both, clip_both = context, y, clip_fea

    use_skip = skip_schedule is not None

    def forward(x, t, skip_state):
        xb = jnp.concatenate([x, x], axis=0) if any_guidance else x
        tb = jnp.broadcast_to(t, (xb.shape[0],))
        out = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx_both,
                              rope_cos, rope_sin, clip_fea=clip_both,
                              y=y_both, attn_backend=attn_backend,
                              skip_state=skip_state)
        v, residual = out if use_skip else (out, None)
        if any_guidance:
            return v[:b], v[b:], residual
        return v, None, residual

    def body(carry, xs):
        x, sstate, apg_buf, residual = carry
        t, coeffs_i, alpha_i, i, should_calc = xs
        skip_state = (should_calc, residual) if use_skip else None
        v_cond, v_uncond, new_res = forward(x, t, skip_state)
        if use_skip:
            residual = new_res
        if not any_guidance:
            pred = v_cond
        elif sampling.apg_switch:
            guidance, apg_buf = apg_update(
                v_cond - v_uncond, v_cond, apg_buf,
                momentum=sampling.apg_momentum,
                norm_threshold=sampling.apg_norm_threshold)
            pred = v_cond + (g - 1.0) * guidance
        else:
            pred = cfg_combine(v_cond, v_uncond, g, alpha_i)
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate, apg_buf, residual), None

    if use_skip:
        # block-stack residual buffer in token space [B_eff, L, dim]
        pt, ph, pw = dit_cfg.patch_size
        l_tok = ((latents.shape[2] // pt) * (latents.shape[3] // ph)
                 * (latents.shape[4] // pw))
        b_eff = 2 * b if any_guidance else b
        residual0 = jnp.zeros((b_eff, l_tok, dit_cfg.dim),
                              dit_cfg.residual_dtype)
        skip_flags = jnp.asarray(np.asarray(skip_schedule, bool))
    else:
        residual0 = jnp.zeros((), jnp.float32)
        skip_flags = jnp.ones((n,), bool)

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents),
              jnp.zeros_like(latents, dtype=jnp.float32), residual0)
    xs = (schedule.timesteps, schedule.coeffs, use_alpha,
          jnp.arange(n, dtype=jnp.int32), skip_flags)
    (x, _, _, _), _ = jax.lax.scan(body, carry0, xs)
    return x


class WanPipeline:
    """End-to-end Wan T2V/I2V generation.

    Holds params + configs; `generate` runs text encoding, the jitted
    denoise scan, and VAE decode.  Denoise functions are cached per
    (shape, sampling) signature.
    """

    def __init__(self, dit_params, dit_cfg: WanDiTConfig,
                 t5_params=None, t5_cfg: Optional[T5Config] = None,
                 vae_params=None, vae_cfg: Optional[WanVAEConfig] = None,
                 tokenizer=None, vae_stride=(4, 8, 8),
                 attn_backend: str = "auto",
                 base_model_type: str = "t2v_1.3B"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.base_model_type = base_model_type
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg or T5Config()
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg or WanVAEConfig()
        self.tokenizer = tokenizer
        self.vae_stride = vae_stride
        self.attn_backend = attn_backend
        self._denoise_cache: Dict[Any, Any] = {}

    # -- text ---------------------------------------------------------------

    def encode_text(self, prompts):
        """Returns [B, text_len, text_dim] with padded positions zeroed
        (matches any2video.py:585-589 truncate-then-zero-pad)."""
        assert self.tokenizer is not None and self.t5_params is not None
        ids, mask = self.tokenizer(prompts, self.dit_cfg.text_len)
        out = t5_encode(self.t5_params, self.t5_cfg, jnp.asarray(ids),
                        jnp.asarray(mask))
        return (out * (jnp.asarray(mask)[..., None] > 0)).astype(jnp.float32)

    # -- latent geometry ----------------------------------------------------

    def latent_shape(self, frame_num, height, width, batch=1):
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        return (batch, self.dit_cfg.in_dim, f_lat, height // sh, width // sw)

    def _rope(self, lat_shape, enable_riflex=False):
        pt, ph, pw = self.dit_cfg.patch_size
        grid = (lat_shape[2] // pt, lat_shape[3] // ph, lat_shape[4] // pw)
        return build_rope_3d(grid, head_dim=self.dit_cfg.head_dim,
                             enable_riflex=enable_riflex)

    # -- step-skip caches -------------------------------------------------

    def skip_schedule(self, sampling: SamplingConfig, schedule,
                      width: int, height: int):
        """Host-side TeaCache/MagCache skip plan (caches.py)."""
        if not sampling.cache_type:
            return None
        import numpy as np
        from ... import caches
        from .dit import time_embedding_vec
        if sampling.cache_type == "tea":
            coeffs = caches.teacache_coefficients(
                self.base_model_type, self.dit_cfg.i2v_cross_attn,
                width * height)
            e_list = [np.asarray(time_embedding_vec(
                self.dit_params, self.dit_cfg, t[None]))
                for t in schedule.timesteps]
            thresh = sampling.cache_threshold or caches.teacache_auto_threshold(
                e_list, coeffs, sampling.cache_speed_factor,
                sampling.cache_start_step)
            return caches.teacache_schedule(e_list, coeffs, thresh,
                                            sampling.cache_start_step)
        if sampling.cache_type == "mag":
            table = caches.MAGCACHE_DEF_RATIOS.get(
                self.base_model_type,
                caches.MAGCACHE_DEF_RATIOS["t2v_1.3B"
                                           if "1.3B" in self.base_model_type
                                           else "t2v_14B"])
            ratios = caches.magcache_interp_ratios(table, schedule.num_steps)
            thresh = sampling.cache_threshold or caches.magcache_auto_threshold(
                ratios, sampling.cache_speed_factor,
                start_step=sampling.cache_start_step)
            return caches.magcache_schedule(
                ratios, thresh, start_step=sampling.cache_start_step,
                branches=2 if sampling.guide_scale != 1 else 1)
        raise ValueError(f"unknown cache_type {sampling.cache_type!r}")

    # -- denoise ------------------------------------------------------------

    def _get_denoise(self, sampling: SamplingConfig, has_y, has_clip,
                     skip_schedule=None):
        key = (sampling, has_y, has_clip,
               None if skip_schedule is None else tuple(skip_schedule))
        fn = self._denoise_cache.get(key)
        if fn is None:
            schedule = make_schedule(sampling.solver, sampling.steps,
                                     sampling.shift)

            @functools.partial(jax.jit, static_argnames=())
            def fn(dit_params, latents, context, context_null, rope_cos,
                   rope_sin, y=None, clip_fea=None):
                return denoise_scan(dit_params, self.dit_cfg, schedule,
                                    latents, context, context_null, sampling,
                                    rope_cos, rope_sin, y=y,
                                    clip_fea=clip_fea,
                                    attn_backend=self.attn_backend,
                                    skip_schedule=skip_schedule)
            self._denoise_cache[key] = fn
        return fn

    # -- end-to-end ---------------------------------------------------------

    def generate(self, prompt: str, n_prompt: str = "",
                 width: int = 832, height: int = 480, frame_num: int = 81,
                 sampling: SamplingConfig = SamplingConfig(), seed: int = 0,
                 context: Optional[jnp.ndarray] = None,
                 context_null: Optional[jnp.ndarray] = None,
                 return_latents: bool = False):
        """T2V generation.  Returns video [T, H, W, 3] float32 in [-1, 1]
        (or latents if return_latents)."""
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        if context_null is None:
            context_null = context  # unused when guide_scale == 1

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        skip = None
        if sampling.cache_type:
            schedule = make_schedule(sampling.solver, sampling.steps,
                                     sampling.shift)
            skip = self.skip_schedule(sampling, schedule, width, height)
        fn = self._get_denoise(sampling, False, False, skip_schedule=skip)
        x = fn(self.dit_params, latents, context, context_null,
               rope_cos, rope_sin)
        if return_latents:
            return x
        video = vae_decode(self.vae_params, self.vae_cfg,
                           x.transpose(0, 2, 3, 4, 1))  # -> NDHWC
        return video[0]
