"""Ideogram 4 sampling pipeline, TPU-native.

Mirrors /root/reference/models/ideogram4/{ideogram4_main.py,scheduler.py,
sampler_configs.py,latent_norm.py}:
- logit-normal noise schedule with resolution-aware mean shift
  (scheduler.py:12-39), sigma = 1 - t;
- Euler flow matching plus the RES 2M / RES 2S exponential-integrator
  solvers (ideogram4_main.py:30-51, 450-466);
- classifier-free guidance via a SEPARATE unconditional transformer that
  sees an image-only sequence (ideogram4_main.py:404-434):
  ``v = g * v_cond + (1 - g) * v_uncond``;
- per-feature latent shift/scale (latent_norm.py) mapping the model's
  packed latent space straight onto the Flux2 VAE decoder input;
- named presets V4_QUALITY_48 / V4_DEFAULT_20 / V4_TURBO_12 with
  per-step guidance schedules (sampler_configs.py).

TPU notes: the schedule, solver branch per step, and all solver
coefficients are host-known (they depend only on sigmas), so the Euler
path runs as one lax.scan and the RES paths run a Python loop around a
single jitted velocity fn — no data-dependent control flow ever enters
the graph.  Text is RIGHT-padded here (reference left-pads,
ideogram4_main.py:206-218); the two are equivalent because pad rows are
excluded from attention via kv_mask and pad outputs are discarded.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (Ideogram4Config, ideogram_forward, ideogram_rope_tables,
                  IMAGE_POSITION_OFFSET)
from .latent_norm import LATENT_SHIFT, LATENT_SCALE


# ---------------------------------------------------------------------------
# schedule (scheduler.py)
# ---------------------------------------------------------------------------

def _ndtri(p):
    from scipy.special import ndtri
    return ndtri(p)


def logit_normal_schedule(t: np.ndarray, mean: float, std: float = 1.0,
                          logsnr_min: float = -15.0,
                          logsnr_max: float = 18.0) -> np.ndarray:
    """t in [0, 1] -> decreasing 'cleanliness' time (scheduler.py:18-26)."""
    t = np.asarray(t, np.float64)
    with np.errstate(divide="ignore"):
        y = mean + std * _ndtri(t)
    tt = 1.0 - 1.0 / (1.0 + np.exp(-y))
    t_min = 1.0 / (1.0 + math.exp(0.5 * logsnr_max))
    t_max = 1.0 / (1.0 + math.exp(0.5 * logsnr_min))
    return np.clip(tt, t_min, t_max).astype(np.float32)


def schedule_for_resolution(height: int, width: int, mu: float = 0.0,
                            std: float = 1.75,
                            num_steps: int = 20) -> np.ndarray:
    """time_points [num_steps+1], decreasing from ~1 (noise end is index
    num_steps).  Resolution-aware mean per scheduler.py:29-39 with
    known_resolution (512, 512)."""
    mean = mu + 0.5 * math.log((height * width) / float(512 * 512))
    grid = np.linspace(0.0, 1.0, num_steps + 1, dtype=np.float64)
    return logit_normal_schedule(grid, mean=mean, std=std)


def _time_snr_shift(shift: float, t: float) -> float:
    if shift == 1.0:
        return t
    return shift * t / (1.0 + (shift - 1.0) * t)


def flow_model_timestep(t: float, shift: float) -> float:
    return 1.0 - _time_snr_shift(shift, 1.0 - t)


# RES exponential-integrator coefficients (ideogram4_main.py:30-51)

def _res_phi(order: int, neg_h: float) -> float:
    if order == 1:
        if abs(neg_h) < 1e-4:
            return 1.0 + neg_h * (0.5 + neg_h * (1.0 / 6.0 + neg_h / 24.0))
        return math.expm1(neg_h) / neg_h
    if order == 2:
        if abs(neg_h) < 1e-3:
            return 0.5 + neg_h * (1.0 / 6.0 +
                                  neg_h * (1.0 / 24.0 + neg_h / 120.0))
        return (math.expm1(neg_h) - neg_h) / (neg_h * neg_h)
    raise ValueError(f"unsupported phi order {order}")


def _res_2s_coefficients(h: float, c2: float = 0.5):
    f1, f2 = _res_phi(1, -h), _res_phi(2, -h)
    a21 = c2 * _res_phi(1, -h * c2)
    b2 = f2 / c2
    return a21, f1 - b2, b2


def _res_2m_coefficients(h: float, h_prev: float):
    c2 = -h_prev / h
    f1, f2 = _res_phi(1, -h), _res_phi(2, -h)
    b2 = f2 / c2
    return f1 - b2, b2


@dataclasses.dataclass(frozen=True)
class SamplerPreset:
    """guidance_schedule is in loop-index order: index 0 = LAST step
    (sampler_configs.py)."""
    num_steps: int
    guidance_schedule: Tuple[float, ...]
    mu: float
    std: float = 1.0


PRESETS: Dict[str, SamplerPreset] = {
    "V4_QUALITY_48": SamplerPreset(48, (3.0,) * 3 + (7.0,) * 45, 0.0, 1.5),
    "V4_DEFAULT_20": SamplerPreset(20, (3.0,) * 2 + (7.0,) * 18, 0.0, 1.75),
    "V4_TURBO_12": SamplerPreset(12, (3.0,) * 1 + (7.0,) * 11, 0.5, 1.75),
}


# ---------------------------------------------------------------------------
# packed-sequence layout (host)
# ---------------------------------------------------------------------------

def build_ideogram_layout(cfg: Ideogram4Config, text_len: int,
                          grid_h: int, grid_w: int,
                          batch: int = 1) -> Dict[str, Any]:
    """Static layout for a right-padded [text, image] packed sequence.

    Returns numpy cos/sin rope tables for the conditional sequence and the
    image-only unconditional sequence, plus the kv mask.  Position ids per
    ideogram4_main.py:194-218: text (p, p, p); image
    (0, h, w) + IMAGE_POSITION_OFFSET.
    """
    ni = grid_h * grid_w
    hw = np.stack(np.meshgrid(np.arange(grid_h), np.arange(grid_w),
                              indexing="ij"), -1).reshape(-1, 2)
    img_pos = np.concatenate([np.zeros((ni, 1), np.int64), hw], 1) + \
        IMAGE_POSITION_OFFSET
    tp = np.arange(text_len)[:, None].repeat(3, 1)
    pos = np.concatenate([tp, img_pos], 0)[None].repeat(batch, 0)
    cos, sin = ideogram_rope_tables(cfg, pos)
    cos_u, sin_u = ideogram_rope_tables(cfg, img_pos[None].repeat(batch, 0))
    return {"cos": cos, "sin": sin, "cos_uncond": cos_u, "sin_uncond": sin_u,
            "num_image_tokens": ni, "grid": (grid_h, grid_w)}


def unpack_latents(z, grid_h: int, grid_w: int):
    """[B, Ni, 128] packed (pi, pj, c) tokens -> [B, H, W, 32] NHWC latent
    for the Flux2 VAE, applying the per-feature latent norm
    (ideogram4_main.py:289-300: z * scale + shift, then 2x2 unpatch)."""
    if z.shape[-1] == LATENT_SCALE.shape[0]:   # release stats are 128-wide
        z = z * jnp.asarray(LATENT_SCALE) + jnp.asarray(LATENT_SHIFT)
    b = z.shape[0]
    c = z.shape[-1] // 4
    z = z.reshape(b, grid_h, grid_w, 2, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5)
    return z.reshape(b, grid_h * 2, grid_w * 2, c)


def pack_latents(lat, grid_h: int, grid_w: int):
    """Inverse of unpack_latents (for image-to-image style entry points)."""
    b, h, w, c = lat.shape
    z = lat.reshape(b, grid_h, 2, grid_w, 2, c)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(b, grid_h * grid_w, 4 * c)
    if z.shape[-1] == LATENT_SCALE.shape[0]:
        z = (z - jnp.asarray(LATENT_SHIFT)) / jnp.asarray(LATENT_SCALE)
    return z


# ---------------------------------------------------------------------------
# denoising
# ---------------------------------------------------------------------------

def _step_table(time_points: np.ndarray, gw_per_step: np.ndarray,
                flow_shift: float, solver: str) -> List[Dict[str, Any]]:
    """Host-side per-step plan, loop order (ideogram4_main.py:438-470).

    Each entry: mode 'euler' | '2m' | '2s', the model timestep(s), and the
    solver coefficients.  ``i`` runs num_steps-1 .. 0; t_val = tp[i+1]."""
    n = len(time_points) - 1
    plan = []
    prev_sigma = None
    for step_idx in range(n):
        i = n - 1 - step_idx
        t_val = float(time_points[i + 1])
        s_val = float(time_points[i])
        sigma = 1.0 - t_val
        sigma_down = 1.0 - s_val
        h = -math.log(sigma_down / sigma) if sigma_down > 0.0 else 0.0
        entry = {"t_model": flow_model_timestep(t_val, flow_shift),
                 "sigma": sigma, "dt": s_val - t_val,
                 "guidance": float(gw_per_step[i]), "mode": "euler"}
        if solver == "res_2m" and step_idx > 0 and sigma_down > 0.0 \
                and h < 1.0:
            b1, b2 = _res_2m_coefficients(
                h, -math.log(sigma / prev_sigma))
            entry.update(mode="2m", h=h, b1=b1, b2=b2)
        elif solver in ("res_2s", "res_2m") and sigma_down > 0.0 and \
                (solver == "res_2s" or sigma >= 0.1):
            a21, b1, b2 = _res_2s_coefficients(h)
            sub_sigma = sigma * math.exp(-0.5 * h)
            entry.update(mode="2s", h=h, a21=a21, b1=b1, b2=b2,
                         sub_sigma=sub_sigma,
                         t_model_sub=flow_model_timestep(
                             1.0 - sub_sigma, flow_shift))
        plan.append(entry)
        prev_sigma = sigma
    return plan


class Ideogram4Pipeline:
    """params_uncond is the separate unconditional transformer
    (ideogram4_main.py model_factory loads two transformer files); when
    None, sampling runs guidance-free like conditional_transformer_only."""

    def __init__(self, params, cfg: Ideogram4Config, params_uncond=None,
                 text_encode_fn=None, vae_decode_fn=None,
                 attn_backend: str = "auto"):
        self.params = params
        self.params_uncond = params_uncond
        self.cfg = cfg
        self.text_encode_fn = text_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.attn_backend = attn_backend

    def _predict_fn(self):
        cfg, backend = self.cfg, self.attn_backend

        @partial(jax.jit, static_argnames=())
        def predict(params, params_uncond, z, t, guidance, llm, text_valid,
                    cos, sin, kv_mask, cos_u, sin_u):
            pos_v = ideogram_forward(params, cfg, z, t, llm, text_valid,
                                     cos, sin, kv_mask,
                                     attn_backend=backend)
            if params_uncond is None:
                return pos_v
            nt = llm.shape[1]
            empty = llm[:, :0]
            neg_v = ideogram_forward(params_uncond, cfg, z, t, empty,
                                     text_valid[:, :0], cos_u, sin_u,
                                     kv_mask[:, nt:],
                                     attn_backend=backend)
            return guidance * pos_v + (1.0 - guidance) * neg_v
        return predict

    def generate(self, prompt: str, height: int = 1024, width: int = 1024,
                 num_steps: int = 20, guidance_scale: float = 7.0,
                 guidance2_scale: float = 3.0, switch_threshold: int = 0,
                 guide_phases: int = 1, preset: Optional[str] = None,
                 mu: Optional[float] = None, std: Optional[float] = None,
                 sample_solver: str = "euler", flow_shift: float = 1.0,
                 seed: int = 0, return_latents: bool = False):
        cfg = self.cfg
        pr = PRESETS.get(preset) if preset else None
        if pr is not None:
            num_steps = pr.num_steps
            mu = pr.mu if mu is None else mu
            std = pr.std if std is None else std
        mu = 0.0 if mu is None else mu
        std = 1.75 if std is None else std
        patch = 16                      # 2 (patch) * 8 (vae factor)
        if height % patch or width % patch:
            raise ValueError(f"height/width must be divisible by {patch}")
        gh, gw = height // patch, width // patch
        ni = gh * gw

        tp = schedule_for_resolution(height, width, mu=mu, std=std,
                                     num_steps=num_steps)
        if pr is not None:
            gw_steps = np.asarray(pr.guidance_schedule, np.float32)
        else:
            gw_steps = np.full((num_steps,), guidance_scale, np.float32)
            if guide_phases >= 2 and switch_threshold > 0:
                sig = 1.0 - tp[1:]
                gw_steps = np.where(sig <= switch_threshold / 1000.0,
                                    guidance2_scale, gw_steps)
        plan = _step_table(tp, gw_steps, flow_shift, sample_solver)

        llm, text_valid = self.text_encode_fn([prompt])
        nt = llm.shape[1]
        layout = build_ideogram_layout(cfg, nt, gh, gw, batch=1)
        kv_mask = jnp.concatenate(
            [text_valid.astype(bool),
             jnp.ones((1, ni), bool)], axis=1)
        cos, sin = jnp.asarray(layout["cos"]), jnp.asarray(layout["sin"])
        cos_u = jnp.asarray(layout["cos_uncond"])
        sin_u = jnp.asarray(layout["sin_uncond"])

        z = jax.random.normal(jax.random.key(seed), (1, ni, cfg.in_channels),
                              jnp.float32)
        predict = self._predict_fn()

        def vel(zz, t_model, g):
            t = jnp.full((1,), t_model, jnp.float32)
            return predict(self.params, self.params_uncond, zz, t,
                           jnp.float32(g), llm, text_valid.astype(jnp.float32),
                           cos, sin, kv_mask, cos_u, sin_u)

        if all(e["mode"] == "euler" for e in plan):
            ts = jnp.asarray([e["t_model"] for e in plan])
            dts = jnp.asarray([e["dt"] for e in plan])
            gs = jnp.asarray([e["guidance"] for e in plan])

            def body(zz, xs):
                tm, dt, g = xs
                v = vel(zz, tm, g)
                return zz + v * dt, None
            z, _ = jax.lax.scan(body, z, (ts, dts, gs))
        else:
            prev_denoised = None
            for e in plan:
                v = vel(z, e["t_model"], e["guidance"])
                denoised = z + v * e["sigma"]
                if e["mode"] == "2m":
                    z = z + e["h"] * (e["b1"] * (denoised - z) +
                                      e["b2"] * (prev_denoised - z))
                elif e["mode"] == "2s":
                    sub_z = z + e["h"] * e["a21"] * (denoised - z)
                    sub_v = vel(sub_z, e["t_model_sub"], e["guidance"])
                    sub_den = sub_z + sub_v * e["sub_sigma"]
                    z = z + e["h"] * (e["b1"] * (denoised - z) +
                                      e["b2"] * (sub_den - z))
                else:
                    z = z + v * e["dt"]
                prev_denoised = denoised

        lat = unpack_latents(z, gh, gw)
        if return_latents or self.vae_decode_fn is None:
            return lat
        return self.vae_decode_fn(lat)
