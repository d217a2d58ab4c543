"""LongCat-Video sampling pipeline, TPU-native.

Mirrors /root/reference/models/longcat/longcat_main.py (non-avatar core):
- flow-match Euler with shift-12 sigma transform
  (configs/longcat_scheduler.json, scheduling_flow_match_euler_discrete
  .py:315): sigma' = shift * sigma / (1 + (shift - 1) * sigma);
- sigma sources: default linspace(1, 0.001, steps) (:589), the
  distillation table (:573-586), and the "enhance_hf" refinement tail
  that replaces the sub-0.5*t_max steps with a uniform grid (:832-855);
- PER-FRAME timesteps: condition latent frames (image / video
  continuation prefix) are pinned to t=0 and never stepped (:911-914,
  :1022-1030);
- the model predicts v with a sign flip (noise_pred = -output, :1019);
- CFG with optional CFG-Zero* rescale (:993-1003, guidance.py
  optimized_scale);
- latents are normalized per-channel with the Wan VAE's
  latents_mean/std (:403-427).

The whole step plan (sigmas, dts, per-frame timestep grids) is
host-precomputed; the denoise loop is one lax.scan.
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import LongCatConfig, longcat_forward
from ...guidance import optimized_scale


SHIFT = 12.0
NUM_TRAIN_TIMESTEPS = 1000


def _shift_sigmas(sigmas: np.ndarray, shift: float = SHIFT) -> np.ndarray:
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def longcat_sigmas(steps: int, solver: str = "default",
                   num_distill_steps: int = 50) -> np.ndarray:
    """Raw sigma grid before the shift transform (longcat_main.py
    get_timesteps_sigmas)."""
    if solver == "distill":
        idx = np.round(np.arange(1, num_distill_steps + 1, dtype=np.float64)
                       * (NUM_TRAIN_TIMESTEPS // num_distill_steps))
        inf = np.floor(np.linspace(0, num_distill_steps, num=steps,
                                   endpoint=False)).astype(np.int64)
        return (idx[::-1][inf] / NUM_TRAIN_TIMESTEPS).astype(np.float32)
    return np.linspace(1.0, 0.001, steps, dtype=np.float32)


def build_step_plan(steps: int, solver: str = "default",
                    num_distill_steps: int = 50) -> Dict[str, np.ndarray]:
    """Shifted sigma ladder + timesteps; enhance_hf swaps the tail for a
    uniform grid below 0.5 * t_max (longcat_main.py:832-855)."""
    sig = _shift_sigmas(longcat_sigmas(steps, solver, num_distill_steps))
    ts = sig * NUM_TRAIN_TIMESTEPS
    if solver == "enhance_hf":
        n_tail = max(3, min(15, int(len(ts) * 0.2)))
        t_start = float(ts.max()) * 0.5
        tail = np.linspace(t_start, 0.0, n_tail, dtype=np.float32,
                           endpoint=False)
        ts = np.concatenate([ts[ts > t_start], tail])
        sig = ts / NUM_TRAIN_TIMESTEPS
    sig_full = np.concatenate([sig, np.zeros((1,), np.float32)])
    return {"timesteps": ts.astype(np.float32),
            "sigmas": sig_full.astype(np.float32),
            "dts": (sig_full[1:] - sig_full[:-1]).astype(np.float32)}


@dataclasses.dataclass(frozen=True)
class LongCatSamplingConfig:
    steps: int = 50
    guidance: float = 4.0
    solver: str = "default"        # default | enhance_hf | distill | auto
    cfg_star: bool = False
    cfg_zero_step: int = -1
    num_distill_steps: int = 50


def build_speaker_owner(lat_h: int, lat_w: int, speakers_bboxes=None):
    """Per-latent-token speaker ownership for Avatar Multi
    (longcat_main.py:550-570 _build_ref_target_masks): percent bboxes
    [y_min, x_min, y_max, x_max] clamped to [5, 95], default left/right
    halves; returns [lat_h*lat_w] int32 with 0/1 = speaker, 2 =
    background."""
    import numpy as np
    if not speakers_bboxes:
        speakers_bboxes = {"person1": [5, 10, 45, 90],
                           "person2": [55, 10, 95, 90]}
    masks = []
    for bbox in list(speakers_bboxes.values())[:2]:
        y_min, x_min, y_max, x_max = bbox
        x_min, y_min = max(x_min, 5), max(y_min, 5)
        x_max, y_max = min(x_max, 95), min(y_max, 95)
        r0 = int(lat_h * x_min / 100)
        r1 = int(lat_h * x_max / 100)
        c0 = int(lat_w * y_min / 100)
        c1 = int(lat_w * y_max / 100)
        m = np.zeros((lat_h, lat_w), np.float32)
        m[r0:r1, c0:c1] = 1.0
        masks.append(m)
    bg = np.where(masks[0] + masks[1] > 0, 0.0, 1.0)
    owner = np.argmax(np.stack(masks + [bg]), axis=0).astype(np.int32)
    return jnp.asarray(owner.reshape(-1))


def longcat_denoise_scan(params, cfg: LongCatConfig, latents, context,
                         context_mask, context_neg, context_neg_mask,
                         plan, guidance: float, num_cond_latents: int = 0,
                         cfg_star: bool = False, cfg_zero_step: int = -1,
                         attn_backend: str = "auto", audio_ctx=None,
                         speaker_owner=None):
    """latents: [1, C, T, H, W] fp32 (cond frames already written in).
    One lax.scan over steps; CFG batches cond/uncond in one forward."""
    nt = latents.shape[2]
    frame_idx = jnp.arange(nt)
    use_cfg = guidance is not None and guidance > 1.0 and \
        context_neg is not None
    if use_cfg:
        ctx = jnp.concatenate([context, context_neg], axis=0)
        msk = None if context_mask is None else \
            jnp.concatenate([context_mask, context_neg_mask], axis=0)
    else:
        ctx, msk = context, context_mask

    ts = jnp.asarray(plan["timesteps"])
    dts = jnp.asarray(plan["dts"])
    steps = jnp.arange(len(plan["timesteps"]))

    def body(x, xs):
        t, dt, step_i = xs
        t_frames = jnp.where(frame_idx < num_cond_latents, 0.0, t)[None]
        xin = jnp.concatenate([x, x], 0) if use_cfg else x
        tin = jnp.concatenate([t_frames, t_frames], 0) if use_cfg \
            else t_frames
        ab = (None if audio_ctx is None else
              jnp.concatenate([audio_ctx, audio_ctx], 0) if use_cfg
              else audio_ctx)
        v = longcat_forward(params, cfg, xin, tin, ctx, msk,
                            num_cond_latents=num_cond_latents,
                            attn_backend=attn_backend, audio_ctx=ab,
                            speaker_owner=speaker_owner)
        if use_cfg:
            pos, neg = v[:1], v[1:]
            if cfg_star:
                st = optimized_scale(pos.reshape(1, -1), neg.reshape(1, -1))
                neg = neg * st.reshape(1, 1, 1, 1, 1)
                pred = neg + guidance * (pos - neg)
                if cfg_zero_step >= 0:
                    pred = jnp.where(step_i <= cfg_zero_step,
                                     jnp.zeros_like(pred), pred)
            else:
                pred = neg + guidance * (pos - neg)
        else:
            pred = v
        pred = -pred                               # longcat_main.py:1019
        x_new = x + dt * pred
        if num_cond_latents > 0:                   # cond frames stay fixed
            keep = (frame_idx < num_cond_latents)[None, None, :, None, None]
            x_new = jnp.where(keep, x, x_new)
        return x_new.astype(jnp.float32), None

    out, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                          (ts, dts, steps))
    return out


class LongCatPipeline:
    """text_encode_fn(prompts) -> (embeds [B, L, 4096], mask [B, L]);
    vae_decode_fn/vae_encode_fn wrap the Wan 2.1 VAE; latent stats are the
    AutoencoderKLWan latents_mean/std (configs/longcat_vae.json)."""

    def __init__(self, params, cfg: LongCatConfig, text_encode_fn=None,
                 vae_decode_fn=None, vae_encode_fn=None,
                 latents_mean=None, latents_std=None,
                 attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.text_encode_fn = text_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.vae_encode_fn = vae_encode_fn
        self.latents_mean = latents_mean
        self.latents_std = latents_std
        self.attn_backend = attn_backend

    def _normalize(self, z):
        if self.latents_mean is None:
            return z
        m = jnp.asarray(self.latents_mean).reshape(1, -1, 1, 1, 1)
        s = jnp.asarray(self.latents_std).reshape(1, -1, 1, 1, 1)
        return (z - m) / s

    def _denormalize(self, z):
        if self.latents_mean is None:
            return z
        m = jnp.asarray(self.latents_mean).reshape(1, -1, 1, 1, 1)
        s = jnp.asarray(self.latents_std).reshape(1, -1, 1, 1, 1)
        return z * s + m

    def generate(self, prompt: str, negative_prompt: str = "",
                 height: int = 480, width: int = 832, frame_num: int = 93,
                 sampling: Optional[LongCatSamplingConfig] = None,
                 image_cond=None, video_cond=None, num_cond_frames: int = 0,
                 seed: int = 0, return_latents: bool = False):
        """image_cond: [B, 3, H, W] first-frame i2v conditioning;
        video_cond: [B, 3, F, H, W] continuation prefix (last
        num_cond_frames frames are VAE-encoded and pinned)."""
        cfg = self.cfg
        sampling = sampling or LongCatSamplingConfig()
        if frame_num % 4 != 1:
            frame_num = max(frame_num // 4 * 4 + 1, 1)
        lat_t = 1 + (frame_num - 1) // 4
        lat_h, lat_w = height // 8, width // 8

        solver = sampling.solver
        if solver == "auto":
            solver = "enhance_hf" if (video_cond is not None and
                                      num_cond_frames > 1) else "default"
        plan = build_step_plan(sampling.steps, solver,
                               sampling.num_distill_steps)

        ctx, msk = self.text_encode_fn([prompt])
        ctx_n = msk_n = None
        if sampling.guidance and sampling.guidance > 1.0:
            ctx_n, msk_n = self.text_encode_fn([negative_prompt or ""])

        key = jax.random.key(seed)
        latents = jax.random.normal(
            key, (1, cfg.in_channels, lat_t, lat_h, lat_w), jnp.float32)

        ncl = 0
        if image_cond is not None or (video_cond is not None and
                                      num_cond_frames > 0):
            if image_cond is not None:
                pix = image_cond[:, :, None]          # [B, 3, 1, H, W]
                n_pix = 1
            else:
                n_pix = min(num_cond_frames, video_cond.shape[2])
                pix = video_cond[:, :, -n_pix:]
            cond_lat = self._normalize(self.vae_encode_fn(pix))
            ncl = 1 + (n_pix - 1) // 4
            ncl = min(ncl, lat_t)
            latents = latents.at[:, :, :ncl].set(
                cond_lat[:, :, :ncl].astype(jnp.float32))

        latents = longcat_denoise_scan(
            self.params, cfg, latents, ctx, msk, ctx_n, msk_n, plan,
            sampling.guidance, num_cond_latents=ncl,
            cfg_star=sampling.cfg_star, cfg_zero_step=sampling.cfg_zero_step,
            attn_backend=self.attn_backend)

        if return_latents or self.vae_decode_fn is None:
            return latents
        return self.vae_decode_fn(self._denormalize(latents))

    def generate_avatar(self, prompt: str, audio_windows,
                        audio_proj_params=None, ref_image=None,
                        negative_prompt: str = "", height: int = 480,
                        width: int = 832, frame_num: int = 93,
                        sampling: Optional[LongCatSamplingConfig] = None,
                        seed: int = 0, return_latents: bool = False,
                        audio_windows2=None, speakers_bboxes=None):
        """LongCat Avatar (modules/avatar/): audio_windows =
        (first [1, 1, 5, blocks, 768], latter [1, T_lat-1, 8, blocks,
        768]) wav2vec windows (the multitalk AudioProjModel layout),
        projected to per-frame context tokens that every block
        cross-attends; ref_image pins the first latent frame."""
        from ..wan.multitalk import AudioProjConfig, audio_proj_forward
        cfg = self.cfg
        sampling = sampling or LongCatSamplingConfig()
        if frame_num % 4 != 1:
            frame_num = max(frame_num // 4 * 4 + 1, 1)
        lat_t = 1 + (frame_num - 1) // 4
        lat_h, lat_w = height // 8, width // 8
        plan = build_step_plan(sampling.steps, sampling.solver
                               if sampling.solver != "auto" else "default",
                               sampling.num_distill_steps)
        ctx, msk = self.text_encode_fn([prompt])
        ctx_n = msk_n = None
        if sampling.guidance and sampling.guidance > 1.0:
            ctx_n, msk_n = self.text_encode_fn([negative_prompt or ""])
        first, latter = audio_windows
        audio_ctx = audio_proj_forward(
            audio_proj_params, AudioProjConfig(), jnp.asarray(first),
            jnp.asarray(latter))                 # [1, T, 32, 768]
        speaker_owner = None
        if audio_windows2 is not None:
            # Avatar Multi (longcat_main.py:866-873): both speakers'
            # contexts concatenated per frame + speaker-region routing
            f2, l2 = audio_windows2
            audio_ctx2 = audio_proj_forward(
                audio_proj_params, AudioProjConfig(), jnp.asarray(f2),
                jnp.asarray(l2))
            audio_ctx = jnp.concatenate([audio_ctx, audio_ctx2], axis=2)
            # ownership lives on the patchified token grid
            _, ph, pw = cfg.patch_size
            speaker_owner = build_speaker_owner(lat_h // ph, lat_w // pw,
                                                speakers_bboxes)
        key = jax.random.key(seed)
        latents = jax.random.normal(
            key, (1, cfg.in_channels, lat_t, lat_h, lat_w), jnp.float32)
        ncl = 0
        if ref_image is not None:
            pix = jnp.asarray(ref_image)[:, :, None]
            cond_lat = self._normalize(self.vae_encode_fn(pix))
            ncl = 1
            latents = latents.at[:, :, :1].set(
                cond_lat[:, :, :1].astype(jnp.float32))
        # audio covers the noise frames only
        audio_ctx = audio_ctx[:, ncl:lat_t]
        latents = longcat_denoise_scan(
            self.params, cfg, latents, ctx, msk, ctx_n, msk_n, plan,
            sampling.guidance, num_cond_latents=ncl,
            cfg_star=sampling.cfg_star,
            cfg_zero_step=sampling.cfg_zero_step,
            attn_backend=self.attn_backend, audio_ctx=audio_ctx,
            speaker_owner=speaker_owner)
        if return_latents or self.vae_decode_fn is None:
            return latents
        return self.vae_decode_fn(self._denormalize(latents))
