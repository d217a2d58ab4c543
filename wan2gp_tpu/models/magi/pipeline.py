"""MAGI-Human sampling pipeline, TPU-native.

Mirrors /root/reference/models/magi_human/magi_human_model.py
_run_diffusion_phase and upstream/inference/pipeline/
{data_proxy.py,scheduler_unipc.py}:
- sigma ladder linspace(1, 1/1000, N+1)[:-1] with the flow shift
  transform, final sigma 0 appended (scheduler_unipc.py:164-200);
- guidance-free path uses step_ddim — stochastic re-noising
  x0 = x - sigma*v; x <- sigma_next*noise + (1 - sigma_next)*x0
  (:708-744); the CFG path steps UniPC with
  guidance = guide_scale if t > 500 else 2.0 (magi_human_model.py:566);
- joint audio-video: both modalities denoise in one packed forward,
  first video latent frame pinned to the encoded reference image every
  step (:532-533);
- coords: video 3D grid; audio (t, 1, 1) with ref_T =
  ((len-1)//4 + 1); text (t, 1, 1) with ref (1,1,1) and offset -Nt
  ("v2" style, data_proxy.py:196-214).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import MagiConfig, magi_forward, magi_coords, magi_fourier_rope
from ...schedulers.base import make_schedule, init_solver_state, solver_step


def magi_sigmas(steps: int, shift: float = 3.0) -> np.ndarray:
    sig = np.linspace(1.0, 1.0 / 1000.0, steps + 1)[:-1]
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


def pack_video_latents(lat, patch: int = 2):
    """[B, C, T, H, W] -> [B, T*(H/p)*(W/p), C*p*p], feature order
    (ph, pw, c) with c fastest (data_proxy.py depack '(pT pH pW C)')."""
    b, c, t, h, w = lat.shape
    gh, gw = h // patch, w // patch
    x = lat.reshape(b, c, t, gh, patch, gw, patch)
    x = x.transpose(0, 2, 3, 5, 4, 6, 1)      # b t gh gw ph pw c
    return x.reshape(b, t * gh * gw, patch * patch * c)


def unpack_video_latents(tok, t: int, h: int, w: int, patch: int = 2):
    b = tok.shape[0]
    gh, gw = h // patch, w // patch
    c = tok.shape[-1] // (patch * patch)
    x = tok.reshape(b, t, gh, gw, patch, patch, c)
    x = x.transpose(0, 6, 1, 2, 4, 3, 5)
    return x.reshape(b, c, t, h, w)


def build_magi_layout(cfg: MagiConfig, lat_t: int, lat_h: int, lat_w: int,
                      audio_len: int, text_len: int):
    """Packed [video | audio | text] rope tables (coords 'v2' style)."""
    gh, gw = lat_h // cfg.patch_size, lat_w // cfg.patch_size
    vid = magi_coords((lat_t, gh, gw), (lat_t, gh, gw))
    audio_ref_t = (audio_len - 1) // 4 + 1
    aud = magi_coords((audio_len, 1, 1), (audio_ref_t, 1, 1))
    txt = magi_coords((text_len, 1, 1), (1, 1, 1), offset_t=-text_len)
    coords = np.concatenate([vid, aud, txt], axis=0)
    cos, sin = magi_fourier_rope(cfg, coords)
    return {"cos": cos, "sin": sin, "grid": (lat_t, gh, gw)}


@dataclasses.dataclass(frozen=True)
class MagiSamplingConfig:
    steps: int = 8
    shift: float = 3.0
    guidance: float = 1.0
    audio_guidance: float = 1.0


class MagiPipeline:
    """text_encode_fn(prompts) -> [1, L, 3584] (T5Gemma last hidden);
    vae decode/encode wrap the Wan 2.2 48-channel VAE."""

    def __init__(self, params, cfg: MagiConfig, text_encode_fn=None,
                 vae_decode_fn=None, vae_encode_fn=None,
                 audio_vae_decode_fn=None, attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.text_encode_fn = text_encode_fn
        self.vae_decode_fn = vae_decode_fn
        self.vae_encode_fn = vae_encode_fn
        self.audio_vae_decode_fn = audio_vae_decode_fn
        self.attn_backend = attn_backend

    def generate(self, prompt: str, negative_prompt: str = "",
                 height: int = 256, width: int = 448, frame_num: int = 101,
                 audio_latent=None, image_latent=None,
                 sampling: Optional[MagiSamplingConfig] = None,
                 seed: int = 0, return_latents: bool = False):
        """image_latent: [B, 48, >=1, h/16, w/16] reference (frame 0 pinned);
        audio_latent: [B, Na, 64] fixed audio conditioning (audio branch is
        not stepped when provided)."""
        cfg = self.cfg
        sampling = sampling or MagiSamplingConfig()
        lat_t = 1 + (frame_num - 1) // 4
        lat_h, lat_w = height // 16, width // 16
        sig = magi_sigmas(sampling.steps, sampling.shift)

        ctx = self.text_encode_fn([prompt])
        use_cfg = sampling.guidance > 1.0 or sampling.audio_guidance > 1.0
        ctx_n = self.text_encode_fn([negative_prompt or ""]) if use_cfg \
            else None

        key = jax.random.key(seed)
        lat_c = cfg.video_in // (cfg.patch_size ** 2 * cfg.t_patch_size)
        video = jax.random.normal(
            key, (1, lat_c, lat_t, lat_h, lat_w), jnp.float32)
        step_audio = audio_latent is None
        if step_audio:
            audio_latent = jax.random.normal(
                jax.random.fold_in(key, 1), (1, lat_t * 4, cfg.audio_in),
                jnp.float32)
        na = audio_latent.shape[1]
        layout = build_magi_layout(cfg, lat_t, lat_h, lat_w, na,
                                   ctx.shape[1])
        layout_n = (build_magi_layout(cfg, lat_t, lat_h, lat_w, na,
                                      ctx_n.shape[1]) if ctx_n is not None
                    else None)

        if use_cfg:
            sched = make_schedule("unipc", sampling.steps,
                                  shift=sampling.shift)
            sv = init_solver_state(sched,
                                   pack_video_latents(video,
                                                      cfg.patch_size))
            sa = init_solver_state(sched, audio_latent)

        for i in range(sampling.steps):
            s, s_next = float(sig[i]), float(sig[i + 1])
            if image_latent is not None:
                video = video.at[:, :, :1].set(
                    image_latent[:, :, :1].astype(jnp.float32))
            vtok = pack_video_latents(video, cfg.patch_size)
            pv, pa = magi_forward(self.params, cfg, vtok, audio_latent,
                                  ctx, layout["cos"], layout["sin"],
                                  attn_backend=self.attn_backend)
            if use_cfg:
                pvn, pan = magi_forward(self.params, cfg, vtok,
                                        audio_latent, ctx_n,
                                        layout_n["cos"], layout_n["sin"],
                                        attn_backend=self.attn_backend)
                t_val = s * 1000.0
                g = sampling.guidance if t_val > 500.0 else \
                    min(2.0, sampling.guidance)
                pv = pvn + g * (pv - pvn)
                pa = pan + sampling.audio_guidance * (pa - pan)
                ci = {k: v[i] for k, v in sched.coeffs.items()}
                vtok_next, sv = solver_step(
                    sched, i, ci, pv, vtok.astype(jnp.float32), sv)
                video = unpack_video_latents(vtok_next, lat_t, lat_h,
                                             lat_w, cfg.patch_size)
                if step_audio:
                    audio_latent, sa = solver_step(
                        sched, i, ci, pa,
                        audio_latent.astype(jnp.float32), sa)
            else:
                # step_ddim: x0 = x - sigma*v; x <- re-noise at sigma_next
                nk = jax.random.fold_in(jax.random.key(seed + 7), i)
                x0_v = vtok.astype(jnp.float32) - s * pv
                noise_v = jax.random.normal(nk, vtok.shape, jnp.float32)
                vtok_next = s_next * noise_v + (1.0 - s_next) * x0_v
                video = unpack_video_latents(vtok_next, lat_t, lat_h,
                                             lat_w, cfg.patch_size)
                if step_audio:
                    x0_a = audio_latent.astype(jnp.float32) - s * pa
                    noise_a = jax.random.normal(
                        jax.random.fold_in(nk, 1), audio_latent.shape,
                        jnp.float32)
                    audio_latent = s_next * noise_a + (1.0 - s_next) * x0_a

        if image_latent is not None:
            video = video.at[:, :, :1].set(
                image_latent[:, :, :1].astype(jnp.float32))
        if return_latents or self.vae_decode_fn is None:
            return video, audio_latent
        out_video = self.vae_decode_fn(video)
        out_audio = (self.audio_vae_decode_fn(audio_latent)
                     if self.audio_vae_decode_fn else audio_latent)
        return out_video, out_audio
