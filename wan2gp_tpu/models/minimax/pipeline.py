"""MiniMax H3 T2VA pipeline: dual-sigma euler denoising.

Reference loop (/root/reference/models/minimax_h3/pipeline.py:502-556):
sigmas_video = shift-transformed linspace (shift 12), sigmas_audio the same
with shift 3; per step the model yields joint velocities and each modality
integrates on its own schedule:
  denoised = v * sigma + x;  x = x * (s_next/s) + denoised * (1 - s_next/s)
The res_multistep solver and conditioning (refs/keyframes) are later
rounds; the whole loop runs as one jit-compiled lax.scan.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (MiniMaxH3Config, minimax_h3_forward, refine_text,
                  build_layout, build_minimax_rope)


def minimax_sigmas(steps: int, shift: float) -> np.ndarray:
    base = np.linspace(1.0, 0.0, steps + 1)
    s = shift * base / (1.0 + (shift - 1.0) * base)
    return s


@dataclasses.dataclass(frozen=True)
class MiniMaxSamplingConfig:
    steps: int = 30
    shift_video: float = 12.0
    shift_audio: float = 3.0


def minimax_denoise_scan(params, cfg: MiniMaxH3Config, video, audio,
                         text_hidden, sig_v, sig_a, layout, rope,
                         attn_backend="auto", ref_rows=None):
    sv = jnp.asarray(sig_v, jnp.float32)
    sa = jnp.asarray(sig_a, jnp.float32)

    def body(carry, i):
        video, audio = carry
        vel_v, vel_a = minimax_h3_forward(
            params, cfg, video, audio, sv[i], sa[i], text_hidden, layout,
            rope, attn_backend=attn_backend, ref_rows=ref_rows)
        den_v = vel_v * sv[i] + video
        rv = sv[i + 1] / sv[i]
        video = video * rv + den_v * (1.0 - rv)
        den_a = vel_a * sa[i] + audio
        ra = jnp.where(sa[i] > 0, sa[i + 1] / sa[i], 0.0)
        audio = audio * ra + den_a * (1.0 - ra)
        return (video, audio), None

    (video, audio), _ = jax.lax.scan(
        body, (video.astype(jnp.float32), audio.astype(jnp.float32)),
        jnp.arange(len(sig_v) - 1))
    return video, audio


class MiniMaxH3Pipeline:
    """text_encode_fn(prompts) -> [1, L, 5120] LLM states; the audio/video
    VAEs (components/{video,audio}_autoencoder.py) land in a later round —
    generate() returns latents."""

    def __init__(self, dit_params, dit_cfg: MiniMaxH3Config,
                 text_encode_fn=None, video_vae_decode_fn=None,
                 audio_vae_decode_fn=None, attn_backend="auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.text_encode_fn = text_encode_fn
        self.video_vae_decode_fn = video_vae_decode_fn
        self.audio_vae_decode_fn = audio_vae_decode_fn
        self.attn_backend = attn_backend
        self.vae_stride = (4, 16, 16)
        self._cache: Dict[Any, Any] = {}

    def generate(self, prompt: str = "", width: int = 512,
                 height: int = 512, frame_num: int = 49,
                 audio_latents: int = 16, fps: float = 24.0,
                 sampling: MiniMaxSamplingConfig = MiniMaxSamplingConfig(),
                 seed: int = 0, context=None, return_latents: bool = True,
                 ref_latents=None):
        """ref_latents: optional Ref2VA reference-image latents, list of
        [C, 1, h_lat, w_lat] arrays (video-VAE-encoded stills); they are
        patchified, noise-augmented to VISUAL_COND_TIMESTEP and prepended
        as fixed conditioning rows (pipeline.py
        _prepare_condition_rows:332-338)."""
        cfg = self.dit_cfg
        if context is None:
            context = self.text_encode_fn([prompt])
        text_hidden = refine_text(params=self.dit_params, cfg=cfg,
                                  text_states=context[0],
                                  attn_backend=self.attn_backend)

        st, sh, sw = self.vae_stride
        t_lat = (frame_num - 1) // st + 1
        h_lat, w_lat = height // sh, width // sw
        ref_grids = tuple((r.shape[-2], r.shape[-1])
                          for r in (ref_latents or ()))
        layout = build_layout(context.shape[1], t_lat, h_lat, w_lat,
                              audio_latents, cfg, fps, ref_grids=ref_grids)
        rope = build_minimax_rope(layout["positions"], cfg)

        ref_rows = None
        if ref_latents:
            from .dit import (patchify_video_minimax,
                              VISUAL_COND_TIMESTEP)
            rows = []
            rk = jax.random.key(seed + 7)
            for i, r in enumerate(ref_latents):
                rr = patchify_video_minimax(
                    jnp.asarray(r, jnp.float32)[None], cfg.patch_size)
                noise = jax.random.normal(jax.random.fold_in(rk, i),
                                          rr.shape, jnp.float32)
                rows.append(rr * VISUAL_COND_TIMESTEP
                            + noise * (1.0 - VISUAL_COND_TIMESTEP))
            ref_rows = jnp.concatenate(rows, axis=0)

        k1, k2 = jax.random.split(jax.random.key(seed))
        video = jax.random.normal(
            k1, (1, cfg.latents_dim, t_lat, h_lat, w_lat), jnp.float32)
        audio = jax.random.normal(
            k2, (1, cfg.audio_latents_dim, 2, audio_latents), jnp.float32)

        sig_v = minimax_sigmas(sampling.steps, sampling.shift_video)
        sig_a = minimax_sigmas(sampling.steps, sampling.shift_audio)

        sig = (sampling, video.shape, audio.shape, text_hidden.shape,
               ref_grids)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                minimax_denoise_scan, cfg=cfg, sig_v=sig_v, sig_a=sig_a,
                layout=layout, rope=rope, attn_backend=self.attn_backend))
            self._cache[sig] = fn
        if ref_rows is not None:
            video, audio = fn(self.dit_params, video=video, audio=audio,
                              text_hidden=text_hidden, ref_rows=ref_rows)
        else:
            video, audio = fn(self.dit_params, video=video, audio=audio,
                              text_hidden=text_hidden)
        if return_latents or self.video_vae_decode_fn is None:
            return video, audio
        return (self.video_vae_decode_fn(video),
                self.audio_vae_decode_fn(audio)
                if self.audio_vae_decode_fn else audio)
