"""ACE-Step text2music pipeline.

Re-design of /root/reference/models/TTS/ace_step/pipeline_ace_step.py
(text2music_diffusion_process:481+): flow-matching over DCAE latents
[B, 8, 16, T] with shifted Euler sigmas
(schedulers/scheduling_flow_match_euler_discrete.py:81-84:
sigma' = shift*s / (1 + (shift-1)*s)), CFG or APG guidance
(apg_guidance.py apg_forward:33: momentum-buffered diff, norm clamp 2.5,
orthogonal projection against the cond branch), the whole denoise loop one
jitted lax.scan.

Duration -> latent frames: 44.1 kHz, hop 512, DCAE time f8
-> T = duration_s * 44100 / 512 / 8 ~= duration_s * 10.77.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .ace_dit import (ACEStepConfig, ace_dit_forward, ace_encode_condition)


def ace_sigmas(num_steps: int, shift: float = 3.0) -> np.ndarray:
    """[N+1] descending sigmas with the SD3 shift
    (scheduling_flow_match_euler_discrete.py:78-91)."""
    s = np.linspace(1.0, 1.0 / num_steps, num_steps, dtype=np.float64)
    s = shift * s / (1.0 + (shift - 1.0) * s)
    return np.concatenate([s, [0.0]]).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ACESamplingConfig:
    steps: int = 60
    shift: float = 3.0
    guide_scale: float = 15.0
    cfg_type: str = "apg"       # "apg" | "cfg" (pipeline_ace_step.py:419)
    apg_eta: float = 0.0
    apg_norm_threshold: float = 2.5
    apg_momentum: float = -0.75


def _apg(cond, uncond, g, buf, eta, norm_threshold, momentum):
    """apg_forward (apg_guidance.py:33-56) with the MomentumBuffer carried
    through the scan."""
    diff = cond - uncond
    buf = momentum * buf + diff
    diff = buf
    nrm = jnp.sqrt(jnp.sum(diff * diff, axis=(-1, -2), keepdims=True))
    diff = diff * jnp.minimum(1.0, norm_threshold / jnp.maximum(nrm, 1e-12))
    # project diff onto cond: parallel + orthogonal
    c = cond / jnp.maximum(jnp.sqrt(jnp.sum(cond * cond, axis=(-1, -2),
                                            keepdims=True)), 1e-12)
    par = jnp.sum(diff * c, axis=(-1, -2), keepdims=True) * c
    orth = diff - par
    return cond + (g - 1.0) * (orth + 0.0 * par), buf


def ace_denoise_scan(params, cfg: ACEStepConfig,
                     sampling: ACESamplingConfig, latents, enc, enc_mask,
                     enc_null, enc_null_mask):
    """latents: [B, 8, 16, T] N(0,1) noise.  Returns denoised latents."""
    sig = jnp.asarray(ace_sigmas(sampling.steps, sampling.shift))
    g = sampling.guide_scale
    use_cfg = g not in (0.0, 1.0)
    b = latents.shape[0]

    if use_cfg:
        enc_len = max(enc.shape[1], enc_null.shape[1])

        def pad_to(e, m):
            p = enc_len - e.shape[1]
            if p:
                e = jnp.pad(e, [(0, 0), (0, p), (0, 0)])
                m = jnp.pad(m, [(0, 0), (0, p)])
            return e, m
        enc, enc_mask = pad_to(enc, enc_mask)
        enc_null, enc_null_mask = pad_to(enc_null, enc_null_mask)
        enc2 = jnp.concatenate([enc, enc_null], axis=0)
        mask2 = jnp.concatenate([enc_mask, enc_null_mask], axis=0)

    def body(carry, i):
        x, buf = carry
        sigma, sig_next = sig[i], sig[i + 1]
        t = jnp.broadcast_to(sigma * 1000.0, (b,))
        if use_cfg:
            xb = jnp.concatenate([x, x], axis=0)
            tb = jnp.concatenate([t, t], axis=0)
            v = ace_dit_forward(params, cfg, xb.astype(jnp.float32), tb,
                                enc2, mask2)
            cond, uncond = v[:b], v[b:]
            if sampling.cfg_type == "apg":
                pred, buf = _apg(cond, uncond, g, buf, sampling.apg_eta,
                                 sampling.apg_norm_threshold,
                                 sampling.apg_momentum)
            else:
                pred = uncond + g * (cond - uncond)
        else:
            pred = ace_dit_forward(params, cfg, x.astype(jnp.float32), t,
                                   enc, enc_mask)
        x = x + (sig_next - sigma) * pred
        return (x, buf), None

    carry0 = (latents.astype(jnp.float32), jnp.zeros_like(latents))
    (x, _), _ = jax.lax.scan(body, carry0,
                             jnp.arange(sampling.steps, dtype=jnp.int32))
    return x


class ACEStepPipeline:
    """text (genre tags) + lyrics -> music latents -> mel -> waveform."""

    def __init__(self, params, cfg: ACEStepConfig, text_fn=None,
                 dcae_params=None, dcae_cfg=None, vocoder_params=None,
                 vocoder_cfg=None, lyric_tokenizer=None,
                 attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.text_fn = text_fn           # prompts -> ([B,L,768], mask)
        self.dcae_params = dcae_params
        self.dcae_cfg = dcae_cfg
        self.vocoder_params = vocoder_params
        self.vocoder_cfg = vocoder_cfg
        self.lyric_tokenizer = lyric_tokenizer
        self.attn_backend = attn_backend
        self._cache: Dict[Any, Any] = {}

    def _encode(self, prompt, lyrics, speaker=None):
        cfg = self.cfg
        if self.text_fn is not None:
            text_hidden, text_mask = self.text_fn([prompt])
        else:
            text_hidden = jnp.zeros((1, 8, cfg.text_dim), jnp.float32)
            text_mask = jnp.ones((1, 8), jnp.int32)
        if self.lyric_tokenizer is not None and lyrics:
            ids = np.asarray(self.lyric_tokenizer(lyrics), np.int32)[None]
        else:
            # fallback: bytes clamped into the lyric vocab
            raw = (lyrics or "").encode()[:256] or b"\x00"
            ids = (np.frombuffer(raw, np.uint8).astype(np.int32)
                   % self.cfg.lyric_vocab)[None]
        lyric_mask = jnp.ones(ids.shape, jnp.int32)
        spk = (jnp.zeros((1, cfg.speaker_dim), jnp.float32)
               if speaker is None else speaker)
        return ace_encode_condition(self.params, cfg, text_hidden,
                                    text_mask, spk, jnp.asarray(ids),
                                    lyric_mask)

    def generate(self, prompt: str = "", lyrics: str = "",
                 duration: float = 30.0,
                 sampling: Optional[ACESamplingConfig] = None,
                 seed: int = 0, return_latents: bool = False):
        sampling = sampling or ACESamplingConfig()
        t_lat = max(4, int(round(duration * 44100 / 512 / 8)))
        enc, enc_mask = self._encode(prompt, lyrics)
        enc_n, enc_n_mask = self._encode("", "")
        latents = jax.random.normal(
            jax.random.key(seed), (1, self.cfg.in_channels,
                                   self.cfg.max_height, t_lat), jnp.float32)
        key = (sampling, t_lat, enc.shape, enc_n.shape)
        fn = self._cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(ace_denoise_scan, cfg=self.cfg,
                                           sampling=sampling))
            self._cache[key] = fn
        x = fn(self.params, latents=latents, enc=enc, enc_mask=enc_mask,
               enc_null=enc_n, enc_null_mask=enc_n_mask)
        out = {"latents": x}
        if return_latents or self.dcae_params is None:
            return out
        from .ace_audio import dcae_decode, adamos_vocode
        mels = dcae_decode(self.dcae_params, self.dcae_cfg, x)
        out["mels"] = mels
        if self.vocoder_params is not None:
            waves = [adamos_vocode(self.vocoder_params, self.vocoder_cfg,
                                   mels[:, c]) for c in range(mels.shape[1])]
            out["audio"] = jnp.stack(waves, axis=1)[0]      # [C, T]
            out["sample_rate"] = 44100
        return out
