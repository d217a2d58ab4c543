"""Qwen-Image generation pipeline: flow-match Euler with resolution-shifted
sigmas (pipeline_qwenimage.py:57 calculate_shift + :839) and true CFG
(:769 do_true_cfg).  Latents pack 2x2 like Flux."""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import QwenImageConfig, qwen_image_forward, qwen_rope
from ..flux.dit import pack_latent, unpack_latent
from ...guidance import cfg_combine


def qwen_schedule(num_steps: int, image_seq_len: int,
                  base_shift: float = 0.5, max_shift: float = 1.15,
                  base_seq: int = 256, max_seq: int = 8192):
    ts = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    m = (max_shift - base_shift) / (max_seq - base_seq)
    mu = m * image_seq_len + (base_shift - m * base_seq)
    with np.errstate(divide="ignore"):
        ts = math.exp(mu) / (math.exp(mu) + (1.0 / ts - 1.0))
    ts[-1] = 0.0
    return ts


@dataclasses.dataclass(frozen=True)
class QwenSamplingConfig:
    steps: int = 25
    true_cfg_scale: float = 4.0


def qwen_denoise_scan(params, cfg: QwenImageConfig, tokens, text, text_null,
                      sigmas, sampling: QwenSamplingConfig,
                      rope_cos, rope_sin, cond_tokens=None,
                      attn_backend="auto"):
    """cond_tokens: optional [B, L_cond, C] Qwen-Image-Edit conditioning
    latents appended after the noise tokens each step
    (pipeline_qwenimage.py:914-916); only the noise slice integrates."""
    b = tokens.shape[0]
    base_len = tokens.shape[1]
    g = sampling.true_cfg_scale
    use_cfg = g != 1.0
    sig = jnp.asarray(sigmas, jnp.float32)
    txt = jnp.concatenate([text, text_null], axis=0) if use_cfg else text

    def body(x, i):
        xin = (x if cond_tokens is None else
               jnp.concatenate([x, cond_tokens.astype(x.dtype)], axis=1))
        t = jnp.broadcast_to(sig[i], (2 * b if use_cfg else b,))
        xb = jnp.concatenate([xin, xin], axis=0) if use_cfg else xin
        v = qwen_image_forward(params, cfg, xb, t, txt, rope_cos, rope_sin,
                               attn_backend=attn_backend)[:, :base_len]
        pred = cfg_combine(v[:b], v[b:], g, jnp.asarray(False)) if use_cfg \
            else v
        return x + pred * (sig[i + 1] - sig[i]), None

    x, _ = jax.lax.scan(body, tokens.astype(jnp.float32),
                        jnp.arange(len(sigmas) - 1))
    return x


class QwenImagePipeline:
    def __init__(self, dit_params, dit_cfg: QwenImageConfig,
                 vae_decode_fn=None, text_encode_fn=None,
                 attn_backend="auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.attn_backend = attn_backend
        self._cache: Dict[Any, Any] = {}

    def generate(self, prompt: str = "", width: int = 1024,
                 height: int = 1024, seed: int = 0,
                 sampling: QwenSamplingConfig = QwenSamplingConfig(),
                 text=None, text_null=None, return_latents: bool = False):
        h_lat, w_lat = height // 8, width // 8
        h_tok, w_tok = h_lat // 2, w_lat // 2
        seq = h_tok * w_tok
        lat = jax.random.normal(jax.random.key(seed), (1, 16, h_lat, w_lat),
                                jnp.float32)
        tokens = pack_latent(lat)
        if text is None:
            text, text_null = self.text_encode_fn(prompt)
        if text_null is None:
            text_null = text
        sigmas = qwen_schedule(sampling.steps, seq)
        cos, sin = qwen_rope((1, h_tok, w_tok), text.shape[1], self.dit_cfg)
        sig = (sampling, tokens.shape, text.shape)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                qwen_denoise_scan, cfg=self.dit_cfg, sigmas=sigmas,
                sampling=sampling, rope_cos=cos, rope_sin=sin,
                attn_backend=self.attn_backend))
            self._cache[sig] = fn
        x = fn(self.dit_params, tokens=tokens, text=text,
               text_null=text_null)
        z = unpack_latent(x, h_lat, w_lat)
        if return_latents or self.vae_decode_fn is None:
            return z
        return self.vae_decode_fn(z)

    def generate_layered(self, prompt: str, num_layers: int = 4,
                         width: int = 1024, height: int = 1024,
                         seed: int = 0,
                         sampling: QwenSamplingConfig = QwenSamplingConfig(),
                         text=None, text_null=None,
                         return_latents: bool = False):
        """Qwen-Image-Layered (pipeline_qwenimage.py:517-524, 831-835,
        1016-1022): L layer latents share one packed sequence (each
        layer its own rope frame index), denoise jointly, decode each
        layer separately — with the layered RGBA VAE the output is a
        stack of editable transparent layers."""
        h_lat, w_lat = height // 8, width // 8
        h_tok, w_tok = h_lat // 2, w_lat // 2
        seq = h_tok * w_tok
        lat = jax.random.normal(
            jax.random.key(seed), (num_layers, 16, h_lat, w_lat),
            jnp.float32)
        tokens = pack_latent(lat).reshape(1, num_layers * seq, -1)
        if text is None:
            text, text_null = self.text_encode_fn(prompt)
        if text_null is None:
            text_null = text
        sigmas = qwen_schedule(sampling.steps, num_layers * seq)
        grids = [(1, h_tok, w_tok)] * num_layers
        cos, sin = qwen_rope(grids, text.shape[1], self.dit_cfg)
        fn = jax.jit(functools.partial(
            qwen_denoise_scan, cfg=self.dit_cfg, sigmas=sigmas,
            sampling=sampling, rope_cos=cos, rope_sin=sin,
            attn_backend=self.attn_backend))
        x = fn(self.dit_params, tokens=tokens, text=text,
               text_null=text_null)
        x = x.reshape(num_layers, seq, -1)
        z = unpack_latent(x, h_lat, w_lat)
        if return_latents or self.vae_decode_fn is None:
            return z
        return self.vae_decode_fn(z)

    def generate_edit(self, prompt: str, cond_latents, width: int = 1024,
                      height: int = 1024, seed: int = 0,
                      sampling: QwenSamplingConfig = QwenSamplingConfig(),
                      text=None, text_null=None,
                      return_latents: bool = False):
        """Qwen-Image-Edit: conditioning image latents ([C, h, w] each,
        VAE-normalized) are packed and appended; rope frame index increments
        per image (pipeline_qwenimage.py:485-533, 805-835, 914-916)."""
        h_lat, w_lat = height // 8, width // 8
        h_tok, w_tok = h_lat // 2, w_lat // 2
        grids = [(1, h_tok, w_tok)]
        cond_parts = []
        for z in cond_latents:
            z = jnp.asarray(z)
            ch, cw = z.shape[1] // 2, z.shape[2] // 2
            grids.append((1, ch, cw))
            cond_parts.append(pack_latent(z[None]))
        cond_tokens = jnp.concatenate(cond_parts, axis=1)

        lat = jax.random.normal(jax.random.key(seed), (1, 16, h_lat, w_lat),
                                jnp.float32)
        tokens = pack_latent(lat)
        if text is None:
            text, text_null = self.text_encode_fn(prompt)
        if text_null is None:
            text_null = text
        sigmas = qwen_schedule(sampling.steps, h_tok * w_tok)
        cos, sin = qwen_rope(grids, text.shape[1], self.dit_cfg)
        fn = jax.jit(functools.partial(
            qwen_denoise_scan, cfg=self.dit_cfg, sigmas=sigmas,
            sampling=sampling, rope_cos=cos, rope_sin=sin,
            attn_backend=self.attn_backend))
        x = fn(self.dit_params, tokens=tokens, text=text,
               text_null=text_null, cond_tokens=cond_tokens)
        z = unpack_latent(x, h_lat, w_lat)
        if return_latents or self.vae_decode_fn is None:
            return z
        return self.vae_decode_fn(z)
