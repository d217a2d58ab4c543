"""Z-Image generation pipeline: flow-Euler (base) + unified/UCGM (turbo).

Mirrors /root/reference/models/z_image/pipeline_z_image.py:
- base path: FlowMatchEuler sigmas with the flux mu-shift
  (calculate_shift :74-85), model timestep (1000-t)/1000 (:897), update
  x += (sigma_next - sigma_cur) * (-model_out) (:961), CFG
  pred = pos + g*(pos-neg) with optional norm rescale (:934-942) and
  sigma-based truncation (:905-908).
- unified path (UCGM-S, unified_sampler.py): with the Linear transport the
  order-1 update reduces to x_hat = x + t*m, z_hat = x - (1-t)*m,
  x_next = (1-t_next)*x_hat + t_next*(sqrt(1-rho)*z_hat + sqrt(rho)*noise),
  model timestep 1 - t, target-timestep embedding for the distilled model.
  Presets: unified_2s gap [0.001, 0.6] style 'few' (tt=0); unified_4s
  [0.001, 0.5] 'any' (tt=t_next); unified_mul [0.001, 0.0] 'mul' (tt=t)
  (pipeline_z_image.py:149-186), stochast_ratio 1.0.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (ZImageConfig, zimage_forward, build_zimage_rope,
                  patchify_zimage, unpatchify_zimage)


def zimage_schedule(steps: int, image_seq_len: int,
                    base_shift: float = 0.5, max_shift: float = 1.15):
    """Mu-shifted sigmas [steps+1], 1 -> 0 (calculate_shift + FlowMatch
    grid; terminal sigma pinned to 0 via scheduler.sigma_min = 0)."""
    m = (max_shift - base_shift) / (4096 - 256)
    mu = m * image_seq_len + (base_shift - m * 256)
    s = np.linspace(1.0, 1.0 / steps, steps, dtype=np.float64)
    s = math.exp(mu) / (math.exp(mu) + (1.0 / s - 1.0))
    return np.concatenate([s, [0.0]])


def unified_t_grid(steps: int, solver: str = "unified"):
    """(t_steps [N+1] descending, style) — pipeline_z_image.py:166-186,690-
    703.  t ascends gap0..1-gap1 then is flipped and 0 appended."""
    if solver == "unified_2s" or steps <= 2:
        gap, style = (0.001, 0.6), "few"
    elif solver == "unified_4s" or steps <= 4:
        gap, style = (0.001, 0.5), "any"
    else:
        gap, style = (0.001, 0.0), "mul"
    num = steps
    if gap[1] == 0.0:
        num += 1
    t = np.linspace(gap[0], 1.0 - gap[1], num, dtype=np.float64)
    if gap[1] == 0.0:
        t = t[:-1]
    return np.concatenate([1.0 - t, [0.0]]), style


@dataclasses.dataclass(frozen=True)
class ZImageSamplingConfig:
    steps: int = 8
    guidance: float = 0.0           # CFG scale g: pred = pos + g*(pos-neg)
    solver: str = "unified"         # "default" (euler) | "unified[_2s|_4s]"
    cfg_truncation: float = 1.0     # drop CFG when model-t > this
    cfg_normalization: float = 0.0  # >0: cap ||pred|| at ratio*||pos||


def _cfg_combine(pos, neg, g, norm_ratio):
    pred = pos + g * (pos - neg)
    if norm_ratio > 0:
        pos_n = jnp.sqrt(jnp.sum(pos.astype(jnp.float32) ** 2))
        new_n = jnp.sqrt(jnp.sum(pred.astype(jnp.float32) ** 2))
        cap = pos_n * norm_ratio
        pred = jnp.where(new_n > cap, pred * (cap / new_n), pred)
    return pred


def zimage_denoise_scan(params, cfg: ZImageConfig, img_tokens, cap, cap_neg,
                        sampling: ZImageSamplingConfig, sigmas,
                        x_rope, cap_rope, uni_rope, cap_len: int,
                        img_len: int, noise_key=None,
                        attn_backend: str = "auto",
                        control_tokens=None,
                        control_scale: float = 0.75):
    """One jitted scan over all steps.  img_tokens: [B, L_pad, p*p*C]."""
    b = img_tokens.shape[0]
    use_cfg = sampling.guidance > 0 and cap_neg is not None
    unified = sampling.solver.startswith("unified")
    caps = jnp.concatenate([cap, cap_neg], axis=0) if use_cfg else cap

    def model(x, t_model, target_t):
        xb = jnp.concatenate([x, x], axis=0) if use_cfg else x
        tb = jnp.broadcast_to(t_model, (xb.shape[0],))
        ttb = None if target_t is None else \
            jnp.broadcast_to(target_t, (xb.shape[0],))
        cb = (None if control_tokens is None else
              (jnp.concatenate([control_tokens] * 2, axis=0)
               if use_cfg else control_tokens))
        v = zimage_forward(params, cfg, xb, caps, tb, x_rope, cap_rope,
                           uni_rope, cap_len, img_len=img_len,
                           target_t=ttb, attn_backend=attn_backend,
                           control_tokens=cb,
                           control_scale=control_scale)
        if not use_cfg:
            return v
        g = sampling.guidance
        if sampling.cfg_truncation < 1.0:
            g = jnp.where(t_model > sampling.cfg_truncation, 0.0, g)
        return _cfg_combine(v[:b], v[b:], g, sampling.cfg_normalization)

    ts = jnp.asarray(sigmas, jnp.float32)

    if not unified:
        def body(x, i):
            m = model(x, 1.0 - ts[i], None)
            # scheduler.step with pred = -m: x += (s_next - s_cur)*(-m)
            return x + (ts[i] - ts[i + 1]) * m, None

        x, _ = jax.lax.scan(body, img_tokens.astype(jnp.float32),
                            jnp.arange(len(sigmas) - 1))
        return x

    _, style = unified_t_grid(sampling.steps, sampling.solver)
    keys = jax.random.split(noise_key if noise_key is not None
                            else jax.random.key(0), len(sigmas) - 1)

    def ubody(x, xs):
        i, key = xs
        t_cur, t_next = ts[i], ts[i + 1]
        if style == "few":
            tt = jnp.zeros(())
        elif style == "mul":
            tt = t_cur
        else:
            tt = t_next
        m = model(x, 1.0 - t_cur, 1.0 - tt)
        x_hat = x + t_cur * m
        z_hat = x - (1.0 - t_cur) * m
        # stochast_ratio = 1.0 (reference default): renoise fully
        noise = jax.random.normal(key, x.shape, jnp.float32)
        x = (1.0 - t_next) * x_hat + t_next * noise
        del z_hat
        return x, x_hat

    x, x_hats = jax.lax.scan(ubody, img_tokens.astype(jnp.float32),
                             (jnp.arange(len(sigmas) - 1), keys))
    return x_hats[-1]     # final x_hat is the sample (pipeline :883)


class ZImagePipeline:
    """Text-to-image via Z-Image.  text_encode_fn(prompts) ->
    (cap_feats [B, L, 2560], lens) from the Qwen3-4B conditioner; Z-Image
    reuses a flux-layout 16-channel image VAE (autoencoder_kl.py)."""

    def __init__(self, dit_params, dit_cfg: ZImageConfig,
                 vae_decode_fn=None, text_encode_fn=None,
                 attn_backend: str = "auto"):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.attn_backend = attn_backend
        self.compression = 8
        self._cache: Dict[Any, Any] = {}

    def _pad_cap(self, cap):
        """Pad caption by repeating the last token to SEQ_MULTI_OF
        (transformer2d.py:755-758)."""
        l = cap.shape[1]
        pad = (-l) % self.dit_cfg.seq_multiple
        if pad:
            cap = jnp.concatenate(
                [cap, jnp.repeat(cap[:, -1:], pad, axis=1)], axis=1)
        return cap, l

    def generate(self, prompt: str = "", negative_prompt: str = "",
                 width: int = 1024, height: int = 1024,
                 sampling: ZImageSamplingConfig = ZImageSamplingConfig(),
                 seed: int = 0, context=None, context_neg=None,
                 return_latents: bool = False, control_latent=None,
                 control_scale: float = 0.75):
        cfg = self.dit_cfg
        if context is None:
            context = self.text_encode_fn([prompt])
        use_cfg = sampling.guidance > 0
        if use_cfg and context_neg is None:
            context_neg = self.text_encode_fn([negative_prompt])

        h_lat, w_lat = height // self.compression, width // self.compression
        h_tok, w_tok = h_lat // cfg.patch, w_lat // cfg.patch
        l_img = h_tok * w_tok
        img_pad = (-l_img) % cfg.seq_multiple

        cap, cap_len = self._pad_cap(context)
        cap_neg = None
        if use_cfg:
            cap_neg, neg_len = self._pad_cap(context_neg)
            # pad/truncate the negative stream to the positive length
            if cap_neg.shape[1] < cap.shape[1]:
                cap_neg = jnp.concatenate(
                    [cap_neg, jnp.repeat(cap_neg[:, -1:],
                                         cap.shape[1] - cap_neg.shape[1],
                                         axis=1)], axis=1)
            cap_neg = cap_neg[:, :cap.shape[1]]

        key = jax.random.key(seed)
        k_lat, k_scan = jax.random.split(key)
        noise = jax.random.normal(
            k_lat, (1, cfg.in_channels, h_lat, w_lat), jnp.float32)
        tokens = patchify_zimage(noise, cfg.patch)
        if img_pad:
            tokens = jnp.concatenate(
                [tokens, jnp.repeat(tokens[:, -1:], img_pad, axis=1)], axis=1)

        x_rope, cap_rope, uni_rope = build_zimage_rope(
            cap.shape[1], h_tok, w_tok, cfg)
        if sampling.solver.startswith("unified"):
            sigmas, _ = unified_t_grid(sampling.steps, sampling.solver)
        else:
            sigmas = zimage_schedule(sampling.steps, l_img)

        control_tokens = None
        if control_latent is not None:
            # control image latent [1, C_ctrl, h_lat, w_lat]
            # (pipeline_z_image.py:618-645)
            control_tokens = patchify_zimage(
                jnp.asarray(control_latent, jnp.float32), cfg.patch)
            if img_pad:
                control_tokens = jnp.concatenate(
                    [control_tokens,
                     jnp.repeat(control_tokens[:, -1:], img_pad,
                                axis=1)], axis=1)
        sig = (sampling, tokens.shape, cap.shape, use_cfg,
               control_tokens is not None, control_scale)
        fn = self._cache.get(sig)
        if fn is None:
            fn = jax.jit(functools.partial(
                zimage_denoise_scan, cfg=cfg, sampling=sampling,
                sigmas=sigmas, x_rope=x_rope, cap_rope=cap_rope,
                uni_rope=uni_rope, cap_len=cap_len, img_len=l_img,
                attn_backend=self.attn_backend,
                control_scale=control_scale))
            self._cache[sig] = fn
        x = fn(self.dit_params, img_tokens=tokens, cap=cap,
               cap_neg=cap_neg, noise_key=k_scan,
               control_tokens=control_tokens)
        z = unpatchify_zimage(x[:, :l_img], h_lat, w_lat, cfg.patch,
                              cfg.in_channels)
        if return_latents or self.vae_decode_fn is None:
            return z
        return self.vae_decode_fn(z)
