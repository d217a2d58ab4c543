"""FLUX.1 image generation pipeline (schnell / dev).

Rectified-flow Euler sampling with the resolution-dependent shifted schedule
(reference models/flux/sampling.py:493 get_schedule, :512 denoise), run as a
jit-compiled lax.scan.  schnell is guidance-distilled CFG-free; dev embeds a
guidance scalar (guidance_embed).
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import (FluxConfig, flux_forward, rope_from_ids, make_img_ids,
                  pack_latent, unpack_latent)
from .vae import FluxVAEConfig, flux_vae_decode


def flux_schedule(num_steps: int, image_seq_len: int, shift: bool = True,
                  base_shift: float = 0.5, max_shift: float = 1.15):
    """Timesteps [N+1] from 1 to 0 (sampling.py:493)."""
    ts = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    if shift:
        m = (max_shift - base_shift) / (4096 - 256)
        mu = m * image_seq_len + (base_shift - m * 256)
        with np.errstate(divide="ignore"):
            ts = np.exp(mu) / (np.exp(mu) + (1.0 / ts - 1.0) ** 1.0)
        ts[-1] = 0.0
    return ts


@dataclasses.dataclass(frozen=True)
class FluxSamplingConfig:
    steps: int = 4                    # schnell default
    guidance: float = 3.5             # embedded guidance (dev only)
    shift: bool = False               # True for dev


def flux_denoise_scan(params, cfg: FluxConfig, img, txt, vec_y, timesteps,
                      guidance: float, rope_cos, rope_sin,
                      cond_tokens=None, attn_backend: str = "auto",
                      style_tokens=None):
    """img: [B, L_img, C] packed latents.  timesteps: [N+1] descending.
    cond_tokens: optional [B, L_cond, C] Kontext conditioning latents
    appended after the noise tokens each step (sampling.py:680-683); the
    rope tables must already cover [txt, img, cond]."""
    ts = jnp.asarray(timesteps, jnp.float32)
    g = jnp.full((img.shape[0],), guidance, jnp.float32)
    base_len = img.shape[1]

    def body(x, i):
        t = jnp.broadcast_to(ts[i], (x.shape[0],))
        xin = (x if cond_tokens is None else
               jnp.concatenate([x, cond_tokens.astype(x.dtype)], axis=1))
        pred = flux_forward(params, cfg, xin, txt, vec_y, t,
                            rope_cos, rope_sin,
                            guidance=g if cfg.guidance_embed else None,
                            attn_backend=attn_backend,
                            style_tokens=style_tokens)[:, :base_len]
        return x + (ts[i + 1] - ts[i]) * pred, None

    x, _ = jax.lax.scan(body, img.astype(jnp.float32),
                        jnp.arange(len(timesteps) - 1))
    return x


class FluxPipeline:
    def __init__(self, dit_params, dit_cfg: FluxConfig,
                 vae_params=None, vae_cfg: Optional[FluxVAEConfig] = None,
                 t5_encode_fn=None, clip_encode_fn=None,
                 attn_backend: str = "auto", vae_decode_fn=None):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg or FluxVAEConfig()
        self.t5_encode_fn = t5_encode_fn       # prompts -> [B, L, ctx_dim]
        self.clip_encode_fn = clip_encode_fn   # prompts -> [B, 768]
        self.vae_decode_fn = vae_decode_fn     # flux2: z=32 VAE override
        self.attn_backend = attn_backend
        self.mesh = None
        self._cache: Dict[Any, Any] = {}

    def apply_mesh(self, mesh):
        """Shard the Flux DiT over a device mesh (production multi-chip
        path, same contract as WanPipeline.apply_mesh).

        The fused qkv/linear1 weights are first rewritten to the unfused
        layout (parallel/sharding.py unfuse_fused_linears — numerically
        the same matmuls) so that attention q/k/v go head-aligned
        column-parallel over 'tp' alongside the MLPs and row-parallel
        projections: FULL block coverage, the reference-dormant DTensor
        plan (kandinsky parallelize.py:12).  Image tokens shard over
        'cp'/'dp' at generate time (_place_inputs)."""
        from ...parallel import (shard_params_with_rules,
                                 unfuse_fused_linears, UNFUSED_BLOCK_RULES)
        self.mesh = mesh
        p = dict(self.dit_params)
        for name in ("double_blocks", "single_blocks"):
            if p.get(name) is not None:
                p[name] = unfuse_fused_linears(
                    p[name], self.dit_cfg.hidden_size,
                    swiglu=self.dit_cfg.flux2)
        self.dit_params = shard_params_with_rules(
            p, mesh, UNFUSED_BLOCK_RULES)
        self._cache.clear()

    def _place_inputs(self, img, txt):
        """device_put the packed image tokens / context with their mesh
        shardings (batch over 'dp', image tokens over 'cp'); axes that do
        not divide stay replicated."""
        if self.mesh is None:
            return img, txt
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape.get("dp", 1)
        cp = self.mesh.shape.get("cp", 1)
        b_ax = "dp" if img.shape[0] % dp == 0 else None
        l_ax = "cp" if img.shape[1] % cp == 0 else None
        img = jax.device_put(img, NamedSharding(self.mesh,
                                                P(b_ax, l_ax, None)))
        txt = jax.device_put(txt, NamedSharding(self.mesh,
                                                P(b_ax, None, None)))
        return img, txt

    def generate(self, prompt: str = "", width: int = 1280, height: int = 720,
                 sampling: FluxSamplingConfig = FluxSamplingConfig(),
                 seed: int = 0, context: Optional[jnp.ndarray] = None,
                 vec_y: Optional[jnp.ndarray] = None,
                 return_latents: bool = False):
        """Returns image [H, W, 3] float32 in [-1, 1]."""
        f2 = self.dit_cfg.flux2
        if context is None:
            context = self.t5_encode_fn([prompt])
        if vec_y is None:
            # flux2 / chroma: no CLIP pooled vector (model.py:129-138)
            vec_y = (jnp.zeros((1, 1), jnp.float32)
                     if f2 or getattr(self.dit_cfg, "chroma", False)
                     or self.clip_encode_fn is None
                     else self.clip_encode_fn([prompt]))

        h_lat, w_lat = height // 8, width // 8
        h_tok, w_tok = h_lat // 2, w_lat // 2
        seq = h_tok * w_tok
        z_ch = self.dit_cfg.in_channels // 4      # 16 (flux1) / 32 (flux2)

        key = jax.random.key(seed)
        latent = jax.random.normal(key, (1, z_ch, h_lat, w_lat),
                                   jnp.float32)
        img = pack_latent(latent)

        txt_len = context.shape[1]
        if f2:
            from .dit import make_ids_flux2, get_schedule_flux2
            ids = make_ids_flux2(h_tok, w_tok, txt_len)
            ts = get_schedule_flux2(sampling.steps, seq)
        else:
            ids = np.concatenate([np.zeros((txt_len, 3)),
                                  make_img_ids(h_tok, w_tok)], axis=0)
            ts = flux_schedule(sampling.steps, seq, shift=sampling.shift)
        cos, sin = rope_from_ids(ids, self.dit_cfg.axes_dim,
                                 self.dit_cfg.theta)

        if getattr(self, "piflow_heads", None) is not None:
            # pi-FLUX.2 (sampling.py:654-792): one GM prediction per
            # outer step + analytic policy rollout
            from .piflow import piflow_sample
            heads = self.piflow_heads
            g = jnp.full((1,), sampling.guidance, jnp.float32)

            @jax.jit
            def gm_fwd(params, x, t):
                return flux_forward(
                    params, self.dit_cfg, x, context, vec_y,
                    jnp.broadcast_to(t, (x.shape[0],)), cos, sin,
                    guidance=g if self.dit_cfg.guidance_embed else None,
                    attn_backend=self.attn_backend, piflow_heads=heads)

            def forward_gm(x, i):
                return gm_fwd(self.dit_params, x,
                              jnp.float32(ts[i])), None

            x = piflow_sample(forward_gm, img.astype(jnp.float32),
                              ts, h_tok, w_tok,
                              self.dit_cfg.out_channels,
                              key=jax.random.key(seed + 1))
        else:
            sig = (sampling, img.shape, context.shape)
            fn = self._cache.get(sig)
            if fn is None:
                fn = jax.jit(functools.partial(
                    flux_denoise_scan, cfg=self.dit_cfg, timesteps=ts,
                    guidance=sampling.guidance, rope_cos=cos,
                    rope_sin=sin, attn_backend=self.attn_backend))
                self._cache[sig] = fn
            img, context = self._place_inputs(img, context)
            x = fn(self.dit_params, img=img, txt=context, vec_y=vec_y)
        z = unpack_latent(x, h_lat, w_lat)
        if return_latents:
            return z
        if self.vae_decode_fn is not None:
            return jnp.clip(self.vae_decode_fn(z)[0], -1.0, 1.0)
        if f2:
            # no flux2 VAE attached (synthetic runs): nearest-upsampled
            # 3-channel latent preview
            pv = jnp.repeat(jnp.repeat(z[0, :3], 8, axis=1), 8, axis=2)
            return jnp.clip(pv.transpose(1, 2, 0), -1.0, 1.0)
        img_out = flux_vae_decode(self.vae_params, self.vae_cfg,
                                  z.transpose(0, 2, 3, 1))
        return jnp.clip(img_out[0], -1.0, 1.0)

    def generate_uso(self, prompt: str, style_images,
                     siglip_params=None, siglip_cfg=None,
                     uso_proj_params=None, cond_images=(),
                     width: int = 1024, height: int = 1024,
                     sampling=None, seed: int = 0, context=None,
                     vec_y=None, return_latents: bool = False):
        """FLUX USO style transfer (flux_main.py:490-500): each style
        image's SigLIP multi-level features project to 768 style tokens
        prepended to the text stream at zero position ids; optional
        subject refs go through the diagonal multi-ref latents."""
        from .siglip import (SiglipVisionConfig, siglip_forward,
                             siglip_image_to_patches, uso_project,
                             USO_LAYER_TAPS)
        scfg = siglip_cfg or SiglipVisionConfig()
        style_parts = []
        for im in style_images:
            patches = siglip_image_to_patches(np.asarray(im), scfg)
            _, states = siglip_forward(siglip_params, scfg,
                                       jnp.asarray(patches)[None],
                                       collect=USO_LAYER_TAPS)
            style_parts.append(uso_project(uso_proj_params, states,
                                           scfg.num_layers + 1))
        style_tokens = jnp.concatenate(style_parts, axis=1)
        return self.generate_kontext(
            prompt, list(cond_images), width=width, height=height,
            sampling=sampling or FluxSamplingConfig(), seed=seed,
            context=context, vec_y=vec_y, return_latents=return_latents,
            ref_index=0, pe_mode="d", style_tokens=style_tokens)

    def generate_kontext(self, prompt: str, cond_images,
                         width: int = 1024, height: int = 1024,
                         sampling: FluxSamplingConfig = FluxSamplingConfig(),
                         seed: int = 0, context=None, vec_y=None,
                         return_latents: bool = False,
                         ref_index: int = 1, pe_mode: str = "hw",
                         per_ref_index: bool = False,
                         style_tokens=None):
        """FLUX Kontext image editing (sampling.py:174 prepare_kontext):
        each conditioning image is VAE-encoded and packed as extra tokens
        with position ids at index 1 and cumulative h/w offsets; the model
        sees [noise, cond] and only the noise slice is integrated.
        cond_images: list of [H, W, 3] arrays in [-1, 1]."""
        from .vae import flux_vae_encode
        if context is None:
            context = self.t5_encode_fn([prompt])
        if vec_y is None:
            vec_y = self.clip_encode_fn([prompt])
        h_lat, w_lat = height // 8, width // 8
        h_tok, w_tok = h_lat // 2, w_lat // 2

        cond_tokens = []
        cond_ids = []
        # UMO/DreamOmni2 (sampling.py:816-905 prepare_multi_ip): refs
        # sit at diagonal offsets starting past the TARGET grid at time
        # index 0 ("d" mode); Kontext keeps index 1 with offsets from 0.
        h_off = w_off = 0
        if pe_mode == "d":
            h_off, w_off = h_tok, w_tok
        for no, im in enumerate(cond_images):
            im = jnp.asarray(im, jnp.float32)
            z = flux_vae_encode(self.vae_params, self.vae_cfg, im[None])
            ch, cw = z.shape[1], z.shape[2]
            cond_tokens.append(pack_latent(z.transpose(0, 3, 1, 2)))
            ids = make_img_ids(ch // 2, cw // 2,
                               index=(no + 1 if per_ref_index
                                      else ref_index))
            ids[:, 1] += h_off
            ids[:, 2] += w_off
            cond_ids.append(ids)
            h_off += ch // 2
            w_off += cw // 2
        cond_seq = (jnp.concatenate(cond_tokens, axis=1)
                    if cond_tokens else None)

        key = jax.random.key(seed)
        latent = jax.random.normal(key, (1, 16, h_lat, w_lat), jnp.float32)
        img = pack_latent(latent)

        txt_len = context.shape[1]
        if style_tokens is not None:
            txt_len += style_tokens.shape[1]   # zero ids like text
        ids = np.concatenate([np.zeros((txt_len, 3)),
                              make_img_ids(h_tok, w_tok),
                              *cond_ids], axis=0)
        cos, sin = rope_from_ids(ids, self.dit_cfg.axes_dim,
                                 self.dit_cfg.theta)
        ts = flux_schedule(sampling.steps, h_tok * w_tok,
                           shift=sampling.shift)
        fn = jax.jit(functools.partial(
            flux_denoise_scan, cfg=self.dit_cfg, timesteps=ts,
            guidance=sampling.guidance, rope_cos=cos, rope_sin=sin,
            attn_backend=self.attn_backend))
        x = fn(self.dit_params, img=img, txt=context, vec_y=vec_y,
               cond_tokens=cond_seq, style_tokens=style_tokens)
        z = unpack_latent(x, h_lat, w_lat)
        if return_latents:
            return z
        img_out = flux_vae_decode(self.vae_params, self.vae_cfg,
                                  z.transpose(0, 2, 3, 1))
        return jnp.clip(img_out[0], -1.0, 1.0)
