"""HiDream-O1 sampling pipeline, TPU-native.

Mirrors /root/reference/models/hidream/pipeline.py: PIXEL-space flow
matching at patch 32 with an x-prediction backbone.
- z0 = randn * NOISE_SCALE (8.0) over [B, 3, H, W] pixels, patchified
  to [B, (H/32 * W/32), 3072] with feature order (c, p1, p2) (:334-336);
- the backbone returns x_pred; v = (x_pred - z) / sigma, CFG in v-space,
  and the scheduler consumes model_output = -v_guided (:407-460);
- "default" scheduler = FlowUniPC (same tables as the Wan family,
  schedulers/base.py unipc) with shift 3.0;
- "flash" scheduler = stochastic re-noising Euler
  (flash_scheduler.py:step): x <- sigma_next * noise * s_noise +
  (1 - sigma_next) * x_pred, with a linear noise-scale schedule;
- final image = (z + 1) / 2 unpatchified to pixels.

The prompt layout is host-built: [chat-template text, <boi>, <tms>,
image grid]; the causal prefix is everything before <tms>.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .model import (HiDreamConfig, QWEN3_VL_8B, hidream_forward,
                    hidream_rope_tables, hidream_edit_rope_tables,
                    hidream_forward_edit)
from ..qwen.text_encoder import QwenLMConfig
from ...schedulers.base import make_schedule, init_solver_state, solver_step


def patchify_pixels(img, patch: int = 32):
    """[B, 3, H, W] -> [B, (H/p)(W/p), 3*p*p], feature order (c, p1, p2)
    (pipeline.py:334 einops 'B C (H p1) (W p2) -> B (H W) (C p1 p2)')."""
    b, c, h, w = img.shape
    gh, gw = h // patch, w // patch
    x = img.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, gh * gw, c * patch * patch)


def unpatchify_pixels(z, grid_h: int, grid_w: int, patch: int = 32):
    b = z.shape[0]
    c = z.shape[-1] // (patch * patch)
    x = z.reshape(b, grid_h, grid_w, c, patch, patch)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, grid_h * patch, grid_w * patch)


@dataclasses.dataclass(frozen=True)
class HiDreamSamplingConfig:
    steps: int = 50
    guidance: float = 5.0
    shift: float = 3.0
    scheduler: str = "default"      # default (UniPC) | flash
    noise_scale_start: float = 8.0
    noise_scale_end: float = 8.0


def flash_sigma_grid(steps: int, shift: float) -> np.ndarray:
    sig = np.linspace(1.0, 0.001, steps, dtype=np.float64)
    sig = shift * sig / (1.0 + (shift - 1.0) * sig)
    return np.concatenate([sig, [0.0]]).astype(np.float32)


class HiDreamPipeline:
    """build_prompt_fn(prompt) -> (text_ids [1, T] int32) where the ids
    end with <boi>, <tms>; the handler wires a tokenizer for this."""

    def __init__(self, params, lm_cfg: QwenLMConfig,
                 hcfg: HiDreamConfig = HiDreamConfig(),
                 build_prompt_fn=None, attn_backend: str = "auto",
                 vision_cfg=None,
                 vision_start_token_id: int = 151652):
        self.params = params
        self.lm_cfg = lm_cfg
        self.hcfg = hcfg
        self.build_prompt_fn = build_prompt_fn
        self.attn_backend = attn_backend
        self.vision_cfg = vision_cfg
        self.vision_start_token_id = vision_start_token_id

    def generate(self, prompt: str, height: int = 1024, width: int = 1024,
                 sampling: Optional[HiDreamSamplingConfig] = None,
                 seed: int = 0, return_pixels: bool = True):
        hcfg, lm_cfg = self.hcfg, self.lm_cfg
        sampling = sampling or HiDreamSamplingConfig()
        p = hcfg.patch_size
        if height % p or width % p:
            raise ValueError(f"height/width must be divisible by {p}")
        gh, gw = height // p, width // p
        ni = gh * gw

        ids = self.build_prompt_fn(prompt)
        ids_u = None
        if sampling.guidance > 1.0:
            ids_u = self.build_prompt_fn(" ")

        key = jax.random.key(seed + 1)
        z = jax.random.normal(key, (1, 3, height, width), jnp.float32)
        z = patchify_pixels(z * sampling.noise_scale_start, p)

        def predict(zz, t_val):
            """x_pred with CFG in v-space == x-space (affine in x_pred)."""
            cos, sin = hidream_rope_tables(lm_cfg, hcfg, ids.shape[1],
                                           gh, gw)
            xp = hidream_forward(self.params, lm_cfg, hcfg, ids, zz,
                                 jnp.full((zz.shape[0],), t_val),
                                 cos, sin, ar_len=ids.shape[1] - 1,
                                 attn_backend=self.attn_backend)
            if ids_u is None:
                return xp
            cos_u, sin_u = hidream_rope_tables(lm_cfg, hcfg,
                                               ids_u.shape[1], gh, gw)
            xu = hidream_forward(self.params, lm_cfg, hcfg, ids_u, zz,
                                 jnp.full((zz.shape[0],), t_val),
                                 cos_u, sin_u, ar_len=ids_u.shape[1] - 1,
                                 attn_backend=self.attn_backend)
            return xu + sampling.guidance * (xp - xu)

        if sampling.scheduler == "flash":
            sig = flash_sigma_grid(sampling.steps, sampling.shift)
            n = sampling.steps
            scales = (np.linspace(sampling.noise_scale_start,
                                  sampling.noise_scale_end, n)
                      if n > 1 else np.asarray(
                          [sampling.noise_scale_start]))
            for i in range(n):
                s, s_next = float(sig[i]), float(sig[i + 1])
                t_model = 1.0 - s
                x_pred = predict(z.astype(jnp.float32), t_model)
                noise = jax.random.normal(
                    jax.random.fold_in(jax.random.key(seed + 1), i),
                    z.shape, jnp.float32)
                z = s_next * noise * float(scales[i]) + \
                    (1.0 - s_next) * x_pred.astype(jnp.float32)
        else:
            sched = make_schedule("unipc", sampling.steps,
                                  shift=sampling.shift)
            state = init_solver_state(sched, z)
            sig = np.asarray(sched.sigmas)
            for i in range(sampling.steps):
                s = float(sig[i])
                t_model = 1.0 - s
                x_pred = predict(z.astype(jnp.float32), t_model)
                # model x-pred -> the velocity convention solver_step uses
                v_equiv = (z.astype(jnp.float32) - x_pred) / max(s, 1e-3)
                coeffs_i = {k: v[i] for k, v in sched.coeffs.items()}
                z, state = solver_step(sched, i, coeffs_i, v_equiv, z,
                                       state)

        if not return_pixels:
            return z
        img = unpatchify_pixels(z, gh, gw, p)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)

    # -- reference-image edit mode ---------------------------------------

    @staticmethod
    def _ref_max_size(k: int, height: int, width: int) -> int:
        """pipeline.py:205-209 per-count reference canvas budget."""
        m = max(height, width)
        if k == 1:
            return m
        if k == 2:
            return m * 48 // 64
        if k <= 4:
            return m // 2
        if k <= 8:
            return m * 24 // 64
        return m // 4

    @staticmethod
    def _resize_area(img: np.ndarray, max_size: int, align: int):
        """Scale to ~max_size^2 area with align-multiple dims (host
        analog of utils.py resize_pilimage: bicubic + center crop)."""
        h, w = img.shape[:2]
        scale = (max_size * max_size / (h * w)) ** 0.5
        nh = max(align, int(round(h * scale)) // align * align)
        nw = max(align, int(round(w * scale)) // align * align)
        out = jax.image.resize(jnp.asarray(img, jnp.float32),
                               (nh, nw, img.shape[2]), "cubic")
        return np.asarray(out)

    def generate_edit(self, prompt: str, ref_images,
                      height: int = 1024, width: int = 1024,
                      sampling: Optional[HiDreamSamplingConfig] = None,
                      seed: int = 0, cond_image_size: int = 384,
                      return_pixels: bool = True):
        """Reference-image edit (pipeline.py:190-330): each reference
        appears twice — as low-res VLM views encoded by the Qwen3-VL
        vision tower into the text prefix, and as clean 32px pixel
        patches appended after the target tokens (token_types 2)."""
        from .vision import (image_to_vision_patches,
                             qwen3_vision_forward)
        hcfg, lm_cfg = self.hcfg, self.lm_cfg
        sampling = sampling or HiDreamSamplingConfig()
        p = hcfg.patch_size
        gh, gw = height // p, width // p
        ni = gh * gw
        vis_params = self.params.get("vision")
        vis_cfg = self.vision_cfg
        if vis_params is None or vis_cfg is None:
            raise ValueError("edit mode needs vision-tower params")
        k = len(ref_images)
        if k == 0:
            raise ValueError("generate_edit requires reference images")

        # resize refs to the shared canvas budget, patch-aligned
        max_size = self._ref_max_size(k, height, width)
        refs = [self._resize_area(np.asarray(r, np.float32), max_size, p)
                for r in ref_images]
        # clean reference pixel patches (patch 32 stream, type 2)
        ref_patch_list, ref_grids = [], []
        for r in refs:
            z = patchify_pixels(jnp.asarray(r, jnp.float32)
                                .transpose(2, 0, 1)[None], p)
            ref_patch_list.append(z[0])
            ref_grids.append((r.shape[0] // p, r.shape[1] // p))
        ref_patches = jnp.concatenate(ref_patch_list, axis=0)[None]

        # low-res VLM views -> vision tower embeds
        if k <= 4:
            cis = cond_image_size
        elif k <= 8:
            cis = cond_image_size * 48 // 64
        else:
            cis = cond_image_size // 2
        vp = vis_cfg.patch_size
        vlm_embeds, vlm_grids = [], []
        for r in refs:
            vr = self._resize_area(r, cis, vp * vis_cfg.spatial_merge_size)
            patches, vh, vw = image_to_vision_patches(vr, vis_cfg)
            emb, _ = qwen3_vision_forward(vis_params, vis_cfg, patches,
                                          vh, vw)
            vlm_embeds.append(emb)
            m = vis_cfg.spatial_merge_size
            vlm_grids.append((vh // m, vw // m))

        lm_emb = self.params["lm"]["embed_tokens"]
        vs_row = lm_emb[self.vision_start_token_id % lm_emb.shape[0]
                        ][None].astype(jnp.float32)

        def build_prefix(caption):
            ids = self.build_prompt_fn(caption)      # ends boi, tms
            text = lm_emb[ids[0]].astype(jnp.float32)
            parts = [text[:-2]]
            segs = [("text", int(text.shape[0]) - 2)]
            for e, (gh2, gw2) in zip(vlm_embeds, vlm_grids):
                parts.append(vs_row)
                parts.append(e.astype(jnp.float32))
                segs.append(("text", 1))
                segs.append(("vlm", gh2, gw2))
            parts.append(text[-2:])                  # boi, tms
            segs.append(("text", 2))
            segs.append(("fix", gh, gw))             # target
            for (rh, rw) in ref_grids:
                segs.append(("fix", rh, rw))
            prefix = jnp.concatenate(parts, axis=0)[None]
            cos, sin = hidream_edit_rope_tables(lm_cfg, hcfg, segs)
            return prefix, cos, sin

        prefix_c, cos_c, sin_c = build_prefix(prompt)
        prefix_u = None
        if sampling.guidance > 1.0:
            prefix_u, cos_u, sin_u = build_prefix(" ")

        key = jax.random.key(seed + 1)
        z = jax.random.normal(key, (1, 3, height, width), jnp.float32)
        z = patchify_pixels(z * sampling.noise_scale_start, p)

        def predict(zz, t_val):
            xp = hidream_forward_edit(
                self.params, lm_cfg, hcfg, prefix_c, zz,
                jnp.full((zz.shape[0],), t_val), cos_c, sin_c,
                ref_patches=ref_patches,
                attn_backend=self.attn_backend)
            if prefix_u is None:
                return xp
            xu = hidream_forward_edit(
                self.params, lm_cfg, hcfg, prefix_u, zz,
                jnp.full((zz.shape[0],), t_val), cos_u, sin_u,
                ref_patches=ref_patches,
                attn_backend=self.attn_backend)
            return xu + sampling.guidance * (xp - xu)

        sched = make_schedule("unipc", sampling.steps,
                              shift=sampling.shift)
        state = init_solver_state(sched, z)
        sig = np.asarray(sched.sigmas)
        for i in range(sampling.steps):
            s = float(sig[i])
            x_pred = predict(z.astype(jnp.float32), 1.0 - s)
            v_equiv = (z.astype(jnp.float32) - x_pred) / max(s, 1e-3)
            coeffs_i = {kk: v[i] for kk, v in sched.coeffs.items()}
            z, state = solver_step(sched, i, coeffs_i, v_equiv, z, state)

        if not return_pixels:
            return z
        img = unpatchify_pixels(z, gh, gw, p)
        return jnp.clip((img + 1.0) / 2.0, 0.0, 1.0)
