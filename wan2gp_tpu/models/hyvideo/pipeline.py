"""Hunyuan Video generation pipeline.

FlowMatchDiscrete scheduler (reference models/hyvideo/diffusion/schedulers/
scheduling_flow_match_discrete.py: sigmas = linspace(1, 0, N+1) with SD3
time shift t' = shift*t/(1+(shift-1)*t), Euler update) run as a jitted
lax.scan with optional joint CFG (HV1.5) or embedded guidance (HV1
cfg-distilled: guidance = cfg_scale * 1000, models.py:956).

The LLM text encoders (LLaVA-llama3 for HV1, Qwen for HV1.5 —
models/hyvideo/text_encoder/) are external; the pipeline takes precomputed
text states + mask (+ CLIP pooled for HV1).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .dit import HunyuanConfig, hunyuan_forward, build_hunyuan_rope
from ...guidance import cfg_combine


def hunyuan_schedule(num_steps: int, shift: float = 7.0):
    """sigmas [N+1] (scheduling_flow_match_discrete.py:142-149)."""
    sigmas = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    sigmas = shift * sigmas / (1.0 + (shift - 1.0) * sigmas)
    return sigmas


@dataclasses.dataclass(frozen=True)
class HunyuanSamplingConfig:
    steps: int = 30
    shift: float = 7.0
    guide_scale: float = 1.0           # true CFG (HV1.5)
    embedded_guidance: float = 6.0     # HV1 distilled guidance
    cfg_star_switch: bool = False
    # compile ONE step and loop on host instead of scanning all steps in
    # a single program — keeps per-jit compile small for big configs
    # (the 8.3B HV1.5 30-step scan exceeds compile watchdogs; same
    # rationale as Wan's SamplingConfig.host_loop)
    host_loop: bool = False


def hunyuan_denoise_scan(params, cfg: HunyuanConfig, latents, text_states,
                         text_mask, text_states_null=None,
                         text_mask_null=None, text_pooled=None,
                         sampling: HunyuanSamplingConfig = HunyuanSamplingConfig(),
                         attn_backend: str = "auto", img_latents=None,
                         i2v_condition_type: str = "",
                         byt5_states=None, byt5_mask=None,
                         ref_latents=None, bg_latents=None,
                         audio_prompts=None, face_mask=None,
                         motion_exp=None, motion_pose=None, fps=None,
                         audio_strength: float = 1.0):
    """i2v conditioning (pipeline_hunyuan_video.py:1610-1617, 1746-1752):
    'token_replace' (HV1 i2v) pins the first latent frame to img_latents
    each step and solver-steps only frames 1+; 'latent_concat' (HV1.5)
    concatenates img_latents (first frame, zero elsewhere) + a frame mask
    on the channel axis as extra model input."""
    b = latents.shape[0]
    sigmas = jnp.asarray(hunyuan_schedule(sampling.steps, sampling.shift),
                         jnp.float32)
    g = sampling.guide_scale
    any_guidance = g != 1.0
    pt, ph, pw = cfg.patch_size
    grid = (latents.shape[2] // pt, latents.shape[3] // ph,
            latents.shape[4] // pw)
    txt_len = text_states.shape[1]
    if byt5_states is not None:
        txt_len += byt5_states.shape[1]
    # HunyuanCustom/Avatar reference rope (hunyuan.py:905-914):
    # avatar 'timecat', custom 'timecat-w', both with t bias -1
    ref_mode = None
    if ref_latents is not None and (cfg.custom or cfg.avatar):
        ref_mode = "timecat" if cfg.avatar else "timecat-w"
    cos, sin = build_hunyuan_rope(grid, cfg.rope_dim_list, txt_len,
                                  ref_mode=ref_mode)

    if any_guidance:
        ctx = jnp.concatenate([text_states, text_states_null], axis=0)
        msk = jnp.concatenate([text_mask, text_mask_null], axis=0)
        pooled = (None if text_pooled is None
                  else jnp.concatenate([text_pooled, text_pooled], axis=0))
        if byt5_states is not None:
            # negative prompts carry no glyph text (pipeline_hunyuan_video
            # .py:1022 zeros for promptless byt5)
            byt5_states = jnp.concatenate(
                [byt5_states, jnp.zeros_like(byt5_states)], axis=0)
            byt5_mask = jnp.concatenate(
                [byt5_mask, jnp.zeros_like(byt5_mask)], axis=0)
    else:
        ctx, msk, pooled = text_states, text_mask, text_pooled

    guidance = None
    if cfg.guidance_embed:
        guidance = jnp.full((2 * b if any_guidance else b,),
                            sampling.embedded_guidance * 1000.0, jnp.float32)

    token_replace = i2v_condition_type == "token_replace" \
        and img_latents is not None
    latent_concat = i2v_condition_type == "latent_concat" \
        and img_latents is not None
    if latent_concat:
        f_lat = latents.shape[2]
        img_concat = jnp.concatenate(
            [img_latents.astype(jnp.float32),
             jnp.zeros_like(latents[:, :img_latents.shape[1], 1:])],
            axis=2)
        mask_concat = jnp.concatenate(
            [jnp.ones_like(latents[:, :1, :1]),
             jnp.zeros_like(latents[:, :1, 1:])], axis=2)

    # params threaded as an explicit argument: the host_loop path jits
    # this step directly, and closed-over weights would be captured as
    # lowering CONSTANTS (4.3 GB at HV1.5-8.3B w4 — observed to OOM the
    # compile helper); as an argument they stay runtime buffers.
    def step_sig(p, x, sig, dsig):
        t = jnp.broadcast_to(sig * 1000.0,
                             (2 * b if any_guidance else b,))
        if token_replace:
            x_in = jnp.concatenate(
                [img_latents.astype(jnp.float32), x[:, :, 1:]], axis=2)
        elif latent_concat:
            x_in = jnp.concatenate([x, img_concat, mask_concat], axis=1)
        else:
            x_in = x
        xb = jnp.concatenate([x_in, x_in], axis=0) if any_guidance else x_in
        nb = 2 if any_guidance else 1

        def rep(v_):
            return (None if v_ is None else
                    jnp.concatenate([v_] * nb, axis=0) if nb > 1 else v_)

        v = hunyuan_forward(p, cfg, xb, t, ctx, msk,
                            text_pooled=pooled, guidance=guidance,
                            rope_cos=cos, rope_sin=sin,
                            attn_backend=attn_backend,
                            byt5_states=byt5_states, byt5_mask=byt5_mask,
                            ref_latents=rep(ref_latents),
                            bg_latents=rep(bg_latents),
                            audio_prompts=rep(audio_prompts),
                            face_mask=face_mask,
                            motion_exp=rep(motion_exp),
                            motion_pose=rep(motion_pose), fps=rep(fps),
                            audio_strength=audio_strength)
        if any_guidance:
            pred = cfg_combine(v[:b], v[b:], g,
                               jnp.asarray(sampling.cfg_star_switch))
        else:
            pred = v
        # Euler flow step toward sigma=0 (scheduler step: x += v * dsigma)
        if token_replace:
            stepped = x[:, :, 1:] + pred[:, :, 1:] * dsig
            return jnp.concatenate(
                [img_latents.astype(jnp.float32), stepped], axis=2)
        return x + pred * dsig

    def body(x, i):
        return step_sig(params, x, sigmas[i], sigmas[i + 1] - sigmas[i]), None

    x0 = latents.astype(jnp.float32)
    if token_replace:
        x0 = jnp.concatenate([img_latents.astype(jnp.float32),
                              x0[:, :, 1:]], axis=2)
    if sampling.host_loop:
        step_jit = jax.jit(step_sig)
        x = x0
        for i in range(sampling.steps):
            x = step_jit(params, x, sigmas[i], sigmas[i + 1] - sigmas[i])
        return x
    x, _ = jax.lax.scan(body, x0, jnp.arange(sampling.steps))
    return x


class HunyuanPipeline:
    def __init__(self, dit_params, dit_cfg: HunyuanConfig,
                 vae_decode_fn=None, text_encode_fn=None,
                 vae_stride=(4, 8, 8), attn_backend: str = "auto",
                 byt5_encode_fn=None):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vae_decode_fn = vae_decode_fn
        self.text_encode_fn = text_encode_fn
        self.byt5_encode_fn = byt5_encode_fn
        self.vae_stride = vae_stride
        self.attn_backend = attn_backend
        self.mesh = None
        self._cache: Dict[Any, Any] = {}

    def apply_mesh(self, mesh):
        """Shard the MMDiT over a device mesh (same contract as
        WanPipeline.apply_mesh).  Fused qkv/linear1 are rewritten to the
        unfused layout first (parallel/sharding.py unfuse_fused_linears,
        numerically the same matmuls) so attention q/k/v shard
        head-aligned column-parallel over 'tp' alongside the MLPs and
        row-parallel projections — full block coverage (the reference's
        dormant DTensor plan, kandinsky parallelize.py:12).  Latents
        shard over 'dp'/'cp' at generate time (_place_latents)."""
        from ...parallel import (shard_params_with_rules,
                                 unfuse_fused_linears, UNFUSED_BLOCK_RULES)
        self.mesh = mesh
        p = dict(self.dit_params)
        for name in ("double_blocks", "single_blocks"):
            if p.get(name) is not None:
                p[name] = unfuse_fused_linears(p[name],
                                               self.dit_cfg.hidden_size)
        self.dit_params = shard_params_with_rules(
            p, mesh, UNFUSED_BLOCK_RULES)
        self._cache.clear()

    def _place_latents(self, latents):
        """device_put [B, C, F, H, W] latents: batch over 'dp', H rows
        over 'cp' (the same axes WanPipeline uses); non-dividing axes
        stay replicated."""
        if self.mesh is None:
            return latents
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape.get("dp", 1)
        cp = self.mesh.shape.get("cp", 1)
        b_ax = "dp" if latents.shape[0] % dp == 0 else None
        h_ax = "cp" if latents.shape[3] % cp == 0 else None
        return jax.device_put(latents, NamedSharding(
            self.mesh, P(b_ax, None, None, h_ax, None)))

    def generate_upsample(self, video_latents, prompt: str = "",
                          sr_params=None, sr_cfg=None,
                          sampling: HunyuanSamplingConfig = None,
                          seed: int = 0, noise_scale: float = 0.7,
                          text_states=None, text_mask=None,
                          return_latents: bool = True):
        """HV1.5 SR upsampling (pipeline_hunyuan_video.py:1473-1488,
        1602-1612): SR-refine the low-quality latents, noise-mix at
        `noise_scale`, then meanflow-denoise with the 98-channel
        conditioning [noise | img(0) | mask(0) | lq | lq_mask]; the lq
        channels switch to zeros once t < 1000 * noise_scale.

        video_latents: [1, 32, F, h, w] encoded low-res video latents
        (already bilinearly resized to the target latent grid for the
        720p path)."""
        from .upsampler import sr720_forward, sr1080_forward
        sampling = sampling or HunyuanSamplingConfig(steps=4,
                                                     guide_scale=1.0)
        if text_states is None:
            text_states, text_mask, _ = self.text_encode_fn(prompt)
        z = jnp.asarray(video_latents, jnp.float32)
        z_tl = z.transpose(0, 2, 3, 4, 1)       # [B, F, h, w, C]
        if sr_params is not None:
            from .upsampler import SR720Config
            fwd = (sr720_forward if isinstance(sr_cfg, SR720Config)
                   else sr1080_forward)
            z_tl = fwd(sr_params, sr_cfg, z_tl)
        lq = z_tl.transpose(0, 4, 1, 2, 3)      # [B, 32, F, h, w]
        key = jax.random.key(seed)
        noise_lq = jax.random.normal(key, lq.shape, jnp.float32)
        lq = (1 - noise_scale) * lq + noise_scale * noise_lq
        ones_mask = jnp.ones((1, 1, *lq.shape[2:]), jnp.float32)
        lq_cond = jnp.concatenate([lq, ones_mask], axis=1)
        zero_cond = jnp.zeros_like(lq_cond)
        img_cond = jnp.zeros((1, 33, *lq.shape[2:]), jnp.float32)

        latents = jax.random.normal(jax.random.split(key)[0], lq.shape,
                                    jnp.float32)
        sigmas = jnp.asarray(hunyuan_schedule(sampling.steps,
                                              sampling.shift),
                             jnp.float32)
        ts = sigmas * 1000.0
        pt, ph, pw = self.dit_cfg.patch_size
        grid = (lq.shape[2] // pt, lq.shape[3] // ph, lq.shape[4] // pw)
        cos, sin = build_hunyuan_rope(grid, self.dit_cfg.rope_dim_list,
                                      text_states.shape[1])

        def scan(params, latents):
            def body(x, i):
                t = ts[i]
                t_r = ts[i + 1]
                cond = jnp.where(t < 1000.0 * noise_scale, zero_cond,
                                 lq_cond)
                xin = jnp.concatenate([x, img_cond, cond], axis=1)
                v = hunyuan_forward(params, self.dit_cfg, xin,
                                    jnp.broadcast_to(t, (1,)),
                                    text_states, text_mask,
                                    rope_cos=cos, rope_sin=sin,
                                    attn_backend=self.attn_backend,
                                    t_r=jnp.broadcast_to(t_r, (1,)))
                return x + v * (sigmas[i + 1] - sigmas[i]), None

            x, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                                jnp.arange(sampling.steps))
            return x

        x = jax.jit(scan)(self.dit_params, latents)
        if return_latents or self.vae_decode_fn is None:
            return x
        return self.vae_decode_fn(x)

    def generate_custom(self, prompt: str = "", ref_latents=None,
                        bg_latents=None, audio_prompts=None,
                        face_mask=None, motion_exp=None,
                        motion_pose=None, fps_value=None,
                        audio_strength: float = 1.0,
                        width: int = 832, height: int = 480,
                        frame_num: int = 97, seed: int = 0,
                        sampling=None, text_states=None, text_mask=None,
                        text_states_null=None, text_mask_null=None,
                        text_pooled=None, return_latents: bool = False):
        """HunyuanCustom / Avatar generation (hunyuan.py:897-1060):
        ref_latents [1, C, 1 | F, h, w] identity latents; audio_prompts
        [1, F_pix, 10, 5, 384] whisper-window features (custom.py
        window_audio_features); face_mask [H, W] box mask (avatar);
        motion_exp/motion_pose [1, 4]; fps_value scalar."""
        sampling = sampling or HunyuanSamplingConfig()
        if text_states is None:
            text_states, text_mask, text_pooled = \
                self.text_encode_fn(prompt)
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        lat = jax.random.normal(
            jax.random.key(seed),
            (1, self.dit_cfg.in_channels, f_lat, lat_h, lat_w),
            jnp.float32)
        kwargs = dict(text_states=text_states, text_mask=text_mask,
                      text_pooled=text_pooled)
        if sampling.guide_scale != 1.0:
            kwargs.update(text_states_null=text_states_null,
                          text_mask_null=text_mask_null)
        extra = {}
        if ref_latents is not None:
            extra["ref_latents"] = jnp.asarray(ref_latents, jnp.float32)
        if bg_latents is not None:
            extra["bg_latents"] = jnp.asarray(bg_latents, jnp.float32)
        if audio_prompts is not None:
            extra["audio_prompts"] = jnp.asarray(audio_prompts,
                                                 jnp.float32)
            if face_mask is not None:
                from .custom import face_mask_tokens
                pt, ph, pw = self.dit_cfg.patch_size
                extra["face_mask"] = face_mask_tokens(
                    face_mask, (f_lat // pt, lat_h // ph, lat_w // pw))
        if motion_exp is not None:
            extra["motion_exp"] = jnp.asarray(motion_exp, jnp.float32)
        if motion_pose is not None:
            extra["motion_pose"] = jnp.asarray(motion_pose, jnp.float32)
        if fps_value is not None:
            extra["fps"] = jnp.full((1,), float(fps_value), jnp.float32)
        fn = jax.jit(functools.partial(
            hunyuan_denoise_scan, cfg=self.dit_cfg, sampling=sampling,
            attn_backend=self.attn_backend,
            audio_strength=audio_strength))
        x = fn(self.dit_params, latents=lat, **kwargs, **extra)
        if return_latents or self.vae_decode_fn is None:
            return x
        return self.vae_decode_fn(x)

    def generate(self, prompt: str = "", width: int = 832, height: int = 480,
                 frame_num: int = 97, seed: int = 0,
                 sampling: HunyuanSamplingConfig = HunyuanSamplingConfig(),
                 text_states=None, text_mask=None, text_states_null=None,
                 text_mask_null=None, text_pooled=None,
                 return_latents: bool = False, img_latents=None,
                 i2v_condition_type: str = "",
                 byt5_states=None, byt5_mask=None):
        if text_states is None:
            text_states, text_mask, text_pooled = self.text_encode_fn(prompt)
        if byt5_states is None and self.byt5_encode_fn is not None \
                and self.dit_params.get("byt5_in") is not None:
            byt5_states, byt5_mask = self.byt5_encode_fn(prompt)
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        # latent_concat models carry 2*C+1 input channels (img + mask)
        gen_channels = self.dit_cfg.in_channels
        if i2v_condition_type == "latent_concat" and img_latents is not None:
            gen_channels = (self.dit_cfg.in_channels - 1) // 2
        lat = jax.random.normal(
            jax.random.key(seed),
            (1, gen_channels, f_lat, height // sh, width // sw),
            jnp.float32)
        lat = self._place_latents(lat)
        sig = (sampling, lat.shape, text_states.shape, i2v_condition_type,
               img_latents is not None,
               None if byt5_states is None else byt5_states.shape)
        fn = self._cache.get(sig)
        if fn is None:
            fn = functools.partial(
                hunyuan_denoise_scan, cfg=self.dit_cfg, sampling=sampling,
                i2v_condition_type=i2v_condition_type,
                attn_backend=self.attn_backend)
            if not sampling.host_loop:
                # host_loop jits per step internally; wrapping it in an
                # outer jit would re-trace the whole loop into one program
                fn = jax.jit(fn)
            self._cache[sig] = fn
        kwargs = dict(text_states=text_states, text_mask=text_mask,
                      text_pooled=text_pooled)
        if sampling.guide_scale != 1.0:
            kwargs.update(text_states_null=text_states_null,
                          text_mask_null=text_mask_null)
        if img_latents is not None:
            kwargs["img_latents"] = img_latents
        if byt5_states is not None:
            kwargs.update(byt5_states=byt5_states, byt5_mask=byt5_mask)
        x = fn(self.dit_params, latents=lat, **kwargs)
        if return_latents or self.vae_decode_fn is None:
            return x
        return self.vae_decode_fn(x)
