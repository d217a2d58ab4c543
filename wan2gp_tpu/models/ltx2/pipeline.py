"""LTX-2 joint audio+video generation pipeline.

TPU-native re-design of the reference LTX-2 sampling stack
(/root/reference/models/ltx2/ltx_pipelines/distilled.py,
ltx_pipelines/utils/helpers.py euler_denoising_loop:675 /
simple_denoising_func:1352 / denoise_audio_video:2378,
ltx_core/components/diffusion_steps.py EulerDiffusionStep,
ltx_core/model/transformer/model.py X0Model:587):

- the velocity model predicts v; the x0 estimate is
  ``denoised = latent - t_token * v`` where t_token = sigma * denoise_mask
  is the PER-TOKEN timestep (conditioned tokens carry t=0);
- CFG runs in x0 space: ``x0 = x0_cond + (g-1) * (x0_cond - x0_uncond)``
  (helpers.py:1557-1568), with an optional separate audio guidance branch;
- conditioning is a (clean_latent, denoise_mask) pair; each step re-pins
  ``x0 = mask * x0 + (1-mask) * clean`` (helpers.py post_process_latent);
- the Euler step uses the scalar schedule sigma:
  ``x += (sigma_next - sigma) * (x - x0) / sigma``.

The whole loop is one jitted ``lax.scan`` over the sigma table — solver,
CFG combine and conditioning re-pin included (no host round-trips).

Schedules: DISTILLED_SIGMA_VALUES / stage-2 tables from
ltx_pipelines/utils/constants.py:9-18; the dev model uses the LTXV
shifted linear schedule over the token count.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import LTX2Config, ltx2_dit_forward
from .rope import (build_ltx_rope, video_token_positions,
                   audio_token_positions)

# ltx_pipelines/utils/constants.py:9-18
DISTILLED_SIGMA_VALUES = (1.0, 0.99375, 0.9875, 0.98125, 0.975, 0.909375,
                          0.725, 0.421875, 0.0)
STAGE_2_DISTILLED_SIGMA_VALUES = (0.909375, 0.725, 0.421875, 0.0)
DISTILLED_8_STEPS_STAGE_2_SIGMA_VALUES = (0.85, 0.7250, 0.4219, 0.0)
AUDIO_SAMPLE_RATE = 24000   # constants.py:40

DEFAULT_NEGATIVE_PROMPT = (
    "blurry, cropped, deformed, distorted, grainy, jpeg artifacts, "
    "low quality, lowres, oversaturated, worst quality")


def patchify_video(latent: jnp.ndarray) -> jnp.ndarray:
    """[B, C, F, H, W] -> [B, F*H*W, C] (patch size 1 per
    ltx_core/components/patchifiers.py VideoLatentPatchifier)."""
    b, c, f, h, w = latent.shape
    return latent.transpose(0, 2, 3, 4, 1).reshape(b, f * h * w, c)


def unpatchify_video(tokens: jnp.ndarray, grid) -> jnp.ndarray:
    """[B, F*H*W, C] -> [B, C, F, H, W]."""
    b, _, c = tokens.shape
    f, h, w = grid
    return tokens.reshape(b, f, h, w, c).transpose(0, 4, 1, 2, 3)


def dev_schedule(num_steps: int, num_tokens: int) -> np.ndarray:
    """Shifted linear sigma schedule for the non-distilled model (same SD3
    shift family as LTXV rf.py; shift grows with the token count)."""
    import math
    ts = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float64)
    min_shift, max_shift = 0.95, 2.05
    m = (max_shift - min_shift) / (4096 - 1024)
    shift = math.exp(m * num_tokens + (min_shift - m * 1024))
    with np.errstate(divide="ignore"):
        out = shift / (shift + (1.0 / ts - 1.0))
    out[-1] = 0.0
    return out


@dataclasses.dataclass(frozen=True)
class LTX2SamplingConfig:
    sigmas: Tuple[float, ...] = DISTILLED_SIGMA_VALUES
    guide_scale: float = 1.0          # text CFG (x0 space); 1 = distilled
    audio_guide_scale: float = 1.0    # audio-branch CFG (helpers.py:1557)
    fps: float = 24.0


@dataclasses.dataclass
class LTX2Conditioning:
    """Per-modality (clean tokens, per-group denoise mask).

    mask: [B, G] with G = number of timestep groups (video: latent frames,
    audio: latent time steps); 1 = denoise, 0 = keep clean."""
    clean: jnp.ndarray
    mask: jnp.ndarray


def _per_token(x_groups: jnp.ndarray, n_tokens: int) -> jnp.ndarray:
    """Expand [B, G] group values to [B, T, 1] token values."""
    b, g = x_groups.shape
    rep = n_tokens // g
    return jnp.repeat(x_groups, rep, axis=1)[..., None]


def ltx2_denoise_scan(params, cfg: LTX2Config, sampling: LTX2SamplingConfig,
                      video: LTX2Conditioning, context, context_null,
                      video_rope, audio: Optional[LTX2Conditioning] = None,
                      audio_rope=None, video_cross_rope=None,
                      audio_cross_rope=None, context_mask=None, key=None,
                      ref_context=None, ref_adaln=None,
                      av_mask_v=None, av_mask_a=None,
                      attn_backend: str = "auto"):
    """Run the full LTX-2 denoise loop.  Returns (video_tokens,
    audio_tokens|None) at sigma 0.

    video.clean: [B, Tv, C] patchified clean/conditioning tokens;
    video.mask:  [B, F] per-frame denoise mask.  audio analogous ([B, Ta]).
    context / context_null: [B, Lt, caption_dim].
    """
    sig = jnp.asarray(sampling.sigmas, jnp.float32)
    b, tv, _ = video.clean.shape
    g = sampling.guide_scale
    use_cfg = g != 1.0
    run_a = audio is not None
    key = key if key is not None else jax.random.key(0)

    kv, ka = jax.random.split(key)
    noise_v = jax.random.normal(kv, video.clean.shape, jnp.float32)
    vm = _per_token(video.mask.astype(jnp.float32), tv)
    # start state: noise where mask=1, clean elsewhere (sigma_0 may be <1
    # for stage-2 refinement: blend)
    vx = jnp.where(vm > 0, sig[0] * noise_v
                   + (1.0 - sig[0]) * video.clean.astype(jnp.float32),
                   video.clean.astype(jnp.float32))
    if run_a:
        ta = audio.clean.shape[1]
        noise_a = jax.random.normal(ka, audio.clean.shape, jnp.float32)
        am = _per_token(audio.mask.astype(jnp.float32), ta)
        ax = jnp.where(am > 0, sig[0] * noise_a
                       + (1.0 - sig[0]) * audio.clean.astype(jnp.float32),
                       audio.clean.astype(jnp.float32))
    else:
        ax = am = None

    nb = 2 if use_cfg else 1
    ctx = (jnp.concatenate([context, context_null], axis=0) if use_cfg
           else context)
    cmask = None
    if context_mask is not None:
        cmask = (jnp.concatenate([context_mask] * nb, axis=0) if use_cfg
                 else context_mask)

    rctx = (None if ref_context is None
            else jnp.tile(ref_context, (nb, 1, 1)))
    rada = (None if ref_adaln is None
            else jnp.tile(ref_adaln, (nb, 1)))

    def forward(vx, ax, sigma):
        t_v = sigma * jnp.tile(video.mask.astype(jnp.float32), (nb, 1))
        vxx = jnp.tile(vx, (nb, 1, 1))
        axx = t_a = None
        if run_a:
            t_a = sigma * jnp.tile(audio.mask.astype(jnp.float32), (nb, 1))
            axx = jnp.tile(ax, (nb, 1, 1))
        vel_v, vel_a = ltx2_dit_forward(
            params, cfg, vxx, t_v, ctx, video_rope, video_cross_rope,
            audio_tokens=axx, t_audio=t_a, audio_rope=audio_rope,
            audio_cross_rope=audio_cross_rope, context_mask=cmask,
            ref_context=rctx, ref_adaln=rada,
            av_mask_v=av_mask_v, av_mask_a=av_mask_a,
            attn_backend=attn_backend)
        return vel_v, vel_a

    def x0_of(x, vel, mask_tok, sigma):
        # X0Model: denoised = latent - (sigma * mask) * velocity
        return x - (sigma * mask_tok) * vel.astype(jnp.float32)

    def body(carry, i):
        vx, ax = carry
        sigma, sig_next = sig[i], sig[i + 1]

        vel_v, vel_a = forward(vx, ax, sigma)
        x0_v = x0_of(jnp.tile(vx, (nb, 1, 1)),
                     vel_v, jnp.tile(vm, (nb, 1, 1)), sigma)
        if use_cfg:
            x0_v = x0_v[:b] + (g - 1.0) * (x0_v[:b] - x0_v[b:])
        # re-pin conditioned tokens (post_process_latent)
        x0_v = vm * x0_v + (1.0 - vm) * video.clean.astype(jnp.float32)
        eps = (vx - x0_v) / jnp.maximum(sigma, 1e-6)
        vx = vx + (sig_next - sigma) * eps

        if run_a:
            x0_a = x0_of(jnp.tile(ax, (nb, 1, 1)),
                         vel_a, jnp.tile(am, (nb, 1, 1)), sigma)
            if use_cfg:
                ga = (sampling.audio_guide_scale
                      if sampling.audio_guide_scale != 1.0 else g)
                x0_a = x0_a[:b] + (ga - 1.0) * (x0_a[:b] - x0_a[b:])
            x0_a = am * x0_a + (1.0 - am) * audio.clean.astype(jnp.float32)
            eps_a = (ax - x0_a) / jnp.maximum(sigma, 1e-6)
            ax = ax + (sig_next - sigma) * eps_a
        return (vx, ax), None

    if run_a:
        (vx, ax), _ = jax.lax.scan(body, (vx, ax),
                                   jnp.arange(len(sampling.sigmas) - 1))
    else:
        def body_v(vx, i):
            (vx, _), _ = body((vx, None), i)
            return vx, None
        vx, _ = jax.lax.scan(body_v, vx,
                             jnp.arange(len(sampling.sigmas) - 1))
    return vx, ax


def build_ltx2_ropes(cfg: LTX2Config, grid, audio_tokens: int = 0,
                     fps: float = 24.0,
                     vae_strides=(8, 32, 32)):
    """Precompute the four rope tables the transformer consumes
    (model.py video/audio args preprocessors): self-attention ropes over
    (t, y, x) / (t,) positions and temporal-only cross ropes shared by the
    a2v/v2a attention (audio-sized heads)."""
    vpos = video_token_positions(grid, fps=fps, strides=vae_strides)
    v_rope = build_ltx_rope(vpos, cfg.dim, cfg.num_heads, cfg.max_pos,
                            theta=cfg.rope_theta, rope_type=cfg.rope_type)
    # cross a<->v rope: temporal axis only, audio-sized heads (model.py:240)
    v_xrope = build_ltx_rope(vpos[:1], cfg.audio_dim, cfg.audio_num_heads,
                             cfg.max_pos[:1], theta=cfg.rope_theta,
                             rope_type=cfg.rope_type)
    if audio_tokens <= 0:
        return v_rope, None, v_xrope, None
    # 16 kHz mel hop 160, latent downsample 4 (audio_vae.py latent rate)
    apos = audio_token_positions(audio_tokens, tokens_per_second=25.0)
    a_rope = build_ltx_rope(apos, cfg.audio_dim, cfg.audio_num_heads,
                            cfg.audio_max_pos, theta=cfg.rope_theta,
                            rope_type=cfg.rope_type)
    a_xrope = build_ltx_rope(apos, cfg.audio_dim, cfg.audio_num_heads,
                             cfg.max_pos[:1], theta=cfg.rope_theta,
                             rope_type=cfg.rope_type)
    return v_rope, a_rope, v_xrope, a_xrope


class LTX2Pipeline:
    """Orchestration-facing wrapper: text -> (video latents, audio latents)
    -> decoded pixels/waveform via the attached VAE callables."""

    def __init__(self, params, cfg: LTX2Config, text_fn=None,
                 vae_decode=None, audio_vae_decode=None, vocoder=None,
                 sampling: Optional[LTX2SamplingConfig] = None,
                 attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.text_fn = text_fn
        self.vae_decode = vae_decode
        self.audio_vae_decode = audio_vae_decode
        self.vocoder = vocoder
        self.sampling = sampling or LTX2SamplingConfig()
        self.attn_backend = attn_backend
        self.mesh = None

    def apply_mesh(self, mesh):
        """Shard the LTX-2 DiT over a device mesh (same contract as
        WanPipeline.apply_mesh): unfused to_q/k/v + to_out and fc1/fc2 go
        full Megatron column/row tensor-parallel over 'tp' for both the
        video and audio streams (parallel/sharding.py LTX2_BLOCK_RULES;
        audio dims that do not divide 'tp' stay replicated).  Video
        tokens shard over 'dp'/'cp' at generate time (_place_cond)."""
        from ...parallel import shard_params_with_rules, LTX2_BLOCK_RULES
        self.mesh = mesh
        self.params = shard_params_with_rules(
            self.params, mesh, LTX2_BLOCK_RULES)

    def _place_cond(self, video):
        """device_put the packed video conditioning tokens: batch over
        'dp', the token axis over 'cp' (non-dividing axes replicated)."""
        if self.mesh is None:
            return video
        from jax.sharding import NamedSharding, PartitionSpec as P
        dp = self.mesh.shape.get("dp", 1)
        cp = self.mesh.shape.get("cp", 1)
        clean = video.clean
        b_ax = "dp" if clean.shape[0] % dp == 0 else None
        l_ax = "cp" if clean.shape[1] % cp == 0 else None
        clean = jax.device_put(clean, NamedSharding(
            self.mesh, P(b_ax, l_ax, None)))
        return LTX2Conditioning(clean=clean, mask=video.mask)

    def generate(self, prompt: str = "", negative_prompt: str = "",
                 latent_grid=(3, 8, 8), audio_tokens: int = 0,
                 image_latent=None, ref_video_latent=None, seed: int = 0,
                 sampling: Optional[LTX2SamplingConfig] = None,
                 fps: float = 24.0, ref_audio_tokens=None,
                 prefix_latent=None, paired_memory=None):
        """ref_video_latent: optional [B, C, Fr, h, w] reference latent
        (spatial dims must match the grid) — appended at temporal
        position 0 with denoise mask 0
        (VideoConditionByReferenceLatent, reference_video_cond.py) and,
        when the EditAnything module is installed, also projected to
        cross-attended reference tokens + an adaLN offset.  JoyAI-Echo
        memory slots ride the same path.

        ref_audio_tokens: optional [B, Tr, audio_in_channels] audio
        reference tokens appended to the audio stream with mask 0
        (AudioConditionByAppendedReferenceLatent — JoyAI-Echo audio
        memory / voice cloning).

        prefix_latent: optional [B, C, Fp, h, w] latent whose frames
        pin the FIRST Fp latent-frame groups (sliding-window overlap
        continuation).

        paired_memory: optional {"num_slots": int,
        "audio_segment_lengths": tuple|None} — when the appended
        video/audio references are JoyAI paired memory slots, the
        bidirectional a2v/v2a attention is masked so slot i's video
        tokens exchange only with slot i's audio segment
        (helpers.py:396-442 paired tail cross-attention masks)."""
        sampling = sampling or self.sampling
        cfg = self.cfg
        f, h, w = latent_grid
        tv = f * h * w
        if self.text_fn is not None:
            ctx = self.text_fn([prompt])
            ctx_n = self.text_fn([negative_prompt or
                                  DEFAULT_NEGATIVE_PROMPT])
        else:
            ctx = jnp.zeros((1, 64, cfg.caption_dim), jnp.float32)
            ctx_n = ctx
        clean_v = jnp.zeros((1, tv, cfg.in_channels), jnp.float32)
        mask_v = jnp.ones((1, f), jnp.float32)
        if image_latent is not None:
            # i2v: first latent frame pinned to the encoded image
            # (helpers.py image_conditionings_by_replacing_latent:60)
            toks = patchify_video(image_latent)
            clean_v = clean_v.at[:, :h * w].set(toks[:, :h * w])
            mask_v = mask_v.at[:, 0].set(0.0)
        if prefix_latent is not None:
            pl = jnp.asarray(prefix_latent, jnp.float32)
            fp = min(pl.shape[2], f)
            toks = patchify_video(pl[:, :, :fp])
            clean_v = clean_v.at[:, :fp * h * w].set(toks)
            mask_v = mask_v.at[:, :fp].set(0.0)
        ref_context = ref_adaln = None
        n_ref_groups = 0
        if ref_video_latent is not None:
            rl = jnp.asarray(ref_video_latent, jnp.float32)
            fr, hr, wr = rl.shape[2], rl.shape[3], rl.shape[4]
            if (hr, wr) != (h, w):
                raise ValueError("EditAnything reference latent spatial "
                                 f"dims {(hr, wr)} != grid {(h, w)}")
            ref_toks = patchify_video(rl)
            clean_v = jnp.concatenate([clean_v, ref_toks], axis=1)
            mask_v = jnp.concatenate(
                [mask_v, jnp.zeros((1, fr), jnp.float32)], axis=1)
            n_ref_groups = fr
            ea = self.params.get("editanything")
            if ea is not None:
                from .editanything import ref_visual_tokens, ref_adaln_vec
                ref_context = ref_visual_tokens(ea, rl)
                ref_adaln = ref_adaln_vec(ea, rl)
        video = LTX2Conditioning(clean=clean_v, mask=mask_v)
        audio = None
        v_rope, a_rope, v_xrope, a_xrope = build_ltx2_ropes(
            cfg, latent_grid, audio_tokens, fps=fps)
        if n_ref_groups:
            # ref tokens ride at temporal position 0 (frame_idx=0)
            rpos = video_token_positions((n_ref_groups, h, w), fps=fps)
            pos = np.concatenate(
                [video_token_positions(latent_grid, fps=fps), rpos],
                axis=1)
            v_rope = build_ltx_rope(pos, cfg.dim, cfg.num_heads,
                                    cfg.max_pos, theta=cfg.rope_theta,
                                    rope_type=cfg.rope_type)
            v_xrope = build_ltx_rope(pos[:1], cfg.audio_dim,
                                     cfg.audio_num_heads, cfg.max_pos[:1],
                                     theta=cfg.rope_theta,
                                     rope_type=cfg.rope_type)
        if audio_tokens > 0:
            clean_a = jnp.zeros((1, audio_tokens, cfg.audio_in_channels),
                                jnp.float32)
            mask_a = jnp.ones((1, audio_tokens), jnp.float32)
            if ref_audio_tokens is not None:
                ra = jnp.asarray(ref_audio_tokens, jnp.float32)
                clean_a = jnp.concatenate([clean_a, ra], axis=1)
                mask_a = jnp.concatenate(
                    [mask_a, jnp.zeros((1, ra.shape[1]), jnp.float32)],
                    axis=1)
                _v, a_rope, _vx, a_xrope = build_ltx2_ropes(
                    cfg, latent_grid, audio_tokens + ra.shape[1],
                    fps=fps)
            audio = LTX2Conditioning(clean=clean_a, mask=mask_a)
        av_mask_v = av_mask_a = None
        if paired_memory and n_ref_groups and audio is not None \
                and ref_audio_tokens is not None:
            from .joyai_echo import build_paired_av_masks
            v_mask, a_mask = build_paired_av_masks(
                tv, n_ref_groups * h * w, audio_tokens,
                int(ref_audio_tokens.shape[1]),
                int(paired_memory.get("num_slots", n_ref_groups)),
                paired_memory.get("audio_segment_lengths"))
            av_mask_v = jnp.asarray(v_mask)
            av_mask_a = jnp.asarray(a_mask)
        video = self._place_cond(video)
        vx, axx = ltx2_denoise_scan(
            self.params, cfg, sampling, video, ctx, ctx_n, v_rope,
            audio=audio, audio_rope=a_rope, video_cross_rope=v_xrope,
            audio_cross_rope=a_xrope, key=jax.random.key(seed),
            ref_context=ref_context, ref_adaln=ref_adaln,
            av_mask_v=av_mask_v, av_mask_a=av_mask_a,
            attn_backend=self.attn_backend)
        video_latent = unpatchify_video(vx[:, :tv], latent_grid)
        out: Dict[str, Any] = {"video_latent": video_latent}
        if axx is not None:
            axx = axx[:, :audio_tokens]
            out["audio_latent"] = axx
        if self.vae_decode is not None:
            out["video"] = self.vae_decode(video_latent)
        if axx is not None and self.audio_vae_decode is not None:
            mel = self.audio_vae_decode(axx)
            out["audio_mel"] = mel
            if self.vocoder is not None:
                out["audio"] = self.vocoder(mel)
        return out
