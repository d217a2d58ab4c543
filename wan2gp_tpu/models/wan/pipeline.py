"""Wan text/image-to-video generation pipeline.

The denoising loop — scheduler step + CFG + guidance included — runs as
jit-compiled `lax.scan` segments (per-step coefficient tables are the scan
xs), the TPU-native replacement for the reference's Python-stepped loop
(/root/reference/models/wan/any2video.py:1455-1706).

Segmentation: guidance phases / MoE expert switching (any2video.py:1402-1408
update_guidance; Wan2.2 high-noise -> low-noise expert) and piecewise LoRA
multiplier changes all happen at host-static step boundaries, so the loop is
split into scan segments with the solver/APG/cache state carried across.

CFG runs as a joint pass: cond/uncond stacked on the batch axis, one forward
per step (reference joint_pass, any2video.py:1591-1602).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...guidance import cfg_combine, apg_update
from ...schedulers import Schedule, make_schedule, init_solver_state, solver_step
from ...ops.rope import build_rope_3d
from .dit import WanDiTConfig, wan_dit_forward
from .vae import WanVAEConfig, vae_decode, vae_encode
from .vae_scan import vae_decode_chunked
from .t5 import T5Config, t5_encode

# reference default negative prompt (models/wan/configs/shared_config.py:17)
DEFAULT_NEGATIVE_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    solver: str = "unipc"
    solver_order: int = 2
    steps: int = 50
    shift: float = 5.0
    guide_scale: float = 5.0
    # multi-phase guidance (any2video.py:1402; Wan2.2 MoE switch)
    guide2_scale: float = 5.0
    guide3_scale: float = 5.0
    guide_phases: int = 1
    switch_threshold: float = 0.0
    switch2_threshold: float = 0.0
    model_switch_phase: int = 1
    cfg_star_switch: bool = False
    cfg_zero_step: int = -1
    apg_switch: bool = False
    apg_momentum: float = -0.75
    apg_norm_threshold: float = 55.0
    enable_riflex: bool = False
    # step-skipping cache: "" | "tea" | "mag" (caches.py)
    cache_type: str = ""
    cache_threshold: float = 0.0      # 0 -> auto from cache_speed_factor
    cache_speed_factor: float = 1.75
    cache_start_step: int = 0
    # NAG negative-attention guidance (model.py:244-306); active when > 1
    nag_scale: float = 0.0
    nag_tau: float = 3.5
    nag_alpha: float = 0.5
    # CFG batching: joint pass stacks cond/uncond on the batch axis (the
    # reference's joint_pass, any2video.py:1586); sequential runs the two
    # branches one after another via lax.scan — halves peak activation
    # memory, which is what lets 14B fit a single 16 GB chip.
    joint_pass: bool = True
    # sequential-CFG driver: host loop over a jitted micro-step instead of
    # one giant lax.scan (keeps XLA compile time at one-forward size for
    # 14B-class programs)
    host_loop: bool = False


def plan_phases(timesteps: np.ndarray, sampling: SamplingConfig,
                has_expert2: bool) -> List[Tuple[int, int, float, int]]:
    """[(start, end, guide_scale, expert_idx)] — host-static segmentation.

    A phase starts at the first step whose t <= its switch threshold
    (update_guidance, any2video.py:1403-1408); the second expert takes over
    at the start of phase model_switch_phase+1."""
    ts = np.asarray(timesteps)
    n = len(ts)
    boundaries = [0]
    scales = [sampling.guide_scale]
    if sampling.guide_phases >= 2:
        s = int(np.argmax(ts <= sampling.switch_threshold)) \
            if (ts <= sampling.switch_threshold).any() else n
        boundaries.append(s)
        scales.append(sampling.guide2_scale)
    if sampling.guide_phases >= 3:
        s = int(np.argmax(ts <= sampling.switch2_threshold)) \
            if (ts <= sampling.switch2_threshold).any() else n
        boundaries.append(max(s, boundaries[-1]))
        scales.append(sampling.guide3_scale)
    boundaries.append(n)

    segments = []
    for p in range(len(scales)):
        start, end = boundaries[p], boundaries[p + 1]
        if start >= end:
            continue
        expert = 1 if (has_expert2 and p >= sampling.model_switch_phase) else 0
        segments.append((start, end, scales[p], expert))
    return segments


def denoise_segment(dit_params, dit_cfg: WanDiTConfig, schedule: Schedule,
                    carry, context, context_null, sampling: SamplingConfig,
                    guide_scale: float, rope_cos, rope_sin,
                    step_start: int, step_end: int,
                    y=None, clip_fea=None, attn_backend: str = "auto",
                    skip_schedule=None, overlap_latents=None,
                    overlap_sigma_scale: float = 1.0, noise_key=None,
                    vace_context=None, vace_scale: float = 1.0):
    """One scan segment over steps [step_start, step_end).

    carry: (x, solver_state, apg_buf) threaded across segments.
    overlap_latents: [B, C, F_ov, H, W] sliding-window prefix latents that
    are re-noised to the current sigma each step (any2video.py:1482-1491).
    Returns updated carry.
    """
    x0, sstate0, apg0 = carry
    b = x0.shape[0]
    g = guide_scale
    any_guidance = g != 1.0
    seg = slice(step_start, step_end)
    n_seg = step_end - step_start

    use_alpha = jnp.asarray(
        (np.arange(step_start, step_end) > sampling.cfg_zero_step)
        & bool(sampling.cfg_star_switch), dtype=jnp.bool_)

    if any_guidance:
        ctx_both = jnp.concatenate([context, context_null], axis=0)
        y_both = None if y is None else jnp.concatenate([y, y], axis=0)
        clip_both = (None if clip_fea is None
                     else jnp.concatenate([clip_fea, clip_fea], axis=0))
    else:
        ctx_both, y_both, clip_both = context, y, clip_fea

    use_skip = skip_schedule is not None
    use_fbc = sampling.cache_type == "fbc"
    fbc_threshold = (sampling.cache_threshold
                     if sampling.cache_threshold > 0 else 0.05)
    use_overlap = overlap_latents is not None
    if use_overlap:
        ov = overlap_latents.shape[2]
        keys = jax.random.split(
            noise_key if noise_key is not None else jax.random.key(0), n_seg)
    else:
        keys = jnp.zeros((n_seg, 2), jnp.uint32)

    use_nag = sampling.nag_scale > 1.0
    if use_nag:
        # NAG on the cond branch; the uncond branch pairs with itself,
        # which collapses the guidance to identity (x_pos == x_neg)
        ctx_neg_both = (jnp.concatenate([context_null, context_null], axis=0)
                        if any_guidance else context_null)
        nag = (sampling.nag_scale, sampling.nag_tau, sampling.nag_alpha)
    else:
        ctx_neg_both, nag = None, None

    seq_cfg = any_guidance and not sampling.joint_pass
    if seq_cfg:
        if use_fbc:
            raise ValueError("sequential CFG does not support the "
                             "first-block cache")
        return _denoise_segment_seqcfg(
            dit_params, dit_cfg, schedule, carry, context, context_null,
            sampling, g, rope_cos, rope_sin, step_start, step_end,
            y=y, clip_fea=clip_fea, attn_backend=attn_backend,
            skip_schedule=skip_schedule,
            overlap_latents=overlap_latents,
            overlap_sigma_scale=overlap_sigma_scale, noise_key=noise_key,
            vace_context=vace_context, vace_scale=vace_scale,
            use_alpha=use_alpha, nag=nag)

    def forward(x, t, skip_state, fbc_state=None):
        xb = jnp.concatenate([x, x], axis=0) if any_guidance else x
        tb = jnp.broadcast_to(t, (xb.shape[0],))
        out = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx_both,
                              rope_cos, rope_sin, clip_fea=clip_both,
                              y=y_both, attn_backend=attn_backend,
                              skip_state=skip_state,
                              context_neg=ctx_neg_both, nag=nag,
                              vace_context=vace_context,
                              vace_scale=vace_scale,
                              fbc_state=fbc_state,
                              fbc_threshold=fbc_threshold)
        v, residual = out if (use_skip or use_fbc) else (out, None)
        if any_guidance:
            return v[:b], v[b:], residual
        return v, None, residual

    def body(carry, xs):
        x, sstate, apg_buf, residual = carry
        t, coeffs_i, alpha_i, i, should_calc, key = xs
        if use_overlap:
            # re-noise the overlap prefix to the current noise level
            sigma = t / 1000.0 * overlap_sigma_scale
            noise = jax.random.normal(key, overlap_latents.shape, jnp.float32)
            pinned = overlap_latents * (1.0 - sigma) + noise * sigma
            x = x.at[:, :, :ov].set(pinned)
        skip_state = (should_calc, residual) if use_skip else None
        fbc_state = ((*residual, jnp.logical_not(should_calc))
                     if use_fbc else None)
        v_cond, v_uncond, new_res = forward(x, t, skip_state,
                                            fbc_state=fbc_state)
        if use_skip or use_fbc:
            residual = new_res
        if not any_guidance:
            pred = v_cond
        elif sampling.apg_switch:
            guidance, apg_buf = apg_update(
                v_cond - v_uncond, v_cond, apg_buf,
                momentum=sampling.apg_momentum,
                norm_threshold=sampling.apg_norm_threshold)
            pred = v_cond + (g - 1.0) * guidance
        else:
            pred = cfg_combine(v_cond, v_uncond, g, alpha_i)
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate, apg_buf, residual), None

    if use_skip or use_fbc:
        pt, ph, pw = dit_cfg.patch_size
        l_tok = ((x0.shape[2] // pt) * (x0.shape[3] // ph)
                 * (x0.shape[4] // pw))
        b_eff = 2 * b if any_guidance else b
    if use_skip:
        residual0 = jnp.zeros((b_eff, l_tok, dit_cfg.dim),
                              dit_cfg.residual_dtype)
        flags = np.asarray(skip_schedule, bool)[seg].copy()
        flags[0] = True  # segment boundary: residual reset forces a calc
        skip_flags = jnp.asarray(flags)
    elif use_fbc:
        # first-block cache: carry (block-0 signature, tail residual);
        # should_calc=True forces a recompute (first step of each segment
        # and every step before cache_start_step)
        residual0 = (
            jnp.zeros((b_eff, l_tok, dit_cfg.dim), dit_cfg.compute_dtype),
            jnp.zeros((b_eff, l_tok, dit_cfg.dim), dit_cfg.residual_dtype))
        flags = (np.arange(step_start, step_end)
                 < max(sampling.cache_start_step, step_start + 1))
        skip_flags = jnp.asarray(flags)
    else:
        residual0 = jnp.zeros((), jnp.float32)
        skip_flags = jnp.ones((n_seg,), bool)

    carry0 = (x0.astype(jnp.float32), sstate0, apg0, residual0)
    xs = (schedule.timesteps[seg],
          {k: v[seg] for k, v in schedule.coeffs.items()},
          use_alpha, jnp.arange(step_start, step_end, dtype=jnp.int32),
          skip_flags, keys)
    (x, sstate, apg_buf, _), _ = jax.lax.scan(body, carry0, xs)
    return (x, sstate, apg_buf)


def _seqcfg_body(dit_params, dit_cfg, schedule, carry, xs, aux, st):
    """One sequential-CFG micro-step (shared by the scan and host-loop
    drivers).  carry = (x, solver_state, apg_buf, v_pending); xs = per-micro
    slices; aux = array closures (rope, y, ...); st = hashable statics."""
    x, sstate, apg_buf, v_pend, res2 = carry
    ctx_i, t, coeffs_i, alpha_i, i, solver_i, key, sc_i = xs
    b = x.shape[0]
    # host-loop mode bakes the micro-step parity in statically
    # (st.branch): the residual-slot select/update become static slices
    # (no 738 MB gather copy at 14B/720p) and the even step skips the
    # solver math entirely instead of where-discarding it
    static_branch = st.branch
    if st.use_overlap:
        ov = aux["overlap_latents"].shape[2]
        sigma = t / 1000.0 * st.ov_scale
        noise = jax.random.normal(key, aux["overlap_latents"].shape,
                                  jnp.float32)
        pinned = aux["overlap_latents"] * (1.0 - sigma) + noise * sigma
        x_pinned = x.at[:, :, :ov].set(pinned)
        if static_branch is None:
            x = jnp.where(solver_i, x, x_pinned)
        elif static_branch == 0:
            x = x_pinned
    tb = jnp.broadcast_to(t, (b,))
    skip_state = None
    if st.use_skip:
        # even micro-step = cond branch (slot 0), odd = uncond (slot 1)
        if static_branch is None:
            branch = solver_i.astype(jnp.int32)
            prev_res = jax.lax.dynamic_index_in_dim(res2, branch, 0,
                                                    keepdims=False)
        else:
            prev_res = res2[static_branch]
        skip_state = (sc_i if st.calc is None else st.calc, prev_res)
    out = wan_dit_forward(dit_params, dit_cfg, x, tb, ctx_i,
                          aux["rope_cos"], aux["rope_sin"],
                          clip_fea=aux["clip_fea"], y=aux["y"],
                          attn_backend=st.attn_backend,
                          context_neg=aux["context_neg"], nag=st.nag,
                          vace_context=aux["vace_context"],
                          vace_scale=st.vace_scale, skip_state=skip_state)
    if st.use_skip:
        v, new_res = out              # already bf16 (residual keeps the
        if static_branch is None:     # stored dtype)
            res2 = jax.lax.dynamic_update_index_in_dim(
                res2, new_res, solver_i.astype(jnp.int32), 0)
        else:
            res2 = res2.at[static_branch].set(new_res)
    else:
        v = out
    if static_branch == 0:
        # even micro-step (cond branch): just stash the pending prediction
        return (x, sstate, apg_buf, v, res2)
    # guidance combine + solver step (selected on odd micro-steps; in
    # dynamic mode the even-step computation is latent-cheap + discarded)
    if st.apg_switch:
        guidance, apg_new = apg_update(
            v_pend - v, v_pend, apg_buf,
            momentum=st.apg_momentum, norm_threshold=st.apg_norm_threshold)
        pred = v_pend + (st.g - 1.0) * guidance
    else:
        pred = cfg_combine(v_pend, v, st.g, alpha_i)
        apg_new = apg_buf
    x2, s2 = solver_step(schedule, i, coeffs_i, pred, x, sstate)
    if static_branch == 1:
        return (x2, s2, apg_new, v_pend, res2)

    def sel(new, old):
        return jax.tree.map(
            lambda a_new, a_old: jnp.where(solver_i, a_new, a_old), new, old)

    return (sel(x2, x), sel(s2, sstate), sel(apg_new, apg_buf),
            jnp.where(solver_i, v_pend, v), res2)


@dataclasses.dataclass(frozen=True)
class _SeqCfgStatics:
    attn_backend: str
    g: float
    apg_switch: bool
    apg_momentum: float
    apg_norm_threshold: float
    nag: Optional[tuple]
    use_overlap: bool
    ov_scale: float
    vace_scale: float
    use_skip: bool = False
    # None = dynamic parity (scan driver); 0/1 = static micro-step parity
    # (host-loop driver: even = cond branch, odd = uncond + solver)
    branch: Optional[int] = None
    # None = calc/skip decided in-compile (lax.cond); True/False = the
    # host-planned TeaCache/MagCache schedule baked in statically
    calc: Optional[bool] = None


@functools.partial(jax.jit, static_argnames=("dit_cfg", "st"),
                   donate_argnames=("carry",))
def _seqcfg_micro_jit(dit_params, dit_cfg, schedule, carry, xs, aux, st):
    # carry is donated: the host loop immediately rebinds it, and aliasing
    # the TeaCache residual slots (2x [B, L, dim] at 14B/720p) into the
    # outputs saves ~1.6 GB of double-buffered HBM on a 16 GB v5e
    return _seqcfg_body(dit_params, dit_cfg, schedule, carry, xs, aux, st)


def _denoise_segment_seqcfg(dit_params, dit_cfg: WanDiTConfig,
                            schedule: Schedule, carry, context, context_null,
                            sampling: SamplingConfig, guide_scale: float,
                            rope_cos, rope_sin, step_start: int,
                            step_end: int, y=None, clip_fea=None,
                            attn_backend: str = "auto",
                            skip_schedule=None, overlap_latents=None,
                            overlap_sigma_scale: float = 1.0, noise_key=None,
                            vace_context=None, vace_scale: float = 1.0,
                            use_alpha=None, nag=None):
    """Sequential-CFG segment: 2*n micro-steps, one DiT forward each (cond
    on even, uncond on odd micro-steps); the solver + guidance combine apply
    on odd micro-steps via select.  Compared with the joint batched pass
    this halves peak activation memory — what lets Wan 14B run 720p x 81f
    on a single 16 GB v5e — at identical math (the branches are
    data-independent).  Two drivers: a flat lax.scan (default, fully
    in-compile) and a host loop over a jitted micro-step
    (sampling.host_loop=True) whose per-program compile cost stays at
    one-forward size — giant configs hit XLA compile-time walls otherwise."""
    x0, sstate0, apg0 = carry
    g = guide_scale
    n_seg = step_end - step_start
    seg = slice(step_start, step_end)

    use_overlap = overlap_latents is not None
    if use_overlap:
        keys = jax.random.split(
            noise_key if noise_key is not None else jax.random.key(0), n_seg)
        keys = jnp.repeat(keys, 2, axis=0)
    else:
        keys = jnp.zeros((2 * n_seg, 2), jnp.uint32)

    # NAG trick (joint path, above): pair the uncond branch with itself so
    # the guidance collapses to identity there.
    ctx_neg = context_null if nag is not None else None

    def rep2(a):
        return jnp.repeat(a, 2, axis=0)

    # [2, ...] cond/uncond stack; the scan path tiles it to 2n micro-steps,
    # the host loop indexes m % 2 directly (materializing the tiled stack
    # costs n_seg * 16 MB of HBM at 14B text_len 512 for identical data)
    ctx2 = jnp.stack([context, context_null])
    is_solver = jnp.asarray([False, True] * n_seg)

    use_skip = skip_schedule is not None
    if use_skip:
        # TeaCache/MagCache under sequential CFG: each branch keeps its
        # own block-stack residual (reference model.py:1917-1921 keeps a
        # per-x_id cache); the calc/skip decision is the shared host
        # schedule.  Residuals stored bf16 — 2x [B, L, dim] fp32 would
        # cost ~3 GB at 14B/720p.
        pt, ph, pw = dit_cfg.patch_size
        n_tok = (x0.shape[2] // pt) * (x0.shape[3] // ph) \
            * (x0.shape[4] // pw)
        res0 = jnp.zeros((2, x0.shape[0], n_tok, dit_cfg.dim),
                         jnp.bfloat16)
        sc_micro = rep2(jnp.asarray(skip_schedule[seg], jnp.bool_))
    else:
        res0 = jnp.zeros((2, 1, 1, 1), jnp.bfloat16)
        sc_micro = jnp.ones((2 * n_seg,), jnp.bool_)

    carry0 = (x0.astype(jnp.float32), sstate0, apg0,
              jnp.zeros_like(x0, jnp.float32), res0)
    xs_tail = (rep2(schedule.timesteps[seg]),
               {k: rep2(v[seg]) for k, v in schedule.coeffs.items()},
               rep2(use_alpha),
               rep2(jnp.arange(step_start, step_end, dtype=jnp.int32)),
               is_solver, keys, sc_micro)
    aux = {"rope_cos": rope_cos, "rope_sin": rope_sin, "y": y,
           "clip_fea": clip_fea, "context_neg": ctx_neg,
           "vace_context": vace_context, "overlap_latents": overlap_latents}
    st = _SeqCfgStatics(
        attn_backend=attn_backend, g=g, apg_switch=sampling.apg_switch,
        apg_momentum=sampling.apg_momentum,
        apg_norm_threshold=sampling.apg_norm_threshold, nag=nag,
        use_overlap=use_overlap, ov_scale=overlap_sigma_scale,
        vace_scale=vace_scale, use_skip=use_skip)

    if sampling.host_loop:
        # the micro-jit donates its carry.  The latents leaf is the
        # CALLER'S array — copy it so the first micro-step doesn't delete
        # it under the caller's feet (everything else in the carry is
        # created above and safe to donate; copying the WHOLE carry would
        # pin a second copy of the TeaCache residual stacks, +1.6 GB at
        # 14B/720p — measured runtime OOM).  A leaf aliased twice in the
        # carry (solver state aliasing latents after a no-op astype)
        # would be donated twice — copy duplicates once.
        seen = {id(carry0[0])}        # tail aliases of x get copied too

        def _unalias(leaf):
            if id(leaf) in seen:
                return jnp.copy(leaf)
            seen.add(id(leaf))
            return leaf

        c = (jnp.copy(carry0[0]),) + tuple(
            jax.tree.map(_unalias, leaf) for leaf in carry0[1:])
        # TeaCache/MagCache schedules are host-planned (caches.py): bake
        # the calc/skip decision in statically — the skip micro-program
        # compiles to a cheap residual-add instead of a lax.cond carrying
        # the full block stack's buffer pressure
        sc_host = (np.repeat(np.asarray(skip_schedule[seg], bool), 2)
                   if use_skip else None)
        for m in range(2 * n_seg):
            stm = dataclasses.replace(
                st, branch=m % 2,
                calc=None if sc_host is None else bool(sc_host[m]))
            xs_m = (ctx2[m % 2],) + jax.tree.map(lambda a: a[m], xs_tail)
            c = _seqcfg_micro_jit(dit_params, dit_cfg, schedule, c, xs_m,
                                  aux, stm)
        return c[:3]

    ctx_micro = jnp.concatenate([ctx2] * n_seg, axis=0)

    def body(c, xs_m):
        return _seqcfg_body(dit_params, dit_cfg, schedule, c, xs_m,
                            aux, st), None

    (x, sstate, apg_buf, _, _), _ = jax.lax.scan(
        body, carry0, (ctx_micro,) + xs_tail)
    return (x, sstate, apg_buf)


def denoise_scan(dit_params, dit_cfg: WanDiTConfig, schedule: Schedule,
                 latents, context, context_null, sampling: SamplingConfig,
                 rope_cos, rope_sin, y=None, clip_fea=None,
                 attn_backend: str = "auto", skip_schedule=None):
    """Single-segment convenience wrapper.  Returns final latents."""
    carry = (latents.astype(jnp.float32),
             init_solver_state(schedule, latents),
             jnp.zeros_like(latents, dtype=jnp.float32))
    carry = denoise_segment(dit_params, dit_cfg, schedule, carry, context,
                            context_null, sampling, sampling.guide_scale,
                            rope_cos, rope_sin, 0, schedule.num_steps,
                            y=y, clip_fea=clip_fea,
                            attn_backend=attn_backend,
                            skip_schedule=skip_schedule)
    return carry[0]


def phantom_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                         schedule: Schedule, latents, context, context_null,
                         ref_latents, guide_scale: float,
                         guide_scale_img: float, rope_cos, rope_sin,
                         attn_backend: str = "auto"):
    """Phantom subject-reference denoising (any2video.py:1011-1016,
    1501-1507, 1610-1615): the last R latent frames are replaced each step
    by the VAE-encoded reference images (positive branches) or zeros
    (negative branch); three forwards combine as
    pred = neg + g_img*(pos_i - neg) + g_text*(pos_it - pos_i).

    latents: [1, C, F+R, H, W] noise; ref_latents: [C, R, H, W]."""
    b = latents.shape[0]
    r = ref_latents.shape[1]
    refs = ref_latents[None]
    refs_neg = jnp.zeros_like(refs)
    ctx3 = jnp.concatenate([context, context_null, context_null], axis=0)

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        x_pos = jnp.concatenate([x[:, :, :-r], refs.astype(x.dtype)], axis=2)
        x_neg = jnp.concatenate([x[:, :, :-r], refs_neg.astype(x.dtype)],
                                axis=2)
        xb = jnp.concatenate([x_pos, x_pos, x_neg], axis=0)
        tb = jnp.broadcast_to(t, (3 * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx3,
                            rope_cos, rope_sin, attn_backend=attn_backend)
        pos_it, pos_i, neg = v[:b], v[b:2 * b], v[2 * b:]
        pred = (neg + guide_scale_img * (pos_i - neg)
                + guide_scale * (pos_it - pos_i))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x[:, :, :-r]


def multitalk_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                           schedule: Schedule, latents, context,
                           context_null, audio_tokens, audio_tokens_zero,
                           guide_scale: float, audio_guide_scale: float,
                           rope_cos, rope_sin, vace_context=None,
                           vace_scale: float = 1.0,
                           attn_backend: str = "auto",
                           host_loop: bool = False,
                           joint_pass: bool = True):
    """Multitalk audio-CFG denoising (any2video.py:1545-1559, 1630-1655).

    host_loop=True compiles ONE step and loops on host — keeps the
    per-jit program small at 14B dims (whole-scan compiles exceed the
    tunnel's ~300 s compile watchdog; same as SamplingConfig.host_loop).

    joint_pass=False runs the CFG branches as SEQUENTIAL b=1 forwards
    (same trade as SamplingConfig.joint_pass: identical math — the
    branches are data-independent — at half the peak activation memory;
    what lets VACE+Multitalk 14B fit next to its ~12 GB of w4 weights
    on one 16 GB chip).  Requires host_loop.

    Branches:
      guide==1 (FusioniX accelerator, defaults/vace_multitalk_14B.json):
        [cond(text,audio), drop_audio(text,silence)]
        pred = drop_audio + g_a * (cond - drop_audio)          (:1652)
      otherwise:
        [cond(text,audio), drop_text(null,audio), uncond(null,silence)]
        pred = uncond + g*(cond - drop_text) + g_a*(drop_text - uncond)
                                                               (:1655)
    audio_tokens: [1, F_lat, Na, Da] projected audio context tokens;
    audio_tokens_zero: same shape, the silence embedding (the audio-proj
    of zero windows, any2video.py:1550)."""
    b = latents.shape[0]
    use_text_cfg = guide_scale != 1.0
    if use_text_cfg:
        branches = [(context, audio_tokens), (context_null, audio_tokens),
                    (context_null, audio_tokens_zero)]
        nb = 3
    else:
        branches = [(context, audio_tokens), (context, audio_tokens_zero)]
        nb = 2

    if not joint_pass:
        if not host_loop:
            raise ValueError("multitalk joint_pass=False requires "
                             "host_loop=True (micro-step driver)")
        return _multitalk_seq_branches(
            dit_params, dit_cfg, schedule, latents, branches, guide_scale,
            audio_guide_scale, rope_cos, rope_sin, vace_context,
            vace_scale, attn_backend, use_text_cfg)

    ctx = jnp.concatenate([c for c, _ in branches], axis=0)
    aud = jnp.concatenate([a for _, a in branches], axis=0)
    vace3 = (jnp.concatenate([vace_context] * nb, axis=0)
             if vace_context is not None else None)

    # params (and the other big operands) are threaded as explicit
    # arguments: the host_loop path jits this step directly, and
    # closed-over weights would be captured as lowering CONSTANTS
    # (13.2 GB at 14B w4 + VACE — observed to kill the compile helper);
    # as arguments they stay runtime buffers.
    def step(p, ctx_, aud_, vc, cos_, sin_, carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0)
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(p, dit_cfg, xb, tb, ctx_,
                            cos_, sin_, audio_tokens=aud_,
                            vace_context=vc, vace_scale=vace_scale,
                            attn_backend=attn_backend)
        if use_text_cfg:
            cond, drop_text, uncond = v[:b], v[b:2 * b], v[2 * b:]
            pred = (uncond + guide_scale * (cond - drop_text)
                    + audio_guide_scale * (drop_text - uncond))
        else:
            cond, drop_audio = v[:b], v[b:]
            pred = drop_audio + audio_guide_scale * (cond - drop_audio)
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate)

    def body(carry, xs):
        return step(dit_params, ctx, aud, vace3, rope_cos, rope_sin,
                    carry, xs), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    if host_loop:
        step_jit = jax.jit(step)
        carry = carry0
        for i in range(schedule.num_steps):
            xs_i = (schedule.timesteps[i],
                    {k: v[i] for k, v in schedule.coeffs.items()},
                    jnp.asarray(i, jnp.int32))
            carry = step_jit(dit_params, ctx, aud, vace3,
                             rope_cos, rope_sin, carry, xs_i)
        return carry[0]
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def _multitalk_seq_branches(dit_params, dit_cfg, schedule, latents,
                            branches, guide_scale, audio_guide_scale,
                            rope_cos, rope_sin, vace_context, vace_scale,
                            attn_backend, use_text_cfg):
    """Sequential-branch multitalk host loop: one b=1 DiT forward per
    CFG branch per step (any2video.py:1630-1655 math, with
    SamplingConfig.joint_pass=False's memory trade).  Two jitted
    programs regardless of step count: the branch forward, and the
    last branch fused with the guidance combine + solver step."""
    b = latents.shape[0]

    def fwd(p, ctx_, aud_, vc, cos_, sin_, x, t):
        tb = jnp.broadcast_to(t, (b,))
        return wan_dit_forward(p, dit_cfg, x, tb, ctx_, cos_, sin_,
                               audio_tokens=aud_, vace_context=vc,
                               vace_scale=vace_scale,
                               attn_backend=attn_backend)

    def last(p, ctx_, aud_, vc, cos_, sin_, carry, vbuf, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        v = fwd(p, ctx_, aud_, vc, cos_, sin_, x, t)
        if use_text_cfg:
            cond, drop_text, uncond = vbuf[0], vbuf[1], v
            pred = (uncond + guide_scale * (cond - drop_text)
                    + audio_guide_scale * (drop_text - uncond))
        else:
            cond, drop_audio = vbuf[0], v
            pred = drop_audio + audio_guide_scale * (cond - drop_audio)
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate)

    fwd_jit, last_jit = jax.jit(fwd), jax.jit(last)
    carry = (latents.astype(jnp.float32),
             init_solver_state(schedule, latents))
    for i in range(schedule.num_steps):
        xs_i = (schedule.timesteps[i],
                {k: v[i] for k, v in schedule.coeffs.items()},
                jnp.asarray(i, jnp.int32))
        vbuf = jnp.stack([
            fwd_jit(dit_params, c, a, vace_context, rope_cos, rope_sin,
                    carry[0], xs_i[0])
            for c, a in branches[:-1]])
        cl, al = branches[-1]
        carry = last_jit(dit_params, cl, al, vace_context, rope_cos,
                         rope_sin, carry, vbuf, xs_i)
    return carry[0]


def fantasy_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                         schedule: Schedule, latents, context,
                         context_null, fantasy_ctx, fantasy_mask,
                         guide_scale: float, audio_guide_scale: float,
                         audio_strength: float, rope_cos, rope_sin,
                         y=None, clip_fea=None,
                         attn_backend: str = "auto"):
    """FantasyTalking audio-CFG denoising (any2video.py:1507-1511,
    1616-1618).

    Branches (guide != 1):
      [cond(text,audio), noaudio(text), uncond(null)]
      pred = uncond + g*(noaudio - uncond) + g_a*(cond - noaudio)
    guide == 1:
      [cond(text,audio), noaudio(text)]
      pred = noaudio + g_a*(cond - noaudio)
    Audio is switched per branch through the per-sample scale vector
    (reference "audio_scale": [audio_scale, None, None])."""
    b = latents.shape[0]
    use_text_cfg = guide_scale != 1.0
    nb = 3 if use_text_cfg else 2
    if use_text_cfg:
        ctx = jnp.concatenate([context, context, context_null], axis=0)
        scale = jnp.asarray([audio_strength, 0.0, 0.0], jnp.float32)
    else:
        ctx = jnp.concatenate([context, context], axis=0)
        scale = jnp.asarray([audio_strength, 0.0], jnp.float32)
    scale = jnp.repeat(scale, b)
    f_ctx = jnp.concatenate([fantasy_ctx] * nb, axis=0)
    yb = None if y is None else jnp.concatenate([y] * nb, axis=0)
    clipb = (None if clip_fea is None
             else jnp.concatenate([clip_fea] * nb, axis=0))

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0)
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, y=yb, clip_fea=clipb,
                            fantasy_audio=(f_ctx, fantasy_mask, scale),
                            attn_backend=attn_backend)
        if use_text_cfg:
            cond, noaudio, uncond = v[:b], v[b:2 * b], v[2 * b:]
            pred = (uncond + guide_scale * (noaudio - uncond)
                    + audio_guide_scale * (cond - noaudio))
        else:
            cond, noaudio = v[:b], v[b:]
            pred = noaudio + audio_guide_scale * (cond - noaudio)
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def wanmove_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                         schedule: Schedule, latents, context,
                         context_null, y_cond, y_uncond,
                         guide_scale: float, rope_cos, rope_sin,
                         clip_fea=None, attn_backend: str = "auto"):
    """Wan-Move CFG (any2video.py:1518-1524): the branches differ in the
    i2v conditioning — dragged tracks (cond) vs untouched (uncond)."""
    b = latents.shape[0]
    use_cfg = guide_scale != 1.0
    if use_cfg:
        ctx = jnp.concatenate([context, context_null], axis=0)
        yb = jnp.concatenate([y_cond, y_uncond], axis=0)
        clipb = (None if clip_fea is None
                 else jnp.concatenate([clip_fea, clip_fea], axis=0))
        nb = 2
    else:
        ctx, yb, clipb, nb = context, y_cond, clip_fea, 1

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0) if nb > 1 else x
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, y=yb, clip_fea=clipb,
                            attn_backend=attn_backend)
        pred = (v[:b] if nb == 1
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def recam_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                       schedule: Schedule, latents, context, context_null,
                       source_latents, cam_emb, guide_scale: float,
                       rope_cos, rope_sin, attn_backend: str = "auto"):
    """Time-extended conditioning denoise (any2video.py:1495-1496,
    1689): extra conditioning latents are concatenated on TIME each
    step and the solver steps on the first T latent frames of the
    prediction.  With cam_emb, camera-pose tokens condition every block
    (ReCamMaster); with cam_emb=None this is the MoCha input scheme."""
    b, _, f_lat = latents.shape[:3]
    use_cfg = guide_scale != 1.0
    nb = 2 if use_cfg else 1
    ctx = (jnp.concatenate([context, context_null], axis=0) if use_cfg
           else context)
    src = jnp.broadcast_to(source_latents,
                           (nb * b, *source_latents.shape[1:]))

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0) if use_cfg else x
        xb = jnp.concatenate([xb, src.astype(xb.dtype)], axis=2)
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, cam_emb=cam_emb,
                            attn_backend=attn_backend)[:, :, :f_lat]
        pred = (v[:b] if not use_cfg
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def scail_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                       schedule: Schedule, latents, context, context_null,
                       ref_latent, y, scail_pose, guide_scale: float,
                       rope_cos, rope_sin, clip_fea=None,
                       attn_backend: str = "auto"):
    """SCAIL denoising (any2video.py:850-899): the reference latent
    frame is re-injected noise-free every step
    (no_noise_latents_injection), pose tokens append to the stream."""
    b = latents.shape[0]
    use_cfg = guide_scale != 1.0
    nb = 2 if use_cfg else 1
    ctx = (jnp.concatenate([context, context_null], axis=0) if use_cfg
           else context)
    clipb = (None if clip_fea is None
             else jnp.concatenate([clip_fea] * nb, axis=0))
    yb = jnp.concatenate([y] * nb, axis=0)

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        x = x.at[:, :, :1].set(ref_latent.astype(x.dtype))
        xb = jnp.concatenate([x] * nb, axis=0) if use_cfg else x
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, y=yb, clip_fea=clipb,
                            scail_pose=scail_pose,
                            attn_backend=attn_backend)
        pred = (v[:b] if not use_cfg
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x.at[:, :, :1].set(ref_latent.astype(x.dtype))


def scail2_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                        schedule: Schedule, latents, context,
                        context_null, y, scail2_cond, guide_scale: float,
                        rope_cos, rope_sin, clip_fea=None,
                        attn_backend: str = "auto"):
    """SCAIL-2 denoising: the model prepends the reference latents and
    appends pose+mask tokens internally (modules/model.py:1578-1619);
    standard 2-branch text CFG."""
    b = latents.shape[0]
    use_cfg = guide_scale != 1.0
    nb = 2 if use_cfg else 1
    ctx = (jnp.concatenate([context, context_null], axis=0) if use_cfg
           else context)
    clipb = (None if clip_fea is None
             else jnp.concatenate([clip_fea] * nb, axis=0))
    yb = jnp.concatenate([y] * nb, axis=0)

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0) if use_cfg else x
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, y=yb, clip_fea=clipb,
                            scail2=scail2_cond,
                            attn_backend=attn_backend)
        pred = (v[:b] if not use_cfg
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def standin_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                         schedule: Schedule, latents, context,
                         context_null, standin_latents, ref_cos, ref_sin,
                         guide_scale: float, rope_cos, rope_sin,
                         vace_context=None, vace_scale: float = 1.0,
                         attn_backend: str = "auto"):
    """StandIn identity-preserved denoising (model.py:1781-1789): plain
    text CFG with the reference-face kv appended to every self-attention
    in both branches."""
    b = latents.shape[0]
    use_cfg = guide_scale != 1.0
    nb = 2 if use_cfg else 1
    ctx = (jnp.concatenate([context, context_null], axis=0) if use_cfg
           else context)
    vace_b = (jnp.concatenate([vace_context] * nb, axis=0)
              if vace_context is not None else None)

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0) if use_cfg else x
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin,
                            standin=(standin_latents, ref_cos, ref_sin),
                            vace_context=vace_b, vace_scale=vace_scale,
                            attn_backend=attn_backend)
        pred = (v[:b] if not use_cfg
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


def lynx_denoise_scan(dit_params, dit_cfg: WanDiTConfig,
                      schedule: Schedule, latents, context, context_null,
                      ip_cond, ip_uncond, guide_scale: float,
                      ip_scale: float, ref_scale: float,
                      rope_cos, rope_sin, ref_buf=None,
                      ref_buf_uncond=None, attn_backend: str = "auto"):
    """Lynx identity-adapter denoising (any2video.py:1526-1532): text
    CFG where the positive branch carries the resampled identity tokens
    (+face ref buffer for full) and the negative branch their uncond
    counterparts (resampler of a zero embed / zero image)."""
    b = latents.shape[0]
    use_cfg = guide_scale != 1.0
    if use_cfg:
        ctx = jnp.concatenate([context, context_null], axis=0)
        ip = jnp.concatenate([ip_cond, ip_uncond], axis=0)
        rb = (None if ref_buf is None else jnp.concatenate(
            [ref_buf, ref_buf_uncond if ref_buf_uncond is not None
             else jnp.zeros_like(ref_buf)], axis=1))
        nb = 2
    else:
        ctx, ip, rb, nb = context, ip_cond, ref_buf, 1

    def body(carry, xs):
        x, sstate = carry
        t, coeffs_i, i = xs
        xb = jnp.concatenate([x] * nb, axis=0) if nb > 1 else x
        tb = jnp.broadcast_to(t, (nb * b,))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin,
                            lynx=(ip, rb, ip_scale, ref_scale),
                            attn_backend=attn_backend)
        pred = (v[:b] if nb == 1
                else v[b:] + guide_scale * (v[:b] - v[b:]))
        x, sstate = solver_step(schedule, i, coeffs_i, pred, x, sstate)
        return (x, sstate), None

    carry0 = (latents.astype(jnp.float32),
              init_solver_state(schedule, latents))
    xs = (schedule.timesteps,
          {k: v for k, v in schedule.coeffs.items()},
          jnp.arange(schedule.num_steps, dtype=jnp.int32))
    (x, _), _ = jax.lax.scan(body, carry0, xs)
    return x


class WanPipeline:
    """End-to-end Wan T2V/I2V generation.

    Holds params + configs; `generate` runs text encoding, the jitted
    denoise scan segments (phases / experts / LoRA segments), and VAE
    decode.  Compiled segment functions are cached per signature.
    """

    def __init__(self, dit_params, dit_cfg: WanDiTConfig,
                 t5_params=None, t5_cfg: Optional[T5Config] = None,
                 vae_params=None, vae_cfg: Optional[WanVAEConfig] = None,
                 tokenizer=None, vae_stride=(4, 8, 8),
                 attn_backend: str = "auto",
                 base_model_type: str = "t2v_1.3B",
                 dit_params2=None, clip_params=None, clip_cfg=None):
        self.dit_params = dit_params
        self.dit_params2 = dit_params2   # low-noise expert (Wan2.2 MoE)
        self.dit_cfg = dit_cfg
        self.base_model_type = base_model_type
        self.t5_params = t5_params
        self.t5_cfg = t5_cfg or T5Config()
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg or WanVAEConfig()
        self.tokenizer = tokenizer
        self.vae_stride = vae_stride
        self.attn_backend = attn_backend
        self.clip_params = clip_params
        self.clip_cfg = clip_cfg
        self.mesh = None
        # VAE compute precision (reference server_config vae_precision
        # "16"/"32", wgp.py:2534-2580): None = fp32, jnp.bfloat16 = the
        # TPU-native reduced-precision decode (~2x MXU conv throughput)
        self.vae_dtype = None
        self._denoise_cache: Dict[Any, Any] = {}

    def set_vae_precision(self, precision: str):
        """"16" -> bf16 conv tower, "32" -> full fp32."""
        self.vae_dtype = jnp.bfloat16 if str(precision) == "16" else None

    # -- multi-chip ---------------------------------------------------------

    def apply_mesh(self, mesh):
        """Shard the DiT weights over a device mesh and remember the data
        shardings for the denoise inputs — the production multi-chip path
        (SURVEY §2.7: GSPMD replaces the reference's mmgp CPU<->VRAM
        paging, wgp.py:4033 offload.profile).  Weights go HBM-resident
        tensor-parallel over 'tp' (parallel/sharding.py); latents shard
        over 'dp' (batch) and 'cp' (H rows); XLA inserts the collectives.
        """
        from ...parallel import shard_wan_dit_params, dit_data_shardings
        self.mesh = mesh
        self.dit_params = shard_wan_dit_params(self.dit_params, mesh)
        if self.dit_params2 is not None:
            self.dit_params2 = shard_wan_dit_params(self.dit_params2, mesh)
        self._data_shardings = dit_data_shardings(mesh)
        self._denoise_cache.clear()

    def _place_denoise_inputs(self, latents, context, context_null):
        """device_put the denoise inputs with their mesh shardings; batch
        stays replicated when it does not divide 'dp' (CFG branches are
        stacked inside the jitted scan, so the input batch is usually 1).
        """
        if self.mesh is None:
            return latents, context, context_null
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        lat_s, _, ctx_s = self._data_shardings
        dp = self.mesh.shape.get("dp", 1)
        cp = self.mesh.shape.get("cp", 1)
        if latents.shape[0] % dp != 0:
            lat_s = NamedSharding(self.mesh, P(None, None, None, "cp", None))
            ctx_s = NamedSharding(self.mesh, P(None, None, None))
        if latents.shape[3] % cp != 0:
            lat_s = NamedSharding(
                self.mesh, P(lat_s.spec[0], None, None, None, None))
        latents = jax.device_put(latents, lat_s)
        context = jax.device_put(context, ctx_s)
        if context_null is not None:
            context_null = jax.device_put(context_null, ctx_s)
        return latents, context, context_null

    # -- text ---------------------------------------------------------------

    def encode_text(self, prompts):
        """Returns [B, text_len, text_dim] with padded positions zeroed
        (matches any2video.py:585-589 truncate-then-zero-pad)."""
        if self.t5_params is None or self.tokenizer is None:
            # random-weights mode (no T5 checkpoint): deterministic
            # prompt-hash embeddings so the CLI --random-weights product
            # path runs end to end
            import zlib
            outs = []
            for p in prompts:
                key = jax.random.key(zlib.crc32(str(p).encode()) & 0x7FFF)
                outs.append(jax.random.normal(
                    key, (self.dit_cfg.text_len, self.dit_cfg.text_dim),
                    jnp.float32) * 0.02)
            return jnp.stack(outs)
        ids, mask = self.tokenizer(prompts, self.dit_cfg.text_len)
        out = t5_encode(self.t5_params, self.t5_cfg, jnp.asarray(ids),
                        jnp.asarray(mask))
        return (out * (jnp.asarray(mask)[..., None] > 0)).astype(jnp.float32)

    # -- latent geometry ----------------------------------------------------

    def latent_shape(self, frame_num, height, width, batch=1):
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        # noise latents carry out_dim channels; in_dim additionally counts
        # the i2v conditioning channels concatenated in the DiT (y)
        return (batch, self.dit_cfg.out_dim, f_lat,
                height // sh, width // sw)

    def _rope(self, lat_shape, enable_riflex=False):
        pt, ph, pw = self.dit_cfg.patch_size
        grid = (lat_shape[2] // pt, lat_shape[3] // ph, lat_shape[4] // pw)
        if self.base_model_type == "chrono_edit" and grid[0] == 2:
            # ChronoEdit fast image transformation (any2video.py:810-814):
            # the two latent frames take temporal rope positions 0 and 7
            # so the edit frame sits a "week" of motion away.
            cos, sin = build_rope_3d((8, grid[1], grid[2]),
                                     head_dim=self.dit_cfg.head_dim)
            s = grid[1] * grid[2]
            idx = jnp.concatenate([jnp.arange(s),
                                   jnp.arange(7 * s, 8 * s)])
            return cos[idx], sin[idx]
        return build_rope_3d(grid, head_dim=self.dit_cfg.head_dim,
                             enable_riflex=enable_riflex)

    def resolved_backend(self, lat_shape):
        """Expand a user-level sparse attention mode into the host-static
        parameterized backend string consumed by ops/attention.py (the
        analog of resolve_attention_mode, reference shared/attention.py:294
        + the radial hook models/wan/modules/model.py:374-379).

        "radial"/"sparse" -> "radial:<frames>:<tokens_per_frame>" from the
        latent grid; anything else passes through unchanged."""
        ab = self.attn_backend
        if ab in ("radial", "sparse"):
            pt, ph, pw = self.dit_cfg.patch_size
            f = lat_shape[2] // pt
            tpf = (lat_shape[3] // ph) * (lat_shape[4] // pw)
            return f"radial:{f}:{tpf}"
        return ab

    # -- step-skip caches -------------------------------------------------

    def skip_schedule(self, sampling: SamplingConfig, schedule,
                      width: int, height: int):
        """Host-side TeaCache/MagCache skip plan (caches.py)."""
        if not sampling.cache_type or sampling.cache_type == "fbc":
            # first-block cache decides in-graph (data-dependent rel-L1 on
            # the first block's output; first_block_cache.py:6-54)
            return None
        from ... import caches
        from .dit import time_embedding_vec
        if sampling.cache_type == "tea":
            coeffs = caches.teacache_coefficients(
                self.base_model_type, self.dit_cfg.i2v_cross_attn,
                width * height)
            e_list = [np.asarray(time_embedding_vec(
                self.dit_params, self.dit_cfg, t[None]))
                for t in schedule.timesteps]
            thresh = sampling.cache_threshold or caches.teacache_auto_threshold(
                e_list, coeffs, sampling.cache_speed_factor,
                sampling.cache_start_step)
            return caches.teacache_schedule(e_list, coeffs, thresh,
                                            sampling.cache_start_step)
        if sampling.cache_type == "mag":
            table = caches.MAGCACHE_DEF_RATIOS.get(
                self.base_model_type,
                caches.MAGCACHE_DEF_RATIOS["t2v_1.3B"
                                           if "1.3B" in self.base_model_type
                                           else "t2v_14B"])
            ratios = caches.magcache_interp_ratios(table, schedule.num_steps)
            thresh = sampling.cache_threshold or caches.magcache_auto_threshold(
                ratios, sampling.cache_speed_factor,
                start_step=sampling.cache_start_step)
            return caches.magcache_schedule(
                ratios, thresh, start_step=sampling.cache_start_step,
                branches=2 if sampling.guide_scale != 1 else 1)
        raise ValueError(f"unknown cache_type {sampling.cache_type!r}")

    # -- denoise ------------------------------------------------------------

    def _get_segment_fn(self, sampling: SamplingConfig, guide_scale: float,
                        step_start: int, step_end: int, has_y, has_clip,
                        has_overlap, skip_key, has_vace=False,
                        vace_scale=1.0, attn_backend=None):
        attn_backend = attn_backend or self.attn_backend
        key = (sampling, guide_scale, step_start, step_end, has_y, has_clip,
               has_overlap, skip_key, has_vace, vace_scale, attn_backend)
        fn = self._denoise_cache.get(key)
        if fn is not None:
            return fn
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        skip = None if skip_key is None else np.asarray(skip_key, bool)

        @jax.jit
        def fn(dit_params, carry, context, context_null, rope_cos, rope_sin,
               y=None, clip_fea=None, overlap_latents=None, noise_key=None,
               vace_context=None):
            return denoise_segment(
                dit_params, self.dit_cfg, schedule, carry, context,
                context_null, sampling, guide_scale, rope_cos, rope_sin,
                step_start, step_end, y=y, clip_fea=clip_fea,
                attn_backend=attn_backend, skip_schedule=skip,
                overlap_latents=overlap_latents, noise_key=noise_key,
                vace_context=vace_context, vace_scale=vace_scale)
        self._denoise_cache[key] = fn
        return fn

    def denoise(self, latents, context, context_null,
                sampling: SamplingConfig, y=None, clip_fea=None,
                overlap_latents=None, seed: int = 0,
                enable_riflex: bool = False, width: int = 0, height: int = 0,
                vace_context=None, vace_scale: float = 1.0):
        """Run all phases/segments; returns final latents."""
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        skip = self.skip_schedule(sampling, schedule, width or 832,
                                  height or 480) \
            if sampling.cache_type else None
        skip_key = None if skip is None else tuple(bool(v) for v in skip)
        segments = plan_phases(np.asarray(schedule.timesteps), sampling,
                               self.dit_params2 is not None)
        rope_cos, rope_sin = self._rope(latents.shape, enable_riflex)
        latents, context, context_null = self._place_denoise_inputs(
            latents, context, context_null)
        carry = (latents.astype(jnp.float32),
                 init_solver_state(schedule, latents),
                 jnp.zeros_like(latents, dtype=jnp.float32))
        backend = self.resolved_backend(latents.shape)
        for start, end, g, expert in segments:
            params = self.dit_params2 if expert == 1 else self.dit_params
            fn = self._get_segment_fn(sampling, g, start, end,
                                      y is not None, clip_fea is not None,
                                      overlap_latents is not None, skip_key,
                                      has_vace=vace_context is not None,
                                      vace_scale=vace_scale,
                                      attn_backend=backend)
            kwargs = {}
            if y is not None:
                kwargs["y"] = y
            if clip_fea is not None:
                kwargs["clip_fea"] = clip_fea
            if vace_context is not None:
                kwargs["vace_context"] = vace_context
            if overlap_latents is not None:
                kwargs["overlap_latents"] = overlap_latents
                kwargs["noise_key"] = jax.random.key(seed + 1000 + start)
            carry = fn(params, carry, context, context_null, rope_cos,
                       rope_sin, **kwargs)
        x = carry[0]
        if overlap_latents is not None:
            # final pin (any2video.py:1726-1728)
            x = x.at[:, :, :overlap_latents.shape[2]].set(overlap_latents)
        return x

    def build_i2v_conditioning(self, image_start, frame_num: int,
                               height: int, width: int):
        """Build the i2v channel conditioning y = [mask(4) || lat_y(16)]
        and CLIP image features.

        Reference any2video.py:693-766: pixels = [start frame, zeros...] ->
        VAE encode; mask = 1 for the first pixel frame else 0, first frame
        repeated 4x then folded into the latent temporal grid (:343-352).
        Returns (y [1, 20, f_lat, h, w], clip_fea [1, 257, 1280] | None).
        """
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        img = jnp.asarray(image_start, jnp.float32)
        if img.shape[:2] != (height, width):
            img = jax.image.resize(img, (height, width, 3), "bicubic")
        enc = jnp.concatenate(
            [img[None, None], jnp.zeros((1, frame_num - 1, height, width, 3),
                                        jnp.float32)], axis=1)
        from .vae2_2 import Wan22VAEConfig, wan22_vae_encode
        if isinstance(self.vae_cfg, Wan22VAEConfig):
            lat_y = wan22_vae_encode(self.vae_params, self.vae_cfg, enc)
        else:
            lat_y = vae_encode(self.vae_params, self.vae_cfg, enc)
        lat_y = lat_y.transpose(0, 4, 1, 2, 3)                  # -> [1,16,f,..]

        msk = np.zeros((frame_num, lat_h, lat_w), np.float32)
        msk[0] = 1.0
        msk = np.concatenate([np.repeat(msk[:1], st, axis=0), msk[1:]])
        msk = msk.reshape(f_lat, st, lat_h, lat_w).transpose(1, 0, 2, 3)
        y = jnp.concatenate([jnp.asarray(msk)[None], lat_y], axis=1)

        clip_fea = None
        if self.clip_params is not None:
            from .clip_vision import preprocess_image, clip_vision_encode
            pixels = preprocess_image(img, self.clip_cfg.image_size)
            clip_fea = clip_vision_encode(self.clip_params, self.clip_cfg,
                                          pixels).astype(jnp.float32)
        return y, clip_fea

    def build_svi_conditioning(self, ref_image, frame_num: int,
                               height: int, width: int, image_end=None,
                               overlap_latents=None):
        """SVI2Pro (Stable Video Infinity) i2v conditioning
        (any2video.py:707-722): the reference image's LATENT occupies
        conditioning frame 0 directly (instead of encoding
        [start, zeros] in pixel space), optionally followed by window
        overlap latents, zero padding, and an end-frame latent; the
        mask marks only frame 0 (svi_mode=2: msk[:, 1:] = 0)."""
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        img = jnp.asarray(ref_image, jnp.float32)
        if img.shape[:2] != (height, width):
            img = jax.image.resize(img, (height, width, 3), "bicubic")
        ref_lat = self.encode_video(img[None])          # [1,16,1,h,w]
        parts = [ref_lat]
        if overlap_latents is not None:
            parts.append(jnp.asarray(overlap_latents, jnp.float32))
        used = sum(p.shape[2] for p in parts)
        if f_lat > used:
            parts.append(jnp.zeros((1, 16, f_lat - used, lat_h, lat_w),
                                   jnp.float32))
        lat_y = jnp.concatenate(parts, axis=2)[:, :, :f_lat]
        if image_end is not None:
            end = jnp.asarray(image_end, jnp.float32)
            if end.shape[:2] != (height, width):
                end = jax.image.resize(end, (height, width, 3), "bicubic")
            lat_y = lat_y.at[:, :, -1:].set(self.encode_video(end[None]))

        msk = np.zeros((frame_num, lat_h, lat_w), np.float32)
        msk[0] = 1.0
        if image_end is not None:
            msk[-1] = 1.0
        msk = np.concatenate([np.repeat(msk[:1], st, axis=0), msk[1:]])
        msk = msk.reshape(f_lat, st, lat_h, lat_w).transpose(1, 0, 2, 3)
        y = jnp.concatenate([jnp.asarray(msk)[None], lat_y], axis=1)

        clip_fea = None
        if self.clip_params is not None:
            from .clip_vision import preprocess_image, clip_vision_encode
            pixels = preprocess_image(img, self.clip_cfg.image_size)
            clip_fea = clip_vision_encode(self.clip_params, self.clip_cfg,
                                          pixels).astype(jnp.float32)
        return y, clip_fea

    def plan_sub_parallel(self, f_lat: int, window_frames: int,
                          overlap_frames: int):
        """Uniform latent windows for joint per-step denoising
        (any2video.py:1164-1299 sub-parallel windows): [(start, end)],
        all length win_lat, last window pinned to the end."""
        st = self.vae_stride[0]
        win = min(f_lat, (window_frames - 1) // st + 1)
        ov = min(win - 1, (overlap_frames - 1) // st + 1
                 if overlap_frames > 0 else 0)
        step = max(1, win - ov)
        starts = list(range(0, max(f_lat - win, 0) + 1, step))
        if starts[-1] + win < f_lat:
            starts.append(f_lat - win)
        return [(s0, s0 + win) for s0 in starts], win, ov

    def denoise_sub_parallel(self, latents, context, context_null,
                             sampling: SamplingConfig,
                             window_frames: int, overlap_frames: int):
        """All windows denoised jointly each step as a batch; predictions
        blended with linear ramp weights (any2video.py:1290-1352), one
        solver step on the full latents."""
        b, cch, f_lat, hh, ww = latents.shape
        assert b == 1, "sub-parallel windows expect batch 1"
        windows, win, ov = self.plan_sub_parallel(f_lat, window_frames,
                                                  overlap_frames)
        n_win = len(windows)
        pt, ph, pw = self.dit_cfg.patch_size
        grid_w = (win // pt, hh // ph, ww // pw)

        # per-window rope tables with the window's absolute frame offset
        from ...ops.rope import build_rope_3d
        full_cos, full_sin = build_rope_3d(
            (f_lat // pt, hh // ph, ww // pw),
            head_dim=self.dit_cfg.head_dim)
        tok_per_frame = (hh // ph) * (ww // pw)
        cos_list, sin_list = [], []
        for s0, e0 in windows:
            sl = slice(s0 * tok_per_frame, e0 * tok_per_frame)
            cos_list.append(full_cos[sl])
            sin_list.append(full_sin[sl])
        cos_w = jnp.stack(cos_list)
        sin_w = jnp.stack(sin_list)

        # blend weights per window (linear ramps on interior edges)
        weights = np.ones((n_win, win), np.float32)
        for i, (s0, e0) in enumerate(windows):
            if ov > 0 and s0 > 0:
                weights[i, :ov] = np.linspace(1e-6, 1, ov)
            if ov > 0 and e0 < f_lat:
                weights[i, -ov:] = np.linspace(1, 1e-6, ov)
        wsum = np.zeros((f_lat,), np.float32)
        for i, (s0, e0) in enumerate(windows):
            wsum[s0:e0] += weights[i]
        weights_j = jnp.asarray(weights)[:, None, :, None, None]

        g = sampling.guide_scale
        any_guidance = g != 1.0
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        ctx = jnp.broadcast_to(context, (n_win, *context.shape[1:]))
        if any_guidance:
            ctxn = jnp.broadcast_to(context_null,
                                    (n_win, *context_null.shape[1:]))
            ctx_both = jnp.concatenate([ctx, ctxn], axis=0)
            cos_b = jnp.concatenate([cos_w, cos_w], axis=0)
            sin_b = jnp.concatenate([sin_w, sin_w], axis=0)
        else:
            ctx_both, cos_b, sin_b = ctx, cos_w, sin_w

        starts = np.asarray([s0 for s0, _ in windows])

        @jax.jit
        def run(latents):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                # gather window slices -> batch
                slices = jnp.stack([
                    jax.lax.dynamic_slice_in_dim(x[0], int(s0), win, axis=1)
                    for s0 in starts])                 # [n_win, C, win, H, W]
                xb = jnp.concatenate([slices, slices], axis=0)                     if any_guidance else slices
                tb = jnp.broadcast_to(t, (xb.shape[0],))
                v = wan_dit_forward(self.dit_params, self.dit_cfg, xb, tb,
                                    ctx_both, cos_b, sin_b,
                                    attn_backend=self.attn_backend)
                if any_guidance:
                    pred_w = cfg_combine(v[:n_win], v[n_win:], g,
                                         jnp.asarray(False))
                else:
                    pred_w = v
                # weighted scatter back to full length
                pred = jnp.zeros_like(x[0])
                for i_w, s0 in enumerate(starts):
                    pred = jax.lax.dynamic_update_slice_in_dim(
                        pred,
                        jax.lax.dynamic_slice_in_dim(pred, int(s0), win,
                                                     axis=1)
                        + pred_w[i_w] * weights_j[i_w],
                        int(s0), axis=1)
                pred = pred / jnp.asarray(np.maximum(wsum, 1e-6)
                                          )[None, :, None, None]
                x, sstate = solver_step(schedule, i, coeffs_i, pred[None],
                                        x, sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps, schedule.coeffs,
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        return run(latents)

    def build_vace_conditioning(self, frames, masks=None, ref_images=None,
                                context_scale: float = 1.0):
        """Build the 96-channel VACE control context (any2video.py:270-331
        vace_encode_frames + vace_encode_masks):

          frames: [T, H, W, 3] control video in [-1, 1]
          masks:  [T, H, W] in {0, 1} (1 = area to regenerate) or None
          ref_images: list of [H, W, 3] reference images prepended in time

        Returns (vace_context [1, 96, f(+refs), h, w], ref_count)."""
        from .vae2_2 import Wan22VAEConfig, wan22_vae_encode
        is22 = isinstance(self.vae_cfg, Wan22VAEConfig)
        enc = (lambda v: (wan22_vae_encode if is22 else vae_encode)(
            self.vae_params, self.vae_cfg, v))
        st, sh, sw = self.vae_stride
        frames = jnp.asarray(frames, jnp.float32)[None]      # [1,T,H,W,3]
        t_pix, height, width = frames.shape[1:4]

        if masks is None:
            lat = enc(frames).transpose(0, 4, 1, 2, 3)       # [1,16,f,h,w]
            lat = jnp.concatenate([lat, jnp.zeros_like(lat)], axis=1)
            msk64 = jnp.ones((1, sh * sw, lat.shape[2],
                              height // sh, width // sw), jnp.float32)
        else:
            m = jnp.asarray(masks, jnp.float32)[None, ..., None]
            inactive = enc(frames * (1 - m)).transpose(0, 4, 1, 2, 3)
            reactive = enc(frames * m).transpose(0, 4, 1, 2, 3)
            lat = jnp.concatenate([inactive, reactive], axis=1)
            # mask 8x8 space-to-depth then nearest resize over time
            # (vace_encode_masks, any2video.py:302-330)
            mm = jnp.asarray(masks, jnp.float32)
            h_l, w_l = height // sh, width // sw
            mm = mm[:, :h_l * sh, :w_l * sw]
            mm = mm.reshape(t_pix, h_l, sh, w_l, sw)
            mm = mm.transpose(2, 4, 0, 1, 3).reshape(sh * sw, t_pix,
                                                     h_l, w_l)
            f_lat = lat.shape[2]
            idx = jnp.clip((jnp.arange(f_lat) * t_pix) // f_lat, 0,
                           t_pix - 1)
            msk64 = mm[:, idx][None]
        ref_count = 0
        if ref_images:
            refs = []
            for ref in ref_images:
                r = jnp.asarray(ref, jnp.float32)
                if r.shape[:2] != (height, width):
                    r = jax.image.resize(r, (height, width, 3), "bicubic")
                rl = enc(r[None, None]).transpose(0, 4, 1, 2, 3)
                refs.append(jnp.concatenate([rl, jnp.zeros_like(rl)],
                                            axis=1))
            ref_lat = jnp.concatenate(refs, axis=2)
            ref_count = ref_lat.shape[2]
            lat = jnp.concatenate([ref_lat, lat], axis=2)
            msk64 = jnp.concatenate(
                [jnp.zeros((*msk64.shape[:2], ref_count, *msk64.shape[3:]),
                           msk64.dtype), msk64], axis=2)
        return jnp.concatenate([lat, msk64], axis=1), ref_count

    def generate_vace(self, prompt: str, frames, masks=None, ref_images=None,
                      n_prompt: str = "", sampling=None, seed: int = 0,
                      context=None, context_null=None,
                      context_scale: float = 1.0,
                      return_latents: bool = False):
        """VACE controlled generation.  frames: [T, H, W, 3] control video."""
        sampling = sampling or SamplingConfig()
        t_pix, height, width = np.asarray(frames).shape[:3]
        vace_ctx, ref_count = self.build_vace_conditioning(
            frames, masks, ref_images, context_scale)
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        if context_null is None:
            context_null = context
        f_total = vace_ctx.shape[2]
        lat_shape = (1, self.dit_cfg.out_dim, f_total,
                     height // self.vae_stride[1],
                     width // self.vae_stride[2])
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        x = self.denoise(latents, context, context_null, sampling,
                         seed=seed, width=width, height=height,
                         vace_context=vace_ctx, vace_scale=context_scale)
        if ref_count:
            x = x[:, :, ref_count:]
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_phantom(self, prompt: str, ref_images,
                         n_prompt: str = "", width: int = 832,
                         height: int = 480, frame_num: int = 81,
                         sampling=None, seed: int = 0,
                         guide_scale_img: float = 5.0,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """Phantom subject-reference T2V (any2video.py:1011,1501,1610):
        each reference image is VAE-encoded to one latent frame appended
        after the video latents; dual CFG combines an image branch
        (g_img, fixed 5.0 in the reference) with the text branch.
        ref_images: list of [H, W, 3] arrays in [-1, 1]."""
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        refs = []
        for img in ref_images:
            arr = jnp.asarray(img, jnp.float32).transpose(2, 0, 1)
            pix = arr[None, :, None]            # [1, 3, 1, H, W]
            refs.append(vae_encode(self.vae_params, self.vae_cfg,
                                   pix.transpose(0, 2, 3, 4, 1))[0])
        ref_latents = jnp.concatenate(
            [r.transpose(3, 0, 1, 2) for r in refs], axis=1)  # [C, R, h, w]
        r = ref_latents.shape[1]

        lat_shape = self.latent_shape(frame_num, height, width)
        lat_shape = (lat_shape[0], lat_shape[1], lat_shape[2] + r,
                     lat_shape[3], lat_shape[4])
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape,
                                        sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            phantom_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale,
            guide_scale_img=guide_scale_img, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=context_null, ref_latents=ref_latents)
        if return_latents:
            return x
        return self.decode(x)[0]

    def extract_lynx_ref_buffer(self, ref_image, context=None):
        """Lynx full reference pass (any2video.py:354-385): VAE-encode
        the 256x256 face crop, run the block stack at t=0 with an
        "image of a face" prompt, collect per-block modulated self-attn
        inputs.  Returns [layers, 1, L_ref, C]."""
        if context is None:
            context = self.encode_text(["image of a face"])
        arr = jnp.asarray(ref_image, jnp.float32)
        pix = arr[None, None]
        lat = vae_encode(self.vae_params, self.vae_cfg, pix)
        lat = lat.transpose(0, 4, 1, 2, 3)       # [1, C, 1, h, w]
        pt, ph, pw = self.dit_cfg.patch_size
        grid = (lat.shape[2] // pt, lat.shape[3] // ph, lat.shape[4] // pw)
        from ...ops.rope import build_rope_3d
        cos, sin = build_rope_3d(grid, head_dim=self.dit_cfg.head_dim)
        fn = jax.jit(functools.partial(
            wan_dit_forward, cfg=self.dit_cfg, rope_cos=cos, rope_sin=sin,
            attn_backend=self.attn_backend, lynx_extract=True))
        return fn(self.dit_params, latents=lat,
                  t=jnp.zeros((1,), jnp.float32), context=context)

    def generate_lynx(self, prompt: str, arcface_embed, ref_image=None,
                      n_prompt: str = "", width: int = 832,
                      height: int = 480, frame_num: int = 81,
                      sampling=None, seed: int = 0,
                      resampler_params=None, resampler_cfg=None,
                      ip_scale: float = 1.0, ref_scale: float = 1.0,
                      context=None, context_null=None,
                      return_latents: bool = False):
        """Lynx face-identity T2V (any2video.py:1039-1069).

        arcface_embed: [512] ArcFace identity vector; ref_image (full
        variant only): [H, W, 3] 256x256 face crop in [-1, 1]."""
        from .lynx import ResamplerConfig, resampler_forward
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        rcfg = resampler_cfg or ResamplerConfig()
        arc = jnp.asarray(arcface_embed, jnp.float32).reshape(1, 1, -1)
        ip_cond = resampler_forward(resampler_params, rcfg, arc)
        ip_uncond = resampler_forward(resampler_params, rcfg,
                                      jnp.zeros_like(arc))
        ref_buf = ref_buf_uncond = None
        full = "k_ref" in self.dit_params.get("lynx_blocks", {})
        if full and ref_image is not None:
            face_ctx = self.encode_text(["image of a face"]) \
                if self.t5_params is not None else context
            ref_buf = self.extract_lynx_ref_buffer(ref_image,
                                                   context=face_ctx)
            ref_buf_uncond = self.extract_lynx_ref_buffer(
                jnp.zeros_like(jnp.asarray(ref_image)), context=face_ctx)

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            lynx_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, ip_scale=ip_scale,
            ref_scale=ref_scale, rope_cos=rope_cos, rope_sin=rope_sin,
            attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               ip_cond=ip_cond, ip_uncond=ip_uncond,
               ref_buf=ref_buf, ref_buf_uncond=ref_buf_uncond)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_steadydancer(self, prompt: str, pose_video, source_image,
                              pose_video_null=None, n_prompt: str = "",
                              width: int = 832, height: int = 480,
                              frame_num: int = 81, sampling=None,
                              seed: int = 0,
                              condition_guide_scale: float = 2.0,
                              context=None, context_null=None,
                              return_latents: bool = False):
        """SteadyDancer pose-conditioned i2v (any2video.py:793-809,
        1535-1543, 1620-1628).

        pose_video: [T, H, W, 3] aligned pose renders; source_image:
        [H, W, 3] the person to animate; DC-CFG applies the pose
        condition guidance only in the [10%, 50%) step window."""
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        st, sh, sw = self.vae_stride
        lat_h, lat_w = height // sh, width // sw
        f_lat = (frame_num - 1) // st + 1

        def enc(pix):
            z = vae_encode(self.vae_params, self.vae_cfg, pix)
            return z.transpose(0, 4, 1, 2, 3)

        src = jnp.asarray(source_image, jnp.float32)[None, None]
        pose = jnp.asarray(pose_video, jnp.float32)[None]
        ref_lat = enc(src)                      # [1, 16, 1, h, w]
        # ref_x = [lat, ones-mask, lat] (any2video.py:797-799)
        ref_x = jnp.concatenate(
            [ref_lat, jnp.ones((1, 4, 1, lat_h, lat_w), jnp.float32),
             ref_lat], axis=1)
        pose0_lat = enc(pose[:, :1])
        ref_c = pose0_lat                       # loader keeps [:16]
        conditions = enc(pose)
        conditions_null = (enc(jnp.asarray(pose_video_null,
                                           jnp.float32)[None])
                           if pose_video_null is not None
                           else jnp.zeros_like(conditions))
        y, clip_fea = self.build_i2v_conditioning(
            np.asarray(src[0, 0]), frame_num, height, width)

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        # rope over f + 2 ref frames (inner_latent_frames = 2,
        # any2video.py:808)
        from ...ops.rope import build_rope_3d
        pt, ph, pw = self.dit_cfg.patch_size
        rope_cos, rope_sin = build_rope_3d(
            (f_lat + 2, lat_h // ph, lat_w // pw),
            head_dim=self.dit_cfg.head_dim)
        g = sampling.guide_scale
        cg = condition_guide_scale
        use_text_cfg = g != 1.0
        steps = sampling.steps
        # DC-CFG window weights (any2video.py:1537)
        w_cond = jnp.asarray(
            [1.0 if 0.1 <= i / steps < 0.5 else 0.0
             for i in range(steps)], jnp.float32) * (cg != 1.0)

        if use_text_cfg:
            ctx = jnp.concatenate([context, context_null, context], axis=0)
            conds = jnp.concatenate(
                [conditions, conditions, conditions_null], axis=0)
            nb = 3
        else:
            ctx = jnp.concatenate([context, context], axis=0)
            conds = jnp.concatenate([conditions, conditions_null], axis=0)
            nb = 2
        yb = jnp.concatenate([y] * nb, axis=0)
        clipb = (None if clip_fea is None
                 else jnp.concatenate([clip_fea] * nb, axis=0))

        def scan(dit_params, latents):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i, wc = xs
                xb = jnp.concatenate([x] * nb, axis=0)
                tb = jnp.broadcast_to(t, (nb,))
                v = wan_dit_forward(
                    dit_params, self.dit_cfg, xb, tb, ctx, rope_cos,
                    rope_sin, y=yb, clip_fea=clipb,
                    steadydancer=(conds, ref_x, ref_c),
                    attn_backend=self.attn_backend)
                if use_text_cfg:
                    pred = v[1:2] + g * (v[0:1] - v[1:2]) \
                        + wc * cg * (v[0:1] - v[2:3])
                else:
                    pred = v[1:2] + cg * (v[0:1] - v[1:2])
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32),
                  w_cond)
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = jax.jit(scan)(self.dit_params, latents)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_animate(self, prompt: str, ref_image, pose_video=None,
                         face_video=None, bg_video=None,
                         n_prompt: str = "", width: int = 832,
                         height: int = 480, frame_num: int = 81,
                         sampling=None, seed: int = 0,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """Wan 2.2 Animate (any2video.py:820-847, model_animate.py): the
        reference image occupies latent frame 0; pose-video latents are
        added to frames 1+; face crops drive the motion adapter.

        ref_image: [H, W, 3] in [-1, 1]; pose_video / bg_video:
        [T, H, W, 3]; face_video: [T, 512, 512, 3] face crops."""
        from .animate import (motion_encoder_forward, face_encoder_forward,
                              FaceEncoderConfig)
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        st, sh, sw = self.vae_stride
        f_lat = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw

        def enc(pix):
            z = vae_encode(self.vae_params, self.vae_cfg, pix)
            return z.transpose(0, 4, 1, 2, 3)

        ref = jnp.asarray(ref_image, jnp.float32)[None, None]
        ref_lat = enc(ref)                       # [1, 16, 1, h, w]
        bg = (jnp.asarray(bg_video, jnp.float32)[None]
              if bg_video is not None
              else -jnp.ones((1, frame_num, height, width, 3),
                             jnp.float32))
        lat_y = jnp.concatenate([ref_lat, enc(bg)], axis=2)
        # msk_ref ones for the ref frame, msk_control zeros
        # (any2video.py:835-838 get_i2v_mask)
        msk = jnp.concatenate(
            [jnp.ones((1, 4, 1, lat_h, lat_w), jnp.float32),
             jnp.zeros((1, 4, f_lat, lat_h, lat_w), jnp.float32)], axis=2)
        y = jnp.concatenate([msk, lat_y], axis=1)

        pose_lat = None
        if pose_video is not None and \
                self.dit_params.get("pose_patch_embedding") is not None:
            pose_lat = enc(jnp.asarray(pose_video, jnp.float32)[None])

        motion_vec = None
        me = self.dit_params.get("motion_encoder")
        fe = self.dit_params.get("face_encoder")
        if face_video is not None and me is not None and fe is not None:
            faces = jnp.asarray(face_video, jnp.float32)
            faces = faces.transpose(0, 3, 1, 2)      # [T, 3, S, S]
            motion = motion_encoder_forward(me, faces)[None]  # [1, T, 512]
            fcfg = FaceEncoderConfig(hidden_dim=self.dit_cfg.dim)
            motion_vec = face_encoder_forward(fe, fcfg, motion)
            motion_vec = motion_vec[:, :1 + f_lat]

        lat_shape = (1, self.dit_cfg.out_dim, 1 + f_lat, lat_h, lat_w)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        b = 1
        use_cfg = sampling.guide_scale != 1.0
        nb = 2 if use_cfg else 1
        ctx = (jnp.concatenate([context, context_null], axis=0)
               if use_cfg else context)
        yb = jnp.concatenate([y] * nb, axis=0)
        g = sampling.guide_scale

        def scan(dit_params, latents):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                xb = jnp.concatenate([x] * nb, axis=0) if nb > 1 else x
                tb = jnp.broadcast_to(t, (nb * b,))
                v = wan_dit_forward(
                    dit_params, self.dit_cfg, xb, tb, ctx, rope_cos,
                    rope_sin, y=yb, animate=(pose_lat, motion_vec),
                    attn_backend=self.attn_backend)
                pred = v[:b] if nb == 1 else v[b:] + g * (v[:b] - v[b:])
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = jax.jit(scan)(self.dit_params, latents)
        x = x[:, :, 1:]                          # drop the ref frame
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_wanmove(self, prompt: str, tracks, image_start,
                         n_prompt: str = "", width: int = 832,
                         height: int = 480, frame_num: int = 81,
                         sampling=None, seed: int = 0,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """Wan-Move trajectory-controlled i2v (any2video.py:779-790).
        tracks: [T, N, 2] pixel (or [0,1]) point tracks."""
        from .wanmove import tracks_to_latent_pos, replace_track_features
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        y, clip_fea = self.build_i2v_conditioning(image_start, frame_num,
                                                  height, width)
        track_pos = tracks_to_latent_pos(np.asarray(tracks), height,
                                         width, (self.vae_stride[0],
                                                 *self.vae_stride[1:]))
        y_np = np.asarray(y)
        dragged = replace_track_features(y_np[0, 4:20], track_pos)
        y_cond = y_np.copy()
        y_cond[0, 4:20] = dragged
        y_cond = jnp.asarray(y_cond)

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            wanmove_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               y_cond=y_cond, y_uncond=y, clip_fea=clip_fea)
        if return_latents:
            return x
        return self.decode(x)[0]

    def encode_video(self, frames):
        """[T, H, W, 3] in [-1, 1] -> latents [1, 16, f_lat, h, w]."""
        from .vae2_2 import Wan22VAEConfig, wan22_vae_encode
        enc = jnp.asarray(frames, jnp.float32)[None]
        if isinstance(self.vae_cfg, Wan22VAEConfig):
            lat = wan22_vae_encode(self.vae_params, self.vae_cfg, enc)
        else:
            lat = vae_encode(self.vae_params, self.vae_cfg, enc)
        return lat.transpose(0, 4, 1, 2, 3)

    def generate_recam(self, prompt: str, source_frames,
                       camera_mode: int = 1, n_prompt: str = "",
                       sampling=None, seed: int = 0,
                       extrinsics_json: Optional[str] = None,
                       source_latents=None, context=None,
                       context_null=None, return_latents: bool = False):
        """ReCamMaster camera-controlled re-rendering
        (any2video.py:928-943).  source_frames: [T, H, W, 3] in [-1, 1]
        (or pass source_latents [1, 16, f, h, w] directly);
        camera_mode: 1..10 (wan_handler.py:843-856)."""
        from .recam import get_camera_embedding
        sampling = sampling or SamplingConfig()
        if source_latents is None:
            source_latents = self.encode_video(source_frames)
        _, _, f_lat, lat_h, lat_w = source_latents.shape
        st, sh, sw = self.vae_stride
        frame_num = (f_lat - 1) * st + 1
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        cam = jnp.asarray(get_camera_embedding(
            camera_mode, frame_num, extrinsics_json=extrinsics_json))

        lat_shape = (1, self.dit_cfg.out_dim, f_lat, lat_h, lat_w)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        # rope over the doubled (target+source) span
        # (any2video.py:1152-1154)
        rope_cos, rope_sin = self._rope(
            (1, self.dit_cfg.out_dim, 2 * f_lat, lat_h, lat_w))
        fn = jax.jit(functools.partial(
            recam_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               source_latents=jnp.asarray(source_latents, jnp.float32),
               cam_emb=cam)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_scail(self, prompt: str, ref_image, pose_video,
                       n_prompt: str = "", sampling=None, seed: int = 0,
                       context=None, context_null=None,
                       return_latents: bool = False):
        """SCAIL 3D-pose-guided animation (any2video.py:850-899).
        ref_image: [H, W, 3] in [-1, 1]; pose_video: [T, H, W, 3]
        rendered pose skeleton video."""
        from .scail import (downsample_half, scail_pose_input,
                            build_scail_pose_rope, build_scail_masks)
        sampling = sampling or SamplingConfig()
        pose_video = np.asarray(pose_video, np.float32)
        frame_num, height, width = pose_video.shape[:3]
        st, sh, sw = self.vae_stride
        lat_t = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        # tiny ref perturbation before encode (any2video.py:862-864)
        key = jax.random.key(seed)
        k_sig, k_eps, k_lat = jax.random.split(key, 3)
        img = jnp.asarray(ref_image, jnp.float32)
        if img.shape[:2] != (height, width):
            img = jax.image.resize(img, (height, width, 3), "bicubic")
        sigma = jnp.exp(-5.0 + 0.5 * jax.random.normal(k_sig, ()))
        noisy_ref = img + sigma * jax.random.normal(k_eps, img.shape)
        ref_lat = self.encode_video(noisy_ref[None])
        pose_lat = self.encode_video(downsample_half(pose_video))
        pose_in = scail_pose_input(pose_lat)
        y = build_scail_masks(lat_t, lat_h, lat_w)

        pt, ph, pw = self.dit_cfg.patch_size
        main_cos, main_sin = build_rope_3d(
            ((1 + lat_t) // pt, lat_h // ph, lat_w // pw),
            head_dim=self.dit_cfg.head_dim)
        pose_cos, pose_sin = build_scail_pose_rope(
            pose_lat.shape[2] // pt, lat_h // ph, lat_w // pw,
            head_dim=self.dit_cfg.head_dim)
        rope_cos = jnp.concatenate([main_cos, pose_cos], axis=0)
        rope_sin = jnp.concatenate([main_sin, pose_sin], axis=0)

        clip_fea = None
        if self.clip_params is not None:
            from .clip_vision import preprocess_image, clip_vision_encode
            pixels = preprocess_image(img, self.clip_cfg.image_size)
            clip_fea = clip_vision_encode(
                self.clip_params, self.clip_cfg, pixels
            ).astype(jnp.float32)

        latents = jax.random.normal(
            k_lat, (1, self.dit_cfg.out_dim, 1 + lat_t, lat_h, lat_w),
            jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        fn = jax.jit(functools.partial(
            scail_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               ref_latent=ref_lat, y=y, scail_pose=pose_in,
               clip_fea=clip_fea)
        if return_latents:
            return x
        # drop the reference latent frame (ref_images_before trim)
        return self.decode(x[:, :, 1:])[0]

    def generate_scail2(self, prompt: str, ref_image, ref_mask,
                        pose_video, driving_mask_video=None,
                        n_prompt: str = "", sampling=None, seed: int = 0,
                        replace: bool = False, context=None,
                        context_null=None, return_latents: bool = False):
        """SCAIL-2 reference-driven animation
        (scail2/__init__.py:701-821).  ref_image: matted [H, W, 3];
        ref_mask: color-coded RGB mask image; pose_video: [T, H, W, 3]
        rendered pose; driving_mask_video: color-coded RGB mask video
        (defaults to all-white)."""
        from .scail import downsample_half, build_scail_pose_rope
        from .scail2 import (compress_mask_to_latent, with_ones_mask,
                             build_scail2_main_rope)
        sampling = sampling or SamplingConfig()
        pose_video = np.asarray(pose_video, np.float32)
        frame_num, height, width = pose_video.shape[:3]
        st, sh, sw = self.vae_stride
        lat_t = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        img = jnp.asarray(ref_image, jnp.float32)
        if img.shape[:2] != (height, width):
            img = jax.image.resize(img, (height, width, 3), "bicubic")
        ref_lat = with_ones_mask(self.encode_video(img[None]))
        n_ref = ref_lat.shape[2]
        ref_mask_28 = compress_mask_to_latent(
            np.asarray(ref_mask, np.float32)[None])      # [28, 1, h, w]
        null_mask = np.zeros((28, lat_t, lat_h, lat_w), np.float32)
        ref_masks = jnp.asarray(np.concatenate(
            [ref_mask_28, null_mask], axis=1))[None]
        pose_lat = with_ones_mask(
            self.encode_video(downsample_half(pose_video)))
        if driving_mask_video is None:
            driving_mask_video = np.ones((frame_num, height, width, 3),
                                         np.float32)
        dm = downsample_half(np.asarray(driving_mask_video, np.float32))
        driving_masks = jnp.asarray(compress_mask_to_latent(dm))[None]

        y = jnp.zeros((1, 4, lat_t, lat_h, lat_w), jnp.float32)
        pt, ph, pw = self.dit_cfg.patch_size
        h_tok, w_tok = lat_h // ph, lat_w // pw
        main_cos, main_sin = build_scail2_main_rope(
            n_ref, lat_t, h_tok, w_tok, head_dim=self.dit_cfg.head_dim,
            replace=replace)
        pose_cos, pose_sin = build_scail_pose_rope(
            pose_lat.shape[2] // pt, h_tok, w_tok,
            head_dim=self.dit_cfg.head_dim,
            t_offset=0 if replace else n_ref)
        rope_cos = jnp.concatenate([main_cos, pose_cos], axis=0)
        rope_sin = jnp.concatenate([main_sin, pose_sin], axis=0)

        clip_fea = None
        if self.clip_params is not None:
            from .clip_vision import preprocess_image, clip_vision_encode
            pixels = preprocess_image(img, self.clip_cfg.image_size)
            clip_fea = clip_vision_encode(
                self.clip_params, self.clip_cfg, pixels
            ).astype(jnp.float32)

        latents = jax.random.normal(
            jax.random.key(seed),
            (1, self.dit_cfg.out_dim, lat_t, lat_h, lat_w), jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        scail2_cond = {"ref": ref_lat, "ref_masks": ref_masks,
                       "pose": pose_lat, "driving_masks": driving_masks}
        fn = jax.jit(functools.partial(
            scail2_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               y=y, scail2_cond=scail2_cond, clip_fea=clip_fea)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_kiwi(self, context, source_frames=None, ref_image=None,
                      context_null=None, width: int = 832,
                      height: int = 480, frame_num: int = 81,
                      source_embedder=None, ref_embedder=None,
                      ref_pad_first: bool = False, sampling=None,
                      seed: int = 0, return_latents: bool = False):
        """Kiwi Edit denoise (model.py:1616-1631).  context: MLLM
        context [1, n, text_dim] (kiwi.kiwi_mllm_encode);
        source_frames: [T, H, W, 3] video to edit; ref_image:
        [H, W, 3] reference."""
        from .kiwi import embed_kiwi_condition
        sampling = sampling or SamplingConfig()
        if source_frames is not None:
            src = np.asarray(source_frames, np.float32)
            frame_num, height, width = src.shape[:3]
        st, sh, sw = self.vae_stride
        lat_t = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        kiwi = {}
        if source_frames is not None and source_embedder is not None:
            kiwi["source"] = embed_kiwi_condition(
                source_embedder, self.encode_video(src),
                self.dit_cfg.patch_size)
        if ref_image is not None and ref_embedder is not None:
            img = jnp.asarray(ref_image, jnp.float32)
            if img.shape[:2] != (height, width):
                img = jax.image.resize(img, (height, width, 3),
                                       "bicubic")
            kiwi["ref"] = embed_kiwi_condition(
                ref_embedder, self.encode_video(img[None]),
                self.dit_cfg.patch_size)
        pt, ph, pw = self.dit_cfg.patch_size
        extra_t = 1 if kiwi.get("ref") is not None else 0
        rope_cos, rope_sin = build_rope_3d(
            (lat_t // pt + extra_t, lat_h // ph, lat_w // pw),
            head_dim=self.dit_cfg.head_dim)
        if extra_t and ref_pad_first:
            # ref tokens lead: natural frame order already matches
            pass
        latents = jax.random.normal(
            jax.random.key(seed),
            (1, self.dit_cfg.out_dim, lat_t, lat_h, lat_w), jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        use_cfg = (sampling.guide_scale != 1.0
                   and context_null is not None)
        nb = 2 if use_cfg else 1
        ctxs = ([context, context_null] if use_cfg else [context])
        dit_cfg, backend = self.dit_cfg, self.attn_backend
        gs = sampling.guide_scale

        pad_first = bool(ref_pad_first)

        @jax.jit
        def scan(dit_params, latents, ctxs, kiwi):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                tb = jnp.broadcast_to(t, (1,))
                kw = dict(kiwi)
                kw["ref_pad_first"] = pad_first
                preds = [wan_dit_forward(dit_params, dit_cfg, x, tb, c,
                                         rope_cos, rope_sin, kiwi=kw,
                                         attn_backend=backend)
                         for c in ctxs]
                pred = (preds[0] if not use_cfg
                        else preds[1] + gs * (preds[0] - preds[1]))
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = scan(self.dit_params, latents, ctxs, kiwi)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_vista4d(self, prompt: str, source_video,
                         point_cloud_video, cam_c2w, intrinsics,
                         source_alpha_mask=None, source_motion_mask=None,
                         point_alpha_mask=None, point_motion_mask=None,
                         n_prompt: str = "", sampling=None, seed: int = 0,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """Vista4D camera-controllable re-rendering
        (vista4d/preprocess.py:684-723).  source_video /
        point_cloud_video: [T, H, W, 3] in [-1, 1]; cam_c2w: [T, 4, 4];
        intrinsics: [T, 4] (fx, fy, cx, cy); masks: [T, H, W] in
        [0, 1] (default ones alpha / zeros motion)."""
        from .vista4d import (get_plucker_embedding, pack_masks,
                              build_vista_rope)
        sampling = sampling or SamplingConfig()
        src = np.asarray(source_video, np.float32)
        frame_num, height, width = src.shape[:3]
        st, sh, sw = self.vae_stride
        lat_t = (frame_num - 1) // st + 1
        lat_h, lat_w = height // sh, width // sw
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])

        def msk(m, default):
            return (np.asarray(m, np.float32) if m is not None
                    else np.full((frame_num, height, width), default,
                                 np.float32))

        vista = {
            "source_latents": self.encode_video(src),
            "point_latents": self.encode_video(
                np.asarray(point_cloud_video, np.float32)),
            "source_mask_latents": pack_masks(
                msk(source_alpha_mask, 1.0),
                msk(source_motion_mask, 0.0)),
            "point_mask_latents": pack_masks(
                msk(point_alpha_mask, 1.0),
                msk(point_motion_mask, 0.0)),
        }
        pt, ph, pw = self.dit_cfg.patch_size
        h_tok, w_tok = lat_h // ph, lat_w // pw
        cam = get_plucker_embedding(
            np.asarray(intrinsics, np.float32)[None],
            np.asarray(cam_c2w, np.float32)[None], height, width,
            h_tok, w_tok)[:, ::st]                 # [1, lat_t, h, w, 6]
        vista["cam_emb"] = jnp.asarray(cam)
        rope_cos, rope_sin = build_vista_rope(
            lat_t // pt, h_tok, w_tok, head_dim=self.dit_cfg.head_dim)

        latents = jax.random.normal(
            jax.random.key(seed),
            (1, self.dit_cfg.out_dim, lat_t, lat_h, lat_w), jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        use_cfg = sampling.guide_scale != 1.0
        nb = 2 if use_cfg else 1
        ctx = (jnp.concatenate(
            [context, context_null if context_null is not None
             else context], axis=0) if use_cfg else context)
        dit_cfg, backend = self.dit_cfg, self.attn_backend
        gs = sampling.guide_scale

        @jax.jit
        def scan(dit_params, latents, ctx, vista):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                xb = (jnp.concatenate([x] * nb, axis=0) if use_cfg
                      else x)
                tb = jnp.broadcast_to(t, (nb,))
                v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                                    rope_cos, rope_sin, vista=vista,
                                    attn_backend=backend)
                pred = (v[:1] if not use_cfg
                        else v[1:] + gs * (v[:1] - v[1:]))
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = scan(self.dit_params, latents, ctx, vista)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_bernini(self, prompt: str, control_video=None,
                         ref_images=None, n_prompt: str = "",
                         width: int = 832, height: int = 480,
                         frame_num: int = 81, omega_v: float = 1.0,
                         omega_i: float = 1.0, sampling=None,
                         seed: int = 0, context=None, context_null=None,
                         return_latents: bool = False):
        """Bernini compositional editing (any2video.py:950-966,
        1567-1607).  control_video: [T, H, W, 3]; ref_images: list of
        [H, W, 3]; omega_v/omega_i: video/image source weights;
        sampling.guide_scale is the text weight (omega_ti)."""
        from .bernini import (bernini_branch_defs, sources_for_key,
                              rotate_rope_source)
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        omega_ti = sampling.guide_scale
        video_srcs, image_srcs = [], []
        if control_video is not None:
            video_srcs.append(self.encode_video(
                np.asarray(control_video, np.float32)))
        for r in (ref_images or []):
            img = jnp.asarray(r, jnp.float32)
            if img.shape[:2] != (height, width):
                img = jax.image.resize(img, (height, width, 3),
                                       "bicubic")
            image_srcs.append(self.encode_video(img[None]))
        defs = bernini_branch_defs(bool(video_srcs), bool(image_srcs),
                                   omega_v, omega_i, omega_ti)
        needs_null = any(not use_cond for _, _, use_cond in defs)
        if context_null is None and needs_null:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        main_cos, main_sin = self._rope(lat_shape)
        pt, ph, pw = self.dit_cfg.patch_size
        branches = []
        for coeff, key, use_cond in defs:
            srcs = sources_for_key(key, video_srcs, image_srcs)
            cos_parts, sin_parts = [main_cos], [main_sin]
            lats = []
            for lat, sid in srcs:
                grid = (lat.shape[2] // pt, lat.shape[3] // ph,
                        lat.shape[4] // pw)
                c, s = build_rope_3d(grid,
                                     head_dim=self.dit_cfg.head_dim)
                c, s = rotate_rope_source(c, s, sid)
                cos_parts.append(c)
                sin_parts.append(s)
                lats.append(lat)
            branches.append((coeff,
                             context if use_cond else context_null,
                             tuple(lats),
                             jnp.concatenate(cos_parts, axis=0),
                             jnp.concatenate(sin_parts, axis=0)))

        dit_cfg, backend = self.dit_cfg, self.attn_backend

        @jax.jit
        def scan(dit_params, latents, *ctxs):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                tb = jnp.broadcast_to(t, (x.shape[0],))
                pred = jnp.zeros_like(x)
                for (coeff, _, lats, cosb, sinb), ctx in zip(branches,
                                                             ctxs):
                    v = wan_dit_forward(dit_params, dit_cfg, x, tb, ctx,
                                        cosb, sinb,
                                        bernini=lats or None,
                                        attn_backend=backend)
                    pred = pred + coeff * v
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = scan(self.dit_params, latents,
                 *[ctx for _, ctx, *_ in branches])
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_mocha(self, prompt: str, source_frames, mask_frame,
                       ref_images, n_prompt: str = "", frame_num: int = 81,
                       sampling=None, seed: int = 0, context=None,
                       context_null=None, return_latents: bool = False):
        """MoCha character replacement (any2video.py:387-412, 1123-1125).
        source_frames: [T, H, W, 3] control video in [-1, 1];
        mask_frame: [H, W] first-frame person mask;
        ref_images: up to two [H, W, 3] reference images (second a face
        close-up)."""
        from .mocha import build_mocha_latents, build_mocha_rope
        sampling = sampling or SamplingConfig()
        source_latents = self.encode_video(source_frames)
        _, _, src_f, lat_h, lat_w = source_latents.shape
        st = self.vae_stride[0]
        f_lat = (frame_num - 1) // st + 1
        ref_lats = [self.encode_video(np.asarray(r)[None])
                    for r in ref_images[:2]]
        extended = build_mocha_latents(source_latents, mask_frame,
                                       ref_lats)
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        pt, ph, pw = self.dit_cfg.patch_size
        rope_cos, rope_sin = build_mocha_rope(
            f_lat // pt, src_f // pt, len(ref_lats), lat_h // ph,
            lat_w // pw, head_dim=self.dit_cfg.head_dim)
        lat_shape = (1, self.dit_cfg.out_dim, f_lat, lat_h, lat_w)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        fn = jax.jit(functools.partial(
            recam_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend,
            cam_emb=None))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               source_latents=extended)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_shotplan(self, prompt: str, n_prompt: str = "",
                          width: int = 832, height: int = 480,
                          frame_num: int = 81, fps: float = 16.0,
                          sampling=None, seed: int = 0,
                          context=None, context_null=None,
                          return_latents: bool = False):
        """ShotPlan planned-hard-cut T2V (shotplan.py, model.py:1724).
        The prompt uses relay syntax ([0%:33%] caption...); it compiles
        to a Shot N: prompt + hardcut tokens injected at cut frames."""
        from .shotplan import (compile_shotplan_prompt,
                               build_shotplan_injection)
        sampling = sampling or SamplingConfig()
        sp = compile_shotplan_prompt(prompt, frame_num, fps)
        if context is None:
            context = self.encode_text([sp.prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        inj = None
        if sp.cut_frames:
            pt, ph, pw = self.dit_cfg.patch_size
            grid = (lat_shape[2] // pt, lat_shape[3] // ph,
                    lat_shape[4] // pw)
            inj = build_shotplan_injection(grid, sp.cut_frames, rope_cos,
                                           rope_sin,
                                           head_dim=self.dit_cfg.head_dim)
        b = latents.shape[0]
        use_cfg = sampling.guide_scale != 1.0
        nb = 2 if use_cfg else 1
        ctx = (jnp.concatenate([context, context_null], axis=0)
               if use_cfg else context)
        g = sampling.guide_scale

        def scan(dit_params, latents):
            def body(carry, xs):
                x, sstate = carry
                t, coeffs_i, i = xs
                xb = jnp.concatenate([x] * nb, axis=0) if nb > 1 else x
                tb = jnp.broadcast_to(t, (nb * b,))
                v = wan_dit_forward(dit_params, self.dit_cfg, xb, tb, ctx,
                                    rope_cos, rope_sin, shotplan=inj,
                                    attn_backend=self.attn_backend)
                pred = v[:b] if nb == 1 else v[b:] + g * (v[:b] - v[b:])
                x, sstate = solver_step(schedule, i, coeffs_i, pred, x,
                                        sstate)
                return (x, sstate), None

            carry0 = (latents.astype(jnp.float32),
                      init_solver_state(schedule, latents))
            xs = (schedule.timesteps,
                  {k: v for k, v in schedule.coeffs.items()},
                  jnp.arange(schedule.num_steps, dtype=jnp.int32))
            (x, _), _ = jax.lax.scan(body, carry0, xs)
            return x

        x = jax.jit(scan)(self.dit_params, latents)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_standin(self, prompt: str, ref_image,
                         n_prompt: str = "", width: int = 832,
                         height: int = 480, frame_num: int = 81,
                         sampling=None, seed: int = 0,
                         vace_context=None, vace_scale: float = 1.0,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """StandIn identity-preserved T2V (any2video.py:1072-1088): the
        reference face image is VAE-encoded; its tokens run the LoRA
        phase-1 block stack and their kv is appended to every
        self-attention.  ref_image: [H, W, 3] in [-1, 1] (pre-cropped
        face, reference face_processor.process)."""
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        from .standin import build_standin_ref_rope
        arr = jnp.asarray(ref_image, jnp.float32)
        pix = arr[None, None]                    # [1, 1, H, W, 3]
        st_lat = vae_encode(self.vae_params, self.vae_cfg, pix)
        st_lat = st_lat.transpose(0, 4, 1, 2, 3)  # [1, C, 1, h, w]

        lat_shape = self.latent_shape(frame_num, height, width)
        pt, ph, pw = self.dit_cfg.patch_size
        ref_cos, ref_sin = build_standin_ref_rope(
            (lat_shape[3] // ph, lat_shape[4] // pw),
            (st_lat.shape[3] // ph, st_lat.shape[4] // pw),
            head_dim=self.dit_cfg.head_dim)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            standin_denoise_scan, dit_cfg=self.dit_cfg, schedule=schedule,
            guide_scale=sampling.guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, ref_cos=ref_cos, ref_sin=ref_sin,
            vace_scale=vace_scale, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               standin_latents=st_lat, vace_context=vace_context)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_multitalk(self, prompt: str, audio_emb,
                           n_prompt: str = "", width: int = 832,
                           height: int = 480, frame_num: int = 81,
                           sampling=None, seed: int = 0,
                           audio_guide_scale: float = 4.0,
                           audio_proj_params=None, audio_proj_cfg=None,
                           vace_context=None, vace_scale: float = 1.0,
                           context=None, context_null=None,
                           return_latents: bool = False,
                           audio_start_idx: int = 0):
        """Audio-driven talking-head generation (multitalk module on any
        Wan base, wan_handler.py:44-45; BASELINE config vace_multitalk_14B).

        audio_emb: [T_frames, blocks, 768] per-video-frame wav2vec2
        hidden-state stack (multitalk.wav2vec2_extract), windowed per
        latent frame and projected to 32 context tokens per frame."""
        from .multitalk import (AudioProjConfig, audio_proj_forward,
                                get_window_audio_embeddings)
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and (sampling.guide_scale != 1.0
                                     or audio_guide_scale != 1.0):
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        ap_cfg = audio_proj_cfg or AudioProjConfig()

        first, latter = get_window_audio_embeddings(
            np.asarray(audio_emb), audio_start_idx=audio_start_idx,
            clip_length=frame_num, audio_window=ap_cfg.seq_len)
        tokens = audio_proj_forward(audio_proj_params, ap_cfg,
                                    jnp.asarray(first), jnp.asarray(latter))
        zero_first = jnp.zeros_like(jnp.asarray(first))
        zero_latter = jnp.zeros_like(jnp.asarray(latter))
        tokens_zero = audio_proj_forward(audio_proj_params, ap_cfg,
                                         zero_first, zero_latter)

        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            multitalk_denoise_scan, dit_cfg=self.dit_cfg,
            schedule=schedule, guide_scale=sampling.guide_scale,
            audio_guide_scale=audio_guide_scale, rope_cos=rope_cos,
            rope_sin=rope_sin, vace_scale=vace_scale,
            attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               audio_tokens=tokens, audio_tokens_zero=tokens_zero,
               vace_context=vace_context)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_fantasy(self, prompt: str, audio_features,
                         image_start=None, n_prompt: str = "",
                         width: int = 832, height: int = 480,
                         frame_num: int = 81, sampling=None, seed: int = 0,
                         audio_guide_scale: float = 5.0,
                         audio_strength: float = 1.0,
                         fantasy_proj_params=None,
                         context=None, context_null=None,
                         return_latents: bool = False):
        """FantasyTalking audio-driven i2v (fantasytalking/infer.py:10,
        any2video.py:1141-1142,1616-1618).

        audio_features: [1, L, 768] wav2vec2 LAST hidden state
        interpolated to fps*duration tokens (fantasytalking/utils.py
        get_audio_features)."""
        from .fantasy import (fantasy_proj_forward, split_audio_sequence,
                              split_tensor_with_padding, fantasy_kv_mask)
        sampling = sampling or SamplingConfig()
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and sampling.guide_scale != 1.0:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])

        proj = fantasy_proj_forward(fantasy_proj_params,
                                    jnp.asarray(audio_features))
        ranges = split_audio_sequence(proj.shape[1], num_frames=frame_num)
        windows, k_lens = split_tensor_with_padding(np.asarray(proj),
                                                    ranges, expand_length=4)
        mask = fantasy_kv_mask(k_lens, windows.shape[2])

        y = clip_fea = None
        if image_start is not None:
            y, clip_fea = self.build_i2v_conditioning(image_start,
                                                      frame_num, height,
                                                      width)
        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        schedule = make_schedule(sampling.solver, sampling.steps,
                                 sampling.shift,
                                 solver_order=sampling.solver_order)
        rope_cos, rope_sin = self._rope(lat_shape, sampling.enable_riflex)
        fn = jax.jit(functools.partial(
            fantasy_denoise_scan, dit_cfg=self.dit_cfg,
            schedule=schedule, guide_scale=sampling.guide_scale,
            audio_guide_scale=audio_guide_scale,
            audio_strength=audio_strength, rope_cos=rope_cos,
            rope_sin=rope_sin, attn_backend=self.attn_backend))
        x = fn(self.dit_params, latents=latents, context=context,
               context_null=(context_null if context_null is not None
                             else context),
               fantasy_ctx=jnp.asarray(windows),
               fantasy_mask=jnp.asarray(mask), y=y, clip_fea=clip_fea)
        if return_latents:
            return x
        return self.decode(x)[0]

    def generate_alpha(self, prompt: str, n_prompt: str = "",
                       width: int = 832, height: int = 480,
                       frame_num: int = 81, sampling=None, seed: int = 0,
                       gauss_mask=None, context=None, context_null=None):
        """Wan-Alpha RGBA generation (models/wan/alpha/utils.py,
        any2video.py:152-158, 1436-1438, 1770-1776): one t2v denoise, the
        SAME latents decoded by two VAEs — RGB-channel and alpha-channel
        — composed into RGBA.  gauss_mask (alpha2): [F, H, W]-ish array;
        initial noise gets + (1-mask)*0.03 after trilinear resize.

        Returns [T, H, W, 4] float32 in [-1, 1]."""
        sampling = sampling or SamplingConfig()

        def shift(lat):
            if gauss_mask is None:
                return lat
            m = jnp.asarray(gauss_mask, jnp.float32)
            while m.ndim < 5:
                m = m[None]
            m = jax.image.resize(m, (*m.shape[:2], *lat.shape[2:]),
                                 method="trilinear")
            return lat + (1.0 - m) * 0.03

        lat = self.generate(prompt, n_prompt=n_prompt, width=width,
                            height=height, frame_num=frame_num,
                            sampling=sampling, seed=seed, context=context,
                            context_null=context_null,
                            return_latents=True, noise_transform=shift)
        rgb = self.decode(lat)[0]
        vp, self.vae_params = self.vae_params, self.vae_params_alpha
        try:
            pha = self.decode(lat)[0]
        finally:
            self.vae_params = vp
        # alpha channel = channel mean (alpha/utils.py:141-144)
        a = jnp.mean(pha, axis=-1, keepdims=True)
        return jnp.concatenate([rgb, a], axis=-1)

    def decode(self, latents_bcfhw, mode: str = "auto",
               tile_size: int = 0):
        """VAE decode [B, C, F, H, W] -> [B, T, H, W, 3].  mode auto uses
        the memory-bounded chunked scan for clips beyond a few latent
        frames (vae_scan.py), numerically identical to the full decode.
        tile_size > 0 additionally bounds spatial activation memory by
        decoding overlapping pixel tiles with seam blending (reference
        spatial_tiled_decode, models/wan/modules/vae.py:676-717)."""
        z = latents_bcfhw.transpose(0, 2, 3, 4, 1)
        from .vae2_2 import (Wan22VAEConfig, wan22_vae_decode,
                             wan22_vae_decode_tiled)
        if isinstance(self.vae_cfg, Wan22VAEConfig):
            # 16x spatial stride: bound activation memory with the
            # reference's own spatial tiling once the pixel area is
            # beyond ~512x512 (vae2_2.py:894 spatial_tiled_decode)
            if tile_size > 0 or z.shape[2] * z.shape[3] > 32 * 32:
                return wan22_vae_decode_tiled(self.vae_params, self.vae_cfg,
                                              z, tile_size=tile_size or 256)
            return wan22_vae_decode(self.vae_params, self.vae_cfg, z)
        if tile_size > 0:
            from .vae_scan import vae_decode_spatial_tiled
            return vae_decode_spatial_tiled(self.vae_params, self.vae_cfg,
                                            z, tile_size=tile_size)
        mesh = getattr(self, "mesh", None)
        if mesh is not None and (mode in ("sharded", "auto")
                                 and mesh.shape.get("cp", 1) > 1):
            # multi-chip decode: latents sharded over 'cp', GSPMD
            # inserts the conv halo exchanges (vae_scan.py)
            from .vae_scan import vae_decode_sharded
            return vae_decode_sharded(self.vae_params, self.vae_cfg, z,
                                      mesh)
        if mode == "chunked" or (mode == "auto" and z.shape[1] > 4):
            return vae_decode_chunked(self.vae_params, self.vae_cfg, z,
                                      dtype=self.vae_dtype)
        return vae_decode(self.vae_params, self.vae_cfg, z,
                          dtype=self.vae_dtype)

    # -- end-to-end ---------------------------------------------------------

    def generate(self, prompt: str, n_prompt: str = "",
                 width: int = 832, height: int = 480, frame_num: int = 81,
                 sampling: SamplingConfig = SamplingConfig(), seed: int = 0,
                 context: Optional[jnp.ndarray] = None,
                 context_null: Optional[jnp.ndarray] = None,
                 overlap_latents: Optional[jnp.ndarray] = None,
                 image_start=None, return_latents: bool = False,
                 noise_transform=None, i2v_cond=None):
        """T2V / I2V generation.  image_start: [H, W, 3] in [-1, 1] enables
        the i2v conditioning path.  noise_transform: optional fn applied
        to the initial noise latents (Wan-Alpha gauss shift,
        any2video.py:1436-1438).  i2v_cond: optional prebuilt
        (y, clip_fea) pair overriding the standard i2v conditioning
        (SVI2Pro latent-ref scheme, any2video.py:707-722).  Returns
        video [T, H, W, 3] float32 in [-1, 1] (or latents if
        return_latents)."""
        any_guidance = (sampling.guide_scale != 1.0
                        or (sampling.guide_phases >= 2
                            and sampling.guide2_scale != 1.0)
                        or (sampling.guide_phases >= 3
                            and sampling.guide3_scale != 1.0)
                        or sampling.nag_scale > 1.0)
        if context is None:
            context = self.encode_text([prompt])
        if context_null is None and any_guidance:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])
        if context_null is None:
            context_null = context  # unused when guidance off

        y = clip_fea = None
        if i2v_cond is not None:
            y, clip_fea = i2v_cond
        elif image_start is not None:
            y, clip_fea = self.build_i2v_conditioning(image_start, frame_num,
                                                      height, width)
        lat_shape = self.latent_shape(frame_num, height, width)
        latents = jax.random.normal(jax.random.key(seed), lat_shape,
                                    jnp.float32)
        if noise_transform is not None:
            latents = noise_transform(latents)
        x = self.denoise(latents, context, context_null, sampling,
                         y=y, clip_fea=clip_fea,
                         overlap_latents=overlap_latents, seed=seed,
                         enable_riflex=sampling.enable_riflex,
                         width=width, height=height)
        if return_latents:
            return x
        video = self.decode(x)
        return video[0]

    def generate_sliding(self, prompt: str, n_prompt: str = "",
                         width: int = 832, height: int = 480,
                         frame_num: int = 161, window_size: int = 81,
                         overlap: int = 5, discard: int = 0,
                         sampling: SamplingConfig = SamplingConfig(),
                         seed: int = 0,
                         context: Optional[jnp.ndarray] = None,
                         context_null: Optional[jnp.ndarray] = None,
                         source_frames=None):
        """Sliding-window long-video generation (wgp.py window loop +
        windows.py planning).  prompt may hold one line per window with
        /duration /overlap /new_shot commands.  Returns [T, H, W, 3].

        source_frames: optional [T, H, W, 3] in [-1, 1] — continue-video
        mode (wgp.py:6964 video_source; any2video.py:1482-1491 overlap
        re-noising): the tail `overlap` frames are VAE-encoded and pinned
        as the first window's overlap prefix; the returned video is the
        continuation only (the caller stitches onto the source)."""
        from ...windows import (plan_windows, latent_overlap, stitch_windows)
        st = self.vae_stride[0]
        prompts = [p for p in prompt.split("\n") if p.strip()] or [""]
        plans = plan_windows(frame_num, window_size, overlap,
                             discard=discard, prompts=prompts,
                             quantum=st)
        if context_null is None and sampling.guide_scale != 1.0 \
                and context is None:
            context_null = self.encode_text(
                [n_prompt or DEFAULT_NEGATIVE_PROMPT])

        segments, overlaps = [], []
        prev_latents = None
        if source_frames is not None:
            from .vae2_2 import Wan22VAEConfig, wan22_vae_encode
            ov_px = max(st + 1, (overlap - 1) // st * st + 1)
            tail = jnp.asarray(source_frames[-ov_px:], jnp.float32)
            pix = tail[None].transpose(0, 4, 1, 2, 3)   # [1, 3, T, H, W]
            enc_fn = (wan22_vae_encode
                      if isinstance(self.vae_cfg, Wan22VAEConfig)
                      else vae_encode)
            z = enc_fn(self.vae_params, self.vae_cfg,
                       pix.transpose(0, 2, 3, 4, 1))    # [1, t, h, w, C]
            prev_latents = z.transpose(0, 4, 1, 2, 3)   # [1, C, t, h, w]
        ctx_cache: Dict[str, Any] = {}
        for k, plan in enumerate(plans):
            if context is not None:
                ctx = context
                ctxn = context_null if context_null is not None else context
            else:
                if plan.prompt not in ctx_cache:
                    ctx_cache[plan.prompt] = self.encode_text([plan.prompt])
                ctx = ctx_cache[plan.prompt]
                ctxn = context_null if context_null is not None else ctx

            ov_lat = 0
            overlap_latents = None
            eff_overlap = plan.overlap if k > 0 else (
                overlap if prev_latents is not None else 0)
            if eff_overlap > 0 and prev_latents is not None \
                    and not plan.new_shot:
                ov_lat = latent_overlap(eff_overlap, st)
                ov_lat = min(ov_lat, prev_latents.shape[2])
                overlap_latents = prev_latents[:, :, -ov_lat:]

            lat_shape = self.latent_shape(plan.size, height, width)
            latents = jax.random.normal(jax.random.key(seed + k), lat_shape,
                                        jnp.float32)
            x = self.denoise(latents, ctx, ctxn, sampling,
                             overlap_latents=overlap_latents, seed=seed + k,
                             width=width, height=height)
            prev_latents = x
            frames = self.decode(x)[0]
            if plan.discard > 0:
                frames = frames[:-plan.discard]
            segments.append(np.asarray(frames))
            overlaps.append(plan.overlap if not plan.new_shot else 0)
        return stitch_windows(segments, overlaps)
