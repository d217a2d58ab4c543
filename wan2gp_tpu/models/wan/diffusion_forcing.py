"""Diffusion forcing (SkyReels-V2 DF): per-frame asynchronous denoising.

Reference: models/wan/diffusion_forcing.py:125 generate_timestep_matrix —
frames denoise at staggered noise levels (each causal block lags its
predecessor by `ar_step` solver iterations), enabling autoregressive long
video.  The matrix is pure integer logic over the step template, so it is
fully HOST-precomputed; the compiled scan consumes per-row (t_frame,
d_sigma, update_mask) tables and performs masked per-frame Euler updates.
The DiT already supports per-frame timesteps ([B, F_lat] t).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .dit import WanDiTConfig, wan_dit_forward
from ...guidance import cfg_combine


def generate_timestep_matrix(num_frames: int, step_template: np.ndarray,
                             base_num_frames: int, ar_step: int = 5,
                             num_pre_ready: int = 0,
                             causal_block_size: int = 1):
    """Numpy port of the reference scheduling logic (diffusion_forcing.py:125).

    Returns (step_matrix [R, F] timestep values, step_index [R, F] indices
    into the padded template, update_mask [R, F] bool).
    """
    num_iterations = len(step_template) + 1
    nfb = num_frames // causal_block_size
    bfb = base_num_frames // causal_block_size
    if bfb < nfb:
        min_ar = len(step_template) / bfb
        if ar_step < min_ar:
            raise ValueError(f"ar_step must be >= {int(np.ceil(min_ar))}")
    template = np.concatenate([[999], np.asarray(step_template, np.int64),
                               [0]])
    pre_row = np.zeros(nfb, np.int64)
    if num_pre_ready > 0:
        pre_row[: num_pre_ready // causal_block_size] = num_iterations

    rows, indices, masks = [], [], []
    while not np.all(pre_row >= num_iterations - 1):
        new_row = np.zeros(nfb, np.int64)
        for i in range(nfb):
            if i == 0 or pre_row[i - 1] >= num_iterations - 1:
                new_row[i] = pre_row[i] + 1
            else:
                new_row[i] = new_row[i - 1] - ar_step
        new_row = np.clip(new_row, 0, num_iterations)
        masks.append((new_row != pre_row) & (new_row != num_iterations))
        indices.append(new_row.copy())
        rows.append(template[np.clip(new_row, 0, len(template) - 1)])
        pre_row = new_row

    expand = lambda a: np.repeat(np.stack(a), causal_block_size, axis=1)  # noqa: E731
    return expand(rows), expand(indices), expand(masks)


def df_sigma_tables(step_template: np.ndarray, step_index: np.ndarray,
                    num_train_timesteps: int = 1000):
    """Per-row per-frame (t, d_sigma): sigma = t/1000 (causvid-style flow
    match); stepping a frame at index k moves it from template[k] to
    template[k+1]."""
    template = np.concatenate([[999.0],
                               np.asarray(step_template, np.float64), [0.0]])
    sig = template / num_train_timesteps
    idx = np.clip(step_index, 0, len(template) - 1)
    t_cur = template[idx].astype(np.float32)
    nxt = np.clip(idx + 1, 0, len(template) - 1)
    d_sigma = (sig[nxt] - sig[idx]).astype(np.float32)
    return t_cur, d_sigma


def df_denoise_scan(dit_params, dit_cfg: WanDiTConfig, latents, context,
                    context_null, rope_cos, rope_sin,
                    step_matrix_t, d_sigma, update_mask,
                    guide_scale: float = 5.0, attn_backend: str = "auto"):
    """latents: [B, C, F, H, W]; step tables: [R, F].  Masked per-frame
    Euler updates with per-frame timesteps."""
    b = latents.shape[0]
    g = guide_scale
    use_cfg = g != 1.0
    ctx = jnp.concatenate([context, context_null], axis=0) if use_cfg \
        else context

    t_rows = jnp.asarray(step_matrix_t, jnp.float32)
    ds_rows = jnp.asarray(d_sigma, jnp.float32)
    m_rows = jnp.asarray(update_mask, jnp.float32)

    def body(x, xs):
        t_f, ds_f, m_f = xs       # [F] each
        xb = jnp.concatenate([x, x], axis=0) if use_cfg else x
        tb = jnp.broadcast_to(t_f[None], (xb.shape[0], t_f.shape[0]))
        v = wan_dit_forward(dit_params, dit_cfg, xb, tb, ctx,
                            rope_cos, rope_sin, attn_backend=attn_backend)
        pred = cfg_combine(v[:b], v[b:], g, jnp.asarray(False)) if use_cfg \
            else v
        step = (ds_f * m_f)[None, None, :, None, None]
        return x + pred * step, None

    x, _ = jax.lax.scan(body, latents.astype(jnp.float32),
                        (t_rows, ds_rows, m_rows))
    return x
