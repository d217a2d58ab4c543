"""Diffusion forcing tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.diffusion_forcing import (
    generate_timestep_matrix, df_sigma_tables, df_denoise_scan)
from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                    freq_dim=16, text_dim=16, text_len=4)


def test_timestep_matrix_properties():
    template = np.array([934, 862, 756, 603, 410, 250, 140, 74])
    rows, idx, mask = generate_timestep_matrix(6, template, 6, ar_step=2)
    assert rows.shape == idx.shape == mask.shape
    assert rows.shape[1] == 6
    # first row starts frame 0 at the first template step
    assert idx[0, 0] == 1
    # staggering: later frames lag earlier ones
    assert (idx[:, 0] >= idx[:, -1]).all()
    # every frame eventually reaches the end
    assert (idx[-1] >= len(template)).all()
    # monotone per-frame progress
    assert (np.diff(idx, axis=0) >= 0).all()


def test_timestep_matrix_pre_ready_and_blocks():
    template = np.array([934, 603, 250])
    rows, idx, mask = generate_timestep_matrix(
        8, template, 8, ar_step=1, num_pre_ready=4, causal_block_size=2)
    assert rows.shape[1] == 8
    # pre-ready frames never update
    assert not mask[:, :4].any()


def test_sigma_tables():
    template = np.array([934, 603, 250])
    rows, idx, mask = generate_timestep_matrix(4, template, 4, ar_step=1)
    t_cur, d_sigma = df_sigma_tables(template, idx)
    assert t_cur.shape == idx.shape
    assert (d_sigma <= 0).all()    # sigma decreases toward 0


def test_df_denoise_scan_runs():
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 4, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((4, 4, 4), head_dim=TINY.head_dim)
    template = np.array([934, 603, 250])
    rows, idx, mask = generate_timestep_matrix(4, template, 4, ar_step=1)
    t_cur, d_sigma = df_sigma_tables(template, idx)
    out = df_denoise_scan(params, TINY, lat, ctx, ctxn, cos, sin,
                          t_cur, d_sigma, mask, guide_scale=3.0,
                          attn_backend="xla")
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()
