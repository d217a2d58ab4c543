"""Sub-parallel window denoising tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                    freq_dim=16, text_dim=16, text_len=4)


def _pipe():
    return WanPipeline(init_wan_dit(jax.random.key(0), TINY), TINY,
                       attn_backend="xla")


def test_plan_sub_parallel():
    pipe = _pipe()
    windows, win, ov = pipe.plan_sub_parallel(8, window_frames=21,
                                              overlap_frames=5)
    assert win == 6 and ov == 2
    assert windows[0] == (0, 6)
    assert windows[-1][1] == 8
    # uniform window length
    assert all(e - s == win for s, e in windows)


def test_sub_parallel_denoise_runs_and_covers():
    pipe = _pipe()
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 8, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    s = SamplingConfig(solver="euler", steps=2, guide_scale=2.0)
    out = pipe.denoise_sub_parallel(lat, ctx, ctxn, s, window_frames=21,
                                    overlap_frames=5)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()
    # every frame was denoised (changed from the input noise)
    diff = np.abs(np.asarray(out) - np.asarray(lat)).mean(axis=(0, 1, 3, 4))
    assert (diff > 1e-4).all()


def test_sub_parallel_single_window_matches_plain():
    """One window covering everything must equal the plain denoise."""
    pipe = _pipe()
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 4, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    s = SamplingConfig(solver="euler", steps=2, guide_scale=1.0)
    out_sp = pipe.denoise_sub_parallel(lat, ctx, ctx, s,
                                       window_frames=13, overlap_frames=0)
    out_plain = pipe.denoise(lat, ctx, ctx, s, width=64, height=64)
    np.testing.assert_allclose(np.asarray(out_sp), np.asarray(out_plain),
                               rtol=2e-3, atol=2e-3)
