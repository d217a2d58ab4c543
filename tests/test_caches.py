"""TeaCache / MagCache tests: schedule logic + in-scan skip equivalence."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu import caches
from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward, time_embedding_vec)
from wan2gp_tpu.models.wan.pipeline import (
    WanPipeline, SamplingConfig, denoise_scan)
from wan2gp_tpu.schedulers import make_schedule
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=32, text_len=8)


def test_magcache_interp_length():
    table = caches.MAGCACHE_DEF_RATIOS["t2v_1.3B"]
    r = caches.magcache_interp_ratios(table, 30)
    assert r.shape == (30, 2)
    assert r[0, 0] == 1.0 and r[0, 1] == 1.0   # prepended identity step
    r50 = caches.magcache_interp_ratios(table, 50)
    assert r50.shape == (50, 2)


def test_magcache_schedule_properties():
    table = caches.MAGCACHE_DEF_RATIOS["t2v_14B"]
    ratios = caches.magcache_interp_ratios(table, 40)
    sched = caches.magcache_schedule(ratios, thresh=0.1, K=2, start_step=2)
    assert sched[:3].all()                      # start steps always calc
    assert sched.sum() < 40                     # some steps skipped
    # never more than K consecutive skips
    run = 0
    for s in sched:
        run = 0 if s else run + 1
        assert run <= 2


def test_magcache_auto_threshold_hits_target():
    table = caches.MAGCACHE_DEF_RATIOS["t2v_1.3B"]
    ratios = caches.magcache_interp_ratios(table, 50)
    t = caches.magcache_auto_threshold(ratios, speed_factor=1.5)
    sched = caches.magcache_schedule(ratios, t)
    assert abs(int(sched.sum()) - int(50 / 1.5)) <= 4


def test_teacache_schedule_from_smooth_embeddings():
    """Synthetic smooth time-embedding trajectory with realistic (~2-5%)
    step-to-step rel-L1 distances (random-init weights give unrealistically
    large distances, trained models don't)."""
    rng = np.random.default_rng(0)
    base = rng.standard_normal((1, 64)) + 3.0
    step = rng.standard_normal((1, 64)) * 0.08
    e_list = [base + i * step for i in range(20)]
    coeffs = caches.TEACACHE_COEFFICIENTS["t2v_1.3B"]
    thresh = caches.teacache_auto_threshold(e_list, coeffs, 1.5)
    sched = caches.teacache_schedule(e_list, coeffs, thresh)
    assert sched[0] and sched[-1]               # first/last always calc
    assert 0 < sched.sum() < 20
    assert abs(int(sched.sum()) - int(20 / 1.5)) <= 3


def test_time_embedding_vec_matches_forward_path():
    params = init_wan_dit(jax.random.key(0), TINY)
    e = time_embedding_vec(params, TINY, jnp.asarray([500.0]))
    assert e.shape == (1, TINY.dim)
    assert np.isfinite(np.asarray(e)).all()


def test_skip_scan_matches_manual_residual_reuse():
    """A skipped step must reproduce exactly: v = head(x_tokens + residual)."""
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)

    l_tok = 2 * 4 * 4
    res0 = jnp.zeros((1, l_tok, TINY.dim), jnp.float32)
    out1, res1 = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                                 attn_backend="xla",
                                 skip_state=(jnp.asarray(True), res0))
    # residual stored; skipped second call must equal calc call on same input
    out_skip, res2 = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                                     attn_backend="xla",
                                     skip_state=(jnp.asarray(False), res1))
    np.testing.assert_allclose(np.asarray(out_skip), np.asarray(out1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(res1), np.asarray(res2))


def test_denoise_scan_with_skip_schedule_runs():
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=TINY.head_dim)
    sched = make_schedule("unipc", 4, shift=5.0)
    sampling = SamplingConfig(solver="unipc", steps=4, guide_scale=3.0)
    skip = np.array([True, True, False, True])
    out = denoise_scan(params, TINY, sched, lat, ctx, ctxn, sampling,
                       cos, sin, attn_backend="xla", skip_schedule=skip)
    assert np.isfinite(np.asarray(out)).all()
    # all-calc schedule must equal no-schedule run
    out_all = denoise_scan(params, TINY, sched, lat, ctx, ctxn, sampling,
                           cos, sin, attn_backend="xla",
                           skip_schedule=np.ones(4, bool))
    out_ref = denoise_scan(params, TINY, sched, lat, ctx, ctxn, sampling,
                           cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out_all), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
