"""First-block cache tests."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=3,
                    freq_dim=16, text_dim=16, text_len=4)


def test_fbc_reuses_tail_on_identical_input():
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    l_tok = 4
    sig0 = jnp.zeros((1, l_tok, TINY.dim), jnp.float32)
    tail0 = jnp.zeros((1, l_tok, TINY.dim), jnp.float32)

    ref = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                          attn_backend="xla")
    # first call must compute (allow_skip False)
    o1, (sig1, tail1) = wan_dit_forward(
        params, TINY, lat, t, ctx, cos, sin, attn_backend="xla",
        fbc_state=(sig0, tail0, jnp.asarray(False)))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
    # identical input with skip allowed: signature matches -> tail reused,
    # output identical
    o2, (sig2, tail2) = wan_dit_forward(
        params, TINY, lat, t, ctx, cos, sin, attn_backend="xla",
        fbc_state=(sig1, tail1, jnp.asarray(True)), fbc_threshold=0.08)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(tail2), np.asarray(tail1))


def test_fbc_recomputes_on_changed_input():
    params = init_wan_dit(jax.random.key(1), TINY)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    lat2 = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    sig0 = jnp.zeros((1, 4, TINY.dim), jnp.float32)
    tail0 = jnp.zeros((1, 4, TINY.dim), jnp.float32)
    o1, st1 = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                              attn_backend="xla",
                              fbc_state=(sig0, tail0, jnp.asarray(False)))
    o2, _ = wan_dit_forward(params, TINY, lat2, t, ctx, cos, sin,
                            attn_backend="xla",
                            fbc_state=(*st1, jnp.asarray(True)),
                            fbc_threshold=0.001)
    ref2 = wan_dit_forward(params, TINY, lat2, t, ctx, cos, sin,
                           attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(ref2), rtol=1e-4,
                               atol=1e-4)


def test_fbc_pipeline_scan_matches_nocache_when_never_skipping():
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
    from wan2gp_tpu.schedulers.base import make_schedule
    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=3,
                       freq_dim=16, text_dim=16, text_len=4,
                       compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(2), cfg)
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctx_n = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=cfg.head_dim)
    sched = make_schedule("unipc", 6, 5.0)
    base = SamplingConfig(solver="unipc", steps=6, guide_scale=3.0)
    ref = denoise_scan(params, cfg, sched, lat, ctx, ctx_n, base, cos, sin,
                       attn_backend="xla")
    # threshold so large the rel-L1 never exceeds it -> every step after the
    # first would skip; with cache_start_step past the end, never skips
    never = dataclasses_replace(base, cache_type="fbc", cache_threshold=1e-9)
    got = denoise_scan(params, cfg, sched, lat, ctx, ctx_n, never, cos, sin,
                       attn_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
    # huge threshold -> steps 1.. reuse the cached tail; still finite and
    # different from the exact result
    always = dataclasses_replace(base, cache_type="fbc", cache_threshold=1e9)
    got2 = denoise_scan(params, cfg, sched, lat, ctx, ctx_n, always, cos, sin,
                        attn_backend="xla")
    assert np.isfinite(np.asarray(got2)).all()


def dataclasses_replace(cfg, **kw):
    import dataclasses
    return dataclasses.replace(cfg, **kw)
