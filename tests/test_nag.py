"""NAG (negative attention guidance) tests."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward, _nag_combine)
from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                    freq_dim=16, text_dim=16, text_len=4)


def test_nag_combine_identity_when_pos_equals_neg():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 4, 8)), jnp.float32)
    out = _nag_combine(x, x, (4.0, 3.5, 0.5))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5)


def test_nag_changes_forward():
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    o_plain = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                              attn_backend="xla")
    o_nag = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                            attn_backend="xla", context_neg=ctxn,
                            nag=(4.0, 3.5, 0.5))
    assert np.abs(np.asarray(o_plain) - np.asarray(o_nag)).max() > 1e-5
    # nag with identical neg context = plain forward
    o_same = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                             attn_backend="xla", context_neg=ctx,
                             nag=(4.0, 3.5, 0.5))
    np.testing.assert_allclose(np.asarray(o_same), np.asarray(o_plain),
                               rtol=1e-3, atol=1e-3)


def test_nag_pipeline_cfg_free():
    params = init_wan_dit(jax.random.key(0), TINY)
    pipe = WanPipeline(params, TINY, attn_backend="xla")
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    s = SamplingConfig(solver="euler", steps=2, guide_scale=1.0,
                       nag_scale=4.0)
    lat = pipe.generate("x", width=16, height=16, frame_num=1, sampling=s,
                        seed=0, context=ctx, context_null=ctxn,
                        return_latents=True)
    assert np.isfinite(np.asarray(lat)).all()
    # differs from plain CFG-free run
    lat_plain = pipe.generate("x", width=16, height=16, frame_num=1,
                              sampling=SamplingConfig(solver="euler", steps=2,
                                                      guide_scale=1.0),
                              seed=0, context=ctx, context_null=ctxn,
                              return_latents=True)
    assert np.abs(np.asarray(lat) - np.asarray(lat_plain)).max() > 1e-6
