"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
from wan2gp_tpu.schedulers import make_schedule
from wan2gp_tpu.ops.rope import build_rope_3d
from wan2gp_tpu.parallel import (
    make_mesh, default_axis_sizes, shard_wan_dit_params, dit_data_shardings)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                   freq_dim=32, text_dim=32, text_len=8)


def test_default_axis_sizes():
    s = default_axis_sizes(8, num_heads=12)
    assert s["dp"] * s["cp"] * s["tp"] == 8
    assert 12 % s["tp"] == 0
    assert default_axis_sizes(1)["tp"] == 1


def test_sharded_forward_matches_single_device():
    mesh = make_mesh({"dp": 2, "cp": 2, "tp": 2})
    params = init_wan_dit(jax.random.key(0), CFG)
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((2, 16, 2, 8, 8)), jnp.float32)
    t = jnp.full((2,), 500.0)
    ctx = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=CFG.head_dim)

    ref = wan_dit_forward(params, CFG, latents, t, ctx, cos, sin,
                          attn_backend="xla")

    sharded = shard_wan_dit_params(params, mesh)
    lat_s, t_s, ctx_s = dit_data_shardings(mesh)
    fwd = jax.jit(lambda p, x, tt, c: wan_dit_forward(
        p, CFG, x, tt, c, cos, sin, attn_backend="xla"))
    out = fwd(sharded, jax.device_put(latents, lat_s),
              jax.device_put(t, t_s), jax.device_put(ctx, ctx_s))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-2,
                               atol=2e-2)


def test_sharded_denoise_scan_compiles():
    mesh = make_mesh({"dp": 2, "cp": 2, "tp": 2})
    params = shard_wan_dit_params(init_wan_dit(jax.random.key(1), CFG), mesh)
    rng = np.random.default_rng(1)
    latents = jnp.asarray(rng.standard_normal((2, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((2, 8, 32)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=CFG.head_dim)
    sched = make_schedule("unipc", 2, shift=5.0)
    sampling = SamplingConfig(solver="unipc", steps=2, guide_scale=3.0)
    lat_s, _, ctx_s = dit_data_shardings(mesh)
    out = jax.jit(lambda p, x, c, cn: denoise_scan(
        p, CFG, sched, x, c, cn, sampling, cos, sin, attn_backend="xla"))(
        params, jax.device_put(latents, lat_s), jax.device_put(ctx, ctx_s),
        jax.device_put(ctxn, ctx_s))
    assert np.isfinite(np.asarray(out)).all()
