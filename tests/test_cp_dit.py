"""End-to-end context-parallel DiT forward: tokens sequence-sharded over a
'cp' mesh axis with ring self-attention must match the single-device run."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from wan2gp_tpu.ops.rope import build_rope_3d

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs 4 virtual devices")

CFG = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                   freq_dim=16, text_dim=16, text_len=4)


def test_cp_ring_dit_matches_single():
    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("cp",))
    params = init_wan_dit(jax.random.key(0), CFG, dtype=jnp.float32)
    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                       freq_dim=16, text_dim=16, text_len=4,
                       compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    # grid (4,4,4) -> 64 tokens, sharded 16/device on the frame axis
    lat = jnp.asarray(rng.standard_normal((1, 16, 4, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    t = jnp.full((1,), 500.0)
    cos, sin = build_rope_3d((4, 4, 4), head_dim=cfg.head_dim)

    ref = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                          attn_backend="xla")

    def shard_fwd(params, lat_shard, cos_shard, sin_shard):
        return wan_dit_forward(params, cfg, lat_shard, t, ctx,
                               cos_shard, sin_shard, attn_backend="ring:cp")

    fn = shard_map(shard_fwd, mesh=mesh,
                   in_specs=(P(), P(None, None, "cp"), P("cp"), P("cp")),
                   out_specs=P(None, None, "cp"))
    out = jax.jit(fn)(params, lat, cos, sin)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3,
                               atol=2e-3)
