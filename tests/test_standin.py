"""StandIn identity preservation (reference model.py:125,1215-1219,
1781-1789,1945-1947; any2video.py:1072-1088)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                       wan_dit_forward)
from wan2gp_tpu.models.wan.standin import (
    build_standin_ref_rope, init_standin_loras, load_standin_module_params)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=48, text_len=16,
                    compute_dtype=jnp.float32)


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 4, 8, 8)),
                      jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    cos, sin = build_rope_3d((4, 4, 4), head_dim=cfg.head_dim)
    st = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 1, 4, 4)),
                     jnp.float32)
    rcos, rsin = build_standin_ref_rope((4, 4), (2, 2),
                                        head_dim=cfg.head_dim)
    return lat, ctx, cos, sin, st, rcos, rsin


def test_standin_ref_rope_offsets():
    """Reference positions sit beyond the video extent on h/w axes
    (any2video.py:1086) -> ref tables differ from every video position."""
    vcos, _ = build_rope_3d((1, 4, 4), head_dim=32)
    rcos, _ = build_standin_ref_rope((4, 4), (2, 2), head_dim=32)
    assert rcos.shape == (4, 16)
    v = np.asarray(vcos)
    for row in np.asarray(rcos):
        assert not any(np.allclose(row, vr, atol=1e-9) for vr in v)


def test_standin_lora_zero_init_noop():
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    lat, ctx, cos, sin, st, rcos, rsin = _inputs(cfg)
    t = jnp.full((1,), 500.0)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    # up zero-init (model.py LoRALinearLayer:140) -> loras are no-ops,
    # but the ref kv STILL feeds self-attention, so output must differ
    params["standin_loras"] = init_standin_loras(
        jax.random.key(1), cfg.dim, cfg.num_layers, rank=8, zero_up=True)
    o = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                        attn_backend="xla", standin=(st, rcos, rsin))
    assert o.shape == base.shape
    assert not np.allclose(np.asarray(o), np.asarray(base))
    assert np.isfinite(np.asarray(o)).all()


def test_standin_lora_changes_output():
    cfg = TINY
    params = init_wan_dit(jax.random.key(2), cfg, jnp.float32)
    lat, ctx, cos, sin, st, rcos, rsin = _inputs(cfg, seed=1)
    t = jnp.full((1,), 500.0)
    params["standin_loras"] = init_standin_loras(
        jax.random.key(3), cfg.dim, cfg.num_layers, rank=8, zero_up=True)
    o_zero = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                             attn_backend="xla", standin=(st, rcos, rsin))
    params["standin_loras"] = init_standin_loras(
        jax.random.key(3), cfg.dim, cfg.num_layers, rank=8, zero_up=False)
    o_lora = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                             attn_backend="xla", standin=(st, rcos, rsin))
    assert not np.allclose(np.asarray(o_zero), np.asarray(o_lora))
    # different reference image -> different output (identity signal flows)
    o_ref2 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                             attn_backend="xla",
                             standin=(st * -1.0, rcos, rsin))
    assert not np.allclose(np.asarray(o_lora), np.asarray(o_ref2))


def test_standin_module_loader_roundtrip():
    cfg = TINY
    loras = init_standin_loras(jax.random.key(4), cfg.dim,
                               cfg.num_layers, rank=8, zero_up=False)
    sd = {}
    for i in range(cfg.num_layers):
        for m in ("q", "k", "v"):
            sd[f"blocks.{i}.self_attn.{m}_loras.down.weight"] = \
                np.asarray(loras[m]["down"]["w"][i]).T
            sd[f"blocks.{i}.self_attn.{m}_loras.up.weight"] = \
                np.asarray(loras[m]["up"]["w"][i]).T
    loaded, left = load_standin_module_params(sd, cfg.num_layers,
                                              jnp.float32)
    assert left == []
    np.testing.assert_allclose(np.asarray(loaded["v"]["up"]["w"]),
                               np.asarray(loras["v"]["up"]["w"]),
                               atol=1e-6)


def test_standin_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(5), cfg, jnp.float32)
    params["standin_loras"] = init_standin_loras(
        jax.random.key(6), cfg.dim, cfg.num_layers, rank=8, zero_up=False)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(7), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="standin")
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ref = rng.standard_normal((32, 32, 3)).astype(np.float32).clip(-1, 1)
    lat = pipe.generate_standin(
        "", ref_image=ref, width=64, height=64, frame_num=9,
        sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
