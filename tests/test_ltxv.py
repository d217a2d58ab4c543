"""LTX-Video family tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.ltxv.dit import (
    LTXVConfig, init_ltxv, ltxv_forward, ltxv_rope, make_indices_grid)
from wan2gp_tpu.models.ltxv.pipeline import (
    LTXVPipeline, LTXVSamplingConfig, ltxv_schedule,
    linear_quadratic_schedule)

TINY = LTXVConfig(inner_dim=48, num_heads=4, num_layers=2, in_channels=16,
                  out_channels=16, caption_channels=32,
                  cross_attention_dim=48)


def test_rope_shapes_and_padding():
    grid = make_indices_grid(2, 3, 4)
    cos, sin = ltxv_rope(grid, TINY)
    assert cos.shape == (24, 48)
    # 48 % 6 == 0 -> no identity padding
    cfg50 = LTXVConfig(inner_dim=50, num_heads=2, num_layers=1,
                       in_channels=4, caption_channels=8,
                       cross_attention_dim=50)
    cos50, sin50 = ltxv_rope(grid, cfg50)
    assert cos50.shape == (24, 50)
    np.testing.assert_allclose(np.asarray(cos50[:, :2]), 1.0)  # pad cols
    np.testing.assert_allclose(np.asarray(sin50[:, :2]), 0.0)


def test_schedules():
    s = ltxv_schedule(8, num_tokens=2048, terminal=0.1)
    assert s[0] == pytest.approx(1.0) and s[-1] == 0.0
    assert s[-2] == pytest.approx(0.1, abs=1e-6)   # terminal stretch
    assert np.all(np.diff(s) < 0)
    d = linear_quadratic_schedule(8)
    assert d[0] == pytest.approx(1.0) and d[-1] == pytest.approx(0.0)
    assert np.all(np.diff(d) < 0)


def test_forward_shapes_and_stg_mask():
    params = init_ltxv(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((1, 24, 16)), jnp.float32)
    cap = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    cos, sin = ltxv_rope(make_indices_grid(2, 3, 4), TINY)
    t = jnp.asarray([500.0])
    out = ltxv_forward(params, TINY, tokens, t, cap, cos, sin,
                       attn_backend="xla")
    assert out.shape == (1, 24, 16)
    mask = jnp.asarray([1.0, 0.0])
    out_skip = ltxv_forward(params, TINY, tokens, t, cap, cos, sin,
                            skip_layer_mask=mask, attn_backend="xla")
    assert np.abs(np.asarray(out) - np.asarray(out_skip)).max() > 1e-6


def test_pipeline_cfg_and_stg():
    params = init_ltxv(jax.random.key(1), TINY)
    pipe = LTXVPipeline(params, TINY, vae_stride=(8, 8, 8),
                        attn_backend="xla")
    rng = np.random.default_rng(1)
    cap = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    capn = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    lat = pipe.generate(width=16, height=16, frame_num=9, seed=0,
                        sampling=LTXVSamplingConfig(
                            steps=2, guide_scale=3.0, stg_scale=1.0,
                            stg_layers=(1,)),
                        caption=cap, caption_null=capn, return_latents=True)
    assert lat.shape == (1, 2, 2, 2, 16)
    assert np.isfinite(np.asarray(lat)).all()


def test_ltxv_checkpoint_roundtrip():
    from wan2gp_tpu.io.ltxv_checkpoint import load_ltxv_params
    params = init_ltxv(jax.random.key(8), TINY, jnp.float32)

    sd = {}

    def put_lin(name, p, i=None):
        g = (lambda x: np.asarray(x[i], np.float32)) if i is not None \
            else (lambda x: np.asarray(x, np.float32))
        sd[f"{name}.weight"] = g(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = g(p["b"])

    put_lin("patchify_proj", params["patchify_proj"])
    put_lin("adaln_single.emb.timestep_embedder.linear_1",
            params["adaln"]["emb"]["in"])
    put_lin("adaln_single.emb.timestep_embedder.linear_2",
            params["adaln"]["emb"]["out"])
    put_lin("adaln_single.linear", params["adaln"]["linear"])
    put_lin("caption_projection.linear_1",
            params["caption_projection"]["fc1"])
    put_lin("caption_projection.linear_2",
            params["caption_projection"]["fc2"])
    sd["scale_shift_table"] = np.asarray(params["scale_shift_table"],
                                         np.float32)
    put_lin("proj_out", params["proj_out"])
    bp = params["blocks"]
    for i in range(TINY.num_layers):
        pre = f"transformer_blocks.{i}"
        for a in ("attn1", "attn2"):
            for m, nm in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                          ("o", "to_out.0")):
                put_lin(f"{pre}.{a}.{nm}", bp[a][m], i)
            sd[f"{pre}.{a}.q_norm.weight"] = np.asarray(bp[a]["norm_q"][i])
            sd[f"{pre}.{a}.k_norm.weight"] = np.asarray(bp[a]["norm_k"][i])
        put_lin(f"{pre}.ff.net.0.proj", bp["ff1"], i)
        put_lin(f"{pre}.ff.net.2", bp["ff2"], i)
        sd[f"{pre}.scale_shift_table"] = np.asarray(
            bp["scale_shift_table"][i], np.float32)

    loaded, left = load_ltxv_params(sd, TINY, dtype=jnp.float32)
    assert left == []
    rng = np.random.default_rng(8)
    grid = make_indices_grid(2, 3, 4)
    cos, sin = ltxv_rope(grid, TINY)
    tokens = jnp.asarray(rng.standard_normal((1, 24, TINY.in_channels)),
                         jnp.float32)
    cap = jnp.asarray(rng.standard_normal((1, 5, TINY.caption_channels)),
                      jnp.float32)
    t = jnp.asarray([400.0])
    o1 = ltxv_forward(params, TINY, tokens, t, cap, cos, sin,
                      attn_backend="xla")
    o2 = ltxv_forward(loaded, TINY, tokens, t, cap, cos, sin,
                      attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)
