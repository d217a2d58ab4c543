"""unfuse_fused_linears numerics: the unfused tensor-parallel layout
(parallel/sharding.py) must be bit-equivalent to the fused forward —
it is the same matmuls split on column/row boundaries.

Covers Flux (FLUX.1 gelu + FLUX.2 SwiGLU single/double blocks) and
Hunyuan (double + single blocks), fp32 single-device (no mesh)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.parallel import unfuse_fused_linears


def test_flux1_unfuse_forward_identity():
    from wan2gp_tpu.models.flux.dit import FluxConfig, init_flux, \
        flux_forward, make_img_ids, rope_from_ids
    cfg = FluxConfig(in_channels=16, out_channels=16, vec_in_dim=8,
                     context_in_dim=12, hidden_size=32, mlp_ratio=2.0,
                     num_heads=2, depth=2, depth_single_blocks=2,
                     axes_dim=(4, 6, 6), compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, 12)), jnp.float32)
    vec = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ids = np.concatenate([np.zeros((4, 3)), make_img_ids(4, 4)], axis=0)
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)

    ref = flux_forward(params, cfg, img, txt, vec, t, cos, sin,
                       attn_backend="xla")
    p2 = dict(params)
    for n in ("double_blocks", "single_blocks"):
        p2[n] = unfuse_fused_linears(p2[n], cfg.hidden_size, swiglu=False)
    got = flux_forward(p2, cfg, img, txt, vec, t, cos, sin,
                       attn_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_flux2_swiglu_unfuse_forward_identity():
    from wan2gp_tpu.models.flux.dit import (FluxConfig, init_flux,
                                            flux_forward, make_ids_flux2,
                                            rope_from_ids)
    cfg = FluxConfig(hidden_size=32, num_heads=2, depth=2,
                     depth_single_blocks=2, axes_dim=(4, 4, 4, 4),
                     in_channels=16, out_channels=16, vec_in_dim=1,
                     context_in_dim=12, mlp_ratio=3.0, qkv_bias=False,
                     guidance_embed=False, flux2=True,
                     compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(1), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, 12)), jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    ids = make_ids_flux2(4, 4, 4)
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)

    ref = flux_forward(params, cfg, img, txt, None, t, cos, sin,
                       attn_backend="xla")
    p2 = dict(params)
    for n in ("double_blocks", "single_blocks"):
        p2[n] = unfuse_fused_linears(p2[n], cfg.hidden_size, swiglu=True)
    got = flux_forward(p2, cfg, img, txt, None, t, cos, sin,
                       attn_backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hunyuan_unfuse_forward_identity():
    from wan2gp_tpu.models.hyvideo.dit import (HunyuanConfig, init_hunyuan,
                                               hunyuan_forward,
                                               build_hunyuan_rope)
    cfg = HunyuanConfig(hidden_size=32, heads_num=2,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                        rope_dim_list=(4, 6, 6), text_states_dim=12,
                        text_states_dim_2=8, guidance_embed=False,
                        compute_dtype=jnp.float32)
    params = init_hunyuan(jax.random.key(2), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_channels, 3, 4, 4)),
                      jnp.float32)
    states = jnp.asarray(rng.standard_normal((1, 5, 12)), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    pooled = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    cos, sin = build_hunyuan_rope((3, 2, 2), cfg.rope_dim_list, 5)

    kw = dict(text_pooled=pooled, rope_cos=cos, rope_sin=sin,
              attn_backend="xla")
    ref = hunyuan_forward(params, cfg, lat, jnp.asarray([500.0]), states,
                          mask, **kw)
    p2 = dict(params)
    for n in ("double_blocks", "single_blocks"):
        p2[n] = unfuse_fused_linears(p2[n], cfg.hidden_size)
    got = hunyuan_forward(p2, cfg, lat, jnp.asarray([500.0]), states,
                          mask, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unfuse_quantized_int8_leaves():
    """w_q/scale leaves split on the output dim; dequant matmul parity."""
    from wan2gp_tpu.parallel.sharding import _split_linear_cols, \
        _split_linear_rows
    rng = np.random.default_rng(3)
    h = 8
    p = {"w_q": jnp.asarray(rng.integers(-127, 127, (2, h, 3 * h)),
                            jnp.int8),
         "scale": jnp.asarray(rng.random((2, 3 * h)), jnp.float32),
         "b": jnp.asarray(rng.random((2, 3 * h)), jnp.float32)}
    q, k, v = _split_linear_cols(p, [(0, h), (h, 2 * h), (2 * h, 3 * h)])
    w_full = np.asarray(p["w_q"], np.float32) * np.asarray(p["scale"])[:, None]
    w_q = np.asarray(q["w_q"], np.float32) * np.asarray(q["scale"])[:, None]
    np.testing.assert_allclose(w_q, w_full[..., :h])
    assert k["b"].shape == (2, h) and v["w_q"].shape == (2, h, h)

    # row split: bias once, per-output scale duplicated
    p2 = {"w": jnp.asarray(rng.random((2, 3 * h, h)), jnp.float32),
          "b": jnp.asarray(rng.random((2, h)), jnp.float32)}
    a, m = _split_linear_rows(p2, [(0, h), (h, 3 * h)])
    x = rng.random((4, 3 * h)).astype(np.float32)
    full = x @ np.asarray(p2["w"][0]) + np.asarray(p2["b"][0])
    split = (x[:, :h] @ np.asarray(a["w"][0]) + np.asarray(a["b"][0])
             + x[:, h:] @ np.asarray(m["w"][0]))
    assert "b" not in m
    np.testing.assert_allclose(split, full, rtol=1e-5, atol=1e-5)
