"""Z-Image transformer + sampler tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.zimage.dit import (
    ZImageConfig, init_zimage, zimage_forward, build_zimage_rope,
    patchify_zimage, unpatchify_zimage, zimage_t_embedding)
from wan2gp_tpu.models.zimage.pipeline import (
    ZImagePipeline, ZImageSamplingConfig, zimage_schedule, unified_t_grid)

TINY = ZImageConfig(dim=48, n_layers=2, n_refiner_layers=1, n_heads=3,
                    in_channels=4, cap_feat_dim=24, adaln_dim=32,
                    t_mid_dim=16, seq_multiple=8, axes_dim=(4, 6, 6),
                    compute_dtype=jnp.float32)


def _setup(h_tok=3, w_tok=3, cap_len=5, seed=0):
    rng = np.random.default_rng(seed)
    l_img = h_tok * w_tok
    img_pad = (-l_img) % TINY.seq_multiple
    cap_pad = (-cap_len) % TINY.seq_multiple
    tokens = jnp.asarray(rng.standard_normal(
        (1, l_img + img_pad, TINY.patch ** 2 * TINY.in_channels)),
        jnp.float32)
    cap = jnp.asarray(rng.standard_normal(
        (1, cap_len + cap_pad, TINY.cap_feat_dim)), jnp.float32)
    ropes = build_zimage_rope(cap_len + cap_pad, h_tok, w_tok, TINY)
    return tokens, cap, ropes, l_img, cap_len


def test_head_dim_matches_axes():
    cfg = ZImageConfig()
    assert cfg.head_dim == sum(cfg.axes_dim) == 128
    assert cfg.ffn_dim == int(3840 / 3 * 8)


def test_forward_shapes():
    params = init_zimage(jax.random.key(0), TINY)
    tokens, cap, (xr, cr, ur), l_img, cap_len = _setup()
    out = zimage_forward(params, TINY, tokens, cap, jnp.asarray([0.3]),
                         xr, cr, ur, cap_len, img_len=l_img,
                         attn_backend="xla")
    assert out.shape == tokens.shape
    assert np.isfinite(np.asarray(out)).all()


def test_pad_tokens_mask_input():
    """Padded img/cap rows are replaced by learned pad tokens, so their raw
    values must not affect the real-token outputs."""
    params = init_zimage(jax.random.key(1), TINY)
    tokens, cap, (xr, cr, ur), l_img, cap_len = _setup(seed=1)
    t = jnp.asarray([0.6])
    out1 = zimage_forward(params, TINY, tokens, cap, t, xr, cr, ur,
                          cap_len, img_len=l_img, attn_backend="xla")
    tokens2 = tokens.at[:, l_img:].set(123.0)
    cap2 = cap.at[:, cap_len:].set(-55.0)
    out2 = zimage_forward(params, TINY, tokens2, cap2, t, xr, cr, ur,
                          cap_len, img_len=l_img, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out1[:, :l_img]),
                               np.asarray(out2[:, :l_img]),
                               rtol=1e-5, atol=1e-5)


def test_target_timestep_changes_embedding():
    params = init_zimage(jax.random.key(2), TINY)
    t = jnp.asarray([0.5])
    e1 = zimage_t_embedding(params, TINY, t)
    e2 = zimage_t_embedding(params, TINY, t, target_t=jnp.asarray([0.0]))
    e3 = zimage_t_embedding(params, TINY, t, target_t=jnp.asarray([0.5]))
    assert not np.allclose(np.asarray(e1), np.asarray(e2))
    # target == t -> delta is zero -> identical to no target
    np.testing.assert_allclose(np.asarray(e3), np.asarray(e1), atol=1e-6)


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 6, 8)), jnp.float32)
    tok = patchify_zimage(x, 2)
    assert tok.shape == (2, 3 * 4, 16)
    back = unpatchify_zimage(tok, 6, 8, 2, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_unified_grid_matches_reference():
    # pipeline_z_image.py:690-703 with presets :149-153
    for steps, solver, gap1, style in [(2, "unified", 0.6, "few"),
                                       (4, "unified", 0.5, "any"),
                                       (8, "unified", 0.0, "mul")]:
        ts, got_style = unified_t_grid(steps, solver)
        assert got_style == style
        num = steps + (1 if gap1 == 0.0 else 0)
        t = np.linspace(0.001, 1.0 - gap1, num)
        if gap1 == 0.0:
            t = t[:-1]
        expect = np.concatenate([1.0 - t, [0.0]])
        np.testing.assert_allclose(ts, expect, atol=1e-12)
        assert ts[0] == 0.999 and ts[-1] == 0.0


def test_schedule_shape():
    s = zimage_schedule(30, 4096)
    assert len(s) == 31 and s[0] > 0.9 and s[-1] == 0.0
    assert (np.diff(s) < 0).all()


def _pipe(seed=3):
    params = init_zimage(jax.random.key(seed), TINY)

    def enc(prompts):
        rng = np.random.default_rng(len(prompts[0]))
        return jnp.asarray(rng.standard_normal(
            (len(prompts), 5, TINY.cap_feat_dim)), jnp.float32)

    return ZImagePipeline(params, TINY, text_encode_fn=enc,
                          attn_backend="xla")


def test_pipeline_euler_cfg():
    pipe = _pipe()
    z = pipe.generate("a cat", "ugly", width=48, height=48,
                      sampling=ZImageSamplingConfig(
                          steps=2, guidance=3.0, solver="default"),
                      seed=0, return_latents=True)
    assert z.shape == (1, TINY.in_channels, 6, 6)
    assert np.isfinite(np.asarray(z)).all()


def test_pipeline_unified_turbo():
    pipe = _pipe(seed=4)
    z = pipe.generate("a dog", width=48, height=48,
                      sampling=ZImageSamplingConfig(
                          steps=2, guidance=0.0, solver="unified"),
                      seed=1, return_latents=True)
    assert z.shape == (1, TINY.in_channels, 6, 6)
    assert np.isfinite(np.asarray(z)).all()
    z2 = pipe.generate("a dog", width=48, height=48,
                       sampling=ZImageSamplingConfig(
                           steps=8, guidance=0.0, solver="unified"),
                       seed=1, return_latents=True)
    assert np.isfinite(np.asarray(z2)).all()


def test_zimage_checkpoint_roundtrip():
    from wan2gp_tpu.io.zimage_checkpoint import load_zimage_params
    params = init_zimage(jax.random.key(7), TINY)

    def to_sd(params):
        sd = {}

        def put_lin(name, p):
            sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
            if "b" in p:
                sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

        def put_block(pre, bp, i, modulated):
            g = lambda x: np.asarray(x[i], np.float32)
            put_lin(f"{pre}.attention.to_q", {"w": bp["to_q"]["w"][i]})
            put_lin(f"{pre}.attention.to_k", {"w": bp["to_k"]["w"][i]})
            put_lin(f"{pre}.attention.to_v", {"w": bp["to_v"]["w"][i]})
            put_lin(f"{pre}.attention.to_out.0", {"w": bp["to_out"]["w"][i]})
            sd[f"{pre}.attention.norm_q.weight"] = g(bp["norm_q"])
            sd[f"{pre}.attention.norm_k.weight"] = g(bp["norm_k"])
            for n in ("attention_norm1", "attention_norm2",
                      "ffn_norm1", "ffn_norm2"):
                sd[f"{pre}.{n}.weight"] = g(bp[n])
            for n in ("w1", "w2", "w3"):
                put_lin(f"{pre}.feed_forward.{n}", {"w": bp[n]["w"][i]})
            if modulated:
                put_lin(f"{pre}.adaLN_modulation.0",
                        {"w": bp["adaln"]["w"][i], "b": bp["adaln"]["b"][i]})

        put_lin("all_x_embedder.2-1", params["x_embedder"])
        sd["cap_embedder.0.weight"] = np.asarray(
            params["cap_embedder"]["norm"], np.float32)
        put_lin("cap_embedder.1", params["cap_embedder"]["lin"])
        put_lin("t_embedder.mlp.0", params["t_embedder"]["fc1"])
        put_lin("t_embedder.mlp.2", params["t_embedder"]["fc2"])
        sd["x_pad_token"] = np.asarray(params["x_pad_token"],
                                       np.float32)[None]
        sd["cap_pad_token"] = np.asarray(params["cap_pad_token"],
                                         np.float32)[None]
        put_lin("all_final_layer.2-1.linear", params["final"]["linear"])
        put_lin("all_final_layer.2-1.adaLN_modulation.1",
                params["final"]["adaln"])
        for i in range(TINY.n_refiner_layers):
            put_block(f"noise_refiner.{i}", params["noise_refiner"], i, True)
            put_block(f"context_refiner.{i}", params["context_refiner"],
                      i, False)
        for i in range(TINY.n_layers):
            put_block(f"layers.{i}", params["layers"], i, True)
        return sd

    loaded, left = load_zimage_params(to_sd(params), TINY, dtype=jnp.float32)
    assert left == []
    tokens, cap, (xr, cr, ur), l_img, cap_len = _setup(seed=7)
    t = jnp.asarray([0.4])
    o1 = zimage_forward(params, TINY, tokens, cap, t, xr, cr, ur,
                        cap_len, img_len=l_img, attn_backend="xla")
    o2 = zimage_forward(loaded, TINY, tokens, cap, t, xr, cr, ur,
                        cap_len, img_len=l_img, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_zimage_handler_registry():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "z_image" in handlers and "z_image_base" in handlers
    d = handlers["z_image"].default_settings("z_image")
    assert d["num_inference_steps"] == 8 and d["sample_solver"] == "unified"


# -- control branch ---------------------------------------------------------

def test_zimage_control_forward_and_pipeline():
    from wan2gp_tpu.models.zimage.dit import (ZImageConfig, init_zimage,
                                              zimage_forward,
                                              build_zimage_rope,
                                              patchify_zimage)
    import jax
    cfg = ZImageConfig(dim=48, n_layers=4, n_refiner_layers=1,
                       n_heads=4, in_channels=4, cap_feat_dim=16,
                       axes_dim=(4, 4, 4), adaln_dim=32, t_mid_dim=24,
                       seq_multiple=4, control=True, control_in_dim=4,
                       n_control_refiner=1, compute_dtype=jnp.float32)
    assert cfg.control_places == (0, 2)
    params = init_zimage(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    h_tok = w_tok = 4
    l_img = 16
    toks = jnp.asarray(rng.normal(size=(1, l_img, 4 * 4)), jnp.float32)
    cap = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    x_rope, cap_rope, uni_rope = build_zimage_rope(8, h_tok, w_tok, cfg)
    t = jnp.asarray([0.5])
    base = zimage_forward(params, cfg, toks, cap, t, x_rope, cap_rope,
                          uni_rope, cap_len=8, img_len=l_img)
    ctrl = jnp.asarray(rng.normal(size=(1, l_img, 4 * 4)), jnp.float32)
    # zero-init projections -> control is inert at init (reference
    # nn.init.zeros_ on before/after_proj, :273-278)
    out = zimage_forward(params, cfg, toks, cap, t, x_rope, cap_rope,
                         uni_rope, cap_len=8, img_len=l_img,
                         control_tokens=ctrl)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=1e-5)
    # non-zero after_proj steers the output, scaled by control_scale
    params["control_layers"]["after_proj"]["w"] = jax.random.normal(
        jax.random.key(1), params["control_layers"]["after_proj"]["w"].shape,
        jnp.float32) * 0.05
    o1 = zimage_forward(params, cfg, toks, cap, t, x_rope, cap_rope,
                        uni_rope, cap_len=8, img_len=l_img,
                        control_tokens=ctrl, control_scale=0.75)
    assert np.abs(np.asarray(o1) - np.asarray(base)).max() > 1e-5
    o0 = zimage_forward(params, cfg, toks, cap, t, x_rope, cap_rope,
                        uni_rope, cap_len=8, img_len=l_img,
                        control_tokens=ctrl, control_scale=0.0)
    np.testing.assert_allclose(np.asarray(o0), np.asarray(base),
                               atol=1e-5)
    # pipeline e2e with a control latent
    from wan2gp_tpu.models.zimage.pipeline import (ZImagePipeline,
                                                   ZImageSamplingConfig)
    pipe = ZImagePipeline(params, cfg, attn_backend="xla")
    ctx = jnp.asarray(rng.normal(size=(1, 8, 16)), jnp.float32)
    ctrl_lat = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    z = pipe.generate("", sampling=ZImageSamplingConfig(
        steps=2, guidance=0.0, solver="default"),
        width=64, height=64, context=ctx, return_latents=True,
        control_latent=ctrl_lat, control_scale=0.75)
    assert z.shape == (1, 4, 8, 8)
    assert np.isfinite(np.asarray(z)).all()
