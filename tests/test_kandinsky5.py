"""Kandinsky 5 DiT + pipeline tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.kandinsky5.dit import (
    Kandinsky5Config, init_kandinsky5, kandinsky5_forward,
    kandinsky_time_embed, build_kandinsky_rope, patchify_k5, unpatchify_k5)
from wan2gp_tpu.models.kandinsky5.pipeline import (
    Kandinsky5Pipeline, Kandinsky5SamplingConfig, kandinsky_schedule)

TINY = Kandinsky5Config(in_visual_dim=4, out_visual_dim=4, in_text_dim=24,
                        in_text_dim2=12, time_dim=16, model_dim=32,
                        ff_dim=64, num_text_blocks=1, num_visual_blocks=2,
                        axes_dims=(4, 6, 6), visual_cond=True,
                        compute_dtype=jnp.float32)


def test_config_dims():
    cfg = Kandinsky5Config()
    assert cfg.head_dim == 64                    # sum axes (16,24,24)
    assert cfg.visual_embed_dim == 33            # 2*16+1 with visual_cond


def test_schedule_matches_reference_transform():
    # generation_utils.py:175: t' = s*t/(1+(s-1)t) on linspace(1,0,N+1)
    ts = kandinsky_schedule(4, 10.0)
    lin = np.linspace(1, 0, 5)
    np.testing.assert_allclose(ts, 10 * lin / (1 + 9 * lin), rtol=1e-12)
    assert ts[0] == 1.0 and ts[-1] == 0.0


def test_patchify_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 2, 4, 6, 4)), jnp.float32)
    tok = patchify_k5(x, (1, 2, 2))
    assert tok.shape == (1, 2 * 2 * 3, 1 * 2 * 2 * 4)


def test_unpatchify_shape():
    rng = np.random.default_rng(1)
    tok = jnp.asarray(rng.standard_normal((1, 2 * 2 * 3, 4 * 4)),
                      jnp.float32)
    x = unpatchify_k5(tok, (2, 2, 3), (1, 2, 2), 4)
    assert x.shape == (1, 2, 4, 6, 4)


def test_forward_shapes_and_zero_init_modulation():
    params = init_kandinsky5(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    grid = (2, 2, 2)
    l_vis = 8
    tokens = jnp.asarray(rng.standard_normal(
        (1, l_vis, int(np.prod(TINY.patch_size)) * TINY.visual_embed_dim)),
        jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, TINY.in_text_dim)),
                       jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, TINY.in_text_dim2)),
                         jnp.float32)
    vis_rope, txt_rope = build_kandinsky_rope(grid, 5, TINY)
    te = kandinsky_time_embed(params, TINY, jnp.asarray([0.5]), pooled)
    assert te.shape == (1, TINY.time_dim)
    out = kandinsky5_forward(params, TINY, tokens, text, te,
                             vis_rope, txt_rope, attn_backend="xla")
    assert out.shape == (1, l_vis,
                         int(np.prod(TINY.patch_size)) * TINY.out_visual_dim)
    assert np.isfinite(np.asarray(out)).all()
    # zero-init modulation: time embedding must not affect output at init
    # via gates... gates are zero -> attn/ff contributions are gated off,
    # so output == out_layer(ln(visual_embeddings(tokens)))
    te2 = kandinsky_time_embed(params, TINY, jnp.asarray([0.9]), pooled)
    out2 = kandinsky5_forward(params, TINY, tokens, text, te2,
                              vis_rope, txt_rope, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=1e-5)


def _enc(prompts):
    rng = np.random.default_rng(len(prompts[0]))
    return (jnp.asarray(rng.standard_normal((len(prompts), 5,
                                             TINY.in_text_dim)), jnp.float32),
            jnp.asarray(rng.standard_normal((len(prompts),
                                             TINY.in_text_dim2)),
                        jnp.float32))


def test_pipeline_t2v():
    params = init_kandinsky5(jax.random.key(1), TINY)
    # randomize the modulation weights so gates actually fire
    params = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.key(9), x.shape,
                                               x.dtype)
        if x.ndim >= 2 else x, params)
    pipe = Kandinsky5Pipeline(params, TINY, text_encode_fn=_enc,
                              attn_backend="xla")
    z = pipe.generate("a cat", "bad", width=32, height=32, frame_num=5,
                      sampling=Kandinsky5SamplingConfig(steps=2,
                                                        guidance=3.0),
                      seed=0, return_latents=True)
    assert z.shape == (1, 2, 4, 4, TINY.in_visual_dim)
    assert np.isfinite(np.asarray(z)).all()


def test_pipeline_i2v_pins_first_frame():
    params = init_kandinsky5(jax.random.key(2), TINY)
    pipe = Kandinsky5Pipeline(params, TINY, text_encode_fn=_enc,
                              attn_backend="xla")
    rng = np.random.default_rng(3)
    first = jnp.asarray(rng.standard_normal((1, 1, 4, 4, TINY.in_visual_dim)),
                        jnp.float32)
    ff = jnp.broadcast_to(first, (1, 2, 4, 4, TINY.in_visual_dim))
    z = pipe.generate("a dog", width=32, height=32, frame_num=5,
                      sampling=Kandinsky5SamplingConfig(steps=2,
                                                        guidance=1.0),
                      seed=1, first_frame=ff, return_latents=True)
    np.testing.assert_allclose(np.asarray(z[:, 0]), np.asarray(first[:, 0]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(z[:, 1]), np.asarray(ff[:, 1]))


def test_kandinsky_checkpoint_roundtrip():
    from wan2gp_tpu.io.kandinsky_checkpoint import load_kandinsky5_params
    params = init_kandinsky5(jax.random.key(4), TINY)
    # randomize zero-init modulation so parity is meaningful
    params["visual_blocks"]["mod"]["w"] = 0.01 * jax.random.normal(
        jax.random.key(5), params["visual_blocks"]["mod"]["w"].shape)
    params["text_blocks"]["mod"]["w"] = 0.01 * jax.random.normal(
        jax.random.key(6), params["text_blocks"]["mod"]["w"].shape)

    sd = {}

    def put_lin(name, p, i=None):
        g = (lambda x: np.asarray(x[i], np.float32)) if i is not None \
            else (lambda x: np.asarray(x, np.float32))
        sd[f"{name}.weight"] = g(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = g(p["b"])

    def put_attn(pre, p, i):
        for m, nm in (("q", "to_query"), ("k", "to_key"), ("v", "to_value"),
                      ("o", "out_layer")):
            put_lin(f"{pre}.{nm}", p[m], i)
        sd[f"{pre}.query_norm.weight"] = np.asarray(p["q_norm"][i])
        sd[f"{pre}.key_norm.weight"] = np.asarray(p["k_norm"][i])

    put_lin("time_embeddings.in_layer", params["time_embeddings"]["in"])
    put_lin("time_embeddings.out_layer", params["time_embeddings"]["out"])
    put_lin("text_embeddings.in_layer", params["text_embeddings"]["lin"])
    sd["text_embeddings.norm.weight"] = np.asarray(
        params["text_embeddings"]["ln_w"])
    sd["text_embeddings.norm.bias"] = np.asarray(
        params["text_embeddings"]["ln_b"])
    put_lin("pooled_text_embeddings.in_layer",
            params["pooled_text_embeddings"]["lin"])
    sd["pooled_text_embeddings.norm.weight"] = np.asarray(
        params["pooled_text_embeddings"]["ln_w"])
    sd["pooled_text_embeddings.norm.bias"] = np.asarray(
        params["pooled_text_embeddings"]["ln_b"])
    put_lin("visual_embeddings.in_layer", params["visual_embeddings"])
    put_lin("out_layer.modulation.out_layer", params["out_layer"]["mod"])
    put_lin("out_layer.out_layer", params["out_layer"]["lin"])
    for i in range(TINY.num_text_blocks):
        pre = f"text_transformer_blocks.{i}"
        put_lin(f"{pre}.text_modulation.out_layer",
                params["text_blocks"]["mod"], i)
        put_attn(f"{pre}.self_attention", params["text_blocks"]["attn"], i)
        put_lin(f"{pre}.feed_forward.in_layer",
                params["text_blocks"]["ff"]["in"], i)
        put_lin(f"{pre}.feed_forward.out_layer",
                params["text_blocks"]["ff"]["out"], i)
    for i in range(TINY.num_visual_blocks):
        pre = f"visual_transformer_blocks.{i}"
        put_lin(f"{pre}.visual_modulation.out_layer",
                params["visual_blocks"]["mod"], i)
        put_attn(f"{pre}.self_attention",
                 params["visual_blocks"]["self_attn"], i)
        put_attn(f"{pre}.cross_attention",
                 params["visual_blocks"]["cross_attn"], i)
        put_lin(f"{pre}.feed_forward.in_layer",
                params["visual_blocks"]["ff"]["in"], i)
        put_lin(f"{pre}.feed_forward.out_layer",
                params["visual_blocks"]["ff"]["out"], i)

    loaded, left = load_kandinsky5_params(sd, TINY, dtype=jnp.float32)
    assert left == []

    rng = np.random.default_rng(5)
    tokens = jnp.asarray(rng.standard_normal(
        (1, 8, int(np.prod(TINY.patch_size)) * TINY.visual_embed_dim)),
        jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, TINY.in_text_dim)),
                       jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((1, TINY.in_text_dim2)),
                         jnp.float32)
    vis_rope, txt_rope = build_kandinsky_rope((2, 2, 2), 5, TINY)
    te1 = kandinsky_time_embed(params, TINY, jnp.asarray([0.3]), pooled)
    te2 = kandinsky_time_embed(loaded, TINY, jnp.asarray([0.3]), pooled)
    np.testing.assert_allclose(np.asarray(te2), np.asarray(te1), atol=1e-5)
    o1 = kandinsky5_forward(params, TINY, tokens, text, te1,
                            vis_rope, txt_rope, attn_backend="xla")
    o2 = kandinsky5_forward(loaded, TINY, tokens, text, te2,
                            vis_rope, txt_rope, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_kandinsky_handler_registry():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    for t in ("k5_lite_t2v", "k5_lite_i2v", "k5_pro_t2v", "k5_pro_i2v"):
        assert t in handlers
    cfg = handlers["k5_pro_t2v"].dit_config("k5_pro_t2v")
    assert cfg.model_dim == 4096 and cfg.num_visual_blocks == 60
