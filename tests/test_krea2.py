"""Krea2 MMDiT tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.krea2.dit import (
    Krea2Config, init_krea2, krea2_forward, prepare_context,
    prepare_timestep, build_krea2_rope, pack_image, unpack_image)
from wan2gp_tpu.models.krea2.pipeline import (
    Krea2Pipeline, Krea2SamplingConfig, krea2_timesteps)

TINY = Krea2Config(features=64, tdim=16, txtdim=32, heads=4, kvheads=2,
                   multiplier=2, layers=2, patch=2, channels=4,
                   txtlayers=3, txtheads=2, txtkvheads=2,
                   seq_multiple=8, compute_dtype=jnp.float32)


def _inputs(b=1, l_txt=5, h_tok=4, w_tok=4, seed=0):
    rng = np.random.default_rng(seed)
    img = jnp.asarray(rng.standard_normal(
        (b, h_tok * w_tok, TINY.channels * TINY.patch ** 2)), jnp.float32)
    ctx_raw = jnp.asarray(rng.standard_normal(
        (b, l_txt, TINY.txtlayers, TINY.txtdim)), jnp.float32)
    mask = jnp.asarray(np.tile([1, 1, 1, 0, 0], (b, 1)), jnp.int32)
    return img, ctx_raw, mask


def test_config_derived_dims():
    cfg = Krea2Config()
    assert cfg.head_dim == 128
    assert cfg.axes_dim == (32, 48, 48)            # config json axes_dims_rope
    assert cfg.mlp_dim == 16384                    # intermediate_size
    assert cfg.txt_mlp_dim == 6912                 # text_intermediate_size


def test_timesteps_match_reference_formula():
    # numpy mirror of krea2_main.py:45-51 with x1/x2 from :348-349
    import math
    seq_len, steps, align = 4096, 8, 16
    x1, x2 = (256 // align) ** 2, (1280 // align) ** 2
    ts = np.linspace(1, 0, steps + 1)
    slope = (1.15 - 0.5) / (x2 - x1)
    mu = slope * seq_len + (0.5 - slope * x1)
    with np.errstate(divide="ignore"):
        expect = math.exp(mu) / (math.exp(mu) + (1.0 / ts - 1.0))
    expect[-1] = 0.0
    got = krea2_timesteps(seq_len, steps, align)
    np.testing.assert_allclose(got, expect, rtol=1e-12)
    assert got[0] > 0.99 and got[-1] == 0.0


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 4, 8, 6)), jnp.float32)
    tok = pack_image(x, 2)
    assert tok.shape == (2, 4 * 3, 4 * 4)
    back = unpack_image(tok, 8, 6, 2, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_forward_shapes_and_finite():
    params = init_krea2(jax.random.key(0), TINY)
    img, ctx_raw, mask = _inputs()
    fused = prepare_context(params, TINY, ctx_raw, mask,
                            attn_backend="xla")
    assert fused.shape == (1, 5, TINY.features)
    # masked positions zeroed
    assert np.abs(np.asarray(fused[:, 3:])).max() == 0.0
    pad_to = 5 + 16 + ((-(5 + 16)) % TINY.seq_multiple)
    cos, sin = build_krea2_rope(5, 4, 4, TINY, pad_to)
    out = krea2_forward(params, TINY, img, fused,
                        jnp.asarray([0.7]), cos, sin, mask,
                        attn_backend="xla")
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_padded_text_does_not_leak():
    """Changing raw context at masked positions must not change output."""
    params = init_krea2(jax.random.key(1), TINY)
    img, ctx_raw, mask = _inputs(seed=1)
    pad_to = 5 + 16 + ((-(5 + 16)) % TINY.seq_multiple)
    cos, sin = build_krea2_rope(5, 4, 4, TINY, pad_to)

    def run(ctx):
        fused = prepare_context(params, TINY, ctx, mask,
                                attn_backend="xla")
        return krea2_forward(params, TINY, img, fused,
                             jnp.asarray([0.5]), cos, sin, mask,
                             attn_backend="xla")

    out1 = run(ctx_raw)
    ctx2 = ctx_raw.at[:, 4].set(99.0)   # masked position
    out2 = run(ctx2)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               rtol=1e-5, atol=1e-5)


def test_gqa_matches_explicit_repeat():
    """kvheads < heads must equal a model with kv weights pre-repeated."""
    import dataclasses
    params = init_krea2(jax.random.key(2), TINY)
    img, ctx_raw, mask = _inputs(seed=2)
    pad_to = 5 + 16 + ((-(5 + 16)) % TINY.seq_multiple)
    cos, sin = build_krea2_rope(5, 4, 4, TINY, pad_to)
    fused = prepare_context(params, TINY, ctx_raw, mask, attn_backend="xla")
    out = krea2_forward(params, TINY, img, fused, jnp.asarray([0.5]),
                        cos, sin, mask, attn_backend="xla")

    cfg_mha = dataclasses.replace(TINY, kvheads=TINY.heads)
    hd = TINY.head_dim
    p2 = jax.tree.map(lambda x: x, params)

    def rep_kv(w):  # [din, kvh*hd] -> [din, h*hd] repeating head groups
        din = w.shape[0]
        wk = w.reshape(din, TINY.kvheads, hd)
        return jnp.repeat(wk, TINY.heads // TINY.kvheads, axis=1
                          ).reshape(din, TINY.heads * hd)

    p2["blocks"]["attn"]["wk"]["w"] = jax.vmap(rep_kv)(
        params["blocks"]["attn"]["wk"]["w"])
    p2["blocks"]["attn"]["wv"]["w"] = jax.vmap(rep_kv)(
        params["blocks"]["attn"]["wv"]["w"])
    out2 = krea2_forward(p2, cfg_mha, img, fused, jnp.asarray([0.5]),
                         cos, sin, mask, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_generate_cfg():
    params = init_krea2(jax.random.key(3), TINY)

    def enc(prompts):
        rng = np.random.default_rng(len(prompts[0]))
        ctx = jnp.asarray(rng.standard_normal(
            (len(prompts), 5, TINY.txtlayers, TINY.txtdim)), jnp.float32)
        return ctx, jnp.ones((len(prompts), 5), jnp.int32)

    pipe = Krea2Pipeline(params, TINY, text_encode_fn=enc,
                         attn_backend="xla")
    z = pipe.generate("a cat", "blurry", width=64, height=64,
                      sampling=Krea2SamplingConfig(steps=2, guidance=2.0),
                      seed=0, return_latents=True)
    assert z.shape == (1, TINY.channels, 8, 8)
    assert np.isfinite(np.asarray(z)).all()
    # guidance 0 -> single stream, still works
    z2 = pipe.generate("a cat", width=64, height=64,
                       sampling=Krea2SamplingConfig(steps=2, guidance=0.0),
                       seed=0, return_latents=True)
    assert np.isfinite(np.asarray(z2)).all()
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_timestep_modulation_broadcast():
    params = init_krea2(jax.random.key(4), TINY)
    tvec, modvec = prepare_timestep(params, TINY, jnp.asarray([0.3, 0.9]))
    assert tvec.shape == (2, TINY.features)
    assert modvec.shape == (2, 6 * TINY.features)


def test_krea2_checkpoint_roundtrip():
    """Torch-layout state dict -> loader -> forward parity with init path."""
    from wan2gp_tpu.io.krea2_checkpoint import load_krea2_params
    params = init_krea2(jax.random.key(5), TINY)

    def to_sd(params):
        sd = {}
        hd = TINY.head_dim

        def put_lin(name, p):
            sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
            if "b" in p:
                sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

        def put_attn(pre, p, i=None):
            g = (lambda x: np.asarray(x[i])) if i is not None \
                else (lambda x: np.asarray(x))
            for m in ("wq", "wk", "wv", "gate", "wo"):
                sd[f"{pre}.{m}.weight"] = g(p[m]["w"]).astype(np.float32).T
            sd[f"{pre}.qknorm.qnorm.scale"] = g(p["qnorm"]).astype(np.float32)
            sd[f"{pre}.qknorm.knorm.scale"] = g(p["knorm"]).astype(np.float32)

        def put_mlp(pre, p, i=None):
            g = (lambda x: np.asarray(x[i])) if i is not None \
                else (lambda x: np.asarray(x))
            for m in ("gate", "up", "down"):
                sd[f"{pre}.{m}.weight"] = g(p[m]["w"]).astype(np.float32).T

        put_lin("model.diffusion_model.first", params["first"])
        put_lin("tmlp.0", params["tmlp"]["fc1"])
        put_lin("tmlp.2", params["tmlp"]["fc2"])
        put_lin("tproj.1", params["tproj"])
        put_lin("txtfusion.projector", params["txtfusion"]["projector"])
        sd["txtmlp.0.scale"] = np.asarray(params["txtmlp"]["norm"])
        put_lin("txtmlp.1", params["txtmlp"]["fc1"])
        put_lin("txtmlp.3", params["txtmlp"]["fc2"])
        sd["last.norm.scale"] = np.asarray(params["last"]["norm"])
        put_lin("last.linear", params["last"]["linear"])
        sd["last.modulation.lin"] = np.asarray(params["last"]["mod"])
        for which, n in (("layerwise_blocks", "layerwise"),
                         ("refiner_blocks", "refiner")):
            fp = params["txtfusion"][n]
            for i in range(TINY.n_fusion_blocks):
                pre = f"txtfusion.{which}.{i}"
                sd[f"{pre}.prenorm.scale"] = np.asarray(fp["prenorm"][i])
                sd[f"{pre}.postnorm.scale"] = np.asarray(fp["postnorm"][i])
                put_attn(f"{pre}.attn", fp["attn"], i)
                put_mlp(f"{pre}.mlp", fp["mlp"], i)
        bp = params["blocks"]
        for i in range(TINY.layers):
            pre = f"blocks.{i}"
            sd[f"{pre}.mod.lin"] = np.asarray(bp["mod"][i])
            sd[f"{pre}.prenorm.scale"] = np.asarray(bp["prenorm"][i])
            sd[f"{pre}.postnorm.scale"] = np.asarray(bp["postnorm"][i])
            put_attn(f"{pre}.attn", bp["attn"], i)
            put_mlp(f"{pre}.mlp", bp["mlp"], i)
        return sd

    sd = to_sd(params)
    loaded, left = load_krea2_params(sd, TINY, dtype=jnp.float32)
    assert left == []

    img, ctx_raw, mask = _inputs(seed=5)
    pad_to = 5 + 16 + ((-(5 + 16)) % TINY.seq_multiple)
    cos, sin = build_krea2_rope(5, 4, 4, TINY, pad_to)
    fused = prepare_context(params, TINY, ctx_raw, mask, attn_backend="xla")
    fused2 = prepare_context(loaded, TINY, ctx_raw, mask, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(fused2), np.asarray(fused),
                               rtol=1e-5, atol=1e-5)
    o1 = krea2_forward(params, TINY, img, fused, jnp.asarray([0.4]),
                       cos, sin, mask, attn_backend="xla")
    o2 = krea2_forward(loaded, TINY, img, fused2, jnp.asarray([0.4]),
                       cos, sin, mask, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_krea2_handler_registry():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "krea2_raw" in handlers and "krea2_turbo" in handlers
    assert handlers["krea2_turbo"].default_settings(
        "krea2_turbo")["num_inference_steps"] == 8
    assert handlers["krea2_raw"].default_settings(
        "krea2_raw")["guidance_scale"] == 3.5
