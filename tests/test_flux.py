"""Flux family tests on tiny configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.flux.dit import (
    FluxConfig, init_flux, flux_forward, rope_from_ids, make_img_ids,
    pack_latent, unpack_latent, timestep_embedding)
from wan2gp_tpu.models.flux.vae import (
    FluxVAEConfig, init_flux_vae, flux_vae_encode, flux_vae_decode)
from wan2gp_tpu.models.flux.clip import (
    ClipTextConfig, init_clip_text, clip_text_encode)
from wan2gp_tpu.models.flux.pipeline import (
    FluxPipeline, FluxSamplingConfig, flux_schedule)

TINY = FluxConfig(in_channels=64, out_channels=64, vec_in_dim=16,
                  context_in_dim=32, hidden_size=64, mlp_ratio=2.0,
                  num_heads=4, depth=2, depth_single_blocks=2,
                  axes_dim=(4, 6, 6))


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 16, 8, 12)), jnp.float32)
    packed = pack_latent(x)
    assert packed.shape == (2, 4 * 6, 64)
    back = unpack_latent(packed, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_flux_schedule_shift():
    ts = flux_schedule(4, 4096, shift=True)
    assert ts[0] == pytest.approx(1.0) and ts[-1] == 0.0
    # mu at 4096 tokens = max_shift -> exp(1.15)/(exp(1.15)+1/t-1)
    mu = 1.15
    expected = np.exp(mu) / (np.exp(mu) + (1 / 0.75 - 1))
    assert ts[1] == pytest.approx(expected, rel=1e-6)
    ts_ns = flux_schedule(4, 4096, shift=False)
    np.testing.assert_allclose(ts_ns, [1.0, 0.75, 0.5, 0.25, 0.0])


def test_timestep_embedding_shape():
    e = timestep_embedding(jnp.asarray([0.5]), 256)
    assert e.shape == (1, 256)
    # t=0 -> cos(0)=1, sin(0)=0
    e0 = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    np.testing.assert_allclose(e0, [[1, 1, 1, 1, 0, 0, 0, 0]], atol=1e-6)


def test_flux_forward_shapes():
    params = init_flux(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    h_tok, w_tok, txt_len = 4, 4, 8
    img = jnp.asarray(rng.standard_normal((1, h_tok * w_tok, 64)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, txt_len, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    ids = np.concatenate([np.zeros((txt_len, 3)), make_img_ids(h_tok, w_tok)])
    cos, sin = rope_from_ids(ids, TINY.axes_dim, TINY.theta)
    out = flux_forward(params, TINY, img, txt, y, jnp.asarray([0.5]),
                       cos, sin, attn_backend="xla")
    assert out.shape == (1, 16, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_flux_guidance_embed_branch():
    cfg = FluxConfig(in_channels=64, out_channels=64, vec_in_dim=16,
                     context_in_dim=32, hidden_size=64, mlp_ratio=2.0,
                     num_heads=4, depth=1, depth_single_blocks=1,
                     axes_dim=(4, 6, 6), guidance_embed=True)
    params = init_flux(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    ids = np.concatenate([np.zeros((4, 3)), make_img_ids(4, 4)])
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    o1 = flux_forward(params, cfg, img, txt, y, jnp.asarray([0.5]), cos, sin,
                      guidance=jnp.asarray([1.0]), attn_backend="xla")
    o2 = flux_forward(params, cfg, img, txt, y, jnp.asarray([0.5]), cos, sin,
                      guidance=jnp.asarray([5.0]), attn_backend="xla")
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-5


def test_flux_vae_roundtrip_shapes():
    cfg = FluxVAEConfig(ch=16, ch_mult=(1, 2, 2), num_res_blocks=1,
                        z_channels=4)
    params = init_flux_vae(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)), jnp.float32)
    z = flux_vae_encode(params, cfg, img)
    assert z.shape == (1, 8, 8, 4)
    out = flux_vae_decode(params, cfg, z)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_clip_text_encoder():
    cfg = ClipTextConfig(vocab_size=100, dim=32, num_heads=4, num_layers=2,
                         mlp_dim=64, max_len=16, eos_token_id=99)
    params = init_clip_text(jax.random.key(0), cfg)
    ids = jnp.asarray([[5, 7, 99, 99, 99, 99, 99, 99]], jnp.int32)
    hidden, pooled = clip_text_encode(params, cfg, ids)
    assert hidden.shape == (1, 8, 32) and pooled.shape == (1, 32)
    # causal: changing a later token must not affect earlier hidden states
    ids2 = ids.at[0, 5].set(42)
    h2, _ = clip_text_encode(params, cfg, ids2)
    np.testing.assert_allclose(np.asarray(hidden[:, :5]),
                               np.asarray(h2[:, :5]), atol=1e-5)
    # pooled = hidden at first EOT position (index 2)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[:, 2]),
                               atol=1e-6)


def test_flux_pipeline_end_to_end_tiny():
    dit_params = init_flux(jax.random.key(0), TINY)
    vae_cfg = FluxVAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                            z_channels=16)  # 3 downsamples -> factor 8
    vae_params = init_flux_vae(jax.random.key(1), vae_cfg)
    pipe = FluxPipeline(dit_params, TINY, vae_params, vae_cfg,
                        attn_backend="xla")
    rng = np.random.default_rng(3)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    img = pipe.generate(width=32, height=32,
                        sampling=FluxSamplingConfig(steps=2),
                        context=ctx, vec_y=y)
    assert img.shape == (32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_flux_handler_text_encoders(tmp_path):
    """T5 + CLIP text-encoder wiring through the flux family handler."""
    import numpy as np
    import jax.numpy as jnp
    from wan2gp_tpu.families.flux import FluxFamilyHandler
    from wan2gp_tpu.io.safetensors_reader import save_safetensors
    from wan2gp_tpu.models.flux.clip import ClipTextConfig

    rng = np.random.default_rng(0)
    t5_kw = dict(vocab_size=64, dim=16, dim_attn=16, dim_ffn=32,
                 num_heads=2, num_layers=2, shared_pos=True)
    sd = {"shared.weight": rng.standard_normal((64, 16)).astype(np.float32),
          "encoder.final_layer_norm.weight": np.ones(16, np.float32),
          "encoder.block.0.layer.0.SelfAttention.relative_attention_bias."
          "weight": rng.standard_normal((32, 2)).astype(np.float32) * 0.05}
    for i in range(2):
        pre = f"encoder.block.{i}"
        for m in ("q", "k", "v", "o"):
            sd[f"{pre}.layer.0.SelfAttention.{m}.weight"] = \
                rng.standard_normal((16, 16)).astype(np.float32) * 0.05
        sd[f"{pre}.layer.0.layer_norm.weight"] = np.ones(16, np.float32)
        sd[f"{pre}.layer.1.layer_norm.weight"] = np.ones(16, np.float32)
        for w, shape in (("wi_0", (32, 16)), ("wi_1", (32, 16)),
                         ("wo", (16, 32))):
            sd[f"{pre}.layer.1.DenseReluDense.{w}.weight"] = \
                rng.standard_normal(shape).astype(np.float32) * 0.05
    t5_path = str(tmp_path / "t5.safetensors")
    save_safetensors(t5_path, sd)

    ccfg = ClipTextConfig(vocab_size=64, dim=8, num_heads=2, num_layers=1,
                          mlp_dim=16, max_len=16, eos_token_id=63)
    csd = {"text_model.embeddings.token_embedding.weight":
           rng.standard_normal((64, 8)).astype(np.float32) * 0.02,
           "text_model.embeddings.position_embedding.weight":
           rng.standard_normal((16, 8)).astype(np.float32) * 0.02,
           "text_model.final_layer_norm.weight": np.ones(8, np.float32),
           "text_model.final_layer_norm.bias": np.zeros(8, np.float32)}
    pre = "text_model.encoder.layers.0"
    for m, (di, do) in (("self_attn.q_proj", (8, 8)),
                        ("self_attn.k_proj", (8, 8)),
                        ("self_attn.v_proj", (8, 8)),
                        ("self_attn.out_proj", (8, 8)),
                        ("mlp.fc1", (8, 16)), ("mlp.fc2", (16, 8))):
        csd[f"{pre}.{m}.weight"] = \
            rng.standard_normal((do, di)).astype(np.float32) * 0.05
        csd[f"{pre}.{m}.bias"] = np.zeros(do, np.float32)
    for ln in ("layer_norm1", "layer_norm2"):
        csd[f"{pre}.{ln}.weight"] = np.ones(8, np.float32)
        csd[f"{pre}.{ln}.bias"] = np.zeros(8, np.float32)
    clip_path = str(tmp_path / "clip.safetensors")
    save_safetensors(clip_path, csd)

    from wan2gp_tpu.utils.tokenizer import HashTokenizer
    t5_fn, clip_fn = FluxFamilyHandler._load_text_encoders(
        "flux_schnell", {"text_encoder": t5_path, "clip": clip_path},
        HashTokenizer(64), jnp.float32, t5_cfg_kw=t5_kw, clip_cfg=ccfg)
    ctx = t5_fn(["a cat", "a dog"])
    assert ctx.shape == (2, 256, 16)
    assert np.isfinite(np.asarray(ctx)).all()
    # clip closure uses its own tokenizer (HashTokenizer fallback has a
    # larger vocab; indexing clamps in jax, output must still be finite)
    pooled = clip_fn(["a cat"])
    assert pooled.shape == (1, 8)
    assert np.isfinite(np.asarray(pooled)).all()


def test_flux_random_text_encoders_deterministic():
    import numpy as np
    from wan2gp_tpu.families.flux import FluxFamilyHandler
    from wan2gp_tpu.models.flux.dit import FluxConfig
    cfg = FluxConfig(hidden_size=32, num_heads=2, depth=1, depth_single_blocks=1,
                     context_in_dim=16, vec_in_dim=8)
    t5_fn, clip_fn = FluxFamilyHandler._random_text_encoders(cfg, seed=0)
    a = np.asarray(t5_fn(["x"]))
    b = np.asarray(t5_fn(["x"]))
    c = np.asarray(t5_fn(["y"]))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (1, 128, 16)
    assert np.asarray(clip_fn(["x"])).shape == (1, 8)


def test_flux_kontext_generation():
    """Kontext: cond tokens appended with index-1 ids; output slice only."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from wan2gp_tpu.models.flux.dit import FluxConfig, init_flux
    from wan2gp_tpu.models.flux.vae import FluxVAEConfig, init_flux_vae
    from wan2gp_tpu.models.flux.pipeline import (FluxPipeline,
                                                 FluxSamplingConfig)
    cfg = FluxConfig(hidden_size=32, num_heads=2, depth=1,
                     depth_single_blocks=1, context_in_dim=16, vec_in_dim=8,
                     axes_dim=(4, 6, 6), compute_dtype=jnp.float32)
    vcfg = FluxVAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1,
                         z_channels=16)
    params = init_flux(jax.random.key(0), cfg, jnp.float32)
    vae = init_flux_vae(jax.random.key(1), vcfg)
    rng = np.random.default_rng(0)

    def t5(prompts):
        return jnp.asarray(rng.standard_normal((len(prompts), 6, 16)),
                           jnp.float32)

    def clip(prompts):
        return jnp.asarray(rng.standard_normal((len(prompts), 8)),
                           jnp.float32)

    pipe = FluxPipeline(params, cfg, vae, vcfg, t5_encode_fn=t5,
                        clip_encode_fn=clip, attn_backend="xla")
    cond = rng.standard_normal((32, 32, 3)).astype(np.float32) * 0.2
    z = pipe.generate_kontext("make it red", [cond], width=32, height=32,
                              sampling=FluxSamplingConfig(steps=2),
                              seed=0, return_latents=True)
    assert z.shape == (1, 16, 4, 4)
    assert np.isfinite(np.asarray(z)).all()
    # changing the conditioning image must change the output
    cond2 = rng.standard_normal((32, 32, 3)).astype(np.float32) * 0.2
    z2 = pipe.generate_kontext("make it red", [cond2], width=32, height=32,
                               sampling=FluxSamplingConfig(steps=2),
                               seed=0, return_latents=True)
    assert not np.allclose(np.asarray(z), np.asarray(z2))


# ---------------------------------------------------------------------------
# FLUX.2 (klein/dev: SwiGLU, shared modulation, 4-axis rope, z=32)
# ---------------------------------------------------------------------------

def _tiny_flux2():
    from wan2gp_tpu.models.flux.dit import FluxConfig, init_flux
    cfg = FluxConfig(in_channels=16, out_channels=16, vec_in_dim=1,
                     context_in_dim=24, hidden_size=32, mlp_ratio=3.0,
                     num_heads=2, depth=2, depth_single_blocks=2,
                     axes_dim=(4, 4, 4, 4), theta=2000, qkv_bias=False,
                     guidance_embed=False, flux2=True,
                     compute_dtype=jnp.float32)
    return cfg, init_flux(jax.random.key(0), cfg, jnp.float32)


def test_flux2_forward_shapes():
    from wan2gp_tpu.models.flux.dit import (flux_forward, rope_from_ids,
                                            make_ids_flux2)
    cfg, params = _tiny_flux2()
    assert "mod_double_img" in params and "vector_in" not in params
    # bias-free linears
    assert "b" not in params["img_in"]
    img = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 4 * 4, cfg.in_channels)), jnp.float32)
    txt = jnp.zeros((1, 6, cfg.context_in_dim), jnp.float32)
    ids = make_ids_flux2(4, 4, 6)
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    out = flux_forward(params, cfg, img, txt, None,
                       jnp.asarray([0.5]), cos, sin, attn_backend="xla")
    assert out.shape == (1, 16, cfg.out_channels)
    assert np.isfinite(np.asarray(out)).all()


def test_flux2_schedule_matches_reference_formula():
    import math as m
    from wan2gp_tpu.models.flux.dit import get_schedule_flux2
    ts = get_schedule_flux2(10, 1024)
    # reference compute_empirical_mu (sampling.py:476-490), seq <= 4300
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    m200 = a2 * 1024 + b2
    m10 = a1 * 1024 + b1
    a = (m200 - m10) / 190.0
    b = m200 - 200.0 * a
    mu = a * 10 + b
    t = np.linspace(1, 0, 11)
    with np.errstate(divide="ignore"):
        ref = m.exp(mu) / (m.exp(mu) + (1 / t - 1))
    ref[-1] = 0.0
    np.testing.assert_allclose(ts, ref, rtol=1e-6)
    assert ts[0] == 1.0 and ts[-1] == 0.0


def test_flux2_loader_roundtrip():
    import torch
    from wan2gp_tpu.io.flux_checkpoint import load_flux_params
    from wan2gp_tpu.models.flux.dit import (flux_forward, rope_from_ids,
                                            make_ids_flux2)
    cfg, params = _tiny_flux2()

    sd = {}

    def put(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    put("img_in", params["img_in"])
    put("txt_in", params["txt_in"])
    put("time_in.in_layer", params["time_in"]["in"])
    put("time_in.out_layer", params["time_in"]["out"])
    put("double_stream_modulation_img.lin", params["mod_double_img"])
    put("double_stream_modulation_txt.lin", params["mod_double_txt"])
    put("single_stream_modulation.lin", params["mod_single"])
    put("final_layer.adaLN_modulation.1", params["final"]["mod"])
    put("final_layer.linear", params["final"]["linear"])
    for i in range(cfg.depth):
        for name in ("img", "txt"):
            st = params["double_blocks"][name]
            pre = f"double_blocks.{i}.{name}"
            for tgt, src in (("_attn.qkv", "qkv"), ("_attn.proj", "proj"),
                             ("_mlp.0", "mlp1"), ("_mlp.2", "mlp2")):
                put(pre + tgt, jax.tree.map(lambda x: x[i], st[src]))
            sd[f"{pre}_attn.norm.query_norm.scale"] = np.asarray(
                st["norm_q"][i])
            sd[f"{pre}_attn.norm.key_norm.scale"] = np.asarray(
                st["norm_k"][i])
    for i in range(cfg.depth_single_blocks):
        sb = params["single_blocks"]
        pre = f"single_blocks.{i}"
        put(f"{pre}.linear1", jax.tree.map(lambda x: x[i], sb["linear1"]))
        put(f"{pre}.linear2", jax.tree.map(lambda x: x[i], sb["linear2"]))
        sd[f"{pre}.norm.query_norm.scale"] = np.asarray(sb["norm_q"][i])
        sd[f"{pre}.norm.key_norm.scale"] = np.asarray(sb["norm_k"][i])

    loaded, leftover = load_flux_params(sd, cfg, dtype=jnp.float32)
    assert leftover == [], leftover[:5]

    img = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 16, cfg.in_channels)), jnp.float32)
    txt = jnp.zeros((1, 4, cfg.context_in_dim), jnp.float32)
    ids = make_ids_flux2(4, 4, 4)
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    o1 = flux_forward(params, cfg, img, txt, None, jnp.asarray([0.3]),
                      cos, sin, attn_backend="xla")
    o2 = flux_forward(loaded, cfg, img, txt, None, jnp.asarray([0.3]),
                      cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               rtol=1e-5, atol=1e-5)


def test_flux2_klein_handler_generate(monkeypatch):
    from wan2gp_tpu.families import flux as flux_mod
    import wan2gp_tpu.models.flux.dit as fdit
    monkeypatch.setattr(
        fdit, "FLUX2_KLEIN_4B",
        dict(in_channels=16, out_channels=16, vec_in_dim=1,
             context_in_dim=24, hidden_size=32, mlp_ratio=3.0, num_heads=2,
             depth=2, depth_single_blocks=2, axes_dim=(4, 4, 4, 4),
             theta=2000, qkv_bias=False, guidance_embed=False, flux2=True))
    pipe = flux_mod.FluxFamilyHandler.load_model(
        "flux2_klein_4b", {}, init_random=True, attn_backend="xla")
    from wan2gp_tpu.models.flux.pipeline import FluxSamplingConfig
    img = pipe.generate(prompt="a cat", width=64, height=64,
                        sampling=FluxSamplingConfig(steps=2, guidance=1.0),
                        seed=3)
    assert np.asarray(img).shape == (64, 64, 3)
    assert np.isfinite(np.asarray(img)).all()


# -- Chroma -----------------------------------------------------------------

def test_chroma_modulation_layout():
    """344 rows = 3*single + 12*double + 2 final (model.py:61-86,
    413-423); rows vary with both the block index and the timestep."""
    import dataclasses
    from wan2gp_tpu.models.flux.dit import (FluxConfig, init_flux,
                                            chroma_modulations)
    cfg = FluxConfig(in_channels=16, out_channels=16, hidden_size=64,
                     num_heads=4, depth=2, depth_single_blocks=3,
                     context_in_dim=32, axes_dim=(8, 4, 4),
                     chroma=True, compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(0), cfg, jnp.float32)
    assert "time_in" not in params and "mod" not in params["final"]
    s, di, dt_, fin = chroma_modulations(params, cfg,
                                         jnp.asarray([0.5]))
    assert s.shape == (3, 1, 3, 64)
    assert di.shape == (2, 1, 6, 64) and dt_.shape == (2, 1, 6, 64)
    assert fin.shape == (1, 2, 64)
    assert not np.allclose(np.asarray(s[0]), np.asarray(s[1]))
    s2, _, _, _ = chroma_modulations(params, cfg, jnp.asarray([0.9]))
    assert not np.allclose(np.asarray(s), np.asarray(s2))


def test_chroma_forward_and_loader():
    import dataclasses
    from wan2gp_tpu.models.flux.dit import (
        FluxConfig, init_flux, flux_forward, make_img_ids,
        rope_from_ids)
    from wan2gp_tpu.io.flux_checkpoint import load_flux_params
    cfg = FluxConfig(in_channels=16, out_channels=16, hidden_size=64,
                     num_heads=4, depth=2, depth_single_blocks=2,
                     context_in_dim=32, axes_dim=(8, 4, 4),
                     chroma=True, compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(1), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 6, 32)), jnp.float32)
    ids = np.concatenate([np.zeros((6, 3)), make_img_ids(4, 4)])
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    o1 = flux_forward(params, cfg, img, txt, None, jnp.asarray([0.4]),
                      cos, sin, attn_backend="xla")
    assert o1.shape == (1, 16, 16)
    assert np.isfinite(np.asarray(o1)).all()
    # timestep flows only through the distilled modulations
    o2 = flux_forward(params, cfg, img, txt, None, jnp.asarray([0.9]),
                      cos, sin, attn_backend="xla")
    assert not np.allclose(np.asarray(o1), np.asarray(o2))

    # loader roundtrip on the chroma key space
    sd = {}

    def put(prefix, p):
        sd[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    put("img_in", params["img_in"])
    put("txt_in", params["txt_in"])
    dg = params["distilled_guidance"]
    put("distilled_guidance_layer.in_proj", dg["in_proj"])
    put("distilled_guidance_layer.out_proj", dg["out_proj"])
    for i, lp in enumerate(dg["layers"]):
        put(f"distilled_guidance_layer.layers.{i}.in_layer", lp["in"])
        put(f"distilled_guidance_layer.layers.{i}.out_layer", lp["out"])
        sd[f"distilled_guidance_layer.norms.{i}.scale"] = \
            np.asarray(lp["norm"])
    db = params["double_blocks"]
    for i in range(cfg.depth):
        for nm in ("img", "txt"):
            st = db[nm]
            pre = f"double_blocks.{i}.{nm}"
            put(f"{pre}_attn.qkv",
                {"w": st["qkv"]["w"][i], "b": st["qkv"]["b"][i]})
            sd[f"{pre}_attn.norm.query_norm.scale"] = \
                np.asarray(st["norm_q"][i])
            sd[f"{pre}_attn.norm.key_norm.scale"] = \
                np.asarray(st["norm_k"][i])
            put(f"{pre}_attn.proj",
                {"w": st["proj"]["w"][i], "b": st["proj"]["b"][i]})
            put(f"{pre}_mlp.0",
                {"w": st["mlp1"]["w"][i], "b": st["mlp1"]["b"][i]})
            put(f"{pre}_mlp.2",
                {"w": st["mlp2"]["w"][i], "b": st["mlp2"]["b"][i]})
    sb = params["single_blocks"]
    for i in range(cfg.depth_single_blocks):
        pre = f"single_blocks.{i}"
        put(f"{pre}.linear1",
            {"w": sb["linear1"]["w"][i], "b": sb["linear1"]["b"][i]})
        put(f"{pre}.linear2",
            {"w": sb["linear2"]["w"][i], "b": sb["linear2"]["b"][i]})
        sd[f"{pre}.norm.query_norm.scale"] = np.asarray(sb["norm_q"][i])
        sd[f"{pre}.norm.key_norm.scale"] = np.asarray(sb["norm_k"][i])
    put("final_layer.linear", params["final"]["linear"])
    loaded, left = load_flux_params(sd, cfg, jnp.float32)
    assert left == []
    o3 = flux_forward(loaded, cfg, img, txt, None, jnp.asarray([0.4]),
                      cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o3), np.asarray(o1),
                               rtol=2e-4, atol=2e-4)


def test_flux_umo_multi_ref_ids():
    """UMO diagonal ref offsets (sampling.py:816-905): refs at index 0
    offset past the target grid; dreamomni2 per-ref time indices."""
    from wan2gp_tpu.models.flux.dit import make_img_ids
    # emulate the id construction inside generate_kontext pe_mode="d"
    h_tok = w_tok = 4
    h_off, w_off = h_tok, w_tok
    ids1 = make_img_ids(2, 2, index=0)
    ids1[:, 1] += h_off
    ids1[:, 2] += w_off
    assert ids1[:, 0].max() == 0
    assert ids1[:, 1].min() == 4 and ids1[:, 2].min() == 4
    ids2 = make_img_ids(2, 2, index=2)
    assert (ids2[:, 0] == 2).all()


def test_siglip_vs_transformers():
    """SigLIP tower matches HF SiglipVisionModel (tiny geometry)."""
    import torch
    from transformers import SiglipVisionConfig as HFCfg
    from transformers import SiglipVisionModel
    from wan2gp_tpu.models.flux.siglip import (SiglipVisionConfig,
                                               init_siglip,
                                               siglip_forward,
                                               siglip_image_to_patches,
                                               load_siglip_params)
    cfg = SiglipVisionConfig(hidden_size=32, num_layers=3, num_heads=4,
                             mlp_dim=64, patch=8, image_size=32)
    hf = SiglipVisionModel(HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=32, patch_size=8,
        vision_use_head=False)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params, left = load_siglip_params(sd, cfg)
    assert left == [], left[:4]
    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    patches = siglip_image_to_patches(img, cfg)
    last, states = siglip_forward(params, cfg,
                                  jnp.asarray(patches)[None],
                                  collect=(-2,))
    with torch.no_grad():
        px = torch.from_numpy(np.asarray(img)).permute(2, 0, 1)[None]
        ref = hf(pixel_values=px, output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(last),
                               ref.last_hidden_state.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(states[-2 % 4]),
                               ref.hidden_states[-2].numpy(),
                               rtol=2e-3, atol=2e-3)


def test_uso_projector_and_pipeline():
    import torch
    from wan2gp_tpu.models.flux.siglip import (SiglipVisionConfig,
                                               init_siglip,
                                               init_uso_projector,
                                               uso_project,
                                               load_uso_projector)
    # projector oracle vs reference math (layers.py:562-595)
    pp = init_uso_projector(jax.random.key(0), siglip_tokens=9,
                            style_tokens=4, siglip_dim=8,
                            hidden_size=12)
    rng = np.random.default_rng(1)
    states = {2: jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32),
              3: jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32),
              1: jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32)}
    # taps (-2, -11, -20) mod n_states=4 -> (2, 1, 0)... use n_states=4
    states[0] = jnp.asarray(rng.normal(size=(1, 9, 8)), jnp.float32)
    out = uso_project(pp, states, 4)
    assert out.shape == (1, 12, 12)
    h = torch.from_numpy(np.asarray(states[2]))
    mixw = torch.from_numpy(np.asarray(pp["high"]["mix"]["w"]))
    mixb = torch.from_numpy(np.asarray(pp["high"]["mix"]["b"]))
    pw = torch.from_numpy(np.asarray(pp["high"]["proj"]["w"]))
    pb = torch.from_numpy(np.asarray(pp["high"]["proj"]["b"]))
    m = torch.nn.functional.silu(h.transpose(1, 2) @ mixw + mixb
                                 ).transpose(1, 2)
    ref_hi = m @ pw + pb
    np.testing.assert_allclose(np.asarray(out[:, :4]), ref_hi.numpy(),
                               rtol=1e-4, atol=1e-5)
    # loader roundtrip
    sd = {}
    for lvl in ("high", "mid", "low"):
        sd[f"{lvl}_embedding_linear.0.weight"] = np.asarray(
            pp[lvl]["mix"]["w"]).T
        sd[f"{lvl}_embedding_linear.0.bias"] = np.asarray(
            pp[lvl]["mix"]["b"])
        sd[f"{lvl}_projection.weight"] = np.asarray(pp[lvl]["proj"]["w"]).T
        sd[f"{lvl}_projection.bias"] = np.asarray(pp[lvl]["proj"]["b"])
    lp, left = load_uso_projector(sd)
    assert left == []
    np.testing.assert_allclose(np.asarray(uso_project(lp, states, 4)),
                               np.asarray(out), atol=1e-6)
    # end-to-end: style tokens steer a tiny flux pipeline
    from wan2gp_tpu.models.flux.dit import FluxConfig, init_flux
    from wan2gp_tpu.models.flux.pipeline import (FluxPipeline,
                                                 FluxSamplingConfig)
    from wan2gp_tpu.models.flux.vae import FluxVAEConfig, init_flux_vae
    cfg = FluxConfig(in_channels=64, out_channels=64, vec_in_dim=16,
                     context_in_dim=24, hidden_size=48, mlp_ratio=2.0,
                     num_heads=4, depth=1, depth_single_blocks=1,
                     axes_dim=(4, 4, 4), guidance_embed=False,
                     compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(2), cfg, jnp.float32)
    scfg = SiglipVisionConfig(hidden_size=16, num_layers=3, num_heads=2,
                              mlp_dim=32, patch=8, image_size=32)
    sparams = init_siglip(jax.random.key(3), scfg)
    proj = init_uso_projector(jax.random.key(4),
                              siglip_tokens=scfg.tokens,
                              style_tokens=4, siglip_dim=16,
                              hidden_size=48)
    vae_cfg = FluxVAEConfig(ch=8, z_channels=16)
    pipe = FluxPipeline(params, cfg,
                        vae_params=init_flux_vae(jax.random.key(5),
                                                 vae_cfg),
                        vae_cfg=vae_cfg, attn_backend="xla")
    ctx = jnp.asarray(rng.normal(size=(1, 6, 24)), jnp.float32)
    vy = jnp.asarray(rng.normal(size=(1, 16)), jnp.float32)
    style = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    z = pipe.generate_uso(
        "", [style], siglip_params=sparams, siglip_cfg=scfg,
        uso_proj_params=proj, width=32, height=32,
        sampling=FluxSamplingConfig(steps=2, guidance=1.0),
        context=ctx, vec_y=vy, return_latents=True)
    assert z.shape == (1, 16, 4, 4)
    assert np.isfinite(np.asarray(z)).all()


def test_chroma_radiance_head():
    """Pixel-space NeRF head (radiance.py): DCT features, generated
    GLU blocks, zero-init conv output."""
    import torch
    from wan2gp_tpu.models.flux.radiance import (
        RadianceConfig, init_radiance, apply_radiance_head,
        radiance_embed_tokens, dct_pos_features, load_radiance_params)
    cfg = RadianceConfig(patch_size=4, hidden_size=8, mlp_ratio=2,
                         depth=2, max_freqs=3, out_channels=3,
                         model_hidden=16)
    # DCT features oracle (radiance.py:22-38)
    dct = dct_pos_features(4, 3)
    pos = torch.linspace(0, 1, 4)
    py, px = torch.meshgrid(pos, pos, indexing="ij")
    px = px.reshape(-1, 1, 1); py = py.reshape(-1, 1, 1)
    fr = torch.linspace(0, 2, 3)
    fx = fr[None, :, None]; fy = fr[None, None, :]
    ref = (torch.cos(px * fx * torch.pi) * torch.cos(py * fy * torch.pi)
           * (1 + fx * fy) ** -1).reshape(16, 9)
    np.testing.assert_allclose(dct, ref.numpy(), atol=1e-6)
    params = init_radiance(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.normal(size=(1, 4, 16)), jnp.float32)
    base = jnp.asarray(rng.normal(size=(1, 4, 3 * 16)), jnp.float32)
    out = apply_radiance_head(params, cfg, hidden, base, (2, 2))
    assert out.shape == (1, 4, 48)
    # zero-init final conv -> zero velocity at init (reference
    # RadianceFinalLayerConv zeros_, radiance.py:95-97)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    # non-zero conv produces signal that depends on the hidden tokens
    params["final_conv"]["w"] = 0.1 * jax.random.normal(
        jax.random.key(1), params["final_conv"]["w"].shape)
    o1 = apply_radiance_head(params, cfg, hidden, base, (2, 2))
    # zero-bias generator + column normalization make the head invariant
    # to a global scale of the hidden tokens; an additive shift steers it
    o2 = apply_radiance_head(params, cfg, hidden + 0.5, base, (2, 2))
    assert np.abs(np.asarray(o1) - np.asarray(o2)).max() > 1e-6
    # loader roundtrip
    sd = {"img_in_patch.weight": np.asarray(
              params["img_in_patch"]["w"]).T.reshape(16, 3, 4, 4),
          "img_in_patch.bias": np.asarray(params["img_in_patch"]["b"]),
          "nerf_image_embedder.embedder.0.weight": np.asarray(
              params["embedder"]["w"]).T,
          "nerf_image_embedder.embedder.0.bias": np.asarray(
              params["embedder"]["b"]),
          "nerf_final_layer_conv.conv.weight": np.asarray(
              params["final_conv"]["w"]),
          "nerf_final_layer_conv.conv.bias": np.asarray(
              params["final_conv"]["b"]),
          "nerf_final_layer_conv.norm.scale": np.asarray(
              params["final_norm"])}
    for i, blk in enumerate(params["blocks"]):
        sd[f"nerf_blocks.{i}.param_generator.weight"] = np.asarray(
            blk["param_generator"]["w"]).T
        sd[f"nerf_blocks.{i}.param_generator.bias"] = np.asarray(
            blk["param_generator"]["b"])
        sd[f"nerf_blocks.{i}.norm.scale"] = np.asarray(blk["norm"])
    lp, left = load_radiance_params(sd, cfg)
    assert left == []
    np.testing.assert_allclose(
        np.asarray(apply_radiance_head(lp, cfg, hidden, base, (2, 2))),
        np.asarray(o1), atol=1e-5)


def test_chroma_radiance_forward():
    from wan2gp_tpu.models.flux.dit import (FluxConfig, init_flux,
                                            flux_forward, make_img_ids,
                                            rope_from_ids)
    cfg = FluxConfig(in_channels=48, out_channels=3, vec_in_dim=8,
                     context_in_dim=24, hidden_size=32, mlp_ratio=2.0,
                     num_heads=4, depth=1, depth_single_blocks=1,
                     axes_dim=(4, 2, 2), guidance_embed=False,
                     chroma=True, radiance=True, radiance_patch_size=4,
                     compute_dtype=jnp.float32)
    params = init_flux(jax.random.key(2), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    gh = gw = 2
    img = jnp.asarray(rng.normal(size=(1, gh * gw, 48)), jnp.float32)
    txt = jnp.asarray(rng.normal(size=(1, 5, 24)), jnp.float32)
    ids = np.concatenate([np.zeros((5, 3)), make_img_ids(gh, gw)])
    cos, sin = rope_from_ids(ids, cfg.axes_dim, cfg.theta)
    out = flux_forward(params, cfg, img, txt, None,
                       jnp.asarray([0.4]), cos, sin,
                       radiance_grid_hw=(gh, gw))
    assert out.shape == (1, 4, 48)
    assert np.isfinite(np.asarray(out)).all()


def test_uso_service_route():
    """Service-level USO (flux_main.py:490-500): a def carrying the
    flux_dev_uso module attaches the SigLIP tower + projector and
    routes multi-ref generate_image through generate_uso."""
    from wan2gp_tpu.families.flux import FluxFamilyHandler
    from wan2gp_tpu.models.flux.dit import FluxConfig
    orig = FluxFamilyHandler.dit_config

    def tiny_cfg(base, dtype=None):
        return FluxConfig(in_channels=64, out_channels=64, vec_in_dim=8,
                          context_in_dim=32, hidden_size=64,
                          mlp_ratio=2.0, num_heads=4, depth=1,
                          depth_single_blocks=2, axes_dim=(4, 6, 6),
                          guidance_embed=True,
                          compute_dtype=jnp.float32)

    FluxFamilyHandler.dit_config = staticmethod(tiny_cfg)
    try:
        pipe = FluxFamilyHandler.load_model(
            "flux_dev_kontext",
            {"tiny": True, "loras": "flux_dev_uso"},
            init_random=True, attn_backend="xla")
        assert pipe.uso is not None
        rng = np.random.default_rng(0)
        subj = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        style = (rng.random((56, 56, 3)) * 255).astype(np.uint8)
        out = FluxFamilyHandler.generate_image(
            pipe, {"prompt": "a man in a hat",
                   "_image_refs": [subj, style],
                   "num_inference_steps": 2,
                   "embedded_guidance_scale": 4}, 64, 64, 0)
        a = np.asarray(out)
        assert a.shape == (64, 64, 3) and np.isfinite(a).all()
    finally:
        FluxFamilyHandler.dit_config = orig
