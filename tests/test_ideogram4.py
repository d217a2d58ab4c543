"""Ideogram 4: MRoPE interleave, schedule, solvers, forward, loader."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.ideogram4.dit import (
    Ideogram4Config, ideogram_forward, ideogram_rope_tables, init_ideogram4)
from wan2gp_tpu.models.ideogram4.pipeline import (
    Ideogram4Pipeline, PRESETS, _step_table, build_ideogram_layout,
    logit_normal_schedule, pack_latents, schedule_for_resolution,
    unpack_latents)

TINY = Ideogram4Config(dim=64, n_layers=2, n_heads=4, ffn_dim=128,
                       adaln_dim=32, in_channels=16, llm_hidden=32,
                       llm_taps=3, mrope_section=(4, 2, 2),
                       compute_dtype=jnp.float32)


def _rope_mirror(cfg, pos):
    """Literal mirror of the reference MRoPE assignment
    (modeling_ideogram4.py:83-88): start from temporal freqs, overwrite
    strided slices offset:section[axis]*3:3 for h (axis 1) and w (2)."""
    half = cfg.head_dim // 2
    inv = 1.0 / (cfg.rope_theta ** (np.arange(0, cfg.head_dim, 2) /
                                    cfg.head_dim))
    freqs = [pos[..., a:a + 1] * inv for a in range(3)]   # each [B, L, half]
    ft = freqs[0].copy()
    for axis, offset in ((1, 1), (2, 2)):
        length = cfg.mrope_section[axis] * 3
        ft[..., offset:length:3] = freqs[axis][..., offset:length:3]
    return np.cos(ft), np.sin(ft)


def test_mrope_interleave_matches_reference_mirror():
    rng = np.random.default_rng(0)
    pos = rng.integers(0, 70000, (2, 11, 3)).astype(np.int64)
    cos, sin = ideogram_rope_tables(TINY, pos)
    cos_m, sin_m = _rope_mirror(TINY, pos.astype(np.float64))
    np.testing.assert_allclose(cos, cos_m, atol=1e-5)
    np.testing.assert_allclose(sin, sin_m, atol=1e-5)


def test_logit_normal_schedule_properties():
    tp = schedule_for_resolution(1024, 1024, mu=0.0, std=1.75, num_steps=20)
    assert tp.shape == (21,)
    assert np.all(np.diff(tp) < 0)           # decreasing cleanliness index
    # endpoints hit the logsnr clamps (scheduler.py:23-26)
    assert tp[0] == pytest.approx(1.0 / (1.0 + math.exp(-7.5)), rel=1e-6)
    assert tp[-1] == pytest.approx(1.0 / (1.0 + math.exp(9.0)), rel=1e-6)
    # resolution-aware mean shift: larger images -> noisier mid-schedule
    tp_big = schedule_for_resolution(2048, 2048, mu=0.0, std=1.75,
                                     num_steps=20)
    assert tp_big[10] < tp[10]


def test_logit_normal_midpoint_value():
    # t=0.5 -> ndtri=0 -> 1 - expit(mean); mean for 512x512/mu=0 is 0
    out = logit_normal_schedule(np.array([0.5]), mean=0.0, std=1.75)
    assert out[0] == pytest.approx(0.5, abs=1e-6)


def test_step_table_solver_modes():
    tp = schedule_for_resolution(512, 512, num_steps=8)
    gw = np.full((8,), 5.0, np.float32)
    euler = _step_table(tp, gw, 1.0, "euler")
    assert all(e["mode"] == "euler" for e in euler)
    res2m = _step_table(tp, gw, 1.0, "res_2m")
    # first step has no prev_denoised -> falls to 2s (sigma ~1 >= 0.1)
    assert res2m[0]["mode"] == "2s"
    assert any(e["mode"] == "2m" for e in res2m[1:])
    res2s = _step_table(tp, gw, 1.0, "res_2s")
    assert all(e["mode"] == "2s" for e in res2s
               if 1.0 - (e["sigma"] - e["dt"] * 0) > 0)   # structural
    # guidance indexed in loop order: preset index 0 = LAST step
    pr = PRESETS["V4_TURBO_12"]
    tp12 = schedule_for_resolution(512, 512, num_steps=12)
    plan = _step_table(tp12, np.asarray(pr.guidance_schedule), 1.0, "euler")
    assert plan[0]["guidance"] == 7.0 and plan[-1]["guidance"] == 3.0


def test_forward_shapes_and_pad_invariance():
    key = jax.random.key(0)
    params = init_ideogram4(key, TINY)
    gh = gw = 4
    ni, nt = gh * gw, 6
    layout = build_ideogram_layout(TINY, nt, gh, gw)
    cos, sin = jnp.asarray(layout["cos"]), jnp.asarray(layout["sin"])
    z = jax.random.normal(jax.random.key(1), (1, ni, TINY.in_channels))
    llm = jax.random.normal(jax.random.key(2),
                            (1, nt, TINY.llm_features_dim))
    valid = jnp.asarray([[1, 1, 1, 1, 0, 0]], jnp.float32)
    kv = jnp.concatenate([valid.astype(bool), jnp.ones((1, ni), bool)], 1)
    t = jnp.asarray([0.3], jnp.float32)
    out = ideogram_forward(params, TINY, z, t, llm, valid, cos, sin, kv,
                           attn_backend="xla")
    assert out.shape == (1, ni, TINY.in_channels)
    # garbage in the padded text rows must not change the image output
    llm2 = llm.at[:, 4:].set(99.0)
    out2 = ideogram_forward(params, TINY, z, t, llm2, valid, cos, sin, kv,
                            attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)
    # empty-text (unconditional transformer) path
    cu, su = jnp.asarray(layout["cos_uncond"]), \
        jnp.asarray(layout["sin_uncond"])
    outu = ideogram_forward(params, TINY, z, t, llm[:, :0], valid[:, :0],
                            cu, su, kv[:, nt:], attn_backend="xla")
    assert outu.shape == (1, ni, TINY.in_channels)


def test_pack_unpack_inverse():
    lat = jax.random.normal(jax.random.key(3), (1, 8, 8, 32))
    z = pack_latents(lat, 4, 4)
    assert z.shape == (1, 16, 128)
    back = unpack_latents(z, 4, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), atol=1e-4)


def _tiny_pipe(params_uncond=False):
    params = init_ideogram4(jax.random.key(0), TINY)
    pu = init_ideogram4(jax.random.key(9), TINY) if params_uncond else None

    def text_fn(prompts):
        k = jax.random.key(7)
        return (jax.random.normal(k, (1, 5, TINY.llm_features_dim)),
                jnp.ones((1, 5), jnp.int32))
    return Ideogram4Pipeline(params, TINY, params_uncond=pu,
                             text_encode_fn=text_fn, attn_backend="xla")


def test_pipeline_euler_and_res2m():
    pipe = _tiny_pipe(params_uncond=True)
    lat = pipe.generate("x", height=64, width=64, num_steps=3, seed=0,
                        return_latents=True)
    # 64/16 = 4x4 grid -> 8x8 latent, in_channels 16/4 = 4 channels
    assert lat.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(lat)).all()
    lat2m = pipe.generate("x", height=64, width=64, num_steps=3, seed=0,
                          sample_solver="res_2m", return_latents=True)
    assert lat2m.shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(lat2m)).all()
    # different solvers integrate differently
    assert not np.allclose(np.asarray(lat), np.asarray(lat2m))


def test_pipeline_preset_guidance_free_when_no_uncond():
    pipe = _tiny_pipe(params_uncond=False)
    lat = pipe.generate("x", height=64, width=64, preset="V4_TURBO_12",
                        seed=1, return_latents=True)
    assert lat.shape == (1, 8, 8, 4)


def test_loader_roundtrip_fused_qkv():
    import torch
    from wan2gp_tpu.io.ideogram_checkpoint import load_ideogram4_params
    cfg = TINY
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.zeros(dout)

    d, hd = cfg.dim, cfg.head_dim
    lin("input_proj", cfg.in_channels, d)
    sd["llm_cond_norm.weight"] = torch.ones(cfg.llm_features_dim)
    lin("llm_cond_proj", cfg.llm_features_dim, d)
    lin("t_embedding.mlp_in", d, d)
    lin("t_embedding.mlp_out", d, d)
    lin("adaln_proj", d, cfg.adaln_dim)
    sd["embed_image_indicator.weight"] = torch.randn(2, d, generator=g)
    sd["rotary_emb.inv_freq"] = torch.ones(hd // 2)
    for i in range(cfg.n_layers):
        p = f"layers.{i}"
        sd[f"{p}.attention.qkv.weight"] = torch.randn(3 * d, d,
                                                      generator=g) * 0.05
        lin(f"{p}.attention.o", d, d, bias=False)
        sd[f"{p}.attention.norm_q.weight"] = torch.ones(hd)
        sd[f"{p}.attention.norm_k.weight"] = torch.ones(hd)
        for nm in ("attention_norm1", "attention_norm2",
                   "ffn_norm1", "ffn_norm2"):
            sd[f"{p}.{nm}.weight"] = torch.ones(d)
        lin(f"{p}.feed_forward.w1", d, cfg.ffn_dim, bias=False)
        lin(f"{p}.feed_forward.w2", cfg.ffn_dim, d, bias=False)
        lin(f"{p}.feed_forward.w3", d, cfg.ffn_dim, bias=False)
        lin(f"{p}.adaln_modulation", cfg.adaln_dim, 4 * d)
    lin("final_layer.linear", d, cfg.in_channels)
    lin("final_layer.adaln_modulation", cfg.adaln_dim, d)

    wrapped = {"model.diffusion_model." + k: v.numpy()
               for k, v in sd.items()}
    params, leftover = load_ideogram4_params(wrapped, cfg, jnp.float32)
    assert leftover == [], leftover
    # fused qkv split: q slice of qkv.T equals loaded q
    qkv = sd["layers.0.attention.qkv.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["layers"]["q"][0]),
                               qkv[:cfg.dim].T, atol=1e-6)
    gh = gw = 2
    layout = build_ideogram_layout(cfg, 3, gh, gw)
    z = jnp.zeros((1, gh * gw, cfg.in_channels))
    llm = jnp.zeros((1, 3, cfg.llm_features_dim))
    valid = jnp.ones((1, 3), jnp.float32)
    kv = jnp.ones((1, 3 + gh * gw), bool)
    out = ideogram_forward(params, cfg, z, jnp.asarray([0.5]), llm, valid,
                           jnp.asarray(layout["cos"]),
                           jnp.asarray(layout["sin"]), kv,
                           attn_backend="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_flux2_vae_pre_quant_conv_exact():
    """The Flux2 post_quant_conv must stay an explicit 1x1 (folding the
    biased 1x1 into the zero-padded 3x3 is wrong at borders)."""
    import torch
    from wan2gp_tpu.io.ideogram_checkpoint import normalize_flux2_vae_sd
    g = torch.Generator().manual_seed(1)
    z = 4
    sd = {"decoder.post_quant_conv.weight":
              torch.randn(z, z, 1, 1, generator=g),
          "decoder.post_quant_conv.bias": torch.randn(z, generator=g),
          "decoder.conv_in.weight": torch.randn(8, z, 3, 3, generator=g),
          "decoder.conv_in.bias": torch.randn(8, generator=g),
          "bn.running_mean": torch.zeros(16),
          "bn.running_var": torch.ones(16)}
    npsd = {k: v.numpy() for k, v in sd.items()}
    out, bn = normalize_flux2_vae_sd(npsd)
    assert "decoder.post_quant_conv.weight" in out   # passes through
    assert "bn.running_mean" not in out
    assert bn["running_mean"].shape == (16,)
    # NHWC 1x1 + padded 3x3 in jax == the torch sequence (incl. borders)
    from wan2gp_tpu.models.flux.vae import _conv
    x = torch.randn(1, z, 5, 5, generator=g)
    ref = torch.nn.functional.conv2d(
        torch.nn.functional.conv2d(x, sd["decoder.post_quant_conv.weight"],
                                   sd["decoder.post_quant_conv.bias"]),
        sd["decoder.conv_in.weight"], sd["decoder.conv_in.bias"], padding=1)
    pq = {"w": jnp.asarray(out["decoder.post_quant_conv.weight"]
                           .transpose(2, 3, 1, 0)),
          "b": jnp.asarray(out["decoder.post_quant_conv.bias"])}
    ci = {"w": jnp.asarray(out["decoder.conv_in.weight"]
                           .transpose(2, 3, 1, 0)),
          "b": jnp.asarray(out["decoder.conv_in.bias"])}
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    got = _conv(_conv(xj, pq), ci)
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), ref.numpy(),
        atol=1e-4, rtol=1e-4)


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "ideogram4" in handlers and "ideogram4_turbotime" in handlers
