"""LTX-2 EditAnything reference module (reference
models/ltx2/editanything.py): pooled visual/adaLN projections, LoRA
ref_attn installed into the scanned blocks, module checkpoint
round-trip, and the handler end-to-end reference path."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.ltx2.dit import LTX2Config, init_ltx2_dit
from wan2gp_tpu.models.ltx2.editanything import (
    init_editanything, install_editanything, ref_visual_tokens,
    ref_adaln_vec, load_editanything_module, export_editanything_module,
    _adaptive_avg_pool2d)

CFG = LTX2Config(num_layers=3, num_heads=2, head_dim=16, in_channels=8,
                 out_channels=8, caption_dim=12, audio_num_heads=2,
                 audio_head_dim=8, audio_in_channels=4,
                 audio_out_channels=4, gated_attention=True,
                 cross_attention_adaln=True, compute_dtype=jnp.float32)


@pytest.fixture(scope="module")
def ea():
    return init_editanything(jax.random.key(0), CFG, rank=4)


def test_adaptive_pool_matches_torch():
    import torch
    import torch.nn.functional as F
    x = np.random.default_rng(0).normal(size=(1, 3, 7, 11)) \
        .astype(np.float32)
    ours = np.asarray(_adaptive_avg_pool2d(jnp.asarray(x), (4, 8)))
    ref = F.adaptive_avg_pool2d(torch.from_numpy(x), (4, 8)).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_ref_projections(ea):
    lat = jnp.asarray(np.random.default_rng(1).normal(
        size=(1, 8, 2, 6, 10)), jnp.float32)
    toks = ref_visual_tokens(ea, lat)
    assert toks.shape == (1, 32, CFG.dim)
    assert bool(jnp.isfinite(toks).all())
    # token_scale scales linearly (editanything.py:101)
    toks2 = ref_visual_tokens(ea, lat, token_scale=0.5)
    np.testing.assert_allclose(np.asarray(toks2),
                               np.asarray(toks) * 2.0, rtol=1e-5)
    ada = ref_adaln_vec(ea, lat)
    assert ada.shape == (1, CFG.n_ada * CFG.dim)
    assert bool(jnp.isfinite(ada).all())


def test_install_and_forward_ref_path(ea):
    from wan2gp_tpu.models.ltx2.dit import ltx2_dit_forward
    from wan2gp_tpu.models.ltx2.pipeline import build_ltx2_ropes
    params = init_ltx2_dit(jax.random.key(1), CFG, jnp.float32)
    params = install_editanything(params, ea, CFG, start_block=1,
                                  end_block=2, context_scale=0.05)
    assert "ref_attn" in params["blocks"]
    scale = np.asarray(params["blocks"]["ref_scale"])
    np.testing.assert_allclose(scale, [0.0, 0.05, 0.05])

    grid = (2, 2, 2)
    v_rope, _, _, _ = build_ltx2_ropes(CFG, grid)
    toks = jnp.zeros((1, 8, CFG.in_channels))
    t = jnp.ones((1, 2), jnp.float32) * 0.5
    ctx = jnp.zeros((1, 4, CFG.caption_dim))
    lat = jnp.asarray(np.random.default_rng(2).normal(
        size=(1, 8, 1, 2, 2)), jnp.float32)
    rc = ref_visual_tokens(ea, lat)
    ra = ref_adaln_vec(ea, lat)
    base, _ = ltx2_dit_forward(params, CFG, toks, t, ctx, v_rope,
                               attn_backend="xla")
    out, _ = ltx2_dit_forward(params, CFG, toks, t, ctx, v_rope,
                              ref_context=rc, ref_adaln=ra,
                              attn_backend="xla")
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base))
    assert bool(jnp.isfinite(out).all())


def test_module_roundtrip(ea):
    full = dict(ea)
    # per-block LoRA with block 0 zero (absent in the export)
    rank, dv = 4, CFG.dim
    rng = np.random.default_rng(3)
    ra = {}
    for name in ("to_q", "to_k", "to_v", "to_out"):
        a = rng.normal(size=(CFG.num_layers, dv, rank)).astype(np.float32)
        b = rng.normal(size=(CFG.num_layers, rank, dv)).astype(np.float32)
        a[0] = 0.0
        b[0] = 0.0
        ra[name] = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
    full["ref_attn"] = ra
    sd = export_editanything_module(full, CFG)
    assert "diffusion_model.transformer_blocks.1.ref_attn.to_q.lora_A.weight" in sd
    assert "diffusion_model.transformer_blocks.0.ref_attn.to_q.lora_A.weight" not in sd
    loaded, leftover = load_editanything_module(sd, CFG)
    assert leftover == []
    lat = jnp.asarray(rng.normal(size=(1, 8, 1, 4, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(ref_visual_tokens(full, lat)),
                               np.asarray(ref_visual_tokens(loaded, lat)),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(ref_adaln_vec(full, lat)),
                               np.asarray(ref_adaln_vec(loaded, lat)),
                               atol=1e-5)
    for name in ra:
        np.testing.assert_allclose(np.asarray(ra[name]["a"]),
                                   np.asarray(loaded["ref_attn"][name]["a"]),
                                   atol=1e-6)


def test_handler_edit_anything_e2e(monkeypatch):
    from wan2gp_tpu.families.ltx2 import LTX2FamilyHandler, _ARCH
    monkeypatch.setitem(
        _ARCH, "ltx2_22B",
        dict(num_layers=3, num_heads=2, head_dim=16, in_channels=8,
             out_channels=8, caption_dim=12, audio_num_heads=2,
             audio_head_dim=8, audio_in_channels=4, audio_out_channels=4,
             gated_attention=True, cross_attention_adaln=True))
    pipe = LTX2FamilyHandler.load_model(
        "ltx2_22B_distilled_edit_anything",
        {"ltx2_edit_anything_ref_start_block": 1,
         "ltx2_edit_anything_ref_end_block": 2, "editanything_rank": 4},
        init_random=True, attn_backend="xla")
    img = (np.random.default_rng(0).random((32, 32, 3)) * 255) \
        .astype(np.uint8)
    out = LTX2FamilyHandler.generate_video(
        pipe, {"prompt": "edit", "_image_refs": [img],
               "_model_def": {}}, 64, 64, 9, 0)
    v = np.asarray(out["video"])
    assert v.shape[2] == 2 and np.isfinite(v).all()
    out2 = LTX2FamilyHandler.generate_video(
        pipe, {"prompt": "edit", "_model_def": {}}, 64, 64, 9, 0)
    assert not np.allclose(v, np.asarray(out2["video"]))
