"""LoRA tests: key normalization, weight merge correctness, multiplier DSL."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.lora import (
    convert_lora_sd, merge_lora, merge_loras, parse_lora_multipliers,
    multiplier_segments, _normalize_key)
from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                    freq_dim=16, text_dim=16, text_len=4)


def test_key_normalization():
    assert _normalize_key("diffusion_model.blocks.0.self_attn.q.lora_A.weight") \
        == "blocks.0.self_attn.q.lora_A.weight"
    assert _normalize_key("lora_unet_blocks_0_self_attn_q.lora_down.weight") \
        == "blocks.0.self_attn.q.lora_A.weight"
    assert _normalize_key("blocks.1.cross_attn.k.default.lora_B.weight") \
        == "blocks.1.cross_attn.k.lora_B.weight"
    assert _normalize_key("lora_unet_blocks_3_ffn_0.lora_up.weight") \
        == "blocks.3.ffn.0.lora_B.weight"


def test_convert_and_merge_changes_forward():
    params = init_wan_dit(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    r = 4
    sd = {
        "diffusion_model.blocks.0.self_attn.q.lora_A.weight":
            rng.standard_normal((r, 32)).astype(np.float32) * 0.1,
        "diffusion_model.blocks.0.self_attn.q.lora_B.weight":
            rng.standard_normal((32, r)).astype(np.float32) * 0.1,
        "diffusion_model.blocks.0.self_attn.q.alpha": np.float32(8.0),
        "diffusion_model.blocks.1.ffn.0.lora_A.weight":
            rng.standard_normal((r, 32)).astype(np.float32) * 0.1,
        "diffusion_model.blocks.1.ffn.0.lora_B.weight":
            rng.standard_normal((64, r)).astype(np.float32) * 0.1,
        "diffusion_model.blocks.0.modulation.diff":
            np.zeros((6, 32), np.float32),  # must be ignored
    }
    lora = convert_lora_sd(sd)
    assert set(lora.keys()) == {"blocks.0.self_attn.q", "blocks.1.ffn.0"}
    assert lora["blocks.0.self_attn.q"]["alpha"] == 8.0

    merged, unmatched = merge_lora(params, lora, multiplier=0.7)
    assert unmatched == []
    # check q weight delta: (alpha/r) * mult * A.T @ B.T
    A = sd["diffusion_model.blocks.0.self_attn.q.lora_A.weight"]
    B = sd["diffusion_model.blocks.0.self_attn.q.lora_B.weight"]
    expected = 0.7 * (8.0 / r) * (A.T @ B.T)
    got = (np.asarray(merged["blocks"]["self_attn"]["q"]["w"][0], np.float32)
           - np.asarray(params["blocks"]["self_attn"]["q"]["w"][0], np.float32))
    np.testing.assert_allclose(got, expected, atol=0.02)
    # layer 1 q untouched
    np.testing.assert_array_equal(
        np.asarray(merged["blocks"]["self_attn"]["q"]["w"][1]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"][1]))

    # forward output changes
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    o0 = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                         attn_backend="xla")
    o1 = wan_dit_forward(merged, TINY, lat, t, ctx, cos, sin,
                         attn_backend="xla")
    assert np.abs(np.asarray(o0) - np.asarray(o1)).max() > 1e-5

    # zero multiplier is identity
    same, _ = merge_loras(params, [lora], [0.0])
    np.testing.assert_array_equal(
        np.asarray(same["blocks"]["self_attn"]["q"]["w"]),
        np.asarray(params["blocks"]["self_attn"]["q"]["w"]))


def test_multiplier_dsl():
    # constant
    s = parse_lora_multipliers("1.2 0.5", 2, 10)
    assert s.shape == (2, 10)
    np.testing.assert_allclose(s[0], 1.2)
    np.testing.assert_allclose(s[1], 0.5)
    # ramp with ','
    s = parse_lora_multipliers("1,0.5", 1, 4)
    np.testing.assert_allclose(s[0], [1, 1, 0.5, 0.5])
    # phases with ';'
    s = parse_lora_multipliers("0.9;0.3", 1, 10, phase_steps=[4, 10])
    np.testing.assert_allclose(s[0, :4], 0.9)
    np.testing.assert_allclose(s[0, 4:], 0.3)
    # missing multipliers default to 1
    s = parse_lora_multipliers("0.5", 3, 5)
    np.testing.assert_allclose(s[1], 1.0)


def test_multiplier_segments():
    s = parse_lora_multipliers("0.9;0.3 1.0", 2, 10, phase_steps=[4, 10])
    segs = multiplier_segments(s)
    assert len(segs) == 2
    assert segs[0][:2] == (0, 4) and segs[1][:2] == (4, 10)
    np.testing.assert_allclose(segs[0][2], [0.9, 1.0])
    np.testing.assert_allclose(segs[1][2], [0.3, 1.0])
    # constant schedule -> one segment
    segs = multiplier_segments(parse_lora_multipliers("1 1", 2, 6))
    assert len(segs) == 1


def test_extract_lora_roundtrip():
    """SVD extraction (shared/extract_lora.py:219-296): at full rank the
    extracted LoRA reconstructs the delta exactly; keys round-trip
    through convert_lora_sd."""
    from wan2gp_tpu.lora import extract_lora, convert_lora_sd
    rng = np.random.default_rng(0)
    base = {"blocks.0.attn.q.weight": rng.standard_normal(
                (8, 6)).astype(np.float32),
            "blocks.0.attn.q.bias": rng.standard_normal(
                8).astype(np.float32),
            "patch.weight": rng.standard_normal(
                (4, 3, 2, 2)).astype(np.float32),
            "same.weight": rng.standard_normal((4, 4)).astype(np.float32)}
    ft = {k: v + (rng.standard_normal(v.shape).astype(np.float32) * 0.1
                  if k != "same.weight" else 0.0)
          for k, v in base.items()}
    lora = extract_lora(ft, base, rank=8)
    # unchanged weights are skipped
    assert not any("same" in k for k in lora)
    up = lora["diffusion_model.blocks.0.attn.q.lora_up.weight"]
    down = lora["diffusion_model.blocks.0.attn.q.lora_down.weight"]
    np.testing.assert_allclose(
        up @ down, ft["blocks.0.attn.q.weight"]
        - base["blocks.0.attn.q.weight"], atol=1e-5)
    np.testing.assert_allclose(
        lora["diffusion_model.blocks.0.attn.q.diff_b"],
        ft["blocks.0.attn.q.bias"] - base["blocks.0.attn.q.bias"],
        atol=1e-6)
    assert lora["diffusion_model.patch.diff"].shape == (4, 3, 2, 2)
    # low rank truncates
    lora_r2 = extract_lora(ft, base, rank=2)
    assert lora_r2[
        "diffusion_model.blocks.0.attn.q.lora_down.weight"].shape[0] == 2
    # converts through the standard normalizer
    conv = convert_lora_sd(lora)
    assert any("blocks.0.attn.q" in k for k in conv)
