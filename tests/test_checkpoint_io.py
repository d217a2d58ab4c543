"""Checkpoint I/O tests: safetensors reader/writer round-trip and
torch-layout -> param-tree conversion for DiT / T5 / VAE."""
import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes
import pytest

from wan2gp_tpu.io.safetensors_reader import (
    SafetensorsFile, load_safetensors, save_safetensors)
from wan2gp_tpu.io.wan_checkpoint import (
    normalize_wan_sd, load_wan_dit_params, load_t5_params,
    load_wan_vae_params)
from wan2gp_tpu.models.wan.dit import WanDiTConfig, wan_dit_forward
from wan2gp_tpu.models.wan.t5 import T5Config, t5_encode
from wan2gp_tpu.models.wan.vae import (
    WanVAEConfig, vae_encode, vae_decode, encoder_plan, decoder_plan)
from wan2gp_tpu.ops.rope import build_rope_3d


def test_safetensors_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a": rng.standard_normal((3, 4)).astype(np.float32),
        "b.weight": rng.standard_normal((8,)).astype(ml_dtypes.bfloat16),
        "c": rng.integers(0, 100, (2, 2)).astype(np.int64),
    }
    path = str(tmp_path / "t.safetensors")
    save_safetensors(path, dict(tensors), metadata={"format": "pt"})
    f = SafetensorsFile(path)
    assert sorted(f.keys()) == ["a", "b.weight", "c"]
    assert f.metadata == {"format": "pt"}
    got = load_safetensors(path)
    for k in tensors:
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(tensors[k]))


def _rand_dit_sd(cfg, rng, prefix="", i2v=False):
    d, f = cfg.dim, cfg.ffn_dim
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{prefix}{name}.weight"] = rng.standard_normal(
            (dout, din)).astype(np.float32) * 0.02
        if bias:
            sd[f"{prefix}{name}.bias"] = np.zeros(dout, np.float32)

    pt, ph, pw = cfg.patch_size
    sd[f"{prefix}patch_embedding.weight"] = rng.standard_normal(
        (d, cfg.in_dim, pt, ph, pw)).astype(np.float32) * 0.02
    sd[f"{prefix}patch_embedding.bias"] = np.zeros(d, np.float32)
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, 6 * d)
    for i in range(cfg.num_layers):
        for att in ("self_attn", "cross_attn"):
            for m in ("q", "k", "v", "o"):
                lin(f"blocks.{i}.{att}.{m}", d, d)
            sd[f"{prefix}blocks.{i}.{att}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"{prefix}blocks.{i}.{att}.norm_k.weight"] = np.ones(d, np.float32)
        if i2v:
            for m in ("k_img", "v_img"):
                lin(f"blocks.{i}.cross_attn.{m}", d, d)
            sd[f"{prefix}blocks.{i}.cross_attn.norm_k_img.weight"] = \
                np.ones(d, np.float32)
        sd[f"{prefix}blocks.{i}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"{prefix}blocks.{i}.norm3.bias"] = np.zeros(d, np.float32)
        lin(f"blocks.{i}.ffn.0", d, f)
        lin(f"blocks.{i}.ffn.2", f, d)
        sd[f"{prefix}blocks.{i}.modulation"] = rng.standard_normal(
            (1, 6, d)).astype(np.float32) * 0.02
    lin("head.head", d, cfg.out_dim * pt * ph * pw)
    sd[f"{prefix}head.modulation"] = rng.standard_normal(
        (1, 2, d)).astype(np.float32) * 0.02
    return sd


def test_dit_checkpoint_conversion_and_forward():
    cfg = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=32, text_len=8)
    rng = np.random.default_rng(0)
    sd = _rand_dit_sd(cfg, rng, prefix="model.diffusion_model.")
    sd["vae.something"] = np.zeros(1, np.float32)  # must be dropped
    params, leftover = load_wan_dit_params(normalize_wan_sd(sd), cfg)
    assert leftover == []
    # weight transpose check
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["ffn"]["fc1"]["w"][0]).astype(np.float32),
        sd["model.diffusion_model.blocks.0.ffn.0.weight"].T, atol=1e-2)
    latents = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, 32)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=cfg.head_dim)
    out = wan_dit_forward(params, cfg, latents, jnp.full((1,), 500.0), ctx,
                          cos, sin, attn_backend="xla")
    assert out.shape == (1, 16, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_t5_checkpoint_conversion():
    cfg = T5Config(vocab_size=50, dim=16, dim_attn=16, dim_ffn=32,
                   num_heads=2, num_layers=2, compute_dtype=jnp.float32)
    rng = np.random.default_rng(1)
    sd = {"token_embedding.weight": rng.standard_normal(
        (50, 16)).astype(np.float32), "norm.weight": np.ones(16, np.float32)}
    for i in range(2):
        for m in ("q", "k", "v", "o"):
            sd[f"blocks.{i}.attn.{m}.weight"] = rng.standard_normal(
                (16, 16)).astype(np.float32) * 0.05
        sd[f"blocks.{i}.norm1.weight"] = np.ones(16, np.float32)
        sd[f"blocks.{i}.norm2.weight"] = np.ones(16, np.float32)
        sd[f"blocks.{i}.pos_embedding.embedding.weight"] = \
            rng.standard_normal((32, 2)).astype(np.float32) * 0.05
        sd[f"blocks.{i}.ffn.gate.0.weight"] = rng.standard_normal(
            (32, 16)).astype(np.float32) * 0.05
        sd[f"blocks.{i}.ffn.fc1.weight"] = rng.standard_normal(
            (32, 16)).astype(np.float32) * 0.05
        sd[f"blocks.{i}.ffn.fc2.weight"] = rng.standard_normal(
            (16, 32)).astype(np.float32) * 0.05
    params, leftover = load_t5_params(sd, cfg, dtype=jnp.float32)
    assert leftover == []
    ids = jnp.asarray(rng.integers(0, 50, (1, 8)), jnp.int32)
    out = t5_encode(params, cfg, ids, jnp.ones((1, 8), jnp.int32))
    assert out.shape == (1, 8, 16)
    assert np.isfinite(np.asarray(out)).all()


def _rand_vae_sd(cfg, rng):
    sd = {}

    def conv3(name, cin, cout, k=(3, 3, 3)):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, *k)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def conv2(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, 3, 3)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def conv1x1(name, cin, cout):
        sd[f"{name}.weight"] = rng.standard_normal(
            (cout, cin, 1, 1)).astype(np.float32) * 0.05
        sd[f"{name}.bias"] = np.zeros(cout, np.float32)

    def res(pre, din, dout):
        sd[f"{pre}.residual.0.gamma"] = np.ones((din, 1, 1, 1), np.float32)
        conv3(f"{pre}.residual.2", din, dout)
        sd[f"{pre}.residual.3.gamma"] = np.ones((dout, 1, 1, 1), np.float32)
        conv3(f"{pre}.residual.6", dout, dout)
        if din != dout:
            conv3(f"{pre}.shortcut", din, dout, k=(1, 1, 1))

    def attn(pre, d):
        sd[f"{pre}.norm.gamma"] = np.ones((d, 1, 1), np.float32)
        conv1x1(f"{pre}.to_qkv", d, 3 * d)
        conv1x1(f"{pre}.proj", d, d)

    conv3("encoder.conv1", 3, cfg.dim)
    for j, (op, din, dout) in enumerate(encoder_plan(cfg)):
        pre = f"encoder.downsamples.{j}"
        if op == "res":
            res(pre, din, dout)
        else:
            conv2(f"{pre}.resample.1", din, dout)
            if op == "down3d":
                conv3(f"{pre}.time_conv", dout, dout, k=(3, 1, 1))
    big = cfg.dim * cfg.dim_mult[-1]
    res("encoder.middle.0", big, big)
    attn("encoder.middle.1", big)
    res("encoder.middle.2", big, big)
    sd["encoder.head.0.gamma"] = np.ones((big, 1, 1, 1), np.float32)
    conv3("encoder.head.2", big, 2 * cfg.z_dim)
    conv3("conv1", 2 * cfg.z_dim, 2 * cfg.z_dim, k=(1, 1, 1))
    conv3("conv2", cfg.z_dim, cfg.z_dim, k=(1, 1, 1))
    conv3("decoder.conv1", cfg.z_dim, big)
    res("decoder.middle.0", big, big)
    attn("decoder.middle.1", big)
    res("decoder.middle.2", big, big)
    for j, (op, din, dout) in enumerate(decoder_plan(cfg)):
        pre = f"decoder.upsamples.{j}"
        if op == "res":
            res(pre, din, dout)
        else:
            conv2(f"{pre}.resample.1", din, dout)
            if op == "up3d":
                conv3(f"{pre}.time_conv", din, 2 * din, k=(3, 1, 1))
    sd["decoder.head.0.gamma"] = np.ones((cfg.dim, 1, 1, 1), np.float32)
    conv3("decoder.head.2", cfg.dim, 3)
    return sd


def test_vae_checkpoint_conversion():
    cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    rng = np.random.default_rng(2)
    sd = _rand_vae_sd(cfg, rng)
    params, leftover = load_wan_vae_params(sd, cfg)
    assert leftover == []
    v = jnp.asarray(rng.uniform(-1, 1, (1, 5, 16, 16, 3)), jnp.float32)
    z = vae_encode(params, cfg, v)
    assert z.shape == (1, 2, 2, 2, 16)
    out = vae_decode(params, cfg, z)
    assert out.shape == (1, 5, 16, 16, 3)


def test_scaled_fp8_dequant_on_load(tmp_path):
    """Scaled-FP8 convention: <module>.scale_weight next to an fp8 weight
    (scaled_fp8.py:572); load_weights dequantizes to float."""
    import numpy as np
    import ml_dtypes
    from wan2gp_tpu.io.safetensors_reader import (save_safetensors,
                                                  load_weights)
    rng = np.random.default_rng(0)
    w32 = rng.standard_normal((4, 8)).astype(np.float32)
    scale = np.float32(2.5)
    w8 = (w32 / scale).astype(ml_dtypes.float8_e4m3fn)
    sd = {"blk.weight": w8,
          "blk.scale_weight": np.asarray([scale], np.float32),
          "blk.bias": np.zeros(4, np.float32),
          "scaled_fp8": np.zeros(2, np.uint8),
          "plain.weight": w32}
    path = str(tmp_path / "fp8.safetensors")
    save_safetensors(path, sd)
    out = load_weights(path)
    assert "scaled_fp8" not in out and "blk.scale_weight" not in out
    np.testing.assert_allclose(
        np.asarray(out["blk.weight"], np.float32),
        w8.astype(np.float32) * scale, rtol=1e-6)
    np.testing.assert_array_equal(out["plain.weight"], w32)
