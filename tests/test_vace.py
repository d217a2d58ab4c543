"""VACE control-branch tests."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward)
from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
from wan2gp_tpu.ops.rope import build_rope_3d

VACE_CFG = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=4,
                        freq_dim=16, text_dim=16, text_len=4, vace=True,
                        vace_in_dim=96)
VAE = WanVAEConfig(dim=8, num_res_blocks=1)


def test_vace_params_and_forward():
    params = init_wan_dit(jax.random.key(0), VACE_CFG)
    assert "vace_blocks" in params and "vace_patch_embedding" in params
    assert params["vace_blocks"]["modulation"].shape[0] == 2  # layers 0, 2
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    vctx = jnp.asarray(rng.standard_normal((1, 96, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=VACE_CFG.head_dim)
    t = jnp.full((1,), 500.0)
    o_plain = wan_dit_forward(params, VACE_CFG, lat, t, ctx, cos, sin,
                              attn_backend="xla")
    o_vace = wan_dit_forward(params, VACE_CFG, lat, t, ctx, cos, sin,
                             attn_backend="xla", vace_context=vctx)
    assert np.abs(np.asarray(o_plain) - np.asarray(o_vace)).max() > 1e-6
    # scale 0 disables the hints entirely
    o_zero = wan_dit_forward(params, VACE_CFG, lat, t, ctx, cos, sin,
                             attn_backend="xla", vace_context=vctx,
                             vace_scale=0.0)
    np.testing.assert_allclose(np.asarray(o_zero), np.asarray(o_plain),
                               rtol=1e-4, atol=1e-4)


def test_vace_conditioning_builder_and_generate():
    dit = init_wan_dit(jax.random.key(0), VACE_CFG)
    vae = init_wan_vae(jax.random.key(1), VAE)
    pipe = WanPipeline(dit, VACE_CFG, vae_params=vae, vae_cfg=VAE,
                       attn_backend="xla")
    rng = np.random.default_rng(1)
    frames = rng.uniform(-1, 1, (5, 32, 32, 3)).astype(np.float32)
    masks = (rng.uniform(0, 1, (5, 32, 32)) > 0.5).astype(np.float32)
    ref = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)

    vctx, ref_count = pipe.build_vace_conditioning(frames, masks, [ref])
    assert vctx.shape == (1, 96, 3, 4, 4)   # 2 latents + 1 ref frame
    assert ref_count == 1
    # ref mask rows are zero
    np.testing.assert_allclose(np.asarray(vctx[0, 32:, 0]), 0.0)

    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    video = pipe.generate_vace(
        "x", frames, masks=masks, ref_images=[ref],
        sampling=SamplingConfig(solver="euler", steps=2, guide_scale=1.0),
        seed=0, context=ctx)
    assert video.shape == (5, 32, 32, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_vace_checkpoint_loading():
    from wan2gp_tpu.io.wan_checkpoint import load_wan_dit_params
    from tests.test_checkpoint_io import _rand_dit_sd
    rng = np.random.default_rng(2)
    sd = _rand_dit_sd(VACE_CFG, rng)
    d = VACE_CFG.dim
    sd["vace_patch_embedding.weight"] = rng.standard_normal(
        (d, 96, 1, 2, 2)).astype(np.float32) * 0.02
    sd["vace_patch_embedding.bias"] = np.zeros(d, np.float32)
    sd["vace_blocks.0.before_proj.weight"] = np.zeros((d, d), np.float32)
    sd["vace_blocks.0.before_proj.bias"] = np.zeros(d, np.float32)
    for i in range(2):
        for att in ("self_attn", "cross_attn"):
            for m in ("q", "k", "v", "o"):
                sd[f"vace_blocks.{i}.{att}.{m}.weight"] = \
                    rng.standard_normal((d, d)).astype(np.float32) * 0.02
                sd[f"vace_blocks.{i}.{att}.{m}.bias"] = np.zeros(d, np.float32)
            sd[f"vace_blocks.{i}.{att}.norm_q.weight"] = np.ones(d, np.float32)
            sd[f"vace_blocks.{i}.{att}.norm_k.weight"] = np.ones(d, np.float32)
        sd[f"vace_blocks.{i}.norm3.weight"] = np.ones(d, np.float32)
        sd[f"vace_blocks.{i}.norm3.bias"] = np.zeros(d, np.float32)
        sd[f"vace_blocks.{i}.ffn.0.weight"] = rng.standard_normal(
            (64, d)).astype(np.float32) * 0.02
        sd[f"vace_blocks.{i}.ffn.0.bias"] = np.zeros(64, np.float32)
        sd[f"vace_blocks.{i}.ffn.2.weight"] = rng.standard_normal(
            (d, 64)).astype(np.float32) * 0.02
        sd[f"vace_blocks.{i}.ffn.2.bias"] = np.zeros(d, np.float32)
        sd[f"vace_blocks.{i}.modulation"] = rng.standard_normal(
            (1, 6, d)).astype(np.float32) * 0.02
        sd[f"vace_blocks.{i}.after_proj.weight"] = np.zeros((d, d), np.float32)
        sd[f"vace_blocks.{i}.after_proj.bias"] = np.zeros(d, np.float32)
    params, leftover = load_wan_dit_params(sd, VACE_CFG)
    assert leftover == []
    assert params["vace_blocks"]["after_proj"]["w"].shape == (2, d, d)
