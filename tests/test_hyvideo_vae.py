"""Hunyuan causal 3D VAE tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.hyvideo.vae import (
    HunyuanVAEConfig, init_hunyuan_vae, hunyuan_vae_decode,
    hunyuan_vae_encode, _updown_plan)

TINY = HunyuanVAEConfig(block_out_channels=(8, 16, 16, 16),
                        latent_channels=4, norm_groups=4,
                        layers_per_block=1)


def test_updown_plan_884():
    cfg = HunyuanVAEConfig()
    # decoder: spatial 2x on blocks 0-2, time 2x on blocks 1-2 (vae.py:261)
    assert _updown_plan(cfg, decode=True) == [
        (512, True, False), (512, True, True),
        (256, True, True), (128, False, False)]
    # encoder mirror (vae.py:87-89)
    assert _updown_plan(cfg, decode=False) == [
        (128, True, False), (256, True, True),
        (512, True, True), (512, False, False)]


def test_decode_shapes_causal_time():
    params = init_hunyuan_vae(jax.random.key(0), TINY)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, TINY.latent_channels, 3, 4, 4)), jnp.float32)
    video = hunyuan_vae_decode(params, TINY, z)
    # T: 3 latents -> (3-1)*4+1 = 9 frames (causal first frame)
    assert video.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(np.asarray(video)).all()


def test_encode_decode_roundtrip_shapes():
    params = init_hunyuan_vae(jax.random.key(1), TINY)
    vid = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 9, 32, 32)), jnp.float32) * 0.1
    z = hunyuan_vae_encode(params, TINY, vid)
    assert z.shape == (1, TINY.latent_channels, 3, 4, 4)
    out = hunyuan_vae_decode(params, TINY, z)
    assert out.shape == vid.shape


def test_causal_conv_is_temporally_causal():
    """The causal conv pads time front-only: output frame t must not see
    frames > t.  (The full encoder is NOT causal end-to-end because the
    mid-block attention is global, matching the reference's
    mid_block_causal_attn=False default.)"""
    from wan2gp_tpu.models.hyvideo.vae import _causal_conv3d
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 5, 4, 4, 3)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 2)), jnp.float32)
    b = jnp.zeros((2,), jnp.float32)
    y1 = _causal_conv3d(x, w, b)
    x2 = x.at[:, 3:].set(99.0)
    y2 = _causal_conv3d(x2, w, b)
    np.testing.assert_allclose(np.asarray(y1[:, :3]), np.asarray(y2[:, :3]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(y1[:, 3]), np.asarray(y2[:, 3]))
    # replicate (edge) padding on the first frame, not zeros
    ones = jnp.ones((1, 2, 4, 4, 3), jnp.float32)
    wsum = jnp.ones((3, 3, 3, 3, 1), jnp.float32)
    y = _causal_conv3d(ones[:, :, 1:3, 1:3], wsum, jnp.zeros((1,)))
    np.testing.assert_allclose(np.asarray(y[0, 0, 0, 0, 0]), 81.0,
                               rtol=1e-5)


def test_loader_roundtrip():
    from wan2gp_tpu.io.hyvideo_checkpoint import load_hunyuan_vae_params
    params = init_hunyuan_vae(jax.random.key(3), TINY)

    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32
                                          ).transpose(4, 3, 0, 1, 2)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_norm(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_resnet(pre, p):
        put_norm(f"{pre}.norm1", p["norm1"])
        put_conv(f"{pre}.conv1.conv", p["conv1"])
        put_norm(f"{pre}.norm2", p["norm2"])
        put_conv(f"{pre}.conv2.conv", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{pre}.conv_shortcut.conv", p["shortcut"])

    def put_mid(pre, p):
        put_resnet(f"{pre}.resnets.0", p["resnets"][0])
        put_resnet(f"{pre}.resnets.1", p["resnets"][1])
        a = p["attention"]
        put_norm(f"{pre}.attentions.0.group_norm", a["group_norm"])
        for m in ("to_q", "to_k", "to_v"):
            put_lin(f"{pre}.attentions.0.{m}", a[m])
        put_lin(f"{pre}.attentions.0.to_out.0", a["to_out"])

    enc, dec = params["encoder"], params["decoder"]
    put_conv("encoder.conv_in.conv", enc["conv_in"])
    put_mid("encoder.mid_block", enc["mid"])
    put_norm("encoder.conv_norm_out", enc["norm_out"])
    put_conv("encoder.conv_out.conv", enc["conv_out"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            put_resnet(f"encoder.down_blocks.{i}.resnets.{j}", rp)
        if "downsample" in blk:
            put_conv(f"encoder.down_blocks.{i}.downsamplers.0.conv.conv",
                     blk["downsample"])
    put_conv("decoder.conv_in.conv", dec["conv_in"])
    put_mid("decoder.mid_block", dec["mid"])
    put_norm("decoder.conv_norm_out", dec["norm_out"])
    put_conv("decoder.conv_out.conv", dec["conv_out"])
    for i, blk in enumerate(dec["up_blocks"]):
        for j, rp in enumerate(blk["resnets"]):
            put_resnet(f"decoder.up_blocks.{i}.resnets.{j}", rp)
        if "upsample" in blk:
            put_conv(f"decoder.up_blocks.{i}.upsamplers.0.conv.conv",
                     blk["upsample"])
    put_conv("quant_conv.conv", params["quant_conv"])
    put_conv("post_quant_conv.conv", params["post_quant_conv"])

    loaded, left = load_hunyuan_vae_params(sd, TINY, dtype=jnp.float32)
    assert left == []
    z = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, TINY.latent_channels, 2, 4, 4)), jnp.float32)
    o1 = hunyuan_vae_decode(params, TINY, z)
    o2 = hunyuan_vae_decode(loaded, TINY, z)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
