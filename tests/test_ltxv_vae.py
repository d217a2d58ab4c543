"""LTXV causal VAE tests on tiny block configs."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.ltxv.vae import (
    LTXVVAEConfig, init_ltxv_vae, ltxv_vae_encode, ltxv_vae_decode,
    encoder_channel_plan, decoder_channel_plan, causal_conv3d,
    _space_to_depth, _depth_to_space)

TINY = LTXVVAEConfig(
    latent_channels=8, base_channels=8, norm_groups=4,
    norm_layer="pixel_norm", patch_size=2,
    encoder_blocks=(("res_x", 1), ("compress_all", 2), ("res_x_y", 1),
                    ("compress_all_res", {"multiplier": 2}), ("res_x", 1)),
    decoder_blocks=(("res_x", 1), ("compress_all", {"residual": True,
                                                    "multiplier": 2}),
                    ("res_x_y", 1), ("compress_all", {}), ("res_x", 1)))


def test_channel_plans():
    enc = encoder_channel_plan(TINY)
    assert [e[0] for e in enc] == ["res_x", "compress_all", "res_x_y",
                                   "compress_all_res", "res_x"]
    assert enc[2][2] == 8 and enc[2][3] == 16     # res_x_y doubles
    assert enc[3][3] == 32                        # compress_all_res doubles
    dec = decoder_channel_plan(TINY)
    assert dec[0][0] == "res_x"                   # reversed order


def test_space_depth_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 6, 3)), jnp.float32)
    y = _space_to_depth(x, (2, 2, 2))
    assert y.shape == (1, 2, 2, 3, 24)
    back = _depth_to_space(y, (2, 2, 2))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_causal_conv_time_replicate():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 4, 4, 4, 2)), jnp.float32)
    p = {"w": jnp.asarray(rng.standard_normal((3, 3, 3, 2, 2)),
                          jnp.float32),
         "b": jnp.zeros((2,), jnp.float32)}
    y1 = causal_conv3d(x, p)
    x2 = x.at[:, 2:].set(0.0)
    y2 = causal_conv3d(x2, p)
    # frame 0 output depends only on frame 0..1 window front-padded
    np.testing.assert_allclose(np.asarray(y1[:, 0]), np.asarray(y2[:, 0]),
                               atol=1e-5)


def test_encode_decode_shapes():
    params = init_ltxv_vae(jax.random.key(0), TINY)
    rng = np.random.default_rng(2)
    # patch 2 + two temporal compressions (4x): T = 1 + 4k
    vid = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)),
                      jnp.float32) * 0.1
    z = ltxv_vae_encode(params, TINY, vid)
    # spatial: /2 patch /2 /2 compress = /8; temporal /4 causal
    assert z.shape == (1, TINY.latent_channels, 2, 2, 2)
    out = ltxv_vae_decode(params, TINY, z)
    assert out.shape[0:2] == (1, 3)
    assert out.shape[3:] == (16, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_latent_normalization_stats():
    params = init_ltxv_vae(jax.random.key(1), TINY)
    params["std_of_means"] = jnp.full((TINY.latent_channels,), 2.0)
    params["mean_of_means"] = jnp.full((TINY.latent_channels,), 0.5)
    rng = np.random.default_rng(3)
    vid = jnp.asarray(rng.standard_normal((1, 3, 5, 16, 16)),
                      jnp.float32) * 0.1
    z = ltxv_vae_encode(params, TINY, vid)
    params2 = dict(params)
    params2["std_of_means"] = jnp.ones((TINY.latent_channels,))
    params2["mean_of_means"] = jnp.zeros((TINY.latent_channels,))
    z_raw = ltxv_vae_encode(params2, TINY, vid)
    np.testing.assert_allclose(np.asarray(z), (np.asarray(z_raw) - 0.5) / 2,
                               rtol=1e-5, atol=1e-5)


def test_ltxv_vae_loader_roundtrip():
    from wan2gp_tpu.models.ltxv.vae import load_ltxv_vae_params
    params = init_ltxv_vae(jax.random.key(5), TINY)
    sd = {}

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32
                                          ).transpose(4, 3, 0, 1, 2)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_res(pre, p):
        put_conv(f"{pre}.conv1.conv", p["conv1"])
        put_conv(f"{pre}.conv2.conv", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{pre}.conv_shortcut.conv", p["shortcut"])
            sd[f"{pre}.norm3.norm.weight"] = np.asarray(p["norm3"]["w"])
            sd[f"{pre}.norm3.norm.bias"] = np.asarray(p["norm3"]["b"])

    from wan2gp_tpu.models.ltxv.vae import (encoder_channel_plan,
                                            decoder_channel_plan)
    put_conv("encoder.conv_in.conv", params["encoder"]["conv_in"])
    put_conv("encoder.conv_out.conv", params["encoder"]["conv_out"])
    for i, ((name, bp, _, _), blk) in enumerate(zip(
            encoder_channel_plan(TINY), params["encoder"]["blocks"])):
        pre = f"encoder.down_blocks.{i}"
        if name == "res_x":
            for j, rp in enumerate(blk["res_blocks"]):
                put_res(f"{pre}.res_blocks.{j}", rp)
        elif name == "res_x_y":
            put_res(pre, blk["res"])
        elif name.endswith("_res"):
            put_conv(f"{pre}.conv.conv", blk["conv"])
        else:
            put_conv(f"{pre}.conv", blk["conv"])
    put_conv("decoder.conv_in.conv", params["decoder"]["conv_in"])
    put_conv("decoder.conv_out.conv", params["decoder"]["conv_out"])
    for i, ((name, bp, _, _), blk) in enumerate(zip(
            decoder_channel_plan(TINY), params["decoder"]["blocks"])):
        pre = f"decoder.up_blocks.{i}"
        if name == "res_x":
            for j, rp in enumerate(blk["res_blocks"]):
                put_res(f"{pre}.res_blocks.{j}", rp)
        elif name == "res_x_y":
            put_res(pre, blk["res"])
        else:
            put_conv(f"{pre}.conv.conv", blk["conv"])
    sd["per_channel_statistics.std-of-means"] = np.full(
        TINY.latent_channels, 2.0, np.float32)
    sd["per_channel_statistics.mean-of-means"] = np.zeros(
        TINY.latent_channels, np.float32)

    loaded, left = load_ltxv_vae_params(sd, TINY)
    assert left == []
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.standard_normal(
        (1, TINY.latent_channels, 2, 2, 2)), jnp.float32)
    params["std_of_means"] = jnp.full((TINY.latent_channels,), 2.0)
    o1 = ltxv_vae_decode(params, TINY, z)
    o2 = ltxv_vae_decode(loaded, TINY, z)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1), atol=1e-5)
