"""Depth Anything V2 tests (tiny config + torch oracles for resize)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.preprocessing.depth_anything import (
    DAv2Config, DAV2_CONFIGS, init_dav2, depth_forward, infer_depth,
    load_dav2_params, _resize_ac)

TINY = DAv2Config(embed_dim=32, depth=3, num_heads=2, features=16,
                  out_channels=(8, 16, 24, 32), intermediate_layers=(0, 1, 2, 2),
                  pos_grid=4)


def test_configs_match_reference():
    assert DAV2_CONFIGS["vitl"]["features"] == 256
    assert DAV2_CONFIGS["vits"]["out_channels"] == (48, 96, 192, 384)
    assert DAV2_CONFIGS["vitl"]["intermediate_layers"] == (4, 11, 17, 23)


def test_resize_ac_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 5, 7, 3)).astype(np.float32)
    ref = F.interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                        size=(9, 13), mode="bilinear",
                        align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = _resize_ac(jnp.asarray(x), 9, 13)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_depth_forward_shapes():
    params = init_dav2(jax.random.key(0), TINY)
    img = jnp.asarray(np.random.default_rng(1).random((1, 56, 42, 3)),
                      jnp.float32)
    d = depth_forward(params, TINY, img)
    assert d.shape == (1, 56, 42)
    assert (np.asarray(d) >= 0).all()


def test_infer_depth_normalized():
    params = init_dav2(jax.random.key(1), TINY)
    img = (np.random.default_rng(2).random((30, 40, 3)) * 255
           ).astype(np.uint8)
    d = infer_depth(params, TINY, img, input_size=28)
    assert d.shape == (30, 40)
    assert d.min() >= 0.0 and d.max() <= 1.0 + 1e-6


def test_loader_roundtrip():
    params = init_dav2(jax.random.key(2), TINY)
    sd = {}
    rng = np.random.default_rng(3)

    def put_lin(name, p, i=None):
        g = (lambda a: np.asarray(a[i], np.float32)) if i is not None \
            else (lambda a: np.asarray(a, np.float32))
        sd[f"{name}.weight"] = g(p["w"]).T
        sd[f"{name}.bias"] = g(p["b"])

    def put_conv(name, p, flip=False, bias=True, i=None):
        w = np.asarray(p["w"], np.float32)   # [k,k,cin,cout]
        if flip:
            sd[f"{name}.weight"] = np.ascontiguousarray(
                w[::-1, ::-1].transpose(2, 3, 0, 1))
        else:
            sd[f"{name}.weight"] = np.ascontiguousarray(
                w.transpose(3, 2, 0, 1))
        if bias:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    enc = params["encoder"]
    put_conv("pretrained.patch_embed.proj", enc["patch_embed"])
    sd["pretrained.cls_token"] = np.asarray(enc["cls_token"], np.float32)
    sd["pretrained.pos_embed"] = np.asarray(enc["pos_embed"], np.float32)
    sd["pretrained.mask_token"] = np.zeros((1, 32), np.float32)
    sd["pretrained.norm.weight"] = np.asarray(enc["norm"]["w"])
    sd["pretrained.norm.bias"] = np.asarray(enc["norm"]["b"])
    bp = enc["blocks"]
    for i in range(TINY.depth):
        pre = f"pretrained.blocks.{i}"
        sd[f"{pre}.norm1.weight"] = np.asarray(bp["norm1"]["w"][i])
        sd[f"{pre}.norm1.bias"] = np.asarray(bp["norm1"]["b"][i])
        sd[f"{pre}.norm2.weight"] = np.asarray(bp["norm2"]["w"][i])
        sd[f"{pre}.norm2.bias"] = np.asarray(bp["norm2"]["b"][i])
        put_lin(f"{pre}.attn.qkv", bp["qkv"], i)
        put_lin(f"{pre}.attn.proj", bp["proj"], i)
        put_lin(f"{pre}.mlp.fc1", bp["fc1"], i)
        put_lin(f"{pre}.mlp.fc2", bp["fc2"], i)
        sd[f"{pre}.ls1.gamma"] = np.asarray(bp["ls1"][i])
        sd[f"{pre}.ls2.gamma"] = np.asarray(bp["ls2"][i])
    hd = params["head"]
    for i in range(4):
        put_conv(f"depth_head.projects.{i}", hd["projects"][i])
    put_conv("depth_head.resize_layers.0", hd["resize0"], flip=True)
    put_conv("depth_head.resize_layers.1", hd["resize1"], flip=True)
    put_conv("depth_head.resize_layers.3", hd["resize3"])
    for i in range(1, 5):
        put_conv(f"depth_head.scratch.layer{i}_rn", hd[f"layer{i}_rn"],
                 bias=False)
        pre = f"depth_head.scratch.refinenet{i}"
        rf = hd[f"refinenet{i}"]
        put_conv(f"{pre}.resConfUnit1.conv1", rf["rcu1"]["conv1"])
        put_conv(f"{pre}.resConfUnit1.conv2", rf["rcu1"]["conv2"])
        put_conv(f"{pre}.resConfUnit2.conv1", rf["rcu2"]["conv1"])
        put_conv(f"{pre}.resConfUnit2.conv2", rf["rcu2"]["conv2"])
        put_conv(f"{pre}.out_conv", rf["out_conv"])
    put_conv("depth_head.scratch.output_conv1", hd["output_conv1"])
    put_conv("depth_head.scratch.output_conv2.0", hd["output_conv2a"])
    put_conv("depth_head.scratch.output_conv2.2", hd["output_conv2b"])

    loaded, left = load_dav2_params(sd, TINY)
    assert left == []
    img = jnp.asarray(rng.random((1, 28, 28, 3)), jnp.float32)
    o1 = depth_forward(params, TINY, img)
    o2 = depth_forward(loaded, TINY, img)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-4, atol=1e-4)
