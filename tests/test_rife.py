"""RIFE HDv3 tests: torch oracles for the risky primitives + e2e."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.postprocessing.rife import (
    conv2d, conv_transpose2d, prelu, warp, init_rife, ifnet_forward,
    load_rife_params, interpolate_video)


def test_conv2d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 8, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3, 3, 3)).astype(np.float32)  # torch layout
    b = rng.standard_normal(4).astype(np.float32)
    ref = F.conv2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                   torch.tensor(w), torch.tensor(b), stride=2,
                   padding=1).numpy().transpose(0, 2, 3, 1)
    got = conv2d(jnp.asarray(x), jnp.asarray(w.transpose(2, 3, 1, 0)),
                 jnp.asarray(b), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 7, 6)).astype(np.float32)
    w = rng.standard_normal((6, 4, 4, 4)).astype(np.float32)  # [Cin,Cout,k,k]
    b = rng.standard_normal(4).astype(np.float32)
    ref = F.conv_transpose2d(torch.tensor(x.transpose(0, 3, 1, 2)),
                             torch.tensor(w), torch.tensor(b), stride=2,
                             padding=1).numpy().transpose(0, 2, 3, 1)
    wf = w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1)   # loader's transform
    got = conv_transpose2d(jnp.asarray(x),
                           jnp.asarray(np.ascontiguousarray(wf)),
                           jnp.asarray(b), stride=2, padding=1)
    assert got.shape == ref.shape == (1, 10, 14, 4)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_warp_matches_torch_grid_sample():
    """Reference warp (IFNet_HDv3.py:10-24): grid_sample, border padding,
    align_corners=True, flow in pixels normalized by (size-1)/2."""
    rng = np.random.default_rng(2)
    img = rng.standard_normal((2, 8, 10, 3)).astype(np.float32)
    flow = (rng.standard_normal((2, 8, 10, 2)) * 3).astype(np.float32)

    t_img = torch.tensor(img.transpose(0, 3, 1, 2))
    t_flow = torch.tensor(flow.transpose(0, 3, 1, 2))
    h, w = 8, 10
    gx = torch.linspace(-1, 1, w).view(1, 1, 1, w).expand(2, -1, h, -1)
    gy = torch.linspace(-1, 1, h).view(1, 1, h, 1).expand(2, -1, -1, w)
    grid = torch.cat([gx, gy], 1)
    fl = torch.cat([t_flow[:, :1] / ((w - 1) / 2.0),
                    t_flow[:, 1:2] / ((h - 1) / 2.0)], 1)
    g = (grid + fl).permute(0, 2, 3, 1)
    ref = F.grid_sample(t_img, g, mode="bilinear", padding_mode="border",
                        align_corners=True).numpy().transpose(0, 2, 3, 1)
    got = warp(jnp.asarray(img), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-4)


def test_prelu():
    x = jnp.asarray([[-2.0, 3.0]])
    a = jnp.asarray([0.5, 0.5])
    np.testing.assert_allclose(np.asarray(prelu(x, a)), [[-1.0, 3.0]])


def test_ifnet_forward_and_identity_tendency():
    params = init_rife(jax.random.key(0), c=16)
    rng = np.random.default_rng(3)
    img = rng.random((1, 32, 32, 3)).astype(np.float32)
    out = ifnet_forward(params, jnp.asarray(img), jnp.asarray(img))
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_loader_roundtrip_torch_keys():
    c = 16
    rng = np.random.default_rng(4)
    sd = {}

    def put_conv(pre, cin, cout, k=3, alpha=None):
        sd[f"{pre}.weight"] = rng.standard_normal(
            (cout, cin, k, k)).astype(np.float32) * 0.05
        sd[f"{pre}.bias"] = np.zeros(cout, np.float32)
        if alpha:
            sd[alpha] = np.full(cout, 0.25, np.float32)

    def put_tconv(pre, cin, cout, alpha=None):
        sd[f"{pre}.weight"] = rng.standard_normal(
            (cin, cout, 4, 4)).astype(np.float32) * 0.05
        sd[f"{pre}.bias"] = np.zeros(cout, np.float32)
        if alpha:
            sd[alpha] = np.full(cout, 0.25, np.float32)

    for i in range(3):
        pre = f"block{i}"
        put_conv(f"{pre}.conv0.0.0", 11, c // 2,
                 alpha=f"{pre}.conv0.0.1.weight")
        put_conv(f"{pre}.conv0.1.0", c // 2, c,
                 alpha=f"{pre}.conv0.1.1.weight")
        for j in range(4):
            put_conv(f"{pre}.convblock{j}.0.0", c, c,
                     alpha=f"{pre}.convblock{j}.0.1.weight")
            put_conv(f"{pre}.convblock{j}.1.0", c, c,
                     alpha=f"{pre}.convblock{j}.1.1.weight")
        put_tconv(f"{pre}.conv1.0", c, c // 2,
                  alpha=f"{pre}.conv1.1.weight")
        put_tconv(f"{pre}.conv1.2", c // 2, 4)
        put_tconv(f"{pre}.conv2.0", c, c // 2,
                  alpha=f"{pre}.conv2.1.weight")
        put_tconv(f"{pre}.conv2.2", c // 2, 1)
    sd["block_tea.conv0.0.0.weight"] = np.zeros((1,), np.float32)

    params, left = load_rife_params(sd)
    assert left == []
    rng2 = np.random.default_rng(5)
    i0 = rng2.random((1, 32, 32, 3)).astype(np.float32)
    i1 = rng2.random((1, 32, 32, 3)).astype(np.float32)
    out = ifnet_forward(params, jnp.asarray(i0), jnp.asarray(i1))
    assert np.isfinite(np.asarray(out)).all()


def test_interpolate_video_frame_counts():
    params = init_rife(jax.random.key(1), c=16)
    rng = np.random.default_rng(6)
    video = rng.random((3, 16, 16, 3)).astype(np.float32) * 2 - 1
    x2 = interpolate_video(params, video, exp=1)
    assert x2.shape[0] == (3 - 1) * 2 + 1
    x4 = interpolate_video(params, video, exp=2)
    assert x4.shape[0] == (3 - 1) * 4 + 1
    # original frames preserved at even indices
    np.testing.assert_allclose(x2[0], video[0], atol=1e-6)
    np.testing.assert_allclose(x2[2], video[1], atol=1e-6)
