"""RAFT optical-flow tests: bilinear sampler / instance norm / correlation
lookup vs torch oracles, plus a full end-to-end forward against a literal
torch re-derivation of the reference network (preprocessing/raft/)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.preprocessing.raft import (
    RAFTConfig, init_raft, raft_flow, load_raft_params, bilinear_sample,
    instance_norm, _corr_pyramid, _corr_lookup, flow_to_rgb)


def test_bilinear_sample_matches_grid_sample():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)
    coords = rng.uniform(-1, 8, (2, 11, 2)).astype(np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(img), jnp.asarray(coords)))
    t = torch.tensor(img).permute(0, 3, 1, 2)
    x = torch.tensor(coords[..., 0:1])
    y = torch.tensor(coords[..., 1:2])
    grid = torch.cat([2 * x / (7 - 1) - 1, 2 * y / (5 - 1) - 1],
                     dim=-1)[:, :, None]
    ref = F.grid_sample(t, grid, align_corners=True).squeeze(-1)
    ref = ref.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 6, 5, 4)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    ref = F.instance_norm(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_corr_lookup_matches_reference():
    """Correlation pyramid + windowed bilinear lookup vs the reference
    CorrBlock (corr.py:12-60) computed in torch."""
    rng = np.random.default_rng(2)
    b, h, w, d = 1, 6, 8, 16
    levels, r = 2, 2
    f1 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    f2 = rng.standard_normal((b, h, w, d)).astype(np.float32)
    coords = (rng.uniform(1, 4, (b, h, w, 2))).astype(np.float32)

    pyr = _corr_pyramid(jnp.asarray(f1), jnp.asarray(f2), levels)
    got = np.asarray(_corr_lookup(pyr, jnp.asarray(coords), r))

    t1 = torch.tensor(f1).permute(0, 3, 1, 2)
    t2 = torch.tensor(f2).permute(0, 3, 1, 2)
    corr = torch.matmul(t1.reshape(b, d, h * w).transpose(1, 2),
                        t2.reshape(b, d, h * w)) / math.sqrt(d)
    corr = corr.reshape(b * h * w, 1, h, w)
    pyramid = [corr]
    for _ in range(levels - 1):
        corr = F.avg_pool2d(corr, 2, stride=2)
        pyramid.append(corr)
    out = []
    tc = torch.tensor(coords)
    for i, c in enumerate(pyramid):
        dx = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(dx, dx, indexing="ij"), -1)
        cl = tc.reshape(b * h * w, 1, 1, 2) / 2 ** i \
            + delta.flip(-1).view(1, 2 * r + 1, 2 * r + 1, 2)
        hh, ww = c.shape[-2:]
        xg = 2 * cl[..., 0:1] / (ww - 1) - 1
        yg = 2 * cl[..., 1:2] / (hh - 1) - 1
        v = F.grid_sample(c, torch.cat([xg, yg], -1), align_corners=True)
        out.append(v.view(b, h, w, -1))
    ref = torch.cat(out, dim=-1).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-4)


def _torch_raft(params, cfg, img1, img2, iters):
    """Literal torch re-derivation of the reference forward (raft.py:88+),
    consuming the SAME parameter tree (channels-last weights converted)."""
    def conv(x, p, stride=1):
        w = torch.tensor(np.asarray(p["w"])).permute(3, 2, 0, 1)
        b = torch.tensor(np.asarray(p["b"]))
        kh = w.shape[2]
        return F.conv2d(x, w, b, stride=stride, padding=kh // 2) \
            if w.shape[2] == w.shape[3] else \
            F.conv2d(x, w, b, stride=stride,
                     padding=(w.shape[2] // 2, w.shape[3] // 2))

    def res(p, x, stride, norm):
        y = conv(x, p["conv1"], stride)
        y = F.relu(F.instance_norm(y) if norm else y)
        y = conv(y, p["conv2"])
        y = F.relu(F.instance_norm(y) if norm else y)
        if "down" in p:
            x = conv(x, p["down"], stride)
            if norm:
                x = F.instance_norm(x)
        return F.relu(x + y)

    def enc(p, x, norm):
        y = conv(x, p["conv1"], 2)
        y = F.relu(F.instance_norm(y) if norm else y)
        for i, name in enumerate(("layer1", "layer2", "layer3")):
            s = 1 if i == 0 else 2
            y = res(p[name][0], y, s, norm)
            y = res(p[name][1], y, 1, norm)
        return conv(y, p["conv2"])

    x1 = 2 * (img1 / 255.0) - 1
    x2 = 2 * (img2 / 255.0) - 1
    f1 = enc(params["fnet"], x1, True)
    f2 = enc(params["fnet"], x2, True)
    cnet = enc(params["cnet"], x1, False)
    net = torch.tanh(cnet[:, :cfg.hidden_dim])
    inp = torch.relu(cnet[:, cfg.hidden_dim:])

    b, d, h, w = f1.shape
    corr0 = torch.matmul(f1.reshape(b, d, h * w).transpose(1, 2),
                         f2.reshape(b, d, h * w)) / math.sqrt(d)
    corr0 = corr0.reshape(b * h * w, 1, h, w)
    pyramid = [corr0]
    for _ in range(cfg.corr_levels - 1):
        pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))

    ys, xs = torch.meshgrid(torch.arange(h).float(),
                            torch.arange(w).float(), indexing="ij")
    coords0 = torch.stack([xs, ys], 0)[None].repeat(b, 1, 1, 1)
    coords1 = coords0.clone()
    r = cfg.corr_radius
    up = params["update"]
    for _ in range(iters):
        out = []
        cperm = coords1.permute(0, 2, 3, 1)
        for i, c in enumerate(pyramid):
            dx = torch.linspace(-r, r, 2 * r + 1)
            delta = torch.stack(torch.meshgrid(dx, dx, indexing="ij"), -1)
            cl = cperm.reshape(b * h * w, 1, 1, 2) / 2 ** i \
                + delta.flip(-1).view(1, 2 * r + 1, 2 * r + 1, 2)
            hh, ww = c.shape[-2:]
            xg = 2 * cl[..., 0:1] / (ww - 1) - 1
            yg = 2 * cl[..., 1:2] / (hh - 1) - 1
            v = F.grid_sample(c, torch.cat([xg, yg], -1),
                              align_corners=True)
            out.append(v.view(b, h, w, -1))
        corr = torch.cat(out, -1).permute(0, 3, 1, 2)
        flow = coords1 - coords0
        cor = F.relu(conv(corr, up["convc1"]))
        cor = F.relu(conv(cor, up["convc2"]))
        flo = F.relu(conv(flow, up["convf1"]))
        flo = F.relu(conv(flo, up["convf2"]))
        mot = F.relu(conv(torch.cat([cor, flo], 1), up["conv"]))
        mot = torch.cat([mot, flow], 1)
        x_in = torch.cat([inp, mot], 1)
        for zk, rk, qk in (("convz1", "convr1", "convq1"),
                           ("convz2", "convr2", "convq2")):
            hx = torch.cat([net, x_in], 1)
            z = torch.sigmoid(conv(hx, up[zk]))
            rr = torch.sigmoid(conv(hx, up[rk]))
            q = torch.tanh(conv(torch.cat([rr * net, x_in], 1), up[qk]))
            net = (1 - z) * net + z * q
        delta_f = conv(F.relu(conv(net, up["flow1"])), up["flow2"])
        coords1 = coords1 + delta_f

    flow8 = coords1 - coords0
    mask = 0.25 * conv(F.relu(conv(net, up["mask1"])), up["mask2"])
    mask = mask.view(b, 1, 9, 8, 8, h, w)
    mask = torch.softmax(mask, dim=2)
    upf = F.unfold(8 * flow8, [3, 3], padding=1)
    upf = upf.view(b, 2, 9, 1, 1, h, w)
    upf = torch.sum(mask * upf, dim=2)
    upf = upf.permute(0, 1, 4, 2, 5, 3)
    return upf.reshape(b, 2, 8 * h, 8 * w)


def test_raft_forward_matches_torch_oracle():
    cfg = RAFTConfig(corr_levels=2, corr_radius=2, iters=2)
    params = init_raft(jax.random.key(0), cfg)
    rng = np.random.default_rng(3)
    img1 = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    img2 = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    got = np.asarray(raft_flow(params, cfg, jnp.asarray(img1),
                               jnp.asarray(img2)))
    with torch.no_grad():
        ref = _torch_raft(params, cfg,
                          torch.tensor(img1).permute(0, 3, 1, 2),
                          torch.tensor(img2).permute(0, 3, 1, 2),
                          cfg.iters)
    np.testing.assert_allclose(got, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=2e-3, atol=2e-3)


def test_raft_loader_roundtrip():
    cfg = RAFTConfig(corr_levels=2, corr_radius=2)
    params = init_raft(jax.random.key(1), cfg)

    sd = {}

    def put(name, p):
        sd[f"module.{name}.weight"] = np.asarray(p["w"]).transpose(
            3, 2, 0, 1)
        sd[f"module.{name}.bias"] = np.asarray(p["b"])

    for enc_name in ("fnet", "cnet"):
        e = params[enc_name]
        put(f"{enc_name}.conv1", e["conv1"])
        put(f"{enc_name}.conv2", e["conv2"])
        for li, layer in enumerate(("layer1", "layer2", "layer3")):
            for bi in range(2):
                bp = e[layer][bi]
                put(f"{enc_name}.{layer}.{bi}.conv1", bp["conv1"])
                put(f"{enc_name}.{layer}.{bi}.conv2", bp["conv2"])
                if "down" in bp:
                    put(f"{enc_name}.{layer}.{bi}.downsample.0",
                        bp["down"])
    u = params["update"]
    for tgt, src in (("encoder.convc1", "convc1"),
                     ("encoder.convc2", "convc2"),
                     ("encoder.convf1", "convf1"),
                     ("encoder.convf2", "convf2"),
                     ("encoder.conv", "conv"),
                     ("gru.convz1", "convz1"), ("gru.convr1", "convr1"),
                     ("gru.convq1", "convq1"), ("gru.convz2", "convz2"),
                     ("gru.convr2", "convr2"), ("gru.convq2", "convq2"),
                     ("flow_head.conv1", "flow1"),
                     ("flow_head.conv2", "flow2"),
                     ("mask.0", "mask1"), ("mask.2", "mask2")):
        put(f"update_block.{tgt}", u[src])

    loaded, leftover = load_raft_params(sd, cfg)
    assert leftover == []
    a = jax.tree.leaves(params)
    b = jax.tree.leaves(loaded)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_flow_to_rgb():
    flow = np.zeros((4, 4, 2), np.float32)
    flow[..., 0] = 1.0
    img = flow_to_rgb(flow)
    assert img.shape == (4, 4, 3) and img.dtype == np.uint8
    # uniform flow -> uniform color
    assert (img == img[0, 0]).all()


def test_flow_video_preprocessor():
    from wan2gp_tpu.preprocessing.filters import (make_flow_preprocessor,
                                                  preprocess_video)
    make_flow_preprocessor(iters=2)
    frames = np.random.default_rng(0).integers(
        0, 255, (3, 24, 24, 3), dtype=np.uint8)
    out = preprocess_video(frames, "flow_video")
    assert out.shape == frames.shape and out.dtype == np.uint8
