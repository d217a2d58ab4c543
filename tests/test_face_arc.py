"""ArcFace identity stack (reference preprocessing/arc/)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.preprocessing.face_arc import (
    ARCFACE_DST, estimate_norm, align_face, landmarks_5_from_face68,
    IResNetConfig, IRESNET18, init_iresnet, iresnet_forward,
    load_iresnet_params, arcface_embed)

TINY = IResNetConfig(layers=(1, 1, 1, 1), width=8, dim=16)


def test_estimate_norm_identity_and_similarity():
    # landmarks exactly at the template -> identity transform
    m = estimate_norm(ARCFACE_DST.copy())
    np.testing.assert_allclose(m[:, :2], np.eye(2), atol=1e-5)
    np.testing.assert_allclose(m[:, 2], 0.0, atol=1e-4)
    # scaled+shifted landmarks are mapped back onto the template
    lmk = ARCFACE_DST * 2.0 + np.asarray([30.0, -10.0])
    m = estimate_norm(lmk)
    warped = lmk @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(warped, ARCFACE_DST, atol=1e-3)
    # rotation too
    th = 0.3
    rot = np.asarray([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]], np.float32)
    lmk = ARCFACE_DST @ rot.T * 1.5 + 20.0
    m = estimate_norm(lmk)
    warped = lmk @ m[:, :2].T + m[:, 2]
    np.testing.assert_allclose(warped, ARCFACE_DST, atol=1e-2)


def test_align_face_shapes():
    img = np.random.default_rng(0).integers(
        0, 255, (200, 160, 3), np.uint8)
    out = align_face(img, ARCFACE_DST * 1.3 + 10.0)
    assert out.shape == (112, 112, 3)


def test_landmarks_from_face68():
    k = np.zeros((68, 2), np.float32)
    k[36:42] = [10.0, 20.0]
    k[42:48] = [30.0, 20.0]
    k[30] = [20.0, 30.0]
    k[48] = [12.0, 40.0]
    k[54] = [28.0, 40.0]
    p5 = landmarks_5_from_face68(k)
    np.testing.assert_allclose(p5, [[10, 20], [30, 20], [20, 30],
                                    [12, 40], [28, 40]])


def test_iresnet_torch_oracle():
    """IBasicBlock stack vs inline torch re-derivation (insightface
    iresnet convention: BN-conv-BN-PReLU-conv(stride)-BN + conv1x1+BN
    shortcut, final BN-fc-BN1d)."""
    import torch
    import torch.nn.functional as F
    cfg = TINY
    params = init_iresnet(jax.random.key(0), cfg)
    # randomize BN stats so the oracle is meaningful
    rng = np.random.default_rng(0)

    def rand_bn(p):
        c = p["w"].shape[0]
        return {"w": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(
                    np.float32)),
                "b": jnp.asarray(rng.standard_normal(c).astype(
                    np.float32) * 0.1),
                "mean": jnp.asarray(rng.standard_normal(c).astype(
                    np.float32) * 0.1),
                "var": jnp.asarray(rng.uniform(0.5, 1.5, c).astype(
                    np.float32))}

    params["bn1"] = rand_bn(params["bn1"])
    for s in range(4):
        for bp in params[f"layer{s + 1}"]:
            for k in ("bn1", "bn2", "bn3"):
                bp[k] = rand_bn(bp[k])
    x = rng.standard_normal((1, 3, 112, 112)).astype(np.float32)
    ours = np.asarray(iresnet_forward(params, cfg, jnp.asarray(x)))

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def bn(v, p):
        return F.batch_norm(v, t(p["mean"]), t(p["var"]), t(p["w"]),
                            t(p["b"]), False, 0.0, cfg.eps)

    def prelu(v, a):
        return F.prelu(v, t(a))

    with torch.no_grad():
        h = F.conv2d(t(x), t(params["conv1"]["w"]), padding=1)
        h = prelu(bn(h, params["bn1"]), params["prelu"])
        for s in range(4):
            for i, bp in enumerate(params[f"layer{s + 1}"]):
                stride = 2 if i == 0 else 1
                y = bn(h, bp["bn1"])
                y = F.conv2d(y, t(bp["conv1"]["w"]), padding=1)
                y = prelu(bn(y, bp["bn2"]), bp["prelu"])
                y = F.conv2d(y, t(bp["conv2"]["w"]), stride=stride,
                             padding=1)
                y = bn(y, bp["bn3"])
                sc = h
                if "down_conv" in bp:
                    sc = bn(F.conv2d(h, t(bp["down_conv"]["w"]),
                                     stride=stride),
                            bp["down_bn"])
                h = y + sc
        h = bn(h, params["bn2"]).reshape(1, -1)
        h = h @ t(params["fc"]["w"]) + t(params["fc"]["b"])
        f = params["features"]
        h = (h - t(f["mean"])) / torch.sqrt(t(f["var"]) + cfg.eps) \
            * t(f["w"]) + t(f["b"])
        want = (h / h.norm(dim=-1, keepdim=True)).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_iresnet_loader_roundtrip():
    cfg = TINY
    params = init_iresnet(jax.random.key(1), cfg)
    sd = {"conv1.weight": np.asarray(params["conv1"]["w"]),
          "prelu.weight": np.asarray(params["prelu"]),
          "fc.weight": np.asarray(params["fc"]["w"]).T,
          "fc.bias": np.asarray(params["fc"]["b"])}

    def put_bn(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"])
        sd[f"{name}.bias"] = np.asarray(p["b"])
        sd[f"{name}.running_mean"] = np.asarray(p["mean"])
        sd[f"{name}.running_var"] = np.asarray(p["var"])

    put_bn("bn1", params["bn1"])
    put_bn("bn2", params["bn2"])
    put_bn("features", params["features"])
    for s in range(4):
        for i, bp in enumerate(params[f"layer{s + 1}"]):
            pre = f"layer{s + 1}.{i}"
            sd[f"{pre}.conv1.weight"] = np.asarray(bp["conv1"]["w"])
            sd[f"{pre}.conv2.weight"] = np.asarray(bp["conv2"]["w"])
            sd[f"{pre}.prelu.weight"] = np.asarray(bp["prelu"])
            put_bn(f"{pre}.bn1", bp["bn1"])
            put_bn(f"{pre}.bn2", bp["bn2"])
            put_bn(f"{pre}.bn3", bp["bn3"])
            if "down_conv" in bp:
                sd[f"{pre}.downsample.0.weight"] = np.asarray(
                    bp["down_conv"]["w"])
                put_bn(f"{pre}.downsample.1", bp["down_bn"])
    loaded, left = load_iresnet_params(sd, cfg)
    assert left == []
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 3, 112, 112)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(iresnet_forward(loaded, cfg, x)),
        np.asarray(iresnet_forward(params, cfg, x)), atol=1e-5)


def test_arcface_embed_e2e():
    cfg = TINY
    params = init_iresnet(jax.random.key(2), cfg)
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (180, 160, 3), np.uint8)
    emb = arcface_embed(params, cfg, img, ARCFACE_DST * 1.2 + 5.0)
    assert emb.shape == (cfg.dim,)
    np.testing.assert_allclose(np.linalg.norm(emb), 1.0, atol=1e-5)
    # identity signal: different faces -> different embeddings
    img2 = rng.integers(0, 255, (180, 160, 3), np.uint8)
    emb2 = arcface_embed(params, cfg, img2, ARCFACE_DST * 1.2 + 5.0)
    assert not np.allclose(emb, emb2, atol=1e-3)
