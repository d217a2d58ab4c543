"""Wan 2.2 Animate (reference models/wan/animate/motion_encoder.py,
face_blocks.py, model_animate.py; model.py:715-716, 1226-1241)."""
import math

import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.animate import (
    MotionEncoderConfig, init_motion_encoder, motion_encoder_forward,
    FaceEncoderConfig, init_face_encoder, face_encoder_forward,
    init_face_adapter, face_block_forward, stack_face_adapter,
    load_animate_params)
from wan2gp_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                       wan_dit_forward)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=80, ffn_dim=160, num_heads=4, num_layers=5,
                    freq_dim=32, text_dim=48, text_len=16, in_dim=36,
                    model_type="i2v", compute_dtype=jnp.float32)


def test_motion_encoder_torch_oracle():
    """Full LIA encoder vs an inline torch re-derivation (EqualConv2d
    1/sqrt(fan-in) scaling, [1,3,3,1] blur-downsampled ResBlocks,
    fused leaky-relu sqrt(2) scaling, EqualLinear fc, QR direction)."""
    import torch
    import torch.nn.functional as F
    cfg = MotionEncoderConfig(size=16, dim=512, motion_dim=4)
    params = init_motion_encoder(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 16, 16)).astype(np.float32)
    ours = np.asarray(motion_encoder_forward(params, jnp.asarray(x)))

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def eq_conv(p, v, stride=1, padding=0):
        w = t(p["w"])
        scale = 1.0 / math.sqrt(w.shape[1] * w.shape[2] * w.shape[3])
        b = t(p["cb"]) if "cb" in p else None
        return F.conv2d(v, w * scale, bias=b, stride=stride,
                        padding=padding)

    def flrelu(v, bias):
        return F.leaky_relu(v + t(bias).reshape(1, -1, 1, 1),
                            0.2) * math.sqrt(2.0)

    def blur(v, pad):
        k = torch.tensor([1.0, 3.0, 3.0, 1.0])
        k = (k[None, :] * k[:, None])
        k = k / k.sum()
        c = v.shape[1]
        v = F.pad(v, [pad[0], pad[1], pad[0], pad[1]])
        w = torch.flip(k, [0, 1]).view(1, 1, 4, 4).repeat(c, 1, 1, 1)
        return F.conv2d(v, w, groups=c)

    def conv_layer(p, v, downsample=False, activate=True, k=3):
        if downsample:
            pd = (4 - 2) + (k - 1)
            v = blur(v, ((pd + 1) // 2, pd // 2))
            y = eq_conv(p, v, stride=2, padding=0)
        else:
            y = eq_conv(p, v, stride=1, padding=k // 2)
        return flrelu(y, p["b"]) if activate else y

    with torch.no_grad():
        h = conv_layer(params["conv_in"], t(x), k=1)
        for rp in params["res_blocks"]:
            a = conv_layer(rp["conv1"], h, k=3)
            a = conv_layer(rp["conv2"], a, downsample=True, k=3)
            s = conv_layer(rp["skip"], h, downsample=True,
                           activate=False, k=1)
            h = (a + s) / math.sqrt(2.0)
        w = t(params["final"]["w"])
        scale = 1.0 / math.sqrt(w.shape[1] * 16)
        h = F.conv2d(h, w * scale).reshape(2, -1)
        for lp in params["fc"]:
            h = F.linear(h, t(lp["w"]).T / math.sqrt(lp["w"].shape[0]),
                         t(lp["b"]))
        q, _ = torch.linalg.qr(t(params["direction"]) + 1e-8)
        want = (h @ q.T).numpy()
    np.testing.assert_allclose(ours, want, rtol=2e-3, atol=2e-3)


def test_face_encoder_shapes_and_causality():
    cfg = FaceEncoderConfig(in_dim=16, hidden_dim=80, num_heads=4)
    params = init_face_encoder(jax.random.key(1), cfg)
    rng = np.random.default_rng(1)
    m = rng.standard_normal((1, 8, 16)).astype(np.float32)
    out = face_encoder_forward(params, cfg, jnp.asarray(m))
    # ceil(8/4) = 2 rows + the zero frame-0 row; 4 head tokens + pad
    assert out.shape == (1, 3, 5, 80)
    assert np.asarray(out[:, 0]).sum() == 0.0
    # causality: with the two stride-2 causal convs, output row 1 sees
    # only input frame 0 and row 2 sees frames 0..4 — perturbing frame 4
    # must leave row 1 unchanged but alter row 2 (the reference's
    # CausalConv1d stride geometry even drops the last input frames)
    m2 = m.copy()
    m2[:, 4] += 5.0
    out2 = face_encoder_forward(params, cfg, jnp.asarray(m2))
    np.testing.assert_allclose(np.asarray(out[:, 1]),
                               np.asarray(out2[:, 1]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 2]), np.asarray(out2[:, 2]))


def test_face_block_per_frame_isolation():
    adapters = init_face_adapter(jax.random.key(2), 80, 4, 1)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 2 * 6, 80)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((1, 2, 3, 80)), jnp.float32)
    o1 = face_block_forward(adapters[0], x, mv, 4)
    # frame-1 motion change must not touch frame-0 output tokens
    mv2 = mv.at[:, 1].add(3.0)
    o2 = face_block_forward(adapters[0], x, mv2, 4)
    np.testing.assert_allclose(np.asarray(o1[:, :6]),
                               np.asarray(o2[:, :6]), atol=1e-5)
    assert not np.allclose(np.asarray(o1[:, 6:]), np.asarray(o2[:, 6:]))


def test_animate_dit_forward():
    cfg = TINY
    params = init_wan_dit(jax.random.key(3), cfg, jnp.float32)
    rng = np.random.default_rng(3)
    # 3 latent frames: 1 ref + 2 video
    lat = jnp.asarray(rng.standard_normal((1, 36, 3, 8, 8))[:, :16],
                      jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 20, 3, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    t = jnp.full((1,), 500.0)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin, y=y,
                           attn_backend="xla")
    pe_lim = 0.05
    params["pose_patch_embedding"] = {
        "w": jnp.asarray(rng.uniform(-pe_lim, pe_lim,
                                     (16 * 4, cfg.dim)), jnp.float32),
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    params["face_adapter"] = stack_face_adapter(
        init_face_adapter(jax.random.key(4), cfg.dim, cfg.num_heads, 1),
        cfg.num_layers)
    pose = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    mv = jnp.asarray(rng.standard_normal((1, 3, 5, cfg.dim)), jnp.float32)
    o = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin, y=y,
                        attn_backend="xla", animate=(pose, mv))
    assert o.shape == base.shape
    assert not np.allclose(np.asarray(o), np.asarray(base))
    # pose-only (motion None) still changes output vs base
    o2 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin, y=y,
                         attn_backend="xla", animate=(pose, None))
    assert not np.allclose(np.asarray(o2), np.asarray(base))
    assert np.isfinite(np.asarray(o)).all()


def test_animate_loader_roundtrip():
    cfg = TINY
    adapters = init_face_adapter(jax.random.key(5), cfg.dim,
                                 cfg.num_heads, 1)
    fe = init_face_encoder(jax.random.key(6),
                           FaceEncoderConfig(in_dim=16, hidden_dim=80))
    sd = {}
    sd["pose_patch_embedding.weight"] = np.zeros((80, 16, 1, 2, 2),
                                                 np.float32)
    sd["pose_patch_embedding.bias"] = np.zeros(80, np.float32)
    for nm, tgt in (("conv1", "conv1_local"), ("conv2", "conv2"),
                    ("conv3", "conv3")):
        sd[f"face_encoder.{tgt}.conv.weight"] = \
            np.asarray(fe[nm]["w"]).transpose(2, 1, 0)
        sd[f"face_encoder.{tgt}.conv.bias"] = np.asarray(fe[nm]["b"])
    sd["face_encoder.out_proj.weight"] = \
        np.asarray(fe["out_proj"]["w"]).T
    sd["face_encoder.out_proj.bias"] = np.asarray(fe["out_proj"]["b"])
    sd["face_encoder.padding_tokens"] = np.asarray(fe["padding_tokens"])
    a = adapters[0]
    pre = "face_adapter.fuser_blocks.0"
    for nm in ("linear1_q", "linear1_kv", "linear2"):
        sd[f"{pre}.{nm}.weight"] = np.asarray(a[nm]["w"]).T
        sd[f"{pre}.{nm}.bias"] = np.asarray(a[nm]["b"])
    sd[f"{pre}.q_norm.weight"] = np.asarray(a["q_norm"])
    sd[f"{pre}.k_norm.weight"] = np.asarray(a["k_norm"])
    out, left = load_animate_params(sd, cfg.dim, cfg.num_layers,
                                    cfg.num_heads)
    assert left == []
    np.testing.assert_allclose(
        np.asarray(out["face_encoder"]["conv1"]["w"]),
        np.asarray(fe["conv1"]["w"]), atol=1e-6)
    assert out["face_adapter"]["active"].tolist() == [1, 0, 0, 0, 0]
    np.testing.assert_allclose(
        np.asarray(out["face_adapter"]["linear1_q"]["w"][0]),
        np.asarray(a["linear1_q"]["w"]), atol=1e-6)


def test_animate_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(7), cfg, jnp.float32)
    rng = np.random.default_rng(5)
    params["pose_patch_embedding"] = {
        "w": jnp.asarray(rng.uniform(-0.05, 0.05, (16 * 4, cfg.dim)),
                         jnp.float32),
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    params["motion_encoder"] = init_motion_encoder(
        jax.random.key(8), MotionEncoderConfig(size=16, dim=512,
                                               motion_dim=4))
    params["face_encoder"] = init_face_encoder(
        jax.random.key(9), FaceEncoderConfig(in_dim=512,
                                             hidden_dim=cfg.dim))
    params["face_adapter"] = stack_face_adapter(
        init_face_adapter(jax.random.key(10), cfg.dim, cfg.num_heads, 1),
        cfg.num_layers)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg,
                       vae_params=init_wan_vae(jax.random.key(11),
                                               vae_cfg),
                       vae_cfg=vae_cfg, attn_backend="xla",
                       base_model_type="animate")
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ref = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    pose = rng.standard_normal((9, 64, 64, 3)).astype(np.float32)
    face = rng.standard_normal((9, 16, 16, 3)).astype(np.float32)
    lat = pipe.generate_animate(
        "", ref_image=ref, pose_video=pose, face_video=face,
        width=64, height=64, frame_num=9,
        sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
