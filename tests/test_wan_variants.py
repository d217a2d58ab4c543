"""Wan-Alpha, ChronoEdit, ShotPlan variant mechanisms
(reference models/wan/alpha/utils.py, wan_handler.py:778,
models/wan/shotplan.py, shared/prompt_relay.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                       wan_dit_forward)
from wan2gp_tpu.models.wan.shotplan import (
    parse_prompt_relay, compile_shotplan_prompt, build_shotplan_injection)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=48, text_len=16,
                    compute_dtype=jnp.float32)


# -- ShotPlan ---------------------------------------------------------------

def test_parse_prompt_relay():
    plan = parse_prompt_relay(
        "A woman in a red coat.\n"
        "[0%:33%] Wide shot.\n[33%:66%] Medium shot.\n[66%:] Close-up.")
    assert plan.global_prompt == "A woman in a red coat."
    assert len(plan.segments) == 3
    assert plan.segments[0].start.unit == "percent"
    assert plan.segments[2].end is None
    assert parse_prompt_relay("no markers here") is None
    # seconds + frame bounds
    plan2 = parse_prompt_relay("[0s:2s] a\n[2s:] b")
    assert plan2.segments[0].end.unit == "seconds"
    plan3 = parse_prompt_relay("[1:41] a\n[41:] b")
    assert plan3.segments[0].start.unit == "frame"


def test_compile_shotplan_prompt():
    sp = compile_shotplan_prompt(
        "Global style.\n[0%:50%] First.\n[50%:] Second.", 81, 16.0)
    assert sp.prompt == "Global style.\nShot 1: First.\nShot 2: Second."
    assert sp.cut_frames == (40,)
    # non-relay prompt passes through
    sp2 = compile_shotplan_prompt("plain prompt", 81, 16.0)
    assert sp2.prompt == "plain prompt" and sp2.cut_frames == ()
    with pytest.raises(ValueError):
        compile_shotplan_prompt("[10%:50%] a\n[50%:] b", 81, 16.0)
    with pytest.raises(ValueError):
        compile_shotplan_prompt("[0%:40%] a\n[60%:] b", 81, 16.0)


def test_shotplan_injection_maps():
    grid = (3, 2, 2)
    cos, sin = build_rope_3d(grid, head_dim=32)
    inj = build_shotplan_injection(grid, (4,), cos, sin, head_dim=32)
    s = 4
    L = 3 * s
    assert inj.n_cut == 1
    assert inj.src_map.shape == (L + 1,)
    assert inj.keep_idx.shape == (L,)
    # cut at output frame 4 -> position 2.0 -> after latent frame 1
    assert inj.src_map[2 * s].item() == L       # the injected token slot
    # gathering originals back through keep_idx is the identity
    x = np.arange(L)[None, :, None].astype(np.float32)
    xc = np.concatenate([x, np.full((1, 1, 1), -1, np.float32)], axis=1)
    xp = xc[:, inj.src_map]
    np.testing.assert_allclose(xp[:, inj.keep_idx, 0], x[..., 0])
    # injected rope row: zero spatial phase (cos 1 / sin 0 on spatial
    # dims — for head_dim 32 the split is (16, 8, 8) -> last 8 entries)
    row = np.asarray(inj.cos[2 * s])
    assert np.allclose(row[-8:], 1.0)
    assert inj.cos.shape[0] == L + 1


def test_shotplan_forward_and_pipeline():
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    params["hardcut_embedding"] = jax.random.normal(
        jax.random.key(1), (1, 1, cfg.dim), jnp.float32) * 0.1
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 3, 8, 8)),
                      jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    grid = (3, 4, 4)
    cos, sin = build_rope_3d(grid, head_dim=cfg.head_dim)
    t = jnp.full((1,), 500.0)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    inj = build_shotplan_injection(grid, (4,), cos, sin,
                                   head_dim=cfg.head_dim)
    o = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                        attn_backend="xla", shotplan=inj)
    assert o.shape == base.shape
    assert not np.allclose(np.asarray(o), np.asarray(base))
    assert np.isfinite(np.asarray(o)).all()

    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    pipe = WanPipeline(params, cfg, attn_backend="xla",
                       base_model_type="shotplan_t2v")
    out = pipe.generate_shotplan(
        "[0%:50%] a cat.\n[50%:] a dog.", width=64, height=64,
        frame_num=9, sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert out.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


# -- ChronoEdit -------------------------------------------------------------

def test_chrono_edit_rope_positions():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline
    cfg = TINY
    params = init_wan_dit(jax.random.key(2), cfg, jnp.float32)
    pipe = WanPipeline(params, cfg, attn_backend="xla",
                       base_model_type="chrono_edit")
    cos, sin = pipe._rope((1, 16, 2, 32, 32))
    s = 16 * 16
    assert cos.shape[0] == 2 * s
    # frame 0 rows match standard rope frame 0; frame 1 rows match frame 7
    full_cos, _ = build_rope_3d((8, 16, 16), head_dim=cfg.head_dim)
    np.testing.assert_allclose(np.asarray(cos[:s]),
                               np.asarray(full_cos[:s]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(cos[s:]),
                               np.asarray(full_cos[7 * s:8 * s]),
                               atol=1e-7)


# -- Wan-Alpha --------------------------------------------------------------

def test_alpha_dual_vae_generate():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(3), cfg, jnp.float32)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg,
                       vae_params=init_wan_vae(jax.random.key(4), vae_cfg),
                       vae_cfg=vae_cfg, attn_backend="xla",
                       base_model_type="alpha")
    pipe.vae_params_alpha = init_wan_vae(jax.random.key(5), vae_cfg)
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    rgba = pipe.generate_alpha(
        "", width=64, height=64, frame_num=5,
        sampling=SamplingConfig(steps=2, guide_scale=1.0),
        context=ctx)
    assert rgba.shape[-1] == 4
    assert np.isfinite(np.asarray(rgba)).all()
    # different alpha VAE -> alpha channel differs from rgb mean
    assert not np.allclose(np.asarray(rgba[..., 3]),
                           np.asarray(rgba[..., :3].mean(-1)))


def test_alpha_gauss_shift():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    cfg = TINY
    params = init_wan_dit(jax.random.key(6), cfg, jnp.float32)
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    vp = init_wan_vae(jax.random.key(7), vae_cfg)
    pipe = WanPipeline(params, cfg, vae_params=vp, vae_cfg=vae_cfg,
                       attn_backend="xla", base_model_type="alpha2")
    pipe.vae_params_alpha = vp
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    mask = np.zeros((5, 16, 16), np.float32)   # all-outside -> +0.03
    r1 = pipe.generate_alpha("", width=64, height=64, frame_num=5,
                             sampling=SamplingConfig(steps=2,
                                                     guide_scale=1.0),
                             context=ctx)
    r2 = pipe.generate_alpha("", width=64, height=64, frame_num=5,
                             sampling=SamplingConfig(steps=2,
                                                     guide_scale=1.0),
                             gauss_mask=mask, context=ctx)
    assert not np.allclose(np.asarray(r1), np.asarray(r2))


def test_rgba_zip_and_checkerboard():
    from wan2gp_tpu.utils import media
    import zipfile, tempfile, os
    rng = np.random.default_rng(3)
    rgba = rng.integers(0, 255, (3, 16, 16, 4), dtype=np.uint8)
    with tempfile.TemporaryDirectory() as d:
        p = media.save_rgba_zip(rgba, os.path.join(d, "out.zip"),
                                metadata={"prompt": "x"})
        with zipfile.ZipFile(p) as zf:
            names = zf.namelist()
            assert "img_000.png" in names and "settings.json" in names
            assert len([n for n in names if n.endswith(".png")]) == 3
    comp = media.composite_checkerboard(rgba)
    assert comp.shape == (3, 16, 16, 3) and comp.dtype == np.uint8
    # fully transparent pixel shows the checkerboard
    rgba2 = rgba.copy()
    rgba2[..., 3] = 0
    comp2 = media.composite_checkerboard(rgba2)
    assert set(np.unique(comp2)) <= {113, 140}


# -- Wan-Move ---------------------------------------------------------------

def test_wanmove_tracks_to_latent_pos():
    from wan2gp_tpu.models.wan.wanmove import (tracks_to_latent_pos,
                                               replace_track_features)
    # 9 frames, 2 tracks; track 0 moves right, track 1 leaves the frame
    t, n = 9, 2
    tracks = np.zeros((t, n, 2), np.float64)
    tracks[:, 0, 0] = np.linspace(8, 56, t)     # x
    tracks[:, 0, 1] = 16.0                      # y
    tracks[:, 1, 0] = np.linspace(8, 200, t)    # exits width 64
    tracks[:, 1, 1] = 8.0
    pos = tracks_to_latent_pos(tracks, height=32, width=64,
                               strides=(4, 8, 8))
    assert pos.shape == (2, 3, 2)
    # sample strategy: frames 0, 4, 8
    np.testing.assert_array_equal(pos[0, :, 0], [2, 2, 2])      # y cell
    np.testing.assert_array_equal(pos[0, :, 1], [1, 4, 7])      # x cell
    assert pos[1, 2, 0] == -1                  # out of frame -> invalid
    # normalized tracks are scaled by (width, height); use the in-frame
    # track only (any out-of-range value disables the <=1 heuristic)
    pos_n = tracks_to_latent_pos(tracks[:, :1] / [64, 32], height=32,
                                 width=64)
    np.testing.assert_array_equal(pos_n[0], pos[0])

    feat = np.zeros((3, 3, 4, 8), np.float32)
    feat[:, 0, 2, 1] = [1.0, 2.0, 3.0]         # frame-0 source content
    out = replace_track_features(feat, pos)
    np.testing.assert_allclose(out[:, 1, 2, 4], [1.0, 2.0, 3.0])
    np.testing.assert_allclose(out[:, 2, 2, 7], [1.0, 2.0, 3.0])
    # original tensor untouched, other cells untouched
    assert feat[0, 1, 2, 4] == 0.0
    assert out[0, 1, 0, 0] == 0.0


def test_wanmove_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    import dataclasses
    cfg = dataclasses.replace(TINY, model_type="i2v", in_dim=36)
    params = init_wan_dit(jax.random.key(8), cfg, jnp.float32)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg,
                       vae_params=init_wan_vae(jax.random.key(9), vae_cfg),
                       vae_cfg=vae_cfg, attn_backend="xla",
                       base_model_type="wanmove")
    rng = np.random.default_rng(4)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    img = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    tracks = np.zeros((9, 1, 2), np.float64)
    tracks[:, 0, 0] = np.linspace(8, 56, 9)
    tracks[:, 0, 1] = 32.0
    lat = pipe.generate_wanmove(
        "", tracks=tracks, image_start=img, width=64, height=64,
        frame_num=9, sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


# -- SteadyDancer -----------------------------------------------------------

def test_steadydancer_modules():
    from wan2gp_tpu.models.wan.steadydancer import (
        init_steadydancer_modules, steadydancer_fuse, dy_dims)
    # reference geometry: inp == oup == 16 -> dim 4, squeeze 4
    assert dy_dims(16, 16) == (1, 4, 4)
    p = init_steadydancer_modules(jax.random.key(0), dim=96, in_dim=36)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    xn = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    fused, aligned = steadydancer_fuse(p, cond, xn)
    assert fused.shape == cond.shape and aligned.shape == cond.shape
    assert np.isfinite(np.asarray(fused)).all()
    assert np.isfinite(np.asarray(aligned)).all()
    # alignment depends on the noisy latents (the point of the unit)
    _, aligned2 = steadydancer_fuse(p, cond, xn * -1.0)
    assert not np.allclose(np.asarray(aligned), np.asarray(aligned2))


def test_steadydancer_dy_module_torch_oracle():
    """DYModule vs inline torch re-derivation (mobilenetv2_dcd.py:17-72:
    SE-gated dynamic phi matmul + scale, GroupNorm(4))."""
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.wan.steadydancer import (init_dy_module,
                                                    dy_module_forward)
    p = init_dy_module(jax.random.key(1))
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 8, 8)).astype(np.float32)
    ours = np.asarray(dy_module_forward(p, jnp.asarray(x)))

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def hsig(v):
        return F.relu6(v + 3.0) / 6.0

    def gn(v, w, b):
        return F.group_norm(v, 4, t(w), t(b))

    with torch.no_grad():
        xt = t(x)
        r = F.conv2d(xt, t(p["conv"]))
        y = F.adaptive_avg_pool2d(xt, 1).view(2, 16)
        y = y @ t(p["fc"])
        y = y * hsig(y @ t(p["fc_se"]))
        phi = (y @ t(p["fc_phi"])).view(2, 4, 4)
        scale = hsig(y @ t(p["fc_scale"])).view(2, -1, 1, 1)
        r = scale * r
        q = gn(F.conv2d(xt, t(p["conv_q"])), p["gn1"]["w"], p["gn1"]["b"])
        qf = q.view(2, 4, 64)
        qf = gn(torch.matmul(phi, qf), p["gn2"]["w"], p["gn2"]["b"]) + qf
        want = (F.conv2d(qf.view(2, 4, 8, 8), t(p["conv_p"])) + r).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_steadydancer_forward_and_pipeline():
    import dataclasses
    from wan2gp_tpu.models.wan.steadydancer import init_steadydancer_modules
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = dataclasses.replace(TINY, model_type="i2v", in_dim=36)
    params = init_wan_dit(jax.random.key(2), cfg, jnp.float32)
    params.update(init_steadydancer_modules(jax.random.key(3), cfg.dim,
                                            in_dim=cfg.in_dim))
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((1, 20, 3, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    ref_x = jnp.asarray(rng.standard_normal((1, 36, 1, 8, 8)), jnp.float32)
    ref_c = jnp.asarray(rng.standard_normal((1, 16, 1, 8, 8)), jnp.float32)
    cos, sin = build_rope_3d((5, 4, 4), head_dim=cfg.head_dim)
    o = wan_dit_forward(params, cfg, lat, jnp.full((1,), 500.0), ctx,
                        cos, sin, y=y, attn_backend="xla",
                        steadydancer=(cond, ref_x, ref_c))
    assert o.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(o)).all()
    # pose condition steers the output
    o2 = wan_dit_forward(params, cfg, lat, jnp.full((1,), 500.0), ctx,
                         cos, sin, y=y, attn_backend="xla",
                         steadydancer=(cond * -1.0, ref_x, ref_c))
    assert not np.allclose(np.asarray(o), np.asarray(o2))

    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg,
                       vae_params=init_wan_vae(jax.random.key(4), vae_cfg),
                       vae_cfg=vae_cfg, attn_backend="xla",
                       base_model_type="steadydancer")
    pose = rng.standard_normal((9, 64, 64, 3)).astype(np.float32)
    src = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    out = pipe.generate_steadydancer(
        "", pose_video=pose, source_image=src, width=64, height=64,
        frame_num=9, sampling=SamplingConfig(steps=4, guide_scale=4.0),
        condition_guide_scale=2.0, context=ctx, context_null=ctx * 0,
        return_latents=True)
    assert out.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


# -- ReCamMaster ------------------------------------------------------------

def test_recam_camera_embedding():
    from wan2gp_tpu.models.wan.recam import (
        parse_matrix, camera_embedding_from_json, get_camera_embedding,
        CAMERA_MODES)
    # parse_matrix on the reference's bracketed row format
    m = parse_matrix("[1 0 0 5] [0 1 0 6] [0 0 1 7] [0 0 0 1]")
    assert m.shape == (4, 4) and m[0, 3] == 5 and m[2, 3] == 7
    # identical extrinsics on every frame -> every relative pose is the
    # identity [I | 0] (cammmaster_tools.py get_relative_pose)
    mat = "[0 1 0 10] [0 0 1 20] [1 0 0 30] [0 0 0 1]"
    data = {f"frame{i}": {"cam01": mat} for i in range(81)}
    emb = camera_embedding_from_json(data, 1, 81)
    assert emb.shape == (21, 12)
    ident = np.eye(4)[:3].reshape(-1)
    np.testing.assert_allclose(emb, np.tile(ident, (21, 1)), atol=1e-6)
    # procedural fallback: every mode produces [21, 12] with an identity
    # first row and non-trivial later rows
    for mode in CAMERA_MODES:
        e = get_camera_embedding(mode, 81)
        assert e.shape == (21, 12)
        np.testing.assert_allclose(e[0], ident, atol=1e-6)
        assert np.abs(e[-1] - ident).max() > 1e-3
    # zoom-in translates forward monotonically more than zoom-out
    zin = get_camera_embedding(5, 81)
    zout = get_camera_embedding(6, 81)
    assert zin[-1, 11] * zout[-1, 11] < 0  # opposite z translations


def test_recam_loader_roundtrip_and_frame_map():
    import torch
    from wan2gp_tpu.models.wan.recam import (load_recam_blocks,
                                             build_cam_frame_map)
    L, dim = 3, 16
    sd = {}
    rng = np.random.default_rng(0)
    for i in range(L):
        sd[f"blocks.{i}.cam_encoder.weight"] = rng.normal(
            size=(dim, 12)).astype(np.float32)
        sd[f"blocks.{i}.cam_encoder.bias"] = rng.normal(
            size=(dim,)).astype(np.float32)
        sd[f"blocks.{i}.projector.weight"] = rng.normal(
            size=(dim, dim)).astype(np.float32)
        sd[f"blocks.{i}.projector.bias"] = rng.normal(
            size=(dim,)).astype(np.float32)
    keep = {k: v.copy() for k, v in sd.items()}
    p = load_recam_blocks(sd, L)
    assert not sd
    # jax linear x @ W == torch Linear(weight)(x)
    x = rng.normal(size=(2, 12)).astype(np.float32)
    got = np.asarray(x @ np.asarray(p["cam_w"][1]) + np.asarray(p["cam_b"][1]))
    ref = torch.nn.functional.linear(
        torch.from_numpy(x), torch.from_numpy(keep["blocks.1.cam_encoder.weight"]),
        torch.from_numpy(keep["blocks.1.cam_encoder.bias"])).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # token map: doubled frame stack tiles the cam rows (model.py:639)
    fm = build_cam_frame_map(6, 3, 2, 2)
    assert fm.shape == (24,)
    np.testing.assert_array_equal(fm[:4], 0)
    np.testing.assert_array_equal(fm[12:16], 0)  # source frames reuse rows


def test_recam_forward_and_scan():
    from wan2gp_tpu.models.wan.recam import init_recam_blocks
    from wan2gp_tpu.models.wan.pipeline import (recam_denoise_scan,
                                                make_schedule)
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    params["recam_blocks"] = init_recam_blocks(cfg.num_layers, cfg.dim)
    rng = np.random.default_rng(1)
    f_lat, h, w = 2, 4, 4
    x2 = jnp.asarray(rng.normal(size=(1, 16, 2 * f_lat, h, w)),
                     jnp.float32)
    t = jnp.asarray([500.0])
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    cos, sin = build_rope_3d((2 * f_lat, h // 2, w // 2),
                             head_dim=cfg.head_dim)
    cam = jnp.asarray(rng.normal(size=(21, 12)), jnp.float32)
    # zero cam encoder + identity projector == plain forward
    out_recam = wan_dit_forward(params, cfg, x2, t, ctx, cos, sin,
                                cam_emb=cam)
    plain = {k: v for k, v in params.items() if k != "recam_blocks"}
    out_plain = wan_dit_forward(plain, cfg, x2, t, ctx, cos, sin)
    np.testing.assert_allclose(np.asarray(out_recam),
                               np.asarray(out_plain), atol=1e-5)
    # non-zero camera encoder steers the output
    params["recam_blocks"]["cam_w"] = jnp.asarray(
        rng.normal(size=(cfg.num_layers, 12, cfg.dim)), jnp.float32) * 0.1
    out_cam = wan_dit_forward(params, cfg, x2, t, ctx, cos, sin,
                              cam_emb=cam)
    assert np.abs(np.asarray(out_cam) - np.asarray(out_plain)).max() > 1e-3
    # denoise scan: source concat on time, pred sliced back to f_lat
    schedule = make_schedule("unipc", 3, 3.0)
    lat = jnp.asarray(rng.normal(size=(1, 16, f_lat, h, w)), jnp.float32)
    src = jnp.asarray(rng.normal(size=(1, 16, f_lat, h, w)), jnp.float32)
    out = recam_denoise_scan(params, cfg, schedule, lat, ctx, ctx, src,
                             cam, 3.0, cos, sin)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_recam_pipeline_e2e():
    from wan2gp_tpu.models.wan.recam import init_recam_blocks
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(7), cfg, jnp.float32)
    params["recam_blocks"] = init_recam_blocks(cfg.num_layers, cfg.dim)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(9), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="recam_1.3B")
    rng = np.random.default_rng(8)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    src = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
    video = pipe.generate_recam(
        "", source_frames=src.clip(-1, 1), camera_mode=9,
        sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()


# -- MoCha ------------------------------------------------------------------

def test_mocha_mask_and_rope():
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.wan.mocha import (nearest_resize_2d,
                                             build_mocha_latents,
                                             build_mocha_rope)
    rng = np.random.default_rng(0)
    m = rng.random((30, 40)).astype(np.float32)
    got = nearest_resize_2d(m, 8, 10)
    ref = F.interpolate(torch.from_numpy(m)[None, None], size=(8, 10),
                        mode="nearest")[0, 0].numpy()
    np.testing.assert_allclose(got, ref)
    # conditioning stack layout: [source Ts | mask 1 | refs R]
    src = rng.normal(size=(1, 16, 3, 8, 10)).astype(np.float32)
    refs = [rng.normal(size=(1, 16, 1, 8, 10)).astype(np.float32)
            for _ in range(2)]
    ext = np.asarray(build_mocha_latents(src, m, refs))
    assert ext.shape == (1, 16, 6, 8, 10)
    np.testing.assert_allclose(ext[:, :, :3], src, atol=1e-6)
    # mask broadcast over channels
    assert np.allclose(ext[0, 0, 3], ext[0, 7, 3])
    np.testing.assert_allclose(ext[0, 0, 3], got, atol=1e-6)
    # rope segments: target/source/mask at t>=1, refs at t=0; second ref
    # spatially offset (any2video.py:398-410)
    T, Ts, h, w = 2, 3, 4, 5
    cos, sin = build_mocha_rope(T, Ts, 2, h, w, head_dim=32)
    s = h * w
    assert cos.shape == ((T + Ts + 1 + 2) * s, 16)
    single = build_rope_3d((1, h, w), head_dim=32, offsets=(1, 1, 1))[0]
    np.testing.assert_allclose(np.asarray(cos[:s]), np.asarray(single),
                               atol=1e-7)   # target frame 0 at t=1
    np.testing.assert_allclose(np.asarray(cos[T * s:(T + 1) * s]),
                               np.asarray(single), atol=1e-7)  # src t=1
    ref0 = build_rope_3d((1, h, w), head_dim=32, offsets=(0, 1, 1))[0]
    np.testing.assert_allclose(np.asarray(cos[(T + Ts + 1) * s:
                                              (T + Ts + 2) * s]),
                               np.asarray(ref0), atol=1e-7)
    ref1 = build_rope_3d((1, h, w), head_dim=32,
                         offsets=(0, 1 + h, 1 + w))[0]
    np.testing.assert_allclose(np.asarray(cos[-s:]), np.asarray(ref1),
                               atol=1e-7)


def test_mocha_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(11), cfg, jnp.float32)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(12), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="mocha")
    rng = np.random.default_rng(9)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    src = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
    refs = [rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
            for _ in range(2)]
    mask = (rng.random((64, 64)) > 0.5).astype(np.float32)
    video = pipe.generate_mocha(
        "", source_frames=src.clip(-1, 1), mask_frame=mask,
        ref_images=refs, frame_num=5,
        sampling=SamplingConfig(steps=2, guide_scale=5.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()


# -- SVI2Pro ----------------------------------------------------------------

def test_svi_conditioning_and_generate():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16, in_dim=36,
                       compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(13), cfg, jnp.float32)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(14), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="i2v_2_2_svi2pro")
    rng = np.random.default_rng(10)
    ref = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    y, clip_fea = pipe.build_svi_conditioning(ref, 9, 64, 64)
    assert y.shape == (1, 20, 3, 8, 8) and clip_fea is None
    # mask marks only latent frame 0 (svi_mode=2, any2video.py:746)
    msk = np.asarray(y[0, :4])
    assert msk[:, 0].min() == 1.0 and msk[:, 1:].max() == 0.0
    # frame 0 carries the ref's latent, later cond frames are zero
    ref_lat = np.asarray(pipe.encode_video(ref[None]))
    np.testing.assert_allclose(np.asarray(y[:, 4:, :1]), ref_lat,
                               atol=1e-5)
    assert np.abs(np.asarray(y[0, 4:, 1:])).max() == 0.0
    # end-frame anchor fills the last frame and flips its mask bit
    end = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    y2, _ = pipe.build_svi_conditioning(ref, 9, 64, 64, image_end=end)
    assert np.abs(np.asarray(y2[0, 4:, -1])).max() > 0.0
    assert np.asarray(y2[0, :4])[:, -1].max() == 1.0
    # overlap latents slot in after the ref frame
    ov = rng.standard_normal((1, 16, 1, 8, 8)).astype(np.float32)
    y3, _ = pipe.build_svi_conditioning(ref, 9, 64, 64,
                                        overlap_latents=ov)
    np.testing.assert_allclose(np.asarray(y3[:, 4:, 1:2]), ov, atol=1e-6)
    # end-to-end through generate(i2v_cond=...)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    video = pipe.generate("", width=64, height=64, frame_num=9,
                          sampling=SamplingConfig(steps=2,
                                                  guide_scale=5.0),
                          context=ctx, context_null=ctx * 0,
                          i2v_cond=(y, clip_fea))
    assert video.shape == (9, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()


# -- SCAIL ------------------------------------------------------------------

def test_scail_pose_rope_and_masks():
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.wan.scail import (build_scail_pose_rope,
                                             build_scail_masks,
                                             scail_pose_input)
    t, h, w, hd = 2, 6, 8, 32
    cos, sin = build_scail_pose_rope(t, h, w, head_dim=hd)
    assert cos.shape == (t * (h // 2) * (w // 2), hd // 2)
    # oracle: full-res table with offsets (1, 0, 120) then avg_pool2d
    full_cos, _ = build_rope_3d((t, h, w), head_dim=hd,
                                offsets=(1, 0, 120))
    f4 = torch.from_numpy(np.asarray(full_cos)).view(t, h, w, hd // 2)
    pooled = F.avg_pool2d(f4.permute(0, 3, 1, 2), 2, 2)
    pooled = pooled.permute(0, 2, 3, 1).reshape(-1, hd // 2).numpy()
    np.testing.assert_allclose(np.asarray(cos), pooled, atol=1e-6)
    # masks: ref frame kept, control frames generated
    y = np.asarray(build_scail_masks(3, 4, 5))
    assert y.shape == (1, 4, 4, 4, 5)
    assert y[0, :, 0].min() == 1.0 and y[0, :, 1:].max() == 0.0
    # pose input gains the all-ones 4-ch mask (model_scail.py:27-35)
    z = np.zeros((1, 16, 2, 4, 5), np.float32)
    pi = np.asarray(scail_pose_input(z))
    assert pi.shape == (1, 20, 2, 4, 5)
    assert pi[0, 16:].min() == 1.0 and pi[0, :16].max() == 0.0


def test_scail_forward_token_append():
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16, in_dim=20,
                       model_type="i2v", compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(20), cfg, jnp.float32)
    cin = 20 * 4
    params["pose_patch_embedding"] = {
        "w": jax.random.normal(jax.random.key(21), (cin, cfg.dim),
                               jnp.float32) * 0.02,
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    rng = np.random.default_rng(3)
    f_lat, h, w = 3, 8, 8
    lat = jnp.asarray(rng.normal(size=(1, 16, f_lat, h, w)), jnp.float32)
    y = jnp.asarray(rng.normal(size=(1, 4, f_lat, h, w)), jnp.float32)
    pose = jnp.asarray(rng.normal(size=(1, 20, 2, h // 2, w // 2)),
                       jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 8, cfg.text_dim)), jnp.float32)
    clip = jnp.asarray(rng.normal(size=(1, 257, 1280)), jnp.float32)
    from wan2gp_tpu.models.wan.scail import build_scail_pose_rope
    m_cos, m_sin = build_rope_3d((f_lat, h // 2, w // 2),
                                 head_dim=cfg.head_dim)
    p_cos, p_sin = build_scail_pose_rope(2, h // 2, w // 2,
                                         head_dim=cfg.head_dim)
    cos = jnp.concatenate([m_cos, p_cos]); sin = jnp.concatenate([m_sin, p_sin])
    t = jnp.asarray([400.0])
    out = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin, y=y,
                          clip_fea=clip, scail_pose=pose)
    assert out.shape == (1, 16, f_lat, h, w)
    # pose content changes the output (tokens really attend)
    out2 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin, y=y,
                           clip_fea=clip, scail_pose=pose * 0.0)
    assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6


def test_scail_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16, in_dim=20,
                       model_type="i2v", compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(22), cfg, jnp.float32)
    params["pose_patch_embedding"] = {
        "w": jax.random.normal(jax.random.key(23), (20 * 4, cfg.dim),
                               jnp.float32) * 0.02,
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(24), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="scail")
    rng = np.random.default_rng(4)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ref = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    pose = rng.standard_normal((5, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    video = pipe.generate_scail(
        "", ref_image=ref, pose_video=pose,
        sampling=SamplingConfig(steps=2, guide_scale=5.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()


# -- SCAIL-2 ----------------------------------------------------------------

def test_scail2_mask_compression():
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.wan.scail2 import (compress_mask_to_latent,
                                              adaptive_avg_pool_2d)
    rng = np.random.default_rng(5)
    # adaptive pooling matches torch mode='area'
    x = rng.random((2, 3, 13, 17)).astype(np.float32)
    got = adaptive_avg_pool_2d(x, 5, 6)
    ref = F.interpolate(torch.from_numpy(x), size=(5, 6),
                        mode="area").numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # full compression against a torch oracle re-deriving
    # scail2/__init__.py:140-182
    t, h, w = 6, 32, 24
    m = rng.choice([-1.0, 1.0], size=(t, h, w, 3)).astype(np.float32)
    got = compress_mask_to_latent(m)
    mk = torch.from_numpy(m).permute(0, 3, 1, 2).float()
    thr = (225.0 - 127.5) / 127.5
    r, g, b = [(mk[:, i:i + 1] > thr).float() for i in range(3)]
    nr, ng, nb = 1 - r, 1 - g, 1 - b
    b7 = torch.cat([r * g * b, r * ng * nb, nr * g * nb, nr * ng * b,
                    r * g * nb, r * ng * b, nr * g * b], dim=1)
    hl, wl = h, w
    for _ in range(3):
        hl, wl = (hl + 1) // 2, (wl + 1) // 2
    b7 = F.interpolate(b7, size=(hl, wl), mode="area")
    t_lat = (t - 1) // 4 + 1
    pad = torch.cat([b7[:1].repeat(4, 1, 1, 1), b7[1:]], dim=0)
    if pad.shape[0] < t_lat * 4:
        pad = torch.cat([pad, pad[-1:].repeat(t_lat * 4 - pad.shape[0],
                                              1, 1, 1)])
    ref28 = pad[:t_lat * 4].view(t_lat, 28, hl, wl).permute(
        1, 0, 2, 3).numpy()
    assert got.shape == (28, t_lat, hl, wl)
    np.testing.assert_allclose(got, ref28, rtol=1e-5, atol=1e-6)


def test_scail2_forward_and_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16, in_dim=20,
                       model_type="i2v", compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(30), cfg, jnp.float32)
    params["pose_patch_embedding"] = {
        "w": jax.random.normal(jax.random.key(31), (20 * 4, cfg.dim),
                               jnp.float32) * 0.02,
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    params["mask_patch_embedding"] = {
        "w": jax.random.normal(jax.random.key(32), (28 * 4, cfg.dim),
                               jnp.float32) * 0.02,
        "b": jnp.zeros((cfg.dim,), jnp.float32)}
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(33), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="scail2_14B")
    rng = np.random.default_rng(6)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ref = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    ref_mask = np.ones((64, 64, 3), np.float32)    # white = person
    pose = rng.standard_normal((5, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    video = pipe.generate_scail2(
        "", ref_image=ref, ref_mask=ref_mask, pose_video=pose,
        sampling=SamplingConfig(steps=2, guide_scale=5.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()
    # replace mode uses the offset ref rope and still runs
    lat = pipe.generate_scail2(
        "", ref_image=ref, ref_mask=ref_mask, pose_video=pose,
        replace=True, sampling=SamplingConfig(steps=2, guide_scale=1.0),
        context=ctx, return_latents=True)
    assert lat.shape == (1, 16, 2, 8, 8)


# -- Bernini ----------------------------------------------------------------

def test_bernini_branches_and_source_rope():
    import torch
    from wan2gp_tpu.models.wan.bernini import (bernini_branch_defs,
                                               sources_for_key,
                                               rotate_rope_source)
    # branch decomposition (any2video.py:1569-1578)
    defs = bernini_branch_defs(True, True, 2.0, 1.5, 5.0)
    assert [d[0] for d in defs] == [-1.0, 0.5, -3.5, 5.0]
    assert [d[1] for d in defs] == ["", "V", "VI", "VI"]
    assert [d[2] for d in defs] == [False, False, False, True]
    assert sum(d[0] for d in defs) == 1.0
    # zero-coefficient branches dropped; V-only case
    defs2 = bernini_branch_defs(True, False, 1.0, 1.0, 1.0)
    assert defs2 == [(1.0, "V", True)]
    # source ids: V 1..nv; I 1..ni; VI videos then images
    v = ["v0"]; im = ["i0", "i1"]
    assert sources_for_key("V", v, im) == [("v0", 1)]
    assert sources_for_key("I", v, im) == [("i0", 1), ("i1", 2)]
    assert sources_for_key("VI", v, im) == [("v0", 1), ("i0", 2),
                                            ("i1", 3)]
    # source rotation == torch angle-addition oracle
    cos, sin = build_rope_3d((2, 2, 2), head_dim=32)
    rc, rs = rotate_rope_source(cos, sin, 3)
    d2 = 16
    inv = 1.0 / (10000.0 ** (np.arange(d2) / d2))
    sc, ss = np.cos(3 * inv), np.sin(3 * inv)
    c = torch.from_numpy(np.asarray(cos)).double()
    s = torch.from_numpy(np.asarray(sin)).double()
    np.testing.assert_allclose(np.asarray(rc),
                               (c * sc - s * ss).numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(rs),
                               (s * sc + c * ss).numpy(), atol=1e-6)
    assert rotate_rope_source(cos, sin, 0) == (cos, sin)


def test_bernini_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(40), cfg, jnp.float32)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(41), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="bernini")
    rng = np.random.default_rng(7)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ctrl = rng.standard_normal((5, 64, 64, 3)).astype(np.float32).clip(-1, 1)
    ref = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    video = pipe.generate_bernini(
        "", control_video=ctrl, ref_images=[ref], width=64, height=64,
        frame_num=5, omega_v=2.0, omega_i=1.5,
        sampling=SamplingConfig(steps=2, guide_scale=5.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()
    # text-only degenerate case still works (plain 2-branch CFG)
    lat = pipe.generate_bernini(
        "", width=64, height=64, frame_num=5,
        sampling=SamplingConfig(steps=2, guide_scale=4.0),
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 2, 8, 8)


# -- Vista4D ----------------------------------------------------------------

def test_vista4d_plucker_and_masks():
    import torch
    from einops import rearrange
    from wan2gp_tpu.models.wan.vista4d import (get_plucker_embedding,
                                               pack_masks,
                                               build_vista_rope)
    rng = np.random.default_rng(11)
    b, f, H, W, hd, wd = 1, 3, 64, 96, 8, 12
    intr = np.stack([np.full((b, f), 60.0), np.full((b, f), 60.0),
                     np.full((b, f), W / 2), np.full((b, f), H / 2)],
                    axis=-1).astype(np.float64)
    c2w = np.tile(np.eye(4), (b, f, 1, 1))
    c2w[..., :3, 3] = rng.normal(size=(b, f, 3))
    got = get_plucker_embedding(intr, c2w, H, W, hd, wd)
    # torch oracle re-deriving camera.py:6-56
    ti = torch.from_numpy(intr)
    tc = torch.from_numpy(c2w)
    jj, ii = torch.meshgrid(torch.arange(hd).double(),
                            torch.arange(wd).double(), indexing="ij")
    pw_, ph_ = W / wd, H / hd
    i = (ii.reshape(1, 1, -1).expand(b, f, -1) + 0.5) * pw_ + pw_ / 2
    j = (jj.reshape(1, 1, -1).expand(b, f, -1) + 0.5) * ph_ + ph_ / 2
    fx, fy, cx, cy = ti.chunk(4, dim=-1)
    zs = torch.ones_like(i)
    xs = (i - cx) / fx * zs
    ys = (j - cy) / fy * zs
    dirs = torch.stack((xs, ys, zs.expand_as(ys)), dim=-1)
    dirs = dirs / dirs.norm(dim=-1, keepdim=True)
    rays_d = dirs @ tc[..., :3, :3].transpose(-1, -2)
    rays_o = tc[..., :3, 3][:, :, None].expand_as(rays_d)
    ref = torch.cat([torch.cross(rays_o, rays_d, dim=-1), rays_d],
                    dim=-1).reshape(b, f, hd, wd, 6).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)
    # mask packing == einops fold oracle (preprocess.py:675-681)
    t, hh, ww = 5, 16, 24
    am = rng.random((t, hh, ww)).astype(np.float32)
    mm = rng.random((t, hh, ww)).astype(np.float32)
    got_m = np.asarray(pack_masks(am, mm))
    m = torch.from_numpy(np.stack((am, mm), 0)[None])
    m = torch.cat([m[:, :, :1].repeat_interleave(4, dim=2), m[:, :, 1:]],
                  dim=2)
    ref_m = rearrange(m, "b c (f sf) (h sh) (w sw) -> b (c sf sh sw) f h w",
                      sf=4, sh=8, sw=8).numpy()
    assert got_m.shape == (1, 512, 2, 2, 3)
    np.testing.assert_allclose(got_m, ref_m, atol=1e-6)
    # rope: 3 segments, temporal offsets (0, 31, 62) for small grids
    cos, sin = build_vista_rope(2, 3, 4, head_dim=32)
    s = 2 * 3 * 4
    assert cos.shape == (3 * s, 16)
    seg = build_rope_3d((2, 3, 4), head_dim=32, offsets=(31, 0, 0))[0]
    np.testing.assert_allclose(np.asarray(cos[s:2 * s]),
                               np.asarray(seg), atol=1e-7)


def test_vista4d_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.models.wan.recam import init_recam_blocks
    from wan2gp_tpu.models.wan.vista4d import init_vista_encoder
    cfg = TINY
    params = init_wan_dit(jax.random.key(50), cfg, jnp.float32)
    rb = init_recam_blocks(cfg.num_layers, cfg.dim)
    rb["cam_w"] = jax.random.normal(jax.random.key(51),
                                    (cfg.num_layers, 6, cfg.dim),
                                    jnp.float32) * 0.02
    params["recam_blocks"] = rb
    params["vista_encoder"] = init_vista_encoder(
        cfg.dim, params["patch_embedding"])
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(52), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="vista4d")
    rng = np.random.default_rng(12)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    T, H, W = 5, 64, 64
    src = rng.standard_normal((T, H, W, 3)).astype(np.float32).clip(-1, 1)
    pc = rng.standard_normal((T, H, W, 3)).astype(np.float32).clip(-1, 1)
    c2w = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
    intr = np.tile(np.asarray([60, 60, 32, 32], np.float32), (T, 1))
    video = pipe.generate_vista4d(
        "", source_video=src, point_cloud_video=pc, cam_c2w=c2w,
        intrinsics=intr, sampling=SamplingConfig(steps=2,
                                                 guide_scale=5.0),
        context=ctx, context_null=ctx * 0)
    assert video.shape == (T, H, W, 3)
    assert np.isfinite(np.asarray(video)).all()


# -- Kiwi Edit --------------------------------------------------------------

def test_kiwi_mllm_and_embedder():
    import torch
    from wan2gp_tpu.models.wan.kiwi import (KiwiMLLMConfig,
                                            init_kiwi_mllm,
                                            kiwi_mllm_encode,
                                            load_kiwi_mllm_params,
                                            init_kiwi_embedder,
                                            load_kiwi_embedder,
                                            embed_kiwi_condition)
    from wan2gp_tpu.models.qwen.text_encoder import (QwenLMConfig,
                                                     init_qwen_lm)
    lm_cfg = QwenLMConfig(vocab_size=128, dim=32, n_layers=2, n_heads=4,
                          n_kv_heads=2, head_dim=8, ffn_dim=64,
                          compute_dtype=jnp.float32)
    lm = init_qwen_lm(jax.random.key(0), lm_cfg)
    kcfg = KiwiMLLMConfig(hidden_size=32, dit_dim=24,
                          num_image_queries=3, num_video_queries=5,
                          num_ref_queries=7)
    kp = init_kiwi_mllm(jax.random.key(1), kcfg)

    class Tok:
        def __call__(self, texts, n):
            ids = np.ones((len(texts), 6), np.int32)
            return ids, np.ones_like(ids)

    rng = np.random.default_rng(0)
    vf = rng.normal(size=(4, 32)).astype(np.float32)
    # video mode -> num_video_queries context rows
    ctx = kiwi_mllm_encode(lm, lm_cfg, kp, kcfg, Tok(), "edit it",
                           video_feats=vf)
    assert ctx.shape == (1, 5, 24)
    # zero-init connector fc2 -> context is the fc2 bias (zeros)
    np.testing.assert_allclose(np.asarray(ctx), 0.0, atol=1e-6)
    # ref mode -> ref span rows prepend to ref-query rows
    rf = rng.normal(size=(2, 32)).astype(np.float32)
    ctx2 = kiwi_mllm_encode(lm, lm_cfg, kp, kcfg, Tok(), "edit it",
                            video_feats=vf, ref_feats=rf)
    assert ctx2.shape == (1, 2 + 7, 24)
    # loader roundtrip against torch-keyed sd
    sd = {"image_queries": rng.normal(size=(3, 32)).astype(np.float32),
          "video_queries": rng.normal(size=(5, 32)).astype(np.float32),
          "ref_queries": rng.normal(size=(7, 32)).astype(np.float32)}
    for pre in ("connector", "ref_connector"):
        sd[f"{pre}.0.weight"] = rng.normal(size=(24, 32)).astype(np.float32)
        sd[f"{pre}.0.bias"] = rng.normal(size=(24,)).astype(np.float32)
        sd[f"{pre}.2.weight"] = rng.normal(size=(24, 24)).astype(np.float32)
        sd[f"{pre}.2.bias"] = rng.normal(size=(24,)).astype(np.float32)
    lp, left = load_kiwi_mllm_params(sd, kcfg)
    assert left == []
    x = rng.normal(size=(1, 2, 32)).astype(np.float32)
    from wan2gp_tpu.models.wan.kiwi import _connector
    got = np.asarray(_connector(lp["connector"], jnp.asarray(x)))
    h = torch.nn.functional.linear(torch.from_numpy(x),
                                   torch.from_numpy(np.asarray(
                                       lp["connector"]["fc1"]["w"]).T),
                                   torch.from_numpy(np.asarray(
                                       lp["connector"]["fc1"]["b"])))
    h = torch.nn.functional.gelu(h, approximate="tanh")
    ref = torch.nn.functional.linear(h, torch.from_numpy(np.asarray(
        lp["connector"]["fc2"]["w"]).T), torch.from_numpy(np.asarray(
            lp["connector"]["fc2"]["b"]))).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    # embedder: conv-as-dense == torch Conv3d oracle
    emb_sd = {"patch_embedding.weight": rng.normal(
        size=(24, 48, 1, 2, 2)).astype(np.float32),
        "patch_embedding.bias": rng.normal(size=(24,)).astype(np.float32)}
    ep = load_kiwi_embedder(emb_sd)
    lat = rng.normal(size=(1, 48, 2, 4, 6)).astype(np.float32)
    tok = np.asarray(embed_kiwi_condition(ep, lat))
    conv = torch.nn.Conv3d(48, 24, (1, 2, 2), (1, 2, 2))
    conv.weight.data = torch.from_numpy(emb_sd["patch_embedding.weight"])
    conv.bias.data = torch.from_numpy(emb_sd["patch_embedding.bias"])
    ref_t = conv(torch.from_numpy(lat)).detach().numpy()  # [1,24,2,2,3]
    ref_t = ref_t.transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(tok, ref_t, rtol=1e-4, atol=1e-4)
    init_kiwi_embedder(jax.random.key(2), 48, 24)  # smoke


def test_kiwi_dit_and_pipeline():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.models.wan.kiwi import init_kiwi_embedder
    cfg = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=48, text_len=16,
                       compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(60), cfg, jnp.float32)
    rng = np.random.default_rng(13)
    f_lat, h, w = 2, 8, 8
    lat = jnp.asarray(rng.normal(size=(1, 16, f_lat, h, w)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 8, cfg.text_dim)), jnp.float32)
    t = jnp.asarray([600.0])
    cos, sin = build_rope_3d((f_lat, h // 2, w // 2),
                             head_dim=cfg.head_dim)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin)
    # source condition shifts output proportionally to sigma
    src = jnp.asarray(rng.normal(size=(1, f_lat, h // 2, w // 2,
                                       cfg.dim)), jnp.float32)
    o1 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         kiwi={"source": src, "ref_pad_first": False})
    assert not np.allclose(np.asarray(o1), np.asarray(base))
    # zero source == base
    o0 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         kiwi={"source": src * 0,
                               "ref_pad_first": False})
    np.testing.assert_allclose(np.asarray(o0), np.asarray(base),
                               atol=1e-5)
    # ref concat keeps the output frame count; both pad modes run
    cos3, sin3 = build_rope_3d((f_lat + 1, h // 2, w // 2),
                               head_dim=cfg.head_dim)
    ref = jnp.asarray(rng.normal(size=(1, 1, h // 2, w // 2, cfg.dim)),
                      jnp.float32)
    for pf in (False, True):
        o = wan_dit_forward(params, cfg, lat, t, ctx, cos3, sin3,
                            kiwi={"ref": ref, "ref_pad_first": pf})
        assert o.shape == base.shape
        assert np.isfinite(np.asarray(o)).all()
    # pipeline e2e with embedders
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(61), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="kiwi_edit")
    src_v = rng.standard_normal((5, 64, 64, 3)).astype(np.float32)
    refi = rng.standard_normal((64, 64, 3)).astype(np.float32).clip(-1, 1)
    se = init_kiwi_embedder(jax.random.key(62), 16, cfg.dim)
    re = init_kiwi_embedder(jax.random.key(63), 16, cfg.dim)
    video = pipe.generate_kiwi(
        context=ctx, context_null=ctx * 0,
        source_frames=src_v.clip(-1, 1), ref_image=refi,
        source_embedder=se, ref_embedder=re,
        sampling=SamplingConfig(steps=2, guide_scale=5.0))
    assert video.shape == (5, 64, 64, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_motion_designer_custom_guide_glue(tmp_path, monkeypatch):
    """custom_guide .npy + image_start path normalize into the
    _tracks/_image_start wanmove inputs (reference
    plugins/motion_designer/plugin.py:307-360)."""
    import os
    import numpy as np
    from PIL import Image
    from wan2gp_tpu.families.wan import WanFamilyHandler

    tracks = np.random.default_rng(0).uniform(
        0, 64, (9, 2, 2)).astype(np.float32)
    npy = str(tmp_path / "traj.npy")
    np.save(npy, tracks)
    img = str(tmp_path / "bg.png")
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(img)

    captured = {}

    class FakePipe:
        def generate_wanmove(self, **kw):
            captured.update(kw)
            return np.zeros((5, 16, 16, 3), np.uint8)

    merged = {"_model_def": {"wanmove_class": True},
              "custom_guide": npy, "image_start": [img],
              "prompt": "move", "num_inference_steps": 1}
    out = WanFamilyHandler.generate_video(FakePipe(), merged, 16, 16,
                                          5, seed=0)
    assert captured["tracks"].shape == (9, 2, 2)
    assert captured["image_start"].shape == (16, 16, 3)
    assert out["video"].shape[0] == 5
