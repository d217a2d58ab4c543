"""End-to-end pipeline test on tiny configs (random weights): the full
denoise scan + VAE decode must compile and produce finite outputs, and the
joint-CFG path must reduce to the guided combination of separate passes."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, wan_dit_forward
from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
from wan2gp_tpu.models.wan.pipeline import (
    WanPipeline, SamplingConfig, denoise_scan)
from wan2gp_tpu.schedulers import make_schedule
from wan2gp_tpu.ops.rope import build_rope_3d

DIT = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                   freq_dim=32, text_dim=48, text_len=16)
VAE = WanVAEConfig(dim=8, num_res_blocks=1)


def _setup():
    dit_params = init_wan_dit(jax.random.key(0), DIT)
    vae_params = init_wan_vae(jax.random.key(1), VAE)
    return WanPipeline(dit_params, DIT, vae_params=vae_params, vae_cfg=VAE,
                       attn_backend="xla")


def test_generate_end_to_end_tiny():
    pipe = _setup()
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    sampling = SamplingConfig(solver="unipc", steps=4, shift=5.0,
                              guide_scale=3.0)
    video = pipe.generate("x", width=32, height=32, frame_num=5,
                          sampling=sampling, seed=7, context=ctx,
                          context_null=ctxn)
    assert video.shape == (5, 32, 32, 3)
    v = np.asarray(video)
    assert np.isfinite(v).all() and np.abs(v).max() <= 1.0


def test_denoise_scan_matches_python_loop():
    """The scan must equal an eager per-step loop with explicit CFG."""
    from wan2gp_tpu.schedulers import init_solver_state, solver_step
    from wan2gp_tpu.guidance import cfg_combine

    dit_params = init_wan_dit(jax.random.key(0), DIT)
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=DIT.head_dim)
    sampling = SamplingConfig(solver="euler", steps=3, guide_scale=2.0)
    sched = make_schedule("euler", 3, shift=5.0)

    got = denoise_scan(dit_params, DIT, sched, lat, ctx, ctxn, sampling,
                       cos, sin, attn_backend="xla")

    x = lat
    state = init_solver_state(sched, x)
    for i in range(3):
        t = jnp.broadcast_to(sched.timesteps[i], (1,))
        vc = wan_dit_forward(dit_params, DIT, x, t, ctx, cos, sin,
                             attn_backend="xla")
        vu = wan_dit_forward(dit_params, DIT, x, t, ctxn, cos, sin,
                             attn_backend="xla")
        pred = vu + 2.0 * (vc - vu)
        x, state = solver_step(sched, i, sched.per_step(i), pred, x, state)
    # bf16 matmuls: joint-batched vs separate passes differ in rounding
    np.testing.assert_allclose(np.asarray(got), np.asarray(x), rtol=1e-2,
                               atol=1e-2)


def test_no_guidance_single_pass():
    pipe = _setup()
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    sampling = SamplingConfig(solver="causvid", steps=3, guide_scale=1.0)
    lat = pipe.generate("x", width=16, height=16, frame_num=1,
                        sampling=sampling, seed=1, context=ctx,
                        return_latents=True)
    assert lat.shape == (1, 16, 1, 2, 2)
    assert np.isfinite(np.asarray(lat)).all()


def test_cfg_star_and_apg_paths_compile():
    pipe = _setup()
    rng = np.random.default_rng(3)
    ctx = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 16, 48)), jnp.float32)
    for sampling in (
        SamplingConfig(solver="dpm++", steps=3, guide_scale=4.0,
                       cfg_star_switch=True, cfg_zero_step=0),
        SamplingConfig(solver="euler", steps=3, guide_scale=4.0,
                       apg_switch=True),
    ):
        lat = pipe.generate("x", width=16, height=16, frame_num=5,
                            sampling=sampling, seed=2, context=ctx,
                            context_null=ctxn, return_latents=True)
        assert np.isfinite(np.asarray(lat)).all()


def test_phantom_generation():
    """Phantom subject-reference path: ref latents appended + trimmed,
    dual-CFG formula (any2video.py:1610-1615)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from wan2gp_tpu.models.wan.pipeline import (
        WanPipeline, SamplingConfig, phantom_denoise_scan)
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d

    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                       freq_dim=16, text_dim=16, text_len=4,
                       compute_dtype=jnp.float32)
    params = init_wan_dit(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    refs = jnp.asarray(rng.standard_normal((16, 1, 8, 8)), jnp.float32)
    lat = jnp.asarray(rng.standard_normal((1, 16, 3, 8, 8)), jnp.float32)
    sched = make_schedule("unipc", 3, 5.0)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    out = phantom_denoise_scan(params, cfg, sched, lat, ctx, ctxn, refs,
                               guide_scale=7.5, guide_scale_img=5.0,
                               rope_cos=cos, rope_sin=sin,
                               attn_backend="xla")
    assert out.shape == (1, 16, 2, 8, 8)   # ref frame trimmed
    assert np.isfinite(np.asarray(out)).all()

    # with g_text = g_img = 1 the combine collapses to the pos_it branch
    out1 = phantom_denoise_scan(params, cfg, sched, lat, ctx, ctxn, refs,
                                guide_scale=1.0, guide_scale_img=1.0,
                                rope_cos=cos, rope_sin=sin,
                                attn_backend="xla")
    # manual reference loop: always refs appended + cond context
    from wan2gp_tpu.models.wan.dit import wan_dit_forward
    from wan2gp_tpu.schedulers import init_solver_state, solver_step
    x = lat.astype(jnp.float32)
    st = init_solver_state(sched, lat)
    for i in range(sched.num_steps):
        xi = jnp.concatenate([x[:, :, :-1], refs[None]], axis=2)
        t = jnp.broadcast_to(sched.timesteps[i], (1,))
        v = wan_dit_forward(params, cfg, xi, t, ctx, cos, sin,
                            attn_backend="xla")
        coeffs_i = {k: val[i] for k, val in sched.coeffs.items()}
        x, st = solver_step(sched, jnp.asarray(i), coeffs_i, v, x, st)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(x[:, :, :-1]),
                               rtol=1e-4, atol=1e-4)


def test_sequential_cfg_matches_joint():
    """sequential (memory-saving) CFG must produce the same latents as the
    joint batched pass."""
    import dataclasses
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg = DIT
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(11)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                       jnp.float32)
    cos, sin = build_rope_3d((2, 2, 2), head_dim=cfg.head_dim)
    sched = make_schedule("unipc", 2, shift=5.0)
    s_joint = SamplingConfig(solver="unipc", steps=2, guide_scale=3.0)
    s_seq = dataclasses.replace(s_joint, joint_pass=False)
    out_j = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_joint,
                         cos, sin, attn_backend="xla")
    out_s = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_seq,
                         cos, sin, attn_backend="xla")
    # joint batching changes matmul reduction order; equality is
    # tolerance-based, not bitwise
    np.testing.assert_allclose(np.asarray(out_j), np.asarray(out_s),
                               rtol=1e-2, atol=2e-3)


def test_sequential_cfg_host_loop_matches_scan():
    import dataclasses
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg = DIT
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(12)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                       jnp.float32)
    cos, sin = build_rope_3d((2, 2, 2), head_dim=cfg.head_dim)
    sched = make_schedule("unipc", 2, shift=5.0)
    s_scan = SamplingConfig(solver="unipc", steps=2, guide_scale=3.0,
                            joint_pass=False)
    s_host = dataclasses.replace(s_scan, host_loop=True)
    out_a = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_scan,
                         cos, sin, attn_backend="xla")
    out_b = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_host,
                         cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               rtol=1e-4, atol=1e-5)


def test_sequential_cfg_skip_schedule():
    """TeaCache-style skip schedules now work under sequential CFG: an
    all-calc schedule matches the no-schedule path exactly; a schedule
    with skips reuses per-branch block-stack residuals and matches the
    joint-pass skip path."""
    import dataclasses
    from wan2gp_tpu.models.wan.pipeline import SamplingConfig, denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg = DIT
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(13)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                      jnp.float32)
    ctxn = jnp.asarray(rng.standard_normal((1, cfg.text_len, cfg.text_dim)),
                       jnp.float32)
    cos, sin = build_rope_3d((2, 2, 2), head_dim=cfg.head_dim)
    sched = make_schedule("unipc", 4, shift=5.0)
    s_seq = SamplingConfig(solver="unipc", steps=4, guide_scale=3.0,
                           joint_pass=False)

    base = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_seq,
                        cos, sin, attn_backend="xla")
    all_calc = np.array([True, True, True, True])
    out_all = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_seq,
                           cos, sin, attn_backend="xla",
                           skip_schedule=all_calc)
    np.testing.assert_allclose(np.asarray(out_all), np.asarray(base),
                               rtol=1e-4, atol=1e-5)

    skips = np.array([True, False, True, False])
    out_seq = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_seq,
                           cos, sin, attn_backend="xla",
                           skip_schedule=skips)
    s_joint = dataclasses.replace(s_seq, joint_pass=True)
    out_joint = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_joint,
                             cos, sin, attn_backend="xla",
                             skip_schedule=skips)
    assert np.isfinite(np.asarray(out_seq)).all()
    # bf16 residual store vs the joint path's fp32 residuals
    np.testing.assert_allclose(np.asarray(out_seq), np.asarray(out_joint),
                               rtol=5e-2, atol=5e-2)

    # host-loop driver agrees with the scan driver under skips
    s_host = dataclasses.replace(s_seq, host_loop=True)
    out_host = denoise_scan(params, cfg, sched, lat, ctx, ctxn, s_host,
                            cos, sin, attn_backend="xla",
                            skip_schedule=skips)
    np.testing.assert_allclose(np.asarray(out_host), np.asarray(out_seq),
                               rtol=1e-4, atol=1e-5)
