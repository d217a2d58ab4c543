"""LongCat-Video: schedule, per-frame timesteps, cond-split attention."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.longcat.dit import (LongCatConfig, init_longcat,
                                           longcat_forward,
                                           timestep_embedding)
from wan2gp_tpu.models.longcat.pipeline import (
    LongCatPipeline, LongCatSamplingConfig, build_step_plan,
    longcat_sigmas, _shift_sigmas)

TINY = LongCatConfig(dim=64, n_layers=2, n_heads=4, adaln_dim=32,
                     freq_dim=16, caption_dim=24,
                     compute_dtype=jnp.float32)


def test_ffn_dim_rounding():
    # reference FeedForwardSwiGLU: int(2*4*4096/3)=10922 -> 11008
    assert LongCatConfig().ffn_dim == 11008
    # tiny: int(2*256/3)=170 -> 256
    assert TINY.ffn_dim == 256


def test_shift_sigma_transform():
    sig = np.array([1.0, 0.5, 0.001], np.float32)
    out = _shift_sigmas(sig)
    np.testing.assert_allclose(out[0], 1.0, atol=1e-6)
    np.testing.assert_allclose(out[1], 12 * 0.5 / (1 + 11 * 0.5), atol=1e-6)
    assert np.all(np.diff(out) < 0)


def test_step_plans():
    default = build_step_plan(50, "default")
    assert len(default["timesteps"]) == 50
    assert default["sigmas"][0] == pytest.approx(1.0, abs=1e-5)
    assert default["sigmas"][-1] == 0.0
    assert np.all(default["dts"] < 0)       # sigma decreases
    # enhance_hf replaces the tail below 0.5*t_max with a uniform grid
    ehf = build_step_plan(50, "enhance_hf")
    tmax = default["timesteps"].max()
    n_tail = int((ehf["timesteps"] <= tmax * 0.5).sum())
    assert 3 <= n_tail <= 15
    # distill table subsamples the 1000-step training ladder
    dist = build_step_plan(8, "distill", num_distill_steps=50)
    assert len(dist["timesteps"]) == 8
    raw = longcat_sigmas(8, "distill", 50)
    assert raw[0] == pytest.approx(1.0, abs=1e-5)     # 50*20/1000
    assert np.all(np.diff(raw) < 0)


def test_timestep_embedding_cos_first():
    emb = np.asarray(timestep_embedding(jnp.asarray([0.0]), 8))
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)   # cos(0)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)   # sin(0)


def _inputs(nt=3, h=4, w=4, ltxt=5):
    params = init_longcat(jax.random.key(0), TINY)
    lat = jax.random.normal(jax.random.key(1),
                            (1, TINY.in_channels, nt, h, w))
    ctx = jax.random.normal(jax.random.key(2), (1, ltxt, TINY.caption_dim))
    mask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    return params, lat, ctx, mask


def test_forward_shapes_and_text_pad_invariance():
    params, lat, ctx, mask = _inputs()
    t = jnp.asarray([500.0])
    out = longcat_forward(params, TINY, lat, t, ctx, mask,
                          attn_backend="xla")
    assert out.shape == lat.shape
    ctx2 = ctx.at[:, 3:].set(77.0)
    out2 = longcat_forward(params, TINY, lat, t, ctx2, mask,
                           attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


def test_per_frame_timesteps_and_cond_isolation():
    """Condition frames (per-frame t=0) attend only among themselves, so
    changing NOISE frame content must not change cond-frame outputs."""
    params, lat, ctx, mask = _inputs(nt=4)
    tf = jnp.asarray([[0.0, 0.0, 700.0, 700.0]])   # 2 cond + 2 noise
    out = longcat_forward(params, TINY, lat, tf, ctx, mask,
                          num_cond_latents=2, attn_backend="xla")
    lat2 = lat.at[:, :, 2:].set(jax.random.normal(
        jax.random.key(9), lat[:, :, 2:].shape))
    out2 = longcat_forward(params, TINY, lat2, tf, ctx, mask,
                           num_cond_latents=2, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(out[:, :, :2]),
                               np.asarray(out2[:, :, :2]), atol=1e-4)
    # noise frames DO see cond frames
    lat3 = lat.at[:, :, :2].set(0.0)
    out3 = longcat_forward(params, TINY, lat3, tf, ctx, mask,
                           num_cond_latents=2, attn_backend="xla")
    assert not np.allclose(np.asarray(out[:, :, 2:]),
                           np.asarray(out3[:, :, 2:]), atol=1e-4)


def _tiny_pipe():
    params = init_longcat(jax.random.key(0), TINY)

    def text_fn(prompts):
        k = jax.random.key(hash(prompts[0]) & 0xFFFF)
        return (jax.random.normal(k, (1, 5, TINY.caption_dim)),
                jnp.ones((1, 5), jnp.int32))
    return LongCatPipeline(params, TINY, text_encode_fn=text_fn,
                           latents_mean=None, latents_std=None,
                           attn_backend="xla")


def test_pipeline_t2v_and_cond_pinning():
    pipe = _tiny_pipe()
    sampling = LongCatSamplingConfig(steps=3, guidance=4.0)
    lat = pipe.generate("x", height=32, width=32, frame_num=9,
                        sampling=sampling, seed=0, return_latents=True)
    assert lat.shape == (1, 16, 3, 4, 4)
    assert np.isfinite(np.asarray(lat)).all()
    # continuation: cond latent frames survive denoising untouched
    pipe.vae_encode_fn = lambda pix: jax.random.normal(
        jax.random.key(3), (1, 16, 1 + (pix.shape[2] - 1) // 4,
                            pix.shape[3] // 8, pix.shape[4] // 8))
    video = jnp.zeros((1, 3, 5, 32, 32))
    lat2 = pipe.generate("x", height=32, width=32, frame_num=9,
                         sampling=sampling, video_cond=video,
                         num_cond_frames=5, seed=0, return_latents=True)
    expect = pipe.vae_encode_fn(video)[:, :, :2]
    np.testing.assert_allclose(np.asarray(lat2[:, :, :2]),
                               np.asarray(expect), atol=1e-5)


def test_pipeline_cfg_star_runs():
    pipe = _tiny_pipe()
    sampling = LongCatSamplingConfig(steps=2, guidance=4.0, cfg_star=True,
                                     cfg_zero_step=0)
    lat = pipe.generate("x", height=32, width=32, frame_num=5,
                        sampling=sampling, seed=1, return_latents=True)
    assert np.isfinite(np.asarray(lat)).all()


def test_loader_roundtrip():
    import torch
    from wan2gp_tpu.io.longcat_checkpoint import load_longcat_params
    cfg = TINY
    g = torch.Generator().manual_seed(0)
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.zeros(dout)

    d, hd = cfg.dim, cfg.head_dim
    sd["x_embedder.proj.weight"] = torch.randn(
        d, cfg.in_channels, 1, 2, 2, generator=g) * 0.05
    sd["x_embedder.proj.bias"] = torch.zeros(d)
    lin("t_embedder.mlp.0", cfg.freq_dim, cfg.adaln_dim)
    lin("t_embedder.mlp.2", cfg.adaln_dim, cfg.adaln_dim)
    lin("y_embedder.y_proj.0", cfg.caption_dim, d)
    lin("y_embedder.y_proj.2", d, d)
    for i in range(cfg.n_layers):
        p = f"blocks.{i}"
        lin(f"{p}.adaLN_modulation.1", cfg.adaln_dim, 6 * d)
        lin(f"{p}.attn.qkv", d, 3 * d)
        sd[f"{p}.attn.q_norm.weight"] = torch.ones(hd)
        sd[f"{p}.attn.k_norm.weight"] = torch.ones(hd)
        lin(f"{p}.attn.proj", d, d)
        lin(f"{p}.pre_crs_attn_norm", d, d)  # overwritten below
        sd[f"{p}.pre_crs_attn_norm.weight"] = torch.ones(d)
        sd[f"{p}.pre_crs_attn_norm.bias"] = torch.zeros(d)
        lin(f"{p}.cross_attn.q_linear", d, d)
        lin(f"{p}.cross_attn.kv_linear", d, 2 * d)
        sd[f"{p}.cross_attn.q_norm.weight"] = torch.ones(hd)
        sd[f"{p}.cross_attn.k_norm.weight"] = torch.ones(hd)
        lin(f"{p}.cross_attn.proj", d, d)
        lin(f"{p}.ffn.w1", d, cfg.ffn_dim, bias=False)
        lin(f"{p}.ffn.w2", cfg.ffn_dim, d, bias=False)
        lin(f"{p}.ffn.w3", d, cfg.ffn_dim, bias=False)
    lin("final_layer.adaLN_modulation.1", cfg.adaln_dim, 2 * d)
    lin("final_layer.linear", d, 4 * cfg.out_channels)

    npsd = {k: v.numpy() for k, v in sd.items()}
    params, leftover = load_longcat_params(npsd, cfg, jnp.float32)
    assert leftover == [], leftover
    lat = jnp.zeros((1, cfg.in_channels, 2, 4, 4))
    ctx = jnp.zeros((1, 3, cfg.caption_dim))
    out = longcat_forward(params, cfg, lat, jnp.asarray([100.0]), ctx,
                          jnp.ones((1, 3), jnp.int32), attn_backend="xla")
    assert out.shape == (1, 16, 2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()
    # Conv3d kernel flattening: feature order (c, pt, ph, pw)
    wt = sd["x_embedder.proj.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["x_embed"]["w"]),
                               wt.reshape(d, -1).T, atol=1e-6)


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "longcat_video" in handlers and "longcat_video_i2v" in handlers


def test_longcat_avatar_audio_branch():
    """Avatar audio cross-attn (modules/avatar/): per-frame audio
    context tokens gate into the noise frames."""
    from wan2gp_tpu.models.longcat.dit import (LongCatConfig,
                                               init_longcat,
                                               longcat_forward)
    cfg = LongCatConfig(dim=64, n_layers=2, n_heads=4, adaln_dim=32,
                        caption_dim=48, avatar=True, audio_dim=24,
                        compute_dtype=jnp.float32)
    params = init_longcat(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.normal(size=(1, 16, 3, 8, 8)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(1, 6, 48)), jnp.float32)
    t = jnp.asarray([500.0])
    base = longcat_forward(params, cfg, lat, t, ctx)
    audio = jnp.asarray(rng.normal(size=(1, 3, 5, 24)), jnp.float32)
    out = longcat_forward(params, cfg, lat, t, ctx, audio_ctx=audio)
    assert out.shape == base.shape
    assert not np.allclose(np.asarray(out), np.asarray(base))
    # zero audio context still differs only through the value path;
    # with cond frames the audio applies to noise frames only
    out2 = longcat_forward(params, cfg, lat, t, ctx,
                           num_cond_latents=1,
                           audio_ctx=audio[:, 1:])
    assert np.isfinite(np.asarray(out2)).all()


def test_longcat_avatar_pipeline_e2e():
    from wan2gp_tpu.models.longcat.dit import LongCatConfig, init_longcat
    from wan2gp_tpu.models.longcat.pipeline import (LongCatPipeline,
                                                    LongCatSamplingConfig)
    from wan2gp_tpu.models.wan.multitalk import init_audio_proj
    cfg = LongCatConfig(dim=64, n_layers=2, n_heads=4, adaln_dim=32,
                        caption_dim=48, avatar=True,
                        compute_dtype=jnp.float32)
    params = init_longcat(jax.random.key(1), cfg, jnp.float32)
    ap = init_audio_proj(jax.random.key(2))
    rng = np.random.default_rng(1)

    def text_fn(prompts):
        return (jnp.asarray(rng.normal(size=(1, 6, 48)), jnp.float32),
                jnp.ones((1, 6), jnp.int32))

    pipe = LongCatPipeline(params, cfg, text_encode_fn=text_fn,
                           attn_backend="xla")
    lat_t = 1 + (9 - 1) // 4
    first = rng.normal(size=(1, 1, 5, 12, 768)).astype(np.float32)
    latter = rng.normal(size=(1, lat_t - 1, 8, 12, 768)).astype(np.float32)
    lat = pipe.generate_avatar(
        "hello", (first, latter), audio_proj_params=ap,
        height=64, width=64, frame_num=9,
        sampling=LongCatSamplingConfig(steps=2, guidance=1.0),
        return_latents=True)
    assert lat.shape == (1, 16, lat_t, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


def test_longcat_avatar_multi_speaker_routing():
    """Avatar Multi (longcat_main.py:866-873): two speakers' audio
    contexts concatenated per frame; region tokens attend only their
    speaker's half, so changing speaker 2's audio must not affect
    speaker-1-owned tokens in the audio cross output."""
    import math
    from wan2gp_tpu.models.longcat.dit import (LongCatConfig,
                                               _audio_cross, _ln)
    from wan2gp_tpu.models.longcat.pipeline import build_speaker_owner
    cfg = LongCatConfig(dim=32, n_layers=1, n_heads=2, adaln_dim=16,
                        caption_dim=24, avatar=True,
                        compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    d = cfg.dim
    p = {"q": {"w": jnp.asarray(rng.normal(size=(d, d)) * 0.1,
                                jnp.float32),
               "b": jnp.zeros((d,), jnp.float32)},
         "kv": {"w": jnp.asarray(rng.normal(size=(768, 2 * d)) * 0.1,
                                 jnp.float32),
                "b": jnp.zeros((2 * d,), jnp.float32)},
         "proj": {"w": jnp.asarray(rng.normal(size=(d, d)) * 0.1,
                                   jnp.float32),
                  "b": jnp.zeros((d,), jnp.float32)},
         "q_norm": jnp.ones((cfg.head_dim,), jnp.float32),
         "k_norm": jnp.ones((cfg.head_dim,), jnp.float32)}
    nt, hw = 2, 16
    x = jnp.asarray(rng.normal(size=(1, nt * hw, d)), jnp.float32)
    a1 = rng.normal(size=(1, nt, 8, 768)).astype(np.float32)
    a2 = rng.normal(size=(1, nt, 8, 768)).astype(np.float32)
    a2b = rng.normal(size=(1, nt, 8, 768)).astype(np.float32)
    owner = build_speaker_owner(4, 4)          # 16 tokens, 4x4 grid
    ctx = jnp.concatenate([jnp.asarray(a1), jnp.asarray(a2)], axis=2)
    ctxb = jnp.concatenate([jnp.asarray(a1), jnp.asarray(a2b)], axis=2)
    o1 = np.asarray(_audio_cross(p, cfg, x, ctx, nt, "xla",
                                 speaker_owner=owner))
    o2 = np.asarray(_audio_cross(p, cfg, x, ctxb, nt, "xla",
                                 speaker_owner=owner))
    own = np.asarray(owner)
    o1t = o1.reshape(1, nt, hw, d)
    o2t = o2.reshape(1, nt, hw, d)
    sp1 = own == 0
    np.testing.assert_allclose(o1t[:, :, sp1], o2t[:, :, sp1],
                               atol=1e-6)
    assert not np.allclose(o1t[:, :, own != 0], o2t[:, :, own != 0])


def test_longcat_avatar_multi_service_e2e():
    from wan2gp_tpu.families.longcat import (LongCatFamilyHandler,
                                             LongCatSamplingConfig)
    from wan2gp_tpu.models.longcat.dit import LongCatConfig, init_longcat
    from wan2gp_tpu.models.longcat.pipeline import LongCatPipeline
    from wan2gp_tpu.models.wan.multitalk import init_audio_proj
    cfg = LongCatConfig(dim=64, n_layers=2, n_heads=4, adaln_dim=32,
                        caption_dim=48, avatar=True,
                        compute_dtype=jnp.float32)
    params = init_longcat(jax.random.key(0), cfg, jnp.float32)
    params["audio_proj"] = init_audio_proj(jax.random.key(2))

    def text_fn(prompts):
        return (jax.random.normal(jax.random.key(1),
                                  (1, 6, cfg.caption_dim), jnp.float32),
                jnp.ones((1, 6), jnp.int32))

    pipe = LongCatPipeline(params, cfg, text_encode_fn=text_fn,
                           attn_backend="xla")
    pipe.wav2vec = None
    pipe.multi_speakers_only = True
    sr = 16000
    a1 = np.sin(np.linspace(0, 700, sr)).astype(np.float32)
    a2 = np.cos(np.linspace(0, 300, sr)).astype(np.float32)
    out = LongCatFamilyHandler._generate_avatar_video(
        pipe, {"prompt": "two people", "audio_guide": a1,
               "audio_guide2": a2}, 64, 64, 9, 0,
        LongCatSamplingConfig(steps=2, guidance=1.0))
    v = np.asarray(out["video"])
    assert v.shape == (1, 16, 3, 8, 8) and np.isfinite(v).all()
    # multi_speakers_only without a second guide is an error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        LongCatFamilyHandler._generate_avatar_video(
            pipe, {"prompt": "x", "audio_guide": a1}, 64, 64, 9, 0,
            LongCatSamplingConfig(steps=2, guidance=1.0))
