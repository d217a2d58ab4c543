"""Stable Audio 3 tests: torch oracles for the rotary/DyT primitives
(reference models/TTS/stable_audio3/models/transformer.py) + DiT / TAAE
shape-and-sanity + scheduler properties + handler e2e.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.stable_audio3 import (
    SA3DiTConfig, TAAEConfig, init_sa3_dit, sa3_dit, sa3_cfg_denoise,
    init_taae, taae_encode, taae_decode, build_schedule,
    sample_pingpong, sample_euler, init_number_conditioner,
    number_embed, _rotary_freqs, _apply_partial_rope, _dyt, _init_dyt,
    _expo_fourier)
from wan2gp_tpu.families.tts_stable_audio3 import (
    StableAudio3FamilyHandler, StableAudio3Pipeline,
    _mode_from_audio_prompt_type)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


# -- partial rotary oracle (transformer.py:236-320) -------------------------

def test_partial_rope_matches_torch():
    rot_dim, hd, n = 8, 12, 17
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, n, hd)).astype(np.float32)

    # reference: RotaryEmbedding(rot_dim) -> inv_freq over arange(0,rot,2),
    # freqs = cat(f, f); apply = t*cos + rotate_half(t)*sin on first
    # rot_dim dims
    inv = 1.0 / (10000.0 ** (torch.arange(0, rot_dim, 2).float()
                             / rot_dim))
    f = torch.einsum("i,j->ij", torch.arange(n).float(), inv)
    freqs = torch.cat((f, f), dim=-1)
    t = torch.from_numpy(x)
    tr, tu = t[..., :rot_dim], t[..., rot_dim:]
    t2 = tr.reshape(*tr.shape[:-1], 2, rot_dim // 2)
    x1, x2 = t2.unbind(dim=-2)
    rot_half = torch.cat((-x2, x1), dim=-1)
    ref = torch.cat((tr * freqs.cos() + rot_half * freqs.sin(), tu),
                    dim=-1)

    ours = _apply_partial_rope(jnp.asarray(x),
                               _rotary_freqs(n, rot_dim))
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_dyt_matches_torch():
    d = 9
    p = _init_dyt(d, init_alpha=4.0)
    p = {"alpha": jnp.asarray(1.7), "gamma": p["gamma"] * 1.3,
         "beta": p["beta"] + 0.2}
    x = np.random.default_rng(1).standard_normal((2, 5, d)) \
        .astype(np.float32)
    ref = (torch.tanh(1.7 * torch.from_numpy(x))
           * torch.from_numpy(_np(p["gamma"]))
           + torch.from_numpy(_np(p["beta"])))
    np.testing.assert_allclose(_np(_dyt(jnp.asarray(x), p)),
                               ref.numpy(), atol=1e-6, rtol=1e-5)


def test_expo_fourier_shape_and_range():
    e = _expo_fourier(jnp.asarray([0.0, 0.5, 1.0]), 16)
    assert e.shape == (3, 16)
    assert np.all(np.abs(_np(e)) <= 1.0 + 1e-6)


# -- DiT --------------------------------------------------------------------

@pytest.mark.parametrize("differential", [False, True])
def test_dit_forward_shapes(differential):
    cfg = SA3DiTConfig.tiny(differential=differential)
    p = init_sa3_dit(jax.random.PRNGKey(0), cfg)
    b, n, l = 2, 12, 5
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, cfg.io_channels))
    t = jnp.asarray([0.7, 0.3])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, l, cfg.cond_token_dim))
    g = jax.random.normal(jax.random.PRNGKey(3),
                          (b, cfg.global_cond_dim))
    out = sa3_dit(p, cfg, x, t, ctx, g)
    assert out.shape == (b, n, cfg.io_channels)
    assert np.isfinite(_np(out)).all()


def test_dit_local_add_changes_output():
    cfg = SA3DiTConfig.tiny()
    p = init_sa3_dit(jax.random.PRNGKey(0), cfg)
    # zero-init local2 -> perturb it so local conditioning is live
    p["blocks"]["local2"]["w"] = jax.random.normal(
        jax.random.PRNGKey(9), p["blocks"]["local2"]["w"].shape) * 0.1
    b, n = 1, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, cfg.io_channels))
    t = jnp.asarray([0.5])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (b, 4, cfg.cond_token_dim))
    g = jnp.zeros((b, cfg.global_cond_dim))
    la = jax.random.normal(jax.random.PRNGKey(3),
                           (b, n, cfg.local_add_dim))
    o0 = sa3_dit(p, cfg, x, t, ctx, g, local_add=None)
    o1 = sa3_dit(p, cfg, x, t, ctx, g, local_add=la)
    assert float(jnp.abs(o0 - o1).max()) > 1e-6


def test_cfg_scale_one_is_plain_forward():
    cfg = SA3DiTConfig.tiny()
    p = init_sa3_dit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.io_channels))
    t = jnp.asarray([0.4])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 3, cfg.cond_token_dim))
    g = jnp.zeros((1, cfg.global_cond_dim))
    a = sa3_cfg_denoise(p, cfg, x, t, ctx, g, cfg_scale=1.0)
    b = sa3_dit(p, cfg, x, t, ctx, g)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-6)


def test_cfg_apg_finite():
    cfg = SA3DiTConfig.tiny()
    p = init_sa3_dit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 6, cfg.io_channels))
    t = jnp.asarray([0.6])
    ctx = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 3, cfg.cond_token_dim))
    neg = jax.random.normal(jax.random.PRNGKey(4),
                            (1, 3, cfg.cond_token_dim))
    g = jnp.zeros((1, cfg.global_cond_dim))
    out = sa3_cfg_denoise(p, cfg, x, t, ctx, g, cfg_scale=6.0,
                          apg_scale=1.0, rescale=0.3,
                          neg_cross_cond=neg)
    assert out.shape == x.shape
    assert np.isfinite(_np(out)).all()


# -- schedule (inference/distribution_shift.py) -----------------------------

def test_schedule_monotonic_and_endpoints():
    cfg = SA3DiTConfig.tiny()
    s = build_schedule(8, 1024, cfg)
    assert len(s) == 9
    assert abs(s[0] - 1.0) < 1e-9 and abs(s[-1]) < 1e-9
    assert np.all(np.diff(s) < 0)


def test_schedule_shift_grows_with_seq_len():
    # longer sequences get a larger shift -> sigmas held higher
    cfg = SA3DiTConfig()
    s_short = build_schedule(8, cfg.shift_min_len, cfg)
    s_long = build_schedule(8, cfg.shift_max_len, cfg)
    assert np.all(s_long[1:-1] >= s_short[1:-1] - 1e-9)
    assert s_long[4] > s_short[4]


# -- samplers ---------------------------------------------------------------

def _fake_denoise(x, t):
    # rf velocity toward zero: v = x / max(t, eps) * t -> x (denoised=0)
    return x


def test_pingpong_and_euler_run():
    sig = np.linspace(1.0, 0.0, 5)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 4))
    out_p = sample_pingpong(_fake_denoise, noise, sig,
                            jax.random.PRNGKey(1))
    out_e = sample_euler(_fake_denoise, noise, sig)
    assert out_p.shape == noise.shape and out_e.shape == noise.shape
    # x - t*v with v=x gives denoised=(1-t)x -> both contract to finite
    assert np.isfinite(_np(out_p)).all() and np.isfinite(_np(out_e)).all()
    # euler with v=x integrates dx = x dt from 1 -> 0: x_final = 0? no:
    # x += (t_next - t_cur) * x each step -> shrinks
    assert float(jnp.abs(out_e).mean()) < float(jnp.abs(noise).mean())


# -- TAAE -------------------------------------------------------------------

def test_taae_roundtrip_shapes():
    cfg = TAAEConfig.tiny()
    p = init_taae(jax.random.PRNGKey(0), cfg)
    hop = cfg.patch * cfg.stride
    t = hop * 6
    audio = jax.random.normal(jax.random.PRNGKey(1), (2, t, 2)) * 0.1
    lat = taae_encode(p, cfg, audio)
    assert lat.shape == (2, 6, cfg.latent_dim)
    rec = taae_decode(p, cfg, lat)
    assert rec.shape == (2, t, 2)
    assert np.isfinite(_np(rec)).all()


def test_taae_encode_pads_ragged_input():
    cfg = TAAEConfig.tiny()
    p = init_taae(jax.random.PRNGKey(0), cfg)
    hop = cfg.patch * cfg.stride
    lat = taae_encode(p, cfg, jnp.zeros((1, hop * 2 + 5, 2)))
    assert lat.shape[1] == 3


def test_number_conditioner():
    p = init_number_conditioner(jax.random.PRNGKey(0), 12)
    e = number_embed(p, [0.0, 30.0, 500.0], 0.0, 120.0)
    assert e.shape == (3, 12)
    # clamped: 500 -> 120 and 130 -> 120 embed identically
    e2 = number_embed(p, [130.0], 0.0, 120.0)
    np.testing.assert_allclose(_np(e[2]), _np(e2[0]), atol=1e-6)


# -- handler e2e ------------------------------------------------------------

def test_mode_mapping():
    assert _mode_from_audio_prompt_type("") == "text"
    assert _mode_from_audio_prompt_type("AE") == "audio_to_audio"
    assert _mode_from_audio_prompt_type("AI") == "inpaint"
    assert _mode_from_audio_prompt_type("AC") == "continue"
    assert _mode_from_audio_prompt_type("V") == "text"


@pytest.fixture(scope="module")
def tiny_pipe():
    return StableAudio3FamilyHandler.load_model(
        "stable_audio3_small", {"tiny": True})


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    m = build_handler_map()
    assert m["stable_audio3_small"] is StableAudio3FamilyHandler
    assert m["stable_audio3_medium"] is StableAudio3FamilyHandler
    d = StableAudio3FamilyHandler.query_model_def(
        "stable_audio3_medium", {})
    assert d["audio_only"] and d["duration_slider"]["max"] == 380


def test_generate_text_mode(tiny_pipe):
    sr = tiny_pipe.dit_cfg.sample_rate
    out = StableAudio3FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "rain on a tin roof",
                    "duration_seconds": 1.0,
                    "num_inference_steps": 3,
                    "guidance_scale": 6.0}, seed=0)
    assert out["mode"] == "text"
    assert out["sample_rate"] == sr
    assert out["audio"].shape == (sr, 2)
    assert np.isfinite(out["audio"]).all()
    assert np.abs(out["audio"]).max() <= 1.0 + 1e-6


def test_generate_inpaint_and_continue(tiny_pipe):
    sr = tiny_pipe.dit_cfg.sample_rate
    src = (np.sin(2 * np.pi * 440
                  * np.arange(sr) / sr)[:, None]
           * np.ones((1, 2))).astype(np.float32) * 0.3
    out = StableAudio3FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "patch the middle",
                    "duration_seconds": 1.0,
                    "num_inference_steps": 2,
                    "audio_prompt_type": "AI",
                    "audio_guide": src,
                    "custom_settings": {"inpaint_start_seconds": 0.3,
                                        "inpaint_end_seconds": 0.6}},
        seed=1)
    assert out["mode"] == "inpaint"
    assert np.isfinite(out["audio"]).all()

    out2 = StableAudio3FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "keep going",
                    "duration_seconds": 2.0,
                    "num_inference_steps": 2,
                    "audio_prompt_type": "AC",
                    "audio_guide": src[:sr // 2]}, seed=2)
    assert out2["mode"] == "continue"
    assert out2["audio"].shape[0] == 2 * sr


def test_generate_audio_to_audio(tiny_pipe):
    sr = tiny_pipe.dit_cfg.sample_rate
    src = np.random.default_rng(0).standard_normal(
        (sr, 2)).astype(np.float32) * 0.1
    out = StableAudio3FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "make it lo-fi", "duration_seconds": 1.0,
                    "num_inference_steps": 4,
                    "audio_prompt_type": "AE", "audio_guide": src,
                    "audio_scale": 0.5, "sample_solver": "euler"},
        seed=3)
    assert out["mode"] == "audio_to_audio"
    assert np.isfinite(out["audio"]).all()


def test_mode_requires_source(tiny_pipe):
    with pytest.raises(ValueError):
        tiny_pipe.generate("x", audio_prompt_type="AI",
                           source_audio=None)


# -- checkpoint round trip (io/stable_audio3_checkpoint.py) -----------------

@pytest.mark.parametrize("differential", [False, True])
def test_checkpoint_roundtrip(differential):
    from wan2gp_tpu.io.stable_audio3_checkpoint import (
        load_sa3_dit_params, export_sa3_dit_state)
    cfg = SA3DiTConfig.tiny(differential=differential)
    p0 = init_sa3_dit(jax.random.PRNGKey(4), cfg)
    sd = export_sa3_dit_state(p0, cfg)
    p1, leftover = load_sa3_dit_params(sd, cfg, dtype=jnp.float32)
    assert leftover == []
    # forward equality through the loaded weights
    x = jax.random.normal(jax.random.PRNGKey(5),
                          (1, 6, cfg.io_channels))
    t = jnp.asarray([0.4])
    ctx = jax.random.normal(jax.random.PRNGKey(6),
                            (1, 3, cfg.cond_token_dim))
    g = jax.random.normal(jax.random.PRNGKey(7),
                          (1, cfg.global_cond_dim))
    a = sa3_dit(p0, cfg, x, t, ctx, g)
    b = sa3_dit(p1, cfg, x, t, ctx, g)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-5)


def test_swiglu_ff_shapes():
    """FeedForward is SwiGLU (transformer.py glu=True default): ff1
    projects to 2*inner."""
    cfg = SA3DiTConfig.tiny()
    p = init_sa3_dit(jax.random.PRNGKey(0), cfg)
    inner = int(cfg.embed * cfg.ff_mult)
    assert p["blocks"]["ff1"]["w"].shape == (cfg.depth, cfg.embed,
                                             2 * inner)
    assert p["blocks"]["ff2"]["w"].shape == (cfg.depth, inner,
                                             cfg.embed)
