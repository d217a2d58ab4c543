"""ACE-Step 1.5 tests: torch/analytic oracles for the FSQ quantizer,
snake activation and Oobleck conv padding; shape-and-sanity for the
condition encoder, DiT and turbo sampler; handler e2e (reference
models/TTS/ace_step15/).
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.ace15 import (
    Ace15Config, init_ace15, encode_condition, tokenize_audio,
    lm_hints_from_codes, generate_latents, dit_forward, init_fsq,
    fsq_quantize, fsq_codes_from_indices, attention_pool, detokenize,
    sliding_mask, SHIFT_TIMESTEPS, _fsq_bound)
from wan2gp_tpu.models.tts.ace15_vae import (
    OobleckConfig, init_oobleck, oobleck_encode, oobleck_decode,
    _snake, _conv, _conv_t)
from wan2gp_tpu.families.tts_ace15 import (AceStep15FamilyHandler,
                                           AceStep15Pipeline)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def cfg():
    return Ace15Config.tiny()


@pytest.fixture(scope="module")
def params(cfg):
    return init_ace15(jax.random.PRNGKey(0), cfg)


# -- FSQ oracle (vector_quantize_pytorch FSQ semantics) ---------------------

def test_fsq_bound_properties():
    levels = (8, 5, 5)
    z = jnp.asarray(np.random.default_rng(0).standard_normal(
        (100, 3)) * 3, jnp.float32)
    q = _fsq_bound(z, levels)
    qn = _np(q)
    # normalized codes live on the quantized grid in [-1, 1]
    assert qn.min() >= -1.0 - 1e-6 and qn.max() <= 1.0 + 1e-6
    for d, L in enumerate(levels):
        half = L // 2
        vals = np.unique(np.round(qn[:, d] * half))
        assert len(vals) <= L
    # quantization is idempotent at the code points
    q2 = _fsq_bound(jnp.arctanh(jnp.clip(q * jnp.asarray(
        [3.5, 2.0, 2.0]), -0.999, 0.999)), levels)
    # (loose check: codes round-trip to themselves)
    assert np.allclose(_np(q2), qn, atol=0.5)


def test_fsq_indices_roundtrip(cfg):
    p = init_fsq(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 7, cfg.fsq_dim))
    q, idx = fsq_quantize(p, cfg, x)
    n_codes = int(np.prod(cfg.fsq_levels))
    assert int(_np(idx).min()) >= 0 and int(_np(idx).max()) < n_codes
    # decoding the indices reproduces the quantized projection exactly
    q2 = fsq_codes_from_indices(p, cfg, idx)
    np.testing.assert_allclose(_np(q), _np(q2), atol=1e-5)


# -- snake / oobleck conv oracles -------------------------------------------

def test_snake_matches_torch():
    x = np.random.default_rng(0).standard_normal((2, 5, 3)) \
        .astype(np.float32)
    p = {"alpha": jnp.asarray([0.1, -0.2, 0.3]),
         "beta": jnp.asarray([0.0, 0.1, -0.1])}
    ours = _snake(jnp.asarray(x), p)
    a = torch.exp(torch.tensor([0.1, -0.2, 0.3]))
    b = torch.exp(torch.tensor([0.0, 0.1, -0.1]))
    xt = torch.from_numpy(x)
    ref = xt + torch.sin(xt * a) ** 2 / (b + 1e-9)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-5,
                               rtol=1e-5)


def test_oobleck_conv_transpose_matches_torch():
    # decoder block conv: k=2s, stride s, padding ceil(s/2)
    s, k, cin, cout, t = 6, 12, 3, 2, 5
    pad = math.ceil(s / 2)
    rng = np.random.default_rng(1)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((2, t, cin)).astype(np.float32)
    conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s,
                                    padding=pad)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))
        conv.bias.copy_(torch.from_numpy(b))
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))) \
            .numpy().transpose(0, 2, 1)
    ours = _conv_t(jnp.asarray(x), {"w": jnp.asarray(w),
                                    "b": jnp.asarray(b)}, s, pad)
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5, rtol=1e-4)


def test_oobleck_roundtrip_shapes():
    vcfg = OobleckConfig.tiny()
    p = init_oobleck(jax.random.PRNGKey(0), vcfg)
    audio = jax.random.normal(jax.random.PRNGKey(1),
                              (2, 5 * vcfg.hop, 2)) * 0.3
    lat = oobleck_encode(p, vcfg, audio)
    assert lat.shape == (2, 5, vcfg.latent_dim)
    rec = oobleck_decode(p, vcfg, lat)
    assert rec.shape == (2, 5 * vcfg.hop, 2)
    assert np.isfinite(_np(rec)).all()
    # sampled encode differs from mean encode
    lat_s = oobleck_encode(p, vcfg, audio,
                           sample_key=jax.random.PRNGKey(2))
    assert float(jnp.abs(lat - lat_s).max()) > 0


# -- condition encoder / tokenizer ------------------------------------------

def test_condition_packing(cfg, params):
    b = 2
    text = jax.random.normal(jax.random.PRNGKey(1),
                             (b, 7, cfg.text_dim))
    lyr = jax.random.normal(jax.random.PRNGKey(2),
                            (b, 9, cfg.text_dim))
    ref = jax.random.normal(jax.random.PRNGKey(3),
                            (b, 11, cfg.timbre_dim))
    cond, mask = encode_condition(params, cfg, text, None, lyr, None,
                                  ref)
    # lyrics(9) + timbre(1 pooled) + text(7)
    assert cond.shape == (b, 17, cfg.cond_dim)
    assert mask.shape == (b, 17) and bool(mask.all())
    # without timbre
    cond2, _ = encode_condition(params, cfg, text, None, lyr, None)
    assert cond2.shape == (b, 16, cfg.cond_dim)


def test_tokenize_detokenize_rates(cfg, params):
    b, t = 2, 20
    ac = jax.random.normal(jax.random.PRNGKey(4),
                           (b, t, cfg.acoustic_dim))
    q, idx = tokenize_audio(params, cfg, ac)
    assert q.shape == (b, t // cfg.pool_window, cfg.fsq_dim)
    hints = lm_hints_from_codes(params, cfg, idx)
    assert hints.shape == (b, t, cfg.acoustic_dim)


# -- DiT / sampler ----------------------------------------------------------

def test_sliding_mask_band():
    m = _np(sliding_mask(6, 2))[0, 0]
    assert m[0, 0] == 0 and m[0, 1] == 0
    assert m[0, 2] < -1e30          # outside band
    assert m[5, 4] == 0 and m[5, 2] < -1e30


def test_dit_velocity_shapes(cfg, params):
    b, t = 2, 10
    xt = jax.random.normal(jax.random.PRNGKey(5),
                           (b, t, cfg.acoustic_dim))
    ctx = jnp.concatenate(
        [jnp.zeros((b, t, cfg.acoustic_dim)),
         jnp.ones((b, t, cfg.acoustic_dim))], axis=-1)
    enc = jax.random.normal(jax.random.PRNGKey(6),
                            (b, 5, cfg.cond_dim))
    tv = jnp.full((b,), 0.5)
    v = dit_forward(params["dit"], cfg, xt, tv, tv, ctx,
                    enc_states=enc)
    assert v.shape == xt.shape
    assert np.isfinite(_np(v)).all()
    # odd length exercises patch padding
    v2 = dit_forward(params["dit"], cfg, xt[:, :9], tv, tv, ctx[:, :9],
                     enc_states=enc)
    assert v2.shape == (b, 9, cfg.acoustic_dim)


def test_turbo_schedules():
    for shift, ts in SHIFT_TIMESTEPS.items():
        assert len(ts) == 8
        assert ts[0] == 1.0
        assert all(a > b for a, b in zip(ts, ts[1:]))


@pytest.mark.parametrize("method", ["ode", "sde"])
def test_generate_latents(cfg, params, method):
    cond = jax.random.normal(jax.random.PRNGKey(7),
                             (1, 6, cfg.cond_dim))
    mask = jnp.ones((1, 6), bool)
    lat = generate_latents(params, cfg, cond, mask, latent_length=10,
                           infer_method=method, seed=3)
    assert lat.shape == (1, 10, cfg.acoustic_dim)
    assert np.isfinite(_np(lat)).all()


# -- handler e2e ------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pipe():
    return AceStep15FamilyHandler.load_model("ace_step_v1_5",
                                             {"tiny": True})


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    m = build_handler_map()
    assert m["ace_step_v1_5"] is AceStep15FamilyHandler
    assert m["ace_step_v1_5_xl"] is AceStep15FamilyHandler
    d = AceStep15FamilyHandler.query_model_def("ace_step_v1_5", {})
    assert d["audio_only"] and d["prompt_class"] == "Lyrics"


def test_text2music(tiny_pipe):
    sr = tiny_pipe.sample_rate
    out = AceStep15FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "[Verse]\nHello world",
                    "alt_prompt": "upbeat pop",
                    "duration_seconds": 1.0}, seed=0)
    assert out["mode"] == ""
    assert out["sample_rate"] == sr
    assert out["audio"].shape[0] <= sr and out["audio"].shape[1] == 2
    assert np.isfinite(out["audio"]).all()


def test_cover_and_timbre_modes(tiny_pipe):
    sr = tiny_pipe.sample_rate
    hop = tiny_pipe.vae_cfg.hop
    src = np.random.default_rng(0).standard_normal(
        (hop * 12, 2)).astype(np.float32) * 0.2
    out = AceStep15FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "cover lyrics", "duration_seconds": 1.0,
                    "audio_prompt_type": "AB", "audio_guide": src,
                    "audio_guide2": src[:hop * 6],
                    "audio_scale": 0.5}, seed=1)
    assert out["mode"] == "AB"
    assert np.isfinite(out["audio"]).all()


def test_cover_requires_source(tiny_pipe):
    with pytest.raises(ValueError):
        tiny_pipe.generate("x", audio_prompt_type="A",
                           source_audio=None)


def test_xl_config_dims():
    xl = Ace15Config.xl()
    assert xl.hidden == 2560 and xl.layers == 32
    ecfg = xl.encoder_cfg()
    assert ecfg.hidden == 2048 and ecfg.heads == 16
    assert xl.cond_dim == 2048


# -- phase-1 constrained LM (ace15_lm.py) -----------------------------------

from wan2gp_tpu.models.tts.ace15_lm import (  # noqa: E402
    FSM, constrained_decode, parse_metadata, format_cot,
    validate_metadata, extract_audio_codes, codes_to_text,
    postprocess_caption, build_lm_prompt, VALID_KEYSCALES)


def test_fsm_produces_valid_metadata():
    import random

    def lm(text):
        return {c: random.Random(len(text)).random() for c in
                "abcdefghijklmnopqrstuvwxyz0123456789 .#ABCDEFG\nmju"}

    fsm = FSM(skip_genres=True, skip_caption=True)
    out = constrained_decode(lm, fsm, max_chars=300)
    meta = parse_metadata(out)
    assert fsm.done_metadata
    assert 30 <= meta["bpm"] <= 300
    assert 10 <= meta["duration"] <= 600
    assert meta["keyscale"] in VALID_KEYSCALES
    assert meta["timesignature"] in (2, 3, 4, 6)


def test_fsm_user_pinned_metadata():
    import random

    def lm(text):
        return {c: random.Random(len(text) + 1).random() for c in
                "0123456789ABCDEFG #majorinu\n"}

    fsm = FSM(skip_genres=True, skip_caption=True,
              user_metadata={"bpm": 128, "keyscale": "C major"})
    out = constrained_decode(lm, fsm, max_chars=300)
    meta = parse_metadata(out)
    assert meta["bpm"] == 128 and meta["keyscale"] == "C major"


def test_metadata_validation():
    meta = validate_metadata({"bpm": "999", "duration": "5 seconds",
                              "keyscale": "H major",
                              "language": "xx",
                              "timesignature": "4/4",
                              "caption": "nice song"})
    assert meta["bpm"] == 300          # clamped
    assert meta["duration"] == 10      # clamped
    assert "keyscale" not in meta      # invalid note
    assert "language" not in meta
    assert meta["timesignature"] == 4
    assert meta["caption"] == "nice song."


def test_cot_roundtrip_and_codes():
    cot = format_cot({"bpm": 90, "duration": 45,
                      "keyscale": "F# minor", "language": "ja",
                      "timesignature": 3})
    meta = parse_metadata(cot)
    assert meta == {"bpm": 90, "duration": 45,
                    "keyscale": "F# minor", "language": "ja",
                    "timesignature": 3}
    codes = extract_audio_codes(codes_to_text([1, 2, 3]),
                                min_tokens=6, max_tokens=6)
    assert codes == [1, 2, 3, 3, 3, 3]
    assert postprocess_caption("```python\nhi there") == "hi there."
    p = build_lm_prompt("disco", "[Verse] la la", cot)
    assert "# Caption\ndisco" in p and cot in p


def test_lm_mode_pipeline(tiny_pipe):
    cfg = tiny_pipe.cfg

    def fake_lm(caption, lyrics, n_codes):
        cot = format_cot({"bpm": 100, "duration": 30})
        return cot + codes_to_text(list(range(n_codes)))

    tiny_pipe.lm_generate_fn = fake_lm
    try:
        out = tiny_pipe.generate("[Instrumental]", caption="lofi",
                                 duration_seconds=1.0, model_mode=1,
                                 audio_scale=1.0, seed=2)
    finally:
        tiny_pipe.lm_generate_fn = None
    assert out["metadata"]["bpm"] == 100
    assert np.isfinite(out["audio"]).all()


# -- checkpoint round trip (io/ace15_checkpoint.py) -------------------------

def test_ace15_checkpoint_roundtrip(cfg, params):
    from wan2gp_tpu.io.ace15_checkpoint import (load_ace15_params,
                                                export_ace15_state)
    sd = export_ace15_state(params, cfg)
    p1, leftover = load_ace15_params(sd, cfg, dtype=jnp.float32)
    assert leftover == []
    # dit forward equality through the loaded weights
    b, t = 1, 10
    xt = jax.random.normal(jax.random.PRNGKey(11),
                           (b, t, cfg.acoustic_dim))
    ctx = jnp.concatenate([jnp.zeros((b, t, cfg.acoustic_dim)),
                           jnp.ones((b, t, cfg.acoustic_dim))], -1)
    enc = jax.random.normal(jax.random.PRNGKey(12),
                            (b, 4, cfg.cond_dim))
    tv = jnp.full((b,), 0.4)
    a = dit_forward(params["dit"], cfg, xt, tv, tv, ctx,
                    enc_states=enc)
    bb = dit_forward(p1["dit"], cfg, xt, tv, tv, ctx, enc_states=enc)
    np.testing.assert_allclose(_np(a), _np(bb), atol=1e-5)
    # condition encoder equality
    text = jax.random.normal(jax.random.PRNGKey(13),
                             (1, 5, cfg.text_dim))
    lyr = jax.random.normal(jax.random.PRNGKey(14),
                            (1, 6, cfg.text_dim))
    c0, _ = encode_condition(params, cfg, text, None, lyr, None)
    c1, _ = encode_condition(p1, cfg, text, None, lyr, None)
    np.testing.assert_allclose(_np(c0), _np(c1), atol=1e-5)
