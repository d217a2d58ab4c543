"""Seed-VC voice conversion (postprocessing/seedvc/)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.postprocessing.seedvc import (
    SeedVCConfig, WhisperEncConfig, SeedVCConverter, init_seedvc,
    init_whisper_encoder, whisper_encode, init_length_regulator,
    length_regulate, init_seedvc_dit, seedvc_estimator, cfm_convert,
    seedvc_mel)
from wan2gp_tpu.postprocessing import audio_processors as ap


@pytest.fixture(scope="module")
def cfgs():
    return SeedVCConfig.tiny(), WhisperEncConfig.tiny()


@pytest.fixture(scope="module")
def params(cfgs):
    cfg, wcfg = cfgs
    return init_seedvc(jax.random.key(0), cfg, wcfg)


def test_whisper_encoder_rate(cfgs):
    _, wcfg = cfgs
    p = init_whisper_encoder(jax.random.key(1), wcfg)
    wav = jnp.asarray(np.random.RandomState(0).randn(1, 3200),
                      jnp.float32)
    h = whisper_encode(p, wcfg, wav)
    # conv stack halves the mel rate: L/hop/2 frames
    assert h.shape[0] == 1 and h.shape[2] == wcfg.d_model
    assert abs(h.shape[1] - 3200 // wcfg.hop // 2) <= 1
    assert bool(jnp.isfinite(h).all())


def test_length_regulator_resamples(cfgs):
    cfg, _ = cfgs
    p = init_length_regulator(jax.random.key(2), cfg)
    content = jnp.asarray(
        np.random.RandomState(1).randn(2, 17, cfg.content_dim),
        jnp.float32)
    out = length_regulate(p, cfg, content, 31)
    assert out.shape == (2, 31, cfg.lr_channels)
    assert bool(jnp.isfinite(out).all())


def test_estimator_shapes_and_t_dependence(cfgs):
    cfg, _ = cfgs
    p = init_seedvc_dit(jax.random.key(3), cfg)
    b, t = 2, 12
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randn(b, t, cfg.n_mels), jnp.float32)
    px = jnp.zeros_like(x)
    style = jnp.asarray(rs.randn(b, cfg.style_dim), jnp.float32)
    cond = jnp.asarray(rs.randn(b, t, cfg.lr_channels), jnp.float32)
    v0 = seedvc_estimator(p, cfg, x, px, jnp.zeros((b,)), style, cond)
    v1 = seedvc_estimator(p, cfg, x, px, jnp.ones((b,)) * 0.7, style,
                          cond)
    assert v0.shape == (b, t, cfg.n_mels)
    assert bool(jnp.isfinite(v0).all())
    # adaptive-RMS timestep conditioning must change the field
    assert float(jnp.abs(v0 - v1).max()) > 1e-5


def test_cfm_prompt_region_pinned_and_excluded(cfgs):
    cfg, _ = cfgs
    p = init_seedvc_dit(jax.random.key(4), cfg)
    rs = np.random.RandomState(3)
    prompt_mel = jnp.asarray(rs.randn(1, 5, cfg.n_mels), jnp.float32)
    cond = jnp.asarray(rs.randn(1, 5 + 9, cfg.lr_channels), jnp.float32)
    style = jnp.asarray(rs.randn(1, cfg.style_dim), jnp.float32)
    out = cfm_convert(p, cfg, cond, prompt_mel, style, steps=2,
                      cfg_rate=0.7, key=jax.random.key(5))
    # only the source part comes back
    assert out.shape == (1, 9, cfg.n_mels)
    assert bool(jnp.isfinite(out).all())


def test_convert_end_to_end(params, cfgs):
    cfg, wcfg = cfgs
    conv = SeedVCConverter(params, cfg, wcfg)
    rs = np.random.RandomState(4)
    src = rs.randn(2000).astype(np.float32) * 0.1
    ref = rs.randn(3000).astype(np.float32) * 0.1
    wav, sr = conv.convert(src, 8000, ref, 8000, diffusion_steps=2)
    assert sr == cfg.sample_rate
    assert wav.ndim == 1 and wav.shape[0] > 0
    assert np.isfinite(wav).all()
    # deterministic per seed
    wav2, _ = conv.convert(src, 8000, ref, 8000, diffusion_steps=2)
    np.testing.assert_allclose(wav, wav2, atol=1e-5)


def test_mel_frontend(cfgs):
    cfg, _ = cfgs
    wav = jnp.asarray(np.random.RandomState(5).randn(1, 1024),
                      jnp.float32)
    mel = seedvc_mel(wav, cfg)
    assert mel.shape[0] == 1 and mel.shape[2] == cfg.n_mels
    assert bool(jnp.isfinite(mel).all())


# --------------------------------------------------------------------------
# registry integration
# --------------------------------------------------------------------------

class _FakeConverter:
    def convert(self, src, sr, ref, ref_sr, **kw):
        return np.full((len(src),), 0.25, np.float32), 22050


def test_registry_has_seedvc_methods():
    methods = [m for _, m in ap.method_choices(ap.VOICE_REPLACEMENT)]
    assert "seedvc_one_speaker" in methods
    assert "seedvc_two_speakers" in methods
    # also exposed as an audio edit like the reference
    edit = [m for _, m in ap.method_choices(ap.AUDIO_EDIT)]
    assert "seedvc_one_speaker" in edit


def test_processor_validation_and_one_speaker():
    proc = ap.SeedVCProcessor(converter=_FakeConverter())
    assert proc.validate_method("seedvc_one_speaker") != ""
    assert proc.validate_method("seedvc_one_speaker",
                                voice_sample=np.zeros(10)) == ""
    assert proc.validate_method("seedvc_two_speakers",
                                voice_sample=np.zeros(10)) != ""
    wave = np.zeros((100, 2), np.float32)
    out, sr = proc.process_audio(wave, 22050,
                                 method="seedvc_one_speaker",
                                 voice_sample=np.zeros(10),
                                 voice_sample_sr=22050)
    assert out.shape == (100, 1) and sr == 22050
    assert np.allclose(out, 0.25)


def test_processor_two_speakers_mixes():
    def sep(mono, sr):
        return [mono * 0.5, mono * 0.5]

    proc = ap.SeedVCProcessor(converter=_FakeConverter(),
                              speaker_separator_fn=sep)
    out, sr = proc.process_audio(
        np.zeros((50,), np.float32), 22050,
        method="seedvc_two_speakers",
        voice_sample=np.zeros(10), voice_sample_sr=22050,
        voice_sample2=np.zeros(10), voice_sample2_sr=22050)
    # two converted stems summed
    assert np.allclose(out, 0.5)

    proc_nosep = ap.SeedVCProcessor(converter=_FakeConverter())
    with pytest.raises(RuntimeError):
        proc_nosep.process_audio(np.zeros(50, np.float32), 22050,
                                 method="seedvc_two_speakers",
                                 voice_sample=np.zeros(10))
