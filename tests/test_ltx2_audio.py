"""LTX-2 audio-TTS family (reference models/ltx2/dramabox_audio.py,
scenema_audio.py, ltx_audio_tts_handler.py): DramaBox script planning
semantics, the audio-only denoise path (joint DiT run with
video_tokens=None, reference latents appended with timestep pinned 0),
and end-to-end handler generation for both model types."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.ltx2.audio_tts import (
    estimate_speech_duration, parse_speaker_options,
    plan_dramabox_segments, ltx2_audio_only_denoise)
from wan2gp_tpu.families.ltx2_audio import LTXAudioTTSFamilyHandler


# ---------------------------------------------------------------------------
# planner semantics (dramabox_audio.py:90-270)
# ---------------------------------------------------------------------------

def test_estimate_speech_duration_quotes_and_nonverbal():
    short = estimate_speech_duration('He says, "Hi."')
    long = estimate_speech_duration(
        'She says, "' + "a long sentence of many words. " * 4 + '"')
    assert long > short >= 3.0
    base = estimate_speech_duration('"Okay."')
    with_sigh = estimate_speech_duration('"Okay." She sighs deeply.')
    assert with_sigh > base          # nonverbal verb table adds time


def test_parse_speaker_options():
    attrs = parse_speaker_options(
        '{voice="warm tenor", gender=male, scene=\'a cafe\', bogus=1}')
    assert attrs == {"voice": "warm tenor", "gender": "male",
                     "scene": "a cafe"}
    assert parse_speaker_options(None) == {}
    assert parse_speaker_options("{}") == {}


def test_plan_dramabox_segments_speakers_and_scaling():
    script = ('Speaker 1 {voice="smooth baritone"}: "Hello." He nods.\n'
              'Speaker 2 {gender=female}: "Goodbye!" She waves.\n'
              'Speaker 1: "See you."')
    segs = plan_dramabox_segments(script, seed=7)
    assert [s.speaker for s in segs] == [1, 2, 1]
    # speaker attrs persist across later headerless attribution
    assert "smooth baritone" in segs[2].prompt
    assert "female speaker" in segs[1].prompt
    # deterministic per-segment seeds
    assert [s.seed for s in segs] == [7, 1007, 2007]
    assert segs[0].expected_text == "Hello."
    # target-duration scaling preserves ratios, sums ~ target
    scaled = plan_dramabox_segments(script, 0, duration_seconds=30.0)
    assert abs(sum(s.duration_s for s in scaled) - 30.0) < 1.0


def test_plan_dramabox_headerless_and_empty():
    assert plan_dramabox_segments("") == []
    segs = plan_dramabox_segments("Just narrate this line.")
    assert len(segs) == 1 and 'says, "' in segs[0].prompt


# ---------------------------------------------------------------------------
# audio-only denoise
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pipe():
    return LTXAudioTTSFamilyHandler.load_model(
        "dramabox_audio", {"tiny": True}, attn_backend="xla")


def test_audio_only_denoise_shapes_and_ref_trim(tiny_pipe):
    p, cfg = tiny_pipe.params, tiny_pipe.cfg
    ctx = jnp.zeros((1, 4, cfg.caption_dim))
    out = ltx2_audio_only_denoise(p, cfg, 10, ctx, ctx, steps=2,
                                  cfg_scale=2.0, attn_backend="xla")
    assert out.shape == (1, 10, cfg.audio_in_channels)
    assert bool(jnp.isfinite(out).all())
    # appended reference latents are trimmed from the result
    ref = jax.random.normal(jax.random.key(1),
                            (1, 6, cfg.audio_in_channels))
    out_r = ltx2_audio_only_denoise(p, cfg, 10, ctx, ctx,
                                    ref_latents=ref, steps=2,
                                    cfg_scale=1.0, attn_backend="xla")
    assert out_r.shape == (1, 10, cfg.audio_in_channels)
    assert bool(jnp.isfinite(out_r).all())


def test_encode_reference_tokens(tiny_pipe):
    wav = np.sin(np.linspace(0, 300.0, 8000)).astype(np.float32)
    toks = tiny_pipe.encode_reference(wav, 16000)
    assert toks.ndim == 3
    assert toks.shape[2] == tiny_pipe.cfg.audio_in_channels
    assert bool(jnp.isfinite(toks).all())


# ---------------------------------------------------------------------------
# handler end-to-end
# ---------------------------------------------------------------------------

def test_dramabox_generate_audio(tiny_pipe):
    script = ('Speaker 1: "Hi there." He smiles.\n'
              'Speaker 2: "Hello!"')
    out = LTXAudioTTSFamilyHandler.generate_audio(
        tiny_pipe, {"prompt": script, "model_type": "dramabox_audio",
                    "num_inference_steps": 2,
                    "guidance_scale": 2.5}, 0)
    assert out["segments"] == 2
    assert out["sample_rate"] == 16000
    assert out["audio"].size > 0
    assert np.isfinite(out["audio"]).all()
    assert np.abs(out["audio"]).max() <= 1.0 + 1e-6


def test_scenema_generate_audio_with_ref():
    pipe = LTXAudioTTSFamilyHandler.load_model(
        "scenema_audio", {"tiny": True}, attn_backend="xla")
    ref = np.sin(np.linspace(0, 900.0, 16000)).astype(np.float32)
    out = LTXAudioTTSFamilyHandler.generate_audio(
        pipe, {"prompt": 'Speaker 1 {voice="calm"}: Welcome.',
               "model_type": "scenema_audio", "duration_seconds": 2,
               "num_inference_steps": 2, "guidance_scale": 1.0,
               "audio_guide": ref}, 3)
    assert out["sample_rate"] == 16000
    assert out["audio"].size > 0 and np.isfinite(out["audio"]).all()


def test_registry_defaults_present():
    from wan2gp_tpu.config.registry import ModelRegistry
    from wan2gp_tpu.families import build_handler_map
    reg = ModelRegistry(build_handler_map())
    for mt in ("dramabox_audio", "scenema_audio"):
        d = reg.get(mt)
        assert d["architecture"] == mt
