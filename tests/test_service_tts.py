"""Service-level dispatch for the round-3 audio families: the
audio_only path (runtime/service.py generate -> handler.generate_audio
-> save_audio) must produce a WAV for every new handler (reference
generate_media routing every models/TTS/*_handler.py family)."""
import os

import numpy as np
import pytest

from wan2gp_tpu.runtime.service import GenerationService
from wan2gp_tpu.utils.media import read_wav


@pytest.fixture(scope="module")
def svc(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("tts_out"))
    return GenerationService(output_dir=out, attn_backend="xla",
                             init_random_weights=True)


def _run(svc, settings):
    mt = settings["model_type"]
    svc.registry.get(mt)["tiny"] = True
    try:
        outs = svc.generate(settings)
    finally:
        svc.registry.get(mt).pop("tiny", None)
        svc.release_model(mt)
    assert outs and outs[0].endswith(".wav")
    wav, sr = read_wav(outs[0])
    assert sr > 0 and np.isfinite(wav).all()
    return wav, sr


def test_stable_audio3_service(svc):
    wav, sr = _run(svc, {
        "model_type": "stable_audio3_small",
        "prompt": "gentle rain", "duration_seconds": 1.0,
        "num_inference_steps": 2, "guidance_scale": 1.0, "seed": 1})
    assert wav.shape[0] > 0


def test_kugelaudio_service(svc):
    wav, sr = _run(svc, {
        "model_type": "kugelaudio", "prompt": "Hello there.",
        "duration_seconds": 0.05, "num_inference_steps": 2,
        "guidance_scale": 1.0, "seed": 2})
    assert np.isfinite(wav).all()


def test_ace15_service(svc):
    wav, sr = _run(svc, {
        "model_type": "ace_step_v1_5", "prompt": "[Instrumental]",
        "alt_prompt": "lofi", "duration_seconds": 1.0, "seed": 3})
    assert wav.shape[0] > 0


def test_index_tts2_service(svc):
    ref = (np.sin(2 * np.pi * 220 * np.arange(4000) / 22050)
           * 0.3).astype(np.float32)
    wav, sr = _run(svc, {
        "model_type": "index_tts2", "prompt": "Service check.",
        "duration_seconds": 0.4, "num_inference_steps": 2,
        "audio_guide": ref, "seed": 4})
    assert np.isfinite(wav).all()


def test_dramabox_service(svc):
    wav, sr = _run(svc, {
        "model_type": "dramabox_audio",
        "prompt": 'Speaker 1: "Quick check." He nods.',
        "duration_seconds": 0, "num_inference_steps": 2,
        "guidance_scale": 2.5, "seed": 5})
    assert wav.shape[0] > 0


def test_scenema_service(svc):
    wav, sr = _run(svc, {
        "model_type": "scenema_audio",
        "prompt": 'Speaker 1 {voice="calm"}: Quick check.',
        "duration_seconds": 2, "num_inference_steps": 2,
        "guidance_scale": 1.0, "seed": 6})
    assert wav.shape[0] > 0
