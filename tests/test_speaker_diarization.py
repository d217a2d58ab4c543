"""Speaker diarization tests (reference
preprocessing/speaker_separator/separator.py pipeline contract).
"""
import numpy as np
import pytest

from wan2gp_tpu.preprocessing.speaker_diarization import (
    SpeakerDiarizer, DiarizationConfig, make_speaker_separator_fn,
    _kmeans2)


@pytest.fixture(scope="module")
def dia():
    return SpeakerDiarizer(DiarizationConfig.tiny(), tiny=True)


def test_kmeans_separates_clusters():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((20, 8)) * 0.05 + np.array([1.0] + [0] * 7)
    b = rng.standard_normal((20, 8)) * 0.05 + np.array([0, 1.0] + [0] * 6)
    lab = _kmeans2(np.concatenate([a, b]), 2)
    assert len(set(lab[:20])) == 1 and len(set(lab[20:])) == 1
    assert lab[0] != lab[20]


def test_diarize_skips_silence(dia):
    sr = dia.cfg.sample_rate
    wav = np.concatenate([
        np.random.default_rng(1).standard_normal(sr // 2) * 0.2,
        np.zeros(sr // 2, np.float32),
    ]).astype(np.float32)
    segs = dia.diarize(wav)
    assert segs, "voiced region should produce segments"
    # no segment covers the trailing silence
    for st, en, spk in segs:
        assert spk in (0, 1)
        assert st < 0.5 + dia.cfg.window_s


def test_separate_partition(dia):
    sr = dia.cfg.sample_rate
    wav = np.random.default_rng(2).standard_normal(sr) \
        .astype(np.float32) * 0.2
    parts = dia.separate(wav)
    assert set(parts.keys()) == {0, 1}
    # each sample is attributed to at most the original value
    s = parts[0] + parts[1]
    mask = np.abs(s) > 0
    np.testing.assert_allclose(s[mask],
                               (wav + wav * 0)[mask], atol=1e-6)


def test_separator_hook_resamples():
    fn = make_speaker_separator_fn(tiny=True)
    out = fn(np.random.default_rng(3).standard_normal(4000)
             .astype(np.float32) * 0.2, 8000)
    assert set(out.keys()) == {0, 1}
    assert out[0].shape[0] == 8000  # resampled to 16 kHz internally


def test_empty_and_short_inputs(dia):
    segs = dia.diarize(np.zeros(100, np.float32))
    assert segs == []
    parts = dia.separate(np.zeros(100, np.float32))
    assert all(np.all(v == 0) for v in parts.values())
