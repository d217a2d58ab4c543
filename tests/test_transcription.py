"""Whisper transcription tests (reference wangp-agent
transcription.py; agent transcribe tool backend)."""
import os
import tempfile

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.utils.transcription import (
    WhisperDecConfig, init_whisper_decoder, whisper_decode_logits,
    transcribe_tokens, WhisperTranscriber)
from wan2gp_tpu.postprocessing.seedvc import (WhisperEncConfig,
                                              init_whisper_encoder,
                                              whisper_encode)


@pytest.fixture(scope="module")
def setup():
    ecfg = WhisperEncConfig.tiny()
    dcfg = WhisperDecConfig.tiny()
    k1, k2 = jax.random.split(jax.random.key(0))
    enc = init_whisper_encoder(k1, ecfg)
    dec = init_whisper_decoder(k2, dcfg)
    return enc, ecfg, dec, dcfg


def test_decoder_logits_shapes(setup):
    enc, ecfg, dec, dcfg = setup
    states = jax.random.normal(jax.random.PRNGKey(1),
                               (1, 20, dcfg.d_model))
    ids = jnp.asarray([[dcfg.sot, dcfg.lang_en, 5, 6]])
    logits = whisper_decode_logits(dec, dcfg, ids, states)
    assert logits.shape == (1, 4, dcfg.vocab)
    assert np.isfinite(np.asarray(logits)).all()


def test_decoder_is_causal(setup):
    """Changing a later token must not change earlier logits."""
    enc, ecfg, dec, dcfg = setup
    states = jax.random.normal(jax.random.PRNGKey(2),
                               (1, 10, dcfg.d_model))
    a = whisper_decode_logits(dec, dcfg,
                              jnp.asarray([[1, 2, 3, 4]]), states)
    b = whisper_decode_logits(dec, dcfg,
                              jnp.asarray([[1, 2, 3, 9]]), states)
    np.testing.assert_allclose(np.asarray(a[:, :3]),
                               np.asarray(b[:, :3]), atol=1e-5)
    assert float(jnp.abs(a[:, 3] - b[:, 3]).max()) > 1e-6


def test_transcribe_tokens_strips_prelude(setup):
    enc, ecfg, dec, dcfg = setup
    states = jax.random.normal(jax.random.PRNGKey(3),
                               (1, 8, dcfg.d_model))
    ids = transcribe_tokens(dec, dcfg, states, max_new=5)
    assert len(ids) <= 5
    assert dcfg.sot not in ids and dcfg.task_transcribe not in ids


def test_transcriber_end_to_end():
    t = WhisperTranscriber(tiny=True)
    sr = 16000
    wav = (np.sin(2 * np.pi * 220 * np.arange(sr // 4) / sr)
           * 0.3).astype(np.float32)
    text = t.transcribe_wave(wav, sr, max_new=3)
    assert isinstance(text, str)
    # deterministic
    assert text == t.transcribe_wave(wav, sr, max_new=3)


def test_transcriber_path_contract(tmp_path):
    from wan2gp_tpu.utils import media
    t = WhisperTranscriber(tiny=True)
    sr = 16000
    wav = np.random.default_rng(0).standard_normal(sr // 4) \
        .astype(np.float32) * 0.1
    p = str(tmp_path / "a.wav")
    media.save_audio(wav, p, sample_rate=sr)
    out = t(p)
    assert isinstance(out, str)


def test_detokenize_hook():
    t = WhisperTranscriber(tiny=True,
                           detokenize_fn=lambda ids: f"<{len(ids)}>")
    sr = 16000
    wav = np.zeros(sr // 8, np.float32)
    out = t.transcribe_wave(wav, sr, max_new=2)
    assert out.startswith("<") and out.endswith(">")
