"""BS-RoFormer vocal separator tests (reference
preprocessing/extract_vocals.py + the audio_separator BS-RoFormer
model): STFT/iSTFT torch oracle, band partition invariants, mask
network shapes, chunked separation consistency.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.postprocessing.bs_roformer import (
    BSRoformerConfig, default_bands, init_bs_roformer,
    bs_roformer_mask, separate_vocals, stft, istft,
    init_default_separator)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


def test_default_bands_cover_spectrum():
    cfg = BSRoformerConfig()
    assert sum(cfg.bands) == cfg.n_bins == 1025
    assert len(cfg.bands) == 62


def test_stft_matches_torch():
    cfg = BSRoformerConfig.tiny()
    wav = np.random.default_rng(0).standard_normal((1, 500, 2)) \
        .astype(np.float32) * 0.3
    spec = stft(jnp.asarray(wav), cfg)
    ref = torch.stft(torch.from_numpy(wav.transpose(0, 2, 1)
                                      ).reshape(-1, 500),
                     n_fft=cfg.n_fft, hop_length=cfg.hop,
                     window=torch.hann_window(cfg.n_fft,
                                              periodic=True),
                     center=True, pad_mode="reflect",
                     return_complex=True)
    ref = ref.numpy().reshape(1, 2, cfg.n_bins, -1) \
        .transpose(0, 3, 2, 1)
    np.testing.assert_allclose(_np(spec), ref, atol=1e-3, rtol=1e-3)


def test_istft_roundtrip():
    cfg = BSRoformerConfig.tiny()
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 400, 2)) * 0.3, jnp.float32)
    rec = istft(stft(wav, cfg), cfg, 400)
    np.testing.assert_allclose(_np(rec), _np(wav), atol=1e-5)


def test_mask_network_shapes():
    cfg = BSRoformerConfig.tiny()
    p = init_bs_roformer(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 320, 2)) * 0.3, jnp.float32)
    spec = stft(wav, cfg)
    mask = bs_roformer_mask(p, cfg, spec)
    assert mask.shape == spec.shape
    assert mask.dtype == jnp.complex64
    assert np.isfinite(_np(mask.real)).all()


def test_separate_vocals_mix_consistency():
    p, cfg = init_default_separator(tiny=True)
    wav = np.random.default_rng(3).standard_normal((900, 2)) \
        .astype(np.float32) * 0.2
    vocals, bg = separate_vocals(p, cfg, wav, chunk_seconds=0.05)
    assert vocals.shape == wav.shape and bg.shape == wav.shape
    # vocals + background reconstruct the mix exactly
    np.testing.assert_allclose(vocals + bg, wav, atol=1e-5)


def test_separate_mono_input():
    p, cfg = init_default_separator(tiny=True)
    wav = np.random.default_rng(4).standard_normal(600) \
        .astype(np.float32) * 0.2
    vocals, bg = separate_vocals(p, cfg, wav, chunk_seconds=0.05)
    assert vocals.shape == (600, cfg.channels)


def test_band_mismatch_rejected():
    cfg = BSRoformerConfig.tiny()
    import dataclasses
    bad = dataclasses.replace(cfg, bands=(4, 4))
    with pytest.raises(AssertionError):
        init_bs_roformer(jax.random.PRNGKey(0), bad)
