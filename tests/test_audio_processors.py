"""Audio-processor registry + soundtrack muxing
(reference postprocessing/audio_processors.py)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.postprocessing import audio_processors as ap
from wan2gp_tpu.utils import media


def _clip(path, t=8, fps=4):
    fr = np.random.default_rng(0).integers(0, 255, (t, 16, 24, 3),
                                           dtype=np.uint8)
    media.save_video(fr, path, fps=fps, metadata={"fps": fps})
    return fr


def test_registry_and_custom_soundtrack(tmp_path):
    ap.reset_registry()
    assert [m for _, m in ap.method_choices(ap.SOUNDTRACK)] == \
        ["prismaudio", "custom", "mmaudio"]
    assert ap.find_processor("remove_background") is not None
    assert ap.find_processor("nope") is None
    vid = str(tmp_path / "v.avi")
    _clip(vid)
    wav = str(tmp_path / "s.wav")
    media.save_audio(np.sin(np.linspace(0, 90, 16000 * 3,
                                        dtype=np.float32)), wav,
                     sample_rate=16000)
    out = ap.apply_soundtrack(vid, "custom", audio_source=wav)
    audio = media.read_avi_audio(out)
    assert audio is not None
    wave, sr = audio
    # trimmed to the 2 s video duration
    assert sr == 16000 and wave.shape[0] == 32000
    # shorter soundtrack pads with silence
    media.save_audio(np.ones(4000, np.float32) * 0.5, wav,
                     sample_rate=16000)
    ap.apply_soundtrack(vid, "custom", audio_source=wav)
    wave2, _ = media.read_avi_audio(vid)
    assert wave2.shape[0] == 32000 and abs(int(wave2[-1])) <= 1
    with pytest.raises(ValueError):
        ap.apply_soundtrack(vid, "custom", audio_source=None)


def test_mmaudio_soundtrack_and_bg_removal(tmp_path):
    from wan2gp_tpu.postprocessing.mmaudio_net import (MMAudioNetConfig,
                                                       init_mmaudio_net)
    ap.reset_registry()
    cfg = MMAudioNetConfig(latent_dim=4, clip_dim=8, sync_dim=16,
                           text_dim=8, hidden_dim=16, depth=3,
                           fused_depth=1, num_heads=2,
                           latent_seq_len=10, clip_seq_len=4,
                           sync_seq_len=8, text_seq_len=5)
    params = init_mmaudio_net(jax.random.key(0), cfg)
    proc = ap.MMAudioSoundtrackProcessor(
        net_params=params, net_cfg=cfg,
        vae=lambda lat: jnp.zeros((1, 80, 32)),
        vocoder=lambda mel: jnp.zeros((1, 1, 2048)))
    ap.register_audio_processor(proc)
    vid = str(tmp_path / "v.avi")
    _clip(vid)
    out = ap.apply_soundtrack(vid, "mmaudio", prompt="rain")
    audio = media.read_avi_audio(out)
    assert audio is not None and audio[1] == 44100
    # background removal routes through the pluggable separator
    bg = ap.BackgroundRemovalProcessor(
        separator_fn=lambda w, sr: (w * 0, sr))
    w, sr = bg.process_audio(np.ones((100, 1), np.float32), 16000)
    assert (w == 0).all() and sr == 16000
    # without a custom separator, the built-in BS-RoFormer runs
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((400, 2)).astype(np.float32) * 0.2
    w2, sr2 = ap.BackgroundRemovalProcessor(tiny=True).process_audio(
        wav, 8000)
    assert w2.shape == wav.shape and sr2 == 8000
    assert np.isfinite(w2).all()


def test_service_soundtrack_hook(tmp_path):
    from wan2gp_tpu.runtime.service import _audio_processor_hook
    ap.reset_registry()
    vid = str(tmp_path / "g.avi")
    _clip(vid)
    wav = str(tmp_path / "s.wav")
    media.save_audio(np.ones(8000, np.float32) * 0.3, wav,
                     sample_rate=16000)
    outs = _audio_processor_hook(
        [vid], {"soundtrack_method": "custom",
                "soundtrack_audio_source": wav})
    assert outs == [vid]
    assert media.read_avi_audio(vid) is not None
    # no method -> untouched passthrough, errors swallowed
    assert _audio_processor_hook([vid], {}) == [vid]
    assert _audio_processor_hook(
        [vid], {"soundtrack_method": "custom"}) == [vid]
