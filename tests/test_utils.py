"""Tests: prompt engine, text-encoder cache, post-processing basics,
latent preview."""
import numpy as np

from wan2gp_tpu.utils.prompts import split_prompt_units, process_template
from wan2gp_tpu.utils.text_cache import TextEncoderCache
from wan2gp_tpu.postprocessing.basic import (
    add_film_grain, lanczos_upscale, temporal_interpolate)
from wan2gp_tpu.postprocessing.latent_preview import latent_to_rgb


def test_split_prompt_units_modes():
    text = "a cat\nа dog\n\nsecond paragraph line1\nline2\n# comment"
    assert len(split_prompt_units(text, "G")) == 4
    pg = split_prompt_units(text, "PG")
    assert len(pg) == 2 and pg[1].startswith("second")
    assert split_prompt_units(text, "FG") == [
        "a cat\nа dog\n\nsecond paragraph line1\nline2"]
    assert split_prompt_units("", "G") == []


def test_process_template_macros():
    out, err = process_template(
        '! {animal}="cat","dog" : {color}="red","blue"\n'
        'a {color} {animal}')
    assert err == ""
    assert out.split("\n") == ["a red cat", "a blue dog"]
    # shorter lists repeat last value
    out, err = process_template('! {x}="1","2","3" : {y}="a"\n{x}{y}')
    assert out.split("\n") == ["1a", "2a", "3a"]
    # errors
    _, err = process_template('! {x="1"\nfoo')
    assert err != ""
    _, err = process_template('! {x}="1\nfoo')
    assert err != ""


def test_text_encoder_cache():
    cache = TextEncoderCache(max_bytes=1000)
    calls = []

    def enc(p):
        calls.append(p)
        return np.ones((10,), np.float32)

    a = cache.encode(enc, "hello")
    b = cache.encode(enc, "hello")
    assert len(calls) == 1 and cache.hits == 1
    np.testing.assert_array_equal(a, b)
    # eviction
    for i in range(50):
        cache.encode(enc, f"p{i}")
    assert cache._bytes <= 1000


def test_film_grain():
    frames = np.zeros((2, 8, 8, 3), np.float32)
    out = add_film_grain(frames, grain_intensity=0.2)
    assert out.shape == frames.shape
    assert np.abs(out).max() > 0
    assert np.abs(out).max() <= 1.0
    same = add_film_grain(frames, grain_intensity=0.0)
    np.testing.assert_array_equal(same, frames)


def test_lanczos_and_temporal():
    rng = np.random.default_rng(0)
    frames = rng.uniform(-1, 1, (3, 8, 8, 3)).astype(np.float32)
    up = lanczos_upscale(frames, 2.0)
    assert up.shape == (3, 16, 16, 3)
    interp = temporal_interpolate(frames, 2)
    assert interp.shape == (5, 8, 8, 3)
    np.testing.assert_allclose(interp[1], (frames[0] + frames[1]) / 2,
                               rtol=1e-5)


def test_latent_preview():
    z = np.random.default_rng(0).standard_normal((16, 3, 4, 4)).astype("f")
    rgb = latent_to_rgb(z)
    assert rgb.shape == (3, 4, 4, 3) and rgb.dtype == np.uint8


# ---------------------------------------------------------------------------
# audio output path (audio_video.py:377 save_audio_file, :613 mux)
# ---------------------------------------------------------------------------

def test_wav_roundtrip(tmp_path):
    from wan2gp_tpu.utils.media import save_audio, read_wav
    import numpy as np
    t = np.linspace(0, 1, 8000, endpoint=False)
    wave = np.stack([np.sin(2 * np.pi * 440 * t),
                     np.sin(2 * np.pi * 220 * t)], axis=1) * 0.5
    p = save_audio(wave, str(tmp_path / "tone.wav"), sample_rate=8000)
    back, rate = read_wav(p)
    assert rate == 8000 and back.shape == (8000, 2)
    np.testing.assert_allclose(back / 32767.0, wave, atol=1e-3)


def test_wav_channel_first_and_mono(tmp_path):
    from wan2gp_tpu.utils.media import save_audio, read_wav
    import numpy as np
    wave = np.random.default_rng(0).uniform(-1, 1, (2, 4000)).astype(
        np.float32)
    p = save_audio(wave, str(tmp_path / "a.mp3"), sample_rate=16000)
    assert p.endswith(".wav")
    back, rate = read_wav(p)
    assert back.shape == (4000, 2)
    mono = np.random.default_rng(1).uniform(-1, 1, 1000).astype(np.float32)
    p = save_audio(mono, str(tmp_path / "m.wav"))
    back, _ = read_wav(p)
    assert back.shape == (1000, 1)


def test_avi_audio_mux_roundtrip(tmp_path):
    from wan2gp_tpu.utils.media import (save_video, read_mjpeg_avi,
                                        read_avi_audio,
                                        read_video_metadata)
    import numpy as np
    frames = np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3), dtype=np.uint8)
    t = np.linspace(0, 0.25, 4000, endpoint=False)
    wave = (np.sin(2 * np.pi * 440 * t) * 0.5).astype(np.float32)
    p = str(tmp_path / "av.avi")
    meta = {"prompt": "tone test", "seed": 7}
    save_video(frames, p, fps=16, audio=wave, audio_sample_rate=16000,
               metadata=meta)
    vid = read_mjpeg_avi(p)
    assert vid.shape == frames.shape
    audio = read_avi_audio(p)
    assert audio is not None
    back, rate = audio
    assert rate == 16000 and back.shape == (4000, 1)
    np.testing.assert_allclose(back[:, 0] / 32767.0, wave, atol=1e-3)
    # in-container metadata survives sidecar deletion
    import os
    os.remove(p + ".json")
    assert read_video_metadata(p) == meta


def test_avi_without_audio_still_reads(tmp_path):
    from wan2gp_tpu.utils.media import save_video, read_avi_audio
    import numpy as np
    frames = np.zeros((2, 16, 16, 3), np.uint8)
    p = str(tmp_path / "v.avi")
    save_video(frames, p, fps=8)
    assert read_avi_audio(p) is None
