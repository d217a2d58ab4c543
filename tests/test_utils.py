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
