"""YuE lyrics-to-song tests (structure + e2e; reference
/root/reference/models/TTS/yue/pipeline.py)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.yue import (YuEConfig, init_yue,
                                       stage1_generate, stage2_generate,
                                       xcodec_decode)
from wan2gp_tpu.families.tts_yue import (YuEFamilyHandler, YuEPipeline,
                                         split_lyrics)


@pytest.fixture(scope="module")
def yue():
    cfg = YuEConfig.tiny()
    return cfg, init_yue(jax.random.key(0), cfg)


def test_split_lyrics_sections():
    lyr = "[verse]\nline one\nline two\n\n[chorus]\nhook\n"
    segs = split_lyrics(lyr)
    assert len(segs) == 2
    assert segs[0].startswith("[verse]") and "line one" in segs[0]
    assert segs[1].startswith("[chorus]") and "hook" in segs[1]


def test_stage1_dual_track_interleave(yue):
    """Stage-1 output de-interleaves to equal-length vocal/inst tracks
    with codes inside the codebook (pipeline.py:543-560)."""
    cfg, params = yue
    out = stage1_generate(params, cfg, np.arange(4, 12),
                          [np.arange(20, 24)], max_new_tokens=10,
                          temperature=1.0, key=jax.random.key(1))
    assert len(out) == 1
    v, i = out[0]["vocal"], out[0]["inst"]
    assert v.shape == i.shape
    assert (v >= 0).all() and (v < cfg.codebook_size).all()
    assert (i >= 0).all() and (i < cfg.codebook_size).all()


def test_stage1_multi_segment_grows_context(yue):
    cfg, params = yue
    out = stage1_generate(params, cfg, np.arange(4, 10),
                          [np.arange(20, 23), np.arange(30, 33)],
                          max_new_tokens=8, temperature=0.0)
    assert len(out) == 2


def test_stage2_teacher_forces_cb0(yue):
    """Every 8th token of stage-2 output is the stage-1 codebook-0
    code (pipeline.py:618-639: cb0 appended before each 7-token
    generation)."""
    cfg, params = yue
    cb0 = np.asarray([3, 7, 1, 9], np.int32)
    codes = stage2_generate(params, cfg, cb0)
    assert codes.shape == (cfg.n_codebooks, 4)
    np.testing.assert_array_equal(codes[0], cb0)
    assert (codes >= 0).all() and (codes < cfg.codebook_size).all()


def test_xcodec_decode_length(yue):
    cfg, params = yue
    codes = np.zeros((cfg.n_codebooks, 6), np.int64)
    wav = xcodec_decode(params["codec"], cfg, codes)
    assert wav.shape[0] == 6 * int(np.prod(cfg.codec_rates))
    assert np.isfinite(np.asarray(wav)).all()


def test_yue_family_e2e(yue):
    pipe = YuEFamilyHandler.load_model("yue", {"tiny": True},
                                       init_random=True)
    out = YuEFamilyHandler.generate_audio(
        pipe, {"prompt": "[verse]\nhello\n", "genres": "pop",
               "run_n_segments": 1, "duration_seconds": 0.2,
               "temperature": 1.0}, seed=2)
    assert out["sample_rate"] == pipe.cfg.sample_rate
    assert out["audio"].ndim == 1 and out["audio"].size > 0
    assert out["vocal"].shape == out["inst"].shape
    assert np.isfinite(out["audio"]).all()
    assert np.abs(out["audio"]).max() <= 1.0


class _TinyShim:
    """Stands in for YuEConfig in the service test so the registry
    model def (no 'tiny' key) still builds the test-size model."""
    def __new__(cls):
        return YuEConfig.tiny()

    tiny = staticmethod(YuEConfig.tiny)


def test_yue_registered():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "yue" in handlers and "yue_icl" in handlers


def test_service_yue_end_to_end(tmp_path, monkeypatch):
    from wan2gp_tpu.families import tts_yue
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.utils.media import read_wav
    monkeypatch.setattr(tts_yue, "YuEConfig", _TinyShim)
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True)
    paths = svc.generate({"model_type": "yue",
                          "prompt": "[verse]\nhello tpu\n",
                          "genres": "pop", "run_n_segments": 1,
                          "duration_seconds": 0.2, "temperature": 0,
                          "seed": 5})
    assert paths and paths[0].endswith(".wav")
    wav, sr = read_wav(paths[0])
    assert sr == 16000 and wav.shape[0] > 0
