"""Codec selection + HDR path (utils/video_codecs.py) vs the
reference's behavior (shared/utils/video_codecs.py, shared/utils/hdr.py,
shared/utils/audio_video.py:344,:754).

The LogC3/tonemap rows compare against goldens produced by EXECUTING the
reference's own hdr.py (tests/goldens/generate_from_reference.py
gen_hdr_ref) so a transcription error cannot self-confirm.
"""
import json
import os

import numpy as np
import pytest

from wan2gp_tpu.utils import media
from wan2gp_tpu.utils import video_codecs as vc

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "hdr_ref.npz")


# -- codec table / validation ------------------------------------------------

def test_encode_args_table():
    assert vc.get_video_encode_args("libx264_8", "mp4") == \
        ["-c:v", "libx264", "-crf", "10", "-pix_fmt", "yuv420p"]
    assert vc.get_video_encode_args("libx265_28", "mp4") == \
        ["-c:v", "libx265", "-crf", "28", "-x265-params", "log-level=none",
         "-pix_fmt", "yuv420p"]
    # lossless is ffv1/rgb24 in MKV but x264 yuv444p elsewhere
    assert vc.get_video_encode_args("libx264_lossless", "mkv") == \
        ["-c:v", "ffv1", "-pix_fmt", "rgb24"]
    assert vc.get_video_encode_args("libx264_lossless", "mp4") == \
        ["-c:v", "libx264", "-crf", "0", "-pix_fmt", "yuv444p"]
    assert vc.get_video_encode_args("prores_422", "mov") == \
        ["-c:v", "prores_ks", "-profile:v", "2", "-pix_fmt", "yuv422p10le"]
    # unknown key falls back to libx264_8
    assert vc.get_video_encode_args("bogus", None) == \
        vc.get_video_encode_args("libx264_8", "mp4")


def test_container_extension():
    assert vc.get_video_container_extension("mkv") == ".mkv"
    assert vc.get_video_container_extension(None) == ".mp4"
    assert vc.get_video_container_extension("webm") == ".mp4"


def test_validation_rules():
    assert vc.validate_video_output_settings("libx264_8", "mp4") is None
    assert "Unsupported video container" in \
        vc.validate_video_output_settings("libx264_8", "webm")
    assert "ProRes" in vc.validate_video_output_settings("prores_422", "mp4")
    assert vc.validate_video_output_settings("prores_422", "mov") is None
    assert "audio codec" in vc.validate_video_output_settings(
        "libx264_8", "mp4", audio_codec="pcm")
    assert "256x120" in vc.validate_video_output_settings(
        "dnxhr_hq", "mkv", width=100, height=100)


# -- HDR transfer math vs reference-executed goldens -------------------------

@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


def test_logc3_matches_reference(golden):
    x = golden["x"]
    np.testing.assert_allclose(vc.LogC3().compress(x), golden["logc"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vc.LogC3().decompress(golden["logc"]),
                               golden["rt"], rtol=1e-4, atol=1e-5)


def test_vae_range_carriers_match_reference(golden):
    x = golden["x"]
    np.testing.assert_allclose(vc.hdr_linear_to_vae_range(x), golden["vae"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(vc.vae_range_to_hdr_linear(golden["vae"]),
                               golden["back"], rtol=1e-4, atol=1e-5)


def test_tonemap_matches_reference(golden):
    # reference tonemaps [C,F,H,W]; ours is channel-last — golden is
    # already permuted back to [F,H,W,C]
    ours = vc.tonemap_hdr_to_uint8(golden["x"], exposure=-1.0)
    diff = np.abs(ours.astype(int) - golden["tonemap"].astype(int))
    assert diff.max() <= 1          # rounding at the uint8 boundary


def test_hdr10_strings_match_reference(golden):
    assert vc.hdr10_zscale_filter() == bytes(golden["zscale"]).decode()
    assert vc.hdr10_x265_params() == bytes(golden["x265"]).decode()
    assert vc.HDR_REFERENCE_WHITE_NITS == float(golden["consts"][0])


def test_hdr_encode_args_carry_crf():
    args = vc.get_hdr_video_encode_args("libx265_8", "mp4")
    assert args[args.index("-crf") + 1] == "8"
    assert "libx265" in args and "yuv420p10le" in args
    assert vc.hdr10_x265_params() in args
    # codecs without a CRF (prores) fall back to the default 18
    args = vc.get_hdr_video_encode_args("prores_422", "mov")
    assert args[args.index("-crf") + 1] == "18"


def test_logc3_roundtrip_identity():
    x = np.linspace(0.0, 8.0, 101, dtype=np.float32)
    rt = vc.LogC3().decompress(vc.LogC3().compress(x))
    clip = np.minimum(x, vc.LogC3().decompress(np.float32(1.0)))
    np.testing.assert_allclose(rt, clip, rtol=1e-3, atol=1e-4)


# -- save paths (no ffmpeg in this image -> fallback behavior) ---------------

def test_save_hdr_video_fallback_tonemaps(tmp_path):
    # smooth gradient (JPEG chroma subsampling would wreck per-pixel noise)
    t = np.linspace(0, 1, 5, dtype=np.float32)[:, None, None, None]
    y = np.linspace(0, 1, 32, dtype=np.float32)[None, :, None, None]
    x = np.linspace(0, 1, 48, dtype=np.float32)[None, None, :, None]
    hdr = np.concatenate([t + 0 * y + 0 * x, y + 0 * t + 0 * x,
                          x + 0 * t + 0 * y], axis=-1) * 2.0
    out = vc.save_hdr_video(hdr, str(tmp_path / "clip.mp4"), fps=8,
                            metadata={"prompt": "hdr test"})
    assert out.endswith(".avi") and os.path.exists(out)
    frames = media.read_mjpeg_avi(out)
    assert frames.shape == (5, 32, 48, 3)
    # tonemapped content, not the raw linear values
    expect = vc.tonemap_hdr_to_uint8(hdr)
    assert np.mean(np.abs(frames.astype(int) - expect.astype(int))) < 8
    assert media.read_video_metadata(out)["prompt"] == "hdr test"


def test_save_video_container_fallback(tmp_path):
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    out = media.save_video(frames, str(tmp_path / "clip.avi"), fps=8,
                           codec_type="libx265_28", container="mp4",
                           metadata={"seed": 7})
    # container requested mp4; without ffmpeg the writer falls back to AVI
    assert out.endswith(".avi") and os.path.exists(out)
    assert media.read_video_metadata(out)["seed"] == 7


def test_service_hdr_route(tmp_path):
    """A pipeline result {'hdr': True} goes through the HDR save path."""
    from wan2gp_tpu.runtime.service import GenerationService

    class FakeHandler:
        @staticmethod
        def generate_video(pipe, settings, w, h, frames, seed):
            rng = np.random.default_rng(seed)
            return {"video": rng.random((3, h, w, 3), np.float32) * 1.5,
                    "hdr": True, "fps": 8}

    svc = GenerationService(init_random_weights=True,
                            output_dir=str(tmp_path))
    # monkey-route one model type at the registry layer
    svc.registry.handler_for = lambda mt: FakeHandler
    svc._load_pipeline = lambda *a, **k: object()
    svc._pipelines["t2v_1.3B"] = object()
    outs = svc.generate({"model_type": "t2v_1.3B", "prompt": "x",
                         "resolution": "48x32", "video_length": 3,
                         "seed": 3})
    vids = [o for o in outs if o.endswith((".avi", ".mp4"))]
    assert vids and os.path.exists(vids[0])
    frames = media.read_mjpeg_avi(vids[0])
    assert frames.shape[1:] == (32, 48, 3)
