"""Preprocessing filter tests."""
import numpy as np

from wan2gp_tpu.preprocessing.filters import (
    to_gray, canny, scribble, expand_mask, outpainting_canvas,
    apply_outpainting, preprocess_video)


def test_gray():
    f = np.zeros((8, 8, 3), np.float32)
    f[..., 0] = 1.0
    g = to_gray(f)
    assert np.allclose(g[..., 0], g[..., 1])
    assert np.allclose(g[..., 0], 0.299, atol=1e-5)


def test_canny_detects_edge():
    f = -np.ones((16, 16, 3), np.float32)
    f[:, 8:] = 1.0
    e = canny(f)
    assert e.shape == (16, 16, 3)
    col = e[:, 7:10, 0]
    assert (col > 0).any()          # edge fires near the boundary
    assert (e[:, :4, 0] < 0).all()  # flat area stays black


def test_scribble_range():
    rng = np.random.default_rng(0)
    f = rng.uniform(-1, 1, (8, 8, 3)).astype(np.float32)
    s = scribble(f)
    assert s.min() >= -1.0 and s.max() <= 1.0


def test_expand_mask():
    m = np.zeros((9, 9), np.float32)
    m[4, 4] = 1.0
    d = expand_mask(m, 1)
    assert d.sum() == 9
    e = expand_mask(d, -1)
    assert e.sum() == 1 and e[4, 4] == 1


def test_outpainting():
    ch, cw, y0, x0 = outpainting_canvas(480, 832, (25, 25, 0, 0))
    assert ch % 16 == 0 and cw % 16 == 0
    assert ch >= 480 * 1.5 - 16 and cw == 832
    frames = np.ones((2, 32, 32, 3), np.float32)
    out, m = apply_outpainting(frames, None, (50, 0, 0, 50))
    assert out.shape[1] >= 48 and out.shape[2] >= 48
    # original area unmasked, border masked
    assert m.min() == 0.0 and m.max() == 1.0


def test_preprocess_video():
    frames = np.zeros((3, 8, 8, 3), np.float32)
    out = preprocess_video(frames, "gray")
    assert out.shape == frames.shape
    assert preprocess_video(frames, "identity") is not None
