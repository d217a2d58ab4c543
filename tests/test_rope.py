"""RoPE tests: table structure and rotation semantics vs a complex-number
reference implementation."""
import numpy as np
import jax.numpy as jnp

from wan2gp_tpu.ops.rope import build_rope_3d, apply_rope


def _naive_rope(x, cos, sin):
    """Interleaved-pair rotation via complex multiply, per-token."""
    xs = x.astype(np.float64)
    xc = xs[..., 0::2] + 1j * xs[..., 1::2]        # [B, L, N, D/2]
    rot = cos.astype(np.float64) + 1j * sin.astype(np.float64)  # [L, D/2]
    out = xc * rot[None, :, None, :]
    y = np.empty_like(xs)
    y[..., 0::2] = out.real
    y[..., 1::2] = out.imag
    return y


def test_rope_table_axis_split():
    f, h, w = 3, 4, 5
    cos, sin = build_rope_3d((f, h, w), head_dim=128)
    assert cos.shape == (f * h * w, 64)
    cosn = np.asarray(cos).reshape(f, h, w, 64)
    # t-axis features (first 22 pairs) must not vary with h/w
    assert np.allclose(cosn[:, 0, 0, :22], cosn[:, 2, 3, :22])
    # h-axis features (next 21) must not vary with f/w
    assert np.allclose(cosn[0, :, 0, 22:43], cosn[2, :, 4, 22:43])
    # w-axis features (last 21) must not vary with f/h
    assert np.allclose(cosn[0, 0, :, 43:], cosn[2, 3, :, 43:])
    # position (0,0,0) has zero angle: cos=1, sin=0
    assert np.allclose(cosn[0, 0, 0], 1.0)
    assert np.allclose(np.asarray(sin).reshape(f, h, w, 64)[0, 0, 0], 0.0)


def test_apply_rope_matches_complex_reference():
    rng = np.random.default_rng(0)
    f, h, w, n, d = 2, 3, 4, 2, 128
    L = f * h * w
    x = rng.standard_normal((1, L, n, d)).astype(np.float32)
    cos, sin = build_rope_3d((f, h, w), head_dim=d)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    want = _naive_rope(x, np.asarray(cos), np.asarray(sin))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_apply_rope_preserves_norm():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 24, 4, 128)).astype(np.float32)
    cos, sin = build_rope_3d((2, 3, 4), head_dim=128)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1), rtol=1e-5)


def test_rope_relative_property_1d_axis():
    """Attention logits built from RoPE'd q/k must depend only on relative
    positions along each axis."""
    f = 6
    cos, sin = build_rope_3d((f, 1, 1), head_dim=128)
    rng = np.random.default_rng(2)
    q = rng.standard_normal((1, f, 1, 128)).astype(np.float32)
    # same content at every position
    q[:] = q[:, :1]
    qr = np.asarray(apply_rope(jnp.asarray(q), cos, sin))[0, :, 0]
    dots = qr @ qr.T
    # dot(i, j) should equal dot(i+1, j+1)
    np.testing.assert_allclose(dots[0, 2], dots[1, 3], rtol=1e-4)
    np.testing.assert_allclose(dots[2, 0], dots[3, 1], rtol=1e-4)
