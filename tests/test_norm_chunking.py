"""Chunked-norm parity: the large-input token-chunked paths in
ops/norms.py must be bit-comparable to the unchunked math, including
the adaLN input layout [B, T_mod=1, L, C] where chunking over axis 1
used to silently disable (r05 fix: chunk the longest middle axis).

Reference dtype discipline: model.py lock_layers_dtypes (norms fp32).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wan2gp_tpu.ops import norms


@pytest.fixture
def small_chunks(monkeypatch):
    # Force the chunked path on test-size inputs.
    monkeypatch.setattr(norms, "_NORM_CHUNK_ELEMS", 1024)


SHAPES = [
    (2, 6, 64),        # [B, L, C] — classic token axis
    (1, 1, 96, 64),    # [B, T_mod=1, L, C] — the silently-unchunked bug
    (1, 5, 96, 16),    # [B, T, L, C] with L the longest middle axis
]


@pytest.mark.parametrize("shape", SHAPES)
def test_rms_norm_chunked_matches_full(small_chunks, shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), shape[-1:], jnp.float32)
    got = norms.rms_norm(x, w)
    want = norms._rms_norm_full(x, w, 1e-5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("shape", SHAPES)
def test_layer_norm_chunked_matches_full(small_chunks, shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    w = jax.random.normal(jax.random.key(1), shape[-1:], jnp.float32)
    b = jax.random.normal(jax.random.key(2), shape[-1:], jnp.float32)
    got = norms.layer_norm(x, w, b)
    want = norms._layer_norm_full(x, w, b, 1e-6, x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("shape", SHAPES)
def test_modulated_layer_norm_chunked_matches_full(small_chunks, shape):
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    # adaLN shift/scale broadcast over the token axis, full over C.
    mod_shape = shape[:-2] + (1, shape[-1])
    sh = jax.random.normal(jax.random.key(1), mod_shape, jnp.float32)
    sc = jax.random.normal(jax.random.key(2), mod_shape, jnp.float32)
    got = norms.modulated_layer_norm(x, sh, sc)
    y = norms._layer_norm_full(x, None, None, 1e-6, jnp.float32)
    want = (y * (1.0 + sc) + sh).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_modulated_layer_norm_per_token_mod(small_chunks):
    """shift/scale that vary along the chunked axis must be sliced in
    step with x (TeaCache adaLN at [B, T, L, C] layouts)."""
    shape = (1, 1, 96, 64)
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    mod_shape = (1, 1, 96, 64)  # per-token modulation along axis 2
    sh = jax.random.normal(jax.random.key(1), mod_shape, jnp.float32)
    sc = jax.random.normal(jax.random.key(2), mod_shape, jnp.float32)
    got = norms.modulated_layer_norm(x, sh, sc)
    y = norms._layer_norm_full(x, None, None, 1e-6, jnp.float32)
    want = (y * (1.0 + sc) + sh).astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=1e-2, atol=1e-2)


def test_chunk_axis_picks_longest_middle_axis():
    ax, n, lc = norms._chunk_axis(jnp.zeros((1, 1, 4096, 64)))
    assert ax == 2 and n > 1 and 4096 % lc == 0
    ax2, n2, lc2 = norms._chunk_axis(jnp.zeros((1, 4096, 1, 64)))
    assert ax2 == 1 and n2 > 1
