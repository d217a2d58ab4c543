"""Block-sparse flash attention: kernel == dense-masked oracle."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.ops.sparse_attention import (
    compress_block_mask, local_window_block_mask, radial_video_block_mask,
    sparse_attention)


def test_compress_block_mask():
    m = np.array([[1, 0, 1, 0],
                  [0, 0, 0, 0],
                  [1, 1, 1, 1]], bool)
    idx, counts = compress_block_mask(m)
    assert counts.tolist() == [2, 0, 4]
    assert idx.shape == (3, 4)
    assert idx[0, :2].tolist() == [0, 2]
    assert idx[0, 2:].tolist() == [0, 0]       # padded slots re-point


def test_local_window_mask():
    m = local_window_block_mask(512, 128, window_blocks=1, sink_blocks=1)
    assert m.shape == (4, 4)
    assert m[3, 0] and m[3, 2] and m[3, 3] and not m[3, 1]


def test_radial_mask_structure():
    m = radial_video_block_mask(frames=8, tokens_per_frame=256, block=128)
    bpf = 2
    assert m.shape == (16, 16)
    # diagonal frames fully attended; sink frame always attended
    assert m[:, :bpf].all()
    assert m[6, 6] and m[7, 7]
    # far-apart frames are sparser than near ones
    near = m[2 * bpf:3 * bpf, 1 * bpf:2 * bpf].sum()
    far = m[7 * bpf:8 * bpf, 2 * bpf:3 * bpf].sum()
    assert near >= far


@pytest.mark.parametrize("maskname", ["window", "radial", "full"])
def test_kernel_matches_dense_oracle(maskname):
    b, l, n, d = 1, 512, 2, 64
    key = jax.random.key(0)
    q = jax.random.normal(key, (b, l, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    if maskname == "window":
        mask = local_window_block_mask(l, 128, 1)
    elif maskname == "radial":
        mask = radial_video_block_mask(4, 128, 128)
    else:
        mask = np.ones((4, 4), bool)
    ref = sparse_attention(q, k, v, mask, backend="xla")
    got = sparse_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_empty_row_outputs_zero():
    b, l, n, d = 1, 256, 1, 32
    key = jax.random.key(3)
    q = jax.random.normal(key, (b, l, n, d))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    mask = np.array([[1, 1], [0, 0]], bool)   # second q block fully masked
    got = sparse_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got[:, 128:]), 0.0, atol=1e-6)
    ref = sparse_attention(q, k, v, mask, backend="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)
