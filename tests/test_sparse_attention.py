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


# ---------------------------------------------------------------------------
# chipmunk dynamic block selection (model.py:886-905 mechanism)
# ---------------------------------------------------------------------------

def test_voxel_order_roundtrip():
    from wan2gp_tpu.ops.sparse_attention import voxel_order
    perm, inv = voxel_order((4, 6, 8), chunk=(2, 3, 4))
    x = np.arange(4 * 6 * 8)
    np.testing.assert_array_equal(x[perm][inv], x)
    # a voxel's tokens are contiguous after permutation
    first_voxel = x[perm][:2 * 3 * 4].reshape(2, 3, 4)
    grid = x.reshape(4, 6, 8)
    np.testing.assert_array_equal(first_voxel, grid[:2, :3, :4])


def test_chipmunk_topk_selects_mass_blocks():
    from wan2gp_tpu.ops.sparse_attention import (chipmunk_block_topk,
                                                 chipmunk_attention)
    rng = np.random.default_rng(0)
    b, l, n, d = 1, 64, 2, 16
    blk = 16
    q = rng.standard_normal((b, l, n, d)).astype(np.float32) * 0.1
    k = rng.standard_normal((b, l, n, d)).astype(np.float32) * 0.1
    # plant a strong alignment: q block 0 matches k block 3
    q[:, :blk] = 1.0
    k[:, 3 * blk:4 * blk] = 1.0
    v = rng.standard_normal((b, l, n, d)).astype(np.float32)
    kv_idx, counts = chipmunk_block_topk(jnp.asarray(q), jnp.asarray(k),
                                         blk, blk, topk=2)
    assert kv_idx.shape == (4, 2)
    assert 3 in np.asarray(kv_idx)[0]
    out = chipmunk_attention(jnp.asarray(q), jnp.asarray(k),
                             jnp.asarray(v), kv_idx, counts,
                             block_q=blk, block_kv=blk, backend="xla")
    assert out.shape == (b, l, n, d)
    assert np.isfinite(np.asarray(out)).all()


def test_chipmunk_full_topk_equals_dense():
    """topk == all blocks must reproduce dense attention exactly."""
    from wan2gp_tpu.ops.sparse_attention import (chipmunk_block_topk,
                                                 chipmunk_attention)
    from wan2gp_tpu.ops.attention import attention
    rng = np.random.default_rng(1)
    b, l, n, d = 2, 64, 2, 16
    blk = 16
    q = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    kv_idx, counts = chipmunk_block_topk(q, k, blk, blk, topk=4)
    out = chipmunk_attention(q, k, v, kv_idx, counts, block_q=blk,
                             block_kv=blk, backend="xla")
    ref = attention(q, k, v, backend="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_chipmunk_kernel_matches_dense_fallback():
    """The Pallas scalar-prefetch kernel (interpret mode) agrees with the
    dense oracle over the same runtime tables."""
    from wan2gp_tpu.ops.sparse_attention import (chipmunk_block_topk,
                                                 chipmunk_attention)
    rng = np.random.default_rng(2)
    b, l, n, d = 1, 256, 2, 32
    blk = 128
    q = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, n, d)), jnp.float32)
    kv_idx, counts = chipmunk_block_topk(q, k, blk, blk, topk=1)
    a = chipmunk_attention(q, k, v, kv_idx, counts, block_q=blk,
                           block_kv=blk, backend="xla")
    b_ = chipmunk_attention(q, k, v, kv_idx, counts, block_q=blk,
                            block_kv=blk, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                               rtol=2e-3, atol=2e-3)


# ---------------------------------------------------------------------------
# round 3: band-radial masks (any block size) + ragged kernel + backend
# routing through ops/attention.py
# ---------------------------------------------------------------------------

def test_radial_band_mask_structure():
    from wan2gp_tpu.ops.sparse_attention import radial_band_block_mask
    # tokens_per_frame NOT a multiple of the block (the 720p case in
    # miniature): 10 frames x 360 tokens, block 32
    m = radial_band_block_mask(frames=10, tokens_per_frame=360, block=32)
    n_tok = 3600
    nb = -(-n_tok // 32)
    assert m.shape == (nb, nb)
    # sink column always attended
    assert m[:, : -(-360 // 32)].all()
    # every q block keeps its own diagonal block
    assert all(m[i, i] for i in range(nb))
    # overall sparsity: strictly sparser than dense
    assert m.mean() < 0.75
    # near frames denser than far frames (average row density by distance)
    frame_of = (np.arange(nb) * 32) // 360
    near = m[(frame_of == 2)][:, (frame_of == 3)].mean()
    far = m[(frame_of == 2)][:, (frame_of == 9)].mean()
    assert near >= far


def test_sparse_kernel_ragged_tail():
    """L not a multiple of the block: kernel masks padded keys by global
    column and matches the dense oracle."""
    from wan2gp_tpu.ops.sparse_attention import (radial_band_block_mask,
                                                 sparse_attention)
    b, l, n, d = 1, 450, 2, 64          # 450 = 5 frames x 90 tokens
    key = jax.random.key(3)
    q = jax.random.normal(key, (b, l, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    mask = radial_band_block_mask(5, 90, block=128)
    ref = sparse_attention(q, k, v, mask, backend="xla")
    got = sparse_attention(q, k, v, mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_attention_backend_radial_routing():
    """attention(backend="radial:F:TPF") == sparse_attention with the band
    mask; mismatched shapes (cross-attn) fall back to dense."""
    from wan2gp_tpu.ops.attention import attention
    from wan2gp_tpu.ops.sparse_attention import (radial_band_block_mask,
                                                 sparse_attention)
    b, n, d = 1, 2, 64
    f, tpf = 6, 128
    l = f * tpf
    key = jax.random.key(4)
    q = jax.random.normal(key, (b, l, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    got = attention(q, k, v, backend=f"radial:{f}:{tpf}")
    mask = radial_band_block_mask(f, tpf, block=512, block_kv=256)
    ref = sparse_attention(q, k, v, mask, backend="xla",
                           block_q=512, block_kv=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # cross-attention shape: falls back to dense (exact match with xla)
    kc = jax.random.normal(jax.random.fold_in(key, 5), (b, 77, n, d))
    vc = jax.random.normal(jax.random.fold_in(key, 6), (b, 77, n, d))
    got_c = attention(q, kc, vc, backend=f"radial:{f}:{tpf}")
    ref_c = attention(q, kc, vc, backend="xla")
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(ref_c),
                               atol=1e-6, rtol=1e-6)


def test_attention_backend_swa_routing():
    from wan2gp_tpu.ops.attention import attention
    from wan2gp_tpu.ops.sparse_attention import (local_window_block_mask,
                                                 sparse_attention)
    b, l, n, d = 1, 512, 2, 64
    key = jax.random.key(7)
    q = jax.random.normal(key, (b, l, n, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, l, n, d))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    got = attention(q, k, v, backend="swa:1:1")
    # the dispatcher's mask at its (block_q=512, block_kv=256) tiles
    from wan2gp_tpu.ops.attention import _structured_block_mask
    mask = _structured_block_mask("swa:1:1", l, l, 512, 256)
    ref = sparse_attention(q, k, v, np.asarray(mask), backend="xla",
                           block_q=512, block_kv=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_radial_close_to_dense_at_high_coverage():
    """Parity-at-threshold: with few frames (dense-ish mask) the radial
    output stays close to full attention on smooth inputs."""
    from wan2gp_tpu.ops.attention import attention
    b, n, d = 1, 2, 32
    f, tpf = 3, 128
    l = f * tpf
    key = jax.random.key(9)
    # smooth, locally-correlated tokens: radial's local bands capture the
    # attention mass
    base = jax.random.normal(key, (b, 8, n, d), jnp.float32)
    q = jax.image.resize(base, (b, l, n, d), "linear")
    k = q + 0.05 * jax.random.normal(jax.random.fold_in(key, 1), q.shape)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, l, n, d))
    dense = attention(q, k, v, backend="xla")
    sparse = attention(q, k, v, backend=f"radial:{f}:{tpf}")
    err = float(jnp.abs(sparse - dense).mean()
                / (jnp.abs(dense).mean() + 1e-8))
    assert err < 0.15, err


def test_pipeline_resolved_backend():
    from wan2gp_tpu.models.wan.dit import WanDiTConfig
    from wan2gp_tpu.models.wan.pipeline import WanPipeline
    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=1,
                       freq_dim=16, text_dim=16, text_len=4)
    pipe = WanPipeline(None, cfg, attn_backend="radial")
    # latents [B, C, F, H, W] = (1, 16, 4, 16, 16), patch (1, 2, 2)
    assert pipe.resolved_backend((1, 16, 4, 16, 16)) == "radial:4:64"
    pipe.attn_backend = "xla"
    assert pipe.resolved_backend((1, 16, 4, 16, 16)) == "xla"


def test_chipmunk_schedule():
    from wan2gp_tpu.ops.sparse_attention import chipmunk_schedule
    s = chipmunk_schedule(10, 4)
    assert s.tolist() == [True, False, False, False, True, False,
                          False, False, True, False]


def test_chipmunk_delta_caching_policy():
    """Dense steps are exact; sparse steps add the cached dense-sparse
    residual, so with static q/k/v they reproduce the dense output
    exactly (the SparseDiffAttn delta-caching identity)."""
    from wan2gp_tpu.ops.attention import attention
    from wan2gp_tpu.ops.sparse_attention import (init_chipmunk_state,
                                                 chipmunk_step)
    rng = np.random.default_rng(0)
    b, l, n, d = 1, 64, 2, 16
    q = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, l, n, d)), jnp.float32)
    dense = np.asarray(attention(q, k, v, backend="xla"))
    state = init_chipmunk_state(b, l, n, d, topk=2, block_q=16,
                                block_kv=16)
    o0, state = chipmunk_step(q, k, v, state, True, topk=2,
                              block_q=16, block_kv=16, backend="xla")
    np.testing.assert_allclose(np.asarray(o0), dense, atol=1e-5)
    # sparse step with unchanged inputs == dense (delta closes the gap)
    o1, state = chipmunk_step(q, k, v, state, False, topk=2,
                              block_q=16, block_kv=16, backend="xla")
    np.testing.assert_allclose(np.asarray(o1), dense, atol=1e-5)
    # perturbed inputs: sparse+delta stays close to the new dense
    q2 = q + 0.01 * jnp.asarray(rng.normal(size=q.shape), jnp.float32)
    dense2 = np.asarray(attention(q2, k, v, backend="xla"))
    o2, _ = chipmunk_step(q2, k, v, state, False, topk=2,
                          block_q=16, block_kv=16, backend="xla")
    err_policy = np.abs(np.asarray(o2) - dense2).max()
    # pure sparse without delta is much worse
    from wan2gp_tpu.ops.sparse_attention import chipmunk_attention
    o_raw = chipmunk_attention(q2, k, v, state["kv_idx"],
                               state["counts"], 16, 16, backend="xla")
    err_raw = np.abs(np.asarray(o_raw) - dense2).max()
    assert err_policy < err_raw


def test_chipmunk_step_in_scan():
    """The policy threads through lax.scan with a traced dense flag."""
    from wan2gp_tpu.ops.sparse_attention import (init_chipmunk_state,
                                                 chipmunk_step,
                                                 chipmunk_schedule)
    rng = np.random.default_rng(1)
    b, l, n, d = 1, 32, 2, 8
    qs = jnp.asarray(rng.normal(size=(4, b, l, n, d)), jnp.float32)
    plan = jnp.asarray(chipmunk_schedule(4, 2))
    state = init_chipmunk_state(b, l, n, d, topk=1, block_q=16,
                                block_kv=16)

    @jax.jit
    def run(qs, state):
        def body(st, xs):
            qq, dense = xs
            o, st = chipmunk_step(qq, qq, qq, st, dense, topk=1,
                                  block_q=16, block_kv=16,
                                  backend="xla")
            return st, o

        return jax.lax.scan(body, state, (qs, plan))

    _, outs = run(qs, state)
    assert outs.shape == (4, b, l, n, d)
    assert np.isfinite(np.asarray(outs)).all()
