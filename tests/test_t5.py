"""UMT5 encoder tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.t5 import (
    T5Config, init_t5_encoder, t5_encode, relative_position_buckets)

TINY = T5Config(vocab_size=100, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                num_layers=2, compute_dtype=jnp.float32)


def test_bucket_table_properties():
    b = relative_position_buckets(16, num_buckets=32, max_dist=128)
    assert b.shape == (16, 16)
    assert b[0, 0] == 0                      # zero distance -> bucket 0
    assert (b >= 0).all() and (b < 32).all()
    # small negative distances (key before query) are exact buckets 0..7
    assert b[5, 4] == 1 and b[5, 3] == 2 and b[7, 0] == 7
    # positive direction offset by half
    assert b[4, 5] == 17 and b[3, 5] == 18
    # symmetry of magnitude between directions (bucket - 16)
    np.testing.assert_array_equal(b[10, 2], b[2, 10] - 16)


def test_t5_encode_shapes_and_mask():
    params = init_t5_encoder(jax.random.key(0), TINY)
    ids = jnp.asarray(np.arange(10).reshape(1, 10) % 100, dtype=jnp.int32)
    mask = jnp.asarray([[1, 1, 1, 1, 1, 1, 0, 0, 0, 0]], dtype=jnp.int32)
    out = t5_encode(params, TINY, ids, mask)
    assert out.shape == (1, 10, 32)
    assert np.isfinite(np.asarray(out)).all()
    # masked positions must not influence unmasked outputs
    ids2 = ids.at[0, 7].set(42)
    out2 = t5_encode(params, TINY, ids2, mask)
    np.testing.assert_allclose(np.asarray(out[:, :6]),
                               np.asarray(out2[:, :6]), atol=1e-6)


def test_t5_batch_independence():
    params = init_t5_encoder(jax.random.key(1), TINY)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 100, (2, 8)), dtype=jnp.int32)
    mask = jnp.ones((2, 8), dtype=jnp.int32)
    out = t5_encode(params, TINY, ids, mask)
    solo = t5_encode(params, TINY, ids[:1], mask[:1])
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(solo[0]),
                               rtol=1e-5, atol=1e-5)


def test_t5_shared_pos_variant():
    """T5 v1.1 mode: one relative-position table shared by all layers."""
    import jax.numpy as jnp
    from wan2gp_tpu.models.wan.t5 import T5Config, t5_encode
    from wan2gp_tpu.io.wan_checkpoint import load_hf_t5_params
    cfg = T5Config(vocab_size=50, dim=16, dim_attn=16, dim_ffn=32,
                   num_heads=2, num_layers=2, shared_pos=True,
                   compute_dtype=jnp.float32)
    rng = np.random.default_rng(0)
    sd = {"shared.weight": rng.standard_normal((50, 16)).astype(np.float32),
          "encoder.final_layer_norm.weight": np.ones(16, np.float32),
          "encoder.block.0.layer.0.SelfAttention.relative_attention_bias."
          "weight": rng.standard_normal((32, 2)).astype(np.float32) * 0.05}
    for i in range(2):
        pre = f"encoder.block.{i}"
        for m in ("q", "k", "v", "o"):
            sd[f"{pre}.layer.0.SelfAttention.{m}.weight"] = \
                rng.standard_normal((16, 16)).astype(np.float32) * 0.05
        sd[f"{pre}.layer.0.layer_norm.weight"] = np.ones(16, np.float32)
        sd[f"{pre}.layer.1.layer_norm.weight"] = np.ones(16, np.float32)
        sd[f"{pre}.layer.1.DenseReluDense.wi_0.weight"] = \
            rng.standard_normal((32, 16)).astype(np.float32) * 0.05
        sd[f"{pre}.layer.1.DenseReluDense.wi_1.weight"] = \
            rng.standard_normal((32, 16)).astype(np.float32) * 0.05
        sd[f"{pre}.layer.1.DenseReluDense.wo.weight"] = \
            rng.standard_normal((16, 32)).astype(np.float32) * 0.05
    params, leftover = load_hf_t5_params(sd, cfg, dtype=jnp.float32)
    assert leftover == []
    ids = jnp.asarray(rng.integers(0, 50, (1, 6)), jnp.int32)
    out = t5_encode(params, cfg, ids, jnp.ones((1, 6), jnp.int32))
    assert out.shape == (1, 6, 16)
    assert np.isfinite(np.asarray(out)).all()
