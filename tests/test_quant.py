"""int8 quantization tests: kernel vs reference, tree quantization, quanto
checkpoint loading, quantized DiT forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.ops.quant import (
    quantize_int8, matmul_w8, dense_quant, quantize_params_tree)
from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                    freq_dim=16, text_dim=16, text_len=4)


def test_quantize_int8_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 32)).astype(np.float32)
    w_q, scale = quantize_int8(w)
    assert w_q.dtype == np.int8 and scale.shape == (32,)
    deq = w_q.astype(np.float32) * scale[None]
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01


def test_matmul_w8_interpret_matches_dequant():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((24, 64)).astype(np.float32)
    w = rng.standard_normal((64, 48)).astype(np.float32)
    w_q, scale = quantize_int8(w)
    got = np.asarray(matmul_w8(jnp.asarray(x), jnp.asarray(w_q),
                               jnp.asarray(scale), block_m=8, block_n=16,
                               block_k=32, interpret=True))
    want = x @ (w_q.astype(np.float32) * scale[None])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dense_quant_xla_path():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    w_q, scale = quantize_int8(w)
    p = {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(scale),
         "b": jnp.ones((8,), jnp.float32)}
    got = np.asarray(dense_quant(x, p, backend="xla"))
    want = np.asarray(x) @ (w_q.astype(np.float32) * scale[None]) + 1.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quantized_dit_forward_close_to_fp():
    params = init_wan_dit(jax.random.key(0), TINY, dtype=jnp.float32)
    qparams = quantize_params_tree(
        params, predicate=lambda p: "blocks" in p and
        ("self_attn" in p or "cross_attn" in p or "ffn" in p))
    # stacked block leaf got quantized
    assert "w_q" in qparams["blocks"]["ffn"]["fc1"]
    assert qparams["blocks"]["ffn"]["fc1"]["w_q"].shape == (2, 32, 64)

    rng = np.random.default_rng(3)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    o_fp = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    o_q = wan_dit_forward(qparams, TINY, lat, t, ctx, cos, sin,
                          attn_backend="xla")
    err = np.abs(np.asarray(o_fp) - np.asarray(o_q)).max()
    scale = np.abs(np.asarray(o_fp)).max()
    assert err < 0.1 * scale, (err, scale)


def test_quanto_checkpoint_all_quantized():
    from wan2gp_tpu.io.wan_checkpoint import load_wan_dit_params
    from tests.test_checkpoint_io import _rand_dit_sd
    rng = np.random.default_rng(5)
    sd = _rand_dit_sd(TINY, rng)
    for key in list(sd):
        if (key.startswith("blocks.") and key.endswith(".weight")
                and "norm" not in key
                and (".self_attn." in key or ".cross_attn." in key
                     or ".ffn." in key)):
            w = sd.pop(key)
            w_q, scale = quantize_int8(w.T)
            sd[key + "._data"] = np.ascontiguousarray(w_q.T)
            sd[key + "._scale"] = scale.reshape(-1, 1)
    params, leftover = load_wan_dit_params(sd, TINY)
    assert leftover == []
    assert "w_q" in params["blocks"]["self_attn"]["q"]
    rng2 = np.random.default_rng(6)
    lat = jnp.asarray(rng2.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng2.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    out = wan_dit_forward(params, TINY, lat, jnp.full((1,), 500.0), ctx,
                          cos, sin, attn_backend="xla")
    assert np.isfinite(np.asarray(out)).all()


def test_quantize_int4_roundtrip():
    from wan2gp_tpu.ops.quant import quantize_int4, unpack_int4
    rng = np.random.default_rng(7)
    w = rng.standard_normal((100, 32)).astype(np.float32)
    w_p, scale = quantize_int4(w, block_k=32)
    assert w_p.dtype == np.int8
    assert w_p.shape == (64, 32)          # K padded 100 -> 128, packed /2
    deq = unpack_int4(w_p, scale, 100)
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.1                       # 4-bit: coarse but bounded


def test_matmul_w4_interpret_matches_dequant():
    from wan2gp_tpu.ops.quant import quantize_int4, matmul_w4, unpack_int4
    rng = np.random.default_rng(8)
    x = rng.standard_normal((24, 100)).astype(np.float32)
    w = rng.standard_normal((100, 48)).astype(np.float32)
    w_p, scale = quantize_int4(w, block_k=32)
    got = np.asarray(matmul_w4(jnp.asarray(x), jnp.asarray(w_p),
                               jnp.asarray(scale), k_orig=100, block_m=8,
                               block_n=16, block_k=32, interpret=True))
    want = x @ unpack_int4(w_p, scale, 100)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_dense_quant_w4_xla_path():
    from wan2gp_tpu.ops.quant import quantize_int4, unpack_int4
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((2, 5, 64)), jnp.float32)
    w = rng.standard_normal((64, 16)).astype(np.float32)
    w_p, scale = quantize_int4(w, block_k=32)
    p = {"w_q4": jnp.asarray(w_p), "scale": jnp.asarray(scale),
         "b": jnp.ones((16,), jnp.float32)}
    got = np.asarray(dense_quant(x, p, backend="xla"))
    want = np.asarray(x) @ unpack_int4(w_p, scale, 64) + 1.0
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_w4_dit_forward_close_to_fp():
    params = init_wan_dit(jax.random.key(0), TINY, dtype=jnp.float32)
    qparams = quantize_params_tree(
        params, predicate=lambda p: "blocks" in p and
        ("self_attn" in p or "cross_attn" in p or "ffn" in p), bits=4)
    assert "w_q4" in qparams["blocks"]["ffn"]["fc1"]

    rng = np.random.default_rng(10)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=TINY.head_dim)
    t = jnp.full((1,), 500.0)
    o_fp = wan_dit_forward(params, TINY, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    o_q = wan_dit_forward(qparams, TINY, lat, t, ctx, cos, sin,
                          attn_backend="xla")
    err = np.abs(np.asarray(o_fp) - np.asarray(o_q)).max()
    scale = np.abs(np.asarray(o_fp)).max()
    assert err < 0.35 * scale, (err, scale)


def test_w8a8_matches_dequant_reference():
    """int8-activation kernel vs fp32 dequantized matmul: error bounded
    by the per-token activation quantization step."""
    from wan2gp_tpu.ops.quant import matmul_w8a8, quantize_int8
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((48, 320)), jnp.float32)
    w = rng.standard_normal((320, 200)).astype(np.float32) * 0.05
    w_q, sc = quantize_int8(w)
    ref = np.asarray(x) @ (w_q.astype(np.float32) * sc[None, :])
    out = np.asarray(matmul_w8a8(x, jnp.asarray(w_q), jnp.asarray(sc),
                                 interpret=True))
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 2e-2


def test_w4a8_matches_dequant_reference():
    from wan2gp_tpu.ops.quant import (matmul_w4a8, quantize_int4,
                                      unpack_int4)
    rng = np.random.default_rng(12)
    k = 700    # not a multiple of 2*W4_BLOCK_K -> exercises K padding
    x = jnp.asarray(rng.standard_normal((32, k)), jnp.float32)
    w = rng.standard_normal((k, 130)).astype(np.float32) * 0.05
    w_p, sc = quantize_int4(w)
    wd = unpack_int4(w_p, sc, k)
    ref = np.asarray(x) @ wd
    out = np.asarray(matmul_w4a8(x, jnp.asarray(w_p), jnp.asarray(sc),
                                 k_orig=k, interpret=True))
    denom = np.abs(ref).max()
    assert np.abs(out - ref).max() / denom < 2e-2


def test_dense_quant_a8_policy():
    """set_act_quant('int8') routes dense_quant through the A8 kernels."""
    from wan2gp_tpu.ops import quant
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((2, 24, 256)), jnp.float32)
    w = rng.standard_normal((256, 128)).astype(np.float32) * 0.05
    w_q, sc = quant.quantize_int8(w)
    p = {"w_q": jnp.asarray(w_q), "scale": jnp.asarray(sc),
         "b": jnp.zeros((128,), jnp.float32)}
    base = np.asarray(quant.dense_quant(x, p, backend="pallas_interpret"))
    quant.set_act_quant("int8")
    try:
        a8 = np.asarray(quant.dense_quant(x, p,
                                          backend="pallas_interpret"))
    finally:
        quant.set_act_quant("bf16")
    assert a8.shape == base.shape
    assert np.abs(a8 - base).max() / np.abs(base).max() < 2e-2
