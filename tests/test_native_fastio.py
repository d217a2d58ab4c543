"""Native host-IO runtime (native/fastio.cc via ctypes): threaded dtype
and pixel conversions must be bit-exact against the numpy reference,
the parallel reader must reproduce file bytes, and every wrapper must
fall back cleanly when the extension is disabled."""
import os
import subprocess
import sys
import tempfile

import numpy as np
import ml_dtypes
import pytest

from wan2gp_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no native toolchain")


def test_bf16_f16_roundtrips():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1 << 18,)).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(native.bf16_to_f32(x),
                                  np.asarray(x).astype(np.float32))
    h = rng.normal(size=(1 << 18,)).astype(np.float16)
    np.testing.assert_array_equal(native.f16_to_f32(h),
                                  h.astype(np.float32))
    f = rng.normal(size=(1 << 18,)).astype(np.float32)
    # round-to-nearest-even downcast matches ml_dtypes exactly
    np.testing.assert_array_equal(
        np.asarray(native.f32_to_bf16(f)).view(np.uint16),
        f.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_pixel_conversions_match_numpy():
    rng = np.random.default_rng(1)
    u = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    np.testing.assert_allclose(native.u8_to_f32(u),
                               u.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)
    f = rng.uniform(-1.3, 1.3, size=(257, 33)).astype(np.float32)
    ref = np.clip(np.round(f * 127.5 + 127.5), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(native.f32_to_u8(f), ref)


def test_parallel_read_and_prefetch():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=(4 << 20,), dtype=np.uint8)
    with tempfile.NamedTemporaryFile(delete=False) as tf:
        tf.write(data.tobytes())
        path = tf.name
    try:
        r = native.parallel_read(path, 123, 1 << 20)
        assert r is not None
        np.testing.assert_array_equal(r, data[123:123 + (1 << 20)])
        assert native.prefetch_file(path)
    finally:
        os.remove(path)


def test_to_uint8_native_matches_fallback():
    """utils.media.to_uint8 produces identical bytes with and without
    the extension (WAN2GP_NO_NATIVE)."""
    code = (
        "import numpy as np\n"
        "from wan2gp_tpu.utils.media import to_uint8\n"
        "f = np.linspace(-1.4, 1.4, 4096, dtype=np.float32)"
        ".reshape(64, 64)\n"
        "print(to_uint8(f).sum(), to_uint8(f)[0, :5].tolist())\n")
    outs = []
    for env_extra in ({}, {"WAN2GP_NO_NATIVE": "1"}):
        env = dict(os.environ, JAX_PLATFORMS="cpu", **env_extra)
        outs.append(subprocess.run(
            [sys.executable, "-c", code], capture_output=True,
            text=True, env=env, timeout=120).stdout)
    assert outs[0] == outs[1] and outs[0].strip()


def test_load_safetensors_unaffected(tmp_path):
    from wan2gp_tpu.io.safetensors_reader import (save_safetensors,
                                                  load_safetensors)
    rng = np.random.default_rng(3)
    sd = {"a": rng.normal(size=(17, 9)).astype(np.float32),
          "b": rng.normal(size=(33,)).astype(ml_dtypes.bfloat16)}
    p = str(tmp_path / "t.safetensors")
    save_safetensors(p, dict(sd))
    out = load_safetensors(p)
    np.testing.assert_array_equal(out["a"], sd["a"])
    np.testing.assert_array_equal(np.asarray(out["b"]).view(np.uint16),
                                  np.asarray(sd["b"]).view(np.uint16))
