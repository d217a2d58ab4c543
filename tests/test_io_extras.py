"""Tests: URL variant selection, file locator, quantized export round-trip,
diagnostics utilities."""
import os

import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.io.downloads import pick_checkpoint_url, FileLocator
from wan2gp_tpu.io.save_quantized import export_quantized_wan_dit
from wan2gp_tpu.io.safetensors_reader import load_safetensors
from wan2gp_tpu.io.wan_checkpoint import load_wan_dit_params
from wan2gp_tpu.models.wan.dit import (
    WanDiTConfig, init_wan_dit, wan_dit_forward)
from wan2gp_tpu.ops.rope import build_rope_3d
from wan2gp_tpu.utils.diagnostics import (
    format_generation_time, device_stats, StepTimer)

URLS = [
    "https://hf.co/x/wan2.1_text2video_14B_mbf16.safetensors",
    "https://hf.co/x/wan2.1_text2video_14B_quanto_mbf16_int8.safetensors",
    "https://hf.co/x/wan2.1_text2video_14B_quanto_mfp16_int8.safetensors",
]


def test_pick_checkpoint_url():
    assert pick_checkpoint_url(URLS) == URLS[0]
    assert pick_checkpoint_url(URLS, quantization="int8") == URLS[1]
    assert pick_checkpoint_url(URLS, quantization="int8",
                               dtype_policy="fp16") == URLS[2]


def test_file_locator(tmp_path):
    root = tmp_path / "ckpts"
    root.mkdir()
    (root / "model.safetensors").write_bytes(b"x")
    loc = FileLocator([str(root)])
    assert loc.locate("model.safetensors") == str(root / "model.safetensors")
    assert loc.locate("missing.safetensors") is None


def test_quantized_export_roundtrip(tmp_path):
    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                       freq_dim=16, text_dim=16, text_len=4)
    params = init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    path = str(tmp_path / "q.safetensors")
    export_quantized_wan_dit(params, path)
    sd = load_safetensors(path)
    assert "blocks.0.self_attn.q.weight._data" in sd
    loaded, leftover = load_wan_dit_params(dict(sd), cfg)
    assert leftover == []
    assert "w_q" in loaded["blocks"]["self_attn"]["q"]

    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 4, 16)), jnp.float32)
    cos, sin = build_rope_3d((1, 2, 2), head_dim=cfg.head_dim)
    t = jnp.full((1,), 500.0)
    o_fp = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    o_q = wan_dit_forward(loaded, cfg, lat, t, ctx, cos, sin,
                          attn_backend="xla")
    err = np.abs(np.asarray(o_fp) - np.asarray(o_q)).max()
    assert err < 0.15 * max(np.abs(np.asarray(o_fp)).max(), 1e-3)


def test_diagnostics_helpers():
    assert format_generation_time(42.3) == "42.3s"
    assert format_generation_time(125) == "2m 5s"
    assert format_generation_time(3725) == "1h 2m 5s"
    stats = device_stats()
    assert "devices" in stats or "error" in stats
    t = StepTimer()
    t.mark("a")
    rep = t.report()
    assert "a" in rep and rep["total"] >= 0
