"""Qwen-Image family tests on a tiny config."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.qwen.dit import (
    QwenImageConfig, init_qwen_image, qwen_image_forward, qwen_rope)
from wan2gp_tpu.models.qwen.pipeline import (
    QwenImagePipeline, QwenSamplingConfig, qwen_schedule)

TINY = QwenImageConfig(in_channels=64, out_channels=16, num_layers=2,
                       attention_head_dim=16, num_attention_heads=4,
                       joint_attention_dim=32, axes_dims_rope=(4, 6, 6))


def test_rope_centered_positions():
    cos, sin = qwen_rope((1, 4, 4), txt_len=3, cfg=TINY)
    assert cos.shape == (3 + 16, 8)
    # txt tokens non-identity (positions continue after the grid)
    assert not np.allclose(np.asarray(cos[0]), 1.0)


def test_schedule():
    s = qwen_schedule(4, 1024)
    assert s[0] == pytest.approx(1.0) and s[-1] == 0.0
    assert np.all(np.diff(s) < 0)


def test_forward_shapes():
    params = init_qwen_image(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.standard_normal((1, 16, 64)), jnp.float32)
    text = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
    cos, sin = qwen_rope((1, 4, 4), 5, TINY)
    out = qwen_image_forward(params, TINY, tokens, jnp.asarray([0.5]),
                             text, cos, sin, attn_backend="xla")
    assert out.shape == (1, 16, 64)   # patch^2 * out_channels = 4*16
    assert np.isfinite(np.asarray(out)).all()


def test_pipeline_true_cfg():
    params = init_qwen_image(jax.random.key(1), TINY)
    pipe = QwenImagePipeline(params, TINY, attn_backend="xla")
    rng = np.random.default_rng(1)
    text = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
    textn = jnp.asarray(rng.standard_normal((1, 5, 32)), jnp.float32)
    lat = pipe.generate(width=32, height=32, seed=0,
                        sampling=QwenSamplingConfig(steps=2,
                                                    true_cfg_scale=4.0),
                        text=text, text_null=textn, return_latents=True)
    assert lat.shape == (1, 16, 4, 4)
    assert np.isfinite(np.asarray(lat)).all()
