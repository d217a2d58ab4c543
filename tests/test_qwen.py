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


def test_qwen_checkpoint_roundtrip():
    """Diffusers-layout state dict -> loader -> forward parity."""
    from wan2gp_tpu.io.qwen_checkpoint import load_qwen_image_params
    params = init_qwen_image(jax.random.key(9), TINY, jnp.float32)

    def put_lin(sd, name, p, i=None):
        g = (lambda x: np.asarray(x[i], np.float32)) if i is not None \
            else (lambda x: np.asarray(x, np.float32))
        sd[f"{name}.weight"] = g(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = g(p["b"])

    sd = {}
    put_lin(sd, "img_in", params["img_in"])
    sd["txt_norm.weight"] = np.asarray(params["txt_norm"], np.float32)
    put_lin(sd, "txt_in", params["txt_in"])
    put_lin(sd, "time_text_embed.timestep_embedder.linear_1",
            params["time_embed"]["in"])
    put_lin(sd, "time_text_embed.timestep_embedder.linear_2",
            params["time_embed"]["out"])
    put_lin(sd, "norm_out.linear", params["norm_out"])
    put_lin(sd, "proj_out", params["proj_out"])
    bp = params["blocks"]
    for i in range(TINY.num_layers):
        pre = f"transformer_blocks.{i}"
        put_lin(sd, f"{pre}.img_mod.1", bp["img_mod"], i)
        put_lin(sd, f"{pre}.txt_mod.1", bp["txt_mod"], i)
        for stream, hf in (("img_attn", ""), ("txt_attn", "add_")):
            names = {"q": f"{hf}q_proj" if hf else "to_q",
                     "k": f"{hf}k_proj" if hf else "to_k",
                     "v": f"{hf}v_proj" if hf else "to_v"}
            for m, hfname in names.items():
                put_lin(sd, f"{pre}.attn.{hfname}", bp[stream][m], i)
            nq = "norm_added_q" if hf else "norm_q"
            nk = "norm_added_k" if hf else "norm_k"
            sd[f"{pre}.attn.{nq}.weight"] = \
                np.asarray(bp[stream]["norm_q"][i], np.float32)
            sd[f"{pre}.attn.{nk}.weight"] = \
                np.asarray(bp[stream]["norm_k"][i], np.float32)
        put_lin(sd, f"{pre}.attn.to_out.0", bp["to_out"], i)
        put_lin(sd, f"{pre}.attn.to_add_out", bp["to_add_out"], i)
        put_lin(sd, f"{pre}.img_mlp.net.0.proj", bp["img_mlp1"], i)
        put_lin(sd, f"{pre}.img_mlp.net.2", bp["img_mlp2"], i)
        put_lin(sd, f"{pre}.txt_mlp.net.0.proj", bp["txt_mlp1"], i)
        put_lin(sd, f"{pre}.txt_mlp.net.2", bp["txt_mlp2"], i)

    loaded, left = load_qwen_image_params(sd, TINY, dtype=jnp.float32)
    assert left == []
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.standard_normal((1, 16, TINY.in_channels)),
                         jnp.float32)
    text = jnp.asarray(rng.standard_normal(
        (1, 5, TINY.joint_attention_dim)), jnp.float32)
    cos, sin = qwen_rope((1, 4, 4), 5, TINY)
    o1 = qwen_image_forward(params, TINY, tokens, jnp.asarray([0.5]),
                            text, cos, sin, attn_backend="xla")
    o2 = qwen_image_forward(loaded, TINY, tokens, jnp.asarray([0.5]),
                            text, cos, sin, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_qwen_edit_generation():
    """Edit path: cond latents appended, rope frame index per image."""
    params = init_qwen_image(jax.random.key(3), TINY, jnp.float32)
    rng = np.random.default_rng(3)

    def enc(prompt):
        t = jnp.asarray(rng.standard_normal(
            (1, 5, TINY.joint_attention_dim)), jnp.float32)
        return t, t

    from wan2gp_tpu.models.qwen.pipeline import (QwenImagePipeline,
                                                 QwenSamplingConfig)
    pipe = QwenImagePipeline(params, TINY, text_encode_fn=enc,
                             attn_backend="xla")
    cond = jnp.asarray(rng.standard_normal((16, 8, 8)), jnp.float32)
    z = pipe.generate_edit("recolor", [cond], width=64, height=64, seed=0,
                           sampling=QwenSamplingConfig(steps=2,
                                                       true_cfg_scale=2.0),
                           return_latents=True)
    assert z.shape == (1, 16, 8, 8)
    assert np.isfinite(np.asarray(z)).all()
    cond2 = jnp.asarray(rng.standard_normal((16, 8, 8)), jnp.float32)
    z2 = pipe.generate_edit("recolor", [cond2], width=64, height=64, seed=0,
                            sampling=QwenSamplingConfig(steps=2,
                                                        true_cfg_scale=2.0),
                            return_latents=True)
    assert not np.allclose(np.asarray(z), np.asarray(z2))


def test_qwen_rope_multi_grid():
    from wan2gp_tpu.models.qwen.dit import qwen_rope
    cos1, _ = qwen_rope((1, 4, 4), 5, TINY)
    cosm, _ = qwen_rope([(1, 4, 4), (1, 2, 2)], 5, TINY)
    assert cosm.shape[0] == 5 + 16 + 4
    # output-grid rows identical to the single-grid case
    np.testing.assert_allclose(np.asarray(cosm[5:21]),
                               np.asarray(cos1[5:21]), atol=1e-6)


def test_qwen_image_layered_generation():
    """Layered decomposition (pipeline_qwenimage.py:517-524): joint
    denoise of L layer latents on one sequence."""
    from wan2gp_tpu.models.qwen.dit import (QwenImageConfig,
                                            init_qwen_image, qwen_rope)
    from wan2gp_tpu.models.qwen.pipeline import (QwenImagePipeline,
                                                 QwenSamplingConfig)
    cfg = QwenImageConfig(num_layers=2, attention_head_dim=16,
                          num_attention_heads=4, joint_attention_dim=32,
                          axes_dims_rope=(4, 6, 6),
                          compute_dtype=jnp.float32)
    params = init_qwen_image(jax.random.key(0), cfg, jnp.float32)
    pipe = QwenImagePipeline(params, cfg, attn_backend="xla")
    rng = np.random.default_rng(0)
    txt = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
    z = pipe.generate_layered(
        "", num_layers=3, width=32, height=32,
        sampling=QwenSamplingConfig(steps=2, true_cfg_scale=1.0),
        text=txt, text_null=txt, return_latents=True)
    assert z.shape == (3, 16, 4, 4)
    assert np.isfinite(np.asarray(z)).all()
    # layers differ (independent noise, per-layer rope frames)
    assert not np.allclose(np.asarray(z[0]), np.asarray(z[1]))
