"""Ovi joint audio+video fusion (reference models/wan/ovi/,
ovi_fusion_engine.py)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from wan2gp_tpu.models.wan.ovi import (
    build_audio_rope, init_ovi_fusion, load_ovi_fusion_params,
    ovi_fusion_forward, OviPipeline, AUDIO_ROPE_SCALING)
from wan2gp_tpu.ops.rope import build_rope_3d

VCFG = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=48, text_len=16, in_dim=48,
                    out_dim=48, compute_dtype=jnp.float32)
ACFG = dataclasses.replace(VCFG, in_dim=20, out_dim=20,
                           patch_size=(1, 1, 1))


def test_audio_rope_tables():
    """rotary dims = d - 4*(d//6), scaled inverse freqs, identity tail
    (model.py rope_params_audio_real:47-60)."""
    cos, sin = build_audio_rope(8, head_dim=24)
    rotary = 24 - 4 * (24 // 6)     # 8 dims -> 4 table cols
    assert cos.shape == (8, 12)
    # passthrough tail: cos 1 / sin 0
    assert np.allclose(np.asarray(cos[:, rotary // 2:]), 1.0)
    assert np.allclose(np.asarray(sin[:, rotary // 2:]), 0.0)
    # scaled frequency: angle at pos 1, dim 0 == scaling factor
    assert np.isclose(float(jnp.arccos(cos[1, 0])), AUDIO_ROPE_SCALING,
                      atol=1e-5)


def _models(seed=0):
    k = jax.random.split(jax.random.key(seed), 4)
    vp = init_wan_dit(k[0], VCFG, jnp.float32)
    ap = init_wan_dit(k[1], ACFG, jnp.float32)
    vfu = init_ovi_fusion(k[2], VCFG.num_layers, VCFG.dim, jnp.float32)
    afu = init_ovi_fusion(k[3], ACFG.num_layers, ACFG.dim, jnp.float32)
    return vp, ap, vfu, afu


def test_ovi_fusion_forward():
    vp, ap, vfu, afu = _models()
    rng = np.random.default_rng(0)
    vid = jnp.asarray(rng.standard_normal((1, 48, 3, 8, 8)), jnp.float32)
    aud = jnp.asarray(rng.standard_normal((1, 10, 20)), jnp.float32)
    vctx = jnp.asarray(rng.standard_normal((1, 8, 48)), jnp.float32)
    actx = jnp.asarray(rng.standard_normal((1, 8, 48)), jnp.float32)
    vrope = build_rope_3d((3, 4, 4), head_dim=VCFG.head_dim)
    arope = build_audio_rope(10, ACFG.head_dim)
    t = jnp.full((1,), 500.0)
    v_out, a_out = ovi_fusion_forward(vp, ap, vfu, afu, VCFG, ACFG,
                                      vid, aud, t, vctx, actx, vrope,
                                      arope, attn_backend="xla")
    assert v_out.shape == (1, 48, 3, 8, 8)
    assert a_out.shape == (1, 10, 20)
    assert np.isfinite(np.asarray(v_out)).all()
    assert np.isfinite(np.asarray(a_out)).all()
    # cross-modal flow: changing the audio changes the VIDEO output
    v2, _ = ovi_fusion_forward(vp, ap, vfu, afu, VCFG, ACFG, vid,
                               aud * -1.0, t, vctx, actx, vrope, arope,
                               attn_backend="xla")
    assert not np.allclose(np.asarray(v_out), np.asarray(v2))
    # and changing the video changes the AUDIO output
    _, a2 = ovi_fusion_forward(vp, ap, vfu, afu, VCFG, ACFG,
                               vid * -1.0, aud, t, vctx, actx, vrope,
                               arope, attn_backend="xla")
    assert not np.allclose(np.asarray(a_out), np.asarray(a2))


def test_ovi_fusion_loader_roundtrip():
    vfu = init_ovi_fusion(jax.random.key(1), 2, 96, jnp.float32)
    sd = {}
    for i in range(2):
        pre = f"blocks.{i}.cross_attn"
        sd[f"{pre}.k_fusion.weight"] = np.asarray(
            vfu["k_fusion"]["w"][i]).T
        sd[f"{pre}.k_fusion.bias"] = np.asarray(vfu["k_fusion"]["b"][i])
        sd[f"{pre}.v_fusion.weight"] = np.asarray(
            vfu["v_fusion"]["w"][i]).T
        sd[f"{pre}.v_fusion.bias"] = np.asarray(vfu["v_fusion"]["b"][i])
        sd[f"{pre}.pre_attn_norm_fusion.weight"] = np.asarray(
            vfu["pre_ln"]["w"][i])
        sd[f"{pre}.pre_attn_norm_fusion.bias"] = np.asarray(
            vfu["pre_ln"]["b"][i])
        sd[f"{pre}.norm_k_fusion.weight"] = np.asarray(
            vfu["norm_k_fusion"][i])
    loaded = load_ovi_fusion_params(sd, 2, jnp.float32)
    assert sd == {}
    np.testing.assert_allclose(np.asarray(loaded["k_fusion"]["w"]),
                               np.asarray(vfu["k_fusion"]["w"]),
                               atol=1e-6)


def test_ovi_pipeline_e2e():
    vp, ap, vfu, afu = _models(seed=2)
    rng = np.random.default_rng(1)

    def text_fn(prompts):
        k = jax.random.key(abs(hash(prompts[0])) % (2 ** 31))
        return jax.random.normal(k, (1, 8, 48), jnp.float32)

    pipe = OviPipeline(vp, ap, vfu, afu, VCFG, ACFG,
                       text_encode_fn=text_fn, attn_backend="xla")
    vid, aud = pipe.generate("a dog barks", width=32, height=32,
                             frame_num=121, steps=2, guide_scale=2.0,
                             audio_guide_scale=2.0, seed=0,
                             return_latents=True)
    assert vid.shape == (1, 48, 31, 2, 2)
    assert aud.shape == (1, 157, 20)
    assert np.isfinite(np.asarray(vid)).all()
    assert np.isfinite(np.asarray(aud)).all()
