"""FantasyTalking audio conditioning (reference models/wan/fantasytalking/).

Torch oracles re-derive the reference math (AudioProjModel = bias-free
Linear + LayerNorm, model.py:7-17); the window split is checked against
structural invariants of split_audio_sequence/split_tensor_with_padding
(model.py:72-170)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit, \
    wan_dit_forward
from wan2gp_tpu.models.wan.fantasy import (
    FantasyProjConfig, init_fantasy_proj, fantasy_proj_forward,
    load_fantasy_proj_params, split_audio_sequence,
    split_tensor_with_padding, fantasy_kv_mask, init_fantasy_attn_blocks,
    wav2vec2_conv_out_len)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=2,
                    freq_dim=32, text_dim=48, text_len=16,
                    compute_dtype=jnp.float32)


def test_fantasy_proj_torch_oracle():
    import torch
    cfg = FantasyProjConfig(audio_in_dim=16, cross_attention_dim=24)
    params = init_fantasy_proj(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 7, 16)).astype(np.float32)
    ours = np.asarray(fantasy_proj_forward(params, jnp.asarray(x)))
    # reference: proj (no bias) then LayerNorm (model.py:11-17)
    lin = torch.nn.Linear(16, 24, bias=False)
    ln = torch.nn.LayerNorm(24)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(
            np.asarray(params["proj"]["w"]).T.copy()))
        ln.weight.copy_(torch.from_numpy(np.asarray(params["norm"]["w"])))
        ln.bias.copy_(torch.from_numpy(np.asarray(params["norm"]["b"])))
        want = ln(lin(torch.from_numpy(x))).numpy()
    np.testing.assert_allclose(ours, want, atol=1e-5)


def test_fantasy_proj_loader_roundtrip():
    cfg = FantasyProjConfig(audio_in_dim=8, cross_attention_dim=12)
    params = init_fantasy_proj(jax.random.key(1), cfg)
    sd = {"proj.weight": np.asarray(params["proj"]["w"]).T,
          "norm.weight": np.asarray(params["norm"]["w"]),
          "norm.bias": np.asarray(params["norm"]["b"])}
    loaded, left = load_fantasy_proj_params(sd)
    assert left == []
    np.testing.assert_allclose(np.asarray(loaded["proj"]["w"]),
                               np.asarray(params["proj"]["w"]), atol=1e-6)


def test_split_audio_sequence_windows():
    """Structural parity with model.py:72-170: one window per latent
    frame, ranges centered on the latent frame's source video frames,
    first range pinned to the second's start, valid lengths recorded."""
    L, num_frames = 173, 81
    ranges = split_audio_sequence(L, num_frames)
    f_lat = (num_frames - 1) // 4 + 1
    assert len(ranges) == f_lat
    # all windows have equal extent (2*half_tokens)
    widths = {e - s for s, e in ranges}
    assert len(widths) == 1
    # first range ends where the second begins (model.py:104-107)
    assert ranges[0][1] == ranges[1][0]

    feats = np.arange(L, dtype=np.float32).reshape(1, L, 1)
    windows, k_lens = split_tensor_with_padding(feats, ranges,
                                                expand_length=4)
    assert windows.shape[0] == 1 and windows.shape[1] == f_lat
    assert k_lens.shape == (f_lat,)
    # an interior window is an exact unpadded slice
    s, e = ranges[10][0] - 4, ranges[10][1] + 4
    np.testing.assert_allclose(windows[0, 10, :, 0],
                               feats[0, s:e + 1, 0])
    assert k_lens[10] == e - s + 1
    # the first window starts before 0: front tokens are clipped, padding
    # sits at the back, k_lens counts only the valid part
    s0, e0 = ranges[0][0] - 4, ranges[0][1] + 4
    n_valid = e0 + 1          # tokens 0..e0
    np.testing.assert_allclose(windows[0, 0, :n_valid, 0],
                               feats[0, :e0 + 1, 0])
    assert (windows[0, 0, n_valid:, 0] == 0).all()
    assert k_lens[0] == n_valid
    mask = fantasy_kv_mask(k_lens, windows.shape[2])
    assert mask.shape == (1, f_lat, windows.shape[2])
    assert mask[0, 0].sum() == n_valid


def test_fantasy_audio_attention_in_dit():
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 4, 8, 8)),
                      jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    cos, sin = build_rope_3d((4, 4, 4), head_dim=cfg.head_dim)
    t = jnp.full((1,), 500.0)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla")

    actx = jnp.asarray(rng.standard_normal((1, 4, 6, 32)), jnp.float32)
    mask = np.ones((1, 4, 6), bool)
    mask[:, :, 4:] = False
    scale = jnp.ones((1,), jnp.float32)

    # zero-init processors (reference model.py:29-30) are an exact no-op
    params["fantasy_attn_blocks"] = init_fantasy_attn_blocks(
        jax.random.key(1), cfg.dim, cfg.num_layers, ctx_dim=32,
        dtype=jnp.float32, zero=True)
    o_zero = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                             attn_backend="xla",
                             fantasy_audio=(actx, jnp.asarray(mask), scale))
    np.testing.assert_allclose(np.asarray(o_zero), np.asarray(base),
                               atol=1e-6)

    params["fantasy_attn_blocks"] = init_fantasy_attn_blocks(
        jax.random.key(2), cfg.dim, cfg.num_layers, ctx_dim=32,
        dtype=jnp.float32, zero=False)
    o1 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla",
                         fantasy_audio=(actx, jnp.asarray(mask), scale))
    assert not np.allclose(np.asarray(o1), np.asarray(base))

    # masked-out audio tokens are isolated
    actx2 = actx.at[:, :, 4:].set(7.0)
    o2 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla",
                         fantasy_audio=(actx2, jnp.asarray(mask), scale))
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-5)

    # scale 0 disables the branch (per-branch audio switch,
    # any2video.py:1511 "audio_scale": [s, None, None])
    o3 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla",
                         fantasy_audio=(actx, jnp.asarray(mask),
                                        jnp.zeros((1,), jnp.float32)))
    np.testing.assert_allclose(np.asarray(o3), np.asarray(base), atol=1e-6)


def test_fantasy_denoise_scan_and_pipeline():
    from wan2gp_tpu.models.wan.pipeline import (WanPipeline, SamplingConfig)
    cfg = TINY
    params = init_wan_dit(jax.random.key(3), cfg, jnp.float32)
    params["fantasy_attn_blocks"] = init_fantasy_attn_blocks(
        jax.random.key(4), cfg.dim, cfg.num_layers, ctx_dim=24,
        dtype=jnp.float32, zero=False)
    pipe = WanPipeline(params, cfg, attn_backend="xla",
                       base_model_type="fantasy")
    fp = init_fantasy_proj(jax.random.key(5),
                           FantasyProjConfig(audio_in_dim=16,
                                             cross_attention_dim=24))
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 90, 16)).astype(np.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    lat = pipe.generate_fantasy(
        "", audio_features=feats, frame_num=9, width=64, height=64,
        sampling=SamplingConfig(steps=2, guide_scale=3.0),
        audio_guide_scale=4.0, fantasy_proj_params=fp,
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 3, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
    # guide==1 2-branch path
    lat2 = pipe.generate_fantasy(
        "", audio_features=feats, frame_num=9, width=64, height=64,
        sampling=SamplingConfig(steps=2, guide_scale=1.0),
        audio_guide_scale=4.0, fantasy_proj_params=fp,
        context=ctx, return_latents=True)
    assert np.isfinite(np.asarray(lat2)).all()


def test_fantasy_dit_checkpoint_keys():
    from wan2gp_tpu.io.wan_checkpoint import (load_wan_dit_params,
                                              normalize_wan_sd)
    from tests.test_checkpoint_io import _rand_dit_sd
    cfg = WanDiTConfig(dim=64, ffn_dim=128, num_heads=4, num_layers=2,
                       freq_dim=32, text_dim=32, text_len=8)
    rng = np.random.default_rng(2)
    sd = _rand_dit_sd(cfg, rng)
    for i in range(cfg.num_layers):
        for m in ("k_proj", "v_proj"):
            sd[f"blocks.{i}.cross_attn.processor.{m}.weight"] = \
                rng.standard_normal((cfg.dim, 48)).astype(np.float32)
    params, left = load_wan_dit_params(normalize_wan_sd(sd), cfg,
                                       jnp.float32)
    assert left == []
    fb = params["fantasy_attn_blocks"]
    assert fb["k"]["w"].shape == (2, 48, cfg.dim)
    np.testing.assert_allclose(
        np.asarray(fb["v"]["w"][1]),
        sd["blocks.1.cross_attn.processor.v_proj.weight"].T, atol=1e-6)


def test_wav2vec2_conv_out_len():
    # 16 kHz, stride product 320: 1 s of audio -> ~49 frames
    assert wav2vec2_conv_out_len(16000) == 49
    assert wav2vec2_conv_out_len(320 * 10 + 400) in (10, 11, 12)
