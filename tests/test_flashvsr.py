"""FlashVSR tests: pixel shuffle vs the reference rearrange, LQ projection
shapes, one-step denoise, TCDecoder vs a torch re-derivation, loader
roundtrips, service spatial_upsampling hook."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
from wan2gp_tpu.postprocessing.flashvsr import (
    pixel_shuffle_3d, init_lq_proj, lq_proj_forward, flashvsr_step,
    TCDecoderConfig, init_tcdecoder, tcdecoder_decode, FlashVSRPipeline,
    load_lq_proj_params, load_tcdecoder_params, TC_LAYOUT)

TINY_DIT = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                        freq_dim=16, text_dim=8, text_len=4,
                        compute_dtype=jnp.float32)


def test_pixel_shuffle_matches_reference_rearrange():
    from einops import rearrange
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 4, 8, 8)).astype(np.float32)
    got = np.asarray(pixel_shuffle_3d(jnp.asarray(x), 2, 4, 4))
    t = torch.tensor(x)
    ref = rearrange(t, "b c (f ff) (h hh) (w ww) -> b (c ff hh ww) f h w",
                    ff=2, hh=4, ww=4).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_lq_proj_shapes():
    params = init_lq_proj(jax.random.key(0), out_dim=32, layer_num=2)
    video = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 9, 32, 32)), jnp.float32)
    adds = lq_proj_forward(params, video)
    assert len(adds) == 2
    # T=9 -> +3 prepended = 12 -> /4 temporal with prime-drop; 32/16 = 2
    assert adds[0].shape[-1] == 32
    assert adds[0].shape[1] % (2 * 2) == 0
    assert np.isfinite(np.asarray(adds[0])).all()


def test_flashvsr_one_step():
    cfg = TINY_DIT
    dit = init_wan_dit(jax.random.key(0), cfg)
    lq = [jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 2 * 4 * 4, cfg.dim)) * 0.1, jnp.float32)]
    noise = jax.random.normal(jax.random.key(2),
                              (1, cfg.in_dim, 2, 8, 8), jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    x0 = flashvsr_step(dit, cfg, noise, lq, ctx, attn_backend="xla")
    assert x0.shape == noise.shape
    assert np.isfinite(np.asarray(x0)).all()
    # the LQ conditioning must influence the result
    x0b = flashvsr_step(dit, cfg, noise, [jnp.zeros_like(lq[0])], ctx,
                        attn_backend="xla")
    assert np.abs(np.asarray(x0 - x0b)).max() > 1e-4


def _torch_tcdecoder(params, cfg, latents, lq):
    """Literal torch re-derivation of tcdecoder.py apply_model_with_
    memblocks over the deepened layout, consuming the same params."""
    def conv(x, p):
        w = torch.tensor(np.asarray(p["w"])).permute(3, 2, 0, 1)
        b = torch.tensor(np.asarray(p["b"])) if "b" in p else None
        return F.conv2d(x, w, b, padding=w.shape[2] // 2)

    cond = pixel_shuffle_3d(jnp.asarray(lq), 4, 8, 8)
    x = np.concatenate([np.asarray(cond).transpose(0, 2, 1, 3, 4),
                        latents], axis=2)
    b, t, c, h, w = x.shape
    x = torch.tensor(x.reshape(b * t, c, h, w))
    n_t = t
    for idx, kind, extra in TC_LAYOUT:
        if kind == "clamp":
            x = torch.tanh(x / 3.0) * 3.0
        elif kind in ("conv", "idconv"):
            x = conv(x, params[idx])
        elif kind == "relu":
            x = F.relu(x)
        elif kind == "mem":
            bt, cc, hh, ww = x.shape
            xt = x.reshape(b, n_t, cc, hh, ww)
            past = torch.cat([torch.zeros_like(xt[:, :1]), xt[:, :-1]], 1)
            inp = torch.cat([xt, past], dim=2).reshape(b * n_t, 2 * cc,
                                                       hh, ww)
            mp = params[idx]
            y = F.relu(conv(inp, mp["conv0"]))
            y = F.relu(conv(y, mp["conv1"]))
            y = conv(y, mp["conv2"])
            x = F.relu(y + x)
        elif kind == "up":
            x = F.interpolate(x, scale_factor=2, mode="nearest")
        elif kind == "tgrow":
            stride = extra
            w_ = torch.tensor(np.asarray(params[idx]["w"])
                              ).permute(3, 2, 0, 1)
            y = F.conv2d(x, w_)
            bt, cs, hh, ww = y.shape
            cc = cs // stride
            y = y.reshape(b, n_t, stride, cc, hh, ww)
            n_t *= stride
            x = y.reshape(b * n_t, cc, hh, ww)
    bt, cc, hh, ww = x.shape
    out = x.reshape(b, n_t, cc, hh, ww)
    return out[:, cfg.frames_to_trim:].permute(0, 1, 3, 4, 2).numpy()


def test_tcdecoder_matches_torch_oracle():
    cfg = TCDecoderConfig(latent_channels=4 + 3 * 4 * 8 * 8,
                          channels=(16, 12, 8, 8))
    params = init_tcdecoder(jax.random.key(0), cfg)
    rng = np.random.default_rng(1)
    latents = rng.standard_normal((1, 2, 4, 4, 4)).astype(np.float32)
    lq = rng.standard_normal((1, 3, 8, 32, 32)).astype(np.float32)
    got = np.asarray(tcdecoder_decode(params, cfg, jnp.asarray(latents),
                                      jnp.asarray(lq)))
    with torch.no_grad():
        ref = _torch_tcdecoder(params, cfg, latents, lq)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_tcdecoder_loader_roundtrip():
    cfg = TCDecoderConfig(latent_channels=4 + 3 * 4 * 8 * 8,
                          channels=(16, 12, 8, 8))
    params = init_tcdecoder(jax.random.key(2), cfg)
    sd = {}
    for idx, kind, extra in TC_LAYOUT:
        pre = f"decoder.{idx}"
        if kind in ("conv", "idconv"):
            p = params[idx]
            sd[f"{pre}.weight"] = np.asarray(p["w"]).transpose(3, 2, 0, 1)
            if "b" in p:
                sd[f"{pre}.bias"] = np.asarray(p["b"])
        elif kind == "mem":
            for tgt, src in (("conv.0", "conv0"), ("conv.2", "conv1"),
                             ("conv.4", "conv2")):
                p = params[idx][src]
                sd[f"{pre}.{tgt}.weight"] = np.asarray(
                    p["w"]).transpose(3, 2, 0, 1)
                sd[f"{pre}.{tgt}.bias"] = np.asarray(p["b"])
        elif kind == "tgrow":
            sd[f"{pre}.conv.weight"] = np.asarray(
                params[idx]["w"]).transpose(3, 2, 0, 1)
    loaded, leftover = load_tcdecoder_params(sd, cfg)
    assert leftover == []
    a, b = jax.tree.leaves(params), jax.tree.leaves(loaded)
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_lq_proj_loader_roundtrip():
    params = init_lq_proj(jax.random.key(3), out_dim=16, layer_num=1)
    sd = {
        "conv1.weight": np.asarray(params["conv1"]["w"]).transpose(
            4, 3, 0, 1, 2),
        "conv1.bias": np.asarray(params["conv1"]["b"]),
        "norm1.gamma": np.asarray(params["norm1"]).reshape(-1, 1, 1, 1),
        "conv2.weight": np.asarray(params["conv2"]["w"]).transpose(
            4, 3, 0, 1, 2),
        "conv2.bias": np.asarray(params["conv2"]["b"]),
        "norm2.gamma": np.asarray(params["norm2"]).reshape(-1, 1, 1, 1),
        "linear_layers.0.weight": np.asarray(
            params["linears"][0]["w"]).T,
        "linear_layers.0.bias": np.asarray(params["linears"][0]["b"]),
    }
    loaded, leftover = load_lq_proj_params(sd)
    assert leftover == []
    video = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 3, 5, 32, 32)), jnp.float32)
    a = lq_proj_forward(params, video)[0]
    b = lq_proj_forward(loaded, video)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_flashvsr_pipeline_upscales_4x():
    cfg = TINY_DIT
    dit = init_wan_dit(jax.random.key(0), cfg)
    lq_params = init_lq_proj(jax.random.key(1), out_dim=cfg.dim)
    tc_cfg = TCDecoderConfig(channels=(16, 12, 8, 8))
    tc_params = init_tcdecoder(jax.random.key(2), tc_cfg)
    pipe = FlashVSRPipeline(dit, cfg, lq_params, tc_params, tc_cfg,
                            attn_backend="xla")
    frames = np.random.default_rng(3).integers(
        0, 255, (5, 16, 16, 3), dtype=np.uint8)
    out = pipe.upscale(frames, seed=0)
    assert out.shape == (5, 64, 64, 3)
    assert out.dtype == np.uint8


def test_service_flashvsr_hook():
    from wan2gp_tpu.runtime.service import _apply_spatial_upsampling
    cfg = TINY_DIT
    dit = init_wan_dit(jax.random.key(0), cfg)
    lq_params = init_lq_proj(jax.random.key(1), out_dim=cfg.dim)
    tc_cfg = TCDecoderConfig(channels=(16, 12, 8, 8))
    tc_params = init_tcdecoder(jax.random.key(2), tc_cfg)
    pipe = FlashVSRPipeline(dit, cfg, lq_params, tc_params, tc_cfg,
                            attn_backend="xla")
    frames = np.random.default_rng(0).integers(
        0, 255, (3, 16, 16, 3), dtype=np.uint8)
    out = _apply_spatial_upsampling(
        frames, {"spatial_upsampling": "flashvsr", "_flashvsr_pipe": pipe})
    assert out.shape == (3, 64, 64, 3)
    out2 = _apply_spatial_upsampling(frames,
                                     {"spatial_upsampling": "lanczos2"})
    assert out2.shape == (3, 32, 32, 3)
