"""Lynx face-identity adapter (reference models/wan/lynx/,
modules/model.py:323-335, 411-441, 645)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.wan.dit import (WanDiTConfig, init_wan_dit,
                                       wan_dit_forward)
from wan2gp_tpu.models.wan.lynx import (
    ResamplerConfig, init_resampler, resampler_forward,
    load_resampler_params, init_lynx_layers, load_lynx_module_params)
from wan2gp_tpu.ops.rope import build_rope_3d

TINY = WanDiTConfig(dim=96, ffn_dim=192, num_heads=4, num_layers=3,
                    freq_dim=32, text_dim=48, text_len=16,
                    compute_dtype=jnp.float32)
RCFG = ResamplerConfig(dim=32, depth=2, dim_head=8, heads=4,
                       num_queries=4, embedding_dim=16, output_dim=24)


def test_resampler_torch_oracle():
    """Perceiver resampler vs an inline torch re-derivation of
    resampler.py:62-185 (norm1/norm2, kv over concat(x, latents),
    double-sqrt scaling, residuals, proj_out + norm_out)."""
    import torch
    params = init_resampler(jax.random.key(0), RCFG)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, RCFG.embedding_dim)).astype(np.float32)
    ours = np.asarray(resampler_forward(params, RCFG, jnp.asarray(x)))

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def lin(p, v):
        y = v @ t(p["w"])
        return y + t(p["b"]) if "b" in p else y

    def ln(p, v):
        mu = v.mean(-1, keepdim=True)
        var = v.var(-1, unbiased=False, keepdim=True)
        return (v - mu) / torch.sqrt(var + 1e-5) * t(p["w"]) + t(p["b"])

    with torch.no_grad():
        xt = lin(params["proj_in"], t(x))
        lat = t(params["latents"]).repeat(2, 1, 1)
        n, hd = RCFG.heads, RCFG.dim_head
        for lp in params["layers"]:
            xn, ln_ = ln(lp["norm1"], xt), ln(lp["norm2"], lat)
            q = lin(lp["to_q"], ln_)
            kv = lin(lp["to_kv"], torch.cat([xn, ln_], dim=1))
            k, v = kv.chunk(2, dim=-1)
            q = q.view(2, -1, n, hd).transpose(1, 2)
            k = k.view(2, -1, n, hd).transpose(1, 2)
            v = v.view(2, -1, n, hd).transpose(1, 2)
            s = 1.0 / np.sqrt(np.sqrt(hd))
            w = torch.softmax(((q * s) @ (k * s).transpose(-2, -1)
                               ).float(), dim=-1)
            o = (w @ v).permute(0, 2, 1, 3).reshape(2, -1, n * hd)
            lat = lin(lp["to_out"], o) + lat
            h = lin(lp["ff2"], torch.nn.functional.gelu(
                lin(lp["ff1"], ln(lp["ff_norm"], lat))))
            lat = h + lat
        want = ln(params["norm_out"], lin(params["proj_out"], lat)).numpy()
    np.testing.assert_allclose(ours, want, atol=2e-4)


def test_resampler_loader_roundtrip():
    params = init_resampler(jax.random.key(1), RCFG)
    sd = {"latents": np.asarray(params["latents"])}
    for nm in ("proj_in", "proj_out"):
        sd[f"{nm}.weight"] = np.asarray(params[nm]["w"]).T
        sd[f"{nm}.bias"] = np.asarray(params[nm]["b"])
    sd["norm_out.weight"] = np.asarray(params["norm_out"]["w"])
    sd["norm_out.bias"] = np.asarray(params["norm_out"]["b"])
    for i, lp in enumerate(params["layers"]):
        for nm, tgt in (("norm1", f"layers.{i}.0.norm1"),
                        ("norm2", f"layers.{i}.0.norm2"),
                        ("ff_norm", f"layers.{i}.1.0")):
            sd[f"{tgt}.weight"] = np.asarray(lp[nm]["w"])
            sd[f"{tgt}.bias"] = np.asarray(lp[nm]["b"])
        for nm, tgt in (("to_q", f"layers.{i}.0.to_q"),
                        ("to_kv", f"layers.{i}.0.to_kv"),
                        ("to_out", f"layers.{i}.0.to_out"),
                        ("ff1", f"layers.{i}.1.1"),
                        ("ff2", f"layers.{i}.1.3")):
            sd[f"{tgt}.weight"] = np.asarray(lp[nm]["w"]).T
    loaded, left = load_resampler_params(sd, RCFG)
    assert left == []
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 1, RCFG.embedding_dim)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(resampler_forward(loaded, RCFG, x)),
        np.asarray(resampler_forward(params, RCFG, x)), atol=1e-5)


def _inputs(cfg, seed=0):
    rng = np.random.default_rng(seed)
    lat = jnp.asarray(rng.standard_normal((1, cfg.in_dim, 2, 8, 8)),
                      jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    cos, sin = build_rope_3d((2, 4, 4), head_dim=cfg.head_dim)
    return lat, ctx, cos, sin


def test_lynx_lite_ip_attention():
    """Lite: ip on active layers only, affine-free rms k-norm; scale 0
    == base."""
    cfg = TINY
    params = init_wan_dit(jax.random.key(0), cfg, jnp.float32)
    lat, ctx, cos, sin = _inputs(cfg)
    t = jnp.full((1,), 500.0)
    base = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla")
    lb = init_lynx_layers(jax.random.key(1), cfg.dim, cfg.num_layers,
                          full=False)
    # emulate the 20-layer cutoff on the tiny stack: last layer inactive
    lb["active"] = jnp.asarray([1.0, 1.0, 0.0])
    params["lynx_blocks"] = lb
    ip = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 4, 2048)), jnp.float32)
    o0 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla", lynx=(ip, None, 0.0, 0.0))
    np.testing.assert_allclose(np.asarray(o0), np.asarray(base),
                               atol=1e-6)
    o1 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla", lynx=(ip, None, 1.0, 0.0))
    assert not np.allclose(np.asarray(o1), np.asarray(base))
    # identity flows: different arc embeds -> different output
    o2 = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                         attn_backend="xla",
                         lynx=(ip * -0.5, None, 1.0, 0.0))
    assert not np.allclose(np.asarray(o1), np.asarray(o2))


def test_lynx_full_ref_branch():
    cfg = TINY
    params = init_wan_dit(jax.random.key(2), cfg, jnp.float32)
    lat, ctx, cos, sin = _inputs(cfg, seed=3)
    t = jnp.full((1,), 500.0)
    params["lynx_blocks"] = init_lynx_layers(
        jax.random.key(3), cfg.dim, cfg.num_layers, full=True)
    ip = jnp.asarray(np.random.default_rng(4).standard_normal(
        (1, 4, 5120)), jnp.float32)
    # extraction pass: per-block modulated self-attn inputs
    ref_lat = jnp.asarray(np.random.default_rng(5).standard_normal(
        (1, cfg.in_dim, 1, 4, 4)), jnp.float32)
    rcos, rsin = build_rope_3d((1, 2, 2), head_dim=cfg.head_dim)
    buf = wan_dit_forward(params, cfg, ref_lat,
                          jnp.zeros((1,)), ctx, rcos, rsin,
                          attn_backend="xla", lynx_extract=True)
    assert buf.shape == (cfg.num_layers, 1, 4, cfg.dim)
    o_ip = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                           attn_backend="xla",
                           lynx=(ip, None, 1.0, 0.0))
    o_ref = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                            attn_backend="xla",
                            lynx=(ip, buf, 1.0, 1.0))
    assert not np.allclose(np.asarray(o_ip), np.asarray(o_ref))
    assert np.isfinite(np.asarray(o_ref)).all()


def test_lynx_module_loader():
    cfg = TINY
    rng = np.random.default_rng(6)
    sd = {}
    for i in range(cfg.num_layers):
        pre = f"blocks.{i}"
        if i < 2:  # active layers only (lite 20-layer cutoff analogue)
            sd[f"{pre}.cross_attn.to_k_ip.weight"] = rng.standard_normal(
                (cfg.dim, 2048)).astype(np.float32)
            sd[f"{pre}.cross_attn.to_v_ip.weight"] = rng.standard_normal(
                (cfg.dim, 2048)).astype(np.float32)
    loaded, left = load_lynx_module_params(sd, cfg.num_layers, full=False,
                                           dtype=jnp.float32)
    assert left == []
    assert loaded["active"].tolist() == [1.0, 1.0, 0.0]
    assert loaded["k_ip"]["w"].shape == (3, 2048, cfg.dim)


def test_lynx_pipeline_e2e():
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    from wan2gp_tpu.models.wan.vae import WanVAEConfig, init_wan_vae
    cfg = TINY
    params = init_wan_dit(jax.random.key(7), cfg, jnp.float32)
    params["lynx_blocks"] = init_lynx_layers(
        jax.random.key(8), cfg.dim, cfg.num_layers, full=True)
    vae_cfg = WanVAEConfig(dim=8, num_res_blocks=1)
    pipe = WanPipeline(params, cfg, vae_params=init_wan_vae(
        jax.random.key(9), vae_cfg), vae_cfg=vae_cfg,
        attn_backend="xla", base_model_type="lynx")
    rcfg = ResamplerConfig(dim=32, depth=2, dim_head=8, heads=4,
                           num_queries=4, embedding_dim=16,
                           output_dim=5120)
    rp = init_resampler(jax.random.key(10), rcfg)
    rng = np.random.default_rng(8)
    ctx = jnp.asarray(rng.standard_normal((1, 8, cfg.text_dim)),
                      jnp.float32)
    ref = rng.standard_normal((32, 32, 3)).astype(np.float32).clip(-1, 1)
    lat = pipe.generate_lynx(
        "", arcface_embed=rng.standard_normal(16).astype(np.float32),
        ref_image=ref, width=64, height=64, frame_num=5,
        sampling=SamplingConfig(steps=2, guide_scale=4.0),
        resampler_params=rp, resampler_cfg=rcfg,
        context=ctx, context_null=ctx * 0, return_latents=True)
    assert lat.shape == (1, 16, 2, 8, 8)
    assert np.isfinite(np.asarray(lat)).all()
