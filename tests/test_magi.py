"""MAGI-Human: fourier rope, swiglu7, modality experts, pipeline, loader."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.magi.dit import (MagiConfig, init_magi, magi_coords,
                                        magi_forward, magi_fourier_rope,
                                        swiglu7, gelu7)
from wan2gp_tpu.models.magi.pipeline import (
    MagiPipeline, MagiSamplingConfig, build_magi_layout, magi_sigmas,
    pack_video_latents, unpack_video_latents)

TINY = MagiConfig(dim=32, n_layers=4, n_heads_q=4, n_heads_kv=2,
                  head_dim=8, video_in=16, audio_in=6, text_in=12,
                  mm_layers=(0, 3), gelu7_layers=(0,),
                  compute_dtype=jnp.float32)


def test_swiglu7_matches_reference_math():
    import torch
    x = torch.randn(5, 8, generator=torch.Generator().manual_seed(0)) * 4

    def ref(x, alpha=1.702, limit=7.0):   # dit_module.py:60-70
        x = x.to(torch.float32)
        x_glu, x_linear = x[..., ::2], x[..., 1::2]
        x_glu = x_glu.clamp(max=limit)
        x_linear = x_linear.clamp(min=-limit, max=limit)
        return x_glu * torch.sigmoid(alpha * x_glu) * (x_linear + 1)

    got = np.asarray(swiglu7(jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, ref(x).numpy(), atol=1e-5)
    # gelu7 clamps above only
    g = np.asarray(gelu7(jnp.asarray([[10.0, -10.0]])))
    assert g[0, 0] == pytest.approx(7.0 / (1 + np.exp(-1.702 * 7)), rel=1e-4)


def test_fourier_rope_scaling_and_centering():
    cfg = TINY
    coords = magi_coords((2, 4, 4), (2, 4, 4))
    cos, sin = magi_fourier_rope(cfg, coords)
    assert cos.shape == (32, 3 * cfg.rope_bands)
    # ref == size -> scale 1; centered h/w means the grid-center token has
    # zero h/w phase -> cos 1, sin 0 on those bands
    bands = cfg.rope_bands
    # token (t=0, h=1.5-center impossible with even grid) -> check t=0 row
    np.testing.assert_allclose(np.asarray(cos)[0, :bands],
                               1.0, atol=1e-6)     # t=0 -> cos=1
    np.testing.assert_allclose(np.asarray(sin)[0, :bands], 0.0, atol=1e-6)
    # ref=1,size=1 stays finite
    c1 = magi_coords((1, 1, 1), (1, 1, 1))
    cos1, _ = magi_fourier_rope(cfg, c1)
    assert np.isfinite(np.asarray(cos1)).all()


def test_pack_unpack_video():
    lat = jax.random.normal(jax.random.key(0), (1, 4, 2, 4, 4))
    tok = pack_video_latents(lat, 2)
    assert tok.shape == (1, 2 * 2 * 2, 16)
    back = unpack_video_latents(tok, 2, 4, 4, 2)
    np.testing.assert_allclose(np.asarray(back), np.asarray(lat), atol=1e-6)


def test_sigma_ladder():
    sig = magi_sigmas(8, 3.0)
    assert sig.shape == (9,)
    assert sig[0] == pytest.approx(1.0, abs=1e-6)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)


def _tokens(nv=8, na=3, nt=4):
    k = jax.random.key(1)
    return (jax.random.normal(k, (1, nv, TINY.video_in)),
            jax.random.normal(jax.random.fold_in(k, 1), (1, na,
                                                         TINY.audio_in)),
            jax.random.normal(jax.random.fold_in(k, 2), (1, nt,
                                                         TINY.text_in)))


def test_forward_shapes_and_modality_experts():
    params = init_magi(jax.random.key(0), TINY)
    vid, aud, txt = _tokens()
    layout = build_magi_layout(TINY, 2, 4, 4, 3, 4)
    pv, pa = magi_forward(params, TINY, vid, aud, txt,
                          layout["cos"], layout["sin"], attn_backend="xla")
    assert pv.shape == (1, 8, TINY.video_in)
    assert pa.shape == (1, 3, TINY.audio_in)
    # mm layer 0 has per-modality weights; perturbing the TEXT expert of an
    # mm layer must change video output (joint attention couples them)
    params2 = jax.tree.map(lambda x: x, params)
    params2["layers"][0]["q_text"] = params["layers"][0]["q_text"] + 0.5
    pv2, _ = magi_forward(params2, TINY, vid, aud, txt,
                          layout["cos"], layout["sin"], attn_backend="xla")
    assert not np.allclose(np.asarray(pv), np.asarray(pv2))
    # but perturbing it must NOT change anything if there is no text... —
    # degenerate empty-text case just needs to run
    pv3, pa3 = magi_forward(params, TINY, vid, aud, txt[:, :0],
                            layout["cos"][:11], layout["sin"][:11],
                            attn_backend="xla")
    assert pv3.shape == pv.shape


def _pipe():
    params = init_magi(jax.random.key(0), TINY)

    def text_fn(prompts):
        k = jax.random.key(hash(prompts[0]) & 0xFFFF)
        return jax.random.normal(k, (1, 4, TINY.text_in))
    return MagiPipeline(params, TINY, text_encode_fn=text_fn,
                        attn_backend="xla")


def test_pipeline_distilled_and_cfg():
    pipe = _pipe()
    video, audio = pipe.generate(
        "x", height=64, width=64, frame_num=5,
        sampling=MagiSamplingConfig(steps=2), seed=0, return_latents=True)
    assert video.shape == (1, 4, 2, 4, 4)
    assert np.isfinite(np.asarray(video)).all()
    assert np.isfinite(np.asarray(audio)).all()
    # CFG path (UniPC) with first-frame pinning
    img_lat = jnp.ones((1, 4, 1, 4, 4))
    video2, _ = pipe.generate(
        "x", height=64, width=64, frame_num=5, image_latent=img_lat,
        sampling=MagiSamplingConfig(steps=2, guidance=4.0), seed=0,
        return_latents=True)
    np.testing.assert_allclose(np.asarray(video2[:, :, :1]),
                               np.asarray(img_lat), atol=1e-6)


def test_loader_roundtrip_fused_qkvg_and_mm_norms():
    import torch
    from wan2gp_tpu.io.magi_checkpoint import load_magi_params
    cfg = TINY
    g = torch.Generator().manual_seed(0)
    sd = {}
    q_size = cfg.n_heads_q * cfg.head_dim
    kv_size = cfg.n_heads_kv * cfg.head_dim
    g_size = cfg.n_heads_q

    def w(name, dout, din):
        sd[f"{name}.weight"] = torch.randn(dout, din, generator=g) * 0.05

    for m in ("video", "audio", "text"):
        cin = {"video": cfg.video_in, "audio": cfg.audio_in,
               "text": cfg.text_in}[m]
        w(f"adapter.{m}_embedder", cfg.dim, cin)
        sd[f"adapter.{m}_embedder.bias"] = torch.zeros(cfg.dim)
    for li in range(cfg.n_layers):
        pre = f"block.layers.{li}"
        mm = li in cfg.mm_layers
        nmod = 3 if mm else 1
        sd[f"{pre}.attention.pre_norm.weight"] = torch.zeros(cfg.dim * nmod)
        sd[f"{pre}.attention.q_norm.weight"] = \
            torch.zeros(cfg.head_dim * nmod)
        sd[f"{pre}.attention.k_norm.weight"] = \
            torch.zeros(cfg.head_dim * nmod)
        sd[f"{pre}.mlp.pre_norm.weight"] = torch.zeros(cfg.dim * nmod)
        # fused qkv+g rows, one chunk per modality
        chunk = q_size + 2 * kv_size + g_size
        w(f"{pre}.attention.linear_qkv", chunk * nmod, cfg.dim)
        if mm:
            for m in ("video", "audio", "text"):
                w(f"{pre}.attention.linear_proj_{m}", cfg.dim, q_size)
        else:
            w(f"{pre}.attention.linear_proj", cfg.dim, q_size)
        fd = cfg.ffn_dim(li)
        up_out = fd if li in cfg.gelu7_layers else 2 * fd
        if mm:
            for m in ("video", "audio", "text"):
                w(f"{pre}.mlp.up_gate_proj_{m}", up_out, cfg.dim)
                w(f"{pre}.mlp.down_proj_{m}", cfg.dim, fd)
        else:
            w(f"{pre}.mlp.up_gate_proj", up_out, cfg.dim)
            w(f"{pre}.mlp.down_proj", cfg.dim, fd)
    sd["final_norm_video.weight"] = torch.zeros(cfg.dim)
    sd["final_norm_audio.weight"] = torch.zeros(cfg.dim)
    w("final_linear_video", cfg.video_in, cfg.dim)
    w("final_linear_audio", cfg.audio_in, cfg.dim)

    npsd = {k: v.numpy() for k, v in sd.items()}
    params, leftover = load_magi_params(npsd, cfg, jnp.float32)
    assert leftover == [], leftover
    # fused split: q slice of modality-0 chunk == loaded q_video
    qkv0 = sd["block.layers.0.attention.linear_qkv.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["layers"][0]["q_video"]),
                               qkv0[:q_size].T, atol=1e-6)
    vid, aud, txt = _tokens()
    layout = build_magi_layout(cfg, 2, 4, 4, 3, 4)
    pv, pa = magi_forward(params, cfg, vid, aud, txt,
                          layout["cos"], layout["sin"], attn_backend="xla")
    assert np.isfinite(np.asarray(pv)).all()


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    assert "magi_human" in build_handler_map()
