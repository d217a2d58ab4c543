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


# -- SA audio VAE (Stable-Audio-Open Oobleck) -------------------------------

def test_sa_audio_torch_oracle():
    """Tiny Oobleck encoder/decoder vs an inline torch re-derivation
    (sa_audio_module.py: SnakeBeta log-scale, ResidualUnit dilations
    1/3/9, strided enc k=2s pad ceil(s/2), ConvTranspose dec)."""
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.magi.sa_audio import (
        SAAudioConfig, init_sa_audio, sa_audio_encode, sa_audio_decode)
    cfg = SAAudioConfig(io_channels=2, channels=4, latent_dim=3,
                        c_mults=(1, 2), strides=(2, 2))
    params = init_sa_audio(jax.random.key(0), cfg)
    # randomize snakes so the activation is exercised
    rng = np.random.default_rng(0)

    def rand_snake(p):
        c = p["alpha"].shape[0]
        return {"alpha": jnp.asarray(rng.standard_normal(c).astype(
                    np.float32) * 0.3),
                "beta": jnp.asarray(rng.standard_normal(c).astype(
                    np.float32) * 0.3)}

    def walk(p):
        if isinstance(p, dict):
            if set(p.keys()) == {"alpha", "beta"}:
                return rand_snake(p)
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v) for v in p]
        return p

    params = walk(params)
    wave = rng.standard_normal((1, 16, 2)).astype(np.float32)
    lat = np.asarray(sa_audio_encode(params, cfg, jnp.asarray(wave)))
    out = np.asarray(sa_audio_decode(params, cfg, jnp.asarray(lat)))
    assert lat.shape == (1, 4, 3)           # /4 downsample
    assert out.shape == (1, 16, 2)

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def tw(p):   # [k, cin, cout] -> torch conv [cout, cin, k]
        return t(np.asarray(p["w"]).transpose(2, 1, 0))

    def conv(p, v, stride=1, dilation=1, padding=0):
        b = t(p["b"]) if "b" in p else None
        return F.conv1d(v, tw(p), b, stride=stride, padding=padding,
                        dilation=dilation)

    def snake(p, v):
        a = torch.exp(t(p["alpha"])).view(1, -1, 1)
        bb = torch.exp(t(p["beta"])).view(1, -1, 1)
        return v + (1.0 / (bb + 1e-9)) * torch.sin(v * a) ** 2

    def res(p, v, dil):
        y = snake(p["s1"], v)
        y = conv(p["c1"], y, dilation=dil, padding=(dil * 6) // 2)
        y = snake(p["s2"], y)
        return conv(p["c2"], y) + v

    with torch.no_grad():
        x = t(wave).permute(0, 2, 1)
        x = conv(params["enc_in"], x, padding=3)
        for i, bp in enumerate(params["enc_blocks"]):
            for j, rp in enumerate(bp["res"]):
                x = res(rp, x, (1, 3, 9)[j])
            x = snake(bp["snake"], x)
            s = cfg.strides[i]
            x = conv(bp["down"], x, stride=s,
                     padding=int(np.ceil(s / 2)))
        x = snake(params["enc_snake"], x)
        x = conv(params["enc_out"], x, padding=1)
        want_lat = x.chunk(2, dim=1)[0].permute(0, 2, 1).numpy()
    np.testing.assert_allclose(lat, want_lat, rtol=1e-4, atol=1e-4)

    with torch.no_grad():
        x = t(want_lat).permute(0, 2, 1)
        x = conv(params["dec_in"], x, padding=3)
        for i, bp in enumerate(params["dec_blocks"]):
            x = snake(bp["snake"], x)
            s = list(cfg.strides)[::-1][i]
            w = np.asarray(bp["up"]["w"])          # [k, cin, cout] flipped
            wt = t(np.ascontiguousarray(w[::-1].transpose(1, 2, 0)))
            x = F.conv_transpose1d(x, wt, t(bp["up"]["b"]), stride=s,
                                   padding=int(np.ceil(s / 2)))
            for j, rp in enumerate(bp["res"]):
                x = res(rp, x, (1, 3, 9)[j])
        x = snake(params["dec_snake"], x)
        x = conv(params["dec_out"], x, padding=3)
        want_out = torch.tanh(x).permute(0, 2, 1).numpy()
    # untrained weights blow up activations pre-tanh; allow small fp drift
    np.testing.assert_allclose(out, want_out, rtol=5e-3, atol=2e-3)


def test_sa_audio_loader_roundtrip():
    from wan2gp_tpu.models.magi.sa_audio import (
        SAAudioConfig, init_sa_audio, sa_audio_encode,
        load_sa_audio_params)
    cfg = SAAudioConfig(io_channels=2, channels=4, latent_dim=3,
                        c_mults=(1, 2), strides=(2, 2))
    params = init_sa_audio(jax.random.key(1), cfg)
    sd = {}

    def put_conv(prefix, p, transpose=False, bias=True):
        w = np.asarray(p["w"])
        if transpose:   # stored pre-flipped [k, cin, cout]
            w = np.ascontiguousarray(w[::-1]).transpose(1, 2, 0)
        else:
            w = w.transpose(2, 1, 0)
        sd[f"{prefix}.weight"] = w
        if bias and "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"])

    def put_snake(prefix, p):
        sd[f"{prefix}.alpha"] = np.asarray(p["alpha"])
        sd[f"{prefix}.beta"] = np.asarray(p["beta"])

    def put_res(prefix, p):
        put_snake(f"{prefix}.layers.0", p["s1"])
        put_conv(f"{prefix}.layers.1", p["c1"])
        put_snake(f"{prefix}.layers.2", p["s2"])
        put_conv(f"{prefix}.layers.3", p["c2"])

    put_conv("encoder.layers.0", params["enc_in"])
    for i, bp in enumerate(params["enc_blocks"]):
        pre = f"encoder.layers.{i + 1}.layers"
        for j, rp in enumerate(bp["res"]):
            put_res(f"{pre}.{j}", rp)
        put_snake(f"{pre}.3", bp["snake"])
        put_conv(f"{pre}.4", bp["down"])
    put_snake("encoder.layers.3", params["enc_snake"])
    put_conv("encoder.layers.4", params["enc_out"])
    put_conv("decoder.layers.0", params["dec_in"])
    for i, bp in enumerate(params["dec_blocks"]):
        pre = f"decoder.layers.{i + 1}.layers"
        put_snake(f"{pre}.0", bp["snake"])
        put_conv(f"{pre}.1", bp["up"], transpose=True)
        for j, rp in enumerate(bp["res"]):
            put_res(f"{pre}.{j + 2}", rp)
    put_snake("decoder.layers.3", params["dec_snake"])
    put_conv("decoder.layers.4", params["dec_out"], bias=False)
    loaded, left = load_sa_audio_params(sd, cfg)
    assert left == []
    wave = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 16, 2)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(sa_audio_encode(loaded, cfg, wave)),
        np.asarray(sa_audio_encode(params, cfg, wave)), atol=1e-5)


# -- Turbo VAE decoder ------------------------------------------------------

def test_turbo_vaed_torch_oracle():
    """Tiny decoder vs inline torch re-derivation (turbo_vaed_module.py:
    replicate-pad conv3d, affine-free channel RMSNorm 1e-8, ReLU-first
    resnets in upsampling stages, time-conv temporal interleave,
    nearest 2x + conv resample, pixel-shuffle upsampler)."""
    import torch
    import torch.nn.functional as F
    from wan2gp_tpu.models.magi.turbo_vae import (
        TurboVAEDConfig, init_turbo_vaed, turbo_vaed_decode)
    cfg = TurboVAEDConfig(latent_channels=4, out_channels=3,
                          block_out_channels=(4, 8),
                          layers_per_block=(1, 1, 1),
                          spatio_temporal_scaling=(True, False),
                          spatio_only=(False, False))
    params = init_turbo_vaed(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, 4, 2, 4, 4)).astype(np.float32)
    ours = np.asarray(turbo_vaed_decode(params, cfg, jnp.asarray(z)))
    # spatial x4 (1 resample + pixel shuffle), temporal 2->3 (2*2-1)
    assert ours.shape == (1, 3, 3, 16, 16)

    def t(a):
        return torch.from_numpy(np.asarray(a, np.float32).copy())

    def conv3(p, v):
        kt = p["w"].shape[2]
        if kt > 1:
            n = (kt - 1) // 2
            v = torch.cat([v[:, :, :1].repeat(1, 1, n, 1, 1), v,
                           v[:, :, -1:].repeat(1, 1, n, 1, 1)], dim=2)
        kh = p["w"].shape[3] // 2
        kw = p["w"].shape[4] // 2
        return F.conv3d(v, t(p["w"]), t(p["b"]),
                        padding=(0, kh, kw))

    def rms(v, eps=1e-8):
        var = v.float().pow(2).mean(1, keepdim=True)
        return v * torch.rsqrt(var + eps)

    def resnet(p, v, relu_first=False):
        h = rms(v)
        h = F.relu(h) if relu_first else F.silu(h)
        h = conv3(p["conv1"], h)
        h = F.silu(rms(h))
        h = conv3(p["conv2"], h)
        sc = v
        if "shortcut" in p:
            sc = conv3(p["shortcut"], rms(v, 1e-6))
        return h + sc

    with torch.no_grad():
        x = conv3(params["conv_in"], t(z))
        for rp in params["mid"]:
            x = resnet(rp, x)
        rev_sts = tuple(reversed(cfg.spatio_temporal_scaling))
        for i, ub in enumerate(params["up_blocks"]):
            if "conv_in" in ub:
                x = resnet(ub["conv_in"], x)
            if "resample" in ub:
                rs = ub["resample"]
                b, c, tt, hh, ww = x.shape
                x = conv3(rs["time_conv"], x)
                x = x.view(b, 2, c, tt, hh, ww).permute(
                    0, 2, 3, 1, 4, 5).reshape(b, c, tt * 2, hh, ww)
                x = x[:, :, 1:]
                b, c, t2, hh, ww = x.shape
                y = x.permute(0, 2, 1, 3, 4).reshape(b * t2, c, hh, ww)
                y = F.interpolate(y.float(), scale_factor=2.0,
                                  mode="nearest-exact")
                y = F.conv2d(y, t(rs["conv"]["w"]), t(rs["conv"]["b"]),
                             padding=1)
                x = y.view(b, t2, -1, 2 * hh, 2 * ww).permute(
                    0, 2, 1, 3, 4)
            for rp in ub["resnets"]:
                x = resnet(rp, x, relu_first=rev_sts[i])
        x = rms(x)
        b, c, tt, hh, ww = x.shape
        y = x.permute(0, 2, 1, 3, 4).reshape(b * tt, c, hh, ww)
        y = F.conv2d(y, t(params["upsampler2d"]["w"]),
                     t(params["upsampler2d"]["b"]), padding=1)
        y = F.pixel_shuffle(y, 2)
        x = y.view(b, tt, -1, 2 * hh, 2 * ww).permute(0, 2, 1, 3, 4)
        x = F.silu(rms(x))
        want = conv3(params["conv_out"], x).numpy()
    np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-4)


def test_turbo_vaed_loader_roundtrip():
    from wan2gp_tpu.models.magi.turbo_vae import (
        TurboVAEDConfig, init_turbo_vaed, turbo_vaed_decode,
        load_turbo_vaed_params)
    cfg = TurboVAEDConfig(latent_channels=4, out_channels=3,
                          block_out_channels=(4, 8),
                          layers_per_block=(1, 1, 1),
                          spatio_temporal_scaling=(True, False),
                          spatio_only=(False, False))
    params = init_turbo_vaed(jax.random.key(1), cfg)
    sd = {}

    def put_conv(name, p):
        sd[f"decoder.{name}.conv.weight"] = np.asarray(p["w"])
        sd[f"decoder.{name}.conv.bias"] = np.asarray(p["b"])

    def put_resnet(name, p):
        put_conv(f"{name}.conv1", p["conv1"])
        put_conv(f"{name}.conv2", p["conv2"])
        if "shortcut" in p:
            put_conv(f"{name}.conv_shortcut", p["shortcut"])

    put_conv("conv_in", params["conv_in"])
    for j, rp in enumerate(params["mid"]):
        put_resnet(f"mid_block.resnets.{j}", rp)
    for i, ub in enumerate(params["up_blocks"]):
        if "conv_in" in ub:
            put_resnet(f"up_blocks.{i}.conv_in", ub["conv_in"])
        if "resample" in ub:
            rs = ub["resample"]
            sd[f"decoder.up_blocks.{i}.upsamplers.0.resample.1.weight"] \
                = np.asarray(rs["conv"]["w"])
            sd[f"decoder.up_blocks.{i}.upsamplers.0.resample.1.bias"] \
                = np.asarray(rs["conv"]["b"])
            put_conv(f"up_blocks.{i}.upsamplers.0.time_conv",
                     rs["time_conv"])
        for j, rp in enumerate(ub["resnets"]):
            put_resnet(f"up_blocks.{i}.resnets.{j}", rp)
    sd["decoder.upsampler2d_1.conv.weight"] = np.asarray(
        params["upsampler2d"]["w"])
    sd["decoder.upsampler2d_1.conv.bias"] = np.asarray(
        params["upsampler2d"]["b"])
    put_conv("conv_out", params["conv_out"])
    sd["mean"] = np.zeros(4, np.float32)
    sd["std"] = np.ones(4, np.float32)
    loaded, left = load_turbo_vaed_params(sd, cfg)
    assert left == []
    z = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 4, 2, 4, 4)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(turbo_vaed_decode(loaded, cfg, z)),
        np.asarray(turbo_vaed_decode(params, cfg, z)), atol=1e-5)
