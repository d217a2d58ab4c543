"""Wan Multitalk tests: wav2vec2 vs HF torch oracle, window packing vs the
reference rearrange logic, AudioProjModel oracle, audio cross-attn in the
DiT, and the audio-CFG denoise scan."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.wan.multitalk import (
    Wav2Vec2Config, init_wav2vec2, wav2vec2_extract, load_wav2vec2_params,
    linear_interpolate, get_window_audio_embeddings, AudioProjConfig,
    init_audio_proj, audio_proj_forward, init_multitalk_audio_attn,
    load_multitalk_module_params)


def test_linear_interpolate_matches_torch():
    import torch
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 5)).astype(np.float32)
    got = np.asarray(linear_interpolate(jnp.asarray(x), 7))
    ref = F.interpolate(torch.tensor(x).transpose(1, 2), size=7,
                        mode="linear", align_corners=False)
    ref = ref.transpose(1, 2).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_wav2vec2_matches_hf_oracle():
    """Tiny random HF Wav2Vec2Model vs the JAX port, following the
    reference wrapper's flow (multitalk/wav2vec2.py: conv features ->
    linear interpolation to seq_len -> projection -> encoder,
    hidden_states[1:] stacked)."""
    import torch
    from transformers import Wav2Vec2Config as HFConfig, Wav2Vec2Model

    hf_cfg = HFConfig(
        vocab_size=32, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(6, 3), conv_stride=(4, 2),
        num_feat_extract_layers=2, num_conv_pos_embeddings=8,
        num_conv_pos_embedding_groups=4, do_stable_layer_norm=False,
        feat_extract_norm="group", hidden_act="gelu",
        hidden_dropout=0.0, activation_dropout=0.0,
        attention_dropout=0.0, feat_proj_dropout=0.0, layerdrop=0.0,
        apply_spec_augment=False)
    torch.manual_seed(0)
    model = Wav2Vec2Model(hf_cfg).eval()

    cfg = Wav2Vec2Config(conv_dim=(16, 16), conv_kernel=(6, 3),
                         conv_stride=(4, 2), dim=32, n_layers=2,
                         n_heads=4, ffn_dim=64, pos_conv_kernel=8,
                         pos_conv_groups=4)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, leftover = load_wav2vec2_params(sd, cfg)
    assert leftover == [], leftover

    rng = np.random.default_rng(1)
    wave = rng.standard_normal((1, 800)).astype(np.float32)
    frames = 9
    got = np.asarray(wav2vec2_extract(params, cfg, jnp.asarray(wave),
                                      frames))

    with torch.no_grad():
        tw = torch.tensor(wave)
        feats = model.feature_extractor(tw).transpose(1, 2)
        feats = torch.nn.functional.interpolate(
            feats.transpose(1, 2), size=frames, mode="linear",
            align_corners=False).transpose(1, 2)
        hidden, _ = model.feature_projection(feats)
        enc = model.encoder(hidden, output_hidden_states=True)
        ref = torch.stack(enc.hidden_states[1:], dim=2).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_window_packing_matches_reference_logic():
    """get_window_audio_embeddings vs a literal torch re-derivation of
    multitalk.py:47-83 (clamped +/-2 windows, 3+2+3 latent regroup)."""
    import torch
    from einops import rearrange
    t_frames, blocks, c = 21, 3, 4
    emb = np.arange(t_frames * blocks * c, dtype=np.float32).reshape(
        t_frames, blocks, c)
    first, latter = get_window_audio_embeddings(emb, clip_length=21)
    assert first.shape == (1, 1, 5, blocks, c)
    assert latter.shape == (1, 5, 8, blocks, c)

    full = torch.tensor(emb)
    indices = (torch.arange(2 * 2 + 1) - 2) * 1
    centers = torch.arange(0, 21, 1).unsqueeze(1) + indices.unsqueeze(0)
    centers = torch.clamp(centers, min=0, max=t_frames - 1)
    audio_emb = full[centers][None]
    ff = audio_emb[:, :1]
    lat = rearrange(audio_emb[:, 1:], "b (n_t n) w s c -> b n_t n w s c",
                    n=4)
    mid = 5 // 2
    head = rearrange(lat[:, :, :1, :mid + 1], "b n_t n w s c -> b n_t (n w) s c")
    middle = rearrange(lat[:, :, 1:-1, mid:mid + 1],
                       "b n_t n w s c -> b n_t (n w) s c")
    tail = rearrange(lat[:, :, -1:, mid:], "b n_t n w s c -> b n_t (n w) s c")
    ref_lat = torch.cat([head, middle, tail], dim=2).numpy()
    np.testing.assert_array_equal(first, ff.numpy())
    np.testing.assert_array_equal(latter, ref_lat)


def test_audio_proj_matches_torch_oracle():
    import torch
    cfg = AudioProjConfig(seq_len=5, seq_len_vf=8, blocks=3, channels=4,
                          intermediate_dim=16, output_dim=6,
                          context_tokens=2, norm_output=True)
    params = init_audio_proj(jax.random.key(0), cfg)

    class TorchProj(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj1 = torch.nn.Linear(5 * 3 * 4, 16)
            self.proj1_vf = torch.nn.Linear(8 * 3 * 4, 16)
            self.proj2 = torch.nn.Linear(16, 16)
            self.proj3 = torch.nn.Linear(16, 2 * 6)
            self.norm = torch.nn.LayerNorm(6)

        def forward(self, a, avf):
            b, f1 = a.shape[:2]
            fvf = avf.shape[1]
            a = torch.relu(self.proj1(a.reshape(b * f1, -1))).reshape(
                b, f1, -1)
            avf = torch.relu(self.proj1_vf(avf.reshape(b * fvf, -1))
                             ).reshape(b, fvf, -1)
            h = torch.cat([a, avf], dim=1)
            h = torch.relu(self.proj2(h))
            ctx = self.proj3(h).reshape(b, f1 + fvf, 2, 6)
            return self.norm(ctx)

    tp = TorchProj()
    with torch.no_grad():
        for name in ("proj1", "proj1_vf", "proj2", "proj3"):
            getattr(tp, name).weight.copy_(
                torch.tensor(np.asarray(params[name]["w"]).T))
            getattr(tp, name).bias.copy_(
                torch.tensor(np.asarray(params[name]["b"])))
    rng = np.random.default_rng(2)
    first = rng.standard_normal((1, 1, 5, 3, 4)).astype(np.float32)
    latter = rng.standard_normal((1, 4, 8, 3, 4)).astype(np.float32)
    got = np.asarray(audio_proj_forward(params, cfg, jnp.asarray(first),
                                        jnp.asarray(latter)))
    with torch.no_grad():
        ref = tp(torch.tensor(first), torch.tensor(latter)).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def _tiny_wan():
    from wan2gp_tpu.models.wan.dit import WanDiTConfig, init_wan_dit
    cfg = WanDiTConfig(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
                       freq_dim=16, text_dim=8, text_len=4)
    params = init_wan_dit(jax.random.key(0), cfg)
    return cfg, params


def test_dit_audio_cross_attention_changes_output():
    from wan2gp_tpu.models.wan.dit import wan_dit_forward
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg, params = _tiny_wan()
    params = dict(params)
    params["audio_attn_blocks"] = init_multitalk_audio_attn(
        jax.random.key(1), cfg, cfg.num_layers, audio_dim=6)
    lat = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.in_dim, 3, 8, 8)), jnp.float32)
    t = jnp.full((1,), 500.0)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.bfloat16)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 2, 6)), jnp.float32)
    out_a = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                            audio_tokens=audio, attn_backend="xla")
    out_z = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                            audio_tokens=jnp.zeros_like(audio),
                            attn_backend="xla")
    out_n = wan_dit_forward(params, cfg, lat, t, ctx, cos, sin,
                            attn_backend="xla")
    assert np.isfinite(np.asarray(out_a)).all()
    assert np.abs(np.asarray(out_a - out_z)).max() > 1e-4
    assert np.abs(np.asarray(out_a - out_n)).max() > 1e-4


@pytest.mark.parametrize("guide", [1.0, 4.0])
def test_multitalk_denoise_scan(guide):
    from wan2gp_tpu.models.wan.pipeline import multitalk_denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg, params = _tiny_wan()
    params = dict(params)
    params["audio_attn_blocks"] = init_multitalk_audio_attn(
        jax.random.key(1), cfg, cfg.num_layers, audio_dim=6)
    sched = make_schedule("unipc", 2, shift=5.0)
    lat = jax.random.normal(jax.random.key(2), (1, cfg.in_dim, 3, 8, 8),
                            jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 2, 6)), jnp.float32)
    out = multitalk_denoise_scan(
        params, cfg, sched, lat, ctx, ctx, audio, jnp.zeros_like(audio),
        guide_scale=guide, audio_guide_scale=3.0, rope_cos=cos,
        rope_sin=sin, attn_backend="xla")
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_multitalk_module_loader_roundtrip():
    import torch
    cfg, _ = _tiny_wan()
    rng = np.random.default_rng(3)
    sd = {}
    sd["audio_proj.proj1.weight"] = rng.standard_normal(
        (16, 5 * 12 * 768)).astype(np.float32)
    sd["audio_proj.proj1.bias"] = np.zeros(16, np.float32)
    sd["audio_proj.proj1_vf.weight"] = rng.standard_normal(
        (16, 8 * 12 * 768)).astype(np.float32)
    sd["audio_proj.proj1_vf.bias"] = np.zeros(16, np.float32)
    sd["audio_proj.proj2.weight"] = rng.standard_normal(
        (16, 16)).astype(np.float32)
    sd["audio_proj.proj2.bias"] = np.zeros(16, np.float32)
    sd["audio_proj.proj3.weight"] = rng.standard_normal(
        (2 * 768, 16)).astype(np.float32)
    sd["audio_proj.proj3.bias"] = np.zeros(2 * 768, np.float32)
    sd["audio_proj.norm.weight"] = np.ones(768, np.float32)
    sd["audio_proj.norm.bias"] = np.zeros(768, np.float32)
    for i in range(cfg.num_layers):
        p = f"blocks.{i}.audio_cross_attn"
        sd[f"{p}.q_linear.weight"] = rng.standard_normal(
            (cfg.dim, cfg.dim)).astype(np.float32)
        sd[f"{p}.q_linear.bias"] = np.zeros(cfg.dim, np.float32)
        sd[f"{p}.kv_linear.weight"] = rng.standard_normal(
            (2 * cfg.dim, 768)).astype(np.float32)
        sd[f"{p}.kv_linear.bias"] = np.zeros(2 * cfg.dim, np.float32)
        sd[f"{p}.proj.weight"] = rng.standard_normal(
            (cfg.dim, cfg.dim)).astype(np.float32)
        sd[f"{p}.proj.bias"] = np.zeros(cfg.dim, np.float32)
        sd[f"blocks.{i}.norm_x.weight"] = np.ones(cfg.dim, np.float32)
        sd[f"blocks.{i}.norm_x.bias"] = np.zeros(cfg.dim, np.float32)
    ap, ap_cfg, stacked, leftover = load_multitalk_module_params(
        sd, cfg.num_layers)
    assert leftover == []
    assert ap_cfg.seq_len == 5 and ap_cfg.seq_len_vf == 8
    assert ap_cfg.context_tokens == 2 and ap_cfg.norm_output
    assert stacked["q"]["w"].shape == (cfg.num_layers, cfg.dim, cfg.dim)
    assert stacked["kv"]["w"].shape == (cfg.num_layers, 768, 2 * cfg.dim)


def test_generate_multitalk_end_to_end():
    """Tiny pipeline: audio drives the latents (different audio ->
    different output)."""
    from wan2gp_tpu.models.wan.pipeline import WanPipeline, SamplingConfig
    cfg, params = _tiny_wan()
    params = dict(params)
    params["audio_attn_blocks"] = init_multitalk_audio_attn(
        jax.random.key(1), cfg, cfg.num_layers, audio_dim=16)
    ap_cfg = AudioProjConfig(seq_len=5, seq_len_vf=8, blocks=2, channels=4,
                             intermediate_dim=8, output_dim=16,
                             context_tokens=3, norm_output=True)
    ap = init_audio_proj(jax.random.key(2), ap_cfg)
    pipe = WanPipeline(params, cfg, attn_backend="xla")
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    rng = np.random.default_rng(0)
    emb1 = rng.standard_normal((9, 2, 4)).astype(np.float32)
    emb2 = rng.standard_normal((9, 2, 4)).astype(np.float32)
    kw = dict(n_prompt="", width=64, height=64, frame_num=9,
              sampling=SamplingConfig(solver="unipc", steps=2,
                                      guide_scale=1.0),
              audio_guide_scale=2.0, audio_proj_params=ap,
              audio_proj_cfg=ap_cfg, context=ctx, context_null=ctx,
              return_latents=True, seed=5)
    x1 = pipe.generate_multitalk("hi", emb1, **kw)
    x2 = pipe.generate_multitalk("hi", emb2, **kw)
    assert np.isfinite(np.asarray(x1)).all()
    assert np.abs(np.asarray(x1 - x2)).max() > 1e-4


def test_service_multitalk_end_to_end(tmp_path, monkeypatch):
    """vace_multitalk_14B through the GenerationService with tiny dims:
    audio file in -> AVI with muxed audio track out (BASELINE config #5
    shape, defaults/vace_multitalk_14B.json)."""
    from wan2gp_tpu.families import wan as wan_mod
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.utils.media import save_audio, read_avi_audio
    monkeypatch.setitem(
        wan_mod._ARCH, "vace_multitalk_14B",
        dict(dim=32, ffn_dim=64, num_heads=4, num_layers=2,
             model_type="t2v", vae_stride=(4, 8, 8), vace=True,
             multitalk=True))
    # tiny audio-proj config for random init
    import wan2gp_tpu.models.wan.multitalk as mt
    monkeypatch.setattr(
        mt, "AudioProjConfig",
        lambda **kw: AudioProjConfig(seq_len=5, seq_len_vf=8, blocks=12,
                                     channels=768, intermediate_dim=8,
                                     output_dim=768, context_tokens=2))
    sr = 16000
    t = np.linspace(0, 1.0, sr, endpoint=False)
    wav_path = save_audio((np.sin(2 * np.pi * 220 * t) * 0.4).astype(
        np.float32), str(tmp_path / "voice.wav"), sample_rate=sr)

    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True)
    emb = np.random.default_rng(0).standard_normal(
        (25, 12, 768)).astype(np.float32) * 0.1
    ctx = jnp.zeros((1, 512, 4096), jnp.float32)
    paths = svc.generate({
        "model_type": "vace_multitalk_14B", "prompt": "talking",
        "resolution": "64x64", "video_length": 9,
        "num_inference_steps": 2, "guidance_scale": 1,
        "audio_guidance_scale": 2.0, "seed": 3,
        "audio_guide": wav_path, "_audio_emb": emb,
        "_context": ctx, "_context_null": ctx})
    assert paths and paths[0].endswith(".avi")
    audio = read_avi_audio(paths[0])
    assert audio is not None and audio[1] == sr


def test_multitalk_host_loop_matches_scan():
    """host_loop=True (one jitted step looped on host — the 14B bench
    path that avoids whole-scan compiles) is numerically identical to
    the lax.scan path."""
    from wan2gp_tpu.models.wan.pipeline import multitalk_denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg, params = _tiny_wan()
    params = dict(params)
    params["audio_attn_blocks"] = init_multitalk_audio_attn(
        jax.random.key(1), cfg, cfg.num_layers, audio_dim=6)
    sched = make_schedule("unipc", 3, shift=5.0)
    lat = jax.random.normal(jax.random.key(2), (1, cfg.in_dim, 3, 8, 8),
                            jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 2, 6)), jnp.float32)
    kw = dict(guide_scale=1.0, audio_guide_scale=3.0, rope_cos=cos,
              rope_sin=sin, attn_backend="xla")
    a = multitalk_denoise_scan(params, cfg, sched, lat, ctx, ctx, audio,
                               jnp.zeros_like(audio), **kw)
    b = multitalk_denoise_scan(params, cfg, sched, lat, ctx, ctx, audio,
                               jnp.zeros_like(audio), host_loop=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("guide", [1.0, 4.0])
def test_multitalk_seq_branches_match_joint(guide):
    """joint_pass=False (sequential b=1 CFG branches — the memory trade
    that fits VACE+Multitalk 14B on one 16 GB chip) is numerically
    identical to the joint batched pass for both branch layouts
    (any2video.py:1630-1655).  fp32 compute: in bf16 a batched forward
    and a b=1 forward already differ by ~6e-3 from matmul tiling alone,
    which would mask a real combine bug."""
    import dataclasses
    from wan2gp_tpu.models.wan.dit import init_wan_dit
    from wan2gp_tpu.models.wan.pipeline import multitalk_denoise_scan
    from wan2gp_tpu.schedulers import make_schedule
    from wan2gp_tpu.ops.rope import build_rope_3d
    cfg, _ = _tiny_wan()
    cfg = dataclasses.replace(cfg, compute_dtype=jnp.float32)
    params = dict(init_wan_dit(jax.random.key(0), cfg, dtype=jnp.float32))
    params["audio_attn_blocks"] = init_multitalk_audio_attn(
        jax.random.key(1), cfg, cfg.num_layers, audio_dim=6)
    sched = make_schedule("unipc", 3, shift=5.0)
    lat = jax.random.normal(jax.random.key(2), (1, cfg.in_dim, 3, 8, 8),
                            jnp.float32)
    ctx = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    cos, sin = build_rope_3d((3, 4, 4), head_dim=cfg.head_dim)
    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        (1, 3, 2, 6)), jnp.float32)
    kw = dict(guide_scale=guide, audio_guide_scale=3.0, rope_cos=cos,
              rope_sin=sin, attn_backend="xla")
    a = multitalk_denoise_scan(params, cfg, sched, lat, ctx, ctx, audio,
                               jnp.zeros_like(audio), **kw)
    b = multitalk_denoise_scan(params, cfg, sched, lat, ctx, ctx, audio,
                               jnp.zeros_like(audio), host_loop=True,
                               joint_pass=False, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=2e-5, atol=2e-5)
