"""LTX-2 family tests: rope tables, AV transformer forward (tiny config)."""
import numpy as np
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.ltx2.dit import (
    LTX2Config, init_ltx2_dit, ltx2_dit_forward)
from wan2gp_tpu.models.ltx2.rope import (
    build_ltx_rope, apply_ltx_rope, video_token_positions,
    audio_token_positions)

TINY = LTX2Config(num_layers=2, num_heads=2, head_dim=16,
                  in_channels=8, out_channels=8, caption_dim=12,
                  audio_num_heads=2, audio_head_dim=8,
                  audio_in_channels=4, audio_out_channels=4)


def _ropes(cfg, grid, la):
    vpos = video_token_positions(grid, fps=24.0)
    apos = audio_token_positions(la, tokens_per_second=4.0)
    v_rope = build_ltx_rope(vpos, cfg.dim, cfg.num_heads, cfg.max_pos,
                            rope_type=cfg.rope_type)
    a_rope = build_ltx_rope(apos, cfg.audio_dim, cfg.audio_num_heads,
                            cfg.audio_max_pos, rope_type=cfg.rope_type)
    # AV cross rope: temporal axis only, shared max_pos (model.py:115)
    vx_rope = build_ltx_rope(vpos[:1], cfg.audio_dim, cfg.audio_num_heads,
                             cfg.max_pos[:1], rope_type=cfg.rope_type)
    ax_rope = build_ltx_rope(apos, cfg.audio_dim, cfg.audio_num_heads,
                             cfg.max_pos[:1], rope_type=cfg.rope_type)
    return v_rope, a_rope, vx_rope, ax_rope


def test_rope_rotation_preserves_norm():
    pos = video_token_positions((2, 2, 2), fps=24.0)
    cos, sin = build_ltx_rope(pos, 32, 2, (20.0, 2048.0, 2048.0),
                              rope_type="split")
    assert cos.shape == (8, 2, 8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 2, 16)),
                    jnp.float32)
    y = apply_ltx_rope(x, cos, sin, "split")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)
    # interleaved variant too
    cos2, sin2 = build_ltx_rope(pos, 32, 2, (20.0, 2048.0, 2048.0),
                                rope_type="interleaved")
    y2 = apply_ltx_rope(x, cos2, sin2, "interleaved")
    np.testing.assert_allclose(np.linalg.norm(np.asarray(y2), axis=-1),
                               np.linalg.norm(np.asarray(x), axis=-1),
                               rtol=1e-5)


def test_av_forward_shapes_and_finite():
    cfg = TINY
    params = init_ltx2_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(1)
    grid = (2, 2, 2)
    lv = 8
    la = 6
    vt = jnp.asarray(rng.standard_normal((1, lv, cfg.in_channels)),
                     jnp.float32)
    at = jnp.asarray(rng.standard_normal((1, la, cfg.audio_in_channels)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, cfg.caption_dim)),
                      jnp.float32)
    v_rope, a_rope, vx_rope, ax_rope = _ropes(cfg, grid, la)
    tv = jnp.full((1, 1), 0.7)
    ta = jnp.full((1, 1), 0.7)
    out_v, out_a = ltx2_dit_forward(
        params, cfg, vt, tv, ctx, v_rope, video_cross_rope=vx_rope,
        audio_tokens=at, t_audio=ta, audio_rope=a_rope,
        audio_cross_rope=ax_rope, attn_backend="xla")
    assert out_v.shape == (1, lv, cfg.out_channels)
    assert out_a.shape == (1, la, cfg.audio_out_channels)
    assert np.isfinite(np.asarray(out_v)).all()
    assert np.isfinite(np.asarray(out_a)).all()


def test_video_only_forward():
    cfg = TINY
    params = init_ltx2_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    vt = jnp.asarray(rng.standard_normal((2, 8, cfg.in_channels)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 5, cfg.caption_dim)),
                      jnp.float32)
    v_rope, _, _, _ = _ropes(cfg, (2, 2, 2), 4)
    out_v, out_a = ltx2_dit_forward(params, cfg, vt, jnp.full((2, 1), 0.5),
                                    ctx, v_rope, attn_backend="xla")
    assert out_v.shape == (2, 8, cfg.out_channels) and out_a is None
    assert np.isfinite(np.asarray(out_v)).all()


def test_22b_cross_attention_adaln_gated():
    import dataclasses
    cfg = dataclasses.replace(TINY, gated_attention=True,
                              cross_attention_adaln=True)
    params = init_ltx2_dit(jax.random.key(3), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    vt = jnp.asarray(rng.standard_normal((1, 8, cfg.in_channels)),
                     jnp.float32)
    at = jnp.asarray(rng.standard_normal((1, 4, cfg.audio_in_channels)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, cfg.caption_dim)),
                      jnp.float32)
    v_rope, a_rope, vx_rope, ax_rope = _ropes(cfg, (2, 2, 2), 4)
    out_v, out_a = ltx2_dit_forward(
        params, cfg, vt, jnp.full((1, 1), 0.3), ctx, v_rope,
        video_cross_rope=vx_rope, audio_tokens=at,
        t_audio=jnp.full((1, 1), 0.3), audio_rope=a_rope,
        audio_cross_rope=ax_rope, attn_backend="xla")
    assert np.isfinite(np.asarray(out_v)).all()
    assert np.isfinite(np.asarray(out_a)).all()


def test_per_frame_timesteps():
    cfg = TINY
    params = init_ltx2_dit(jax.random.key(0), cfg, dtype=jnp.float32)
    rng = np.random.default_rng(4)
    vt = jnp.asarray(rng.standard_normal((1, 8, cfg.in_channels)),
                     jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 5, cfg.caption_dim)),
                      jnp.float32)
    v_rope, _, _, _ = _ropes(cfg, (2, 2, 2), 4)
    tv = jnp.asarray([[0.7, 0.0]])  # per-frame: 2 frames x 4 tokens
    out_v, _ = ltx2_dit_forward(params, cfg, vt, tv, ctx, v_rope,
                                attn_backend="xla")
    assert np.isfinite(np.asarray(out_v)).all()


def test_ltx2_vae_roundtrip_shapes():
    from wan2gp_tpu.models.ltx2.vae import (
        LTX2_19B_VAE, init_ltx2_vae, ltx2_vae_encode, ltx2_vae_decode)
    import dataclasses
    cfg = dataclasses.replace(LTX2_19B_VAE, base_channels=8,
                              latent_channels=4,
                              encoder_blocks=(
                                  ("res_x", 1),
                                  ("compress_space_res", {"multiplier": 2}),
                                  ("res_x", 1),
                                  ("compress_time_res", {"multiplier": 2}),
                                  ("compress_all_res", {"multiplier": 2}),
                                  ("compress_all_res", {"multiplier": 2})),
                              decoder_blocks=(
                                  ("res_x", {"num_layers": 1}),
                                  ("compress_all",
                                   {"multiplier": 2, "residual": True}),
                                  ("res_x", {"num_layers": 1}),
                                  ("compress_all",
                                   {"multiplier": 2, "residual": True}),
                                  ("res_x", {"num_layers": 1}),
                                  ("compress_all",
                                   {"multiplier": 2, "residual": True}),
                                  ("res_x", {"num_layers": 1})))
    params = init_ltx2_vae(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    video = jnp.asarray(rng.standard_normal((1, 3, 9, 64, 64)) * 0.1,
                        jnp.float32)
    z = ltx2_vae_encode(params, cfg, video)
    # stride (8, 32, 32): 9 frames -> 2, 64px -> 2
    assert z.shape == (1, 4, 2, 2, 2), z.shape
    out = ltx2_vae_decode(params, cfg, z)
    assert out.shape == (1, 3, 9, 64, 64), out.shape
    assert np.isfinite(np.asarray(out)).all()


def test_ltxv_decoder_timestep_conditioning():
    """0.9.7+ 13B decoder extras: timestep-conditioned decode runs and
    differs from unconditioned params with a different timestep."""
    import dataclasses
    from wan2gp_tpu.models.ltxv.vae import (
        LTXVVAEConfig, init_ltxv_vae, ltxv_vae_decode)
    cfg = LTXVVAEConfig(base_channels=8, latent_channels=4,
                        timestep_conditioning=True,
                        encoder_blocks=(("res_x", 1), ("compress_all", 2)),
                        decoder_blocks=(
                            ("res_x", {"num_layers": 1,
                                       "inject_noise": True}),
                            ("compress_all", {"residual": True,
                                              "multiplier": 1}),
                            ("res_x", {"num_layers": 1})))
    params = init_ltxv_vae(jax.random.key(0), cfg)
    assert "last_time_embedder" in params["decoder"]
    assert "time_embedder" in params["decoder"]["blocks"][0]
    assert "scale_shift_table" in \
        params["decoder"]["blocks"][0]["res_blocks"][0]
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.standard_normal((1, 4, 2, 4, 4)), jnp.float32)
    out1 = ltxv_vae_decode(params, cfg, z,
                           timestep=jnp.full((1,), 0.05),
                           noise_key=jax.random.key(1))
    out2 = ltxv_vae_decode(params, cfg, z,
                           timestep=jnp.full((1,), 0.5),
                           noise_key=jax.random.key(1))
    assert np.isfinite(np.asarray(out1)).all()
    assert np.abs(np.asarray(out1) - np.asarray(out2)).max() > 1e-6


def test_ltx2_audio_vae_roundtrip_shapes():
    import dataclasses
    from wan2gp_tpu.models.ltx2.audio_vae import (
        LTX2AudioVAEConfig, init_ltx2_audio_vae, ltx2_audio_encode,
        ltx2_audio_decode)
    cfg = dataclasses.replace(LTX2AudioVAEConfig(), ch=8, z_channels=4,
                              mel_bins=16)
    params = init_ltx2_audio_vae(jax.random.key(0), cfg)
    rng = np.random.default_rng(7)
    spec = jnp.asarray(rng.standard_normal((1, 2, 17, 16)), jnp.float32)
    z = ltx2_audio_encode(params, cfg, spec)
    # time 17 -> ceil through 2 causal stride-2 convs -> 5; mel 16 -> 4
    assert z.shape[0:2] == (1, 4) and z.shape[3] == 4, z.shape
    out = ltx2_audio_decode(params, cfg, z)
    assert out.shape[1] == 2 and out.shape[3] == 16
    assert out.shape[2] == z.shape[2] * 4 - 3
    assert np.isfinite(np.asarray(out)).all()


def test_ltx2_mel_and_vocoder():
    import dataclasses
    from wan2gp_tpu.models.ltx2.audio_vae import (
        LTX2AudioVAEConfig, log_mel_spectrogram, LTX2VocoderConfig,
        init_ltx2_vocoder, ltx2_vocoder)
    acfg = LTX2AudioVAEConfig()
    rng = np.random.default_rng(8)
    wave = jnp.asarray(rng.standard_normal((1, 2, 3200)) * 0.1, jnp.float32)
    mel = log_mel_spectrogram(wave, acfg)
    assert mel.shape[1] == 2 and mel.shape[3] == 64
    assert np.isfinite(np.asarray(mel)).all()

    vcfg = dataclasses.replace(LTX2VocoderConfig(), mel_bins=8,
                               upsample_initial_channel=16,
                               upsample_rates=(2, 2),
                               upsample_kernel_sizes=(4, 4),
                               resblock_kernel_sizes=(3,),
                               resblock_dilations=((1, 3),))
    vp = init_ltx2_vocoder(jax.random.key(1), vcfg)
    melx = jnp.asarray(rng.standard_normal((1, 8, 10)), jnp.float32)
    wav = ltx2_vocoder(vp, vcfg, melx)
    assert wav.shape == (1, 2, 40), wav.shape
    assert np.isfinite(np.asarray(wav)).all()
