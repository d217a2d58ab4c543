"""ACE-Step tests: LiteLA linear attention, ESPnet rel-pos conformer vs a
torch oracle, sigma schedule, APG guidance, DiT forward, DCAE/vocoder
shapes, loader roundtrip, service end-to-end WAV output."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wan2gp_tpu.models.tts.ace_dit import (
    ACEStepConfig, init_ace_dit, ace_dit_forward, ace_encode_condition,
    lite_la, ace_rope, _apply_ace_rope)
from wan2gp_tpu.models.tts.lyric_encoder import (
    ConformerConfig, init_conformer, conformer_forward, espnet_rel_pos)
from wan2gp_tpu.models.tts.ace_pipeline import (
    ACESamplingConfig, ace_sigmas, ace_denoise_scan, ACEStepPipeline)

TINY = ACEStepConfig(num_layers=2, num_heads=2, head_dim=8,
                     in_channels=4, out_channels=4, speaker_dim=6,
                     text_dim=10, lyric_vocab=50, lyric_dim=16,
                     patch_size=(4, 1), max_height=4,
                     compute_dtype=jnp.float32)
TINY_CONF = ConformerConfig(dim=16, n_heads=2, ffn_dim=32, n_layers=2)


def test_lite_la_matches_naive_linear_attention():
    """LiteLA == relu linear attention with a ones normalizer
    (customer_attention_processor.py:186-207, computed naively per
    query)."""
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 5, 2, 4)).astype(np.float32)
    k = rng.standard_normal((1, 5, 2, 4)).astype(np.float32)
    v = rng.standard_normal((1, 5, 2, 4)).astype(np.float32)
    got = np.asarray(lite_la(jnp.asarray(q), jnp.asarray(k),
                             jnp.asarray(v)))
    qr, kr = np.maximum(q, 0), np.maximum(k, 0)
    ref = np.zeros_like(v)
    for s in range(5):
        for h in range(2):
            w = kr[0, :, h] @ qr[0, s, h]                    # [S]
            ref[0, s, h] = (v[0, :, h].T @ w) / (w.sum() + 1e-15)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_ace_rope_matches_reference_formula():
    """The reference applies NeoX duplicated-half tables with the
    INTERLEAVED pairing (customer_attention_processor.py:53-62) — verify
    against a literal torch re-derivation."""
    import torch
    cos, sin = ace_rope(6, 8, 1e6)
    x = np.random.default_rng(1).standard_normal((1, 6, 2, 8)).astype(
        np.float32)
    got = np.asarray(_apply_ace_rope(jnp.asarray(x), cos, sin))
    tx = torch.tensor(x).permute(0, 2, 1, 3)          # [B, H, S, D]
    tc = torch.tensor(np.asarray(cos))[None, None]
    ts = torch.tensor(np.asarray(sin))[None, None]
    xr, xi = tx.reshape(*tx.shape[:-1], -1, 2).unbind(-1)
    rot = torch.stack([-xi, xr], dim=-1).flatten(3)
    ref = (tx * tc + rot * ts).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_conformer_matches_torch_oracle():
    """Rel-pos transformer vs a literal torch re-derivation of
    lyric_encoder.py (EspnetRelPositionalEncoding + pos_bias_u/v +
    rel_shift)."""
    import torch
    import math
    cfg = TINY_CONF
    params = init_conformer(jax.random.key(0), cfg)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, cfg.dim)).astype(np.float32)
    mask = np.ones((1, 5), np.int32)
    got = np.asarray(conformer_forward(params, cfg, jnp.asarray(x),
                                       jnp.asarray(mask)))

    def t(a):
        return torch.tensor(np.asarray(a, np.float32))

    def lin(p, y):
        out = y @ t(p["w"])
        if "b" in p:
            out = out + t(p["b"])
        return out

    def ln(p, y, eps=cfg.eps):
        return torch.nn.functional.layer_norm(
            y, y.shape[-1:], t(p["w"]), t(p["b"]), eps)

    with torch.no_grad():
        h = ln(params["embed_ln"], lin(params["embed"], t(x)))
        h = h * math.sqrt(cfg.dim)
        pe = t(espnet_rel_pos(5, cfg.dim))           # [2T-1, D]
        n, hd = cfg.n_heads, cfg.head_dim
        for lp in params["layers"]:
            y = ln(lp["norm_mha"], h)
            q = lin(lp["q"], y).view(1, 5, n, hd)
            k = lin(lp["k"], y).view(1, 5, n, hd)
            v = lin(lp["v"], y).view(1, 5, n, hd)
            p = lin(lp["pos"], pe).view(-1, n, hd)
            qu = (q + t(lp["pos_bias_u"])).permute(0, 2, 1, 3)
            qv = (q + t(lp["pos_bias_v"])).permute(0, 2, 1, 3)
            ac = qu @ k.permute(0, 2, 3, 1)
            bd = qv @ p.permute(1, 2, 0)[None]
            # reference rel_shift (lyric_encoder.py:349)
            zp = torch.zeros((1, n, 5, 1))
            xp = torch.cat([zp, bd], dim=-1)
            xp = xp.view(1, n, bd.size(3) + 1, 5)
            bd = xp[:, :, 1:].view_as(bd)[:, :, :, :bd.size(-1) // 2 + 1]
            scores = (ac + bd) / math.sqrt(hd)
            attn = torch.softmax(scores, dim=-1)
            o = (attn @ v.permute(0, 2, 1, 3)).permute(0, 2, 1, 3)
            h = h + lin(lp["o"], o.reshape(1, 5, cfg.dim))
            y = ln(lp["norm_ff"], h)
            h = h + lin(lp["ff2"], torch.nn.functional.silu(
                lin(lp["ff1"], y)))
        ref = ln(params["after_norm"], h).numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_ace_sigmas_matches_reference_formula():
    """scheduling_flow_match_euler_discrete.py:81-84."""
    import torch
    n, shift = 7, 3.0
    got = ace_sigmas(n, shift)
    timesteps = np.linspace(1000, 1000 / n, n)
    sig = timesteps / 1000
    sig = shift * sig / (1 + (shift - 1) * sig)
    np.testing.assert_allclose(got[:-1], sig, rtol=1e-6)
    assert got[-1] == 0.0


def test_ace_dit_forward_shapes():
    cfg = TINY
    params = init_ace_dit(jax.random.key(0), cfg, jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.in_channels, cfg.max_height, 12)), jnp.float32)
    text = jnp.zeros((1, 3, cfg.text_dim), jnp.float32)
    tmask = jnp.ones((1, 3), jnp.int32)
    spk = jnp.zeros((1, cfg.speaker_dim), jnp.float32)
    lyr = jnp.asarray([[1, 2, 3]], jnp.int32)
    lmask = jnp.ones((1, 3), jnp.int32)
    enc, emask = ace_encode_condition(params, cfg, text, tmask, spk, lyr,
                                      lmask)
    assert enc.shape == (1, 1 + 3 + 3, cfg.dim)
    v = ace_dit_forward(params, cfg, x, jnp.asarray([500.0]), enc, emask)
    assert v.shape == (1, cfg.out_channels, cfg.max_height, 12)
    assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("cfg_type", ["cfg", "apg"])
def test_ace_denoise_scan(cfg_type):
    cfg = TINY
    params = init_ace_dit(jax.random.key(0), cfg, jnp.float32)
    text = jnp.zeros((1, 3, cfg.text_dim), jnp.float32)
    tmask = jnp.ones((1, 3), jnp.int32)
    spk = jnp.zeros((1, cfg.speaker_dim), jnp.float32)
    lyr = jnp.asarray([[1, 2, 3]], jnp.int32)
    lmask = jnp.ones((1, 3), jnp.int32)
    enc, emask = ace_encode_condition(params, cfg, text, tmask, spk, lyr,
                                      lmask)
    lat = jax.random.normal(jax.random.key(1),
                            (1, cfg.in_channels, cfg.max_height, 8))
    sampling = ACESamplingConfig(steps=2, guide_scale=3.0,
                                 cfg_type=cfg_type)
    out = ace_denoise_scan(params, cfg, sampling, lat, enc, emask,
                           enc, emask)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


def test_dcae_roundtrip_shapes():
    from wan2gp_tpu.models.tts.ace_audio import (
        MusicDCAEConfig, init_music_dcae, dcae_encode, dcae_decode)
    cfg = MusicDCAEConfig(block_out_channels=(8, 16, 16, 16),
                          layers_per_block=(1, 1, 1, 1))
    params = init_music_dcae(jax.random.key(0), cfg)
    mels = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 2, 32, 16)), jnp.float32)
    z = dcae_encode(params, cfg, mels)
    assert z.shape == (1, cfg.latent_channels, 4, 2)
    back = dcae_decode(params, cfg, z)
    assert back.shape == mels.shape
    assert np.isfinite(np.asarray(back)).all()


def test_vocoder_output_length():
    from wan2gp_tpu.models.tts.ace_audio import (
        ADaMoSConfig, init_adamos_vocoder, adamos_vocode)
    cfg = ADaMoSConfig(input_channels=8, depths=(1, 1), dims=(8, 16),
                       upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
                       resblock_kernel_sizes=(3,),
                       resblock_dilations=((1, 2),), head_in=16,
                       upsample_initial_channel=16,
                       pre_conv_kernel=3, post_conv_kernel=3)
    params = init_adamos_vocoder(jax.random.key(0), cfg)
    mel = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, 8, 10)), jnp.float32)
    wav = adamos_vocode(params, cfg, mel)
    assert wav.shape == (1, 10 * 4)
    assert np.isfinite(np.asarray(wav)).all()


def test_log_mel_shapes():
    from wan2gp_tpu.models.tts.ace_audio import log_mel_spectrogram
    wave = jnp.asarray(np.random.default_rng(0).uniform(
        -1, 1, (1, 44100 // 4)), jnp.float32)
    mel = log_mel_spectrogram(wave)
    assert mel.shape[1] == 128
    assert np.isfinite(np.asarray(mel)).all()


def test_ace_loader_roundtrip():
    """torch-convention state dict -> loader -> identical forward."""
    import torch
    cfg = TINY
    params = init_ace_dit(jax.random.key(3), cfg, jnp.float32)
    from wan2gp_tpu.io.ace_checkpoint import load_ace_dit_params

    sd = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_c1x1(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T[..., None]
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    pi = params["proj_in"]
    sd["proj_in.early_conv_layers.0.weight"] = np.asarray(
        pi["conv1"]["w"]).transpose(3, 2, 0, 1)
    sd["proj_in.early_conv_layers.0.bias"] = np.asarray(pi["conv1"]["b"])
    sd["proj_in.early_conv_layers.1.weight"] = np.asarray(pi["gn"]["w"])
    sd["proj_in.early_conv_layers.1.bias"] = np.asarray(pi["gn"]["b"])
    sd["proj_in.early_conv_layers.2.weight"] = np.asarray(
        pi["conv2"]["w"]).transpose(3, 2, 0, 1)
    sd["proj_in.early_conv_layers.2.bias"] = np.asarray(pi["conv2"]["b"])
    put_lin("timestep_embedder.linear_1", params["timestep_embedder"]["fc1"])
    put_lin("timestep_embedder.linear_2", params["timestep_embedder"]["fc2"])
    put_lin("t_block.1", params["t_block"])
    put_lin("speaker_embedder", params["speaker_embedder"])
    put_lin("genre_embedder", params["genre_embedder"])
    sd["lyric_embs.weight"] = np.asarray(params["lyric_embs"], np.float32)
    put_lin("lyric_proj", params["lyric_proj"])
    le = params["lyric_encoder"]
    put_lin("lyric_encoder.embed.out.0", le["embed"])
    sd["lyric_encoder.embed.out.1.weight"] = np.asarray(le["embed_ln"]["w"])
    sd["lyric_encoder.embed.out.1.bias"] = np.asarray(le["embed_ln"]["b"])
    for i, lp in enumerate(le["layers"]):
        pre = f"lyric_encoder.encoders.{i}"
        put_lin(f"{pre}.self_attn.linear_q", lp["q"])
        put_lin(f"{pre}.self_attn.linear_k", lp["k"])
        put_lin(f"{pre}.self_attn.linear_v", lp["v"])
        put_lin(f"{pre}.self_attn.linear_out", lp["o"])
        put_lin(f"{pre}.self_attn.linear_pos", lp["pos"])
        sd[f"{pre}.self_attn.pos_bias_u"] = np.asarray(lp["pos_bias_u"])
        sd[f"{pre}.self_attn.pos_bias_v"] = np.asarray(lp["pos_bias_v"])
        for nk in ("norm_mha", "norm_ff"):
            sd[f"{pre}.{nk}.weight"] = np.asarray(lp[nk]["w"])
            sd[f"{pre}.{nk}.bias"] = np.asarray(lp[nk]["b"])
        put_lin(f"{pre}.feed_forward.w_1", lp["ff1"])
        put_lin(f"{pre}.feed_forward.w_2", lp["ff2"])
    sd["lyric_encoder.after_norm.weight"] = np.asarray(le["after_norm"]["w"])
    sd["lyric_encoder.after_norm.bias"] = np.asarray(le["after_norm"]["b"])
    bp = params["blocks"]
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        for attn in ("attn", "cross_attn"):
            ap = bp[attn]
            for ln_ in ("to_q", "to_k", "to_v"):
                put_lin(f"{pre}.{attn}.{ln_}",
                        jax.tree.map(lambda x: x[i], ap[ln_]))
            put_lin(f"{pre}.{attn}.to_out.0",
                    jax.tree.map(lambda x: x[i], ap["to_out"]))
        put_c1x1(f"{pre}.ff.inverted_conv.conv",
                 jax.tree.map(lambda x: x[i], bp["ff"]["inverted"]))
        sd[f"{pre}.ff.depth_conv.conv.weight"] = np.asarray(
            bp["ff"]["depth"]["w"][i]).transpose(2, 1, 0)
        sd[f"{pre}.ff.depth_conv.conv.bias"] = np.asarray(
            bp["ff"]["depth"]["b"][i])
        put_c1x1(f"{pre}.ff.point_conv.conv",
                 jax.tree.map(lambda x: x[i], bp["ff"]["point"]))
        sd[f"{pre}.scale_shift_table"] = np.asarray(
            bp["scale_shift_table"][i])
    put_lin("final_layer.linear", params["final"]["linear"])
    sd["final_layer.scale_shift_table"] = np.asarray(
        params["final"]["scale_shift_table"])

    loaded, leftover = load_ace_dit_params(sd, cfg, dtype=jnp.float32)
    assert leftover == [], leftover[:6]

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.in_channels, cfg.max_height, 8)), jnp.float32)
    text = jnp.zeros((1, 3, cfg.text_dim), jnp.float32)
    tmask = jnp.ones((1, 3), jnp.int32)
    spk = jnp.zeros((1, cfg.speaker_dim), jnp.float32)
    lyr = jnp.asarray([[1, 2, 3]], jnp.int32)
    lmask = jnp.ones((1, 3), jnp.int32)
    e1, m1 = ace_encode_condition(params, cfg, text, tmask, spk, lyr, lmask)
    e2, m2 = ace_encode_condition(loaded, cfg, text, tmask, spk, lyr, lmask)
    v1 = ace_dit_forward(params, cfg, x, jnp.asarray([500.0]), e1, m1)
    v2 = ace_dit_forward(loaded, cfg, x, jnp.asarray([500.0]), e2, m2)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=2e-4, atol=2e-4)


def test_service_ace_step_end_to_end(tmp_path, monkeypatch):
    """ace_step through the GenerationService: prompt in -> WAV out."""
    from wan2gp_tpu.families import tts_ace
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.utils.media import read_wav
    orig = tts_ace.ACEStepConfig
    monkeypatch.setattr(
        tts_ace, "ACEStepConfig",
        lambda **kw: orig(num_layers=2, num_heads=2, head_dim=8,
                          in_channels=4, out_channels=4, speaker_dim=6,
                          text_dim=10, lyric_vocab=300, lyric_dim=16,
                          patch_size=(4, 1), max_height=4,
                          compute_dtype=jnp.float32))
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True)
    paths = svc.generate({"model_type": "ace_step_turbo",
                          "prompt": "jazz piano",
                          "lyrics": "la la la",
                          "duration_seconds": 1.0,
                          "num_inference_steps": 2,
                          "guidance_scale": 3.0, "seed": 11})
    assert paths and paths[0].endswith(".wav")
    wav, sr = read_wav(paths[0])
    assert sr == 44100 and wav.shape[0] > 1000
