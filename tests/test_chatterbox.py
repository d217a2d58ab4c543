"""Chatterbox TTS tests (torch-oracle + e2e).

Oracles re-derive the reference formulas
(/root/reference/models/TTS/chatterbox/) in torch.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.chatterbox import (
    T3Config, VoiceEncConfig, init_t3, init_voice_encoder,
    voice_encoder_mels, voice_encoder_embed, t3_generate, _lstm_layer,
    init_perceiver, perceiver_resample, _perceiver_block)
from wan2gp_tpu.models.tts import s3gen as S

torch = pytest.importorskip("torch")
F = torch.nn.functional


def _np(x):
    return np.asarray(x)


# -- voice encoder LSTM (voice_encoder.py:126-160) --------------------------

def test_lstm_layer_matches_torch():
    h, d, t = 8, 6, 11
    rng = np.random.default_rng(0)
    p = {"wi": jnp.asarray(rng.standard_normal((d, 4 * h)) * 0.2,
                           jnp.float32),
         "wh": jnp.asarray(rng.standard_normal((h, 4 * h)) * 0.2,
                           jnp.float32),
         "b": jnp.asarray(rng.standard_normal(4 * h) * 0.1,
                          jnp.float32)}
    x = rng.standard_normal((2, t, d)).astype(np.float32)

    ref = torch.nn.LSTM(d, h, num_layers=1, batch_first=True)
    with torch.no_grad():
        ref.weight_ih_l0.copy_(torch.from_numpy(_np(p["wi"]).T))
        ref.weight_hh_l0.copy_(torch.from_numpy(_np(p["wh"]).T))
        ref.bias_ih_l0.copy_(torch.from_numpy(_np(p["b"])))
        ref.bias_hh_l0.zero_()
        out_ref, (h_ref, _) = ref(torch.from_numpy(x))

    outs, h_last = _lstm_layer(p, jnp.asarray(x))
    np.testing.assert_allclose(_np(outs), out_ref.numpy(), atol=1e-5,
                               rtol=1e-5)
    np.testing.assert_allclose(_np(h_last), h_ref[0].numpy(), atol=1e-5,
                               rtol=1e-5)


def test_voice_encoder_embed_normalized():
    cfg = VoiceEncConfig.tiny()
    p = init_voice_encoder(jax.random.PRNGKey(0), cfg)
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2000)) * 0.3, jnp.float32)
    mels = voice_encoder_mels(wav, cfg)
    emb = voice_encoder_embed(p, mels)
    assert emb.shape == (2, cfg.speaker_embed_size)
    np.testing.assert_allclose(np.linalg.norm(_np(emb), axis=-1), 1.0,
                               atol=1e-5)
    assert (_np(emb) >= 0).all()   # final ReLU


# -- perceiver resampler (modules/perceiver.py) -----------------------------

def test_perceiver_block_matches_torch():
    cfg = T3Config.tiny()
    p = init_perceiver(jax.random.PRNGKey(1), cfg)
    d, heads = cfg.dim, cfg.perceiver_heads
    rng = np.random.default_rng(1)
    x1 = rng.standard_normal((1, 4, d)).astype(np.float32)
    x2 = rng.standard_normal((1, 9, d)).astype(np.float32)

    def t_lin(x, lp):
        return x @ torch.from_numpy(_np(lp["w"])) + torch.from_numpy(
            _np(lp["b"]))

    a = F.layer_norm(torch.from_numpy(x1), (d,),
                     torch.from_numpy(_np(p["norm"]["scale"])),
                     torch.from_numpy(_np(p["norm"]["bias"])))
    b = F.layer_norm(torch.from_numpy(x2), (d,),
                     torch.from_numpy(_np(p["norm"]["scale"])),
                     torch.from_numpy(_np(p["norm"]["bias"])))
    q = t_lin(a, p["q"]).view(1, 4, heads, d // heads).transpose(1, 2)
    k = t_lin(b, p["k"]).view(1, 9, heads, d // heads).transpose(1, 2)
    v = t_lin(b, p["v"]).view(1, 9, heads, d // heads).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(1, 4, d)
    ref = torch.from_numpy(x1) + t_lin(o, p["o"])

    out = _perceiver_block(p, jnp.asarray(x1), jnp.asarray(x2), heads)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_perceiver_resample_shape():
    cfg = T3Config.tiny()
    p = init_perceiver(jax.random.PRNGKey(2), cfg)
    h = jnp.asarray(np.random.default_rng(2).standard_normal(
        (2, 17, cfg.dim)), jnp.float32)
    out = perceiver_resample(p, cfg, h)
    assert out.shape == (2, cfg.perceiver_queries, cfg.dim)


# -- T3 generation ----------------------------------------------------------

@pytest.fixture(scope="module")
def t3():
    cfg = T3Config.tiny()
    return cfg, init_t3(jax.random.key(0), cfg)


def test_t3_generate_shapes_and_stop(t3):
    cfg, p = t3
    text = jnp.asarray([[cfg.start_text_token, 3, 7, cfg.stop_text_token]],
                       jnp.int32)
    spk = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, cfg.speaker_embed_size)), jnp.float32)
    toks, valid = t3_generate(p, cfg, text, spk, max_new_tokens=12,
                              key=jax.random.key(1))
    assert toks.shape == (12,) and valid.shape == (12,)
    assert (_np(toks) >= 0).all()
    assert (_np(toks) < cfg.speech_vocab_size).all()
    # after a stop token everything is invalid
    v = _np(valid)
    if not v.all():
        first = int(np.argmin(v))
        assert not v[first:].any()


def test_t3_cfg_changes_output(t3):
    cfg, p = t3
    text = jnp.asarray([[cfg.start_text_token, 5, cfg.stop_text_token]],
                       jnp.int32)
    spk = jnp.zeros((1, cfg.speaker_embed_size), jnp.float32)
    a, _ = t3_generate(p, cfg, text, spk, cfg_weight=0.0,
                       max_new_tokens=8)
    b, _ = t3_generate(p, cfg, text, spk, cfg_weight=2.0,
                       max_new_tokens=8)
    c, _ = t3_generate(p, cfg, text, spk, cfg_weight=0.0,
                       max_new_tokens=8)
    np.testing.assert_array_equal(_np(a), _np(c))   # deterministic
    assert not np.array_equal(_np(a), _np(b))       # CFG has effect


# -- s3gen pieces -----------------------------------------------------------

def test_causal_conv_matches_torch():
    rng = np.random.default_rng(3)
    p = {"w": jnp.asarray(rng.standard_normal((3, 4, 6)) * 0.2,
                          jnp.float32),
         "b": jnp.asarray(rng.standard_normal(6) * 0.1, jnp.float32)}
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    ref = F.conv1d(F.pad(torch.from_numpy(x).transpose(1, 2), (2, 0)),
                   torch.from_numpy(_np(p["w"])).permute(2, 1, 0),
                   torch.from_numpy(_np(p["b"])))
    out = S._causal_conv1d(jnp.asarray(x), p)
    np.testing.assert_allclose(_np(out),
                               ref.transpose(1, 2).numpy(), atol=1e-5,
                               rtol=1e-4)
    # causality: future change does not affect past outputs
    x2 = x.copy()
    x2[:, -1] += 10.0
    out2 = S._causal_conv1d(jnp.asarray(x2), p)
    np.testing.assert_allclose(_np(out[:, :-1]), _np(out2[:, :-1]),
                               atol=1e-6)


def test_rel_attn_matches_espnet_formula():
    """score = (q+u)k^T + rel_shift((q+v)p^T) (espnet
    RelPositionMultiHeadedAttention, transformer/attention.py)."""
    cfg = S.S3GenConfig.tiny()
    d, heads = cfg.d_model, cfg.heads
    p = S._init_attn(jax.random.PRNGKey(4), d, heads, jnp.float32)
    rng = np.random.default_rng(4)
    t = 6
    x = rng.standard_normal((1, t, d)).astype(np.float32)

    def t_lin(v, lp):
        out = torch.from_numpy(np.asarray(v)) @ torch.from_numpy(
            _np(lp["w"]))
        if "b" in lp:
            out = out + torch.from_numpy(_np(lp["b"]))
        return out

    hd = d // heads
    q = t_lin(x, p["q"]).view(1, t, heads, hd)
    k = t_lin(x, p["k"]).view(1, t, heads, hd)
    v = t_lin(x, p["v"]).view(1, t, heads, hd)
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    ang = np.outer(pos, inv)
    pe = np.zeros((2 * t - 1, d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    pr = t_lin(pe, p["pos"]).view(2 * t - 1, heads, hd)
    u = torch.from_numpy(_np(p["bias_u"]))
    vb = torch.from_numpy(_np(p["bias_v"]))
    ac = torch.einsum("bthd,bshd->bhts", q + u, k)
    bd = torch.zeros(1, heads, t, t)
    for ti in range(t):
        for si in range(t):
            bd[0, :, ti, si] = torch.einsum(
                "hd,hd->h", (q[0, ti] + vb), pr[t - 1 - ti + si])
    w = torch.softmax((ac + bd) / math.sqrt(hd), dim=-1)
    ref = torch.einsum("bhts,bshd->bthd", w, v).reshape(1, t, d)
    ref = t_lin(ref.numpy(), p["o"])

    out = S._rel_attn(p, jnp.asarray(x), heads)
    np.testing.assert_allclose(_np(out), ref.numpy(), atol=1e-4,
                               rtol=1e-4)


def test_hift_istft_matches_torch():
    cfg = S.S3GenConfig.tiny()
    n_fft, hop = cfg.istft_n_fft, cfg.istft_hop
    rng = np.random.default_rng(5)
    t = 24
    mag = np.exp(rng.standard_normal((1, t, n_fft // 2 + 1))
                 .astype(np.float32) * 0.1)
    phase = rng.uniform(-np.pi, np.pi,
                        (1, t, n_fft // 2 + 1)).astype(np.float32)
    w = torch.hann_window(n_fft, periodic=True)
    spec = torch.from_numpy(mag) * torch.exp(
        1j * torch.from_numpy(phase))
    ref = torch.istft(spec.transpose(1, 2), n_fft, hop, n_fft, window=w)
    out = S._hift_istft(jnp.asarray(mag), jnp.asarray(phase), n_fft,
                        hop)
    n = min(ref.shape[-1], out.shape[-1])
    np.testing.assert_allclose(_np(out)[:, :n], ref.numpy()[:, :n],
                               atol=1e-4, rtol=1e-3)


def test_campplus_embedding_shape():
    cfg = S.S3GenConfig.tiny()
    p = S.init_campplus(jax.random.PRNGKey(5), cfg)
    mels = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 40, cfg.mel_dim)), jnp.float32)
    emb = S.campplus_embed(p, cfg, mels)
    assert emb.shape == (2, cfg.spk_dim)
    assert np.isfinite(_np(emb)).all()


def test_cfm_cfg_zero_noise_deterministic():
    cfg = S.S3GenConfig.tiny()
    p = S.init_estimator(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(6)
    mu = jnp.asarray(rng.standard_normal((1, 8, cfg.mel_dim)),
                     jnp.float32)
    spk = jnp.asarray(rng.standard_normal((1, cfg.mel_dim)),
                      jnp.float32)
    cond = jnp.zeros_like(mu)
    a = S.cfm_inference(p, cfg, mu, spk, cond, jax.random.PRNGKey(0))
    b = S.cfm_inference(p, cfg, mu, spk, cond, jax.random.PRNGKey(0))
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-6)
    assert a.shape == (1, 8, cfg.mel_dim)


# -- e2e --------------------------------------------------------------------

def test_chatterbox_family_e2e():
    from wan2gp_tpu.families.tts_chatterbox import ChatterboxFamilyHandler
    pipe = ChatterboxFamilyHandler.load_model(
        "chatterbox", {"tiny": True}, init_random=True)
    rng = np.random.default_rng(7)
    ref = rng.standard_normal(4000).astype(np.float32) * 0.2
    out = ChatterboxFamilyHandler.generate_audio(
        pipe, {"prompt": "hello world", "duration_seconds": 1,
               "temperature": 0.8, "audio_guide": ref}, seed=3)
    assert out["sample_rate"] == pipe.s3gen.cfg.sample_rate
    assert out["audio"].ndim == 1 and out["audio"].size > 0
    assert np.isfinite(out["audio"]).all()


def test_chatterbox_registered():
    from wan2gp_tpu.families import build_handler_map
    handlers = build_handler_map()
    assert "chatterbox" in handlers
    assert "chatterbox_multilingual" in handlers


def test_service_chatterbox_end_to_end(tmp_path, monkeypatch):
    """chatterbox through the GenerationService: prompt -> WAV."""
    from wan2gp_tpu.families import tts_chatterbox as mod
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.utils.media import read_wav

    def shim(full):
        return type("Shim", (), {"__new__": lambda c: full.tiny(),
                                 "tiny": staticmethod(full.tiny)})

    monkeypatch.setattr(mod, "T3Config", shim(T3Config))
    monkeypatch.setattr(mod, "VoiceEncConfig", shim(VoiceEncConfig))
    monkeypatch.setattr(mod, "S3GenConfig", shim(S.S3GenConfig))
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True)
    paths = svc.generate({"model_type": "chatterbox",
                          "prompt": "hello tpu",
                          "duration_seconds": 0.5, "temperature": 0,
                          "seed": 5})
    assert paths and paths[0].endswith(".wav")
    wav, sr = read_wav(paths[0])
    assert sr == 24000 and wav.shape[0] > 0
