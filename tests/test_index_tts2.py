"""IndexTTS-2 tests: torch oracle for the GPT-2 block + ConvNeXt
(Vocos) block, RepCodec VQ round-trip, emotion-vector plumbing, and
the full pipeline (reference models/TTS/index_tts2/).
"""
import dataclasses
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.index_tts2 import (
    IndexGPTConfig, RepCodecConfig, init_unified_voice, init_repcodec,
    repcodec_encode, repcodec_vq2emb, repcodec_decode,
    get_speaker_conditioning, get_emo_vector, emo_vector_from_weights,
    unified_voice_generate, init_perceiver, perceiver_pool,
    _gpt_block, _convnext, _init_convnext)
from wan2gp_tpu.families.tts_index2 import (IndexTTS2FamilyHandler,
                                            IndexTTS2Pipeline, EMOTIONS)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def gcfg():
    return IndexGPTConfig.tiny()


@pytest.fixture(scope="module")
def gpt(gcfg):
    return init_unified_voice(jax.random.PRNGKey(0), gcfg)


@pytest.fixture(scope="module")
def ccfg():
    return RepCodecConfig.tiny()


@pytest.fixture(scope="module")
def codec(ccfg):
    return init_repcodec(jax.random.PRNGKey(1), ccfg)


# -- GPT-2 block oracle -----------------------------------------------------

def test_gpt_block_matches_torch(gcfg, gpt):
    bp = jax.tree.map(lambda a: a[0], gpt["blocks"])
    d = gcfg.dim
    x = np.random.default_rng(0).standard_normal((1, 6, d)) \
        .astype(np.float32)
    n = 6
    bias = jnp.where(jnp.tril(jnp.ones((n, n), bool))[None, None],
                     0.0, jnp.finfo(jnp.float32).min)
    ours = _gpt_block(jnp.asarray(x), bp, gcfg, bias)

    # torch GPT-2 style block with the same weights
    def t(a):
        return torch.from_numpy(_np(a).astype(np.float32))

    xt = torch.from_numpy(x)
    ln1 = torch.nn.functional.layer_norm(
        xt, (d,), t(bp["ln1"]["w"]), t(bp["ln1"]["b"]), gcfg.eps)
    q = ln1 @ t(bp["q"]["w"]) + t(bp["q"]["b"])
    k = ln1 @ t(bp["k"]["w"]) + t(bp["k"]["b"])
    v = ln1 @ t(bp["v"]["w"]) + t(bp["v"]["b"])
    heads, hd = gcfg.heads, d // gcfg.heads
    q = q.view(1, n, heads, hd).transpose(1, 2)
    k = k.view(1, n, heads, hd).transpose(1, 2)
    v = v.view(1, n, heads, hd).transpose(1, 2)
    s = q @ k.transpose(-1, -2) / math.sqrt(hd)
    mask = torch.tril(torch.ones(n, n, dtype=torch.bool))
    s = s.masked_fill(~mask, float("-inf"))
    o = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(1, n, d)
    xt2 = xt + o @ t(bp["o"]["w"]) + t(bp["o"]["b"])
    ln2 = torch.nn.functional.layer_norm(
        xt2, (d,), t(bp["ln2"]["w"]), t(bp["ln2"]["b"]), gcfg.eps)
    h = torch.nn.functional.gelu(ln2 @ t(bp["fc"]["w"])
                                 + t(bp["fc"]["b"]))
    ref = xt2 + h @ t(bp["proj"]["w"]) + t(bp["proj"]["b"])
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=2e-4,
                               rtol=1e-3)


def test_convnext_matches_torch(ccfg):
    bp = _init_convnext(jax.random.PRNGKey(3), ccfg, jnp.float32)
    d = ccfg.vocos_dim
    x = np.random.default_rng(1).standard_normal((2, 9, d)) \
        .astype(np.float32)

    def t(a):
        return torch.from_numpy(_np(a).astype(np.float32))

    xt = torch.from_numpy(x.transpose(0, 2, 1))   # [B, C, T]
    dw = torch.nn.functional.conv1d(
        torch.nn.functional.pad(xt, (3, 3)),
        t(bp["dw"]["w"]).permute(2, 1, 0), t(bp["dw"]["b"]), groups=d)
    h = dw.transpose(1, 2)
    h = torch.nn.functional.layer_norm(h, (d,), t(bp["norm"]["w"]),
                                       t(bp["norm"]["b"]), 1e-5)
    h = torch.nn.functional.gelu(h @ t(bp["pw1"]["w"])
                                 + t(bp["pw1"]["b"]))
    h = h @ t(bp["pw2"]["w"]) + t(bp["pw2"]["b"])
    ref = torch.from_numpy(x) + h * t(bp["gamma"])
    ours = _convnext(jnp.asarray(x), bp)
    np.testing.assert_allclose(_np(ours), ref.numpy(), atol=1e-4,
                               rtol=1e-3)


# -- RepCodec ---------------------------------------------------------------

def test_repcodec_roundtrip(ccfg, codec):
    feats = jax.random.normal(jax.random.PRNGKey(2),
                              (2, 11, ccfg.hidden))
    codes = repcodec_encode(codec, ccfg, feats)
    assert codes.shape == (2, 11)
    assert int(_np(codes).min()) >= 0
    assert int(_np(codes).max()) < ccfg.codebook_size
    emb = repcodec_vq2emb(codec, ccfg, codes)
    assert emb.shape == (2, 11, ccfg.hidden)
    rec = repcodec_decode(codec, ccfg, codes)
    assert rec.shape == feats.shape
    assert np.isfinite(_np(rec)).all()


def test_repcodec_codes_deterministic(ccfg, codec):
    feats = jax.random.normal(jax.random.PRNGKey(4),
                              (1, 7, ccfg.hidden))
    c1 = repcodec_encode(codec, ccfg, feats)
    c2 = repcodec_encode(codec, ccfg, feats)
    np.testing.assert_array_equal(_np(c1), _np(c2))


# -- conditioning -----------------------------------------------------------

def test_speaker_conditioning_shape(gcfg, gpt):
    feats = jax.random.normal(jax.random.PRNGKey(5),
                              (1, 20, gcfg.w2v_dim))
    cond = get_speaker_conditioning(gpt, gcfg, feats)
    assert cond.shape == (1, gcfg.cond_latents, gcfg.dim)
    emo = get_emo_vector(gpt, gcfg, feats)
    assert emo.shape == (1, gcfg.w2v_dim)


def test_emo_vector_from_weights(gcfg, gpt):
    v1 = emo_vector_from_weights(gpt, gcfg, [1, 0, 0, 0, 0, 0, 0, 0])
    v2 = emo_vector_from_weights(gpt, gcfg, [0, 1, 0, 0, 0, 0, 0, 0])
    assert v1.shape == (1, gcfg.w2v_dim)
    assert float(jnp.abs(v1 - v2).max()) > 1e-6
    # linearity: blend of the two
    vm = emo_vector_from_weights(gpt, gcfg,
                                 [0.5, 0.5, 0, 0, 0, 0, 0, 0])
    np.testing.assert_allclose(_np(vm), _np(0.5 * (v1 + v2)),
                               atol=1e-5)


def test_perceiver_pool_shapes():
    p = init_perceiver(jax.random.PRNGKey(6), 4, 16, 24, heads=2)
    out = perceiver_pool(p, jnp.zeros((3, 9, 24)))
    assert out.shape == (3, 4, 16)


# -- GPT generation ---------------------------------------------------------

def test_unified_voice_generate(gcfg, gpt):
    feats = jax.random.normal(jax.random.PRNGKey(7),
                              (1, 16, gcfg.w2v_dim))
    cond = get_speaker_conditioning(gpt, gcfg, feats)
    emo = get_emo_vector(gpt, gcfg, feats)
    ids = jnp.asarray([[5, 6, 7, 8]])
    codes, valid, lats = unified_voice_generate(
        gpt, gcfg, ids, cond, emo, max_new_tokens=10,
        temperature=0.0)
    assert codes.shape == (10,) and lats.shape == (10, gcfg.dim)
    c = _np(codes)
    assert ((c >= 0) & (c < gcfg.mel_vocab)).all()
    assert not (c == gcfg.start_mel_token).any()
    # after a stop, everything is stop
    stops = c == gcfg.stop_mel_token
    if stops.any():
        first = int(np.argmax(stops))
        assert (c[first:] == gcfg.stop_mel_token).all()
        assert not _np(valid)[first:].any()


# -- pipeline ---------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pipe():
    return IndexTTS2FamilyHandler.load_model("index_tts2",
                                             {"tiny": True})


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    m = build_handler_map()
    assert m["index_tts2"] is IndexTTS2FamilyHandler
    d = IndexTTS2FamilyHandler.query_model_def("index_tts2", {})
    assert d["audio_only"]
    assert "emo_alpha" in d["custom_settings"]


def test_pipeline_generate(tiny_pipe):
    sr = tiny_pipe.sample_rate
    ref = (np.sin(2 * np.pi * 220 * np.arange(sr) / sr)
           * 0.3).astype(np.float32)
    out = IndexTTS2FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "Hello world",
                    "duration_seconds": 0.5, "audio_guide": ref,
                    "num_inference_steps": 2}, seed=0)
    assert out["sample_rate"] == sr
    assert out["audio"].ndim == 1 and out["audio"].size > 0
    assert np.isfinite(out["audio"]).all()
    assert out["n_codes"] >= 1


def test_pipeline_emotion_paths(tiny_pipe):
    sr = tiny_pipe.sample_rate
    ref = np.random.default_rng(0).standard_normal(sr) \
        .astype(np.float32) * 0.1
    # 8-vector emotion
    out = IndexTTS2FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "Angry now", "duration_seconds": 0.3,
                    "audio_guide": ref, "num_inference_steps": 2,
                    "custom_settings": {"emo_angry": 1.0}}, seed=1)
    assert np.isfinite(out["audio"]).all()
    # text-described emotion via the qwen-emo stub
    w = IndexTTS2Pipeline._qwen_emo_stub("very sad and melancholic")
    assert w[EMOTIONS.index("sad")] > 0
    assert abs(w.sum() - 1.0) < 1e-6
    out2 = IndexTTS2FamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "So sad", "duration_seconds": 0.3,
                    "audio_guide": ref, "num_inference_steps": 2,
                    "custom_settings": {"emo_text": "sad whisper",
                                        "emo_alpha": 0.6}}, seed=2)
    assert np.isfinite(out2["audio"]).all()


# -- checkpoint round trip (io/index_tts2_checkpoint.py) --------------------

def test_unified_voice_checkpoint_roundtrip(gcfg, gpt):
    from wan2gp_tpu.io.index_tts2_checkpoint import (
        load_unified_voice_params, export_unified_voice_state)
    sd = export_unified_voice_state(gpt, gcfg)
    p1, leftover = load_unified_voice_params(sd, gcfg,
                                             base_params=gpt,
                                             dtype=jnp.float32)
    assert leftover == []
    feats = jax.random.normal(jax.random.PRNGKey(20),
                              (1, 10, gcfg.w2v_dim))
    cond = get_speaker_conditioning(gpt, gcfg, feats)
    emo = get_emo_vector(gpt, gcfg, feats)
    ids = jnp.asarray([[3, 4, 5]])
    c0, v0, l0 = unified_voice_generate(gpt, gcfg, ids, cond, emo,
                                        max_new_tokens=6,
                                        temperature=0.0)
    c1, v1, l1 = unified_voice_generate(p1, gcfg, ids, cond, emo,
                                        max_new_tokens=6,
                                        temperature=0.0)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(l0), np.asarray(l1),
                               atol=1e-5)
