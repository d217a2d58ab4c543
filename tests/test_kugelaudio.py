"""KugelAudio tests: streaming-vs-full tokenizer equivalence (the TPU
replacement for the reference streaming cache,
models/TTS/kugelaudio/models/tokenizer.py:183-246), torch oracles for
the conv primitives and diffusion-head layer, DPM schedule properties,
and the generation loop + handler e2e.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from wan2gp_tpu.models.tts.kugel_tokenizer import (
    KugelTokenizerConfig, init_kugel_encoder, init_kugel_decoder,
    kugel_encode, kugel_decode, decoder_stream_init,
    encoder_stream_init, kugel_decode_step, kugel_encode_step,
    causal_conv, causal_conv_transpose)
from wan2gp_tpu.models.tts.kugelaudio import (
    KugelConfig, init_kugelaudio, init_diffusion_head, diffusion_head,
    make_dpm_schedule, sample_speech_latents, kugelaudio_generate,
    assemble_audio, encode_voice_prompt, _cosine_alphas_cumprod)
from wan2gp_tpu.families.tts_kugelaudio import (
    KugelAudioFamilyHandler, split_text_segments)

torch = pytest.importorskip("torch")


def _np(x):
    return np.asarray(x)


@pytest.fixture(scope="module")
def tok_cfg():
    return KugelTokenizerConfig.tiny()


@pytest.fixture(scope="module")
def codec(tok_cfg):
    return (init_kugel_encoder(jax.random.PRNGKey(1), tok_cfg),
            init_kugel_decoder(jax.random.PRNGKey(2), tok_cfg))


# -- conv primitives vs torch (conv_layers.py SConv1d causal) ---------------

def test_causal_conv_matches_torch():
    k, s, cin, cout, t = 8, 4, 3, 5, 16
    rng = np.random.default_rng(0)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((2, t, cin)).astype(np.float32)

    conv = torch.nn.Conv1d(cin, cout, k, stride=s)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(2, 1, 0)))
        conv.bias.copy_(torch.from_numpy(b))
        xt = torch.nn.functional.pad(
            torch.from_numpy(x.transpose(0, 2, 1)), (k - s, 0))
        ref = conv(xt).numpy().transpose(0, 2, 1)

    ours = causal_conv(jnp.asarray(x), {"w": jnp.asarray(w),
                                        "b": jnp.asarray(b)}, s)
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5, rtol=1e-4)


def test_causal_conv_transpose_matches_torch():
    k, s, cin, cout, t = 8, 4, 3, 5, 6
    rng = np.random.default_rng(1)
    w = rng.standard_normal((k, cin, cout)).astype(np.float32) * 0.2
    b = rng.standard_normal(cout).astype(np.float32) * 0.1
    x = rng.standard_normal((2, t, cin)).astype(np.float32)

    conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(w.transpose(1, 2, 0)))
        conv.bias.copy_(torch.from_numpy(b))
        full = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()
        ref = full.transpose(0, 2, 1)[:, :t * s]  # trim right k-s

    ours = causal_conv_transpose(
        jnp.asarray(x), {"w": jnp.asarray(w), "b": jnp.asarray(b)}, s)
    np.testing.assert_allclose(_np(ours), ref, atol=1e-5, rtol=1e-4)


# -- streaming == full ------------------------------------------------------

def test_decoder_streaming_matches_full(tok_cfg, codec):
    enc, dec = codec
    n = 5
    lat = jax.random.normal(jax.random.PRNGKey(3),
                            (2, n, tok_cfg.vae_dim))
    full = kugel_decode(dec, tok_cfg, lat)
    st = decoder_stream_init(dec, 2)
    outs = []
    for i in range(n):
        st, y = kugel_decode_step(st, dec, tok_cfg, lat[:, i:i + 1])
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(_np(stream), _np(full), atol=1e-5)


def test_encoder_streaming_matches_full(tok_cfg, codec):
    enc, dec = codec
    n = 5
    audio = jax.random.normal(jax.random.PRNGKey(4),
                              (2, n * tok_cfg.hop, 1)) * 0.3
    full = kugel_encode(enc, tok_cfg, audio)
    st = encoder_stream_init(enc, tok_cfg, 2)
    outs = []
    for i in range(n):
        st, y = kugel_encode_step(
            st, enc, tok_cfg,
            audio[:, i * tok_cfg.hop:(i + 1) * tok_cfg.hop])
        outs.append(y)
    stream = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(_np(stream), _np(full), atol=1e-5)


def test_codec_shapes(tok_cfg, codec):
    enc, dec = codec
    audio = jnp.zeros((1, 4 * tok_cfg.hop, 1))
    lat = kugel_encode(enc, tok_cfg, audio)
    assert lat.shape == (1, 4, tok_cfg.vae_dim)
    rec = kugel_decode(dec, tok_cfg, lat)
    assert rec.shape == (1, 4 * tok_cfg.hop, 1)


# -- diffusion head oracle (diffusion_head.py:127-161 HeadLayer) ------------

def test_head_layer_matches_torch():
    cfg = KugelConfig.tiny()
    p = init_diffusion_head(jax.random.PRNGKey(0), cfg)
    # make adaLN non-zero so the test is not trivial
    d = cfg.dim
    rng = np.random.default_rng(2)
    ada = rng.standard_normal((d, 3 * d)).astype(np.float32) * 0.1
    p["layers"]["ada"]["w"] = jnp.asarray(
        np.stack([ada] * cfg.head_layers))

    x = rng.standard_normal((3, cfg.vae_dim)).astype(np.float32)
    t = np.asarray([5.0, 100.0, 900.0], np.float32)
    c = rng.standard_normal((3, d)).astype(np.float32)
    out = diffusion_head(p, cfg, jnp.asarray(x), jnp.asarray(t),
                         jnp.asarray(c))
    assert out.shape == (3, cfg.vae_dim)
    assert np.isfinite(_np(out)).all()

    # torch oracle of one head layer: x + gate*ffn(modulate(rms(x)))
    lp = jax.tree.map(lambda a: _np(a)[0], p["layers"])
    xt = torch.from_numpy(_np(jnp.asarray(x) @ p["x_proj"]["w"]))
    temb = _np(jax.nn.silu(jnp.asarray(
        _np(jnp.asarray(np.concatenate(
            [np.cos(t[:, None] * _freqs(cfg)),
             np.sin(t[:, None] * _freqs(cfg))], -1)) @ p["t1"]["w"]))))
    cond = torch.from_numpy(_np(jnp.asarray(c) @ p["cond_proj"]["w"])
                            + temb @ _np(p["t2"]["w"]))
    adat = torch.nn.functional.silu(cond) @ torch.from_numpy(lp["ada"]["w"])
    sh, sc, gt = adat.chunk(3, dim=-1)
    xn = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + 1e-5) \
        * torch.from_numpy(lp["norm"])
    y = xn * (1 + sc) + sh
    h = torch.nn.functional.silu(y @ torch.from_numpy(lp["gate"]["w"])) \
        * (y @ torch.from_numpy(lp["up"]["w"]))
    ref1 = xt + gt * (h @ torch.from_numpy(lp["down"]["w"]))

    # ours: replicate a single-layer head
    import dataclasses
    cfg1 = dataclasses.replace(cfg, head_layers=1)
    p1 = dict(p, layers=jax.tree.map(lambda a: a[:1], p["layers"]),
              final_ada=p["final_ada"], final=p["final"])
    # compare through the public forward by zeroing the final layer
    # modulation: final output = rms(x)*1+0 @ 0 = 0 unless we read the
    # intermediate; instead verify the layer math directly in jax
    from wan2gp_tpu.models.tts.kugelaudio import _rms, _dense
    ada_j = _dense(jax.nn.silu(jnp.asarray(cond.numpy())),
                   {"w": jnp.asarray(lp["ada"]["w"])})
    shj, scj, gtj = jnp.split(ada_j, 3, axis=-1)
    yj = _rms(jnp.asarray(xt.numpy()), jnp.asarray(lp["norm"]),
              1e-5) * (1 + scj) + shj
    hj = jax.nn.silu(yj @ jnp.asarray(lp["gate"]["w"])) \
        * (yj @ jnp.asarray(lp["up"]["w"]))
    ours1 = jnp.asarray(xt.numpy()) + gtj * (
        hj @ jnp.asarray(lp["down"]["w"]))
    np.testing.assert_allclose(_np(ours1), ref1.numpy(), atol=1e-4,
                               rtol=1e-4)


def _freqs(cfg):
    half = cfg.t_features // 2
    return np.exp(-math.log(10000.0) * np.arange(half) / half) \
        .astype(np.float32)


# -- DDPM schedule ----------------------------------------------------------

def test_cosine_alphas_monotone():
    ac = _cosine_alphas_cumprod(1000)
    assert ac[0] > 0.99 and ac[-1] < 0.01
    assert np.all(np.diff(ac) < 0)


def test_dpm_schedule_shapes():
    cfg = KugelConfig.tiny()
    ts, a, s, lam = make_dpm_schedule(cfg, 10)
    assert ts.shape == (10,)
    assert float(ts[0]) > float(ts[-1])       # high noise first
    assert np.all(np.diff(_np(lam)) > 0)      # lambda increases


def test_sampler_contracts_toward_x0():
    """With a head that predicts exact v for x0=target, the sampler
    should land near target."""
    cfg = KugelConfig.tiny()
    target = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, cfg.vae_dim)),
        jnp.float32) * 0.5
    ts, a, s, lam = make_dpm_schedule(cfg, 24)
    sched = (ts, a, s, lam)

    import wan2gp_tpu.models.tts.kugelaudio as K
    orig = K.diffusion_head

    def fake(params, c, x, t, cond):
        # exact v for known x0: x = alpha*x0 + sigma*eps ->
        # eps = (x - alpha*x0)/sigma; v = alpha*eps - sigma*x0
        i = jnp.argmin(jnp.abs(ts - t[0]))
        al, sg = a[i], s[i]
        eps = (x - al * target) / jnp.maximum(sg, 1e-6)
        return al * eps - sg * target
    K.diffusion_head = fake
    try:
        out = sample_speech_latents({}, cfg, jnp.zeros((1, cfg.dim)),
                                    None, 1.0, sched,
                                    jax.random.PRNGKey(0))
    finally:
        K.diffusion_head = orig
    err = float(jnp.abs(out - target).max())
    assert err < 0.15, err


# -- generation loop --------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_pipe():
    return KugelAudioFamilyHandler.load_model("kugelaudio",
                                              {"tiny": True})


def test_generate_loop_runs(tiny_pipe):
    cfg, tok_cfg = tiny_pipe.cfg, tiny_pipe.tok_cfg
    ids = jnp.asarray([[5, 6, 7, cfg.speech_start_id]])
    out = kugelaudio_generate(tiny_pipe.params, cfg, tok_cfg, ids,
                              cfg_scale=2.0, max_new_tokens=6,
                              ddpm_steps=4)
    assert out["tokens"].shape == (6,)
    assert set(np.unique(_np(out["tokens"]))) <= {
        cfg.speech_start_id, cfg.speech_end_id,
        cfg.speech_diffusion_id, cfg.eos_id}
    audio = assemble_audio(out)
    n_frames = int(_np(out["frame_mask"]).sum())
    assert audio.shape == (n_frames * tok_cfg.hop,)
    assert np.isfinite(audio).all()


def test_finished_forces_eos(tiny_pipe):
    cfg, tok_cfg = tiny_pipe.cfg, tiny_pipe.tok_cfg
    ids = jnp.asarray([[5, cfg.speech_start_id]])
    out = kugelaudio_generate(tiny_pipe.params, cfg, tok_cfg, ids,
                              cfg_scale=1.0, max_new_tokens=8,
                              ddpm_steps=2)
    toks = _np(out["tokens"])
    stops = np.isin(toks, [cfg.eos_id, cfg.speech_end_id])
    if stops.any():
        first = int(np.argmax(stops))
        # every token after the first stop is eos, no frames emitted
        assert np.all(toks[first + 1:] == cfg.eos_id)
        assert not _np(out["frame_mask"])[first + 1:].any()


def test_voice_prompt_path(tiny_pipe):
    cfg, tok_cfg = tiny_pipe.cfg, tiny_pipe.tok_cfg
    wav = jnp.asarray(np.random.default_rng(0).standard_normal(
        (1, tok_cfg.hop * 3)) * 0.1, jnp.float32)
    emb, ac = encode_voice_prompt(tiny_pipe.params, cfg, tok_cfg, wav,
                                  jax.random.PRNGKey(1))
    assert emb.shape == (1, 3, cfg.dim)
    assert ac.shape == (1, 3, tok_cfg.vae_dim)


# -- handler ----------------------------------------------------------------

def test_split_text_segments():
    segs = split_text_segments("Hello there.\n\nSecond paragraph.")
    assert segs == ["Hello there.", "Second paragraph."]
    segs = split_text_segments(" ".join(["word"] * 100),
                               auto_split_every_s=5.0)
    assert len(segs) > 1


def test_handler_registered():
    from wan2gp_tpu.families import build_handler_map
    m = build_handler_map()
    assert m["kugelaudio"] is KugelAudioFamilyHandler
    d = KugelAudioFamilyHandler.query_model_def("kugelaudio", {})
    assert d["audio_only"] and d["duration_slider"]["max"] == 600


def test_handler_generate_audio(tiny_pipe):
    out = KugelAudioFamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "Hello world", "duration_seconds": 0.05,
                    "guidance_scale": 2.0, "num_inference_steps": 3},
        seed=0)
    assert out["sample_rate"] == tiny_pipe.tok_cfg.sample_rate
    assert np.isfinite(out["audio"]).all()


def test_handler_voice_clone(tiny_pipe):
    sr = tiny_pipe.tok_cfg.sample_rate
    voice = np.random.default_rng(1).standard_normal(
        (tiny_pipe.tok_cfg.hop * 4,)).astype(np.float32) * 0.2
    out = KugelAudioFamilyHandler.generate_audio(
        tiny_pipe, {"prompt": "Clone me", "duration_seconds": 0.05,
                    "audio_guide": voice, "guidance_scale": 1.0,
                    "num_inference_steps": 2}, seed=1)
    assert np.isfinite(out["audio"]).all()
    # calibration happened: scaling is no longer exactly 1
    assert abs(float(tiny_pipe.params["scaling"]) - 1.0) > 1e-6


# -- checkpoint round trip (io/kugelaudio_checkpoint.py) --------------------

def test_kugelaudio_checkpoint_roundtrip(tiny_pipe):
    from wan2gp_tpu.io.kugelaudio_checkpoint import (
        load_kugelaudio_params, export_kugelaudio_state)
    cfg, tok_cfg = tiny_pipe.cfg, tiny_pipe.tok_cfg
    p0 = tiny_pipe.params
    sd = export_kugelaudio_state(p0, cfg, tok_cfg)
    p1, leftover = load_kugelaudio_params(sd, cfg, tok_cfg,
                                          dtype=jnp.float32)
    assert leftover == []
    # codec equality
    audio = jax.random.normal(jax.random.PRNGKey(9),
                              (1, tok_cfg.hop * 2, 1)) * 0.2
    a = kugel_encode(p0["acoustic_enc"], tok_cfg, audio)
    b = kugel_encode(p1["acoustic_enc"], tok_cfg, audio)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-5)
    lat = jax.random.normal(jax.random.PRNGKey(10),
                            (1, 3, tok_cfg.vae_dim))
    a = kugel_decode(p0["acoustic_dec"], tok_cfg, lat)
    b = kugel_decode(p1["acoustic_dec"], tok_cfg, lat)
    np.testing.assert_allclose(_np(a), _np(b), atol=1e-5)
    # full generation equality through loaded weights
    ids = jnp.asarray([[5, 6, cfg.speech_start_id]])
    o0 = kugelaudio_generate(p0, cfg, tok_cfg, ids, cfg_scale=1.0,
                             max_new_tokens=4, ddpm_steps=2)
    o1 = kugelaudio_generate(p1, cfg, tok_cfg, ids, cfg_scale=1.0,
                             max_new_tokens=4, ddpm_steps=2)
    np.testing.assert_array_equal(_np(o0["tokens"]), _np(o1["tokens"]))
    np.testing.assert_allclose(_np(o0["audio_chunks"]),
                               _np(o1["audio_chunks"]), atol=1e-5)
