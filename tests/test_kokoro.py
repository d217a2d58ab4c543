"""Kokoro-82M (StyleTTS2) TTS pieces vs torch oracles
(reference preprocessing/kokoro/)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from wan2gp_tpu.preprocessing import kokoro as K

TINY = K.KokoroConfig(
    n_token=20, hidden_dim=32, style_dim=16, n_layer=2, max_dur=10,
    plbert_hidden=24, plbert_heads=4, plbert_ffn=48, plbert_layers=2,
    plbert_max_pos=64, plbert_embedding=12,
    upsample_initial_channel=24, upsample_rates=(4, 3),
    decoder_hidden=48, asr_res_ch=8,
    upsample_kernel_sizes=(8, 6), gen_istft_n_fft=8,
    gen_istft_hop_size=2)


def test_bilstm_vs_torch():
    rng = np.random.default_rng(0)
    p = {k: jnp.asarray(rng.normal(size=s).astype(np.float32) * 0.2)
         for k, s in [("w_ih", (16, 6)), ("w_hh", (16, 4)),
                      ("b_ih", (16,)), ("b_hh", (16,)),
                      ("w_ih_r", (16, 6)), ("w_hh_r", (16, 4)),
                      ("b_ih_r", (16,)), ("b_hh_r", (16,))]}
    x = rng.normal(size=(2, 5, 6)).astype(np.float32)
    got = np.asarray(K._bilstm(p, jnp.asarray(x)))
    lstm = nn.LSTM(6, 4, 1, batch_first=True, bidirectional=True)
    with torch.no_grad():
        lstm.weight_ih_l0.copy_(torch.from_numpy(np.asarray(p["w_ih"])))
        lstm.weight_hh_l0.copy_(torch.from_numpy(np.asarray(p["w_hh"])))
        lstm.bias_ih_l0.copy_(torch.from_numpy(np.asarray(p["b_ih"])))
        lstm.bias_hh_l0.copy_(torch.from_numpy(np.asarray(p["b_hh"])))
        lstm.weight_ih_l0_reverse.copy_(torch.from_numpy(
            np.asarray(p["w_ih_r"])))
        lstm.weight_hh_l0_reverse.copy_(torch.from_numpy(
            np.asarray(p["w_hh_r"])))
        lstm.bias_ih_l0_reverse.copy_(torch.from_numpy(
            np.asarray(p["b_ih_r"])))
        lstm.bias_hh_l0_reverse.copy_(torch.from_numpy(
            np.asarray(p["b_hh_r"])))
        ref, _ = lstm(torch.from_numpy(x))
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)


def test_adain_and_stft_vs_torch():
    rng = np.random.default_rng(1)
    # AdaIN1d == (1+gamma)*InstanceNorm1d(affine) + beta
    p = {"fc": {"w": jnp.asarray(rng.normal(size=(8, 12)).astype(
            np.float32)), "b": jnp.zeros((12,))},
         "norm_w": jnp.asarray(rng.normal(size=(6,)).astype(np.float32)),
         "norm_b": jnp.asarray(rng.normal(size=(6,)).astype(np.float32))}
    x = rng.normal(size=(2, 6, 9)).astype(np.float32)
    s = rng.normal(size=(2, 8)).astype(np.float32)
    got = np.asarray(K._adain(p, jnp.asarray(x), jnp.asarray(s)))
    inorm = nn.InstanceNorm1d(6, affine=True)
    with torch.no_grad():
        inorm.weight.copy_(torch.from_numpy(np.asarray(p["norm_w"])))
        inorm.bias.copy_(torch.from_numpy(np.asarray(p["norm_b"])))
        h = torch.from_numpy(s) @ torch.from_numpy(np.asarray(
            p["fc"]["w"]))
        gm, bt = h.view(2, 12, 1).chunk(2, dim=1)
        ref = (1 + gm) * inorm(torch.from_numpy(x)) + bt
    np.testing.assert_allclose(got, ref.numpy(), rtol=1e-4, atol=1e-5)
    # STFT roundtrip vs torch.stft/istft
    wav = rng.normal(size=(1, 64)).astype(np.float32)
    mag, ph = K.stft_transform(jnp.asarray(wav), 8, 2)
    win = torch.hann_window(8, periodic=True)
    spec = torch.stft(torch.from_numpy(wav), 8, 2, 8, window=win,
                      return_complex=True)
    np.testing.assert_allclose(np.asarray(mag), spec.abs().numpy(),
                               rtol=1e-4, atol=1e-5)
    rec = np.asarray(K.stft_inverse(mag, ph, 8, 2))
    ref_rec = torch.istft(spec, 8, 2, 8, window=win).numpy()
    n = min(rec.shape[-1], ref_rec.shape[-1])
    np.testing.assert_allclose(rec[:, :n], ref_rec[:, :n], rtol=1e-3,
                               atol=1e-4)
    # linear interpolation matches F.interpolate(align_corners=False)
    z = rng.normal(size=(1, 3, 12)).astype(np.float32)
    got_i = np.asarray(K._interp_linear(jnp.asarray(z), 5))
    ref_i = F.interpolate(torch.from_numpy(z), size=5,
                          mode="linear").numpy()
    np.testing.assert_allclose(got_i, ref_i, rtol=1e-4, atol=1e-5)


def test_albert_vs_transformers():
    from transformers import AlbertModel, AlbertConfig
    cfg = TINY
    params = K.init_kokoro(jax.random.key(0), cfg)
    ac = AlbertConfig(
        vocab_size=cfg.n_token, embedding_size=cfg.plbert_embedding,
        hidden_size=cfg.plbert_hidden,
        num_attention_heads=cfg.plbert_heads,
        intermediate_size=cfg.plbert_ffn,
        num_hidden_layers=cfg.plbert_layers,
        max_position_embeddings=cfg.plbert_max_pos,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    model = AlbertModel(ac).eval()
    b = params["bert"]
    lay = model.encoder.albert_layer_groups[0].albert_layers[0]
    with torch.no_grad():
        model.embeddings.word_embeddings.weight.copy_(
            torch.from_numpy(np.asarray(b["word_emb"])))
        model.embeddings.position_embeddings.weight.copy_(
            torch.from_numpy(np.asarray(b["pos_emb"])))
        model.embeddings.token_type_embeddings.weight.copy_(
            torch.from_numpy(np.asarray(b["type_emb"])))
        model.embeddings.LayerNorm.weight.copy_(
            torch.from_numpy(np.asarray(b["emb_ln_w"])))
        model.embeddings.LayerNorm.bias.copy_(
            torch.from_numpy(np.asarray(b["emb_ln_b"])))
        model.encoder.embedding_hidden_mapping_in.weight.copy_(
            torch.from_numpy(np.asarray(b["emb_map"]["w"]).T))
        model.encoder.embedding_hidden_mapping_in.bias.copy_(
            torch.from_numpy(np.asarray(b["emb_map"]["b"])))
        lp = b["layer"]
        for tname, ours in (("query", "q"), ("key", "k"),
                            ("value", "v"), ("dense", "o")):
            getattr(lay.attention, tname).weight.copy_(
                torch.from_numpy(np.asarray(lp[ours]["w"]).T))
            getattr(lay.attention, tname).bias.copy_(
                torch.from_numpy(np.asarray(lp[ours]["b"])))
        lay.attention.LayerNorm.weight.copy_(torch.from_numpy(
            np.asarray(lp["attn_ln_w"])))
        lay.attention.LayerNorm.bias.copy_(torch.from_numpy(
            np.asarray(lp["attn_ln_b"])))
        lay.ffn.weight.copy_(torch.from_numpy(
            np.asarray(lp["ffn"]["w"]).T))
        lay.ffn.bias.copy_(torch.from_numpy(np.asarray(lp["ffn"]["b"])))
        lay.ffn_output.weight.copy_(torch.from_numpy(
            np.asarray(lp["ffn_out"]["w"]).T))
        lay.ffn_output.bias.copy_(torch.from_numpy(
            np.asarray(lp["ffn_out"]["b"])))
        lay.full_layer_layer_norm.weight.copy_(torch.from_numpy(
            np.asarray(lp["ffn_ln_w"])))
        lay.full_layer_layer_norm.bias.copy_(torch.from_numpy(
            np.asarray(lp["ffn_ln_b"])))
    ids = np.asarray([[0, 3, 7, 2, 0]])
    got = np.asarray(K.albert_forward(b, cfg, jnp.asarray(ids)))
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    attention_mask=torch.ones(1, 5,
                                              dtype=torch.long)
                    ).last_hidden_state.numpy()
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_kokoro_forward_smoke_and_loader_shapes():
    cfg = TINY
    params = K.init_kokoro(jax.random.key(1), cfg)
    ids = np.asarray([[0, 5, 9, 3, 11, 0]])
    ref_s = np.random.default_rng(2).normal(
        size=(1, 2 * cfg.style_dim)).astype(np.float32) * 0.1
    audio, dur = K.kokoro_forward(params, cfg, ids, ref_s, seed=0)
    # hop per frame: prod(upsample_rates) * istft hop = 24 samples/frame
    assert dur.shape == (6,)
    up = int(np.prod(cfg.upsample_rates)) * cfg.gen_istft_hop_size
    assert audio.ndim == 1 and audio.shape[0] >= dur.sum() * up // 2
    assert np.isfinite(audio).all()
    # speed scales predicted duration down
    _, dur_fast = K.kokoro_forward(params, cfg, ids, ref_s, speed=2.0,
                                   seed=0)
    assert dur_fast.sum() <= dur.sum()
    # vocab mapping
    ids2 = K.phonemes_to_ids("abc", {"a": 1, "b": 2, "c": 3})
    np.testing.assert_array_equal(ids2, [[0, 1, 2, 3, 0]])
