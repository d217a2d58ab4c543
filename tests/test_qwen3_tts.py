"""Qwen3-TTS tests: talker generation loop, code predictor MTP, codec
decoder shapes, causal conv oracles, loader roundtrip, service e2e."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.models.tts.qwen3_tts import (
    TalkerConfig, CodePredictorConfig, CodecDecoderConfig, init_talker,
    init_codec_decoder, talker_generate, codec_decode, _causal_conv1d,
    _causal_tconv1d, _snake_beta)

TINY = TalkerConfig(vocab_size=40, hidden_size=16, intermediate_size=32,
                    n_layers=2, n_heads=2, n_kv_heads=1, head_dim=8,
                    num_code_groups=4, text_vocab_size=64,
                    text_hidden_size=12, codec_eos_token_id=38,
                    codec_pad_id=36, codec_bos_id=37)
TINY_P = CodePredictorConfig(vocab_size=32, hidden_size=16,
                             intermediate_size=32, n_layers=2, n_heads=2,
                             n_kv_heads=2, head_dim=8)
TINY_C = CodecDecoderConfig(codebook_size=32, codebook_dim=8,
                            hidden_size=16, latent_dim=16,
                            num_quantizers=4, n_heads=2, n_kv_heads=2,
                            head_dim=8, intermediate_size=32, n_layers=2,
                            sliding_window=4, upsample_rates=(2, 2),
                            upsampling_ratios=(2,), decoder_dim=16)


def test_causal_conv_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 9, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 4)).astype(np.float32) * 0.2
    b = rng.standard_normal(4).astype(np.float32)
    got = np.asarray(_causal_conv1d(jnp.asarray(x),
                                    {"w": jnp.asarray(w),
                                     "b": jnp.asarray(b)}, dilation=2))
    # reference CausalConvNet (tokenizer v2 :164-197), stride 1
    eff_k = (5 - 1) * 2 + 1
    pad = eff_k - 1
    tx = torch.tensor(x).permute(0, 2, 1)
    tx = F.pad(tx, (pad, 0))
    ref = F.conv1d(tx, torch.tensor(w).permute(2, 1, 0),
                   torch.tensor(b), dilation=2)
    np.testing.assert_allclose(got, ref.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_causal_tconv_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 6, 3)).astype(np.float32)
    tw = rng.standard_normal((3, 4, 4)).astype(np.float32) * 0.2  # [cin,cout,k]
    b = rng.standard_normal(4).astype(np.float32)
    wj = jnp.asarray(tw.transpose(2, 0, 1)[::-1].copy())
    got = np.asarray(_causal_tconv1d(jnp.asarray(x),
                                     {"w": wj, "b": jnp.asarray(b)},
                                     kernel=4, stride=2))
    ref = F.conv_transpose1d(torch.tensor(x).permute(0, 2, 1),
                             torch.tensor(tw), torch.tensor(b), stride=2)
    pad = 4 - 2
    ref = ref[..., pad:ref.shape[-1] - pad]
    np.testing.assert_allclose(got, ref.permute(0, 2, 1).numpy(),
                               rtol=1e-4, atol=1e-5)


def test_snake_beta_matches_reference_formula():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 3)).astype(np.float32)
    a = rng.standard_normal(3).astype(np.float32)
    b = rng.standard_normal(3).astype(np.float32)
    got = np.asarray(_snake_beta(jnp.asarray(x), jnp.asarray(a),
                                 jnp.asarray(b)))
    ea, eb = np.exp(a), np.exp(b)
    ref = x + (1.0 / (eb + 1e-9)) * np.sin(ea * x) ** 2
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_talker_generate_shapes_and_eos():
    params = init_talker(jax.random.key(0), TINY, TINY_P)
    ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 64, (1, 6)), jnp.int32)
    codes, valid = talker_generate(params, TINY, TINY_P, ids,
                                   max_frames=5)
    assert codes.shape == (1, 5, 4)
    assert valid.shape == (1, 5)
    assert codes.dtype == jnp.int32
    # group-0 codes live in the talker vocab; groups 1+ in predictor vocab
    assert int(codes[..., 1:].max()) < TINY_P.vocab_size


def test_talker_deterministic():
    params = init_talker(jax.random.key(0), TINY, TINY_P)
    ids = jnp.asarray([[1, 2, 3]], jnp.int32)
    c1, _ = talker_generate(params, TINY, TINY_P, ids, max_frames=3)
    c2, _ = talker_generate(params, TINY, TINY_P, ids, max_frames=3)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_codec_decode_shapes():
    params = init_codec_decoder(jax.random.key(0), TINY_C)
    codes = jnp.asarray(np.random.default_rng(0).integers(
        0, TINY_C.codebook_size, (1, 6, TINY_C.num_quantizers)), jnp.int32)
    wav = codec_decode(params, TINY_C, codes)
    total_up = int(np.prod(TINY_C.upsample_rates
                           + TINY_C.upsampling_ratios))
    # causal trans convs trim (k - stride) per decoder block
    assert wav.shape[0] == 1
    assert wav.shape[1] >= (6 - 2) * total_up // 2
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_talker_loader_roundtrip():
    from wan2gp_tpu.io.qwen3_tts_checkpoint import load_talker_params
    params = init_talker(jax.random.key(3), TINY, TINY_P)
    sd = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_layers(pre, stacked, n):
        for i in range(n):
            lp = jax.tree.map(lambda x: x[i], stacked)
            for tgt, src in (("self_attn.q_proj", "q"),
                             ("self_attn.k_proj", "k"),
                             ("self_attn.v_proj", "v"),
                             ("self_attn.o_proj", "o"),
                             ("mlp.gate_proj", "gate"),
                             ("mlp.up_proj", "up"),
                             ("mlp.down_proj", "down")):
                put_lin(f"{pre}.{i}.{tgt}", lp[src])
            sd[f"{pre}.{i}.input_layernorm.weight"] = np.asarray(
                lp["input_norm"])
            sd[f"{pre}.{i}.post_attention_layernorm.weight"] = np.asarray(
                lp["post_norm"])
            sd[f"{pre}.{i}.self_attn.q_norm.weight"] = np.asarray(
                lp["q_norm"])
            sd[f"{pre}.{i}.self_attn.k_norm.weight"] = np.asarray(
                lp["k_norm"])

    put_layers("talker.model.layers", params["layers"], TINY.n_layers)
    put_layers("talker.code_predictor.model.layers",
               params["predictor"]["layers"], TINY_P.n_layers)
    sd["talker.model.codec_embedding.weight"] = np.asarray(
        params["codec_embedding"])
    sd["talker.model.text_embedding.weight"] = np.asarray(
        params["text_embedding"])
    put_lin("talker.text_projection.linear_fc1",
            params["text_projection"]["fc1"])
    put_lin("talker.text_projection.linear_fc2",
            params["text_projection"]["fc2"])
    sd["talker.model.norm.weight"] = np.asarray(params["norm"])
    put_lin("talker.codec_head", params["codec_head"])
    put_lin("talker.code_predictor.small_to_mtp_projection",
            params["predictor"]["proj"])
    sd["talker.code_predictor.model.norm.weight"] = np.asarray(
        params["predictor"]["norm"])
    for i in range(TINY.num_code_groups - 1):
        sd[f"talker.code_predictor.model.codec_embedding.{i}.weight"] = \
            np.asarray(params["predictor"]["codec_embedding"][i])
        sd[f"talker.code_predictor.lm_head.{i}.weight"] = np.asarray(
            params["predictor"]["lm_head"][i]).T

    loaded, leftover = load_talker_params(sd, TINY, TINY_P,
                                          dtype=jnp.float32)
    assert leftover == [], leftover[:5]
    ids = jnp.asarray([[5, 6, 7]], jnp.int32)
    c1, _ = talker_generate(params, TINY, TINY_P, ids, max_frames=3)
    c2, _ = talker_generate(loaded, TINY, TINY_P, ids, max_frames=3)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


def test_service_qwen3_tts_end_to_end(tmp_path, monkeypatch):
    """qwen3_tts_base through the GenerationService: prompt -> WAV."""
    from wan2gp_tpu.families import tts_qwen3
    from wan2gp_tpu.runtime.service import GenerationService
    from wan2gp_tpu.utils.media import read_wav
    monkeypatch.setattr(tts_qwen3, "TalkerConfig", lambda: TINY)
    monkeypatch.setattr(tts_qwen3, "CodePredictorConfig", lambda: TINY_P)
    monkeypatch.setattr(tts_qwen3, "CodecDecoderConfig", lambda: TINY_C)
    svc = GenerationService(output_dir=str(tmp_path), attn_backend="xla",
                            init_random_weights=True)
    paths = svc.generate({"model_type": "qwen3_tts_base",
                          "prompt": "hello world",
                          "duration_seconds": 0.5, "temperature": 0,
                          "seed": 7})
    assert paths and paths[0].endswith(".wav")
    wav, sr = read_wav(paths[0])
    assert sr == TINY_C.sample_rate and wav.shape[0] > 0
