"""OmniVoice MaskGIT TTS + Higgs codec decoder
(reference models/TTS/omnivoice/)."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_higgs_dac_decoder_oracle():
    import torch
    from transformers.models.dac.modeling_dac import DacDecoder
    from transformers.models.dac.configuration_dac import DacConfig
    from wan2gp_tpu.models.tts.higgs_codec import (HiggsCodecConfig,
                                                   init_higgs_codec,
                                                   higgs_decode)
    cfg = HiggsCodecConfig(num_quantizers=2, codebook_size=16,
                           codebook_dim=4, hidden_size=12, dac_latent=6,
                           decoder_dim=16, upsampling_ratios=(4, 2))
    params = init_higgs_codec(jax.random.key(0), cfg)
    # torch decoder with the Higgs adjustments
    # (modeling_higgs_audio_v2_tokenizer.py:482-492)
    dc = DacConfig(hidden_size=6, decoder_hidden_size=16,
                   upsampling_ratios=[4, 2])
    dec = DacDecoder(dc)
    for m in dec.modules():
        if isinstance(m, torch.nn.ConvTranspose1d):
            m.output_padding = (m.stride[0] % 2,)
    dec.tanh = torch.nn.Identity()
    d = params["decoder"]
    with torch.no_grad():
        dec.conv1.weight.copy_(torch.from_numpy(
            np.asarray(d["conv1"]["w"])))
        dec.conv1.bias.copy_(torch.from_numpy(np.asarray(d["conv1"]["b"])))
        for blk, tb in zip(d["blocks"], dec.block):
            tb.snake1.alpha.copy_(torch.from_numpy(
                np.asarray(blk["snake"])).view(1, -1, 1))
            tb.conv_t1.weight.copy_(torch.from_numpy(
                np.asarray(blk["convt"]["w"])))
            tb.conv_t1.bias.copy_(torch.from_numpy(
                np.asarray(blk["convt"]["b"])))
            for j, ru in enumerate((tb.res_unit1, tb.res_unit2,
                                    tb.res_unit3)):
                r = blk["res"][j]
                ru.snake1.alpha.copy_(torch.from_numpy(
                    np.asarray(r["snake1"])).view(1, -1, 1))
                ru.conv1.weight.copy_(torch.from_numpy(
                    np.asarray(r["conv1"]["w"])))
                ru.conv1.bias.copy_(torch.from_numpy(
                    np.asarray(r["conv1"]["b"])))
                ru.snake2.alpha.copy_(torch.from_numpy(
                    np.asarray(r["snake2"])).view(1, -1, 1))
                ru.conv2.weight.copy_(torch.from_numpy(
                    np.asarray(r["conv2"]["w"])))
                ru.conv2.bias.copy_(torch.from_numpy(
                    np.asarray(r["conv2"]["b"])))
        dec.snake1.alpha.copy_(torch.from_numpy(
            np.asarray(d["snake_final"])).view(1, -1, 1))
        dec.conv2.weight.copy_(torch.from_numpy(np.asarray(
            d["conv2"]["w"])))
        dec.conv2.bias.copy_(torch.from_numpy(np.asarray(
            d["conv2"]["b"])))
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, (2, 10))
    got = np.asarray(higgs_decode(params, cfg, codes))
    # torch-side RVQ + fc2 oracle
    quant = np.zeros((10, cfg.hidden_size), np.float32)
    for i in range(2):
        q = params["quantizers"][i]
        emb = np.asarray(q["embed"])[codes[i]]
        quant += emb @ np.asarray(q["out_w"]) + np.asarray(q["out_b"])
    lat = quant @ np.asarray(params["fc2"]["w"]) + np.asarray(
        params["fc2"]["b"])
    with torch.no_grad():
        ref = dec(torch.from_numpy(lat.T[None]))[0, 0].numpy()
    assert got.shape == ref.shape == (10 * 8,)
    np.testing.assert_allclose(got, np.clip(ref, -1, 1), rtol=1e-4,
                               atol=1e-5)


def test_higgs_loader_roundtrip():
    import torch
    from wan2gp_tpu.models.tts.higgs_codec import (
        HiggsCodecConfig, init_higgs_codec, load_higgs_codec_params,
        higgs_decode)
    cfg = HiggsCodecConfig(num_quantizers=2, codebook_size=16,
                           codebook_dim=4, hidden_size=12, dac_latent=6,
                           decoder_dim=16, upsampling_ratios=(4, 2))
    p = init_higgs_codec(jax.random.key(1), cfg)
    sd = {}
    for i, q in enumerate(p["quantizers"]):
        pre = f"quantizer.quantizers.{i}"
        sd[f"{pre}.codebook.embed"] = np.asarray(q["embed"])
        sd[f"{pre}.project_out.weight"] = np.asarray(q["out_w"]).T
        sd[f"{pre}.project_out.bias"] = np.asarray(q["out_b"])
        sd[f"{pre}.project_in.weight"] = np.zeros((4, 12), np.float32)
        sd[f"{pre}.project_in.bias"] = np.zeros((4,), np.float32)
    sd["fc2.weight"] = np.asarray(p["fc2"]["w"]).T
    sd["fc2.bias"] = np.asarray(p["fc2"]["b"])
    d = p["decoder"]

    def put_conv(name, c, wn=False):
        w = np.asarray(c["w"])
        if wn:
            g = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
            v = w * 2.0
            sd[f"{name}.parametrizations.weight.original0"] = g
            sd[f"{name}.parametrizations.weight.original1"] = v
        else:
            sd[f"{name}.weight"] = w
        sd[f"{name}.bias"] = np.asarray(c["b"])

    put_conv("acoustic_decoder.conv1", d["conv1"], wn=True)
    for i, blk in enumerate(d["blocks"]):
        pre = f"acoustic_decoder.block.{i}"
        sd[f"{pre}.snake1.alpha"] = np.asarray(blk["snake"]).reshape(1, -1, 1)
        put_conv(f"{pre}.conv_t1", blk["convt"])
        for j in (1, 2, 3):
            r = blk["res"][j - 1]
            sd[f"{pre}.res_unit{j}.snake1.alpha"] = np.asarray(
                r["snake1"]).reshape(1, -1, 1)
            put_conv(f"{pre}.res_unit{j}.conv1", r["conv1"])
            sd[f"{pre}.res_unit{j}.snake2.alpha"] = np.asarray(
                r["snake2"]).reshape(1, -1, 1)
            put_conv(f"{pre}.res_unit{j}.conv2", r["conv2"])
    sd["acoustic_decoder.snake1.alpha"] = np.asarray(
        d["snake_final"]).reshape(1, -1, 1)
    put_conv("acoustic_decoder.conv2", d["conv2"])
    lp, left = load_higgs_codec_params(sd, cfg)
    assert left == []
    codes = np.random.default_rng(1).integers(0, 16, (2, 6))
    np.testing.assert_allclose(np.asarray(higgs_decode(lp, cfg, codes)),
                               np.asarray(higgs_decode(p, cfg, codes)),
                               rtol=1e-4, atol=1e-5)


def test_omnivoice_forward_and_prompt():
    from wan2gp_tpu.models.tts.omnivoice import (
        OmniVoiceConfig, init_omnivoice, omnivoice_forward,
        build_prompt, get_time_steps, estimate_target_tokens,
        combine_text)
    from wan2gp_tpu.models.qwen.text_encoder import (QwenLMConfig,
                                                     init_qwen_lm)
    lm_cfg = QwenLMConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                          n_kv_heads=2, head_dim=8, ffn_dim=64,
                          compute_dtype=jnp.float32)
    lm = init_qwen_lm(jax.random.key(0), lm_cfg)
    cfg = OmniVoiceConfig(audio_vocab_size=9, audio_mask_id=8,
                          num_audio_codebook=3)
    p = init_omnivoice(jax.random.key(1), lm, lm_cfg, cfg)
    rng = np.random.default_rng(0)
    ids = np.concatenate([
        np.broadcast_to(rng.integers(0, 64, (1, 1, 4)), (1, 3, 4)),
        rng.integers(0, 9, (1, 3, 5))], axis=2)
    mask = np.zeros((1, 9), bool)
    mask[0, 4:] = True
    logits = omnivoice_forward(p, lm_cfg, cfg, jnp.asarray(ids),
                               jnp.asarray(mask), logits_start=-5)
    assert logits.shape == (1, 3, 5, 9)
    # prompt construction (modeling_omnivoice.py:938-1015)

    class Tok:
        def __call__(self, texts, n):
            ids = np.arange(1, len(texts[0].split()) % 7 + 4)[None]
            return ids, np.ones_like(ids)

    inp, am = build_prompt(Tok(), "hello", 6, cfg, lang="English")
    assert inp.shape[1] == 3 and am.shape == (1, inp.shape[2])
    assert (inp[0, :, -6:] == cfg.audio_mask_id).all()
    assert am[0, -6:].all() and not am[0, :-6].any()
    # ref tokens widen the audio span
    ref = np.zeros((3, 4), np.int64)
    inp2, am2 = build_prompt(Tok(), "hello", 6, cfg, ref_text="hi",
                             ref_audio_tokens=ref)
    assert am2[0].sum() == 10
    # shifted time grid (modeling_omnivoice.py:1366-1375)
    ts = get_time_steps(4, 0.1)
    assert ts[0] == 0 and abs(ts[-1] - 1.0) < 1e-9
    assert np.all(np.diff(ts) > 0)
    ref_t = 0.1 * 0.5 / (1 + (0.1 - 1) * 0.5)
    assert abs(ts[2] - ref_t) < 1e-9
    # duration heuristics + text normalisation
    assert estimate_target_tokens("x" * 28, 25) == 25 * 2
    assert estimate_target_tokens("x", 25, duration=2.0) == 50
    assert combine_text(" a\nb ", None) == "ab"
    assert combine_text("你 好") == "你好"


def test_omnivoice_generate_and_loader():
    from wan2gp_tpu.models.tts.omnivoice import (
        OmniVoiceConfig, OmniVoiceGenConfig, init_omnivoice,
        omnivoice_generate, load_omnivoice_params)
    from wan2gp_tpu.models.qwen.text_encoder import (QwenLMConfig,
                                                     init_qwen_lm)
    lm_cfg = QwenLMConfig(vocab_size=64, dim=32, n_layers=2, n_heads=4,
                          n_kv_heads=2, head_dim=8, ffn_dim=64,
                          compute_dtype=jnp.float32)
    lm = init_qwen_lm(jax.random.key(2), lm_cfg)
    cfg = OmniVoiceConfig(audio_vocab_size=9, audio_mask_id=8,
                          num_audio_codebook=3)
    p = init_omnivoice(jax.random.key(3), lm, lm_cfg, cfg)

    class Tok:
        def __call__(self, texts, n):
            ids = np.arange(1, 6)[None]
            return ids, np.ones_like(ids)

    codes = omnivoice_generate(
        p, lm_cfg, cfg, Tok(), "hello world",
        gen=OmniVoiceGenConfig(num_step=3, guidance_scale=2.0,
                               position_temperature=0.0,
                               class_temperature=0.0),
        num_target_tokens=7, seed=0)
    assert codes.shape == (3, 7)
    # every position unmasked and no mask ids remain
    assert (codes != cfg.audio_mask_id).all()
    assert (codes >= 0).all() and (codes < 8 + 1).all()
    # loader roundtrip: synthesize an OmniVoice-keyed sd
    sd = {"audio_embeddings.weight": np.asarray(p["audio_embeddings"]),
          "audio_heads.weight": np.asarray(p["audio_heads"]).T,
          "codebook_layer_offsets": np.arange(3) * 9}
    from wan2gp_tpu.models.qwen.text_encoder import load_qwen_lm_params
    # build a qwen-keyed llm sd from the init tree
    lmp = p["llm"]
    sd["llm.embed_tokens.weight"] = np.asarray(lmp["embed_tokens"])
    sd["llm.norm.weight"] = np.asarray(lmp["norm"])
    for i in range(lm_cfg.n_layers):
        def g(name):
            return np.asarray(jax.tree.map(lambda a: a[i],
                                           lmp["layers"])[name]["w"]).T

        lay = jax.tree.map(lambda a: a[i], lmp["layers"])
        pre = f"llm.layers.{i}"
        sd[f"{pre}.input_layernorm.weight"] = np.asarray(
            lay["input_norm"])
        sd[f"{pre}.post_attention_layernorm.weight"] = np.asarray(
            lay["post_norm"])
        sd[f"{pre}.self_attn.q_proj.weight"] = np.asarray(
            lay["q"]["w"]).T
        sd[f"{pre}.self_attn.k_proj.weight"] = np.asarray(
            lay["k"]["w"]).T
        sd[f"{pre}.self_attn.v_proj.weight"] = np.asarray(
            lay["v"]["w"]).T
        sd[f"{pre}.self_attn.o_proj.weight"] = np.asarray(
            lay["o"]["w"]).T
        if lm_cfg.qk_norm:
            sd[f"{pre}.self_attn.q_norm.weight"] = np.asarray(
                lay["q_norm"])
            sd[f"{pre}.self_attn.k_norm.weight"] = np.asarray(
                lay["k_norm"])
        sd[f"{pre}.mlp.gate_proj.weight"] = np.asarray(
            lay["gate"]["w"]).T
        sd[f"{pre}.mlp.up_proj.weight"] = np.asarray(lay["up"]["w"]).T
        sd[f"{pre}.mlp.down_proj.weight"] = np.asarray(
            lay["down"]["w"]).T
    p2, left = load_omnivoice_params(sd, lm_cfg, jnp.float32)
    assert left == [], left[:6]
    from wan2gp_tpu.models.tts.omnivoice import omnivoice_forward
    ids = np.concatenate([
        np.broadcast_to(np.arange(4)[None, None], (1, 3, 4)),
        np.full((1, 3, 3), 8)], axis=2)
    mask = np.zeros((1, 7), bool)
    mask[0, 4:] = True
    a = omnivoice_forward(p, lm_cfg, cfg, jnp.asarray(ids),
                          jnp.asarray(mask))
    b = omnivoice_forward(p2, lm_cfg, cfg, jnp.asarray(ids),
                          jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                               atol=2e-3)


def test_omnivoice_family_pipeline(monkeypatch):
    """Handler + pipeline e2e on tiny geometry (service audio path)."""
    import wan2gp_tpu.families.tts_omnivoice as fam
    monkeypatch.setattr(fam, "OMNIVOICE_LM",
                        dict(vocab_size=300, dim=32, n_layers=2,
                             n_heads=4, n_kv_heads=2, head_dim=8,
                             ffn_dim=64))
    pipe = fam.OmniVoiceFamilyHandler.load_model(
        "omnivoice", {}, init_random=True, dtype=jnp.float32)
    out = fam.OmniVoiceFamilyHandler.generate_audio(
        pipe, {"prompt": "hi there", "num_inference_steps": 2,
               "guidance_scale": 0.0, "duration_seconds": 0.4}, seed=0)
    assert out["codes"].shape[0] == 8
    assert out["audio"].ndim == 2 and out["audio"].shape[1] == 1
    assert out["sample_rate"] == 24000
    assert np.isfinite(out["audio"]).all()
