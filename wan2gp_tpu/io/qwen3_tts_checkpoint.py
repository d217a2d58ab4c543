"""Qwen3-TTS checkpoint loading.

Key spaces (HF Qwen3TTSForConditionalGeneration + tokenizer v2):
- talker.model.{layers.N.self_attn.{q,k,v,o}_proj (+q_norm/k_norm),
  layers.N.mlp.{gate,up,down}_proj, layers.N.{input_layernorm,
  post_attention_layernorm}, norm, codec_embedding, text_embedding}
- talker.{text_projection.linear_fc{1,2}, codec_head}
- talker.code_predictor.{model.layers.N..., model.norm,
  model.codec_embedding.N, lm_head.N, small_to_mtp_projection}
- codec decoder (separate qwen3_tts_tokenizer_12hz.safetensors):
  decoder.{quantizer.rvq_first/rvq_rest.vq.layers.N._codebook.
  {embedding_sum, cluster_usage}, rvq_*.output_proj, pre_conv.conv,
  pre_transformer.layers.N..., upsample.N.{0.conv, 1.*}, decoder.N...}
"""
from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.T).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _vec(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def _layer(sd, pre, dtype, qk_norm=True):
    p = {
        "input_norm": _vec(sd, f"{pre}.input_layernorm.weight"),
        "q": _lin(sd, f"{pre}.self_attn.q_proj", dtype),
        "k": _lin(sd, f"{pre}.self_attn.k_proj", dtype),
        "v": _lin(sd, f"{pre}.self_attn.v_proj", dtype),
        "o": _lin(sd, f"{pre}.self_attn.o_proj", dtype),
        "post_norm": _vec(sd, f"{pre}.post_attention_layernorm.weight"),
        "gate": _lin(sd, f"{pre}.mlp.gate_proj", dtype),
        "up": _lin(sd, f"{pre}.mlp.up_proj", dtype),
        "down": _lin(sd, f"{pre}.mlp.down_proj", dtype),
    }
    if qk_norm and f"{pre}.self_attn.q_norm.weight" in sd:
        p["q_norm"] = _vec(sd, f"{pre}.self_attn.q_norm.weight")
        p["k_norm"] = _vec(sd, f"{pre}.self_attn.k_norm.weight")
    return p


def _stack(layers):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def load_talker_params(sd: Dict[str, np.ndarray], cfg, pcfg,
                       dtype=jnp.float32) -> Tuple[dict, List[str]]:
    sd = dict(sd)
    for pre in ("model.talker.", "talker."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    talker_layers = [_layer(sd, f"model.layers.{i}", dtype)
                     for i in range(cfg.n_layers)]
    pred_layers = [_layer(sd, f"code_predictor.model.layers.{i}", dtype)
                   for i in range(pcfg.n_layers)]
    g = cfg.num_code_groups
    pred = {
        "proj": (_lin(sd, "code_predictor.small_to_mtp_projection", dtype)
                 if "code_predictor.small_to_mtp_projection.weight" in sd
                 else {"w": jnp.eye(cfg.hidden_size, dtype=dtype),
                       "b": jnp.zeros((pcfg.hidden_size,), dtype)}),
        "codec_embedding": jnp.stack(
            [jnp.asarray(np.asarray(sd.pop(
                f"code_predictor.model.codec_embedding.{i}.weight"),
                np.float32)).astype(dtype) for i in range(g - 1)]),
        "layers": _stack(pred_layers),
        "norm": _vec(sd, "code_predictor.model.norm.weight"),
        "lm_head": jnp.stack(
            [jnp.asarray(np.asarray(sd.pop(
                f"code_predictor.lm_head.{i}.weight"),
                np.float32).T).astype(dtype) for i in range(g - 1)]),
    }
    params = {
        "codec_embedding": jnp.asarray(np.asarray(
            sd.pop("model.codec_embedding.weight"),
            np.float32)).astype(dtype),
        "text_embedding": jnp.asarray(np.asarray(
            sd.pop("model.text_embedding.weight"),
            np.float32)).astype(dtype),
        "text_projection": {
            "fc1": _lin(sd, "text_projection.linear_fc1", dtype),
            "fc2": _lin(sd, "text_projection.linear_fc2", dtype)},
        "layers": _stack(talker_layers),
        "norm": _vec(sd, "model.norm.weight"),
        "codec_head": _lin(sd, "codec_head", dtype),
        "predictor": pred,
    }
    leftover = [k for k in sd if not k.startswith("speaker_encoder")
                and "rotary" not in k]
    return params, sorted(leftover)


def load_codec_decoder_params(sd: Dict[str, np.ndarray], cfg,
                              dtype=jnp.float32) -> Tuple[dict, List[str]]:
    from ..models.tts.qwen3_tts import init_codec_decoder
    sd = dict(sd)
    for pre in ("model.decoder.", "decoder."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    def c1(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(w.transpose(2, 1, 0)).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def ct1(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(
            w.transpose(2, 0, 1)[::-1].copy()).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def rvq(pre, n):
        return {
            "embedding_sum": jnp.stack([_vec(
                sd, f"{pre}.vq.layers.{i}._codebook.embedding_sum")
                for i in range(n)]),
            "cluster_usage": jnp.stack([_vec(
                sd, f"{pre}.vq.layers.{i}._codebook.cluster_usage")
                for i in range(n)]),
            "out_proj": c1(f"{pre}.output_proj"),
        }

    layers = [_layer(sd, f"pre_transformer.layers.{i}", dtype,
                     qk_norm=False) for i in range(cfg.n_layers)]
    scales = jnp.stack([jnp.stack([
        _vec(sd, f"pre_transformer.layers.{i}.self_attn_layer_scale.scale"),
        _vec(sd, f"pre_transformer.layers.{i}.mlp_layer_scale.scale")])
        for i in range(cfg.n_layers)])

    upsample = []
    for i in range(len(cfg.upsampling_ratios)):
        upsample.append({
            "tconv": ct1(f"upsample.{i}.0.conv"),
            "convnext": {
                "dwconv": c1(f"upsample.{i}.1.dwconv.conv"),
                "norm": {"w": _vec(sd, f"upsample.{i}.1.norm.weight"),
                         "b": _vec(sd, f"upsample.{i}.1.norm.bias")},
                "pw1": _lin(sd, f"upsample.{i}.1.pwconv1", dtype),
                "pw2": _lin(sd, f"upsample.{i}.1.pwconv2", dtype),
                "gamma": _vec(sd, f"upsample.{i}.1.gamma")}})

    dec_blocks = []
    for i in range(len(cfg.upsample_rates)):
        pre = f"decoder.{i + 1}"
        blk = {
            "alpha": _vec(sd, f"{pre}.block.0.alpha"),
            "beta": _vec(sd, f"{pre}.block.0.beta"),
            "tconv": ct1(f"{pre}.block.1.conv"),
            "units": []}
        for j in range(3):
            u = f"{pre}.block.{j + 2}"
            blk["units"].append({
                "alpha1": _vec(sd, f"{u}.act1.alpha"),
                "beta1": _vec(sd, f"{u}.act1.beta"),
                "conv1": c1(f"{u}.conv1.conv"),
                "alpha2": _vec(sd, f"{u}.act2.alpha"),
                "beta2": _vec(sd, f"{u}.act2.beta"),
                "conv2": c1(f"{u}.conv2.conv")})
        dec_blocks.append(blk)

    n_dec = len(cfg.upsample_rates)
    params = {
        "rvq_first": rvq("quantizer.rvq_first", 1),
        "rvq_rest": rvq("quantizer.rvq_rest", cfg.num_quantizers - 1),
        "pre_conv": c1("pre_conv.conv"),
        "transformer": _stack(layers),
        "layer_scales": scales,
        "upsample": upsample,
        "dec_pre": c1("decoder.0.conv"),
        "dec_blocks": dec_blocks,
        "dec_post_alpha": _vec(sd, f"decoder.{n_dec + 1}.alpha"),
        "dec_post_beta": _vec(sd, f"decoder.{n_dec + 1}.beta"),
        "dec_out": c1(f"decoder.{n_dec + 2}.conv"),
    }
    leftover = [k for k in sd if not k.startswith("encoder")
                and "rotary" not in k and "input_proj" not in k]
    return params, sorted(leftover)
