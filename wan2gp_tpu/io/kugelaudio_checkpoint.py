"""KugelAudio checkpoint loading (reference
models/TTS/kugelaudio/models/kugelaudio_model.py HF key space).

  model.language_model.{embed_tokens, layers.N.{input_layernorm,
      self_attn.{q,k,v,o}_proj, post_attention_layernorm,
      mlp.{gate,up,down}_proj}, norm} (+ lm_head, often tied)
  model.prediction_head.{noisy_images_proj, cond_proj,
      t_embedder.mlp.{0,2}, layers.N.{norm, ffn.{gate,up,down}_proj,
      adaLN_modulation.1}, final_layer.{linear, adaLN_modulation.1}}
  model.{acoustic,semantic}_connector.{fc1, norm, fc2}
  model.{acoustic,semantic}_tokenizer.{encoder,decoder}.{
      downsample/upsample_layers.S.0.conv.conv | .convtr.convtr,
      stages.S.B.{norm, mixer.conv.conv.conv, gamma, ffn_norm,
      ffn.linear{1,2}, ffn_gamma}, head.conv.conv}
  model.speech_scaling_factor / speech_bias_factor buffers
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype, transpose=True):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.T if transpose else w).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _vec(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def _conv(sd, name, dtype, meta):
    """torch Conv1d [out, in/g, k] -> {w [k, in/g, out], b} + meta."""
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 1, 0)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    else:
        p["b"] = jnp.zeros((w.shape[0],), dtype)
    p.update(meta)
    return p


def _convt(sd, name, dtype, meta):
    """torch ConvTranspose1d [in, out, k] -> {w [k, in, out], b}."""
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 0, 1)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    else:
        p["b"] = jnp.zeros((w.shape[1],), dtype)
    p.update(meta)
    return p


def _lin_as_k1(sd, name, dtype):
    """Linear -> [1, in, out] conv layout (Block1D ffn storage)."""
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.T[None]).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    p["b"] = (jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
              if b is not None else jnp.zeros((w.shape[0],), dtype))
    return p


def _block(sd, pre, dtype, dim):
    return {
        "norm": _vec(sd, f"{pre}.norm.weight"),
        "mixer": _conv(sd, f"{pre}.mixer.conv.conv.conv", dtype,
                       {"_cin": dim}),
        "gamma": _vec(sd, f"{pre}.gamma"),
        "ffn_norm": _vec(sd, f"{pre}.ffn_norm.weight"),
        "ffn1": _lin_as_k1(sd, f"{pre}.ffn.linear1", dtype),
        "ffn2": _lin_as_k1(sd, f"{pre}.ffn.linear2", dtype),
        "ffn_gamma": _vec(sd, f"{pre}.ffn_gamma"),
    }


def _load_encoder(sd, pre, tok_cfg, dtype, out_dim=None):
    nf = tok_cfg.n_filters
    ratios = tuple(reversed(tok_cfg.ratios))
    down = [_conv(sd, f"{pre}.downsample_layers.0.0.conv.conv", dtype,
                  {"_cin": tok_cfg.channels, "_stride": 1})]
    for i, r in enumerate(ratios):
        down.append(_conv(
            sd, f"{pre}.downsample_layers.{i + 1}.0.conv.conv", dtype,
            {"_cin": nf * 2 ** i, "_stride": r}))
    stages = []
    for i, d in enumerate(tok_cfg.depths):
        ch = nf * 2 ** i
        stages.append([_block(sd, f"{pre}.stages.{i}.{j}", dtype, ch)
                       for j in range(d)])
    top = nf * 2 ** (len(tok_cfg.depths) - 1)
    head = _conv(sd, f"{pre}.head.conv.conv", dtype,
                 {"_cin": top, "_stride": 1})
    return {"down": down, "stages": stages, "head": head}


def _load_decoder(sd, pre, tok_cfg, dtype):
    nf = tok_cfg.n_filters
    depths = tuple(reversed(tok_cfg.depths))
    nlev = len(depths)
    top = nf * 2 ** (nlev - 1)
    up = [dict(_conv(sd, f"{pre}.upsample_layers.0.0.conv.conv",
                     dtype, {"_cin": tok_cfg.vae_dim, "_stride": 1}),
               _transpose=False)]
    for i, r in enumerate(tok_cfg.ratios):
        cin = nf * 2 ** (nlev - 1 - i)
        up.append(dict(_convt(
            sd, f"{pre}.upsample_layers.{i + 1}.0.convtr.convtr",
            dtype, {"_cin": cin, "_stride": r}), _transpose=True))
    stages = []
    for i, d in enumerate(depths):
        ch = nf * 2 ** (nlev - 1 - i)
        stages.append([_block(sd, f"{pre}.stages.{i}.{j}", dtype, ch)
                       for j in range(d)])
    head = _conv(sd, f"{pre}.head.conv.conv", dtype,
                 {"_cin": nf, "_stride": 1})
    return {"up": up, "stages": stages, "head": head,
            "_depths": depths}


def load_kugelaudio_params(sd: Dict[str, np.ndarray], cfg, tok_cfg,
                           dtype=jnp.bfloat16
                           ) -> Tuple[dict, List[str]]:
    """Map the HF state dict onto init_kugelaudio's tree."""
    sd = dict(sd)
    if any(k.startswith("model.") for k in sd):
        sd = {k[6:] if k.startswith("model.") else k: v
              for k, v in sd.items()}

    lm_pre = "language_model"
    layers = []
    for i in range(cfg.layers):
        b = f"{lm_pre}.layers.{i}"
        layers.append({
            "in_norm": _vec(sd, f"{b}.input_layernorm.weight"),
            "q": _lin(sd, f"{b}.self_attn.q_proj", dtype),
            "k": _lin(sd, f"{b}.self_attn.k_proj", dtype),
            "v": _lin(sd, f"{b}.self_attn.v_proj", dtype),
            "o": _lin(sd, f"{b}.self_attn.o_proj", dtype),
            "post_norm": _vec(
                sd, f"{b}.post_attention_layernorm.weight"),
            "gate": _lin(sd, f"{b}.mlp.gate_proj", dtype),
            "up": _lin(sd, f"{b}.mlp.up_proj", dtype),
            "down": _lin(sd, f"{b}.mlp.down_proj", dtype),
        })
    embed = jnp.asarray(np.asarray(
        sd.pop(f"{lm_pre}.embed_tokens.weight"),
        np.float32)).astype(dtype)
    if "lm_head.weight" in sd:
        head_w = jnp.asarray(np.asarray(
            sd.pop("lm_head.weight"), np.float32).T).astype(dtype)
    else:
        head_w = embed.T                 # tied embeddings
    lm = {"embed": embed,
          "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
          "norm": _vec(sd, f"{lm_pre}.norm.weight"),
          "lm_head": {"w": head_w}}

    hp = "prediction_head"
    hlayers = []
    for i in range(cfg.head_layers):
        b = f"{hp}.layers.{i}"
        hlayers.append({
            "norm": _vec(sd, f"{b}.norm.weight"),
            "gate": _lin(sd, f"{b}.ffn.gate_proj", dtype),
            "up": _lin(sd, f"{b}.ffn.up_proj", dtype),
            "down": _lin(sd, f"{b}.ffn.down_proj", dtype),
            "ada": _lin(sd, f"{b}.adaLN_modulation.1", dtype),
        })
    head = {
        "x_proj": _lin(sd, f"{hp}.noisy_images_proj", dtype),
        "cond_proj": _lin(sd, f"{hp}.cond_proj", dtype),
        "t1": _lin(sd, f"{hp}.t_embedder.mlp.0", dtype),
        "t2": _lin(sd, f"{hp}.t_embedder.mlp.2", dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *hlayers),
        "final_ada": _lin(sd, f"{hp}.final_layer.adaLN_modulation.1",
                          dtype),
        "final": _lin(sd, f"{hp}.final_layer.linear", dtype),
    }

    def connector(pre):
        return {"fc1": _lin(sd, f"{pre}.fc1", dtype),
                "norm": _vec(sd, f"{pre}.norm.weight"),
                "fc2": _lin(sd, f"{pre}.fc2", dtype)}

    params = {
        "lm": lm,
        "head": head,
        "acoustic_enc": _load_encoder(
            sd, "acoustic_tokenizer.encoder", tok_cfg, dtype),
        "acoustic_dec": _load_decoder(
            sd, "acoustic_tokenizer.decoder", tok_cfg, dtype),
        "semantic_enc": _load_encoder(
            sd, "semantic_tokenizer.encoder", tok_cfg, dtype),
        "acoustic_conn": connector("acoustic_connector"),
        "semantic_conn": connector("semantic_connector"),
        "scaling": jnp.asarray(float(np.nan_to_num(np.asarray(
            sd.pop("speech_scaling_factor", 1.0), np.float32),
            nan=1.0))),
        "bias": jnp.asarray(float(np.nan_to_num(np.asarray(
            sd.pop("speech_bias_factor", 0.0), np.float32),
            nan=0.0))),
    }
    leftover = [k for k in sorted(sd)
                if not k.startswith(("acoustic_tokenizer.",
                                     "semantic_tokenizer."))]
    return params, leftover


def export_kugelaudio_state(params, cfg, tok_cfg
                            ) -> Dict[str, np.ndarray]:
    """Inverse mapping (round-trip tests)."""
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_vec(name, v):
        sd[name] = np.asarray(v, np.float32)

    def put_conv(name, p):
        sd[f"{name}.weight"] = np.asarray(
            p["w"], np.float32).transpose(2, 1, 0)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_convt(name, p):
        sd[f"{name}.weight"] = np.asarray(
            p["w"], np.float32).transpose(1, 2, 0)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_lin_k1(name, p):
        sd[f"{name}.weight"] = np.asarray(
            p["w"], np.float32)[0].T
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_block(pre, bp):
        put_vec(f"{pre}.norm.weight", bp["norm"])
        put_conv(f"{pre}.mixer.conv.conv.conv", bp["mixer"])
        put_vec(f"{pre}.gamma", bp["gamma"])
        put_vec(f"{pre}.ffn_norm.weight", bp["ffn_norm"])
        put_lin_k1(f"{pre}.ffn.linear1", bp["ffn1"])
        put_lin_k1(f"{pre}.ffn.linear2", bp["ffn2"])
        put_vec(f"{pre}.ffn_gamma", bp["ffn_gamma"])

    def put_encoder(pre, enc):
        for i, dp in enumerate(enc["down"]):
            put_conv(f"{pre}.downsample_layers.{i}.0.conv.conv", dp)
        for i, stage in enumerate(enc["stages"]):
            for j, bp in enumerate(stage):
                put_block(f"{pre}.stages.{i}.{j}", bp)
        put_conv(f"{pre}.head.conv.conv", enc["head"])

    def put_decoder(pre, dec):
        for i, upp in enumerate(dec["up"]):
            if upp.get("_transpose"):
                put_convt(
                    f"{pre}.upsample_layers.{i}.0.convtr.convtr", upp)
            else:
                put_conv(f"{pre}.upsample_layers.{i}.0.conv.conv",
                         upp)
        for i, stage in enumerate(dec["stages"]):
            for j, bp in enumerate(stage):
                put_block(f"{pre}.stages.{i}.{j}", bp)
        put_conv(f"{pre}.head.conv.conv", dec["head"])

    lm = params["lm"]
    n = lm["layers"]["in_norm"].shape[0]
    put_vec("language_model.embed_tokens.weight", lm["embed"])
    for i in range(n):
        lp = jax.tree.map(lambda a: a[i], lm["layers"])
        b = f"language_model.layers.{i}"
        put_vec(f"{b}.input_layernorm.weight", lp["in_norm"])
        put_lin(f"{b}.self_attn.q_proj", lp["q"])
        put_lin(f"{b}.self_attn.k_proj", lp["k"])
        put_lin(f"{b}.self_attn.v_proj", lp["v"])
        put_lin(f"{b}.self_attn.o_proj", lp["o"])
        put_vec(f"{b}.post_attention_layernorm.weight",
                lp["post_norm"])
        put_lin(f"{b}.mlp.gate_proj", lp["gate"])
        put_lin(f"{b}.mlp.up_proj", lp["up"])
        put_lin(f"{b}.mlp.down_proj", lp["down"])
    put_vec("language_model.norm.weight", lm["norm"])
    put_lin("lm_head", lm["lm_head"])

    hp = params["head"]
    put_lin("prediction_head.noisy_images_proj", hp["x_proj"])
    put_lin("prediction_head.cond_proj", hp["cond_proj"])
    put_lin("prediction_head.t_embedder.mlp.0", hp["t1"])
    put_lin("prediction_head.t_embedder.mlp.2", hp["t2"])
    for i in range(hp["layers"]["norm"].shape[0]):
        lp = jax.tree.map(lambda a: a[i], hp["layers"])
        b = f"prediction_head.layers.{i}"
        put_vec(f"{b}.norm.weight", lp["norm"])
        put_lin(f"{b}.ffn.gate_proj", lp["gate"])
        put_lin(f"{b}.ffn.up_proj", lp["up"])
        put_lin(f"{b}.ffn.down_proj", lp["down"])
        put_lin(f"{b}.adaLN_modulation.1", lp["ada"])
    put_lin("prediction_head.final_layer.adaLN_modulation.1",
            hp["final_ada"])
    put_lin("prediction_head.final_layer.linear", hp["final"])

    for pre, cp in (("acoustic_connector", params["acoustic_conn"]),
                    ("semantic_connector", params["semantic_conn"])):
        put_lin(f"{pre}.fc1", cp["fc1"])
        put_vec(f"{pre}.norm.weight", cp["norm"])
        put_lin(f"{pre}.fc2", cp["fc2"])

    put_encoder("acoustic_tokenizer.encoder", params["acoustic_enc"])
    put_decoder("acoustic_tokenizer.decoder", params["acoustic_dec"])
    put_encoder("semantic_tokenizer.encoder", params["semantic_enc"])
    put_vec("speech_scaling_factor", params["scaling"])
    put_vec("speech_bias_factor", params["bias"])
    return sd
