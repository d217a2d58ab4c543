"""IndexTTS-2 UnifiedVoice GPT checkpoint loading (reference
models/TTS/index_tts2/gpt/model_v2.py; GPT-2 core built by
build_hf_gpt_transformer:375-397).

Key space:
  text_embedding.weight / mel_embedding.weight
  text_pos_embedding.emb.weight / mel_pos_embedding.emb.weight
  speed_emb.weight [2, D]
  emovec_layer.{weight,bias} / emo_layer.{weight,bias}
  gpt.h.N.{ln_1, attn.c_attn, attn.c_proj, ln_2, mlp.c_fc,
      mlp.c_proj}   (HF GPT-2 Conv1D: weights stored [in, out] —
      NO transpose)
  gpt.ln_f + final_norm (stacked LayerNorms, model_v2.py:565,:676)
  mel_head.{weight,bias}

The conformer/perceiver conditioning stacks keep their random init
when their keys are absent; their keys are returned as leftovers for
the caller to route through load_conformer_params.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype, conv1d=False):
    """conv1d=True: HF GPT-2 Conv1D stores weight [in, out]."""
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w if conv1d else w.T).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _ln_p(sd, name):
    return {"w": jnp.asarray(np.asarray(
                sd.pop(f"{name}.weight"), np.float32)),
            "b": jnp.asarray(np.asarray(
                sd.pop(f"{name}.bias"), np.float32))}


def _emb(sd, name, dtype):
    return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                  np.float32)).astype(dtype)


def load_unified_voice_params(sd: Dict[str, np.ndarray], cfg,
                              base_params: Optional[dict] = None,
                              dtype=jnp.bfloat16
                              ) -> Tuple[dict, List[str]]:
    """Overrides the GPT core of an init_unified_voice tree with
    checkpoint weights; conditioning stacks stay as in base_params."""
    from ..models.tts.index_tts2 import init_unified_voice

    sd = dict(sd)
    for pre in ("model.", "gpt_model."):
        if any(k.startswith(pre + "gpt.h.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break
    params = dict(base_params if base_params is not None
                  else init_unified_voice(jax.random.key(0), cfg,
                                          dtype))
    d = cfg.dim

    blocks = []
    for i in range(cfg.layers):
        b = f"gpt.h.{i}"
        c_attn = _lin(sd, f"{b}.attn.c_attn", dtype, conv1d=True)
        qw, kw, vw = np.split(np.asarray(c_attn["w"], np.float32), 3,
                              axis=1)
        qb, kb, vb = np.split(np.asarray(c_attn["b"], np.float32), 3)
        blocks.append({
            "ln1": _ln_p(sd, f"{b}.ln_1"),
            "q": {"w": jnp.asarray(qw).astype(dtype),
                  "b": jnp.asarray(qb).astype(dtype)},
            "k": {"w": jnp.asarray(kw).astype(dtype),
                  "b": jnp.asarray(kb).astype(dtype)},
            "v": {"w": jnp.asarray(vw).astype(dtype),
                  "b": jnp.asarray(vb).astype(dtype)},
            "o": _lin(sd, f"{b}.attn.c_proj", dtype, conv1d=True),
            "ln2": _ln_p(sd, f"{b}.ln_2"),
            "fc": _lin(sd, f"{b}.mlp.c_fc", dtype, conv1d=True),
            "proj": _lin(sd, f"{b}.mlp.c_proj", dtype, conv1d=True),
        })
    params["blocks"] = jax.tree.map(lambda *xs: jnp.stack(xs),
                                    *blocks)
    params["text_emb"] = _emb(sd, "text_embedding", dtype)
    params["mel_emb"] = _emb(sd, "mel_embedding", dtype)
    params["text_pos"] = _emb(sd, "text_pos_embedding.emb", dtype)
    params["mel_pos"] = _emb(sd, "mel_pos_embedding.emb", dtype)
    params["speed_emb"] = _emb(sd, "speed_emb", dtype)
    params["ln_f"] = _ln_p(sd, "gpt.ln_f")
    params["final_norm"] = _ln_p(sd, "final_norm")
    params["mel_head"] = _lin(sd, "mel_head", dtype)
    params["emovec_layer"] = _lin(sd, "emovec_layer", dtype)
    params["emo_layer"] = _lin(sd, "emo_layer", dtype)
    sd.pop("text_head.weight", None)
    sd.pop("text_head.bias", None)
    return params, sorted(sd.keys())


def export_unified_voice_state(params, cfg) -> Dict[str, np.ndarray]:
    """GPT-core inverse mapping (round-trip tests)."""
    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p, conv1d=False):
        w = np.asarray(p["w"], np.float32)
        sd[f"{name}.weight"] = w if conv1d else w.T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_ln(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32)
        sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    n = params["blocks"]["q"]["w"].shape[0]
    for i in range(n):
        lp = jax.tree.map(lambda a: a[i], params["blocks"])
        b = f"gpt.h.{i}"
        put_ln(f"{b}.ln_1", lp["ln1"])
        sd[f"{b}.attn.c_attn.weight"] = np.concatenate(
            [np.asarray(lp[k]["w"], np.float32)
             for k in ("q", "k", "v")], axis=1)
        sd[f"{b}.attn.c_attn.bias"] = np.concatenate(
            [np.asarray(lp[k]["b"], np.float32)
             for k in ("q", "k", "v")])
        put_lin(f"{b}.attn.c_proj", lp["o"], conv1d=True)
        put_ln(f"{b}.ln_2", lp["ln2"])
        put_lin(f"{b}.mlp.c_fc", lp["fc"], conv1d=True)
        put_lin(f"{b}.mlp.c_proj", lp["proj"], conv1d=True)
    sd["text_embedding.weight"] = np.asarray(params["text_emb"],
                                             np.float32)
    sd["mel_embedding.weight"] = np.asarray(params["mel_emb"],
                                            np.float32)
    sd["text_pos_embedding.emb.weight"] = np.asarray(
        params["text_pos"], np.float32)
    sd["mel_pos_embedding.emb.weight"] = np.asarray(
        params["mel_pos"], np.float32)
    sd["speed_emb.weight"] = np.asarray(params["speed_emb"],
                                        np.float32)
    put_ln("gpt.ln_f", params["ln_f"])
    if "final_norm" in params:
        put_ln("final_norm", params["final_norm"])
    else:
        d = np.asarray(params["ln_f"]["w"]).shape[0]
        sd["final_norm.weight"] = np.ones(d, np.float32)
        sd["final_norm.bias"] = np.zeros(d, np.float32)
    put_lin("mel_head", params["mel_head"])
    put_lin("emovec_layer", params["emovec_layer"])
    put_lin("emo_layer", params["emo_layer"])
    return sd
