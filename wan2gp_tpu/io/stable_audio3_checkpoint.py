"""Stable Audio 3 checkpoint loading.

Key space (reference models/TTS/stable_audio3/models/dit.py
DiffusionTransformer + transformer.py ContinuousTransformer /
TransformerBlock / Attention / FeedForward / RMSNorm):

  preprocess_conv.weight                     Conv1d io->io k1, no bias
  postprocess_conv.weight
  to_timestep_embed.{0,2}.{weight,bias}
  to_cond_embed.{0,2}.weight                 (bias=False)
  to_global_embed.{0,2}.weight
  transformer.project_in.weight / project_out.weight
  transformer.memory_tokens
  transformer.global_cond_embedder.{0,2}.{weight,bias}
  transformer.layers.N.
      pre_norm.gamma
      self_attn.to_qkv.weight                (dim*3, or dim*5 when
                                              differential)
      self_attn.{q_norm,k_norm}.gamma
      self_attn.to_out.weight
      cross_attend_norm.gamma
      cross_attn.to_q.weight                 (dim, or dim*2 diff)
      cross_attn.to_kv.weight                (dim*2, or dim*3 diff)
      cross_attn.{q_norm,k_norm}.gamma
      cross_attn.to_out.weight
      ff_norm.gamma
      ff.ff.0.proj.{weight,bias}             GLU in (2*inner)
      ff.ff.2.{weight,bias}                  linear out
      to_scale_shift_gate                    [6*dim]
      to_local_embed.{0,2}.{weight,bias}

Common wrapper prefixes (pipeline StableAudio3MainModule / mmgp
save paths) are stripped.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
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


def load_sa3_dit_params(sd: Dict[str, np.ndarray], cfg,
                        dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """Map the reference state dict onto init_sa3_dit's tree.  Returns
    (params, leftover_keys)."""
    import jax

    sd = dict(sd)
    for pre in ("model.model.", "model.", "diffusion.",
                "main_model.model."):
        if any(k.startswith(pre + "transformer.layers.")
               for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

    d = cfg.embed

    def conv1(name):
        # Conv1d k1 [out, in, 1] -> [in, out]
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        return jnp.asarray(w[..., 0].T).astype(dtype)

    def mlp2(name, bias=True):
        return {"l1": _lin(sd, f"{name}.0", dtype),
                "l2": _lin(sd, f"{name}.2", dtype)}

    tf = "transformer"
    blocks = []
    for i in range(cfg.depth):
        b = f"{tf}.layers.{i}"
        lp = {
            "pre_norm": _vec(sd, f"{b}.pre_norm.gamma"),
            "qkv": _lin(sd, f"{b}.self_attn.to_qkv", dtype),
            "qn": _vec(sd, f"{b}.self_attn.q_norm.gamma"),
            "kn": _vec(sd, f"{b}.self_attn.k_norm.gamma"),
            "attn_out": _lin(sd, f"{b}.self_attn.to_out", dtype),
            "x_norm": _vec(sd, f"{b}.cross_attend_norm.gamma"),
            "ca_q": _lin(sd, f"{b}.cross_attn.to_q", dtype),
            "ca_kv": _lin(sd, f"{b}.cross_attn.to_kv", dtype),
            "ca_qn": _vec(sd, f"{b}.cross_attn.q_norm.gamma"),
            "ca_kn": _vec(sd, f"{b}.cross_attn.k_norm.gamma"),
            "ca_out": _lin(sd, f"{b}.cross_attn.to_out", dtype),
            "ff_norm": _vec(sd, f"{b}.ff_norm.gamma"),
            "ff1": _lin(sd, f"{b}.ff.ff.0.proj", dtype),
            "ff2": _lin(sd, f"{b}.ff.ff.2", dtype),
            "ssg": _vec(sd, f"{b}.to_scale_shift_gate").astype(dtype),
            "local1": _lin(sd, f"{b}.to_local_embed.0", dtype),
            "local2": _lin(sd, f"{b}.to_local_embed.2", dtype),
        }
        blocks.append(lp)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "project_in": _lin(sd, f"{tf}.project_in", dtype),
        "project_out": _lin(sd, f"{tf}.project_out", dtype),
        "preprocess": conv1("preprocess_conv"),
        "postprocess": conv1("postprocess_conv"),
        "t_embed": mlp2("to_timestep_embed"),
        "to_cond": mlp2("to_cond_embed"),
        "to_global": mlp2("to_global_embed"),
        "global_embedder": {
            "l1": _lin(sd, f"{tf}.global_cond_embedder.0", dtype),
            "l2": _lin(sd, f"{tf}.global_cond_embedder.2", dtype)},
        "memory": jnp.asarray(
            np.asarray(sd.pop(f"{tf}.memory_tokens"), np.float32)
        ).astype(dtype),
        "blocks": stacked,
    }
    return params, sorted(sd.keys())


def export_sa3_dit_state(params, cfg) -> Dict[str, np.ndarray]:
    """Inverse of load_sa3_dit_params — torch-convention names from a
    params tree (round-trip testing and save-quantized parity)."""
    import jax

    sd: Dict[str, np.ndarray] = {}

    def put_lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["w"], np.float32).T
        if "b" in p:
            sd[f"{name}.bias"] = np.asarray(p["b"], np.float32)

    def put_vec(name, v):
        sd[name] = np.asarray(v, np.float32)

    tf = "transformer"
    put_lin(f"{tf}.project_in", params["project_in"])
    put_lin(f"{tf}.project_out", params["project_out"])
    sd["preprocess_conv.weight"] = np.asarray(
        params["preprocess"], np.float32).T[:, :, None]
    sd["postprocess_conv.weight"] = np.asarray(
        params["postprocess"], np.float32).T[:, :, None]
    for name, p in (("to_timestep_embed", params["t_embed"]),
                    ("to_cond_embed", params["to_cond"]),
                    ("to_global_embed", params["to_global"])):
        put_lin(f"{name}.0", p["l1"])
        put_lin(f"{name}.2", p["l2"])
    put_lin(f"{tf}.global_cond_embedder.0",
            params["global_embedder"]["l1"])
    put_lin(f"{tf}.global_cond_embedder.2",
            params["global_embedder"]["l2"])
    put_vec(f"{tf}.memory_tokens", params["memory"])
    n = params["blocks"]["qkv"]["w"].shape[0]
    for i in range(n):
        lp = jax.tree.map(lambda a: a[i], params["blocks"])
        b = f"{tf}.layers.{i}"
        put_vec(f"{b}.pre_norm.gamma", lp["pre_norm"])
        put_lin(f"{b}.self_attn.to_qkv", lp["qkv"])
        put_vec(f"{b}.self_attn.q_norm.gamma", lp["qn"])
        put_vec(f"{b}.self_attn.k_norm.gamma", lp["kn"])
        put_lin(f"{b}.self_attn.to_out", lp["attn_out"])
        put_vec(f"{b}.cross_attend_norm.gamma", lp["x_norm"])
        put_lin(f"{b}.cross_attn.to_q", lp["ca_q"])
        put_lin(f"{b}.cross_attn.to_kv", lp["ca_kv"])
        put_vec(f"{b}.cross_attn.q_norm.gamma", lp["ca_qn"])
        put_vec(f"{b}.cross_attn.k_norm.gamma", lp["ca_kn"])
        put_lin(f"{b}.cross_attn.to_out", lp["ca_out"])
        put_vec(f"{b}.ff_norm.gamma", lp["ff_norm"])
        put_lin(f"{b}.ff.ff.0.proj", lp["ff1"])
        put_lin(f"{b}.ff.ff.2", lp["ff2"])
        put_vec(f"{b}.to_scale_shift_gate", lp["ssg"])
        put_lin(f"{b}.to_local_embed.0", lp["local1"])
        put_lin(f"{b}.to_local_embed.2", lp["local2"])
    return sd
