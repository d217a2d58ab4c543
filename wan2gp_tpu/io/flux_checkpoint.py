"""Flux checkpoint conversion (BFL key layout -> our param tree).

Key space (reference models/flux/model.py module names; standard FLUX.1
safetensors): img_in / txt_in / time_in.{in,out}_layer / vector_in /
guidance_in, double_blocks.N.{img,txt}_{mod.lin,attn.qkv,attn.norm.
{query,key}_norm.scale,attn.proj,mlp.0,mlp.2}, single_blocks.N.
{linear1,linear2,norm.{query,key}_norm.scale,modulation.lin},
final_layer.{linear,adaLN_modulation.1}.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax
import jax.numpy as jnp
import ml_dtypes


def _t(x):
    return np.ascontiguousarray(np.asarray(x).T)


def _lin(sd, prefix, dtype, bias=True):
    w = np.asarray(sd.pop(f"{prefix}.weight"), np.float32).T
    p = {"w": jnp.asarray(w.astype(
        ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32))}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = jnp.asarray(np.asarray(sd.pop(f"{prefix}.bias"),
                                        np.float32))
    return p


def _vec(sd, key):
    return jnp.asarray(np.asarray(sd.pop(key), np.float32))


def normalize_flux_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for prefix in ("model.diffusion_model.", "model."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        out[k] = v
    return out


def load_flux_params(sd: Dict[str, np.ndarray], cfg,
                     dtype=jnp.bfloat16):
    """cfg: FluxConfig.  Returns (params, leftover_keys)."""
    sd = dict(sd)

    def embedder(prefix):
        return {"in": _lin(sd, f"{prefix}.in_layer", dtype),
                "out": _lin(sd, f"{prefix}.out_layer", dtype)}

    def stream(i, name):
        pre = f"double_blocks.{i}.{name}"
        return {
            "mod": _lin(sd, f"{pre}_mod.lin", dtype),
            "qkv": _lin(sd, f"{pre}_attn.qkv", dtype),
            "norm_q": _vec(sd, f"{pre}_attn.norm.query_norm.scale"),
            "norm_k": _vec(sd, f"{pre}_attn.norm.key_norm.scale"),
            "proj": _lin(sd, f"{pre}_attn.proj", dtype),
            "mlp1": _lin(sd, f"{pre}_mlp.0", dtype),
            "mlp2": _lin(sd, f"{pre}_mlp.2", dtype),
        }

    def double_block(i):
        return {"img": stream(i, "img"), "txt": stream(i, "txt")}

    def single_block(i):
        pre = f"single_blocks.{i}"
        return {
            "mod": _lin(sd, f"{pre}.modulation.lin", dtype),
            "linear1": _lin(sd, f"{pre}.linear1", dtype),
            "linear2": _lin(sd, f"{pre}.linear2", dtype),
            "norm_q": _vec(sd, f"{pre}.norm.query_norm.scale"),
            "norm_k": _vec(sd, f"{pre}.norm.key_norm.scale"),
        }

    def stack(items):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

    params: Dict[str, Any] = {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_in": _lin(sd, "txt_in", dtype),
        "time_in": embedder("time_in"),
        "vector_in": embedder("vector_in"),
        "double_blocks": stack([double_block(i) for i in range(cfg.depth)]),
        "single_blocks": stack([single_block(i)
                                for i in range(cfg.depth_single_blocks)]),
        "final": {
            "mod": _lin(sd, "final_layer.adaLN_modulation.1", dtype),
            "linear": _lin(sd, "final_layer.linear", dtype),
        },
    }
    if cfg.guidance_embed and "guidance_in.in_layer.weight" in sd:
        params["guidance_in"] = embedder("guidance_in")
    return params, sorted(sd.keys())


# ---------------------------------------------------------------------------
# Flux 2D autoencoder (reference modules/autoencoder.py key space)
# ---------------------------------------------------------------------------

def _c2(sd, prefix):
    w = np.asarray(sd.pop(f"{prefix}.weight"), np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "b": _vec(sd, f"{prefix}.bias")}


def _norm(sd, prefix):
    return {"w": _vec(sd, f"{prefix}.weight"),
            "b": _vec(sd, f"{prefix}.bias")}


def load_flux_vae_params(sd: Dict[str, np.ndarray], cfg):
    """cfg: FluxVAEConfig.  AE key space: encoder.down.N.block.M,
    encoder.mid.{block_1,attn_1,block_2}, conv_in/out, norm_out; decoder.up
    mirrored (autoencoder.py:109-263)."""
    sd = dict(sd)
    for k in list(sd):
        if k.startswith(("ae.", "vae.")):
            sd[k.split(".", 1)[1]] = sd.pop(k)

    def res(prefix):
        p = {"norm1": _norm(sd, f"{prefix}.norm1"),
             "conv1": _c2(sd, f"{prefix}.conv1"),
             "norm2": _norm(sd, f"{prefix}.norm2"),
             "conv2": _c2(sd, f"{prefix}.conv2")}
        if f"{prefix}.nin_shortcut.weight" in sd:
            p["shortcut"] = _c2(sd, f"{prefix}.nin_shortcut")
        return p

    def attn(prefix):
        return {"norm": _norm(sd, f"{prefix}.norm"),
                "q": _c2(sd, f"{prefix}.q"),
                "k": _c2(sd, f"{prefix}.k"),
                "v": _c2(sd, f"{prefix}.v"),
                "proj": _c2(sd, f"{prefix}.proj_out")}

    n_res = len(cfg.ch_mult)
    enc_down = []
    for i in range(n_res):
        stage = {"blocks": [res(f"encoder.down.{i}.block.{j}")
                            for j in range(cfg.num_res_blocks)]}
        if i != n_res - 1:
            stage["down"] = {"conv": _c2(sd, f"encoder.down.{i}.downsample.conv")}
        enc_down.append(stage)
    dec_up = []
    for i in range(n_res):
        stage = {"blocks": [res(f"decoder.up.{i}.block.{j}")
                            for j in range(cfg.num_res_blocks + 1)]}
        if i != 0:
            stage["up"] = {"conv": _c2(sd, f"decoder.up.{i}.upsample.conv")}
        dec_up.append(stage)

    def mid(prefix):
        return {"block_1": res(f"{prefix}.block_1"),
                "attn_1": attn(f"{prefix}.attn_1"),
                "block_2": res(f"{prefix}.block_2")}

    params = {
        "encoder": {"conv_in": _c2(sd, "encoder.conv_in"),
                    "down": enc_down, "mid": mid("encoder.mid"),
                    "norm_out": _norm(sd, "encoder.norm_out"),
                    "conv_out": _c2(sd, "encoder.conv_out")},
        "decoder": {"conv_in": _c2(sd, "decoder.conv_in"),
                    "mid": mid("decoder.mid"), "up": dec_up,
                    "norm_out": _norm(sd, "decoder.norm_out"),
                    "conv_out": _c2(sd, "decoder.conv_out")},
    }
    return params, sorted(sd.keys())


# ---------------------------------------------------------------------------
# CLIP-L text encoder (HF CLIPTextModel key space)
# ---------------------------------------------------------------------------

def load_clip_text_params(sd: Dict[str, np.ndarray], cfg,
                          dtype=jnp.float32):
    """cfg: ClipTextConfig.  HF keys: text_model.embeddings.*,
    text_model.encoder.layers.N.{self_attn.{q,k,v,out}_proj,
    layer_norm1/2, mlp.fc1/fc2}, text_model.final_layer_norm."""
    sd = {k[len("text_model."):] if k.startswith("text_model.") else k: v
          for k, v in sd.items()}
    sd.pop("embeddings.position_ids", None)

    def block(i):
        pre = f"encoder.layers.{i}"
        return {
            "ln1": _norm(sd, f"{pre}.layer_norm1"),
            "attn": {
                "q": _lin(sd, f"{pre}.self_attn.q_proj", dtype),
                "k": _lin(sd, f"{pre}.self_attn.k_proj", dtype),
                "v": _lin(sd, f"{pre}.self_attn.v_proj", dtype),
                "o": _lin(sd, f"{pre}.self_attn.out_proj", dtype),
            },
            "ln2": _norm(sd, f"{pre}.layer_norm2"),
            "mlp": {"fc1": _lin(sd, f"{pre}.mlp.fc1", dtype),
                    "fc2": _lin(sd, f"{pre}.mlp.fc2", dtype)},
        }

    params = {
        "token_embedding": jnp.asarray(np.asarray(
            sd.pop("embeddings.token_embedding.weight"), np.float32)),
        "position_embedding": jnp.asarray(np.asarray(
            sd.pop("embeddings.position_embedding.weight"), np.float32)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs),
                               *[block(i) for i in range(cfg.num_layers)]),
        "final_ln": _norm(sd, "final_layer_norm"),
    }
    return params, sorted(sd.keys())
