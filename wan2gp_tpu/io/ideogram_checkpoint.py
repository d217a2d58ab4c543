"""Ideogram 4 checkpoint mapping.

Torch key space per /root/reference/models/ideogram4/modeling_ideogram4.py
(optionally wrapped in a ``model.diffusion_model.`` prefix,
ideogram4_main.py:26) — two separate checkpoints exist, one for the
conditional and one for the unconditional transformer.  Attention weights
may ship fused as ``attention.qkv.weight`` [3D, D] (the reference splits
with get_linear_split_map) or already split q/k/v.

The Flux2 VAE (models/flux/modules/autoencoder_flux2.py) shares the BFL
AutoencoderKL key space already consumed by load_flux_vae_params; its
extra 1x1 quant convs pass through as explicit pre/post convs (folding
the biased 1x1 into the zero-padding 3x3 would be wrong on the border)
and its BatchNorm latent statistics are returned separately (the
Ideogram path replaces them with latent_norm.py shift/scale).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from .flux_checkpoint import _fold_1x1  # noqa: F401 (re-export)

_WRAPPER = "model.diffusion_model."


def load_ideogram4_params(sd: Dict[str, np.ndarray], cfg,
                          dtype=jnp.bfloat16) -> Tuple[Dict[str, Any], list]:
    sd = {k[len(_WRAPPER):] if k.startswith(_WRAPPER) else k: v
          for k, v in sd.items()}

    def mat(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                      np.float32).T.astype(np.float32)
                           ).astype(dtype)

    def lin(name):
        return {"w": mat(name),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name),
                                      np.float32)).astype(dtype)

    def layer(i):
        pre = f"layers.{i}"
        if f"{pre}.attention.qkv.weight" in sd:
            qkv = np.asarray(sd.pop(f"{pre}.attention.qkv.weight"),
                             np.float32)
            q, k, v = np.split(qkv, 3, axis=0)
            qm, km, vm = (jnp.asarray(x.T).astype(dtype) for x in (q, k, v))
        else:
            qm = mat(f"{pre}.attention.q")
            km = mat(f"{pre}.attention.k")
            vm = mat(f"{pre}.attention.v")
        return {"q": qm, "k": km, "v": vm,
                "o": mat(f"{pre}.attention.o"),
                "norm_q": vec(f"{pre}.attention.norm_q.weight"),
                "norm_k": vec(f"{pre}.attention.norm_k.weight"),
                "attention_norm1": vec(f"{pre}.attention_norm1.weight"),
                "attention_norm2": vec(f"{pre}.attention_norm2.weight"),
                "ffn_norm1": vec(f"{pre}.ffn_norm1.weight"),
                "ffn_norm2": vec(f"{pre}.ffn_norm2.weight"),
                "w1": mat(f"{pre}.feed_forward.w1"),
                "w2": mat(f"{pre}.feed_forward.w2"),
                "w3": mat(f"{pre}.feed_forward.w3"),
                "adaln": lin(f"{pre}.adaln_modulation")}

    import jax
    layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[layer(i) for i in range(cfg.n_layers)])
    params = {
        "input_proj": lin("input_proj"),
        "llm_cond_norm": vec("llm_cond_norm.weight"),
        "llm_cond_proj": lin("llm_cond_proj"),
        "t_embedding": {"mlp_in": lin("t_embedding.mlp_in"),
                        "mlp_out": lin("t_embedding.mlp_out")},
        "adaln_proj": lin("adaln_proj"),
        "embed_image_indicator": vec("embed_image_indicator.weight"),
        "layers": layers,
        "final_layer": {"linear": lin("final_layer.linear"),
                        "adaln": lin("final_layer.adaln_modulation")},
    }
    leftover = [k for k in sd if "rotary_emb" not in k]
    return params, sorted(leftover)


def normalize_flux2_vae_sd(sd: Dict[str, np.ndarray]
                           ) -> Tuple[Dict[str, np.ndarray],
                                      Dict[str, np.ndarray]]:
    """Strip the Flux2 BatchNorm stats; quant convs pass through (picked
    up by load_flux_vae_params as decoder.pre_quant / encoder.post_quant).

    Returns (bfl_sd, bn_stats) where bn_stats holds running_mean /
    running_var for callers that need the VAE-native latent normalization
    (autoencoder_flux2.py:316-327)."""
    sd = dict(sd)
    bn = {}
    for k in ("bn.running_mean", "bn.running_var", "bn.num_batches_tracked"):
        if k in sd:
            bn[k.split(".", 1)[1]] = np.asarray(sd.pop(k))
    return sd, bn
