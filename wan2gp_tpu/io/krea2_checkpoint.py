"""Krea2 checkpoint loading (SingleStreamDiT module key space).

Key layout from the reference model definition
(/root/reference/models/krea2/krea2_mmdit.py SingleStreamDiT.__init__,
checkpoints optionally prefixed "model.diffusion_model.",
krea2_main.py:30,38): first, tmlp.{0,2}, tproj.1, txtfusion.{
layerwise_blocks,refiner_blocks}.N.*, txtfusion.projector, txtmlp.{0,1,3},
blocks.N.{mod.lin, prenorm.scale, postnorm.scale, attn.{wq,wk,wv,gate,wo},
attn.qknorm.{qnorm,knorm}.scale, mlp.{gate,up,down}}, last.{norm.scale,
linear, modulation.lin}.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_PREFIX = "model.diffusion_model."


def normalize_krea2_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith(_PREFIX) for k in sd):
        sd = {k[len(_PREFIX):] if k.startswith(_PREFIX) else k: v
              for k, v in sd.items()}
    return sd


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"))
    p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _rms(sd, name):
    return jnp.asarray(np.asarray(sd.pop(f"{name}.scale"), np.float32))


def _attn(sd, pre, dtype):
    return {"wq": _lin(sd, f"{pre}.wq", dtype),
            "wk": _lin(sd, f"{pre}.wk", dtype),
            "wv": _lin(sd, f"{pre}.wv", dtype),
            "gate": _lin(sd, f"{pre}.gate", dtype),
            "wo": _lin(sd, f"{pre}.wo", dtype),
            "qnorm": _rms(sd, f"{pre}.qknorm.qnorm"),
            "knorm": _rms(sd, f"{pre}.qknorm.knorm")}


def _mlp(sd, pre, dtype):
    return {"gate": _lin(sd, f"{pre}.gate", dtype),
            "up": _lin(sd, f"{pre}.up", dtype),
            "down": _lin(sd, f"{pre}.down", dtype)}


def _fusion_block(sd, pre, dtype):
    return {"prenorm": _rms(sd, f"{pre}.prenorm"),
            "postnorm": _rms(sd, f"{pre}.postnorm"),
            "attn": _attn(sd, f"{pre}.attn", dtype),
            "mlp": _mlp(sd, f"{pre}.mlp", dtype)}


def load_krea2_params(sd: Dict[str, np.ndarray], cfg,
                      dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: Krea2Config.  Returns (params, leftover_keys)."""
    sd = dict(normalize_krea2_sd(sd))

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    blocks = []
    for i in range(cfg.layers):
        pre = f"blocks.{i}"
        blocks.append({
            "mod": jnp.asarray(np.asarray(sd.pop(f"{pre}.mod.lin"),
                                          np.float32)),
            "prenorm": _rms(sd, f"{pre}.prenorm"),
            "postnorm": _rms(sd, f"{pre}.postnorm"),
            "attn": _attn(sd, f"{pre}.attn", dtype),
            "mlp": _mlp(sd, f"{pre}.mlp", dtype),
        })

    lw = [_fusion_block(sd, f"txtfusion.layerwise_blocks.{i}", dtype)
          for i in range(cfg.n_fusion_blocks)]
    rf = [_fusion_block(sd, f"txtfusion.refiner_blocks.{i}", dtype)
          for i in range(cfg.n_fusion_blocks)]

    params = {
        "first": _lin(sd, "first", dtype),
        "tmlp": {"fc1": _lin(sd, "tmlp.0", dtype),
                 "fc2": _lin(sd, "tmlp.2", dtype)},
        "tproj": _lin(sd, "tproj.1", dtype),
        "txtfusion": {
            "layerwise": stack(lw),
            "projector": _lin(sd, "txtfusion.projector", dtype),
            "refiner": stack(rf),
        },
        "txtmlp": {"norm": _rms(sd, "txtmlp.0"),
                   "fc1": _lin(sd, "txtmlp.1", dtype),
                   "fc2": _lin(sd, "txtmlp.3", dtype)},
        "last": {"norm": _rms(sd, "last.norm"),
                 "linear": _lin(sd, "last.linear", dtype),
                 "mod": jnp.asarray(np.asarray(sd.pop("last.modulation.lin"),
                                               np.float32))},
        "blocks": stack(blocks),
    }
    return params, sorted(sd.keys())
