"""Z-Image checkpoint loading (ZImageTransformer2DModel key space).

Key layout (/root/reference/models/z_image/z_image_transformer2d.py):
all_x_embedder.{p}-{f}., all_final_layer.{p}-{f}.{linear,
adaLN_modulation.1}, t_embedder.mlp.{0,2}, cap_embedder.{0,1},
x_pad_token/cap_pad_token [1, dim], and per block (noise_refiner.N /
context_refiner.N / layers.N): attention.{to_q,to_k,to_v,to_out.0,
norm_q,norm_k}, feed_forward.{w1,w2,w3}, attention_norm1/2, ffn_norm1/2,
adaLN_modulation.0 (modulated blocks only).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"))
    p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _w(sd, name):
    return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"), np.float32))


def _block(sd, pre, dtype, modulated):
    p = {
        "to_q": _lin(sd, f"{pre}.attention.to_q", dtype),
        "to_k": _lin(sd, f"{pre}.attention.to_k", dtype),
        "to_v": _lin(sd, f"{pre}.attention.to_v", dtype),
        "to_out": _lin(sd, f"{pre}.attention.to_out.0", dtype),
        "norm_q": _w(sd, f"{pre}.attention.norm_q"),
        "norm_k": _w(sd, f"{pre}.attention.norm_k"),
        "attention_norm1": _w(sd, f"{pre}.attention_norm1"),
        "attention_norm2": _w(sd, f"{pre}.attention_norm2"),
        "ffn_norm1": _w(sd, f"{pre}.ffn_norm1"),
        "ffn_norm2": _w(sd, f"{pre}.ffn_norm2"),
        "w1": _lin(sd, f"{pre}.feed_forward.w1", dtype),
        "w2": _lin(sd, f"{pre}.feed_forward.w2", dtype),
        "w3": _lin(sd, f"{pre}.feed_forward.w3", dtype),
    }
    if modulated:
        p["adaln"] = _lin(sd, f"{pre}.adaLN_modulation.0", dtype)
    return p


def load_zimage_params(sd: Dict[str, np.ndarray], cfg,
                       dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: ZImageConfig.  Returns (params, leftover)."""
    sd = dict(sd)
    pk = f"{cfg.patch}-1"

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    params = {
        "x_embedder": _lin(sd, f"all_x_embedder.{pk}", dtype),
        "cap_embedder": {"norm": _w(sd, "cap_embedder.0"),
                         "lin": _lin(sd, "cap_embedder.1", dtype)},
        "t_embedder": {"fc1": _lin(sd, "t_embedder.mlp.0", dtype),
                       "fc2": _lin(sd, "t_embedder.mlp.2", dtype)},
        "x_pad_token": jnp.asarray(np.asarray(
            sd.pop("x_pad_token"), np.float32).reshape(-1)).astype(dtype),
        "cap_pad_token": jnp.asarray(np.asarray(
            sd.pop("cap_pad_token"), np.float32).reshape(-1)).astype(dtype),
        "noise_refiner": stack([
            _block(sd, f"noise_refiner.{i}", dtype, True)
            for i in range(cfg.n_refiner_layers)]),
        "context_refiner": stack([
            _block(sd, f"context_refiner.{i}", dtype, False)
            for i in range(cfg.n_refiner_layers)]),
        "layers": stack([
            _block(sd, f"layers.{i}", dtype, True)
            for i in range(cfg.n_layers)]),
        "final": {
            "linear": _lin(sd, f"all_final_layer.{pk}.linear", dtype),
            "adaln": _lin(sd, f"all_final_layer.{pk}.adaLN_modulation.1",
                          dtype)},
    }
    if getattr(cfg, "control", False) and \
            f"control_all_x_embedder.{pk}.weight" in sd:
        # control branch keys (z_image_transformer2d.py:561-594)
        params["control_x_embedder"] = _lin(
            sd, f"control_all_x_embedder.{pk}", dtype)
        params["control_noise_refiner"] = stack([
            _block(sd, f"control_noise_refiner.{i}", dtype, True)
            for i in range(cfg.n_control_refiner)])
        ctrl = []
        for j in range(len(cfg.control_places)):
            bp = _block(sd, f"control_layers.{j}", dtype, True)
            bp["after_proj"] = _lin(sd, f"control_layers.{j}.after_proj",
                                    dtype)
            ctrl.append(bp)
        params["control_layers"] = stack(ctrl)
        params["control_before_proj"] = _lin(
            sd, "control_layers.0.before_proj", dtype)
    return params, sorted(sd.keys())
