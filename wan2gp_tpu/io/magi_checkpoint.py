"""MAGI-Human DiT checkpoint mapping.

Torch key space per /root/reference/models/magi_human/checkpoint_schema.py
and dit_module.py: adapter.{video,audio,text}_embedder,
block.layers.N.attention.{pre_norm, linear_q[_modality], linear_k, linear_v,
linear_g, linear_proj, q_norm, k_norm}, block.layers.N.mlp.{pre_norm,
up_gate_proj[_modality], down_proj}, final_norm_{video,audio},
final_linear_{video,audio}.  Multi-modality layers (0-3, 36-39) may ship
either per-modality suffixed weights, a fused ``linear_qkv`` (rows
[q|k|v|g] per modality chunk), or concatenated norm weights [dim * 3].
RMS norm weights are stored minus-one (applied as w + 1).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.magi.dit import MagiConfig, MODALITIES


def load_magi_params(sd: Dict[str, np.ndarray], cfg: MagiConfig,
                     dtype=jnp.bfloat16) -> Tuple[Dict[str, Any], list]:
    sd = dict(sd)
    q_size = cfg.n_heads_q * cfg.head_dim
    kv_size = cfg.n_heads_kv * cfg.head_dim
    g_size = cfg.n_heads_q if cfg.attn_gating else 0

    # un-fuse linear_qkv if present (checkpoint_schema.py:49-84)
    for key in [k for k in sd if ".attention.linear_qkv." in k]:
        base, suffix = key.rsplit(".attention.linear_qkv", 1)
        li = int(base.split(".")[-1])
        mm = li in cfg.mm_layers
        val = np.asarray(sd.pop(key))
        chunks = np.split(val, 3, axis=0) if mm else [val]
        for mi, chunk in enumerate(chunks):
            tag = f"_{MODALITIES[mi]}" if mm else ""
            ofs = 0
            for nm, size in (("linear_q", q_size), ("linear_k", kv_size),
                             ("linear_v", kv_size), ("linear_g", g_size)):
                if size == 0:
                    continue
                sd[f"{base}.attention.{nm}{tag}{suffix}"] = \
                    chunk[ofs:ofs + size]
                ofs += size

    def mat(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                      np.float32).T).astype(dtype)

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name),
                                      np.float32)).astype(dtype)

    def norm(p, out_key, name, dim, mm):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        if mm and w.shape[0] == dim * 3:
            for mi, m in enumerate(MODALITIES):
                p[f"{out_key}_{m}"] = jnp.asarray(
                    w[mi * dim:(mi + 1) * dim]).astype(dtype)
        elif mm:
            for m in MODALITIES:
                p[f"{out_key}_{m}"] = jnp.asarray(w).astype(dtype)
        else:
            p[out_key] = jnp.asarray(w).astype(dtype)

    def linear(p, out_key, name, mm):
        if mm:
            for m in MODALITIES:
                p[f"{out_key}_{m}"] = mat(f"{name}_{m}")
        else:
            p[out_key] = mat(name)

    layers = []
    for li in range(cfg.n_layers):
        pre = f"block.layers.{li}"
        mm = li in cfg.mm_layers
        p: Dict[str, Any] = {}
        norm(p, "attn_norm", f"{pre}.attention.pre_norm", cfg.dim, mm)
        norm(p, "q_norm", f"{pre}.attention.q_norm", cfg.head_dim, mm)
        norm(p, "k_norm", f"{pre}.attention.k_norm", cfg.head_dim, mm)
        norm(p, "mlp_norm", f"{pre}.mlp.pre_norm", cfg.dim, mm)
        linear(p, "q", f"{pre}.attention.linear_q", mm)
        linear(p, "k", f"{pre}.attention.linear_k", mm)
        linear(p, "v", f"{pre}.attention.linear_v", mm)
        if cfg.attn_gating:
            linear(p, "g", f"{pre}.attention.linear_g", mm)
        linear(p, "proj", f"{pre}.attention.linear_proj", mm)
        linear(p, "up", f"{pre}.mlp.up_gate_proj", mm)
        linear(p, "down", f"{pre}.mlp.down_proj", mm)
        layers.append(p)

    def adapter(name):
        return {"w": mat(f"adapter.{name}_embedder"),
                "b": vec(f"adapter.{name}_embedder.bias")}

    params = {"adapter": {m: adapter(m) for m in MODALITIES},
              "layers": layers,
              "final_norm_video": vec("final_norm_video.weight"),
              "final_norm_audio": vec("final_norm_audio.weight"),
              "final_video": mat("final_linear_video"),
              "final_audio": mat("final_linear_audio")}
    leftover = [k for k in sd if "rope" not in k and ".bands" not in k]
    return params, sorted(leftover)
