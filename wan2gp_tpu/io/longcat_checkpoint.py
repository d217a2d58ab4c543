"""LongCat-Video DiT checkpoint mapping.

Torch key space per /root/reference/models/longcat/modules/
{longcat_video_dit.py,blocks.py,attention.py}: x_embedder.proj (Conv3d
kernel=stride=patch), t_embedder.mlp.{0,2}, y_embedder.y_proj.{0,2},
blocks.N.{adaLN_modulation.1, pre_crs_attn_norm, attn.{qkv,q_norm,
k_norm,proj}, cross_attn.{q_linear,kv_linear,q_norm,k_norm,proj},
ffn.{w1,w2,w3}}, final_layer.{linear, adaLN_modulation.1}.
mod_norm_attn / mod_norm_ffn / norm_final carry no parameters
(elementwise_affine=False).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def load_longcat_params(sd: Dict[str, np.ndarray], cfg,
                        dtype=jnp.bfloat16) -> Tuple[Dict[str, Any], list]:
    sd = dict(sd)

    def mat(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                      np.float32).T).astype(dtype)

    def lin(name):
        return {"w": mat(name),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name),
                                      np.float32)).astype(dtype)

    def block(i):
        pre = f"blocks.{i}"
        avatar = f"{pre}.audio_adaLN_modulation.1.weight" in sd
        extra = {} if not avatar else {
            # LongCat Avatar audio branch
            # (modules/avatar/longcat_video_dit_avatar.py:48-91)
            "audio_adaln": lin(f"{pre}.audio_adaLN_modulation.1"),
            "pre_video_norm": {
                "w": vec(f"{pre}.pre_video_crs_attn_norm.weight"),
                "b": vec(f"{pre}.pre_video_crs_attn_norm.bias")},
            "pre_audio_norm": {
                "w": vec(f"{pre}.pre_audio_crs_attn_norm.weight"),
                "b": vec(f"{pre}.pre_audio_crs_attn_norm.bias")},
            "audio_cross": {
                "q": lin(f"{pre}.audio_cross_attn.q_linear"),
                "kv": lin(f"{pre}.audio_cross_attn.kv_linear"),
                "q_norm": vec(f"{pre}.audio_cross_attn.q_norm.weight"),
                "k_norm": vec(f"{pre}.audio_cross_attn.k_norm.weight"),
                "proj": lin(f"{pre}.audio_cross_attn.proj")}}
        return {**extra, "adaln": lin(f"{pre}.adaLN_modulation.1"),
                "attn": {"qkv": lin(f"{pre}.attn.qkv"),
                         "q_norm": vec(f"{pre}.attn.q_norm.weight"),
                         "k_norm": vec(f"{pre}.attn.k_norm.weight"),
                         "proj": lin(f"{pre}.attn.proj")},
                "cross_norm": {"w": vec(f"{pre}.pre_crs_attn_norm.weight"),
                               "b": vec(f"{pre}.pre_crs_attn_norm.bias")},
                "cross": {"q": lin(f"{pre}.cross_attn.q_linear"),
                          "kv": lin(f"{pre}.cross_attn.kv_linear"),
                          "q_norm": vec(f"{pre}.cross_attn.q_norm.weight"),
                          "k_norm": vec(f"{pre}.cross_attn.k_norm.weight"),
                          "proj": lin(f"{pre}.cross_attn.proj")},
                "w1": mat(f"{pre}.ffn.w1"),
                "w2": mat(f"{pre}.ffn.w2"),
                "w3": mat(f"{pre}.ffn.w3")}

    # Conv3d [D, C, pt, ph, pw] -> linear over (c, pt, ph, pw) features
    xw = np.asarray(sd.pop("x_embedder.proj.weight"), np.float32)
    x_embed = {"w": jnp.asarray(xw.reshape(xw.shape[0], -1).T).astype(dtype),
               "b": vec("x_embedder.proj.bias")}

    blocks = jax.tree.map(lambda *xs: jnp.stack(xs),
                          *[block(i) for i in range(cfg.n_layers)])
    params = {
        "x_embed": x_embed,
        "t_embed": {"mlp0": lin("t_embedder.mlp.0"),
                    "mlp2": lin("t_embedder.mlp.2")},
        "y_embed": {"fc1": lin("y_embedder.y_proj.0"),
                    "fc2": lin("y_embedder.y_proj.2")},
        "blocks": blocks,
        "final": {"adaln": lin("final_layer.adaLN_modulation.1"),
                  "linear": lin("final_layer.linear")},
    }
    if "audio_proj.proj1.weight" in sd:
        # AudioProjModel (avatar/blocks.py:8-40) — the multitalk layout
        params["audio_proj"] = {
            "proj1": lin("audio_proj.proj1"),
            "proj1_vf": lin("audio_proj.proj1_vf"),
            "proj2": lin("audio_proj.proj2"),
            "proj3": lin("audio_proj.proj3"),
            "norm": {"w": vec("audio_proj.norm.weight"),
                     "b": vec("audio_proj.norm.bias")}}
    leftover = [k for k in sd if "rope" not in k and "freqs" not in k]
    return params, sorted(leftover)
