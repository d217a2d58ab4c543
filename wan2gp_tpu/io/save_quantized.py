"""Quantized checkpoint export (reference wgp.py:3410 save_quantized_model /
--save-quantized): quantize a loaded bf16 param tree to int8 and write a
quanto-layout safetensors the loader round-trips.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from ..ops.quant import quantize_int8
from .safetensors_reader import save_safetensors


def _to_np(x):
    a = np.asarray(x)
    if a.dtype.name == "bfloat16":
        return a  # ml_dtypes handles serialization
    return a


def export_quantized_wan_dit(params: Dict[str, Any], path: str,
                             quantize_embeddings: bool = False):
    """Write a torch/quanto-layout int8 safetensors from our param tree.

    Linear kernels under blocks/* become weight._data int8 [out, in] +
    weight._scale [out, 1]; everything else stays high precision with the
    reference key names (invertible by io.wan_checkpoint)."""
    sd: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p, quantize=True):
        if "w_q" in p:
            sd[f"{prefix}.weight._data"] = np.ascontiguousarray(
                np.asarray(p["w_q"]).T)
            sd[f"{prefix}.weight._scale"] = np.asarray(
                p["scale"], np.float32).reshape(-1, 1)
        elif quantize:
            w = np.asarray(p["w"], np.float32)
            w_q, scale = quantize_int8(w)
            sd[f"{prefix}.weight._data"] = np.ascontiguousarray(w_q.T)
            sd[f"{prefix}.weight._scale"] = scale.reshape(-1, 1)
        else:
            sd[f"{prefix}.weight"] = _to_np(np.asarray(p["w"]).T)
        if "b" in p:
            sd[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)

    n_layers = params["blocks"]["modulation"].shape[0]

    pe = params["patch_embedding"]
    w = np.asarray(pe["w"], np.float32).T  # [dim, in*patch]
    sd["patch_embedding.weight"] = w.reshape(w.shape[0], -1, 1, 2, 2)
    sd["patch_embedding.bias"] = np.asarray(pe["b"], np.float32)
    put_linear("text_embedding.0", params["text_embedding"]["fc1"],
               quantize=False)
    put_linear("text_embedding.2", params["text_embedding"]["fc2"],
               quantize=False)
    put_linear("time_embedding.0", params["time_embedding"]["fc1"],
               quantize=False)
    put_linear("time_embedding.2", params["time_embedding"]["fc2"],
               quantize=False)
    put_linear("time_projection.1", params["time_projection"],
               quantize=False)

    def layer_slice(tree, i):
        import jax
        return jax.tree.map(lambda x: x[i], tree)

    for i in range(n_layers):
        bp = layer_slice(params["blocks"], i)
        for att in ("self_attn", "cross_attn"):
            ap = bp[att]
            for m in ("q", "k", "v", "o"):
                put_linear(f"blocks.{i}.{att}.{m}", ap[m])
            sd[f"blocks.{i}.{att}.norm_q.weight"] = np.asarray(
                ap["norm_q"], np.float32)
            sd[f"blocks.{i}.{att}.norm_k.weight"] = np.asarray(
                ap["norm_k"], np.float32)
            if "k_img" in ap:
                put_linear(f"blocks.{i}.{att}.k_img", ap["k_img"])
                put_linear(f"blocks.{i}.{att}.v_img", ap["v_img"])
                sd[f"blocks.{i}.{att}.norm_k_img.weight"] = np.asarray(
                    ap["norm_k_img"], np.float32)
        sd[f"blocks.{i}.norm3.weight"] = np.asarray(bp["norm3"]["w"],
                                                    np.float32)
        sd[f"blocks.{i}.norm3.bias"] = np.asarray(bp["norm3"]["b"],
                                                  np.float32)
        put_linear(f"blocks.{i}.ffn.0", bp["ffn"]["fc1"])
        put_linear(f"blocks.{i}.ffn.2", bp["ffn"]["fc2"])
        sd[f"blocks.{i}.modulation"] = np.asarray(
            bp["modulation"], np.float32)[None]
    put_linear("head.head", params["head"]["head"], quantize=False)
    sd["head.modulation"] = np.asarray(params["head"]["modulation"],
                                       np.float32)[None]
    save_safetensors(path, sd, metadata={"format": "pt",
                                         "quantization": "quanto_int8"})
    return path
