"""Hunyuan-Video DiT checkpoint loading (HYVideoDiffusionTransformer keys).

Key layout (/root/reference/models/hyvideo/modules/models.py:673-770):
img_in.proj (Conv3d patch embed), time_in.mlp.{0,2}, vector_in.{in_layer,
out_layer}, guidance_in.mlp.{0,2}, txt_in.{input_embedder, t_embedder.mlp
.{0,2}, c_embedder.linear_{1,2}, individual_token_refiner.blocks.N.{norm1,
self_attn_qkv, self_attn_q_norm/k_norm, self_attn_proj, norm2, mlp.fc1/fc2,
adaLN_modulation.1}}, double_blocks.N.{img_mod.linear, img_attn_qkv (or
split img_attn_q/k/v), img_attn_{q,k}_norm, img_attn_proj, img_mlp.fc1/fc2,
txt_*}, single_blocks.N.{linear1, linear2, q_norm, k_norm,
modulation.linear}, final_layer.{linear, adaLN_modulation.1}.
Quanto int8 entries (weight._data/_scale) are supported like the Wan
loader.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    wq = sd.pop(f"{name}.weight._data", None)
    if wq is not None:
        scale = np.asarray(sd.pop(f"{name}.weight._scale"), np.float32)
        p = {"w_q": jnp.asarray(np.asarray(wq).T),
             "scale": jnp.asarray(scale.reshape(-1))}
    else:
        w = np.asarray(sd.pop(f"{name}.weight"))
        p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _qkv(sd, pre, stream, dtype):
    """Fused {stream}_attn_qkv or split {stream}_attn_{q,k,v}."""
    if f"{pre}.{stream}_attn_qkv.weight" in sd or \
            f"{pre}.{stream}_attn_qkv.weight._data" in sd:
        return _lin(sd, f"{pre}.{stream}_attn_qkv", dtype)
    qs = [_lin(sd, f"{pre}.{stream}_attn_{m}", dtype) for m in "qkv"]
    p = {"w": jnp.concatenate([q["w"] for q in qs], axis=1)}
    if "b" in qs[0]:
        p["b"] = jnp.concatenate([q["b"] for q in qs])
    return p


def _w(sd, name):
    return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"), np.float32))


def _norm(sd, name):
    return {"w": _w(sd, name),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32))}


def _embed(sd, pre, dtype, hf_names=("mlp.0", "mlp.2")):
    return {"in": _lin(sd, f"{pre}.{hf_names[0]}", dtype),
            "out": _lin(sd, f"{pre}.{hf_names[1]}", dtype)}


def load_hunyuan_dit_params(sd: Dict[str, np.ndarray], cfg,
                            dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """cfg: HunyuanConfig.  Returns (params, leftover)."""
    sd = dict(sd)
    for pre in ("model.", "module."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}

    def stack(blocks):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    def stream(pre, which):
        return {
            "mod": _lin(sd, f"{pre}.{which}_mod.linear", dtype),
            "qkv": _qkv(sd, pre, which, dtype),
            "norm_q": _w(sd, f"{pre}.{which}_attn_q_norm"),
            "norm_k": _w(sd, f"{pre}.{which}_attn_k_norm"),
            "proj": _lin(sd, f"{pre}.{which}_attn_proj", dtype),
            "mlp1": _lin(sd, f"{pre}.{which}_mlp.fc1", dtype),
            "mlp2": _lin(sd, f"{pre}.{which}_mlp.fc2", dtype),
        }

    doubles = []
    for i in range(cfg.mm_double_blocks_depth):
        pre = f"double_blocks.{i}"
        doubles.append({"img": stream(pre, "img"),
                        "txt": stream(pre, "txt")})

    singles = []
    for i in range(cfg.mm_single_blocks_depth):
        pre = f"single_blocks.{i}"
        singles.append({
            "mod": _lin(sd, f"{pre}.modulation.linear", dtype),
            "linear1": _lin(sd, f"{pre}.linear1", dtype),
            "linear2": _lin(sd, f"{pre}.linear2", dtype),
            "norm_q": _w(sd, f"{pre}.q_norm"),
            "norm_k": _w(sd, f"{pre}.k_norm"),
        })

    refiners = []
    for i in range(cfg.refiner_depth):
        pre = f"txt_in.individual_token_refiner.blocks.{i}"
        refiners.append({
            "norm1": _norm(sd, f"{pre}.norm1"),
            "qkv": _lin(sd, f"{pre}.self_attn_qkv", dtype),
            "proj": _lin(sd, f"{pre}.self_attn_proj", dtype),
            "norm2": _norm(sd, f"{pre}.norm2"),
            "mlp1": _lin(sd, f"{pre}.mlp.fc1", dtype),
            "mlp2": _lin(sd, f"{pre}.mlp.fc2", dtype),
            "ada": _lin(sd, f"{pre}.adaLN_modulation.1", jnp.float32),
        })

    # Conv3d patch embed == linear on (c, pt, ph, pw)-flattened patches
    conv_w = np.asarray(sd.pop("img_in.proj.weight"), np.float32)
    img_in = {"w": jnp.asarray(conv_w.reshape(conv_w.shape[0], -1).T
                               ).astype(jnp.float32),
              "b": jnp.asarray(np.asarray(sd.pop("img_in.proj.bias"),
                                          np.float32))}

    params = {
        "img_in": img_in,
        "time_in": _embed(sd, "time_in", jnp.float32),
        "txt_refiner": {
            "input_embedder": _lin(sd, "txt_in.input_embedder", dtype),
            "t_embedder": _embed(sd, "txt_in.t_embedder", jnp.float32),
            "c_embedder": _embed(sd, "txt_in.c_embedder", jnp.float32,
                                 hf_names=("linear_1", "linear_2")),
            "blocks": stack(refiners),
        },
        "double_blocks": stack(doubles),
        "single_blocks": stack(singles) if singles else None,
        "final": {
            "mod": _lin(sd, "final_layer.adaLN_modulation.1", jnp.float32),
            "linear": _lin(sd, "final_layer.linear", jnp.float32)},
    }
    if cfg.text_pool and "vector_in.in_layer.weight" in sd:
        params["vector_in"] = {
            "in": _lin(sd, "vector_in.in_layer", jnp.float32),
            "out": _lin(sd, "vector_in.out_layer", jnp.float32)}
    if cfg.guidance_embed and "guidance_in.mlp.0.weight" in sd:
        params["guidance_in"] = _embed(sd, "guidance_in", jnp.float32)
    load_glyph_params(sd, params)
    load_custom_params(sd, params, cfg)
    return params, sorted(sd.keys())


def load_custom_params(sd: Dict[str, np.ndarray], params: Dict, cfg):
    """HunyuanCustom / Avatar modules riding in the dit checkpoint
    (models.py:773-816): ref_in/before_proj/motion/fps (avatar),
    bg_in/bg_proj (custom-edit), audio_proj + adapter blocks."""
    def conv_pe(name):
        w = np.asarray(sd.pop(f"{name}.proj.weight"), np.float32)
        return {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.proj.bias"), np.float32))}

    if "ref_in.proj.weight" in sd:
        params["ref_in"] = conv_pe("ref_in")
    if "bg_in.proj.weight" in sd:
        params["bg_in"] = conv_pe("bg_in")
        params["bg_proj"] = _lin(sd, "bg_proj", jnp.float32)
    if "before_proj.weight" in sd:
        params["before_proj"] = _lin(sd, "before_proj", jnp.float32)
    for name in ("motion_exp", "motion_pose", "fps_proj"):
        if f"{name}.mlp.0.weight" in sd:
            params[name] = _embed(sd, name, jnp.float32)
    if "audio_proj.proj1.weight" in sd:
        from ..models.hyvideo.custom import (load_audio_proj,
                                             load_audio_adapters,
                                             AUDIO_LAYERS_AVATAR,
                                             AUDIO_LAYERS_CUSTOM)
        params["audio_proj"] = load_audio_proj(sd)
        avatar = getattr(cfg, "avatar", False)
        prefix = ("audio_adapter_blocks" if avatar else "audio_models")
        if f"{prefix}.0.norm1.weight" not in sd:
            prefix = ("audio_models" if avatar
                      else "audio_adapter_blocks")
        params["audio_adapters"] = load_audio_adapters(
            sd, cfg.mm_double_blocks_depth,
            AUDIO_LAYERS_AVATAR if avatar else AUDIO_LAYERS_CUSTOM,
            prefix)
    return params


def load_glyph_params(sd: Dict[str, np.ndarray], params: Dict) -> Dict:
    """HV1.5 glyph branch keys: byt5_in ByT5Mapper (models.py:653,
    byT5/__init__.py:219) + cond_type_embedding (models.py:823).
    Consumes from `sd` in place; no-op when the keys are absent."""
    if "byt5_in.fc1.weight" in sd:
        params["byt5_in"] = {
            "ln_w": jnp.asarray(np.asarray(
                sd.pop("byt5_in.layernorm.weight"), np.float32)),
            "ln_b": jnp.asarray(np.asarray(
                sd.pop("byt5_in.layernorm.bias"), np.float32)),
            "fc1": _lin(sd, "byt5_in.fc1", jnp.float32),
            "fc2": _lin(sd, "byt5_in.fc2", jnp.float32),
            "fc3": _lin(sd, "byt5_in.fc3", jnp.float32),
        }
    if "cond_type_embedding.weight" in sd:
        params["cond_type_embedding"] = jnp.asarray(np.asarray(
            sd.pop("cond_type_embedding.weight"), np.float32))
    return params
