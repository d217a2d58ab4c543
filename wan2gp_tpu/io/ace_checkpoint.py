"""ACE-Step checkpoint loading.

Key spaces:
- ACEStepTransformer2DModel (/root/reference/models/TTS/ace_step/models/
  ace_step_transformer.py:206): proj_in.early_conv_layers.{0,1,2},
  timestep_embedder.{linear_1,linear_2}, t_block.1, speaker_embedder,
  genre_embedder, lyric_embs, lyric_encoder.* (ConformerEncoder),
  lyric_proj, transformer_blocks.N.{attn,cross_attn}.{to_q,to_k,to_v,
  to_out.0}, transformer_blocks.N.ff.{inverted_conv,depth_conv,point_conv}
  .conv, transformer_blocks.N.scale_shift_table, final_layer.{linear,
  scale_shift_table}.  Training-only `projectors.*` / `add_{q,k,v}_proj`
  duplicates are dropped (the inference processor reads to_k/to_v,
  customer_attention_processor.py:336).
- MusicDCAE AutoencoderDC (music_dcae_pipeline.py:41): diffusers
  encoder/decoder conv stages, mapped shape-adaptively.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.T).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _c2(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    p = {"w": jnp.asarray(w.transpose(2, 3, 1, 0)).astype(dtype)}
    b = sd.pop(f"{name}.bias", None)
    if b is not None:
        p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
    return p


def _vec(sd, name):
    return jnp.asarray(np.asarray(sd.pop(name), np.float32))


def load_ace_dit_params(sd: Dict[str, np.ndarray], cfg,
                        dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    from ..models.tts.lyric_encoder import (ConformerConfig,
                                            load_conformer_params)
    sd = dict(sd)
    for pre in ("model.", "transformer."):
        if any(k.startswith(pre + "transformer_blocks.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}

    def attn(pre):
        return {"to_q": _lin(sd, f"{pre}.to_q", dtype),
                "to_k": _lin(sd, f"{pre}.to_k", dtype),
                "to_v": _lin(sd, f"{pre}.to_v", dtype),
                "to_out": _lin(sd, f"{pre}.to_out.0", dtype)}

    def conv1x1(name, bias=True):
        """torch Conv1d k=1 [cout, cin, 1] -> dense [cin, cout]."""
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)[..., 0]
        p = {"w": jnp.asarray(w.T).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    blocks = []
    for i in range(cfg.num_layers):
        pre = f"transformer_blocks.{i}"
        # drop training-time duplicate projections
        for extra in ("add_q_proj", "add_k_proj", "add_v_proj", "to_add_out"):
            sd.pop(f"{pre}.attn.{extra}.weight", None)
            sd.pop(f"{pre}.attn.{extra}.bias", None)
            sd.pop(f"{pre}.cross_attn.{extra}.weight", None)
            sd.pop(f"{pre}.cross_attn.{extra}.bias", None)
        ff_depth = np.asarray(
            sd.pop(f"{pre}.ff.depth_conv.conv.weight"), np.float32)
        ff = {
            "inverted": conv1x1(f"{pre}.ff.inverted_conv.conv"),
            # torch depthwise Conv1d [C, 1, k] -> [k, 1, C]
            "depth": {"w": jnp.asarray(
                ff_depth.transpose(2, 1, 0)).astype(dtype),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.ff.depth_conv.conv.bias"),
                    np.float32)).astype(dtype)},
            "point": conv1x1(f"{pre}.ff.point_conv.conv"),
        }
        blocks.append({
            "attn": attn(f"{pre}.attn"),
            "cross_attn": attn(f"{pre}.cross_attn"),
            "ff": ff,
            "scale_shift_table": _vec(sd, f"{pre}.scale_shift_table"),
        })

    # drop ssl projectors (training-only, ace_step_transformer.py:298)
    for k in [k for k in sd if k.startswith("projectors.")]:
        sd.pop(k)

    lyr_cfg = ConformerConfig(dim=cfg.lyric_dim)
    lyric_encoder = load_conformer_params(sd, lyr_cfg,
                                          prefix="lyric_encoder.",
                                          dtype=dtype)

    params = {
        "proj_in": {
            "conv1": _c2(sd, "proj_in.early_conv_layers.0", jnp.float32),
            "gn": {"w": _vec(sd, "proj_in.early_conv_layers.1.weight"),
                   "b": _vec(sd, "proj_in.early_conv_layers.1.bias")},
            "conv2": _c2(sd, "proj_in.early_conv_layers.2", jnp.float32),
        },
        "timestep_embedder": {
            "fc1": _lin(sd, "timestep_embedder.linear_1", jnp.float32),
            "fc2": _lin(sd, "timestep_embedder.linear_2", jnp.float32)},
        "t_block": _lin(sd, "t_block.1", jnp.float32),
        "speaker_embedder": _lin(sd, "speaker_embedder", dtype),
        "genre_embedder": _lin(sd, "genre_embedder", dtype),
        "lyric_embs": jnp.asarray(np.asarray(
            sd.pop("lyric_embs.weight"), np.float32)).astype(dtype),
        "lyric_encoder": lyric_encoder,
        "lyric_proj": _lin(sd, "lyric_proj", dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "final": {
            "linear": _lin(sd, "final_layer.linear", jnp.float32),
            "scale_shift_table": _vec(sd, "final_layer.scale_shift_table"),
        },
    }
    return params, sorted(sd.keys())


def load_music_dcae_params(sd: Dict[str, np.ndarray], cfg,
                           dtype=jnp.float32):
    """Map a diffusers AutoencoderDC state dict onto the init_music_dcae
    tree shape-adaptively: conv layers matched by stage order.  Falls back
    to strict name mapping when the expected keys exist."""
    from ..models.tts.ace_audio import init_music_dcae
    sd = dict(sd)
    for pre in ("dcae.", "autoencoder."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
    # Build a skeleton then fill matching-shape leaves in key order.
    params = init_music_dcae(jax.random.key(0), cfg, dtype)

    enc_keys = sorted([k for k in sd if k.startswith("encoder.")])
    dec_keys = sorted([k for k in sd if k.startswith("decoder.")])

    def fill(tree, keys):
        flat, treedef = jax.tree.flatten(tree)
        used = set()
        for i, leaf in enumerate(flat):
            for k in keys:
                if k in used:
                    continue
                v = np.asarray(sd[k], np.float32)
                cand = None
                if v.ndim == 4 and leaf.ndim == 4:
                    cand = v.transpose(2, 3, 1, 0)
                elif v.ndim == 1 and leaf.ndim == 1:
                    cand = v
                if cand is not None and cand.shape == leaf.shape:
                    flat[i] = jnp.asarray(cand).astype(leaf.dtype)
                    used.add(k)
                    break
        return jax.tree.unflatten(treedef, flat), used

    params["encoder"], u1 = fill(params["encoder"], enc_keys)
    params["decoder"], u2 = fill(params["decoder"], dec_keys)
    return params
