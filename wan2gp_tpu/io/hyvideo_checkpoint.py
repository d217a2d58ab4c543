"""Hunyuan-Video VAE checkpoint loading (AutoencoderKLCausal3D key space).

Diffusers-style keys (/root/reference/models/hyvideo/vae/vae.py):
{encoder,decoder}.conv_in.conv, encoder.down_blocks.i.{resnets.j.{norm1,
conv1.conv, norm2, conv2.conv, conv_shortcut.conv}, downsamplers.0.conv
.conv}, decoder.up_blocks.i.{resnets.j.*, upsamplers.0.conv.conv},
*.mid_block.{resnets.j.*, attentions.0.{group_norm, to_q, to_k, to_v,
to_out.0}}, *.conv_norm_out, *.conv_out.conv, quant_conv.conv,
post_quant_conv.conv.  DownsampleCausal3D registers the same conv twice
(Conv2d_0 and conv, unet_causal_3d_blocks.py:278-284) — Conv2d_0.* dupes
are dropped.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np
import jax.numpy as jnp

from ..models.hyvideo.vae import HunyuanVAEConfig, _updown_plan


def _conv(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0)).astype(dtype),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32)).astype(dtype)}


def _norm(sd, name):
    return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                        np.float32)),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32))}


def _lin(sd, name, dtype):
    w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
    return {"w": jnp.asarray(w.T).astype(dtype),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32)).astype(dtype)}


def _resnet(sd, pre, dtype):
    p = {"norm1": _norm(sd, f"{pre}.norm1"),
         "conv1": _conv(sd, f"{pre}.conv1.conv", dtype),
         "norm2": _norm(sd, f"{pre}.norm2"),
         "conv2": _conv(sd, f"{pre}.conv2.conv", dtype)}
    if f"{pre}.conv_shortcut.conv.weight" in sd:
        p["shortcut"] = _conv(sd, f"{pre}.conv_shortcut.conv", dtype)
    return p


def _mid(sd, pre, dtype):
    a = f"{pre}.attentions.0"
    return {"resnets": [_resnet(sd, f"{pre}.resnets.0", dtype),
                        _resnet(sd, f"{pre}.resnets.1", dtype)],
            "attention": {"group_norm": _norm(sd, f"{a}.group_norm"),
                          "to_q": _lin(sd, f"{a}.to_q", dtype),
                          "to_k": _lin(sd, f"{a}.to_k", dtype),
                          "to_v": _lin(sd, f"{a}.to_v", dtype),
                          "to_out": _lin(sd, f"{a}.to_out.0", dtype)}}


def load_hunyuan_vae_params(sd: Dict[str, np.ndarray],
                            cfg: HunyuanVAEConfig = HunyuanVAEConfig(),
                            dtype=jnp.float32) -> Tuple[dict, List[str]]:
    sd = {k: v for k, v in sd.items() if ".Conv2d_0." not in k}
    if any(k.startswith("vae.") for k in sd):
        sd = {k[4:] if k.startswith("vae.") else k: v for k, v in sd.items()}

    enc = {"conv_in": _conv(sd, "encoder.conv_in.conv", dtype),
           "down_blocks": [], "mid": _mid(sd, "encoder.mid_block", dtype),
           "norm_out": _norm(sd, "encoder.conv_norm_out"),
           "conv_out": _conv(sd, "encoder.conv_out.conv", dtype)}
    for i, (cout, sp, tm) in enumerate(_updown_plan(cfg, decode=False)):
        pre = f"encoder.down_blocks.{i}"
        blk = {"resnets": [_resnet(sd, f"{pre}.resnets.{j}", dtype)
                           for j in range(cfg.layers_per_block)]}
        if sp or tm:
            blk["downsample"] = _conv(sd, f"{pre}.downsamplers.0.conv.conv",
                                      dtype)
            blk["stride"] = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
        enc["down_blocks"].append(blk)

    dec = {"conv_in": _conv(sd, "decoder.conv_in.conv", dtype),
           "mid": _mid(sd, "decoder.mid_block", dtype),
           "up_blocks": [], "norm_out": _norm(sd, "decoder.conv_norm_out"),
           "conv_out": _conv(sd, "decoder.conv_out.conv", dtype)}
    for i, (cout, sp, tm) in enumerate(_updown_plan(cfg, decode=True)):
        pre = f"decoder.up_blocks.{i}"
        blk = {"resnets": [_resnet(sd, f"{pre}.resnets.{j}", dtype)
                           for j in range(cfg.layers_per_block + 1)]}
        if sp or tm:
            blk["upsample"] = _conv(sd, f"{pre}.upsamplers.0.conv.conv",
                                    dtype)
            blk["factor"] = (2 if tm else 1, 2 if sp else 1, 2 if sp else 1)
        dec["up_blocks"].append(blk)

    params = {"encoder": enc, "decoder": dec,
              "quant_conv": _conv(sd, "quant_conv.conv", dtype),
              "post_quant_conv": _conv(sd, "post_quant_conv.conv", dtype)}
    return params, sorted(sd.keys())
