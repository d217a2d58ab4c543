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

    f2 = getattr(cfg, "flux2", False)
    chroma = getattr(cfg, "chroma", False)

    def stream(i, name):
        pre = f"double_blocks.{i}.{name}"
        p = {
            "qkv": _lin(sd, f"{pre}_attn.qkv", dtype),
            "norm_q": _vec(sd, f"{pre}_attn.norm.query_norm.scale"),
            "norm_k": _vec(sd, f"{pre}_attn.norm.key_norm.scale"),
            "proj": _lin(sd, f"{pre}_attn.proj", dtype),
            "mlp1": _lin(sd, f"{pre}_mlp.0", dtype),
            "mlp2": _lin(sd, f"{pre}_mlp.2", dtype),
        }
        if not f2 and not chroma:
            p["mod"] = _lin(sd, f"{pre}_mod.lin", dtype)
        return p

    def double_block(i):
        return {"img": stream(i, "img"), "txt": stream(i, "txt")}

    def single_block(i):
        pre = f"single_blocks.{i}"
        p = {
            "linear1": _lin(sd, f"{pre}.linear1", dtype),
            "linear2": _lin(sd, f"{pre}.linear2", dtype),
            "norm_q": _vec(sd, f"{pre}.norm.query_norm.scale"),
            "norm_k": _vec(sd, f"{pre}.norm.key_norm.scale"),
        }
        if not f2 and not chroma:
            p["mod"] = _lin(sd, f"{pre}.modulation.lin", dtype)
        return p

    def stack(items):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

    params: Dict[str, Any] = {
        "img_in": _lin(sd, "img_in", dtype),
        "txt_in": _lin(sd, "txt_in", dtype),
        "double_blocks": stack([double_block(i) for i in range(cfg.depth)]),
        "single_blocks": stack([single_block(i)
                                for i in range(cfg.depth_single_blocks)]),
        "final": {
            "linear": _lin(sd, "final_layer.linear", dtype),
        },
    }
    if not chroma:
        params["time_in"] = embedder("time_in")
        params["final"]["mod"] = _lin(sd, "final_layer.adaLN_modulation.1",
                                      dtype)
    if chroma:
        # DistilledGuidance (layers.py:447-464)
        dg = "distilled_guidance_layer"
        params["distilled_guidance"] = {
            "in_proj": _lin(sd, f"{dg}.in_proj", jnp.float32),
            "layers": [{"in": _lin(sd, f"{dg}.layers.{i}.in_layer",
                                   jnp.float32),
                        "out": _lin(sd, f"{dg}.layers.{i}.out_layer",
                                    jnp.float32),
                        "norm": _vec(sd, f"{dg}.norms.{i}.scale")}
                       for i in range(5)],
            "out_proj": _lin(sd, f"{dg}.out_proj", jnp.float32),
        }
    elif f2:
        # shared global modulation (model.py:125-128)
        params["mod_double_img"] = _lin(
            sd, "double_stream_modulation_img.lin", jnp.float32)
        params["mod_double_txt"] = _lin(
            sd, "double_stream_modulation_txt.lin", jnp.float32)
        params["mod_single"] = _lin(
            sd, "single_stream_modulation.lin", jnp.float32)
    elif not chroma:
        params["vector_in"] = embedder("vector_in")
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
    # optional 1x1 quant convs (diffusers AutoencoderKL / Flux2)
    if "decoder.post_quant_conv.weight" in sd:
        params["decoder"]["pre_quant"] = _c2(sd, "decoder.post_quant_conv")
    if "encoder.quant_conv.weight" in sd:
        params["encoder"]["post_quant"] = _c2(sd, "encoder.quant_conv")
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


# ---------------------------------------------------------------------------
# diffusers AutoencoderKL -> BFL key space
# ---------------------------------------------------------------------------

def _fold_1x1(outer_w, outer_b, inner_w, inner_b):
    """Compose a trailing 1x1 conv into the previous conv:
    y = Wq (Wo * x + bo) + bq -> W' = Wq Wo, b' = Wq bo + bq.
    outer = quant_conv [co, ci, 1, 1]; inner = conv [ci, cin, kh, kw]."""
    wq = np.asarray(outer_w, np.float32)[:, :, 0, 0]      # [co, ci]
    wi = np.asarray(inner_w, np.float32)
    w = np.einsum("oc,cikl->oikl", wq, wi)
    b = wq @ np.asarray(inner_b, np.float32) + np.asarray(outer_b,
                                                          np.float32)
    return w, b


def _fold_1x1_pre(inner_w, inner_b, outer_w, outer_b):
    """Compose a leading 1x1 conv into the following conv:
    y = Wi (Wq x + bq) + bi -> W' = Wi Wq (contract input channels),
    b' accounts for the constant bq through Wi (sum over spatial taps)."""
    wq = np.asarray(outer_w, np.float32)[:, :, 0, 0]      # [cz, cz]
    wi = np.asarray(inner_w, np.float32)                  # [co, cz, kh, kw]
    w = np.einsum("ozkl,zc->ockl", wi, wq)
    b = np.asarray(inner_b, np.float32) + \
        np.einsum("ozkl,z->o", wi, np.asarray(outer_b, np.float32))
    return w, b


def normalize_diffusers_vae_sd(sd: Dict[str, np.ndarray],
                               n_stages: int = 4) -> Dict[str, np.ndarray]:
    """Map diffusers AutoencoderKL keys (encoder.down_blocks.N.resnets.M,
    mid_block.attentions.0.to_q linear, reversed decoder up_blocks,
    quant_conv/post_quant_conv 1x1) onto the BFL layout consumed by
    load_flux_vae_params.  The quant convs are folded into
    encoder.conv_out / decoder.conv_in (exact: composition of affine maps).
    Used for the Z-Image VAE (reference models/z_image/autoencoder_kl.py)
    and other diffusers-format 16-channel image VAEs."""
    if not any(".down_blocks." in k for k in sd):
        return dict(sd)   # already BFL layout
    src = dict(sd)
    out: Dict[str, np.ndarray] = {}

    def mv(dst, srckey):
        if f"{srckey}.weight" in src:
            out[f"{dst}.weight"] = src.pop(f"{srckey}.weight")
            b = src.pop(f"{srckey}.bias", None)
            if b is not None:
                out[f"{dst}.bias"] = b

    def mv_attn(dst, srckey):
        mv(f"{dst}.norm", f"{srckey}.group_norm")
        for a, b in (("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                     ("proj_out", "to_out.0")):
            w = np.asarray(src.pop(f"{srckey}.{b}.weight"), np.float32)
            if w.ndim == 2:          # linear -> 1x1 conv
                w = w[:, :, None, None]
            out[f"{dst}.{a}.weight"] = w
            out[f"{dst}.{a}.bias"] = src.pop(f"{srckey}.{b}.bias")

    for side in ("encoder", "decoder"):
        mv(f"{side}.conv_in", f"{side}.conv_in")
        mv(f"{side}.conv_out", f"{side}.conv_out")
        mv(f"{side}.norm_out", f"{side}.conv_norm_out")
        mv(f"{side}.mid.block_1", f"{side}.mid_block.resnets.0")
        mv(f"{side}.mid.block_2", f"{side}.mid_block.resnets.1")
        for part in ("norm1", "conv1", "norm2", "conv2"):
            mv(f"{side}.mid.block_1.{part}",
               f"{side}.mid_block.resnets.0.{part}")
            mv(f"{side}.mid.block_2.{part}",
               f"{side}.mid_block.resnets.1.{part}")
        mv_attn(f"{side}.mid.attn_1", f"{side}.mid_block.attentions.0")

    for i in range(n_stages):
        for j in range(8):
            pre = f"encoder.down_blocks.{i}.resnets.{j}"
            if f"{pre}.norm1.weight" not in src:
                break
            for part in ("norm1", "conv1", "norm2", "conv2"):
                mv(f"encoder.down.{i}.block.{j}.{part}", f"{pre}.{part}")
            mv(f"encoder.down.{i}.block.{j}.nin_shortcut",
               f"{pre}.conv_shortcut")
        mv(f"encoder.down.{i}.downsample.conv",
           f"encoder.down_blocks.{i}.downsamplers.0.conv")
        # diffusers decoder up_blocks run high->low channels; BFL indexes
        # them low->high (decoder.up.{n-1} is the first applied)
        bfl = n_stages - 1 - i
        for j in range(8):
            pre = f"decoder.up_blocks.{i}.resnets.{j}"
            if f"{pre}.norm1.weight" not in src:
                break
            for part in ("norm1", "conv1", "norm2", "conv2"):
                mv(f"decoder.up.{bfl}.block.{j}.{part}", f"{pre}.{part}")
            mv(f"decoder.up.{bfl}.block.{j}.nin_shortcut",
               f"{pre}.conv_shortcut")
        mv(f"decoder.up.{bfl}.upsample.conv",
           f"decoder.up_blocks.{i}.upsamplers.0.conv")

    if "quant_conv.weight" in src:
        w, b = _fold_1x1(src.pop("quant_conv.weight"),
                         src.pop("quant_conv.bias"),
                         out.pop("encoder.conv_out.weight"),
                         out.pop("encoder.conv_out.bias"))
        out["encoder.conv_out.weight"] = w
        out["encoder.conv_out.bias"] = b
    if "post_quant_conv.weight" in src:
        # NOT folded into conv_in: conv_in zero-pads, and padding the
        # biased 1x1 output is not the same as biasing padded input — the
        # fold would be wrong on the 1-latent-pixel border.  Kept as an
        # explicit pre-conv (load_flux_vae_params -> decoder.pre_quant).
        out["decoder.post_quant_conv.weight"] = \
            src.pop("post_quant_conv.weight")
        out["decoder.post_quant_conv.bias"] = \
            src.pop("post_quant_conv.bias")
    out.update(src)   # leftovers surface through the loader
    return out
