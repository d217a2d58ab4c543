"""Torch-layout checkpoint -> JAX param-tree conversion for the Wan stack.

Maps the reference state-dict key space (models/wan/modules/model.py, t5.py,
vae.py) onto our functional param trees:
  - linear weights [out, in] -> transposed [in, out]
  - conv3d [out, in, kt, kh, kw] -> [kt, kh, kw, in, out]
  - conv2d [out, in, kh, kw] -> [kh, kw, in, out]
  - blocks stacked along a leading layer axis (for lax.scan)
Prefix/key normalization mirrors WanModel.preprocess_sd_with_dtype
(model.py:908-931: strip "model.diffusion_model.", drop vae.* keys).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np
import jax.numpy as jnp
import ml_dtypes


def _t(x):      # linear weight
    return np.ascontiguousarray(x.T)


def _c3(x):     # conv3d kernel
    return np.ascontiguousarray(x.transpose(2, 3, 4, 1, 0))


def _c2(x):     # conv2d kernel
    return np.ascontiguousarray(x.transpose(2, 3, 1, 0))


def _as(x, dtype):
    return jnp.asarray(np.asarray(x, dtype=ml_dtypes.bfloat16
                                  if dtype == jnp.bfloat16 else np.float32))


def normalize_wan_sd(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip wrappers (model.py:908-931)."""
    out = {}
    for k, v in sd.items():
        if k.startswith("model.diffusion_model."):
            k = k[len("model.diffusion_model."):]
        if k.startswith("vae."):
            continue
        if ".attn2.norm_added_q." in k:
            continue
        out[k] = v
    return out


def _lin(sd, prefix, dtype, bias=True):
    if f"{prefix}.weight._data" in sd:
        # quanto-int8 checkpoint: weight._data int8 [out, in] +
        # weight._scale [out, 1] (reference *_quanto_*_int8.safetensors)
        data = np.asarray(sd.pop(f"{prefix}.weight._data"))
        scale = np.asarray(sd.pop(f"{prefix}.weight._scale"),
                           np.float32).reshape(-1)
        p = {"w_q": jnp.asarray(np.ascontiguousarray(data.T)),
             "scale": jnp.asarray(scale)}
    else:
        p = {"w": jnp.asarray(_t(np.asarray(sd.pop(f"{prefix}.weight"),
                                            dtype=np.float32)).astype(
            ml_dtypes.bfloat16 if dtype == jnp.bfloat16 else np.float32))}
    if bias and f"{prefix}.bias" in sd:
        p["b"] = _as(np.asarray(sd.pop(f"{prefix}.bias"), np.float32), dtype)
    return p


def _vec(sd, key):
    return jnp.asarray(np.asarray(sd.pop(key), dtype=np.float32))


def load_wan_dit_params(sd: Dict[str, np.ndarray], cfg,
                        dtype=jnp.bfloat16) -> Dict[str, Any]:
    """sd: torch-layout state dict (already normalized).  cfg: WanDiTConfig."""
    sd = dict(sd)
    p: Dict[str, Any] = {}

    pe_w = np.asarray(sd.pop("patch_embedding.weight"), np.float32)
    p["patch_embedding"] = {
        "w": jnp.asarray(pe_w.reshape(pe_w.shape[0], -1).T),
        "b": _vec(sd, "patch_embedding.bias"),
    }
    p["text_embedding"] = {"fc1": _lin(sd, "text_embedding.0", dtype),
                           "fc2": _lin(sd, "text_embedding.2", dtype)}
    p["time_embedding"] = {"fc1": _lin(sd, "time_embedding.0", jnp.float32),
                           "fc2": _lin(sd, "time_embedding.2", jnp.float32)}
    p["time_projection"] = _lin(sd, "time_projection.1", jnp.float32)

    def attn(i, name, cross):
        pre = f"blocks.{i}.{name}"
        a = {k: _lin(sd, f"{pre}.{k}", dtype) for k in ("q", "k", "v", "o")}
        a["norm_q"] = _vec(sd, f"{pre}.norm_q.weight")
        a["norm_k"] = _vec(sd, f"{pre}.norm_k.weight")
        if cross and f"{pre}.k_img.weight" in sd:
            a["k_img"] = _lin(sd, f"{pre}.k_img", dtype)
            a["v_img"] = _lin(sd, f"{pre}.v_img", dtype)
            a["norm_k_img"] = _vec(sd, f"{pre}.norm_k_img.weight")
        return a

    def block(i):
        mod_key = (f"blocks.{i}.modulation"
                   if f"blocks.{i}.modulation" in sd
                   else f"blocks.{i}.modulation.weight")
        return {
            "self_attn": attn(i, "self_attn", False),
            "cross_attn": attn(i, "cross_attn", True),
            "norm3": {"w": _vec(sd, f"blocks.{i}.norm3.weight"),
                      "b": _vec(sd, f"blocks.{i}.norm3.bias")},
            "ffn": {"fc1": _lin(sd, f"blocks.{i}.ffn.0", dtype),
                    "fc2": _lin(sd, f"blocks.{i}.ffn.2", dtype)},
            "modulation": jnp.asarray(
                np.asarray(sd.pop(mod_key), np.float32).reshape(6, -1)),
        }

    p["blocks"] = _stack([block(i) for i in range(cfg.num_layers)])

    head_mod_key = ("head.modulation" if "head.modulation" in sd
                    else "head.modulation.weight")
    p["head"] = {
        "head": _lin(sd, "head.head", jnp.float32),
        "modulation": jnp.asarray(
            np.asarray(sd.pop(head_mod_key), np.float32).reshape(2, -1)),
    }
    if "vace_patch_embedding.weight" in sd:
        vw = np.asarray(sd.pop("vace_patch_embedding.weight"), np.float32)
        p["vace_patch_embedding"] = {
            "w": jnp.asarray(vw.reshape(vw.shape[0], -1).T),
            "b": _vec(sd, "vace_patch_embedding.bias"),
        }
        n_vace = len({k.split(".")[1] for k in sd
                      if k.startswith("vace_blocks.")})

        def vace_block(i):
            b = {
                "self_attn": attn_v(i, "self_attn"),
                "cross_attn": attn_v(i, "cross_attn"),
                "norm3": {"w": _vec(sd, f"vace_blocks.{i}.norm3.weight"),
                          "b": _vec(sd, f"vace_blocks.{i}.norm3.bias")},
                "ffn": {"fc1": _lin(sd, f"vace_blocks.{i}.ffn.0", dtype),
                        "fc2": _lin(sd, f"vace_blocks.{i}.ffn.2", dtype)},
                "modulation": jnp.asarray(np.asarray(
                    sd.pop(f"vace_blocks.{i}.modulation"
                           if f"vace_blocks.{i}.modulation" in sd
                           else f"vace_blocks.{i}.modulation.weight"),
                    np.float32).reshape(6, -1)),
                "after_proj": _lin(sd, f"vace_blocks.{i}.after_proj", dtype),
            }
            return b

        def attn_v(i, name):
            pre = f"vace_blocks.{i}.{name}"
            a = {k: _lin(sd, f"{pre}.{k}", dtype)
                 for k in ("q", "k", "v", "o")}
            a["norm_q"] = _vec(sd, f"{pre}.norm_q.weight")
            a["norm_k"] = _vec(sd, f"{pre}.norm_k.weight")
            return a

        p["vace_before_proj"] = _lin(sd, "vace_blocks.0.before_proj", dtype)
        p["vace_blocks"] = _stack([vace_block(i) for i in range(n_vace)])
    if "hardcut_embedding" in sd:
        # ShotPlan planning token (model.py:1134)
        p["hardcut_embedding"] = jnp.asarray(
            np.asarray(sd.pop("hardcut_embedding"), np.float32))
    if "blocks.0.cross_attn.processor.k_proj.weight" in sd:
        # FantasyTalking per-block audio k/v processors
        # (fantasytalking/model.py:19-30, attached model.py:1210-1213)
        def fproc(i):
            pre = f"blocks.{i}.cross_attn.processor"
            return {"k": _lin(sd, f"{pre}.k_proj", dtype),
                    "v": _lin(sd, f"{pre}.v_proj", dtype)}
        p["fantasy_attn_blocks"] = _stack(
            [fproc(i) for i in range(cfg.num_layers)])
    if "img_emb.proj.1.weight" in sd:
        p["img_emb"] = {
            "norm1": {"w": _vec(sd, "img_emb.proj.0.weight"),
                      "b": _vec(sd, "img_emb.proj.0.bias")},
            "fc1": _lin(sd, "img_emb.proj.1", dtype),
            "fc2": _lin(sd, "img_emb.proj.3", dtype),
            "norm2": {"w": _vec(sd, "img_emb.proj.4.weight"),
                      "b": _vec(sd, "img_emb.proj.4.bias")},
        }
    return p, sorted(sd.keys())


def _stack(dicts):
    import jax
    return jax.tree.map(lambda *xs: jnp.stack(xs), *dicts)


# ---------------------------------------------------------------------------
# UMT5 encoder (t5.py key space: token_embedding, blocks.N.{norm1,attn.{q,k,v,o},
# pos_embedding.embedding, norm2, ffn.{gate.0,fc1,fc2}}, norm)
# ---------------------------------------------------------------------------

def load_t5_params(sd: Dict[str, np.ndarray], cfg,
                   dtype=jnp.bfloat16):
    sd = dict(sd)

    def block(i):
        pre = f"blocks.{i}"
        return {
            "norm1": _vec(sd, f"{pre}.norm1.weight"),
            "attn": {k: _lin(sd, f"{pre}.attn.{k}", dtype, bias=False)
                     for k in ("q", "k", "v", "o")},
            "pos_emb": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.pos_embedding.embedding.weight"), np.float32)),
            "norm2": _vec(sd, f"{pre}.norm2.weight"),
            "ffn": {"gate": _lin(sd, f"{pre}.ffn.gate.0", dtype, bias=False),
                    "fc1": _lin(sd, f"{pre}.ffn.fc1", dtype, bias=False),
                    "fc2": _lin(sd, f"{pre}.ffn.fc2", dtype, bias=False)},
        }

    p = {
        "token_embedding": _as(np.asarray(sd.pop("token_embedding.weight"),
                                          np.float32), dtype),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm": _vec(sd, "norm.weight"),
    }
    return p, sorted(sd.keys())


# ---------------------------------------------------------------------------
# VAE (vae.py key space)
# ---------------------------------------------------------------------------

def _conv3(sd, prefix, dtype=jnp.float32):
    return {"w": jnp.asarray(_c3(np.asarray(sd.pop(f"{prefix}.weight"),
                                            np.float32))),
            "b": _vec(sd, f"{prefix}.bias")}


def _conv2d_p(sd, prefix):
    return {"w": jnp.asarray(_c2(np.asarray(sd.pop(f"{prefix}.weight"),
                                            np.float32))),
            "b": _vec(sd, f"{prefix}.bias")}


def _gamma(sd, key):
    return jnp.asarray(np.asarray(sd.pop(key), np.float32).reshape(-1))


def _res(sd, pre):
    p = {"norm1": _gamma(sd, f"{pre}.residual.0.gamma"),
         "conv1": _conv3(sd, f"{pre}.residual.2"),
         "norm2": _gamma(sd, f"{pre}.residual.3.gamma"),
         "conv2": _conv3(sd, f"{pre}.residual.6")}
    if f"{pre}.shortcut.weight" in sd:
        p["shortcut"] = _conv3(sd, f"{pre}.shortcut")
    return p


def _attn(sd, pre):
    return {"norm": _gamma(sd, f"{pre}.norm.gamma"),
            "qkv": _conv2d_p(sd, f"{pre}.to_qkv"),
            "proj": _conv2d_p(sd, f"{pre}.proj")}


def _resample(sd, pre, has_time):
    p = {"conv": _conv2d_p(sd, f"{pre}.resample.1")}
    if has_time:
        p["time_conv"] = _conv3(sd, f"{pre}.time_conv")
    return p


def load_wan_vae_params(sd: Dict[str, np.ndarray], cfg):
    """cfg: WanVAEConfig.  Torch module order (vae.py:322-478):
    encoder.downsamples / decoder.upsamples are flat Sequentials whose
    index order matches our encoder_plan/decoder_plan."""
    from ..models.wan.vae import encoder_plan, decoder_plan
    sd = dict(sd)

    def tower(plan, prefix):
        out = []
        for j, (op, _, _) in enumerate(plan):
            pre = f"{prefix}.{j}"
            if op == "res":
                out.append(_res(sd, pre))
            elif op == "attn":
                out.append(_attn(sd, pre))
            elif op in ("down2d", "down3d"):
                # downsample Sequential: [ZeroPad2d, Conv2d] -> index 1
                p = {"conv": _conv2d_p(sd, f"{pre}.resample.1")}
                if op == "down3d":
                    p["time_conv"] = _conv3(sd, f"{pre}.time_conv")
                out.append(p)
            else:
                out.append(_resample(sd, pre, op == "up3d"))
        return out

    def mid(prefix):
        return [_res(sd, f"{prefix}.0"), _attn(sd, f"{prefix}.1"),
                _res(sd, f"{prefix}.2")]

    p = {
        "encoder": {
            "conv1": _conv3(sd, "encoder.conv1"),
            "down": tower(encoder_plan(cfg), "encoder.downsamples"),
            "mid": mid("encoder.middle"),
            "head_norm": _gamma(sd, "encoder.head.0.gamma"),
            "head_conv": _conv3(sd, "encoder.head.2"),
        },
        "conv1": _conv3(sd, "conv1"),
        "conv2": _conv3(sd, "conv2"),
        "decoder": {
            "conv1": _conv3(sd, "decoder.conv1"),
            "mid": mid("decoder.middle"),
            "up": tower(decoder_plan(cfg), "decoder.upsamples"),
            "head_norm": _gamma(sd, "decoder.head.0.gamma"),
            "head_conv": _conv3(sd, "decoder.head.2"),
        },
    }
    return p, sorted(sd.keys())


def load_wan22_vae_params(sd: Dict[str, np.ndarray], cfg):
    """Wan 2.2 VAE (vae2_2.py key space): staged Down_/Up_ResidualBlock
    containers (vae2_2.py:436/:476) whose inner Sequentials are named
    `downsamples`/`upsamples`; the avg_shortcut (AvgDown3D/DupUp3D) is
    parameter-free.  cfg: Wan22VAEConfig."""
    sd = dict(sd)
    n_stages = len(cfg.dim_mult)

    def stage(prefix, i, nblocks, down):
        inner = "downsamples" if down else "upsamples"
        p = {"blocks": [_res(sd, f"{prefix}.{i}.{inner}.{j}")
                        for j in range(nblocks)]}
        if i != n_stages - 1:
            rp = f"{prefix}.{i}.{inner}.{nblocks}"
            tflags = (tuple(cfg.temporal_downsample) if down
                      else tuple(cfg.temporal_downsample)[::-1])
            tflag = tflags[i] if i < len(tflags) else False
            p["resample"] = _resample(sd, rp, tflag)
        return p

    def mid(prefix):
        return [_res(sd, f"{prefix}.0"), _attn(sd, f"{prefix}.1"),
                _res(sd, f"{prefix}.2")]

    p = {
        "encoder": {
            "conv1": _conv3(sd, "encoder.conv1"),
            "down": [stage("encoder.downsamples", i, cfg.num_res_blocks,
                           True) for i in range(n_stages)],
            "mid": mid("encoder.middle"),
            "head_norm": _gamma(sd, "encoder.head.0.gamma"),
            "head_conv": _conv3(sd, "encoder.head.2"),
        },
        "conv1": _conv3(sd, "conv1"),
        "conv2": _conv3(sd, "conv2"),
        "decoder": {
            "conv1": _conv3(sd, "decoder.conv1"),
            "mid": mid("decoder.middle"),
            "up": [stage("decoder.upsamples", i, cfg.num_res_blocks + 1,
                         False) for i in range(n_stages)],
            "head_norm": _gamma(sd, "decoder.head.0.gamma"),
            "head_conv": _conv3(sd, "decoder.head.2"),
        },
    }
    return p, sorted(sd.keys())


def load_hf_t5_params(sd: Dict[str, np.ndarray], cfg, dtype=jnp.bfloat16):
    """HF T5 v1.1 encoder (google/t5-v1_1-xxl, used by Flux/LTXV/Hunyuan
    pipelines): encoder.block.N.layer.0.SelfAttention.{q,k,v,o} +
    layer.1.DenseReluDense.{wi_0 gate, wi_1 fc1, wo}, shared rel-pos bias on
    block 0, `shared` token embeddings.  cfg must have shared_pos=True."""
    sd = {k[len("encoder."):] if k.startswith("encoder.") else k: v
          for k, v in sd.items()}

    def lin(prefix):
        return {"w": _as(_t(np.asarray(sd.pop(f"{prefix}.weight"),
                                       np.float32)), dtype)}

    def block(i):
        pre = f"block.{i}"
        return {
            "norm1": _vec(sd, f"{pre}.layer.0.layer_norm.weight"),
            "attn": {k: lin(f"{pre}.layer.0.SelfAttention.{k}")
                     for k in ("q", "k", "v", "o")},
            "norm2": _vec(sd, f"{pre}.layer.1.layer_norm.weight"),
            "ffn": {"gate": lin(f"{pre}.layer.1.DenseReluDense.wi_0"),
                    "fc1": lin(f"{pre}.layer.1.DenseReluDense.wi_1"),
                    "fc2": lin(f"{pre}.layer.1.DenseReluDense.wo")},
        }

    emb_key = "shared.weight" if "shared.weight" in sd else \
        "embed_tokens.weight"
    p = {
        "token_embedding": _as(np.asarray(sd.pop(emb_key), np.float32),
                               dtype),
        "shared_pos_emb": jnp.asarray(np.asarray(sd.pop(
            "block.0.layer.0.SelfAttention.relative_attention_bias.weight"),
            np.float32)),
        "blocks": _stack([block(i) for i in range(cfg.num_layers)]),
        "norm": _vec(sd, "final_layer_norm.weight"),
    }
    sd.pop("embed_tokens.weight", None)
    return p, sorted(sd.keys())
