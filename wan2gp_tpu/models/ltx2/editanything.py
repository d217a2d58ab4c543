"""EditAnything reference module for LTX-2 22B (reference
models/ltx2/editanything.py + ltx_core/model/transformer/transformer.py:284-292
+ transformer_args.py:474-478).

A sidecar module over the base 22B DiT providing reference-image guided
video editing:
  - ``ref_visual_proj``: the reference latent (frame-averaged) is pooled
    into 32 local tokens (adaptive 4x8 avg pool) concatenated with global
    mean/std stats, projected to model dim, layer-normed, position-embedded
    and scaled by 0.25 (editanything.py:91-101).
  - ``ref_adaln_proj``: pooled stats (avg 1x1 + avg 2x2 + max 1x1) are
    projected to the adaLN mod-vector width and ADDED to the per-token
    timestep modulation, scaled by 2.0 (editanything.py:114-120,
    transformer_args.py:474-478).
  - per-block ``ref_attn``: a LoRA over the text-cross-attention weights
    cross-attends the video stream onto the 32 reference tokens in blocks
    12..35, added with context scale 0.01 (transformer.py:284-292).
    NOTE: the reference calls ``base_attn.q_norm(q)`` without using the
    result, so qk-norm is effectively NOT applied in ref_attn; we match
    that behaviour.
  - ``role_embedding``: shipped in the module file and loaded for
    checkpoint parity but not consumed by the forward pass (matching
    editanything.py:138-142, which only registers it).

TPU-first: the LoRA factors are stacked on the block axis and folded into
the existing ``lax.scan`` over blocks; out-of-range blocks carry a zero
context scale so the scan stays uniform.
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .dit import LTX2Config, _lin, _dense

REF_START_BLOCK = 12
REF_END_BLOCK = 35
REF_CONTEXT_SCALE = 0.01
REF_TOKEN_SCALE = 0.25
REF_ADALN_SCALE = 2.0


def init_editanything(key, cfg: LTX2Config, rank: int = 128,
                      latent_channels: Optional[int] = None,
                      hidden: Optional[int] = None, n_roles: int = 4,
                      dtype=jnp.float32) -> Dict[str, Any]:
    c = latent_channels if latent_channels is not None else cfg.in_channels
    h = hidden if hidden is not None else cfg.dim
    dv = cfg.dim
    ks = iter(jax.random.split(key, 64))

    def lora():
        return {
            "a": jax.random.normal(next(ks), (dv, rank), dtype) / 100.0,
            "b": jnp.zeros((rank, dv), dtype),
        }

    return {
        "ref_visual_proj": {
            "fc1": _lin(next(ks), 3 * c, h, dtype),
            "proj": _lin(next(ks), h, dv, dtype),
            "norm": {"w": jnp.ones((dv,), dtype),
                     "b": jnp.zeros((dv,), dtype)},
            "pos_embed": jax.random.normal(next(ks), (1, 32, dv),
                                           dtype) / 50.0,
        },
        "ref_adaln_proj": {
            "fc1": _lin(next(ks), 6 * c, h, dtype),
            "proj": _lin(next(ks), h, cfg.n_ada * dv, dtype),
        },
        "role_embedding": jax.random.normal(next(ks), (n_roles, dv),
                                            dtype) / 50.0,
        "ref_attn": {name: lora()
                     for name in ("to_q", "to_k", "to_v", "to_out")},
    }


def install_editanything(params: Dict[str, Any], ea: Dict[str, Any],
                         cfg: LTX2Config,
                         start_block: int = REF_START_BLOCK,
                         end_block: int = REF_END_BLOCK,
                         context_scale: float = REF_CONTEXT_SCALE
                         ) -> Dict[str, Any]:
    """Fold the per-block ref_attn LoRA into the stacked block params so
    the block ``lax.scan`` picks it up (editanything.py:144-152).

    ``ea["ref_attn"]`` may hold either one shared LoRA dict (broadcast to
    all blocks) or a per-block dict with leading axis == num_layers."""
    n = cfg.num_layers
    ra = ea["ref_attn"]

    def stackify(leaf):
        arr = jnp.asarray(leaf)
        if arr.ndim >= 1 and arr.shape[0] == n and arr.ndim == 3:
            return arr
        return jnp.broadcast_to(arr[None], (n, *arr.shape))

    stacked = jax.tree.map(stackify, ra)
    scale = jnp.asarray(
        [context_scale if start_block <= i <= end_block else 0.0
         for i in range(n)], jnp.float32)
    params = dict(params)
    blocks = dict(params["blocks"])
    blocks["ref_attn"] = stacked
    blocks["ref_scale"] = scale
    params["blocks"] = blocks
    params["editanything"] = {k: v for k, v in ea.items()
                              if k != "ref_attn"}
    return params


# ---------------------------------------------------------------------------
# pooled projections
# ---------------------------------------------------------------------------

def _pool_bounds(size: int, out: int) -> List[Tuple[int, int]]:
    return [(int(math.floor(i * size / out)),
             int(math.ceil((i + 1) * size / out))) for i in range(out)]


def _adaptive_avg_pool2d(x, out_hw):
    """torch F.adaptive_avg_pool2d on [B, C, H, W] (static bin edges)."""
    oh, ow = out_hw
    rows = _pool_bounds(x.shape[2], oh)
    cols = _pool_bounds(x.shape[3], ow)
    return jnp.stack(
        [jnp.stack([x[:, :, r0:r1, c0:c1].mean(axis=(-2, -1))
                    for (c0, c1) in cols], axis=-1)
         for (r0, r1) in rows], axis=-2)


def ref_visual_tokens(ea: Dict[str, Any], ref_latent,
                      token_scale: float = REF_TOKEN_SCALE):
    """[B, C, F, H, W] -> [B, 32, dim] reference context tokens
    (EditAnythingRefVisualProj.forward, editanything.py:91-101)."""
    p = ea["ref_visual_proj"]
    ref_frame = jnp.asarray(ref_latent, jnp.float32).mean(axis=2)
    b = ref_frame.shape[0]
    local = _adaptive_avg_pool2d(ref_frame, (4, 8))
    local = local.transpose(0, 2, 3, 1).reshape(b, 32, -1)
    gm = ref_frame.mean(axis=(-2, -1))
    gs = ref_frame.std(axis=(-2, -1))
    stats = jnp.broadcast_to(
        jnp.concatenate([gm, gs], axis=-1)[:, None, :],
        (b, 32, 2 * ref_frame.shape[1]))
    tokens = jnp.concatenate([local, stats], axis=-1)
    tokens = _dense(jax.nn.silu(_dense(tokens, p["fc1"], jnp.float32)),
                    p["proj"], jnp.float32)
    mu = tokens.mean(axis=-1, keepdims=True)
    var = tokens.var(axis=-1, keepdims=True)
    tokens = (tokens - mu) / jnp.sqrt(var + 1e-5)
    tokens = tokens * p["norm"]["w"] + p["norm"]["b"]
    tokens = tokens + p["pos_embed"][:, :tokens.shape[1]]
    return tokens * float(token_scale)


def ref_adaln_vec(ea: Dict[str, Any], ref_latent,
                  adaln_scale: float = REF_ADALN_SCALE):
    """[B, C, F, H, W] -> [B, n_ada*dim] adaLN offset
    (EditAnythingRefAdaLNProj.forward, editanything.py:114-120)."""
    p = ea["ref_adaln_proj"]
    ref_frame = jnp.asarray(ref_latent, jnp.float32).mean(axis=2)
    avg_1x1 = ref_frame.mean(axis=(-2, -1))
    avg_2x2 = _adaptive_avg_pool2d(ref_frame, (2, 2)).reshape(
        ref_frame.shape[0], -1)
    max_1x1 = ref_frame.max(axis=(-2, -1))
    pooled = jnp.concatenate([avg_1x1, avg_2x2, max_1x1], axis=-1)
    out = _dense(jax.nn.silu(_dense(pooled, p["fc1"], jnp.float32)),
                 p["proj"], jnp.float32)
    return out * float(adaln_scale)


# ---------------------------------------------------------------------------
# checkpoint mapping (module file: edit_anything_reference_*.module
# .safetensors — ref_adaln_proj / role_embedding / ref_attn / ref_visual_proj)
# ---------------------------------------------------------------------------

def load_editanything_module(sd: Dict[str, np.ndarray], cfg: LTX2Config,
                             dtype=jnp.float32
                             ) -> Tuple[Dict[str, Any], List[str]]:
    used = set()

    def take(k):
        used.add(k)
        return jnp.asarray(np.asarray(sd[k]), dtype)

    def linear(prefix):
        p = {"w": take(f"{prefix}.weight").T}
        if f"{prefix}.bias" in sd:
            p["b"] = take(f"{prefix}.bias")
        return p

    ea: Dict[str, Any] = {
        "ref_visual_proj": {
            "fc1": linear("ref_visual_proj.fc1"),
            "proj": linear("ref_visual_proj.proj"),
            "norm": {"w": take("ref_visual_proj.norm.weight"),
                     "b": take("ref_visual_proj.norm.bias")},
            "pos_embed": take("ref_visual_proj.pos_embed"),
        },
        "ref_adaln_proj": {
            "fc1": linear("ref_adaln_proj.fc1"),
            "proj": linear("ref_adaln_proj.proj"),
        },
    }
    if "role_embedding.embedding.weight" in sd:
        ea["role_embedding"] = take("role_embedding.embedding.weight")

    # stacked per-block LoRA; zero where a block has no ref_attn
    names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
             "to_out": "to_out.0"}
    probe = None
    for i in range(cfg.num_layers):
        k = f"diffusion_model.transformer_blocks.{i}.ref_attn.to_q.lora_A.weight"
        if k in sd:
            probe = sd[k]
            break
    if probe is not None:
        rank = probe.shape[0]
        dv = cfg.dim
        ra = {}
        for ours, theirs in names.items():
            a = np.zeros((cfg.num_layers, dv, rank), np.float32)
            b = np.zeros((cfg.num_layers, rank, dv), np.float32)
            for i in range(cfg.num_layers):
                pre = (f"diffusion_model.transformer_blocks.{i}"
                       f".ref_attn.{theirs}")
                ka, kb = f"{pre}.lora_A.weight", f"{pre}.lora_B.weight"
                if ka in sd:
                    a[i] = np.asarray(sd[ka]).T
                    b[i] = np.asarray(sd[kb]).T
                    used.update((ka, kb))
            ra[ours] = {"a": jnp.asarray(a, dtype),
                        "b": jnp.asarray(b, dtype)}
        ea["ref_attn"] = ra
    leftover = [k for k in sd if k not in used]
    return ea, leftover


def export_editanything_module(ea: Dict[str, Any], cfg: LTX2Config,
                               blocks=None) -> Dict[str, np.ndarray]:
    """Inverse of load_editanything_module (for round-trip tests)."""
    out: Dict[str, np.ndarray] = {}

    def put_linear(prefix, p):
        out[f"{prefix}.weight"] = np.asarray(p["w"]).T
        if "b" in p:
            out[f"{prefix}.bias"] = np.asarray(p["b"])

    vp = ea["ref_visual_proj"]
    put_linear("ref_visual_proj.fc1", vp["fc1"])
    put_linear("ref_visual_proj.proj", vp["proj"])
    out["ref_visual_proj.norm.weight"] = np.asarray(vp["norm"]["w"])
    out["ref_visual_proj.norm.bias"] = np.asarray(vp["norm"]["b"])
    out["ref_visual_proj.pos_embed"] = np.asarray(vp["pos_embed"])
    put_linear("ref_adaln_proj.fc1", ea["ref_adaln_proj"]["fc1"])
    put_linear("ref_adaln_proj.proj", ea["ref_adaln_proj"]["proj"])
    if "role_embedding" in ea:
        out["role_embedding.embedding.weight"] = np.asarray(
            ea["role_embedding"])
    ra = ea.get("ref_attn") if blocks is None else blocks
    if ra is not None:
        names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v",
                 "to_out": "to_out.0"}
        for ours, theirs in names.items():
            a, b = np.asarray(ra[ours]["a"]), np.asarray(ra[ours]["b"])
            per_block = a.ndim == 3
            for i in range(cfg.num_layers if per_block else 1):
                ai = a[i] if per_block else a
                bi = b[i] if per_block else b
                if per_block and not ai.any() and not bi.any():
                    continue
                pre = (f"diffusion_model.transformer_blocks.{i}"
                       f".ref_attn.{theirs}")
                out[f"{pre}.lora_A.weight"] = ai.T
                out[f"{pre}.lora_B.weight"] = bi.T
    return out
