"""Gemma-3 text model (the LTX-2 caption encoder), TPU-native.

Re-implementation of the HF Gemma3 text stack used by
/root/reference/models/ltx2/ltx_core/text_encoders/gemma/ (encoders/
base_encoder.py:20 GemmaTextEncoderModelBase wraps
Gemma3ForConditionalGeneration): embeddings scaled by sqrt(dim),
sandwich-norm decoder layers (input/post-attention AND
pre/post-feedforward RMSNorms with Gemma's (1 + weight) convention),
GQA with per-head qk RMSNorm and query scaling 1/sqrt(query_pre_attn_
scalar), alternating sliding-window / global attention layers with TWO
rope bases (local 10k, global 1M linearly scaled by rope_scaling factor
8 on the shipped 12B), GeGLU (gelu-tanh) MLP.

The LTX-2 feature extractor (feature_extractor.py
GemmaFeaturesExtractorProjLinear:53) stacks ALL hidden states
[B, T, D, L+1], per-token-RMS-normalizes (v2 / 22B) or batch-range
normalizes (v1 / 19B), flattens to D*(L+1) and projects to the caption
dim; Embeddings1DConnector refinement runs as small rms-norm transformer
blocks over the projected sequence (embeddings_connector.py:74).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Gemma3Config:
    vocab_size: int = 262208
    dim: int = 3840                  # Gemma3-12B text
    n_layers: int = 48
    n_heads: int = 16
    n_kv_heads: int = 8
    head_dim: int = 256
    ffn_dim: int = 15360
    query_pre_attn_scalar: float = 256.0
    rope_theta: float = 1_000_000.0  # global layers
    rope_local_theta: float = 10_000.0
    rope_scaling_factor: float = 8.0  # linear scaling on global layers
    sliding_window: int = 1024
    sliding_window_pattern: int = 6   # every 6th layer is global
    eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    def is_global(self, layer: int) -> bool:
        return (layer + 1) % self.sliding_window_pattern == 0


def init_gemma3(key, cfg: Gemma3Config, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 4 * cfg.n_layers + 4))

    def lin(din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(next(keys), (din, dout),
                                        jnp.float32, -lim,
                                        lim).astype(dtype)}

    def layer():
        d, hd = cfg.dim, cfg.head_dim
        return {
            "input_norm": jnp.zeros((d,), jnp.float32),
            "q": lin(d, cfg.n_heads * hd),
            "k": lin(d, cfg.n_kv_heads * hd),
            "v": lin(d, cfg.n_kv_heads * hd),
            "o": lin(cfg.n_heads * hd, d),
            "q_norm": jnp.zeros((hd,), jnp.float32),
            "k_norm": jnp.zeros((hd,), jnp.float32),
            "post_attn_norm": jnp.zeros((d,), jnp.float32),
            "pre_ffn_norm": jnp.zeros((d,), jnp.float32),
            "gate": lin(d, cfg.ffn_dim),
            "up": lin(d, cfg.ffn_dim),
            "down": lin(cfg.ffn_dim, d),
            "post_ffn_norm": jnp.zeros((d,), jnp.float32),
        }

    layers = [layer() for _ in range(cfg.n_layers)]
    return {
        "embed_tokens": (jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim)) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.zeros((cfg.dim,), jnp.float32),
    }


def _gemma_rms(x, w, eps):
    """Gemma RMSNorm: normed * (1 + weight), fp32."""
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * (1.0 + w)).astype(x.dtype)


def _rope_tables(seq_len, head_dim, theta, scaling=1.0):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                           / head_dim)) / scaling
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_rope(x, cos, sin):
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos[None, :, None]
            + rot.astype(jnp.float32) * sin[None, :, None]).astype(x.dtype)


def gemma3_forward(params, cfg: Gemma3Config, ids, mask,
                   collect_hidden: bool = False):
    """ids/mask: [B, L].  Returns final hidden [B, L, dim]; with
    collect_hidden also [B, L, n_layers+1, dim] (HF hidden_states order:
    0 = scaled embeddings, i = after layer i, last includes final norm
    only in the FINAL output, matching output_hidden_states=True)."""
    cdt = cfg.compute_dtype
    b, l = ids.shape
    n, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    x = params["embed_tokens"][ids].astype(jnp.float32) \
        * math.sqrt(cfg.dim)
    x = x.astype(cdt)
    hiddens = [x]

    cos_g, sin_g = _rope_tables(l, hd, cfg.rope_theta,
                                cfg.rope_scaling_factor)
    cos_l, sin_l = _rope_tables(l, hd, cfg.rope_local_theta)
    causal = jnp.tril(jnp.ones((l, l), bool))
    idx = jnp.arange(l)
    local = causal & (idx[None] > idx[:, None] - cfg.sliding_window)
    valid = mask[:, None, None, :] > 0
    bias_g = jnp.where(valid & causal[None, None], 0.0,
                       jnp.finfo(jnp.float32).min)
    bias_l = jnp.where(valid & local[None, None], 0.0,
                       jnp.finfo(jnp.float32).min)
    scale = 1.0 / math.sqrt(cfg.query_pre_attn_scalar)

    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        is_g = cfg.is_global(i)
        cos, sin = (cos_g, sin_g) if is_g else (cos_l, sin_l)
        bias = bias_g if is_g else bias_l

        y = _gemma_rms(x, lp["input_norm"], cfg.eps)
        q = jnp.dot(y, lp["q"]["w"].astype(y.dtype)).reshape(b, l, n, hd)
        k = jnp.dot(y, lp["k"]["w"].astype(y.dtype)).reshape(b, l, nkv, hd)
        v = jnp.dot(y, lp["v"]["w"].astype(y.dtype)).reshape(b, l, nkv, hd)
        q = _gemma_rms(q, lp["q_norm"], cfg.eps)
        k = _gemma_rms(k, lp["k_norm"], cfg.eps)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, n * hd)
        o = jnp.dot(o, lp["o"]["w"].astype(o.dtype))
        x = x + _gemma_rms(o, lp["post_attn_norm"], cfg.eps)

        y = _gemma_rms(x, lp["pre_ffn_norm"], cfg.eps)
        h = jax.nn.gelu(jnp.dot(y, lp["gate"]["w"].astype(y.dtype)
                                ).astype(jnp.float32),
                        approximate=True).astype(cdt)
        h = h * jnp.dot(y, lp["up"]["w"].astype(y.dtype))
        h = jnp.dot(h, lp["down"]["w"].astype(h.dtype))
        x = x + _gemma_rms(h, lp["post_ffn_norm"], cfg.eps)
        hiddens.append(x)

    final = _gemma_rms(x, params["norm"], cfg.eps)
    if not collect_hidden:
        return final
    hiddens[-1] = final
    return final, jnp.stack(hiddens, axis=2)     # [B, L, n_layers+1, D]


def load_gemma3_params(sd: Dict[str, np.ndarray], cfg: Gemma3Config,
                       dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """HF Gemma3 key space (model.layers.N.{self_attn.{q,k,v,o}_proj,
    input_layernorm, post_attention_layernorm, pre_feedforward_layernorm,
    post_feedforward_layernorm, mlp.{gate,up,down}_proj, self_attn.
    {q,k}_norm}); accepts language_model./model. prefixes."""
    sd = dict(sd)
    for pre in ("model.language_model.", "language_model.model.",
                "language_model.", "model."):
        if any(k.startswith(pre + "layers.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break
    sd.pop("lm_head.weight", None)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
            sd.pop(f"{name}.weight"), np.float32).T).astype(dtype)}

    def w(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                      np.float32))

    layers = []
    for i in range(cfg.n_layers):
        p = f"layers.{i}"
        layers.append({
            "input_norm": w(f"{p}.input_layernorm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.o_proj"),
            "q_norm": w(f"{p}.self_attn.q_norm"),
            "k_norm": w(f"{p}.self_attn.k_norm"),
            "post_attn_norm": w(f"{p}.post_attention_layernorm"),
            "pre_ffn_norm": w(f"{p}.pre_feedforward_layernorm"),
            "gate": lin(f"{p}.mlp.gate_proj"),
            "up": lin(f"{p}.mlp.up_proj"),
            "down": lin(f"{p}.mlp.down_proj"),
            "post_ffn_norm": w(f"{p}.post_feedforward_layernorm"),
        })
    params = {
        "embed_tokens": jnp.asarray(np.asarray(
            sd.pop("embed_tokens.weight"), np.float32)).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": w("norm"),
    }
    leftover = [k for k in sd if "rotary" not in k
                and not k.startswith(("vision_tower", "multi_modal"))]
    return params, sorted(leftover)


# ---------------------------------------------------------------------------
# LTX-2 feature extraction (feature_extractor.py:53)
# ---------------------------------------------------------------------------

def extract_caption_features(hidden_stack, attention_mask, proj_w,
                             mode: str = "per_token_rms"):
    """hidden_stack: [B, T, n_layers+1, D]; proj_w: [D*(L+1), out].
    v2 (22B): per-token RMS over D (feature_extractor.py:39-45); v1
    (19B): masked batch range-normalization (:9-36).  Returns
    [B, T, out] masked embeddings."""
    b, t, nl, d = hidden_stack.shape
    x = hidden_stack.astype(jnp.float32).transpose(0, 1, 3, 2)  # [B,T,D,L]
    m = attention_mask.astype(jnp.float32)
    if mode == "per_token_rms":
        var = jnp.mean(x * x, axis=2, keepdims=True)
        normed = x * jax.lax.rsqrt(var + 1e-6)
    else:
        seq_len = m.sum(axis=1)
        denom = (seq_len * d).reshape(b, 1, 1, 1)
        masked = x * m[:, :, None, None]
        mean = masked.sum(axis=(1, 2), keepdims=True) / (denom + 1e-6)
        big = jnp.where(m[:, :, None, None] > 0, x, jnp.inf)
        small = jnp.where(m[:, :, None, None] > 0, x, -jnp.inf)
        x_min = big.min(axis=(1, 2), keepdims=True)
        x_max = small.max(axis=(1, 2), keepdims=True)
        normed = 8.0 * (x - mean) / (x_max - x_min + 1e-6)
    flat = normed.reshape(b, t, d * nl)
    out = jnp.dot(flat, proj_w.astype(jnp.float32))
    return out * m[:, :, None]
