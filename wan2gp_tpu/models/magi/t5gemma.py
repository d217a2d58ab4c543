"""T5Gemma encoder (the MagiHuman text encoder), TPU-native.

Re-implementation of the HF ``T5GemmaEncoderModel`` used by the reference
(/root/reference/models/magi_human/magi_human_model.py:16,146 — the
t5gemma-9b-9b-ul2 encoder; :160 returns ``last_hidden_state``).  The
encoder is a Gemma2-style stack made bidirectional:

- embeddings scaled by sqrt(hidden);
- sandwich RMSNorms around both attention and MLP (pre/post each), all
  with the Gemma zero-centred ``(1 + weight)`` convention in fp32;
- GQA with query scaling ``query_pre_attn_scalar**-0.5`` and attention
  logit soft-capping ``softcap * tanh(logits / softcap)``;
- alternating sliding/full attention layers — NON-causal: full layers
  attend every valid token, sliding layers attend valid tokens with
  ``|q - kv| < sliding_window`` (transformers masking:
  sliding_window_bidirectional_mask_function);
- single rope (theta 10000) on all layers; GeGLU (gelu-tanh) MLP.

Also used by the stable_audio3 conditioner stack
(models/TTS/stable_audio3/models/conditioners.py).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class T5GemmaEncConfig:
    """Defaults: the t5gemma-9b-9b-ul2 encoder (Gemma2-9B geometry)."""
    vocab_size: int = 256000
    dim: int = 3584
    n_layers: int = 42
    n_heads: int = 16
    n_kv_heads: int = 8
    head_dim: int = 256
    ffn_dim: int = 14336
    query_pre_attn_scalar: float = 256.0
    attn_softcap: float = 50.0
    rope_theta: float = 10_000.0
    sliding_window: int = 4096
    eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    def is_sliding(self, layer: int) -> bool:
        # HF layer_types: even layers sliding, odd layers full.
        return layer % 2 == 0


def init_t5gemma_encoder(key, cfg: T5GemmaEncConfig, dtype=None):
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, cfg.n_layers + 2))

    def lin(k, din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(k, (din, dout), jnp.float32,
                                        -lim, lim).astype(dtype)}

    def layer(k):
        ks = iter(jax.random.split(k, 8))
        d, hd = cfg.dim, cfg.head_dim
        return {
            "pre_attn_norm": jnp.zeros((d,), jnp.float32),
            "q": lin(next(ks), d, cfg.n_heads * hd),
            "k": lin(next(ks), d, cfg.n_kv_heads * hd),
            "v": lin(next(ks), d, cfg.n_kv_heads * hd),
            "o": lin(next(ks), cfg.n_heads * hd, d),
            "post_attn_norm": jnp.zeros((d,), jnp.float32),
            "pre_ffn_norm": jnp.zeros((d,), jnp.float32),
            "gate": lin(next(ks), d, cfg.ffn_dim),
            "up": lin(next(ks), d, cfg.ffn_dim),
            "down": lin(next(ks), cfg.ffn_dim, d),
            "post_ffn_norm": jnp.zeros((d,), jnp.float32),
        }

    layers = [layer(next(keys)) for _ in range(cfg.n_layers)]
    return {
        "embed_tokens": (jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim)) * 0.02).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.zeros((cfg.dim,), jnp.float32),
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * (1.0 + w)).astype(x.dtype)


def _rope_tables(seq_len, head_dim, theta):
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                           / head_dim))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_rope(x, cos, sin):
    d2 = x.shape[-1] // 2
    rot = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
    return (x.astype(jnp.float32) * cos[None, :, None]
            + rot.astype(jnp.float32) * sin[None, :, None]).astype(x.dtype)


def t5gemma_encode(params, cfg: T5GemmaEncConfig, ids, mask):
    """ids/mask: [B, L] int.  Returns last_hidden_state [B, L, dim]
    (final RMSNorm applied, matching T5GemmaEncoderModel.forward)."""
    cdt = cfg.compute_dtype
    b, l = ids.shape
    n, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    x = (params["embed_tokens"][ids].astype(jnp.float32)
         * math.sqrt(cfg.dim)).astype(cdt)

    cos, sin = _rope_tables(l, hd, cfg.rope_theta)
    idx = jnp.arange(l)
    near = jnp.abs(idx[:, None] - idx[None, :]) < cfg.sliding_window
    valid = mask[:, None, None, :] > 0
    neg = jnp.finfo(jnp.float32).min
    bias_full = jnp.where(valid, 0.0, neg)
    bias_slide = jnp.where(valid & near[None, None], 0.0, neg)
    scale = 1.0 / math.sqrt(cfg.query_pre_attn_scalar)
    cap = cfg.attn_softcap

    for i in range(cfg.n_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        bias = bias_slide if cfg.is_sliding(i) else bias_full

        y = _rms(x, lp["pre_attn_norm"], cfg.eps)
        q = jnp.dot(y, lp["q"]["w"].astype(y.dtype)).reshape(b, l, n, hd)
        k = jnp.dot(y, lp["k"]["w"].astype(y.dtype)).reshape(b, l, nkv, hd)
        v = jnp.dot(y, lp["v"]["w"].astype(y.dtype)).reshape(b, l, nkv, hd)
        q = _apply_rope(q, cos, sin)
        k = _apply_rope(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) * scale
        s = cap * jnp.tanh(s / cap)
        a = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(b, l, n * hd)
        o = jnp.dot(o, lp["o"]["w"].astype(o.dtype))
        x = x + _rms(o, lp["post_attn_norm"], cfg.eps)

        y = _rms(x, lp["pre_ffn_norm"], cfg.eps)
        h = jax.nn.gelu(jnp.dot(y, lp["gate"]["w"].astype(y.dtype)
                                ).astype(jnp.float32),
                        approximate=True).astype(cdt)
        h = h * jnp.dot(y, lp["up"]["w"].astype(y.dtype))
        h = jnp.dot(h, lp["down"]["w"].astype(h.dtype))
        x = x + _rms(h, lp["post_ffn_norm"], cfg.eps)

    return _rms(x, params["norm"], cfg.eps)


def load_t5gemma_params(sd: Dict[str, np.ndarray], cfg: T5GemmaEncConfig,
                        dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """HF T5GemmaEncoderModel key space: encoder.{embed_tokens, norm,
    layers.N.{self_attn.{q,k,v,o}_proj, pre_self_attn_layernorm,
    post_self_attn_layernorm, mlp.{gate,up,down}_proj,
    pre_feedforward_layernorm, post_feedforward_layernorm}}; accepts
    model./encoder. prefixes (and the bare-encoder export)."""
    sd = dict(sd)
    for pre in ("model.encoder.", "encoder.", "model."):
        if any(k.startswith(pre + "layers.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break

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
            "pre_attn_norm": w(f"{p}.pre_self_attn_layernorm"),
            "q": lin(f"{p}.self_attn.q_proj"),
            "k": lin(f"{p}.self_attn.k_proj"),
            "v": lin(f"{p}.self_attn.v_proj"),
            "o": lin(f"{p}.self_attn.o_proj"),
            "post_attn_norm": w(f"{p}.post_self_attn_layernorm"),
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
    leftover = [k for k in sd if "rotary" not in k]
    return params, sorted(leftover)
