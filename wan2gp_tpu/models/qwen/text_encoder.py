"""Qwen-family causal-LM text encoder (Qwen2.5-VL text / Qwen3 / Qwen3-VL).

One TPU-native decoder stack serves every family that conditions on Qwen
hidden states:
- Qwen-Image: Qwen2.5-VL-7B last hidden state, chat template with
  drop_idx 34 (/root/reference/models/qwen/pipeline_qwenimage.py:191-266)
- Z-Image: Qwen3-4B caption features (cap_feat_dim 2560)
- Krea2: Qwen3-VL-4B text stack, 12 selected hidden layers
  (/root/reference/models/krea2/krea2_main.py:27,144)

Architecture (HF Qwen2/Qwen3 decoder): RMSNorm pre-norm, GQA attention with
NeoX-style half-rotation RoPE, optional per-head QK RMS-norm (Qwen3),
optional qkv bias (Qwen2), SwiGLU MLP, final RMSNorm.  hidden_states[k]
follows the HF convention: k=0 embeddings, k=i output of layer i, and the
last entry has the final norm applied.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QwenLMConfig:
    vocab_size: int = 152064
    dim: int = 3584
    n_layers: int = 28
    n_heads: int = 28
    n_kv_heads: int = 4
    head_dim: int = 128
    ffn_dim: int = 18944
    rope_theta: float = 1_000_000.0
    qkv_bias: bool = True            # Qwen2.x: True; Qwen3: False
    qk_norm: bool = False            # Qwen3: True
    norm_eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16


# HF config values: Qwen/Qwen2.5-VL-7B-Instruct (text tower),
# Qwen/Qwen3-4B, Qwen/Qwen3-VL-4B-Instruct (language model)
QWEN25_VL_7B_TEXT = dict(vocab_size=152064, dim=3584, n_layers=28,
                         n_heads=28, n_kv_heads=4, head_dim=128,
                         ffn_dim=18944, qkv_bias=True, qk_norm=False)
QWEN3_4B = dict(vocab_size=151936, dim=2560, n_layers=36, n_heads=32,
                n_kv_heads=8, head_dim=128, ffn_dim=9728,
                qkv_bias=False, qk_norm=True)
# Llama-3-8B (Hunyuan Video's llava-llama text tower) is the same decoder
# with no qkv bias and no qk-norm, rope theta 500000
LLAMA3_8B = dict(vocab_size=128320, dim=4096, n_layers=32, n_heads=32,
                 n_kv_heads=8, head_dim=128, ffn_dim=14336,
                 rope_theta=500_000.0, qkv_bias=False, qk_norm=False)


def init_qwen_lm(key, cfg: QwenLMConfig, dtype=None) -> Dict[str, Any]:
    dtype = dtype or cfg.compute_dtype
    keys = iter(jax.random.split(key, 4))

    def lin(key, din, dout, bias):
        limit = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                     -limit, limit).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    def layer(key):
        ks = iter(jax.random.split(key, 8))
        d, hd = cfg.dim, cfg.head_dim
        p = {
            "input_norm": jnp.ones((d,), jnp.float32),
            "q": lin(next(ks), d, cfg.n_heads * hd, cfg.qkv_bias),
            "k": lin(next(ks), d, cfg.n_kv_heads * hd, cfg.qkv_bias),
            "v": lin(next(ks), d, cfg.n_kv_heads * hd, cfg.qkv_bias),
            "o": lin(next(ks), cfg.n_heads * hd, d, False),
            "post_norm": jnp.ones((d,), jnp.float32),
            "gate": lin(next(ks), d, cfg.ffn_dim, False),
            "up": lin(next(ks), d, cfg.ffn_dim, False),
            "down": lin(next(ks), cfg.ffn_dim, d, False),
        }
        if cfg.qk_norm:
            p["q_norm"] = jnp.ones((hd,), jnp.float32)
            p["k_norm"] = jnp.ones((hd,), jnp.float32)
        return p

    layers = [layer(k) for k in jax.random.split(next(keys), cfg.n_layers)]
    return {
        "embed_tokens": (jax.random.normal(
            next(keys), (cfg.vocab_size, cfg.dim), jnp.float32) * 0.02
        ).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": jnp.ones((cfg.dim,), jnp.float32),
    }


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def _neox_rope_tables(seq_len: int, head_dim: int, theta: float):
    """HF Llama/Qwen convention: cos/sin [L, D] with duplicated halves."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                           / head_dim))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv)   # [L, D/2]
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_neox_rope(x, cos, sin):
    """x: [B, L, N, D]; rotate_half convention (q*cos + rot_half(q)*sin)."""
    d2 = x.shape[-1] // 2
    x1, x2 = x[..., :d2], x[..., d2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    c = cos[None, :, None, :].astype(jnp.float32)
    s = sin[None, :, None, :].astype(jnp.float32)
    return (x.astype(jnp.float32) * c + rot.astype(jnp.float32) * s
            ).astype(x.dtype)


def qwen_lm_forward(params, cfg: QwenLMConfig, ids, mask,
                    collect_layers: Optional[Sequence[int]] = None,
                    input_embeds=None):
    """ids/mask: [B, L] int32.  Returns final hidden [B, L, dim] (post final
    norm, == HF hidden_states[-1]); with collect_layers, also returns
    [B, L, len(collect), dim] stacked per-layer hidden states (HF indexing:
    k = output of layer k, k=0 embeddings; the final index includes the
    final norm).  input_embeds: optional [B, L, dim] replacing the token
    embedding lookup (VL feature splicing — the reference Qwen2.5-VL
    masked_scatter path)."""
    cdt = cfg.compute_dtype
    if input_embeds is not None:
        b, l = input_embeds.shape[:2]
        x = input_embeds.astype(cdt)
    else:
        b, l = ids.shape
        x = params["embed_tokens"][ids].astype(cdt)

    cos, sin = _neox_rope_tables(l, cfg.head_dim, cfg.rope_theta)
    causal = jnp.tril(jnp.ones((l, l), bool))
    valid = (mask[:, None, None, :] > 0) & causal[None, None]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)

    n, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    def body(x, lp):
        y = _rms(x, lp["input_norm"], cfg.norm_eps)
        q = _dense(y, lp["q"]).reshape(b, l, n, hd)
        k = _dense(y, lp["k"]).reshape(b, l, nkv, hd)
        v = _dense(y, lp["v"]).reshape(b, l, nkv, hd)
        if cfg.qk_norm:
            q = _rms(q, lp["q_norm"], cfg.norm_eps)
            k = _rms(k, lp["k_norm"], cfg.norm_eps)
        q = _apply_neox_rope(q, cos, sin)
        k = _apply_neox_rope(k, cos, sin)
        if nkv != n:
            k = jnp.repeat(k, n // nkv, axis=2)
            v = jnp.repeat(v, n // nkv, axis=2)
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        p_attn = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", p_attn, v).reshape(b, l, n * hd)
        x = x + _dense(o, lp["o"])
        y = _rms(x, lp["post_norm"], cfg.norm_eps)
        h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                        ).astype(cdt) * _dense(y, lp["up"])
        x = x + _dense(h, lp["down"])
        return x, x

    x, per_layer = jax.lax.scan(body, x, params["layers"])  # [NL, B, L, D]
    final = _rms(x, params["norm"], cfg.norm_eps)
    if collect_layers is None:
        return final
    # hidden_states[k]: k=0 embeddings; k=n_layers gets the final norm
    emb = (input_embeds.astype(cdt) if input_embeds is not None
           else params["embed_tokens"][ids].astype(cdt))
    stacked = [emb if k == 0 else final if k >= cfg.n_layers
               else per_layer[k - 1] for k in collect_layers]
    return final, jnp.stack(stacked, axis=2)   # [B, L, n_sel, D]


# ---------------------------------------------------------------------------
# HF checkpoint loading
# ---------------------------------------------------------------------------

def load_qwen_lm_params(sd: Dict[str, np.ndarray], cfg: QwenLMConfig,
                        dtype=jnp.bfloat16) -> Tuple[dict, List[str]]:
    """HF key space: model.layers.N.{input_layernorm, self_attn.{q,k,v,o}
    _proj, post_attention_layernorm, mlp.{gate,up,down}_proj}, model.norm,
    model.embed_tokens.  Accepts optional 'model.' / 'language_model.'
    prefixes; lm_head is dropped."""
    sd = dict(sd)
    for pre in ("model.language_model.", "language_model.model.",
                "language_model.", "model."):
        if any(k.startswith(pre + "layers.") for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}
            break
    sd.pop("lm_head.weight", None)

    def lin(name):
        w = np.asarray(sd.pop(f"{name}.weight"))
        p = {"w": jnp.asarray(w.T.astype(np.float32)).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def w(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}.weight"), np.float32))

    layers = []
    for i in range(cfg.n_layers):
        pre = f"layers.{i}"
        p = {
            "input_norm": w(f"{pre}.input_layernorm"),
            "q": lin(f"{pre}.self_attn.q_proj"),
            "k": lin(f"{pre}.self_attn.k_proj"),
            "v": lin(f"{pre}.self_attn.v_proj"),
            "o": lin(f"{pre}.self_attn.o_proj"),
            "post_norm": w(f"{pre}.post_attention_layernorm"),
            "gate": lin(f"{pre}.mlp.gate_proj"),
            "up": lin(f"{pre}.mlp.up_proj"),
            "down": lin(f"{pre}.mlp.down_proj"),
        }
        if cfg.qk_norm:
            p["q_norm"] = w(f"{pre}.self_attn.q_norm")
            p["k_norm"] = w(f"{pre}.self_attn.k_norm")
        layers.append(p)

    params = {
        "embed_tokens": jnp.asarray(np.asarray(
            sd.pop("embed_tokens.weight"), np.float32)).astype(dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "norm": w("norm"),
    }
    return params, sorted(sd.keys())


# ---------------------------------------------------------------------------
# prompt -> embedding closures
# ---------------------------------------------------------------------------

QWEN_IMAGE_TEMPLATE = (
    "<|im_start|>system\nDescribe the image by detailing the color, shape, "
    "size, texture, quantity, text, spatial relationships of the objects "
    "and background:<|im_end|>\n<|im_start|>user\n{}<|im_end|>\n"
    "<|im_start|>assistant\n")
QWEN_IMAGE_DROP_IDX = 34   # pipeline_qwenimage.py:192


def make_qwen_text_encode_fn(params, cfg: QwenLMConfig, tokenizer,
                             template: str = QWEN_IMAGE_TEMPLATE,
                             drop_idx: int = QWEN_IMAGE_DROP_IDX,
                             max_len: int = 1024,
                             collect_layers: Optional[Sequence[int]] = None):
    """Returns fn(prompts) -> (embeds [B, L, dim], mask [B, L]) mirroring
    _get_qwen_prompt_embeds (template wrap, encode, drop template prefix).
    With collect_layers: embeds is [B, L, n_sel, dim] (Krea2 conditioner)."""
    def encode(prompts):
        txt = [template.format(p) for p in prompts]
        ids, mask = tokenizer(txt, max_len + drop_idx)
        ids, mask = jnp.asarray(ids), jnp.asarray(mask)
        if collect_layers is None:
            hidden = qwen_lm_forward(params, cfg, ids, mask)
        else:
            _, hidden = qwen_lm_forward(params, cfg, ids, mask,
                                        collect_layers=collect_layers)
        emb = hidden[:, drop_idx:]
        out_mask = mask[:, drop_idx:]
        emb = emb * (out_mask[:, :, None, None] > 0 if emb.ndim == 4
                     else out_mask[:, :, None] > 0)
        return emb.astype(jnp.float32), out_mask
    return encode


# ---------------------------------------------------------------------------
# greedy decoding (prompt enhancer / agent runtimes)
# ---------------------------------------------------------------------------

def sample_logits(logits, key, temperature: float = 0.0,
                  top_p: float = 1.0):
    """Sample next tokens from [B, V] fp32 logits.

    temperature<=0 -> greedy argmax.  top_p<1 keeps the smallest prefix
    of the sorted distribution whose mass reaches top_p (nucleus) —
    the reference's local-LLM sampler options
    (shared/llm_engines/nanovllm sampler; deepy temperature/top_p)."""
    if temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / jnp.float32(max(temperature, 1e-5))
    if top_p < 1.0:
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens while the cumulative mass BEFORE them is < top_p
        keep_mass = cum - probs < top_p
        cutoff = jnp.min(jnp.where(keep_mass, sorted_logits, jnp.inf),
                         axis=-1, keepdims=True)
        logits = jnp.where(logits >= cutoff, logits, -jnp.inf)
    return jax.random.categorical(key, logits, axis=-1).astype(jnp.int32)


def qwen_lm_generate(params, cfg: QwenLMConfig, ids, mask,
                     max_new_tokens: int = 128,
                     eos_token_id: Optional[int] = None,
                     lm_head=None, prefix_embeds=None,
                     temperature: float = 0.0, top_p: float = 1.0,
                     sample_key=None, length_bucket: int = 64):
    """Batched decode with a KV cache under lax.scan.

    ids/mask: [B, L] right-padded prompts.  Returns [B, max_new_tokens]
    int32 (padded with eos after the first eos when eos_token_id is set).
    lm_head: optional [dim, vocab] projection; defaults to tied embeddings
    (Qwen3 ties word embeddings; Qwen2.5 ships an explicit lm_head).
    prefix_embeds: optional [B, P, dim] embeddings (e.g. the VL vision
    tower's merged image features) prepended before the text tokens —
    the multimodal path of the VL prompt enhancer
    (shared/prompt_enhancer/qwen35_vl.py).
    temperature/top_p/sample_key: sampler options (greedy when
    temperature<=0) — the nanovllm sampler analog.

    TPU-native "paged KV": the cache length is bucketed to a multiple of
    `length_bucket` so different prompt lengths share compiled programs
    (static shapes stand in for nanovllm's dynamic page tables, which
    have no efficient XLA analog); rows track their own positions, so a
    ragged batch decodes correctly in one program (batched prefill +
    batched decode — the throughput role of nanovllm's batching).
    """
    cdt = cfg.compute_dtype
    b, l_txt = ids.shape
    n_prefix = 0 if prefix_embeds is None else prefix_embeds.shape[1]
    l0 = l_txt + n_prefix
    total = l0 + max_new_tokens
    if length_bucket > 1:
        total = -(-total // length_bucket) * length_bucket
    n, nkv, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    head = (params["embed_tokens"].T if lm_head is None else lm_head)
    if sample_key is None:
        sample_key = jax.random.key(0)

    cos_all, sin_all = _neox_rope_tables(total, hd, cfg.rope_theta)

    def layer_qkv(lp, y, cos, sin):
        L = y.shape[1]
        q = _dense(y, lp["q"]).reshape(b, L, n, hd)
        k = _dense(y, lp["k"]).reshape(b, L, nkv, hd)
        v = _dense(y, lp["v"]).reshape(b, L, nkv, hd)
        if cfg.qk_norm:
            q = _rms(q, lp["q_norm"], cfg.norm_eps)
            k = _rms(k, lp["k_norm"], cfg.norm_eps)
        q = _apply_neox_rope(q, cos, sin)
        k = _apply_neox_rope(k, cos, sin)
        return q, k, v

    def mlp(lp, x):
        y = _rms(x, lp["post_norm"], cfg.norm_eps)
        h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                        ).astype(cdt) * _dense(y, lp["up"])
        return x + _dense(h, lp["down"])

    # ---- prefill: full causal pass, cache k/v padded to `total` --------
    x = params["embed_tokens"][ids].astype(cdt)
    if prefix_embeds is not None:
        x = jnp.concatenate([prefix_embeds.astype(cdt), x], axis=1)
        mask = jnp.concatenate(
            [jnp.ones((b, n_prefix), mask.dtype), mask], axis=1)
    causal = jnp.tril(jnp.ones((l0, l0), bool))
    valid = (mask[:, None, None, :] > 0) & causal[None, None]
    bias = jnp.where(valid, 0.0, jnp.finfo(jnp.float32).min)

    def prefill_layer(x, lp):
        y = _rms(x, lp["input_norm"], cfg.norm_eps)
        q, k, v = layer_qkv(lp, y, cos_all[:l0], sin_all[:l0])
        kk = jnp.repeat(k, n // nkv, axis=2) if nkv != n else k
        vv = jnp.repeat(v, n // nkv, axis=2) if nkv != n else v
        s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                       preferred_element_type=jnp.float32) / math.sqrt(hd)
        p_attn = jax.nn.softmax(s + bias, axis=-1).astype(cdt)
        o = jnp.einsum("bnls,bsnd->blnd", p_attn, vv).reshape(b, l0, n * hd)
        x = mlp(lp, x + _dense(o, lp["o"]))
        pad = jnp.zeros((b, total - l0, nkv, hd), k.dtype)
        return x, (jnp.concatenate([k, pad], axis=1),
                   jnp.concatenate([v, pad], axis=1))

    x, (k_cache, v_cache) = jax.lax.scan(prefill_layer, x,
                                         params["layers"])
    final = _rms(x, params["norm"], cfg.norm_eps)
    last = jnp.sum(mask, axis=1) - 1                       # [B]
    h_last = jnp.take_along_axis(final, last[:, None, None], axis=1)[:, 0]
    logits = jnp.dot(h_last.astype(jnp.float32),
                     head.astype(jnp.float32))
    tok0 = sample_logits(logits, sample_key, temperature, top_p)

    # ---- decode: one token per step, per-ROW cache position -------------
    rows = jnp.arange(b)

    def step(carry, key):
        tok, pos, k_cache, v_cache, done = carry
        x = params["embed_tokens"][tok][:, None].astype(cdt)  # [B,1,D]
        key_valid = jnp.arange(total)[None] <= pos[:, None]   # [B, total]
        kbias = jnp.where(key_valid[:, None, None, :], 0.0,
                          jnp.finfo(jnp.float32).min)
        # per-row rope tables at each row's own position (ragged batch)
        c = cos_all[pos][:, None, None].astype(jnp.float32)   # [B,1,1,hd]
        s_ = sin_all[pos][:, None, None].astype(jnp.float32)

        def rope_row(x):
            d2 = x.shape[-1] // 2
            rot = jnp.concatenate([-x[..., d2:], x[..., :d2]], axis=-1)
            return (x.astype(jnp.float32) * c
                    + rot.astype(jnp.float32) * s_).astype(x.dtype)

        def layer(carry, xs):
            x = carry
            lp, kc, vc = xs
            y = _rms(x, lp["input_norm"], cfg.norm_eps)
            q = _dense(y, lp["q"]).reshape(b, 1, n, hd)
            k = _dense(y, lp["k"]).reshape(b, 1, nkv, hd)
            v = _dense(y, lp["v"]).reshape(b, 1, nkv, hd)
            if cfg.qk_norm:
                q = _rms(q, lp["q_norm"], cfg.norm_eps)
                k = _rms(k, lp["k_norm"], cfg.norm_eps)
            q = rope_row(q)
            k = rope_row(k)
            kc = kc.at[rows, pos].set(k[:, 0])
            vc = vc.at[rows, pos].set(v[:, 0])
            kk = jnp.repeat(kc, n // nkv, axis=2) if nkv != n else kc
            vv = jnp.repeat(vc, n // nkv, axis=2) if nkv != n else vc
            s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                           preferred_element_type=jnp.float32
                           ) / math.sqrt(hd)
            p_attn = jax.nn.softmax(s + kbias, axis=-1).astype(cdt)
            o = jnp.einsum("bnls,bsnd->blnd", p_attn, vv
                           ).reshape(b, 1, n * hd)
            x = mlp(lp, x + _dense(o, lp["o"]))
            return x, (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            layer, x, (params["layers"], k_cache, v_cache))
        h = _rms(x[:, 0], params["norm"], cfg.norm_eps)
        logits = jnp.dot(h.astype(jnp.float32), head.astype(jnp.float32))
        nxt = sample_logits(logits, key, temperature, top_p)
        if eos_token_id is not None:
            nxt = jnp.where(done, eos_token_id, nxt)
            done = done | (nxt == eos_token_id)
        return (nxt, pos + 1, k_cache, v_cache, done), tok

    done0 = jnp.zeros((b,), bool)
    if eos_token_id is not None:
        done0 = tok0 == eos_token_id
    step_keys = jax.random.split(sample_key, max_new_tokens)
    (_, _, _, _, _), toks = jax.lax.scan(
        step, (tok0, last + 1, k_cache, v_cache, done0), step_keys,
        length=max_new_tokens)
    return toks.transpose(1, 0)     # [B, max_new_tokens]
