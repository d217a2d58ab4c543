"""HeartMuLa: CSM-style music-generation LM + HeartCodec decoder.

TPU-native re-implementation of /root/reference/models/TTS/HeartMula/:
- heartmula/modeling_heartmula.py:119 (HeartMuLa) — a llama-3B backbone
  (torchtune-convention GQA, llama3 NTK-by-parts scaled RoPE base 500k
  scale 32) consumes per-position summed embeddings of 8 audio-codebook
  tokens + 1 text token; codebook0 sampled from codebook0_head with
  dual-batch CFG; a 3-layer llama-300M decoder autoregressively emits
  codebooks 1..7 per frame via per-codebook audio_head matrices
  (generate_frame:221-319);
- heartmula/pipeline.py:266 — prompt layout `<tag>tags</tag>` + one muq
  slot + lyrics on the text column, 80 ms frames, audio_eos 8193;
- heartcodec/models/flow_matching.py — RVQ code lookup (8x[8192,32]
  codebooks summed, project_out 32->512) -> cond embed -> 2x nearest
  upsample -> CFG euler flow matching over 256-d latents with the
  two-stack LlamaTransformer estimator (24 blocks @1536 + input concat
  -> 6 blocks @3072, ada_norm_single);
- heartcodec/models/sq_codec.py ScalarModel.decode:521 — round-to-1/9
  scalar quantization + causal ConvTranspose upsampling stack (PReLU
  residual units) producing 48 kHz stereo (the 256-d latent splits into
  two 128-d channels, modeling_heartcodec.py:166-171).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class HeartMuLaConfig:
    # backbone llama-3B (modeling_heartmula.py:10-23)
    dim: int = 3072
    n_layers: int = 28
    n_heads: int = 24
    n_kv_heads: int = 8
    ffn_dim: int = 8192
    # decoder llama-300M (modeling_heartmula.py:26-39)
    dec_layers: int = 3
    dec_heads: int = 8
    dec_kv_heads: int = 4
    text_vocab_size: int = 128256
    audio_vocab_size: int = 8197
    audio_num_codebooks: int = 8
    muq_dim: int = 512
    rope_base: float = 500_000.0
    rope_scale_factor: int = 32
    eps: float = 1e-5
    text_bos_id: int = 128000
    text_eos_id: int = 128001
    audio_eos_id: int = 8193
    empty_id: int = 0
    compute_dtype: Any = jnp.float32

    @property
    def head_dim(self):
        return self.dim // self.n_heads


def llama3_scaled_rope(seq_len: int, head_dim: int,
                       base: float = 500_000.0, scale_factor: int = 32,
                       low_freq_factor: int = 1,
                       high_freq_factor: int = 4,
                       old_context_len: int = 8192):
    """NTK-by-parts scaled rope tables (llama_blocks.py:133-155).
    Returns (cos, sin) [seq, head_dim//2] for interleaved pairs."""
    freqs = 1.0 / (base ** (np.arange(0, head_dim, 2,
                                      dtype=np.float64) / head_dim))
    low_wl = old_context_len / low_freq_factor
    high_wl = old_context_len / high_freq_factor
    out = np.empty_like(freqs)
    for i, f in enumerate(freqs):
        wl = 2 * math.pi / f
        if wl < high_wl:
            out[i] = f
        elif wl > low_wl:
            out[i] = f / scale_factor
        else:
            smooth = (old_context_len / wl - low_freq_factor) / (
                high_freq_factor - low_freq_factor)
            out[i] = (1 - smooth) * f / scale_factor + smooth * f
    ang = np.outer(np.arange(seq_len, dtype=np.float64), out)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_rope(x, cos, sin):
    """Interleaved-pair rope; cos/sin [L, hd//2]; x [B, L, N, hd]."""
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([xr[..., 0] * c - xr[..., 1] * s,
                     xr[..., 1] * c + xr[..., 0] * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# llama stacks (init + loaders)
# ---------------------------------------------------------------------------

def _init_llama_layer(key, dim, ffn, n, nkv, hd, dtype):
    keys = iter(jax.random.split(key, 8))

    def lin(din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": (jax.random.uniform(next(keys), (din, dout),
                                         jnp.float32, -lim, lim)
                      ).astype(dtype)}

    return {"q": lin(dim, n * hd), "k": lin(dim, nkv * hd),
            "v": lin(dim, nkv * hd), "o": lin(n * hd, dim),
            "sa_norm": jnp.ones((dim,), jnp.float32),
            "mlp_norm": jnp.ones((dim,), jnp.float32),
            "w1": lin(dim, ffn), "w3": lin(dim, ffn),
            "w2": lin(ffn, dim)}


def init_heartmula(key, cfg: HeartMuLaConfig = HeartMuLaConfig(),
                   dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    hd = cfg.head_dim

    def stack(n_layers, n, nkv):
        layers = [_init_llama_layer(next(keys), cfg.dim, cfg.ffn_dim, n,
                                    nkv, hd, dtype)
                  for _ in range(n_layers)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def emb(v, d):
        return (jax.random.normal(next(keys), (v, d), jnp.float32)
                * 0.02).astype(dtype)

    def lin(din, dout, bias=False):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": (jax.random.uniform(next(keys), (din, dout),
                                      jnp.float32, -lim, lim)
                   ).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    return {
        "backbone": stack(cfg.n_layers, cfg.n_heads, cfg.n_kv_heads),
        "backbone_norm": jnp.ones((cfg.dim,), jnp.float32),
        "decoder": stack(cfg.dec_layers, cfg.dec_heads, cfg.dec_kv_heads),
        "decoder_norm": jnp.ones((cfg.dim,), jnp.float32),
        "text_embeddings": emb(cfg.text_vocab_size, cfg.dim),
        "audio_embeddings": emb(
            cfg.audio_vocab_size * cfg.audio_num_codebooks, cfg.dim),
        "uncond_text_embedding": emb(1, cfg.dim),
        "projection": lin(cfg.dim, cfg.dim),
        "codebook0_head": lin(cfg.dim, cfg.audio_vocab_size),
        "audio_head": (jax.random.normal(
            next(keys), (cfg.audio_num_codebooks - 1, cfg.dim,
                         cfg.audio_vocab_size), jnp.float32)
            * 0.02).astype(dtype),
        "muq_linear": lin(cfg.muq_dim, cfg.dim, bias=True),
    }


def load_heartmula_params(sd: Dict[str, np.ndarray],
                          cfg: HeartMuLaConfig = HeartMuLaConfig(),
                          dtype=jnp.float32):
    """HeartMuLa safetensors keys (torchtune llama convention:
    backbone.layers.N.attn.{q,k,v,output}_proj, .sa_norm.scale,
    .mlp.{w1,w2,w3}, backbone.norm.scale, ...)."""
    sd = dict(sd)

    def lin(name, bias=False):
        p = {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                         np.float32).T).astype(dtype)}
        if bias and f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)
        return p

    def stack(prefix, n_layers):
        layers = []
        for i in range(n_layers):
            pre = f"{prefix}.layers.{i}"
            layers.append({
                "q": lin(f"{pre}.attn.q_proj"),
                "k": lin(f"{pre}.attn.k_proj"),
                "v": lin(f"{pre}.attn.v_proj"),
                "o": lin(f"{pre}.attn.output_proj"),
                "sa_norm": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.sa_norm.scale"), np.float32)),
                "mlp_norm": jnp.asarray(np.asarray(
                    sd.pop(f"{pre}.mlp_norm.scale"), np.float32)),
                "w1": lin(f"{pre}.mlp.w1"), "w2": lin(f"{pre}.mlp.w2"),
                "w3": lin(f"{pre}.mlp.w3"),
            })
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def emb(name):
        return jnp.asarray(np.asarray(sd.pop(name),
                                      np.float32)).astype(dtype)

    # decoder may be wrapped in a ModuleList (decoder.0.*)
    dec_pre = ("decoder.0" if any(k.startswith("decoder.0.layers")
                                  for k in sd) else "decoder")
    p = {
        "backbone": stack("backbone", cfg.n_layers),
        "backbone_norm": emb("backbone.norm.scale").astype(jnp.float32),
        "decoder": stack(dec_pre, cfg.dec_layers),
        "decoder_norm": emb(f"{dec_pre}.norm.scale").astype(jnp.float32),
        "text_embeddings": emb("text_embeddings.weight"),
        "audio_embeddings": emb("audio_embeddings.weight"),
        "uncond_text_embedding": emb("unconditional_text_embedding.weight"),
        "projection": lin("projection"),
        "codebook0_head": lin("codebook0_head"),
        "audio_head": emb("audio_head"),
        "muq_linear": lin("muq_linear", bias=True),
    }
    leftover = [k for k in sd if "rope" not in k and "cache" not in k]
    return p, sorted(leftover)


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def heartmula_generate(params, cfg: HeartMuLaConfig, tokens, tokens_mask,
                       max_frames: int = 64, temperature: float = 0.9,
                       topk: int = 50, cfg_scale: float = 1.5,
                       muq_embed=None, muq_idx: int = 0, key=None):
    """Frame-autoregressive generation (modeling_heartmula.py
    generate_frame:221 + pipeline.py _forward:317).

    tokens: [L0, K+1] int32 prompt (audio codebooks + text column);
    tokens_mask: [L0, K+1] bool.  Returns (codes [T, K] int32, n_valid
    frames before audio EOS)."""
    use_cfg = cfg_scale != 1.0
    b = 2 if use_cfg else 1
    nq = cfg.audio_num_codebooks
    h = cfg.dim
    hd = cfg.head_dim
    l0 = tokens.shape[0]
    total = l0 + max_frames
    cos_all, sin_all = llama3_scaled_rope(total, hd, cfg.rope_base,
                                          cfg.rope_scale_factor)
    dec_cos, dec_sin = llama3_scaled_rope(nq + 1, hd, cfg.rope_base,
                                          cfg.rope_scale_factor)
    cdt = cfg.compute_dtype

    def embed_step(tok, mask, uncond_row):
        """tok [B, L, K+1] -> summed embeds [B, L, D]
        (modeling_heartmula.py _embed_tokens:344)."""
        text = params["text_embeddings"][tok[..., -1]]
        if use_cfg:
            un = params["uncond_text_embedding"][0]
            sel = uncond_row.reshape(b, 1, 1)
            text = jnp.where(sel, un, text)
        audio_tok = tok[..., :-1] + (cfg.audio_vocab_size
                                     * jnp.arange(nq))
        audio = params["audio_embeddings"][audio_tok]   # [B,L,K,D]
        emb = jnp.concatenate([audio, text[..., None, :]], axis=-2)
        return (emb * mask[..., None]).sum(axis=-2)

    uncond_row = jnp.asarray([False, True][:b])
    tok_b = jnp.broadcast_to(tokens[None], (b, l0, nq + 1))
    mask_b = jnp.broadcast_to(tokens_mask[None], (b, l0, nq + 1))
    x = embed_step(tok_b, mask_b, uncond_row).astype(cdt)
    if muq_embed is not None:
        mu = _dense(jnp.asarray(muq_embed, jnp.float32)[None],
                    params["muq_linear"])
        mu = jnp.broadcast_to(mu, (b, h))
        if use_cfg:
            mu = jnp.where(uncond_row[:, None],
                           params["uncond_text_embedding"][0], mu)
        x = x.at[:, muq_idx].set(mu.astype(cdt))

    n, nkv = cfg.n_heads, cfg.n_kv_heads
    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0,
                      jnp.finfo(jnp.float32).min)

    def prefill_layer(x, lp):
        y = _rms(x, lp["sa_norm"], cfg.eps)
        q = _dense(y, lp["q"]).reshape(b, l0, n, hd)
        k = _dense(y, lp["k"]).reshape(b, l0, nkv, hd)
        v = _dense(y, lp["v"]).reshape(b, l0, nkv, hd)
        q = _apply_rope(q, cos_all[:l0], sin_all[:l0])
        k = _apply_rope(k, cos_all[:l0], sin_all[:l0])
        kk = jnp.repeat(k, n // nkv, axis=2)
        vv = jnp.repeat(v, n // nkv, axis=2)
        s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                       preferred_element_type=jnp.float32) \
            / math.sqrt(hd)
        a = jax.nn.softmax(s + bias0, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, l0, n * hd)
        x = x + _dense(o, lp["o"])
        y = _rms(x, lp["mlp_norm"], cfg.eps)
        hh = jax.nn.silu(_dense(y, lp["w1"]).astype(jnp.float32)
                         ).astype(x.dtype) * _dense(y, lp["w3"])
        x = x + _dense(hh, lp["w2"])
        padk = jnp.zeros((b, max_frames, nkv, hd), k.dtype)
        return x, (jnp.concatenate([k, padk], axis=1),
                   jnp.concatenate([v, padk], axis=1))

    x, (k_cache, v_cache) = jax.lax.scan(prefill_layer, x,
                                         params["backbone"])
    last_h = _rms(x[:, -1], params["backbone_norm"], cfg.eps)

    def sample(logits, kf):
        logits = logits / max(temperature, 1e-5)
        k_eff = min(topk, logits.shape[-1])
        kth = jax.lax.top_k(logits, k_eff)[0][..., -1:]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
        if key is None:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(kf, logits,
                                      axis=-1).astype(jnp.int32)

    def guided(logits):
        if not use_cfg:
            return logits[0]
        return logits[1] + (logits[0] - logits[1]) * cfg_scale

    dn, dnkv = cfg.dec_heads, cfg.dec_kv_heads
    dhd = cfg.dim // dn

    def decode_codebooks(last_h, c0, kf):
        """Small-decoder loop over codebooks 1..K-1
        (generate_frame:282-316)."""
        c0_embed = params["audio_embeddings"][c0]
        seq = jnp.stack([last_h, c0_embed], axis=1)      # [B, 2, D]
        seq = _dense(seq.astype(cdt), params["projection"])

        dcausal = jnp.tril(jnp.ones((2, 2), bool))
        dbias = jnp.where(dcausal[None, None], 0.0,
                          jnp.finfo(jnp.float32).min)

        def dec_prefill(x, lp):
            y = _rms(x, lp["sa_norm"], cfg.eps)
            q = _dense(y, lp["q"]).reshape(b, 2, dn, dhd)
            k = _dense(y, lp["k"]).reshape(b, 2, dnkv, dhd)
            v = _dense(y, lp["v"]).reshape(b, 2, dnkv, dhd)
            q = _apply_rope(q, dec_cos[:2], dec_sin[:2])
            k = _apply_rope(k, dec_cos[:2], dec_sin[:2])
            kk = jnp.repeat(k, dn // dnkv, axis=2)
            vv = jnp.repeat(v, dn // dnkv, axis=2)
            s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                           preferred_element_type=jnp.float32) \
                / math.sqrt(dhd)
            a = jax.nn.softmax(s + dbias, axis=-1).astype(x.dtype)
            o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, 2,
                                                             dn * dhd)
            x = x + _dense(o, lp["o"])
            y = _rms(x, lp["mlp_norm"], cfg.eps)
            hh = jax.nn.silu(_dense(y, lp["w1"]).astype(jnp.float32)
                             ).astype(x.dtype) * _dense(y, lp["w3"])
            x = x + _dense(hh, lp["w2"])
            padk = jnp.zeros((b, nq - 1, dnkv, dhd), k.dtype)
            return x, (jnp.concatenate([k, padk], axis=1),
                       jnp.concatenate([v, padk], axis=1))

        dx, (dk, dv) = jax.lax.scan(dec_prefill, seq, params["decoder"])
        dh = _rms(dx[:, -1], params["decoder_norm"], cfg.eps)

        kfs = (jax.random.split(kf, nq - 1) if key is not None
               else jnp.zeros((nq - 1, 2), jnp.uint32))

        def cb_step(carry, xs):
            dh, dk, dv, pos = carry
            i, kf_i = xs
            logits = jnp.einsum("bd,dv->bv",
                                dh.astype(jnp.float32),
                                params["audio_head"][i]
                                .astype(jnp.float32))
            ci = sample(guided(logits)[None],
                        kf_i if key is not None else None)
            ci = jnp.broadcast_to(ci.reshape(-1)[:1], (b,))
            emb = params["audio_embeddings"][
                ci + (i + 1) * cfg.audio_vocab_size]
            seq1 = _dense(emb[:, None].astype(cdt),
                          params["projection"])

            def dec_step(x, xs2):
                lp, kc, vc = xs2
                y = _rms(x, lp["sa_norm"], cfg.eps)
                q = _dense(y, lp["q"]).reshape(b, 1, dn, dhd)
                k1 = _dense(y, lp["k"]).reshape(b, 1, dnkv, dhd)
                v1 = _dense(y, lp["v"]).reshape(b, 1, dnkv, dhd)
                q = _apply_rope(q, jax.lax.dynamic_slice_in_dim(
                    dec_cos, pos, 1), jax.lax.dynamic_slice_in_dim(
                    dec_sin, pos, 1))
                k1 = _apply_rope(k1, jax.lax.dynamic_slice_in_dim(
                    dec_cos, pos, 1), jax.lax.dynamic_slice_in_dim(
                    dec_sin, pos, 1))
                kc = jax.lax.dynamic_update_slice_in_dim(kc, k1, pos,
                                                         axis=1)
                vc = jax.lax.dynamic_update_slice_in_dim(vc, v1, pos,
                                                         axis=1)
                valid = jnp.arange(nq + 1)[None] <= pos
                kk = jnp.repeat(kc, dn // dnkv, axis=2)
                vv = jnp.repeat(vc, dn // dnkv, axis=2)
                s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                               preferred_element_type=jnp.float32) \
                    / math.sqrt(dhd)
                s = jnp.where(valid[:, None, None, :], s,
                              jnp.finfo(jnp.float32).min)
                a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
                o = jnp.einsum("bnls,bsnd->blnd", a,
                               vv).reshape(b, 1, dn * dhd)
                x = x + _dense(o, lp["o"])
                y = _rms(x, lp["mlp_norm"], cfg.eps)
                hh = jax.nn.silu(_dense(y, lp["w1"])
                                 .astype(jnp.float32)).astype(x.dtype) \
                    * _dense(y, lp["w3"])
                x = x + _dense(hh, lp["w2"])
                return x, (kc, vc)

            dx1, (dk, dv) = jax.lax.scan(dec_step, seq1,
                                         (params["decoder"], dk, dv))
            dh = _rms(dx1[:, -1], params["decoder_norm"], cfg.eps)
            return (dh, dk, dv, pos + 1), ci[:1]

        # pad decoder caches to nq + 1 slots
        dkp = jnp.concatenate(
            [dk, jnp.zeros((cfg.dec_layers, b, nq + 1 - dk.shape[2],
                            dnkv, dhd), dk.dtype)], axis=2)
        dvp = jnp.concatenate(
            [dv, jnp.zeros((cfg.dec_layers, b, nq + 1 - dv.shape[2],
                            dnkv, dhd), dv.dtype)], axis=2)
        (dh, _, _, _), cis = jax.lax.scan(
            cb_step, (dh, dkp, dvp, jnp.asarray(2)),
            (jnp.arange(nq - 1), kfs))
        return cis.reshape(nq - 1)

    keys = (jax.random.split(key, 2 * (max_frames + 1)).reshape(
        max_frames + 1, 2, 2) if key is not None
        else jnp.zeros((max_frames + 1, 2, 2), jnp.uint32))

    # first frame from the prompt prefill
    c0_logits = _dense(last_h.astype(jnp.float32),
                       params["codebook0_head"])
    c00 = sample(guided(c0_logits)[None],
                 keys[0, 0] if key is not None else None)
    c00 = jnp.broadcast_to(c00.reshape(-1)[:1], (b,))
    rest0 = decode_codebooks(last_h, c00, keys[0, 1])
    frame0 = jnp.concatenate([c00[:1], rest0])

    def frame_step(carry, xs):
        prev_frame, pos, k_cache, v_cache, done = carry
        kf = xs
        # next input token row: audio codes + empty text column
        tok = jnp.concatenate(
            [jnp.broadcast_to(prev_frame[None], (b, nq)),
             jnp.full((b, 1), cfg.empty_id, jnp.int32)], axis=1)[:, None]
        mask = jnp.ones((b, 1, nq + 1), bool).at[..., -1].set(False)
        x = embed_step(tok, mask, uncond_row).astype(cdt)

        def step_layer(x, xs2):
            lp, kc, vc = xs2
            y = _rms(x, lp["sa_norm"], cfg.eps)
            q = _dense(y, lp["q"]).reshape(b, 1, n, hd)
            k1 = _dense(y, lp["k"]).reshape(b, 1, nkv, hd)
            v1 = _dense(y, lp["v"]).reshape(b, 1, nkv, hd)
            cos1 = jax.lax.dynamic_slice_in_dim(cos_all, pos, 1)
            sin1 = jax.lax.dynamic_slice_in_dim(sin_all, pos, 1)
            q = _apply_rope(q, cos1, sin1)
            k1 = _apply_rope(k1, cos1, sin1)
            kc = jax.lax.dynamic_update_slice_in_dim(kc, k1, pos, axis=1)
            vc = jax.lax.dynamic_update_slice_in_dim(vc, v1, pos, axis=1)
            valid = jnp.arange(total)[None] <= pos
            kk = jnp.repeat(kc, n // nkv, axis=2)
            vv = jnp.repeat(vc, n // nkv, axis=2)
            s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                           preferred_element_type=jnp.float32) \
                / math.sqrt(hd)
            s = jnp.where(valid[:, None, None, :], s,
                          jnp.finfo(jnp.float32).min)
            a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
            o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, 1,
                                                             n * hd)
            x = x + _dense(o, lp["o"])
            y = _rms(x, lp["mlp_norm"], cfg.eps)
            hh = jax.nn.silu(_dense(y, lp["w1"]).astype(jnp.float32)
                             ).astype(x.dtype) * _dense(y, lp["w3"])
            x = x + _dense(hh, lp["w2"])
            return x, (kc, vc)

        x, (k_cache, v_cache) = jax.lax.scan(
            step_layer, x, (params["backbone"], k_cache, v_cache))
        last_h = _rms(x[:, -1], params["backbone_norm"], cfg.eps)
        c0_logits = _dense(last_h.astype(jnp.float32),
                           params["codebook0_head"])
        c0 = sample(guided(c0_logits)[None],
                    kf[0] if key is not None else None)
        c0 = jnp.broadcast_to(c0.reshape(-1)[:1], (b,))
        new_done = done | (c0[0] >= cfg.audio_eos_id)
        rest = decode_codebooks(last_h, c0, kf[1])
        frame = jnp.concatenate([c0[:1], rest])
        return (frame, pos + 1, k_cache, v_cache, new_done), \
            (frame, jnp.logical_not(new_done))

    carry0 = (frame0, jnp.asarray(l0), k_cache, v_cache,
              jnp.asarray(False))
    (_, _, _, _, _), (frames, valid) = jax.lax.scan(
        frame_step, carry0, keys[1:])
    codes = jnp.concatenate([frame0[None], frames], axis=0)
    valid = jnp.concatenate([jnp.ones((1,), bool), valid])
    return codes, valid
