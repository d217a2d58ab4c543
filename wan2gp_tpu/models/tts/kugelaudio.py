"""KugelAudio TTS — Qwen2 LM + per-frame diffusion head over a causal
conv VAE (reference models/TTS/kugelaudio/: models/kugelaudio_model.py,
kugelaudio_inference.py, diffusion_head.py, schedule/dpm_solver.py).

Generation (kugelaudio_inference.py:389-935): the LM decodes a
constrained token stream over {speech_start, speech_end,
speech_diffusion, eos}; every speech_diffusion token triggers a
DDPM-cosine sde-dpmsolver++ sampling of ONE 64-dim acoustic latent
conditioned on the LM hidden state (with CFG against a negative LM
context that saw only speech_start), the latent is streaming-decoded
to a 3200-sample 24 kHz chunk, re-encoded by the semantic tokenizer,
and acoustic+semantic connector embeddings become the next LM input.

TPU-native re-design: the whole token loop is ONE `lax.scan` with
static shapes — KV caches are preallocated [B, total, nkv, hd] rings,
the negative context is a masked slot array (replacing the reference's
in-place KV shifting, kugelaudio_inference.py:740-826), the
per-frame diffusion sampler is an inner `lax.scan` over solver steps,
and the conv tokenizers run in streaming mode with explicit carry
state (kugel_tokenizer.py).  The diffusion head runs every step and is
masked out for non-diffusion tokens, keeping the scan branch-free.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .kugel_tokenizer import (KugelTokenizerConfig, init_kugel_encoder,
                              init_kugel_decoder, kugel_encode,
                              kugel_decode, decoder_stream_init,
                              encoder_stream_init, kugel_decode_step,
                              kugel_encode_step)


@dataclasses.dataclass(frozen=True)
class KugelConfig:
    # Qwen2.5-1.5B decoder (configs/model_config.py decoder_config)
    dim: int = 1536
    layers: int = 28
    heads: int = 12
    kv_heads: int = 2
    head_dim: int = 128
    ffn: int = 8960
    vocab: int = 151936
    rope_theta: float = 1e6
    eps: float = 1e-6
    # diffusion head (configs/model_config.py:148-163); cond is the LM
    # hidden state so head hidden == dim
    head_layers: int = 4
    head_ffn_ratio: float = 3.0
    vae_dim: int = 64
    semantic_vae_dim: int = 64
    t_features: int = 256
    ddpm_train_steps: int = 1000
    # special ids (kugelaudio_inference.py:455-458)
    speech_start_id: int = 151652
    speech_end_id: int = 151653
    speech_diffusion_id: int = 151654
    eos_id: int = 151643
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        return cls(dim=32, layers=2, heads=4, kv_heads=2, head_dim=8,
                   ffn=64, vocab=512, head_layers=2, vae_dim=8,
                   semantic_vae_dim=8, t_features=16,
                   speech_start_id=500, speech_end_id=501,
                   speech_diffusion_id=502, eos_id=499)


# ---------------------------------------------------------------------------
# shared primitives
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True, std=0.02, zero=False):
    w = (jnp.zeros((din, dout), jnp.float32) if zero else
         jax.random.normal(key, (din, dout), jnp.float32) * std)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


def _rope_tables(total, hd, theta):
    inv = 1.0 / (theta ** (np.arange(0, hd, 2) / hd))
    ang = np.outer(np.arange(total), inv)
    cos = np.concatenate([np.cos(ang), np.cos(ang)], axis=-1)
    sin = np.concatenate([np.sin(ang), np.sin(ang)], axis=-1)
    return jnp.asarray(cos, jnp.float32), jnp.asarray(sin, jnp.float32)


def _apply_rope(x, cos, sin):
    # x [B, L, H, D]; rotate-half (HF Qwen2)
    d = x.shape[-1]
    x1, x2 = x[..., :d // 2], x[..., d // 2:]
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x * cos[None, :, None, :]
            + rot * sin[None, :, None, :]).astype(x.dtype)


# ---------------------------------------------------------------------------
# Qwen2 LM with KV cache
# ---------------------------------------------------------------------------

def init_kugel_lm(key, cfg: KugelConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 8))

    def layer(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "in_norm": jnp.ones((cfg.dim,), jnp.float32),
            # Qwen2: bias on q/k/v, none on o
            "q": _lin(next(ks), cfg.dim, cfg.heads * cfg.head_dim,
                      dtype),
            "k": _lin(next(ks), cfg.dim, cfg.kv_heads * cfg.head_dim,
                      dtype),
            "v": _lin(next(ks), cfg.dim, cfg.kv_heads * cfg.head_dim,
                      dtype),
            "o": _lin(next(ks), cfg.heads * cfg.head_dim, cfg.dim,
                      dtype, bias=False),
            "post_norm": jnp.ones((cfg.dim,), jnp.float32),
            "gate": _lin(next(ks), cfg.dim, cfg.ffn, dtype, bias=False),
            "up": _lin(next(ks), cfg.dim, cfg.ffn, dtype, bias=False),
            "down": _lin(next(ks), cfg.ffn, cfg.dim, dtype, bias=False),
        }

    lks = jax.random.split(next(keys), cfg.layers)
    leaves = [layer(k) for k in lks]
    layers = jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)
    return {
        "embed": (jax.random.normal(next(keys), (cfg.vocab, cfg.dim),
                                    jnp.float32) * 0.02).astype(dtype),
        "layers": layers,
        "norm": jnp.ones((cfg.dim,), jnp.float32),
        "lm_head": _lin(next(keys), cfg.dim, cfg.vocab, dtype,
                        bias=False),
    }


def _lm_layer(x, lp, cos, sin, bias, cfg: KugelConfig, kv=None,
              pos=None, return_kv=False):
    """One Qwen2 block; with kv=(k_cache [B,T,nkv,hd], v_cache), x is
    a 1-token decode input at absolute position pos."""
    b, l, _ = x.shape
    n, nkv, hd = cfg.heads, cfg.kv_heads, cfg.head_dim
    y = _rms(x, lp["in_norm"], cfg.eps)
    q = _dense(y, lp["q"]).reshape(b, l, n, hd)
    k = _dense(y, lp["k"]).reshape(b, l, nkv, hd)
    v = _dense(y, lp["v"]).reshape(b, l, nkv, hd)
    q = _apply_rope(q, cos, sin)
    k = _apply_rope(k, cos, sin)
    k_new, v_new = k, v
    if kv is not None:
        kc, vc = kv
        kc = jax.lax.dynamic_update_slice(kc, k, (0, pos, 0, 0))
        vc = jax.lax.dynamic_update_slice(vc, v, (0, pos, 0, 0))
        k, v = kc, vc
    kk = jnp.repeat(k, n // nkv, axis=2)
    vv = jnp.repeat(v, n // nkv, axis=2)
    s = jnp.einsum("blnd,bsnd->bnls", q, kk,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s + bias, axis=-1).astype(x.dtype)
    o = jnp.einsum("bnls,bsnd->blnd", a, vv).reshape(b, l, n * hd)
    x = x + _dense(o, lp["o"])
    y = _rms(x, lp["post_norm"], cfg.eps)
    h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                    ).astype(x.dtype) * _dense(y, lp["up"])
    x = x + _dense(h, lp["down"])
    if kv is not None:
        return x, (k, v)
    if return_kv:
        return x, (k_new, v_new)
    return x


# ---------------------------------------------------------------------------
# connectors (kugelaudio_model.py:61-73 SpeechConnector)
# ---------------------------------------------------------------------------

def init_connector(key, din, dout, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {"fc1": _lin(k1, din, dout, dtype),
            "norm": jnp.ones((dout,), jnp.float32),
            "fc2": _lin(k2, dout, dout, dtype)}


def connector(p, x, eps=1e-6):
    return _dense(_rms(_dense(x, p["fc1"]), p["norm"], eps), p["fc2"])


# ---------------------------------------------------------------------------
# diffusion head (diffusion_head.py:127-287)
# ---------------------------------------------------------------------------

def init_diffusion_head(key, cfg: KugelConfig, dtype=jnp.float32):
    d = cfg.dim
    ffn = int(d * cfg.head_ffn_ratio)
    keys = iter(jax.random.split(key, 8))

    def head_layer(k):
        ks = iter(jax.random.split(k, 4))
        return {
            "norm": jnp.ones((d,), jnp.float32),
            "gate": _lin(next(ks), d, ffn, dtype, bias=False),
            "up": _lin(next(ks), d, ffn, dtype, bias=False),
            "down": _lin(next(ks), ffn, d, dtype, bias=False),
            # zero-init adaLN (initialize_weights)
            "ada": _lin(next(ks), d, 3 * d, dtype, bias=False,
                        zero=True),
        }

    lks = jax.random.split(next(keys), cfg.head_layers)
    leaves = [head_layer(k) for k in lks]
    return {
        "x_proj": _lin(next(keys), cfg.vae_dim, d, dtype, bias=False),
        "cond_proj": _lin(next(keys), d, d, dtype, bias=False),
        "t1": _lin(next(keys), cfg.t_features, d, dtype, bias=False),
        "t2": _lin(next(keys), d, d, dtype, bias=False),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
        "final_ada": _lin(next(keys), d, 2 * d, dtype, bias=False,
                          zero=True),
        "final": _lin(next(keys), d, cfg.vae_dim, dtype, bias=False,
                      zero=True),
    }


def _timestep_embed(t, dim, max_period=10000.0):
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def diffusion_head(params, cfg: KugelConfig, noisy, t, cond):
    """noisy [B, vae], t [B], cond [B, dim] -> v-prediction [B, vae]."""
    x = _dense(noisy, params["x_proj"])
    temb = _dense(jax.nn.silu(_dense(
        _timestep_embed(t, cfg.t_features), params["t1"])),
        params["t2"])
    c = _dense(cond, params["cond_proj"]) + temb

    def body(x, lp):
        ada = _dense(jax.nn.silu(c), lp["ada"])
        sh, sc, gt = jnp.split(ada, 3, axis=-1)
        y = _rms(x, lp["norm"], 1e-5) * (1 + sc) + sh
        h = jax.nn.silu(_dense(y, lp["gate"]).astype(jnp.float32)
                        ).astype(x.dtype) * _dense(y, lp["up"])
        return x + gt * _dense(h, lp["down"]), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    ada = _dense(jax.nn.silu(c), params["final_ada"])
    sh, sc = jnp.split(ada, 2, axis=-1)
    x32 = x.astype(jnp.float32)
    xn = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                             + 1e-5)
    return _dense(xn.astype(x.dtype) * (1 + sc) + sh, params["final"])


# ---------------------------------------------------------------------------
# DDPM cosine + sde-dpmsolver++(2M) (schedule/dpm_solver.py; HF
# DPMSolverMultistepScheduler semantics, v-prediction)
# ---------------------------------------------------------------------------

def _cosine_alphas_cumprod(T):
    def f(i):
        return np.cos((i / T + 0.008) / 1.008 * np.pi / 2) ** 2
    i = np.arange(T)
    betas = np.clip(1.0 - f(i + 1) / f(i), 0.0, 0.999)
    return np.cumprod(1.0 - betas)


def make_dpm_schedule(cfg: KugelConfig, steps: int):
    """Returns (timesteps [steps], alpha_t, sigma_t, lambda_t) arrays
    of length steps, high noise -> low."""
    T = cfg.ddpm_train_steps
    ac = _cosine_alphas_cumprod(T)
    ts = np.linspace(0, T - 1, steps + 1).round()[::-1][:-1] \
        .astype(np.int64)
    a = np.sqrt(ac[ts])
    s = np.sqrt(1.0 - ac[ts])
    lam = np.log(a) - np.log(s)
    return (jnp.asarray(ts, jnp.float32), jnp.asarray(a, jnp.float32),
            jnp.asarray(s, jnp.float32), jnp.asarray(lam, jnp.float32))


def sample_speech_latents(head_params, cfg: KugelConfig, cond,
                          neg_cond, cfg_scale, sched, key):
    """One frame of acoustic latents via sde-dpmsolver++ 2M
    (kugelaudio_inference.py:319-356 sample_speech_tokens).
    cond/neg_cond [B, dim] -> [B, vae_dim]."""
    ts, alphas, sigmas, lams = sched
    steps = ts.shape[0]
    b = cond.shape[0]
    use_cfg = neg_cond is not None
    k0, key = jax.random.split(key)
    x = jax.random.normal(k0, (b, cfg.vae_dim), jnp.float32)
    cc = (jnp.concatenate([cond, neg_cond], 0) if use_cfg else cond)

    def x0_pred(x, i):
        t = jnp.broadcast_to(ts[i], (b,))
        if use_cfg:
            v = diffusion_head(head_params, cfg,
                               jnp.concatenate([x, x], 0),
                               jnp.concatenate([t, t], 0), cc)
            v = v[b:] + cfg_scale * (v[:b] - v[b:])
        else:
            v = diffusion_head(head_params, cfg, x, t, cc)
        # v-prediction -> x0
        return alphas[i] * x - sigmas[i] * v.astype(jnp.float32)

    keys = jax.random.split(key, steps)

    def step(carry, i):
        x, m_prev = carry
        m0 = x0_pred(x, i)
        last = i == steps - 1
        a_t = jnp.where(last, 1.0, alphas[jnp.minimum(i + 1,
                                                      steps - 1)])
        s_t = jnp.where(last, 1e-6, sigmas[jnp.minimum(i + 1,
                                                       steps - 1)])
        lam_t = jnp.log(a_t) - jnp.log(s_t)
        h = lam_t - lams[i]
        # first-order sde-dpmsolver++ base term
        e2h = jnp.exp(-2.0 * h)
        noise = jax.random.normal(keys[i], x.shape, jnp.float32)
        x1 = (s_t / sigmas[i] * jnp.exp(-h)) * x \
            + a_t * (1.0 - e2h) * m0 \
            + s_t * jnp.sqrt(jnp.maximum(1.0 - e2h, 0.0)) * noise
        # second-order correction (2M midpoint) using previous x0
        h_prev = lams[i] - jnp.where(i > 0, lams[jnp.maximum(i - 1, 0)],
                                     lams[i] - 1.0)
        r = h_prev / jnp.maximum(jnp.abs(h), 1e-8) \
            * jnp.sign(jnp.where(h == 0, 1.0, h))
        d1 = (m0 - m_prev) / jnp.maximum(r, 1e-8)
        x2 = x1 + 0.5 * a_t * (1.0 - e2h) * d1
        use2 = jnp.logical_and(i > 0, jnp.logical_not(last))
        x = jnp.where(use2, x2, x1)
        return (x, m0), None

    (x, _), _ = jax.lax.scan(step, (x, jnp.zeros_like(x)),
                             jnp.arange(steps))
    return x


# ---------------------------------------------------------------------------
# full model init
# ---------------------------------------------------------------------------

def init_kugelaudio(key, cfg: KugelConfig,
                    tok_cfg: KugelTokenizerConfig,
                    dtype=jnp.float32) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8))
    return {
        "lm": init_kugel_lm(next(ks), cfg, dtype),
        "head": init_diffusion_head(next(ks), cfg, dtype),
        "acoustic_enc": init_kugel_encoder(next(ks), tok_cfg, dtype),
        "acoustic_dec": init_kugel_decoder(next(ks), tok_cfg, dtype),
        "semantic_enc": init_kugel_encoder(
            next(ks), tok_cfg, dtype, out_dim=cfg.semantic_vae_dim),
        "acoustic_conn": init_connector(next(ks), cfg.vae_dim, cfg.dim,
                                        dtype),
        "semantic_conn": init_connector(next(ks), cfg.semantic_vae_dim,
                                        cfg.dim, dtype),
        # speech_scaling_factor / bias (kugelaudio_model.py:146-147;
        # identity until calibrated from a voice prompt)
        "scaling": jnp.asarray(1.0, jnp.float32),
        "bias": jnp.asarray(0.0, jnp.float32),
    }


def encode_voice_prompt(params, cfg: KugelConfig,
                        tok_cfg: KugelTokenizerConfig, wav, key):
    """wav [B, T] 24 kHz -> speech embeds [B, frames, dim]
    (_process_speech_inputs, kugelaudio_inference.py:169-255)."""
    hop = tok_cfg.hop
    t = wav.shape[1]
    pad = (-t) % hop
    if pad:
        wav = jnp.pad(wav, ((0, 0), (0, pad)))
    x = wav[..., None]
    ac_mean = kugel_encode(params["acoustic_enc"], tok_cfg, x)
    ac = ac_mean + tok_cfg.fix_std * jax.random.normal(
        key, ac_mean.shape, ac_mean.dtype)
    sem = kugel_encode(params["semantic_enc"], tok_cfg, x)
    ac_scaled = (ac + params["bias"]) * params["scaling"]
    emb = connector(params["acoustic_conn"], ac_scaled) \
        + connector(params["semantic_conn"], sem)
    return emb, ac


# ---------------------------------------------------------------------------
# generation
# ---------------------------------------------------------------------------

def kugelaudio_generate(params, cfg: KugelConfig,
                        tok_cfg: KugelTokenizerConfig, text_ids,
                        voice_embeds=None, speech_input_mask=None,
                        cfg_scale: float = 3.0, max_new_tokens: int = 64,
                        ddpm_steps: int = 10, do_sample: bool = False,
                        temperature: float = 1.0, key=None):
    """text_ids [1, L] (already templated, ending in speech_start);
    voice_embeds [1, F, dim] replaces positions where
    speech_input_mask [1, L] is True.  Returns dict with audio
    [T_samples] (float32), latents, tokens, n_frames."""
    key = key if key is not None else jax.random.PRNGKey(0)
    cdt = cfg.compute_dtype
    b = 1
    hop = tok_cfg.hop
    use_cfg = cfg_scale != 1.0

    emb_table = params["lm"]["embed"]
    x = emb_table[text_ids].astype(cdt)
    if voice_embeds is not None and speech_input_mask is not None:
        flat = voice_embeds.reshape(-1, cfg.dim)
        idx = jnp.cumsum(speech_input_mask[0].astype(jnp.int32)) - 1
        idx = jnp.clip(idx, 0, flat.shape[0] - 1)
        x = jnp.where(speech_input_mask[0][None, :, None],
                      flat[idx][None].astype(cdt), x)

    l0 = x.shape[1]
    total = l0 + max_new_tokens + 1
    cos_all, sin_all = _rope_tables(total, cfg.head_dim, cfg.rope_theta)
    sched = make_dpm_schedule(cfg, ddpm_steps)

    causal = jnp.tril(jnp.ones((l0, l0), bool))
    bias0 = jnp.where(causal[None, None], 0.0,
                      jnp.finfo(jnp.float32).min)

    def prefill(x, lp):
        xo, (k, v) = _lm_layer(x, lp, cos_all[:l0], sin_all[:l0],
                               bias0, cfg, return_kv=True)
        pad = jnp.zeros((b, total - l0, cfg.kv_heads, cfg.head_dim),
                        k.dtype)
        return xo, (jnp.concatenate([k, pad], 1),
                    jnp.concatenate([v, pad], 1))

    x, (kc, vc) = jax.lax.scan(prefill, x, params["lm"]["layers"])
    h = _rms(x[:, -1:], params["lm"]["norm"], cfg.eps)

    # negative context: slot array of embeds, starts with speech_start
    # (kugelaudio_inference.py:476-483); masked attention replaces the
    # reference's KV-shift compaction.
    neg_total = max_new_tokens + 1
    neg_kc = jnp.zeros((cfg.layers, b, neg_total, cfg.kv_heads,
                        cfg.head_dim), cdt)
    neg_vc = jnp.zeros_like(neg_kc)
    neg_mask0 = jnp.zeros((neg_total,), bool).at[0].set(True)

    start_emb = emb_table[cfg.speech_start_id][None, None].astype(cdt)

    def neg_step(kc_n, vc_n, emb, pos, mask):
        """One negative-LM decode of `emb` at slot `pos` under
        `mask`; returns (h_neg, new caches)."""
        bias = jnp.where(mask[None, None, None], 0.0,
                         jnp.finfo(jnp.float32).min)
        cos_i = jax.lax.dynamic_slice(cos_all, (pos, 0),
                                      (1, cos_all.shape[1]))
        sin_i = jax.lax.dynamic_slice(sin_all, (pos, 0),
                                      (1, sin_all.shape[1]))

        def dec(xx, lkv):
            lp, kcl, vcl = lkv
            xo, (k2, v2) = _lm_layer(xx, lp, cos_i, sin_i, bias, cfg,
                                     kv=(kcl, vcl), pos=pos)
            return xo, (k2, v2)

        xx, (kc_n, vc_n) = jax.lax.scan(
            dec, emb, (params["lm"]["layers"], kc_n, vc_n))
        return _rms(xx[:, -1:], params["lm"]["norm"], cfg.eps), \
            kc_n, vc_n

    h_neg0, neg_kc, neg_vc = neg_step(neg_kc, neg_vc, start_emb, 0,
                                      neg_mask0)

    dec_state = decoder_stream_init(params["acoustic_dec"], b)
    sem_state = encoder_stream_init(params["semantic_enc"], tok_cfg, b)

    valid_ids = jnp.asarray([cfg.speech_start_id, cfg.speech_end_id,
                             cfg.speech_diffusion_id, cfg.eos_id],
                            jnp.int32)
    keys = jax.random.split(key, max_new_tokens)

    def step(carry, i):
        (h, kc, vc, h_neg, neg_kc, neg_vc, neg_mask, dec_state,
         sem_state, finished) = carry
        logits = _dense(h[:, 0], params["lm"]["lm_head"]) \
            .astype(jnp.float32)
        # constrain to the 4 control tokens
        # (KugelAudioTokenConstraintProcessor)
        sub = logits[0, valid_ids]
        if do_sample and temperature > 0:
            ks, kd = jax.random.split(keys[i])
            choice = jax.random.categorical(ks, sub / temperature)
        else:
            kd = keys[i]
            choice = jnp.argmax(sub)
        tok = valid_ids[choice]
        tok = jnp.where(finished, cfg.eos_id, tok)
        is_diff = jnp.logical_and(tok == cfg.speech_diffusion_id,
                                  jnp.logical_not(finished))
        finished = jnp.logical_or(
            finished, jnp.logical_or(tok == cfg.eos_id,
                                     tok == cfg.speech_end_id))

        # per-frame diffusion (masked when not a diffusion token)
        lat = sample_speech_latents(
            params["head"], cfg, h[:, 0].astype(jnp.float32),
            h_neg[:, 0].astype(jnp.float32) if use_cfg else None,
            cfg_scale, sched, kd)
        lat = jnp.where(is_diff, lat, jnp.zeros_like(lat))
        raw = lat / params["scaling"] - params["bias"]

        dec_state2, audio = kugel_decode_step(
            dec_state, params["acoustic_dec"], tok_cfg, raw[:, None])
        sem_state2, sem = kugel_encode_step(
            sem_state, params["semantic_enc"], tok_cfg, audio)
        # only advance streaming conv state on diffusion frames
        dec_state = jax.tree.map(
            lambda n, o: jnp.where(is_diff, n, o), dec_state2,
            dec_state)
        sem_state = jax.tree.map(
            lambda n, o: jnp.where(is_diff, n, o), sem_state2,
            sem_state)

        frame_emb = connector(params["acoustic_conn"], lat[:, None]) \
            + connector(params["semantic_conn"], sem)
        tok_emb = emb_table[tok][None, None].astype(cdt)
        emb = jnp.where(is_diff, frame_emb.astype(cdt), tok_emb)

        # positive decode of the new embedding
        pos = l0 + i
        att = jnp.arange(total) <= pos
        bias = jnp.where(att[None, None, None], 0.0,
                         jnp.finfo(jnp.float32).min)
        cos_i = jax.lax.dynamic_slice(cos_all, (pos, 0),
                                      (1, cos_all.shape[1]))
        sin_i = jax.lax.dynamic_slice(sin_all, (pos, 0),
                                      (1, sin_all.shape[1]))

        def dec(xx, lkv):
            lp, kcl, vcl = lkv
            xo, (k2, v2) = _lm_layer(xx, lp, cos_i, sin_i, bias, cfg,
                                     kv=(kcl, vcl), pos=pos)
            return xo, (k2, v2)

        xx, (kc, vc) = jax.lax.scan(dec, emb,
                                    (params["lm"]["layers"], kc, vc))
        h = _rms(xx[:, -1:], params["lm"]["norm"], cfg.eps)

        # negative context: on speech_start, reset to just this token
        # (kugelaudio_inference.py:740-761); otherwise append.
        slot = i + 1
        neg_mask = jnp.where(
            tok == cfg.speech_start_id,
            jnp.zeros_like(neg_mask).at[slot].set(True),
            neg_mask.at[slot].set(True))
        h_neg, neg_kc, neg_vc = neg_step(neg_kc, neg_vc, emb, slot,
                                         neg_mask)

        out = (tok, lat[0], audio[0, :, 0], is_diff)
        return (h, kc, vc, h_neg, neg_kc, neg_vc, neg_mask, dec_state,
                sem_state, finished), out

    carry0 = (h, kc, vc, h_neg0, neg_kc, neg_vc, neg_mask0, dec_state,
              sem_state, jnp.asarray(False))
    _, (toks, lats, audio_chunks, diff_mask) = jax.lax.scan(
        step, carry0, jnp.arange(max_new_tokens))
    return {"tokens": toks, "latents": lats,
            "audio_chunks": audio_chunks, "frame_mask": diff_mask}


def assemble_audio(out: Dict[str, Any]) -> np.ndarray:
    """Concatenate the diffusion-frame chunks; peak-normalize >1
    (kugelaudio_inference.py:906-920)."""
    mask = np.asarray(out["frame_mask"])
    chunks = np.asarray(out["audio_chunks"])[mask]
    if chunks.size == 0:
        return np.zeros((0,), np.float32)
    audio = chunks.reshape(-1).astype(np.float32)
    peak = np.abs(audio).max()
    if peak > 1.0:
        audio = audio * (0.95 / peak)
    return audio
