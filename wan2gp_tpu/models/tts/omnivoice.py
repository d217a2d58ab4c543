"""OmniVoice — masked-parallel (MaskGIT-style) multilingual TTS on a
Qwen3 backbone.

TPU-native re-implementation of the reference OmniVoice
(models/TTS/omnivoice/modeling_omnivoice.py):
- model (:187-314): a Qwen3 LM whose inputs mix text-token embeddings
  with SUMMED per-codebook audio embeddings (8 RVQ codebooks x 1025
  ids, a shared [C*V, hidden] table with per-layer offsets) and whose
  head predicts all codebooks at every position;
- prompt (:938-1015): <|denoise|> + <|lang_start|>..<|lang_end|> +
  <|instruct_start|>..<|instruct_end|> + <|text_start|>text<|text_end|>
  + optional reference-audio tokens + an all-MASK target span;
- decoding (:1017-1141 _generate_iterative): iterative unmasking over
  a shifted time grid (:1366-1375), CFG in log-prob space
  ((1+g)·logp_c - g·logp_u, :1143-1168), per-codebook layer penalty,
  Gumbel position sampling, top-k most-confident positions unmasked
  per step;
- vocoder: the Higgs audio-v2 tokenizer decoder
  (higgs_audio_v2_tokenizer/modeling_higgs_audio_v2_tokenizer.py):
  RVQ embed + project_out sum (:408-458) -> fc2 -> HF-DAC decoder with
  per-stride output padding and no final tanh (:482-492), 24 kHz.
"""
from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OmniVoiceConfig:
    audio_vocab_size: int = 1025
    audio_mask_id: int = 1024
    num_audio_codebook: int = 8
    frame_rate: int = 25          # Higgs tokenizer tokens/sec


@dataclasses.dataclass(frozen=True)
class OmniVoiceGenConfig:
    num_step: int = 32
    guidance_scale: float = 2.0
    t_shift: float = 0.1
    layer_penalty_factor: float = 5.0
    position_temperature: float = 5.0
    class_temperature: float = 0.0
    denoise: bool = True


def get_time_steps(num_step: int, t_shift: float,
                   t_start: float = 0.0, t_end: float = 1.0) -> np.ndarray:
    """Shifted unmasking grid (modeling_omnivoice.py:1366-1375)."""
    t = np.linspace(t_start, t_end, num_step + 1)
    return t_shift * t / (1.0 + (t_shift - 1.0) * t)


def combine_text(text: str, ref_text: Optional[str] = None) -> str:
    """Prompt text normalisation (modeling_omnivoice.py:1425-1456)."""
    full = (ref_text.strip() + " " + text.strip()) if ref_text \
        else text.strip()
    full = re.sub(r"[\r\n]+", "", full)
    full = full.replace("（", "(").replace("）", ")")
    full = re.sub(r"[ \t]+", " ", full)
    cn = r"[一-鿿]"
    return re.sub(rf"(?<={cn})\s+|\s+(?={cn})", "", full)


def estimate_target_tokens(text: str, frame_rate: int = 25,
                           duration: Optional[float] = None,
                           speed: Optional[float] = None,
                           chars_per_second: float = 14.0) -> int:
    """Audio-token budget.  With an explicit duration this is exact;
    otherwise a text-length heuristic stands in for the reference's
    learned duration estimator (utils/duration.py)."""
    if duration is not None:
        secs = float(duration)
    else:
        # CJK characters read slower than latin script
        cjk = len(re.findall(r"[一-鿿]", text))
        latin = max(len(text) - cjk, 0)
        secs = max(latin / chars_per_second + cjk / 4.5, 0.6)
        if speed:
            secs /= float(speed)
    return max(int(math.ceil(secs * frame_rate)), 8)


def init_omnivoice(key, lm_params, lm_cfg,
                   cfg: OmniVoiceConfig = OmniVoiceConfig()
                   ) -> Dict[str, Any]:
    """Audio embedding table + multi-codebook head
    (modeling_omnivoice.py:202-215)."""
    k1, k2 = jax.random.split(key)
    h = lm_cfg.dim
    cv = cfg.num_audio_codebook * cfg.audio_vocab_size
    return {"llm": lm_params,
            "audio_embeddings": 0.02 * jax.random.normal(
                k1, (cv, h), jnp.float32),
            "audio_heads": 0.02 * jax.random.normal(
                k2, (h, cv), jnp.float32)}


def omnivoice_forward(params, lm_cfg, cfg: OmniVoiceConfig, input_ids,
                      audio_mask, logits_start: Optional[int] = None):
    """input_ids: [B, C, L] (row 0 carries text ids at text positions);
    audio_mask: [B, L] bool.  Returns logits [B, C, L', V]
    (modeling_omnivoice.py:263-314)."""
    from ..qwen.text_encoder import qwen_lm_forward
    b, c, l = input_ids.shape
    offsets = (jnp.arange(cfg.num_audio_codebook)
               * cfg.audio_vocab_size)
    shifted = input_ids.transpose(0, 2, 1) + offsets[None, None]
    audio_emb = params["audio_embeddings"][shifted].sum(axis=2)
    text_emb = params["llm"]["embed_tokens"][input_ids[:, 0]]
    embeds = jnp.where(audio_mask[..., None], audio_emb,
                       text_emb.astype(jnp.float32))
    mask = jnp.ones((b, l), jnp.int32)
    hidden = qwen_lm_forward(params["llm"], lm_cfg, None, mask,
                             input_embeds=embeds)
    if logits_start is not None:
        hidden = hidden[:, logits_start:]
    logits = hidden.astype(jnp.float32) @ params["audio_heads"]
    return logits.reshape(b, hidden.shape[1], cfg.num_audio_codebook,
                          cfg.audio_vocab_size).transpose(0, 2, 1, 3)


def build_prompt(tokenizer, text: str, num_target_tokens: int,
                 cfg: OmniVoiceConfig, ref_text: Optional[str] = None,
                 ref_audio_tokens: Optional[np.ndarray] = None,
                 lang: Optional[str] = None,
                 instruct: Optional[str] = None, denoise: bool = True):
    """(input_ids [1, C, L], audio_mask [1, L]) pair
    (modeling_omnivoice.py:938-1015)."""
    style = ""
    if denoise and ref_audio_tokens is not None:
        style += "<|denoise|>"
    style += f"<|lang_start|>{lang or 'None'}<|lang_end|>"
    style += f"<|instruct_start|>{instruct or 'None'}<|instruct_end|>"
    wrapped = f"<|text_start|>{combine_text(text, ref_text)}<|text_end|>"
    ids, _ = tokenizer([style + wrapped], 2048)
    ids = np.asarray(ids)[0]
    ids = ids[ids != 0] if (ids == 0).any() else ids
    text_block = np.broadcast_to(ids[None],
                                 (cfg.num_audio_codebook, len(ids)))
    parts = [text_block]
    if ref_audio_tokens is not None:
        parts.append(np.asarray(ref_audio_tokens, np.int64))
    parts.append(np.full((cfg.num_audio_codebook, num_target_tokens),
                         cfg.audio_mask_id, np.int64))
    input_ids = np.concatenate(parts, axis=1)[None]
    audio_start = input_ids.shape[2] - num_target_tokens
    if ref_audio_tokens is not None:
        audio_start -= ref_audio_tokens.shape[1]
    audio_mask = np.zeros((1, input_ids.shape[2]), bool)
    audio_mask[0, audio_start:] = True
    return input_ids, audio_mask


def _gumbel(rng, shape):
    u = rng.uniform(low=1e-9, high=1.0, size=shape)
    return -np.log(-np.log(u))


def omnivoice_generate(params, lm_cfg,
                       cfg: OmniVoiceConfig, tokenizer, text: str,
                       gen: OmniVoiceGenConfig = OmniVoiceGenConfig(),
                       ref_text: Optional[str] = None,
                       ref_audio_tokens=None, lang: Optional[str] = None,
                       instruct: Optional[str] = None,
                       duration: Optional[float] = None,
                       speed: Optional[float] = None,
                       seed: int = 0,
                       num_target_tokens: Optional[int] = None
                       ) -> np.ndarray:
    """Iterative unmasking -> audio codes [C, T]
    (modeling_omnivoice.py:1017-1141)."""
    if num_target_tokens is None:
        num_target_tokens = estimate_target_tokens(
            text, cfg.frame_rate, duration, speed)
    t_len = num_target_tokens
    cond_ids, cond_mask = build_prompt(
        tokenizer, text, t_len, cfg, ref_text=ref_text,
        ref_audio_tokens=ref_audio_tokens, lang=lang,
        instruct=instruct, denoise=gen.denoise)
    uncond_ids = cond_ids[..., -t_len:].copy()
    uncond_mask = np.ones((1, t_len), bool)

    fwd = jax.jit(lambda ids, msk: omnivoice_forward(
        params, lm_cfg, cfg, ids, msk, logits_start=-t_len))

    timesteps = get_time_steps(gen.num_step, gen.t_shift)
    total = t_len * cfg.num_audio_codebook
    sched, rem = [], total
    for step in range(gen.num_step):
        n = rem if step == gen.num_step - 1 else min(
            math.ceil(total * (timesteps[step + 1] - timesteps[step])),
            rem)
        sched.append(int(n))
        rem -= int(n)

    rng = np.random.default_rng(seed)
    tokens = np.full((cfg.num_audio_codebook, t_len),
                     cfg.audio_mask_id, np.int64)
    layer_penalty = (np.arange(cfg.num_audio_codebook)[:, None]
                     * gen.layer_penalty_factor)
    for step in range(gen.num_step):
        k = sched[step]
        if k <= 0:
            continue
        c_logits = np.asarray(fwd(jnp.asarray(cond_ids),
                                  jnp.asarray(cond_mask)),
                              np.float32)[0]          # [C, T, V]
        logp = c_logits - _logsumexp(c_logits)
        if gen.guidance_scale != 0:
            u_logits = np.asarray(fwd(jnp.asarray(uncond_ids),
                                      jnp.asarray(uncond_mask)),
                                  np.float32)[0]
            u_logp = u_logits - _logsumexp(u_logits)
            logp = (1 + gen.guidance_scale) * logp \
                - gen.guidance_scale * u_logp
            logp = logp - _logsumexp(logp)
        logp[..., cfg.audio_mask_id] = -np.inf
        if gen.class_temperature > 0:
            thresh = np.sort(logp, axis=-1)[
                ..., -max(1, int(logp.shape[-1] * 0.1))][..., None]
            filt = np.where(logp >= thresh, logp, -np.inf)
            pred = np.argmax(
                filt / gen.class_temperature
                + _gumbel(rng, filt.shape), axis=-1)
        else:
            pred = np.argmax(logp, axis=-1)
        scores = np.max(logp, axis=-1) - layer_penalty
        if gen.position_temperature > 0:
            scores = scores / gen.position_temperature \
                + _gumbel(rng, scores.shape)
        scores = np.where(tokens == cfg.audio_mask_id, scores, -np.inf)
        top = np.argsort(scores.reshape(-1))[-k:]
        flat = tokens.reshape(-1)
        flat[top] = pred.reshape(-1)[top]
        tokens = flat.reshape(tokens.shape)
        cond_ids[0, :, -t_len:] = tokens
        uncond_ids[0, :, :t_len] = tokens
    return tokens


def _logsumexp(x):
    m = np.max(x, axis=-1, keepdims=True)
    return m + np.log(np.sum(np.exp(x - m), axis=-1, keepdims=True))


def load_omnivoice_params(sd: Dict[str, np.ndarray], lm_cfg,
                          dtype=jnp.bfloat16):
    """OmniVoice checkpoint: llm.* (Qwen3Model keys) +
    audio_embeddings/audio_heads."""
    from ..qwen.text_encoder import load_qwen_lm_params
    lm_sd = {}
    rest = {}
    for k, v in sd.items():
        if k.startswith("llm."):
            lm_sd["model." + k[len("llm."):]] = v
        else:
            rest[k] = v
    lm_params, left = load_qwen_lm_params(lm_sd, lm_cfg, dtype)
    p = {"llm": lm_params,
         "audio_embeddings": jnp.asarray(np.asarray(
             rest.pop("audio_embeddings.weight"), np.float32)),
         "audio_heads": jnp.asarray(np.asarray(
             rest.pop("audio_heads.weight"), np.float32).T)}
    return p, sorted(list(left) + [k for k in rest
                                   if "codebook_layer_offsets" not in k])
