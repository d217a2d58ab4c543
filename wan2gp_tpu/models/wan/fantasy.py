"""Wan FantasyTalking: audio-driven portrait animation conditioning.

TPU-native re-implementation of /root/reference/models/wan/fantasytalking/:
- model.py AudioProjModel:7 — linear (768 -> 2048, no bias) + LayerNorm
  over wav2vec features;
- model.py split_audio_sequence:72 / split_tensor_with_padding:113 —
  host-side regrouping of the audio feature sequence into per-latent-frame
  windows (centered on each latent frame's source video frames, expanded
  by 4 tokens each side, right/left zero-padded with true lengths kept
  for the attention mask);
- model.py WanCrossAttentionProcessor:19 — per-block zero-init k/v
  projections of the audio context; the audio attention reuses the text
  cross-attention's (normed) query, runs per latent frame, and its output
  is added to the cross-attn output pre-`o`-projection scaled by
  audio_scale (modules/model.py:479-497).

The 3-branch audio CFG (any2video.py:1616-1618) lives in pipeline.py:
  pred = uncond + g*(noaudio - uncond) + g_a*(cond - noaudio).

The wav2vec2 feature extractor is shared with multitalk
(multitalk.wav2vec2_extract) but fantasy consumes the LAST hidden state
at its native ~50 Hz rate (fantasytalking/utils.py get_audio_features —
no frame interpolation), not the per-layer stack.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class FantasyProjConfig:
    audio_in_dim: int = 768
    cross_attention_dim: int = 2048


def init_fantasy_proj(key, cfg: FantasyProjConfig = FantasyProjConfig(),
                      dtype=jnp.float32) -> Dict[str, Any]:
    lim = math.sqrt(6.0 / (cfg.audio_in_dim + cfg.cross_attention_dim))
    return {
        "proj": {"w": jax.random.uniform(
            key, (cfg.audio_in_dim, cfg.cross_attention_dim), jnp.float32,
            -lim, lim).astype(dtype)},
        "norm": {"w": jnp.ones((cfg.cross_attention_dim,), jnp.float32),
                 "b": jnp.zeros((cfg.cross_attention_dim,), jnp.float32)},
    }


def fantasy_proj_forward(params, feats):
    """feats: [B, L, audio_in] -> [B, L, ctx_dim] (model.py:14-17:
    bias-free linear then LayerNorm)."""
    x = jnp.dot(feats.astype(jnp.float32), params["proj"]["w"]
                .astype(jnp.float32))
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    x = (x - mu) * jax.lax.rsqrt(var + 1e-5)
    return x * params["norm"]["w"] + params["norm"]["b"]


def load_fantasy_proj_params(sd: Dict[str, np.ndarray], dtype=jnp.float32):
    """fantasy_proj_model.safetensors (infer.py:21: AudioProjModel keys
    proj.weight / norm.{weight,bias})."""
    sd = dict(sd)
    if any(k.startswith("proj_model.") for k in sd):
        sd = {k[len("proj_model."):]: v for k, v in sd.items()}
    p = {"proj": {"w": jnp.asarray(
            np.asarray(sd.pop("proj.weight"), np.float32).T).astype(dtype)},
         "norm": {"w": jnp.asarray(np.asarray(sd.pop("norm.weight"),
                                              np.float32)),
                  "b": jnp.asarray(np.asarray(sd.pop("norm.bias"),
                                              np.float32))}}
    return p, sorted(sd.keys())


# ---------------------------------------------------------------------------
# host-side audio window split (model.py:72-170)
# ---------------------------------------------------------------------------

def split_audio_sequence(audio_proj_length: int,
                         num_frames: int = 81) -> List[List[int]]:
    """[start, end] index ranges into the audio feature sequence, one per
    latent frame (model.py split_audio_sequence:72)."""
    tokens_per_frame = audio_proj_length / num_frames
    tokens_per_latent_frame = tokens_per_frame * 4
    half_tokens = int(tokens_per_latent_frame / 2)

    pos_indices = []
    for i in range(int((num_frames - 1) / 4) + 1):
        if i == 0:
            pos_indices.append(0)
        else:
            start_token = tokens_per_frame * ((i - 1) * 4 + 1)
            end_token = tokens_per_frame * (i * 4 + 1)
            pos_indices.append(int((start_token + end_token) / 2) - 1)

    pos_idx_ranges = [[idx - half_tokens, idx + half_tokens]
                      for idx in pos_indices]
    pos_idx_ranges[0] = [-(half_tokens * 2 - pos_idx_ranges[1][0]),
                         pos_idx_ranges[1][0]]
    return pos_idx_ranges


def split_tensor_with_padding(feats: np.ndarray,
                              pos_idx_ranges: Sequence[Sequence[int]],
                              expand_length: int = 0
                              ) -> Tuple[np.ndarray, np.ndarray]:
    """feats: [1, L, C].  Returns ([1, F, Lw, C] zero-padded windows,
    k_lens [F] true lengths) — model.py split_tensor_with_padding:113.
    Padding layout matches the reference's F.pad(front+back on the right)."""
    feats = np.asarray(feats)
    seq_len = feats.shape[1]
    max_valid_idx = seq_len - 1
    subs, k_lens = [], []
    for start, end in pos_idx_ranges:
        start, end = start - expand_length, end + expand_length
        pad_front = max(-start, 0)
        pad_back = max(end - max_valid_idx, 0)
        valid_start, valid_end = max(start, 0), min(end, max_valid_idx)
        valid = (feats[:, valid_start:valid_end + 1]
                 if valid_start <= valid_end
                 else np.zeros((1, 0, feats.shape[2]), feats.dtype))
        total = valid.shape[1] + pad_front + pad_back
        padded = np.concatenate(
            [valid, np.zeros((1, pad_front + pad_back, feats.shape[2]),
                             feats.dtype)], axis=1)
        k_lens.append(total - pad_back - pad_front)
        subs.append(padded)
    return (np.stack(subs, axis=1),
            np.asarray(k_lens, np.int64))


def fantasy_kv_mask(k_lens: np.ndarray, window_len: int) -> np.ndarray:
    """[F] true lengths -> [1, F, Lw] bool key-validity mask.  Valid
    tokens sit at the FRONT of each window (split_tensor_with_padding
    packs all padding on the right).  At least one key is kept valid so
    a fully-empty window cannot NaN the softmax."""
    k = np.maximum(np.asarray(k_lens).reshape(-1), 1)
    return (np.arange(window_len)[None, :] < k[:, None])[None]


# ---------------------------------------------------------------------------
# per-block audio k/v projections (model.py WanCrossAttentionProcessor:19)
# ---------------------------------------------------------------------------

def init_fantasy_attn_blocks(key, dim: int, num_layers: int,
                             ctx_dim: int = 2048, dtype=jnp.bfloat16,
                             zero: bool = True):
    """Stacked per-block {k, v} audio projections.  The reference
    zero-initialises both (model.py:29-30) so an untrained module is an
    exact no-op."""
    keys = iter(jax.random.split(key, num_layers * 2 + 1))

    def lin():
        if zero:
            return {"w": jnp.zeros((ctx_dim, dim), dtype)}
        lim = math.sqrt(6.0 / (ctx_dim + dim))
        return {"w": jax.random.uniform(next(keys), (ctx_dim, dim),
                                        jnp.float32, -lim,
                                        lim).astype(dtype)}

    blocks = [{"k": lin(), "v": lin()} for _ in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def wav2vec2_conv_out_len(n_samples: int,
                          kernels=(10, 3, 3, 3, 3, 2, 2),
                          strides=(5, 2, 2, 2, 2, 2, 2)) -> int:
    """Length of the wav2vec2 conv feature sequence for a waveform."""
    n = n_samples
    for k, s in zip(kernels, strides):
        n = (n - k) // s + 1
    return max(n, 1)


def wav2vec2_last_hidden(params, cfg, wave):
    """Fantasy audio features: the wav2vec2 LAST hidden state at its
    native ~50 Hz rate (fantasytalking/utils.py get_audio_features — no
    frame interpolation).  wave: [B, T_samples] normalized.  Returns
    [B, L, dim]."""
    from .multitalk import wav2vec2_extract
    n = wav2vec2_conv_out_len(wave.shape[-1], cfg.conv_kernel,
                              cfg.conv_stride)
    return wav2vec2_extract(params, cfg, wave, n)[..., -1, :]
