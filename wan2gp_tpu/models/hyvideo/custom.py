"""HunyuanCustom / HunyuanAvatar conditioning modules.

TPU-native re-implementation of the reference audio/identity adapters
(models/hyvideo/modules/audio_adapters.py, models.py:780-816,
1032-1087, 1166-1175):
- AudioProjNet2 (audio_adapters.py:41-116): per-video-frame windows of
  Whisper-tiny encoder states ([10, 5, 384] -> relu MLP -> 4 context
  tokens at 3072, LayerNorm'd);
- PerceiverAttentionCA (audio_adapters.py:130-173): single-head
  1024-dim cross-attention from per-frame image tokens (queries) to
  that frame's audio tokens, zero-init output;
- the adapters sit on double blocks [1,3,5,7,9,11] (custom-audio) or
  [1,3,5,7,9,11,13,15,17,19] (avatar), gated by the face mask and the
  audio strength;
- identity: custom prepends the reference image's latent tokens (rope
  'timecat-w': t=-1, w offset +W); avatar adds before_proj(ref_in(ref))
  to all frames and prepends the first ref frame ('timecat': t=-1).

Audio feature extraction (data_kits/audio_preprocessor.py:49-75):
stack the 5 Whisper-tiny encoder hidden states, zero-pad 4 leading
steps, and take a 10-step window per video frame.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import layer_norm

AUDIO_LAYERS_CUSTOM = (1, 3, 5, 7, 9, 11)
AUDIO_LAYERS_AVATAR = (1, 3, 5, 7, 9, 11, 13, 15, 17, 19)


def _lin(key, din, dout, bias=True):
    lim = (din + dout) ** -0.5
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def init_audio_proj(key, seq_len=10, blocks=5, channels=384,
                    intermediate=1024, context_tokens=4,
                    output_dim=3072) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    din = seq_len * blocks * channels
    return {"proj1": _lin(ks[0], din, intermediate),
            "proj2": _lin(ks[1], intermediate, intermediate),
            "proj3": _lin(ks[2], intermediate,
                          context_tokens * output_dim),
            "norm_w": jnp.ones((output_dim,), jnp.float32),
            "norm_b": jnp.zeros((output_dim,), jnp.float32)}


def audio_proj_forward(p, audio_embeds) -> jnp.ndarray:
    """[B, F, W, blocks, C] -> [B, F, context_tokens, 3072]
    (audio_adapters.py:98-116)."""
    b, f = audio_embeds.shape[:2]
    x = audio_embeds.astype(jnp.float32).reshape(b * f, -1)
    x = jax.nn.relu(x @ p["proj1"]["w"] + p["proj1"]["b"])
    x = jax.nn.relu(x @ p["proj2"]["w"] + p["proj2"]["b"])
    x = (x @ p["proj3"]["w"] + p["proj3"]["b"])
    nt = p["proj3"]["w"].shape[1] // p["norm_w"].shape[0]
    x = x.reshape(b * f, nt, -1)
    x = layer_norm(x, p["norm_w"], p["norm_b"], eps=1e-5)
    return x.reshape(b, f, nt, -1)


def init_perceiver_ca(key, dim=3072, dim_head=1024) -> Dict[str, Any]:
    ks = jax.random.split(key, 3)
    return {"norm1_w": jnp.ones((dim,), jnp.float32),
            "norm1_b": jnp.zeros((dim,), jnp.float32),
            "norm2_w": jnp.ones((dim,), jnp.float32),
            "norm2_b": jnp.zeros((dim,), jnp.float32),
            "to_q": _lin(ks[0], dim, dim_head, bias=False),
            "to_kv": _lin(ks[1], dim, 2 * dim_head, bias=False),
            "to_out": {"w": jnp.zeros((dim_head, dim), jnp.float32)}}


def perceiver_ca(p, audio_tokens, img_frames) -> jnp.ndarray:
    """audio_tokens: [B, F, A, D] (keys/values); img_frames:
    [B, F, HW, D] (queries) -> [B, F, HW, D]
    (audio_adapters.py:150-173)."""
    x = layer_norm(audio_tokens.astype(jnp.float32), p["norm1_w"],
                   p["norm1_b"], eps=1e-5)
    lat = layer_norm(img_frames.astype(jnp.float32), p["norm2_w"],
                     p["norm2_b"], eps=1e-5)
    q = lat @ p["to_q"]["w"]
    kv = x @ p["to_kv"]["w"]
    k, v = jnp.split(kv, 2, axis=-1)
    scale = 1.0 / np.sqrt(np.sqrt(q.shape[-1]))
    w = jnp.einsum("bfqd,bfkd->bfqk", q * scale, k * scale)
    w = jax.nn.softmax(w, axis=-1)
    out = jnp.einsum("bfqk,bfkd->bfqd", w, v)
    return out @ p["to_out"]["w"]


def stack_audio_adapters(key, n_double: int, layers, dim=3072,
                         dim_head=1024) -> Dict[str, Any]:
    """Per-double-block adapter params with an `active` mask so the
    block loop stays one lax.scan (adapters only on `layers`)."""
    ks = jax.random.split(key, n_double)
    per = [init_perceiver_ca(k, dim, dim_head) for k in ks]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    stacked["active"] = jnp.asarray(
        [1.0 if i in layers else 0.0 for i in range(n_double)],
        jnp.float32).reshape(n_double, 1, 1, 1)
    return stacked


def window_audio_features(encoder_states, num_frames: int,
                          fps: float = 25.0) -> np.ndarray:
    """[T, blocks, C] stacked Whisper-tiny encoder states -> per-frame
    windows [1, F, 10, blocks, C]
    (audio_preprocessor.py:49-75: zero-pad 4 leading steps, window of
    10 at stride 2 per video frame)."""
    feats = np.asarray(encoder_states, np.float32)
    step = 2 if abs(fps - 12.5) < 1e-3 else 1
    feats = np.concatenate([np.zeros_like(feats[:4]), feats], axis=0)
    outs = []
    for f in range(min(num_frames, 400)):
        t0 = f * step * 2
        clip = feats[t0:t0 + 10]
        if clip.shape[0] < 10:
            clip = np.concatenate(
                [clip, np.zeros((10 - clip.shape[0],
                                 *feats.shape[1:]), np.float32)])
        outs.append(clip)
    return np.stack(outs)[None]


def face_mask_tokens(face_mask, grid_fhw) -> jnp.ndarray:
    """[H, W] (or [T, H, W]) face box mask -> per-token weights
    [1, F*H'*W', 1] (models.py:1079-1083 nearest resize to the token
    grid)."""
    f, h, w = grid_fhw
    m = np.asarray(face_mask, np.float32)
    if m.ndim == 2:
        m = np.broadcast_to(m[None], (f, *m.shape))
    ys = np.floor(np.arange(h) * m.shape[1] / h).astype(int)
    xs = np.floor(np.arange(w) * m.shape[2] / w).astype(int)
    ts = np.floor(np.arange(f) * m.shape[0] / f).astype(int)
    m = m[ts][:, ys][:, :, xs]
    return jnp.asarray(m.reshape(1, -1, 1))


def load_audio_proj(sd: Dict[str, np.ndarray], prefix="audio_proj"):
    def lin(name, bias=True):
        p = {"w": jnp.asarray(np.asarray(
            sd.pop(f"{prefix}.{name}.weight"), np.float32).T)}
        if bias:
            p["b"] = jnp.asarray(np.asarray(
                sd.pop(f"{prefix}.{name}.bias"), np.float32))
        return p

    return {"proj1": lin("proj1"), "proj2": lin("proj2"),
            "proj3": lin("proj3"),
            "norm_w": jnp.asarray(np.asarray(
                sd.pop(f"{prefix}.norm.weight"), np.float32)),
            "norm_b": jnp.asarray(np.asarray(
                sd.pop(f"{prefix}.norm.bias"), np.float32))}


def load_audio_adapters(sd: Dict[str, np.ndarray], n_double: int,
                        layers, prefix: str):
    """blocks `{prefix}.N.*` -> stacked per-double-block params
    (models.py:74-80 adapt_model maps adapter j -> double block
    layers[j])."""
    per = []
    zero = None
    for i in range(n_double):
        if i in layers:
            j = list(layers).index(i)

            def lin(name):
                return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.{j}.{name}.weight"),
                    np.float32).T)}

            p = {"norm1_w": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.{j}.norm1.weight"), np.float32)),
                 "norm1_b": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.{j}.norm1.bias"), np.float32)),
                 "norm2_w": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.{j}.norm2.weight"), np.float32)),
                 "norm2_b": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.{j}.norm2.bias"), np.float32)),
                 "to_q": lin("to_q"), "to_kv": lin("to_kv"),
                 "to_out": lin("to_out")}
            zero = zero or jax.tree.map(jnp.zeros_like, p)
            per.append(p)
        else:
            per.append(None)
    per = [p if p is not None else jax.tree.map(jnp.zeros_like, zero)
           for p in per]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per)
    stacked["active"] = jnp.asarray(
        [1.0 if i in layers else 0.0 for i in range(n_double)],
        jnp.float32).reshape(n_double, 1, 1, 1)
    return stacked
