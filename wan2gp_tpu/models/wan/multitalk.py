"""Wan Multitalk / Infinitetalk: audio-driven talking-head conditioning.

TPU-native re-implementation of /root/reference/models/wan/multitalk/:
- wav2vec2.py — a Wav2Vec2 base encoder whose per-layer hidden states are
  the audio features (hidden_states[1:] stacked -> [T, 12, 768], with the
  conv features linearly interpolated to the video frame count);
- multitalk.py get_window_audio_embeddings:47 — per-video-frame +/-2
  windows regrouped per latent frame (first frame: [1, 5, 12, 768];
  latter latent frames: 3+2+3 = [N_t, 8, 12, 768]);
- multitalk_model.py AudioProjModel:353 — flattened-window MLP producing
  32 context tokens x 768 per latent frame;
- attention.py SingleStreamAttention:188 — per-latent-frame audio
  cross-attention inserted after the text cross-attention in every DiT
  block (wired in dit.py via the optional `audio_attn` block params).

The audio-CFG combine (any2video.py:1630-1655) lives in pipeline.py.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Wav2Vec2 base encoder (HF architecture, post-norm / do_stable_layer_norm
# False — the chinese-wav2vec2-base checkpoint multitalk ships)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    dim: int = 768
    n_layers: int = 12
    n_heads: int = 12
    ffn_dim: int = 3072
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    eps: float = 1e-5
    compute_dtype: Any = jnp.float32


def init_wav2vec2(key, cfg: Wav2Vec2Config = Wav2Vec2Config(),
                  dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 256))

    def lin(din, dout, bias=True):
        lim = math.sqrt(6.0 / (din + dout))
        p = {"w": jax.random.uniform(next(keys), (din, dout), jnp.float32,
                                     -lim, lim).astype(dtype)}
        if bias:
            p["b"] = jnp.zeros((dout,), dtype)
        return p

    convs = []
    cin = 1
    for co, k in zip(cfg.conv_dim, cfg.conv_kernel):
        lim = math.sqrt(6.0 / (cin * k + co))
        convs.append({"w": jax.random.uniform(
            next(keys), (k, cin, co), jnp.float32, -lim, lim)})
        cin = co
    d = cfg.dim

    def layer():
        return {
            "q": lin(d, d), "k": lin(d, d), "v": lin(d, d), "o": lin(d, d),
            "ln1": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
            "ff1": lin(d, cfg.ffn_dim), "ff2": lin(cfg.ffn_dim, d),
            "ln2": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        }

    gin = cfg.conv_dim[-1]
    return {
        "convs": convs,
        "gn": {"w": jnp.ones((cfg.conv_dim[0],)),
               "b": jnp.zeros((cfg.conv_dim[0],))},
        "proj_ln": {"w": jnp.ones((gin,)), "b": jnp.zeros((gin,))},
        "proj": lin(gin, d),
        "pos_conv": {"w": jax.random.normal(
            next(keys), (cfg.pos_conv_kernel,
                         d // cfg.pos_conv_groups, d)) * 0.02,
            "b": jnp.zeros((d,))},
        "enc_ln": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))},
        "layers": [layer() for _ in range(cfg.n_layers)],
    }


def _ln(x, p, eps):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    return y * p["w"] + p["b"]


def _conv1d(x, w, b=None, stride=1, padding=0, groups=1):
    """x [B, T, C]; w [k, Cin/groups, Cout]."""
    if padding:
        x = jnp.pad(x, [(0, 0), (padding, padding), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    if b is not None:
        y = y + b
    return y


def linear_interpolate(x, target_len: int):
    """torch F.interpolate(mode=linear, align_corners=False) over the time
    axis of [B, T, C] (multitalk torch_utils.py linear_interpolation)."""
    b, t, c = x.shape
    scale = t / target_len
    pos = (jnp.arange(target_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    pos = jnp.clip(pos, 0.0, t - 1.0)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, t - 1)
    frac = (pos - lo)[None, :, None]
    return x[:, lo] * (1.0 - frac) + x[:, hi] * frac


def wav2vec2_extract(params, cfg: Wav2Vec2Config, wave, video_frames: int):
    """wave: [B, T_samples] (16 kHz, zero-mean/unit-var normalized).
    Returns stacked per-layer hidden states [B, video_frames, n_layers,
    dim] (multitalk.py get_embedding:47: hidden_states[1:])."""
    x = wave[..., None].astype(jnp.float32)           # [B, T, 1]
    for i, cp in enumerate(params["convs"]):
        x = _conv1d(x, cp["w"], stride=cfg.conv_stride[i])
        if i == 0:
            # GroupNorm(512, 512) == per-channel instance norm over time
            mu = x.mean(axis=1, keepdims=True)
            var = x.var(axis=1, keepdims=True)
            x = (x - mu) * jax.lax.rsqrt(var + cfg.eps)
            x = x * params["gn"]["w"] + params["gn"]["b"]
        x = jax.nn.gelu(x, approximate=False)

    # interpolate conv features to the video frame count
    x = linear_interpolate(x, video_frames)

    x = _ln(x, params["proj_ln"], cfg.eps)
    x = jnp.dot(x, params["proj"]["w"]) + params["proj"]["b"]

    # conv positional embedding: pad k//2, gelu, drop last element (even k)
    pos = _conv1d(x, params["pos_conv"]["w"], params["pos_conv"]["b"],
                  padding=cfg.pos_conv_kernel // 2,
                  groups=cfg.pos_conv_groups)
    pos = jax.nn.gelu(pos[:, :-1] if cfg.pos_conv_kernel % 2 == 0 else pos,
                      approximate=False)
    x = x + pos
    x = _ln(x, params["enc_ln"], cfg.eps)

    n, hd = cfg.n_heads, cfg.dim // cfg.n_heads
    hiddens = []
    for lp in params["layers"]:
        q = (jnp.dot(x, lp["q"]["w"]) + lp["q"]["b"]).reshape(
            *x.shape[:2], n, hd)
        k = (jnp.dot(x, lp["k"]["w"]) + lp["k"]["b"]).reshape(
            *x.shape[:2], n, hd)
        v = (jnp.dot(x, lp["v"]["w"]) + lp["v"]["b"]).reshape(
            *x.shape[:2], n, hd)
        s = jnp.einsum("blnd,bsnd->bnls", q, k) / math.sqrt(hd)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(x.shape)
        x = _ln(x + (jnp.dot(o, lp["o"]["w"]) + lp["o"]["b"]),
                lp["ln1"], cfg.eps)
        h = jax.nn.gelu(jnp.dot(x, lp["ff1"]["w"]) + lp["ff1"]["b"],
                        approximate=False)
        x = _ln(x + (jnp.dot(h, lp["ff2"]["w"]) + lp["ff2"]["b"]),
                lp["ln2"], cfg.eps)
        hiddens.append(x)
    return jnp.stack(hiddens, axis=2)     # [B, F, n_layers, dim]


def load_wav2vec2_params(sd: Dict[str, np.ndarray],
                         cfg: Wav2Vec2Config = Wav2Vec2Config(),
                         dtype=jnp.float32):
    """HF Wav2Vec2Model key space (transformers
    models/wav2vec2/modeling_wav2vec2.py)."""
    sd = dict(sd)
    for pre in ("wav2vec2.", "model."):
        if any(k.startswith(pre) for k in sd):
            sd = {k[len(pre):] if k.startswith(pre) else k: v
                  for k, v in sd.items()}

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    def ln(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    convs = []
    for i in range(len(cfg.conv_dim)):
        w = np.asarray(sd.pop(f"feature_extractor.conv_layers.{i}"
                              f".conv.weight"), np.float32)
        convs.append({"w": jnp.asarray(w.transpose(2, 1, 0))})
    # pos conv: weight-norm (weight_g/weight_v or parametrizations)
    for gk, vk in (("encoder.pos_conv_embed.conv.weight_g",
                    "encoder.pos_conv_embed.conv.weight_v"),
                   ("encoder.pos_conv_embed.conv.parametrizations."
                    "weight.original0",
                    "encoder.pos_conv_embed.conv.parametrizations."
                    "weight.original1")):
        if gk in sd:
            g = np.asarray(sd.pop(gk), np.float32)
            v = np.asarray(sd.pop(vk), np.float32)
            norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
            w = g.reshape(1, 1, -1) * v / np.maximum(norm, 1e-12) \
                if g.ndim == 3 and g.shape[2] == v.shape[2] else \
                (g / np.maximum(np.linalg.norm(
                    v.reshape(v.shape[0], -1), axis=1,
                    keepdims=True).reshape(-1, 1, 1), 1e-12)) * v
            break
    else:
        w = np.asarray(sd.pop("encoder.pos_conv_embed.conv.weight"),
                       np.float32)
    pos_w = jnp.asarray(w.transpose(2, 1, 0))        # [k, Cin/g, Cout]
    pos_b = jnp.asarray(np.asarray(
        sd.pop("encoder.pos_conv_embed.conv.bias"), np.float32))

    layers = []
    for i in range(cfg.n_layers):
        pre = f"encoder.layers.{i}"
        layers.append({
            "q": lin(f"{pre}.attention.q_proj"),
            "k": lin(f"{pre}.attention.k_proj"),
            "v": lin(f"{pre}.attention.v_proj"),
            "o": lin(f"{pre}.attention.out_proj"),
            "ln1": ln(f"{pre}.layer_norm"),
            "ff1": lin(f"{pre}.feed_forward.intermediate_dense"),
            "ff2": lin(f"{pre}.feed_forward.output_dense"),
            "ln2": ln(f"{pre}.final_layer_norm"),
        })
    params = {
        "convs": convs,
        "gn": ln("feature_extractor.conv_layers.0.layer_norm"),
        "proj_ln": ln("feature_projection.layer_norm"),
        "proj": lin("feature_projection.projection"),
        "pos_conv": {"w": pos_w, "b": pos_b},
        "enc_ln": ln("encoder.layer_norm"),
        "layers": layers,
    }
    leftover = [k for k in sd
                if not ("masked_spec_embed" in k or "adapter" in k)]
    return params, sorted(leftover)


# ---------------------------------------------------------------------------
# window packing (multitalk.py get_window_audio_embeddings:47)
# ---------------------------------------------------------------------------

def get_window_audio_embeddings(full_audio_emb: np.ndarray,
                                audio_start_idx: int = 0,
                                clip_length: int = 81, vae_scale: int = 4,
                                audio_window: int = 5):
    """full_audio_emb: [T_frames, blocks, C] per-video-frame features.
    Returns (first [1, 1, 5, blocks, C], latter [1, N_t, 8, blocks, C])."""
    t = full_audio_emb.shape[0]
    idx = np.arange(audio_window) - audio_window // 2
    centers = np.arange(audio_start_idx, audio_start_idx + clip_length)
    win = np.clip(centers[:, None] + idx[None, :], 0, t - 1)
    emb = full_audio_emb[win]                       # [clip, 5, blocks, C]

    first = emb[:1][None]                           # [1, 1, 5, b, c]
    latter = emb[1:].reshape(-1, vae_scale, audio_window,
                             *emb.shape[2:])        # [N_t, 4, 5, b, c]
    mid = audio_window // 2
    head = latter[:, 0, :mid + 1]                   # [N_t, 3, b, c]
    middle = latter[:, 1:-1, mid]                   # [N_t, 2, b, c]
    tail = latter[:, -1, mid:]                      # [N_t, 3, b, c]
    latter = np.concatenate([head, middle, tail], axis=1)[None]
    return first, latter


# ---------------------------------------------------------------------------
# AudioProjModel (multitalk_model.py:353)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class AudioProjConfig:
    seq_len: int = 5
    seq_len_vf: int = 8
    blocks: int = 12
    channels: int = 768
    intermediate_dim: int = 512
    output_dim: int = 768
    context_tokens: int = 32
    norm_output: bool = True


def init_audio_proj(key, cfg: AudioProjConfig = AudioProjConfig(),
                    dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))

    def lin(din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(next(keys), (din, dout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((dout,), jnp.float32)}

    d_in = cfg.seq_len * cfg.blocks * cfg.channels
    d_in_vf = cfg.seq_len_vf * cfg.blocks * cfg.channels
    p = {"proj1": lin(d_in, cfg.intermediate_dim),
         "proj1_vf": lin(d_in_vf, cfg.intermediate_dim),
         "proj2": lin(cfg.intermediate_dim, cfg.intermediate_dim),
         "proj3": lin(cfg.intermediate_dim,
                      cfg.context_tokens * cfg.output_dim)}
    if cfg.norm_output:
        p["norm"] = {"w": jnp.ones((cfg.output_dim,)),
                     "b": jnp.zeros((cfg.output_dim,))}
    return p


def audio_proj_forward(params, cfg: AudioProjConfig, first, latter):
    """first: [B, 1, seq_len, blocks, C]; latter: [B, N_t, seq_len_vf,
    blocks, C].  Returns [B, 1 + N_t, context_tokens, output_dim]."""
    b = first.shape[0]
    x1 = first.reshape(b, first.shape[1], -1)
    x2 = latter.reshape(b, latter.shape[1], -1)
    h1 = jax.nn.relu(jnp.dot(x1, params["proj1"]["w"])
                     + params["proj1"]["b"])
    h2 = jax.nn.relu(jnp.dot(x2, params["proj1_vf"]["w"])
                     + params["proj1_vf"]["b"])
    h = jnp.concatenate([h1, h2], axis=1)
    h = jax.nn.relu(jnp.dot(h, params["proj2"]["w"]) + params["proj2"]["b"])
    ctx = (jnp.dot(h, params["proj3"]["w"]) + params["proj3"]["b"])
    ctx = ctx.reshape(b, h.shape[1], cfg.context_tokens, cfg.output_dim)
    if "norm" in params:
        ctx = _ln(ctx, params["norm"], 1e-5)
    return ctx


# ---------------------------------------------------------------------------
# multitalk module checkpoint (audio_proj + per-block audio cross attn)
# ---------------------------------------------------------------------------

def load_multitalk_module_params(sd: Dict[str, np.ndarray], num_layers: int,
                                 dtype=jnp.bfloat16):
    """Module weights shipped as multitalk.safetensors: audio_proj.* and
    blocks.N.audio_cross_attn.{q_linear,kv_linear,proj}.* +
    blocks.N.norm_x.* (multitalk_model.py:246-259).

    Returns (audio_proj_params, audio_proj_cfg, per-block stacked
    audio-attn params to merge into the DiT tree, leftover keys)."""
    sd = dict(sd)

    def lin(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(w.T).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32))

    pre = ("audio_proj." if any(k.startswith("audio_proj.") for k in sd)
           else "proj_model.")
    w1 = np.asarray(sd[f"{pre}proj1.weight"])
    w1vf = np.asarray(sd[f"{pre}proj1_vf.weight"])
    w3 = np.asarray(sd[f"{pre}proj3.weight"])
    channels, blocks = 768, 12
    ap_cfg = AudioProjConfig(
        seq_len=w1.shape[1] // (blocks * channels),
        seq_len_vf=w1vf.shape[1] // (blocks * channels),
        intermediate_dim=w1.shape[0],
        context_tokens=w3.shape[0] // 768,
        norm_output=f"{pre}norm.weight" in sd)
    ap = {"proj1": lin(f"{pre}proj1"), "proj1_vf": lin(f"{pre}proj1_vf"),
          "proj2": lin(f"{pre}proj2"), "proj3": lin(f"{pre}proj3")}
    if ap_cfg.norm_output:
        ap["norm"] = {"w": vec(f"{pre}norm.weight"),
                      "b": vec(f"{pre}norm.bias")}

    blocks_p: List[Dict[str, Any]] = []
    for i in range(num_layers):
        bpre = f"blocks.{i}.audio_cross_attn"
        blocks_p.append({
            "q": lin(f"{bpre}.q_linear"),
            "kv": lin(f"{bpre}.kv_linear"),
            "o": lin(f"{bpre}.proj"),
            "norm_x": {"w": vec(f"blocks.{i}.norm_x.weight"),
                       "b": vec(f"blocks.{i}.norm_x.bias")},
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks_p)
    return ap, ap_cfg, stacked, sorted(sd.keys())


def init_multitalk_audio_attn(key, cfg, num_layers: int,
                              audio_dim: int = 768, dtype=jnp.bfloat16):
    """Random per-block audio cross-attn params (tests / synthetic runs)."""
    keys = iter(jax.random.split(key, num_layers * 4 + 1))
    d = cfg.dim

    def lin(din, dout):
        lim = math.sqrt(6.0 / (din + dout))
        return {"w": jax.random.uniform(next(keys), (din, dout),
                                        jnp.float32, -lim,
                                        lim).astype(dtype),
                "b": jnp.zeros((dout,), dtype)}

    blocks = [{"q": lin(d, d), "kv": lin(audio_dim, 2 * d),
               "o": lin(d, d),
               "norm_x": {"w": jnp.ones((d,)), "b": jnp.zeros((d,))}}
              for _ in range(num_layers)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
