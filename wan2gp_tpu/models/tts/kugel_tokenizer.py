"""KugelAudio acoustic/semantic tokenizers — TPU-native causal conv
VAE (reference models/TTS/kugelaudio/models/tokenizer.py
TokenizerEncoder/TokenizerDecoder + conv_layers.py).

Design: NTC layout throughout; every conv is a pure function over a
params dict.  Two execution modes share the same params:

* full-sequence: left-padded `lax.conv_general_dilated` — used for
  voice-prompt encoding and offline decode;
* streaming: explicit carry state (last kernel-stride inputs per conv,
  overlap-add tail per transposed conv) so the generation `lax.scan`
  can decode ONE 3200-sample frame per LM step with O(1) state — the
  TPU replacement for the reference's KugelAudioTokenizerStreamingCache
  (tokenizer.py:183-246) whose dict-of-tensors mutation doesn't trace.

Structure (tokenizer.py:689-817, config model_config.py:20-80):
encoder: stem conv(k7) -> 7 stages of Block1D(depthwise k7 + RMSNorm +
gelu FFN, layer-scale) with a strided downsample conv (k=2*ratio)
between stages, ratios reversed [2,2,4,5,5,8]; head conv -> vae_dim.
decoder mirrors with transposed convs, ratios [8,5,5,4,2,2], depths
reversed.  Total hop 3200 samples/frame at 24 kHz.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KugelTokenizerConfig:
    channels: int = 1
    vae_dim: int = 64
    n_filters: int = 32
    ratios: Tuple[int, ...] = (8, 5, 5, 4, 2, 2)   # config order
    depths: Tuple[int, ...] = (3, 3, 3, 3, 3, 3, 8)  # encoder order
    kernel_size: int = 7
    ffn_expansion: int = 4
    layer_scale: float = 1e-6
    eps: float = 1e-5
    fix_std: float = 0.5
    sample_rate: int = 24000

    @property
    def hop(self) -> int:
        return int(np.prod(self.ratios))

    @classmethod
    def tiny(cls):
        return cls(vae_dim=8, n_filters=4, ratios=(4, 2, 2),
                   depths=(1, 1, 1, 2), kernel_size=5, ffn_expansion=2,
                   sample_rate=1600)


# ---------------------------------------------------------------------------
# conv primitives (full + streaming)
# ---------------------------------------------------------------------------

def _init_conv(key, cin, cout, k, dtype, groups=1, std=None):
    fan_in = cin // groups * k
    std = std if std is not None else 1.0 / np.sqrt(fan_in)
    w = jax.random.normal(key, (k, cin // groups, cout),
                          jnp.float32) * std
    return {"w": w.astype(dtype), "b": jnp.zeros((cout,), dtype)}


def causal_conv(x, p, stride=1, groups=1):
    """x [B,T,C] -> [B,T/stride,Cout]; left pad (k - stride)."""
    k = p["w"].shape[0]
    x = jnp.pad(x, ((0, 0), (k - stride, 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    return y + p["b"].astype(y.dtype)


def causal_conv_step(state, x, p, stride=1, groups=1):
    """Streaming: state [B, k-stride, Cin], x [B, L, Cin] with L a
    multiple of stride -> (new_state, y [B, L/stride, Cout]).
    Equivalent to the matching slice of causal_conv."""
    k = p["w"].shape[0]
    buf = jnp.concatenate([state, x], axis=1)
    y = jax.lax.conv_general_dilated(
        buf, p["w"].astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)
    y = y + p["b"].astype(y.dtype)
    return buf[:, buf.shape[1] - (k - stride):], y


def causal_conv_transpose(x, p, stride):
    """x [B,T,C] -> [B,T*stride,Cout]; trim the (k-stride) right tail
    (trim_right_ratio=1, conv_layers SConvTranspose1d causal)."""
    k = p["w"].shape[0]
    # spatial flip matches torch ConvTranspose1d orientation
    y = jax.lax.conv_transpose(
        x, p["w"][::-1].astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = y[:, :x.shape[1] * stride]
    return y + p["b"].astype(y.dtype)


def conv_transpose_stream_init(p, stride, batch, dtype):
    k = p["w"].shape[0]
    cout = p["w"].shape[2]
    return jnp.zeros((batch, k - stride, cout), dtype)


def causal_conv_transpose_step(state, x, p, stride):
    """Streaming transposed conv with overlap-add tail.  state
    [B, k-stride, Cout]; x [B, L, Cin] with L*stride >= k-stride ->
    (new_state, y [B, L*stride, Cout])."""
    k = p["w"].shape[0]
    tail = k - stride
    full = jax.lax.conv_transpose(
        x, p["w"][::-1].astype(x.dtype), (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))  # [B, L*s + tail, C]
    out = full[:, :x.shape[1] * stride]
    if tail > 0:
        out = out.at[:, :tail].add(state.astype(out.dtype))
        new_state = full[:, x.shape[1] * stride:]
    else:
        new_state = state
    return new_state, out + p["b"].astype(out.dtype)


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


# ---------------------------------------------------------------------------
# Block1D (tokenizer.py:622-688)
# ---------------------------------------------------------------------------

def init_block(key, dim, cfg: KugelTokenizerConfig, dtype):
    ks = jax.random.split(key, 3)
    ffn = cfg.ffn_expansion * dim
    return {
        "norm": jnp.ones((dim,), jnp.float32),
        "mixer": dict(_init_conv(ks[0], dim, dim, cfg.kernel_size,
                                 dtype, groups=dim), _cin=dim),
        "gamma": jnp.full((dim,), cfg.layer_scale, jnp.float32),
        "ffn_norm": jnp.ones((dim,), jnp.float32),
        "ffn1": _init_conv(ks[1], dim, ffn, 1, dtype),
        "ffn2": _init_conv(ks[2], ffn, dim, 1, dtype),
        "ffn_gamma": jnp.full((dim,), cfg.layer_scale, jnp.float32),
    }


def _ffn_apply(x, bp):
    h = jnp.einsum("btc,cf->btf", x, bp["ffn1"]["w"][0].astype(x.dtype))
    h = jax.nn.gelu(h + bp["ffn1"]["b"].astype(h.dtype),
                    approximate=False)
    h = jnp.einsum("btf,fc->btc", h, bp["ffn2"]["w"][0].astype(h.dtype))
    return h + bp["ffn2"]["b"].astype(h.dtype)


def block_apply(x, bp, cfg: KugelTokenizerConfig):
    dim = x.shape[-1]
    h = _rms(x, bp["norm"], cfg.eps)
    h = causal_conv(h, bp["mixer"], 1, groups=dim)
    x = x + h * bp["gamma"].astype(h.dtype)
    h = _rms(x, bp["ffn_norm"], cfg.eps)
    return x + _ffn_apply(h, bp) * bp["ffn_gamma"].astype(x.dtype)


def block_stream_init(bp, batch, dtype):
    k = bp["mixer"]["w"].shape[0]
    dim = bp["mixer"]["_cin"]
    return jnp.zeros((batch, k - 1, dim), dtype)


def block_step(state, x, bp, cfg: KugelTokenizerConfig):
    dim = x.shape[-1]
    h = _rms(x, bp["norm"], cfg.eps)
    state, h = causal_conv_step(state, h, bp["mixer"], 1, groups=dim)
    x = x + h * bp["gamma"].astype(h.dtype)
    h = _rms(x, bp["ffn_norm"], cfg.eps)
    return state, x + _ffn_apply(h, bp) * bp["ffn_gamma"].astype(x.dtype)


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------

def _enc_ratios(cfg):
    return tuple(reversed(cfg.ratios))


def init_kugel_encoder(key, cfg: KugelTokenizerConfig,
                       dtype=jnp.float32, out_dim: Optional[int] = None):
    """TokenizerEncoder (tokenizer.py:689-817)."""
    out_dim = out_dim or cfg.vae_dim
    nf = cfg.n_filters
    ratios = _enc_ratios(cfg)
    keys = iter(jax.random.split(key, 64))
    down = [dict(_init_conv(next(keys), cfg.channels, nf,
                            cfg.kernel_size, dtype), _cin=cfg.channels,
                 _stride=1)]
    for i, r in enumerate(ratios):
        cin, cout = nf * 2 ** i, nf * 2 ** (i + 1)
        down.append(dict(_init_conv(next(keys), cin, cout, 2 * r, dtype),
                         _cin=cin, _stride=r))
    stages = []
    for i, d in enumerate(cfg.depths):
        ch = nf * 2 ** i
        stages.append([init_block(next(keys), ch, cfg, dtype)
                       for _ in range(d)])
    top = nf * 2 ** (len(cfg.depths) - 1)
    head = dict(_init_conv(next(keys), top, out_dim, cfg.kernel_size,
                           dtype), _cin=top, _stride=1)
    return {"down": down, "stages": stages, "head": head}


def kugel_encode(params, cfg: KugelTokenizerConfig, audio):
    """audio [B, T, 1] (T multiple of hop) -> mean [B, T/hop, vae_dim]."""
    x = audio
    for i in range(len(cfg.depths)):
        dp = params["down"][i]
        x = causal_conv(x, dp, dp["_stride"])
        for bp in params["stages"][i]:
            x = block_apply(x, bp, cfg)
    return causal_conv(x, params["head"], 1)


def init_kugel_decoder(key, cfg: KugelTokenizerConfig,
                       dtype=jnp.float32):
    """TokenizerDecoder (tokenizer.py:818-956); depths reversed."""
    nf = cfg.n_filters
    depths = tuple(reversed(cfg.depths))
    nlev = len(depths)
    keys = iter(jax.random.split(key, 64))
    top = nf * 2 ** (nlev - 1)
    up = [dict(_init_conv(next(keys), cfg.vae_dim, top, cfg.kernel_size,
                          dtype), _cin=cfg.vae_dim, _stride=1,
              _transpose=False)]
    for i, r in enumerate(cfg.ratios):
        cin = nf * 2 ** (nlev - 1 - i)
        cout = nf * 2 ** (nlev - 2 - i)
        up.append(dict(_init_conv(next(keys), cin, cout, 2 * r, dtype),
                       _cin=cin, _stride=r, _transpose=True))
    stages = []
    for i, d in enumerate(depths):
        ch = nf * 2 ** (nlev - 1 - i)
        stages.append([init_block(next(keys), ch, cfg, dtype)
                       for _ in range(d)])
    head = dict(_init_conv(next(keys), nf, cfg.channels,
                           cfg.kernel_size, dtype), _cin=nf, _stride=1)
    return {"up": up, "stages": stages, "head": head, "_depths": depths}


def kugel_decode(params, cfg: KugelTokenizerConfig, latents):
    """latents [B, N, vae_dim] -> audio [B, N*hop, 1]."""
    x = latents
    depths = params["_depths"]
    for i in range(len(depths)):
        upp = params["up"][i]
        if upp["_transpose"]:
            x = causal_conv_transpose(x, upp, upp["_stride"])
        else:
            x = causal_conv(x, upp, 1)
        for bp in params["stages"][i]:
            x = block_apply(x, bp, cfg)
    return causal_conv(x, params["head"], 1)


# ---------------------------------------------------------------------------
# streaming state (for the generation scan)
# ---------------------------------------------------------------------------

def decoder_stream_init(params, batch, dtype=jnp.float32):
    st = {"up": [], "stages": [], "head": None}
    for upp in params["up"]:
        if upp["_transpose"]:
            st["up"].append(conv_transpose_stream_init(
                upp, upp["_stride"], batch, dtype))
        else:
            k = upp["w"].shape[0]
            st["up"].append(jnp.zeros((batch, k - 1, upp["_cin"]),
                                      dtype))
    for stage in params["stages"]:
        st["stages"].append([block_stream_init(bp, batch, dtype)
                             for bp in stage])
    k = params["head"]["w"].shape[0]
    st["head"] = jnp.zeros((batch, k - 1, params["head"]["_cin"]),
                           dtype)
    return st


def kugel_decode_step(state, params, cfg: KugelTokenizerConfig,
                      latents):
    """Streaming decode of latents [B, L, vae_dim] -> (state,
    audio [B, L*hop, 1]); matches kugel_decode chunk-for-chunk."""
    x = latents
    depths = params["_depths"]
    new = {"up": list(state["up"]),
           "stages": [list(s) for s in state["stages"]],
           "head": state["head"]}
    for i in range(len(depths)):
        upp = params["up"][i]
        if upp["_transpose"]:
            new["up"][i], x = causal_conv_transpose_step(
                state["up"][i], x, upp, upp["_stride"])
        else:
            new["up"][i], x = causal_conv_step(state["up"][i], x, upp, 1)
        for j, bp in enumerate(params["stages"][i]):
            new["stages"][i][j], x = block_step(
                state["stages"][i][j], x, bp, cfg)
    new["head"], y = causal_conv_step(state["head"], x,
                                      params["head"], 1)
    return new, y


def encoder_stream_init(params, cfg: KugelTokenizerConfig, batch,
                        dtype=jnp.float32):
    st = {"down": [], "stages": [], "head": None}
    for dp in params["down"]:
        k, s = dp["w"].shape[0], dp["_stride"]
        st["down"].append(jnp.zeros((batch, k - s, dp["_cin"]), dtype))
    for stage in params["stages"]:
        st["stages"].append([block_stream_init(bp, batch, dtype)
                             for bp in stage])
    k = params["head"]["w"].shape[0]
    st["head"] = jnp.zeros((batch, k - 1, params["head"]["_cin"]),
                           dtype)
    return st


def kugel_encode_step(state, params, cfg: KugelTokenizerConfig, audio):
    """Streaming encode of audio [B, L*hop, 1] -> (state,
    mean [B, L, vae_dim])."""
    x = audio
    new = {"down": list(state["down"]),
           "stages": [list(s) for s in state["stages"]],
           "head": state["head"]}
    for i in range(len(cfg.depths)):
        dp = params["down"][i]
        new["down"][i], x = causal_conv_step(state["down"][i], x, dp,
                                             dp["_stride"])
        for j, bp in enumerate(params["stages"][i]):
            new["stages"][i][j], x = block_step(
                state["stages"][i][j], x, bp, cfg)
    new["head"], y = causal_conv_step(state["head"], x,
                                      params["head"], 1)
    return new, y
