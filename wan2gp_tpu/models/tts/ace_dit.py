"""ACE-Step music-generation transformer, TPU-native.

Re-implementation of /root/reference/models/TTS/ace_step/models/
ace_step_transformer.py (ACEStepTransformer2DModel:206) +
attention.py (LinearTransformerBlock:197, GLUMBConv:132) +
customer_attention_processor.py (CustomLiteLAProcessor2_0:26 — Sana LiteLA
relu linear attention with the ones-pad normalizer row —
CustomerAttnProcessor2_0 softmax cross-attention with positional
cross-rope).

Default dims (ace_step_v1 transformer config): 24 heads x 64 = 1536,
28 layers, latent [B, 8, 16, T] patchified (16, 1) -> T tokens of
8*16*256-channel early conv -> 1536.

TPU notes: the LiteLA form is two batched matmuls per head (O(T d^2)),
already MXU-shaped; blocks are stacked on a leading layer axis and run
under `lax.scan`; fp32 accumulation for the linear-attention normalizer
(the reference upcasts too, attention processor :188-197).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.norms import rms_norm, layer_norm
from .lyric_encoder import (ConformerConfig, init_conformer,
                            conformer_forward)


@dataclasses.dataclass(frozen=True)
class ACEStepConfig:
    in_channels: int = 8
    num_layers: int = 28
    num_heads: int = 24
    head_dim: int = 64
    mlp_ratio: float = 4.0
    out_channels: int = 8
    rope_theta: float = 1_000_000.0
    speaker_dim: int = 512
    text_dim: int = 768                 # UMT5-base hidden
    lyric_vocab: int = 6681
    lyric_dim: int = 1024
    patch_size: Tuple[int, int] = (16, 1)
    max_height: int = 16
    eps: float = 1e-6
    compute_dtype: Any = jnp.bfloat16

    @property
    def dim(self):
        return self.num_heads * self.head_dim


def _lin(key, d_in, d_out, dtype, bias=True):
    lim = math.sqrt(6.0 / (d_in + d_out))
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32,
                                 -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def init_ace_dit(key, cfg: ACEStepConfig, dtype=jnp.bfloat16):
    keys = iter(jax.random.split(key, 4096))
    d = cfg.dim

    def attn(cross):
        kv_src = cfg.dim
        p = {"to_q": _lin(next(keys), d, d, dtype),
             "to_k": _lin(next(keys), kv_src, d, dtype),
             "to_v": _lin(next(keys), kv_src, d, dtype),
             "to_out": _lin(next(keys), d, d, dtype)}
        return p

    def block():
        return {
            "attn": attn(False),
            "cross_attn": attn(True),
            "ff": {
                "inverted": _lin(next(keys), d, int(d * cfg.mlp_ratio) * 2,
                                 dtype),
                "depth": {"w": jax.random.normal(
                    next(keys), (3, 1, int(d * cfg.mlp_ratio) * 2),
                    jnp.float32).astype(dtype) * 0.02,
                    "b": jnp.zeros((int(d * cfg.mlp_ratio) * 2,), dtype)},
                "point": _lin(next(keys), int(d * cfg.mlp_ratio), d, dtype,
                              bias=False),
            },
            "scale_shift_table": jax.random.normal(
                next(keys), (6, d), jnp.float32) / math.sqrt(d),
        }

    def stack(fn, n):
        leaves = [fn() for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    ph, pw = cfg.patch_size
    early = cfg.in_channels * 256
    conformer_cfg = ConformerConfig(dim=cfg.lyric_dim)
    return {
        "proj_in": {
            "conv1": {"w": jax.random.normal(
                next(keys), (ph, pw, cfg.in_channels, early),
                jnp.float32) * 0.02, "b": jnp.zeros((early,), jnp.float32)},
            "gn": {"w": jnp.ones((early,), jnp.float32),
                   "b": jnp.zeros((early,), jnp.float32)},
            "conv2": {"w": jax.random.normal(
                next(keys), (1, 1, early, d), jnp.float32) * 0.02,
                "b": jnp.zeros((d,), jnp.float32)},
        },
        "timestep_embedder": {"fc1": _lin(next(keys), 256, d, jnp.float32),
                              "fc2": _lin(next(keys), d, d, jnp.float32)},
        "t_block": _lin(next(keys), d, 6 * d, jnp.float32),
        "speaker_embedder": _lin(next(keys), cfg.speaker_dim, d, dtype),
        "genre_embedder": _lin(next(keys), cfg.text_dim, d, dtype),
        "lyric_embs": (jax.random.normal(
            next(keys), (cfg.lyric_vocab, cfg.lyric_dim),
            jnp.float32) * 0.02).astype(dtype),
        "lyric_encoder": init_conformer(next(keys), conformer_cfg, dtype),
        "lyric_proj": _lin(next(keys), cfg.lyric_dim, d, dtype),
        "blocks": stack(block, cfg.num_layers),
        "final": {
            "linear": _lin(next(keys), d, ph * pw * cfg.out_channels,
                           jnp.float32),
            "scale_shift_table": jax.random.normal(
                next(keys), (2, d), jnp.float32) / math.sqrt(d),
        },
    }


def _dense(x, p, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p or "w_q4" in p:
        from ...ops.quant import dense_quant
        return dense_quant(x, p, dtype)
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def ace_rope(seq_len: int, head_dim: int, theta: float):
    """Qwen2RotaryEmbedding tables [S, D] (duplicated halves), applied with
    the INTERLEAVED pairing (processor apply_rotary_emb:58)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64)
                           / head_dim))
    ang = np.outer(np.arange(seq_len, dtype=np.float64), inv)
    ang = np.concatenate([ang, ang], axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _apply_ace_rope(x, cos, sin):
    """x [B, S, H, D]; pairs are (2i, 2i+1) rotated by (cos, sin)[s, d]."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    x_real, x_imag = xr[..., 0], xr[..., 1]
    rot = jnp.stack([-x_imag, x_real], axis=-1).reshape(x.shape)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return (x.astype(jnp.float32) * c
            + rot.astype(jnp.float32) * s).astype(x.dtype)


def lite_la(q, k, v, mask=None, eps=1e-15):
    """Sana LiteLA linear attention (processor :186-207).

    q, k, v: [B, S, H, D] (relu'd q/k); mask: [B, S] or None.
    out[s] = (sum_s' v[s'] k[s']^T) q[s] / (sum_s' k[s']^T q[s] + eps).
    """
    q = jax.nn.relu(q).astype(jnp.float32)
    k = jax.nn.relu(k).astype(jnp.float32)
    v = v.astype(jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)[:, :, None, None]
        q = q * m
        k = k * m
        v = v * m
    vk = jnp.einsum("bshd,bshe->bhde", v, k)          # [B, H, D, D]
    ksum = jnp.sum(k, axis=1)                         # [B, H, D]
    num = jnp.einsum("bhde,bshe->bshd", vk, q)
    den = jnp.einsum("bhe,bshe->bsh", ksum, q)[..., None]
    return num / (den + eps)


def _self_attention(p, x, cos, sin, cfg, mask):
    cdt = cfg.compute_dtype
    n, hd = cfg.num_heads, cfg.head_dim
    b, s, _ = x.shape
    q = _dense(x, p["to_q"], cdt).reshape(b, s, n, hd)
    k = _dense(x, p["to_k"], cdt).reshape(b, s, n, hd)
    v = _dense(x, p["to_v"], cdt).reshape(b, s, n, hd)
    q = _apply_ace_rope(q, cos, sin)
    k = _apply_ace_rope(k, cos, sin)
    o = lite_la(q, k, v, mask)
    return _dense(o.reshape(b, s, n * hd).astype(cdt), p["to_out"], cdt)


def _cross_attention(p, x, enc, cos_q, sin_q, cos_k, sin_k, cfg, enc_mask):
    """Softmax cross attention with rope on BOTH sides
    (CustomerAttnProcessor2_0:327-356)."""
    from ...ops.attention import attention
    cdt = cfg.compute_dtype
    n, hd = cfg.num_heads, cfg.head_dim
    b, s, _ = x.shape
    q = _dense(x, p["to_q"], cdt).reshape(b, s, n, hd)
    k = _dense(enc, p["to_k"], cdt).reshape(b, enc.shape[1], n, hd)
    v = _dense(enc, p["to_v"], cdt).reshape(b, enc.shape[1], n, hd)
    q = _apply_ace_rope(q, cos_q, sin_q)
    k = _apply_ace_rope(k, cos_k, sin_k)
    o = attention(q, k, v, backend="xla", kv_mask=enc_mask)
    return _dense(o.reshape(b, s, n * hd), p["to_out"], cdt)


def _glumb_conv(p, x, cfg):
    """GLUMBConv (attention.py:132): 1x1 inverted conv (silu) ->
    depthwise k=3 conv -> GLU gate -> 1x1 point conv (no bias)."""
    cdt = cfg.compute_dtype
    h = _dense(x, p["inverted"], cdt)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(cdt)
    # depthwise conv over time: [B, S, C]
    c2 = h.shape[-1]
    h = jax.lax.conv_general_dilated(
        h, p["depth"]["w"].astype(cdt), (1,), [(1, 1)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c2)
    h = h + p["depth"]["b"].astype(cdt)
    hh, gate = jnp.split(h, 2, axis=-1)
    h = hh * jax.nn.silu(gate.astype(jnp.float32)).astype(cdt)
    return _dense(h, p["point"], cdt)


def _block(bp, x, enc, enc_mask, temb, cos, sin, enc_cos, enc_sin, cfg,
           mask):
    """LinearTransformerBlock.forward (attention.py:261-330)."""
    sst = bp["scale_shift_table"].astype(jnp.float32)  # [6, D]
    mods = sst[None] + temb.reshape(-1, 6, cfg.dim)    # [B, 6, D]
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
        mods[:, i][:, None] for i in range(6))

    y = rms_norm(x.astype(jnp.float32), eps=cfg.eps)
    y = y * (1.0 + sc_msa) + sh_msa
    o = _self_attention(bp["attn"], y.astype(cfg.compute_dtype), cos, sin,
                        cfg, mask)
    x = x + g_msa * o.astype(jnp.float32)

    o = _cross_attention(bp["cross_attn"], x.astype(cfg.compute_dtype),
                         enc, cos, sin, enc_cos, enc_sin, cfg, enc_mask)
    x = x + o.astype(jnp.float32)

    y = rms_norm(x.astype(jnp.float32), eps=cfg.eps)
    y = y * (1.0 + sc_mlp) + sh_mlp
    o = _glumb_conv(bp["ff"], y.astype(cfg.compute_dtype), cfg)
    x = x + g_mlp * o.astype(jnp.float32)
    return x


def _sinusoid_256(t):
    """diffusers Timesteps(256, flip_sin_to_cos=True, shift=0)."""
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def ace_encode_condition(params, cfg: ACEStepConfig, text_hidden, text_mask,
                         speaker_embeds, lyric_ids, lyric_mask):
    """ACEStepTransformer2DModel.encode (:374-412): concat
    [speaker(1), genre-projected text, conformer-encoded lyrics]."""
    cdt = cfg.compute_dtype
    b = text_hidden.shape[0]
    spk = _dense(speaker_embeds.astype(cdt),
                 params["speaker_embedder"], cdt)[:, None]
    genre = _dense(text_hidden.astype(cdt), params["genre_embedder"], cdt)
    lyr = params["lyric_embs"][lyric_ids].astype(cdt)
    lyr = conformer_forward(params["lyric_encoder"],
                            ConformerConfig(dim=cfg.lyric_dim), lyr,
                            lyric_mask)
    lyr = _dense(lyr.astype(cdt), params["lyric_proj"], cdt)
    enc = jnp.concatenate([spk, genre, lyr], axis=1)
    enc_mask = jnp.concatenate(
        [jnp.ones((b, 1), text_mask.dtype), text_mask, lyric_mask], axis=1)
    return enc, enc_mask


def ace_dit_forward(params, cfg: ACEStepConfig, latents, t, enc, enc_mask,
                    latent_mask=None):
    """latents: [B, C, H=16, T]; t: [B] in [0, 1] (sigma*1000 applied by the
    caller per the reference scheduler convention); enc from
    ace_encode_condition.  Returns velocity [B, C, 16, T]."""
    cdt = cfg.compute_dtype
    b, c, h, w = latents.shape
    ph, pw = cfg.patch_size

    # proj_in: conv (16,1) stride (16,1) + GroupNorm(32) + 1x1 conv
    x = latents.transpose(0, 2, 3, 1).astype(jnp.float32)   # [B, H, T, C]
    pi = params["proj_in"]
    x = jax.lax.conv_general_dilated(
        x, pi["conv1"]["w"], (ph, pw), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + pi["conv1"]["b"]
    # GroupNorm(32) over channels
    bb, hh, ww, cc = x.shape
    xg = x.reshape(bb, hh, ww, 32, cc // 32)
    mu = xg.mean(axis=(1, 2, 4), keepdims=True)
    var = xg.var(axis=(1, 2, 4), keepdims=True)
    xg = (xg - mu) * jax.lax.rsqrt(var + 1e-6)
    x = xg.reshape(bb, hh, ww, cc) * pi["gn"]["w"] + pi["gn"]["b"]
    x = jax.lax.conv_general_dilated(
        x, pi["conv2"]["w"], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + pi["conv2"]["b"]
    x = x.reshape(b, -1, cfg.dim)                            # [B, T', D]
    s = x.shape[1]

    emb = _sinusoid_256(t)
    te = params["timestep_embedder"]
    emb = _dense(emb, te["fc1"], jnp.float32)
    emb = _dense(jax.nn.silu(emb), te["fc2"], jnp.float32)
    temb = _dense(jax.nn.silu(emb), params["t_block"], jnp.float32)

    cos, sin = ace_rope(s, cfg.head_dim, cfg.rope_theta)
    enc_cos, enc_sin = ace_rope(enc.shape[1], cfg.head_dim, cfg.rope_theta)

    def body(carry, bp):
        return _block(bp, carry, enc, enc_mask, temb, cos, sin,
                      enc_cos, enc_sin, cfg, latent_mask), None

    x, _ = jax.lax.scan(body, x.astype(jnp.float32), params["blocks"])

    # T2IFinalLayer (:93): rms norm + 2-way table vs embedded timestep
    fl = params["final"]
    sst = fl["scale_shift_table"].astype(jnp.float32)
    shift = sst[None, 0] + emb
    scale = sst[None, 1] + emb
    y = rms_norm(x, eps=cfg.eps)
    y = y * (1.0 + scale[:, None]) + shift[:, None]
    y = _dense(y, fl["linear"], jnp.float32)                 # [B, T', ph*pw*C]
    y = y.reshape(b, 1, s, ph, pw, cfg.out_channels)
    y = jnp.einsum("nhwpqc->nchpwq", y).reshape(
        b, cfg.out_channels, ph, s * pw)
    return y
