"""HeartCodec: RVQ-conditioned flow matching + scalar-quantized codec.

TPU-native re-implementation of
/root/reference/models/TTS/HeartMula/heartcodec/:
- flow_matching.py FlowMatching — RVQ token lookup (8 codebooks of
  [8192, 32], summed, project_out 32->512), cond_feature_emb, 2x
  nearest temporal upsample, zero_cond embedding for masked/uncond
  positions, CFG euler integration (solve_euler:137-186) with the
  incontext renoising trick;
- transformer.py LlamaTransformer:275 — two llama stacks with
  ada_norm_single (PixArt-style 6-way modulation per block from a
  shared timestep embedding, scale-1000 sinusoid): stack 1 at
  24x64=1536, input-concat connection proj, stack 2 at 3072, final
  2-way scale/shift + ProjectLayer conv-k3 heads;
- sq_codec.py ScalarModel.decode:521 — round(9x)/9 scalar quantization
  then a causal ConvTranspose upsampling pyramid (factors 5,4,4,4,3 ->
  x960) with PReLU residual units, 2x repeat PostProcessor and a final
  conv to mono 48 kHz; the 256-d flow latent splits into two 128-d
  halves decoded as stereo channels (modeling_heartcodec.py:166-178).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HeartCodecConfig:
    dim: int = 512
    codebook_size: int = 8192
    codebook_dim: int = 32
    num_quantizers: int = 8
    head_dim: int = 64
    n_heads: int = 24
    num_layers: int = 24
    num_layers_2: int = 6
    in_channels: int = 1024
    out_channels: int = 256
    # scalar codec
    sample_rate: int = 48000
    latent_hidden_dim: int = 128
    init_channel: int = 64
    upsample_factors: Tuple[int, ...] = (5, 4, 4, 4, 3)
    upsample_kernel_sizes: Tuple[int, ...] = (10, 8, 8, 8, 6)
    num_samples: int = 2
    default_kernel_size: int = 7
    delay_kernel_size: int = 5
    res_kernel_size: int = 7

    @property
    def inner_dim(self):
        return self.n_heads * self.head_dim


# ---------------------------------------------------------------------------
# flow estimator
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype=jnp.float32, bias=True):
    lim = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = jnp.dot(x, p["w"].astype(x.dtype))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    return (y * w).astype(x.dtype)


def _rope_pair(x, cos, sin):
    """transformer.py apply_rope_vec: interleaved pairs on the full
    head dim."""
    xr = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([xr[..., 0] * c - xr[..., 1] * s,
                     xr[..., 1] * c + xr[..., 0] * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _init_block(key, dim, n_heads, head_dim, dtype):
    keys = iter(jax.random.split(key, 8))
    inner = n_heads * head_dim
    ffn = 256 * ((int(2 * (4 * dim) / 3) + 255) // 256)
    return {"attn_norm": jnp.ones((dim,), jnp.float32),
            "q": _lin(next(keys), dim, inner, dtype, bias=False),
            "k": _lin(next(keys), dim, inner, dtype, bias=False),
            "v": _lin(next(keys), dim, inner, dtype, bias=False),
            "o": _lin(next(keys), inner, dim, dtype, bias=False),
            "mlp_norm": jnp.ones((dim,), jnp.float32),
            "gate": _lin(next(keys), dim, ffn, dtype, bias=False),
            "up": _lin(next(keys), dim, ffn, dtype, bias=False),
            "down": _lin(next(keys), ffn, dim, dtype, bias=False),
            "scale_shift_table": (jax.random.normal(
                next(keys), (6, dim), jnp.float32) / math.sqrt(dim))}


def _proj_layer_init(key, cin, cout, k=3, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    lim = math.sqrt(6.0 / (cin * k + cout))
    return {"conv": {"w": jax.random.uniform(
                k1, (k, cin, cout), jnp.float32, -lim, lim).astype(dtype),
                "b": jnp.zeros((cout,), dtype)},
            "lin": _lin(k2, cout, cout, dtype),
            "k": k}


def _proj_layer(p, x):
    """ProjectLayer (transformer.py:258): conv k3 SAME -> /sqrt(k) ->
    linear.  x [B, T, C]."""
    k = p["conv"]["w"].shape[0]
    pad = k // 2
    y = jax.lax.conv_general_dilated(
        x, p["conv"]["w"].astype(x.dtype), (1,),
        [(pad, pad)], dimension_numbers=("NWC", "WIO", "NWC"))
    y = (y + p["conv"]["b"]) * (k ** -0.5)
    return _dense(y, p["lin"])


def init_flow_estimator(key, cfg: HeartCodecConfig = HeartCodecConfig(),
                        dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))
    inner = cfg.inner_dim
    inner2 = inner * 2
    blocks = [_init_block(next(keys), inner, cfg.n_heads, cfg.head_dim,
                          dtype) for _ in range(cfg.num_layers)]
    blocks2 = [_init_block(next(keys), inner2, cfg.n_heads,
                           cfg.head_dim * 2, dtype)
               for _ in range(cfg.num_layers_2)]

    def ada(d):
        return {"emb1": _lin(next(keys), 512, d, dtype),
                "emb2": _lin(next(keys), d, d, dtype),
                "linear": _lin(next(keys), d, 6 * d, dtype)}

    return {
        "proj_in": _proj_layer_init(next(keys), cfg.in_channels, inner,
                                    dtype=dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
        "blocks_2": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks2),
        "connection_proj": _proj_layer_init(
            next(keys), cfg.in_channels + inner, inner2, dtype=dtype),
        "scale_shift_table": jax.random.normal(
            next(keys), (2, inner), jnp.float32) / math.sqrt(inner),
        "scale_shift_table_2": jax.random.normal(
            next(keys), (2, inner2), jnp.float32) / math.sqrt(inner2),
        "proj_out": _proj_layer_init(next(keys), inner2,
                                     cfg.out_channels, dtype=dtype),
        "adaln_single": ada(inner),
        "adaln_single_2": ada(inner2),
    }


def _flow_t_embed(t, ada, dim):
    """PixArtAlphaCombinedFlowEmbeddings (transformer.py:399-427):
    512-d sinusoid at scale 1000 -> 2-layer MLP; then linear(silu) ->
    6*dim modulation."""
    half = 256
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None] * freqs[None] * 1000.0
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    emb = _dense(jax.nn.silu(_dense(emb, ada["emb1"])), ada["emb2"])
    return _dense(jax.nn.silu(emb), ada["linear"]), emb


def _run_stack(blocks, x, tmod, n_heads, head_dim, cos, sin):
    def body(x, bp):
        b = x.shape[0]
        mods = (bp["scale_shift_table"][None]
                + tmod.reshape(b, 6, -1))
        sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = [
            mods[:, i][:, None] for i in range(6)]
        y = _rms(x, bp["attn_norm"]) * (1 + sc_msa) + sh_msa
        q = _dense(y, bp["q"]).reshape(b, -1, n_heads, head_dim)
        k = _dense(y, bp["k"]).reshape(b, -1, n_heads, head_dim)
        v = _dense(y, bp["v"]).reshape(b, -1, n_heads, head_dim)
        q = _rope_pair(q, cos, sin)
        k = _rope_pair(k, cos, sin)
        s = jnp.einsum("blnd,bsnd->bnls", q, k,
                       preferred_element_type=jnp.float32) \
            / math.sqrt(head_dim)
        a = jax.nn.softmax(s, axis=-1).astype(x.dtype)
        o = jnp.einsum("bnls,bsnd->blnd", a, v).reshape(
            b, -1, n_heads * head_dim)
        x = x + g_msa * _dense(o, bp["o"])
        y = _rms(x, bp["mlp_norm"]) * (1 + sc_mlp) + sh_mlp
        h = jax.nn.silu(_dense(y, bp["gate"]).astype(jnp.float32)
                        ).astype(x.dtype) * _dense(y, bp["up"])
        x = x + g_mlp * _dense(h, bp["down"])
        return x, None

    x, _ = jax.lax.scan(body, x, blocks)
    return x


def _ln_nf(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def flow_estimator_forward(params, cfg: HeartCodecConfig, x, t):
    """x: [B, T, in_channels]; t: [B] flow time.  Returns [B, T,
    out_channels] (LlamaTransformer.forward:345-397)."""
    seq = x.shape[1]
    inner, inner2 = cfg.inner_dim, cfg.inner_dim * 2

    def rope(dim):
        inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2) / dim))
        ang = np.outer(np.arange(seq), inv)
        return (jnp.asarray(np.cos(ang), jnp.float32),
                jnp.asarray(np.sin(ang), jnp.float32))

    cos1, sin1 = rope(cfg.head_dim)
    cos2, sin2 = rope(cfg.head_dim * 2)

    s = _proj_layer(params["proj_in"], x)
    tmod, temb = _flow_t_embed(t, params["adaln_single"], inner)
    s = _run_stack(params["blocks"], s, tmod, cfg.n_heads, cfg.head_dim,
                   cos1, sin1)
    shift, scale = [(params["scale_shift_table"][None]
                     + temb[:, None])[:, i][:, None] for i in (0, 1)]
    s = _ln_nf(s.astype(jnp.float32)).astype(s.dtype)
    s = s * (1 + scale) + shift

    h = jnp.concatenate([x, s], axis=-1)
    h = _proj_layer(params["connection_proj"], h)
    tmod2, temb2 = _flow_t_embed(t, params["adaln_single_2"], inner2)
    h = _run_stack(params["blocks_2"], h, tmod2, cfg.n_heads,
                   cfg.head_dim * 2, cos2, sin2)
    shift2, scale2 = [(params["scale_shift_table_2"][None]
                       + temb2[:, None])[:, i][:, None] for i in (0, 1)]
    h = _ln_nf(h.astype(jnp.float32)).astype(h.dtype)
    h = h * (1 + scale2) + shift2
    return _proj_layer(params["proj_out"], h)


# ---------------------------------------------------------------------------
# RVQ code lookup + flow matching inference
# ---------------------------------------------------------------------------

def init_flow_cond(key, cfg: HeartCodecConfig = HeartCodecConfig()):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {"codebooks": jax.random.normal(
                k1, (cfg.num_quantizers, cfg.codebook_size,
                     cfg.codebook_dim), jnp.float32),
            "project_out": _lin(k2, cfg.codebook_dim, cfg.dim),
            "cond_feature_emb": _lin(k3, cfg.dim, cfg.dim),
            "zero_cond_embedding1": jax.random.normal(
                k4, (cfg.dim,), jnp.float32)}


def codes_to_cond(params, cfg: HeartCodecConfig, codes):
    """codes: [B, Q, T] int32 -> conditioning [B, 2T, dim]
    (flow_matching.py:79-88: per-quantizer lookup, sum, project_out,
    cond_feature_emb, 2x nearest upsample)."""
    q = cfg.num_quantizers
    gathered = jax.vmap(lambda cb, idx: cb[idx],
                        in_axes=(0, 1))(params["codebooks"],
                                        codes)     # [Q, B, T, cd]
    summed = gathered.sum(axis=0)
    emb = _dense(summed, params["project_out"])
    emb = _dense(emb, params["cond_feature_emb"])
    return jnp.repeat(emb, 2, axis=1)


def flow_matching_decode(cond_params, est_params, cfg: HeartCodecConfig,
                         codes, num_steps: int = 10,
                         guidance_scale: float = 1.25, key=None):
    """codes: [B, Q, T] -> latents [B, 2T, out_channels]
    (flow_matching.py inference_codes:57-135 + solve_euler, single
    segment, no incontext)."""
    mu = codes_to_cond(cond_params, cfg, codes)
    b, frames, _ = mu.shape
    key = key if key is not None else jax.random.key(0)
    x = jax.random.normal(key, (b, frames, cfg.out_channels),
                          jnp.float32)
    incontext = jnp.zeros_like(x)
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)

    def body(x, i):
        t = ts[i]
        dt = ts[i + 1] - ts[i]
        if guidance_scale > 1.0:
            xin = jnp.concatenate([
                jnp.concatenate([x, x], 0),
                jnp.concatenate([incontext, incontext], 0),
                jnp.concatenate([jnp.zeros_like(mu), mu], 0)], axis=2)
            v = flow_estimator_forward(est_params, cfg, xin,
                                       jnp.broadcast_to(t, (2 * b,)))
            v_un, v_c = v[:b], v[b:]
            v = v_un + guidance_scale * (v_c - v_un)
        else:
            xin = jnp.concatenate([x, incontext, mu], axis=2)
            v = flow_estimator_forward(est_params, cfg, xin,
                                       jnp.broadcast_to(t, (b,)))
        return x + dt * v, None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    return x


# ---------------------------------------------------------------------------
# scalar codec decoder (sq_codec.py)
# ---------------------------------------------------------------------------

def _causal_conv1d(x, p, dilation=1):
    """x [B, T, C]; zero left pad dilation*(k-1) (sq_codec Conv1d)."""
    k = p["w"].shape[0]
    x = jnp.pad(x, ((0, 0), (dilation * (k - 1), 0), (0, 0)))
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"]


def _same_conv1d(x, p):
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"]


def _causal_tconv1d(x, p, stride):
    """Causal ConvTranspose1d (k = 2*stride, padding 0, crop `stride`
    from the right -> exactly T*stride outputs, sq_codec.py
    ConvTranspose1d:113).  w pre-flipped [k, cin, cout]."""
    k = p["w"].shape[0]
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1,), [(k - 1, k - 1)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    y = y + p["b"]
    return y[:, :x.shape[1] * stride]


def _prelu(x, a):
    return jnp.where(x >= 0, x, a * x)


def init_scalar_decoder(key, cfg: HeartCodecConfig = HeartCodecConfig(),
                        dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    ic = cfg.init_channel

    def conv(cin, cout, k):
        lim = math.sqrt(6.0 / (cin * k + cout))
        return {"w": jax.random.uniform(next(keys), (k, cin, cout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    def res_unit(c):
        return {"conv1": conv(c, c, cfg.res_kernel_size),
                "conv2": conv(c, c, 1),
                "a1": jnp.full((1,), 0.25, jnp.float32),
                "a2": jnp.full((1,), 0.25, jnp.float32)}

    n_up = len(cfg.upsample_factors)
    blocks = []
    for i, f in enumerate(cfg.upsample_factors):
        cin = ic * 2 ** (n_up - i)
        cout = ic * 2 ** (n_up - i - 1)
        blocks.append({
            "up": conv(cin, cout, cfg.upsample_kernel_sizes[i]),
            "up_a": jnp.full((1,), 0.25, jnp.float32),
            "res": [res_unit(cout) for _ in range(5)],
        })
    return {
        "conv_in": conv(cfg.latent_hidden_dim, ic * 2 ** n_up,
                        cfg.delay_kernel_size),
        "blocks": blocks,
        "post": {"conv": conv(ic, ic, cfg.default_kernel_size),
                 "a": jnp.full((1,), 0.25, jnp.float32)},
        "conv_out": conv(ic, 1, cfg.default_kernel_size),
    }


def scalar_decode(params, cfg: HeartCodecConfig, latent):
    """latent: [B, T, latent_hidden_dim] -> waveform [B, T * 960 *
    num_samples / num_samples...] mono float (ScalarModel.decode:521)."""
    x = jnp.round(9.0 * latent) / 9.0
    # decoder conv_in is NON-causal (delay kernel, sq_codec.py:533)
    x = _same_conv1d(x, params["conv_in"])
    for i, bp in enumerate(params["blocks"]):
        stride = cfg.upsample_factors[i]
        x = _causal_tconv1d(x, bp["up"], stride)
        x = _prelu(x, bp["up_a"])
        for j, rp in enumerate(bp["res"]):
            y = _prelu(_causal_conv1d(x, rp["conv1"],
                                      dilation=(1, 3, 5, 7, 9)[j]),
                       rp["a1"])
            y = _prelu(_causal_conv1d(y, rp["conv2"]), rp["a2"])
            x = x + y
    # PostProcessor: 2x nearest repeat + conv (sq_codec.py:133-146)
    b, t, c = x.shape
    x = jnp.repeat(x, cfg.num_samples, axis=1)
    x = _prelu(_causal_conv1d(x, params["post"]["conv"]),
               params["post"]["a"])
    x = _causal_conv1d(x, params["conv_out"])
    return x[..., 0]


def heartcodec_decode(cond_params, est_params, dec_params,
                      cfg: HeartCodecConfig, codes, num_steps: int = 10,
                      guidance_scale: float = 1.25, key=None):
    """codes [B, Q, T] -> stereo waveform [2, samples] (the 256-d latent
    splits into two 128-d channel halves, modeling_heartcodec.py:
    166-178)."""
    lat = flow_matching_decode(cond_params, est_params, cfg, codes,
                               num_steps, guidance_scale, key)
    b, t, c = lat.shape
    lat = lat.reshape(b, t, 2, c // 2).transpose(0, 2, 1, 3)
    lat = lat.reshape(b * 2, t, c // 2)
    wave = scalar_decode(dec_params, cfg, lat)
    return wave.reshape(b, 2, -1)[0]


# ---------------------------------------------------------------------------
# loaders
# ---------------------------------------------------------------------------

def _wn_fuse(sd, prefix):
    """Fuse weight-norm g/v pairs for torch Conv1d/ConvTranspose1d
    weights; returns the fused torch-layout weight array."""
    for gk, vk in ((f"{prefix}.weight_g", f"{prefix}.weight_v"),
                   (f"{prefix}.parametrizations.weight.original0",
                    f"{prefix}.parametrizations.weight.original1")):
        if gk in sd:
            g = np.asarray(sd.pop(gk), np.float32)
            v = np.asarray(sd.pop(vk), np.float32)
            norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            return g * v / np.maximum(norm, 1e-12)
    return np.asarray(sd.pop(f"{prefix}.weight"), np.float32)


def load_heartcodec_params(sd: Dict[str, np.ndarray],
                           cfg: HeartCodecConfig = HeartCodecConfig(),
                           dtype=jnp.float32):
    """HeartCodec safetensors: flow_matching.* + scalar_model.*"""
    sd = dict(sd)

    def lin(name, bias=True):
        p = {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                         np.float32).T).astype(dtype)}
        if bias and f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))
        return p

    def proj(name):
        w = np.asarray(sd.pop(f"{name}.ffn_1.weight"), np.float32)
        return {"conv": {"w": jnp.asarray(w.transpose(2, 1, 0)),
                         "b": jnp.asarray(np.asarray(
                             sd.pop(f"{name}.ffn_1.bias"), np.float32))},
                "lin": lin(f"{name}.ffn_2"), "k": w.shape[2]}

    fm = "flow_matching"
    cbs = []
    for i in range(cfg.num_quantizers):
        for cand in (f"{fm}.vq_embed.layers.{i}._codebook.embed",
                     f"{fm}.vq_embed.layers.{i}._codebook.embed_avg"):
            if cand in sd:
                cb = np.asarray(sd.pop(cand), np.float32)
                break
        cbs.append(cb.reshape(cfg.codebook_size, cfg.codebook_dim))
    sd = {k: v for k, v in sd.items()
          if not k.startswith(f"{fm}.vq_embed.")
          or k == f"{fm}.vq_embed.project_out.weight"
          or k == f"{fm}.vq_embed.project_out.bias"}
    cond = {"codebooks": jnp.stack([jnp.asarray(c) for c in cbs]),
            "project_out": lin(f"{fm}.vq_embed.project_out"),
            "cond_feature_emb": lin(f"{fm}.cond_feature_emb"),
            "zero_cond_embedding1": jnp.asarray(np.asarray(
                sd.pop(f"{fm}.zero_cond_embedding1"), np.float32))}

    def block(pre):
        return {
            "attn_norm": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.attn_norm.weight"), np.float32)),
            "q": lin(f"{pre}.attn.q_proj", bias=False),
            "k": lin(f"{pre}.attn.k_proj", bias=False),
            "v": lin(f"{pre}.attn.v_proj", bias=False),
            "o": lin(f"{pre}.attn.o_proj", bias=False),
            "mlp_norm": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.mlp_norm.weight"), np.float32)),
            "gate": lin(f"{pre}.mlp.gate", bias=False),
            "up": lin(f"{pre}.mlp.up", bias=False),
            "down": lin(f"{pre}.mlp.down", bias=False),
            "scale_shift_table": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.scale_shift_table"), np.float32)),
        }

    def ada(pre):
        return {"emb1": lin(f"{pre}.emb.timestep_embedder.linear_1"),
                "emb2": lin(f"{pre}.emb.timestep_embedder.linear_2"),
                "linear": lin(f"{pre}.linear")}

    est_pre = f"{fm}.estimator"
    est = {
        "proj_in": proj(f"{est_pre}.proj_in"),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *[
            block(f"{est_pre}.transformer_blocks.{i}")
            for i in range(cfg.num_layers)]),
        "blocks_2": jax.tree.map(lambda *xs: jnp.stack(xs), *[
            block(f"{est_pre}.transformer_blocks_2.{i}")
            for i in range(cfg.num_layers_2)]),
        "connection_proj": proj(f"{est_pre}.connection_proj"),
        "scale_shift_table": jnp.asarray(np.asarray(
            sd.pop(f"{est_pre}.scale_shift_table"), np.float32)),
        "scale_shift_table_2": jnp.asarray(np.asarray(
            sd.pop(f"{est_pre}.scale_shift_table_2"), np.float32)),
        "proj_out": proj(f"{est_pre}.proj_out"),
        "adaln_single": ada(f"{est_pre}.adaln_single"),
        "adaln_single_2": ada(f"{est_pre}.adaln_single_2"),
    }

    sm = "scalar_model"
    n_up = len(cfg.upsample_factors)

    def wn_conv(prefix):
        w = _wn_fuse(sd, prefix)
        return {"w": jnp.asarray(w.transpose(2, 1, 0)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{prefix}.bias"),
                                            np.float32))}

    def wn_tconv(prefix):
        w = _wn_fuse(sd, prefix)        # [in, out, k]
        return {"w": jnp.asarray(
                    np.ascontiguousarray(w.transpose(2, 0, 1)[::-1])),
                "b": jnp.asarray(np.asarray(sd.pop(f"{prefix}.bias"),
                                            np.float32))}

    def prelu(prefix):
        return jnp.asarray(np.asarray(sd.pop(f"{prefix}.weight"),
                                      np.float32))

    blocks = []
    for i in range(n_up):
        pre = f"{sm}.decoder.{i + 1}"
        res = []
        for j in range(5):
            res.append({
                "conv1": wn_conv(f"{pre}.convs.{j}.conv1"),
                "conv2": wn_conv(f"{pre}.convs.{j}.conv2"),
                "a1": prelu(f"{pre}.convs.{j}.activation1"),
                "a2": prelu(f"{pre}.convs.{j}.activation2")})
        blocks.append({"up": wn_tconv(f"{pre}.up_conv.layer"),
                       "up_a": prelu(f"{pre}.up_conv.activation"),
                       "res": res})
    dec = {
        "conv_in": wn_conv(f"{sm}.decoder.0"),
        "blocks": blocks,
        "post": {"conv": wn_conv(f"{sm}.decoder.{n_up + 1}.conv"),
                 "a": prelu(f"{sm}.decoder.{n_up + 1}.activation")},
        "conv_out": wn_conv(f"{sm}.decoder.{n_up + 2}"),
    }
    leftover = [k for k in sd if not k.startswith(f"{sm}.encoder")
                and not k.startswith(f"{fm}.vq_embed.")]
    return cond, est, dec, sorted(leftover)
