"""FLUX.1 rectified-flow image DiT (schnell/dev), TPU-native.

Functional re-implementation of the reference Flux transformer
(/root/reference/models/flux/model.py:57, modules/layers.py): double-stream
(img/txt) MMDiT blocks followed by single-stream blocks, joint attention with
multi-axis RoPE over (index, y, x) ids (axes_dim [16,56,56], theta 10000,
math.py:88), adaLN modulation from time (+guidance for dev) + CLIP-pooled
vector, and a final adaLN linear head.

TPU-first: double and single blocks are each one `lax.scan` over stacked
params; qkv stays fused; RoPE tables are compact [L, D/2] cos/sin consumed by
the shared `apply_rope` (interleaved-pair convention, same as the reference's
2x2 rotation matrices).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm
from ...ops.rope import apply_rope


@dataclasses.dataclass(frozen=True)
class FluxConfig:
    """flux-schnell/dev (reference models/flux/util.py:474-504); flux2=True
    switches to the FLUX.2 variants (util.py:298-405: bias-free linears,
    SwiGLU MLPs with linear1 ratio 6 -> gated hidden ratio 3, SHARED
    global modulation instead of per-block tables, no CLIP vector, 4-axis
    rope (t, h, w, l) with theta 2000)."""
    in_channels: int = 64
    out_channels: int = 64
    vec_in_dim: int = 768
    context_in_dim: int = 4096
    hidden_size: int = 3072
    mlp_ratio: float = 4.0
    num_heads: int = 24
    depth: int = 19
    depth_single_blocks: int = 38
    axes_dim: Sequence[int] = (16, 56, 56)
    theta: int = 10000
    qkv_bias: bool = True
    guidance_embed: bool = False
    flux2: bool = False
    # Chroma (model.py:129-135, 413-423): per-block modulation rows
    # produced by a distilled-guidance MLP instead of per-block tables
    chroma: bool = False
    # Chroma-Radiance pixel-space head (radiance.py; util.py:537-560)
    radiance: bool = False
    radiance_patch_size: int = 16
    # flux2 SwiGLU ratios (util.py:344-348)
    linear1_mlp_ratio: float = 6.0
    compute_dtype: Any = jnp.bfloat16

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads

    @property
    def mlp_hidden(self):
        return int(self.hidden_size * self.mlp_ratio)

    @property
    def lin1_mlp(self):
        """single/double linear1 mlp width (gated: acts to lin1_mlp/2)."""
        return int(self.hidden_size * (self.linear1_mlp_ratio
                                       if self.flux2 else self.mlp_ratio))


# FLUX.2 Klein architecture constants (util.py:334-405)
FLUX2_KLEIN_4B = dict(in_channels=128, out_channels=128, vec_in_dim=1,
                      context_in_dim=7680, hidden_size=3072, mlp_ratio=3.0,
                      num_heads=24, depth=5, depth_single_blocks=20,
                      axes_dim=(32, 32, 32, 32), theta=2000,
                      qkv_bias=False, guidance_embed=False, flux2=True)
FLUX2_KLEIN_9B = dict(in_channels=128, out_channels=128, vec_in_dim=1,
                      context_in_dim=12288, hidden_size=4096, mlp_ratio=3.0,
                      num_heads=32, depth=8, depth_single_blocks=24,
                      axes_dim=(32, 32, 32, 32), theta=2000,
                      qkv_bias=False, guidance_embed=False, flux2=True)
FLUX2_DEV = dict(in_channels=128, out_channels=128, vec_in_dim=1,
                 context_in_dim=15360, hidden_size=6144, mlp_ratio=3.0,
                 num_heads=48, depth=8, depth_single_blocks=48,
                 axes_dim=(32, 32, 32, 32), theta=2000,
                 qkv_bias=False, guidance_embed=True, flux2=True)
# Chroma 8.9B: schnell geometry with the modulation stack distilled into
# a 5-layer guidance MLP, T5-only text (flux_handler.py:75-88)
CHROMA = dict(chroma=True, guidance_embed=False)
# Chroma1-Radiance (util.py:537-560): pixel-space, 3-ch patches of 16
CHROMA_RADIANCE = dict(chroma=True, guidance_embed=False, radiance=True,
                       in_channels=768, out_channels=3,
                       depth_single_blocks=38)


def rope_from_ids(ids, axes_dim, theta):
    """ids: [L, n_axes] float/int positions -> (cos, sin) [L, sum(axes)/2].

    Per-axis 1D RoPE tables concatenated along features (math.py:88 +
    EmbedND layers.py:36)."""
    ids = np.asarray(ids, dtype=np.float64)
    parts = []
    for i, dim in enumerate(axes_dim):
        omega = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
        parts.append(np.outer(ids[:, i], omega))
    ang = np.concatenate(parts, axis=-1)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def make_img_ids(h_tok: int, w_tok: int, index: int = 0) -> np.ndarray:
    """[h*w, 3] ids = (index, y, x) (reference sampling.py prepare)."""
    ids = np.zeros((h_tok, w_tok, 3), dtype=np.float64)
    ids[..., 0] = index
    ids[..., 1] = np.arange(h_tok)[:, None]
    ids[..., 2] = np.arange(w_tok)[None, :]
    return ids.reshape(-1, 3)


def timestep_embedding(t, dim: int, max_period: float = 10000.0,
                       time_factor: float = 1000.0):
    """layers.py:68 — freqs exp(-ln(P)*i/half), emb = cat([cos, sin])."""
    half = dim // 2
    t = t.astype(jnp.float32) * time_factor
    freqs = jnp.exp(-math.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _linear(key, d_in, d_out, dtype, bias=True):
    limit = math.sqrt(6.0 / (d_in + d_out))
    p = {"w": jax.random.uniform(key, (d_in, d_out), jnp.float32,
                                 -limit, limit).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _mlp_embedder(key, d_in, d_hidden, dtype):
    k1, k2 = jax.random.split(key)
    return {"in": _linear(k1, d_in, d_hidden, dtype),
            "out": _linear(k2, d_hidden, d_hidden, dtype)}


def init_flux(key, cfg: FluxConfig, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 16))
    h = cfg.hidden_size
    hd = cfg.head_dim
    f2 = cfg.flux2
    bias = not f2
    mlp2_in = cfg.lin1_mlp // 2 if f2 else cfg.mlp_hidden

    def mlp_embedder(key, d_in):
        k1, k2 = jax.random.split(key)
        return {"in": _linear(k1, d_in, h, jnp.float32, bias=bias),
                "out": _linear(k2, h, h, jnp.float32, bias=bias)}

    def stack(fn, n):
        ks = jax.random.split(next(keys), n)
        leaves = [fn(k) for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    def stream(key):
        ks = iter(jax.random.split(key, 8))
        p = {
            "qkv": _linear(next(ks), h, 3 * h, dtype, bias=cfg.qkv_bias),
            "norm_q": jnp.ones((hd,), jnp.float32),
            "norm_k": jnp.ones((hd,), jnp.float32),
            "proj": _linear(next(ks), h, h, dtype, bias=bias),
            "mlp1": _linear(next(ks), h, cfg.lin1_mlp, dtype, bias=bias),
            "mlp2": _linear(next(ks), mlp2_in, h, dtype, bias=bias),
        }
        if not f2 and not cfg.chroma:
            p["mod"] = _linear(next(ks), h, 6 * h, dtype)
        return p

    def double_block(key):
        k1, k2 = jax.random.split(key)
        return {"img": stream(k1), "txt": stream(k2)}

    def single_block(key):
        ks = iter(jax.random.split(key, 4))
        p = {
            "linear1": _linear(next(ks), h, 3 * h + cfg.lin1_mlp, dtype,
                               bias=bias),
            "linear2": _linear(next(ks), h + mlp2_in, h, dtype, bias=bias),
            "norm_q": jnp.ones((hd,), jnp.float32),
            "norm_k": jnp.ones((hd,), jnp.float32),
        }
        if not f2 and not cfg.chroma:
            p["mod"] = _linear(next(ks), h, 3 * h, dtype)
        return p

    params = {
        "img_in": _linear(next(keys), cfg.in_channels, h, dtype, bias=bias),
        "txt_in": _linear(next(keys), cfg.context_in_dim, h, dtype,
                          bias=bias),
        "time_in": mlp_embedder(next(keys), 256),
        "double_blocks": stack(double_block, cfg.depth),
        "single_blocks": stack(single_block, cfg.depth_single_blocks),
        "final": {
            "mod": _linear(next(keys), h, 2 * h, jnp.float32, bias=bias),
            "linear": _linear(next(keys), h, cfg.out_channels, jnp.float32,
                              bias=bias),
        },
    }
    if f2:
        # shared global modulation (model.py:125-128)
        params["mod_double_img"] = _linear(next(keys), h, 6 * h,
                                           jnp.float32, bias=False)
        params["mod_double_txt"] = _linear(next(keys), h, 6 * h,
                                           jnp.float32, bias=False)
        params["mod_single"] = _linear(next(keys), h, 3 * h, jnp.float32,
                                       bias=False)
    elif cfg.chroma:
        # DistilledGuidance (layers.py:447-464): in 64 -> 5120, 5
        # residual RMSNorm+MLPEmbedder layers, out 3072
        ks = iter(jax.random.split(next(keys), 16))
        params.pop("time_in")
        params["distilled_guidance"] = {
            "in_proj": _linear(next(ks), 64, 5120, jnp.float32),
            "layers": [{"in": _linear(next(ks), 5120, 5120, jnp.float32),
                        "out": _linear(next(ks), 5120, 5120,
                                       jnp.float32),
                        "norm": jnp.ones((5120,), jnp.float32)}
                       for _ in range(5)],
            "out_proj": _linear(next(ks), 5120, h, jnp.float32),
        }
        params["final"].pop("mod")   # final shift/scale come from rows
    else:
        params["vector_in"] = mlp_embedder(next(keys), cfg.vec_in_dim)
    if cfg.guidance_embed:
        params["guidance_in"] = mlp_embedder(next(keys), 256)
    if cfg.radiance:
        from .radiance import RadianceConfig, init_radiance
        params["radiance"] = init_radiance(
            next(keys), RadianceConfig(
                patch_size=cfg.radiance_patch_size,
                model_hidden=h, out_channels=cfg.out_channels))
        params.pop("img_in", None)
    return params


def chroma_modulations(params, cfg: FluxConfig, t):
    """Distilled modulation table (model.py:413-423): rows =
    3*single + 6*double (img) + 6*double (txt) + 2 (final), each row
    keyed by (timestep emb16 || zero-guidance emb16 || row-index emb32).
    Returns (singles [S, B, 3, h], d_img [D, B, 6, h],
    d_txt [D, B, 6, h], final [B, 2, h])."""
    s_cnt, d_cnt = cfg.depth_single_blocks, cfg.depth
    n_idx = 3 * s_cnt + 12 * d_cnt + 2
    b = t.shape[0]
    dt = timestep_embedding(t, 16)
    dg = timestep_embedding(jnp.zeros_like(t), 16)
    idx = timestep_embedding(jnp.arange(n_idx, dtype=jnp.float32), 32,
                             time_factor=1.0)
    tg = jnp.concatenate([dt, dg], axis=-1)          # [B, 32]
    inp = jnp.concatenate(
        [jnp.broadcast_to(tg[:, None], (b, n_idx, 32)),
         jnp.broadcast_to(idx[None], (b, n_idx, 32))], axis=-1)
    dgp = params["distilled_guidance"]
    x = _dense(inp, dgp["in_proj"], jnp.float32)
    for lp in dgp["layers"]:
        x32 = x.astype(jnp.float32)
        nrm = x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, -1, keepdims=True) + 1e-6) * lp["norm"]
        x = x + _dense(jax.nn.silu(_dense(nrm, lp["in"], jnp.float32)),
                       lp["out"], jnp.float32)
    mv = _dense(x, dgp["out_proj"], jnp.float32)     # [B, n_idx, h]
    h = mv.shape[-1]
    singles = mv[:, :3 * s_cnt].reshape(b, s_cnt, 3, h).transpose(
        1, 0, 2, 3)
    o = 3 * s_cnt
    d_img = mv[:, o:o + 6 * d_cnt].reshape(b, d_cnt, 6, h).transpose(
        1, 0, 2, 3)
    o += 6 * d_cnt
    d_txt = mv[:, o:o + 6 * d_cnt].reshape(b, d_cnt, 6, h).transpose(
        1, 0, 2, 3)
    return singles, d_img, d_txt, mv[:, -2:]


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _dense(x, p, dtype=None):
    dtype = dtype or x.dtype
    if "w_q" in p or "w_q4" in p:  # int8/int4 -> Pallas dequant-fused matmul
        from ...ops.quant import dense_quant
        return dense_quant(x, p, dtype)
    y = jnp.dot(x.astype(dtype), p["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    if "b" in p:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def _embed(p, x):
    h = _dense(x, p["in"], jnp.float32)
    return _dense(jax.nn.silu(h), p["out"], jnp.float32)


def _qk_headnorm(x, w, eps=1e-6):
    return rms_norm(x, w, eps)


def _heads(x, n):
    b, l, d = x.shape
    return x.reshape(b, l, n, d // n)


def _stream_qkv(p, x, cfg):
    cdt = cfg.compute_dtype
    if "qkv" in p:
        qkv = _dense(x.astype(cdt), p["qkv"], cdt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        # unfused tensor-parallel layout (parallel/sharding.py
        # unfuse_fused_linears): per-head column splits align with 'tp'
        xc = x.astype(cdt)
        q = _dense(xc, p["q"], cdt)
        k = _dense(xc, p["k"], cdt)
        v = _dense(xc, p["v"], cdt)
    q = _heads(q, cfg.num_heads)
    k = _heads(k, cfg.num_heads)
    v = _heads(v, cfg.num_heads)
    q = _qk_headnorm(q, p["norm_q"])
    k = _qk_headnorm(k, p["norm_k"])
    return q, k, v


def _mod6(p, vec):
    m = _dense(jax.nn.silu(vec.astype(jnp.float32)), p["mod"], jnp.float32)
    return jnp.split(m[:, None, :], 6, axis=-1)  # each [B,1,h]


def _mlp_act(y, cfg):
    """FLUX.1: gelu(tanh); FLUX.2: SwiGLU gate (layers.py SiLUActivation:
    silu(x1) * x2 over the split halves)."""
    if cfg.flux2:
        x1, x2 = jnp.split(y.astype(jnp.float32), 2, axis=-1)
        return (jax.nn.silu(x1) * x2).astype(y.dtype)
    return jax.nn.gelu(y.astype(jnp.float32),
                       approximate=True).astype(y.dtype)


def _stream_mlp_in(p, y, cfg):
    """mlp1 + activation, supporting the unfused SwiGLU layout where the
    gate/value halves are separate column-parallel linears (their halves
    stay aligned with the 'tp' shards — a fused [.., 2M] column split
    would cross the gate/value boundary)."""
    cdt = cfg.compute_dtype
    if "mlp1" in p:
        return _mlp_act(_dense(y.astype(cdt), p["mlp1"], cdt), cfg)
    g = _dense(y.astype(cdt), p["mlp_gate"], cdt)
    v = _dense(y.astype(cdt), p["mlp_val"], cdt)
    return (jax.nn.silu(g.astype(jnp.float32))
            * v.astype(jnp.float32)).astype(cdt)


def _double_block(bp, img, txt, vec, cos, sin, txt_len, cfg, attn_backend,
                  mods=None):
    cdt = cfg.compute_dtype
    if mods is not None:          # flux2 shared modulation
        (i_shift, i_scale, i_gate, i_shift2, i_scale2, i_gate2,
         t_shift, t_scale, t_gate, t_shift2, t_scale2, t_gate2) = mods
    else:
        (i_shift, i_scale, i_gate,
         i_shift2, i_scale2, i_gate2) = _mod6(bp["img"], vec)
        (t_shift, t_scale, t_gate,
         t_shift2, t_scale2, t_gate2) = _mod6(bp["txt"], vec)

    img_mod = layer_norm(img) * (1 + i_scale) + i_shift
    txt_mod = layer_norm(txt) * (1 + t_scale) + t_shift
    iq, ik, iv = _stream_qkv(bp["img"], img_mod, cfg)
    tq, tk, tv = _stream_qkv(bp["txt"], txt_mod, cfg)

    q = jnp.concatenate([tq, iq], axis=1)
    k = jnp.concatenate([tk, ik], axis=1)
    v = jnp.concatenate([tv, iv], axis=1)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, backend=attn_backend)
    attn = attn.reshape(*attn.shape[:2], cfg.hidden_size)
    txt_attn, img_attn = attn[:, :txt_len], attn[:, txt_len:]

    img = img + i_gate * _dense(img_attn, bp["img"]["proj"], cdt).astype(jnp.float32)
    y = layer_norm(img) * (1 + i_scale2) + i_shift2
    y = _stream_mlp_in(bp["img"], y, cfg)
    img = img + i_gate2 * _dense(y, bp["img"]["mlp2"], cdt).astype(jnp.float32)

    txt = txt + t_gate * _dense(txt_attn, bp["txt"]["proj"], cdt).astype(jnp.float32)
    y = layer_norm(txt) * (1 + t_scale2) + t_shift2
    y = _stream_mlp_in(bp["txt"], y, cfg)
    txt = txt + t_gate2 * _dense(y, bp["txt"]["mlp2"], cdt).astype(jnp.float32)
    return img, txt


def _single_block(bp, x, vec, cos, sin, cfg, attn_backend, mods=None):
    cdt = cfg.compute_dtype
    if mods is not None:          # flux2 shared modulation
        shift, scale, gate = mods
    else:
        m = _dense(jax.nn.silu(vec.astype(jnp.float32)), bp["mod"],
                   jnp.float32)
        shift, scale, gate = jnp.split(m[:, None, :], 3, axis=-1)
    x_mod = layer_norm(x) * (1 + scale) + shift
    xc = x_mod.astype(cdt)
    if "linear1" in bp:
        h1 = _dense(xc, bp["linear1"], cdt)
        qkv = h1[..., :3 * cfg.hidden_size]
        mlp = h1[..., 3 * cfg.hidden_size:]
        q, k, v = (_heads(t, cfg.num_heads)
                   for t in jnp.split(qkv, 3, axis=-1))
        act = _mlp_act(mlp, cfg).astype(cdt)
    else:
        # unfused tensor-parallel layout (unfuse_fused_linears)
        q = _heads(_dense(xc, bp["l1_q"], cdt), cfg.num_heads)
        k = _heads(_dense(xc, bp["l1_k"], cdt), cfg.num_heads)
        v = _heads(_dense(xc, bp["l1_v"], cdt), cfg.num_heads)
        if cfg.flux2:
            g = _dense(xc, bp["l1_mlp_gate"], cdt)
            val = _dense(xc, bp["l1_mlp_val"], cdt)
            act = (jax.nn.silu(g.astype(jnp.float32))
                   * val.astype(jnp.float32)).astype(cdt)
        else:
            act = _mlp_act(_dense(xc, bp["l1_mlp"], cdt), cfg).astype(cdt)
    q = _qk_headnorm(q, bp["norm_q"])
    k = _qk_headnorm(k, bp["norm_k"])
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    attn = attention(q, k, v, backend=attn_backend)
    attn = attn.reshape(*x.shape[:2], cfg.hidden_size)
    if "linear1" in bp:
        out = _dense(jnp.concatenate([attn, act], axis=-1),
                     bp["linear2"], cdt)
    else:
        # summed row-parallel halves (bias lives on l2_attn)
        out = (_dense(attn, bp["l2_attn"], cdt).astype(jnp.float32)
               + _dense(act, bp["l2_mlp"], cdt).astype(jnp.float32)
               ).astype(cdt)
    return x + gate * out.astype(jnp.float32)


def flux_forward(params, cfg: FluxConfig, img, txt, vec_y, t,
                 rope_cos, rope_sin, guidance=None,
                 attn_backend: str = "auto", style_tokens=None,
                 radiance_grid_hw=None, piflow_heads=None):
    """img: [B, L_img, in_channels] packed 2x2 latent patches;
    txt: [B, L_txt, context_in_dim]; vec_y: [B, vec_in_dim] CLIP pooled;
    t: [B] in [0, 1]; rope tables cover (style+)txt+img sequence.
    style_tokens: optional USO SigLIP style features [B, L_s,
    hidden_size] PREPENDED to the text stream with zero position ids
    (model.py:434-436; the caller's rope must include those rows).
    Returns [B, L_img, out_channels] velocity (fp32)."""
    cdt = cfg.compute_dtype
    txt_len = txt.shape[1]
    if style_tokens is not None:
        txt_len += style_tokens.shape[1]

    if cfg.chroma:
        vec = jnp.zeros((img.shape[0], cfg.hidden_size), jnp.float32)
        ch_s, ch_di, ch_dt, ch_final = chroma_modulations(params, cfg, t)
    else:
        vec = _embed(params["time_in"], timestep_embedding(t, 256))
        if cfg.guidance_embed:
            assert guidance is not None
            vec = vec + _embed(params["guidance_in"],
                               timestep_embedding(guidance, 256))
        if not cfg.flux2:
            vec = vec + _embed(params["vector_in"],
                               vec_y.astype(jnp.float32))

    base_tokens = None
    if cfg.radiance and "radiance" in params:
        # pixel tokens through the radiance patchifier
        # (model.py:391-407); the final head needs the raw pixels back
        from .radiance import RadianceConfig, radiance_embed_tokens
        base_tokens = img
        rcfg = RadianceConfig(patch_size=cfg.radiance_patch_size,
                              model_hidden=cfg.hidden_size,
                              out_channels=cfg.out_channels)
        img = radiance_embed_tokens(params["radiance"], rcfg,
                                    img).astype(jnp.float32)
    else:
        img = _dense(img.astype(cdt), params["img_in"],
                     cdt).astype(jnp.float32)
    txt = _dense(txt.astype(cdt), params["txt_in"], cdt).astype(jnp.float32)
    if style_tokens is not None:
        txt = jnp.concatenate(
            [style_tokens.astype(jnp.float32), txt], axis=1)

    # flux2: the modulation is computed ONCE and shared by every block
    # (model.py:441-460 double_stream_modulation_* / single_stream_mod)
    dmods = smods = None
    if cfg.flux2:
        sv = jax.nn.silu(vec.astype(jnp.float32))
        mi = jnp.split(_dense(sv, params["mod_double_img"],
                              jnp.float32)[:, None], 6, axis=-1)
        mt = jnp.split(_dense(sv, params["mod_double_txt"],
                              jnp.float32)[:, None], 6, axis=-1)
        dmods = tuple(mi) + tuple(mt)
        smods = tuple(jnp.split(_dense(sv, params["mod_single"],
                                       jnp.float32)[:, None], 3, axis=-1))

    if cfg.chroma:
        # per-block distilled modulation rows scanned alongside the
        # blocks (model.py:446-449, 467-469)
        def dbody_ch(carry, xs):
            img, txt = carry
            bp, mi, mt = xs
            mods = tuple(mi[:, i][:, None] for i in range(6)) \
                + tuple(mt[:, i][:, None] for i in range(6))
            img, txt = _double_block(bp, img, txt, vec, rope_cos,
                                     rope_sin, txt_len, cfg,
                                     attn_backend, mods=mods)
            return (img, txt), None

        (img, txt), _ = jax.lax.scan(
            dbody_ch, (img, txt), (params["double_blocks"], ch_di, ch_dt))
        x = jnp.concatenate([txt, img], axis=1)

        def sbody_ch(x, xs):
            bp, sm = xs
            mods = tuple(sm[:, i][:, None] for i in range(3))
            return _single_block(bp, x, vec, rope_cos, rope_sin, cfg,
                                 attn_backend, mods=mods), None

        x, _ = jax.lax.scan(sbody_ch, x,
                            (params["single_blocks"], ch_s))
        x = x[:, txt_len:]
        if base_tokens is not None:
            from .radiance import RadianceConfig, apply_radiance_head
            rcfg = RadianceConfig(patch_size=cfg.radiance_patch_size,
                                  model_hidden=cfg.hidden_size,
                                  out_channels=cfg.out_channels)
            return apply_radiance_head(params["radiance"], rcfg, x,
                                       base_tokens, radiance_grid_hw)
        shift = ch_final[:, 0][:, None]
        scale = ch_final[:, 1][:, None]
        x = layer_norm(x) * (1 + scale) + shift
        return _dense(x, params["final"]["linear"], jnp.float32)

    def dbody(carry, bp):
        img, txt = carry
        img, txt = _double_block(bp, img, txt, vec, rope_cos, rope_sin,
                                 txt_len, cfg, attn_backend, mods=dmods)
        return (img, txt), None

    (img, txt), _ = jax.lax.scan(dbody, (img, txt), params["double_blocks"])

    x = jnp.concatenate([txt, img], axis=1)

    def sbody(x, bp):
        return _single_block(bp, x, vec, rope_cos, rope_sin, cfg,
                             attn_backend, mods=smods), None

    x, _ = jax.lax.scan(sbody, x, params["single_blocks"])
    x = x[:, txt_len:]

    fm = _dense(jax.nn.silu(vec), params["final"]["mod"], jnp.float32)
    shift, scale = jnp.split(fm[:, None, :], 2, axis=-1)
    x = layer_norm(x) * (1 + scale) + shift
    if piflow_heads is not None:
        # pi-Flow GM velocity heads replace the final projection
        # (model.py:218-231 _apply_piflow_final_layer)
        from .piflow import piflow_project
        return piflow_project(piflow_heads, x, vec)
    return _dense(x, params["final"]["linear"], jnp.float32)


def pack_latent(x):
    """[B, C, H, W] -> [B, (H/2)(W/2), C*4] (reference sampling.py pack:
    rearrange 'b c (h ph) (w pw) -> b (h w) (c ph pw)')."""
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // 2, 2, w // 2, 2)
    x = x.transpose(0, 2, 4, 1, 3, 5)
    return x.reshape(b, (h // 2) * (w // 2), c * 4)


def unpack_latent(x, h: int, w: int):
    """Inverse of pack_latent: [B, L, C*4] -> [B, C, H, W]."""
    b, l, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h // 2, w // 2, c, 2, 2)
    x = x.transpose(0, 3, 1, 4, 2, 5)
    return x.reshape(b, c, h, w)


def make_ids_flux2(h_tok: int, w_tok: int, txt_len: int,
                   t_img: int = 0, t_txt: int = 0) -> np.ndarray:
    """FLUX.2 4-axis ids (t, h, w, l) for the concatenated [txt, img]
    sequence (flux2_adapter.py prc_txt:170 / prc_img:182: text uses the
    l axis, image uses h/w; t separates reference frames)."""
    txt_ids = np.zeros((txt_len, 4), np.float64)
    txt_ids[:, 0] = t_txt
    txt_ids[:, 3] = np.arange(txt_len)
    img_ids = np.zeros((h_tok, w_tok, 4), np.float64)
    img_ids[..., 0] = t_img
    img_ids[..., 1] = np.arange(h_tok)[:, None]
    img_ids[..., 2] = np.arange(w_tok)[None, :]
    return np.concatenate([txt_ids, img_ids.reshape(-1, 4)], axis=0)


def get_schedule_flux2(num_steps: int, image_seq_len: int) -> np.ndarray:
    """FLUX.2 empirical-mu shifted schedule (sampling.py:274-291,
    compute_empirical_mu:476-490)."""
    a1, b1 = 8.73809524e-05, 1.89833333
    a2, b2 = 0.00016927, 0.45666666
    if image_seq_len > 4300:
        mu = a2 * image_seq_len + b2
    else:
        m_200 = a2 * image_seq_len + b2
        m_10 = a1 * image_seq_len + b1
        a = (m_200 - m_10) / 190.0
        b = m_200 - 200.0 * a
        mu = a * num_steps + b
    t = np.linspace(1, 0, num_steps + 1)
    with np.errstate(divide="ignore"):
        out = math.exp(mu) / (math.exp(mu) + (1.0 / t - 1.0))
    out[-1] = 0.0
    return out
