"""LTX-2 joint audio+video transformer (LTXModel), TPU-native.

Functional re-implementation of /root/reference/models/ltx2/ltx_core/model/
transformer/model.py (LTXModel) + transformer.py (BasicAVTransformerBlock):
48 blocks, each with per-modality self-attention (RMSNorm-QK, fractional
RoPE), text cross-attention, bidirectional audio<->video cross-attention
(temporal RoPE, audio-sized heads), and GELU-tanh FFN — all modulated by
PixArt-style adaLN-single per-token timestep embeddings against per-block
scale_shift tables.

TPU-first: params stacked on a leading layer axis, the block loop is a
`lax.scan`; matmuls run bf16 on the MXU, residual/modulation math fp32;
RoPE/timestep tables are host-precomputed.

Config reference: models/ltx2/configs/ltx2_19b_config.json (19B: 48 layers,
video 4096 = 32 x 128, audio 2048 = 32 x 64, caption 3840, split rope) and
ltx2_22b_config.json (22B adds gated attention + cross-attention adaLN).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ...ops.attention import attention
from ...ops.norms import rms_norm, layer_norm
from .rope import apply_ltx_rope


@dataclasses.dataclass(frozen=True)
class LTX2Config:
    """Architecture hyperparameters (ltx2_19b_config.json transformer.*)."""
    num_layers: int = 48
    # video branch
    num_heads: int = 32
    head_dim: int = 128
    in_channels: int = 128
    out_channels: int = 128
    caption_dim: int = 3840
    # audio branch
    audio_num_heads: int = 32
    audio_head_dim: int = 64
    audio_in_channels: int = 128
    audio_out_channels: int = 128
    audio_cross_dim: int = 2048
    # shared
    eps: float = 1e-6
    rope_type: str = "split"
    rope_theta: float = 10000.0
    max_pos: tuple = (20.0, 2048.0, 2048.0)
    audio_max_pos: tuple = (20.0,)
    timestep_scale: float = 1000.0
    av_ca_timestep_scale: float = 1000.0
    # 22B extras (ltx2_22b_config.json)
    gated_attention: bool = False
    cross_attention_adaln: bool = False
    compute_dtype: Any = jnp.bfloat16
    residual_dtype: Any = jnp.float32

    @property
    def dim(self):
        return self.num_heads * self.head_dim

    @property
    def audio_dim(self):
        return self.audio_num_heads * self.audio_head_dim

    @property
    def n_ada(self):
        """adaLN params per block table (adaln.py:9-16)."""
        return 9 if self.cross_attention_adaln else 6


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _lin(key, d_in, d_out, dtype, bias=True):
    kw, _ = jax.random.split(key)
    lim = math.sqrt(6.0 / (d_in + d_out))
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32,
                                 -lim, lim).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((d_out,), dtype)
    return p


def _adaln_single_p(key, dim, coef, dtype=jnp.float32):
    """AdaLayerNormSingle: 256-dim sinusoid -> Linear(256,dim) -> silu ->
    Linear(dim,dim), then silu -> Linear(dim, coef*dim)."""
    ks = iter(jax.random.split(key, 4))
    return {
        "t1": _lin(next(ks), 256, dim, dtype),
        "t2": _lin(next(ks), dim, dim, dtype),
        "linear": _lin(next(ks), dim, coef * dim, dtype),
    }


def init_ltx2_dit(key, cfg: LTX2Config, dtype=jnp.bfloat16) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 4096))
    dv, da = cfg.dim, cfg.audio_dim

    def attn(d_q, d_kv, inner, heads, gated):
        p = {
            "to_q": _lin(next(keys), d_q, inner, dtype),
            "to_k": _lin(next(keys), d_kv, inner, dtype),
            "to_v": _lin(next(keys), d_kv, inner, dtype),
            "to_out": _lin(next(keys), inner, d_q, dtype),
            "q_norm": jnp.ones((inner,), jnp.float32),
            "k_norm": jnp.ones((inner,), jnp.float32),
        }
        if gated:
            p["to_gate_logits"] = _lin(next(keys), d_q, heads, dtype)
        return p

    def ff(d):
        return {"fc1": _lin(next(keys), d, 4 * d, dtype),
                "fc2": _lin(next(keys), 4 * d, d, dtype)}

    g = cfg.gated_attention

    def block():
        p = {
            "attn1": attn(dv, dv, dv, cfg.num_heads, g),
            "attn2": attn(dv, dv, dv, cfg.num_heads, g),
            "ff": ff(dv),
            "scale_shift_table": jax.random.normal(
                next(keys), (cfg.n_ada, dv), jnp.float32) / math.sqrt(dv),
            "audio_attn1": attn(da, da, da, cfg.audio_num_heads, g),
            "audio_attn2": attn(da, da, da, cfg.audio_num_heads, g),
            "audio_ff": ff(da),
            "audio_scale_shift_table": jax.random.normal(
                next(keys), (cfg.n_ada, da), jnp.float32) / math.sqrt(da),
            # a2v: q video, kv audio, audio-sized heads (transformer.py:121)
            "audio_to_video_attn": attn(dv, da, da, cfg.audio_num_heads, g),
            "video_to_audio_attn": attn(da, dv, da, cfg.audio_num_heads, g),
            "sst_av_audio": jax.random.normal(
                next(keys), (5, da), jnp.float32) / math.sqrt(da),
            "sst_av_video": jax.random.normal(
                next(keys), (5, dv), jnp.float32) / math.sqrt(dv),
        }
        if cfg.cross_attention_adaln:
            p["prompt_scale_shift_table"] = jax.random.normal(
                next(keys), (2, dv), jnp.float32) / math.sqrt(dv)
            p["audio_prompt_scale_shift_table"] = jax.random.normal(
                next(keys), (2, da), jnp.float32) / math.sqrt(da)
        return p

    def stack(fn, n):
        leaves = [fn() for _ in range(n)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    params = {
        "patchify_proj": _lin(next(keys), cfg.in_channels, dv, jnp.float32),
        "audio_patchify_proj": _lin(next(keys), cfg.audio_in_channels, da,
                                    jnp.float32),
        "caption_projection": {
            "linear_1": _lin(next(keys), cfg.caption_dim, dv, dtype),
            "linear_2": _lin(next(keys), dv, dv, dtype)},
        "audio_caption_projection": {
            "linear_1": _lin(next(keys), cfg.caption_dim, da, dtype),
            "linear_2": _lin(next(keys), da, da, dtype)},
        "adaln_single": _adaln_single_p(next(keys), dv, cfg.n_ada),
        "audio_adaln_single": _adaln_single_p(next(keys), da, cfg.n_ada),
        "av_ca_video_ss": _adaln_single_p(next(keys), dv, 4),
        "av_ca_audio_ss": _adaln_single_p(next(keys), da, 4),
        "av_ca_a2v_gate": _adaln_single_p(next(keys), dv, 1),
        "av_ca_v2a_gate": _adaln_single_p(next(keys), da, 1),
        "blocks": stack(block, cfg.num_layers),
        "scale_shift_table": jax.random.normal(
            next(keys), (2, dv), jnp.float32) / math.sqrt(dv),
        "audio_scale_shift_table": jax.random.normal(
            next(keys), (2, da), jnp.float32) / math.sqrt(da),
        "proj_out": _lin(next(keys), dv, cfg.out_channels, jnp.float32),
        "audio_proj_out": _lin(next(keys), da, cfg.audio_out_channels,
                               jnp.float32),
    }
    if cfg.cross_attention_adaln:
        params["prompt_adaln_single"] = _adaln_single_p(next(keys), dv, 2)
        params["audio_prompt_adaln_single"] = _adaln_single_p(
            next(keys), da, 2)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

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


def _sinusoid_256(t):
    """diffusers Timesteps(256, flip_sin_to_cos=True, shift=0): [cos, sin]
    order after flip; exponent base 10000^(i/128)."""
    half = 128
    t = t.astype(jnp.float32)
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def adaln_embed(p, t):
    """AdaLayerNormSingle.forward: returns (coef*dim mod vector, embedded
    timestep).  t: [...], any shape; output [..., coef*dim] fp32."""
    e = _sinusoid_256(t)
    e = _dense(e, p["t1"], jnp.float32)
    emb = _dense(jax.nn.silu(e), p["t2"], jnp.float32)
    mod = _dense(jax.nn.silu(emb), p["linear"], jnp.float32)
    return mod, emb


def _mod(x, scale, shift):
    """x [B, L, D] modulated by per-timestep-token scale/shift [B, Tm, D]
    (transformer.py _apply_scale_shift: tokens grouped per frame)."""
    b, l, d = x.shape
    tm = scale.shape[1]
    xr = x.reshape(b, tm, l // tm, d)
    out = xr * (1.0 + scale[:, :, None]) + shift[:, :, None]
    return out.reshape(b, l, d)


def _gate(x, gate):
    b, l, d = x.shape
    tm = gate.shape[1]
    xr = x.reshape(b, tm, l // tm, d)
    return (xr * gate[:, :, None]).reshape(b, l, d)


def _attention(p, x, context, heads, cfg, rope=None, k_rope=None,
               kv_mask=None, attn_backend="auto", extra_scale_shift=None,
               pair_mask=None):
    """One LTX Attention (attention.py:160): qk-RMSNorm on the flat inner
    dim, optional rope, optional per-head sigmoid gate.  pair_mask:
    optional [Lq, Lkv] bool (True = attend) for the JoyAI paired-memory
    a2v/v2a masks (helpers.py _build_paired_tail_cross_mask) — runs the
    dense XLA path with an additive bias."""
    cdt = cfg.compute_dtype
    xc = x.astype(cdt)
    ctx = context.astype(cdt)
    q = rms_norm(_dense(xc, p["to_q"], cdt), p["q_norm"], cfg.eps)
    k = rms_norm(_dense(ctx, p["to_k"], cdt), p["k_norm"], cfg.eps)
    v = _dense(ctx, p["to_v"], cdt)
    hd = q.shape[-1] // heads
    q = q.reshape(*q.shape[:2], heads, hd)
    k = k.reshape(*k.shape[:2], heads, hd)
    v = v.reshape(*v.shape[:2], heads, hd)
    if rope is not None:
        q = apply_ltx_rope(q, rope[0], rope[1], cfg.rope_type)
        kr = rope if k_rope is None else k_rope
        k = apply_ltx_rope(k, kr[0], kr[1], cfg.rope_type)
    if pair_mask is not None:
        sc = jnp.einsum("blnd,bsnd->bnls", q, k,
                        preferred_element_type=jnp.float32) \
            / math.sqrt(hd)
        sc = jnp.where(pair_mask[None, None], sc, -1e9)
        pr = jax.nn.softmax(sc, axis=-1).astype(q.dtype)
        o = jnp.einsum("bnls,bsnd->blnd", pr, v)
    else:
        o = attention(q, k, v, backend=attn_backend, kv_mask=kv_mask)
    if p.get("to_gate_logits") is not None:
        logits = _dense(xc, p["to_gate_logits"], cdt)
        gates = 2.0 * jax.nn.sigmoid(logits.astype(jnp.float32))
        o = o * gates.astype(o.dtype)[..., None]
    o = o.reshape(*x.shape[:2], -1)
    return _dense(o, p["to_out"], cdt)


def _text_cross(p_attn, sst, prompt_sst, x, context, context_mask, timestep,
                prompt_timestep, heads, cfg, attn_backend):
    """_apply_text_cross_attention (transformer.py:198): plain rms_norm
    query path, or cross-attention adaLN (22B) with q scale/shift/gate from
    table slots 6:9 and context scale/shift from the prompt table."""
    y = rms_norm(x.astype(jnp.float32), eps=cfg.eps)
    if not cfg.cross_attention_adaln:
        return _attention(p_attn, y, context, heads, cfg,
                          kv_mask=context_mask, attn_backend=attn_backend)
    n = cfg.n_ada
    b = x.shape[0]
    tm = timestep.shape[1]
    tt = timestep.reshape(b, tm, n, -1)
    q_shift = sst[None, None, 6] + tt[:, :, 6]
    q_scale = sst[None, None, 7] + tt[:, :, 7]
    q_gate = sst[None, None, 8] + tt[:, :, 8]
    if prompt_sst is not None and prompt_timestep is not None:
        pt = prompt_timestep.reshape(b, prompt_timestep.shape[1], 2, -1)
        kv_shift = prompt_sst[None, None, 0] + pt[:, :, 0]
        kv_scale = prompt_sst[None, None, 1] + pt[:, :, 1]
        context = _mod(context.astype(jnp.float32), kv_scale, kv_shift)
    y = _mod(y, q_scale, q_shift)
    o = _attention(p_attn, y, context, heads, cfg, kv_mask=context_mask,
                   attn_backend=attn_backend)
    return _gate(o.astype(jnp.float32), q_gate).astype(o.dtype)


def _ref_attn(bp, vx, ref_ctx, cfg, attn_backend):
    """EditAnything ref_attn (editanything.py:47-77): LoRA over the
    text-cross weights, video stream cross-attends the 32 reference
    tokens; no rope, and (matching the reference, which discards the
    q_norm/k_norm results) no qk-norm."""
    cdt = cfg.compute_dtype
    ra, base = bp["ref_attn"], bp["attn2"]
    y = rms_norm(vx.astype(jnp.float32), eps=cfg.eps).astype(cdt)
    c = ref_ctx.astype(cdt)

    def lora(x, bw, lp):
        out = _dense(x, bw, cdt)
        lo = jnp.dot(jnp.dot(x, lp["a"].astype(cdt)),
                     lp["b"].astype(cdt))
        return out + lo.astype(out.dtype)

    q = lora(y, base["to_q"], ra["to_q"])
    k = lora(c, base["to_k"], ra["to_k"])
    v = lora(c, base["to_v"], ra["to_v"])
    heads = cfg.num_heads
    hd = q.shape[-1] // heads
    q = q.reshape(*q.shape[:2], heads, hd)
    k = k.reshape(*k.shape[:2], heads, hd)
    v = v.reshape(*v.shape[:2], heads, hd)
    o = attention(q, k, v, backend=attn_backend)
    o = o.reshape(*y.shape[:2], -1)
    return lora(o, base["to_out"], ra["to_out"])


def _block(bp, cfg: LTX2Config, vx, ax, mods, ropes, masks, attn_backend):
    """BasicAVTransformerBlock.forward (transformer.py:229)."""
    rdt = cfg.residual_dtype
    (v_t, a_t, v_css, v_cg, a_css, a_cg, v_pt, a_pt) = mods
    (v_rope, a_rope, v_xrope, a_xrope) = ropes
    (v_ctx, a_ctx, v_ctx_mask, a_ctx_mask, *rest) = masks
    ref_ctx = rest[0] if rest else None
    av_mask_v = rest[1] if len(rest) > 1 else None
    av_mask_a = rest[2] if len(rest) > 2 else None
    b = vx.shape[0] if vx is not None else ax.shape[0]
    n = cfg.n_ada

    def ada(table, t, idx, dim):
        tm = t.shape[1]
        tt = t.reshape(b, tm, n, dim)
        return [table[None, None, i] + tt[:, :, i] for i in idx]

    run_v = vx is not None
    run_a = ax is not None

    if run_v:
        sh, sc, g = ada(bp["scale_shift_table"], v_t, (0, 1, 2), cfg.dim)
        y = _mod(rms_norm(vx.astype(jnp.float32), eps=cfg.eps), sc, sh)
        o = _attention(bp["attn1"], y, y, cfg.num_heads, cfg, rope=v_rope,
                       attn_backend=attn_backend)
        vx = vx + _gate(o.astype(jnp.float32), g)
        o = _text_cross(bp["attn2"], bp["scale_shift_table"],
                        bp.get("prompt_scale_shift_table"), vx, v_ctx,
                        v_ctx_mask, v_t, v_pt, cfg.num_heads, cfg,
                        attn_backend)
        vx = vx + o.astype(rdt)
        if ref_ctx is not None and "ref_attn" in bp:
            # EditAnything reference tokens (transformer.py:284-292):
            # blocks outside [start, end] carry ref_scale 0
            o = _ref_attn(bp, vx, ref_ctx, cfg, attn_backend)
            vx = vx + bp["ref_scale"] * o.astype(rdt)

    if run_a:
        sh, sc, g = ada(bp["audio_scale_shift_table"], a_t, (0, 1, 2),
                        cfg.audio_dim)
        y = _mod(rms_norm(ax.astype(jnp.float32), eps=cfg.eps), sc, sh)
        o = _attention(bp["audio_attn1"], y, y, cfg.audio_num_heads, cfg,
                       rope=a_rope, attn_backend=attn_backend)
        ax = ax + _gate(o.astype(jnp.float32), g)
        o = _text_cross(bp["audio_attn2"], bp["audio_scale_shift_table"],
                        bp.get("audio_prompt_scale_shift_table"), ax, a_ctx,
                        a_ctx_mask, a_t, a_pt, cfg.audio_num_heads, cfg,
                        attn_backend)
        ax = ax + o.astype(rdt)

    if run_v and run_a:
        # audio <-> video cross attention (transformer.py:330-424)
        vn = rms_norm(vx.astype(jnp.float32), eps=cfg.eps)
        an = rms_norm(ax.astype(jnp.float32), eps=cfg.eps)

        def av_ada(table, css, cg, dim):
            tm = css.shape[1]
            tt = css.reshape(b, tm, 4, dim)
            vals = [table[None, None, i] + tt[:, :, i] for i in range(4)]
            gate = table[None, None, 4] + cg.reshape(b, -1, dim)
            return vals, gate

        (a_s_a2v, a_sh_a2v, a_s_v2a, a_sh_v2a), g_v2a = av_ada(
            bp["sst_av_audio"], a_css, a_cg, cfg.audio_dim)
        (v_s_a2v, v_sh_a2v, v_s_v2a, v_sh_v2a), g_a2v = av_ada(
            bp["sst_av_video"], v_css, v_cg, cfg.dim)

        o = _attention(bp["audio_to_video_attn"], _mod(vn, v_s_a2v, v_sh_a2v),
                       _mod(an, a_s_a2v, a_sh_a2v), cfg.audio_num_heads, cfg,
                       rope=v_xrope, k_rope=a_xrope, attn_backend=attn_backend,
                       pair_mask=av_mask_v)
        vx = vx + _gate(o.astype(jnp.float32), g_a2v).astype(rdt)
        o = _attention(bp["video_to_audio_attn"], _mod(an, a_s_v2a, a_sh_v2a),
                       _mod(vn, v_s_v2a, v_sh_v2a), cfg.audio_num_heads, cfg,
                       rope=a_xrope, k_rope=v_xrope, attn_backend=attn_backend,
                       pair_mask=av_mask_a)
        ax = ax + _gate(o.astype(jnp.float32), g_v2a).astype(rdt)

    def ffn(p, y, cdt):
        h = _dense(y.astype(cdt), p["fc1"], cdt)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
        return _dense(h, p["fc2"], cdt)

    if run_v:
        sh, sc, g = ada(bp["scale_shift_table"], v_t, (3, 4, 5), cfg.dim)
        y = _mod(rms_norm(vx.astype(jnp.float32), eps=cfg.eps), sc, sh)
        vx = vx + _gate(ffn(bp["ff"], y, cfg.compute_dtype)
                        .astype(jnp.float32), g)
    if run_a:
        sh, sc, g = ada(bp["audio_scale_shift_table"], a_t, (3, 4, 5),
                        cfg.audio_dim)
        y = _mod(rms_norm(ax.astype(jnp.float32), eps=cfg.eps), sc, sh)
        ax = ax + _gate(ffn(bp["audio_ff"], y, cfg.compute_dtype)
                        .astype(jnp.float32), g)
    return (vx.astype(rdt) if run_v else None,
            ax.astype(rdt) if run_a else None)


def ltx2_dit_forward(params, cfg: LTX2Config,
                     video_tokens, t_video, context,
                     video_rope, video_cross_rope=None,
                     audio_tokens=None, t_audio=None,
                     audio_rope=None, audio_cross_rope=None,
                     context_mask=None,
                     ref_context=None, ref_adaln=None,
                     av_mask_v=None, av_mask_a=None,
                     attn_backend: str = "auto"):
    """Denoiser forward over patchified token streams.

    video_tokens: [B, Lv, in_channels]; t_video: [B, Tm] sigma in [0, 1]
    (scaled by cfg.timestep_scale inside, model.py timestep_scale_multiplier)
    context: [B, Lt, caption_dim]; ropes from rope.build_ltx_rope.
    audio_tokens: [B, La, audio_in_channels] or None (video-only mode).
    Returns (video_velocity [B, Lv, out_channels], audio_velocity | None).
    """
    rdt = cfg.residual_dtype
    cdt = cfg.compute_dtype
    b = video_tokens.shape[0] if video_tokens is not None \
        else audio_tokens.shape[0]
    run_a = audio_tokens is not None

    def caption(p, ctx, dim):
        h = _dense(ctx.astype(cdt), p["linear_1"], cdt)
        h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(cdt)
        return _dense(h, p["linear_2"], cdt)

    vx = a_mods = ax = None
    if video_tokens is not None:
        vx = _dense(video_tokens.astype(jnp.float32),
                    params["patchify_proj"], jnp.float32).astype(rdt)
        v_ctx = caption(params["caption_projection"], context, cfg.dim)
        ts = t_video * cfg.timestep_scale
        v_t, v_emb = adaln_embed(params["adaln_single"], ts)
        if ref_adaln is not None:
            # EditAnything adaLN offset added to the mod vector
            # (transformer_args.py:474-478)
            v_t = v_t + ref_adaln.astype(jnp.float32)[:, None, :]
        tavs = t_video * cfg.av_ca_timestep_scale
        v_css, _ = adaln_embed(params["av_ca_video_ss"], tavs)
        v_cg, _ = adaln_embed(params["av_ca_a2v_gate"], tavs)
        v_pt = None
        if cfg.cross_attention_adaln:
            # prompt modulation uses the scalar denoise sigma (the max
            # over groups: conditioned groups carry 0), one group for
            # the whole caption (transformer_args.py prompt timestep
            # from modality.sigma)
            v_pt, _ = adaln_embed(params["prompt_adaln_single"],
                                  jnp.max(ts, axis=1, keepdims=True))
    if run_a:
        ax = _dense(audio_tokens.astype(jnp.float32),
                    params["audio_patchify_proj"], jnp.float32).astype(rdt)
        a_ctx = caption(params["audio_caption_projection"], context,
                        cfg.audio_dim)
        tsa = t_audio * cfg.timestep_scale
        a_t, a_emb = adaln_embed(params["audio_adaln_single"], tsa)
        tava = t_audio * cfg.av_ca_timestep_scale
        a_css, _ = adaln_embed(params["av_ca_audio_ss"], tava)
        a_cg, _ = adaln_embed(params["av_ca_v2a_gate"], tava)
        a_pt = None
        if cfg.cross_attention_adaln:
            a_pt, _ = adaln_embed(params["audio_prompt_adaln_single"],
                                  jnp.max(tsa, axis=1, keepdims=True))

    mods = (v_t if vx is not None else None,
            a_t if run_a else None,
            v_css if (vx is not None and run_a) else None,
            v_cg if (vx is not None and run_a) else None,
            a_css if run_a and vx is not None else None,
            a_cg if run_a and vx is not None else None,
            v_pt if vx is not None else None,
            a_pt if run_a else None)
    ropes = (video_rope, audio_rope, video_cross_rope, audio_cross_rope)
    masks = (v_ctx if vx is not None else None,
             a_ctx if run_a else None, context_mask, context_mask,
             ref_context, av_mask_v, av_mask_a)

    def body(carry, bp):
        vx, ax = carry
        vx, ax = _block(bp, cfg, vx, ax, mods, ropes, masks, attn_backend)
        return (vx, ax), None

    if run_a and vx is not None:
        (vx, ax), _ = jax.lax.scan(body, (vx, ax), params["blocks"])
    elif vx is not None:
        def body_v(carry, bp):
            v, _ = _block(bp, cfg, carry, None, mods, ropes, masks,
                          attn_backend)
            return v, None
        vx, _ = jax.lax.scan(body_v, vx, params["blocks"])
    else:
        def body_a(carry, bp):
            _, a = _block(bp, cfg, None, carry, mods, ropes, masks,
                          attn_backend)
            return a, None
        ax, _ = jax.lax.scan(body_a, ax, params["blocks"])

    out_v = out_a = None
    if vx is not None:
        # head (model.py:152-155): norm_out + 2-entry scale_shift_table
        # against embedded_timestep, then proj_out
        # model.py:428-433: shift = table[0] + emb, scale = table[1] + emb
        emb = v_emb.reshape(b, -1, cfg.dim)
        sst = params["scale_shift_table"].astype(jnp.float32)
        shift = sst[None, None, 0] + emb
        scale = sst[None, None, 1] + emb
        y = layer_norm(vx.astype(jnp.float32), eps=cfg.eps)
        y = _mod(y, scale, shift)
        out_v = _dense(y, params["proj_out"], jnp.float32)
    if run_a:
        emb = a_emb.reshape(b, -1, cfg.audio_dim)
        sst = params["audio_scale_shift_table"].astype(jnp.float32)
        y = layer_norm(ax.astype(jnp.float32), eps=cfg.eps)
        y = _mod(y, sst[None, None, 1] + emb, sst[None, None, 0] + emb)
        out_a = _dense(y, params["audio_proj_out"], jnp.float32)
    return out_v, out_a
