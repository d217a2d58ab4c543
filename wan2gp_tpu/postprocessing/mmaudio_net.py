"""MMAudio flow network: video/text-conditioned soundtrack generation.

TPU-native re-implementation of /root/reference/postprocessing/mmaudio/
model/networks.py + transformer_layers.py:
- input projections (ChannelLastConv1d k7 + SiLU/SELU + SwiGLU ConvMLP;
  text via linear + MLP); sync features get a learned per-position
  embedding over 8-frame segments, are projected, then nearest-resampled
  to the latent length (networks.py:225-255);
- global conditioning = t-embed + MLP(clip_mean_proj + text_mean_proj);
  extended conditioning = global + per-token sync features;
- joint blocks (transformer_layers.py JointBlock:144): latent/clip/text
  streams each modulate + project qkv (per-head RMSNorm, rope on latent
  and clip with frequency scaling latent_len/clip_len), attend JOINTLY
  over the concatenated sequence, then per-stream gated conv/linear +
  SwiGLU ffn; the last joint block is pre_only for clip/text;
- fused blocks (MMDitSingleBlock) on the latent alone; FinalBlock adaLN
  + k7 conv out;
- euler flow matching with CFG against empty/negative conditions
  (eval_utils.py generate:81-160, flow_matching.py).

Model sizes (networks.py:376-430): small_16k — heads 7, hidden 448,
depth 12, fused 8, latent 20x250 (8s @16k), clip 64, sync 192.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MMAudioNetConfig:
    latent_dim: int = 20
    clip_dim: int = 1024
    sync_dim: int = 768
    text_dim: int = 1024
    hidden_dim: int = 448
    depth: int = 12
    fused_depth: int = 8
    num_heads: int = 7
    mlp_ratio: float = 4.0
    latent_seq_len: int = 250
    clip_seq_len: int = 64
    sync_seq_len: int = 192
    text_seq_len: int = 77
    v2: bool = False

    @property
    def head_dim(self):
        return self.hidden_dim // self.num_heads


def _mlp_hidden(dim, ratio=4.0, multiple_of=256):
    h = int(2 * int(dim * ratio) / 3)
    return multiple_of * ((h + multiple_of - 1) // multiple_of)


def _lin(key, din, dout, bias=True):
    lim = math.sqrt(6.0 / (din + dout))
    p = {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((dout,), jnp.float32)
    return p


def _conv(key, cin, cout, k, bias=True):
    lim = math.sqrt(6.0 / (cin * k + cout))
    p = {"w": jax.random.uniform(key, (k, cin, cout), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _apply_lin(x, p):
    y = jnp.dot(x, p["w"])
    if "b" in p:
        y = y + p["b"]
    return y


def _apply_conv(x, p):
    k = p["w"].shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, p["w"], (1,), [(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"))
    if "b" in p:
        y = y + p["b"]
    return y


def _swiglu(x, p, conv: bool):
    f = _apply_conv if conv else _apply_lin
    return f(jax.nn.silu(f(x, p["w1"])) * f(x, p["w3"]), p["w2"])


def _ln(x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def _rms(x, w, eps=1e-6):
    y = x * jax.lax.rsqrt(jnp.mean(x * x, -1, keepdims=True) + eps)
    return y * w


def rope_tables(length: int, dim: int, freq_scaling: float = 1.0,
                theta: float = 10000.0):
    inv = freq_scaling / theta ** (np.arange(0, dim, 2) / dim)
    ang = np.outer(np.arange(length), inv)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _rope(x, cos, sin):
    """Interleaved-pair rotation (ext/rotary_embeddings.py apply_rope).
    x [B, L, H, D]."""
    xr = x.reshape(*x.shape[:-1], -1, 2)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([xr[..., 0] * c - xr[..., 1] * s,
                     xr[..., 1] * c + xr[..., 0] * s], axis=-1)
    return out.reshape(x.shape)


def _init_single_block(keys, cfg, pre_only=False, kernel=3):
    h = cfg.hidden_dim
    hd = cfg.head_dim
    fh = _mlp_hidden(h, cfg.mlp_ratio)
    p: Dict[str, Any] = {
        "qkv": _lin(next(keys), h, 3 * h),
        "q_norm": jnp.ones((hd,), jnp.float32),
        "k_norm": jnp.ones((hd,), jnp.float32),
        "mod": _lin(next(keys), h, 2 * h if pre_only else 6 * h),
        "pre_only": pre_only, "kernel": kernel,
    }
    if not pre_only:
        if kernel == 1:
            p["linear1"] = _lin(next(keys), h, h)
            p["ffn"] = {"w1": _lin(next(keys), h, fh, bias=False),
                        "w2": _lin(next(keys), fh, h, bias=False),
                        "w3": _lin(next(keys), h, fh, bias=False)}
        else:
            p["linear1"] = _conv(next(keys), h, h, kernel)
            p["ffn"] = {"w1": _conv(next(keys), h, fh, kernel, bias=False),
                        "w2": _conv(next(keys), fh, h, kernel, bias=False),
                        "w3": _conv(next(keys), h, fh, kernel, bias=False)}
    return p


def init_mmaudio_net(key, cfg: MMAudioNetConfig = MMAudioNetConfig()
                     ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    h = cfg.hidden_dim

    def in_proj(din, conv_k):
        fh = _mlp_hidden(h, 4.0)
        base = ({"in": _conv(next(keys), din, h, conv_k)}
                if conv_k > 1 else {"in": _lin(next(keys), din, h)})
        mlp_k = 7 if conv_k == 7 else (3 if conv_k > 0 else 1)
        if mlp_k > 1:
            base["mlp"] = {"w1": _conv(next(keys), h, fh, mlp_k,
                                       bias=False),
                           "w2": _conv(next(keys), fh, h, mlp_k,
                                       bias=False),
                           "w3": _conv(next(keys), h, fh, mlp_k,
                                       bias=False)}
        else:
            base["mlp"] = {"w1": _lin(next(keys), h, fh, bias=False),
                           "w2": _lin(next(keys), fh, h, bias=False),
                           "w3": _lin(next(keys), h, fh, bias=False)}
        return base

    params: Dict[str, Any] = {
        "audio_in": in_proj(cfg.latent_dim, 7),
        "clip_in": {"in": _lin(next(keys), cfg.clip_dim, h),
                    "mlp": {"w1": _conv(next(keys), h,
                                        _mlp_hidden(h), 3, bias=False),
                            "w2": _conv(next(keys), _mlp_hidden(h), h,
                                        3, bias=False),
                            "w3": _conv(next(keys), h,
                                        _mlp_hidden(h), 3, bias=False)}},
        "sync_in": in_proj(cfg.sync_dim, 7),
        "text_in": {"in": _lin(next(keys), cfg.text_dim, h),
                    "mlp": {"w1": _lin(next(keys), h, _mlp_hidden(h),
                                       bias=False),
                            "w2": _lin(next(keys), _mlp_hidden(h), h,
                                       bias=False),
                            "w3": _lin(next(keys), h, _mlp_hidden(h),
                                       bias=False)}},
        "clip_cond_proj": _lin(next(keys), h, h),
        "text_cond_proj": _lin(next(keys), h, h),
        "global_cond_mlp": {"w1": _lin(next(keys), h, _mlp_hidden(h),
                                       bias=False),
                            "w2": _lin(next(keys), _mlp_hidden(h), h,
                                       bias=False),
                            "w3": _lin(next(keys), h, _mlp_hidden(h),
                                       bias=False)},
        "sync_pos_emb": jnp.zeros((1, 1, 8, cfg.sync_dim), jnp.float32),
        "t_embed": {"fc1": _lin(next(keys), 256, h),
                    "fc2": _lin(next(keys), h, h)},
        "final_mod": _lin(next(keys), h, 2 * h),
        "final_conv": _conv(next(keys), h, cfg.latent_dim, 7),
        "latent_mean": jnp.zeros((cfg.latent_dim,), jnp.float32),
        "latent_std": jnp.ones((cfg.latent_dim,), jnp.float32),
        "empty_string_feat": jnp.zeros((cfg.text_seq_len, cfg.text_dim),
                                       jnp.float32),
        "empty_clip_feat": jnp.zeros((cfg.clip_dim,), jnp.float32),
        "empty_sync_feat": jnp.zeros((cfg.sync_dim,), jnp.float32),
    }
    n_joint = cfg.depth - cfg.fused_depth
    joint = []
    for i in range(n_joint):
        pre_only = i == n_joint - 1
        joint.append({
            "latent": _init_single_block(keys, cfg, False, 3),
            "clip": _init_single_block(keys, cfg, pre_only, 3),
            "text": _init_single_block(keys, cfg, pre_only, 1),
        })
    params["joint_blocks"] = joint
    params["fused_blocks"] = [
        _init_single_block(keys, cfg, False, 3)
        for _ in range(cfg.fused_depth)]
    return params


def _pre_attn(p, x, c, cfg, cos=None, sin=None):
    """MMDitSingleBlock.pre_attention (transformer_layers.py:105-119)."""
    mod = _apply_lin(jax.nn.silu(c), p["mod"])
    if p["pre_only"]:
        shift, scale = jnp.split(mod, 2, axis=-1)
        rest = None
    else:
        shift, scale, g_msa, sh_mlp, sc_mlp, g_mlp = jnp.split(
            mod, 6, axis=-1)
        rest = (g_msa, sh_mlp, sc_mlp, g_mlp)
    if shift.ndim == 2:
        shift, scale = shift[:, None], scale[:, None]
    y = _ln(x) * (1 + scale) + shift
    qkv = _apply_lin(y, p["qkv"])
    b, l, _ = qkv.shape
    n, hd = cfg.num_heads, cfg.head_dim
    # Rearrange 'b n (h d j)': qkv INTERLEAVED on the innermost axis
    qkv = qkv.reshape(b, l, n, hd, 3)
    q = _rms(qkv[..., 0], p["q_norm"])
    k = _rms(qkv[..., 1], p["k_norm"])
    v = qkv[..., 2]
    if cos is not None:
        q = _rope(q, cos, sin)
        k = _rope(k, cos, sin)
    return (q, k, v), rest


def _post_attn(p, x, attn_out, rest, conv):
    if p["pre_only"]:
        return x
    g_msa, sh_mlp, sc_mlp, g_mlp = rest
    if g_msa.ndim == 2:
        g_msa, sh_mlp = g_msa[:, None], sh_mlp[:, None]
        sc_mlp, g_mlp = sc_mlp[:, None], g_mlp[:, None]
    f = _apply_conv if conv else _apply_lin
    x = x + f(attn_out, p["linear1"]) * g_msa
    r = _ln(x) * (1 + sc_mlp) + sh_mlp
    x = x + _swiglu(r, p["ffn"], conv) * g_mlp
    return x


def _attend(q, k, v):
    b, l, n, hd = q.shape
    s = jnp.einsum("blnd,bsnd->bnls", q, k,
                   preferred_element_type=jnp.float32) / math.sqrt(hd)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnls,bsnd->blnd", a, v)
    return o.reshape(b, l, n * hd)


def mmaudio_preprocess_conditions(params, cfg: MMAudioNetConfig,
                                  clip_f, sync_f, text_f):
    """networks.py preprocess_conditions:225-258."""
    bs = clip_f.shape[0]
    sync_f = sync_f.reshape(bs, cfg.sync_seq_len // 8, 8, -1) \
        + params["sync_pos_emb"]
    sync_f = sync_f.reshape(bs, cfg.sync_seq_len, -1)

    def proj(x, p, act_first, conv_mlp):
        f_in = _apply_conv if p["in"]["w"].ndim == 3 else _apply_lin
        y = f_in(x, p["in"])
        if act_first:
            y = jax.nn.silu(y) if cfg.v2 else jax.nn.selu(y)
        return _swiglu(y, p["mlp"], conv_mlp)

    clip_p = proj(clip_f, params["clip_in"], cfg.v2, True)
    sync_p = proj(sync_f, params["sync_in"], True, True)
    text_p = proj(text_f, params["text_in"], cfg.v2, False)

    # nearest-exact resample sync to the latent length:
    # sample at (i + 0.5) * in/out - 0.5
    pos = ((jnp.arange(cfg.latent_seq_len) + 0.5)
           * cfg.sync_seq_len / cfg.latent_seq_len - 0.5)
    idx = jnp.clip(jnp.round(pos).astype(jnp.int32), 0,
                   cfg.sync_seq_len - 1)
    sync_p = sync_p[:, idx]

    clip_c = _apply_lin(clip_p.mean(axis=1), params["clip_cond_proj"])
    text_c = _apply_lin(text_p.mean(axis=1), params["text_cond_proj"])
    return {"clip_f": clip_p, "sync_f": sync_p, "text_f": text_p,
            "clip_c": clip_c, "text_c": text_c}


def empty_conditions(params, cfg: MMAudioNetConfig, bs: int = 1,
                     negative_text_f=None):
    clip = jnp.broadcast_to(params["empty_clip_feat"],
                            (bs, cfg.clip_seq_len, cfg.clip_dim))
    sync = jnp.broadcast_to(params["empty_sync_feat"],
                            (bs, cfg.sync_seq_len, cfg.sync_dim))
    text = (negative_text_f if negative_text_f is not None
            else jnp.broadcast_to(params["empty_string_feat"][None],
                                  (bs, cfg.text_seq_len, cfg.text_dim)))
    return mmaudio_preprocess_conditions(params, cfg, clip, sync, text)


def mmaudio_predict_flow(params, cfg: MMAudioNetConfig, latent, t,
                         cond):
    """networks.py predict_flow:262-305."""
    lat_rot = rope_tables(cfg.latent_seq_len, cfg.head_dim)
    clip_rot = rope_tables(cfg.clip_seq_len, cfg.head_dim,
                           freq_scaling=cfg.latent_seq_len
                           / cfg.clip_seq_len)

    x = _apply_conv(latent, params["audio_in"]["in"])
    x = jax.nn.silu(x) if cfg.v2 else jax.nn.selu(x)
    x = _swiglu(x, params["audio_in"]["mlp"], True)

    g = _swiglu(cond["clip_c"] + cond["text_c"],
                params["global_cond_mlp"], False)
    # t embed (DiT sinusoid, 256-d, max_period 10000)
    half = 128
    freqs = jnp.exp(-math.log(10000.0) * jnp.arange(half) / half)
    args = t[:, None] * freqs[None]
    temb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    temb = _apply_lin(jax.nn.silu(_apply_lin(temb, params["t_embed"]
                                             ["fc1"])),
                      params["t_embed"]["fc2"])
    global_c = temb + g                     # [B, D]
    extended_c = global_c[:, None] + cond["sync_f"]   # [B, N, D]

    clip_f, text_f = cond["clip_f"], cond["text_f"]
    for bp in params["joint_blocks"]:
        (xq, xr) = _pre_attn(bp["latent"], x, extended_c, cfg,
                             *lat_rot)
        (cq, cr) = _pre_attn(bp["clip"], clip_f, global_c, cfg,
                             *clip_rot)
        (tq, tr) = _pre_attn(bp["text"], text_f, global_c, cfg)
        q = jnp.concatenate([xq[0], cq[0], tq[0]], axis=1)
        k = jnp.concatenate([xq[1], cq[1], tq[1]], axis=1)
        v = jnp.concatenate([xq[2], cq[2], tq[2]], axis=1)
        out = _attend(q, k, v)
        l1 = x.shape[1]
        l2 = clip_f.shape[1]
        x = _post_attn(bp["latent"], x, out[:, :l1], xr, True)
        if not bp["clip"]["pre_only"]:
            clip_f = _post_attn(bp["clip"], clip_f, out[:, l1:l1 + l2],
                                cr, True)
            text_f = _post_attn(bp["text"], text_f, out[:, l1 + l2:],
                                tr, False)
    for bp in params["fused_blocks"]:
        (q3, r3) = _pre_attn(bp, x, extended_c, cfg, *lat_rot)
        out = _attend(*q3)
        x = _post_attn(bp, x, out, r3, True)

    mod = _apply_lin(jax.nn.silu(global_c), params["final_mod"])
    shift, scale = jnp.split(mod[:, None], 2, axis=-1)
    x = _ln(x) * (1 + scale) + shift
    return _apply_conv(x, params["final_conv"])


def mmaudio_generate_latents(params, cfg: MMAudioNetConfig, cond,
                             uncond, num_steps: int = 25,
                             cfg_strength: float = 4.5, key=None):
    """Euler flow matching with CFG (eval_utils.py:131-160,
    flow_matching.py to_data)."""
    key = key if key is not None else jax.random.key(0)
    x = jax.random.normal(key, (1, cfg.latent_seq_len, cfg.latent_dim),
                          jnp.float32)
    ts = jnp.linspace(0.0, 1.0, num_steps + 1)

    def body(x, i):
        t = jnp.broadcast_to(ts[i], (1,))
        v_c = mmaudio_predict_flow(params, cfg, x, t, cond)
        if cfg_strength != 1.0:
            v_u = mmaudio_predict_flow(params, cfg, x, t, uncond)
            v = v_u + cfg_strength * (v_c - v_u)
        else:
            v = v_c
        return x + (ts[i + 1] - ts[i]) * v, None

    x, _ = jax.lax.scan(body, x, jnp.arange(num_steps))
    # unnormalize to VAE latent space (networks.py:221-223)
    return x * params["latent_std"] + params["latent_mean"]


def load_mmaudio_net_params(sd: Dict[str, np.ndarray],
                            cfg: MMAudioNetConfig = MMAudioNetConfig()):
    """networks.py module key space (small/medium/large checkpoints)."""
    sd = dict(sd)
    for p_ in ("net.", "module.", "model."):
        if any(k.startswith(p_) for k in sd):
            sd = {k[len(p_):] if k.startswith(p_) else k: v
                  for k, v in sd.items()}
            break

    def lin(name):
        p = {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                         np.float32).T)}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))
        return p

    def conv(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(w.transpose(2, 1, 0))}
        if f"{name}.bias" in sd:
            p["b"] = jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))
        return p

    def auto(name):
        w = np.asarray(sd[f"{name}.weight"])
        return conv(name) if w.ndim == 3 else lin(name)

    def swiglu(name):
        return {"w1": auto(f"{name}.w1"), "w2": auto(f"{name}.w2"),
                "w3": auto(f"{name}.w3")}

    def in_proj(name, act_idx):
        # Sequential indices: [proj, (act), mlp]
        return {"in": auto(f"{name}.0"),
                "mlp": swiglu(f"{name}.{act_idx}")}

    clip_mlp_idx = 2 if cfg.v2 else 1
    params: Dict[str, Any] = {
        "audio_in": in_proj("audio_input_proj", 2),
        "clip_in": in_proj("clip_input_proj", clip_mlp_idx),
        "sync_in": in_proj("sync_input_proj", 2),
        "text_in": in_proj("text_input_proj", clip_mlp_idx),
        "clip_cond_proj": lin("clip_cond_proj"),
        "text_cond_proj": lin("text_cond_proj"),
        "global_cond_mlp": swiglu("global_cond_mlp"),
        "sync_pos_emb": jnp.asarray(np.asarray(
            sd.pop("sync_pos_emb"), np.float32)),
        "t_embed": {"fc1": lin("t_embed.mlp.0"),
                    "fc2": lin("t_embed.mlp.2")},
        "final_mod": lin("final_layer.adaLN_modulation.1"),
        "final_conv": conv("final_layer.conv"),
        "latent_mean": jnp.asarray(np.asarray(
            sd.pop("latent_mean"), np.float32).reshape(-1)),
        "latent_std": jnp.asarray(np.asarray(
            sd.pop("latent_std"), np.float32).reshape(-1)),
        "empty_string_feat": jnp.asarray(np.asarray(
            sd.pop("empty_string_feat"), np.float32)),
        "empty_clip_feat": jnp.asarray(np.asarray(
            sd.pop("empty_clip_feat"), np.float32).reshape(-1)),
        "empty_sync_feat": jnp.asarray(np.asarray(
            sd.pop("empty_sync_feat"), np.float32).reshape(-1)),
    }

    def block(name, pre_only, kernel):
        p = {"qkv": lin(f"{name}.attn.qkv"),
             "q_norm": jnp.asarray(np.asarray(
                 sd.pop(f"{name}.attn.q_norm.weight"), np.float32)),
             "k_norm": jnp.asarray(np.asarray(
                 sd.pop(f"{name}.attn.k_norm.weight"), np.float32)),
             "mod": lin(f"{name}.adaLN_modulation.1"),
             "pre_only": pre_only, "kernel": kernel}
        if not pre_only:
            p["linear1"] = auto(f"{name}.linear1")
            p["ffn"] = swiglu(f"{name}.ffn")
        return p

    n_joint = cfg.depth - cfg.fused_depth
    joint = []
    for i in range(n_joint):
        pre_only = i == n_joint - 1
        joint.append({
            "latent": block(f"joint_blocks.{i}.latent_block", False, 3),
            "clip": block(f"joint_blocks.{i}.clip_block", pre_only, 3),
            "text": block(f"joint_blocks.{i}.text_block", pre_only, 1),
        })
    params["joint_blocks"] = joint
    params["fused_blocks"] = [
        block(f"fused_blocks.{i}", False, 3)
        for i in range(cfg.fused_depth)]
    return params, sorted(sd.keys())
