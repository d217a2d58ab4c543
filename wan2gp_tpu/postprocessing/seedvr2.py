"""SeedVR2 — one-step diffusion video super-resolution.

TPU-native re-implementation of /root/reference/postprocessing/seedvr2/:

* NaDiT-3B (models/dit_3b/nadit.py, DIT_CONFIG runtime.py:20-48): a
  native-resolution DiT over 33-channel latents (noise 16 + upscaled
  video latent 16 + ones 1), patch (1,2,2), dim 2560, 32 layers of
  NaMMSRTransformerBlock (nablocks/mmsr_block.py) — the first 10 carry
  separate text-stream weights (mm layers), the rest share weights
  across streams; per-layer swin window attention alternating plain and
  shifted 720p-normalized windows (window.py:28-83, window (4,3,3)),
  where every window attends jointly with the FULL text sequence and
  text outputs average over windows (mmattn.py:162-283); interleaved
  3-axis "lang" RoPE with the video temporal axis offset by the text
  length (rope.py:120-186); AdaSingle modulation (modulation.py:42-100:
  per-layer shift/scale/gate = timestep embedding chunks + learned
  bias); SwiGLU MLPs; RMS qk-norm.
* One-step restoration (runtime.py:225-250): x = noise - DiT(noise,
  cond, t=1000); latent scale 0.9152.
* Causal video VAE (runtime.py VAE_CONFIG: channels (128,256,512,512),
  16 latent ch, spatial 8x, temporal 4x, GroupNorm-SiLU resblocks) —
  expressed compactly with causal 3D convs.
* Wavelet color fix (runtime.py:119-143): multi-radius low-pass
  pyramid; output low band replaced by the bicubic-upscaled input's.
* Sliding temporal windows with cosine crossfade (runtime.py:155-166,
  303-320).

The pretrained "positive embedding" text conditioning is an external
tensor; a zeros placeholder is used when absent.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class SeedVR2Config:
    # DiT (runtime.py DIT_CONFIG)
    vid_in_channels: int = 33
    vid_out_channels: int = 16
    dim: int = 2560
    txt_in_dim: int = 5120
    txt_dim: int = 2560
    heads: int = 20
    head_dim: int = 128
    expand_ratio: int = 4
    num_layers: int = 32
    mm_layers: int = 10
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    window: Tuple[int, int, int] = (4, 3, 3)
    rope_dim: int = 128
    norm_eps: float = 1e-5
    # VAE (runtime.py VAE_CONFIG)
    vae_channels: Tuple[int, ...] = (128, 256, 512, 512)
    latent_channels: int = 16
    temporal_scale_num: int = 2          # 2 of the 3 downsamples are 2x2x2
    latent_scale: float = 0.9152
    compute_dtype: Any = jnp.float32

    @property
    def emb_dim(self):
        return 6 * self.dim

    @classmethod
    def tiny(cls):
        return cls(dim=32, txt_in_dim=24, txt_dim=32, heads=4,
                   head_dim=8, expand_ratio=2, num_layers=3,
                   mm_layers=1, rope_dim=8, vae_channels=(8, 16),
                   latent_channels=4, temporal_scale_num=1,
                   vid_in_channels=9, vid_out_channels=4)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, bias=True, std=0.02):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32) * std
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _rms(x, w, eps):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True) + eps)
    if w is not None:
        y = y * w
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# windows (window.py:28-83)
# ---------------------------------------------------------------------------

def make_720p_windows(size, num_windows, shifted: bool):
    t, h, w = size
    nt_, nh_, nw_ = num_windows
    scale = math.sqrt((45 * 80) / (h * w))
    rh, rw = round(h * scale), round(w * scale)
    wh = math.ceil(rh / nh_)
    ww = math.ceil(rw / nw_)
    wt = math.ceil(min(t, 30) / nt_)
    out = []
    if not shifted:
        nt = math.ceil(t / wt)
        nh = math.ceil(h / wh)
        nw = math.ceil(w / ww)
        for iw in range(nw):
            for ih in range(nh):
                for it in range(nt):
                    sl = (slice(it * wt, min((it + 1) * wt, t)),
                          slice(ih * wh, min((ih + 1) * wh, h)),
                          slice(iw * ww, min((iw + 1) * ww, w)))
                    if all(s.stop > s.start for s in sl):
                        out.append(sl)
        return out
    st = 0.5 if wt < t else 0
    sh = 0.5 if wh < h else 0
    sw = 0.5 if ww < w else 0
    nt = math.ceil((t - st) / wt) + (1 if st > 0 else 0)
    nh = math.ceil((h - sh) / wh) + (1 if sh > 0 else 0)
    nw = math.ceil((w - sw) / ww) + (1 if sw > 0 else 0)
    if st == 0:
        nt = 1
    if sh == 0:
        nh = 1
    if sw == 0:
        nw = 1
    for iw in range(nw):
        for ih in range(nh):
            for it in range(nt):
                sl = (slice(max(int((it - st) * wt), 0),
                            min(int((it - st + 1) * wt), t)),
                      slice(max(int((ih - sh) * wh), 0),
                            min(int((ih - sh + 1) * wh), h)),
                      slice(max(int((iw - sw) * ww), 0),
                            min(int((iw - sw + 1) * ww), w)))
                if all(s.stop > s.start for s in sl):
                    out.append(sl)
    return out


# ---------------------------------------------------------------------------
# rope (rope.py NaMMRotaryEmbedding3d, freqs_for="lang")
# ---------------------------------------------------------------------------

def _axial_lang_freqs(cfg: SeedVR2Config, t: int, h: int, w: int,
                      t_offset: int):
    """[t, h, w, 3 * 2 * (rope_dim//3//2)] interleaved-pair freqs."""
    per_axis = cfg.rope_dim // 3
    half = per_axis // 2
    base = 1.0 / (10000.0 ** (np.arange(0, per_axis, 2,
                                        dtype=np.float64)[:half]
                              / per_axis))
    axes = []
    for size, off in ((t, t_offset), (h, 0), (w, 0)):
        pos = np.arange(size, dtype=np.float64) + off
        fr = np.outer(pos, base)
        fr = np.repeat(fr, 2, axis=-1)          # interleave pairs
        axes.append(fr)
    ft = axes[0][:, None, None, :]
    fh = axes[1][None, :, None, :]
    fw = axes[2][None, None, :, :]
    grid = np.concatenate([
        np.broadcast_to(ft, (t, h, w, ft.shape[-1])),
        np.broadcast_to(fh, (t, h, w, fh.shape[-1])),
        np.broadcast_to(fw, (t, h, w, fw.shape[-1]))], axis=-1)
    return grid


def _txt_lang_freqs(cfg: SeedVR2Config, l: int):
    per_axis = cfg.rope_dim // 3
    half = per_axis // 2
    base = 1.0 / (10000.0 ** (np.arange(0, per_axis, 2,
                                        dtype=np.float64)[:half]
                              / per_axis))
    fr = np.repeat(np.outer(np.arange(l, dtype=np.float64), base), 2,
                   axis=-1)
    return np.tile(fr, (1, 3))                  # repeat(1, 3)


def _apply_seed_rope(x, cos, sin):
    """x [L, heads, hd]; rotate the first cos.shape[-1] channels with
    consecutive-pair convention (rope.py:188-198)."""
    d = cos.shape[-1]
    xr = x[..., :d]
    rest = x[..., d:]
    c = cos[:, None]
    s = sin[:, None]
    x0 = xr[..., 0::2]
    x1 = xr[..., 1::2]
    c0, s0 = c[..., 0::2], s[..., 0::2]
    o0 = x0 * c0 - x1 * s0
    o1 = x1 * c0 + x0 * s0
    rot = jnp.stack([o0, o1], axis=-1).reshape(xr.shape)
    return jnp.concatenate([rot, rest], axis=-1)


# ---------------------------------------------------------------------------
# NaDiT
# ---------------------------------------------------------------------------

def _init_branch(key, cfg, dtype):
    """One stream's weights for a block (vid or txt or shared)."""
    d = cfg.dim
    inner = cfg.heads * cfg.head_dim
    keys = iter(jax.random.split(key, 16))
    hidden = int(2 * d * cfg.expand_ratio / 3)
    hidden = 256 * ((hidden + 255) // 256)
    ada = {}
    for l in ("attn", "mlp"):
        for part in ("shift", "scale", "gate"):
            base = jax.random.normal(next(keys), (d,)) / d ** 0.5
            if part == "scale":
                base = base + 1.0
            ada[f"{l}_{part}"] = base.astype(jnp.float32)
    return {"qkv": _lin(next(keys), d, 3 * inner, dtype, bias=False),
            "proj": _lin(next(keys), inner, d, dtype),
            "q_norm": jnp.ones((cfg.head_dim,), jnp.float32),
            "k_norm": jnp.ones((cfg.head_dim,), jnp.float32),
            "mlp_gate": _lin(next(keys), d, hidden, dtype, bias=False),
            "mlp_in": _lin(next(keys), d, hidden, dtype, bias=False),
            "mlp_out": _lin(next(keys), hidden, d, dtype, bias=False),
            # AdaSingle learned biases: per layer shift/scale/gate
            "ada": ada}


def init_seedvr2_dit(key, cfg: SeedVR2Config, dtype=jnp.float32):
    d = cfg.dim
    pd = cfg.vid_in_channels * cfg.patch_size[1] * cfg.patch_size[2]
    keys = iter(jax.random.split(key, cfg.num_layers * 2 + 8))
    blocks = []
    for i in range(cfg.num_layers):
        blk = {"vid": _init_branch(next(keys), cfg, dtype)}
        if i < cfg.mm_layers:
            blk["txt"] = _init_branch(next(keys), cfg, dtype)
        blk["shifted"] = bool(i % 2)       # window_method alternates
        blocks.append(blk)
    return {
        "vid_in": _lin(next(keys), pd, d, dtype),
        "txt_in": _lin(next(keys), cfg.txt_in_dim, cfg.txt_dim, dtype),
        "emb_in": {"proj_in": _lin(next(keys), 256, d, dtype),
                   "proj_hid": _lin(next(keys), d, d, dtype),
                   "proj_out": _lin(next(keys), d, cfg.emb_dim, dtype)},
        "blocks": blocks,
        "out_norm": jnp.ones((d,), jnp.float32),
        "out_ada": {"out_shift": (jax.random.normal(next(keys), (d,))
                                  / d ** 0.5).astype(jnp.float32),
                    "out_scale": (jax.random.normal(next(keys), (d,))
                                  / d ** 0.5 + 1).astype(jnp.float32)},
        "vid_out": _lin(next(keys), d, cfg.vid_out_channels
                        * cfg.patch_size[1] * cfg.patch_size[2], dtype),
    }


def _time_embedding(p, cfg: SeedVR2Config, t):
    half = 128
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], -1)
    emb = jax.nn.silu(_dense(emb, p["proj_in"]))
    emb = jax.nn.silu(_dense(emb, p["proj_hid"]))
    return _dense(emb, p["proj_out"])            # [B, 6*d]


def _swiglu(bp, x):
    g = jax.nn.silu(_dense(x, bp["mlp_gate"]).astype(jnp.float32)
                    ).astype(x.dtype)
    return _dense(g * _dense(x, bp["mlp_in"]), bp["mlp_out"])


def seedvr2_dit_forward(params, cfg: SeedVR2Config, vid, txt, t):
    """vid: [T, Hp, Wp, 33*ph*pw] pre-patchified latent tokens (patch
    (1,2,2) applied by the caller); txt: [L, txt_in_dim]; t: scalar
    timestep.  Returns x_pred tokens [T, Hp, Wp, 16*ph*pw]."""
    cdt = cfg.compute_dtype
    tt, hh, ww = vid.shape[:3]
    nvid = tt * hh * ww
    d, heads, hd = cfg.dim, cfg.heads, cfg.head_dim

    v = _dense(vid.reshape(nvid, -1).astype(cdt), params["vid_in"])
    x_txt = _dense(jnp.asarray(txt, cdt), params["txt_in"])
    ltxt = x_txt.shape[0]
    emb6 = _time_embedding(params["emb_in"], cfg,
                           jnp.asarray([t], jnp.float32))[0]

    vid_freqs = _axial_lang_freqs(cfg, tt, hh, ww, t_offset=ltxt)
    txt_f = _txt_lang_freqs(cfg, ltxt)
    txt_cos = jnp.asarray(np.cos(txt_f), jnp.float32)
    txt_sin = jnp.asarray(np.sin(txt_f), jnp.float32)

    def mod_in(xx, bp, emb6, layer):
        li = 0 if layer == "attn" else 1
        dd = emb6.reshape(d, 2, 3)[:, li]
        scale = dd[:, 1] + bp["ada"][f"{layer}_scale"]
        shift = dd[:, 0] + bp["ada"][f"{layer}_shift"]
        return xx * scale.astype(xx.dtype) + shift.astype(xx.dtype)

    def mod_out(xx, bp, emb6, layer):
        li = 0 if layer == "attn" else 1
        dd = emb6.reshape(d, 2, 3)[:, li]
        gate = dd[:, 2] + bp["ada"][f"{layer}_gate"]
        return xx * gate.astype(xx.dtype)

    for blk in params["blocks"]:
        vp = blk["vid"]
        tp = blk.get("txt", vp)
        # attention with swin windows + joint text
        va = _rms(v, None, cfg.norm_eps)
        ta = _rms(x_txt, None, cfg.norm_eps)
        va = mod_in(va, vp, emb6, "attn")
        ta = mod_in(ta, tp, emb6, "attn")

        tq, tk, tv = jnp.split(_dense(ta, tp["qkv"]), 3, axis=-1)
        tq = _rms(tq.reshape(ltxt, heads, hd), tp["q_norm"],
                  cfg.norm_eps)
        tk = _rms(tk.reshape(ltxt, heads, hd), tp["k_norm"],
                  cfg.norm_eps)
        tv = tv.reshape(ltxt, heads, hd)
        tq = _apply_seed_rope(tq, txt_cos, txt_sin)
        tk = _apply_seed_rope(tk, txt_cos, txt_sin)

        va3 = va.reshape(tt, hh, ww, d)
        windows = make_720p_windows((tt, hh, ww), cfg.window,
                                    blk["shifted"])
        vid_out = jnp.zeros((tt, hh, ww, d), v.dtype)
        txt_parts = []
        for (st, sh, sw) in windows:
            win = va3[st, sh, sw]
            wt_, wh_, ww_ = win.shape[:3]
            n = wt_ * wh_ * ww_
            wq, wk, wv = jnp.split(
                _dense(win.reshape(n, d), vp["qkv"]), 3, axis=-1)
            wq = _rms(wq.reshape(n, heads, hd), vp["q_norm"],
                      cfg.norm_eps)
            wk = _rms(wk.reshape(n, heads, hd), vp["k_norm"],
                      cfg.norm_eps)
            wv = wv.reshape(n, heads, hd)
            fr = vid_freqs[st, sh, sw].reshape(n, -1)
            wcos = jnp.asarray(np.cos(fr), jnp.float32)
            wsin = jnp.asarray(np.sin(fr), jnp.float32)
            wq = _apply_seed_rope(wq, wcos, wsin)
            wk = _apply_seed_rope(wk, wcos, wsin)
            q = jnp.concatenate([wq, tq], axis=0)
            k = jnp.concatenate([wk, tk], axis=0)
            val = jnp.concatenate([wv, tv], axis=0)
            attn = jax.nn.softmax(
                jnp.einsum("lhd,shd->hls", q, k).astype(jnp.float32)
                / math.sqrt(hd), axis=-1).astype(q.dtype)
            o = jnp.einsum("hls,shd->lhd", attn, val)
            vid_o = _dense(o[:n].reshape(n, heads * hd), vp["proj"])
            vid_out = vid_out.at[st, sh, sw].set(
                vid_o.reshape(wt_, wh_, ww_, d))
            txt_parts.append(o[n:])
        txt_o = jnp.mean(jnp.stack(txt_parts, 0), 0)
        txt_o = _dense(txt_o.reshape(ltxt, heads * hd), tp["proj"])

        v = v + mod_out(vid_out.reshape(nvid, d), vp, emb6, "attn")
        x_txt = x_txt + mod_out(txt_o, tp, emb6, "attn")

        # mlp
        vm = mod_in(_rms(v, None, cfg.norm_eps), vp, emb6, "mlp")
        v = v + mod_out(_swiglu(vp, vm), vp, emb6, "mlp")
        tm = mod_in(_rms(x_txt, None, cfg.norm_eps), tp, emb6, "mlp")
        x_txt = x_txt + mod_out(_swiglu(tp, tm), tp, emb6, "mlp")

    # out norm + ada(in) + projection
    v = _rms(v, params["out_norm"], cfg.norm_eps)
    dd = emb6.reshape(d, 2, 3)[:, 0]
    scale = dd[:, 1] + params["out_ada"]["out_scale"]
    shift = dd[:, 0] + params["out_ada"]["out_shift"]
    v = v * scale.astype(v.dtype) + shift.astype(v.dtype)
    out = _dense(v, params["vid_out"])
    return out.reshape(tt, hh, ww, -1)


# ---------------------------------------------------------------------------
# causal video VAE (compact; VAE_CONFIG shape)
# ---------------------------------------------------------------------------

def _init_conv3d(key, kt, kh, kw, cin, cout, dtype, std=0.05):
    return {"w": (jax.random.normal(key, (kt, kh, kw, cin, cout),
                                    jnp.float32) * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _causal_conv3d(x, p, stride=(1, 1, 1)):
    """x [T, H, W, C]; causal on time; spatial SAME for stride 1,
    exact halving (no pad, k=2) for stride 2."""
    kt, kh, kw = p["w"].shape[:3]
    sp_pad = (kh // 2, kh // 2) if stride[1] == 1 else (0, 0)
    x = jnp.pad(x, ((kt - 1, 0), sp_pad, sp_pad, (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        x[None], p["w"], stride, "VALID",
        dimension_numbers=("NTHWC"[0] + "THW" + "C", "THWIO",
                           "NTHWC"[0] + "THW" + "C"))
    return y[0] + p["b"]


def _gn_silu(x, p, groups=8):
    c = x.shape[-1]
    g = min(groups, c)
    xr = x.reshape(*x.shape[:-1], g, c // g)
    m = jnp.mean(xr, axis=(0, 1, 2, 4), keepdims=True)
    var = jnp.var(xr, axis=(0, 1, 2, 4), keepdims=True)
    xr = (xr - m) * jax.lax.rsqrt(var + 1e-6)
    x = xr.reshape(x.shape) * p["scale"] + p["bias"]
    return jax.nn.silu(x)


def init_seedvr2_vae(key, cfg: SeedVR2Config, dtype=jnp.float32):
    chans = cfg.vae_channels
    lc = cfg.latent_channels
    keys = iter(jax.random.split(key, 64))

    def res(cin, cout):
        return {"n1": {"scale": jnp.ones((cin,), dtype),
                       "bias": jnp.zeros((cin,), dtype)},
                "c1": _init_conv3d(next(keys), 3, 3, 3, cin, cout,
                                   dtype),
                "n2": {"scale": jnp.ones((cout,), dtype),
                       "bias": jnp.zeros((cout,), dtype)},
                "c2": _init_conv3d(next(keys), 3, 3, 3, cout, cout,
                                   dtype),
                "sc": (None if cin == cout else _init_conv3d(
                    next(keys), 1, 1, 1, cin, cout, dtype))}

    enc = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, 3, chans[0],
                                   dtype), "downs": []}
    for i, ch in enumerate(chans):
        cin = chans[max(i - 1, 0)]
        stage = {"res": res(cin, ch)}
        if i < len(chans) - 1:
            temporal = i < cfg.temporal_scale_num
            stage["down"] = _init_conv3d(
                next(keys), 2 if temporal else 1, 2, 2, ch, ch, dtype)
            stage["tstride"] = 2 if temporal else 1
        enc["downs"].append(stage)
    enc["mid"] = res(chans[-1], chans[-1])
    enc["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, chans[-1],
                                   2 * lc, dtype)

    dec = {"conv_in": _init_conv3d(next(keys), 3, 3, 3, lc, chans[-1],
                                   dtype),
           "mid": res(chans[-1], chans[-1]), "ups": []}
    rev = list(reversed(chans))
    for i, ch in enumerate(rev):
        cout = rev[min(i + 1, len(rev) - 1)]
        stage = {"res": res(ch, ch)}
        if i < len(rev) - 1:
            temporal = i >= len(rev) - 1 - cfg.temporal_scale_num
            stage["tscale"] = 2 if temporal else 1
            stage["up"] = _init_conv3d(next(keys), 3, 3, 3, ch, cout,
                                       dtype)
        dec["ups"].append(stage)
    dec["conv_out"] = _init_conv3d(next(keys), 3, 3, 3, chans[0], 3,
                                   dtype)
    return {"enc": enc, "dec": dec}


def _res_forward(p, x):
    y = _gn_silu(x, p["n1"])
    y = _causal_conv3d(y, p["c1"])
    y = _gn_silu(y, p["n2"])
    y = _causal_conv3d(y, p["c2"])
    if p["sc"] is not None:
        x = _causal_conv3d(x, p["sc"])
    return x + y


def seedvr2_vae_encode(params, cfg: SeedVR2Config, video):
    """video [T, H, W, 3] in [-1, 1], T = 4n+1 -> latent
    [1 + (T-1)/4, H/8, W/8, latent_channels] (mean only)."""
    # causal temporal downsampling keeps the first frame separate:
    # duplicate frame 0 so strided convs produce 1 + (T-1)/s frames
    x = _causal_conv3d(video, params["enc"]["conv_in"])
    for st in params["enc"]["downs"]:
        x = _res_forward(st["res"], x)
        if "down" in st:
            ts = st["tstride"]
            if ts > 1:
                x = jnp.concatenate([x[:1], x], axis=0)
            x = _causal_conv3d(x, st["down"], stride=(ts, 2, 2))
    x = _res_forward(params["enc"]["mid"], x)
    x = _causal_conv3d(x, params["enc"]["conv_out"])
    return x[..., :cfg.latent_channels]


def seedvr2_vae_decode(params, cfg: SeedVR2Config, latent):
    x = _causal_conv3d(latent, params["dec"]["conv_in"])
    x = _res_forward(params["dec"]["mid"], x)
    for st in params["dec"]["ups"]:
        x = _res_forward(st["res"], x)
        if "up" in st:
            ts = st["tscale"]
            t, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
            if ts > 1:
                x = jnp.repeat(x, 2, axis=0)[ts - 1:]
            x = _causal_conv3d(x, st["up"])
    x = _causal_conv3d(x, params["dec"]["conv_out"])
    return jnp.tanh(x)


# ---------------------------------------------------------------------------
# wavelet color fix (runtime.py:119-143)
# ---------------------------------------------------------------------------

_WAVELET_KERNEL = np.asarray([[0.0625, 0.125, 0.0625],
                              [0.125, 0.25, 0.125],
                              [0.0625, 0.125, 0.0625]], np.float32)


def wavelet_low(img):
    """img [N, H, W, C] -> multi-radius low-pass band."""
    c = img.shape[-1]
    k = jnp.asarray(_WAVELET_KERNEL)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    for radius in (1, 2, 4, 8, 16):
        radius = min(radius, max(1, min(img.shape[1:3]) // 8))
        pad = ((0, 0), (radius, radius), (radius, radius), (0, 0))
        x = jnp.pad(img, pad, mode="edge")
        img = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", rhs_dilation=(radius, radius),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
    return img


def wavelet_color_fix(decoded, style):
    """Replace the decoded low band with the style's (both [N,H,W,C],
    [-1, 1])."""
    low_d = wavelet_low(decoded)
    low_s = wavelet_low(style)
    return jnp.clip(decoded - low_d + low_s, -1.0, 1.0)


# ---------------------------------------------------------------------------
# runtime
# ---------------------------------------------------------------------------

def init_seedvr2(key, cfg: SeedVR2Config = SeedVR2Config(),
                 dtype=jnp.float32, txt_len: int = 8):
    k1, k2, k3 = jax.random.split(key, 3)
    return {"dit": init_seedvr2_dit(k1, cfg, dtype),
            "vae": init_seedvr2_vae(k2, cfg, dtype),
            # pretrained positive text embedding placeholder
            "positive_embedding": (jax.random.normal(
                k3, (txt_len, cfg.txt_in_dim)) * 0.02).astype(dtype)}


def _pad_4n1(video):
    t = video.shape[0]
    if t % 4 == 1:
        return video
    count = ((t - 1) // 4 + 1) * 4 + 1 - t
    return jnp.concatenate(
        [video, jnp.repeat(video[-1:], count, axis=0)], axis=0)


def _crossfade(prev, cur):
    w = (0.5 - 0.5 * jnp.cos(jnp.linspace(0.0, jnp.pi,
                                          prev.shape[0])))[:, None,
                                                           None, None]
    return prev * (1.0 - w) + cur * w


def seedvr2_upscale(params, cfg: SeedVR2Config, video: np.ndarray,
                    scale: float = 2.0, seed: int = 0,
                    window_size: int = -1, window_overlap: int = 3,
                    progress_callback=None) -> np.ndarray:
    """video [T, H, W, 3] uint8 -> upscaled uint8 [T, sH', sW'] (one
    window unless window_size > 0; runtime.py upscale:303-320)."""
    t_total = video.shape[0]
    if window_size < 0 or t_total <= window_size:
        starts = [0]
    else:
        starts = list(range(0, t_total - window_overlap,
                            window_size - window_overlap))
    out = None
    oh = ow = None
    for wi, start in enumerate(starts):
        stop = (t_total if window_size < 0
                else min(start + window_size, t_total))
        chunk = _upscale_window(params, cfg, video[start:stop], scale,
                                seed)
        chunk = np.asarray(chunk)
        if out is None:
            oh, ow = chunk.shape[1:3]
            out = np.zeros((t_total, oh, ow, 3), np.uint8)
            out[:stop] = chunk
        else:
            ov = min(window_overlap, chunk.shape[0])
            mixed = _crossfade(
                jnp.asarray(out[start:start + ov], jnp.float32),
                jnp.asarray(chunk[:ov], jnp.float32))
            out[start:start + ov] = np.asarray(
                jnp.round(mixed)).astype(np.uint8)
            out[start + ov:stop] = chunk[ov:]
        if progress_callback is not None:
            progress_callback(wi + 1, len(starts))
    return out


def _upscale_window(params, cfg: SeedVR2Config, video, scale, seed):
    t_in = video.shape[0]
    oh = max(1, int(video.shape[1] * scale))
    ow = max(1, int(video.shape[2] * scale))
    x = jnp.asarray(video, jnp.float32)
    x = x / 255.0 if video.dtype == np.uint8 else (x + 1.0) / 2.0
    x = jax.image.resize(x, (t_in, oh, ow, 3), "cubic")
    x = jnp.clip(x, 0.0, 1.0) * 2.0 - 1.0
    pad_h = (-oh) % 16
    pad_w = (-ow) % 16
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    constant_values=-1.0)
    style = x[:, :oh, :ow]
    x = _pad_4n1(x)

    latent = seedvr2_vae_encode(params["vae"], cfg, x)
    latent = latent * cfg.latent_scale
    key = jax.random.key(seed)
    noise = jax.random.normal(key, latent.shape, jnp.float32)
    cond = jnp.concatenate(
        [noise, latent, jnp.ones(latent.shape[:-1] + (1,))], axis=-1)

    # patchify (1, 2, 2)
    tt, hh, wwid, cch = cond.shape
    ph, pw = cfg.patch_size[1], cfg.patch_size[2]
    hp, wp = hh // ph, wwid // pw
    # feature order per patch: "(T t)(H h)(W w) c -> T H W (t h w c)"
    tokens = cond.reshape(tt, hp, ph, wp, pw, cch).transpose(
        0, 1, 3, 2, 4, 5).reshape(tt, hp, wp, ph * pw * cch)
    pred = seedvr2_dit_forward(params["dit"], cfg, tokens,
                               params["positive_embedding"], 1000.0)
    pred = pred.reshape(tt, hp, wp, ph, pw,
                        cfg.vid_out_channels).transpose(
        0, 1, 3, 2, 4, 5).reshape(tt, hh, wwid, cfg.vid_out_channels)
    latent_out = (noise - pred) / cfg.latent_scale

    decoded = seedvr2_vae_decode(params["vae"], cfg, latent_out)
    decoded = decoded[:t_in, :oh, :ow]
    fixed = wavelet_color_fix(decoded, style[:t_in])
    out = jnp.round((fixed + 1.0) * 127.5)
    return jnp.clip(out, 0, 255).astype(jnp.uint8)
