"""PiD pixel-space diffusion 4x upscaler (PixDiT SR).

TPU-native re-design of /root/reference/postprocessing/pid/
(networks/pixeldit_official.py PixDiT_T2I + networks/pid_net.py PidNet +
networks/lq_projection_2d.py LQProjection2D + runtime.py PiDUpsampler):

* pixel-space flow matching at the OUTPUT resolution — no output VAE.
  The patch stream is an MMDiT over 16x16-pixel patch tokens (hidden
  1536, 14 blocks, joint text attention with per-stream q/k RMSNorm and
  NTK-aware 2D RoPE); the pixel stream refines per-pixel tokens (dim 16)
  inside each patch, conditioned on its patch token through per-pixel
  AdaLN, with a compressed cross-patch rotary attention
  (pixeldit_official.py PiTBlock);
* LQ conditioning (pid_net.py "controlnet" mode): the low-quality VAE
  latent is nearest-aligned to the patch grid, run through a conv
  ResBlock stack, projected by one zero-init head per injection point,
  and injected every `lq_interval` blocks through a sigma-aware gate
  x + sigmoid(W[x,lq] - e^a*sigma) * lq (lq_projection_2d.py:32-63);
* sampling (runtime.py:_decode_patch): few-step student schedule
  t = (0.999, 0.866, 0.634, 0.342, 0), velocity update
  x <- x - t_cur*v then renoise x <- (1-t_next)*x + t_next*eps;
* the 14 patch blocks are scanned as 7 stacked (inject+block, block)
  PAIRS — lq_interval=2 makes consecutive pairs homogeneous, so the
  whole depth is ONE `lax.scan` instead of an unrolled Python loop;
* tiled upsampling for big outputs (runtime.py:_decode_tiled) with
  linear-ramp overlap blending (runtime.py:_tile_weight);
* text conditioning: Gemma-2 caption embeddings [B, 300, 2304] are an
  input (the repo's Gemma/LM stack plugs in via text hooks; runtime.py
  _encode_text_raw's chi-prompt lives with the text encoder, not here).

The LQ latent comes from the FLUX VAE (models/flux/vae.py), matching the
reference "flux" backbone (runtime.py:_build_pid_vae).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

PID_STUDENT_T = (0.999, 0.866, 0.634, 0.342, 0.0)
PID_FM_TIMESCALE = 1000.0
PID_TILE_OVERLAP = 0.25
PID_TILE_INPUT = 512
PID_TILE_MIN_OUTPUT_PIXELS = 2048 * 2048


@dataclasses.dataclass(frozen=True)
class PiDConfig:
    """runtime.py:_build_pid_net flux-backbone dims."""
    in_channels: int = 3
    heads: int = 24
    hidden: int = 1536
    pixel_hidden: int = 16
    pixel_attn_hidden: int = 1152
    pixel_heads: int = 16
    patch_depth: int = 14
    pixel_depth: int = 2
    patch: int = 16
    txt_dim: int = 2304            # Gemma-2-2b hidden
    txt_max: int = 300
    lq_latent_channels: int = 16   # FLUX VAE
    lq_hidden: int = 512
    lq_res_blocks: int = 4
    lq_interval: int = 2
    sr_scale: int = 4
    latent_down: int = 8
    rope_ref: int = 1024
    rope_theta: float = 10000.0
    norm_eps: float = 1e-6

    @property
    def n_inject(self) -> int:
        return (self.patch_depth + self.lq_interval - 1) \
            // self.lq_interval

    @classmethod
    def tiny(cls):
        return cls(heads=4, hidden=32, pixel_hidden=4,
                   pixel_attn_hidden=16, pixel_heads=2, patch_depth=4,
                   pixel_depth=1, patch=4, txt_dim=8, txt_max=6,
                   lq_latent_channels=4, lq_hidden=8, lq_res_blocks=1,
                   rope_ref=64)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def _lin(key, din, dout, dtype, std=0.02, zero=False):
    w = (jnp.zeros((din, dout), jnp.float32) if zero else
         jax.random.normal(key, (din, dout), jnp.float32) * std)
    return {"w": w.astype(dtype), "b": jnp.zeros((dout,), dtype)}


def _dense(x, p):
    return x @ p["w"].astype(x.dtype) + p["b"].astype(x.dtype)


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


def _conv3(x, p):
    """[B, H, W, C] 3x3 SAME conv."""
    return jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + p["b"]


def _init_conv3(key, cin, cout, dtype, std=0.05):
    return {"w": (jax.random.normal(key, (3, 3, cin, cout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _group_norm(x, p, groups, eps=1e-6):
    b, h, w, c = x.shape
    xg = x.reshape(b, h, w, groups, c // groups).astype(jnp.float32)
    m = jnp.mean(xg, axis=(1, 2, 4), keepdims=True)
    v = jnp.var(xg, axis=(1, 2, 4), keepdims=True)
    xg = (xg - m) * jax.lax.rsqrt(v + eps)
    return (xg.reshape(b, h, w, c) * p["scale"] + p["bias"]).astype(
        x.dtype)


# ---------------------------------------------------------------------------
# RoPE (pixeldit_official.py:169-241)
# ---------------------------------------------------------------------------

def _rope_2d_ntk(head_dim: int, h: int, w: int, ref_h: int, ref_w: int,
                 theta: float = 10000.0, scale: float = 16.0):
    """[h*w, head_dim/2, 2] cos/sin; NTK base rescale per axis."""
    da = head_dim // 2
    h_theta = theta * ((h / ref_h) ** (da / (da - 2)) if da > 2 else 1.0)
    w_theta = theta * ((w / ref_w) ** (da / (da - 2)) if da > 2 else 1.0)
    xs = np.linspace(0, scale, w)
    ys = np.linspace(0, scale, h)
    gy, gx = np.meshgrid(ys, xs, indexing="ij")
    n4 = head_dim // 4
    fw = 1.0 / (w_theta ** (np.arange(0, head_dim, 4)[:n4] / head_dim))
    fh = 1.0 / (h_theta ** (np.arange(0, head_dim, 4)[:n4] / head_dim))
    xf = np.outer(gx.reshape(-1), fw)
    yf = np.outer(gy.reshape(-1), fh)
    freqs = np.stack([xf, yf], axis=-1).reshape(h * w, -1)
    return jnp.asarray(np.stack([np.cos(freqs), np.sin(freqs)], -1),
                       jnp.float32)


def _rope_1d(head_dim: int, length: int, theta: float = 10000.0):
    """Text stream 1D freqs (fetch_pos_text)."""
    freqs = 1.0 / (theta ** (np.arange(0, head_dim, 2) / head_dim))
    ang = np.outer(np.arange(length), freqs)
    return jnp.asarray(np.stack([np.cos(ang), np.sin(ang)], -1),
                       jnp.float32)


def _apply_rope(x, freqs):
    """x: [B, N, H, D]; freqs [N, D/2, 2] -> rotated
    (apply_rotary_emb_inplace pairwise convention)."""
    cos = freqs[..., 0][None, :, None, :].astype(jnp.float32)
    sin = freqs[..., 1][None, :, None, :].astype(jnp.float32)
    xp = x.astype(jnp.float32).reshape(*x.shape[:-1], -1, 2)
    x0, x1 = xp[..., 0], xp[..., 1]
    out = jnp.stack([x0 * cos - x1 * sin, x1 * cos + x0 * sin], -1)
    return out.reshape(x.shape).astype(x.dtype)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_pid_net(key, cfg: PiDConfig, dtype=jnp.float32
                 ) -> Dict[str, Any]:
    d, ph = cfg.hidden, cfg.pixel_hidden
    p2 = cfg.patch * cfg.patch
    keys = iter(jax.random.split(key, 64))

    def mmdit_block(k):
        ks = iter(jax.random.split(k, 12))
        return {"mod_x": _lin(next(ks), d, 6 * d, dtype),
                "mod_y": _lin(next(ks), d, 6 * d, dtype),
                "norm_x1": jnp.ones((d,), jnp.float32),
                "norm_y1": jnp.ones((d,), jnp.float32),
                "qkv_x": _lin(next(ks), d, 3 * d, dtype),
                "qkv_y": _lin(next(ks), d, 3 * d, dtype),
                "qn_x": jnp.ones((d // cfg.heads,), jnp.float32),
                "kn_x": jnp.ones((d // cfg.heads,), jnp.float32),
                "qn_y": jnp.ones((d // cfg.heads,), jnp.float32),
                "kn_y": jnp.ones((d // cfg.heads,), jnp.float32),
                "proj_x": _lin(next(ks), d, d, dtype),
                "proj_y": _lin(next(ks), d, d, dtype),
                "norm_x2": jnp.ones((d,), jnp.float32),
                "norm_y2": jnp.ones((d,), jnp.float32),
                "mlp_x1": _lin(next(ks), d, 4 * d, dtype),
                "mlp_x2": _lin(next(ks), 4 * d, d, dtype),
                "mlp_y1": _lin(next(ks), d, 4 * d, dtype),
                "mlp_y2": _lin(next(ks), 4 * d, d, dtype)}

    def gate(k):
        # lq_projection_2d.py:44-49: bias 2.0, log_alpha=log 5
        g = _lin(k, 2 * d, d, dtype, std=0.01)
        return {"proj": {"w": g["w"],
                         "b": jnp.full((d,), 2.0, dtype)},
                "log_alpha": jnp.asarray(math.log(5.0), jnp.float32)}

    def stack(fn, n):
        ks = jax.random.split(next(keys), n)
        leaves = [fn(k) for k in ks]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *leaves)

    # scan unit: (inject + block, block) pair
    n_pairs = cfg.patch_depth // cfg.lq_interval
    assert cfg.patch_depth % cfg.lq_interval == 0 \
        and cfg.lq_interval == 2, \
        "scan pairing assumes patch_depth % lq_interval == 0, interval 2"

    def pair(k):
        k1, k2, k3 = jax.random.split(k, 3)
        return {"gate": gate(k1), "b0": mmdit_block(k2),
                "b1": mmdit_block(k3)}

    def resblock(k):
        k1, k2 = jax.random.split(k)
        c = cfg.lq_hidden
        return {"gn1": {"scale": jnp.ones((c,), dtype),
                        "bias": jnp.zeros((c,), dtype)},
                "conv1": _init_conv3(k1, c, c, dtype),
                "gn2": {"scale": jnp.ones((c,), dtype),
                        "bias": jnp.zeros((c,), dtype)},
                "conv2": _init_conv3(k2, c, c, dtype)}

    def pit_block(k):
        ks = iter(jax.random.split(k, 8))
        ad = cfg.pixel_attn_hidden
        return {"norm1": jnp.ones((ph,), jnp.float32),
                "ada": _lin(next(ks), d, 6 * ph * p2, dtype),
                "compress": _lin(next(ks), p2 * ph, ad, dtype),
                "qkv": _lin(next(ks), ad, 3 * ad, dtype),
                "attn_o": _lin(next(ks), ad, ad, dtype),
                "expand": _lin(next(ks), ad, p2 * ph, dtype),
                "norm2": jnp.ones((ph,), jnp.float32),
                "mlp1": _lin(next(ks), ph, 4 * ph, dtype),
                "mlp2": _lin(next(ks), 4 * ph, ph, dtype)}

    return {
        "s_embed": _lin(next(keys), cfg.in_channels * p2, d, dtype),
        "pixel_embed": _lin(next(keys), cfg.in_channels, ph, dtype),
        "t_mlp1": _lin(next(keys), 256, d, dtype),
        "t_mlp2": _lin(next(keys), d, d, dtype),
        "y_embed": _lin(next(keys), cfg.txt_dim, d, dtype),
        "y_norm": jnp.ones((d,), jnp.float32),
        "y_pos": (jax.random.normal(next(keys), (cfg.txt_max, d),
                                    jnp.float32)).astype(dtype),
        "pairs": stack(pair, n_pairs),
        # LQ latent projection (lq_projection_2d.py latent branch)
        "lq_in1": _init_conv3(next(keys), cfg.lq_latent_channels,
                              cfg.lq_hidden, dtype),
        "lq_in2": _init_conv3(next(keys), cfg.lq_hidden, cfg.lq_hidden,
                              dtype),
        "lq_res": [resblock(k) for k in
                   jax.random.split(next(keys), cfg.lq_res_blocks)],
        # zero-init output heads — net starts as the pretrained T2I
        "lq_heads": [_lin(next(keys), cfg.lq_hidden, d, dtype,
                          zero=True) for _ in range(cfg.n_inject)],
        "pixel_blocks": [pit_block(k) for k in
                         jax.random.split(next(keys), cfg.pixel_depth)],
        "final_norm": jnp.ones((ph,), jnp.float32),
        "final_proj": _lin(next(keys), ph, cfg.in_channels, dtype),
    }


# ---------------------------------------------------------------------------
# LQ projection
# ---------------------------------------------------------------------------

def _lq_features(params, cfg: PiDConfig, lq_latent, ph_grid, pw_grid):
    """lq_latent [B, zH, zW, z] -> list of n_inject [B, N, hidden]
    zero-init-headed features (lq_projection_2d.py:408-464)."""
    ratio = (cfg.sr_scale * cfg.latent_down) // cfg.patch
    x = lq_latent
    if ratio > 1:
        x = jnp.repeat(jnp.repeat(x, ratio, axis=1), ratio, axis=2)
    if x.shape[1] != ph_grid or x.shape[2] != pw_grid:
        yi = (jnp.arange(ph_grid) * x.shape[1] // ph_grid)
        xi = (jnp.arange(pw_grid) * x.shape[2] // pw_grid)
        x = x[:, yi][:, :, xi]
    x = _conv3(jax.nn.silu(_conv3(x, params["lq_in1"])),
               params["lq_in2"])
    for rb in params["lq_res"]:
        y = _conv3(jax.nn.silu(_group_norm(x, rb["gn1"], 4)),
                   rb["conv1"])
        y = _conv3(jax.nn.silu(_group_norm(y, rb["gn2"], 4)),
                   rb["conv2"])
        x = x + y
    tokens = x.reshape(x.shape[0], ph_grid * pw_grid, -1)
    return jnp.stack([_dense(tokens, h) for h in params["lq_heads"]])


def _sigma_gate(gp, x, lq, sigma):
    """x + sigmoid(W[x,lq]+b - e^a*sigma)*lq
    (SigmaAwareGatePerTokenPerDim)."""
    logit = _dense(jnp.concatenate([x, lq], -1), gp["proj"])
    off = -jnp.exp(gp["log_alpha"]) * sigma[:, None, None]
    return x + jax.nn.sigmoid(logit.astype(jnp.float32)
                              + off).astype(x.dtype) * lq


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------

def _mmdit_block(lp, cfg: PiDConfig, x, y, cond, pos_img, pos_txt):
    """MMDiTBlockT2I (pixeldit_official.py:733-798)."""
    b, nx, d = x.shape
    ny = y.shape[1]
    heads = cfg.heads
    hd = d // heads

    mx = _dense(jax.nn.silu(cond), lp["mod_x"])
    my = _dense(jax.nn.silu(cond), lp["mod_y"])
    sx, scx, gx, smx, ssx, gmx = jnp.split(mx, 6, -1)
    sy, scy, gy, smy, ssy, gmy = jnp.split(my, 6, -1)

    ax = _rms(x, lp["norm_x1"], cfg.norm_eps) * (1 + scx) + sx
    ay = _rms(y, lp["norm_y1"], cfg.norm_eps) * (1 + scy) + sy

    qkv_x = _dense(ax, lp["qkv_x"]).reshape(b, nx, 3, heads, hd)
    qkv_y = _dense(ay, lp["qkv_y"]).reshape(b, ny, 3, heads, hd)
    qx = _apply_rope(_rms(qkv_x[:, :, 0], lp["qn_x"]), pos_img)
    kx = _apply_rope(_rms(qkv_x[:, :, 1], lp["kn_x"]), pos_img)
    qy = _rms(qkv_y[:, :, 0], lp["qn_y"])
    ky = _rms(qkv_y[:, :, 1], lp["kn_y"])
    if pos_txt is not None:
        qy = _apply_rope(qy, pos_txt)
        ky = _apply_rope(ky, pos_txt)
    q = jnp.concatenate([qy, qx], axis=1)
    k = jnp.concatenate([ky, kx], axis=1)
    v = jnp.concatenate([qkv_y[:, :, 2], qkv_x[:, :, 2]], axis=1)
    w = jax.nn.softmax(
        jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhls,bshd->blhd", w, v).reshape(b, ny + nx, d)
    x = x + gx * _dense(o[:, ny:], lp["proj_x"])
    y = y + gy * _dense(o[:, :ny], lp["proj_y"])

    fx = _rms(x, lp["norm_x2"], cfg.norm_eps) * (1 + ssx) + smx
    x = x + gmx * _dense(jax.nn.gelu(_dense(fx, lp["mlp_x1"]),
                                     approximate=True), lp["mlp_x2"])
    fy = _rms(y, lp["norm_y2"], cfg.norm_eps) * (1 + ssy) + smy
    y = y + gmy * _dense(jax.nn.gelu(_dense(fy, lp["mlp_y1"]),
                                     approximate=True), lp["mlp_y2"])
    return x, y


def _pit_block(bp, cfg: PiDConfig, xp, s_cond, pos):
    """PiTBlock (pixeldit_official.py:485-598): per-pixel AdaLN from the
    patch token, cross-patch attention on compressed patch vectors.
    xp: [B, L, P2, ph]; s_cond [B, L, d]."""
    b, l, p2, ph = xp.shape
    ad = cfg.pixel_attn_hidden
    heads = cfg.pixel_heads
    hd = ad // heads
    mods = _dense(s_cond, bp["ada"]).reshape(b, l, p2, 6 * ph)
    sm, sc, gm, smm, ssm, gmm = jnp.split(mods, 6, -1)
    xn = _rms(xp, bp["norm1"], cfg.norm_eps) * (1 + sc) + sm
    comp = _dense(xn.reshape(b, l, p2 * ph), bp["compress"])
    qkv = _dense(comp, bp["qkv"]).reshape(b, l, 3, heads, hd)
    q = _apply_rope(qkv[:, :, 0], pos)
    k = _apply_rope(qkv[:, :, 1], pos)
    w = jax.nn.softmax(
        jnp.einsum("blhd,bshd->bhls", q, k).astype(jnp.float32)
        / math.sqrt(hd), axis=-1).astype(xp.dtype)
    o = jnp.einsum("bhls,bshd->blhd", w, qkv[:, :, 2]).reshape(b, l, ad)
    exp = _dense(_dense(o, bp["attn_o"]),
                 bp["expand"]).reshape(b, l, p2, ph)
    xp = xp + gm * exp
    xm = _rms(xp, bp["norm2"], cfg.norm_eps) * (1 + ssm) + smm
    xp = xp + gmm * _dense(jax.nn.gelu(_dense(xm, bp["mlp1"]),
                                       approximate=True), bp["mlp2"])
    return xp


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _t_embed(params, t):
    """TimestepConditioner: max_period 10 (!)
    (pixeldit_official.py:106-115)."""
    half = 128
    freqs = jnp.exp(-math.log(10.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)
    return _dense(jax.nn.silu(_dense(emb, params["t_mlp1"])),
                  params["t_mlp2"])


def _pixel_pos(dim: int, h: int, w: int):
    """Full-image 2D sincos for the pixel stream
    (pixeldit_official.py get_2d_sincos_pos_embed; w-first grid)."""
    def emb1d(pos):
        half = dim // 4
        omega = 1.0 / 10000 ** (np.arange(half) / half)
        out = np.outer(pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], 1)

    gw, gh = np.meshgrid(np.arange(w, dtype=np.float32),
                         np.arange(h, dtype=np.float32))
    e = np.concatenate([emb1d(gw), emb1d(gh)], axis=1)
    return jnp.asarray(e, jnp.float32).reshape(h, w, dim)


def pid_net(params, cfg: PiDConfig, x, t, y, lq_latent, sigma):
    """x: [B, H, W, 3] noisy pixels (H, W multiples of patch); t [B]
    (already x FM_TIMESCALE); y [B, Ltxt, txt_dim]; lq_latent
    [B, zH, zW, z]; sigma [B] -> velocity [B, H, W, 3]
    (pid_net.py:286-512 forward, standard non-ED path)."""
    b, hh, ww, c = x.shape
    p = cfg.patch
    gh, gw = hh // p, ww // p
    l = gh * gw
    p2 = p * p
    d = cfg.hidden

    lq = _lq_features(params, cfg, lq_latent, gh, gw)  # [n_inj, B, L, d]

    # patch tokens
    xp = x.reshape(b, gh, p, gw, p, c).transpose(0, 1, 3, 2, 4, 5)
    xp_flat = xp.reshape(b, l, p2 * c)
    s = _dense(xp_flat, params["s_embed"])

    t_emb = _t_embed(params, t)[:, None]          # [B, 1, d]
    cond = jax.nn.silu(t_emb)

    ltxt = min(y.shape[1], cfg.txt_max)
    y_emb = _rms(_dense(y[:, :ltxt], params["y_embed"]),
                 params["y_norm"], cfg.norm_eps)
    y_emb = y_emb + params["y_pos"][:ltxt].astype(y_emb.dtype)[None]

    hd = d // cfg.heads
    pos_img = _rope_2d_ntk(hd, gh, gw, cfg.rope_ref // p,
                           cfg.rope_ref // p, cfg.rope_theta)
    pos_txt = _rope_1d(hd, ltxt, cfg.rope_theta)

    def pair_body(carry, xs):
        s, y_emb = carry
        lp, lq_f = xs
        s = _sigma_gate(lp["gate"], s, lq_f, sigma)
        s, y_emb = _mmdit_block(lp["b0"], cfg, s, y_emb, cond,
                                pos_img, pos_txt)
        s, y_emb = _mmdit_block(lp["b1"], cfg, s, y_emb, cond,
                                pos_img, pos_txt)
        return (s, y_emb), None

    (s, _), _ = jax.lax.scan(pair_body, (s, y_emb),
                             (params["pairs"], lq))
    s = jax.nn.silu(s + t_emb)                    # [B, L, d]

    # pixel pathway
    px = _dense(x, params["pixel_embed"])         # [B, H, W, ph]
    px = px + _pixel_pos(cfg.pixel_hidden, hh, ww).astype(px.dtype)
    px = px.reshape(b, gh, p, gw, p, cfg.pixel_hidden)
    px = px.transpose(0, 1, 3, 2, 4, 5).reshape(b, l, p2,
                                                cfg.pixel_hidden)
    pos_pit = _rope_2d_ntk(cfg.pixel_attn_hidden // cfg.pixel_heads,
                           gh, gw, cfg.rope_ref // p, cfg.rope_ref // p,
                           cfg.rope_theta)
    for bp in params["pixel_blocks"]:
        px = _pit_block(bp, cfg, px, s, pos_pit)

    out = _dense(_rms(px, params["final_norm"], cfg.norm_eps),
                 params["final_proj"])            # [B, L, P2, 3]
    out = out.reshape(b, gh, gw, p, p, c).transpose(0, 1, 3, 2, 4, 5)
    return out.reshape(b, hh, ww, c)


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def pid_sample(params, cfg: PiDConfig, y, lq_latent, out_h, out_w, *,
               num_steps: int = 4, seed: int = 0,
               sigma: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Few-step pixel flow matching (runtime.py:_decode_patch).
    Returns [B, out_h, out_w, 3] in [-1, 1]."""
    b = y.shape[0]
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, (b, out_h, out_w, cfg.in_channels),
                          jnp.float32)
    full_t = np.asarray(PID_STUDENT_T, np.float64)
    if num_steps != len(full_t) - 1:
        idx = np.round(np.linspace(0, len(full_t) - 1,
                                   num_steps + 1)).astype(int)
        full_t = full_t[idx]
    if sigma is None:
        sigma = jnp.zeros((b,), jnp.float32)

    net = jax.jit(lambda xx, tt: pid_net(params, cfg, xx, tt, y,
                                         lq_latent, sigma))
    for t_cur, t_next in zip(full_t[:-1], full_t[1:]):
        t_vec = jnp.full((b,), t_cur * PID_FM_TIMESCALE, jnp.float32)
        v = net(x, t_vec)
        x = x - float(t_cur) * v
        if t_next > 0:
            key, ke = jax.random.split(key)
            eps = jax.random.normal(ke, x.shape, x.dtype)
            x = (1.0 - float(t_next)) * x + float(t_next) * eps
    return jnp.clip(x, -1.0, 1.0)


# ---------------------------------------------------------------------------
# tiled upscale
# ---------------------------------------------------------------------------

def _tile_axis(length: int, tile: int) -> List[Tuple[int, int]]:
    """Split an LQ axis into tile spans with PID_TILE_OVERLAP overlap."""
    if length <= tile:
        return [(0, length)]
    stride = max(1, int(tile * (1 - PID_TILE_OVERLAP)))
    spans = []
    pos = 0
    while True:
        end = min(pos + tile, length)
        spans.append((end - tile if end == length else pos, end))
        if end == length:
            break
        pos += stride
    return spans


def _ramp_weight(th: int, tw: int, top: int, left: int, bottom: int,
                 right: int, full_h: int, full_w: int) -> np.ndarray:
    """runtime.py:_tile_weight linear edge ramps."""
    wy = np.ones(th, np.float32)
    wx = np.ones(tw, np.float32)
    oy = max(1, int(round(th * PID_TILE_OVERLAP)))
    ox = max(1, int(round(tw * PID_TILE_OVERLAP)))
    if top > 0:
        wy[:oy] = np.linspace(0.0, 1.0, oy)
    if bottom < full_h:
        wy[-oy:] = np.linspace(1.0, 0.0, oy)
    if left > 0:
        wx[:ox] = np.linspace(0.0, 1.0, ox)
    if right < full_w:
        wx[-ox:] = np.linspace(1.0, 0.0, ox)
    return np.outer(wy, wx)[..., None]


def pid_upscale(params, cfg: PiDConfig, image: np.ndarray, *,
                vae_encode_fn: Callable, caption_embs=None,
                num_steps: int = 4, seed: int = 0,
                tile_input: int = PID_TILE_INPUT) -> np.ndarray:
    """4x upscale a uint8 [H, W, 3] image (runtime.py:decode).
    `vae_encode_fn(img_f32_nhwc) -> latent [1, zH, zW, z]` supplies the
    LQ latent (FLUX VAE).  Tiles when the output exceeds the pixel
    budget; ramp-blended accumulation in float before quantizing."""
    h, w = image.shape[:2]
    sr = cfg.sr_scale
    if caption_embs is None:
        caption_embs = jnp.zeros((1, cfg.txt_max, cfg.txt_dim),
                                 jnp.float32)
    img_f = image.astype(np.float32) / 127.5 - 1.0

    tiled = (h * sr) * (w * sr) > PID_TILE_MIN_OUTPUT_PIXELS
    spans_y = _tile_axis(h, tile_input) if tiled else [(0, h)]
    spans_x = _tile_axis(w, tile_input) if tiled else [(0, w)]

    full_h, full_w = h * sr, w * sr
    acc = np.zeros((full_h, full_w, 3), np.float32)
    norm = np.zeros((full_h, full_w, 1), np.float32)
    tile_no = 0
    for top, bottom in spans_y:
        for left, right in spans_x:
            lq = img_f[top:bottom, left:right]
            lat = jnp.asarray(vae_encode_fn(lq[None]))
            oh, ow = (bottom - top) * sr, (right - left) * sr
            out = pid_sample(params, cfg, caption_embs, lat, oh, ow,
                             num_steps=num_steps, seed=seed + tile_no)
            out_np = np.asarray(out[0], np.float32)
            wgt = _ramp_weight(oh, ow, top * sr, left * sr,
                               bottom * sr, right * sr, full_h, full_w)
            acc[top * sr:bottom * sr, left * sr:right * sr] += \
                out_np * wgt
            norm[top * sr:bottom * sr, left * sr:right * sr] += wgt
            tile_no += 1
    out = acc / np.maximum(norm, 1e-6)
    return np.round((np.clip(out, -1, 1) + 1.0) * 127.5).astype(
        np.uint8)
