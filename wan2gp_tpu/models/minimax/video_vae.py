"""MiniMax H3 video autoencoder: causal CNN encoder + ViT decoder.

Functional re-implementation of the reference AutoencoderKLMiniMaxH3
(/root/reference/models/minimax_h3/components/video_autoencoder.py):
- encoder: causal 3D CNN, reflect spatial padding, zero temporal front
  padding (:37-68); per-frame GroupNorm (time folded into batch, :71-84);
  6 levels (128,256,256,512,512,1024) with spatial strides (2,2,2,2,1,1)
  and temporal (1,2,2,1,1,1) -> 16x/4x compression; stride-2 levels pad
  bottom/right by 1 (ceil division, :132-165).
- decoder: NON-causal ViT (:463-565): one token per latent voxel + 4
  learned register tokens + one zero cls token (positions 0), 36 blocks of
  RMS-normed attention (no-affine per-head qk RMSNorm, interleaved fused
  qkv) with zero-init per-block residual scales, gated-silu FFN, rope over
  the first 3/4 of each head from per-axis [-1,1) grids * 2*pi, theta 100
  (:279-296, :352-368 half-style rotation with tiled tables).
- latents normalized by per-channel latents_mean / latents_std (:574-575).
- temporal chunking (:860-940): encode per 17-frame clip, drop 3 trailing
  latent tokens; decode chunks of 5 tokens + 2 overlap tokens, trim 3
  pre-padding frames, cross-fade 5 overlapping frames.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ...ops.attention import attention


@dataclasses.dataclass(frozen=True)
class MiniMaxVideoVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 24
    block_out_channels: Tuple[int, ...] = (128, 256, 256, 512, 512, 1024)
    layers_per_block: int = 2
    spatial_factors: Tuple[int, ...] = (2, 2, 2, 2, 1, 1)
    temporal_factors: Tuple[int, ...] = (1, 2, 2, 1, 1, 1)
    norm_groups: int = 32
    decoder_layers: int = 36
    decoder_heads: int = 32
    decoder_head_dim: int = 64
    num_register_tokens: int = 4
    ffn_mult: int = 4
    rope_theta: float = 100.0
    rope_dim_ratio: float = 0.75
    clip_length: int = 17
    token_drop: int = 3
    compute_dtype: Any = jnp.float32

    @property
    def spatial_ratio(self):
        return int(np.prod(self.spatial_factors))

    @property
    def temporal_ratio(self):
        return int(np.prod(self.temporal_factors))

    @property
    def decoder_dim(self):
        return self.decoder_heads * self.decoder_head_dim


# ---------------------------------------------------------------------------
# encoder primitives
# ---------------------------------------------------------------------------

def _conv3d(x, p, stride=(1, 1, 1), spatial_pad=0, temporal_pad=0,
            pre_spatial_pad=None):
    """Causal conv: reflect spatial pad, zero temporal FRONT pad
    (video_autoencoder.py:59-68).  pre_spatial_pad: extra (bottom, right)
    asymmetric pad for stride-2 levels (:161-163)."""
    if spatial_pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (spatial_pad, spatial_pad),
                        (spatial_pad, spatial_pad), (0, 0)], mode="reflect")
    if pre_spatial_pad:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, pre_spatial_pad),
                        (0, pre_spatial_pad), (0, 0)], mode="reflect")
    if temporal_pad:
        x = jnp.pad(x, [(0, 0), (temporal_pad, 0), (0, 0), (0, 0), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["b"].astype(y.dtype)


def _frame_group_norm(x, p, groups, eps=1e-6):
    """GroupNorm with time folded into batch (per-frame statistics,
    video_autoencoder.py:71-84).  x: [B, T, H, W, C]."""
    b, t, h, w, c = x.shape
    x32 = x.astype(jnp.float32).reshape(b * t, h, w, groups, c // groups)
    mean = jnp.mean(x32, axis=(1, 2, 4), keepdims=True)
    var = jnp.var(x32, axis=(1, 2, 4), keepdims=True)
    y = ((x32 - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, h, w, c)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _enc_res(p, x, groups):
    h = jax.nn.silu(_frame_group_norm(x, p["norm1"], groups)
                    .astype(jnp.float32)).astype(x.dtype)
    h = _conv3d(h, p["conv1"], spatial_pad=1, temporal_pad=2)
    h = jax.nn.silu(_frame_group_norm(h, p["norm2"], groups)
                    .astype(jnp.float32)).astype(x.dtype)
    h = _conv3d(h, p["conv2"], spatial_pad=1, temporal_pad=2)
    if "shortcut" in p:
        x = _conv3d(x, p["shortcut"])
    return x + h


def minimax_vae_encode_clip(params, cfg: MiniMaxVideoVAEConfig, video):
    """video: [B, 3, T, H, W] one clip.  Returns mean latents
    [B, C_z, T', H', W'] (already mean-of-moments, normalized)."""
    x = video.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    enc = params["encoder"]
    x = _conv3d(x, enc["conv_in"], spatial_pad=1, temporal_pad=2)
    for level, blk in enumerate(enc["levels"]):
        for rp in blk["res"]:
            x = _enc_res(rp, x, cfg.norm_groups)
        if "down" in blk:
            ts = cfg.temporal_factors[level]
            ss = cfg.spatial_factors[level]
            x = _conv3d(x, blk["down"], stride=(ts, ss, ss),
                        temporal_pad=2,
                        pre_spatial_pad=1 if ss == 2 else None)
    x = jax.nn.silu(_frame_group_norm(x, enc["norm_out"], cfg.norm_groups)
                    .astype(jnp.float32)).astype(x.dtype)
    x = _conv3d(x, enc["conv_out"], spatial_pad=1, temporal_pad=2)
    x = _conv3d(x, params["quant_conv"])
    mean = x[..., :cfg.latent_channels]
    z = (mean - params["latents_mean"]) / params["latents_std"]
    return z.transpose(0, 4, 1, 2, 3)


# ---------------------------------------------------------------------------
# ViT decoder
# ---------------------------------------------------------------------------

def _rms(x, w=None, eps=1e-5):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, axis=-1, keepdims=True)
                            + eps)
    if w is not None:
        y = y * w
    return y.astype(x.dtype)


def _vit_rope_tables(t, h, w, cfg: MiniMaxVideoVAEConfig):
    """cos/sin [L_tokens(+suffix), rotary_dim]; suffix rows angle 0."""
    rotary = int(cfg.decoder_head_dim * cfg.rope_dim_ratio)
    inv = 1.0 / cfg.rope_theta ** np.arange(
        0, 1, 2 * 3 / rotary, dtype=np.float64)
    grids = [2.0 * (np.arange(0.5, s) / s) - 1.0 for s in (t, h, w)]
    tt, hh, ww = np.meshgrid(*grids, indexing="ij")
    pos = np.stack([tt.ravel(), hh.ravel(), ww.ravel()], axis=-1)
    pos = np.concatenate(
        [pos, np.zeros((cfg.num_register_tokens + 1, 3))], axis=0)
    ang = 2.0 * math.pi * pos[:, :, None] * inv[None, None]
    ang = np.tile(ang.reshape(pos.shape[0], -1), 2)    # [L, rotary]
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


def _vit_rope_apply(x, cos, sin):
    r = cos.shape[-1]
    half = r // 2
    xr = x[..., :r].astype(jnp.float32)
    first, second = xr[..., :half], xr[..., half:]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    f = first * c[..., :half] - second * s[..., :half]
    sec = second * c[..., half:] + first * s[..., half:]
    return jnp.concatenate([f.astype(x.dtype), sec.astype(x.dtype),
                            x[..., r:]], axis=-1)


def minimax_vae_decode_clip(params, cfg: MiniMaxVideoVAEConfig, z,
                            attn_backend="auto"):
    """z: [B, C_z, T', H', W'] normalized latents (one chunk).
    Returns video [B, 3, T'*pt, H'*ps, W'*ps]."""
    cdt = cfg.compute_dtype
    z = z.transpose(0, 2, 3, 4, 1).astype(cdt)
    z = z * params["latents_std"] + params["latents_mean"]
    z = _conv3d(z, params["post_quant_conv"])
    b, t, h, w, c = z.shape
    dec = params["decoder"]
    x = jnp.dot(z.reshape(b, t * h * w, c),
                dec["x_embedder"]["w"].astype(cdt)) \
        + dec["x_embedder"]["b"].astype(cdt)
    reg = jnp.broadcast_to(dec["register_tokens"].astype(cdt),
                           (b, cfg.num_register_tokens, cfg.decoder_dim))
    cls = jnp.zeros((b, 1, cfg.decoder_dim), cdt)
    x = jnp.concatenate([x, reg, cls], axis=1)
    cos, sin = _vit_rope_tables(t, h, w, cfg)

    n, hd = cfg.decoder_heads, cfg.decoder_head_dim

    def body(x, bp):
        l = x.shape[1]
        y = _rms(x, bp["norm1"]["w"])
        qkv = (jnp.dot(y, bp["qkv"]["w"].astype(y.dtype))
               + bp["qkv"]["b"].astype(y.dtype))
        # interleaved per-head (q, k, v) triplets (:343)
        qkv = qkv.reshape(b, l, n, 3, hd)
        q = _rms(qkv[:, :, :, 0])
        k = _rms(qkv[:, :, :, 1])
        v = qkv[:, :, :, 2]
        q = _vit_rope_apply(q, cos, sin)
        k = _vit_rope_apply(k, cos, sin)
        o = attention(q, k, v, backend=attn_backend).reshape(b, l, n * hd)
        o = jnp.dot(o, bp["o"]["w"].astype(o.dtype)) + bp["o"]["b"]
        x = x + o * bp["scale1"]
        y = _rms(x, bp["norm2"]["w"])
        hmid = (jnp.dot(y, bp["w1"]["w"].astype(y.dtype))
                + bp["w1"]["b"].astype(y.dtype))
        gate, value = jnp.split(hmid, 2, axis=-1)
        hmid = jax.nn.silu(gate.astype(jnp.float32)).astype(y.dtype) * value
        f = jnp.dot(hmid, bp["w2"]["w"].astype(y.dtype)) + bp["w2"]["b"]
        return x + f * bp["scale2"], None

    x, _ = jax.lax.scan(body, x, dec["blocks"])
    x = x[:, :t * h * w]
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    x = ((x32 - mean) * jax.lax.rsqrt(var + 1e-5) * dec["norm_out"]["w"]
         + dec["norm_out"]["b"]).astype(cdt)
    x = jnp.dot(x, dec["proj_out"]["w"].astype(cdt)) + dec["proj_out"]["b"]
    pt, ps = cfg.temporal_ratio, cfg.spatial_ratio
    x = x.reshape(b, t, h, w, cfg.out_channels, pt, ps, ps)
    x = x.transpose(0, 4, 1, 5, 2, 6, 3, 7)
    return x.reshape(b, cfg.out_channels, t * pt, h * ps, w * ps)


# ---------------------------------------------------------------------------
# chunked encode / decode (host loop; geometry :658-665, :860-940)
# ---------------------------------------------------------------------------

def minimax_vae_encode(params, cfg: MiniMaxVideoVAEConfig, video):
    """video: [B, 3, T, H, W]; T padded (edge) to a clip multiple; 3
    trailing latent tokens dropped per full encode."""
    clip = cfg.clip_length
    t = video.shape[2]
    pad = (-t) % clip
    if pad:
        video = jnp.concatenate(
            [video, jnp.repeat(video[:, :, -1:], pad, axis=2)], axis=2)
    chunks = [minimax_vae_encode_clip(
        params, cfg, video[:, :, i * clip:(i + 1) * clip])
        for i in range(video.shape[2] // clip)]
    z = jnp.concatenate(chunks, axis=2)
    if cfg.token_drop > 0:
        z = z[:, :, :-cfg.token_drop]
    return z


def minimax_vae_decode(params, cfg: MiniMaxVideoVAEConfig, z,
                       attn_backend="auto"):
    """Inverse chunking with frame cross-fade (video_autoencoder.py
    :886-940)."""
    tr = cfg.temporal_ratio
    tokens_chunk = math.ceil(cfg.clip_length / tr)
    token_drop = cfg.token_drop
    token_overlap = (-token_drop) % tokens_chunk
    frame_pre_pad = (-cfg.clip_length) % tr
    frame_overlap = max(token_overlap * tr - frame_pre_pad, 0)
    chunk_frames = tokens_chunk * tr

    num_tokens = z.shape[2] + token_drop
    pad_tokens = (-num_tokens) % tokens_chunk
    num_chunks = (num_tokens + pad_tokens) // tokens_chunk \
        - int(token_drop > 0)
    if pad_tokens:
        z = jnp.concatenate(
            [z, jnp.repeat(z[:, :, -1:], pad_tokens, axis=2)], axis=2)

    intra_tail = cfg.clip_length % tr
    n_before = z.shape[2] - pad_tokens
    pad_frames = sum(
        intra_tail if intra_tail and (n_before + k) % tokens_chunk == 0
        else tr for k in range(pad_tokens))
    out_frames = num_chunks * (chunk_frames - frame_pre_pad) \
        + frame_overlap - pad_frames

    pieces: List[Any] = []
    overlap = None
    written = 0
    for i in range(num_chunks):
        start = i * tokens_chunk
        clip = minimax_vae_decode_clip(
            params, cfg, z[:, :, start:start + tokens_chunk + token_overlap],
            attn_backend=attn_backend)
        for j in range(int(token_drop > 0) + 1):
            chunk = clip[:, :, j * chunk_frames:(j + 1) * chunk_frames]
            chunk = chunk[:, :, frame_pre_pad:]
            if j == 0:
                if overlap is not None:
                    k = min(overlap.shape[2], chunk.shape[2], frame_overlap)
                    wgt = (jnp.arange(k) / k).reshape(1, 1, k, 1, 1)
                    blended = overlap[:, :, -k:] * (1 - wgt) \
                        + chunk[:, :, :k] * wgt
                    chunk = jnp.concatenate([blended, chunk[:, :, k:]],
                                            axis=2)
                copy = min(chunk.shape[2], out_frames - written)
                if copy > 0:
                    pieces.append(chunk[:, :, :copy])
                    written += copy
            else:
                overlap = chunk
    if overlap is not None:
        copy = min(overlap.shape[2], out_frames - written)
        if copy > 0:
            pieces.append(overlap[:, :, :copy])
            written += copy
    return jnp.concatenate(pieces, axis=2)


# ---------------------------------------------------------------------------
# init / load
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k ** 3)
    return {"w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _lin_p(key, din, dout, dtype=jnp.float32):
    s = math.sqrt(6.0 / (din + dout))
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32, -s, s
                                    ).astype(dtype),
            "b": jnp.zeros((dout,), dtype)}


def _norm_p(c):
    return {"w": jnp.ones((c,), jnp.float32),
            "b": jnp.zeros((c,), jnp.float32)}


def init_minimax_video_vae(key, cfg: MiniMaxVideoVAEConfig =
                           MiniMaxVideoVAEConfig(), dtype=jnp.float32):
    keys = iter(jax.random.split(key, 128))
    bo = cfg.block_out_channels
    z2 = 2 * cfg.latent_channels

    def res_p(cin, cout):
        return {"norm1": _norm_p(cin),
                "conv1": _conv_p(next(keys), cin, cout, dtype=dtype),
                "norm2": _norm_p(cout),
                "conv2": _conv_p(next(keys), cout, cout, dtype=dtype),
                **({"shortcut": _conv_p(next(keys), cin, cout, k=1,
                                        dtype=dtype)} if cin != cout
                   else {})}

    enc = {"conv_in": _conv_p(next(keys), cfg.in_channels, bo[0],
                              dtype=dtype),
           "levels": [], "norm_out": _norm_p(bo[-1]),
           "conv_out": _conv_p(next(keys), bo[-1], z2, dtype=dtype)}
    cin = bo[0]
    for i, cout in enumerate(bo):
        blk = {"res": []}
        c = cin
        for _ in range(cfg.layers_per_block):
            blk["res"].append(res_p(c, cout))
            c = cout
        if cfg.temporal_factors[i] * cfg.spatial_factors[i] > 1:
            blk["down"] = _conv_p(next(keys), cout, cout, dtype=dtype)
        enc["levels"].append(blk)
        cin = cout

    d = cfg.decoder_dim

    def vit_block(key):
        ks = iter(jax.random.split(key, 4))
        return {"norm1": _norm_p(d), "norm2": _norm_p(d),
                "qkv": _lin_p(next(ks), d, 3 * d, dtype),
                "o": _lin_p(next(ks), d, d, dtype),
                "scale1": jnp.zeros((d,), jnp.float32) + 0.1,
                "scale2": jnp.zeros((d,), jnp.float32) + 0.1,
                "w1": _lin_p(next(ks), d, 2 * d * cfg.ffn_mult, dtype),
                "w2": _lin_p(next(ks), d * cfg.ffn_mult, d, dtype)}

    dec = {"x_embedder": _lin_p(next(keys), cfg.latent_channels, d, dtype),
           "register_tokens": jnp.zeros((1, cfg.num_register_tokens, d),
                                        dtype),
           "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *[
               vit_block(k) for k in jax.random.split(next(keys),
                                                      cfg.decoder_layers)]),
           "norm_out": _norm_p(d),
           "proj_out": _lin_p(
               next(keys), d,
               cfg.out_channels * cfg.temporal_ratio
               * cfg.spatial_ratio ** 2, dtype)}

    return {"encoder": enc, "decoder": dec,
            "quant_conv": _conv_p(next(keys), z2, z2, k=1, dtype=dtype),
            "post_quant_conv": _conv_p(next(keys), cfg.latent_channels,
                                       cfg.latent_channels, k=1,
                                       dtype=dtype),
            "latents_mean": jnp.zeros((cfg.latent_channels,), jnp.float32),
            "latents_std": jnp.ones((cfg.latent_channels,), jnp.float32)}


def load_minimax_video_vae_params(sd: Dict[str, Any],
                                  cfg: MiniMaxVideoVAEConfig =
                                  MiniMaxVideoVAEConfig(),
                                  dtype=jnp.float32):
    """Torch key space (AutoencoderKLMiniMaxH3): encoder.{conv_in,
    down.N.{block.M.{norm1,conv1,norm2,conv2,nin_shortcut}, downsample
    .conv}, norm_out, conv_out}, quant_conv, post_quant_conv, decoder.
    {x_embedder, register_tokens, transformer_blocks.N.{norm1, attn
    .to_qkv/to_out, scale1, norm2, ff.w1/w2, scale2}, norm_out, proj_out},
    latents_mean/std buffers.  The fused to_qkv is interleaved per head
    (video_autoencoder.py:343) and regrouped to q|k|v blocks here."""
    sd = {k[4:] if k.startswith("vae.") else k: v for k, v in sd.items()}

    def conv(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        return {"w": jnp.asarray(np.ascontiguousarray(
            w.transpose(2, 3, 4, 1, 0))).astype(dtype),
            "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                        np.float32)).astype(dtype)}

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T).astype(dtype),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)).astype(dtype)}

    def norm(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    def w_only(name):
        return jnp.asarray(np.asarray(sd.pop(f"{name}"), np.float32))

    def res(pre):
        p = {"norm1": norm(f"{pre}.norm1"), "conv1": conv(f"{pre}.conv1"),
             "norm2": norm(f"{pre}.norm2"), "conv2": conv(f"{pre}.conv2")}
        if f"{pre}.nin_shortcut.weight" in sd:
            p["shortcut"] = conv(f"{pre}.nin_shortcut")
        return p

    enc = {"conv_in": conv("encoder.conv_in"),
           "levels": [], "norm_out": norm("encoder.norm_out"),
           "conv_out": conv("encoder.conv_out")}
    for i in range(len(cfg.block_out_channels)):
        blk = {"res": [res(f"encoder.down.{i}.block.{j}")
                       for j in range(cfg.layers_per_block)]}
        if cfg.temporal_factors[i] * cfg.spatial_factors[i] > 1:
            blk["down"] = conv(f"encoder.down.{i}.downsample.conv")
        enc["levels"].append(blk)

    d = cfg.decoder_dim
    # to_qkv output features stay in the torch interleaved (head, 3, hd)
    # order — the forward reshapes them the same way (:343)
    qkv_lin = lin

    blocks = []
    for i in range(cfg.decoder_layers):
        pre = f"decoder.transformer_blocks.{i}"
        blocks.append({
            "norm1": {"w": w_only(f"{pre}.norm1.weight"),
                      "b": jnp.zeros((d,), jnp.float32)},
            "qkv": qkv_lin(f"{pre}.attn.to_qkv"),
            "o": lin(f"{pre}.attn.to_out"),
            "scale1": w_only(f"{pre}.scale1"),
            "norm2": {"w": w_only(f"{pre}.norm2.weight"),
                      "b": jnp.zeros((d,), jnp.float32)},
            "w1": lin(f"{pre}.ff.w1"),
            "w2": lin(f"{pre}.ff.w2"),
            "scale2": w_only(f"{pre}.scale2"),
        })
    dec = {"x_embedder": lin("decoder.x_embedder"),
           "register_tokens": jnp.asarray(np.asarray(
               sd.pop("decoder.register_tokens"), np.float32)).astype(dtype),
           "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *blocks),
           "norm_out": norm("decoder.norm_out"),
           "proj_out": lin("decoder.proj_out")}
    sd.pop("decoder.mask_token", None)

    lm = sd.pop("latents_mean", None)
    ls = sd.pop("latents_std", None)
    params = {"encoder": enc, "decoder": dec,
              "quant_conv": conv("quant_conv"),
              "post_quant_conv": conv("post_quant_conv"),
              "latents_mean": jnp.asarray(
                  np.asarray(lm, np.float32).reshape(-1))
              if lm is not None
              else jnp.zeros((cfg.latent_channels,), jnp.float32),
              "latents_std": jnp.asarray(
                  np.asarray(ls, np.float32).reshape(-1))
              if ls is not None
              else jnp.ones((cfg.latent_channels,), jnp.float32)}
    return params, sorted(sd.keys())
