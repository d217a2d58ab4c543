"""LTX-Video causal video autoencoder, TPU-native.

Config-driven re-implementation of the reference CausalVideoAutoencoder
(/root/reference/models/ltx_video/models/autoencoders/
causal_video_autoencoder.py): encoder/decoder assembled from a `blocks`
list (the config travels inside the checkpoint metadata), with
- causal convs: time padded front by REPLICATING frame 0
  (causal_conv3d.py:44-47), spatial zero padding;
- res_x: UNetMidBlock3D = N ResnetBlock3D (norm-silu-conv ×2, LayerNorm'd
  1x1-conv shortcut when channels change, :1087-1180);
- res_x_y: single channel-multiplying ResnetBlock3D;
- compress_{time,space,all}[_x_y]: strided causal convs;
- compress_*_res: SpaceToDepthDownsample (conv to c/prod(stride) then
  space-to-depth, mean-grouped skip, :983-1028);
- decoder compress_*: DepthToSpaceUpsample (conv to c*prod(stride),
  pixel shuffle, drop first time slice on temporal 2x, optional residual
  repeat skip, :1030-1073);
- latents normalized by per-channel statistics std-of-means /
  mean-of-means carried in the checkpoint (:29,63-72).

norm_layer group_norm | pixel_norm | layer_norm.  Layout: channels-last
[B, T, H, W, C].

Decoder extras (0.9.7+ 13B decoder, and LTX-2's video_vae.py): timestep
conditioning (latent noise injection + per-resblock 4-way adaLN from a
per-block PixArt time embedder + final 2-way scale/shift,
video_vae.py:520-612, resnet.py:96-141), StyleGAN-style spatial noise
injection (resnet.py:102-117), non-causal decode (symmetric replicate
temporal padding, convolution.py:304-311), and reflect spatial padding.

This module also serves the LTX-2 video VAE (models/ltx2/ltx_core/model/
video_vae/) — same block grammar, configured via LTX2_VAE_CONFIG in
models/ltx2/vae.py.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LTXVVAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 128
    base_channels: int = 128
    norm_groups: int = 32
    norm_layer: str = "pixel_norm"
    patch_size: int = 4
    encoder_blocks: Tuple = (("res_x", 4), ("compress_all", 2),
                             ("res_x_y", 1), ("res_x", 3),
                             ("compress_all", 2), ("res_x_y", 1),
                             ("res_x", 3), ("compress_all", 2),
                             ("res_x", 3), ("res_x", 4))
    decoder_blocks: Tuple = (("res_x", 4), ("compress_all", {"residual": True}),
                             ("res_x_y", 1), ("res_x", 3),
                             ("compress_all", {"residual": True}),
                             ("res_x_y", 1), ("res_x", 3),
                             ("compress_all", {"residual": True}),
                             ("res_x", 3), ("res_x", 4))
    compute_dtype: Any = jnp.float32
    # decoder extras (0.9.7+ 13B / LTX-2)
    decoder_causal: bool = True
    decoder_spatial_padding: str = "zeros"   # "zeros" | "reflect"
    timestep_conditioning: bool = False
    decode_noise_scale: float = 0.025
    decode_timestep: float = 0.05


def _norm_params(block_params):
    return block_params if isinstance(block_params, dict) \
        else {"num_layers": block_params}


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def causal_conv3d(x, p, stride=(1, 1, 1), causal=True,
                  spatial_mode="zeros"):
    """x: [B,T,H,W,C]; causal: time front-pad replicates frame 0;
    non-causal: symmetric replicate padding (convolution.py:304-311)."""
    kt, kh, kw = p["w"].shape[:3]
    if kt > 1:
        if causal:
            first = jnp.repeat(x[:, :1], kt - 1, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        else:
            first = jnp.repeat(x[:, :1], (kt - 1) // 2, axis=1)
            last = jnp.repeat(x[:, -1:], (kt - 1) // 2, axis=1)
            x = jnp.concatenate([first, x, last], axis=1)
    pad = [(0, 0), (0, 0), (kh // 2, kh // 2), (kw // 2, kw // 2), (0, 0)]
    x = jnp.pad(x, pad, mode="reflect" if spatial_mode == "reflect"
                else "constant")
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), stride, "VALID",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _norm(x, p, kind, groups, eps=1e-6):
    if kind == "pixel_norm":
        x32 = x.astype(jnp.float32)
        return (x32 * jax.lax.rsqrt(
            jnp.mean(x32 * x32, axis=-1, keepdims=True) + eps)
        ).astype(x.dtype)
    x32 = x.astype(jnp.float32)
    if kind == "layer_norm":
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.var(x32, axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + eps)
        return (y * p["w"] + p["b"]).astype(x.dtype)
    c = x.shape[-1]
    orig = x.shape
    g = x32.reshape(*orig[:-1], groups, c // groups)
    mean = jnp.mean(g, axis=(1, 2, 3, 5), keepdims=True)
    var = jnp.var(g, axis=(1, 2, 3, 5), keepdims=True)
    y = ((g - mean) * jax.lax.rsqrt(var + eps)).reshape(orig)
    return (y * p["w"] + p["b"]).astype(x.dtype)


def _sinusoid_256(t):
    """diffusers Timesteps(256, flip_sin_to_cos=True): [cos, sin]."""
    half = 128
    t = t.astype(jnp.float32)
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = t[..., None] * freqs
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def _time_embed(p, t):
    """PixArtAlphaCombinedTimestepSizeEmbeddings: sinusoid-256 -> linear ->
    silu -> linear.  t: [B] -> [B, D]."""
    e = _sinusoid_256(t)
    e32 = jnp.dot(e, p["t1"]["w"].astype(jnp.float32)) + p["t1"]["b"]
    e32 = jax.nn.silu(e32)
    return jnp.dot(e32, p["t2"]["w"].astype(jnp.float32)) + p["t2"]["b"]


def _resblock(p, x, cfg: LTXVVAEConfig, t_embed=None, noise_key=None,
              causal=True, spatial_mode="zeros"):
    """ResnetBlock3D (resnet.py:12-183): optional 4-way timestep adaLN
    (shift1, scale1, shift2, scale2 from scale_shift_table + t_embed) and
    StyleGAN spatial noise injection."""
    if t_embed is not None and "scale_shift_table" in p:
        b = x.shape[0]
        c = p["scale_shift_table"].shape[-1]
        ada = (p["scale_shift_table"][None].astype(jnp.float32)
               + t_embed.reshape(b, 4, c))       # [B, 4, C]
        ada = ada[:, :, None, None, None, :]     # broadcast over T,H,W
        sh1, sc1, sh2, sc2 = (ada[:, 0], ada[:, 1], ada[:, 2], ada[:, 3])
    else:
        sh1 = sc1 = sh2 = sc2 = None

    def inject(h, scale_p, key):
        # resnet.py:102-117: one [H, W] noise map scaled per channel
        noise = jax.random.normal(key, h.shape[-3:-1], jnp.float32)
        scale = scale_p.astype(jnp.float32).reshape(1, 1, 1, 1, -1)
        return h + (noise[None, None, :, :, None] * scale).astype(h.dtype)

    h = _norm(x, p.get("norm1"), cfg.norm_layer, cfg.norm_groups)
    if sc1 is not None:
        h = (h.astype(jnp.float32) * (1.0 + sc1) + sh1).astype(x.dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(h, p["conv1"], causal=causal,
                      spatial_mode=spatial_mode)
    if "per_channel_scale1" in p and noise_key is not None:
        k1, k2 = jax.random.split(noise_key)
        h = inject(h, p["per_channel_scale1"], k1)
    h = _norm(h, p.get("norm2"), cfg.norm_layer, cfg.norm_groups)
    if sc2 is not None:
        h = (h.astype(jnp.float32) * (1.0 + sc2) + sh2).astype(x.dtype)
    h = jax.nn.silu(h.astype(jnp.float32)).astype(x.dtype)
    h = causal_conv3d(h, p["conv2"], causal=causal,
                      spatial_mode=spatial_mode)
    if "per_channel_scale2" in p and noise_key is not None:
        h = inject(h, p["per_channel_scale2"], k2)
    if "shortcut" in p:
        x = _norm(x, p.get("norm3"), "layer_norm", cfg.norm_groups)
        x = causal_conv3d(x, p["shortcut"], causal=causal,
                          spatial_mode=spatial_mode)
    return x + h


def _space_to_depth(x, stride):
    st, sh, sw = stride
    b, t, h, w, c = x.shape
    x = x.reshape(b, t // st, st, h // sh, sh, w // sw, sw, c)
    # torch channel-first rearrange 'b c (d p1)(h p2)(w p3) -> b (c p1 p2 p3)'
    # == channels-last feature order (c, p1, p2, p3)... the torch pattern
    # puts (c p1 p2 p3) with c-major, i.e. output channel index =
    # ((c*st + p1)*sh + p2)*sw + p3
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // st, h // sh, w // sw, c * st * sh * sw)


def _depth_to_space(x, stride):
    st, sh, sw = stride
    b, t, h, w, cf = x.shape
    c = cf // (st * sh * sw)
    x = x.reshape(b, t, h, w, c, st, sh, sw)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    return x.reshape(b, t * st, h * sh, w * sw, c)


def _s2d_down(p, x, stride, group_size):
    """SpaceToDepthDownsample (:983-1028)."""
    if stride[0] == 2:
        x = jnp.concatenate([x[:, :1], x], axis=1)
    skip = _space_to_depth(x, stride)
    b, t, h, w, cf = skip.shape
    skip = skip.reshape(b, t, h, w, cf // group_size, group_size).mean(-1)
    y = causal_conv3d(x, p["conv"])
    y = _space_to_depth(y, stride)
    return y + skip


def _d2s_up(p, x, stride, residual, reduction, causal=True,
            spatial_mode="zeros"):
    """DepthToSpaceUpsample (:1030-1073)."""
    if residual:
        x_in = _depth_to_space(x, stride)
        rep = int(np.prod(stride)) // reduction
        x_in = jnp.tile(x_in, (1, 1, 1, 1, rep))
        if stride[0] == 2:
            x_in = x_in[:, 1:]
    y = causal_conv3d(x, p["conv"], causal=causal, spatial_mode=spatial_mode)
    y = _depth_to_space(y, stride)
    if stride[0] == 2:
        y = y[:, 1:]
    if residual:
        y = y + x_in
    return y


# ---------------------------------------------------------------------------
# channel plan
# ---------------------------------------------------------------------------

def encoder_channel_plan(cfg: LTXVVAEConfig) -> List[Tuple[str, dict, int, int]]:
    """[(kind, params, in_ch, out_ch)] per block (causal_video_autoencoder
    .py:385-482)."""
    plan = []
    ch = cfg.base_channels
    for name, params in cfg.encoder_blocks:
        params = _norm_params(params)
        cin = ch
        if name in ("res_x_y", "compress_all_x_y", "compress_all_res",
                    "compress_space_res", "compress_time_res"):
            ch = params.get("multiplier", 2) * ch
        plan.append((name, params, cin, ch))
    return plan


def decoder_channel_plan(cfg: LTXVVAEConfig) -> List[Tuple[str, dict, int, int]]:
    """Reversed blocks; conv_in channels = product of multipliers
    (:613-624)."""
    def mult(name, params):
        if name == "res_x_y":
            return params.get("multiplier", 2)
        if name in ("compress_all", "compress_space", "compress_time"):
            return params.get("multiplier", 1)
        return 1

    ch = cfg.base_channels
    for name, params in reversed(cfg.decoder_blocks):
        ch *= mult(name, _norm_params(params))
    plan = []
    for name, params in reversed(cfg.decoder_blocks):
        params = _norm_params(params)
        cin = ch
        ch //= mult(name, params)
        plan.append((name, params, cin, ch))
    return plan


_STRIDES = {"compress_time": (2, 1, 1), "compress_space": (1, 2, 2),
            "compress_all": (2, 2, 2), "compress_all_x_y": (2, 2, 2),
            "compress_all_res": (2, 2, 2), "compress_space_res": (1, 2, 2),
            "compress_time_res": (2, 1, 1)}


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _conv_p(key, cin, cout, k=3, dtype=jnp.float32):
    s = 1.0 / math.sqrt(cin * k ** 3)
    return {"w": jax.random.uniform(key, (k, k, k, cin, cout), jnp.float32,
                                    -s, s).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _res_p(key, cin, cout, cfg, dtype):
    ks = iter(jax.random.split(key, 3))
    p = {"conv1": _conv_p(next(ks), cin, cout, dtype=dtype),
         "conv2": _conv_p(next(ks), cout, cout, dtype=dtype)}
    if cfg.norm_layer == "group_norm":
        p["norm1"] = {"w": jnp.ones((cin,)), "b": jnp.zeros((cin,))}
        p["norm2"] = {"w": jnp.ones((cout,)), "b": jnp.zeros((cout,))}
    if cin != cout:
        p["shortcut"] = _conv_p(next(ks), cin, cout, k=1, dtype=dtype)
        p["norm3"] = {"w": jnp.ones((cin,)), "b": jnp.zeros((cin,))}
    return p


def _block_p(key, name, params, cin, cout, cfg, dtype):
    if name == "res_x":
        ks = jax.random.split(key, params["num_layers"])
        return {"res_blocks": [_res_p(k, cin, cin, cfg, dtype) for k in ks]}
    if name == "res_x_y":
        return {"res": _res_p(key, cin, cout, cfg, dtype)}
    if name.endswith("_res") and name.startswith("compress"):
        stride = _STRIDES[name]
        return {"conv": _conv_p(key, cin, cout // int(np.prod(stride)),
                                dtype=dtype)}
    if name.startswith("compress"):
        return {"conv": _conv_p(key, cin, cout, dtype=dtype)}
    raise ValueError(name)


def _dec_block_p(key, name, params, cin, cout, cfg, dtype):
    if name == "res_x":
        ks = jax.random.split(key, params["num_layers"] + 1)
        blocks = [_res_p(k, cin, cin, cfg, dtype)
                  for k in ks[:params["num_layers"]]]
        p = {"res_blocks": blocks}
        if cfg.timestep_conditioning:
            for rb in blocks:
                rb["scale_shift_table"] = (
                    jax.random.normal(ks[-1], (4, cin), jnp.float32)
                    / math.sqrt(cin))
            k1, k2 = jax.random.split(ks[-1])
            p["time_embedder"] = {
                "t1": {"w": jax.random.normal(k1, (256, 4 * cin),
                                              jnp.float32) * 0.02,
                       "b": jnp.zeros((4 * cin,), jnp.float32)},
                "t2": {"w": jax.random.normal(k2, (4 * cin, 4 * cin),
                                              jnp.float32) * 0.02,
                       "b": jnp.zeros((4 * cin,), jnp.float32)}}
        if params.get("inject_noise"):
            for rb in blocks:
                rb["per_channel_scale1"] = jnp.zeros((cin, 1, 1),
                                                     jnp.float32)
                rb["per_channel_scale2"] = jnp.zeros((cin, 1, 1),
                                                     jnp.float32)
        return p
    if name == "res_x_y":
        return {"res": _res_p(key, cin, cout, cfg, dtype)}
    if name.startswith("compress"):
        # DepthToSpaceUpsample: conv to prod(stride)*cin // multiplier
        # (:1041-1043 out_channels_reduction_factor)
        stride = _STRIDES[name]
        red = params.get("multiplier", 1)
        return {"conv": _conv_p(key, cin,
                                cin * int(np.prod(stride)) // red,
                                dtype=dtype)}
    raise ValueError(name)


def init_ltxv_vae(key, cfg: LTXVVAEConfig = LTXVVAEConfig(),
                  dtype=jnp.float32) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    enc_plan = encoder_channel_plan(cfg)
    dec_plan = decoder_channel_plan(cfg)
    pin = cfg.in_channels * cfg.patch_size ** 2
    enc = {"conv_in": _conv_p(next(keys), pin, cfg.base_channels,
                              dtype=dtype),
           "blocks": [_block_p(next(keys), n, p, ci, co, cfg, dtype)
                      for n, p, ci, co in enc_plan],
           "conv_out": _conv_p(next(keys), enc_plan[-1][3],
                               2 * cfg.latent_channels, dtype=dtype)}
    if cfg.norm_layer == "group_norm":
        enc["norm_out"] = {"w": jnp.ones((enc_plan[-1][3],)),
                           "b": jnp.zeros((enc_plan[-1][3],))}
    dec = {"conv_in": _conv_p(next(keys), cfg.latent_channels,
                              dec_plan[0][2], dtype=dtype),
           "blocks": [_dec_block_p(next(keys), n, p, ci, co, cfg, dtype)
                      for n, p, ci, co in dec_plan],
           "conv_out": _conv_p(next(keys), dec_plan[-1][3],
                               cfg.out_channels * cfg.patch_size ** 2,
                               dtype=dtype)}
    if cfg.norm_layer == "group_norm":
        dec["norm_out"] = {"w": jnp.ones((dec_plan[-1][3],)),
                           "b": jnp.zeros((dec_plan[-1][3],))}
    if cfg.timestep_conditioning:
        ch = dec_plan[-1][3]
        k1, k2, k3 = jax.random.split(next(keys), 3)
        dec["timestep_scale_multiplier"] = jnp.asarray(1000.0)
        dec["last_time_embedder"] = {
            "t1": {"w": jax.random.normal(k1, (256, 2 * ch),
                                          jnp.float32) * 0.02,
                   "b": jnp.zeros((2 * ch,), jnp.float32)},
            "t2": {"w": jax.random.normal(k2, (2 * ch, 2 * ch),
                                          jnp.float32) * 0.02,
                   "b": jnp.zeros((2 * ch,), jnp.float32)}}
        dec["last_scale_shift_table"] = (
            jax.random.normal(k3, (2, ch), jnp.float32) / math.sqrt(ch))
    return {"encoder": enc, "decoder": dec,
            "std_of_means": jnp.ones((cfg.latent_channels,), jnp.float32),
            "mean_of_means": jnp.zeros((cfg.latent_channels,), jnp.float32)}


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _run_block(p, name, params, x, cfg, cout):
    if name == "res_x":
        for rp in p["res_blocks"]:
            x = _resblock(rp, x, cfg)
        return x
    if name == "res_x_y":
        return _resblock(p["res"], x, cfg)
    stride = _STRIDES[name]
    if name.endswith("_res"):
        group = x.shape[-1] * int(np.prod(stride)) // cout
        return _s2d_down(p, x, stride, group)
    return causal_conv3d(x, p["conv"], stride=stride)


def ltxv_vae_encode(params, cfg: LTXVVAEConfig, video):
    """video: [B, 3, T, H, W] in [-1,1], T = 1 + 8k.  Returns normalized
    latents [B, C_z, T', H', W']."""
    x = video.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    b, t, h, w, c = x.shape
    ps = cfg.patch_size
    # feature order (c, r, q) = (c, w-patch, h-patch) (:1272-1282)
    x = x.reshape(b, t, h // ps, ps, w // ps, ps, c)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3).reshape(
        b, t, h // ps, w // ps, c * ps * ps)
    enc = params["encoder"]
    x = causal_conv3d(x, enc["conv_in"])
    for p, (name, bp, ci, co) in zip(enc["blocks"],
                                     encoder_channel_plan(cfg)):
        x = _run_block(p, name, bp, x, cfg, co)
    x = _norm(x, enc.get("norm_out"), cfg.norm_layer, cfg.norm_groups)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = causal_conv3d(x, enc["conv_out"])
    mean = x[..., :cfg.latent_channels]
    z = (mean - params["mean_of_means"]) / params["std_of_means"]
    return z.transpose(0, 4, 1, 2, 3)


def ltxv_vae_decode(params, cfg: LTXVVAEConfig, latents, timestep=None,
                    noise_key=None):
    """latents: [B, C_z, T', H', W'] normalized.  Returns video
    [B, 3, T, H, W].

    With cfg.timestep_conditioning (0.9.7+ 13B / LTX-2): latents get a
    decode_noise_scale noise blend, every res_x block modulates on the
    scaled timestep, and a final 2-way scale/shift applies before the
    output conv (video_vae.py:551-612)."""
    z = latents.transpose(0, 2, 3, 4, 1).astype(cfg.compute_dtype)
    dec = params["decoder"]
    cz, sm = cfg.decoder_causal, cfg.decoder_spatial_padding
    b = z.shape[0]
    tcond = cfg.timestep_conditioning and "last_time_embedder" in dec
    if tcond:
        if noise_key is None:
            noise_key = jax.random.key(0)
        noise_key, nk = jax.random.split(noise_key)
        noise = jax.random.normal(nk, z.shape, z.dtype)
        z = noise * cfg.decode_noise_scale \
            + (1.0 - cfg.decode_noise_scale) * z
        if timestep is None:
            timestep = jnp.full((b,), cfg.decode_timestep, jnp.float32)
        t_scaled = timestep * dec["timestep_scale_multiplier"]
    z = z * params["std_of_means"] + params["mean_of_means"]
    x = causal_conv3d(z, dec["conv_in"], causal=cz, spatial_mode=sm)
    for p, (name, bp, ci, co) in zip(dec["blocks"],
                                     decoder_channel_plan(cfg)):
        if name == "res_x":
            t_embed = (_time_embed(p["time_embedder"], t_scaled)
                       if tcond and "time_embedder" in p else None)
            for rp in p["res_blocks"]:
                if noise_key is not None:
                    noise_key, nk = jax.random.split(noise_key)
                else:
                    nk = None
                x = _resblock(rp, x, cfg, t_embed=t_embed, noise_key=nk,
                              causal=cz, spatial_mode=sm)
        elif name == "res_x_y":
            x = _resblock(p["res"], x, cfg, causal=cz, spatial_mode=sm)
        elif name.startswith("compress"):
            stride = _STRIDES[name]
            x = _d2s_up(p, x, stride, bp.get("residual", False),
                        bp.get("multiplier", 1), causal=cz, spatial_mode=sm)
        else:
            raise ValueError(name)
    x = _norm(x, dec.get("norm_out"), cfg.norm_layer, cfg.norm_groups)
    if tcond:
        emb = _time_embed(dec["last_time_embedder"], t_scaled)  # [B, 2C]
        c = dec["last_scale_shift_table"].shape[-1]
        ada = (dec["last_scale_shift_table"][None].astype(jnp.float32)
               + emb.reshape(b, 2, c))
        shift = ada[:, 0][:, None, None, None, :]
        scale = ada[:, 1][:, None, None, None, :]
        x = (x.astype(jnp.float32) * (1.0 + scale) + shift).astype(x.dtype)
    x = jax.nn.silu(x.astype(jnp.float32)).astype(x.dtype)
    x = causal_conv3d(x, dec["conv_out"], causal=cz, spatial_mode=sm)
    ps = cfg.patch_size
    b, t, h, w, cf = x.shape
    c = cf // (ps * ps)
    x = x.reshape(b, t, h, w, c, ps, ps)     # (c, r, q)
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)     # -> (b,t,h,q,w,r,c)
    x = x.reshape(b, t, h * ps, w * ps, c)
    return x.transpose(0, 4, 1, 2, 3)


# ---------------------------------------------------------------------------
# checkpoint loading
# ---------------------------------------------------------------------------

def load_ltxv_vae_params(sd: Dict[str, Any], cfg: LTXVVAEConfig,
                         dtype=jnp.float32):
    """Torch key space (CausalVideoAutoencoder): {encoder,decoder}
    .conv_in.conv, .{down,up}_blocks.{i}.[res_blocks.{j}.]{norm1,conv1.conv,
    norm2,conv2.conv,conv_shortcut.conv,norm3.norm}, .conv.conv for the
    compress blocks, .conv_norm_out (affine norms only), .conv_out.conv,
    per_channel_statistics.{std-of-means,mean-of-means}.  Pixel-norm
    configs carry no norm weights."""
    sd = {k[4:] if k.startswith("vae.") else k: v for k, v in sd.items()}

    def conv(name):
        w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(np.ascontiguousarray(
            w.transpose(2, 3, 4, 1, 0))).astype(dtype)}
        b = sd.pop(f"{name}.bias", None)
        if b is not None:
            p["b"] = jnp.asarray(np.asarray(b, np.float32)).astype(dtype)
        return p

    def norm(name):
        if f"{name}.weight" not in sd:
            return None
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    def res(pre):
        p = {"conv1": conv(f"{pre}.conv1.conv"),
             "conv2": conv(f"{pre}.conv2.conv")}
        for nm in ("norm1", "norm2"):
            n = norm(f"{pre}.{nm}")
            if n is not None:
                p[nm] = n
        if f"{pre}.conv_shortcut.conv.weight" in sd:
            p["shortcut"] = conv(f"{pre}.conv_shortcut.conv")
            n = norm(f"{pre}.norm3.norm")
            if n is not None:
                p["norm3"] = n
        return p

    def block(pre, name, params):
        if name == "res_x":
            return {"res_blocks": [res(f"{pre}.res_blocks.{j}")
                                   for j in range(params["num_layers"])]}
        if name == "res_x_y":
            return {"res": res(pre)}
        if name.endswith("_res"):
            return {"conv": conv(f"{pre}.conv.conv")}
        return {"conv": conv(f"{pre}.conv")}

    enc = {"conv_in": conv("encoder.conv_in.conv"),
           "blocks": [block(f"encoder.down_blocks.{i}", n, p)
                      for i, (n, p, _, _) in
                      enumerate(encoder_channel_plan(cfg))],
           "conv_out": conv("encoder.conv_out.conv")}
    n = norm("encoder.conv_norm_out")
    if n is not None:
        enc["norm_out"] = n

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    def time_embedder(pre):
        return {"t1": lin(f"{pre}.timestep_embedder.linear_1"),
                "t2": lin(f"{pre}.timestep_embedder.linear_2")}

    def dec_block(pre, name, params):
        if name == "res_x":
            p = {"res_blocks": []}
            for j in range(params["num_layers"]):
                rp = res(f"{pre}.res_blocks.{j}")
                for extra in ("scale_shift_table", "per_channel_scale1",
                              "per_channel_scale2"):
                    v = sd.pop(f"{pre}.res_blocks.{j}.{extra}", None)
                    if v is not None:
                        rp[extra] = jnp.asarray(np.asarray(v, np.float32))
                p["res_blocks"].append(rp)
            if f"{pre}.time_embedder.timestep_embedder.linear_1.weight" \
                    in sd:
                p["time_embedder"] = time_embedder(f"{pre}.time_embedder")
            return p
        if name == "res_x_y":
            return {"res": res(pre)}
        return {"conv": conv(f"{pre}.conv.conv")}

    dec = {"conv_in": conv("decoder.conv_in.conv"),
           "blocks": [dec_block(f"decoder.up_blocks.{i}", n, p)
                      for i, (n, p, _, _) in
                      enumerate(decoder_channel_plan(cfg))],
           "conv_out": conv("decoder.conv_out.conv")}
    n = norm("decoder.conv_norm_out")
    if n is not None:
        dec["norm_out"] = n
    tsm = sd.pop("decoder.timestep_scale_multiplier", None)
    if tsm is not None:
        dec["timestep_scale_multiplier"] = jnp.asarray(
            np.asarray(tsm, np.float32))
        dec["last_time_embedder"] = time_embedder(
            "decoder.last_time_embedder")
        dec["last_scale_shift_table"] = jnp.asarray(np.asarray(
            sd.pop("decoder.last_scale_shift_table"), np.float32))

    std = sd.pop("per_channel_statistics.std-of-means", None)
    mean = sd.pop("per_channel_statistics.mean-of-means", None)
    params = {"encoder": enc, "decoder": dec,
              "std_of_means": jnp.asarray(
                  np.asarray(std, np.float32)) if std is not None
              else jnp.ones((cfg.latent_channels,), jnp.float32),
              "mean_of_means": jnp.asarray(
                  np.asarray(mean, np.float32)) if mean is not None
              else jnp.zeros((cfg.latent_channels,), jnp.float32)}
    leftover = [k for k in sd if not k.startswith("per_channel_statistics")]
    return params, sorted(leftover)
