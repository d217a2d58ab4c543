"""MMAudio TOD-VAE + BigVGAN vocoder (audio latents -> waveform).

TPU-native re-implementation of /root/reference/postprocessing/mmaudio/
ext/autoencoder/ + ext/bigvgan/:
- edm2_utils.py — magnitude-preserving ops: normalize (vector norm with
  sqrt(numel-ratio)-scaled eps), mp_silu (silu/0.596), mp_sum (lerp
  t=0.3 / sqrt(0.58)); MPConv1D weights are normalized+scaled ONCE at
  load (remove_weight_norm:160-168), after which it is a plain conv;
- vae_modules.py — pixel-normed ResnetBlock1D, channel-normalized
  single-head AttnBlock1D, nearest-2x Upsample1D;
- vae.py VAE/Decoder1D/Encoder1D — 16k variant: 80-d mel bands,
  20-d latents, hidden 384, ch_mult (1,2,4), 2 res blocks, attention at
  the deepest level, one 2x temporal resample, mel stats de-norm;
- bigvgan/models.py BigVGANVocoder — mel -> 16 kHz wave: conv_pre,
  ConvTranspose upsamplers, AMPBlock1 stacks with alias-free SnakeBeta
  (shared with models/minimax/audio_vae.py primitives), tanh out.

This is the decode path used by Ovi's audio branch
(ovi_fusion_engine.py:37-48 init_mmaudio_vae) and the MMAudio
soundtrack generator.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.minimax.audio_vae import (conv1d, conv_transpose1d,
                                        alias_free_snake_beta)

# vae.py:14-33 DATA_MEAN_80D / DATA_STD_80D (mel normalization stats —
# model constants that cannot differ)
DATA_MEAN_80D = np.array([
    -1.6058, -1.3676, -1.2520, -1.2453, -1.2078, -1.2224, -1.2419,
    -1.2439, -1.2922, -1.2927, -1.3170, -1.3543, -1.3401, -1.3836,
    -1.3907, -1.3912, -1.4313, -1.4152, -1.4527, -1.4728, -1.4568,
    -1.5101, -1.5051, -1.5172, -1.5623, -1.5373, -1.5746, -1.5687,
    -1.6032, -1.6131, -1.6081, -1.6331, -1.6489, -1.6489, -1.6700,
    -1.6738, -1.6953, -1.6969, -1.7048, -1.7280, -1.7361, -1.7495,
    -1.7658, -1.7814, -1.7889, -1.8064, -1.8221, -1.8377, -1.8417,
    -1.8643, -1.8857, -1.8929, -1.9173, -1.9379, -1.9531, -1.9673,
    -1.9824, -2.0042, -2.0215, -2.0436, -2.0766, -2.1064, -2.1418,
    -2.1855, -2.2319, -2.2767, -2.3161, -2.3572, -2.3954, -2.4282,
    -2.4659, -2.5072, -2.5552, -2.6074, -2.6584, -2.7107, -2.7634,
    -2.8266, -2.8981, -2.9673], np.float32)
DATA_STD_80D = np.array([
    1.0291, 1.0411, 1.0043, 0.9820, 0.9677, 0.9543, 0.9450, 0.9392,
    0.9343, 0.9297, 0.9276, 0.9263, 0.9242, 0.9254, 0.9232, 0.9281,
    0.9263, 0.9315, 0.9274, 0.9247, 0.9277, 0.9199, 0.9188, 0.9194,
    0.9160, 0.9161, 0.9146, 0.9161, 0.9100, 0.9095, 0.9145, 0.9076,
    0.9066, 0.9095, 0.9032, 0.9043, 0.9038, 0.9011, 0.9019, 0.9010,
    0.8984, 0.8983, 0.8986, 0.8961, 0.8962, 0.8978, 0.8962, 0.8973,
    0.8993, 0.8976, 0.8995, 0.9016, 0.8982, 0.8972, 0.8974, 0.8949,
    0.8940, 0.8947, 0.8936, 0.8939, 0.8951, 0.8956, 0.9017, 0.9167,
    0.9436, 0.9690, 1.0003, 1.0225, 1.0381, 1.0491, 1.0545, 1.0604,
    1.0761, 1.0929, 1.1089, 1.1196, 1.1176, 1.1156, 1.1117, 1.1070],
    np.float32)


@dataclasses.dataclass(frozen=True)
class MMAudioVAEConfig:
    data_dim: int = 80
    embed_dim: int = 20
    hidden_dim: int = 384
    ch_mult: Tuple[int, ...] = (1, 2, 4)
    num_res_blocks: int = 2
    clip_act: float = 256.0
    sample_rate: int = 16000


def _mp_silu(x):
    return jax.nn.silu(x) / 0.596


def _mp_sum(a, b, t=0.3):
    return (a * (1 - t) + b * t) / math.sqrt((1 - t) ** 2 + t ** 2)


def _pixel_norm(x, eps=1e-4):
    """edm2 normalize over channels (x is channels-LAST [B, T, C])."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    # torch.add(eps, norm, alpha=sqrt(1/C)): eps + norm/sqrt(C) — the
    # norm is RMS-scaled, making this magnitude-preserving
    norm = eps + norm * math.sqrt(1.0 / x.shape[-1])
    return (x / norm).astype(x.dtype)


def _mpconv(x, p):
    """Plain conv (weights pre-fused at load); SAME padding."""
    k = p["w"].shape[0]
    return conv1d(x, p["w"], p.get("b"), padding=k // 2)


def _resblock(p, x):
    h = _pixel_norm(x)
    y = _mpconv(_mp_silu(h), p["conv1"])
    y = _mpconv(_mp_silu(y), p["conv2"])
    if "nin" in p:
        h = _mpconv(h, p["nin"])
    return _mp_sum(h, y, t=0.3)


def _attn(p, x):
    """Channel-normalized single-head attention (vae_modules.py:54-79).
    x [B, T, C]."""
    b, t, c = x.shape
    y = _mpconv(x, p["qkv"])            # [B, T, 3C]
    # channel layout (c, 3): q/k/v are INTERLEAVED per channel
    # (vae_modules.py:64-66 reshape (b, h, c, 3, l))
    y = y.reshape(b, t, c, 3)
    norm = jnp.linalg.norm(y.astype(jnp.float32), axis=2, keepdims=True)
    norm = 1e-4 + norm * math.sqrt(1.0 / c)
    y = (y / norm).astype(x.dtype)
    q, k, v = y[..., 0], y[..., 1], y[..., 2]
    s = jnp.einsum("btc,bsc->bts", q, k) / math.sqrt(c)
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bts,bsc->btc", a, v)
    o = _mpconv(o, p["proj"])
    return _mp_sum(x, o, t=0.3)


def mmaudio_vae_decode(params, cfg: MMAudioVAEConfig, z,
                       unnormalize: bool = True):
    """z: [B, T_lat, embed_dim] -> mel [B, 2*T_lat, data_dim]
    (Decoder1D:323-346: conv_in, mid block-attn-block, 3 levels of
    res(+attn at top) with one 2x upsample, mp_silu + gained conv_out,
    then mel de-normalization)."""
    x = _mpconv(z.astype(jnp.float32), params["conv_in"])
    x = _resblock(params["mid_block1"], x)
    x = _attn(params["mid_attn"], x)
    x = _resblock(params["mid_block2"], x)
    x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
    n_levels = len(cfg.ch_mult)
    for i_level in reversed(range(n_levels)):
        lev = params["up"][i_level]
        for i_block in range(cfg.num_res_blocks + 1):
            x = _resblock(lev["blocks"][i_block], x)
            if lev.get("attns"):
                x = _attn(lev["attns"][i_block], x)
            x = jnp.clip(x, -cfg.clip_act, cfg.clip_act)
        if "upsample" in lev:
            b, t, c = x.shape
            x = jnp.repeat(x, 2, axis=1)
            x = _mpconv(x, lev["upsample"])
    x = _mp_silu(x)
    gain = 1.0 + params["gain"]
    k = params["conv_out"]["w"].shape[0]
    x = conv1d(x, params["conv_out"]["w"] * gain, None, padding=k // 2)
    if unnormalize:
        x = x * params["data_std"] + params["data_mean"]
    return x


# ---------------------------------------------------------------------------
# BigVGAN v1 vocoder (ext/bigvgan/models.py:169-246; 16 kHz, hop 256)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class BigVGANConfig:
    num_mels: int = 80
    upsample_initial_channel: int = 1536
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    sample_rate: int = 16000


def _amp_block(p, x, kernel: int, dilations):
    """AMPBlock1 (bigvgan/models.py:20-104): per dilation — alias-free
    snakebeta, dilated conv, alias-free snakebeta, plain conv, skip."""
    for j, d in enumerate(dilations):
        y = alias_free_snake_beta(x, p["snake1"][j]["alpha"],
                                  p["snake1"][j]["beta"])
        y = conv1d(y, p["convs1"][j]["w"], p["convs1"][j]["b"],
                   dilation=d, padding=d * (kernel - 1) // 2)
        y = alias_free_snake_beta(y, p["snake2"][j]["alpha"],
                                  p["snake2"][j]["beta"])
        y = conv1d(y, p["convs2"][j]["w"], p["convs2"][j]["b"],
                   padding=(kernel - 1) // 2)
        x = x + y
    return x


def bigvgan_vocode(params, cfg: BigVGANConfig, mel):
    """mel: [B, T_mel, num_mels] -> wave [B, T_mel * prod(rates)]."""
    x = conv1d(mel.astype(jnp.float32), params["conv_pre"]["w"],
               params["conv_pre"]["b"], padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        up = params["ups"][i]
        x = conv_transpose1d(x, up["w"], up["b"], stride=u,
                             padding=(k - u) // 2)
        xs = None
        for j in range(nk):
            rb = params["resblocks"][i * nk + j]
            y = _amp_block(rb, x, cfg.resblock_kernel_sizes[j],
                           cfg.resblock_dilation_sizes[j])
            xs = y if xs is None else xs + y
        x = xs / nk
    x = alias_free_snake_beta(x, params["post_snake"]["alpha"],
                              params["post_snake"]["beta"])
    x = conv1d(x, params["conv_post"]["w"], params["conv_post"]["b"],
               padding=3)
    return jnp.tanh(x)[..., 0]


def mmaudio_latents_to_wave(vae_params, voc_params, z,
                            vae_cfg: MMAudioVAEConfig = MMAudioVAEConfig(),
                            voc_cfg: BigVGANConfig = BigVGANConfig()):
    """Full decode (features_utils.py decode path): latents -> mel ->
    16 kHz waveform."""
    mel = mmaudio_vae_decode(vae_params, vae_cfg, z)
    return bigvgan_vocode(voc_params, voc_cfg, mel)


# ---------------------------------------------------------------------------
# init + loaders
# ---------------------------------------------------------------------------

def _mpconv_init(key, cin, cout, k):
    w = jax.random.normal(key, (k, cin, cout), jnp.float32)
    # pre-fused remove_weight_norm (edm2_utils.py:160-168)
    norm = jnp.sqrt((w.astype(jnp.float32) ** 2).sum(
        axis=(0, 1), keepdims=True))
    norm = 1e-4 + norm * math.sqrt(1.0 / (cin * k))
    w = w / norm / math.sqrt(cin * k)
    return {"w": w}


def init_mmaudio_vae_decoder(key, cfg: MMAudioVAEConfig = MMAudioVAEConfig()
                             ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))
    block_in = cfg.hidden_dim * cfg.ch_mult[-1]

    def res(cin, cout):
        p = {"conv1": _mpconv_init(next(keys), cin, cout, 3),
             "conv2": _mpconv_init(next(keys), cout, cout, 3)}
        if cin != cout:
            p["nin"] = _mpconv_init(next(keys), cin, cout, 1)
        return p

    def attn(c):
        return {"qkv": _mpconv_init(next(keys), c, 3 * c, 1),
                "proj": _mpconv_init(next(keys), c, c, 1)}

    params: Dict[str, Any] = {
        "conv_in": _mpconv_init(next(keys), cfg.embed_dim, block_in, 3),
        "mid_block1": res(block_in, block_in),
        "mid_attn": attn(block_in),
        "mid_block2": res(block_in, block_in),
        "gain": jnp.zeros((), jnp.float32),
        "data_mean": jnp.asarray(DATA_MEAN_80D),
        "data_std": jnp.asarray(DATA_STD_80D),
    }
    n_levels = len(cfg.ch_mult)
    up: List[Optional[Dict[str, Any]]] = [None] * n_levels
    cin = block_in
    for i_level in reversed(range(n_levels)):
        cout = cfg.hidden_dim * cfg.ch_mult[i_level]
        lev: Dict[str, Any] = {"blocks": []}
        attns = []
        for _ in range(cfg.num_res_blocks + 1):
            lev["blocks"].append(res(cin, cout))
            cin = cout
        lev["attns"] = attns     # 16k/44k configs: attn only in mid
        if i_level in (1,):          # down_layers [0] -> up at level 1
            lev["upsample"] = _mpconv_init(next(keys), cout, cout, 3)
        up[i_level] = lev
    params["up"] = up
    params["conv_out"] = _mpconv_init(next(keys), cfg.hidden_dim,
                                      cfg.data_dim, 3)
    return params


def load_mmaudio_vae_params(sd: Dict[str, np.ndarray],
                            cfg: MMAudioVAEConfig = MMAudioVAEConfig()):
    """TOD-VAE torch keys (decoder.* of ext/autoencoder/vae.py); MPConv
    weights are fused (normalize + 1/sqrt(fan-in)) at load."""
    sd = dict(sd)
    pre = ""
    for cand in ("vae.", "tod.vae.", "module."):
        if any(k.startswith(cand + "decoder.") for k in sd):
            pre = cand
            break

    def pop(k):
        return np.asarray(sd.pop(pre + k), np.float32)

    def mp(name):
        w = pop(f"decoder.{name}.weight")       # [out, in, k]
        norm = np.sqrt((w ** 2).sum(axis=(1, 2), keepdims=True))
        norm = 1e-4 + norm * math.sqrt(1.0 / (w.shape[1] * w.shape[2]))
        w = w / norm / math.sqrt(w.shape[1] * w.shape[2])
        return {"w": jnp.asarray(w.transpose(2, 1, 0))}

    def res(name):
        p = {"conv1": mp(f"{name}.conv1"), "conv2": mp(f"{name}.conv2")}
        if f"{pre}decoder.{name}.nin_shortcut.weight" in sd:
            p["nin"] = mp(f"{name}.nin_shortcut")
        return p

    def attn(name):
        return {"qkv": mp(f"{name}.qkv"), "proj": mp(f"{name}.proj_out")}

    params: Dict[str, Any] = {
        "conv_in": mp("conv_in"),
        "mid_block1": res("mid.block_1"),
        "mid_attn": attn("mid.attn_1"),
        "mid_block2": res("mid.block_2"),
        "conv_out": mp("conv_out"),
        "gain": jnp.asarray(pop("decoder.learnable_gain")),
    }
    n_levels = len(cfg.ch_mult)
    up = []
    for i_level in range(n_levels):
        lev: Dict[str, Any] = {"blocks": [], "attns": []}
        for j in range(cfg.num_res_blocks + 1):
            lev["blocks"].append(res(f"up.{i_level}.block.{j}"))
            if f"{pre}decoder.up.{i_level}.attn.{j}.qkv.weight" in sd:
                lev["attns"].append(attn(f"up.{i_level}.attn.{j}"))
        if f"{pre}decoder.up.{i_level}.upsample.conv.weight" in sd:
            lev["upsample"] = mp(f"up.{i_level}.upsample.conv")
        up.append(lev)
    params["up"] = up
    for stat, arr in (("data_mean", DATA_MEAN_80D),
                      ("data_std", DATA_STD_80D)):
        key = pre + stat
        params[stat] = (jnp.asarray(np.asarray(sd.pop(key),
                                               np.float32).reshape(-1))
                        if key in sd else jnp.asarray(arr))
    leftover = [k for k in sd if "encoder" not in k]
    return params, sorted(leftover)


def init_bigvgan_vocoder(key, cfg: BigVGANConfig = BigVGANConfig(),
                         dtype=jnp.float32):
    """Random-init BigVGAN params in the bigvgan_vocode() tree layout
    (same structure load_bigvgan_vocoder_params produces)."""
    import jax

    nk = len(cfg.resblock_kernel_sizes)
    n_up = len(cfg.upsample_rates)
    n_keys = 2 + n_up + n_up * nk * 8
    keys = iter(jax.random.split(key, n_keys + 4))

    def conv(k, cin, cout, std=0.02):
        return {"w": (jax.random.normal(next(keys), (k, cin, cout),
                                        jnp.float32) * std).astype(dtype),
                "b": jnp.zeros((cout,), dtype)}

    def snake(ch):
        return {"alpha": jnp.zeros((ch,), jnp.float32),
                "beta": jnp.zeros((ch,), jnp.float32)}

    ch = cfg.upsample_initial_channel
    params = {"conv_pre": conv(7, cfg.num_mels, ch)}
    ups, resblocks = [], []
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cout = ch // 2
        ups.append(conv(k, ch, cout))
        for j, kr in enumerate(cfg.resblock_kernel_sizes):
            nd = len(cfg.resblock_dilation_sizes[j])
            resblocks.append({
                "convs1": [conv(kr, cout, cout) for _ in range(nd)],
                "convs2": [conv(kr, cout, cout) for _ in range(nd)],
                "snake1": [snake(cout) for _ in range(nd)],
                "snake2": [snake(cout) for _ in range(nd)]})
        ch = cout
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["post_snake"] = snake(ch)
    params["conv_post"] = conv(7, ch, 1)
    return params


def load_bigvgan_vocoder_params(sd: Dict[str, np.ndarray],
                                cfg: BigVGANConfig = BigVGANConfig()):
    """BigVGAN v1 keys (ext/bigvgan/models.py; weight-norm fused)."""
    sd = dict(sd)
    for p_ in ("generator.", "vocoder.", "module."):
        if any(k.startswith(p_) for k in sd):
            sd = {k[len(p_):] if k.startswith(p_) else k: v
                  for k, v in sd.items()}
            break

    def wn(prefix):
        for gk, vk in ((f"{prefix}.weight_g", f"{prefix}.weight_v"),
                       (f"{prefix}.parametrizations.weight.original0",
                        f"{prefix}.parametrizations.weight.original1")):
            if gk in sd:
                g = np.asarray(sd.pop(gk), np.float32)
                v = np.asarray(sd.pop(vk), np.float32)
                norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
                return g * v / np.maximum(norm, 1e-12)
        return np.asarray(sd.pop(f"{prefix}.weight"), np.float32)

    def conv(prefix, transpose=False):
        w = wn(prefix)
        if transpose:        # [in, out, k] -> [k, cin, cout] (the
            # minimax conv_transpose1d convention, oracle-validated)
            w = np.ascontiguousarray(w.transpose(2, 0, 1))
        else:
            w = w.transpose(2, 1, 0)
        return {"w": jnp.asarray(np.ascontiguousarray(w)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{prefix}.bias"),
                                            np.float32))}

    def snake(prefix):
        return {"alpha": jnp.asarray(pop_act(f"{prefix}.alpha")),
                "beta": jnp.asarray(pop_act(f"{prefix}.beta"))}

    def pop_act(k):
        return np.asarray(sd.pop(k), np.float32).reshape(-1)

    nk = len(cfg.resblock_kernel_sizes)
    ups = [conv(f"ups.{i}.0", transpose=True)
           for i in range(len(cfg.upsample_rates))]
    resblocks = []
    for idx in range(len(cfg.upsample_rates) * nk):
        pre = f"resblocks.{idx}"
        nd = len(cfg.resblock_dilation_sizes[idx % nk])
        resblocks.append({
            "convs1": [conv(f"{pre}.convs1.{j}") for j in range(nd)],
            "convs2": [conv(f"{pre}.convs2.{j}") for j in range(nd)],
            "snake1": [snake(f"{pre}.activations.{2 * j}.act")
                       for j in range(nd)],
            "snake2": [snake(f"{pre}.activations.{2 * j + 1}.act")
                       for j in range(nd)],
        })
    params = {
        "conv_pre": conv("conv_pre"),
        "ups": ups,
        "resblocks": resblocks,
        "post_snake": snake("activation_post.act"),
        "conv_post": conv("conv_post"),
    }
    return params, sorted(sd.keys())
