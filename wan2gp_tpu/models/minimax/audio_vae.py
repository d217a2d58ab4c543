"""MiniMax H3 audio autoencoder (DAC encoder + BigVGAN decoder), TPU-native.

Functional re-implementation of the reference AutoencoderKLMiniMaxH3Audio
(/root/reference/models/minimax_h3/components/audio_autoencoder.py):
mono 32 kHz waveforms, hop 800 (encoder strides 2*4*4*5*5), latent 32ch at
40 latents/s.
- Snake / SnakeBeta activations (:130-158);
- Kaiser-sinc anti-aliased resamplers (:102-127, :160-228) with the
  alias-free activation wrapper (up2x -> act -> down2x);
- DAC encoder: residual units at dilations 1/3/9 + stride convs doubling
  channels (:231-296);
- causal-attention latent projection (mean over heads + adaptive-avg-pool
  to 32ch, :316-390);
- BigVGAN decoder: transposed-conv upsampling + 3 parallel AMP blocks
  averaged per stage (:392-491), final clamp to [-1, 1].

Weight-normalized convs are fused (w = g * v / ||v||) at load time.
All math stays float32 (the reference pins these modules fp32, :533-537).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class MiniMaxAudioVAEConfig:
    encoder_dim: int = 64
    encoder_rates: Tuple[int, ...] = (2, 4, 4, 5, 5)
    latent_dim: int = 2048
    latent_channels: int = 32
    num_attention_heads: int = 8
    decoder_dim: int = 1024
    decoder_rates: Tuple[int, ...] = (5, 5, 2, 2, 2, 2, 2)
    decoder_kernel_sizes: Tuple[int, ...] = (9, 9, 4, 4, 4, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    sampling_rate: int = 32000

    @property
    def hop_length(self):
        return int(np.prod(self.encoder_rates))


# ---------------------------------------------------------------------------
# primitives (NLC layout: [B, L, C])
# ---------------------------------------------------------------------------

def kaiser_sinc_filter(cutoff: float, half_width: float,
                       kernel_size: int) -> np.ndarray:
    """[kernel_size] Kaiser-windowed sinc low-pass (audio_autoencoder.py
    :102-127 — arithmetic kept identical to alias-free-torch)."""
    half_size = kernel_size // 2
    att = 2.285 * (half_size - 1) * math.pi * (4 * half_width) + 7.95
    if att > 50.0:
        beta = 0.1102 * (att - 8.7)
    elif att >= 21.0:
        beta = 0.5842 * (att - 21) ** 0.4 + 0.07886 * (att - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if kernel_size % 2 == 0:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


def conv1d(x, w, b=None, stride=1, dilation=1, padding=0, groups=1):
    """x: [B, L, C]; w: [k, Cin/groups, Cout]."""
    if padding:
        x = jnp.pad(x, [(0, 0), (padding, padding), (0, 0)])
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride,), "VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def conv_transpose1d(x, w, b=None, stride=1, padding=0, groups=1):
    """torch ConvTranspose1d: w pre-flipped+swapped by the caller/loader to
    [k, Cin/groups, Cout] dilated-conv layout."""
    k = w.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1,), [(pad, pad)], lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=groups)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def snake(x, alpha):
    a = alpha.astype(jnp.float32)
    x32 = x.astype(jnp.float32)
    return (x32 + jnp.sin(a * x32) ** 2 / (a + 1e-9)).astype(x.dtype)


def snake_beta(x, alpha_log, beta_log):
    a = jnp.exp(alpha_log.astype(jnp.float32))
    b = jnp.exp(beta_log.astype(jnp.float32))
    x32 = x.astype(jnp.float32)
    return (x32 + jnp.sin(a * x32) ** 2 / (b + 1e-9)).astype(x.dtype)


def _lowpass(x, filt, stride, pad_left, pad_right):
    c = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (pad_left, pad_right), (0, 0)], mode="edge")
    w = jnp.broadcast_to(filt[:, None, None], (filt.shape[0], 1, c))
    return conv1d(x, w, stride=stride, groups=c)


def upsample2x(x, filt):
    """Anti-aliased 2x upsample (ratio 2, kernel 12; :179-201)."""
    ratio, k = 2, filt.shape[0]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    c = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="edge")
    w = jnp.broadcast_to(filt[::-1][:, None, None], (k, 1, c))
    y = ratio * conv_transpose1d(x, w, stride=ratio, padding=0, groups=c)
    return y[:, pad_left:-pad_right]


def downsample2x(x, filt):
    ratio, k = 2, filt.shape[0]
    even = k % 2 == 0
    return _lowpass(x, filt, ratio, k // 2 - int(even), k // 2)


_AA_FILTER = None


def _aa_filter():
    global _AA_FILTER
    if _AA_FILTER is None:
        _AA_FILTER = jnp.asarray(kaiser_sinc_filter(0.25, 0.3, 12))
    return _AA_FILTER


def alias_free_snake_beta(x, alpha_log, beta_log):
    """up2x -> SnakeBeta -> down2x (:216-228)."""
    f = _aa_filter()
    return downsample2x(snake_beta(upsample2x(x, f), alpha_log, beta_log), f)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _residual_unit(p, x, dilation):
    h = snake(x, p["alpha1"])
    h = conv1d(h, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation,
               padding=(7 - 1) * dilation // 2)
    h = snake(h, p["alpha2"])
    h = conv1d(h, p["conv2"]["w"], p["conv2"]["b"])
    return x + h


def audio_encode(params, cfg: MiniMaxAudioVAEConfig, wave):
    """wave: [B, 1, samples] mono (right-padded to hop multiple).
    Returns latents [B, 32, T] (posterior mean via pre_block + mean_proj)."""
    s = wave.shape[-1]
    pad = (-s) % cfg.hop_length
    if pad:
        wave = jnp.pad(wave, [(0, 0), (0, 0), (0, pad)])
    x = wave.transpose(0, 2, 1).astype(jnp.float32)     # [B, L, 1]
    enc = params["encoder"]
    x = conv1d(x, enc["conv_in"]["w"], enc["conv_in"]["b"], padding=3)
    for i, stride in enumerate(cfg.encoder_rates):
        blk = enc["blocks"][i]
        for j, d in enumerate((1, 3, 9)):
            x = _residual_unit(blk["res"][j], x, d)
        x = snake(x, blk["alpha"])
        x = conv1d(x, blk["down"]["w"], blk["down"]["b"], stride=stride,
                   padding=math.ceil(stride / 2))
    x = snake(x, enc["alpha_out"])
    x = conv1d(x, enc["conv_out"]["w"], enc["conv_out"]["b"], padding=1)

    # attention projection to latent width (:376-390)
    pb = params["pre_block"]
    b, l, d = x.shape
    n = cfg.num_attention_heads
    hd = d // n

    def ln(v, p):
        v32 = v.astype(jnp.float32)
        mean = jnp.mean(v32, axis=-1, keepdims=True)
        var = jnp.var(v32, axis=-1, keepdims=True)
        return (v32 - mean) * jax.lax.rsqrt(var + 1e-5) * p["w"] + p["b"]

    y = ln(x, pb["norm1"])
    bias = jnp.concatenate([pb["q_bias"], jnp.zeros_like(pb["q_bias"]),
                            pb["v_bias"]])
    qkv = jnp.dot(y, pb["qkv"]["w"]) + bias
    q, k, v = jnp.split(qkv.reshape(b, l, 3, n, hd), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]
    sma = jnp.einsum("blnd,bsnd->bnls", q, k,
                     preferred_element_type=jnp.float32) / math.sqrt(hd)
    causal = jnp.tril(jnp.ones((l, l), bool))
    sma = jnp.where(causal[None, None], sma, jnp.finfo(jnp.float32).min)
    attn = jnp.einsum("bnls,bsnd->blnd", jax.nn.softmax(sma, axis=-1), v)
    attn = jnp.mean(attn, axis=2)                         # mean over heads
    group = hd // cfg.latent_channels
    attn = attn.reshape(b, l, cfg.latent_channels, group).mean(-1)
    attn = jnp.dot(attn, pb["proj_out"]["w"]) + pb["proj_out"]["b"]
    h = jnp.dot(ln(x, pb["norm3"]), pb["proj"]["w"]) + pb["proj"]["b"]
    h = h + attn
    # reference GeGluMlp applies its own LayerNorm after norm2 (:303-311)
    y = ln(ln(h, pb["norm2"]), pb["mlp_norm"])
    g = jax.nn.gelu(jnp.dot(y, pb["w0"]["w"]) + pb["w0"]["b"],
                    approximate=True)
    y = g * (jnp.dot(y, pb["w1"]["w"]) + pb["w1"]["b"])
    h = h + jnp.dot(y, pb["w2"]["w"]) + pb["w2"]["b"]

    mean = conv1d(h, params["mean_proj"]["w"], params["mean_proj"]["b"])
    return mean.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _amp_block(p, x, kernel, dilations):
    for i, d in enumerate(dilations):
        h = alias_free_snake_beta(x, p["a1"][i], p["b1"][i])
        h = conv1d(h, p["conv1"][i]["w"], p["conv1"][i]["b"], dilation=d,
                   padding=(kernel * d - d) // 2)
        h = alias_free_snake_beta(h, p["a2"][i], p["b2"][i])
        h = conv1d(h, p["conv2"][i]["w"], p["conv2"][i]["b"],
                   padding=(kernel - 1) // 2)
        x = x + h
    return x


def audio_decode(params, cfg: MiniMaxAudioVAEConfig, latents):
    """latents: [B, 32, T] -> waveform [B, 1, T*800] in [-1, 1]."""
    x = latents.transpose(0, 2, 1).astype(jnp.float32)
    x = conv1d(x, params["dec_in_proj"]["w"], params["dec_in_proj"]["b"])
    dec = params["decoder"]
    x = conv1d(x, dec["conv_pre"]["w"], dec["conv_pre"]["b"], padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (rate, kernel) in enumerate(zip(cfg.decoder_rates,
                                           cfg.decoder_kernel_sizes)):
        up = dec["ups"][i]
        x = conv_transpose1d(x, up["w"], up["b"], stride=rate,
                             padding=(kernel - rate) // 2)
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilations)):
            out = _amp_block(dec["resblocks"][i * nk + j], x, rk, rd)
            acc = out if acc is None else acc + out
        x = acc / nk
    x = alias_free_snake_beta(x, dec["alpha_post"], dec["beta_post"])
    x = conv1d(x, dec["conv_post"]["w"], None, padding=3)
    return jnp.clip(x.transpose(0, 2, 1), -1.0, 1.0)


# ---------------------------------------------------------------------------
# init (random, for tests) and loader
# ---------------------------------------------------------------------------

def _c1(key, cin, cout, k, dtype=jnp.float32, bias=True):
    s = 1.0 / math.sqrt(cin * k)
    p = {"w": jax.random.uniform(key, (k, cin, cout), jnp.float32, -s, s)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    else:
        p["b"] = None
    return p


def _lin_p(key, din, dout):
    s = math.sqrt(6.0 / (din + dout))
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32, -s, s),
            "b": jnp.zeros((dout,), jnp.float32)}


def init_minimax_audio_vae(key, cfg: MiniMaxAudioVAEConfig =
                           MiniMaxAudioVAEConfig()):
    keys = iter(jax.random.split(key, 256))
    d = cfg.encoder_dim
    enc = {"conv_in": _c1(next(keys), 1, d, 7), "blocks": []}
    for stride in cfg.encoder_rates:
        d2 = d * 2
        blk = {"res": [{"alpha1": jnp.ones((d,)),
                        "conv1": _c1(next(keys), d, d, 7),
                        "alpha2": jnp.ones((d,)),
                        "conv2": _c1(next(keys), d, d, 1)}
                       for _ in range(3)],
               "alpha": jnp.ones((d,)),
               "down": _c1(next(keys), d, d2, 2 * stride)}
        enc["blocks"].append(blk)
        d = d2
    enc["alpha_out"] = jnp.ones((d,))
    enc["conv_out"] = _c1(next(keys), d, cfg.latent_dim, 3)

    ld, lc = cfg.latent_dim, cfg.latent_channels
    pre = {"norm1": {"w": jnp.ones((ld,)), "b": jnp.zeros((ld,))},
           "norm3": {"w": jnp.ones((ld,)), "b": jnp.zeros((ld,))},
           "norm2": {"w": jnp.ones((lc,)), "b": jnp.zeros((lc,))},
           "mlp_norm": {"w": jnp.ones((lc,)), "b": jnp.zeros((lc,))},
           "qkv": {"w": jax.random.normal(next(keys), (ld, 3 * ld)) * 0.02},
           "q_bias": jnp.zeros((ld,)), "v_bias": jnp.zeros((ld,)),
           "proj_out": _lin_p(next(keys), lc, lc),
           "proj": _lin_p(next(keys), ld, lc),
           "w0": _lin_p(next(keys), lc, 2 * lc),
           "w1": _lin_p(next(keys), lc, 2 * lc),
           "w2": _lin_p(next(keys), 2 * lc, lc)}

    dd = cfg.decoder_dim
    dec = {"conv_pre": _c1(next(keys), cfg.latent_dim, dd, 7),
           "ups": [], "resblocks": []}
    ch = dd
    for i, (rate, kernel) in enumerate(zip(cfg.decoder_rates,
                                           cfg.decoder_kernel_sizes)):
        nxt = dd // (2 ** (i + 1))
        dec["ups"].append(_c1(next(keys), ch, nxt, kernel))
        for rk, rd in zip(cfg.resblock_kernel_sizes,
                          cfg.resblock_dilations):
            dec["resblocks"].append({
                "a1": [jnp.zeros((nxt,)) for _ in rd],
                "b1": [jnp.zeros((nxt,)) for _ in rd],
                "a2": [jnp.zeros((nxt,)) for _ in rd],
                "b2": [jnp.zeros((nxt,)) for _ in rd],
                "conv1": [_c1(next(keys), nxt, nxt, rk) for _ in rd],
                "conv2": [_c1(next(keys), nxt, nxt, rk) for _ in rd]})
        ch = nxt
    dec["alpha_post"] = jnp.zeros((ch,))
    dec["beta_post"] = jnp.zeros((ch,))
    dec["conv_post"] = _c1(next(keys), ch, 1, 7, bias=False)

    return {"encoder": enc, "pre_block": pre,
            "mean_proj": _c1(next(keys), lc, lc, 1),
            "dec_in_proj": _c1(next(keys), lc, cfg.latent_dim, 1),
            "decoder": dec}


def load_minimax_audio_vae_params(sd: Dict[str, Any],
                                  cfg: MiniMaxAudioVAEConfig =
                                  MiniMaxAudioVAEConfig()):
    """Torch key space (AutoencoderKLMiniMaxH3Audio; Sequential nesting):
    encoder.block.0 conv_in; encoder.block.{1..n} EncoderBlock.block =
    [res(dil 1), res(3), res(9), Snake.alpha, strided conv]; each res.block
    = [Snake, conv k7, Snake, conv k1]; encoder.block.{n+1}.alpha +
    .{n+2} conv_out; pre_block.{norm1,norm3,norm2, attn.{qkv,q_bias,
    v_bias,proj}, proj, mlp.{w0,w1,w2}}; mean_proj/logs_proj/dec_in_proj;
    decoder.{conv_pre, ups.i.0, resblocks.k.{convs1.j, convs2.j,
    activations.j.act.{alpha,beta}}, activation_post.act, conv_post}.
    Weight-norm convs store weight_g/weight_v and are fused here."""
    renamed = {}
    for k, val in sd.items():
        # modern torch parametrization keys -> legacy weight_g/weight_v
        k = k.replace("parametrizations.weight.original0", "weight_g")
        k = k.replace("parametrizations.weight.original1", "weight_v")
        renamed[k] = val
    sd = renamed

    def conv(name, bias=True):
        if f"{name}.weight_v" in sd:
            v = np.asarray(sd.pop(f"{name}.weight_v"), np.float32)
            g = np.asarray(sd.pop(f"{name}.weight_g"), np.float32)
            nrm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            w = g * v / np.maximum(nrm, 1e-12)
        else:
            w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        p = {"w": jnp.asarray(np.ascontiguousarray(w.transpose(2, 1, 0)))}
        b = sd.pop(f"{name}.bias", None)
        p["b"] = jnp.asarray(np.asarray(b, np.float32)) if b is not None \
            else None
        return p

    def tconv(name):
        """ConvTranspose1d [Cin, Cout, k] -> flipped dilated-conv layout."""
        if f"{name}.weight_v" in sd:
            # torch weight_norm default dim=0 keeps Cin for ConvTranspose1d
            v = np.asarray(sd.pop(f"{name}.weight_v"), np.float32)
            g = np.asarray(sd.pop(f"{name}.weight_g"), np.float32)
            nrm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True))
            w = g * v / np.maximum(nrm, 1e-12)
        else:
            w = np.asarray(sd.pop(f"{name}.weight"), np.float32)
        w = w[:, :, ::-1]                       # [Cin, Cout, k] flipped
        p = {"w": jnp.asarray(np.ascontiguousarray(w.transpose(2, 0, 1)))}
        b = sd.pop(f"{name}.bias", None)
        p["b"] = jnp.asarray(np.asarray(b, np.float32)) if b is not None \
            else None
        return p

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32).reshape(-1))

    def lin(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32).T),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32))}

    n_stages = len(cfg.encoder_rates)
    enc = {"conv_in": conv("encoder.block.0"), "blocks": []}
    for i in range(n_stages):
        pre = f"encoder.block.{i + 1}.block"
        blk = {"res": [], "alpha": vec(f"{pre}.3.alpha"),
               "down": conv(f"{pre}.4")}
        for j in range(3):
            rp = f"{pre}.{j}.block"
            blk["res"].append({"alpha1": vec(f"{rp}.0.alpha"),
                               "conv1": conv(f"{rp}.1"),
                               "alpha2": vec(f"{rp}.2.alpha"),
                               "conv2": conv(f"{rp}.3")})
        enc["blocks"].append(blk)
    enc["alpha_out"] = vec(f"encoder.block.{n_stages + 1}.alpha")
    enc["conv_out"] = conv(f"encoder.block.{n_stages + 2}")

    def norm(name):
        return {"w": vec(f"{name}.weight"), "b": vec(f"{name}.bias")}

    pre = {"norm1": norm("pre_block.norm1"),
           "norm3": norm("pre_block.norm3"),
           "norm2": norm("pre_block.norm2"),
           "mlp_norm": norm("pre_block.mlp.norm"),
           "qkv": {"w": jnp.asarray(np.asarray(
               sd.pop("pre_block.attn.qkv.weight"), np.float32).T)},
           "q_bias": vec("pre_block.attn.q_bias"),
           "v_bias": vec("pre_block.attn.v_bias"),
           "proj_out": lin("pre_block.attn.proj"),
           "proj": lin("pre_block.proj"),
           "w0": lin("pre_block.mlp.w0"),
           "w1": lin("pre_block.mlp.w1"),
           "w2": lin("pre_block.mlp.w2")}
    sd.pop("pre_block.attn.zero_k_bias", None)

    nk = len(cfg.resblock_kernel_sizes)
    dec = {"conv_pre": conv("decoder.conv_pre"), "ups": [],
           "resblocks": []}
    for i in range(len(cfg.decoder_rates)):
        dec["ups"].append(tconv(f"decoder.ups.{i}.0"))
        for j in range(nk):
            rb = f"decoder.resblocks.{i * nk + j}"
            nd = len(cfg.resblock_dilations[j])
            p = {"a1": [], "b1": [], "a2": [], "b2": [],
                 "conv1": [], "conv2": []}
            for m in range(nd):
                p["conv1"].append(conv(f"{rb}.convs1.{m}"))
                p["conv2"].append(conv(f"{rb}.convs2.{m}"))
                p["a1"].append(vec(f"{rb}.activations.{2 * m}.act.alpha"))
                p["b1"].append(vec(f"{rb}.activations.{2 * m}.act.beta"))
                p["a2"].append(vec(
                    f"{rb}.activations.{2 * m + 1}.act.alpha"))
                p["b2"].append(vec(
                    f"{rb}.activations.{2 * m + 1}.act.beta"))
            dec["resblocks"].append(p)
    dec["alpha_post"] = vec("decoder.activation_post.act.alpha")
    dec["beta_post"] = vec("decoder.activation_post.act.beta")
    dec["conv_post"] = conv("decoder.conv_post", bias=False)

    params = {"encoder": enc, "pre_block": pre,
              "mean_proj": conv("mean_proj"),
              "dec_in_proj": conv("dec_in_proj"),
              "decoder": dec}
    leftover = [k for k in sd
                if not (k.startswith("logs_proj") or ".filter" in k
                        or "lowpass" in k)]
    return params, sorted(leftover)
