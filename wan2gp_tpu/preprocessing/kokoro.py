"""Kokoro-82M TTS (StyleTTS2) — voice-sample generation.

TPU-native re-implementation of the reference Kokoro stack
(/root/reference/preprocessing/kokoro/):
- model.py:92-126 forward_with_tokens: PL-BERT (ALBERT) over phoneme
  ids -> bert_encoder -> DurationEncoder (LSTM + AdaLayerNorm stack)
  -> duration LSTM + sigmoid-sum duration head -> hard alignment ->
  shared LSTM -> F0/N AdainResBlk1d stacks -> text encoder
  (convs + BiLSTM) -> iSTFTNet decoder;
- istftnet.py: AdaIN1d (affine InstanceNorm), Snake resblocks,
  harmonic-noise source (SineGen:117-210), upsample generator with
  noise branch over the harmonic STFT, exp/sin magnitude-phase head +
  inverse STFT (:305-325);
- the style vector `ref_s` splits [decoder 128 | prosody 128]
  (model.py:105: s = ref_s[:, 128:]).

Phonemisation (misaki G2P) is out of scope: the API takes phoneme
strings and maps them through the checkpoint vocab, matching
KModel.forward (model.py:128-141).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class KokoroConfig:
    n_token: int = 178
    hidden_dim: int = 512
    style_dim: int = 128
    n_layer: int = 3
    max_dur: int = 50
    n_mels: int = 80
    text_encoder_kernel_size: int = 5
    # PL-BERT (ALBERT)
    plbert_hidden: int = 768
    plbert_heads: int = 12
    plbert_ffn: int = 2048
    plbert_layers: int = 12
    plbert_max_pos: int = 512
    plbert_embedding: int = 128
    # istftnet
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilations: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    upsample_rates: Sequence[int] = (10, 6)
    upsample_kernel_sizes: Sequence[int] = (20, 12)
    upsample_initial_channel: int = 512
    gen_istft_n_fft: int = 20
    gen_istft_hop_size: int = 5
    sample_rate: int = 24000
    decoder_hidden: int = 1024       # istftnet.py:384 hardcoded 1024
    asr_res_ch: int = 64


# -- primitives -------------------------------------------------------------

def _conv1d(x, w, b=None, stride=1, dilation=1, padding=0, groups=1):
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)], rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups)
    if b is not None:
        y = y + b[None, :, None]
    return y


def _conv_transpose1d(x, w, b=None, stride=1, padding=0,
                      output_padding=0, groups=1):
    """torch ConvTranspose1d; w: [in, out/groups, k]."""
    k = w.shape[-1]
    cin = x.shape[1]
    if groups == 1:
        wf = jnp.flip(w, axis=-1).transpose(1, 0, 2)
    else:
        # grouped (depthwise) transpose: block-diagonal equivalence
        wf = jnp.flip(w, axis=-1)       # [in, out/g, k]
        outg = wf.shape[1]
        full = jnp.zeros((outg * groups, cin, k), wf.dtype)
        per = cin // groups
        for g in range(groups):
            full = full.at[g * outg:(g + 1) * outg,
                           g * per:(g + 1) * per].set(
                wf[g * per:(g + 1) * per].transpose(1, 0, 2))
        wf = full
    pad_l = k - 1 - padding
    pad_r = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, wf, (1,), [(pad_l, pad_r)], lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def _layer_norm(x, w, b, eps=1e-5, axis=-1):
    mu = x.mean(axis=axis, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=axis, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _instance_norm1d(x, w, b, eps=1e-5):
    """torch InstanceNorm1d(affine=True): per-(batch, channel) stats
    over time.  x: [B, C, T]."""
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w[None, :, None] \
        + b[None, :, None]


def _adain(p, x, s):
    """AdaIN1d (istftnet.py:20-31)."""
    h = s @ p["fc"]["w"] + p["fc"]["b"]
    gamma, beta = jnp.split(h[:, :, None], 2, axis=1)
    return (1 + gamma) * _instance_norm1d(x, p["norm_w"], p["norm_b"]) \
        + beta


def _lstm_cell_scan(x, w_ih, w_hh, b, reverse=False):
    """One-direction LSTM (torch gate order i,f,g,o).  x: [T, B, in]."""
    h_dim = w_hh.shape[1]

    def step(carry, xt):
        h, c = carry
        gates = xt @ w_ih.T + h @ w_hh.T + b
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        c = f * c + i * jnp.tanh(g)
        h = o * jnp.tanh(c)
        return (h, c), h

    b0 = x.shape[1]
    init = (jnp.zeros((b0, h_dim), x.dtype), jnp.zeros((b0, h_dim),
                                                       x.dtype))
    xs = jnp.flip(x, 0) if reverse else x
    _, hs = jax.lax.scan(step, init, xs)
    return jnp.flip(hs, 0) if reverse else hs


def _bilstm(p, x):
    """torch bidirectional LSTM (batch_first).  x: [B, T, in] ->
    [B, T, 2*h]."""
    xt = x.transpose(1, 0, 2)
    fwd = _lstm_cell_scan(xt, p["w_ih"], p["w_hh"],
                          p["b_ih"] + p["b_hh"])
    bwd = _lstm_cell_scan(xt, p["w_ih_r"], p["w_hh_r"],
                          p["b_ih_r"] + p["b_hh_r"], reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1).transpose(1, 0, 2)


def _snake(x, alpha):
    return x + (1.0 / alpha) * jnp.sin(alpha * x) ** 2


# -- STFT -------------------------------------------------------------------

def _hann(n):
    return 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)


def stft_transform(x, n_fft: int, hop: int):
    """torch.stft(center=True, reflect? default pad mode 'reflect' is
    False — torch.stft uses constant? torch.stft center pads with
    reflect by default=False; actually torch.stft(center=True) uses
    `pad_mode='reflect'`.  x: [B, T] -> (mag, phase) [B, F, frames]."""
    win = jnp.asarray(_hann(n_fft), jnp.float32)
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (xp.shape[1] - n_fft) // hop
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :])
    frames = xp[:, idx] * win[None, None, :]
    spec = jnp.fft.rfft(frames, axis=-1)          # [B, frames, F]
    spec = spec.transpose(0, 2, 1)
    return jnp.abs(spec), jnp.angle(spec)


def stft_inverse(mag, phase, n_fft: int, hop: int):
    """torch.istft(center=True) with hann window-sum normalisation."""
    win = jnp.asarray(_hann(n_fft), jnp.float32)
    spec = (mag * jnp.exp(1j * phase)).transpose(0, 2, 1)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win[None, None, :]
    b, n_frames, _ = frames.shape
    t_len = n_fft + hop * (n_frames - 1)
    idx = (np.arange(n_frames)[:, None] * hop
           + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((b, t_len), jnp.float32)
    out = out.at[:, idx].add(frames.reshape(b, -1))
    wsum = np.zeros(t_len, np.float32)
    np.add.at(wsum, idx, np.tile(_hann(n_fft) ** 2, n_frames))
    out = out / jnp.asarray(np.maximum(wsum, 1e-11))
    pad = n_fft // 2
    return out[:, pad:t_len - pad]


# -- forward pieces ---------------------------------------------------------

def albert_forward(p, cfg: KokoroConfig, ids):
    """Minimal ALBERT (PL-BERT) encoder: shared layer applied
    `plbert_layers` times (StyleTTS2 Utils/PLBERT)."""
    b, l = ids.shape
    x = p["word_emb"][ids] + p["pos_emb"][None, :l] + p["type_emb"][0]
    x = _layer_norm(x, p["emb_ln_w"], p["emb_ln_b"], eps=1e-12)
    x = x @ p["emb_map"]["w"] + p["emb_map"]["b"]
    h = cfg.plbert_hidden
    nh = cfg.plbert_heads
    hd = h // nh
    lp = p["layer"]
    for _ in range(cfg.plbert_layers):
        q = (x @ lp["q"]["w"] + lp["q"]["b"]).reshape(b, l, nh, hd)
        k = (x @ lp["k"]["w"] + lp["k"]["b"]).reshape(b, l, nh, hd)
        v = (x @ lp["v"]["w"] + lp["v"]["b"]).reshape(b, l, nh, hd)
        a = jnp.einsum("blnd,bmnd->bnlm", q, k) / math.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bnlm,bmnd->blnd", a, v).reshape(b, l, h)
        x = _layer_norm(x + (o @ lp["o"]["w"] + lp["o"]["b"]),
                        lp["attn_ln_w"], lp["attn_ln_b"], eps=1e-12)
        f = jax.nn.gelu(x @ lp["ffn"]["w"] + lp["ffn"]["b"],
                        approximate=False)
        f = f @ lp["ffn_out"]["w"] + lp["ffn_out"]["b"]
        x = _layer_norm(x + f, lp["ffn_ln_w"], lp["ffn_ln_b"],
                        eps=1e-12)
    return x


def duration_encoder(p, x_bert, style, cfg: KokoroConfig):
    """DurationEncoder (modules.py:136-175): per layer a BiLSTM over
    [x || style] then AdaLayerNorm, style re-appended."""
    b, l, _ = x_bert.shape
    s = jnp.broadcast_to(style[:, None], (b, l, style.shape[-1]))
    x = jnp.concatenate([x_bert, s], axis=-1)
    for i in range(cfg.n_layer):
        x = _bilstm(p["lstm"][i], x)
        h = style @ p["ada"][i]["fc"]["w"] + p["ada"][i]["fc"]["b"]
        gamma, beta = jnp.split(h[:, None], 2, axis=-1)
        xn = _layer_norm(x, jnp.ones((x.shape[-1],)),
                         jnp.zeros((x.shape[-1],)))
        x = (1 + gamma) * xn + beta
        x = jnp.concatenate([x, s], axis=-1)
    return x                                    # [B, L, hidden+style]


def adain_res_blk(p, x, s, upsample: bool = False):
    """AdainResBlk1d (istftnet.py:339-381)."""
    def act(v):
        return jnp.where(v >= 0, v, 0.2 * v)

    y = _adain(p["norm1"], x, s)
    y = act(y)
    if upsample:
        y = _conv_transpose1d(y, p["pool"]["w"], p["pool"]["b"],
                              stride=2, padding=1, output_padding=1,
                              groups=x.shape[1])
    y = _conv1d(y, p["conv1"]["w"], p["conv1"]["b"], padding=1)
    y = _adain(p["norm2"], y, s)
    y = act(y)
    y = _conv1d(y, p["conv2"]["w"], p["conv2"]["b"], padding=1)
    sc = x
    if upsample:
        sc = jnp.repeat(sc, 2, axis=-1)         # nearest 2x
    if "conv1x1" in p:
        sc = _conv1d(sc, p["conv1x1"]["w"])
    return (y + sc) / math.sqrt(2.0)


def adain_resblock1(p, x, s, kernel: int, dilations):
    """AdaINResBlock1 with Snake (istftnet.py:34-78)."""
    for i, d in enumerate(dilations):
        xt = _adain(p["adain1"][i], x, s)
        xt = _snake(xt, p["alpha1"][i][None])
        xt = _conv1d(xt, p["convs1"][i]["w"], p["convs1"][i]["b"],
                     dilation=d, padding=(kernel * d - d) // 2)
        xt = _adain(p["adain2"][i], xt, s)
        xt = _snake(xt, p["alpha2"][i][None])
        xt = _conv1d(xt, p["convs2"][i]["w"], p["convs2"][i]["b"],
                     padding=(kernel - 1) // 2)
        x = xt + x
    return x


def _interp_linear(x, out_len):
    """F.interpolate(mode='linear', align_corners=False) on [B, C, T]."""
    t = x.shape[-1]
    pos = (np.arange(out_len) + 0.5) * t / out_len - 0.5
    lo = np.clip(np.floor(pos).astype(int), 0, t - 1)
    hi = np.clip(lo + 1, 0, t - 1)
    frac = jnp.asarray(np.clip(pos - lo, 0.0, 1.0), jnp.float32)
    return x[..., lo] * (1 - frac) + x[..., hi] * frac


def sine_source(p, f0_up, cfg: KokoroConfig, rng: np.random.Generator):
    """SourceModuleHnNSF (istftnet.py:212-254): 9 harmonics -> phase
    accumulation at the frame rate -> sine bank -> tanh(linear)."""
    upsample_scale = int(np.prod(cfg.upsample_rates)
                         * cfg.gen_istft_hop_size)
    b, t = f0_up.shape[0], f0_up.shape[1]
    harmonics = jnp.arange(1, 10, dtype=jnp.float32)
    fn = f0_up * harmonics[None, None, :]       # [B, T, 9]
    rad = (fn / cfg.sample_rate) % 1.0
    rand_ini = rng.uniform(size=(b, 9)).astype(np.float32)
    rand_ini[:, 0] = 0.0
    rad = rad.at[:, 0, :].add(jnp.asarray(rand_ini))
    rad_dn = _interp_linear(rad.transpose(0, 2, 1),
                            t // upsample_scale)
    phase = jnp.cumsum(rad_dn, axis=-1) * 2 * np.pi
    phase = _interp_linear(phase * upsample_scale, t)
    sines = jnp.sin(phase).transpose(0, 2, 1) * 0.1
    uv = (f0_up > 10.0).astype(jnp.float32)
    noise_amp = uv * 0.003 + (1 - uv) * 0.1 / 3
    noise = noise_amp * jnp.asarray(
        rng.standard_normal(sines.shape).astype(np.float32))
    sine_waves = sines * uv + noise
    merged = jnp.tanh(sine_waves @ p["l_linear"]["w"]
                      + p["l_linear"]["b"])
    return merged[..., 0]                       # [B, T]


def generator_forward(p, cfg: KokoroConfig, x, s, f0,
                      rng: np.random.Generator):
    """iSTFTNet Generator (istftnet.py:258-325)."""
    up = int(np.prod(cfg.upsample_rates) * cfg.gen_istft_hop_size)
    f0_up = jnp.repeat(f0[:, :, None], up, axis=1)  # nearest upsample
    har = sine_source(p["source"], f0_up, cfg, rng)
    har_spec, har_phase = stft_transform(har, cfg.gen_istft_n_fft,
                                         cfg.gen_istft_hop_size)
    har_cat = jnp.concatenate([har_spec, har_phase], axis=1)
    n_up = len(cfg.upsample_rates)
    for i in range(n_up):
        x = jnp.where(x >= 0, x, 0.1 * x)
        xs_src = _conv1d(har_cat, p["noise_convs"][i]["w"],
                         p["noise_convs"][i]["b"],
                         stride=(int(np.prod(cfg.upsample_rates[i + 1:]))
                                 if i + 1 < n_up else 1),
                         padding=((int(np.prod(
                             cfg.upsample_rates[i + 1:])) + 1) // 2
                             if i + 1 < n_up else 0))
        xs_src = adain_resblock1(p["noise_res"][i], xs_src, s,
                                 7 if i + 1 < n_up else 11, (1, 3, 5))
        u, k = cfg.upsample_rates[i], cfg.upsample_kernel_sizes[i]
        x = _conv_transpose1d(x, p["ups"][i]["w"], p["ups"][i]["b"],
                              stride=u, padding=(k - u) // 2)
        if i == n_up - 1:
            x = jnp.concatenate([x[:, :, :1], x], axis=-1)  # reflect(1,0)
        t = min(x.shape[-1], xs_src.shape[-1])
        x = x[..., :t] + xs_src[..., :t]
        acc = None
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                         cfg.resblock_dilations)):
            r = adain_resblock1(
                p["resblocks"][i * len(cfg.resblock_kernel_sizes) + j],
                x, s, rk, rd)
            acc = r if acc is None else acc + r
        x = acc / len(cfg.resblock_kernel_sizes)
    x = jnp.where(x >= 0, x, 0.01 * x)
    x = _conv1d(x, p["conv_post"]["w"], p["conv_post"]["b"], padding=3)
    nf = cfg.gen_istft_n_fft
    spec = jnp.exp(x[:, :nf // 2 + 1])
    phase = jnp.sin(x[:, nf // 2 + 1:])
    return stft_inverse(spec, phase, nf, cfg.gen_istft_hop_size)


def decoder_forward(p, cfg: KokoroConfig, asr, f0_curve, n_curve, s,
                    rng: np.random.Generator):
    """Decoder (istftnet.py:384-421)."""
    f0 = _conv1d(f0_curve[:, None], p["F0_conv"]["w"],
                 p["F0_conv"]["b"], stride=2, padding=1)
    nn_ = _conv1d(n_curve[:, None], p["N_conv"]["w"], p["N_conv"]["b"],
                  stride=2, padding=1)
    x = jnp.concatenate([asr, f0, nn_], axis=1)
    x = adain_res_blk(p["encode"], x, s)
    asr_res = _conv1d(asr, p["asr_res"]["w"], p["asr_res"]["b"])
    res = True
    for i, blk in enumerate(p["decode"]):
        up = i == len(p["decode"]) - 1
        if res:
            x = jnp.concatenate([x, asr_res, f0, nn_], axis=1)
        x = adain_res_blk(blk, x, s, upsample=up)
        if up:
            res = False
    return generator_forward(p["generator"], cfg, x, s, f0_curve, rng)


def text_encoder_forward(p, cfg: KokoroConfig, ids):
    """TextEncoder (modules.py:35-70)."""
    x = p["embedding"][ids].transpose(0, 2, 1)  # [B, C, L]
    for c in p["cnn"]:
        x = _conv1d(x, c["conv"]["w"], c["conv"]["b"],
                    padding=(cfg.text_encoder_kernel_size - 1) // 2)
        x = _layer_norm(x.transpose(0, 2, 1), c["ln_w"],
                        c["ln_b"]).transpose(0, 2, 1)
        x = jnp.where(x >= 0, x, 0.2 * x)
    x = _bilstm(p["lstm"], x.transpose(0, 2, 1))
    return x.transpose(0, 2, 1)                 # [B, C, L]


def kokoro_forward(params, cfg: KokoroConfig, input_ids, ref_s,
                   speed: float = 1.0, seed: int = 0):
    """KModel.forward_with_tokens (model.py:92-126).
    input_ids: [1, L] (0-padded with BOS/EOS zeros);
    ref_s: [1, 2*style_dim] ([decoder | prosody], model.py:105).
    Returns (audio [T], pred_dur [L])."""
    ids = jnp.asarray(input_ids)
    bert = albert_forward(params["bert"], cfg, ids)
    d_en = bert @ params["bert_encoder"]["w"] + params["bert_encoder"]["b"]
    s_p = jnp.asarray(ref_s[:, cfg.style_dim:], jnp.float32)
    s_d = jnp.asarray(ref_s[:, :cfg.style_dim], jnp.float32)
    d = duration_encoder(params["predictor"]["text_encoder"], d_en,
                         s_p, cfg)
    x = _bilstm(params["predictor"]["lstm"], d)
    dur = x @ params["predictor"]["duration_proj"]["w"] \
        + params["predictor"]["duration_proj"]["b"]
    dur = jax.nn.sigmoid(dur).sum(axis=-1) / speed
    pred_dur = np.maximum(
        np.round(np.asarray(dur[0])).astype(np.int64), 1)
    l = ids.shape[1]
    total = int(pred_dur.sum())
    aln = np.zeros((l, total), np.float32)
    pos = 0
    for i, n in enumerate(pred_dur):
        aln[i, pos:pos + int(n)] = 1.0
        pos += int(n)
    aln = jnp.asarray(aln)[None]
    en = d.transpose(0, 2, 1) @ aln
    # F0Ntrain (modules.py:125-136)
    pp = params["predictor"]
    xs = _bilstm(pp["shared"], en.transpose(0, 2, 1))
    f0 = xs.transpose(0, 2, 1)
    for i, blk in enumerate(pp["F0"]):
        f0 = adain_res_blk(blk, f0, s_p, upsample=(i == 1))
    f0 = _conv1d(f0, pp["F0_proj"]["w"], pp["F0_proj"]["b"])[:, 0]
    nn_ = xs.transpose(0, 2, 1)
    for i, blk in enumerate(pp["N"]):
        nn_ = adain_res_blk(blk, nn_, s_p, upsample=(i == 1))
    nn_ = _conv1d(nn_, pp["N_proj"]["w"], pp["N_proj"]["b"])[:, 0]
    t_en = text_encoder_forward(params["text_encoder"], cfg, ids)
    asr = t_en @ aln
    rng = np.random.default_rng(seed)
    audio = decoder_forward(params["decoder"], cfg, asr, f0, nn_, s_d,
                            rng)
    return np.asarray(audio[0]), pred_dur


def phonemes_to_ids(phonemes: str, vocab: Dict[str, int]) -> np.ndarray:
    ids = [vocab[p] for p in phonemes if p in vocab]
    return np.asarray([[0, *ids, 0]], np.int64)


# -- init / load ------------------------------------------------------------

def _lin_init(key, din, dout):
    lim = (din + dout) ** -0.5
    k1, _ = jax.random.split(key)
    return {"w": jax.random.uniform(k1, (din, dout), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dout,), jnp.float32)}


def _conv_init(key, cin, cout, k, bias=True):
    lim = (cin * k + cout) ** -0.5
    p = {"w": jax.random.uniform(key, (cout, cin, k), jnp.float32,
                                 -lim, lim)}
    if bias:
        p["b"] = jnp.zeros((cout,), jnp.float32)
    return p


def _lstm_init(key, din, h):
    ks = jax.random.split(key, 4)
    lim = h ** -0.5

    def m(k, shape):
        return jax.random.uniform(k, shape, jnp.float32, -lim, lim)

    return {"w_ih": m(ks[0], (4 * h, din)), "w_hh": m(ks[1], (4 * h, h)),
            "b_ih": jnp.zeros((4 * h,)), "b_hh": jnp.zeros((4 * h,)),
            "w_ih_r": m(ks[2], (4 * h, din)),
            "w_hh_r": m(ks[3], (4 * h, h)),
            "b_ih_r": jnp.zeros((4 * h,)), "b_hh_r": jnp.zeros((4 * h,))}


def _adain_init(key, style, ch):
    return {"fc": _lin_init(key, style, 2 * ch),
            "norm_w": jnp.ones((ch,)), "norm_b": jnp.zeros((ch,))}


def _res_blk_init(key, style, cin, cout, upsample=False):
    ks = iter(jax.random.split(key, 8))
    p = {"norm1": _adain_init(next(ks), style, cin),
         "conv1": _conv_init(next(ks), cin, cout, 3),
         "norm2": _adain_init(next(ks), style, cout),
         "conv2": _conv_init(next(ks), cout, cout, 3)}
    if cin != cout:
        p["conv1x1"] = _conv_init(next(ks), cin, cout, 1, bias=False)
    if upsample:
        # depthwise ConvTranspose1d(cin, cin, 3, stride 2, groups cin)
        p["pool"] = {"w": jax.random.normal(next(ks), (cin, 1, 3),
                                            jnp.float32) * 0.02,
                     "b": jnp.zeros((cin,))}
    return p


def _resblock1_init(key, style, ch, kernel=3):
    ks = iter(jax.random.split(key, 16))
    return {"adain1": [_adain_init(next(ks), style, ch) for _ in range(3)],
            "adain2": [_adain_init(next(ks), style, ch) for _ in range(3)],
            "convs1": [_conv_init(next(ks), ch, ch, kernel)
                       for _ in range(3)],
            "convs2": [_conv_init(next(ks), ch, ch, kernel)
                       for _ in range(3)],
            "alpha1": [jnp.ones((ch, 1)) for _ in range(3)],
            "alpha2": [jnp.ones((ch, 1)) for _ in range(3)]}


def init_kokoro(key, cfg: KokoroConfig = KokoroConfig()) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 96))
    h = cfg.hidden_dim
    sd_ = cfg.style_dim
    ph = cfg.plbert_hidden
    bert = {
        "word_emb": 0.02 * jax.random.normal(
            next(ks), (cfg.n_token, cfg.plbert_embedding)),
        "pos_emb": 0.02 * jax.random.normal(
            next(ks), (cfg.plbert_max_pos, cfg.plbert_embedding)),
        "type_emb": jnp.zeros((2, cfg.plbert_embedding)),
        "emb_ln_w": jnp.ones((cfg.plbert_embedding,)),
        "emb_ln_b": jnp.zeros((cfg.plbert_embedding,)),
        "emb_map": _lin_init(next(ks), cfg.plbert_embedding, ph),
        "layer": {
            "q": _lin_init(next(ks), ph, ph),
            "k": _lin_init(next(ks), ph, ph),
            "v": _lin_init(next(ks), ph, ph),
            "o": _lin_init(next(ks), ph, ph),
            "attn_ln_w": jnp.ones((ph,)), "attn_ln_b": jnp.zeros((ph,)),
            "ffn": _lin_init(next(ks), ph, cfg.plbert_ffn),
            "ffn_out": _lin_init(next(ks), cfg.plbert_ffn, ph),
            "ffn_ln_w": jnp.ones((ph,)), "ffn_ln_b": jnp.zeros((ph,)),
        }}
    predictor = {
        "text_encoder": {
            "lstm": [_lstm_init(next(ks), h + sd_, h // 2)
                     for _ in range(cfg.n_layer)],
            "ada": [{"fc": _lin_init(next(ks), sd_, 2 * h)}
                    for _ in range(cfg.n_layer)]},
        "lstm": _lstm_init(next(ks), h + sd_, h // 2),
        "duration_proj": _lin_init(next(ks), h, cfg.max_dur),
        "shared": _lstm_init(next(ks), h + sd_, h // 2),
        "F0": [_res_blk_init(next(ks), sd_, h, h),
               _res_blk_init(next(ks), sd_, h, h // 2, upsample=True),
               _res_blk_init(next(ks), sd_, h // 2, h // 2)],
        "N": [_res_blk_init(next(ks), sd_, h, h),
              _res_blk_init(next(ks), sd_, h, h // 2, upsample=True),
              _res_blk_init(next(ks), sd_, h // 2, h // 2)],
        "F0_proj": _conv_init(next(ks), h // 2, 1, 1),
        "N_proj": _conv_init(next(ks), h // 2, 1, 1),
    }
    text_encoder = {
        "embedding": 0.02 * jax.random.normal(next(ks),
                                              (cfg.n_token, h)),
        "cnn": [{"conv": _conv_init(next(ks), h, h,
                                    cfg.text_encoder_kernel_size),
                 "ln_w": jnp.ones((h,)), "ln_b": jnp.zeros((h,))}
                for _ in range(cfg.n_layer)],
        "lstm": _lstm_init(next(ks), h, h // 2),
    }
    uic = cfg.upsample_initial_channel
    n_up = len(cfg.upsample_rates)
    gen = {
        "source": {"l_linear": _lin_init(next(ks), 9, 1)},
        "ups": [_conv_init(next(ks), 0, 0, 0) for _ in range(0)],
        "noise_convs": [], "noise_res": [], "resblocks": [],
        "conv_post": None,
    }
    gen["ups"] = []
    for i in range(n_up):
        cin, cout = uic // (2 ** i), uic // (2 ** (i + 1))
        k = cfg.upsample_kernel_sizes[i]
        lim = (cin * k + cout) ** -0.5
        gen["ups"].append({"w": jax.random.uniform(
            next(ks), (cin, cout, k), jnp.float32, -lim, lim),
            "b": jnp.zeros((cout,))})
        nf2 = cfg.gen_istft_n_fft + 2
        if i + 1 < n_up:
            s0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            gen["noise_convs"].append(
                _conv_init(next(ks), nf2, cout, 2 * s0))
            gen["noise_res"].append(
                _resblock1_init(next(ks), sd_, cout, kernel=7))
        else:
            gen["noise_convs"].append(_conv_init(next(ks), nf2, cout, 1))
            gen["noise_res"].append(
                _resblock1_init(next(ks), sd_, cout, kernel=11))
        for rk in cfg.resblock_kernel_sizes:
            gen["resblocks"].append(
                _resblock1_init(next(ks), sd_, cout, kernel=rk))
    gen["conv_post"] = _conv_init(next(ks), uic // (2 ** n_up),
                                  cfg.gen_istft_n_fft + 2, 7)
    dh, ar = cfg.decoder_hidden, cfg.asr_res_ch
    decoder = {
        "encode": _res_blk_init(next(ks), sd_, h + 2, dh),
        "decode": [_res_blk_init(next(ks), sd_, dh + 2 + ar, dh),
                   _res_blk_init(next(ks), sd_, dh + 2 + ar, dh),
                   _res_blk_init(next(ks), sd_, dh + 2 + ar, dh),
                   _res_blk_init(next(ks), sd_, dh + 2 + ar, uic,
                                 upsample=True)],
        "F0_conv": _conv_init(next(ks), 1, 1, 3),
        "N_conv": _conv_init(next(ks), 1, 1, 3),
        "asr_res": _conv_init(next(ks), h, ar, 1),
        "generator": gen,
    }
    return {"bert": bert,
            "bert_encoder": _lin_init(next(ks), ph, h),
            "predictor": predictor, "text_encoder": text_encoder,
            "decoder": decoder}


def _wn_fuse(sd, name):
    """Fuse torch weight_norm: plain .weight, old weight_g/weight_v, or
    new parametrizations.original0/1."""
    if f"{name}.weight" in sd:
        return np.asarray(sd.pop(f"{name}.weight"), np.float32)
    if f"{name}.weight_g" in sd:
        g = np.asarray(sd.pop(f"{name}.weight_g"), np.float32)
        v = np.asarray(sd.pop(f"{name}.weight_v"), np.float32)
    else:
        g = np.asarray(sd.pop(
            f"{name}.parametrizations.weight.original0"), np.float32)
        v = np.asarray(sd.pop(
            f"{name}.parametrizations.weight.original1"), np.float32)
    axes = tuple(range(1, v.ndim))
    return g * v / (np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
                    + 1e-12)


def load_kokoro_params(sd: Dict[str, np.ndarray],
                       cfg: KokoroConfig = KokoroConfig()):
    """Flat Kokoro-82M state dict (submodule prefixes bert/
    bert_encoder/predictor/text_encoder/decoder, model.py:72-79)."""
    sd = dict(sd)

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32))

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.weight"), np.float32).T),
                "b": vec(f"{name}.bias")}

    def conv(name, bias=True):
        p = {"w": jnp.asarray(_wn_fuse(sd, name))}
        if bias:
            p["b"] = vec(f"{name}.bias")
        return p

    def lstm(name):
        return {"w_ih": vec(f"{name}.weight_ih_l0"),
                "w_hh": vec(f"{name}.weight_hh_l0"),
                "b_ih": vec(f"{name}.bias_ih_l0"),
                "b_hh": vec(f"{name}.bias_hh_l0"),
                "w_ih_r": vec(f"{name}.weight_ih_l0_reverse"),
                "w_hh_r": vec(f"{name}.weight_hh_l0_reverse"),
                "b_ih_r": vec(f"{name}.bias_ih_l0_reverse"),
                "b_hh_r": vec(f"{name}.bias_hh_l0_reverse")}

    def adain(name):
        p = lin(f"{name}.fc")
        ch = p["b"].shape[0] // 2
        out = {"fc": p}
        if f"{name}.norm.weight" in sd:
            out["norm_w"] = vec(f"{name}.norm.weight")
            out["norm_b"] = vec(f"{name}.norm.bias")
        else:
            out["norm_w"] = jnp.ones((ch,))
            out["norm_b"] = jnp.zeros((ch,))
        return out

    def res_blk(name, upsample=False):
        p = {"norm1": adain(f"{name}.norm1"),
             "conv1": conv(f"{name}.conv1"),
             "norm2": adain(f"{name}.norm2"),
             "conv2": conv(f"{name}.conv2")}
        if f"{name}.conv1x1.weight" in sd or \
                f"{name}.conv1x1.weight_g" in sd or \
                f"{name}.conv1x1.parametrizations.weight.original0" in sd:
            p["conv1x1"] = conv(f"{name}.conv1x1", bias=False)
        if upsample:
            p["pool"] = conv(f"{name}.pool")
        return p

    def resblock1(name):
        return {"adain1": [adain(f"{name}.adain1.{i}") for i in range(3)],
                "adain2": [adain(f"{name}.adain2.{i}") for i in range(3)],
                "convs1": [conv(f"{name}.convs1.{i}") for i in range(3)],
                "convs2": [conv(f"{name}.convs2.{i}") for i in range(3)],
                "alpha1": [vec(f"{name}.alpha1.{i}").reshape(-1, 1)
                           for i in range(3)],
                "alpha2": [vec(f"{name}.alpha2.{i}").reshape(-1, 1)
                           for i in range(3)]}

    be = "bert.embeddings"
    layer = ("bert.encoder.albert_layer_groups.0.albert_layers.0")
    bert = {
        "word_emb": vec(f"{be}.word_embeddings.weight"),
        "pos_emb": vec(f"{be}.position_embeddings.weight"),
        "type_emb": vec(f"{be}.token_type_embeddings.weight"),
        "emb_ln_w": vec(f"{be}.LayerNorm.weight"),
        "emb_ln_b": vec(f"{be}.LayerNorm.bias"),
        "emb_map": lin("bert.encoder.embedding_hidden_mapping_in"),
        "layer": {
            "q": lin(f"{layer}.attention.query"),
            "k": lin(f"{layer}.attention.key"),
            "v": lin(f"{layer}.attention.value"),
            "o": lin(f"{layer}.attention.dense"),
            "attn_ln_w": vec(f"{layer}.attention.LayerNorm.weight"),
            "attn_ln_b": vec(f"{layer}.attention.LayerNorm.bias"),
            "ffn": lin(f"{layer}.ffn"),
            "ffn_out": lin(f"{layer}.ffn_output"),
            "ffn_ln_w": vec(f"{layer}.full_layer_layer_norm.weight"),
            "ffn_ln_b": vec(f"{layer}.full_layer_layer_norm.bias"),
        }}
    predictor = {
        "text_encoder": {
            "lstm": [lstm(f"predictor.text_encoder.lstms.{2 * i}")
                     for i in range(cfg.n_layer)],
            "ada": [{"fc": lin(
                f"predictor.text_encoder.lstms.{2 * i + 1}.fc")}
                for i in range(cfg.n_layer)]},
        "lstm": lstm("predictor.lstm"),
        "duration_proj": lin("predictor.duration_proj.linear_layer"),
        "shared": lstm("predictor.shared"),
        "F0": [res_blk(f"predictor.F0.{i}", upsample=(i == 1))
               for i in range(3)],
        "N": [res_blk(f"predictor.N.{i}", upsample=(i == 1))
              for i in range(3)],
        "F0_proj": conv("predictor.F0_proj"),
        "N_proj": conv("predictor.N_proj"),
    }
    text_encoder = {
        "embedding": vec("text_encoder.embedding.weight"),
        "cnn": [{"conv": conv(f"text_encoder.cnn.{i}.0"),
                 "ln_w": vec(f"text_encoder.cnn.{i}.1.gamma"),
                 "ln_b": vec(f"text_encoder.cnn.{i}.1.beta")}
                for i in range(cfg.n_layer)],
        "lstm": lstm("text_encoder.lstm"),
    }
    n_up = len(cfg.upsample_rates)
    gen = {"source": {"l_linear": lin(
               "decoder.generator.m_source.l_linear")},
           "ups": [conv(f"decoder.generator.ups.{i}")
                   for i in range(n_up)],
           "noise_convs": [conv(f"decoder.generator.noise_convs.{i}")
                           for i in range(n_up)],
           "noise_res": [resblock1(f"decoder.generator.noise_res.{i}")
                         for i in range(n_up)],
           "resblocks": [resblock1(f"decoder.generator.resblocks.{i}")
                         for i in range(
                             n_up * len(cfg.resblock_kernel_sizes))],
           "conv_post": conv("decoder.generator.conv_post")}
    decoder = {
        "encode": res_blk("decoder.encode"),
        "decode": [res_blk(f"decoder.decode.{i}", upsample=(i == 3))
                   for i in range(4)],
        "F0_conv": conv("decoder.F0_conv"),
        "N_conv": conv("decoder.N_conv"),
        "asr_res": conv("decoder.asr_res.0"),
        "generator": gen,
    }
    params = {"bert": bert, "bert_encoder": lin("bert_encoder"),
              "predictor": predictor, "text_encoder": text_encoder,
              "decoder": decoder}
    leftover = [k for k in sd
                if not ("position_ids" in k or "pooler" in k)]
    return params, sorted(leftover)
