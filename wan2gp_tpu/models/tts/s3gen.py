"""S3Gen — CosyVoice2 speech-token → waveform decoder (chatterbox).

TPU-native re-implementation of
/root/reference/models/TTS/chatterbox/models/s3gen/:

* CAMPPlus x-vector (xvector.py:340-428): FCM 2D-conv front-end, TDNN,
  three CAM-dense-TDNN blocks (12/24/16 layers, growth 32, k3,
  dilations 1/2/2) with transit halving, stats pooling, 192-d output.
* UpsampleConformerEncoder (transformer/upsample_encoder.py:99-320):
  linear embed + espnet relative-position self-attention layers,
  pre-lookahead conv (len 3), 2x repeat-upsample conv, 4 more layers
  (token 25 Hz -> mel 50 Hz).
* Causal masked-diff flow matching (flow.py:183-291 +
  flow_matching.py: CausalConditionalCFM): 10 Euler steps on a cosine
  t-schedule with CFG rate 0.7; the estimator is the flat causal U-Net
  ConditionalDecoder (decoder.py:100-315 — channels [256], 12 mid
  blocks, 4 transformer blocks per stage, causal convs).
* HiFTGenerator NSF+ISTFT vocoder (hifigan.py:286-480): ConvRNN F0
  predictor, harmonic sine source, STFT-domain source fusion at each
  upsample stage ([8, 5, 3]), magnitude+phase ISTFT head (n_fft 16).

Mel front-end: 24 kHz, n_fft/win 1920, hop 480, 80 mels, log-clamped
(utils/mel.py:36-80).  The S3 speech tokenizer (a pretrained FSQ
encoder) is external — reference prompts are passed in as tokens.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .chatterbox import mel_filterbank, stft_mag
from .heartmula import _dense


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class S3GenConfig:
    token_vocab: int = 6561
    d_model: int = 512
    heads: int = 8
    ffn: int = 2048
    n_layers: int = 6
    n_up_layers: int = 4
    pre_lookahead: int = 3
    mel_dim: int = 80
    spk_dim: int = 192            # CAMPPlus embedding size
    # flow estimator (decoder_conf in flow.py:184-244)
    dec_channels: int = 256
    dec_mid_blocks: int = 12
    dec_n_blocks: int = 4
    dec_heads: int = 8
    dec_head_dim: int = 64
    n_timesteps: int = 10
    cfg_rate: float = 0.7
    # hift
    hift_base: int = 512
    upsample_rates: Tuple[int, ...] = (8, 5, 3)
    upsample_kernels: Tuple[int, ...] = (16, 11, 7)
    source_kernels: Tuple[int, ...] = (7, 7, 11)
    resblock_kernels: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[int, ...] = (1, 3, 5)
    istft_n_fft: int = 16
    istft_hop: int = 4
    nb_harmonics: int = 8
    sample_rate: int = 24000
    mel_n_fft: int = 1920
    mel_hop: int = 480
    # campplus
    cam_channels: int = 32        # FCM m_channels
    cam_growth: int = 32
    cam_init: int = 128
    cam_layers: Tuple[int, ...] = (12, 24, 16)
    cam_dilations: Tuple[int, ...] = (1, 2, 2)
    compute_dtype: Any = jnp.float32

    @classmethod
    def tiny(cls):
        return cls(token_vocab=80, d_model=32, heads=4, ffn=64,
                   n_layers=2, n_up_layers=1, mel_dim=16, spk_dim=16,
                   dec_channels=32, dec_mid_blocks=2, dec_n_blocks=1,
                   dec_heads=2, dec_head_dim=8, n_timesteps=2,
                   hift_base=32, upsample_rates=(4, 3),
                   upsample_kernels=(8, 7), source_kernels=(7, 7),
                   resblock_kernels=(3,), nb_harmonics=2,
                   sample_rate=24000, mel_n_fft=256, mel_hop=48,
                   cam_channels=8, cam_growth=8, cam_init=16,
                   cam_layers=(2, 2), cam_dilations=(1, 2))


# ---------------------------------------------------------------------------
# small helpers (1D convs in NLC layout)
# ---------------------------------------------------------------------------

def _init_conv1d(key, k, cin, cout, dtype, std=0.02):
    return {"w": (jax.random.normal(key, (k, cin, cout), jnp.float32)
                  * std).astype(dtype),
            "b": jnp.zeros((cout,), dtype)}


def _conv1d(x, p, stride=1, padding="SAME", dilation=1, groups=1):
    """x [B, T, C]."""
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride,), padding, rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=groups) + p["b"]


def _causal_conv1d(x, p, dilation=1):
    k = p["w"].shape[0]
    pad = (k - 1) * dilation
    return _conv1d(jnp.pad(x, ((0, 0), (pad, 0), (0, 0))), p,
                   padding="VALID", dilation=dilation)


def _ln(x, p, eps=1e-5):
    m = jnp.mean(x, -1, keepdims=True)
    v = jnp.var(x, -1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * p["scale"] + p["bias"]


def _init_ln(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype),
            "bias": jnp.zeros((dim,), dtype)}


def _init_lin(key, din, dout, dtype, std=0.02, bias=True):
    p = {"w": (jax.random.normal(key, (din, dout), jnp.float32) * std
               ).astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def mel24(wav, cfg: S3GenConfig):
    """24 kHz wav [B, L] -> log-mel [B, T, mel_dim] (utils/mel.py:36-80:
    center-padded reflect, hann, log(clamp(mel, 1e-5)))."""
    mag = stft_mag(wav, cfg.mel_n_fft, cfg.mel_hop, cfg.mel_n_fft,
                   center=True, power=1.0)
    fb = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.mel_n_fft,
                                    cfg.mel_dim, fmax=8000.0))
    mel = jnp.einsum("btn,mn->btm", mag, fb)
    return jnp.log(jnp.maximum(mel, 1e-5))


# ---------------------------------------------------------------------------
# CAMPPlus x-vector (inference-mode batchnorm = affine)
# ---------------------------------------------------------------------------

def _init_bn(dim, dtype):
    return {"scale": jnp.ones((dim,), dtype),
            "bias": jnp.zeros((dim,), dtype)}


def _bn(x, p):
    # inference BN with folded running stats (identity stats at init)
    return x * p["scale"] + p["bias"]


def init_campplus(key, cfg: S3GenConfig, dtype=jnp.float32):
    m = cfg.cam_channels
    keys = iter(jax.random.split(key, 256))

    def conv2d(k, cin, cout):
        return {"w": (jax.random.normal(next(keys), (k, k, cin, cout),
                                        jnp.float32) * 0.05
                      ).astype(dtype)}

    # FCM: conv + 2 res stages (stride 2 on freq+time? reference uses
    # stride on both dims via BasicResBlock stride) + final (2,1) conv
    fcm = {"conv1": conv2d(3, 1, m), "bn1": _init_bn(m, dtype),
           "res": [], "conv2": conv2d(3, m, m),
           "bn2": _init_bn(m, dtype)}
    for _ in range(2):        # layer1/layer2, one BasicResBlock each
        fcm["res"].append({
            "c1": conv2d(3, m, m), "b1": _init_bn(m, dtype),
            "c2": conv2d(3, m, m), "b2": _init_bn(m, dtype),
            "sc": conv2d(1, m, m), "bs": _init_bn(m, dtype)})
    feat = m * (cfg.mel_dim // 8)

    tdnn = {"conv": _init_conv1d(next(keys), 5, feat, cfg.cam_init,
                                 dtype),
            "bn": _init_bn(cfg.cam_init, dtype)}
    blocks = []
    ch = cfg.cam_init
    growth = cfg.cam_growth
    bn_ch = 4 * growth
    for num_layers, dil in zip(cfg.cam_layers, cfg.cam_dilations):
        layers = []
        cin = ch
        for _ in range(num_layers):
            layers.append({
                "bn1": _init_bn(cin, dtype),
                "lin1": _init_conv1d(next(keys), 1, cin, bn_ch, dtype),
                "bn2": _init_bn(bn_ch, dtype),
                "local": _init_conv1d(next(keys), 3, bn_ch, growth,
                                      dtype),
                "cam1": _init_conv1d(next(keys), 1, bn_ch, bn_ch // 2,
                                     dtype),
                "cam2": _init_conv1d(next(keys), 1, bn_ch // 2, growth,
                                     dtype),
                "dil": dil})
            cin += growth
        transit = {"bn": _init_bn(cin, dtype),
                   "lin": _init_conv1d(next(keys), 1, cin, cin // 2,
                                       dtype)}
        blocks.append({"layers": layers, "transit": transit})
        ch = cin // 2
    return {"fcm": fcm, "tdnn": tdnn, "blocks": blocks,
            "out_bn": _init_bn(ch, dtype),
            "dense": _init_conv1d(next(keys), 1, 2 * ch, cfg.spk_dim,
                                  dtype),
            "dense_bn": _init_bn(cfg.spk_dim, dtype)}


def _conv2d(x, p, stride=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, p["w"], stride, "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def campplus_embed(params, cfg: S3GenConfig, mels):
    """mels [B, T, F] (fbank) -> x-vector [B, spk_dim]
    (xvector.py:340-428)."""
    x = mels[..., None].transpose(0, 2, 1, 3)       # [B, F, T, 1]
    f = params["fcm"]
    x = jax.nn.relu(_bn(_conv2d(x, f["conv1"]), f["bn1"]))
    for r in f["res"]:
        y = jax.nn.relu(_bn(_conv2d(x, r["c1"], (2, 1)), r["b1"]))
        y = _bn(_conv2d(y, r["c2"]), r["b2"])
        x = jax.nn.relu(y + _bn(_conv2d(x, r["sc"], (2, 1)), r["bs"]))
    x = jax.nn.relu(_bn(_conv2d(x, f["conv2"], (2, 1)), f["bn2"]))
    b, fr, t, c = x.shape
    x = x.transpose(0, 2, 1, 3).reshape(b, t, fr * c)   # [B, T, F/8*m]

    x = jax.nn.relu(_bn(_conv1d(x, params["tdnn"]["conv"], stride=2),
                        params["tdnn"]["bn"]))
    for blk in params["blocks"]:
        for lp in blk["layers"]:
            y = _conv1d(jax.nn.relu(_bn(x, lp["bn1"])), lp["lin1"])
            y = jax.nn.relu(_bn(y, lp["bn2"]))
            local = _conv1d(y, lp["local"], dilation=lp["dil"])
            # CAM context gate (xvector.py:195-232): global + segment
            ctx = jnp.mean(y, axis=1, keepdims=True)
            seg = jnp.mean(y, axis=1, keepdims=True)  # seg pooling ≈
            g = jax.nn.relu(_conv1d(ctx + seg, lp["cam1"]))
            gate = jax.nn.sigmoid(_conv1d(g, lp["cam2"]))
            x = jnp.concatenate([x, local * gate], axis=-1)
        x = _conv1d(jax.nn.relu(_bn(x, blk["transit"]["bn"])),
                    blk["transit"]["lin"])
    x = jax.nn.relu(_bn(x, params["out_bn"]))
    stats = jnp.concatenate([jnp.mean(x, 1), jnp.std(x, 1)], axis=-1)
    e = _conv1d(stats[:, None], params["dense"])[:, 0]
    return _bn(e, params["dense_bn"])


# ---------------------------------------------------------------------------
# upsample conformer encoder
# ---------------------------------------------------------------------------

def _init_attn(key, d, heads, dtype, rel=True):
    keys = iter(jax.random.split(key, 8))
    p = {"q": _init_lin(next(keys), d, d, dtype),
         "k": _init_lin(next(keys), d, d, dtype),
         "v": _init_lin(next(keys), d, d, dtype),
         "o": _init_lin(next(keys), d, d, dtype)}
    if rel:
        hd = d // heads
        p["pos"] = _init_lin(next(keys), d, d, dtype, bias=False)
        p["bias_u"] = jnp.zeros((heads, hd), dtype)
        p["bias_v"] = jnp.zeros((heads, hd), dtype)
    return p


def _rel_attn(p, x, heads):
    """Espnet relative-position self-attention
    (transformer/attention.py RelPositionMultiHeadedAttention):
    score = (q+u)k^T + rel((q+v)p^T)."""
    b, t, d = x.shape
    hd = d // heads
    q = _dense(x, p["q"]).reshape(b, t, heads, hd)
    k = _dense(x, p["k"]).reshape(b, t, heads, hd)
    v = _dense(x, p["v"]).reshape(b, t, heads, hd)
    # sinusoidal relative positions -T+1..T-1
    pos = np.arange(t - 1, -t, -1, dtype=np.float32)
    inv = 1.0 / (10000.0 ** (np.arange(0, d, 2, dtype=np.float32) / d))
    ang = np.outer(pos, inv)
    pe = np.zeros((2 * t - 1, d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    pr = _dense(jnp.asarray(pe), p["pos"]).reshape(2 * t - 1, heads, hd)
    ac = jnp.einsum("bthd,bshd->bhts", q + p["bias_u"], k)
    bd_full = jnp.einsum("bthd,phd->bhtp", q + p["bias_v"], pr)
    # rel index: score[t, s] uses pos (t - s) -> pe row (t-1 - (t-s))
    ti = jnp.arange(t)[:, None]
    si = jnp.arange(t)[None, :]
    bd = jnp.take_along_axis(
        bd_full, (t - 1 - ti + si)[None, None].astype(jnp.int32)
        .repeat(heads, 1), axis=-1)
    w = jax.nn.softmax(((ac + bd) / math.sqrt(hd)).astype(jnp.float32),
                       axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, d)
    return _dense(o, p["o"])


def _init_enc_layer(key, cfg: S3GenConfig, dtype):
    keys = iter(jax.random.split(key, 6))
    d = cfg.d_model
    return {"attn": _init_attn(next(keys), d, cfg.heads, dtype),
            "norm1": _init_ln(d, dtype), "norm2": _init_ln(d, dtype),
            "ff1": _init_lin(next(keys), d, cfg.ffn, dtype),
            "ff2": _init_lin(next(keys), cfg.ffn, d, dtype)}


def _enc_layer(p, x, heads):
    # pre-norm conformer layer without cnn/macaron (use_cnn_module
    # False in the builder)
    x = x + _rel_attn(p["attn"], _ln(x, p["norm1"]), heads)
    h = _ln(x, p["norm2"])
    return x + _dense(jax.nn.silu(_dense(h, p["ff1"])), p["ff2"])


def init_encoder(key, cfg: S3GenConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, cfg.n_layers + cfg.n_up_layers
                                 + 8))
    d = cfg.d_model
    return {
        "embed": _init_lin(next(keys), d, d, dtype),
        "embed_ln": _init_ln(d, dtype),
        "pre_conv1": _init_conv1d(next(keys), cfg.pre_lookahead + 1, d,
                                  d, dtype),
        "pre_conv2": _init_conv1d(next(keys), 3, d, d, dtype),
        "layers": [_init_enc_layer(next(keys), cfg, dtype)
                   for _ in range(cfg.n_layers)],
        "up_conv": _init_conv1d(next(keys), 5, d, d, dtype),
        "up_embed": _init_lin(next(keys), d, d, dtype),
        "up_embed_ln": _init_ln(d, dtype),
        "up_layers": [_init_enc_layer(next(keys), cfg, dtype)
                      for _ in range(cfg.n_up_layers)],
        "after_norm": _init_ln(d, dtype),
    }


def encoder_forward(params, cfg: S3GenConfig, x):
    """token embeds [B, T, d] -> [B, 2T, d]
    (upsample_encoder.py:240-305)."""
    x = _ln(_dense(x, params["embed"]), params["embed_ln"])
    x = x * math.sqrt(cfg.d_model)
    # pre-lookahead (PreLookaheadLayer): right-pad conv + causal conv
    y = jnp.pad(x, ((0, 0), (0, cfg.pre_lookahead), (0, 0)))
    y = jax.nn.leaky_relu(_conv1d(y, params["pre_conv1"],
                                  padding="VALID"), 0.01)
    y = jnp.pad(y, ((0, 0), (2, 0), (0, 0)))
    y = _conv1d(y, params["pre_conv2"], padding="VALID")
    x = x + y
    for lp in params["layers"]:
        x = _enc_layer(lp, x, cfg.heads)
    # upsample x2: repeat + causal conv k5 (Upsample1D stride 2)
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.pad(x, ((0, 0), (4, 0), (0, 0)))
    x = jax.nn.leaky_relu(_conv1d(x, params["up_conv"],
                                  padding="VALID"), 0.01)
    x = _ln(_dense(x, params["up_embed"]), params["up_embed_ln"])
    x = x * math.sqrt(cfg.d_model)
    for lp in params["up_layers"]:
        x = _enc_layer(lp, x, cfg.heads)
    return _ln(x, params["after_norm"])


# ---------------------------------------------------------------------------
# flow estimator (ConditionalDecoder) + CFM
# ---------------------------------------------------------------------------

def _init_tf_block(key, dim, cfg: S3GenConfig, dtype):
    keys = iter(jax.random.split(key, 8))
    inner = cfg.dec_heads * cfg.dec_head_dim
    return {"norm1": _init_ln(dim, dtype),
            "q": _init_lin(next(keys), dim, inner, dtype),
            "k": _init_lin(next(keys), dim, inner, dtype),
            "v": _init_lin(next(keys), dim, inner, dtype),
            "o": _init_lin(next(keys), inner, dim, dtype),
            "norm3": _init_ln(dim, dtype),
            "ff1": _init_lin(next(keys), dim, 4 * dim * 2, dtype),
            "ff2": _init_lin(next(keys), 4 * dim, dim, dtype)}


def _tf_block(p, x, heads):
    """diffusers BasicTransformerBlock, layer_norm + geglu
    (matcha/transformer.py)."""
    h = _ln(x, p["norm1"])
    b, t, _ = h.shape
    q = _dense(h, p["q"])
    k = _dense(h, p["k"])
    v = _dense(h, p["v"])
    hd = q.shape[-1] // heads
    q = q.reshape(b, t, heads, hd)
    k = k.reshape(b, t, heads, hd)
    v = v.reshape(b, t, heads, hd)
    w = jax.nn.softmax(
        (jnp.einsum("bthd,bshd->bhts", q, k) / math.sqrt(hd)
         ).astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, -1)
    x = x + _dense(o, p["o"])
    h = _ln(x, p["norm3"])
    u, g = jnp.split(_dense(h, p["ff1"]), 2, axis=-1)
    return x + _dense(u * jax.nn.gelu(g, approximate=False), p["ff2"])


def _init_resnet(key, din, dout, time_dim, dtype):
    keys = iter(jax.random.split(key, 6))
    return {"conv1": _init_conv1d(next(keys), 3, din, dout, dtype),
            "ln1": _init_ln(dout, dtype),
            "mlp": _init_lin(next(keys), time_dim, dout, dtype),
            "conv2": _init_conv1d(next(keys), 3, dout, dout, dtype),
            "ln2": _init_ln(dout, dtype),
            "res": _init_conv1d(next(keys), 1, din, dout, dtype)}


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _resnet(p, x, t_emb):
    """CausalResnetBlock1D (decoder.py:48-70): causal conv + LN + mish,
    time-shift add, second block, 1x1 residual."""
    h = _mish(_ln(_causal_conv1d(x, p["conv1"]), p["ln1"]))
    h = h + _dense(_mish(t_emb), p["mlp"])[:, None]
    h = _mish(_ln(_causal_conv1d(h, p["conv2"]), p["ln2"]))
    return h + _conv1d(x, p["res"])


def init_estimator(key, cfg: S3GenConfig, dtype=jnp.float32):
    ch = cfg.dec_channels
    in_ch = 4 * cfg.mel_dim                     # x + mu + spk + cond
    t_dim = 4 * ch
    keys = iter(jax.random.split(key, cfg.dec_mid_blocks
                                 * (cfg.dec_n_blocks + 1) + 64))
    mk_tfs = lambda dim: [_init_tf_block(next(keys), dim, cfg, dtype)
                          for _ in range(cfg.dec_n_blocks)]
    return {
        "time1": _init_lin(next(keys), in_ch, t_dim, dtype),
        "time2": _init_lin(next(keys), t_dim, t_dim, dtype),
        "down_res": _init_resnet(next(keys), in_ch, ch, t_dim, dtype),
        "down_tf": mk_tfs(ch),
        "down_conv": _init_conv1d(next(keys), 3, ch, ch, dtype),
        "mid": [{"res": _init_resnet(next(keys), ch, ch, t_dim, dtype),
                 "tf": mk_tfs(ch)}
                for _ in range(cfg.dec_mid_blocks)],
        "up_res": _init_resnet(next(keys), 2 * ch, ch, t_dim, dtype),
        "up_tf": mk_tfs(ch),
        "up_conv": _init_conv1d(next(keys), 3, ch, ch, dtype),
        "final_conv": _init_conv1d(next(keys), 3, ch, ch, dtype),
        "final_ln": _init_ln(ch, dtype),
        "final_proj": _init_conv1d(next(keys), 1, ch, cfg.mel_dim,
                                   dtype),
    }


def estimator_forward(params, cfg: S3GenConfig, x, mu, t, spk, cond):
    """decoder.py:235-315 forward (flat causal U-Net; channels-last).
    x/mu/cond [B, T, mel]; spk [B, mel]; t [B]."""
    in_ch = 4 * cfg.mel_dim
    # sinusoidal time embedding (matcha SinusoidalPosEmb on in_ch dims)
    half = in_ch // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = jnp.exp(-emb * jnp.arange(half, dtype=jnp.float32))
    te = t[:, None] * freqs[None] * 1000.0
    te = jnp.concatenate([jnp.sin(te), jnp.cos(te)], axis=-1)
    t_emb = _dense(jax.nn.silu(_dense(te, params["time1"])),
                   params["time2"])

    spk_t = jnp.broadcast_to(spk[:, None], x.shape[:2] + (spk.shape[-1],))
    h = jnp.concatenate([x, mu, spk_t, cond], axis=-1)

    h = _resnet(params["down_res"], h, t_emb)
    for tf in params["down_tf"]:
        h = _tf_block(tf, h, cfg.dec_heads)
    skip = h
    h = _causal_conv1d(h, params["down_conv"])
    for blk in params["mid"]:
        h = _resnet(blk["res"], h, t_emb)
        for tf in blk["tf"]:
            h = _tf_block(tf, h, cfg.dec_heads)
    h = jnp.concatenate([h, skip], axis=-1)
    h = _resnet(params["up_res"], h, t_emb)
    for tf in params["up_tf"]:
        h = _tf_block(tf, h, cfg.dec_heads)
    h = _causal_conv1d(h, params["up_conv"])
    h = _mish(_ln(_causal_conv1d(h, params["final_conv"]),
                  params["final_ln"]))
    return _conv1d(h, params["final_proj"])


def cfm_inference(params, cfg: S3GenConfig, mu, spk, cond, key):
    """CausalConditionalCFM.forward + solve_euler
    (flow_matching.py:188-210, 72-124): cosine t schedule, dual-batch
    CFG with zeroed conditioning at rate cfg_rate."""
    b, t_len, _ = mu.shape
    x = jax.random.normal(key, (b, t_len, cfg.mel_dim)) \
        if key is not None else jnp.zeros((b, t_len, cfg.mel_dim))
    ts = jnp.linspace(0.0, 1.0, cfg.n_timesteps + 1)
    ts = 1.0 - jnp.cos(ts * 0.5 * jnp.pi)
    r = cfg.cfg_rate

    def step(x, i):
        t0 = ts[i]
        dt = ts[i + 1] - ts[i]
        xx = jnp.concatenate([x, x], axis=0)
        mm = jnp.concatenate([mu, jnp.zeros_like(mu)], axis=0)
        ss = jnp.concatenate([spk, jnp.zeros_like(spk)], axis=0)
        cc = jnp.concatenate([cond, jnp.zeros_like(cond)], axis=0)
        tt = jnp.full((2 * b,), t0, jnp.float32)
        v = estimator_forward(params, cfg, xx, mm, tt, ss, cc)
        v = (1.0 + r) * v[:b] - r * v[b:]
        return x + dt * v, None

    x, _ = jax.lax.scan(step, x, jnp.arange(cfg.n_timesteps))
    return x


# ---------------------------------------------------------------------------
# HiFT vocoder
# ---------------------------------------------------------------------------

def _init_resblock(key, ch, k, dils, dtype):
    keys = iter(jax.random.split(key, 2 * len(dils)))
    return {"convs1": [_init_conv1d(next(keys), k, ch, ch, dtype)
                       for _ in dils],
            "convs2": [_init_conv1d(next(keys), k, ch, ch, dtype)
                       for _ in dils],
            "dils": tuple(dils)}


def _resblock(p, x):
    for c1, c2, d in zip(p["convs1"], p["convs2"], p["dils"]):
        y = jax.nn.leaky_relu(x, 0.1)
        y = _conv1d(y, c1, dilation=d)
        y = jax.nn.leaky_relu(y, 0.1)
        y = _conv1d(y, c2)
        x = x + y
    return x


def init_hift(key, cfg: S3GenConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 64))
    base = cfg.hift_base
    nfft = cfg.istft_n_fft
    ups, srcs, src_res, res = [], [], [], []
    down_rates = np.cumprod([1] + list(cfg.upsample_rates[::-1][:-1])
                            )[::-1]
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernels)):
        cin, cout = base // (2 ** i), base // (2 ** (i + 1))
        ups.append({"w": (jax.random.normal(next(keys), (k, cin, cout),
                                            jnp.float32) * 0.02
                          ).astype(dtype),
                    "b": jnp.zeros((cout,), dtype), "u": u, "k": k})
        du = int(down_rates[i])
        srcs.append({"p": _init_conv1d(
            next(keys), 1 if du == 1 else 2 * du, nfft + 2, cout,
            dtype), "du": du})
        src_res.append(_init_resblock(next(keys), cout,
                                      cfg.source_kernels[i],
                                      cfg.resblock_dilations, dtype))
        for kk in cfg.resblock_kernels:
            res.append(_init_resblock(next(keys), cout, kk,
                                      cfg.resblock_dilations, dtype))
    f0p = {"convs": [_init_conv1d(next(keys), 3,
                                  cfg.mel_dim if i == 0 else base,
                                  base, dtype) for i in range(5)],
           "out": _init_lin(next(keys), base, 1, dtype)}
    return {"conv_pre": _init_conv1d(next(keys), 7, cfg.mel_dim, base,
                                     dtype),
            "ups": ups, "source_downs": srcs, "source_res": src_res,
            "resblocks": res,
            "conv_post": _init_conv1d(next(keys), 7,
                                      base // (2 ** len(ups)),
                                      nfft + 2, dtype),
            "source_merge": _init_lin(next(keys), cfg.nb_harmonics + 1,
                                      1, dtype),
            "f0_predictor": f0p}


def _hift_stft(s, n_fft, hop):
    w = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    pad = n_fft // 2
    s = jnp.pad(s, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (s.shape[1] - n_fft) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop
           + jnp.arange(n_fft)[None, :])
    spec = jnp.fft.rfft(s[:, idx] * w, n=n_fft, axis=-1)
    return jnp.concatenate([spec.real, spec.imag], axis=-1)  # [B,T,F2]


def _hift_istft(mag, phase, n_fft, hop):
    """overlap-add inverse STFT with window normalization."""
    w = jnp.asarray(np.hanning(n_fft + 1)[:-1].astype(np.float32))
    spec = mag * jnp.exp(1j * phase.astype(jnp.complex64))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * w   # [B, T, n]
    b, t, _ = frames.shape
    out_len = n_fft + hop * (t - 1)
    out = jnp.zeros((b, out_len))
    win = jnp.zeros((out_len,))
    idx = jnp.arange(t) * hop

    def body(i, carry):
        out, win = carry
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(
                out, (0, idx[i]), (b, n_fft)) + frames[:, i],
            (0, idx[i]))
        win = jax.lax.dynamic_update_slice(
            win, jax.lax.dynamic_slice(win, (idx[i],), (n_fft,))
            + w * w, (idx[i],))
        return out, win

    out, win = jax.lax.fori_loop(0, t, body, (out, win))
    out = out / jnp.maximum(win, 1e-8)[None]
    return out[:, n_fft // 2:-(n_fft // 2)]


def hift_vocode(params, cfg: S3GenConfig, mel, key=None):
    """mel [B, T, mel_dim] -> wav [B, T * hop] (hifigan.py:412-481)."""
    # f0 predictor (f0_predictor.py): 5 ELU convs + |linear|
    h = mel
    for c in params["f0_predictor"]["convs"]:
        h = jax.nn.elu(_conv1d(h, c))
    f0 = jnp.abs(_dense(h, params["f0_predictor"]["out"])[..., 0])

    # harmonic source at sample rate (SineGen + SourceModuleHnNSF)
    up_total = int(np.prod(cfg.upsample_rates)) * cfg.istft_hop
    f0_up = jnp.repeat(f0, up_total, axis=1)            # [B, L]
    harmonics = jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)
    phase = 2.0 * jnp.pi * jnp.cumsum(
        f0_up[..., None] * harmonics / cfg.sample_rate, axis=1)
    sines = 0.1 * jnp.sin(phase)
    uv = (f0_up > 10.0).astype(jnp.float32)[..., None]
    noise = (0.003 * jax.random.normal(key, sines.shape)
             if key is not None else jnp.zeros_like(sines))
    sines = sines * uv + noise
    s = jnp.tanh(_dense(sines, params["source_merge"]))[..., 0]

    s_stft = _hift_stft(s, cfg.istft_n_fft, cfg.istft_hop)

    x = _conv1d(mel, params["conv_pre"])
    nk = len(cfg.resblock_kernels)
    for i, (up, sd, sr) in enumerate(zip(params["ups"],
                                         params["source_downs"],
                                         params["source_res"])):
        x = jax.nn.leaky_relu(x, 0.1)
        u, k = up["u"], up["k"]
        x = jax.lax.conv_transpose(
            x, up["w"], (u,), [((k - u) // 2, (k - u) // 2)],
            dimension_numbers=("NHC", "HIO", "NHC")) + up["b"]
        if i == len(params["ups"]) - 1:
            x = jnp.concatenate([x[:, :1], x], axis=1)  # reflection 1,0
        du = sd["du"]
        si = _conv1d(s_stft, sd["p"], stride=du,
                     padding="SAME" if du > 1 else "VALID")
        si = _resblock(sr, si)
        n = min(x.shape[1], si.shape[1])
        x = x[:, :n] + si[:, :n]
        xs = None
        for j in range(nk):
            r = _resblock(params["resblocks"][i * nk + j], x)
            xs = r if xs is None else xs + r
        x = xs / nk
    x = jax.nn.leaky_relu(x)
    x = _conv1d(x, params["conv_post"])
    nfft = cfg.istft_n_fft
    mag = jnp.exp(jnp.clip(x[..., :nfft // 2 + 1], -20.0, np.log(1e2)))
    phase = jnp.sin(x[..., nfft // 2 + 1:])
    wav = _hift_istft(mag, phase, nfft, cfg.istft_hop)
    return jnp.clip(wav, -0.99, 0.99)


# ---------------------------------------------------------------------------
# full S3Gen
# ---------------------------------------------------------------------------

def init_s3gen(key, cfg: S3GenConfig = S3GenConfig(), dtype=jnp.float32):
    keys = jax.random.split(key, 8)
    d = cfg.d_model
    return {
        "token_emb": (jax.random.normal(keys[0], (cfg.token_vocab, d))
                      * 0.02).astype(dtype),
        "spk_affine": _init_lin(keys[1], cfg.spk_dim, cfg.mel_dim,
                                dtype),
        "encoder": init_encoder(keys[2], cfg, dtype),
        "encoder_proj": _init_lin(keys[3], d, cfg.mel_dim, dtype),
        "estimator": init_estimator(keys[4], cfg, dtype),
        "campplus": init_campplus(keys[5], cfg, dtype),
        "hift": init_hift(keys[6], cfg, dtype),
    }


class S3Gen:
    """S3Token2Wav (s3gen.py:212-298): flow token->mel + HiFT mel->wav."""

    def __init__(self, params, cfg: S3GenConfig = S3GenConfig()):
        self.params = params
        self.cfg = cfg

    def embed_ref(self, ref_wav_24k, prompt_tokens=None):
        """ref wav [B, L] at 24 kHz -> ref dict (s3gen.py:107-158).
        prompt_tokens: optional [B, Tp] S3 tokens of the reference (the
        pretrained S3 tokenizer is external to this module)."""
        cfg = self.cfg
        mels = mel24(ref_wav_24k, cfg)
        xv = campplus_embed(self.params["campplus"], cfg, mels)
        if prompt_tokens is not None:
            mels = mels[:, :2 * prompt_tokens.shape[1]]
        return {"prompt_feat": mels, "embedding": xv,
                "prompt_token": prompt_tokens}

    def flow(self, speech_tokens, ref, key=None):
        """tokens [B, T] -> mel [B, 2T, mel] (flow.py:245-291)."""
        cfg = self.cfg
        p = self.params
        # F.normalize(embedding) then affine to mel_dim (flow.py:259-261)
        emb = ref["embedding"] / jnp.maximum(
            jnp.linalg.norm(ref["embedding"], axis=-1, keepdims=True),
            1e-8)
        spk = _dense(emb, p["spk_affine"])
        tokens = speech_tokens
        p_len = 0
        if ref.get("prompt_token") is not None:
            tokens = jnp.concatenate([ref["prompt_token"],
                                      speech_tokens], axis=1)
            p_len = 2 * ref["prompt_token"].shape[1]
        h = p["token_emb"][jnp.clip(tokens, 0, cfg.token_vocab - 1)]
        h = encoder_forward(p["encoder"], cfg, h)
        mu = _dense(h, p["encoder_proj"])
        cond = jnp.zeros(mu.shape[:2] + (cfg.mel_dim,), mu.dtype)
        if p_len > 0:
            cond = cond.at[:, :p_len].set(
                ref["prompt_feat"][:, :p_len])
        mel = cfm_inference(p["estimator"], cfg, mu, spk, cond, key)
        return mel[:, p_len:]

    def __call__(self, speech_tokens, ref, key=None):
        mel = self.flow(speech_tokens, ref, key)
        wav = hift_vocode(self.params["hift"], self.cfg, mel, key)
        # 20 ms fade-in against reference spillover (s3gen.py:230-235)
        n = self.cfg.sample_rate // 50
        fade = jnp.concatenate([
            jnp.zeros((n,)),
            (jnp.cos(jnp.linspace(jnp.pi, 0.0, n)) + 1.0) / 2.0])
        m = min(2 * n, wav.shape[1])
        wav = wav.at[:, :m].multiply(fade[:m][None])
        return wav
