"""Higgs audio-v2 tokenizer — decode path (RVQ -> DAC decoder).

TPU-native re-implementation of the reference decoder
(models/TTS/omnivoice/higgs_audio_v2_tokenizer/
modeling_higgs_audio_v2_tokenizer.py):
- RVQ (:408-458): per-quantizer Euclidean codebook lookup +
  project_out Linear, summed over quantizers;
- fc2 (:474-475): hidden (acoustic 256 + semantic 768 = 1024) -> DAC
  latent (256);
- DAC decoder (HF transformers `dac` with the Higgs adjustments,
  :482-492): conv1 k7 -> per-rate [Snake1d, ConvTranspose1d(k=2s,
  stride s, pad ceil(s/2), output_padding s%2), 3x ResidualUnit
  (Snake+dilated k7 conv+Snake+k1 conv, dilations 1/3/9)] ->
  Snake1d -> conv2 k7; the final tanh is REMOVED.  Upsampling ratios
  (8, 5, 4, 2) -> hop 320, 24 kHz output at 75... frame_rate
  sample_rate/hop = 75 tokens/sec.
- weight-norm convs are fused at load (g * v / ||v||).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class HiggsCodecConfig:
    num_quantizers: int = 8
    codebook_size: int = 1024
    codebook_dim: int = 64
    hidden_size: int = 1024          # acoustic 256 + semantic 768
    dac_latent: int = 256
    decoder_dim: int = 1024
    upsampling_ratios: Tuple[int, ...] = (8, 5, 4, 2)
    sample_rate: int = 24000


def _conv1d(x, w, b=None, stride=1, dilation=1, padding=0):
    """x: [B, C, T]; w: [out, in, k] (torch layout)."""
    y = jax.lax.conv_general_dilated(
        x, w, (stride,), [(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def _conv_transpose1d(x, w, b=None, stride=1, padding=0,
                      output_padding=0):
    """torch ConvTranspose1d via lhs-dilated conv with flipped kernel.
    w: [in, out, k] (torch layout)."""
    k = w.shape[-1]
    wf = jnp.flip(w, axis=-1).transpose(1, 0, 2)     # [out, in, k]
    pad_l = k - 1 - padding
    pad_r = k - 1 - padding + output_padding
    y = jax.lax.conv_general_dilated(
        x, wf, (1,), [(pad_l, pad_r)], lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    if b is not None:
        y = y + b[None, :, None]
    return y


def _snake(x, alpha):
    """HF DAC Snake1d: x + sin(alpha x)^2 / alpha."""
    a = alpha.reshape(1, -1, 1)
    return x + jnp.sin(a * x) ** 2 / (a + 1e-9)


def _res_unit(p, x, dilation):
    pad = ((7 - 1) * dilation) // 2
    y = _snake(x, p["snake1"])
    y = _conv1d(y, p["conv1"]["w"], p["conv1"]["b"], dilation=dilation,
                padding=pad)
    y = _snake(y, p["snake2"])
    y = _conv1d(y, p["conv2"]["w"], p["conv2"]["b"])
    return x + y


def higgs_decode(params, cfg: HiggsCodecConfig, codes) -> jnp.ndarray:
    """codes: [C, T] int -> waveform [T_samples] float32 in [-1, 1]
    (tanh removed upstream; clip for safety)."""
    codes = jnp.asarray(codes)
    quant = 0.0
    for i in range(cfg.num_quantizers):
        q = params["quantizers"][i]
        emb = q["embed"][codes[i]]                     # [T, cb_dim]
        quant = quant + (emb @ q["out_w"] + q["out_b"])
    x = quant @ params["fc2"]["w"] + params["fc2"]["b"]  # [T, latent]
    x = x.T[None].astype(jnp.float32)                   # [1, C, T]
    d = params["decoder"]
    x = _conv1d(x, d["conv1"]["w"], d["conv1"]["b"], padding=3)
    for blk, stride in zip(d["blocks"], cfg.upsampling_ratios):
        x = _snake(x, blk["snake"])
        x = _conv_transpose1d(x, blk["convt"]["w"], blk["convt"]["b"],
                              stride=stride,
                              padding=math.ceil(stride / 2),
                              output_padding=stride % 2)
        for j, dil in enumerate((1, 3, 9)):
            x = _res_unit(blk["res"][j], x, dil)
    x = _snake(x, d["snake_final"])
    x = _conv1d(x, d["conv2"]["w"], d["conv2"]["b"], padding=3)
    return jnp.clip(x[0, 0], -1.0, 1.0)


def init_higgs_codec(key, cfg: HiggsCodecConfig = HiggsCodecConfig()
                     ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 128))

    def conv(cin, cout, k):
        lim = (cin * k + cout) ** -0.5
        return {"w": jax.random.uniform(next(keys), (cout, cin, k),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    def convt(cin, cout, k):
        lim = (cin * k + cout) ** -0.5
        return {"w": jax.random.uniform(next(keys), (cin, cout, k),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    quants = []
    for _ in range(cfg.num_quantizers):
        quants.append({
            "embed": 0.1 * jax.random.normal(
                next(keys), (cfg.codebook_size, cfg.codebook_dim)),
            "out_w": 0.1 * jax.random.normal(
                next(keys), (cfg.codebook_dim, cfg.hidden_size)),
            "out_b": jnp.zeros((cfg.hidden_size,), jnp.float32)})
    dims = [cfg.decoder_dim // (2 ** i)
            for i in range(len(cfg.upsampling_ratios) + 1)]
    blocks = []
    for i, s in enumerate(cfg.upsampling_ratios):
        cin, cout = dims[i], dims[i + 1]
        blocks.append({
            "snake": jnp.ones((cin,), jnp.float32),
            "convt": convt(cin, cout, 2 * s),
            "res": [{"snake1": jnp.ones((cout,), jnp.float32),
                     "conv1": conv(cout, cout, 7),
                     "snake2": jnp.ones((cout,), jnp.float32),
                     "conv2": conv(cout, cout, 1)} for _ in range(3)]})
    return {
        "quantizers": quants,
        "fc2": {"w": 0.05 * jax.random.normal(
            next(keys), (cfg.hidden_size, cfg.dac_latent)),
            "b": jnp.zeros((cfg.dac_latent,), jnp.float32)},
        "decoder": {
            "conv1": conv(cfg.dac_latent, cfg.decoder_dim, 7),
            "blocks": blocks,
            "snake_final": jnp.ones((dims[-1],), jnp.float32),
            "conv2": conv(dims[-1], 1, 7)}}


def _fuse_wn(sd, name):
    """weight_norm fused: g * v / ||v|| over (in, k) dims."""
    if f"{name}.weight" in sd:
        return np.asarray(sd.pop(f"{name}.weight"), np.float32)
    g = np.asarray(sd.pop(f"{name}.parametrizations.weight.original0"),
                   np.float32)
    v = np.asarray(sd.pop(f"{name}.parametrizations.weight.original1"),
                   np.float32)
    norm = np.sqrt((v ** 2).sum(axis=(1, 2), keepdims=True)) + 1e-12
    return g * v / norm


def load_higgs_codec_params(sd: Dict[str, np.ndarray],
                            cfg: HiggsCodecConfig = HiggsCodecConfig()):
    """Consume the decode-path keys of a Higgs tokenizer checkpoint
    (quantizer.quantizers.N.{codebook.embed, project_out}, fc2,
    acoustic_decoder.*); encoder-side keys are left for the caller."""
    sd = dict(sd)

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(name), np.float32))

    def conv(name):
        return {"w": jnp.asarray(_fuse_wn(sd, name)),
                "b": vec(f"{name}.bias")}

    quants = []
    for i in range(cfg.num_quantizers):
        pre = f"quantizer.quantizers.{i}"
        quants.append({
            "embed": vec(f"{pre}.codebook.embed"),
            "out_w": jnp.asarray(np.asarray(
                sd.pop(f"{pre}.project_out.weight"), np.float32).T),
            "out_b": vec(f"{pre}.project_out.bias")})
        for extra in ("codebook.inited", "codebook.cluster_size",
                      "codebook.embed_avg", "project_in.weight",
                      "project_in.bias"):
            sd.pop(f"{pre}.{extra}", None)
    dec = "acoustic_decoder"
    blocks = []
    for i, s in enumerate(cfg.upsampling_ratios):
        pre = f"{dec}.block.{i}"
        blocks.append({
            "snake": vec(f"{pre}.snake1.alpha").reshape(-1),
            "convt": conv(f"{pre}.conv_t1"),
            "res": [{
                "snake1": vec(f"{pre}.res_unit{j}.snake1.alpha"
                              ).reshape(-1),
                "conv1": conv(f"{pre}.res_unit{j}.conv1"),
                "snake2": vec(f"{pre}.res_unit{j}.snake2.alpha"
                              ).reshape(-1),
                "conv2": conv(f"{pre}.res_unit{j}.conv2")}
                for j in (1, 2, 3)]})
    return {
        "quantizers": quants,
        "fc2": {"w": jnp.asarray(np.asarray(
            sd.pop("fc2.weight"), np.float32).T),
            "b": vec("fc2.bias")},
        "decoder": {
            "conv1": conv(f"{dec}.conv1"),
            "blocks": blocks,
            "snake_final": vec(f"{dec}.snake1.alpha").reshape(-1),
            "conv2": conv(f"{dec}.conv2")}}, sorted(sd.keys())
