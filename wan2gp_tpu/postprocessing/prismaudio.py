"""PrismAudio — video-to-audio soundtrack generation (reference
postprocessing/prismaudio/: runtime.py + vendor/PrismAudio/models/
dit.py DiffusionTransformer + transformer.py ContinuousTransformer +
configs/model_configs/prismaudio.json).

Rectified-flow DiT (1024 dim, 24 layers, 16 heads) over 64-channel
Oobleck latents (hop 2048 @ 44.1 kHz stereo, shared with
models/tts/ace15_vae.py):
* cross-attention to [per-frame VideoPrism tokens; T5 text tokens]
  (diffusion.cross_attention_cond_ids);
* per-frame video tokens ALSO injected additively at the input with a
  sigmoid gate (add_cond, transformer.py:916-920 use_gated) after
  linear interpolation to the latent length;
* Synchformer features injected with a zero-init sigmoid sync gate
  (use_sync_gated, transformer.py:925-928);
* the timestep embedding is PREPENDED as a global token
  (dit.py:245-260 global_cond_type="prepend");
* discrete-Euler sampling over linspace(1, 0) (runtime.py
  _sample_discrete_euler) with CFG over the conditioning.

Feature extraction: VideoPrism LVT (postprocessing/videoprism.py, 4
fps clip frames at 288px) + a T5 hook + a Synchformer hook (25 fps;
reference uses the MMAudio-lineage Synchformer checkpoint).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.ace15_vae import (OobleckConfig, init_oobleck,
                                    oobleck_decode)
from .videoprism import (VideoPrismConfig, init_videoprism,
                         videoprism_encode, videoprism_encode_text)

PRISM_SAMPLE_RATE = 44100
PRISM_DOWNSAMPLING = 2048
CLIP_FPS = 4
CLIP_SIZE = 288
SYNC_FPS = 25
DEFAULT_CAPTION = ("Generate a realistic soundtrack synchronized with "
                   "the visible video. Emphasize foreground sounds "
                   "from visible motion, environmental ambience, "
                   "impacts, and spatial movement.")


@dataclasses.dataclass(frozen=True)
class PrismDiTConfig:
    io_channels: int = 64
    embed: int = 1024
    depth: int = 24
    heads: int = 16
    cond_token_dim: int = 1024     # videoprism / t5 features
    add_token_dim: int = 1024
    sync_token_dim: int = 1024     # sync_mlp output (from 768)
    sync_in_dim: int = 768
    t_features: int = 256
    ff_mult: float = 4.0
    rotary_frac: float = 0.5       # partial rotary like stable-audio
    eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed // self.heads

    @classmethod
    def tiny(cls):
        return cls(io_channels=8, embed=32, depth=2, heads=4,
                   cond_token_dim=16, add_token_dim=16,
                   sync_token_dim=16, sync_in_dim=12, t_features=16)


def _lin(key, din, dout, dtype, bias=True, zero=False):
    w = (jnp.zeros((din, dout), jnp.float32) if zero else
         jax.random.normal(key, (din, dout), jnp.float32) * 0.02)
    p = {"w": w.astype(dtype)}
    if bias:
        p["b"] = jnp.zeros((dout,), dtype)
    return p


def _dense(x, p):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def _mlp2(key, din, dout, dtype, bias=False):
    k1, k2 = jax.random.split(key)
    return {"l1": _lin(k1, din, dout, dtype, bias=bias),
            "l2": _lin(k2, dout, dout, dtype, bias=bias)}


def _mlp2_fwd(x, p):
    return _dense(jax.nn.silu(_dense(x, p["l1"])), p["l2"])


def _rms(x, w, eps=1e-6):
    x32 = x.astype(jnp.float32)
    y = x32 * jax.lax.rsqrt(jnp.mean(x32 * x32, -1, keepdims=True)
                            + eps)
    return (y * w).astype(x.dtype)


def _rotary(x, rot_dim):
    n = x.shape[1]
    inv = 1.0 / (10000.0 ** (np.arange(0, rot_dim, 2) / rot_dim))
    f = jnp.asarray(np.outer(np.arange(n), inv), jnp.float32)
    cos = jnp.concatenate([jnp.cos(f), jnp.cos(f)], -1)
    sin = jnp.concatenate([jnp.sin(f), jnp.sin(f)], -1)
    t, rest = x[..., :rot_dim], x[..., rot_dim:]
    half = rot_dim // 2
    t1, t2 = t[..., :half], t[..., half:]
    rot = jnp.concatenate([-t2, t1], -1)
    out = (t * cos[None, :, None, :] + rot * sin[None, :, None, :])
    return jnp.concatenate([out.astype(x.dtype), rest], -1)


def init_prism_dit(key, cfg: PrismDiTConfig, dtype=jnp.float32):
    d = cfg.embed
    hd = cfg.head_dim
    keys = iter(jax.random.split(key, 24))

    def block(k):
        ks = iter(jax.random.split(k, 8))
        return {
            "sa_norm": jnp.ones((d,), jnp.float32),
            "qkv": _lin(next(ks), d, 3 * d, dtype, bias=False),
            "qn": jnp.ones((hd,), jnp.float32),
            "kn": jnp.ones((hd,), jnp.float32),
            "sa_out": _lin(next(ks), d, d, dtype, bias=False,
                           zero=True),
            "ca_norm": jnp.ones((d,), jnp.float32),
            "ca_q": _lin(next(ks), d, d, dtype, bias=False),
            "ca_kv": _lin(next(ks), cfg.cond_token_dim, 2 * d, dtype,
                          bias=False),
            "ca_out": _lin(next(ks), d, d, dtype, bias=False,
                           zero=True),
            "ff_norm": jnp.ones((d,), jnp.float32),
            "ff1": _lin(next(ks), d, int(d * cfg.ff_mult), dtype),
            "ff2": _lin(next(ks), int(d * cfg.ff_mult), d, dtype,
                        zero=True),
        }

    lks = jax.random.split(next(keys), cfg.depth)
    leaves = [block(k) for k in lks]
    return {
        "project_in": _lin(next(keys), cfg.io_channels, d, dtype,
                           bias=False),
        "project_out": _lin(next(keys), d, cfg.io_channels, dtype,
                            bias=False),
        "preprocess": jnp.zeros((cfg.io_channels, cfg.io_channels),
                                dtype),
        "postprocess": jnp.zeros((cfg.io_channels, cfg.io_channels),
                                 dtype),
        "t1": _lin(next(keys), cfg.t_features, d, dtype),
        "t2": _lin(next(keys), d, d, dtype),
        "to_add": _mlp2(next(keys), cfg.add_token_dim, d, dtype),
        "to_sync": _mlp2(next(keys), cfg.sync_token_dim, d, dtype),
        "sync_mlp": _mlp2(next(keys), cfg.sync_in_dim,
                          cfg.sync_token_dim, dtype, bias=True),
        "add_gate": jnp.ones((1, 1, d), jnp.float32),
        "sync_gate": jnp.zeros((1, 1, d), jnp.float32),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *leaves),
        "empty_clip": jnp.zeros((1, cfg.cond_token_dim), dtype),
        "empty_sync": jnp.zeros((1, cfg.sync_in_dim), dtype),
    }


def _fourier_t(t, dim):
    half = dim // 2
    freqs = jnp.exp(-math.log(10000.0)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = 2 * math.pi * t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], -1)


def _interp_tokens(tok, n):
    """Linear interpolate [B, T, D] -> [B, n, D]."""
    t = tok.shape[1]
    if t == n:
        return tok
    xi = jnp.linspace(0.0, t - 1.0, n)
    i0 = jnp.floor(xi).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, t - 1)
    w = (xi - i0)[None, :, None]
    return tok[:, i0] * (1 - w) + tok[:, i1] * w


def prism_dit(params, cfg: PrismDiTConfig, x, t, cross_tokens,
              add_tokens=None, sync_tokens=None):
    """x [B, N, io]; t [B]; cross_tokens [B, L, cond_dim] (video
    frames ++ text); add_tokens [B, Ta, add_dim] (video frames);
    sync_tokens [B, Ts, sync_in_dim] -> velocity [B, N, io]."""
    b, n, _ = x.shape
    d, heads, hd = cfg.embed, cfg.heads, cfg.head_dim
    rot = int(hd * cfg.rotary_frac)

    x = x @ params["preprocess"].astype(x.dtype) + x
    h = _dense(x, params["project_in"])

    if add_tokens is not None:
        add = _mlp2_fwd(add_tokens, params["to_add"])
        add = _interp_tokens(add, n)
        h = h + jax.nn.sigmoid(params["add_gate"]).astype(h.dtype) * add
    if sync_tokens is not None:
        sync = _mlp2_fwd(_mlp2_fwd(sync_tokens, params["sync_mlp"]),
                         params["to_sync"])
        sync = _interp_tokens(sync, n)
        h = h + jax.nn.sigmoid(params["sync_gate"]).astype(h.dtype) \
            * sync

    # timestep as a prepended global token
    temb = _dense(jax.nn.silu(_dense(_fourier_t(t, cfg.t_features),
                                     params["t1"])), params["t2"])
    h = jnp.concatenate([temb[:, None].astype(h.dtype), h], axis=1)

    def body(h, lp):
        y = _rms(h, lp["sa_norm"], cfg.eps)
        qkv = _dense(y, lp["qkv"]).reshape(b, -1, 3, heads, hd)
        q = _rotary(_rms(qkv[:, :, 0], lp["qn"]), rot)
        k = _rotary(_rms(qkv[:, :, 1], lp["kn"]), rot)
        s = jnp.einsum("blhd,bshd->bhls", q, k,
                       preferred_element_type=jnp.float32) \
            / math.sqrt(hd)
        a = jax.nn.softmax(s, -1).astype(h.dtype)
        o = jnp.einsum("bhls,bshd->blhd", a,
                       qkv[:, :, 2]).reshape(b, -1, d)
        h = h + _dense(o, lp["sa_out"])
        y = _rms(h, lp["ca_norm"], cfg.eps)
        q = _dense(y, lp["ca_q"]).reshape(b, -1, heads, hd)
        kv = _dense(cross_tokens, lp["ca_kv"]).reshape(
            b, -1, 2, heads, hd)
        s = jnp.einsum("blhd,bshd->bhls", q, kv[:, :, 0],
                       preferred_element_type=jnp.float32) \
            / math.sqrt(hd)
        a = jax.nn.softmax(s, -1).astype(h.dtype)
        o = jnp.einsum("bhls,bshd->blhd", a,
                       kv[:, :, 1]).reshape(b, -1, d)
        h = h + _dense(o, lp["ca_out"])
        y = _rms(h, lp["ff_norm"], cfg.eps)
        h = h + _dense(jax.nn.gelu(_dense(y, lp["ff1"]),
                                   approximate=True), lp["ff2"])
        return h, None

    h, _ = jax.lax.scan(body, h, params["blocks"])
    out = _dense(h[:, 1:], params["project_out"])
    return out @ params["postprocess"].astype(out.dtype) + out


def prism_sample(params, cfg: PrismDiTConfig, latent_length: int,
                 cross_tokens, add_tokens, sync_tokens,
                 steps: int = 24, cfg_scale: float = 4.5,
                 key=None):
    """Discrete-Euler rectified flow with CFG (runtime.py:99-109 +
    dit.py:317 forward cfg path: uncond = empty clip/sync feats)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    b = cross_tokens.shape[0]
    x = jax.random.normal(key, (b, latent_length, cfg.io_channels),
                          jnp.float32)
    ts = np.linspace(1.0, 0.0, steps + 1)
    null_cross = jnp.zeros_like(cross_tokens)
    null_add = (jnp.zeros_like(add_tokens)
                if add_tokens is not None else None)
    null_sync = (jnp.zeros_like(sync_tokens)
                 if sync_tokens is not None else None)
    for i in range(steps):
        tv = jnp.full((b,), float(ts[i]), jnp.float32)
        v_c = prism_dit(params, cfg, x, tv, cross_tokens, add_tokens,
                        sync_tokens)
        if cfg_scale != 1.0:
            v_u = prism_dit(params, cfg, x, tv, null_cross, null_add,
                            null_sync)
            v = v_u + cfg_scale * (v_c - v_u)
        else:
            v = v_c
        x = x + (float(ts[i + 1]) - float(ts[i])) * v
    return x


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------

class PrismAudioGenerator:
    """Soundtrack generation for a video clip (runtime.py generate
    flow): frames -> VideoPrism features, caption -> text features
    (hook), sync frames -> Synchformer features (hook), then rf
    sampling + Oobleck decode."""

    def __init__(self, dit_params, dit_cfg: PrismDiTConfig,
                 vp_params, vp_cfg: VideoPrismConfig,
                 vae_params, vae_cfg: OobleckConfig,
                 text_encode_fn: Optional[Callable] = None,
                 sync_encode_fn: Optional[Callable] = None):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.vp_params = vp_params
        self.vp_cfg = vp_cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.text_encode_fn = text_encode_fn or self._text_stub
        self.sync_encode_fn = sync_encode_fn or self._sync_stub
        self.sample_rate = vae_cfg.sample_rate

    def _text_stub(self, prompts):
        k = jax.random.key(hash(prompts[0][:128]) & 0x7FFFFFFF)
        return jax.random.normal(
            k, (1, 16, self.dit_cfg.cond_token_dim), jnp.float32)

    def _sync_stub(self, frames):
        # Synchformer hook absent: per-frame mean-pool proxy at the
        # sync dim (reference loads prismaudio_synchformer)
        t = frames.shape[1]
        pooled = jnp.mean(frames, axis=(2, 3))      # [B, T, 3]
        k = jax.random.key(1)
        proj = jax.random.normal(k, (3, self.dit_cfg.sync_in_dim),
                                 jnp.float32) * 0.1
        return pooled @ proj

    def _prep_clip_frames(self, video: np.ndarray,
                          duration: float) -> jnp.ndarray:
        """[T, H, W, 3] uint8/float -> [1, Tc, S, S, 3] at ~4 fps,
        padded square + resized (runtime.py _pad_to_square)."""
        t = video.shape[0]
        n = int(np.clip(round(CLIP_FPS * duration), 8, 36))
        idx = np.linspace(0, t - 1, min(n, t)).round().astype(int)
        frames = np.asarray(video, np.float32)[idx]
        if frames.max() > 1.5:
            frames = frames / 255.0
        h, w = frames.shape[1:3]
        side = max(h, w)
        pad_h, pad_w = side - h, side - w
        frames = np.pad(frames, ((0, 0), (pad_h // 2, pad_h - pad_h
                                          // 2),
                                 (pad_w // 2, pad_w - pad_w // 2),
                                 (0, 0)))
        size = self.vp_cfg.image_size
        xi = np.linspace(0, side - 1, size)
        frames = frames[:, xi.round().astype(int)][:, :,
                                                   xi.round()
                                                   .astype(int)]
        while frames.shape[0] < max(n, 8):
            frames = np.concatenate([frames, frames[-1:]], axis=0)
        return jnp.asarray(frames)[None]

    def generate(self, video: np.ndarray, prompt: str = "",
                 duration: Optional[float] = None, fps: float = 16.0,
                 steps: int = 24, cfg_scale: float = 4.5,
                 seed: int = 0) -> Dict[str, Any]:
        if duration is None:
            duration = video.shape[0] / fps
        clip = self._prep_clip_frames(video, duration)
        feats = videoprism_encode(self.vp_params, self.vp_cfg, clip)
        frame_tokens = feats["frame_embeddings"]
        if frame_tokens.shape[-1] != self.dit_cfg.cond_token_dim:
            pad = self.dit_cfg.cond_token_dim - frame_tokens.shape[-1]
            frame_tokens = jnp.pad(frame_tokens,
                                   ((0, 0), (0, 0), (0, max(pad, 0))))
        caption = (prompt or "").strip() or DEFAULT_CAPTION
        text_tokens = jnp.asarray(self.text_encode_fn([caption]),
                                  jnp.float32)
        cross = jnp.concatenate(
            [frame_tokens.astype(jnp.float32), text_tokens], axis=1)
        sync = jnp.asarray(self.sync_encode_fn(clip), jnp.float32)

        latent_length = max(1, round(self.sample_rate * duration
                                     / self.vae_cfg.hop))
        lat = prism_sample(self.dit_params, self.dit_cfg,
                           latent_length, cross, frame_tokens, sync,
                           steps=steps, cfg_scale=cfg_scale,
                           key=jax.random.PRNGKey(seed))
        audio = oobleck_decode(self.vae_params, self.vae_cfg,
                               lat.astype(jnp.float32))
        out = np.asarray(audio)[0][:int(duration * self.sample_rate)]
        peak = np.abs(out).max()
        if peak > 1.0:
            out = out * (0.95 / peak)
        return {"audio": out, "sample_rate": self.sample_rate,
                "latents": np.asarray(lat)}


def init_prismaudio(key=None, tiny: bool = False,
                    dtype=jnp.float32) -> PrismAudioGenerator:
    key = key if key is not None else jax.random.key(0)
    k1, k2, k3 = jax.random.split(key, 3)
    if tiny:
        dcfg = PrismDiTConfig.tiny()
        vcfg = VideoPrismConfig.tiny()
        acfg = dataclasses.replace(
            OobleckConfig.tiny(), latent_dim=dcfg.io_channels,
            sample_rate=800)
    else:
        dcfg = PrismDiTConfig()
        vcfg = VideoPrismConfig()
        # prismaudio.json pretransform: strides (2,4,4,8,8) @ 44.1 kHz
        acfg = OobleckConfig(ratios=(2, 4, 4, 8, 8),
                             sample_rate=PRISM_SAMPLE_RATE)
    return PrismAudioGenerator(
        init_prism_dit(k1, dcfg, dtype), dcfg,
        init_videoprism(k2, vcfg, dtype), vcfg,
        init_oobleck(k3, acfg, dtype), acfg)


class PrismAudioProcessor:
    """Audio-processor registry entry (the reference registers
    prismaudio as a soundtrack method next to MMAudio,
    postprocessing/prismaudio/audio_processor.py)."""

    def __init__(self, generator: Optional[PrismAudioGenerator] = None,
                 tiny: bool = False):
        self._gen = generator
        self._tiny = tiny

    @classmethod
    def query_audio_processor_def(cls) -> Dict[str, Any]:
        return {"name": "PrismAudio Soundtrack",
                "processor_types": ("soundtrack",),
                "methods": [("PrismAudio", "prismaudio")], "pos": 6}

    def _generator(self):
        if self._gen is None:
            self._gen = init_prismaudio(tiny=self._tiny)
        return self._gen

    def generate_soundtrack(self, video_path, prompt: str = "",
                            seed: int = 0, steps: int = 24,
                            cfg_scale: float = 4.5, fps: float = None,
                            **_kw):
        if isinstance(video_path, str):
            from ..utils import media
            frames = media.read_mjpeg_avi(video_path)
            meta = media.read_video_metadata(video_path) or {}
            fps = float(meta.get("fps", fps or 16)
                        if isinstance(meta, dict) else (fps or 16))
        else:
            frames = np.asarray(video_path)
            fps = float(fps or 16)
        out = self._generator().generate(
            frames, prompt=prompt, fps=fps, steps=steps,
            cfg_scale=cfg_scale, seed=seed)
        wave = out["audio"]
        if wave.ndim == 1:
            wave = wave[:, None]
        return wave.astype(np.float32), out["sample_rate"]
