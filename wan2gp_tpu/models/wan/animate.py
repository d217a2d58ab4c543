"""Wan 2.2 Animate: pose + face-motion driven character animation.

TPU-native re-implementation of /root/reference/models/wan/animate/:
- motion_encoder.py (LIA-style StyleGAN encoder): EqualConv2d pyramid
  (512->4 px) with blur-downsampled ResBlocks, 5 EqualLinear motion fc,
  and the QR-orthonormalized Direction basis (Generator.get_motion:295)
  mapping a 512x512 face crop to a 512-d motion vector;
- face_blocks.py FaceEncoder:123 — causal conv1d stack (k3, two stride-2
  convs -> one token row per latent frame) splitting 4 head groups of
  1024 channels, out_proj to model dim, +1 learned padding token, and a
  zero row prepended for latent frame 0 (model_animate.py:28-30);
- face_blocks.py FaceBlock:291 — per-latent-frame cross attention from
  the video tokens to that frame's 5 motion tokens, with affine-free
  pre-LNs and per-head-dim rms q/k norms; fused into every 5th DiT
  block (model.py:1305-1312, :715-716);
- model_animate.py after_patch_embedding:12 — pose latents are patch
  embedded with a dedicated conv and ADDED to the video tokens of
  latent frames 1+.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

_CHANNELS = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256, 128: 128,
             256: 64, 512: 32, 1024: 16}
_BLUR_KERNEL = (1.0, 3.0, 3.0, 1.0)


# ---------------------------------------------------------------------------
# motion encoder primitives (motion_encoder.py)
# ---------------------------------------------------------------------------

def _blur_kernel_2d():
    k = np.asarray(_BLUR_KERNEL)
    k = np.outer(k, k)
    return (k / k.sum()).astype(np.float32)


def _equal_conv2d(x, w, b=None, stride=1, padding=0):
    """x [B, C, H, W]; w [out, in, k, k] with 1/sqrt(in*k^2) runtime
    scale (motion_encoder.py EqualConv2d:90)."""
    scale = 1.0 / math.sqrt(w.shape[1] * w.shape[2] * w.shape[3])
    y = jax.lax.conv_general_dilated(
        x, w * scale, (stride, stride),
        [(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    if b is not None:
        y = y + b.reshape(1, -1, 1, 1)
    return y


def _fused_leaky_relu(x, bias, slope=0.2, scale=math.sqrt(2.0)):
    return jax.nn.leaky_relu(x + bias.reshape(1, -1, 1, 1), slope) * scale


def _blur(x, pad: Tuple[int, int]):
    """upfirdn2d with the normalized [1,3,3,1] outer kernel
    (motion_encoder.py:19-49, up=down=1)."""
    k = _blur_kernel_2d()
    x = jnp.pad(x, ((0, 0), (0, 0), pad, pad))
    w = jnp.asarray(np.flip(k).copy())[None, None]
    c = x.shape[1]
    w = jnp.broadcast_to(w, (c, 1, 4, 4))
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "VALID", feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def _conv_layer(p, x, downsample=False, activate=True, k=3):
    if downsample:
        pd = (len(_BLUR_KERNEL) - 2) + (k - 1)
        x = _blur(x, ((pd + 1) // 2, pd // 2))
        y = _equal_conv2d(x, p["w"], p.get("cb"), stride=2, padding=0)
    else:
        y = _equal_conv2d(x, p["w"], p.get("cb"), stride=1, padding=k // 2)
    if activate:
        y = _fused_leaky_relu(y, p["b"])
    return y


def _equal_linear(p, x, lr_mul=1.0):
    scale = (1.0 / math.sqrt(p["w"].shape[0])) * lr_mul
    return jnp.dot(x, p["w"] * scale) + p["b"] * lr_mul


@dataclasses.dataclass(frozen=True)
class MotionEncoderConfig:
    size: int = 512
    dim: int = 512
    motion_dim: int = 20


def init_motion_encoder(key, cfg: MotionEncoderConfig = MotionEncoderConfig()
                        ) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 64))

    def conv(cin, cout, k, bias_act=True, plain_bias=False):
        p = {"w": jax.random.normal(next(keys), (cout, cin, k, k),
                                    jnp.float32)}
        if bias_act:
            p["b"] = jnp.zeros((cout,), jnp.float32)
        if plain_bias:
            p["cb"] = jnp.zeros((cout,), jnp.float32)
        return p

    log_size = int(math.log2(cfg.size))
    convs = [conv(3, _CHANNELS[cfg.size], 1)]
    cin = _CHANNELS[cfg.size]
    res = []
    for i in range(log_size, 2, -1):
        cout = _CHANNELS[2 ** (i - 1)]
        res.append({"conv1": conv(cin, cin, 3),
                    "conv2": conv(cin, cout, 3),
                    "skip": conv(cin, cout, 1, bias_act=False)})
        cin = cout
    final = {"w": jax.random.normal(next(keys), (cfg.dim, cin, 4, 4),
                                    jnp.float32)}
    fc = [{"w": jax.random.normal(next(keys), (cfg.dim, cfg.dim),
                                  jnp.float32),
           "b": jnp.zeros((cfg.dim,), jnp.float32)} for _ in range(4)]
    fc.append({"w": jax.random.normal(next(keys),
                                      (cfg.dim, cfg.motion_dim),
                                      jnp.float32),
               "b": jnp.zeros((cfg.motion_dim,), jnp.float32)})
    return {"conv_in": convs[0], "res_blocks": res, "final": final,
            "fc": fc,
            "direction": jax.random.normal(
                next(keys), (cfg.dim, cfg.motion_dim), jnp.float32)}


def motion_encoder_forward(params, x):
    """x: [B, 3, S, S] face crops in [-1, 1].  Returns [B, 512] motion
    vectors (Generator.get_motion:301-305: enc_motion + Direction)."""
    h = _conv_layer(params["conv_in"], x.astype(jnp.float32), k=1)
    for rp in params["res_blocks"]:
        a = _conv_layer(rp["conv1"], h, k=3)
        a = _conv_layer(rp["conv2"], a, downsample=True, k=3)
        s = _conv_layer(rp["skip"], h, downsample=True, activate=False,
                        k=1)
        h = (a + s) / math.sqrt(2.0)
    h = _equal_conv2d(h, params["final"]["w"], padding=0)  # [B, 512, 1, 1]
    h = h.reshape(h.shape[0], -1)
    for lp in params["fc"]:
        h = _equal_linear(lp, h)
    # Direction (motion_encoder.py:271-283): alpha @ Q.T with QR of the
    # (weight + 1e-8) basis
    q, _ = jnp.linalg.qr(params["direction"].astype(jnp.float32) + 1e-8)
    return jnp.dot(h, q.T)


# ---------------------------------------------------------------------------
# face encoder (face_blocks.py:123-170)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class FaceEncoderConfig:
    in_dim: int = 512
    hidden_dim: int = 5120
    num_heads: int = 4        # token groups, fixed 4 (model.py:1240)


def init_face_encoder(key, cfg: FaceEncoderConfig) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 8))

    def conv1d(cin, cout, k=3):
        lim = math.sqrt(6.0 / (cin * k + cout))
        return {"w": jax.random.uniform(next(keys), (k, cin, cout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    def lin(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return {"w": jax.random.uniform(next(keys), (cin, cout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    return {"conv1": conv1d(cfg.in_dim, 1024 * cfg.num_heads),
            "conv2": conv1d(1024, 1024), "conv3": conv1d(1024, 1024),
            "out_proj": lin(1024, cfg.hidden_dim),
            "padding_tokens": jnp.zeros((1, 1, 1, cfg.hidden_dim),
                                        jnp.float32)}


def _causal_conv1d(x, p, stride=1):
    """x [B, T, C]; replicate left pad k-1 (face_blocks.py
    CausalConv1d:106)."""
    k = p["w"].shape[0]
    left = jnp.repeat(x[:, :1], k - 1, axis=1)
    x = jnp.concatenate([left, x], axis=1)
    y = jax.lax.conv_general_dilated(
        x, p["w"], (stride,), "VALID",
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + p["b"]


def _ln_nf(x, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps)


def face_encoder_forward(params, cfg: FaceEncoderConfig, motion):
    """motion: [B, T, in_dim] per-video-frame motion vectors.  Returns
    [B, 1 + ceil(T/4), num_heads + 1, hidden_dim] (zero row prepended
    for latent frame 0, model_animate.py:28-30)."""
    b, t, _ = motion.shape
    n = cfg.num_heads
    x = _causal_conv1d(motion.astype(jnp.float32), params["conv1"])
    x = x.reshape(b, t, n, 1024).transpose(0, 2, 1, 3).reshape(b * n, t,
                                                               1024)
    x = jax.nn.silu(_ln_nf(x))
    x = _causal_conv1d(x, params["conv2"], stride=2)
    x = jax.nn.silu(_ln_nf(x))
    x = _causal_conv1d(x, params["conv3"], stride=2)
    x = jax.nn.silu(_ln_nf(x))
    x = jnp.dot(x, params["out_proj"]["w"]) + params["out_proj"]["b"]
    t2 = x.shape[1]
    x = x.reshape(b, n, t2, -1).transpose(0, 2, 1, 3)  # [B, T', n, C]
    pad = jnp.broadcast_to(params["padding_tokens"],
                           (b, t2, 1, x.shape[-1]))
    x = jnp.concatenate([x, pad], axis=2)              # [B, T', n+1, C]
    zero = jnp.zeros((b, 1, *x.shape[2:]), x.dtype)
    return jnp.concatenate([zero, x], axis=1)          # [B, 1+T', n+1, C]


# ---------------------------------------------------------------------------
# face adapter blocks (face_blocks.py:291-376)
# ---------------------------------------------------------------------------

def init_face_adapter(key, dim: int, heads_num: int, num_adapters: int
                      ) -> List[Dict[str, Any]]:
    keys = iter(jax.random.split(key, num_adapters * 4 + 1))
    hd = dim // heads_num

    def lin(cin, cout):
        lim = math.sqrt(6.0 / (cin + cout))
        return {"w": jax.random.uniform(next(keys), (cin, cout),
                                        jnp.float32, -lim, lim),
                "b": jnp.zeros((cout,), jnp.float32)}

    return [{"linear1_q": lin(dim, dim), "linear1_kv": lin(dim, 2 * dim),
             "linear2": lin(dim, dim),
             "q_norm": jnp.ones((hd,), jnp.float32),
             "k_norm": jnp.ones((hd,), jnp.float32)}
            for _ in range(num_adapters)]


def face_block_forward(p, x, motion_vec, heads_num: int):
    """x: [B, L, C] (L = F * S); motion_vec: [B, F, N, C].  Per-frame
    cross attention (face_blocks.py FaceBlock.forward:329-372)."""
    b, l, c = x.shape
    f, nt = motion_vec.shape[1], motion_vec.shape[2]
    s = l // f
    hd = c // heads_num
    xm = _ln_nf(motion_vec.astype(jnp.float32))
    xf = _ln_nf(x.astype(jnp.float32))
    kv = jnp.dot(xm, p["linear1_kv"]["w"]) + p["linear1_kv"]["b"]
    q = jnp.dot(xf, p["linear1_q"]["w"]) + p["linear1_q"]["b"]
    k, v = jnp.split(kv, 2, axis=-1)

    def rms(t_, w):
        return (t_ * jax.lax.rsqrt(jnp.mean(t_ * t_, -1, keepdims=True)
                                   + 1e-6)) * w

    q = rms(q.reshape(b, f, s, heads_num, hd), p["q_norm"])
    k = rms(k.reshape(b, f, nt, heads_num, hd), p["k_norm"])
    v = v.reshape(b, f, nt, heads_num, hd)
    att = jnp.einsum("bfsnd,bfknd->bfnsk", q, k) / math.sqrt(hd)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("bfnsk,bfknd->bfsnd", att, v)
    o = o.reshape(b, l, c)
    return jnp.dot(o, p["linear2"]["w"]) + p["linear2"]["b"]


def stack_face_adapter(adapters: List[Dict[str, Any]], num_layers: int,
                       every: int = 5):
    """Expand the 8 fuser blocks to a per-layer stacked tree with an
    active flag at layers 0, 5, ... (model.py:1305-1312)."""
    zeros = jax.tree.map(jnp.zeros_like, adapters[0])
    per_layer, active = [], []
    for i in range(num_layers):
        if i % every == 0 and i // every < len(adapters):
            per_layer.append(adapters[i // every])
            active.append(1.0)
        else:
            per_layer.append(zeros)
            active.append(0.0)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)
    stacked["active"] = jnp.asarray(active, jnp.float32)
    return stacked


# ---------------------------------------------------------------------------
# loaders (animate module keys inside the Wan-Animate dit checkpoint)
# ---------------------------------------------------------------------------

def load_animate_params(sd: Dict[str, np.ndarray], dim: int,
                        num_layers: int, heads_num: int,
                        dtype=jnp.float32):
    """Consume motion_encoder.* / face_encoder.* / face_adapter.* /
    pose_patch_embedding.* keys.  Returns (params dict, leftovers)."""
    sd = dict(sd)

    def pop(k):
        return np.asarray(sd.pop(k), np.float32)

    def lin_t(prefix):
        p = {"w": jnp.asarray(pop(f"{prefix}.weight").T).astype(dtype)}
        if f"{prefix}.bias" in sd:
            p["b"] = jnp.asarray(pop(f"{prefix}.bias")).astype(dtype)
        return p

    out: Dict[str, Any] = {}
    if "pose_patch_embedding.weight" in sd:
        w = pop("pose_patch_embedding.weight")
        out["pose_patch_embedding"] = {
            "w": jnp.asarray(w.reshape(w.shape[0], -1).T).astype(dtype),
            "b": jnp.asarray(pop("pose_patch_embedding.bias")),
        }

    me_pre = "motion_encoder.enc."
    if f"{me_pre}net_app.convs.0.0.weight" in sd:
        def eq_conv(prefix, act=True):
            p = {"w": jnp.asarray(pop(f"{prefix}.0.weight"))}
            if f"{prefix}.0.bias" in sd:
                p["cb"] = jnp.asarray(pop(f"{prefix}.0.bias"))
            if act and f"{prefix}.1.bias" in sd:
                p["b"] = jnp.asarray(pop(f"{prefix}.1.bias")
                                     .reshape(-1))
            return p

        res = []
        n_res = len({k.split(".")[3] for k in sd
                     if k.startswith("motion_encoder.enc.net_app.convs.")
                     and ".conv1." in k})
        conv_in = eq_conv(f"{me_pre}net_app.convs.0")
        for i in range(1, n_res + 1):
            pre = f"{me_pre}net_app.convs.{i}"
            res.append({
                "conv1": eq_conv(f"{pre}.conv1"),
                # conv2 layout: Blur(0) -> conv(1) -> act(2)
                "conv2": {"w": jnp.asarray(pop(f"{pre}.conv2.1.weight")),
                          "b": jnp.asarray(pop(f"{pre}.conv2.2.bias")
                                           .reshape(-1))},
                "skip": {"w": jnp.asarray(pop(f"{pre}.skip.1.weight"))},
            })
        final = {"w": jnp.asarray(
            pop(f"{me_pre}net_app.convs.{n_res + 1}.weight"))}
        fc = []
        for i in range(5):
            fc.append({"w": jnp.asarray(pop(f"{me_pre}fc.{i}.weight").T),
                       "b": jnp.asarray(pop(f"{me_pre}fc.{i}.bias"))})
        out["motion_encoder"] = {
            "conv_in": conv_in, "res_blocks": res, "final": final,
            "fc": fc,
            "direction": jnp.asarray(
                pop("motion_encoder.dec.direction.weight")),
        }

    if "face_encoder.conv1_local.conv.weight" in sd:
        def cconv(prefix):
            return {"w": jnp.asarray(
                        pop(f"{prefix}.conv.weight").transpose(2, 1, 0)),
                    "b": jnp.asarray(pop(f"{prefix}.conv.bias"))}
        out["face_encoder"] = {
            "conv1": cconv("face_encoder.conv1_local"),
            "conv2": cconv("face_encoder.conv2"),
            "conv3": cconv("face_encoder.conv3"),
            "out_proj": lin_t("face_encoder.out_proj"),
            "padding_tokens": jnp.asarray(
                pop("face_encoder.padding_tokens")),
        }

    if "face_adapter.fuser_blocks.0.linear1_q.weight" in sd:
        hd = dim // heads_num
        adapters = []
        n_ad = len({k.split(".")[2] for k in sd
                    if k.startswith("face_adapter.fuser_blocks.")})
        for i in range(n_ad):
            pre = f"face_adapter.fuser_blocks.{i}"
            adapters.append({
                "linear1_q": lin_t(f"{pre}.linear1_q"),
                "linear1_kv": lin_t(f"{pre}.linear1_kv"),
                "linear2": lin_t(f"{pre}.linear2"),
                "q_norm": jnp.asarray(pop(f"{pre}.q_norm.weight")),
                "k_norm": jnp.asarray(pop(f"{pre}.k_norm.weight")),
            })
        out["face_adapter"] = stack_face_adapter(adapters, num_layers)
    return out, sorted(sd.keys())
