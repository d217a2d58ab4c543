"""SigLIP so400m vision tower + USO style projector.

TPU-native re-implementation for FLUX USO style transfer:
- tower: HF SiglipVisionModel google/siglip-so400m-patch14-384
  (conv patch embed + learned positions, pre-LN ViT blocks with
  gelu-tanh MLP, post layernorm; 729 tokens at 1152 dims) — the
  reference loads it via transformers (models/flux/flux_main.py:147);
- projector (models/flux/modules/layers.py:467-595
  SigLIPMultiFeatProjModel): hidden states of layers -2/-11/-20 each
  pass a token-mixing Linear(729 -> 256) + SiLU then a channel
  projection 1152 -> 3072, concatenated to 768 style tokens that
  prepend the text stream with zero position ids (model.py:434-436,
  flux_main.py:494-500).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    num_layers: int = 27
    num_heads: int = 16
    mlp_dim: int = 4304
    patch: int = 14
    image_size: int = 384
    eps: float = 1e-6

    @property
    def tokens(self):
        return (self.image_size // self.patch) ** 2

    @property
    def head_dim(self):
        return self.hidden_size // self.num_heads


def _lin_init(key, din, dout):
    lim = (din + dout) ** -0.5
    return {"w": jax.random.uniform(key, (din, dout), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dout,), jnp.float32)}


def init_siglip(key, cfg: SiglipVisionConfig = SiglipVisionConfig()
                ) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 8 + 8 * cfg.num_layers))
    h = cfg.hidden_size

    def layer():
        return {"ln1_w": jnp.ones((h,)), "ln1_b": jnp.zeros((h,)),
                "q": _lin_init(next(ks), h, h),
                "k": _lin_init(next(ks), h, h),
                "v": _lin_init(next(ks), h, h),
                "o": _lin_init(next(ks), h, h),
                "ln2_w": jnp.ones((h,)), "ln2_b": jnp.zeros((h,)),
                "fc1": _lin_init(next(ks), h, cfg.mlp_dim),
                "fc2": _lin_init(next(ks), cfg.mlp_dim, h)}

    return {
        "patch_embed": _lin_init(next(ks), 3 * cfg.patch ** 2, h),
        "pos_embed": 0.02 * jax.random.normal(next(ks),
                                              (cfg.tokens, h)),
        "layers": [layer() for _ in range(cfg.num_layers)],
        "post_ln_w": jnp.ones((h,)), "post_ln_b": jnp.zeros((h,)),
    }


def _ln(x, w, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def siglip_image_to_patches(img: np.ndarray,
                            cfg: SiglipVisionConfig) -> np.ndarray:
    """[H, W, 3] in [-1, 1] (SiglipImageProcessor normalization is
    (x/255 - 0.5) / 0.5) -> [tokens, 3*p*p], resized to 384."""
    x = jnp.asarray(img, jnp.float32)
    if x.shape[:2] != (cfg.image_size, cfg.image_size):
        x = jax.image.resize(x, (cfg.image_size, cfg.image_size, 3),
                             "bilinear")
    p = cfg.patch
    g = cfg.image_size // p
    x = x.reshape(g, p, g, p, 3).transpose(0, 2, 4, 1, 3)
    return np.asarray(x.reshape(g * g, 3 * p * p))


def siglip_forward(params, cfg: SiglipVisionConfig, patches,
                   collect: Sequence[int] = ()):
    """patches: [B, tokens, 3*p*p].  Returns (post-LN last hidden,
    {idx: hidden_states[idx]}) with HF indexing (0 = embeddings,
    supports negatives)."""
    b = patches.shape[0]
    x = patches @ params["patch_embed"]["w"] + params["patch_embed"]["b"]
    x = x + params["pos_embed"][None]
    n_states = cfg.num_layers + 1
    want = {i % n_states for i in collect}
    states = {}
    if 0 in want:
        states[0] = x
    nh, hd = cfg.num_heads, cfg.head_dim
    for li, p in enumerate(params["layers"]):
        y = _ln(x, p["ln1_w"], p["ln1_b"], cfg.eps)
        q = (y @ p["q"]["w"] + p["q"]["b"]).reshape(b, -1, nh, hd)
        k = (y @ p["k"]["w"] + p["k"]["b"]).reshape(b, -1, nh, hd)
        v = (y @ p["v"]["w"] + p["v"]["b"]).reshape(b, -1, nh, hd)
        a = jnp.einsum("blnd,bmnd->bnlm", q, k) / np.sqrt(hd)
        a = jax.nn.softmax(a, axis=-1)
        o = jnp.einsum("bnlm,bmnd->blnd", a, v).reshape(
            b, -1, cfg.hidden_size)
        x = x + (o @ p["o"]["w"] + p["o"]["b"])
        y = _ln(x, p["ln2_w"], p["ln2_b"], cfg.eps)
        y = jax.nn.gelu(y @ p["fc1"]["w"] + p["fc1"]["b"],
                        approximate=True)
        x = x + (y @ p["fc2"]["w"] + p["fc2"]["b"])
        if (li + 1) in want:
            states[li + 1] = x
    return _ln(x, params["post_ln_w"], params["post_ln_b"],
               cfg.eps), states


def load_siglip_params(sd: Dict[str, np.ndarray],
                       cfg: SiglipVisionConfig = SiglipVisionConfig()):
    sd = dict(sd)
    pre = "vision_model"
    if not any(k.startswith(pre) for k in sd):
        pre = ""

    def key(name):
        return f"{pre}.{name}" if pre else name

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(key(f"{name}.weight")), np.float32).T),
                "b": jnp.asarray(np.asarray(
                    sd.pop(key(f"{name}.bias")), np.float32))}

    def vec(name):
        return jnp.asarray(np.asarray(sd.pop(key(name)), np.float32))

    pw = np.asarray(sd.pop(key("embeddings.patch_embedding.weight")),
                    np.float32)            # [h, 3, p, p]
    # conv -> dense over (3, p, p) features; patches are laid out
    # channel-major to match
    patch_embed = {"w": jnp.asarray(pw.reshape(pw.shape[0], -1).T),
                   "b": vec("embeddings.patch_embedding.bias")}
    layers = []
    for i in range(cfg.num_layers):
        lp = f"encoder.layers.{i}"
        layers.append({
            "ln1_w": vec(f"{lp}.layer_norm1.weight"),
            "ln1_b": vec(f"{lp}.layer_norm1.bias"),
            "q": lin(f"{lp}.self_attn.q_proj"),
            "k": lin(f"{lp}.self_attn.k_proj"),
            "v": lin(f"{lp}.self_attn.v_proj"),
            "o": lin(f"{lp}.self_attn.out_proj"),
            "ln2_w": vec(f"{lp}.layer_norm2.weight"),
            "ln2_b": vec(f"{lp}.layer_norm2.bias"),
            "fc1": lin(f"{lp}.mlp.fc1"),
            "fc2": lin(f"{lp}.mlp.fc2")})
    params = {
        "patch_embed": patch_embed,
        "pos_embed": vec("embeddings.position_embedding.weight"),
        "layers": layers,
        "post_ln_w": vec("post_layernorm.weight"),
        "post_ln_b": vec("post_layernorm.bias"),
    }
    leftover = [k for k in sd if "head" not in k and "logit" not in k]
    return params, sorted(leftover)


# -- USO multi-feature style projector --------------------------------------

USO_LAYER_TAPS = (-2, -11, -20)


def init_uso_projector(key, siglip_tokens: int = 729,
                       style_tokens: int = 256,
                       siglip_dim: int = 1152,
                       hidden_size: int = 3072) -> Dict[str, Any]:
    ks = iter(jax.random.split(key, 6))
    return {lvl: {"mix": _lin_init(next(ks), siglip_tokens,
                                   style_tokens),
                  "proj": _lin_init(next(ks), siglip_dim, hidden_size)}
            for lvl in ("high", "mid", "low")}


def uso_project(params, states: Dict[int, jnp.ndarray],
                n_states: int) -> jnp.ndarray:
    """layers.py:520-560: per level, token-mix Linear + SiLU over the
    token axis, then channel projection; concat [high, mid, low]."""
    outs = []
    for lvl, tap in zip(("high", "mid", "low"), USO_LAYER_TAPS):
        h = states[tap % n_states]
        p = params[lvl]
        m = jax.nn.silu(
            h.transpose(0, 2, 1) @ p["mix"]["w"] + p["mix"]["b"]
        ).transpose(0, 2, 1)
        outs.append(m @ p["proj"]["w"] + p["proj"]["b"])
    return jnp.concatenate(outs, axis=1)


def load_uso_projector(sd: Dict[str, np.ndarray]):
    sd = dict(sd)

    def lin(name):
        return {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.weight"), np.float32).T),
                "b": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.bias"), np.float32))}

    out = {}
    for lvl in ("high", "mid", "low"):
        out[lvl] = {"mix": lin(f"{lvl}_embedding_linear.0"),
                    "proj": lin(f"{lvl}_projection")}
    return out, sorted(sd.keys())
