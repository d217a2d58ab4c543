"""Kiwi Edit — instruction + reference video editing on the Wan2.2 5B
base.

TPU-native re-implementation of the reference Kiwi integration
(models/wan/kiwi/):
- MLLM context encoder (mllm_encoder.py:2243-2686): a Qwen2.5-VL-3B
  with learnable query vectors (image 256 / video 512 / ref 768)
  spliced into the sequence; the last hidden states at the query
  positions pass a zero-init connector MLP (Linear -> gelu(tanh) ->
  Linear) to the DiT text dim (3072); in ref mode the reference
  image's vision span additionally passes a separate ref_connector and
  prepends;
- source/ref embedders (embedders.py:15-33): Conv3d(48, 3072,
  patch (1,2,2)) over VAE 2.2 latents;
- DiT conditioning (modules/model.py:1616-1631): the source condition
  ADDS to the patch-embedded tokens scaled by sigma = t/1000, the ref
  condition CONCATENATES one latent frame on time (pad-first or
  pad-last per variant, wan/kiwi/variant_config.py) with the output
  slice dropping it.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

# Qwen2.5-VL-3B text tower (kiwi qwen_config.json)
QWEN25_VL_3B_TEXT = dict(vocab_size=151936, dim=2048, n_layers=36,
                         n_heads=16, n_kv_heads=2, head_dim=128,
                         ffn_dim=11008)

KIWI_SYSTEM_PROMPT = (
    "You will be given an image and instruction. "
    "Please describe the content of the image in detail "
    "based on instruction in your own words.")


@dataclasses.dataclass(frozen=True)
class KiwiMLLMConfig:
    hidden_size: int = 2048
    dit_dim: int = 3072
    num_image_queries: int = 256
    num_video_queries: int = 512
    num_ref_queries: int = 768
    any_ref: bool = True
    max_frames: int = 16


def init_kiwi_mllm(key, cfg: KiwiMLLMConfig = KiwiMLLMConfig()
                   ) -> Dict[str, Any]:
    """Queries N(0, 0.02); connectors with zero-init output layer
    (mllm_encoder.py:2274-2299)."""
    ks = jax.random.split(key, 8)

    def conn(k):
        lim = (cfg.hidden_size + cfg.dit_dim) ** -0.5
        return {"fc1": {"w": jax.random.uniform(
                    k, (cfg.hidden_size, cfg.dit_dim), jnp.float32,
                    -lim, lim),
                    "b": jnp.zeros((cfg.dit_dim,), jnp.float32)},
                "fc2": {"w": jnp.zeros((cfg.dit_dim, cfg.dit_dim),
                                       jnp.float32),
                        "b": jnp.zeros((cfg.dit_dim,), jnp.float32)}}

    p = {"image_queries": 0.02 * jax.random.normal(
            ks[0], (cfg.num_image_queries, cfg.hidden_size)),
         "video_queries": 0.02 * jax.random.normal(
            ks[1], (cfg.num_video_queries, cfg.hidden_size)),
         "connector": conn(ks[2])}
    if cfg.any_ref:
        p["ref_queries"] = 0.02 * jax.random.normal(
            ks[3], (cfg.num_ref_queries, cfg.hidden_size))
        p["ref_connector"] = conn(ks[4])
    return p


def _connector(p, x):
    h = x.astype(jnp.float32) @ p["fc1"]["w"] + p["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=True)
    return h @ p["fc2"]["w"] + p["fc2"]["b"]


def kiwi_mllm_encode(lm_params, lm_cfg, kiwi_params,
                     cfg: KiwiMLLMConfig, tokenizer, prompt: str,
                     video_feats=None, ref_feats=None,
                     image_feats=None) -> jnp.ndarray:
    """Context for the Kiwi DiT (mllm_encoder.py:2529-2686).

    video_feats/ref_feats/image_feats: merged vision-tower features
    [N, hidden] (video: sampled frames concatenated).  Builds the
    embed sequence [system+instruction text | vision feats | queries],
    runs the LM, and maps the query (and ref-span) hidden states
    through the connectors -> [1, n_ctx, dit_dim]."""
    from ..qwen.text_encoder import qwen_lm_forward
    if ref_feats is not None:
        queries = kiwi_params["ref_queries"]
        instruction = prompt + " Use the reference input from last frame."
    elif video_feats is not None:
        queries = kiwi_params["video_queries"]
        instruction = prompt
    else:
        queries = kiwi_params["image_queries"]
        instruction = prompt
    text = (f"<|im_start|>system\n{KIWI_SYSTEM_PROMPT}<|im_end|>\n"
            f"<|im_start|>user\n{instruction}<|im_end|>\n")
    ids, _ = tokenizer([text], 512)
    ids = np.asarray(ids)[0]
    ids = ids[ids != 0] if (ids == 0).any() else ids
    text_emb = lm_params["embed_tokens"][jnp.asarray(ids)]

    parts = []
    if video_feats is not None:
        parts.append(jnp.asarray(video_feats))
    if image_feats is not None:
        parts.append(jnp.asarray(image_feats))
    parts.append(text_emb)
    ref_start = ref_end = None
    if ref_feats is not None:
        ref_start = sum(p.shape[0] for p in parts)
        parts.append(jnp.asarray(ref_feats))
        ref_end = ref_start + ref_feats.shape[0]
    q_start = sum(p.shape[0] for p in parts)
    parts.append(jnp.asarray(queries))
    embeds = jnp.concatenate(parts, axis=0)[None]
    mask = jnp.ones((1, embeds.shape[1]), jnp.int32)
    hidden = qwen_lm_forward(lm_params, lm_cfg, None, mask,
                             input_embeds=embeds)
    ctx = _connector(kiwi_params["connector"], hidden[:, q_start:])
    if ref_feats is not None:
        ref_ctx = _connector(kiwi_params["ref_connector"],
                             hidden[:, ref_start:ref_end])
        ctx = jnp.concatenate([ref_ctx, ctx], axis=1)
    return ctx.astype(jnp.float32)


def load_kiwi_mllm_params(sd: Dict[str, np.ndarray],
                          cfg: KiwiMLLMConfig = KiwiMLLMConfig()):
    """Consume the MLLMEncoder keys ({image,video,ref}_queries,
    connector.{0,2}, ref_connector.{0,2})."""
    sd = dict(sd)

    def conn(prefix):
        return {"fc1": {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.0.weight"), np.float32).T),
                    "b": jnp.asarray(np.asarray(
                        sd.pop(f"{prefix}.0.bias"), np.float32))},
                "fc2": {"w": jnp.asarray(np.asarray(
                    sd.pop(f"{prefix}.2.weight"), np.float32).T),
                    "b": jnp.asarray(np.asarray(
                        sd.pop(f"{prefix}.2.bias"), np.float32))}}

    p = {"image_queries": jnp.asarray(np.asarray(
            sd.pop("image_queries"), np.float32)),
         "video_queries": jnp.asarray(np.asarray(
            sd.pop("video_queries"), np.float32)),
         "connector": conn("connector")}
    if "ref_queries" in sd:
        p["ref_queries"] = jnp.asarray(np.asarray(
            sd.pop("ref_queries"), np.float32))
        p["ref_connector"] = conn("ref_connector")
    return p, sorted(k for k in sd if not k.startswith("qwen"))


def init_kiwi_embedder(key, in_dim: int = 48, dim: int = 3072
                       ) -> Dict[str, Any]:
    cin = in_dim * 1 * 2 * 2
    lim = (cin + dim) ** -0.5
    return {"w": jax.random.uniform(key, (cin, dim), jnp.float32,
                                    -lim, lim),
            "b": jnp.zeros((dim,), jnp.float32)}


def load_kiwi_embedder(sd: Dict[str, np.ndarray]):
    """KiwiSourceEmbedder / KiwiRefEmbedder Conv3d(48, 3072, (1,2,2))
    (embedders.py:15-25) -> dense."""
    w = np.asarray(sd["patch_embedding.weight"], np.float32)
    return {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
            "b": jnp.asarray(np.asarray(sd["patch_embedding.bias"],
                                        np.float32))}


def embed_kiwi_condition(embedder, latents, patch_size=(1, 2, 2)
                         ) -> jnp.ndarray:
    """[1, 48, T, H, W] latents -> token grid [1, T', H', W', dim]."""
    from .dit import patchify
    b, c, t, h, w = latents.shape
    pt, ph, pw = patch_size
    tok = patchify(jnp.asarray(latents, jnp.float32), patch_size)
    tok = tok @ embedder["w"] + embedder["b"]
    return tok.reshape(b, t // pt, h // ph, w // pw, -1)
