"""Flux family handler (flux-schnell / flux-dev)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.flux.dit import FluxConfig, init_flux
from ..models.flux.vae import FluxVAEConfig, init_flux_vae
from ..models.flux.pipeline import FluxPipeline

_ARCH: Dict[str, Dict[str, Any]] = {
    # reference models/flux/util.py:474-504
    "flux_schnell": dict(guidance_embed=False, shift=False),
    "flux_dev": dict(guidance_embed=True, shift=True),
    "flux_dev_kontext": dict(guidance_embed=True, shift=True),
    # FLUX.2 (util.py:298-405); Klein uses a Qwen3 text encoder whose 3
    # stacked hidden layers [9, 18, 27] feed context_in
    # (modules/text_encoder_qwen3.py OUTPUT_LAYERS)
    "flux2_klein_4b": dict(flux2="FLUX2_KLEIN_4B"),
    "flux2_klein_9b": dict(flux2="FLUX2_KLEIN_9B"),
    "flux2_dev": dict(flux2="FLUX2_DEV"),
    # pi-FLUX.2: flux2_dev + GM velocity heads, 4-step analytic
    # policy-rollout sampler (flux_handler.py:220-221, piflow=True)
    "pi_flux2": dict(flux2="FLUX2_DEV", piflow=True),
    # Chroma 8.9B: schnell geometry, modulation distilled into a 5-layer
    # guidance MLP, T5-only text (flux_handler.py:75-88, model.py:129)
    "flux_chroma": dict(chroma=True, shift=False),
    # Chroma1-Radiance: pixel-space NeRF head, no VAE
    # (models/flux/radiance.py; util.py:537-560)
    "flux_chroma_radiance": dict(chroma=True, radiance=True,
                                 shift=False),
}


class FluxFamilyHandler:
    family = "flux"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_ARCH.keys())

    @staticmethod
    def query_family_infos():
        return {"flux": (2, "Flux")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": True,
                "flux-model": base_model_type.replace("_", "-")}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        if base_model_type.startswith("flux2") \
                or base_model_type == "pi_flux2":
            # klein / pi_flux2: 4-step distilled (defaults/flux2_klein_*,
            # defaults/pi_flux2.json)
            dev = base_model_type == "flux2_dev"
            return {"prompt": "", "resolution": "1024x1024",
                    "num_inference_steps": 50 if dev else 4, "seed": -1,
                    "embedded_guidance_scale": 4 if dev
                    or base_model_type == "pi_flux2" else 1,
                    "batch_size": 1}
        steps = 4 if base_model_type == "flux_schnell" else 25
        return {"prompt": "", "resolution": "1280x720",
                "num_inference_steps": steps, "seed": -1,
                "embedded_guidance_scale": 3.5, "batch_size": 1}

    @staticmethod
    def dit_config(base_model_type: str, dtype=jnp.bfloat16) -> FluxConfig:
        arch = _ARCH[base_model_type]
        if "flux2" in arch:
            from ..models.flux import dit as fdit
            return FluxConfig(compute_dtype=dtype,
                              **getattr(fdit, arch["flux2"]))
        if arch.get("radiance"):
            from ..models.flux.dit import CHROMA_RADIANCE
            return FluxConfig(compute_dtype=dtype, **CHROMA_RADIANCE)
        if arch.get("chroma"):
            return FluxConfig(chroma=True, guidance_embed=False,
                              compute_dtype=dtype)
        return FluxConfig(guidance_embed=arch["guidance_embed"],
                          compute_dtype=dtype)

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/Flux/resolve/main/"
        if base_model_type.startswith("flux2") \
                or base_model_type == "pi_flux2":
            b2 = "https://huggingface.co/DeepBeepMeep/Flux2/resolve/main/"
            files = [{"role": "transformer",
                      "urls": model_def.get("URLs", [])},
                     {"role": "vae",
                      "urls": [b2 + "flux2_vae.safetensors"]},
                     {"role": "text_encoder",
                      "urls": [b2 + "qwen3_4b_bf16.safetensors"]}]
            if base_model_type == "pi_flux2":
                files.append({"role": "module", "urls": model_def.get(
                    "modules", [[b2 + "pi_flux2_heads_bf16"
                                 ".safetensors"]])})
            return files
        if base_model_type.startswith("flux_chroma"):
            # T5-only conditioning (flux_handler.py:88)
            return [{"role": "transformer",
                     "urls": model_def.get("URLs", [])},
                    {"role": "vae", "urls": [base + "flux_vae.safetensors"]},
                    {"role": "text_encoder", "urls": [
                        base + "T5_xxl_1.1_enc_bf16.safetensors"]}]
        files = [{"role": "transformer",
                  "urls": model_def.get("URLs", [])},
                 {"role": "vae", "urls": [base + "flux_vae.safetensors"]},
                 {"role": "text_encoder", "urls": [
                     base + "T5_xxl_1.1_enc_bf16.safetensors"]},
                 {"role": "clip", "urls": [
                     base + "clip_vit_large_patch14.safetensors"]}]
        if any("uso" in str(model_def.get(k, "")).lower()
               for k in ("modules", "loras", "name")):
            files += [{"role": "siglip", "urls": [
                base + "siglip-so400m-patch14-384.safetensors"]},
                {"role": "module",
                 "urls": model_def.get("modules", [])}]
        return files

    # T5 v1.1 XXL encoder (HFEmbedder "google/t5-v1_1-xxl",
    # models/flux/modules/conditioner.py): shared rel-pos table, vocab 32128
    T5_CFG_KW = dict(vocab_size=32128, dim=4096, dim_attn=4096,
                     dim_ffn=10240, num_heads=64, num_layers=24,
                     shared_pos=True)

    @staticmethod
    def text_seq_len(base_model_type: str) -> int:
        # schnell: max_length 256; dev: 512 (models/flux/util.py load_t5)
        return 256 if base_model_type == "flux_schnell" else 512

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> FluxPipeline:
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..io.flux_checkpoint import (
            normalize_flux_sd, load_flux_params, load_flux_vae_params)
        dit_cfg = cls.dit_config(base_model_type, dtype)
        vae_cfg = FluxVAEConfig()
        t5_fn = clip_fn = None
        vae_decode_fn = None
        if init_random:
            dit_params = init_flux(jax.random.key(seed), dit_cfg, dtype)
            vae_params = init_flux_vae(jax.random.key(seed + 1), vae_cfg)
            t5_fn, clip_fn = cls._random_text_encoders(dit_cfg, seed)
        else:
            sd = normalize_flux_sd(load_safetensors(checkpoints["transformer"]))
            dit_params, left = load_flux_params(sd, dit_cfg, dtype)
            if left:
                raise ValueError(f"unconsumed flux keys: {left[:8]}")
            vae_params = None
            if dit_cfg.flux2:
                if checkpoints.get("vae"):
                    vae_decode_fn = cls._load_flux2_vae(checkpoints)
                t5_fn = cls._load_qwen3_encoder(checkpoints, tokenizer,
                                                dtype, dit_cfg)
                clip_fn = None
            else:
                if checkpoints.get("vae"):
                    vae_sd = load_safetensors(checkpoints["vae"])
                    vae_params, _ = load_flux_vae_params(vae_sd, vae_cfg)
                t5_fn, clip_fn = cls._load_text_encoders(
                    base_model_type, checkpoints, tokenizer, dtype)
        pipe = FluxPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                            t5_encode_fn=t5_fn, clip_encode_fn=clip_fn,
                            attn_backend=attn_backend,
                            vae_decode_fn=vae_decode_fn)
        uso = any("uso" in str(model_def.get(k, "")).lower()
                  for k in ("modules", "loras", "name", "architecture")) \
            or "uso" in str(model_def.get("model", {})).lower()
        if uso:
            # USO style tower: SigLIP-so400m multi-level features +
            # the 768-token projector (flux_main.py:490-500)
            from ..models.flux.siglip import (
                SiglipVisionConfig, init_siglip, init_uso_projector,
                load_siglip_params, load_uso_projector)
            if model_def.get("tiny") or init_random:
                sig_cfg = SiglipVisionConfig(
                    hidden_size=64, num_layers=4, num_heads=4,
                    mlp_dim=128, image_size=56)
                sig_p = init_siglip(jax.random.key(seed + 11), sig_cfg)
                proj_p = init_uso_projector(
                    jax.random.key(seed + 12),
                    siglip_tokens=sig_cfg.tokens,
                    siglip_dim=sig_cfg.hidden_size,
                    hidden_size=dit_cfg.hidden_size)
            else:
                sig_sd = load_safetensors(checkpoints["siglip"])
                sig_p, sig_cfg = load_siglip_params(sig_sd)
                proj_p = load_uso_projector(
                    load_safetensors(checkpoints["module"]))
            pipe.uso = (sig_p, sig_cfg, proj_p)
        if _ARCH[base_model_type].get("piflow"):
            from ..models.flux.piflow import (init_piflow_heads,
                                              load_piflow_heads)
            if init_random or not (checkpoints
                                   and checkpoints.get("module")):
                pipe.piflow_heads = init_piflow_heads(
                    jax.random.key(seed + 5), dit_cfg)
            else:
                heads, _ = load_piflow_heads(
                    load_safetensors(checkpoints["module"]))
                pipe.piflow_heads = heads
        return pipe

    @staticmethod
    def _load_flux2_vae(checkpoints):
        """FLUX.2 z=32 autoencoder (modules/autoencoder_flux2.py), shared
        with Ideogram 4 (io/ideogram_checkpoint.py)."""
        from ..io.safetensors_reader import load_weights
        from ..io.ideogram_checkpoint import (normalize_flux2_vae_sd,
                                              load_flux2_vae_params)
        from ..models.ideogram4.pipeline import flux2_vae_decode
        sd = normalize_flux2_vae_sd(load_weights(checkpoints["vae"]))
        params, vcfg = load_flux2_vae_params(sd)

        def decode(z):
            return flux2_vae_decode(params, vcfg, z)
        return decode

    @staticmethod
    def _load_qwen3_encoder(checkpoints, tokenizer, dtype, dit_cfg):
        """FLUX.2 text conditioning: Qwen3 hidden states from layers
        [9, 18, 27] stacked and flattened to context_in_dim
        (modules/text_encoder_qwen3.py OUTPUT_LAYERS:14)."""
        from ..io.safetensors_reader import load_weights
        from ..models.qwen.text_encoder import (QwenLMConfig, QWEN3_4B,
                                                load_qwen_lm_params,
                                                qwen_lm_forward)
        from ..utils.tokenizer import load_tokenizer
        dim = dit_cfg.context_in_dim // 3
        kw = dict(QWEN3_4B)
        kw["dim"] = dim           # 2560 (4B) / 4096 (8B-class)
        cfg = QwenLMConfig(**kw, compute_dtype=dtype)
        params, _ = load_qwen_lm_params(
            load_weights(checkpoints["text_encoder"]), cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))

        def encode(prompts, max_len=512):
            ids, mask = tok(prompts, max_len)
            _, stacked = qwen_lm_forward(params, cfg, jnp.asarray(ids),
                                         jnp.asarray(mask),
                                         collect_layers=(9, 18, 27))
            b, l, k, d = stacked.shape
            return stacked.reshape(b, l, k * d).astype(jnp.float32)
        return encode

    @staticmethod
    def generate_image(pipe, merged, width, height, seed):
        from ..models.flux.pipeline import FluxSamplingConfig
        sampling = FluxSamplingConfig(
            steps=int(merged.get("num_inference_steps", 4)),
            guidance=float(merged.get("embedded_guidance_scale", 3.5)),
            shift=pipe.dit_cfg.guidance_embed)
        refs = merged.get("_image_refs") or merged.get("image_refs")
        if refs:
            import numpy as np
            from ..utils.media import to_uint8
            imgs = []
            for r in refs:
                arr = np.asarray(r)
                if arr.dtype == np.uint8:
                    arr = arr.astype(np.float32) / 127.5 - 1.0
                imgs.append(arr)
            if getattr(pipe, "uso", None) is not None:
                # USO style transfer (flux_main.py:490-500): first ref
                # is the subject when more than one is given; the rest
                # (or the single ref) are SigLIP style images
                sig_p, sig_cfg, proj_p = pipe.uso
                styles = imgs[1:] if len(imgs) > 1 else imgs
                subject = imgs[:1] if len(imgs) > 1 else []
                return pipe.generate_uso(
                    prompt=merged.get("prompt", ""),
                    style_images=styles, siglip_params=sig_p,
                    siglip_cfg=sig_cfg, uso_proj_params=proj_p,
                    cond_images=subject, width=width, height=height,
                    sampling=sampling, seed=seed,
                    context=merged.get("_context"),
                    vec_y=merged.get("_vec_y"))
            return pipe.generate_kontext(
                prompt=merged.get("prompt", ""), cond_images=imgs,
                width=width, height=height, sampling=sampling, seed=seed,
                context=merged.get("_context"),
                vec_y=merged.get("_vec_y"))
        return pipe.generate(prompt=merged.get("prompt", ""),
                             width=width, height=height,
                             sampling=sampling, seed=seed,
                             context=merged.get("_context"),
                             vec_y=merged.get("_vec_y"))

    @classmethod
    def _load_text_encoders(cls, base_model_type, checkpoints, tokenizer,
                            dtype, t5_cfg_kw=None, clip_cfg=None):
        """Build prompt->embedding closures from T5-XXL + CLIP-L checkpoints
        (conditioner.py HFEmbedder pair: t5 last_hidden_state, clip
        pooler_output)."""
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..io.wan_checkpoint import load_hf_t5_params
        from ..io.flux_checkpoint import load_clip_text_params
        from ..models.wan.t5 import T5Config, t5_encode
        from ..models.flux.clip import ClipTextConfig, clip_text_encode
        from ..utils.tokenizer import load_tokenizer
        t5_fn = clip_fn = None
        seq_len = cls.text_seq_len(base_model_type)
        if checkpoints.get("text_encoder"):
            t5_cfg = T5Config(**(t5_cfg_kw or cls.T5_CFG_KW),
                              compute_dtype=dtype)
            t5_params, _ = load_hf_t5_params(
                load_safetensors(checkpoints["text_encoder"]), t5_cfg, dtype)
            tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))

            def t5_fn(prompts):
                ids, mask = tok(prompts, seq_len)
                # flux feeds unmasked T5 states (conditioner.py:32
                # attention_mask unused downstream); padded ids are fine
                return t5_encode(t5_params, t5_cfg, jnp.asarray(ids),
                                 jnp.asarray(mask)).astype(jnp.float32)
        if checkpoints.get("clip"):
            clip_cfg = clip_cfg or ClipTextConfig()
            clip_params, _ = load_clip_text_params(
                load_safetensors(checkpoints["clip"]), clip_cfg)
            ctok = load_tokenizer(checkpoints.get("tokenizer_clip"))

            def clip_fn(prompts):
                ids, _ = ctok(prompts, clip_cfg.max_len)
                _, pooled = clip_text_encode(clip_params, clip_cfg,
                                             jnp.asarray(ids))
                return pooled.astype(jnp.float32)
        return t5_fn, clip_fn

    @classmethod
    def _random_text_encoders(cls, dit_cfg, seed):
        """Deterministic synthetic embeddings for --random-weights runs:
        exercise the full prompt->embedding->DiT path without the 4096-dim
        T5 checkpoint."""
        def t5_fn(prompts, _seed=seed):
            keys = [jax.random.key(hash((p, _seed)) & 0x7FFFFFFF)
                    for p in prompts]
            return jnp.stack([jax.random.normal(
                k, (128, dit_cfg.context_in_dim), jnp.float32)
                for k in keys])

        def clip_fn(prompts, _seed=seed):
            keys = [jax.random.key(hash((p, _seed, 1)) & 0x7FFFFFFF)
                    for p in prompts]
            return jnp.stack([jax.random.normal(
                k, (dit_cfg.vec_in_dim,), jnp.float32) for k in keys])
        return t5_fn, clip_fn
