"""Z-Image family handler (z_image turbo / z_image_base).

Mirrors /root/reference/models/z_image/z_image_handler.py: z_image (turbo)
= 8-step unified sampler, guidance 0; z_image_base = 30-step flow-euler
with CFG 4; z_image_control* add the ControlNet-style hint branch
(z_image_transformer2d.py:561-594 — v1: 16-ch control latent; v2:
33-ch control+mask+inpaint).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp

from ..models.zimage.dit import ZImageConfig, init_zimage
from ..models.zimage.pipeline import ZImagePipeline, ZImageSamplingConfig

_TYPES = ["z_image", "z_image_base", "z_image_control",
          "z_image_control2", "z_image_control2_1"]


class ZImageFamilyHandler:
    family = "z_image"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"z_image": (1120, "Z-Image")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": True, "group": "z_image",
                "control_class": "control" in base_model_type}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        # z_image_handler.py:160-182 update_default_settings
        base = base_model_type == "z_image_base"
        return {"prompt": "", "resolution": "1024x1024",
                "num_inference_steps": 30 if base else 8,
                "guidance_scale": 4 if base else 0,
                "sample_solver": "default" if base else "unified",
                "seed": -1, "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/Z-Image/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "vae", "urls": [
                    base + "ZImageTurbo_VAE_bf16.safetensors"]},
                {"role": "text_encoder", "urls": [
                    base + "Qwen3-4B_bf16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        if "control" in base_model_type:
            # v2/v2.1 share the compute graph (reference
            # z_image_handler.py:70 models_eqv_map maps control2_1 ->
            # control2); v2.1 ships use_separate_control_refiner=true,
            # i.e. the dedicated control_noise_refiner stack our
            # implementation always uses (dit.py control path).
            cfg = ZImageConfig(
                compute_dtype=dtype, control=True,
                control_in_dim=16 if base_model_type == "z_image_control"
                else 33)
        else:
            cfg = ZImageConfig(compute_dtype=dtype)
        text_fn = vae_fn = None
        if init_random:
            params = init_zimage(jax.random.key(seed), cfg, dtype)
            text_fn = cls._random_text_encoder(cfg, seed)
            from ..models.flux.vae import FluxVAEConfig, init_flux_vae, \
                flux_vae_decode
            vcfg = FluxVAEConfig()
            vparams = init_flux_vae(jax.random.key(seed + 7), vcfg)

            def vae_fn(z):
                img = flux_vae_decode(vparams, vcfg, z.transpose(0, 2, 3, 1))
                return jnp.clip(img[0], -1.0, 1.0)
        else:
            from ..io.safetensors_reader import load_weights as load_safetensors
            from ..io.zimage_checkpoint import load_zimage_params
            params, left = load_zimage_params(
                load_safetensors(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed z_image keys: {left[:8]}")
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
            if checkpoints.get("vae"):
                vae_fn = cls._load_vae(checkpoints)
        return ZImagePipeline(params, cfg, vae_decode_fn=vae_fn,
                              text_encode_fn=text_fn,
                              attn_backend=attn_backend)

    @staticmethod
    def _load_vae(checkpoints):
        """Z-Image ships a diffusers-format AutoencoderKL (16ch);
        normalize_diffusers_vae_sd maps it onto the flux VAE loader."""
        from ..io.safetensors_reader import load_weights
        from ..io.flux_checkpoint import (normalize_diffusers_vae_sd,
                                          load_flux_vae_params)
        from ..models.flux.vae import FluxVAEConfig, flux_vae_decode
        vcfg = FluxVAEConfig()
        sd = normalize_diffusers_vae_sd(load_weights(checkpoints["vae"]))
        params, _ = load_flux_vae_params(sd, vcfg)

        def decode(z):
            img = flux_vae_decode(params, vcfg, z.transpose(0, 2, 3, 1))
            return jnp.clip(img[0], -1.0, 1.0)
        return decode

    @staticmethod
    def generate_image(pipe, merged: Dict[str, Any], width: int,
                       height: int, seed: int):
        solver = str(merged.get("sample_solver", "") or "unified")
        sampling = ZImageSamplingConfig(
            steps=int(merged.get("num_inference_steps", 8)),
            guidance=float(merged.get("guidance_scale", 0)),
            solver=solver)
        return pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            width=width, height=height, sampling=sampling, seed=seed,
            context=merged.get("_context"),
            context_neg=merged.get("_context_neg"))

    @classmethod
    def _load_text_encoder(cls, checkpoints, tokenizer, dtype):
        """Qwen3-4B chat-template encoder, hidden_states[-2] (the last
        pre-final-norm layer), masked tokens dropped -> variable-length
        caption feats (pipeline_z_image.py:299-327)."""
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..models.qwen.text_encoder import (
            QwenLMConfig, load_qwen_lm_params, qwen_lm_forward, QWEN3_4B)
        from ..utils.tokenizer import load_tokenizer
        lm_cfg = QwenLMConfig(**QWEN3_4B, compute_dtype=dtype)
        lm_params, _ = load_qwen_lm_params(
            load_safetensors(checkpoints["text_encoder"]), lm_cfg, dtype)
        tok = tokenizer or load_tokenizer(checkpoints.get("tokenizer"))
        template = ("<|im_start|>user\n{}<|im_end|>\n"
                    "<|im_start|>assistant\n<think>\n\n</think>\n\n")

        def enc(prompts):
            ids, mask = tok([template.format(p) for p in prompts], 512)
            ids, mask = jnp.asarray(ids), jnp.asarray(mask)
            _, h = qwen_lm_forward(lm_params, lm_cfg, ids, mask,
                                   collect_layers=[lm_cfg.n_layers - 1])
            # zero out padded rows; the pipeline's pad-token substitution
            # replaces anything past the real length anyway
            return (h[:, :, 0] * (mask[:, :, None] > 0)
                    ).astype(jnp.float32)
        return enc

    @classmethod
    def _random_text_encoder(cls, cfg, seed):
        def enc(prompts, _seed=seed):
            keys = [jax.random.key(hash((p, _seed)) & 0x7FFFFFFF)
                    for p in prompts]
            return jnp.stack([jax.random.normal(
                k, (37, cfg.cap_feat_dim), jnp.float32) for k in keys])
        return enc
