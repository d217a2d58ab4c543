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
        steps = 4 if base_model_type == "flux_schnell" else 25
        return {"prompt": "", "resolution": "1280x720",
                "num_inference_steps": steps, "seed": -1,
                "embedded_guidance_scale": 3.5, "batch_size": 1}

    @staticmethod
    def dit_config(base_model_type: str, dtype=jnp.bfloat16) -> FluxConfig:
        arch = _ARCH[base_model_type]
        return FluxConfig(guidance_embed=arch["guidance_embed"],
                          compute_dtype=dtype)

    @staticmethod
    def query_model_files(base_model_type, model_def):
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "vae", "urls": [
                    "https://huggingface.co/DeepBeepMeep/Flux/resolve/main/"
                    "flux_vae.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type: str, model_def: Dict[str, Any],
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> FluxPipeline:
        from ..io.safetensors_reader import load_safetensors
        from ..io.flux_checkpoint import (
            normalize_flux_sd, load_flux_params, load_flux_vae_params)
        dit_cfg = cls.dit_config(base_model_type, dtype)
        vae_cfg = FluxVAEConfig()
        if init_random:
            dit_params = init_flux(jax.random.key(seed), dit_cfg, dtype)
            vae_params = init_flux_vae(jax.random.key(seed + 1), vae_cfg)
        else:
            sd = normalize_flux_sd(load_safetensors(checkpoints["transformer"]))
            dit_params, left = load_flux_params(sd, dit_cfg, dtype)
            if left:
                raise ValueError(f"unconsumed flux keys: {left[:8]}")
            vae_params = None
            if checkpoints.get("vae"):
                vae_sd = load_safetensors(checkpoints["vae"])
                vae_params, _ = load_flux_vae_params(vae_sd, vae_cfg)
        return FluxPipeline(dit_params, dit_cfg, vae_params, vae_cfg,
                            attn_backend=attn_backend)
