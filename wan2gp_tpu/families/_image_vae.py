"""Shared image-VAE helper for the Qwen/Krea2 image families.

Both reuse the Wan2.1 16-channel VAE applied to single-frame latents
(reference krea2_handler.py:145 qwen_vae.safetensors; Qwen-Image's
AutoencoderKLQwenImage is the same architecture).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.wan.vae import WanVAEConfig, init_wan_vae, vae_decode


def make_image_vae_decode_fn(vae_params, vae_cfg: WanVAEConfig | None = None):
    """Returns fn: latents [B, 16, H, W] -> image [H*8, W*8, 3] in [-1, 1]."""
    cfg = vae_cfg or WanVAEConfig()

    def decode(z):
        video = vae_decode(vae_params, cfg, z[:, :, None])  # [B,3,1,H,W]
        return jnp.clip(video[0, :, 0].transpose(1, 2, 0), -1.0, 1.0)

    return decode


def load_image_vae(checkpoints, init_random: bool, seed: int = 0):
    """Build (decode_fn or None) from a 'vae' checkpoint / random init."""
    cfg = WanVAEConfig()
    if init_random:
        params = init_wan_vae(jax.random.key(seed + 7), cfg)
        return make_image_vae_decode_fn(params, cfg)
    if checkpoints and checkpoints.get("vae"):
        from ..io.safetensors_reader import load_weights as load_safetensors
        from ..io.wan_checkpoint import load_wan_vae_params
        params, _ = load_wan_vae_params(
            load_safetensors(checkpoints["vae"]), cfg)
        return make_image_vae_decode_fn(params, cfg)
    return None
