"""LTX-2 video VAE configurations over the shared causal-VAE machinery.

The LTX-2 video autoencoder (/root/reference/models/ltx2/ltx_core/model/
video_vae/video_vae.py) uses the same block grammar as LTX-Video's
CausalVideoAutoencoder, so it is expressed as LTXVVAEConfig instances over
wan2gp_tpu.models.ltxv.vae: patch 4, latent 128ch, pixel_norm, total
stride (8, 32, 32), non-causal decoder.  Block lists come from
models/ltx2/configs/ltx2_{19b,22b}_config.json (vae.*)."""
from __future__ import annotations

from ..ltxv.vae import (LTXVVAEConfig, init_ltxv_vae, ltxv_vae_encode,
                        ltxv_vae_decode, load_ltxv_vae_params)

# ltx2_19b_config.json vae.encoder_blocks / decoder_blocks
LTX2_19B_VAE = LTXVVAEConfig(
    encoder_blocks=(("res_x", 4), ("compress_space_res", {"multiplier": 2}),
                    ("res_x", 6), ("compress_time_res", {"multiplier": 2}),
                    ("res_x", 6), ("compress_all_res", {"multiplier": 2}),
                    ("res_x", 2), ("compress_all_res", {"multiplier": 2}),
                    ("res_x", 2)),
    decoder_blocks=(("res_x", {"num_layers": 5, "inject_noise": False}),
                    ("compress_all", {"multiplier": 2, "residual": True}),
                    ("res_x", {"num_layers": 5, "inject_noise": False}),
                    ("compress_all", {"multiplier": 2, "residual": True}),
                    ("res_x", {"num_layers": 5, "inject_noise": False}),
                    ("compress_all", {"multiplier": 2, "residual": True}),
                    ("res_x", {"num_layers": 5, "inject_noise": False})),
    decoder_causal=False,
    decoder_spatial_padding="reflect",
    timestep_conditioning=False,
)

# ltx2_22b_config.json vae.* (encoder compress_all_res multiplier 1 on the
# last stage; decoder compress_space/time split, one multiplier-1 stage)
LTX2_22B_VAE = LTXVVAEConfig(
    encoder_blocks=(("res_x", 4), ("compress_space_res", {"multiplier": 2}),
                    ("res_x", 6), ("compress_time_res", {"multiplier": 2}),
                    ("res_x", 4), ("compress_all_res", {"multiplier": 2}),
                    ("res_x", 2), ("compress_all_res", {"multiplier": 1}),
                    ("res_x", 2)),
    decoder_blocks=(("res_x", 4), ("compress_space", {"multiplier": 2}),
                    ("res_x", 6), ("compress_time", {"multiplier": 2}),
                    ("res_x", 4), ("compress_all", {"multiplier": 1}),
                    ("res_x", 2), ("compress_all", {"multiplier": 2}),
                    ("res_x", 2)),
    decoder_causal=False,
    decoder_spatial_padding="reflect",
    timestep_conditioning=False,
)

init_ltx2_vae = init_ltxv_vae
ltx2_vae_encode = ltxv_vae_encode
ltx2_vae_decode = ltxv_vae_decode
load_ltx2_vae_params = load_ltxv_vae_params
