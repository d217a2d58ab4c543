"""MiniMax H3 family handler (joint audio-video generation).

Mirrors /root/reference/models/minimax_h3/minimax_h3_handler.py for the
base T2VA path; the audio/video VAEs and Ref2VA conditioning land in later
rounds (pipeline returns latents until then).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.minimax.dit import MiniMaxH3Config, init_minimax_h3
from ..models.minimax.pipeline import (MiniMaxH3Pipeline,
                                       MiniMaxSamplingConfig)


class MiniMaxFamilyHandler:
    family = "minimax"

    @staticmethod
    def query_supported_types() -> List[str]:
        # ref2va: same packed T2VA arch with reference-image latents
        # appended (models/minimax/dit.py ref2va packing)
        return ["minimax_h3", "minimax_h3_ref2va"]

    @staticmethod
    def query_family_infos():
        return {"minimax": (1300, "MiniMax H3")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"image_outputs": False, "group": "minimax",
                "audio_outputs": True}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "512x512", "video_length": 49,
                "num_inference_steps": 30, "flow_shift": 12.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/MiniMaxH3/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "vae", "urls": [base + "minimax_h3_video_vae.safetensors"]},
                {"role": "audio_vae",
                 "urls": [base + "minimax_h3_audio_vae.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = MiniMaxH3Config(compute_dtype=dtype)
        text_fn = None
        if init_random:
            params = init_minimax_h3(jax.random.key(seed), cfg, dtype)

            def text_fn(prompts, _seed=seed):
                k = jax.random.key(hash((prompts[0], _seed)) & 0x7FFFFFFF)
                return jax.random.normal(k, (1, 48, cfg.text_dim),
                                         jnp.float32)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.minimax_checkpoint import load_minimax_h3_params
            params, left = load_minimax_h3_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed minimax keys: {left[:8]}")
        vae_fn = audio_fn = None
        if not init_random and checkpoints and checkpoints.get("vae"):
            vae_fn = cls._load_video_vae(checkpoints, attn_backend)
        if not init_random and checkpoints and checkpoints.get("audio_vae"):
            audio_fn = cls._load_audio_vae(checkpoints)
        return MiniMaxH3Pipeline(params, cfg, text_encode_fn=text_fn,
                                 video_vae_decode_fn=vae_fn,
                                 audio_vae_decode_fn=audio_fn,
                                 attn_backend=attn_backend)

    @staticmethod
    def _load_video_vae(checkpoints, attn_backend):
        """MiniMax video VAE (models/minimax/video_vae.py: CNN encoder +
        ViT decoder with chunked temporal geometry)."""
        from ..io.safetensors_reader import load_weights
        from ..models.minimax.video_vae import (
            MiniMaxVideoVAEConfig, load_minimax_video_vae_params,
            minimax_vae_decode)
        cfg = MiniMaxVideoVAEConfig()
        params, _ = load_minimax_video_vae_params(
            load_weights(checkpoints["vae"]), cfg)

        def decode(z):
            return jnp.clip(minimax_vae_decode(params, cfg, z,
                                               attn_backend=attn_backend),
                            -1.0, 1.0)
        return decode

    @staticmethod
    def _load_audio_vae(checkpoints):
        """MiniMax audio VAE (models/minimax/audio_vae.py BigVGAN decoder).
        Stereo latents [B, 32, 2, T] decode as two mono passes ->
        waveform [B, 2, T*800] at 32 kHz."""
        from ..io.safetensors_reader import load_weights
        from ..models.minimax.audio_vae import (
            MiniMaxAudioVAEConfig, load_minimax_audio_vae_params,
            audio_decode)
        cfg = MiniMaxAudioVAEConfig()
        params, _ = load_minimax_audio_vae_params(
            load_weights(checkpoints["audio_vae"]), cfg)

        def decode(z):
            if z.ndim == 4:                      # [B, C, 2, T] stereo rows
                waves = [audio_decode(params, cfg, z[:, :, i])
                         for i in range(z.shape[2])]
                return jnp.concatenate(waves, axis=1)
            return audio_decode(params, cfg, z)
        return decode

    @staticmethod
    def generate_video(pipe, merged, width, height, frame_num, seed, **kw):
        """Service entry: returns {"video", "audio", "audio_sample_rate"}
        so the orchestrator muxes the decoded 32 kHz waveform into the
        output (reference minimax_h3 T2VA saves audio+video,
        shared/utils/audio_video.py:613)."""
        from ..models.minimax.pipeline import MiniMaxSamplingConfig
        sampling = MiniMaxSamplingConfig(
            steps=int(merged.get("num_inference_steps", 20)))
        fps = float(merged.get("fps", 24))
        n_frames = frame_num or int(merged.get("video_length", 49))
        # audio latents cover the clip length: 32 kHz / 800-sample hop
        audio_latents = max(1, int(round(n_frames / fps * 32000 / 800)))
        video, audio = pipe.generate(
            prompt=merged.get("prompt", ""), width=width, height=height,
            frame_num=n_frames, audio_latents=audio_latents, fps=fps,
            sampling=sampling, seed=seed,
            context=merged.get("_context"),
            return_latents=pipe.video_vae_decode_fn is None)
        out = {"video": video}
        if pipe.audio_vae_decode_fn is not None and audio is not None:
            out["audio"] = np.asarray(audio)[0]     # [C, T] waveform
            out["audio_sample_rate"] = 32000
        return out
