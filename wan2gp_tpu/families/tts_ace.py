"""ACE-Step music-generation family handler (reference
models/TTS/ace_step_handler.py).  Output modality: audio (44.1 kHz stereo
WAV via the TPU DCAE + ADaMoS vocoder path)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.ace_dit import ACEStepConfig, init_ace_dit
from ..models.tts.ace_pipeline import ACEStepPipeline, ACESamplingConfig


class ACEStepFamilyHandler:
    family = "tts_ace"

    @staticmethod
    def query_supported_types() -> List[str]:
        return ["ace_step", "ace_step_turbo"]

    @staticmethod
    def query_family_infos():
        return {"tts": (20, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        turbo = base_model_type.endswith("turbo")
        return {"prompt": "", "lyrics": "",
                "duration_seconds": 60,
                "num_inference_steps": 27 if turbo else 60,
                "guidance_scale": 7.0 if turbo else 15.0,
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = ("https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
                "ace_step/")
        return [
            {"role": "transformer", "urls": model_def.get("URLs", [])},
            {"role": "dcae",
             "urls": [base + "ace_step_v1_music_dcae_f8c8_bf16.safetensors"]},
            {"role": "vocoder",
             "urls": [base + "ace_step_v1_music_vocoder_bf16.safetensors"]},
            {"role": "text_encoder",
             "urls": [base + "umt5-base_bf16.safetensors"]},
        ]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None, seed: int = 0):
        cfg = ACEStepConfig(compute_dtype=dtype)
        text_fn = None
        dcae_params = dcae_cfg = voc_params = voc_cfg = None
        if init_random:
            params = init_ace_dit(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.ace_checkpoint import load_ace_dit_params
            params, left = load_ace_dit_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed ACE keys: {left[:8]}")
            if checkpoints.get("dcae"):
                from ..models.tts.ace_audio import MusicDCAEConfig
                from ..io.ace_checkpoint import load_music_dcae_params
                dcae_cfg = MusicDCAEConfig()
                dcae_params = load_music_dcae_params(
                    load_weights(checkpoints["dcae"]), dcae_cfg)
            if checkpoints.get("vocoder"):
                from ..models.tts.ace_audio import (ADaMoSConfig,
                                                    load_adamos_params)
                voc_cfg = ADaMoSConfig()
                voc_params, _ = load_adamos_params(
                    load_weights(checkpoints["vocoder"]), voc_cfg)
            if checkpoints.get("text_encoder"):
                text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                                 dtype)
        return ACEStepPipeline(params, cfg, text_fn=text_fn,
                               dcae_params=dcae_params, dcae_cfg=dcae_cfg,
                               vocoder_params=voc_params,
                               vocoder_cfg=voc_cfg,
                               attn_backend=attn_backend)

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype):
        """UMT5-base genre-tag encoder (pipeline_ace_step.py:193)."""
        from ..io.safetensors_reader import load_weights
        from ..models.wan.t5 import T5Config, t5_encode
        from ..io.wan_checkpoint import load_t5_params
        cfg = T5Config(dim=768, dim_attn=768, dim_ffn=2048, num_heads=12,
                       num_layers=12)
        params, _ = load_t5_params(
            load_weights(checkpoints["text_encoder"]), cfg, dtype)

        def encode(prompts, max_len=256):
            if tokenizer is not None:
                ids, mask = tokenizer(prompts, max_len)
            else:
                raw = [(p.encode()[:max_len] or b"\x00") for p in prompts]
                n = max(len(r) for r in raw)
                ids = np.zeros((len(raw), n), np.int32)
                mask = np.zeros((len(raw), n), np.int32)
                for i, r in enumerate(raw):
                    ids[i, :len(r)] = np.frombuffer(r, np.uint8)
                    mask[i, :len(r)] = 1
            h = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
            return h.astype(jnp.float32), jnp.asarray(mask)
        return encode

    @staticmethod
    def generate_audio(pipe: ACEStepPipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        sampling = ACESamplingConfig(
            steps=int(merged.get("num_inference_steps", 60)),
            guide_scale=float(merged.get("guidance_scale", 15.0)),
            cfg_type=str(merged.get("cfg_type", "apg")))
        out = pipe.generate(
            prompt=merged.get("prompt", ""),
            lyrics=merged.get("lyrics", "") or merged.get("prompt2", ""),
            duration=float(merged.get("duration_seconds", 60)),
            sampling=sampling, seed=seed)
        if "audio" not in out:
            # no DCAE/vocoder attached (synthetic runs): emit a latent
            # preview waveform so the output path stays exercisable
            lat = np.asarray(out["latents"], np.float32)[0]
            wave = lat.mean(axis=(0, 1))
            wave = wave / (np.abs(wave).max() + 1e-6)
            out["audio"] = np.repeat(wave, 4096)
            out["sample_rate"] = 44100
        return out
