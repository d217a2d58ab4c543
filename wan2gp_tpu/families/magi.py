"""MAGI-Human family handler (joint audio-video avatar generation).

Mirrors /root/reference/models/magi_human/magi_human_handler.py core:
distilled 8-step joint audio-video DiT, Wan 2.2 48-channel VAE for video
latents.  The T5Gemma text encoder and the SA audio VAE / turbo VAE
decoder are later rounds (text falls back to a seeded stub so the model
path stays exercisable end-to-end with random weights).
"""
from __future__ import annotations

from typing import Any, Dict, List

import numpy as np
import jax
import jax.numpy as jnp

from ..models.magi.dit import MagiConfig, init_magi
from ..models.magi.pipeline import MagiPipeline, MagiSamplingConfig

_TYPES = ["magi_human"]


class MagiFamilyHandler:
    family = "magi"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"magi": (1160, "MAGI Human")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"group": "magi", "audio_outputs": True,
                "image_prompt_types_allowed": "S"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "resolution": "448x256",
                "video_length": 101, "num_inference_steps": 8,
                "guidance_scale": 1.0, "flow_shift": 3.0,
                "seed": -1, "batch_size": 1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/MagiHuman/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "vae", "urls": [base + "wan2.2_vae.safetensors"]},
                {"role": "audio_vae", "urls": [
                    base + "stable_audio_open_vae.safetensors"]},
                {"role": "turbo_vae", "urls": [
                    base + "turbo_vae/TurboV3-Wan22-TinyShallow_7_7"
                    ".safetensors"]},
                {"role": "text_encoder",
                 "urls": [base + "t5gemma_encoder_bf16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def, checkpoints=None,
                   dtype=jnp.bfloat16, attn_backend="auto",
                   init_random=False, tokenizer=None, seed=0):
        cfg = MagiConfig(compute_dtype=dtype)
        vae_dec = vae_enc = None
        if init_random:
            params = init_magi(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.magi_checkpoint import load_magi_params
            params, left = load_magi_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed magi keys: {left[:8]}")
            if checkpoints.get("vae"):
                vae_dec, vae_enc = cls._load_vae(checkpoints)

        text_fn = None
        if checkpoints and checkpoints.get("text_encoder"):
            text_fn = cls._load_text_encoder(checkpoints, tokenizer, dtype)
        if text_fn is None:
            def text_fn(prompts, _seed=seed):
                # no text-encoder checkpoint: deterministic stub keeps the
                # joint-modality path runnable (magi_human_model.py:137).
                k = jax.random.key(hash((prompts[0], _seed)) & 0x7FFFFFFF)
                return jax.random.normal(k, (1, 48, cfg.text_in),
                                         jnp.float32)
        pipe = MagiPipeline(params, cfg, text_encode_fn=text_fn,
                            vae_decode_fn=vae_dec, vae_encode_fn=vae_enc,
                            attn_backend=attn_backend)
        if checkpoints and checkpoints.get("audio_vae"):
            # SA audio VAE (magi_human_model.py:234, :440, :467): encode
            # driving audio / decode generated audio latents
            from ..io.safetensors_reader import load_weights
            from ..models.magi.sa_audio import (SAAudioConfig,
                                                load_sa_audio_params,
                                                sa_audio_decode,
                                                sa_audio_encode)
            acfg = SAAudioConfig()
            ap, _ = load_sa_audio_params(
                load_weights(checkpoints["audio_vae"]), acfg)
            pipe.audio_vae_encode_fn = (
                lambda wave: sa_audio_encode(ap, acfg, wave))
            pipe.audio_vae_decode_fn = (
                lambda lat: sa_audio_decode(ap, acfg, lat))
            pipe.audio_sample_rate = acfg.sample_rate
        if checkpoints and checkpoints.get("turbo_vae"):
            # distilled fast decoder replaces the full Wan2.2 VAE decode
            # (magi_human_model.py:235-237, :443 _decode_video)
            from ..io.safetensors_reader import load_weights
            from ..models.magi.turbo_vae import (TurboVAEDConfig,
                                                 load_turbo_vaed_params,
                                                 turbo_vaed_decode)
            tcfg = TurboVAEDConfig()
            tp, _ = load_turbo_vaed_params(
                load_weights(checkpoints["turbo_vae"]), tcfg)

            def turbo_decode(z):
                # pipeline passes [B, F, H, W, C]; decoder wants NCTHW
                zc = jnp.transpose(jnp.asarray(z), (0, 4, 1, 2, 3))
                px = turbo_vaed_decode(tp, tcfg, zc)
                return jnp.clip(jnp.transpose(px, (0, 2, 3, 4, 1)),
                                -1.0, 1.0)
            pipe.vae_decode_fn = turbo_decode
        return pipe

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype):
        """T5Gemma-9B-UL2 encoder (magi_human_model.py:146,160 —
        last_hidden_state of T5GemmaEncoderModel)."""
        from ..io.safetensors_reader import load_weights
        from ..models.magi.t5gemma import (T5GemmaEncConfig,
                                           load_t5gemma_params,
                                           t5gemma_encode)
        tcfg = T5GemmaEncConfig(compute_dtype=dtype)
        tparams, _ = load_t5gemma_params(
            load_weights(checkpoints["text_encoder"]), tcfg, dtype)
        import numpy as _np

        def encode(prompts, max_len=256):
            if tokenizer is not None:
                ids, mask = tokenizer(prompts, max_len)
            else:
                raws = [(p.encode()[:max_len] or b"\x00") for p in prompts]
                n = max(len(r) for r in raws)
                ids = _np.zeros((len(raws), n), _np.int32)
                mask = _np.zeros((len(raws), n), _np.int32)
                for i, r in enumerate(raws):
                    ids[i, :len(r)] = _np.frombuffer(r, _np.uint8)
                    mask[i, :len(r)] = 1
            out = t5gemma_encode(tparams, tcfg, jnp.asarray(ids),
                                 jnp.asarray(mask))
            return out.astype(jnp.float32)
        return encode

    @staticmethod
    def _load_vae(checkpoints):
        """Wan 2.2 VAE (48-channel, stride (4,16,16)) shared with ti2v."""
        from ..io.safetensors_reader import load_weights
        from ..io.wan_checkpoint import load_wan_vae_params
        from ..models.wan.vae2_2 import Wan22VAEConfig
        from ..models.wan import vae2_2 as v22
        vcfg = Wan22VAEConfig()
        params, _ = load_wan_vae_params(load_weights(checkpoints["vae"]),
                                        vcfg)

        def decode(z):
            return jnp.clip(v22.wan22_vae_decode(params, vcfg, z), -1.0, 1.0)

        def encode(pix):
            return v22.wan22_vae_encode(params, vcfg, pix)
        return decode, encode

    @staticmethod
    def generate_video(pipe, merged: Dict[str, Any], width: int,
                       height: int, frame_num: int, seed: int, **kw):
        sampling = MagiSamplingConfig(
            steps=int(merged.get("num_inference_steps", 8)),
            shift=float(merged.get("flow_shift", 3.0)),
            guidance=float(merged.get("guidance_scale", 1.0)),
            audio_guidance=float(merged.get("audio_guidance_scale", 1.0)))
        video, audio = pipe.generate(
            prompt=merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            height=height, width=width,
            frame_num=frame_num or int(merged.get("video_length", 101)),
            image_latent=merged.get("_image_latent"),
            audio_latent=merged.get("_audio_latent"),
            sampling=sampling, seed=seed)
        out = {"video": video}
        if audio is not None and getattr(pipe, "audio_vae_decode_fn",
                                         None) is not None:
            # generated audio latents -> waveform via the SA audio VAE
            # decoder (magi_human_model.py:467 _decode_audio)
            lat = jnp.asarray(audio)
            if lat.ndim == 2:
                lat = lat[None]
            wave = pipe.audio_vae_decode_fn(lat)
            out["audio"] = np.asarray(wave[0])
            out["audio_sample_rate"] = getattr(pipe, "audio_sample_rate",
                                               44100)
        return out
