"""Qwen3-TTS family handler (reference models/TTS/qwen3_handler.py):
text -> 12 Hz codec tokens (talker + MTP code predictor) -> 24 kHz
waveform (tokenizer v2 codec decoder)."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.qwen3_tts import (TalkerConfig, CodePredictorConfig,
                                    CodecDecoderConfig, init_talker,
                                    init_codec_decoder, talker_generate,
                                    codec_decode)

_TYPES = ["qwen3_tts_base", "qwen3_tts_customvoice",
          "qwen3_tts_voicedesign"]


class Qwen3TTSPipeline:
    def __init__(self, talker_params, cfg, pcfg, codec_params, codec_cfg,
                 tokenizer=None):
        self.talker_params = talker_params
        self.cfg = cfg
        self.pcfg = pcfg
        self.codec_params = codec_params
        self.codec_cfg = codec_cfg
        self.tokenizer = tokenizer

    def _tokenize(self, text: str, max_len: int = 256):
        if self.tokenizer is not None:
            ids, _ = self.tokenizer([text], max_len)
            return np.asarray(ids, np.int32)
        raw = text.encode()[:max_len] or b"\x00"
        return (np.frombuffer(raw, np.uint8).astype(np.int32)
                % self.cfg.text_vocab_size)[None]

    def generate(self, text: str, max_frames: int = 96,
                 temperature: float = 0.0, seed: int = 0):
        ids = jnp.asarray(self._tokenize(text))
        codes, valid = talker_generate(
            self.talker_params, self.cfg, self.pcfg, ids,
            max_frames=max_frames, temperature=temperature,
            key=jax.random.key(seed) if temperature > 0 else None)
        out = {"codes": np.asarray(codes), "valid": np.asarray(valid)}
        if self.codec_params is not None:
            nq = self.codec_cfg.num_quantizers
            cb = self.codec_cfg.codebook_size
            dec_codes = jnp.clip(codes[..., :nq], 0, cb - 1)
            wav = codec_decode(self.codec_params, self.codec_cfg,
                               dec_codes)
            # trim to valid frames
            n_valid = int(np.asarray(valid).sum(axis=1).max())
            per_frame = wav.shape[1] // max(codes.shape[1], 1)
            out["audio"] = np.asarray(wav)[0][:n_valid * per_frame]
            out["sample_rate"] = self.codec_cfg.sample_rate
        return out


class Qwen3TTSFamilyHandler:
    family = "tts_qwen3"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (20, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts"}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "temperature": 0.9, "seed": -1,
                "duration_seconds": 8}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [])},
                {"role": "codec", "urls": [
                    base + "qwen3_tts_tokenizer_12hz/"
                    "qwen3_tts_tokenizer_12hz.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> Qwen3TTSPipeline:
        cfg = TalkerConfig()
        pcfg = CodePredictorConfig()
        ccfg = CodecDecoderConfig()
        if init_random:
            params = init_talker(jax.random.key(seed), cfg, pcfg)
            codec = init_codec_decoder(jax.random.key(seed + 1), ccfg)
        else:
            from ..io.safetensors_reader import load_weights
            from ..io.qwen3_tts_checkpoint import (load_talker_params,
                                                   load_codec_decoder_params)
            params, left = load_talker_params(
                load_weights(checkpoints["transformer"]), cfg, pcfg, dtype)
            if left:
                raise ValueError(f"unconsumed talker keys: {left[:8]}")
            codec = None
            if checkpoints.get("codec"):
                codec, _ = load_codec_decoder_params(
                    load_weights(checkpoints["codec"]), ccfg, dtype)
        return Qwen3TTSPipeline(params, cfg, pcfg, codec, ccfg,
                                tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: Qwen3TTSPipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        # 12.5 codec frames per second (12 Hz family naming)
        frames = max(4, int(float(merged.get("duration_seconds", 8))
                            * 12.5))
        out = pipe.generate(merged.get("prompt", ""),
                            max_frames=frames,
                            temperature=float(merged.get("temperature",
                                                         0.0)),
                            seed=seed)
        if "audio" not in out:
            out["audio"] = (out["codes"][0, :, 0].astype(np.float32)
                            / pipe.cfg.vocab_size)
            out["sample_rate"] = 24000
        return out
