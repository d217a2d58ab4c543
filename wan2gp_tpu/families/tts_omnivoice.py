"""OmniVoice TTS family handler (reference
models/TTS/omnivoice_handler.py + pipeline.py): text (+optional voice
clone reference / style instruction) -> MaskGIT-decoded RVQ codes on a
Qwen3 backbone -> Higgs codec decode -> 24 kHz speech."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.omnivoice import (OmniVoiceConfig, OmniVoiceGenConfig,
                                    init_omnivoice, omnivoice_generate,
                                    load_omnivoice_params)
from ..models.tts.higgs_codec import (HiggsCodecConfig,
                                      init_higgs_codec, higgs_decode,
                                      load_higgs_codec_params)

_TYPES = ["omnivoice"]

# Qwen3 backbone of the released OmniVoice (1.7B-class geometry)
OMNIVOICE_LM = dict(vocab_size=152064, dim=2048, n_layers=28,
                    n_heads=16, n_kv_heads=8, head_dim=128,
                    ffn_dim=6144)


class OmniVoicePipeline:
    def __init__(self, params, lm_cfg, cfg: OmniVoiceConfig,
                 codec=None, codec_cfg: Optional[HiggsCodecConfig] = None,
                 tokenizer=None):
        self.params = params
        self.lm_cfg = lm_cfg
        self.cfg = cfg
        self.codec = codec
        self.codec_cfg = codec_cfg or HiggsCodecConfig()
        self.tokenizer = tokenizer or _ByteTokenizer()

    def generate(self, text: str, language: Optional[str] = None,
                 instruct: Optional[str] = None,
                 ref_text: Optional[str] = None, ref_audio_tokens=None,
                 duration: Optional[float] = None,
                 speed: Optional[float] = None, num_step: int = 32,
                 guidance_scale: float = 2.0, seed: int = 0,
                 num_target_tokens: Optional[int] = None
                 ) -> Dict[str, Any]:
        gen = OmniVoiceGenConfig(num_step=num_step,
                                 guidance_scale=guidance_scale)
        codes = omnivoice_generate(
            self.params, self.lm_cfg, self.cfg, self.tokenizer, text,
            gen=gen, ref_text=ref_text,
            ref_audio_tokens=ref_audio_tokens, lang=language,
            instruct=instruct, duration=duration, speed=speed,
            seed=seed, num_target_tokens=num_target_tokens)
        out = {"codes": codes}
        if self.codec is not None:
            wave = higgs_decode(self.codec, self.codec_cfg,
                                codes[:self.codec_cfg.num_quantizers])
            out["audio"] = np.asarray(wave)[:, None]
            out["sample_rate"] = self.codec_cfg.sample_rate
        return out


class _ByteTokenizer:
    """Stand-in tokenizer (bytes -> ids) for tokenizer-less smoke runs."""

    def __call__(self, texts, max_len):
        rows = [list(t.encode()[:max_len]) or [1] for t in texts]
        n = max(len(r) for r in rows)
        ids = np.zeros((len(rows), n), np.int64)
        mask = np.zeros((len(rows), n), np.int64)
        for i, r in enumerate(rows):
            ids[i, :len(r)] = np.asarray(r) % 255 + 1
            mask[i, :len(r)] = 1
        return ids, mask


class OmniVoiceFamilyHandler:
    family = "tts_omnivoice"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"speech": (23, "Speech Generation")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "speech",
                "no_negative_prompt": True}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "alt_prompt": "",
                "num_inference_steps": 32, "guidance_scale": 2.0,
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get(
                    "URLs", [base + "omnivoice_bf16.safetensors"])},
                {"role": "codec", "urls": [
                    base + "higgs_audio_v2_tokenizer.safetensors"]},
                {"role": "tokenizer", "urls": [
                    base + "omnivoice/tokenizer.json"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> OmniVoicePipeline:
        from ..models.qwen.text_encoder import QwenLMConfig
        cfg = OmniVoiceConfig()
        lm_cfg = QwenLMConfig(**OMNIVOICE_LM, compute_dtype=dtype)
        codec = None
        if init_random:
            from ..models.qwen.text_encoder import init_qwen_lm
            lm = init_qwen_lm(jax.random.key(seed), lm_cfg, dtype)
            params = init_omnivoice(jax.random.key(seed + 1), lm,
                                    lm_cfg, cfg)
            codec = init_higgs_codec(jax.random.key(seed + 2))
        else:
            from ..io.safetensors_reader import load_weights
            params, left = load_omnivoice_params(
                load_weights(checkpoints["transformer"]), lm_cfg, dtype)
            if left:
                raise ValueError(
                    f"unconsumed omnivoice keys: {left[:8]}")
            if checkpoints.get("codec"):
                codec, _ = load_higgs_codec_params(
                    load_weights(checkpoints["codec"]))
            if tokenizer is None and checkpoints.get("tokenizer"):
                from ..utils.tokenizer import load_tokenizer
                tokenizer = load_tokenizer(checkpoints["tokenizer"])
        return OmniVoicePipeline(params, lm_cfg, cfg, codec=codec,
                                 tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: OmniVoicePipeline,
                       settings: Dict[str, Any], seed: int = 0):
        return pipe.generate(
            text=settings.get("prompt", ""),
            language=settings.get("language") or None,
            instruct=settings.get("alt_prompt") or None,
            duration=settings.get("duration_seconds"),
            num_step=int(settings.get("num_inference_steps", 32)),
            guidance_scale=float(settings.get("guidance_scale", 2.0)),
            seed=seed)
