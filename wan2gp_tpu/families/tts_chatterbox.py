"""Chatterbox TTS family handler (reference
models/TTS/chatterbox_handler.py + chatterbox/mtl_tts.py): text +
reference voice -> T3 speech tokens -> S3Gen flow/HiFT -> 24 kHz wav.
Custom settings: emotion exaggeration (0.25-2, 0.5 neutral) and pace.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.chatterbox import (T3Config, VoiceEncConfig, init_t3,
                                     init_voice_encoder,
                                     voice_encoder_mels,
                                     voice_encoder_embed, t3_generate)
from ..models.tts.s3gen import S3GenConfig, init_s3gen, S3Gen

_TYPES = ["chatterbox", "chatterbox_multilingual"]

# languages supported by the multilingual checkpoint
# (chatterbox_handler.py:11-35)
SUPPORTED_LANGUAGES = {
    "ar", "da", "de", "el", "en", "es", "fi", "fr", "he", "hi", "it",
    "ja", "ko", "ms", "nl", "no", "pl", "pt", "ru", "sv", "sw", "tr",
    "zh"}


class ChatterboxPipeline:
    def __init__(self, t3_params, t3_cfg: T3Config, ve_params,
                 ve_cfg: VoiceEncConfig, s3gen: S3Gen, tokenizer=None):
        self.t3_params = t3_params
        self.t3_cfg = t3_cfg
        self.ve_params = ve_params
        self.ve_cfg = ve_cfg
        self.s3gen = s3gen
        self.tokenizer = tokenizer
        self._conds = None

    def _text_tokens(self, text: str, max_len: int = 256):
        cfg = self.t3_cfg
        if self.tokenizer is not None:
            ids, _ = self.tokenizer([text], max_len)
            ids = np.asarray(ids, np.int32) % cfg.text_vocab_size
            ids = ids[:, np.any(ids != 0, axis=0)]
        else:
            raw = text.encode()[:max_len] or b"\x00"
            ids = (np.frombuffer(raw, np.uint8).astype(np.int32)
                   % cfg.text_vocab_size)[None]
        # mtl_tts.py:266-270: pad with start/stop text tokens
        sot = np.full((ids.shape[0], 1), cfg.start_text_token, np.int32)
        eot = np.full((ids.shape[0], 1), cfg.stop_text_token, np.int32)
        return jnp.asarray(np.concatenate([sot, ids, eot], axis=1))

    def prepare_conditionals(self, ref_wav_16k, ref_wav_24k=None,
                             prompt_tokens=None,
                             exaggeration: float = 0.5):
        """mtl_tts.py:200-226: speaker embedding from the voice
        encoder + S3Gen reference dict."""
        wav16 = jnp.asarray(ref_wav_16k, jnp.float32)
        if wav16.ndim == 1:
            wav16 = wav16[None]
        mels = voice_encoder_mels(wav16, self.ve_cfg)
        spk = voice_encoder_embed(self.ve_params, mels)
        if ref_wav_24k is None:
            # cheap host-side 16k->24k linear resample
            w = np.asarray(wav16)
            n24 = int(w.shape[1] * 1.5)
            xi = np.linspace(0, w.shape[1] - 1, n24)
            ref_wav_24k = jnp.asarray(
                np.stack([np.interp(xi, np.arange(w.shape[1]), row)
                          for row in w]), jnp.float32)
        ref = self.s3gen.embed_ref(ref_wav_24k,
                                   prompt_tokens=prompt_tokens)
        self._conds = {"speaker_emb": spk, "ref": ref,
                       "prompt_tokens": prompt_tokens,
                       "exaggeration": exaggeration}
        return self._conds

    def generate(self, text: str, language_id: str = "en",
                 ref_wav_16k=None, exaggeration: float = 0.5,
                 cfg_weight: float = 0.5, temperature: float = 0.8,
                 max_new_tokens: int = 128, seed: int = 0):
        if language_id and language_id.lower() not in SUPPORTED_LANGUAGES:
            raise ValueError(f"unsupported language_id {language_id!r}")
        if ref_wav_16k is not None:
            self.prepare_conditionals(ref_wav_16k,
                                      exaggeration=exaggeration)
        if self._conds is None:
            # neutral voice: zero speaker embedding + silent reference
            silent = jnp.zeros((1, self.ve_cfg.sample_rate // 2))
            self.prepare_conditionals(silent, exaggeration=exaggeration)
        conds = self._conds
        text_tokens = self._text_tokens(text)
        toks, valid = t3_generate(
            self.t3_params, self.t3_cfg, text_tokens,
            conds["speaker_emb"],
            prompt_speech_tokens=conds.get("prompt_tokens"),
            emotion_adv=exaggeration, max_new_tokens=max_new_tokens,
            temperature=temperature, cfg_weight=cfg_weight,
            key=jax.random.PRNGKey(seed) if temperature > 0 else None)
        toks = np.asarray(toks)
        valid = np.asarray(valid)
        n = int(valid.sum())
        # drop_invalid_tokens (s3gen.py:36-39): < SPEECH_VOCAB_SIZE
        speech = toks[:n][toks[:n] < self.s3gen.cfg.token_vocab]
        if speech.size == 0:
            speech = np.zeros((1,), np.int32)
        wav = self.s3gen(jnp.asarray(speech, jnp.int32)[None],
                         conds["ref"], key=jax.random.PRNGKey(seed + 1))
        return {"audio": np.asarray(wav)[0],
                "sample_rate": self.s3gen.cfg.sample_rate,
                "speech_tokens": speech, "n_tokens": n}


class ChatterboxFamilyHandler:
    family = "tts_chatterbox"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (20, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        # chatterbox_handler.py:71-93 _get_chatterbox_model_def
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts",
                "no_negative_prompt": True,
                "custom_settings": {"exaggeration": 0.5, "pace": 0.5}}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "temperature": 0.8, "seed": -1,
                "exaggeration": 0.5, "cfg_weight": 0.5,
                "language": "en", "duration_seconds": 10}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get("URLs", [
                    base + "chatterbox/t3_mtl23ls_v2.safetensors"])},
                {"role": "s3gen", "urls": [
                    base + "chatterbox/s3gen.safetensors"]},
                {"role": "voice_encoder", "urls": [
                    base + "chatterbox/ve.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> ChatterboxPipeline:
        t3_cfg = (T3Config.tiny() if model_def.get("tiny")
                  else T3Config())
        ve_cfg = (VoiceEncConfig.tiny() if model_def.get("tiny")
                  else VoiceEncConfig())
        s3_cfg = (S3GenConfig.tiny() if model_def.get("tiny")
                  else S3GenConfig())
        # checkpoint fetch is stubbed in this env; random init mirrors
        # the reference layout (io/downloads.py handles real files)
        keys = jax.random.split(jax.random.key(seed), 3)
        t3 = init_t3(keys[0], t3_cfg)
        ve = init_voice_encoder(keys[1], ve_cfg)
        s3 = S3Gen(init_s3gen(keys[2], s3_cfg), s3_cfg)
        return ChatterboxPipeline(t3, t3_cfg, ve, ve_cfg, s3,
                                  tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: ChatterboxPipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        ref = merged.get("audio_guide")
        ref_wav = None
        if isinstance(ref, str):
            from ..utils.media import read_wav
            wav, sr = read_wav(ref)
            ref_wav = wav if wav.ndim == 1 else wav.mean(axis=-1)
        elif ref is not None:
            ref_wav = np.asarray(ref, np.float32)
        # ~25 tokens/second of speech
        max_toks = max(16, int(float(merged.get("duration_seconds", 10))
                               * 25))
        return pipe.generate(
            merged.get("prompt", ""),
            language_id=merged.get("language", "en"),
            ref_wav_16k=ref_wav,
            exaggeration=float(merged.get("exaggeration", 0.5)),
            cfg_weight=float(merged.get("cfg_weight", 0.5)),
            temperature=float(merged.get("temperature", 0.8)),
            max_new_tokens=max_toks, seed=seed)
