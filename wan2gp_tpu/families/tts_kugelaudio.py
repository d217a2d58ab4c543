"""KugelAudio TTS family handler (reference
models/TTS/kugelaudio_handler.py + kugelaudio/pipeline.py +
processors/kugelaudio_processor.py): text (+optional voice prompt) ->
constrained LM token stream -> per-frame diffusion latents ->
streaming conv decode at 24 kHz (7.5 frames/s).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.kugelaudio import (KugelConfig, init_kugelaudio,
                                     encode_voice_prompt,
                                     kugelaudio_generate,
                                     assemble_audio)
from ..models.tts.kugel_tokenizer import KugelTokenizerConfig

_TYPES = ["kugelaudio", "kugelaudio_0_open"]

# kugelaudio_processor.py:168
SYSTEM_PROMPT = (" Transform the text provided by various speakers "
                 "into speech output, utilizing the distinct voice of "
                 "each respective speaker.\n")


def split_text_segments(text: str, auto_split_every_s: float = 0.0,
                        words_per_second: float = 2.5) -> List[str]:
    """pipeline.py manual splits on empty lines + optional auto-split
    (kugelaudio_handler.py KUGELAUDIO_AUTO_SPLIT_SETTING_ID)."""
    segs = [s.strip() for s in re.split(r"\n\s*\n", text.strip())
            if s.strip()]
    if auto_split_every_s and auto_split_every_s >= 5.0:
        out = []
        max_words = max(4, int(auto_split_every_s * words_per_second))
        for seg in segs:
            words = seg.split()
            for i in range(0, len(words), max_words):
                out.append(" ".join(words[i:i + max_words]))
        segs = out
    return segs or [""]


class KugelAudioPipeline:
    def __init__(self, params, cfg: KugelConfig,
                 tok_cfg: KugelTokenizerConfig, tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.tok_cfg = tok_cfg
        self.tokenizer = tokenizer
        self.sample_rate = tok_cfg.sample_rate

    def _encode_text(self, text: str, max_len: int = 512) -> np.ndarray:
        if self.tokenizer is not None:
            ids, _ = self.tokenizer([text], max_len)
            ids = np.asarray(ids, np.int32)[0]
            return ids[ids != 0]
        raw = text.encode()[:max_len] or b"\x00"
        # byte fallback clear of the 4 reserved control ids
        reserve = max(self.cfg.eos_id - 260, 1)
        return np.frombuffer(raw, np.uint8).astype(np.int32) % reserve

    def _build_prompt(self, text: str, n_voice_frames: int = 0):
        """kugelaudio_processor.py:131-258 template."""
        cfg = self.cfg
        toks: List[int] = []
        mask: List[bool] = []

        def add(ids, is_voice=False):
            toks.extend(int(i) for i in ids)
            mask.extend([is_voice] * len(ids))

        add(self._encode_text(SYSTEM_PROMPT))
        if n_voice_frames > 0:
            add(self._encode_text(" Voice input:\n"))
            add(self._encode_text(" Speaker 0:"))
            add([cfg.speech_diffusion_id] * n_voice_frames,
                is_voice=True)
            add(self._encode_text("\n"))
        t = text.strip()
        if not t.startswith("Speaker"):
            t = f"Speaker 0: {t}"
        add(self._encode_text(" Text input:\n"))
        add(self._encode_text(f" {t}\n"))
        add(self._encode_text(" Speech output:\n"))
        add([cfg.speech_start_id])
        return (jnp.asarray([toks], jnp.int32),
                jnp.asarray([mask], bool))

    def calibrate_scaling(self, acoustic_features):
        """1/std, -mean of the voice prompt's acoustic latents
        (kugelaudio_model.py:458-466)."""
        flat = acoustic_features.reshape(-1)
        self.params = dict(
            self.params,
            scaling=1.0 / jnp.maximum(jnp.std(flat), 1e-6),
            bias=-jnp.mean(flat))

    def generate(self, text: str, voice_wav=None, cfg_scale: float = 3.0,
                 duration_seconds: float = 20.0, ddpm_steps: int = 10,
                 do_sample: bool = False, temperature: float = 1.0,
                 pause_seconds: float = 0.5,
                 auto_split_every_s: float = 0.0, seed: int = 0
                 ) -> Dict[str, Any]:
        cfg, tok_cfg = self.cfg, self.tok_cfg
        key = jax.random.PRNGKey(seed)
        fps = tok_cfg.sample_rate / tok_cfg.hop

        voice_embeds = None
        n_voice = 0
        if voice_wav is not None:
            w = jnp.asarray(np.asarray(voice_wav, np.float32))
            if w.ndim == 2:
                w = w.mean(axis=-1)
            key, kv = jax.random.split(key)
            voice_embeds, ac = encode_voice_prompt(
                self.params, cfg, tok_cfg, w[None], kv)
            self.calibrate_scaling(ac)
            n_voice = voice_embeds.shape[1]

        segments = split_text_segments(text, auto_split_every_s)
        per_seg = max(4, int(duration_seconds * fps
                             / max(len(segments), 1)) + 8)
        pieces = []
        for si, seg in enumerate(segments):
            ids, mask = self._build_prompt(seg, n_voice)
            key, kg = jax.random.split(key)
            out = kugelaudio_generate(
                self.params, cfg, tok_cfg, ids,
                voice_embeds=voice_embeds, speech_input_mask=mask,
                cfg_scale=cfg_scale, max_new_tokens=per_seg,
                ddpm_steps=ddpm_steps, do_sample=do_sample,
                temperature=temperature, key=kg)
            pieces.append(assemble_audio(out))
            if si < len(segments) - 1 and pause_seconds > 0:
                pieces.append(np.zeros(
                    (int(pause_seconds * tok_cfg.sample_rate),),
                    np.float32))
        audio = (np.concatenate(pieces)
                 if pieces else np.zeros((0,), np.float32))
        limit = int(duration_seconds * tok_cfg.sample_rate)
        if limit > 0:
            audio = audio[:limit]
        return {"audio": audio, "sample_rate": tok_cfg.sample_rate,
                "n_segments": len(segments)}


class KugelAudioFamilyHandler:
    family = "tts_kugelaudio"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (22, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts",
                "any_audio_prompt": True,
                "audio_guide_label": "Voice to clone",
                "duration_slider": {"label": "Max duration (seconds)",
                                    "min": 1, "max": 600,
                                    "default": 20},
                "custom_settings": {"auto_split_every_s": 0.0}}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        # kugelaudio_handler.py:235-251 update_default_settings
        return {"prompt": ("Hello! This is KugelAudio speaking in a "
                           "clear, friendly voice."),
                "duration_seconds": 20, "guidance_scale": 3.0,
                "temperature": 1.0, "pause_seconds": 0.5, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get(
                    "URLs", [base + "kugelaudio/kugelaudio-0-open_"
                             "bf16.safetensors"])},
                {"role": "tokenizer", "urls": [
                    base + "kugelaudio_text_tokenizer/tokenizer.json"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> KugelAudioPipeline:
        if model_def.get("tiny"):
            cfg = KugelConfig.tiny()
            tok_cfg = KugelTokenizerConfig.tiny()
        else:
            cfg = KugelConfig()
            tok_cfg = KugelTokenizerConfig()
        if checkpoints and checkpoints.get("transformer") \
                and not init_random:
            from ..io.safetensors_reader import load_weights
            from ..io.kugelaudio_checkpoint import \
                load_kugelaudio_params
            params, _left = load_kugelaudio_params(
                load_weights(checkpoints["transformer"]), cfg,
                tok_cfg, jnp.float32)
        else:
            params = init_kugelaudio(jax.random.key(seed), cfg,
                                     tok_cfg, jnp.float32)
        return KugelAudioPipeline(params, cfg, tok_cfg,
                                  tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: KugelAudioPipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        ref = merged.get("audio_guide")
        voice = None
        if isinstance(ref, str):
            from ..utils.media import read_wav
            wav, _sr = read_wav(ref)
            voice = wav if wav.ndim == 1 else wav.mean(axis=-1)
        elif ref is not None:
            voice = np.asarray(ref, np.float32)
        cs = merged.get("custom_settings") or {}
        return pipe.generate(
            merged.get("prompt", ""),
            voice_wav=voice,
            cfg_scale=float(merged.get("guidance_scale", 3.0)),
            duration_seconds=float(merged.get("duration_seconds", 20)),
            ddpm_steps=int(merged.get("num_inference_steps") or 10),
            do_sample=float(merged.get("temperature", 1.0)) > 0
            and bool(merged.get("do_sample", False)),
            temperature=float(merged.get("temperature", 1.0)),
            pause_seconds=float(merged.get("pause_seconds", 0.5)),
            auto_split_every_s=float(
                cs.get("auto_split_every_s",
                       merged.get("auto_split_every_s", 0.0)) or 0.0),
            seed=seed)
