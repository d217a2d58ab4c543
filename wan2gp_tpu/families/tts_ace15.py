"""ACE-Step 1.5 family handler (reference
models/TTS/ace_step_handler.py:323-376 + ace_step15/pipeline_ace_step15.py):
lyrics + music caption -> turbo 8-step flow DiT -> Oobleck decode at
48 kHz stereo.  Audio tasks (audio_prompt_type letters "AB"):
  ""   Text (lyrics) to audio
  "A"  Cover mode of source audio (audio_scale = source strength)
  "B"  Transfer reference-audio timbre
  "AB" both
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.ace15 import (Ace15Config, init_ace15,
                                encode_condition, tokenize_audio,
                                lm_hints_from_codes, generate_latents)
from ..models.tts.ace15_vae import (OobleckConfig, init_oobleck,
                                    oobleck_encode, oobleck_decode)

_TYPES = ["ace_step_v1_5", "ace_step_v1_5_xl"]


class AceStep15Pipeline:
    def __init__(self, params, cfg: Ace15Config, vae_params,
                 vae_cfg: OobleckConfig, text_encode_fn,
                 lm_generate_fn=None):
        self.params = params
        self.cfg = cfg
        self.vae_params = vae_params
        self.vae_cfg = vae_cfg
        self.text_encode_fn = text_encode_fn
        # phase-1 5Hz-LM hook: (caption, lyrics, n_codes) -> generated
        # text containing <|audio_code_N|> tokens + a metadata CoT
        # (pipeline_ace_step15.py:620-662 _generate_lm_text)
        self.lm_generate_fn = lm_generate_fn
        self.sample_rate = vae_cfg.sample_rate

    def _encode_audio_latents(self, wav, n_latents=None):
        """wav [T] or [T, C] -> acoustic latents [1, N, 64]."""
        w = np.asarray(wav, np.float32)
        if w.ndim == 1:
            w = np.stack([w, w], axis=-1)
        hop = self.vae_cfg.hop
        if n_latents is not None:
            need = n_latents * hop
            w = (np.pad(w, ((0, need - w.shape[0]), (0, 0)))
                 if w.shape[0] < need else w[:need])
        else:
            pad = (-w.shape[0]) % hop
            if pad:
                w = np.pad(w, ((0, pad), (0, 0)))
        return oobleck_encode(self.vae_params, self.vae_cfg,
                              jnp.asarray(w)[None])

    def generate(self, lyrics: str, caption: str = "",
                 duration_seconds: float = 60.0, shift: float = 3.0,
                 infer_method: str = "ode",
                 audio_prompt_type: str = "", source_audio=None,
                 refer_audio=None, audio_scale: float = 0.5,
                 model_mode: int = 0, seed: int = 0) -> Dict[str, Any]:
        cfg, vcfg = self.cfg, self.vae_cfg
        modes = str(audio_prompt_type or "").upper()
        use_cover = "A" in modes
        use_timbre = "B" in modes
        if use_cover and source_audio is None:
            raise ValueError("cover mode requires a source audio")
        if use_timbre and refer_audio is None:
            raise ValueError("timbre mode requires a reference audio")

        fps = vcfg.sample_rate / vcfg.hop
        # round to a pool-window multiple so cover tokenization aligns
        n_lat = max(cfg.pool_window, int(
            round(duration_seconds * fps / cfg.pool_window))
            * cfg.pool_window)

        text_states = jnp.asarray(self.text_encode_fn([caption or ""]),
                                  jnp.float32)
        lyric_states = jnp.asarray(self.text_encode_fn([lyrics or ""]),
                                   jnp.float32)

        refer_latents = None
        if use_timbre:
            refer_latents = self._encode_audio_latents(refer_audio)

        cond, mask = encode_condition(
            self.params, cfg, text_states, None, lyric_states, None,
            refer_latents=refer_latents)

        src_latents = None
        cond2 = mask2 = None
        strength = 1.0
        metadata = None
        if model_mode and self.lm_generate_fn is not None \
                and not use_cover:
            # phase-1 LM guidance: audio codes become 25 Hz hints on
            # the cover path (pipeline model_modes)
            from ..models.tts.ace15_lm import (extract_audio_codes,
                                               parse_metadata)
            n_codes = max(1, n_lat // cfg.pool_window)
            text = self.lm_generate_fn(caption, lyrics, n_codes)
            metadata = parse_metadata(text)
            codes = extract_audio_codes(text, min_tokens=n_codes,
                                        max_tokens=n_codes)
            if codes:
                idx = jnp.asarray([codes], jnp.int32)
                src_latents = lm_hints_from_codes(
                    self.params, cfg, idx)[:, :n_lat]
                use_cover = True
                strength = float(np.clip(audio_scale, 0.0, 1.0)) \
                    if audio_scale < 1.0 else 1.0
                if strength < 1.0:
                    cond2, mask2 = cond, mask
        if use_cover and source_audio is not None:
            src = self._encode_audio_latents(source_audio,
                                             n_latents=n_lat)
            # tokenize to 5 Hz codes, detokenize back to 25 Hz hints
            # (prepare_condition is_covers path, modeling:1640-1660)
            _q, idx = tokenize_audio(self.params, cfg, src)
            src_latents = lm_hints_from_codes(self.params, cfg,
                                              idx)[:, :n_lat]
            strength = float(np.clip(audio_scale, 0.0, 1.0))
            if strength < 1.0:
                cond2, mask2 = cond, mask   # non-cover condition

        lat = generate_latents(
            self.params, cfg, cond, mask, n_lat,
            src_latents=src_latents, is_cover=use_cover, shift=shift,
            infer_method=infer_method,
            cond_non_cover=cond2, cond_mask_non_cover=mask2,
            audio_cover_strength=strength if use_cover else 1.0,
            key=jax.random.PRNGKey(seed))

        audio = oobleck_decode(self.vae_params, vcfg,
                               lat.astype(jnp.float32))
        out = np.asarray(audio)[0]
        out = out[:int(duration_seconds * vcfg.sample_rate)]
        peak = np.abs(out).max()
        if peak > 1.0:
            out = out * (0.95 / peak)
        return {"audio": out, "sample_rate": vcfg.sample_rate,
                "latents": np.asarray(lat), "mode": modes,
                "metadata": metadata}


class AceStep15FamilyHandler:
    family = "tts_ace15"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"music": (2190, "Music")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        # ace_step_handler.py:323-376
        return {
            "audio_outputs": True, "image_outputs": False,
            "audio_only": True, "group": "music",
            "guidance_max_phases": 0, "no_negative_prompt": True,
            "lock_inference_steps": True,
            "any_audio_prompt": True,
            "audio_guide_label": "Source Audio",
            "audio_guide2_label": "Reference Timbre",
            "audio_scale_name": "Source Audio Strength",
            "prompt_class": "Lyrics",
            "audio_prompt_type_sources": {
                "selection": ["", "A", "B", "AB"],
                "labels": {
                    "": "Text (Lyrics) 2 Audio",
                    "A": "Cover Mode of Source Audio",
                    "B": "Transfer Reference Audio Timbre",
                    "AB": "Cover + Timbre Transfer"},
                "default": "", "letters_filter": "AB"},
            "alt_prompt": {"label": "Music Caption", "lines": 2},
            "duration_slider": {"label": "Duration (seconds)",
                                "min": 10, "max": 600, "default": 120},
        }

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        # defaults/ace_step_v1_5.json
        return {"prompt": "[Instrumental]",
                "alt_prompt": ("Dreamy synth-pop with shimmering pads, "
                               "soft vocals, and a slow dance groove."),
                "duration_seconds": 120, "num_inference_steps": 8,
                "shift": 1.0, "guidance_scale": 1.0,
                "audio_scale": 0.5, "scheduler_type": "euler",
                "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        name = ("ace_step_v1_5_xl_transformer_bf16.safetensors"
                if base_model_type.endswith("_xl")
                else "ace_step_v1_5_transformer_bf16.safetensors")
        return [{"role": "transformer",
                 "urls": model_def.get("URLs", [base + name])},
                {"role": "audio_vae", "urls": [
                    base + "ace_step_v1_5_audio_vae_bf16.safetensors"]},
                {"role": "text_encoder", "urls": [
                    base + "acestep-5Hz-lm-1.7B/"
                    "model_bf16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> AceStep15Pipeline:
        if model_def.get("tiny"):
            cfg = Ace15Config.tiny()
            vcfg = OobleckConfig.tiny()
        elif base_model_type.endswith("_xl"):
            cfg = Ace15Config.xl()
            vcfg = OobleckConfig()
        else:
            cfg = Ace15Config()
            vcfg = OobleckConfig()
        k1, k2 = jax.random.split(jax.random.key(seed))
        if checkpoints and checkpoints.get("transformer") \
                and not init_random:
            from ..io.safetensors_reader import load_weights
            from ..io.ace15_checkpoint import load_ace15_params
            params, _left = load_ace15_params(
                load_weights(checkpoints["transformer"]), cfg)
        else:
            params = init_ace15(k1, cfg, jnp.float32)
        vae = init_oobleck(k2, vcfg, jnp.float32)

        def text_fn(prompts, _seed=seed):
            # deterministic stub standing in for the Qwen3 5Hz-LM
            # embedding states (pipeline_ace_step15.py:383-407)
            k = jax.random.key(hash((prompts[0][:256], _seed))
                               & 0x7FFFFFFF)
            n = min(max(len(prompts[0]) // 4 + 4, 8), 256)
            return jax.random.normal(k, (1, n, cfg.text_dim),
                                     jnp.float32)

        return AceStep15Pipeline(params, cfg, vae, vcfg, text_fn)

    @staticmethod
    def generate_audio(pipe: AceStep15Pipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        def load(x):
            if isinstance(x, str):
                from ..utils.media import read_wav
                wav, _sr = read_wav(x)
                return wav
            return None if x is None else np.asarray(x, np.float32)

        return pipe.generate(
            merged.get("prompt", ""),
            caption=merged.get("alt_prompt", ""),
            duration_seconds=float(merged.get("duration_seconds", 60)),
            shift=float(merged.get("shift", 3.0)),
            infer_method=("sde" if str(merged.get(
                "scheduler_type", "euler")).lower() == "sde"
                else "ode"),
            audio_prompt_type=merged.get("audio_prompt_type", ""),
            source_audio=load(merged.get("audio_guide")),
            refer_audio=load(merged.get("audio_guide2")),
            audio_scale=float(merged.get("audio_scale", 0.5)),
            model_mode=int(merged.get("model_mode") or 0),
            seed=seed)
