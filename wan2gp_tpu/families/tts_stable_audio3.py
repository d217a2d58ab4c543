"""Stable Audio 3 family handler (reference
models/TTS/stable_audio3_handler.py + stable_audio3/pipeline.py +
stable_audio3/model.py StableAudioModel.generate): text / source-audio
conditioned latent diffusion to 44.1 kHz stereo.

Audio modes (stable_audio3_handler.py:28-34, pipeline.py:57-67
_mode_from_audio_prompt_type):
  ""   text to audio
  "AE" audio-to-audio edit (init latents noised to audio_scale)
  "AI" inpaint a [start, end] seconds region of the source
  "AC" continue the source audio to the requested duration
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.stable_audio3 import (
    SA3DiTConfig, TAAEConfig, init_sa3_dit, init_taae,
    init_number_conditioner, number_embed, sa3_cfg_denoise,
    taae_encode, taae_decode, build_schedule, sample_pingpong,
    sample_euler)

_TYPES = ["stable_audio3_small", "stable_audio3_medium"]

# pipeline.py:15 STABLE_AUDIO3_DURATION_PADDING_SEC
DURATION_PADDING_SEC = 6.0


def _mode_from_audio_prompt_type(audio_prompt_type: str) -> str:
    s = str(audio_prompt_type or "").upper()
    if "A" not in s:
        return "text"
    if "E" in s:
        return "audio_to_audio"
    if "I" in s:
        return "inpaint"
    if "C" in s:
        return "continue"
    return "text"


class StableAudio3Pipeline:
    """Holds DiT + TAAE + conditioners; generate() mirrors
    model.py:77-345 StableAudioModel.generate."""

    def __init__(self, dit_params, dit_cfg: SA3DiTConfig, taae_params,
                 taae_cfg: TAAEConfig, num_params, text_encode_fn,
                 max_duration: float = 120.0):
        self.dit_params = dit_params
        self.dit_cfg = dit_cfg
        self.taae_params = taae_params
        self.taae_cfg = taae_cfg
        self.num_params = num_params
        self.text_encode_fn = text_encode_fn
        self.max_duration = float(max_duration)

    # -- helpers ----------------------------------------------------

    def _encode_audio(self, wav, n_latents: int):
        """wav [T] or [T, C] 44.1 kHz -> latents [1, n_latents, io]
        (model.py:_encode_audio_input: pad/trim then pretransform)."""
        cfg = self.taae_cfg
        w = np.asarray(wav, np.float32)
        if w.ndim == 1:
            w = np.stack([w, w], axis=-1)
        if w.shape[-1] == 1:
            w = np.repeat(w, 2, axis=-1)
        need = n_latents * self.dit_cfg.downsampling
        if w.shape[0] < need:
            w = np.pad(w, ((0, need - w.shape[0]), (0, 0)))
        else:
            w = w[:need]
        return taae_encode(self.taae_params, cfg,
                           jnp.asarray(w)[None])

    def generate(self, prompt: str, negative_prompt: str = "",
                 duration_seconds: float = 30.0, steps: int = 8,
                 cfg_scale: float = 1.0, sample_solver: str = "pingpong",
                 audio_prompt_type: str = "", source_audio=None,
                 audio_scale: float = 0.9,
                 inpaint_start_seconds: float = 0.0,
                 inpaint_end_seconds: Optional[float] = None,
                 apg_scale: float = 1.0, seed: int = 0
                 ) -> Dict[str, Any]:
        cfg = self.dit_cfg
        sr = cfg.sample_rate
        duration = float(min(max(duration_seconds, 1.0),
                             self.max_duration))
        mode = _mode_from_audio_prompt_type(audio_prompt_type)
        if mode != "text" and source_audio is None:
            raise ValueError(
                f"Stable Audio 3 mode {mode!r} requires source audio")
        if mode == "continue":
            src_sec = np.asarray(source_audio).shape[0] / sr
            duration = float(min(max(duration, src_sec + 1.0),
                                 self.max_duration))

        # effective + padded lengths (model.py: headroom_seconds and
        # use_effective_length_for_schedule)
        eff_latents = max(1, math.ceil(duration * sr / cfg.downsampling))
        pad_sec = min(duration + DURATION_PADDING_SEC, self.max_duration)
        n_latents = max(eff_latents,
                        math.ceil(pad_sec * sr / cfg.downsampling))

        # conditioning
        ctx = jnp.asarray(self.text_encode_fn([prompt or ""]),
                          jnp.float32)
        if cfg_scale != 1.0 and negative_prompt:
            # negative prompt replaces the zeroed null embedding
            neg = jnp.asarray(self.text_encode_fn([negative_prompt]),
                              jnp.float32)
        else:
            neg = None
        g = number_embed(self.num_params, [duration], 0.0,
                         float(self.max_duration))

        # local additive conditioning: [mask | mask * latents]
        # (model.py:281-297: mask 1 = keep, 0 = regenerate)
        local_add = None
        init_latents = None
        if mode in ("inpaint", "continue"):
            src = self._encode_audio(source_audio, n_latents)
            lat_t = n_latents
            mask = np.ones((1, lat_t, 1), np.float32)
            if mode == "continue":
                s = float(np.asarray(source_audio).shape[0] / sr)
                e = duration
            else:
                s = max(0.0, float(inpaint_start_seconds))
                e = float(inpaint_end_seconds
                          if inpaint_end_seconds is not None
                          else duration)
            i0 = min(lat_t, int(s * sr / cfg.downsampling))
            i1 = min(lat_t, max(i0, int(math.ceil(
                e * sr / cfg.downsampling))))
            mask[:, i0:i1] = 0.0
            # zero past the effective length, matching training
            # (model.py:222-236)
            mask[:, eff_latents:] = 0.0
            m = jnp.asarray(mask)
            local_add = jnp.concatenate([m, src * m], axis=-1)
        elif mode == "audio_to_audio":
            init_latents = self._encode_audio(source_audio, n_latents)

        def denoise(x, t):
            la = local_add
            if la is not None:
                la = jnp.broadcast_to(
                    la, (x.shape[0],) + la.shape[1:]).astype(x.dtype)
            cc = jnp.broadcast_to(ctx, (x.shape[0],) + ctx.shape[1:])
            gg = jnp.broadcast_to(g, (x.shape[0], g.shape[-1]))
            return sa3_cfg_denoise(
                self.dit_params, cfg, x, t, cc.astype(x.dtype),
                gg.astype(x.dtype), la, cfg_scale=cfg_scale,
                apg_scale=apg_scale, neg_cross_cond=(
                    None if neg is None else jnp.broadcast_to(
                        neg, (x.shape[0],) + neg.shape[1:]
                    ).astype(x.dtype)))

        sigmas = build_schedule(steps, eff_latents, cfg)
        key = jax.random.PRNGKey(seed)
        key, kn = jax.random.split(key)
        noise = jax.random.normal(kn, (1, n_latents, cfg.io_channels),
                                  jnp.float32)
        if init_latents is not None:
            # audio-to-audio: start from the source noised to the edit
            # level (sampling.py init_noise_level semantics)
            lvl = float(np.clip(audio_scale, 0.0, 1.0))
            start = int(np.searchsorted(-sigmas, -lvl))
            start = min(max(start, 0), len(sigmas) - 2)
            sig0 = float(sigmas[start])
            noise = (1.0 - sig0) * init_latents.astype(jnp.float32) \
                + sig0 * noise
            sigmas = sigmas[start:]

        solver = str(sample_solver or "pingpong").lower()
        if solver in ("pingpong", "", "default"):
            lat = sample_pingpong(denoise, noise, sigmas, key)
        else:
            lat = sample_euler(denoise, noise, sigmas, key)

        audio = taae_decode(self.taae_params, self.taae_cfg,
                            lat.astype(jnp.float32))
        n_samples = int(duration * sr)
        out = np.asarray(audio)[0][:n_samples]
        peak = np.abs(out).max()
        if peak > 1.0:
            out = out / peak
        return {"audio": out, "sample_rate": sr,
                "latents": np.asarray(lat), "mode": mode}


class StableAudio3FamilyHandler:
    family = "tts_stable_audio3"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        # stable_audio3_handler.py:125-126
        return {"music": (2195, "Music"), "tts": (2200, "TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        # stable_audio3_handler.py:140-176 query_model_def
        max_dur = (380 if base_model_type == "stable_audio3_medium"
                   else 120)
        return {
            "audio_outputs": True, "image_outputs": False,
            "audio_only": True, "group": "music",
            "guidance_max_phases": 1,
            "sample_solvers": [("PingPong", "pingpong"),
                               ("Euler", "euler")],
            "any_audio_prompt": True,
            "audio_guide_label": "Source audio",
            "audio_scale_name": "Edit Noise Level",
            "audio_prompt_type_sources": {
                "selection": ["", "AE", "AI", "AC"],
                "labels": {"": "Text to audio",
                           "AE": "Audio to audio edit",
                           "AI": "Inpaint source audio",
                           "AC": "Continue source audio"},
                "default": "", "letters_filter": "AEIC"},
            "duration_slider": {"label": "Duration (seconds)", "min": 1,
                                "max": max_dur, "default": 30},
            "custom_settings": {"inpaint_start_seconds": 0.0,
                                "inpaint_end_seconds": 10.0},
        }

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        # stable_audio3_handler.py:243-259 update_default_settings
        return {"prompt": ("An anthemic pop rock instrumental with "
                           "bright guitars, punchy drums, and a "
                           "nostalgic festival chorus."),
                "negative_prompt": "poor quality, distorted, noisy",
                "duration_seconds": 30, "num_inference_steps": 8,
                "guidance_scale": 1.0, "sample_solver": "pingpong",
                "audio_prompt_type": "", "audio_scale": 0.9, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        w = ("stable_audio3_medium"
             if base_model_type == "stable_audio3_medium"
             else "stable_audio3_small")
        same = ("stable_audio3_same_l_bf16.safetensors"
                if base_model_type == "stable_audio3_medium"
                else "stable_audio3_same_s_bf16.safetensors")
        return [{"role": "transformer",
                 "urls": model_def.get("URLs",
                                       [base + w + "_bf16.safetensors"])},
                {"role": "autoencoder", "urls": [base + same]},
                {"role": "text_encoder", "urls": [
                    base + "t5gemma-b-b-ul2/"
                    "t5gemma-b-b-ul2_bf16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> StableAudio3Pipeline:
        medium = base_model_type == "stable_audio3_medium"
        if model_def.get("tiny"):
            dit_cfg = SA3DiTConfig.tiny(differential=medium)
            taae_cfg = TAAEConfig.tiny()
        elif medium:
            dit_cfg = SA3DiTConfig.medium()
            taae_cfg = TAAEConfig.medium()
        else:
            dit_cfg = SA3DiTConfig()
            taae_cfg = TAAEConfig()
        keys = jax.random.split(jax.random.key(seed), 3)
        if checkpoints and checkpoints.get("transformer") \
                and not init_random:
            from ..io.safetensors_reader import load_weights
            from ..io.stable_audio3_checkpoint import \
                load_sa3_dit_params
            dit, _left = load_sa3_dit_params(
                load_weights(checkpoints["transformer"]), dit_cfg,
                dtype)
        else:
            dit = init_sa3_dit(keys[0], dit_cfg, dtype)
        taae = init_taae(keys[1], taae_cfg, dtype)
        num = init_number_conditioner(keys[2], dit_cfg.global_cond_dim)

        text_fn = None
        if checkpoints and checkpoints.get("text_encoder"):
            text_fn = cls._load_text_encoder(checkpoints, tokenizer,
                                             dtype, dit_cfg)
        if text_fn is None:
            def text_fn(prompts, _seed=seed):
                # no checkpoint in this env: deterministic stub keeps
                # the diffusion path runnable
                k = jax.random.key(hash((prompts[0], _seed))
                                   & 0x7FFFFFFF)
                return jax.random.normal(
                    k, (1, 24, dit_cfg.cond_token_dim), jnp.float32)
        max_dur = 380.0 if medium else 120.0
        return StableAudio3Pipeline(dit, dit_cfg, taae, taae_cfg, num,
                                    text_fn, max_duration=max_dur)

    @staticmethod
    def _load_text_encoder(checkpoints, tokenizer, dtype, dit_cfg):
        """T5Gemma-b encoder shared with magi
        (stable_audio3_handler.py:16 t5gemma-b-b-ul2)."""
        from ..io.safetensors_reader import load_weights
        from ..models.magi.t5gemma import (T5GemmaEncConfig,
                                           load_t5gemma_params,
                                           t5gemma_encode)
        tcfg = T5GemmaEncConfig()
        tparams, _ = load_t5gemma_params(
            load_weights(checkpoints["text_encoder"]), tcfg, dtype)

        def text_fn(prompts, max_len=128):
            if tokenizer is not None:
                ids, mask = tokenizer(prompts, max_len)
            else:
                raw = [p.encode()[:max_len] or b"\x00" for p in prompts]
                n = max(len(r) for r in raw)
                ids = np.zeros((len(raw), n), np.int32)
                mask = np.zeros((len(raw), n), np.int32)
                for i, r in enumerate(raw):
                    ids[i, :len(r)] = np.frombuffer(r, np.uint8)
                    mask[i, :len(r)] = 1
            out = t5gemma_encode(tparams, tcfg, jnp.asarray(ids),
                                 jnp.asarray(mask))
            return out[..., :dit_cfg.cond_token_dim]

        return text_fn

    @staticmethod
    def generate_audio(pipe: StableAudio3Pipeline,
                       merged: Dict[str, Any], seed: int, **kw):
        src = merged.get("audio_guide")
        wav = None
        if isinstance(src, str):
            from ..utils.media import read_wav
            wav, _sr = read_wav(src)
        elif src is not None:
            wav = np.asarray(src, np.float32)
        cs = merged.get("custom_settings") or {}
        end = cs.get("inpaint_end_seconds",
                     merged.get("inpaint_end_seconds"))
        return pipe.generate(
            merged.get("prompt", ""),
            negative_prompt=merged.get("negative_prompt", ""),
            duration_seconds=float(merged.get("duration_seconds", 30)),
            steps=int(merged.get("num_inference_steps", 8)),
            cfg_scale=float(merged.get("guidance_scale", 1.0)),
            sample_solver=merged.get("sample_solver", "pingpong"),
            audio_prompt_type=merged.get("audio_prompt_type", ""),
            source_audio=wav,
            audio_scale=float(merged.get("audio_scale", 0.9)),
            inpaint_start_seconds=float(
                cs.get("inpaint_start_seconds",
                       merged.get("inpaint_start_seconds", 0.0))),
            inpaint_end_seconds=(None if end in (None, "")
                                 else float(end)),
            seed=seed)
