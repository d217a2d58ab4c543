"""LTX-2 audio-TTS family handler — DramaBox + Scenema (reference
models/ltx2/ltx_audio_tts_handler.py registering dramabox_audio /
scenema_audio over the audio-only LTX-2 stack).

DramaBox: drama-script planning (speaker sections, estimated and
scaled segment durations) with per-segment generation and
concatenation.  Scenema: attribute-tagged single-pass TTS with an
optional seed-vc voice-conversion pass (scenema_seedvc;
custom_settings vc_steps / vc_cfg_rate).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.ltx2.dit import LTX2Config, init_ltx2_dit
from ..models.ltx2.audio_vae import (LTX2AudioVAEConfig,
                                     LTX2VocoderConfig,
                                     init_ltx2_audio_vae,
                                     init_ltx2_vocoder,
                                     ltx2_audio_decode, ltx2_vocoder,
                                     ltx2_audio_encode)
from ..models.ltx2.audio_tts import (ltx2_audio_only_denoise,
                                     plan_dramabox_segments,
                                     parse_speaker_options,
                                     _speaker_prefix, _clean_spaces,
                                     AUDIO_LATENTS_PER_SECOND,
                                     DRAMABOX_NEGATIVE)

_TYPES = ["dramabox_audio", "scenema_audio"]


class LTXAudioTTSPipeline:
    def __init__(self, params, cfg: LTX2Config, vae_params,
                 vae_cfg: LTX2AudioVAEConfig, voc_params,
                 voc_cfg: LTX2VocoderConfig, text_fn=None,
                 attn_backend: str = "auto"):
        self.params = params
        self.cfg = cfg
        self.vae = (vae_params, vae_cfg)
        self.voc = (voc_params, voc_cfg)
        self.text_fn = text_fn or self._text_stub
        self.attn_backend = attn_backend
        self.sample_rate = 16000

    def _text_stub(self, prompts):
        k = jax.random.key(hash(prompts[0][:128]) & 0x7FFFFFFF)
        return jax.random.normal(k, (1, 12, self.cfg.caption_dim),
                                 jnp.float32)

    def _tokens_to_latents(self, tokens):
        """[B, T', z*M'] -> [B, z, T', M'] (AudioPatchifier patch 1)."""
        vc = self.vae[1]
        b, t, _ = tokens.shape
        m = vc.mel_compressed
        z = vc.z_channels
        return tokens.reshape(b, t, z, m).transpose(0, 2, 1, 3)

    def _latents_to_tokens(self, latents):
        b, z, t, m = latents.shape
        return latents.transpose(0, 2, 1, 3).reshape(b, t, z * m)

    def _decode(self, tokens):
        vp, vc = self.vae
        spec = ltx2_audio_decode(vp, vc,
                                 self._tokens_to_latents(tokens))
        # mono mel for the vocoder: average the stereo spectrogram;
        # decode gives [B, C, T, M], vocoder wants [B, mel_bins, T]
        mel = spec.mean(axis=1).transpose(0, 2, 1)
        wp, wc = self.voc
        wav = ltx2_vocoder(wp, wc, mel)
        return np.asarray(wav).reshape(-1)

    def encode_reference(self, wav: np.ndarray, sample_rate: int,
                         max_seconds: float = 10.0):
        """Voice reference -> audio latents (LTXAudioTTSPipelineBase
        _encode_reference_waveform; peak-normalized, trimmed)."""
        w = np.asarray(wav, np.float32)
        if w.ndim == 2:
            w = w.mean(axis=-1)
        if sample_rate != self.sample_rate:
            n = int(round(len(w) * self.sample_rate / sample_rate))
            xi = np.linspace(0, len(w) - 1, n)
            w = np.interp(xi, np.arange(len(w)), w).astype(np.float32)
        w = w[:int(max_seconds * self.sample_rate)]
        peak = np.abs(w).max()
        if peak > 0:
            w = w * (10 ** (-4.0 / 20.0) / peak)    # -4 dB peak
        vp, vc = self.vae
        from ..models.ltx2.audio_vae import log_mel_spectrogram
        stereo = jnp.stack([jnp.asarray(w)] * vc.in_channels,
                           axis=0)[None]
        mel = log_mel_spectrogram(stereo, vc)
        lat = ltx2_audio_encode(vp, vc, mel)
        return self._latents_to_tokens(lat)

    def generate_segment(self, prompt: str, duration_s: float,
                         ref_latents=None, steps: int = 30,
                         cfg_scale: float = 2.5, seed: int = 0,
                         negative: str = DRAMABOX_NEGATIVE
                         ) -> np.ndarray:
        n_tok = max(4, int(duration_s * AUDIO_LATENTS_PER_SECOND))
        ctx = jnp.asarray(self.text_fn([prompt]), jnp.float32)
        ctx_n = jnp.asarray(self.text_fn([negative]), jnp.float32)
        lat = ltx2_audio_only_denoise(
            self.params, self.cfg, n_tok, ctx, ctx_n,
            ref_latents=ref_latents, steps=steps,
            cfg_scale=cfg_scale, key=jax.random.key(seed),
            attn_backend=self.attn_backend)
        return self._decode(lat)

    def generate_dramabox(self, script: str, duration_seconds=0.0,
                          duration_multiplier: float = 1.1,
                          ref_latents=None, steps: int = 30,
                          cfg_scale: float = 2.5, seed: int = 0
                          ) -> Dict[str, Any]:
        segs = plan_dramabox_segments(script, seed, duration_seconds,
                                      duration_multiplier)
        pieces = [self.generate_segment(
            s.prompt, s.duration_s, ref_latents=ref_latents,
            steps=steps, cfg_scale=cfg_scale, seed=s.seed)
            for s in segs]
        audio = (np.concatenate(pieces)
                 if pieces else np.zeros(0, np.float32))
        peak = np.abs(audio).max() if audio.size else 0.0
        if peak > 1.0:
            audio = audio * (0.95 / peak)
        return {"audio": audio, "sample_rate": self.sample_rate,
                "segments": len(segs)}

    def generate_scenema(self, script: str, duration_seconds=30.0,
                         ref_latents=None, steps: int = 8,
                         cfg_scale: float = 1.0, seed: int = 0,
                         vc_voice: Optional[np.ndarray] = None,
                         vc_sample_rate: int = 16000,
                         vc_steps: int = 25,
                         vc_cfg_rate: float = 0.5) -> Dict[str, Any]:
        """Single-pass attribute-tagged TTS + optional seed-vc
        conversion (scenema_audio.py + scenema_seedvc)."""
        import re
        header = re.compile(r"^\s*Speaker\s*(\d+)\s*(\{[^\n{}]*\})?"
                            r"\s*:\s*(.*)$", re.IGNORECASE)
        lines = []
        for line in str(script or "").splitlines():
            s = line.strip()
            if not s:
                continue
            m = header.match(s)
            if m:
                attrs = parse_speaker_options(m.group(2))
                prefix = _speaker_prefix(max(1, int(m.group(1))),
                                         attrs)
                body = m.group(3).strip()
                lines.append(_clean_spaces(
                    f"{prefix}: {body}" if prefix else body))
            else:
                lines.append(s)
        prompt = " ".join(lines) or "Natural expressive voice."
        audio = self.generate_segment(
            prompt, duration_seconds, ref_latents=ref_latents,
            steps=steps, cfg_scale=cfg_scale, seed=seed)
        out: Dict[str, Any] = {"audio": audio,
                               "sample_rate": self.sample_rate}
        if vc_voice is not None:
            from ..postprocessing.seedvc import (SeedVCConfig,
                                                 WhisperEncConfig,
                                                 init_seedvc,
                                                 SeedVCConverter)
            conv = SeedVCConverter(
                init_seedvc(jax.random.key(seed),
                            SeedVCConfig.tiny(),
                            WhisperEncConfig.tiny()),
                SeedVCConfig.tiny(), WhisperEncConfig.tiny())
            wav, sr = conv.convert(audio, self.sample_rate,
                                   np.asarray(vc_voice, np.float32),
                                   vc_sample_rate,
                                   diffusion_steps=vc_steps,
                                   inference_cfg_rate=vc_cfg_rate,
                                   seed=seed)
            out["audio"] = wav
            out["sample_rate"] = sr
        return out


class LTXAudioTTSFamilyHandler:
    family = "ltx2_audio"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (26, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        drama = base_model_type == "dramabox_audio"
        out = {"audio_outputs": True, "image_outputs": False,
               "audio_only": True, "group": "tts",
               "any_audio_prompt": True,
               "audio_guide_label": "Voice reference",
               "duration_slider": {"label": "Duration (seconds)",
                                   "min": 0, "max": 300,
                                   "default": 0 if drama else 120}}
        if drama:
            out["custom_settings"] = {"duration_multiplier": 1.1}
        else:
            out["custom_settings"] = {"vc_steps": 25,
                                      "vc_cfg_rate": 0.5,
                                      "pace": 1.5}
        return out

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        if base_model_type == "dramabox_audio":
            return {"prompt": ('Speaker 1: "Hello there." He smiles '
                               "warmly."),
                    "duration_seconds": 0, "num_inference_steps": 30,
                    "guidance_scale": 2.5, "seed": -1}
        return {"prompt": 'Speaker 1 {voice="warm narrator"}: '
                          "Welcome to the show.",
                "duration_seconds": 120, "num_inference_steps": 8,
                "guidance_scale": 1.0, "seed": -1}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/LTX-2/resolve/main/"
        name = ("dramabox-dit-v1_bf16.safetensors"
                if base_model_type == "dramabox_audio"
                else "scenema-audio-transformer_bf16.safetensors")
        return [{"role": "transformer",
                 "urls": model_def.get("URLs", [base + name])},
                {"role": "audio_vae",
                 "urls": [base + "ltx-2-19b_audio_vae.safetensors"]},
                {"role": "vocoder",
                 "urls": [base + "ltx-2-19b_vocoder.safetensors"]},
                {"role": "text_encoder",
                 "urls": [base + "gemma-3-12b-ltx2_bf16.safetensors"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> LTXAudioTTSPipeline:
        import dataclasses as _dc
        if model_def.get("tiny"):
            cfg = LTX2Config(num_layers=1, num_heads=2, head_dim=16,
                             audio_num_heads=2, audio_head_dim=16)
            # z * compressed-mel must equal audio_in_channels (128)
            vcfg = _dc.replace(LTX2AudioVAEConfig(), ch=8,
                               ch_mult=(1, 2), num_res_blocks=1,
                               mel_bins=32, z_channels=8)
            wcfg = _dc.replace(LTX2VocoderConfig(), mel_bins=32,
                               upsample_initial_channel=32,
                               upsample_rates=(4, 4),
                               upsample_kernel_sizes=(8, 8),
                               resblock_kernel_sizes=(3,),
                               resblock_dilations=((1, 3),),
                               stereo=False)
        else:
            cfg = LTX2Config()
            vcfg = LTX2AudioVAEConfig()
            wcfg = LTX2VocoderConfig()
        k1, k2, k3 = jax.random.split(jax.random.key(seed), 3)
        params = init_ltx2_dit(k1, cfg)
        vae = init_ltx2_audio_vae(k2, vcfg)
        voc = init_ltx2_vocoder(k3, wcfg)
        return LTXAudioTTSPipeline(params, cfg, vae, vcfg, voc, wcfg,
                                   attn_backend=attn_backend)

    @staticmethod
    def generate_audio(pipe: LTXAudioTTSPipeline,
                       merged: Dict[str, Any], seed: int, **kw):
        def load(x):
            if isinstance(x, str):
                from ..utils.media import read_wav
                wav, sr = read_wav(x)
                return wav, sr
            return (None if x is None
                    else (np.asarray(x, np.float32), 16000))

        ref = load(merged.get("audio_guide"))
        ref_latents = None
        if ref is not None and ref[0] is not None:
            ref_latents = pipe.encode_reference(ref[0], ref[1])
        cs = merged.get("custom_settings") or {}
        base = merged.get("_model_def", {}).get("architecture") \
            or merged.get("model_type", "")
        if "dramabox" in str(base) or "dramabox" in str(
                merged.get("model_type", "")):
            out = pipe.generate_dramabox(
                merged.get("prompt", ""),
                duration_seconds=float(
                    merged.get("duration_seconds", 0) or 0),
                duration_multiplier=float(
                    cs.get("duration_multiplier", 1.1) or 1.1),
                ref_latents=ref_latents,
                steps=int(merged.get("num_inference_steps") or 30),
                cfg_scale=float(merged.get("guidance_scale", 2.5)),
                seed=seed)
        else:
            vc = load(merged.get("audio_guide2"))
            out = pipe.generate_scenema(
                merged.get("prompt", ""),
                duration_seconds=float(
                    merged.get("duration_seconds", 30) or 30),
                ref_latents=ref_latents,
                steps=int(merged.get("num_inference_steps") or 8),
                cfg_scale=float(merged.get("guidance_scale", 1.0)),
                seed=seed,
                vc_voice=None if vc is None or vc[0] is None
                else vc[0],
                vc_sample_rate=16000 if vc is None else vc[1],
                vc_steps=int(cs.get("vc_steps", 25) or 25),
                vc_cfg_rate=float(cs.get("vc_cfg_rate", 0.5) or 0.5))
        return out
