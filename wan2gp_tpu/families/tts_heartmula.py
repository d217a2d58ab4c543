"""HeartMuLa music-generation family handler (reference
models/TTS/heartmula_handler.py): tags + lyrics -> 80 ms RVQ frames
(llama backbone + codebook decoder) -> HeartCodec flow matching ->
48 kHz stereo."""
from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.heartmula import (HeartMuLaConfig, init_heartmula,
                                    heartmula_generate,
                                    load_heartmula_params)
from ..models.tts.heartcodec import (HeartCodecConfig,
                                     init_flow_cond,
                                     init_flow_estimator,
                                     init_scalar_decoder,
                                     heartcodec_decode,
                                     load_heartcodec_params)

_TYPES = ["heartmula_3b"]


class HeartMulaPipeline:
    def __init__(self, params, cfg: HeartMuLaConfig, codec=None,
                 codec_cfg: Optional[HeartCodecConfig] = None,
                 tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.codec = codec            # (cond, estimator, decoder) | None
        self.codec_cfg = codec_cfg or HeartCodecConfig()
        self.tokenizer = tokenizer

    def _encode_text(self, text: str, max_len: int = 512):
        if self.tokenizer is not None:
            ids, mask = self.tokenizer([text.lower()], max_len)
            ids = [int(i) for i, m in zip(ids[0], mask[0]) if m]
        else:
            ids = [b % self.cfg.text_vocab_size
                   for b in text.lower().encode()[:max_len]] or [0]
        if not ids or ids[0] != self.cfg.text_bos_id:
            ids = [self.cfg.text_bos_id] + ids
        if ids[-1] != self.cfg.text_eos_id:
            ids = ids + [self.cfg.text_eos_id]
        return ids

    def build_prompt(self, lyrics: str, tags: str):
        """pipeline.py _build_model_inputs:266: <tag>...</tag> ids, one
        muq slot, lyric ids — all on the text column."""
        tags = tags.lower()
        if not tags.startswith("<tag>"):
            tags = f"<tag>{tags}"
        if not tags.endswith("</tag>"):
            tags = f"{tags}</tag>"
        tags_ids = self._encode_text(tags)
        lyrics_ids = self._encode_text(lyrics)
        muq_idx = len(tags_ids)
        n = len(tags_ids) + 1 + len(lyrics_ids)
        nq = self.cfg.audio_num_codebooks
        tokens = np.zeros((n, nq + 1), np.int32)
        tokens[:len(tags_ids), -1] = tags_ids
        tokens[len(tags_ids) + 1:, -1] = lyrics_ids
        mask = np.zeros((n, nq + 1), bool)
        mask[:, -1] = True
        return tokens, mask, muq_idx

    def generate(self, lyrics: str, tags: str = "",
                 max_audio_seconds: float = 8.0,
                 temperature: float = 0.9, topk: int = 50,
                 cfg_scale: float = 1.5, codec_steps: int = 10,
                 codec_guidance: float = 1.25, seed: int = 0):
        tokens, mask, muq_idx = self.build_prompt(lyrics, tags)
        max_frames = max(int(max_audio_seconds * 1000) // 80, 2)
        codes, valid = heartmula_generate(
            self.params, self.cfg, jnp.asarray(tokens),
            jnp.asarray(mask), max_frames=max_frames,
            temperature=temperature, topk=topk, cfg_scale=cfg_scale,
            muq_embed=np.zeros((self.cfg.muq_dim,), np.float32),
            muq_idx=muq_idx,
            key=jax.random.key(seed) if temperature > 0 else None)
        n_valid = max(int(np.asarray(valid).sum()), 1)
        out = {"codes": np.asarray(codes)[:n_valid],
               "n_frames": n_valid}
        if self.codec is not None:
            cond, est, dec = self.codec
            ccfg = self.codec_cfg
            dec_codes = jnp.clip(
                jnp.asarray(out["codes"]).T[None], 0,
                ccfg.codebook_size - 1)              # [1, Q, T]
            wave = heartcodec_decode(cond, est, dec, ccfg, dec_codes,
                                     num_steps=codec_steps,
                                     guidance_scale=codec_guidance,
                                     key=jax.random.key(seed + 1))
            out["audio"] = np.asarray(wave).T        # [samples, 2]
            out["sample_rate"] = ccfg.sample_rate
        return out


class HeartMulaFamilyHandler:
    family = "tts_heartmula"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"music": (22, "Music Generation")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "music",
                "no_negative_prompt": True}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "", "alt_prompt": "piano,happy",
                "temperature": 0.9, "seed": -1,
                "duration_seconds": 30,
                "guidance_scale": 1.5}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        base = "https://huggingface.co/DeepBeepMeep/TTS/resolve/main/"
        return [{"role": "transformer", "urls": model_def.get(
                    "URLs", [base + "HeartMula_3B_bf16.safetensors"])},
                {"role": "codec", "urls": [
                    base + "HeartMula_codec.safetensors"]},
                {"role": "tokenizer", "urls": [
                    base + "heartmula/tokenizer.json"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> HeartMulaPipeline:
        cfg = HeartMuLaConfig(compute_dtype=dtype)
        ccfg = HeartCodecConfig()
        codec = None
        if init_random:
            params = init_heartmula(jax.random.key(seed), cfg, dtype)
        else:
            from ..io.safetensors_reader import load_weights
            params, left = load_heartmula_params(
                load_weights(checkpoints["transformer"]), cfg, dtype)
            if left:
                raise ValueError(f"unconsumed heartmula keys: {left[:8]}")
            if checkpoints.get("codec"):
                cond, est, dec, _ = load_heartcodec_params(
                    load_weights(checkpoints["codec"]), ccfg)
                codec = (cond, est, dec)
            if tokenizer is None and checkpoints.get("tokenizer"):
                from ..utils.tokenizer import load_tokenizer
                tokenizer = load_tokenizer(checkpoints["tokenizer"])
        return HeartMulaPipeline(params, cfg, codec=codec,
                                 codec_cfg=ccfg, tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: HeartMulaPipeline, settings: Dict[str, Any],
                       seed: int = 0):
        out = pipe.generate(
            lyrics=settings.get("prompt", ""),
            tags=settings.get("alt_prompt", ""),
            max_audio_seconds=float(settings.get("duration_seconds", 8)),
            temperature=float(settings.get("temperature", 0.9)),
            cfg_scale=float(settings.get("guidance_scale", 1.5)),
            seed=seed)
        return out
