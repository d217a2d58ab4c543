"""YuE family handler (reference models/TTS/yue_handler.py +
yue/pipeline.py): genre tags + segmented lyrics -> two-stage llama
generation over xcodec tokens -> vocal/instrumental tracks mixed to a
song.
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..models.tts.yue import (YuEConfig, init_yue, stage1_generate,
                              stage2_generate, xcodec_decode)

_TYPES = ["yue", "yue_icl"]


def split_lyrics(lyrics: str) -> List[str]:
    """pipeline.py:71-76 _split_lyrics: sections delimited by
    [verse]/[chorus]/... tags, tag kept with its section."""
    pattern = r"\[(\w+)\](.*?)(?=\[|\Z)"
    segments = re.findall(pattern, lyrics, re.DOTALL)
    out = [f"[{tag}]\n{text.strip()}\n\n" for tag, text in segments]
    return [s for s in out if s.strip()]


class YuEPipeline:
    def __init__(self, params, cfg: YuEConfig, tokenizer=None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer

    def _tokenize(self, text: str, max_len: int = 512):
        cfg = self.cfg
        if self.tokenizer is not None:
            ids, _ = self.tokenizer([text], max_len)
            ids = np.asarray(ids, np.int32)[0]
            ids = ids[ids != 0]
        else:
            raw = text.encode()[:max_len] or b"\x00"
            ids = np.frombuffer(raw, np.uint8).astype(np.int32)
        # keep ids inside the text range (< soa)
        return ids % min(cfg.soa, cfg.vocab_size)

    def generate(self, genres: str, lyrics: str,
                 run_n_segments: int = 2, max_new_tokens: int = 512,
                 temperature: float = 1.0, seed: int = 0):
        cfg = self.cfg
        segments = split_lyrics(lyrics) or [lyrics.strip() or "la la"]
        segments = segments[:max(1, run_n_segments)]
        head_text = ("Generate music from the given lyrics segment by "
                     f"segment.\n[Genre] {genres.strip()}\n"
                     + "\n".join(segments))
        head = self._tokenize(head_text)
        seg_tokens = [self._tokenize(s) for s in segments]
        s1 = stage1_generate(
            self.params, cfg, head, seg_tokens,
            max_new_tokens=max_new_tokens, temperature=temperature,
            key=jax.random.PRNGKey(seed) if temperature > 0 else None)
        vocal = np.concatenate([o["vocal"] for o in s1])
        inst = np.concatenate([o["inst"] for o in s1])
        tracks = {}
        for name, cb0 in (("vocal", vocal), ("inst", inst)):
            codes = stage2_generate(self.params, cfg, cb0)
            tracks[name] = np.asarray(
                xcodec_decode(self.params["codec"], cfg, codes))
        n = min(len(tracks["vocal"]), len(tracks["inst"]))
        mix = tracks["vocal"][:n] + tracks["inst"][:n]
        peak = np.abs(mix).max()
        if peak > 1.0:
            mix = mix / peak
        return {"audio": mix, "vocal": tracks["vocal"],
                "inst": tracks["inst"],
                "sample_rate": cfg.sample_rate,
                "codes_per_track": int(vocal.shape[0])}


class YuEFamilyHandler:
    family = "tts_yue"

    @staticmethod
    def query_supported_types() -> List[str]:
        return list(_TYPES)

    @staticmethod
    def query_family_infos():
        return {"tts": (20, "Audio & TTS")}

    @staticmethod
    def query_model_def(base_model_type, model_def):
        return {"audio_outputs": True, "image_outputs": False,
                "audio_only": True, "group": "tts",
                "no_negative_prompt": True,
                "lyrics_prompt": True}

    @staticmethod
    def default_settings(base_model_type: str) -> Dict[str, Any]:
        return {"prompt": "[verse]\nHello world\n",
                "genres": "pop upbeat female vocal",
                "temperature": 1.0, "seed": -1,
                "run_n_segments": 2, "duration_seconds": 20}

    @staticmethod
    def query_model_files(base_model_type, model_def):
        icl = base_model_type == "yue_icl"
        repo = ("m-a-p/YuE-s1-7B-anneal-en-icl" if icl
                else "m-a-p/YuE-s1-7B-anneal-en-cot")
        return [{"role": "transformer", "urls": model_def.get(
                    "URLs", [f"https://huggingface.co/{repo}"])},
                {"role": "transformer2", "urls": [
                    "https://huggingface.co/m-a-p/YuE-s2-1B-general"]},
                {"role": "codec", "urls": [
                    "https://huggingface.co/m-a-p/xcodec_mini_infer"]}]

    @classmethod
    def load_model(cls, base_model_type, model_def,
                   checkpoints: Optional[Dict[str, str]] = None,
                   dtype=jnp.bfloat16, attn_backend: str = "auto",
                   init_random: bool = False, tokenizer=None,
                   seed: int = 0) -> YuEPipeline:
        cfg = YuEConfig.tiny() if model_def.get("tiny") else YuEConfig()
        params = init_yue(jax.random.key(seed), cfg)
        return YuEPipeline(params, cfg, tokenizer=tokenizer)

    @staticmethod
    def generate_audio(pipe: YuEPipeline, merged: Dict[str, Any],
                       seed: int, **kw):
        # ~1 codec second per 2*fps stage-1 tokens (dual track)
        secs = float(merged.get("duration_seconds", 20))
        max_toks = max(16, int(secs * 2 * pipe.cfg.codec_fps
                               / max(1, int(merged.get(
                                   "run_n_segments", 2)))))
        return pipe.generate(
            merged.get("genres", merged.get("audio_prompt_type", "pop")),
            merged.get("prompt", ""),
            run_n_segments=int(merged.get("run_n_segments", 2)),
            max_new_tokens=min(max_toks, 3000),
            temperature=float(merged.get("temperature", 1.0)),
            seed=seed)
