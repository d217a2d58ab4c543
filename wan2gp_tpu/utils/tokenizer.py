"""Tokenizer wrappers.

The reference wraps HuggingFace tokenizers with text cleaning
(models/wan/modules/tokenizers.py:37 HuggingfaceTokenizer, clean modes
whitespace/lower/canonicalize).  Here: the same interface returning numpy
(ids, mask), loading tokenizer.json files from a local checkpoint dir
(downloaded alongside the text encoder, wan_handler.py:941-948), with a
hash-based fallback tokenizer for environments without tokenizer files
(tests / synthetic runs).
"""
from __future__ import annotations

import html
import re
import string
from typing import Optional, Tuple

import numpy as np


def whitespace_clean(text: str) -> str:
    return re.sub(r"\s+", " ", text).strip()


def basic_clean(text: str) -> str:
    # ftfy is unavailable here; html unescape covers the common cases
    return html.unescape(html.unescape(text)).strip()


def canonicalize(text: str) -> str:
    text = text.replace("_", " ")
    text = text.translate(str.maketrans("", "", string.punctuation))
    return re.sub(r"\s+", " ", text.lower()).strip()


class HFTokenizer:
    """transformers-backed tokenizer (requires local tokenizer files)."""

    def __init__(self, path: str, clean: str = "whitespace"):
        from transformers import AutoTokenizer
        self.tokenizer = AutoTokenizer.from_pretrained(path)
        self.clean = clean

    def _clean(self, text: str) -> str:
        if self.clean == "whitespace":
            return whitespace_clean(basic_clean(text))
        if self.clean == "lower":
            return whitespace_clean(basic_clean(text)).lower()
        if self.clean == "canonicalize":
            return canonicalize(basic_clean(text))
        return text

    def __call__(self, prompts, seq_len: int) -> Tuple[np.ndarray, np.ndarray]:
        prompts = [self._clean(p) for p in prompts]
        enc = self.tokenizer(prompts, padding="max_length", truncation=True,
                             max_length=seq_len, return_tensors="np",
                             add_special_tokens=True)
        return (np.asarray(enc["input_ids"], np.int32),
                np.asarray(enc["attention_mask"], np.int32))


class HashTokenizer:
    """Deterministic hash tokenizer — NOT a real vocabulary.  Lets synthetic
    runs and tests exercise the full text path without tokenizer files."""

    def __init__(self, vocab_size: int = 256384):
        self.vocab_size = vocab_size

    def __call__(self, prompts, seq_len: int) -> Tuple[np.ndarray, np.ndarray]:
        ids = np.zeros((len(prompts), seq_len), np.int32)
        mask = np.zeros((len(prompts), seq_len), np.int32)
        for i, p in enumerate(prompts):
            toks = whitespace_clean(p).split()[:seq_len - 1]
            for j, tok in enumerate(toks):
                ids[i, j] = (hash(tok) % (self.vocab_size - 2)) + 2
            ids[i, len(toks)] = 1  # eos
            mask[i, :len(toks) + 1] = 1
        return ids, mask


def load_tokenizer(path: Optional[str] = None, clean: str = "whitespace"):
    if path:
        try:
            return HFTokenizer(path, clean)
        except Exception:
            pass
    return HashTokenizer()
