"""LRU prompt-embedding cache (reference shared/utils/text_encoder_cache.py:
16 — 100MB budget, keyed by prompt, shared across generations so repeated
prompts skip the T5 forward)."""
from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Optional

import numpy as np


class TextEncoderCache:
    def __init__(self, max_bytes: int = 100 * 1024 * 1024):
        self.max_bytes = max_bytes
        self._store: OrderedDict = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def _size(self, v) -> int:
        return int(np.asarray(v).nbytes)

    def encode(self, encode_fn: Callable, prompt: str, key_extra: str = ""):
        key = (prompt, key_extra)
        if key in self._store:
            self.hits += 1
            self._store.move_to_end(key)
            return self._store[key]
        self.misses += 1
        value = encode_fn(prompt)
        size = self._size(value)
        if size <= self.max_bytes:
            self._store[key] = value
            self._bytes += size
            while self._bytes > self.max_bytes and self._store:
                _, old = self._store.popitem(last=False)
                self._bytes -= self._size(old)
        return value

    def clear(self):
        self._store.clear()
        self._bytes = 0
