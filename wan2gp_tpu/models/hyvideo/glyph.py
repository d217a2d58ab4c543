"""HV1.5 glyph text branch: byT5-small encoder + prompt formatting.

Reference: /root/reference/models/hyvideo/text_encoder/byT5/__init__.py
(byt5-small T5 v1.1 encoder with Glyph-SDXL-v2 weights),
format_prompt.py:56 (``Text "{text}". `` formatting; color/font special
tokens unused by the HV pipeline which passes styles of None,
pipeline_hunyuan_video.py:1028), and pipeline_hunyuan_video.py:993-1041
(quoted-text extraction -> byt5 tokens -> encoder -> [1, 256, 1472]
embeddings, zeros when the prompt has no quoted text).

The byT5 tokenizer is byte-level: utf-8 bytes + 3 (0 pad / 1 eos /
2 unk), eos appended — re-derived here, no vocab file needed.
"""
from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np
import jax.numpy as jnp

from ..wan.t5 import T5Config, t5_encode

# google/byt5-small encoder geometry (d_model 1472, inner 6*64, gated
# gelu, shared rel-pos table on block 0); vocab 384 (+ Glyph-SDXL-v2
# color/font special tokens in the shipped checkpoint's embedding table)
BYT5_SMALL = T5Config(vocab_size=384, dim=1472, dim_attn=384,
                      dim_ffn=3584, num_heads=6, num_layers=12,
                      num_buckets=32, max_dist=128, shared_pos=True)

_GLYPH_RE = re.compile(r'\"(.*?)\"|“(.*?)”')


def extract_glyph_texts(prompt: str) -> List[str]:
    """Quoted substrings, deduplicated in order
    (pipeline_hunyuan_video.py:993-1007)."""
    matches = _GLYPH_RE.findall(prompt or "")
    result = [a or b for a, b in matches]
    return list(dict.fromkeys(result)) if len(result) > 1 else result


def format_glyph_prompt(texts: List[str]) -> str:
    """format_prompt.py:56-86 with styles of None."""
    return "".join(f'Text "{t}". ' for t in texts)


def byt5_tokenize(text: str, max_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """ByT5 byte tokenizer: utf-8 + 3, eos=1, pad=0, truncated to
    max_len.  Returns (ids [1, max_len], mask [1, max_len])."""
    raw = list(text.encode("utf-8"))[: max_len - 1]
    ids = np.zeros((1, max_len), np.int32)
    mask = np.zeros((1, max_len), np.int32)
    toks = [b + 3 for b in raw] + [1]
    ids[0, :len(toks)] = toks
    mask[0, :len(toks)] = 1
    return ids, mask


def make_byt5_encode_fn(params, cfg: T5Config = BYT5_SMALL,
                        max_len: int = 256):
    """Returns encode(prompt) -> (embeddings [1, max_len, dim], mask
    [1, max_len]); zeros when the prompt carries no quoted glyph text
    (pipeline_hunyuan_video.py:1022-1039)."""

    def encode(prompt: str):
        texts = extract_glyph_texts(prompt)
        if not texts:
            return (jnp.zeros((1, max_len, cfg.dim), jnp.float32),
                    jnp.zeros((1, max_len), jnp.int32))
        ids, mask = byt5_tokenize(format_glyph_prompt(texts), max_len)
        out = t5_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
        return out.astype(jnp.float32), jnp.asarray(mask)

    return encode
