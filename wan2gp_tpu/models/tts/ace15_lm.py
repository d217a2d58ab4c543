"""ACE-Step 1.5 phase-1 LM utilities — constrained metadata CoT +
audio-code generation (reference
models/TTS/ace_step15/constrained_logits_processor.py:26-2307,
qwen3_audio_codes.py, pipeline_ace_step15.py:468-620,
phase1_constants.py).

The reference builds token-level prefix trees over a concrete Qwen3
tokenizer vocabulary; this module re-expresses the same finite-state
grammar at character level (the tokenizer-free equivalent) plus the
shared validators / formatters, and a `constrained_decode` driver that
takes any next-char distribution function.  With a real LM the driver
plugs into the shared Qwen stack; in tests a toy distribution
exercises the FSM.
"""
from __future__ import annotations

import dataclasses
import re
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

# phase1_constants.py
VALID_LANGUAGES = [
    "ar", "az", "bg", "bn", "ca", "cs", "da", "de", "el", "en",
    "es", "fa", "fi", "fr", "he", "hi", "hr", "ht", "hu", "id",
    "is", "it", "ja", "ko", "la", "lt", "ms", "ne", "nl", "no",
    "pa", "pl", "pt", "ro", "ru", "sa", "sk", "sr", "sv", "sw",
    "ta", "te", "th", "tl", "tr", "uk", "ur", "vi", "yue", "zh",
    "unknown"]
KEYSCALE_NOTES = "ABCDEFG"
KEYSCALE_ACCIDENTALS = ["", "#", "b", "♯", "♭"]
KEYSCALE_MODES = ["major", "minor"]
VALID_KEYSCALES = {f"{n}{a} {m}" for n in KEYSCALE_NOTES
                   for a in KEYSCALE_ACCIDENTALS
                   for m in KEYSCALE_MODES}
BPM_MIN, BPM_MAX = 30, 300
DURATION_MIN, DURATION_MAX = 10, 600
VALID_TIME_SIGNATURES = [2, 3, 4, 6]

_AUDIO_CODE_RE = re.compile(r"<\|audio_code_(\d+)\|>")

# field order in the CoT block (FSMState sequence)
FIELDS = ["bpm", "caption", "duration", "genres", "keyscale",
          "language", "timesignature"]


# ---------------------------------------------------------------------------
# validators / parsers
# ---------------------------------------------------------------------------

def validate_metadata(meta: Dict[str, object]) -> Dict[str, object]:
    """Clamp / normalize a metadata dict to the reference's ranges."""
    out: Dict[str, object] = {}
    if meta.get("bpm") is not None:
        try:
            out["bpm"] = int(np.clip(int(meta["bpm"]), BPM_MIN,
                                     BPM_MAX))
        except (TypeError, ValueError):
            pass
    if meta.get("duration") is not None:
        try:
            d = int(str(meta["duration"]).split()[0])
            out["duration"] = int(np.clip(d, DURATION_MIN,
                                          DURATION_MAX))
        except (ValueError, IndexError):
            pass
    ks = meta.get("keyscale")
    if isinstance(ks, str):
        ks = ks.strip()
        # normalize unicode accidentals (pipeline
        # _normalize_optional_keyscale)
        ks = ks.replace("♯", "#").replace("♭", "b")
        if ks in VALID_KEYSCALES:
            out["keyscale"] = ks
    lang = meta.get("language")
    if isinstance(lang, str) and lang.strip() in VALID_LANGUAGES:
        out["language"] = lang.strip()
    tsig = meta.get("timesignature")
    if tsig is not None:
        try:
            t = int(str(tsig).split("/")[0])
            if t in VALID_TIME_SIGNATURES:
                out["timesignature"] = t
        except ValueError:
            pass
    if isinstance(meta.get("caption"), str) and meta["caption"].strip():
        out["caption"] = postprocess_caption(meta["caption"])
    if isinstance(meta.get("genres"), str) and meta["genres"].strip():
        out["genres"] = meta["genres"].strip()
    return out


def postprocess_caption(caption: str) -> str:
    """constrained_logits_processor.py:342-373: strip code fences /
    newlines, ensure terminal period."""
    c = re.sub(r"```+[a-z]*", "", str(caption))
    c = c.replace("\n", " ").strip()
    if c and not c.endswith("."):
        c += "."
    return c


def parse_metadata(cot_text: str) -> Dict[str, object]:
    """Parse a `<think>...</think>` block of `key: value` lines."""
    m = re.search(r"<think>(.*?)</think>", cot_text, re.DOTALL)
    body = m.group(1) if m else cot_text
    meta: Dict[str, object] = {}
    for line in body.splitlines():
        if ":" not in line:
            continue
        k, v = line.split(":", 1)
        k = k.strip().lstrip("- ").lower()
        if k in FIELDS:
            meta[k] = v.strip()
    return validate_metadata(meta)


def format_cot(meta: Dict[str, object]) -> str:
    """pipeline_ace_step15.py:468-483: sorted-key yaml-style block."""
    items = {}
    for k in ("bpm", "caption", "duration", "keyscale", "language",
              "timesignature"):
        v = meta.get(k)
        if v is None:
            continue
        if k == "timesignature" and isinstance(v, str) \
                and v.endswith("/4"):
            v = v.split("/")[0]
        if isinstance(v, str) and v.isdigit():
            v = int(v)
        items[k] = v
    body = "\n".join(f"{k}: {items[k]}" for k in sorted(items))
    return f"<think>\n{body}\n</think>"


def build_lm_prompt(caption: str, lyrics: str, cot_text: str = "",
                    is_negative: bool = False,
                    negative_prompt: str = "NO USER INPUT") -> str:
    """pipeline_ace_step15.py:485-513 (chat-template-free form)."""
    instruction = ("Analyze the song request and produce metadata "
                   "followed by 5 Hz audio codes.")
    if is_negative:
        cot = "<think>\n</think>"
        cap = (negative_prompt if negative_prompt.strip()
               and negative_prompt != "NO USER INPUT" else caption)
    else:
        cot = cot_text
        cap = caption
    return (f"<|system|># Instruction\n{instruction}\n\n<|user|>"
            f"# Caption\n{cap}\n\n# Lyric\n{lyrics}\n"
            f"<|assistant|>{cot}\n")


def extract_audio_codes(text: str, min_tokens: int = 0,
                        max_tokens: int = 0) -> List[int]:
    """qwen3_audio_codes.py:_AUDIO_CODE_RE + _postprocess: parse
    `<|audio_code_N|>` runs; pad with the last code to min, trim to
    max."""
    codes = [int(m) for m in _AUDIO_CODE_RE.findall(text)]
    if codes and min_tokens and len(codes) < min_tokens:
        codes = codes + [codes[-1]] * (min_tokens - len(codes))
    if max_tokens and len(codes) > max_tokens:
        codes = codes[:max_tokens]
    return codes


def codes_to_text(codes: List[int]) -> str:
    return "".join(f"<|audio_code_{int(c)}|>" for c in codes)


# ---------------------------------------------------------------------------
# character-level FSM (MetadataConstrainedLogitsProcessor grammar)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FSM:
    """Tracks the metadata grammar state; `allowed()` returns the set
    of characters legal at this position, `advance(ch)` consumes one.

    Grammar (constrained_logits_processor.py docstring):
      <think>\n
      bpm: [30-300]\n
      caption: [no newlines, ends with '.']\n
      duration: [10-600]\n
      genres: [free text]\n          (optional, skip_genres)
      keyscale: [A-G][#b]? major|minor\n
      language: [valid code]\n
      timesignature: [2|3|4|6]\n
      </think> then unconstrained audio codes.
    """
    skip_genres: bool = True
    skip_caption: bool = False
    skip_language: bool = False
    user_metadata: Optional[Dict[str, object]] = None
    state: str = "literal"
    buffer: str = ""
    _literal: str = "<think>\n"
    _next_field_idx: int = 0
    done_metadata: bool = False

    def _fields(self) -> List[str]:
        fs = list(FIELDS)
        if self.skip_genres:
            fs.remove("genres")
        if self.skip_caption:
            fs.remove("caption")
        if self.skip_language:
            fs.remove("language")
        return fs

    def _enter_next_field(self):
        fs = self._fields()
        if self._next_field_idx >= len(fs):
            self.state, self._literal = "literal_end", "</think>"
            self.buffer = ""
            return
        f = fs[self._next_field_idx]
        self._next_field_idx += 1
        # user-pinned values are emitted verbatim (set_user_metadata)
        pinned = (self.user_metadata or {}).get(f)
        if pinned is not None:
            self.state = "literal_field"
            self._literal = f"{f}: {pinned}\n"
        else:
            self.state = f"{f}_name"
            self._literal = f"{f}: "
        self.buffer = ""

    def allowed(self) -> Optional[str]:
        """Characters legal now; None = unconstrained (codes phase)."""
        s = self.state
        if s in ("literal", "literal_field", "literal_end"):
            return self._literal[len(self.buffer)]
        if s.endswith("_name"):
            return self._literal[len(self.buffer)]
        if s == "bpm_value":
            return self._numeric_allowed(BPM_MIN, BPM_MAX)
        if s == "duration_value":
            return self._numeric_allowed(DURATION_MIN, DURATION_MAX)
        if s == "timesignature_value":
            if not self.buffer:
                return "".join(str(t) for t in VALID_TIME_SIGNATURES)
            return "\n"
        if s == "keyscale_value":
            return self._prefix_allowed(sorted(VALID_KEYSCALES))
        if s == "language_value":
            return self._prefix_allowed(sorted(VALID_LANGUAGES))
        if s in ("caption_value", "genres_value"):
            # free text without newline until a period closes it
            if self.buffer.endswith(".") and len(self.buffer) > 1:
                return None     # model may emit '\n' or continue
            return None
        if s == "codes":
            return None
        raise AssertionError(s)

    def _numeric_allowed(self, lo, hi) -> str:
        digits = "0123456789"
        ok = [d for d in digits
              if any(str(v).startswith(self.buffer + d)
                     for v in range(lo, hi + 1))]
        out = "".join(ok)
        if self.buffer and lo <= int(self.buffer) <= hi:
            out += "\n"
        return out

    def _prefix_allowed(self, vocab: List[str]) -> str:
        chars = {v[len(self.buffer)] for v in vocab
                 if v.startswith(self.buffer) and len(v)
                 > len(self.buffer)}
        out = "".join(sorted(chars))
        if self.buffer in vocab:
            out += "\n"
        return out

    def advance(self, ch: str):
        s = self.state
        if s in ("literal", "literal_field", "literal_end") \
                or s.endswith("_name"):
            assert ch == self._literal[len(self.buffer)], \
                (s, self.buffer, ch)
            self.buffer += ch
            if self.buffer == self._literal:
                if s == "literal_end":
                    self.state = "codes"
                    self.done_metadata = True
                    self.buffer = ""
                elif s in ("literal", "literal_field"):
                    self._enter_next_field()
                else:
                    self.state = s.replace("_name", "_value")
                    self.buffer = ""
            return
        if ch == "\n" and s.endswith("_value"):
            self._enter_next_field()
            return
        self.buffer += ch

    def text_so_far_valid(self) -> bool:
        return True


def constrained_decode(next_char_fn: Callable[[str], Dict[str, float]],
                       fsm: FSM, max_chars: int = 2000,
                       prompt: str = "") -> str:
    """Greedy character decode under the FSM grammar.  next_char_fn
    maps the text so far to a char->score dict (the LM); illegal chars
    are masked to -inf (the token-mask equivalent of
    _apply_whitelist_inplace)."""
    text = ""
    for _ in range(max_chars):
        allowed = fsm.allowed()
        scores = next_char_fn(prompt + text)
        if allowed is not None:
            scores = {c: v for c, v in scores.items() if c in allowed}
            if not scores:
                # fall back to the grammar's first legal char
                scores = {allowed[0]: 0.0}
        if not scores:
            break
        ch = max(scores, key=scores.get)
        if fsm.state == "codes" and ch == "\x00":
            break
        text += ch
        if fsm.state != "codes":
            fsm.advance(ch)
        if fsm.state == "codes" and fsm.done_metadata \
                and allowed is None and ch == "\n":
            break
    return text
