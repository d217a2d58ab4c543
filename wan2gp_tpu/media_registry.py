"""Registry of generated media for the agent.

Counterpart of the reference registry (shared/deepy/media_registry.py:
register_media:83, resolve_media_reference:203, _rank_records:254): every
generated artifact gets a short id plus a label and prompt summary, and
natural-language references ("the last video", "previous image",
"m3", "the cat clip") resolve to a record by alias, id, path, or token
overlap.  Implemented as a standalone class instead of mutating a Gradio
session dict."""
from __future__ import annotations

import itertools
import os
import re
import time
from typing import Any, Dict, List, Optional, Tuple

_ALIAS_PREVIOUS = re.compile(
    r"\b(previous|prior|before\s+last|second\s+last|penultimate)\b", re.I)
_ALIAS_LAST = re.compile(r"\b(last|latest|most\s+recent)\b", re.I)

_VIDEO_EXT = {".avi", ".mp4", ".gif", ".webm", ".mkv"}
_AUDIO_EXT = {".wav", ".mp3", ".flac", ".ogg"}
_IMAGE_EXT = {".png", ".jpg", ".jpeg", ".webp", ".bmp", ".zip"}


def detect_media_type(path: str) -> str:
    ext = os.path.splitext(path)[1].lower()
    if ext in _VIDEO_EXT:
        return "video"
    if ext in _AUDIO_EXT:
        return "audio"
    if ext in _IMAGE_EXT:
        return "image"
    return "any"


def _tokens(text: Optional[str]) -> List[str]:
    return re.findall(r"[a-z0-9]+", (text or "").lower())


def summarize_prompt(prompt: str, limit: int = 12) -> str:
    words = (prompt or "").split()
    return " ".join(words[:limit]) + ("…" if len(words) > limit else "")


class MediaRegistry:
    def __init__(self, max_items: int = 200):
        self.max_items = max_items
        self._records: List[Dict[str, Any]] = []
        self._counter = itertools.count(1)

    def register(self, path: str, media_type: Optional[str] = None,
                 prompt: str = "", settings: Optional[Dict[str, Any]] = None,
                 label: Optional[str] = None) -> Dict[str, Any]:
        """Add (or refresh) a record; newest first, ids m1, m2, ..."""
        mtype = media_type or detect_media_type(path)
        existing = self._by_path(path)
        if existing is not None:
            existing.update({"media_type": mtype,
                             "prompt": prompt or existing.get("prompt", ""),
                             "settings": settings or
                             existing.get("settings", {}),
                             "created": time.time()})
            self._records.sort(key=lambda r: -r["created"])
            return existing
        rec = {"media_id": f"m{next(self._counter)}",
               "path": os.path.abspath(path),
               "media_type": mtype,
               "label": label or os.path.basename(path),
               "prompt": prompt,
               "prompt_summary": summarize_prompt(prompt),
               "settings": dict(settings or {}),
               "created": time.time()}
        self._records.insert(0, rec)
        del self._records[self.max_items:]
        return rec

    def get(self, media_id: str) -> Optional[Dict[str, Any]]:
        mid = media_id.strip().lower()
        for r in self._records:
            if r["media_id"] == mid:
                return r
        return None

    def list(self, media_type: str = "any", limit: int = 20
             ) -> List[Dict[str, Any]]:
        return [self._compact(r)
                for r in self._filtered(media_type)[:limit]]

    def resolve(self, reference: str, media_type: str = "any"
                ) -> Dict[str, Any]:
        """Natural-language reference -> record
        (media_registry.py resolve_media_reference:203)."""
        ref = (reference or "").strip()
        records = self._filtered(media_type)
        if not records:
            return {"status": "empty", "reference": ref,
                    "error": "no generated media registered yet"}
        # explicit id or path first
        byid = self.get(ref)
        if byid is not None:
            return self._resolved(byid, "matched media id")
        for r in records:
            if os.path.abspath(ref) == r["path"] or \
                    os.path.basename(ref) == os.path.basename(r["path"]):
                return self._resolved(r, "matched path")
        if _ALIAS_PREVIOUS.search(ref):
            if len(records) > 1:
                return self._resolved(records[1], "matched 'previous'")
            return {"status": "empty", "reference": ref,
                    "error": "only one item registered"}
        if _ALIAS_LAST.search(ref) or not ref:
            return self._resolved(records[0], "matched 'last'")
        ranked = self._rank(records, ref)
        if ranked:
            return self._resolved(ranked[0][0], ranked[0][1])
        return {"status": "ambiguous", "reference": ref,
                "candidates": [self._compact(r) for r in records[:5]]}

    # -- internals ----------------------------------------------------

    def _by_path(self, path: str) -> Optional[Dict[str, Any]]:
        ap = os.path.abspath(path)
        for r in self._records:
            if r["path"] == ap:
                return r
        return None

    def _filtered(self, media_type: str) -> List[Dict[str, Any]]:
        if media_type in (None, "", "any"):
            return list(self._records)
        return [r for r in self._records
                if r["media_type"] == media_type]

    def _rank(self, records, reference: str
              ) -> List[Tuple[Dict[str, Any], str]]:
        """Token-overlap ranking over label/prompt/filename
        (media_registry.py _rank_records:254)."""
        ref_toks = set(_tokens(reference))
        if not ref_toks:
            return []
        scored = []
        for r in records:
            hay = set(_tokens(r["label"])) | set(_tokens(r["prompt"])) \
                | set(_tokens(os.path.basename(r["path"])))
            hit = ref_toks & hay
            if hit:
                scored.append((len(hit), r,
                               f"matched tokens {sorted(hit)[:4]}"))
        scored.sort(key=lambda s: (-s[0], s[1]["created"] * -1))
        return [(r, why) for _, r, why in scored]

    @staticmethod
    def _compact(r: Dict[str, Any]) -> Dict[str, Any]:
        return {"media_id": r["media_id"], "path": r["path"],
                "media_type": r["media_type"], "label": r["label"],
                "prompt_summary": r["prompt_summary"]}

    def _resolved(self, r, why: str) -> Dict[str, Any]:
        out = {"status": "resolved", "why": why}
        out.update(self._compact(r))
        return out
