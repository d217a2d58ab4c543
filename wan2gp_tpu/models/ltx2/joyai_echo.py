"""JoyAI-Echo: connected multi-window audio-video stories over LTX-2.3
with a compact visual+audio memory bank (reference
models/ltx2/joyai_echo.py, 830 LoC; ltx_pipelines/utils/helpers.py:445
paired_reference_conditionings_by_latents).

Each sliding window may store/load/drop named memories: a memory slot
is ONE video latent frame paired with a short (<=96-latent) audio
window picked around the highest-energy mel response; active slots are
stacked and appended to the next window's token streams as reference
latents pinned at timestep 0 (VideoConditionByReferenceLatent /
AudioConditionByAppendedReferenceLatent).  A Control Video with audio
can pre-seed memory before generation ("name=5s, 12" position syntax).

Window commands (stripped from the prompt): [/duration=10s],
[/overlap=9], [/new_shot], [/store_mem=a,b], [/load_mem=a],
[/load_mem=], [/drop_mem=a], [/no_mem] (deprecated, ignored).

Simplified vs the reference: the memory bank keeps a single phase (our
pipeline is one-stage; the reference stores phase1/phase2 copies for
its two-stage upsampler).
"""
from __future__ import annotations

import dataclasses
import math
import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

CONTROL_MEMORY_SETTING = "joyai_control_memory_positions"
CONTROL_MEMORY_MAX_SECONDS = 60.0
SILENCE_DYNAMIC_RANGE_DB = 6.0
SILENCE_THRESHOLD_FRACTION = 0.35

_NAME_RE = re.compile(r"^[A-Za-z0-9_.-]+$")


# ---------------------------------------------------------------------------
# name / command parsing (joyai_echo.py:153-199, 475-499)
# ---------------------------------------------------------------------------

def _validate_memory_name(value: str, command: str) -> str:
    name = str(value or "").strip()
    if not name or not _NAME_RE.match(name) or name.isdigit():
        raise ValueError(f"JoyAI-Echo {command} memory name '{value}' is "
                         "invalid (letters, digits, '_', '.', '-'; not "
                         "all digits).")
    return name


def _parse_names(value, command: str, require: bool = False) -> List[str]:
    if value is None:
        return []
    items = [v.strip() for v in str(value).split(",") if v.strip()]
    if require and not items:
        raise ValueError(f"JoyAI-Echo {command} requires memory names.")
    return [_validate_memory_name(v, command) for v in items]


def parse_store_mem_option(value) -> List[str]:
    return _parse_names(value, "/store_mem", require=True)


def parse_load_mem_option(value) -> List[str]:
    return _parse_names(value, "/load_mem")


def parse_drop_mem_option(value) -> List[str]:
    return _parse_names(value, "/drop_mem", require=True)


def parse_control_memory_positions(raw_value: str, fps: float,
                                   max_seconds: Optional[float] =
                                   CONTROL_MEMORY_MAX_SECONDS
                                   ) -> List[Tuple[Optional[str], int]]:
    """'man=2s, woman=8s' / '2s, 12' -> [(name|None, frame_idx)]
    (joyai_echo.py:475-491): bare numbers are 1-based frame indices,
    'Ns' values are seconds."""
    positions = []
    for raw in re.split(r"\s*,\s*", raw_value or ""):
        if not raw:
            continue
        name = None
        value = raw.strip()
        if "=" in value:
            name, value = value.split("=", 1)
            name = _validate_memory_name(name, "control_mem")
        value = value.strip().lower()
        seconds = (float(value[:-1]) if value.endswith("s")
                   else (int(value) - 1) / float(fps))
        if max_seconds is not None and seconds > float(max_seconds):
            raise ValueError(
                f"JoyAI-Echo Control Video Memory position '{value}' is "
                f"beyond the first {int(max_seconds)} seconds.")
        frame_idx = (int(round(seconds * float(fps)))
                     if value.endswith("s") else int(value) - 1)
        positions.append((name, max(0, frame_idx)))
    return positions


def validate_control_memory_positions(raw_value: str, fps: float,
                                      max_seconds: float =
                                      CONTROL_MEMORY_MAX_SECONDS
                                      ) -> Optional[str]:
    try:
        parse_control_memory_positions(raw_value, fps,
                                       max_seconds=max_seconds)
    except Exception as exc:
        return str(exc)
    return None


_BRACKET_RE = re.compile(r"\[\s*/([^\[\]]*)\]")


def parse_joyai_window_commands(text: str) -> Tuple[str, Dict[str, Any]]:
    """Strip `[/cmd=value,/cmd2,...]` blocks from one window's prompt
    and return the parsed options.  Commas inside a value that are NOT
    followed by '/' belong to the value ('/store_mem=man1,man2')."""
    opts: Dict[str, Any] = {}

    def handle(block: str):
        # split into commands on ',' boundaries followed by '/'
        parts = re.split(r",\s*(?=/)", "/" + block)
        for part in parts:
            part = part.strip()
            if not part.startswith("/"):
                continue
            body = part[1:]
            if "=" in body:
                cmd, val = body.split("=", 1)
            else:
                cmd, val = body, None
            cmd = cmd.strip().lower()
            if cmd == "duration":
                opts["duration"] = (val or "").strip()
            elif cmd == "overlap":
                opts["overlap"] = (val or "").strip()
            elif cmd == "new_shot":
                opts["new_shot"] = True
            elif cmd == "no_mem":
                opts["no_mem"] = True
            elif cmd == "store_mem":
                opts["store_mem"] = parse_store_mem_option(val)
            elif cmd == "load_mem":
                opts["load_mem"] = parse_load_mem_option(val)
            elif cmd == "drop_mem":
                opts["drop_mem"] = parse_drop_mem_option(val)

    def repl(m):
        handle(m.group(1))
        return ""

    cleaned = _BRACKET_RE.sub(repl, str(text or "")).strip()
    return cleaned, opts


def duration_to_frames(value: str, fps: float, total_frames: int,
                       default: int) -> int:
    """'121' frames / '5s' seconds / '20%' of the request
    (JOYAI_ECHO_PROMPT_INFOS duration forms)."""
    v = str(value or "").strip().lower()
    if not v:
        return default
    if v.endswith("%"):
        return max(1, int(round(float(v[:-1]) / 100.0 * total_frames)))
    if v.endswith("s"):
        return max(1, int(round(float(v[:-1]) * fps)))
    return max(1, int(float(v)))


# ---------------------------------------------------------------------------
# audio window selection (joyai_echo.py:555-609)
# ---------------------------------------------------------------------------

def audio_energy_mask(mono: np.ndarray, samples_per_latent: int,
                      total_frames: int) -> np.ndarray:
    """Per-latent-frame non-silence mask from RMS dB with a dynamic
    floor (joyai_echo.py:568-582)."""
    total_frames = max(1, int(total_frames))
    mono = np.asarray(mono, np.float32).reshape(-1)
    need = total_frames * samples_per_latent
    if len(mono) < need:
        mono = np.pad(mono, (0, need - len(mono)))
    rms = np.sqrt((mono[:need].reshape(total_frames, samples_per_latent)
                   ** 2).mean(axis=1))
    db = 20.0 * np.log10(rms + 1e-8)
    floor = np.quantile(db, 0.2)
    peak = db.max()
    if float(peak - floor) < SILENCE_DYNAMIC_RANGE_DB:
        return np.zeros_like(db, bool)
    threshold = floor + (peak - floor) * SILENCE_THRESHOLD_FRACTION
    return db >= threshold


def max_response_mel_bounds(mel: np.ndarray, window_size: int
                            ) -> Tuple[int, int]:
    """Densest log-mel window (joyai_echo.py:542-553).  mel: [..., T]
    (time last)."""
    mel = np.asarray(mel, np.float32)
    t = mel.shape[-1]
    window_size = max(1, int(window_size))
    max_start = t - window_size if t >= window_size else t - 1
    starts = list(range(0, max_start + 1, max(1, window_size // 4)))
    if starts[-1] != max_start:
        starts.append(max_start)
    offs = np.arange(window_size)
    scores = [np.exp(mel[..., np.clip(s + offs, 0, t - 1)]).sum()
              for s in starts]
    start = int(starts[int(np.argmax(scores))])
    return start, min(start + window_size - 1, t - 1)


def nearest_nonsilent_window_start(start: int, window_len: int,
                                   non_silent: Optional[np.ndarray]
                                   ) -> int:
    if non_silent is None or non_silent.size == 0 \
            or not bool(non_silent.any()):
        return max(0, int(start))
    max_start = max(0, int(non_silent.size) - int(window_len))
    start = max(0, min(int(start), max_start))
    for radius in range(max_start + 1):
        for cand in (start + radius, start - radius):
            if 0 <= cand <= max_start and bool(
                    non_silent[cand:cand + int(window_len)].any()):
                return int(cand)
    return start


def select_audio_window_start(audio_frames: int,
                              mono: Optional[np.ndarray],
                              sample_rate: Optional[int],
                              window_size: int,
                              mel_hop: int = 160,
                              mel_sample_rate: int = 16000,
                              latent_downsample: int = 4,
                              mel: Optional[np.ndarray] = None,
                              center_latent: Optional[int] = None
                              ) -> Tuple[int, int]:
    """(start, length) of the memory audio window in latent frames
    (joyai_echo.py:594-609): centered on `center_latent` when given,
    otherwise on the maximum-response mel region; snapped away from
    silence."""
    total = int(audio_frames)
    window_len = min(total, max(1, int(window_size)))
    if center_latent is None:
        start = max(0, (total - window_len) // 2)
    else:
        start = max(0, min(int(center_latent) - window_len // 2,
                           max(total - window_len, 0)))
    if mono is None or sample_rate is None:
        return start, window_len
    if center_latent is None and mel is not None:
        mel_window = max(1, window_len * latent_downsample
                         - (latent_downsample - 1))
        m0, m1 = max_response_mel_bounds(mel, mel_window)
        center_time = ((m0 + m1 + 1) * 0.5 * mel_hop) / mel_sample_rate
        duration = max(len(mono) / float(sample_rate), 1e-6)
        center_latent = int(round(
            max(0.0, min(center_time, duration)) / duration
            * max(total - 1, 0)))
        start = max(0, min(center_latent - window_len // 2,
                           max(total - window_len, 0)))
    spl = max(1, int(round(float(sample_rate) * mel_hop
                           * latent_downsample / mel_sample_rate)))
    mask = audio_energy_mask(mono, spl, total)
    return nearest_nonsilent_window_start(start, window_len, mask), \
        window_len


def video_idx_from_audio_window(video_frames: int, audio_frames: int,
                                window_start: int, window_len: int,
                                min_idx: int = 0) -> int:
    """joyai_echo.py:611-613."""
    ratio = 0.5 if audio_frames <= 1 else \
        (window_start + max(window_len - 1, 0) * 0.5) / (audio_frames - 1)
    return max(int(min_idx),
               min(int(round(ratio * max(video_frames - 1, 0))),
                   max(video_frames - 1, 0)))


# ---------------------------------------------------------------------------
# memory bank (joyai_echo.py:238-458, single-phase)
# ---------------------------------------------------------------------------

class JoyAIEchoMemoryBank:
    """Slots 1..max_size of named (video slot latent [1, C, 1, h, w],
    audio window latent [1, z, T, m']) pairs, plus a persistent cache
    keyed by name; oldest slot is evicted when full."""

    def __init__(self, max_size: int = 7, num_fix_frames: int = 3,
                 audio_window_size: int = 96):
        self.max_size = max(0, int(max_size))
        self.num_fix_frames = max(0, int(num_fix_frames))
        self.audio_window_size = max(1, int(audio_window_size))
        self.entries: Dict[int, Dict[str, Any]] = {}
        self.cache: Dict[str, Dict[str, Any]] = {}
        self.created_at = 0

    def __len__(self):
        return len(self.entries)

    def _slot_items(self):
        return sorted(self.entries.items())

    def _entry_label(self, slot_id, entry):
        name = entry.get("name")
        return f"{name}[slot {slot_id}]" if name else f"slot {slot_id}"

    def labels(self) -> List[str]:
        return [self._entry_label(s, e) for s, e in self._slot_items()]

    def _next_created_at(self):
        self.created_at += 1
        return self.created_at

    def _slot_for_name(self, name):
        for slot_id, entry in self.entries.items():
            if entry.get("name") == name:
                return slot_id
        return None

    def _oldest_slot(self):
        if not self.entries:
            return None
        return min(self.entries.items(),
                   key=lambda kv: kv[1].get("created_at", 0))[0]

    def _free_slot(self):
        for slot_id in range(1, self.max_size + 1):
            if slot_id not in self.entries:
                return slot_id
        return None

    @staticmethod
    def _copy_entry(entry, name=None):
        copied = {"video": entry.get("video"),
                  "audio": entry.get("audio"),
                  "audio_len": entry.get("audio_len")}
        if name or entry.get("name"):
            copied["name"] = name or entry.get("name")
        if "created_at" in entry:
            copied["created_at"] = entry["created_at"]
        return copied

    def drop(self, names: List[str]) -> List[str]:
        dropped = []
        for name in names:
            slot_id = self._slot_for_name(name)
            if slot_id is None and name not in self.cache:
                raise RuntimeError(f"JoyAI-Echo /drop_mem memory name "
                                   f"'{name}' was not found.")
            if slot_id is not None:
                dropped.append(self._entry_label(slot_id,
                                                 self.entries[slot_id]))
                del self.entries[slot_id]
            elif name in self.cache:
                dropped.append(name)
            self.cache.pop(name, None)
        return dropped

    def load(self, names: List[str]) -> Tuple[List[str], List[str]]:
        requested = list(dict.fromkeys(names))
        req = set(requested)
        discarded = [self._entry_label(s, e) for s, e in
                     self._slot_items() if e.get("name") not in req]
        self.entries = {s: e for s, e in self.entries.items()
                        if e.get("name") in req}
        loaded = [self._entry_label(s, self.entries[s])
                  for s in sorted(self.entries)]
        for name in requested:
            if self._slot_for_name(name) is not None:
                continue
            if name not in self.cache:
                raise RuntimeError(f"JoyAI-Echo /load_mem memory name "
                                   f"'{name}' was not found.")
            label, disc = self._store_named_entry(
                name, self.cache[name], update_cache=False)
            if label is not None:
                loaded.append(label)
            discarded.extend(disc)
        return loaded, discarded

    def _target_slot_for_name(self, name):
        if self.max_size <= 0:
            return None, []
        discarded = []
        slot_id = self._slot_for_name(name) or self._free_slot()
        if slot_id is None:
            slot_id = self._oldest_slot()
            if slot_id is not None:
                discarded.append(self._entry_label(
                    slot_id, self.entries[slot_id]))
        elif slot_id in self.entries:
            discarded.append(self._entry_label(slot_id,
                                               self.entries[slot_id]))
        return slot_id, discarded

    def _store_named_entry(self, name, entry, update_cache=True):
        entry = self._copy_entry(entry, name=name)
        if update_cache:
            self.cache[name] = self._copy_entry(entry, name=name)
        slot_id, discarded = self._target_slot_for_name(name)
        if slot_id is None:
            return None, discarded
        entry["created_at"] = self._next_created_at()
        self.entries[slot_id] = entry
        return self._entry_label(slot_id, entry), discarded

    def _build_entry(self, video_latent, audio_latent=None, mono=None,
                     sample_rate=None, center_ratio=None,
                     audio_cfg=None):
        """One memory entry from a generated window's latents
        (joyai_echo.py:367-386).  video_latent [1, C, F, h, w]; audio
        latent [1, z, T, m']."""
        if video_latent is None:
            return None
        video_latent = np.asarray(video_latent)
        vf = video_latent.shape[2]
        if audio_latent is None:
            vi = (vf // 2 if center_ratio is None else
                  max(0, min(int(round(center_ratio * max(vf - 1, 0))),
                             max(vf - 1, 0))))
            return {"video": video_latent[:, :, vi:vi + 1],
                    "audio": None, "audio_len": None}
        audio_latent = np.asarray(audio_latent)
        ta = audio_latent.shape[2]
        center_latent = None if center_ratio is None else \
            int(round(center_ratio * max(ta - 1, 0)))
        kw = {}
        if audio_cfg is not None:
            kw = dict(mel_hop=audio_cfg.hop_length,
                      mel_sample_rate=audio_cfg.sample_rate,
                      latent_downsample=audio_cfg.latent_downsample)
        start, length = select_audio_window_start(
            ta, mono, sample_rate, self.audio_window_size,
            center_latent=center_latent, **kw)
        vi = video_idx_from_audio_window(vf, ta, start, length)
        return {"video": video_latent[:, :, vi:vi + 1],
                "audio": audio_latent[:, :, start:start + length],
                "audio_len": int(length)}

    def add_generation(self, video_latent, audio_latent=None, mono=None,
                       sample_rate=None, store_selectors=None,
                       audio_cfg=None) -> Tuple[List[str], List[str]]:
        """Store one entry per selector name, sampled at spread center
        ratios (joyai_echo.py:388-410)."""
        selectors = list(store_selectors or [])
        if video_latent is None or not selectors:
            return [], []
        ratios = [None] if len(selectors) <= 1 else \
            [(i + 1) / float(len(selectors) + 1)
             for i in range(len(selectors))]
        stored, discarded = [], []
        for name, ratio in zip(selectors, ratios):
            entry = self._build_entry(video_latent, audio_latent, mono,
                                      sample_rate, center_ratio=ratio,
                                      audio_cfg=audio_cfg)
            if entry is None:
                continue
            label, disc = self._store_named_entry(name, entry)
            if label is not None:
                stored.append(label)
            discarded.extend(disc)
        return stored, discarded

    def add_artificial_memory(self, memory: Dict[str, Any]
                              ) -> Tuple[List[str], List[str]]:
        """Control-video memory: video [1, C, S, h, w] slots + list of
        audio windows (joyai_echo.py:412-435)."""
        video = memory.get("video")
        if video is None:
            return [], []
        video = np.asarray(video)
        audio_slots = memory.get("audio") or []
        names = list(memory.get("names") or [])
        stored, discarded = [], []
        for i in range(video.shape[2]):
            entry = {"video": video[:, :, i:i + 1], "audio": None,
                     "audio_len": None}
            if i < len(audio_slots) and audio_slots[i] is not None:
                a = np.asarray(audio_slots[i])
                entry["audio"] = a
                entry["audio_len"] = int(a.shape[2])
            name = names[i] if i < len(names) and names[i] \
                else f"control{i + 1}"
            label, disc = self._store_named_entry(name, entry)
            if label is not None:
                stored.append(label)
            discarded.extend(disc)
        return stored, discarded

    def video_latent(self) -> Optional[np.ndarray]:
        slots = [e["video"] for _, e in self._slot_items()
                 if e.get("video") is not None]
        return np.concatenate(slots, axis=2) if slots else None

    def audio_latent(self) -> Optional[np.ndarray]:
        slots = [e["audio"] for _, e in self._slot_items()
                 if e.get("audio") is not None]
        return np.concatenate(slots, axis=2) if slots else None

    def audio_segment_lengths(self) -> Optional[Tuple[int, ...]]:
        lens = [e["audio_len"] for _, e in self._slot_items()
                if e.get("audio_len")]
        return tuple(lens) if lens else None

    def paired_audio_memory(self) -> bool:
        v = sum(1 for e in self.entries.values()
                if e.get("video") is not None)
        a = sum(1 for e in self.entries.values()
                if e.get("audio") is not None)
        return v > 0 and v == a


# ---------------------------------------------------------------------------
# paired-memory a2v/v2a cross-attention masks
# (ltx_pipelines/utils/helpers.py:353-442)
# ---------------------------------------------------------------------------

def _slot_ranges(total: int, num_slots: int) -> List[Tuple[int, int]]:
    base = total // num_slots
    rem = total % num_slots
    ranges, start = [], 0
    for i in range(num_slots):
        end = start + base + (1 if i < rem else 0)
        if end > start:
            ranges.append((start, end))
        start = end
    return ranges


def _slot_ranges_from_lengths(lengths, total: int, num_slots: int
                              ) -> List[Tuple[int, int]]:
    if not lengths or len(lengths) != num_slots:
        return _slot_ranges(total, num_slots)
    ranges, start = [], 0
    for raw in lengths:
        end = min(start + max(0, int(raw)), total)
        if end > start:
            ranges.append((start, end))
        start = end
    if start != total:
        return _slot_ranges(total, num_slots)
    return ranges


def build_paired_tail_cross_mask(q_prefix: int, q_mem: int,
                                 kv_prefix: int, kv_mem: int,
                                 num_slots: int, q_seg_lengths=None,
                                 kv_seg_lengths=None) -> np.ndarray:
    """[Q, K] bool: target queries attend target keys; memory slot i's
    queries attend ONLY memory slot i's keys (target<->memory blocked)
    — helpers.py:369-393 _build_paired_tail_cross_mask."""
    mask = np.zeros((q_prefix + q_mem, kv_prefix + kv_mem), bool)
    if q_prefix > 0 and kv_prefix > 0:
        mask[:q_prefix, :kv_prefix] = True
    q_ranges = _slot_ranges_from_lengths(q_seg_lengths, q_mem, num_slots)
    kv_ranges = _slot_ranges_from_lengths(kv_seg_lengths, kv_mem,
                                          num_slots)
    for (q0, q1), (k0, k1) in zip(q_ranges, kv_ranges):
        mask[q_prefix + q0:q_prefix + q1,
             kv_prefix + k0:kv_prefix + k1] = True
    return mask


def build_paired_av_masks(video_prefix: int, video_mem: int,
                          audio_prefix: int, audio_mem: int,
                          num_slots: int, audio_segment_lengths=None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """(video-query [Lv, La], audio-query [La, Lv]) masks for the
    bidirectional a2v/v2a attention when the memory carries paired
    audio (helpers.py:396-442)."""
    v_mask = build_paired_tail_cross_mask(
        video_prefix, video_mem, audio_prefix, audio_mem, num_slots,
        kv_seg_lengths=audio_segment_lengths)
    a_mask = build_paired_tail_cross_mask(
        audio_prefix, audio_mem, video_prefix, video_mem, num_slots,
        q_seg_lengths=audio_segment_lengths)
    return v_mask, a_mask
