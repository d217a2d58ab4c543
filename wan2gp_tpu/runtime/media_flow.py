"""Media Flow — chunked long-video batch processing (reference
plugins/media_flow/: frame_planning.py, prompt_schedule.py,
chunk_executor.py, continuation_recovery.py; "batch outpainting,
deblurring and compression-artifact removal optimized for long videos
with low RAM").

The Gradio tab machinery is replaced by a headless runner: a chunk
planner aligned to the model's VAE temporal stride, MM:SS(.xx) timed
prompt schedules resolved per chunk, a process callback (any service
generate / upscale function), a crash-resumable session file that
skips completed chunks, and overlap cross-fade when concatenating.
"""
from __future__ import annotations

import dataclasses
import json
import math
import os
import re
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

TIMED_PROMPT_RE = re.compile(r"^\d{1,2}:\d{2}(?::\d{2})?(?:\.\d+)?$")


# ---------------------------------------------------------------------------
# prompt schedule (prompt_schedule.py:12-85)
# ---------------------------------------------------------------------------

def parse_time_input(value, allow_empty: bool = False
                     ) -> Optional[float]:
    """seconds | MM:SS(.xx) | HH:MM:SS(.xx) -> seconds."""
    if value is None:
        return None if allow_empty else 0.0
    if isinstance(value, (int, float)):
        if not math.isfinite(float(value)):
            raise ValueError("time must be finite")
        return max(0.0, float(value))
    text = str(value).strip()
    if not text:
        return None if allow_empty else 0.0
    if ":" not in text:
        return max(0.0, float(text))
    parts = text.split(":")
    if len(parts) == 2:
        return max(0.0, int(parts[0]) * 60.0 + float(parts[1]))
    if len(parts) == 3:
        return max(0.0, int(parts[0]) * 3600.0 + int(parts[1]) * 60.0
                   + float(parts[2]))
    raise ValueError(f"bad time value {value!r}")


def parse_prompt_schedule(prompt_text: str
                          ) -> List[Tuple[float, str]]:
    """Blank-line separated blocks each starting with a timestamp;
    plain text becomes a single (0, text) entry."""
    text = str(prompt_text or "").replace("\r\n", "\n").strip()
    if not text:
        return [(0.0, "")]
    blocks = [b.strip() for b in re.split(r"\n\s*\n", text)
              if b.strip()]
    first = text.split("\n", 1)[0].strip()
    if len(blocks) <= 1 and not TIMED_PROMPT_RE.fullmatch(first):
        return [(0.0, text)]
    sched = []
    for block in blocks:
        lines = block.split("\n")
        ts = lines[0].strip()
        if not TIMED_PROMPT_RE.fullmatch(ts):
            raise ValueError(
                "timed prompt blocks must start with MM:SS(.xx) or "
                "HH:MM:SS(.xx)")
        body = "\n".join(lines[1:]).strip()
        if not body:
            raise ValueError("timed prompt block has no text")
        sched.append((float(parse_time_input(ts)), body))
    return sorted(sched, key=lambda it: it[0])


def resolve_prompt_for_chunk(schedule: List[Tuple[float, str]],
                             chunk_start_seconds: float,
                             default_prompt: str = "") -> str:
    out = str(default_prompt or "")
    for start, prompt in schedule:
        if float(start) <= chunk_start_seconds + 1e-9:
            out = prompt
        else:
            break
    return out


# ---------------------------------------------------------------------------
# frame planning (frame_planning.py)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ChunkPlan:
    start_frame: int
    frames: int
    overlap: int


def align_requested_frames(frame_count: int, frame_step: int,
                           round_up: bool = True) -> int:
    """Wan-style 4k+1 alignment (frame_planning.py:50-55)."""
    if frame_count <= 1:
        return 1
    f = (math.ceil if round_up else math.floor)(
        (frame_count - 1) / float(frame_step))
    return int(f * frame_step + 1)


def plan_chunks(total_frames: int, fps: float, chunk_seconds: float,
                overlap_frames: int = 0, frame_step: int = 4,
                min_frames: int = 5) -> List[ChunkPlan]:
    """Split a long clip into step-aligned chunks with `overlap_frames`
    of context carried from the previous chunk."""
    if chunk_seconds < 0.1:
        raise ValueError("chunk size must be at least 0.1 seconds")
    if fps <= 0:
        raise ValueError("fps must be positive")
    chunk = align_requested_frames(
        max(int(round(chunk_seconds * fps)), min_frames), frame_step)
    overlap = max(0, (overlap_frames // frame_step) * frame_step)
    if overlap >= chunk:
        raise ValueError("overlap must be smaller than the chunk")
    plans: List[ChunkPlan] = []
    pos = 0
    while pos < total_frames:
        start = max(0, pos - (overlap if plans else 0))
        n = min(chunk, total_frames - start)
        if plans and n <= overlap:
            break                     # the tail is already covered
        n = align_requested_frames(n, frame_step, round_up=False)
        n = max(n, 1)
        plans.append(ChunkPlan(start, n,
                               overlap if plans else 0))
        pos = start + n
    return plans


# ---------------------------------------------------------------------------
# runner with continuation recovery
# ---------------------------------------------------------------------------

class MediaFlowRunner:
    """Processes a [T, H, W, 3] uint8 video chunk-by-chunk.

    process_fn(frames, prompt, chunk_index) -> processed frames (same
    T, any H'/W').  A session file records finished chunk outputs so an
    interrupted run resumes where it stopped
    (continuation_recovery.py:38-160 merge_residual_continuations)."""

    def __init__(self, process_fn: Callable, session_dir: str,
                 frame_step: int = 4, min_frames: int = 5):
        self.process_fn = process_fn
        self.session_dir = session_dir
        self.frame_step = frame_step
        self.min_frames = min_frames
        os.makedirs(session_dir, exist_ok=True)

    def _state_path(self) -> str:
        return os.path.join(self.session_dir, "media_flow_state.json")

    def _chunk_path(self, i: int) -> str:
        return os.path.join(self.session_dir, f"chunk_{i:04d}.npz")

    def _load_state(self) -> Dict[str, Any]:
        try:
            with open(self._state_path()) as f:
                return json.load(f)
        except (OSError, ValueError):
            return {"done": []}

    def _save_state(self, state: Dict[str, Any]) -> None:
        tmp = self._state_path() + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._state_path())

    def run(self, video: np.ndarray, fps: float,
            chunk_seconds: float = 4.0, overlap_frames: int = 4,
            prompt_text: str = "",
            on_progress: Optional[Callable] = None) -> np.ndarray:
        video = np.asarray(video)
        plans = plan_chunks(video.shape[0], fps, chunk_seconds,
                            overlap_frames, self.frame_step,
                            self.min_frames)
        schedule = parse_prompt_schedule(prompt_text)
        state = self._load_state()
        done = set(state.get("done", []))
        outputs: List[Optional[np.ndarray]] = [None] * len(plans)
        for i, plan in enumerate(plans):
            if i in done and os.path.exists(self._chunk_path(i)):
                outputs[i] = np.load(self._chunk_path(i))["frames"]
                continue
            frames = video[plan.start_frame:plan.start_frame
                           + plan.frames]
            prompt = resolve_prompt_for_chunk(
                schedule, plan.start_frame / fps)
            out = np.asarray(self.process_fn(frames, prompt, i))
            if out.shape[0] != frames.shape[0]:
                # frame-count mismatch reconciliation
                # (continuation_recovery.py:104-147): trim or repeat
                # the tail to the planned length
                if out.shape[0] > frames.shape[0]:
                    out = out[:frames.shape[0]]
                else:
                    pad = frames.shape[0] - out.shape[0]
                    out = np.concatenate(
                        [out, np.repeat(out[-1:], pad, axis=0)], 0)
            np.savez_compressed(self._chunk_path(i), frames=out)
            outputs[i] = out
            done.add(i)
            self._save_state({"done": sorted(done),
                              "n_chunks": len(plans)})
            if on_progress:
                on_progress(i + 1, len(plans))
        return self._concat(plans, outputs)

    @staticmethod
    def _concat(plans: List[ChunkPlan],
                outputs: List[np.ndarray]) -> np.ndarray:
        """Overlap cross-fade concatenation (mux_session.py role)."""
        pieces: List[np.ndarray] = []
        for i, (plan, out) in enumerate(zip(plans, outputs)):
            if i == 0 or plan.overlap == 0:
                pieces.append(out)
                continue
            ov = min(plan.overlap, out.shape[0],
                     pieces[-1].shape[0] if pieces else 0)
            if ov > 0:
                prev_tail = pieces[-1][-ov:].astype(np.float32)
                head = out[:ov].astype(np.float32)
                w = np.linspace(0.0, 1.0, ov + 2)[1:-1]
                w = w.reshape(-1, *([1] * (out.ndim - 1)))
                blend = prev_tail * (1 - w) + head * w
                pieces[-1] = np.concatenate(
                    [pieces[-1][:-ov],
                     blend.astype(out.dtype)], axis=0)
                pieces.append(out[ov:])
            else:
                pieces.append(out)
        return np.concatenate(pieces, axis=0)

    def clear_session(self) -> None:
        state = self._load_state()
        for i in state.get("done", []):
            try:
                os.remove(self._chunk_path(i))
            except OSError:
                pass
        try:
            os.remove(self._state_path())
        except OSError:
            pass
