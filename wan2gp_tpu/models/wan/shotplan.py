"""Wan ShotPlan: planned hard cuts via injected planning tokens.

TPU-native re-implementation of /root/reference/models/wan/shotplan.py
and shared/prompt_relay.py (parse only):
- prompt relay syntax: an optional unbracketed global description
  followed by `[start:end] caption` segment lines where bounds are
  percentages (``33%``), seconds (``2.5s``) or frame numbers (``17``);
- compile_shotplan_prompt:15 — resolve segment bounds to [0,1] ratios,
  validate contiguity, emit the compiled ``Shot N:`` prompt plus the
  output-frame indices where hard cuts begin;
- inject_shotplan_tokens:44 — insert one learned ``hardcut_embedding``
  token between the latent frames that straddle each cut, at fractional
  temporal RoPE position ``1 + frame/vae_scale`` with zero spatial
  phases; the tokens participate in every block's attention and are
  dropped before the head (model.py:1724-1733, 1994-1995).

The injection is compiled host-side into static gather maps so the
jitted forward stays shape-static.
"""
from __future__ import annotations

import dataclasses
import re
from typing import List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ...ops.rope import _axis_freqs

_MARKER = re.compile(r"^\s*\[([^\]]+)\]\s*(.*)$")
_SECONDS = re.compile(r"^(\d+(?:\.\d+)?)\s*(?:s|sec|secs|second|seconds)$",
                      re.IGNORECASE)


@dataclasses.dataclass(frozen=True)
class RelayBound:
    value: float
    unit: str             # percent | frame | seconds

    def resolve(self, total_seconds: float, total_frames: int,
                inclusive_end: bool = False) -> float:
        if self.unit == "percent":
            return min(max(self.value, 0.0), 1.0)
        if self.unit == "frame":
            if total_frames <= 1:
                return 0.0
            idx = self.value if inclusive_end else self.value - 1.0
            return min(max(max(idx, 0.0) / (total_frames - 1), 0.0), 1.0)
        if total_seconds <= 0:
            return 0.0
        return min(max(self.value / total_seconds, 0.0), 1.0)


@dataclasses.dataclass(frozen=True)
class RelaySegment:
    start: RelayBound
    end: Optional[RelayBound]
    prompt: str


@dataclasses.dataclass(frozen=True)
class RelayPlan:
    global_prompt: str
    segments: Tuple[RelaySegment, ...]


def _parse_bound(text: str) -> Optional[RelayBound]:
    text = text.strip()
    if not text:
        return None
    if text.endswith("%"):
        try:
            return RelayBound(float(text[:-1]) / 100.0, "percent")
        except ValueError:
            return None
    m = _SECONDS.match(text)
    if m:
        return RelayBound(float(m.group(1)), "seconds")
    try:
        return RelayBound(float(text), "frame")
    except ValueError:
        return None


def parse_prompt_relay(prompt: str) -> Optional[RelayPlan]:
    """Parse the relay syntax; None when the prompt has no segment
    markers (shared/prompt_relay.py parse_prompt_relay)."""
    global_lines: List[str] = []
    segments: List[RelaySegment] = []
    for line in (prompt or "").splitlines():
        m = _MARKER.match(line)
        if not m:
            if not segments and line.strip():
                global_lines.append(line.strip())
            continue
        bounds = m.group(1).split(":")
        start = _parse_bound(bounds[0])
        end = (_parse_bound(bounds[1])
               if len(bounds) > 1 and bounds[1].strip() else None)
        if start is None:
            continue
        segments.append(RelaySegment(start, end, m.group(2).strip()))
    if not segments:
        return None
    return RelayPlan(" ".join(global_lines), tuple(segments))


@dataclasses.dataclass(frozen=True)
class ShotPlanPrompt:
    prompt: str
    cut_frames: Tuple[int, ...]


def compile_shotplan_prompt(prompt: str, num_frames: int,
                            fps: float) -> ShotPlanPrompt:
    """shotplan.py:15-41: resolve bounds, validate contiguity, emit the
    ``Shot N:`` compiled prompt + output-frame cut indices."""
    plan = parse_prompt_relay(prompt)
    if plan is None:
        return ShotPlanPrompt(prompt, ())
    total_seconds = (num_frames - 1) / fps
    ranges = []
    for seg in plan.segments:
        start = seg.start.resolve(total_seconds, num_frames)
        end = (1.0 if seg.end is None
               else seg.end.resolve(total_seconds, num_frames,
                                    inclusive_end=True))
        ranges.append((start, end))
    if ranges[0][0] != 0:
        raise ValueError("the first ShotPlan segment must start at 0")
    for prev, cur in zip(ranges, ranges[1:]):
        if abs(prev[1] - cur[0]) > 1e-6:
            raise ValueError("ShotPlan segments must be contiguous")
    if abs(ranges[-1][1] - 1.0) > 1e-6:
        raise ValueError("the final ShotPlan segment must reach the end")
    cut_frames = tuple(round(start * (num_frames - 1))
                       for start, _ in ranges[1:])
    if len(set(cut_frames)) != len(cut_frames):
        raise ValueError("each ShotPlan segment must begin on a distinct "
                         "frame")
    shots = "\n".join(f"Shot {i}: {seg.prompt}"
                      for i, seg in enumerate(plan.segments, 1))
    compiled = (f"{plan.global_prompt}\n{shots}" if plan.global_prompt
                else shots)
    return ShotPlanPrompt(compiled, cut_frames)


@dataclasses.dataclass(frozen=True)
class ShotPlanInjection:
    """Static gather plan for hardcut-token injection."""
    src_map: np.ndarray       # [L'] indices into concat(x, cut_tokens)
    keep_idx: np.ndarray      # [L] positions of original tokens in x'
    cos: jnp.ndarray          # [L', head_dim//2] replacement rope
    sin: jnp.ndarray
    n_cut: int


def build_shotplan_injection(grid_fhw, cut_frames: Sequence[int],
                             rope_cos, rope_sin, head_dim: int = 128,
                             vae_scale: int = 4,
                             theta: float = 10000.0) -> ShotPlanInjection:
    """Compile inject_shotplan_tokens (shotplan.py:44-72) into static
    index maps.  Cut token for output frame f sits after latent frame
    floor(pos)-? — reference: inserted after latent frame `frame` when
    frame < 1 + f/vae_scale <= frame+1 — at temporal rope position
    1 + f/vae_scale with zero spatial phases."""
    f, h, w = (int(v) for v in grid_fhw)
    s = h * w
    if head_dim == 128:
        dims = (44, 42, 42)
    else:
        d_sp = 2 * ((head_dim // 6) // 2) * 2
        dims = (head_dim - 2 * d_sp, d_sp, d_sp)
    cut_positions = [1.0 + cf / vae_scale for cf in cut_frames]

    cos_np = np.asarray(rope_cos)
    sin_np = np.asarray(rope_sin)
    src, keep, cos_parts, sin_parts = [], [], [], []
    n_inserted = 0
    L = f * s
    for frame in range(f):
        start = frame * s
        keep.extend(range(start + n_inserted, start + n_inserted + s))
        src.extend(range(start, start + s))
        cos_parts.append(cos_np[start:start + s])
        sin_parts.append(sin_np[start:start + s])
        for ci, pos in enumerate(cut_positions):
            if frame < pos <= frame + 1:
                ang_t = _axis_freqs(dims[0], np.asarray([pos]), theta)
                ang_s = np.zeros((1, (dims[1] + dims[2]) // 2))
                ang = np.concatenate([ang_t, ang_s], axis=1)
                cos_parts.append(np.cos(ang))
                sin_parts.append(np.sin(ang))
                src.append(L + ci)
                n_inserted += 1
    return ShotPlanInjection(
        src_map=np.asarray(src, np.int32),
        keep_idx=np.asarray(keep, np.int32),
        cos=jnp.asarray(np.concatenate(cos_parts), jnp.float32),
        sin=jnp.asarray(np.concatenate(sin_parts), jnp.float32),
        n_cut=len(cut_positions))
