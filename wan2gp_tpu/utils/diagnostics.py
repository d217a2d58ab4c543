"""Crash diagnostics, timing, and device stats.

Reference analogs: shared/utils/crash_diagnostics.py (stdout/stderr tee +
faulthandler + excepthook chain), shared/utils/stats.py (GPU/system stats
backends), wgp.py:263 format_generation_time, and jax.profiler tracing for
the TPU (the reference has no torch-profiler integration; we wire
jax.profiler around the compiled scan).
"""
from __future__ import annotations

import contextlib
import faulthandler
import os
import sys
import time
import traceback
from typing import Optional


class _Tee:
    def __init__(self, stream, logfile):
        self.stream = stream
        self.logfile = logfile

    def write(self, data):
        self.stream.write(data)
        self.logfile.write(data)
        return len(data)

    def flush(self):
        self.stream.flush()
        self.logfile.flush()

    def isatty(self):
        return getattr(self.stream, "isatty", lambda: False)()


def install_crash_diagnostics(log_path: str = "crash.log"):
    """Tee stdout/stderr to a log, enable faulthandler, chain excepthook
    (crash_diagnostics.py:26-200)."""
    log = open(log_path, "a", buffering=1)
    sys.stdout = _Tee(sys.stdout, log)
    sys.stderr = _Tee(sys.stderr, log)
    faulthandler.enable(file=log)
    prev_hook = sys.excepthook

    def hook(exc_type, exc, tb):
        log.write("".join(traceback.format_exception(exc_type, exc, tb)))
        prev_hook(exc_type, exc, tb)

    sys.excepthook = hook
    return log


def format_generation_time(seconds: float) -> str:
    """wgp.py:263 — human-readable duration."""
    if seconds < 60:
        return f"{seconds:.1f}s"
    m, s = divmod(int(seconds), 60)
    if m < 60:
        return f"{m}m {s}s"
    h, m = divmod(m, 60)
    return f"{h}h {m}m {s}s"


def device_stats() -> dict:
    """TPU/host memory + device info (the stats-bar backend equivalent,
    stats.py:13-330)."""
    out = {}
    try:
        import jax
        devs = jax.devices()
        out["devices"] = [d.device_kind for d in devs]
        stats = []
        for d in devs:
            try:
                ms = d.memory_stats()
                stats.append({
                    "bytes_in_use": ms.get("bytes_in_use"),
                    "bytes_limit": ms.get("bytes_limit"),
                })
            except Exception:  # noqa: BLE001 — backends without stats
                stats.append({})
        out["memory"] = stats
    except Exception as e:  # noqa: BLE001
        out["error"] = str(e)
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith(("MemTotal", "MemAvailable")):
                    k, v = line.split(":")
                    out[k.strip()] = int(v.strip().split()[0]) * 1024
    except OSError:
        pass
    return out


@contextlib.contextmanager
def profile_trace(logdir: Optional[str] = None):
    """jax.profiler trace capture around a region (TPU timeline in
    TensorBoard / xprof)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-phase wall timing for progress reporting."""

    def __init__(self):
        self.marks = [("start", time.perf_counter())]

    def mark(self, name: str):
        self.marks.append((name, time.perf_counter()))

    def report(self) -> dict:
        out = {}
        for (_, t0), (name, t1) in zip(self.marks, self.marks[1:]):
            out[name] = t1 - t0
        out["total"] = self.marks[-1][1] - self.marks[0][1]
        return out
