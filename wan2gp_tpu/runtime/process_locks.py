"""Device-resource locks + startup crash sentinel (reference
shared/utils/process_locks.py:1-213 + STARTUP_LOCK_FILE wgp.py:141 and
the safe-mode prompt wgp.py:~13500).

The reference coordinates GPU residency between concurrent UI sessions
(`acquire_main_GPU_ressources`, gpu_residents with
force_release_on_acquire) and writes a startup lock file whose
survival across a crash triggers SAFE MODE.  TPU-native equivalent:
one device lock per process guarding HBM residency, a resident-model
registry whose entries can volunteer eviction callbacks, and the same
crash-sentinel file contract (plugins.py honors WAN2GP_SAFE_MODE).
"""
from __future__ import annotations

import os
import threading
import time
from typing import Callable, Dict, Optional

_gen_lock = threading.Lock()
_residents: Dict[str, Dict] = {}
_active: Optional[str] = None


def device_busy(ignore: Optional[str] = None) -> bool:
    """True when another process id currently holds the device
    (any_GPU_process_running)."""
    with _gen_lock:
        return _active is not None and _active != ignore


def register_resident(process_id: str,
                      release_fn: Optional[Callable] = None,
                      force_release_on_acquire: bool = False) -> None:
    """Declare HBM-resident state owned by `process_id`
    (set_gpu_resident).  release_fn frees it when another process
    acquires with eviction."""
    with _gen_lock:
        _residents[process_id] = {
            "release_fn": release_fn,
            "force_release_on_acquire": force_release_on_acquire,
        }


def drop_resident(process_id: str) -> None:
    with _gen_lock:
        _residents.pop(process_id, None)


def acquire_device_resources(process_id: str,
                             timeout: float = 0.0) -> bool:
    """Take the device for `process_id` (acquire_main_GPU_ressources):
    waits for the active holder up to `timeout`, then evicts residents
    that volunteered force_release_on_acquire."""
    deadline = time.monotonic() + timeout
    while True:
        with _gen_lock:
            global _active
            if _active is None or _active == process_id:
                _active = process_id
                actions = []
                for rid, info in list(_residents.items()):
                    if rid == process_id:
                        continue
                    if info.get("force_release_on_acquire"):
                        actions.append((rid, info.get("release_fn")))
                        _residents.pop(rid, None)
                break
        if time.monotonic() >= deadline:
            return False
        time.sleep(0.05)
    for rid, fn in actions:
        if callable(fn):
            try:
                fn()
            except Exception:
                pass
    return True


def release_device_resources(process_id: str) -> None:
    global _active
    with _gen_lock:
        if _active == process_id:
            _active = None


class device_session:
    """Context manager form used by the service worker."""

    def __init__(self, process_id: str, timeout: float = 120.0):
        self.process_id = process_id
        self.timeout = timeout

    def __enter__(self):
        if not acquire_device_resources(self.process_id, self.timeout):
            raise TimeoutError(
                f"device busy: held by another generation process "
                f"(reference acquire_main_GPU_ressources timeout)")
        return self

    def __exit__(self, *exc):
        release_device_resources(self.process_id)
        return False


# ---------------------------------------------------------------------------
# startup crash sentinel
# ---------------------------------------------------------------------------

def startup_lock_path(base_dir: str = ".") -> str:
    return os.path.join(base_dir, ".wan2gp_startup.lock")


def begin_startup(base_dir: str = ".") -> bool:
    """Create the sentinel; returns True when the previous run crashed
    (the file already existed) — callers should suggest SAFE MODE
    (wgp.py startup prompt; plugins honor WAN2GP_SAFE_MODE)."""
    path = startup_lock_path(base_dir)
    crashed = os.path.exists(path)
    try:
        with open(path, "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    return crashed


def end_startup_clean(base_dir: str = ".") -> None:
    try:
        os.remove(startup_lock_path(base_dir))
    except OSError:
        pass
