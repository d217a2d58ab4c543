"""Generation task queue with persistence.

The TPU analog of the reference's queue (wgp.py:447 process_prompt_and_add_tasks,
:1596 zip save, :1947 load, :2240 autosave): ordered tasks of settings dicts,
add/edit/move/remove, JSON persistence (media references stay file paths —
we don't inline binaries), and thread-safe mutation for a UI/worker split.
"""
from __future__ import annotations

import itertools
import json
import os
import threading
import time
from typing import Any, Callable, Dict, List, Optional


class Task:
    def __init__(self, settings: Dict[str, Any], task_id: int):
        self.id = task_id
        self.settings = dict(settings)
        self.status = "queued"      # queued | running | done | error | aborted
        self.error: Optional[str] = None
        self.outputs: List[str] = []
        self.created = time.time()

    def to_json(self):
        return {"id": self.id, "settings": self.settings,
                "status": self.status, "error": self.error,
                "outputs": self.outputs}

    @classmethod
    def from_json(cls, d, counter):
        t = cls(d["settings"], d.get("id") or next(counter))
        t.status = "queued" if d.get("status") == "running" else \
            d.get("status", "queued")
        t.error = d.get("error")
        t.outputs = list(d.get("outputs", []))
        return t


class TaskQueue:
    def __init__(self):
        self._lock = threading.RLock()
        self._tasks: List[Task] = []
        self._counter = itertools.count(1)

    def add(self, settings: Dict[str, Any], priority: bool = False) -> Task:
        with self._lock:
            task = Task(settings, next(self._counter))
            if priority:
                # insert after any running task (reference inline priority)
                idx = next((i + 1 for i, t in enumerate(self._tasks)
                            if t.status == "running"), 0)
                self._tasks.insert(idx, task)
            else:
                self._tasks.append(task)
            return task

    def next_pending(self) -> Optional[Task]:
        with self._lock:
            for t in self._tasks:
                if t.status == "queued":
                    return t
            return None

    def get(self, task_id: int) -> Optional[Task]:
        with self._lock:
            return next((t for t in self._tasks if t.id == task_id), None)

    def remove(self, task_id: int) -> bool:
        with self._lock:
            t = self.get(task_id)
            if t is None or t.status == "running":
                return False
            self._tasks.remove(t)
            return True

    def move(self, task_id: int, delta: int) -> bool:
        with self._lock:
            t = self.get(task_id)
            if t is None:
                return False
            i = self._tasks.index(t)
            j = max(0, min(len(self._tasks) - 1, i + delta))
            self._tasks.insert(j, self._tasks.pop(i))
            return True

    def edit(self, task_id: int, settings: Dict[str, Any]) -> bool:
        with self._lock:
            t = self.get(task_id)
            if t is None or t.status == "running":
                return False
            t.settings.update(settings)
            return True

    def tasks(self) -> List[Task]:
        with self._lock:
            return list(self._tasks)

    def pending_count(self) -> int:
        with self._lock:
            return sum(t.status == "queued" for t in self._tasks)

    # -- persistence ------------------------------------------------------

    def save(self, path: str):
        with self._lock:
            data = [t.to_json() for t in self._tasks
                    if t.status in ("queued", "running")]
        with open(path, "w") as f:
            json.dump({"version": 1, "tasks": data}, f, indent=1)

    def load(self, path: str):
        with open(path) as f:
            data = json.load(f)
        tasks = data["tasks"] if isinstance(data, dict) else data
        with self._lock:
            for d in tasks:
                if "settings" not in d:       # bare settings dict
                    d = {"settings": d}
                self._tasks.append(Task.from_json(d, self._counter))

    def install_autosave(self, path: str):
        import atexit
        atexit.register(lambda: self.pending_count() and self.save(path))
