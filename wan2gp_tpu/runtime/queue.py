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

# media-bearing settings keys packed into queue.zip (wgp.py:166)
ATTACHMENT_KEYS = [
    "image_start", "image_end", "image_refs", "image_guide", "image_mask",
    "video_guide", "video_guide2", "video_mask", "video_source",
    "audio_guide", "audio_guide2", "audio_source",
    "replace_voice_sample", "replace_voice_sample2", "custom_guide",
]
SETTINGS_VERSION = 2.73  # wgp.py:151


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
        if path.endswith(".zip"):
            return self.save_zip(path)
        with self._lock:
            data = [t.to_json() for t in self._tasks
                    if t.status in ("queued", "running")]
        with open(path, "w") as f:
            json.dump({"version": 1, "tasks": data}, f, indent=1)

    def load(self, path: str):
        if path.endswith(".zip"):
            return self.load_zip(path)
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict) and "tasks" in data:
            tasks = data["tasks"]
        elif isinstance(data, dict):
            # a bare settings dict is a one-task queue (reference
            # wgp.py:1915 settings-json branch of --process)
            tasks = [data]
        else:
            tasks = data
        with self._lock:
            for d in tasks:
                if "params" in d and "settings" not in d:
                    # reference manifest entry {"id", "params"}
                    d = {"settings": d["params"], "id": d.get("id")}
                elif "settings" not in d:     # bare settings dict
                    d = {"settings": d}
                self._tasks.append(Task.from_json(d, self._counter))

    def save_zip(self, path: str) -> bool:
        """Reference-compatible queue.zip: a `queue.json` manifest of
        [{"id", "params"}] entries plus the attachment media files, with
        the attachment params rewritten to in-zip names
        (wgp.py:1596 _save_queue_to_zip).
        """
        import zipfile
        with self._lock:
            live = [t for t in self._tasks
                    if t.status in ("queued", "running")]
            if not live:
                return False
            manifest = []
            in_zip: Dict[str, str] = {}   # source path -> name in zip
            with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
                for t in live:
                    params = dict(t.settings)
                    for key in ATTACHMENT_KEYS:
                        value = params.get(key)
                        if value is None:
                            continue
                        is_list = isinstance(value, list)
                        items = value if is_list else [value]
                        names = []
                        for idx, item in enumerate(items):
                            if not isinstance(item, str):
                                continue
                            if item in in_zip:
                                names.append(in_zip[item])
                                continue
                            if not os.path.isfile(item):
                                continue
                            ext = os.path.splitext(item)[1]
                            name = f"task{t.id}_{key}_{idx}{ext}"
                            zf.write(item, arcname=name)
                            in_zip[item] = name
                            names.append(name)
                        if names:
                            params[key] = names if is_list else names[0]
                    params["settings_version"] = SETTINGS_VERSION
                    manifest.append({"id": t.id, "params": params})
                zf.writestr("queue.json", json.dumps(manifest, indent=4))
        return True

    def load_zip(self, path: str, cache_dir: Optional[str] = None):
        """Load a reference-format queue.zip (wgp.py:1915): extract the
        media attachments into cache_dir (default: `<path>_cache/`) and
        rewrite attachment params to the extracted file paths."""
        import zipfile
        if cache_dir is None:
            cache_dir = os.path.splitext(path)[0] + "_cache"
        with zipfile.ZipFile(path) as zf:
            names = set(zf.namelist())
            if "queue.json" not in names:
                raise ValueError("queue.json not found in zip file")
            manifest = json.loads(zf.read("queue.json").decode("utf-8"))
            media = names - {"queue.json"}
            if media:
                os.makedirs(cache_dir, exist_ok=True)
                for n in media:
                    zf.extract(n, cache_dir)
        with self._lock:
            for entry in manifest:
                params = dict(entry.get("params", entry))
                for key in ATTACHMENT_KEYS:
                    value = params.get(key)
                    if value is None:
                        continue
                    is_list = isinstance(value, list)
                    items = value if is_list else [value]
                    resolved = [os.path.join(cache_dir, it)
                                if isinstance(it, str)
                                and os.path.isfile(os.path.join(cache_dir, it))
                                else it for it in items]
                    params[key] = resolved if is_list else resolved[0]
                t = Task(params, entry.get("id") or next(self._counter))
                self._tasks.append(t)

    def install_autosave(self, path: str):
        import atexit
        atexit.register(lambda: self.pending_count() and self.save(path))
