"""Checkpoint download manager.

The reference downloads checkpoints from HuggingFace with quant/dtype-aware
filename selection (wgp.py:2880 get_model_filename, :3534 download_models;
shared/utils/download.py).  Here: the same URL-variant selection policy +
a stdlib urllib downloader with resume, plus the multi-root file locator
(shared/utils/files_locator.py).
"""
from __future__ import annotations

import json
import os
import shutil
import time
import urllib.error
import urllib.request
from typing import Dict, List, Optional, Sequence

#: HuggingFace endpoint; override with HF_ENDPOINT (matches huggingface_hub
#: semantics — and lets the test suite point at a local mock server).
def hf_endpoint() -> str:
    return os.environ.get("HF_ENDPOINT", "https://huggingface.co").rstrip("/")


def build_hf_url(repo_id: str, *path_parts: str, revision: str = "main",
                 endpoint: Optional[str] = None) -> str:
    """`https://huggingface.co/<repo>/resolve/<rev>/<path>` builder
    (reference shared/utils/hf.py:4 build_hf_url)."""
    path = "/".join(p.strip("/") for p in path_parts if p)
    base = f"{endpoint or hf_endpoint()}/{repo_id}/resolve/{revision}"
    return f"{base}/{path}" if path else base


def parse_hf_url(url: str):
    """Split a resolve-URL into (repo_id, relpath) or None (reference
    shared/utils/download.py download_file: the resolve/main split)."""
    for marker in ("/resolve/main/", "/resolve/master/"):
        if marker in url:
            head, rel = url.split(marker, 1)
            head = head.split("://", 1)[-1]
            parts = head.split("/")
            if len(parts) >= 2:
                return "/".join(parts[-2:]), rel.split("?")[0]
    return None


def pick_checkpoint_url(urls: Sequence[str], quantization: str = "",
                        dtype_policy: str = "bf16") -> str:
    """Choose among URL variants by quantization/dtype markers in the
    filename (wgp.py:2910-2960: int8/fp8 quant tags, mbf16/mfp16 dtype
    tags; falls back to the first URL)."""
    if not urls:
        raise ValueError("no URLs")

    def has(name, *tags):
        low = os.path.basename(name).lower()
        return all(t in low for t in tags)

    if quantization:
        for u in urls:
            if has(u, f"_{quantization}") or has(u, quantization):
                if dtype_policy and has(u, dtype_policy):
                    return u
        for u in urls:
            if has(u, quantization):
                return u
    for u in urls:
        if dtype_policy and has(u, f"m{dtype_policy}") \
                and not has(u, "int8") and not has(u, "fp8"):
            return u
    for u in urls:
        if not has(u, "int8") and not has(u, "fp8") and not has(u, "int4"):
            return u
    return urls[0]


def download_file(url: str, dest: str, chunk: int = 1 << 20,
                  progress=None, retries: int = 3,
                  backoff: float = 0.5) -> str:
    """Resume-capable download to dest (skips if complete).

    Resumes a partial `.part` file with a Range request; a server that
    ignores Range (responds 200 instead of 206) restarts from byte 0.
    Transient errors retry with exponential backoff, resuming from
    whatever landed on disk."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    if os.path.exists(dest):
        return dest
    tmp = dest + ".part"
    last_exc = None
    for attempt in range(max(1, retries)):
        start = os.path.getsize(tmp) if os.path.exists(tmp) else 0
        req = urllib.request.Request(url)
        if start:
            req.add_header("Range", f"bytes={start}-")
        try:
            with urllib.request.urlopen(req) as r:
                if start and r.status != 206:
                    start = 0            # server ignored Range: restart
                mode = "ab" if start else "wb"
                with open(tmp, mode) as f:
                    total = start + int(
                        r.headers.get("Content-Length", 0) or 0)
                    done = start
                    while True:
                        buf = r.read(chunk)
                        if not buf:
                            break
                        f.write(buf)
                        done += len(buf)
                        if progress:
                            progress(done, total)
                if total and os.path.getsize(tmp) < total:
                    raise IOError(
                        f"short read: {os.path.getsize(tmp)}/{total}")
            os.replace(tmp, dest)
            return dest
        except urllib.error.HTTPError as e:
            if e.code == 416 and os.path.exists(tmp):
                # Range not satisfiable: .part is already complete
                os.replace(tmp, dest)
                return dest
            if e.code in (400, 401, 403, 404):
                raise                    # permanent — do not retry
            last_exc = e
        except (urllib.error.URLError, IOError, OSError) as e:
            last_exc = e
        if attempt + 1 < retries:
            time.sleep(backoff * (2 ** attempt))
    raise IOError(f"download failed after {retries} attempts: {url}") \
        from last_exc


def expand_sharded_index(index_path: str, base_url: str,
                         progress=None) -> List[str]:
    """A `*.safetensors.index.json` names its shards in `weight_map`
    (HF sharded-checkpoint convention; the reference's mmgp loader takes
    the same index files).  Download every missing shard next to the
    index; returns local shard paths in weight_map order."""
    with open(index_path) as f:
        index = json.load(f)
    shard_names = sorted(set((index.get("weight_map") or {}).values()))
    out_dir = os.path.dirname(index_path)
    base = base_url.rsplit("/", 1)[0]
    paths = []
    for name in shard_names:
        local = os.path.join(out_dir, name)
        if not os.path.exists(local):
            download_file(f"{base}/{name}", local, progress=progress)
        paths.append(local)
    return paths


class FileLocator:
    """Multi-root checkpoint resolution (files_locator.py:12)."""

    def __init__(self, roots: Optional[List[str]] = None):
        self.roots = roots or ["ckpts"]

    def locate(self, filename: str) -> Optional[str]:
        for root in self.roots:
            p = os.path.join(root, filename)
            if os.path.exists(p):
                return p
        return None

    def ensure(self, url: str, subdir: str = "") -> str:
        """Return a local path for the URL, downloading if missing.
        A `*.safetensors.index.json` URL also pulls its shards."""
        filename = os.path.basename(url.split("?")[0])
        rel = os.path.join(subdir, filename) if subdir else filename
        found = self.locate(rel)
        if found is None:
            found = download_file(url, os.path.join(self.roots[0], rel))
        if filename.endswith(".index.json"):
            expand_sharded_index(found, url)
        return found


def _def_relpath(source_folder: str, filename: str,
                 target_folder: Optional[str]) -> str:
    """Local relative path for one file of a download def (reference
    shared/utils/download.py:_download_relpath)."""
    source_folder = source_folder or ""
    if target_folder is not None and not target_folder:
        target_folder = None
    parts = [p for p in (target_folder, source_folder, filename) if p]
    return os.path.join(*parts) if parts else filename


def download_def_missing_files(download_def, locator: FileLocator
                               ) -> List[str]:
    """Relative paths a download def names that the locator cannot find
    (reference shared/utils/download.py:download_def_missing_files)."""
    if download_def is None:
        return []
    if isinstance(download_def, list):
        out: List[str] = []
        for one in download_def:
            out.extend(download_def_missing_files(one, locator))
        return out
    source_folders = download_def.get("sourceFolderList", [])
    file_lists = download_def.get("fileList", [])
    target_folders = (download_def.get("targetFolderList")
                      or [None] * len(source_folders))
    missing = []
    for src, files, tgt in zip(source_folders, file_lists, target_folders):
        for name in files:
            rel = _def_relpath(src, name, tgt)
            if locator.locate(rel) is None:
                missing.append(rel)
    return missing


def process_files_def(repoId: str, sourceFolderList: Sequence[str],
                      fileList: Sequence[Sequence[str]],
                      targetFolderList: Optional[Sequence[str]] = None,
                      locator: Optional[FileLocator] = None,
                      endpoint: Optional[str] = None,
                      progress=None) -> List[str]:
    """Fetch the missing files of a repo download def (reference
    shared/utils/download.py:process_files_def, hf_hub_download replaced
    by the stdlib resolve-URL fetcher).  Returns local paths of every
    file in the def."""
    locator = locator or FileLocator()
    if targetFolderList is None:
        targetFolderList = [None] * len(sourceFolderList)
    paths = []
    for src, files, tgt in zip(sourceFolderList, fileList,
                               targetFolderList):
        for name in files:
            rel = _def_relpath(src, name, tgt)
            found = locator.locate(rel)
            if found is None:
                url = build_hf_url(repoId, src, name, endpoint=endpoint)
                found = download_file(
                    url, os.path.join(locator.roots[0], rel),
                    progress=progress)
            paths.append(found)
    return paths


def process_files_def_if_needed(download_def, locator=None,
                                endpoint=None, on_status=None) -> bool:
    """Fetch only when something is missing; True if a fetch happened
    (reference process_files_def_if_needed)."""
    locator = locator or FileLocator()
    defs = (download_def if isinstance(download_def, list)
            else [download_def])
    defs = [d for d in defs if d is not None]
    if not any(download_def_missing_files(d, locator) for d in defs):
        return False
    if on_status:
        on_status("downloading model files...")
    for d in defs:
        process_files_def(**d, locator=locator, endpoint=endpoint)
    return True


def make_checkpoints_resolver(roots: Optional[List[str]] = None,
                              quantization: str = "",
                              dtype_policy: str = "bf16"):
    """checkpoints_resolver for GenerationService: downloads/locates every
    file role a handler declares via query_model_files."""
    locator = FileLocator(roots)

    def resolve(model_type, handler, base_model_type, model_def):
        out: Dict[str, str] = {}
        for spec in handler.query_model_files(base_model_type, model_def):
            urls = spec.get("urls") or []
            if not urls:
                continue
            url = pick_checkpoint_url(urls, quantization, dtype_policy)
            out[spec["role"]] = locator.ensure(url)
        return out

    return resolve
