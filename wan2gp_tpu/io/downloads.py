"""Checkpoint download manager.

The reference downloads checkpoints from HuggingFace with quant/dtype-aware
filename selection (wgp.py:2880 get_model_filename, :3534 download_models;
shared/utils/download.py).  Here: the same URL-variant selection policy +
a stdlib urllib downloader with resume, plus the multi-root file locator
(shared/utils/files_locator.py).
"""
from __future__ import annotations

import os
import shutil
import urllib.request
from typing import Dict, List, Optional, Sequence


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
                  progress=None) -> str:
    """Resume-capable download to dest (skips if complete)."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    start = os.path.getsize(tmp) if os.path.exists(tmp) else 0
    if os.path.exists(dest):
        return dest
    req = urllib.request.Request(url)
    if start:
        req.add_header("Range", f"bytes={start}-")
    with urllib.request.urlopen(req) as r, open(tmp, "ab" if start else "wb") as f:
        total = start + int(r.headers.get("Content-Length", 0) or 0)
        done = start
        while True:
            buf = r.read(chunk)
            if not buf:
                break
            f.write(buf)
            done += len(buf)
            if progress:
                progress(done, total)
    os.replace(tmp, dest)
    return dest


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
        """Return a local path for the URL, downloading if missing."""
        filename = os.path.basename(url.split("?")[0])
        rel = os.path.join(subdir, filename) if subdir else filename
        found = self.locate(rel)
        if found:
            return found
        dest = os.path.join(self.roots[0], rel)
        return download_file(url, dest)


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
