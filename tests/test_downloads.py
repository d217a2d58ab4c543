"""Checkpoint download machinery against a local HF-layout mock server.

The reference fetches from HuggingFace via hf_hub_download / resolve-URLs
(shared/utils/download.py, shared/utils/hf.py).  The env has zero egress,
so these tests stand up a stdlib HTTP server (with Range support, like
HF's CDN) serving an HF-shaped directory tree and point the stdlib
fetcher at it — exercising resume, retry-on-truncation, sharded-index
expansion and repo download defs end to end.
"""
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from wan2gp_tpu.io.downloads import (
    FileLocator, build_hf_url, download_def_missing_files, download_file,
    expand_sharded_index, parse_hf_url, process_files_def,
    process_files_def_if_needed)


class _RangeHandler(BaseHTTPRequestHandler):
    """Static file server with HTTP Range support (byte-offset resume)."""
    root = None
    fail_first = {}   # path -> remaining times to truncate mid-body

    def log_message(self, *a):  # noqa: N802 — quiet
        pass

    def do_GET(self):  # noqa: N802
        path = os.path.normpath(self.path.lstrip("/")).replace("\\", "/")
        full = os.path.join(self.root, path)
        if not os.path.isfile(full):
            self.send_error(404)
            return
        data = open(full, "rb").read()
        start = 0
        rng = self.headers.get("Range")
        if rng and rng.startswith("bytes="):
            start = int(rng.split("=")[1].split("-")[0])
            if start >= len(data):
                self.send_error(416)
                return
            self.send_response(206)
            self.send_header("Content-Range",
                             f"bytes {start}-{len(data) - 1}/{len(data)}")
        else:
            self.send_response(200)
        body = data[start:]
        cut = self.fail_first.get(self.path, 0)
        if cut > 0:
            self.fail_first[self.path] = cut - 1
            body = body[: max(1, len(body) // 2)]  # truncate: short read
        self.send_header("Content-Length", str(len(data) - start))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def hf_server(tmp_path):
    root = tmp_path / "repo_root"
    repo = root / "TestOrg" / "TestRepo" / "resolve" / "main"
    (repo / "sub").mkdir(parents=True)
    (repo / "model_a.safetensors").write_bytes(b"A" * 4096)
    (repo / "sub" / "extra.bin").write_bytes(b"B" * 512)
    # sharded checkpoint: index + 2 shards
    (repo / "big.safetensors.index.json").write_text(json.dumps({
        "weight_map": {"w1": "big-00001-of-00002.safetensors",
                       "w2": "big-00002-of-00002.safetensors",
                       "w3": "big-00001-of-00002.safetensors"}}))
    (repo / "big-00001-of-00002.safetensors").write_bytes(b"S1" * 100)
    (repo / "big-00002-of-00002.safetensors").write_bytes(b"S2" * 100)

    handler = type("H", (_RangeHandler,), {"root": str(root),
                                           "fail_first": {}})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    endpoint = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield endpoint, handler
    finally:
        srv.shutdown()
        srv.server_close()


def test_build_and_parse_hf_url():
    url = build_hf_url("Org/Repo", "sub", "f.safetensors")
    assert url.endswith("/Org/Repo/resolve/main/sub/f.safetensors")
    assert parse_hf_url(url) == ("Org/Repo", "sub/f.safetensors")
    assert parse_hf_url("https://example.com/x.bin") is None


def test_download_full_and_skip(hf_server, tmp_path):
    endpoint, _ = hf_server
    url = build_hf_url("TestOrg/TestRepo", "model_a.safetensors",
                       endpoint=endpoint)
    dest = str(tmp_path / "out" / "model_a.safetensors")
    assert download_file(url, dest) == dest
    assert open(dest, "rb").read() == b"A" * 4096
    mtime = os.path.getmtime(dest)
    download_file(url, dest)          # complete file: no re-fetch
    assert os.path.getmtime(dest) == mtime


def test_download_resumes_partial(hf_server, tmp_path):
    endpoint, _ = hf_server
    url = build_hf_url("TestOrg/TestRepo", "model_a.safetensors",
                       endpoint=endpoint)
    dest = str(tmp_path / "model_a.safetensors")
    os.makedirs(tmp_path, exist_ok=True)
    with open(dest + ".part", "wb") as f:
        f.write(b"A" * 1000)          # pre-seeded partial
    download_file(url, dest)
    assert open(dest, "rb").read() == b"A" * 4096
    assert not os.path.exists(dest + ".part")


def test_download_retries_short_read(hf_server, tmp_path):
    endpoint, handler = hf_server
    handler.fail_first["/TestOrg/TestRepo/resolve/main/model_a.safetensors"] = 1
    url = build_hf_url("TestOrg/TestRepo", "model_a.safetensors",
                       endpoint=endpoint)
    dest = str(tmp_path / "m.safetensors")
    download_file(url, dest, backoff=0.01)
    assert open(dest, "rb").read() == b"A" * 4096


def test_download_404_no_retry(hf_server, tmp_path):
    endpoint, _ = hf_server
    url = build_hf_url("TestOrg/TestRepo", "missing.bin",
                       endpoint=endpoint)
    import urllib.error
    with pytest.raises(urllib.error.HTTPError):
        download_file(url, str(tmp_path / "x.bin"))


def test_sharded_index_expansion(hf_server, tmp_path):
    endpoint, _ = hf_server
    url = build_hf_url("TestOrg/TestRepo", "big.safetensors.index.json",
                       endpoint=endpoint)
    idx = download_file(url, str(tmp_path / "big.safetensors.index.json"))
    shards = expand_sharded_index(idx, url)
    assert len(shards) == 2           # deduped from 3 weight_map entries
    assert all(os.path.exists(s) for s in shards)
    assert open(shards[0], "rb").read() == b"S1" * 100


def test_locator_ensure_expands_index(hf_server, tmp_path):
    endpoint, _ = hf_server
    loc = FileLocator([str(tmp_path / "ckpts")])
    url = build_hf_url("TestOrg/TestRepo", "big.safetensors.index.json",
                       endpoint=endpoint)
    p = loc.ensure(url)
    assert p.endswith("big.safetensors.index.json")
    assert loc.locate("big-00002-of-00002.safetensors")


def test_process_files_def(hf_server, tmp_path):
    endpoint, _ = hf_server
    loc = FileLocator([str(tmp_path / "ckpts")])
    dl_def = {"repoId": "TestOrg/TestRepo",
              "sourceFolderList": ["", "sub"],
              "fileList": [["model_a.safetensors"], ["extra.bin"]]}
    missing = download_def_missing_files(dl_def, loc)
    assert sorted(missing) == ["model_a.safetensors",
                               os.path.join("sub", "extra.bin")]
    assert process_files_def_if_needed(dl_def, locator=loc,
                                       endpoint=endpoint) is True
    assert download_def_missing_files(dl_def, loc) == []
    # second call: everything present, no fetch
    assert process_files_def_if_needed(dl_def, locator=loc,
                                       endpoint=endpoint) is False
    paths = process_files_def(**dl_def, locator=loc, endpoint=endpoint)
    assert open(paths[1], "rb").read() == b"B" * 512


def test_target_folder_layout(hf_server, tmp_path):
    endpoint, _ = hf_server
    loc = FileLocator([str(tmp_path / "ckpts")])
    dl_def = {"repoId": "TestOrg/TestRepo",
              "sourceFolderList": ["sub"],
              "fileList": [["extra.bin"]],
              "targetFolderList": ["roformer"]}
    process_files_def(**dl_def, locator=loc, endpoint=endpoint)
    assert loc.locate(os.path.join("roformer", "sub", "extra.bin"))
