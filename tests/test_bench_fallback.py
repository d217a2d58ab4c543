"""The bench OOM degrade ladder (bench.py _degrade_and_exec).

After a RESOURCE_EXHAUSTED on the TPU, an in-process retry cannot
reclaim the failed attempt's HBM (the dead executable and the
traceback-held frames keep device buffers alive — observed r05:
jax.clear_caches()+gc.collect() still could not allocate a 19 MB
latents array).  bench.py therefore re-execs itself with a degraded
config: sol -> radial (keeps the TeaCache schedule) -> no step cache ->
re-raise.  These tests pin the ladder's env construction with
os.execve monkeypatched out.
"""

import importlib.util
import os

import pytest


@pytest.fixture()
def bench(monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    calls = []

    def fake_execve(exe, argv, env):
        calls.append((argv, env))
        raise SystemExit(0)

    monkeypatch.setattr(os, "execve", fake_execve)
    mod._exec_calls = calls
    return mod


def test_sol_degrades_to_radial_keeping_cache(bench, monkeypatch):
    monkeypatch.delenv("BENCH_ATTN", raising=False)
    monkeypatch.setenv("BENCH_CACHE", "tea")
    with pytest.raises(SystemExit):
        bench._degrade_and_exec(RuntimeError("RESOURCE_EXHAUSTED"), "sol")
    argv, env = bench._exec_calls[-1]
    assert env["BENCH_ATTN"] == "radial"
    assert env["BENCH_CACHE"] == "tea"          # cache survives level 1
    assert argv[1].endswith("bench.py")


def test_sol_with_explicit_budget_degrades(bench, monkeypatch):
    monkeypatch.setenv("BENCH_ATTN", "sol:0.9:0.4")
    monkeypatch.setenv("BENCH_CACHE", "tea:1.75")
    with pytest.raises(SystemExit):
        bench._degrade_and_exec(RuntimeError("oom"), "sol:0.9:0.4")
    _, env = bench._exec_calls[-1]
    assert env["BENCH_ATTN"] == "radial"


def test_radial_with_cache_drops_cache(bench, monkeypatch):
    monkeypatch.setenv("BENCH_ATTN", "radial")
    monkeypatch.setenv("BENCH_CACHE", "tea")
    with pytest.raises(SystemExit):
        bench._degrade_and_exec(RuntimeError("oom"), "radial")
    _, env = bench._exec_calls[-1]
    assert env["BENCH_CACHE"] == "none"
    assert env["BENCH_ATTN"] == "radial"


def test_exhausted_ladder_reraises(bench, monkeypatch):
    monkeypatch.setenv("BENCH_ATTN", "radial")
    monkeypatch.setenv("BENCH_CACHE", "none")
    err = RuntimeError("oom")
    with pytest.raises(RuntimeError) as exc_info:
        bench._degrade_and_exec(err, "radial")
    assert exc_info.value is err
    assert not bench._exec_calls                 # no exec at the ladder end
