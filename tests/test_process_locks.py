"""Device-resource lock + startup sentinel tests (reference
shared/utils/process_locks.py semantics)."""
import os
import threading
import time

import numpy as np
import pytest

from wan2gp_tpu.runtime import process_locks as pl


@pytest.fixture(autouse=True)
def _reset():
    pl._residents.clear()
    pl._active = None
    yield
    pl.release_device_resources(pl._active or "")
    pl._residents.clear()
    pl._active = None


def test_acquire_release_cycle():
    assert pl.acquire_device_resources("a")
    assert pl.device_busy(ignore="b")
    assert not pl.device_busy(ignore="a")
    # re-entrant for the same id
    assert pl.acquire_device_resources("a")
    pl.release_device_resources("a")
    assert not pl.device_busy()


def test_second_acquire_times_out():
    assert pl.acquire_device_resources("a")
    t0 = time.monotonic()
    assert not pl.acquire_device_resources("b", timeout=0.2)
    assert time.monotonic() - t0 >= 0.2
    pl.release_device_resources("a")
    assert pl.acquire_device_resources("b", timeout=0.2)


def test_forced_resident_eviction():
    released = []
    pl.register_resident("old_model",
                         release_fn=lambda: released.append("old"),
                         force_release_on_acquire=True)
    pl.register_resident("pinned_model",
                         release_fn=lambda: released.append("pinned"),
                         force_release_on_acquire=False)
    assert pl.acquire_device_resources("new")
    assert released == ["old"]          # only the volunteer evicted
    assert "pinned_model" in pl._residents
    pl.release_device_resources("new")


def test_device_session_context():
    with pl.device_session("s1", timeout=1.0):
        assert pl.device_busy(ignore="other")
        with pytest.raises(TimeoutError):
            with pl.device_session("s2", timeout=0.1):
                pass
    assert not pl.device_busy()


def test_device_session_blocks_then_proceeds():
    results = []

    def holder():
        with pl.device_session("h", timeout=1.0):
            results.append("h_in")
            time.sleep(0.3)
        results.append("h_out")

    t = threading.Thread(target=holder)
    t.start()
    time.sleep(0.1)
    with pl.device_session("w", timeout=2.0):
        results.append("w_in")
    t.join()
    assert results.index("w_in") > results.index("h_out")


def test_startup_sentinel(tmp_path):
    base = str(tmp_path)
    assert pl.begin_startup(base) is False      # clean first start
    # simulated crash: file survives, next start reports it
    assert pl.begin_startup(base) is True
    pl.end_startup_clean(base)
    assert pl.begin_startup(base) is False
    pl.end_startup_clean(base)
    assert not os.path.exists(pl.startup_lock_path(base))
