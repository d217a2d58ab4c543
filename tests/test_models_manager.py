"""Models-manager tests (reference plugins/models_manager/): expected
file trees, inventory with sizes, shared-file deletion protection,
storage grouping, missing report."""
import os

import numpy as np
import pytest

from wan2gp_tpu.io.downloads import FileLocator
from wan2gp_tpu.runtime import models_manager as mm


class FakeHandler:
    family = "fake"

    def __init__(self, files):
        self._files = files

    def query_model_files(self, base, model_def):
        return self._files


class FakeRegistry:
    def __init__(self, handlers):
        self._h = handlers

    def model_types(self):
        return list(self._h)

    def handler_for(self, mt):
        return self._h[mt]

    def base_model_type(self, mt):
        return mt

    def get(self, mt):
        return {}


@pytest.fixture()
def setup(tmp_path):
    ck = tmp_path / "ckpts"
    ck.mkdir()
    (ck / "a_model.safetensors").write_bytes(b"x" * 100)
    (ck / "shared_vae.safetensors").write_bytes(b"y" * 50)
    reg = FakeRegistry({
        "model_a": FakeHandler([
            {"role": "transformer",
             "urls": ["https://h/f/a_model.safetensors"]},
            {"role": "vae",
             "urls": ["https://h/f/shared_vae.safetensors"]}]),
        "model_b": FakeHandler([
            {"role": "transformer",
             "urls": ["https://h/f/b_model.safetensors"]},
            {"role": "vae",
             "urls": ["https://h/f/shared_vae.safetensors"]}]),
    })
    return reg, FileLocator([str(ck)])


def test_expected_and_inventory(setup):
    reg, loc = setup
    inv = mm.inventory(reg, loc)
    a = inv["model_a"]
    assert a["complete"]
    assert a["size_bytes"] == 150
    b = inv["model_b"]
    assert not b["complete"]
    assert [m["filename"] for m in b["missing"]] == \
        ["b_model.safetensors"]


def test_shared_file_protection(setup):
    reg, loc = setup
    inv = mm.inventory(reg, loc)
    deleted, kept = mm.delete_model_files(reg, "model_a", loc,
                                          inv=inv)
    # model file deleted; shared VAE kept (model_b still expects it)
    assert any("a_model" in d for d in deleted)
    assert any("shared_vae" in k for k in kept)
    assert not os.path.exists(
        inv["model_a"]["present"][0]["path"])


def test_delete_shared_override(setup):
    reg, loc = setup
    deleted, kept = mm.delete_model_files(reg, "model_a", loc,
                                          delete_shared=True)
    assert len(deleted) == 2 and not kept


def test_storage_and_missing(setup):
    reg, loc = setup
    inv = mm.inventory(reg, loc)
    tree = mm.storage_tree(inv, reg)
    # shared file counted once in the total
    assert tree["total_bytes"] == 150
    assert tree["families"]["fake"]["model_a"] == 150
    rep = mm.missing_report(inv)
    assert rep == [{"model_type": "model_b",
                    "missing": ["b_model.safetensors"],
                    "urls": ["https://h/f/b_model.safetensors"]}]


def test_real_registry_inventory():
    """The real registry's handlers all produce well-formed expected
    trees (no crash across 190+ defs)."""
    from wan2gp_tpu.config.registry import ModelRegistry
    from wan2gp_tpu.families import build_handler_map
    reg = ModelRegistry(build_handler_map())
    inv = mm.inventory(reg, FileLocator(["/nonexistent"]),
                       model_types=reg.model_types()[:40])
    assert len(inv) == 40
    for mt, rec in inv.items():
        assert rec["size_bytes"] == 0
        for e in rec["expected"]:
            assert e["filename"]
