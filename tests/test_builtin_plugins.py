"""Built-in plugins (wan2gp_tpu/builtin_plugins) as real tenants of the
plugin framework: auto-loaded into the service, routes served through
the web UI, tools callable, and installable through the
install/update/uninstall lifecycle (VERDICT r4 ask #7 — the reference
ships these under /root/reference/plugins/)."""
import json
import os

import numpy as np
import pytest

from wan2gp_tpu.plugins import (PluginManager, install_plugin,
                                uninstall_plugin, list_installed,
                                BUILTIN_PLUGINS_DIR)


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    from wan2gp_tpu.runtime.service import GenerationService
    out = str(tmp_path_factory.mktemp("plugin_out"))
    return GenerationService(init_random_weights=True, output_dir=out)


def test_builtins_autoload(service):
    names = set(service.plugins.plugins)
    assert {"models_manager", "video_mask_creator", "guides"} <= names
    assert service.plugins.errors == {}
    assert "/plugin/models_manager" in service.plugins.routes
    assert "/plugin/mask_creator" in service.plugins.routes
    assert "/plugin/guides" in service.plugins.routes
    assert "models_manager.inventory" in service.plugins.tools
    assert "guides.read" in service.plugins.tools


def test_models_manager_route(service):
    handler = service.plugins.routes["/plugin/models_manager"]
    status, ctype, body = handler("GET", {})
    assert status == 200 and b"Models Manager" in body
    status, _, body = handler("POST", {"action": "inventory",
                                       "model_type": "t2v_1.3B"})
    inv = json.loads(body)["inventory"]
    assert "t2v_1.3B" in inv
    rec = inv["t2v_1.3B"]
    assert {"complete", "size_bytes", "missing"} <= set(rec)
    status, _, body = handler("POST", {"action": "missing"})
    assert status == 200 and isinstance(json.loads(body)["missing"], list)
    status, _, body = handler("POST", {"action": "delete"})
    assert status == 400


def test_guides_route_and_tool(service):
    handler = service.plugins.routes["/plugin/guides"]
    status, _, body = handler("POST", {"action": "list"})
    guides = json.loads(body)["guides"]
    assert "PARITY.md" in guides
    status, _, body = handler("POST", {"action": "read",
                                       "name": "PARITY.md"})
    assert "Parity ledger" in json.loads(body)["text"]
    # path traversal is clamped to the docs dir listing
    status, _, _ = handler("POST", {"action": "read",
                                    "name": "../SURVEY.md"})
    assert status == 404
    assert "BENCH.md" in service.plugins.tools["guides.list"]()


def test_mask_creator_keyword_route(service, monkeypatch):
    """Route plumbing with the SAM3 predictor stubbed (random weights
    would be meaningless; the SAM3 model has its own test suite)."""
    from wan2gp_tpu.utils.media import save_video
    frames = np.zeros((3, 16, 16, 3), np.uint8)
    save_video(frames, os.path.join(service.output_dir, "clip.avi"), fps=8)

    import wan2gp_tpu.preprocessing.sam3.video as sam3video
    monkeypatch.setattr(
        sam3video, "run_sam3_video",
        lambda video, keywords, pred: np.ones(video.shape[:3], bool))
    from wan2gp_tpu.runtime import mask_editor
    monkeypatch.setattr(mask_editor.MaskBackend, "video_predictor",
                        lambda self: object())
    handler = service.plugins.routes["/plugin/mask_creator"]
    status, _, body = handler("POST", {"action": "keyword",
                                       "video": "clip.avi",
                                       "keywords": ["person"]})
    assert status == 200, body
    out = json.loads(body)
    assert out["frames"] == 3 and out["coverage"] == 1.0
    assert os.path.exists(os.path.join(service.output_dir, out["file"]))
    # missing video -> clean 400
    status, _, _ = handler("POST", {"action": "keyword",
                                    "video": "nope.avi", "keywords": []})
    assert status == 400


def test_webui_serves_plugin_routes(service):
    from wan2gp_tpu.runtime.webui import WebUI
    from wan2gp_tpu.runtime.api import Session
    ui = WebUI(session=Session(service=service),
               save_path=service.output_dir)
    status, ctype, body = ui.handle("GET", "/plugin/guides")
    assert status == 200 and b"Guides" in body
    status, _, body = ui.handle(
        "POST", "/plugin/models_manager",
        json.dumps({"action": "inventory",
                    "model_type": "t2v_1.3B"}).encode())
    assert status == 200 and "t2v_1.3B" in json.loads(body)["inventory"]


def test_lifecycle_install_builtin_as_tenant(tmp_path):
    """install_plugin + load_directory serve a reference-equivalent
    plugin from a user plugins dir (the VERDICT done-criterion)."""
    pdir = str(tmp_path / "plugins")
    src = os.path.join(BUILTIN_PLUGINS_DIR, "guides")
    info = install_plugin(src, pdir)
    assert info["name"] == "guides" and not info["missing_requirements"]
    assert [p["name"] for p in list_installed(pdir)] == ["guides"]

    mgr = PluginManager()
    assert mgr.load_directory(pdir) == ["guides"]
    status, _, body = mgr.routes["/plugin/guides"]("POST",
                                                   {"action": "list"})
    assert status == 200 and "PARITY.md" in json.loads(body)["guides"]

    uninstall_plugin("guides", pdir)
    assert list_installed(pdir) == []


def test_configuration_plugin_roundtrip(tmp_path, monkeypatch, service):
    monkeypatch.chdir(tmp_path)   # wgp_config.json lands here
    handler = service.plugins.routes["/plugin/configuration"]
    status, _, body = handler("GET", {})
    assert status == 200 and b"Server configuration" in body
    status, _, body = handler("POST", {"action": "get"})
    cfg = json.loads(body)["config"]
    assert cfg["attention_mode"] == "auto"
    status, _, body = handler("POST", {
        "action": "set", "values": {"attention_mode": "radial",
                                    "vae_precision": "16"}})
    assert json.loads(body)["saved"]
    assert os.path.exists(tmp_path / "wgp_config.json")
    status, _, body = handler("POST", {"action": "get"})
    cfg = json.loads(body)["config"]
    assert cfg["attention_mode"] == "radial"
    assert cfg["vae_precision"] == "16"
    # bad payload -> 400
    status, _, _ = handler("POST", {"action": "set", "values": 3})
    assert status == 400
