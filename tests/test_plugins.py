"""Plugin system tests."""
import json
import os

from wan2gp_tpu.plugins import PluginManager


def _write_plugin(tmp_path, name, body):
    (tmp_path / f"{name}.py").write_text(body)


def test_discovery_and_hooks(tmp_path):
    _write_plugin(tmp_path, "grain", """
def register(api):
    api.register_settings_hook(lambda s: {**s, "film_grain": 1})
    api.register_postprocess_hook(lambda outs, s: outs + ["extra.png"])
    api.register_tool("double", lambda x: 2 * x)
    api.register_route("/api/grain", lambda m, p: (200, "text/plain",
                                                   b"ok"))
""")
    _write_plugin(tmp_path, "broken", "def register(api):\n    1/0\n")
    _write_plugin(tmp_path, "noreg", "x = 1\n")
    pm = PluginManager()
    loaded = pm.load_directory(str(tmp_path))
    assert loaded == ["grain"]
    assert "broken" in pm.errors and "noreg" in pm.errors
    s = pm.apply_settings_hooks({"prompt": "hi"})
    assert s == {"prompt": "hi", "film_grain": 1}
    outs = pm.apply_postprocess_hooks(["a.avi"], s)
    assert outs == ["a.avi", "extra.png"]
    assert pm.tools["double"](3) == 6
    assert pm.routes["/api/grain"]("GET", {})[0] == 200


def test_safe_mode_skips(tmp_path, monkeypatch):
    _write_plugin(tmp_path, "p", "def register(api):\n    pass\n")
    monkeypatch.setenv("WAN2GP_SAFE_MODE", "1")
    pm = PluginManager()
    assert pm.load_directory(str(tmp_path)) == []


def test_service_applies_hooks(tmp_path):
    """Settings + postprocess hooks run around generation (stubbed)."""
    from wan2gp_tpu.runtime.api import Session
    from wan2gp_tpu.runtime.webui import WebUI

    class StubRegistry:
        def model_types(self):
            return ["x"]

        def get(self, mt):
            return {}

        def default_settings(self, mt):
            return {}

    class StubService:
        def __init__(self):
            self.registry = StubRegistry()
            from wan2gp_tpu.plugins import PluginManager
            self.plugins = PluginManager()
            self.seen = []

        def process_queue(self, queue, on_event=None):
            while True:
                t = queue.next_pending()
                if t is None:
                    return 0
                s = self.plugins.apply_settings_hooks(t.settings)
                self.seen.append(s)
                t.status = "done"
                t.outputs = self.plugins.apply_postprocess_hooks(
                    ["out.avi"], s)
                if on_event:
                    on_event("task_done", t)

    _write_plugin(tmp_path, "p", """
def register(api):
    api.register_settings_hook(lambda s: {**s, "tagged": True})
    api.register_postprocess_hook(lambda o, s: o + ["hooked"])
    api.register_route("/api/custom", lambda m, p: (200, "text/plain",
                                                    b"custom!"))
""")
    svc = StubService()
    svc.plugins.load_directory(str(tmp_path))
    sess = Session(service=svc)
    sess.submit_task({"model_type": "x", "prompt": "y"})
    sess.wait()
    assert svc.seen[0]["tagged"] is True
    t = sess.queue.tasks()[0]
    assert t.outputs == ["out.avi", "hooked"]

    ui = WebUI(session=sess, save_path=str(tmp_path))
    status, _, body = ui.handle("GET", "/api/custom")
    assert status == 200 and body == b"custom!"


# ---------------------------------------------------------------------------
# lifecycle: catalog / install / update / uninstall (reference
# shared/utils/plugins.py:351-1725)
# ---------------------------------------------------------------------------

def test_catalog_parsing(tmp_path):
    import json
    from wan2gp_tpu.plugins import load_catalog
    cat = [{"name": "Gallery", "url": "https://example.com/g.git",
            "version": "1.0"},
           {"name": "broken"},               # no url -> filtered
           "junk"]
    p = tmp_path / "plugins.json"
    p.write_text(json.dumps(cat))
    entries = load_catalog(str(p))
    assert [e["name"] for e in entries] == ["Gallery"]


def test_install_update_uninstall_local(tmp_path):
    from wan2gp_tpu.plugins import (install_plugin, update_plugin,
                                    uninstall_plugin, list_installed,
                                    PluginManager)
    src = tmp_path / "src_plugin"
    src.mkdir()
    (src / "__init__.py").write_text(
        "def register(api):\n    api.register_tool('ping', lambda: 'v1')\n")
    (src / "requirements.txt").write_text(
        "numpy\nnonexistent-package-xyz>=1.0\n")
    pdir = tmp_path / "plugins"

    info = install_plugin(str(src), str(pdir))
    assert info["name"] == "src_plugin"
    assert info["missing_requirements"] == ["nonexistent-package-xyz>=1.0"]

    m = PluginManager()
    assert m.load_directory(str(pdir)) == ["src_plugin"]
    assert m.tools["ping"]() == "v1"

    # update from the recorded local source
    (src / "__init__.py").write_text(
        "def register(api):\n    api.register_tool('ping', lambda: 'v2')\n")
    update_plugin("src_plugin", str(pdir))
    m2 = PluginManager()
    m2.load_directory(str(pdir))
    assert m2.tools["ping"]() == "v2"

    names = [e["name"] for e in list_installed(str(pdir))]
    assert names == ["src_plugin"]
    assert list_installed(str(pdir))[0]["source"] == str(src)

    uninstall_plugin("src_plugin", str(pdir))
    assert list_installed(str(pdir)) == []


def test_install_refused_in_safe_mode(tmp_path, monkeypatch):
    import pytest
    from wan2gp_tpu.plugins import install_plugin, update_plugin
    monkeypatch.setenv("WAN2GP_SAFE_MODE", "1")
    with pytest.raises(RuntimeError, match="SAFE MODE"):
        install_plugin(str(tmp_path), str(tmp_path / "plugins"))
    with pytest.raises(RuntimeError, match="SAFE MODE"):
        update_plugin("x", str(tmp_path / "plugins"))


def test_install_duplicate_and_bad_source(tmp_path):
    import pytest
    from wan2gp_tpu.plugins import install_plugin
    src = tmp_path / "p"
    src.mkdir()
    (src / "__init__.py").write_text("def register(api):\n    pass\n")
    pdir = tmp_path / "plugins"
    install_plugin(str(src), str(pdir))
    with pytest.raises(FileExistsError):
        install_plugin(str(src), str(pdir))
    with pytest.raises(ValueError):
        install_plugin("ftp://weird", str(pdir))
