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
