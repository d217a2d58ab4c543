"""Per-model dynamic form schemas (runtime/forms.py + /api/form) — the
headless contract of the reference's generated Gradio forms
(wgp.py:11067 generate_media_tab; capability visibility per
models/model_metadata.py infer_capabilities)."""
import base64
import json

import pytest

from wan2gp_tpu.runtime.forms import form_schema


@pytest.fixture(scope="module")
def registry():
    from wan2gp_tpu.families import build_handler_map
    from wan2gp_tpu.config.registry import ModelRegistry
    return ModelRegistry(build_handler_map())


def _keys(schema, group=None):
    return [f["key"] for f in schema["fields"]
            if group is None or f["group"] == group]


def test_t2v_schema_basics(registry):
    s = form_schema(registry, "t2v_1.3B")
    keys = _keys(s)
    assert {"prompt", "negative_prompt", "resolution", "video_length",
            "num_inference_steps", "seed", "guidance_scale",
            "attention_mode", "sliding_window_size"} <= set(keys)
    # a pure t2v model shows no image/audio conditioners
    assert "image_start" not in keys and "audio_guide" not in keys
    res = next(f for f in s["fields"] if f["key"] == "resolution")
    assert res["type"] == "select" and "832x480" in res["choices"]


def test_i2v_gets_image_start(registry):
    s = form_schema(registry, "i2v")
    assert "image_start" in _keys(s, "inputs")


def test_vace_multitalk_capabilities(registry):
    s = form_schema(registry, "vace_multitalk_14B")
    inputs = _keys(s, "inputs")
    assert {"video_guide", "video_mask", "image_refs",
            "audio_guide", "audio_guide2"} <= set(inputs)
    # declared settings surface as guidance fields with their defaults
    g = {f["key"]: f for f in s["fields"] if f["group"] == "guidance"}
    assert "flow_shift" in g and "RIFLEx_setting" in g


def test_image_model_drops_video_group(registry):
    s = form_schema(registry, "flux_schnell")
    keys = _keys(s)
    assert s["image_outputs"]
    assert "video_length" not in keys
    assert "sliding_window_size" not in keys
    assert "temporal_upsampling" in keys     # post still applies


def test_every_model_schema_builds(registry):
    """No model type may crash the form generator (the reference builds
    a form for every registered def)."""
    for mt in registry.model_types():
        s = form_schema(registry, mt)
        assert s["fields"] and s["model_type"] == mt


def test_api_form_and_upload_routes(tmp_path):
    from wan2gp_tpu.runtime.webui import WebUI
    ui = WebUI(init_random_weights=True, save_path=str(tmp_path))
    status, _, body = ui.handle("GET", "/api/form?model=t2v_1.3B")
    assert status == 200
    schema = json.loads(body)
    assert any(f["key"] == "activated_loras" for f in schema["fields"])

    payload = {"name": "start.png",
               "data": "data:image/png;base64,"
                       + base64.b64encode(b"fakepng").decode()}
    status, _, body = ui.handle("POST", "/api/upload",
                                json.dumps(payload).encode())
    assert status == 200
    out = json.loads(body)
    assert out["file"] == "start.png" and out["size"] == 7
    assert (tmp_path / "start.png").read_bytes() == b"fakepng"
