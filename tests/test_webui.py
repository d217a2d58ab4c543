"""Web UI HTTP API tests (stub service — no model load)."""
import json
import http.client

import pytest

from wan2gp_tpu.runtime.api import Session
from wan2gp_tpu.runtime.webui import WebUI


class StubRegistry:
    def model_types(self):
        return ["t2v_1.3B", "flux_schnell"]

    def get(self, mt):
        return {"model": {"name": mt}}

    def base_model_type(self, mt):
        return mt

    def handler_for(self, mt):
        class H:
            family = "stub"

            @staticmethod
            def query_model_files(base, model_def):
                return [{"role": "transformer",
                         "urls": [f"https://h/{base}.safetensors"]}]
        return H

    def default_settings(self, mt):
        return {"prompt": "", "num_inference_steps": 30, "model_type": mt}


class StubService:
    def __init__(self):
        self.registry = StubRegistry()
        self.processed = []

    def process_queue(self, queue, on_event=None):
        while True:
            t = queue.next_pending()
            if t is None:
                return 0
            t.status = "done"
            t.outputs = [f"out_{t.id}.png"]
            self.processed.append(t.id)
            if on_event:
                on_event("task_done", t)


@pytest.fixture()
def ui(tmp_path):
    sess = Session(service=StubService())
    ui = WebUI(session=sess, save_path=str(tmp_path))
    yield ui
    ui.shutdown()


def test_webui_routes_inline(ui):
    status, ctype, body = ui.handle("GET", "/")
    assert status == 200 and b"Wan2GP" in body
    status, _, body = ui.handle("GET", "/api/models")
    assert status == 200 and json.loads(body) == ["t2v_1.3B", "flux_schnell"]
    status, _, body = ui.handle("GET", "/api/defaults?model=t2v_1.3B")
    assert json.loads(body)["num_inference_steps"] == 30

    status, _, body = ui.handle(
        "POST", "/api/generate",
        json.dumps({"model_type": "t2v_1.3B", "prompt": "hi"}).encode())
    assert status == 200
    tid = json.loads(body)["id"]
    ui.session.wait()
    status, _, body = ui.handle("GET", "/api/queue")
    tasks = json.loads(body)
    assert tasks[0]["id"] == tid and tasks[0]["status"] == "done"
    assert tasks[0]["outputs"] == [f"out_{tid}.png"]

    # bad requests
    status, _, _ = ui.handle("POST", "/api/generate",
                             json.dumps({"prompt": "no model"}).encode())
    assert status == 400
    status, _, _ = ui.handle("GET", "/api/nope")
    assert status == 404


def test_webui_http_server(ui, tmp_path):
    (tmp_path / "x.png").write_bytes(b"\x89PNGdata")
    host, port = ui.serve(background=True, port=0)
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", "/api/generate",
                 json.dumps({"model_type": "flux_schnell",
                             "prompt": "a"}).encode())
    assert conn.getresponse().status == 200
    ui.session.wait()
    conn.request("GET", "/api/queue")
    r = conn.getresponse()
    tasks = json.loads(r.read())
    assert tasks and tasks[0]["status"] == "done"
    conn.request("GET", "/outputs/x.png")
    r = conn.getresponse()
    assert r.status == 200 and r.read() == b"\x89PNGdata"
    assert r.getheader("Content-Type") == "image/png"
    conn.close()


def test_webui_queue_zip_download(ui, tmp_path):
    ui.session.queue.add({"prompt": "queued", "model_type": "t2v"})
    status, ctype, body = ui.handle("GET", "/api/queue/save")
    assert status == 200 and ctype == "application/zip"
    import zipfile, io
    with zipfile.ZipFile(io.BytesIO(body)) as zf:
        manifest = json.loads(zf.read("queue.json"))
    assert manifest[0]["params"]["prompt"] == "queued"


def test_webui_gallery_endpoints(ui, tmp_path):
    import numpy as np
    import time
    from wan2gp_tpu.utils import media
    fr = np.random.default_rng(0).integers(0, 255, (4, 16, 24, 3),
                                           dtype=np.uint8)
    media.save_video(fr, str(tmp_path / "vid.avi"), fps=4,
                     metadata={"prompt": "a cat", "model_type": "t2v",
                               "resolution": "832x480", "seed": 7})
    time.sleep(0.01)
    media.save_image(fr[0], str(tmp_path / "img.png"),
                     metadata={"prompt": "a dog"})
    media.save_audio(np.zeros(800, np.float32), str(tmp_path / "a.wav"))
    (tmp_path / "notes.txt").write_text("ignored")
    (tmp_path / "_ui_queue.zip").write_bytes(b"zz")

    status, _, body = ui.handle("GET", "/api/gallery")
    recs = json.loads(body)
    assert status == 200
    assert [r["file"] for r in recs] == ["a.wav", "img.png", "vid.avi"]
    assert recs[2]["prompt"] == "a cat"
    assert recs[2]["model_type"] == "t2v"
    # type filter
    _, _, body = ui.handle("GET", "/api/gallery?type=video")
    assert [r["file"] for r in json.loads(body)] == ["vid.avi"]
    # metadata recall
    _, _, body = ui.handle("GET", "/api/gallery/meta?file=vid.avi")
    meta = json.loads(body)
    assert meta["resolution"] == "832x480" and meta["seed"] == 7
    # thumbnails decode as JPEG for both video and image
    from PIL import Image
    import io as _io
    for f in ("vid.avi", "img.png"):
        status, ctype, data = ui.handle("GET", f"/api/thumb?file={f}")
        assert status == 200 and ctype == "image/jpeg"
        img = Image.open(_io.BytesIO(data))
        assert img.size == (24, 16)
    status, _, _ = ui.handle("GET", "/api/thumb?file=a.wav")
    assert status == 404
    status, _, _ = ui.handle("GET", "/api/thumb?file=missing.avi")
    assert status == 404
    # path traversal is neutralised by basename()
    _, _, body = ui.handle("GET",
                           "/api/gallery/meta?file=../../etc/passwd")
    assert json.loads(body) == {}
    _, _, body = ui.handle("GET", "/api/gallery/meta?file=../vid.avi")
    assert json.loads(body)["prompt"] == "a cat"


def test_webui_mask_editor_routes(ui, tmp_path, monkeypatch):
    """Mask editor page + SAM3 image/video mask endpoints
    (reference: shared/gradio/wangp_image_editor + preprocessing/sam3)."""
    import base64
    import io as _io
    import numpy as np
    from PIL import Image
    from wan2gp_tpu.utils.media import save_video

    monkeypatch.setenv("WAN2GP_SAM3", "tiny")
    ui.mask_backend.threshold = 0.0

    status, ctype, body = ui.handle("GET", "/mask")
    assert status == 200 and b"Mask editor" in body

    rng = np.random.default_rng(0)
    img = (rng.uniform(size=(40, 48, 3)) * 255).astype(np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    b64 = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()
    status, _, body = ui.handle(
        "POST", "/api/mask/sam3",
        json.dumps({"image": b64, "text": "a thing",
                    "points": [[24.0, 20.0]], "labels": [1]}).encode())
    assert status == 200, body
    out = json.loads(body)
    mdata = base64.b64decode(out["mask"].split(",", 1)[1])
    mask = np.asarray(Image.open(_io.BytesIO(mdata)))
    assert mask.shape == (40, 48)

    video = (rng.uniform(size=(2, 40, 48, 3)) * 255).astype(np.uint8)
    save_video(video, str(tmp_path / "clip.avi"))
    status, _, body = ui.handle(
        "POST", "/api/mask/video",
        json.dumps({"video": "clip.avi",
                    "keywords": ["a thing"]}).encode())
    assert status == 200, body
    out = json.loads(body)
    assert out["frames"] == 2
    assert (tmp_path / out["file"]).exists()


def test_models_inventory_route(ui):
    status, ctype, body = ui.handle("GET", "/api/models/inventory"
                                    "?model=t2v_1.3B")
    assert status == 200
    import json as _json
    data = _json.loads(body)
    assert "t2v_1.3B" in data["inventory"]
    rec = data["inventory"]["t2v_1.3B"]
    assert "size_bytes" in rec and "missing" in rec
    assert "total_bytes" in data["storage"]
