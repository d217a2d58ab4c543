"""Mask-creation workflow: canvas editor page + SAM3 backend routes.

TPU stand-in for the reference's image/mask editor and video mask
creator (shared/gradio/wangp_image_editor/ — brush/point canvas with a
"magic mask" SAM backend, shared/gradio/magic_mask.py;
preprocessing/sam3/preprocessor.py run_sam3_video / image grounding as
the segmentation engine).  Served by runtime/webui.py:

  GET  /mask             canvas mask editor (brush + points + keyword)
  POST /api/mask/sam3    {image: b64 png, text?, points?, labels?}
                         -> {mask: b64 png (L-mode 0/255)}
  POST /api/mask/video   {video: outputs filename | frames b64 list,
                          keywords: [...]} -> {file: mask video name}

The SAM3 predictor is built lazily on first use.  `WAN2GP_SAM3=tiny`
selects the test-size config (random weights either way in this
environment — checkpoint loading hooks in io/downloads.py).
"""
from __future__ import annotations

import base64
import io
import json
import os
import threading
from typing import Any, Dict, List, Optional

import numpy as np

_MASK_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Mask editor</title>
<style>
body{font-family:system-ui,sans-serif;margin:2em;max-width:70em}
#wrap{position:relative;display:inline-block}
#img,#ov{position:absolute;left:0;top:0}
#wrap canvas{cursor:crosshair}
button{margin-right:.5em}input[type=text]{width:16em}
</style></head><body>
<h2>Mask editor</h2>
<p>
<input type="file" id="file" accept="image/*">
<label>brush <input type="range" id="brush" min="2" max="80" value="20">
</label>
<button onclick="setMode('paint')">paint</button>
<button onclick="setMode('erase')">erase</button>
<button onclick="setMode('pos')">+point</button>
<button onclick="setMode('neg')">-point</button>
<button onclick="clearAll()">clear</button>
</p>
<p>
<input type="text" id="kw" placeholder="keyword, e.g. 'the dog'">
<button onclick="runSam()">magic mask (SAM3)</button>
<button onclick="exportMask()">download mask.png</button>
</p>
<div id="wrap">
<canvas id="img" width="512" height="512"></canvas>
<canvas id="ov" width="512" height="512" style="opacity:.55"></canvas>
</div>
<p>
<input type="text" id="vid" placeholder="outputs video file, e.g. x.avi">
<button onclick="runVideo()">propagate keywords over video</button>
<span id="status"></span>
</p>
<script>
let mode='paint',pts=[],labs=[],drawing=false;
const img=document.getElementById('img'),ov=document.getElementById('ov');
const ictx=img.getContext('2d'),octx=ov.getContext('2d');
function setMode(m){mode=m}
document.getElementById('file').onchange=e=>{
 const f=e.target.files[0];if(!f)return;
 const im=new Image();im.onload=()=>{
  img.width=ov.width=im.width;img.height=ov.height=im.height;
  ictx.drawImage(im,0,0)};
 im.src=URL.createObjectURL(f)};
function pos(e){const r=ov.getBoundingClientRect();
 return [e.clientX-r.left,e.clientY-r.top]}
ov.onmousedown=e=>{const [x,y]=pos(e);
 if(mode=='pos'||mode=='neg'){pts.push([x,y]);
  labs.push(mode=='pos'?1:0);
  octx.fillStyle=mode=='pos'?'#0f0':'#f00';
  octx.fillRect(x-3,y-3,6,6);return}
 drawing=true;paint(e)};
ov.onmousemove=e=>{if(drawing)paint(e)};
ov.onmouseup=()=>drawing=false;
function paint(e){const [x,y]=pos(e);
 const b=+document.getElementById('brush').value;
 octx.globalCompositeOperation=
  mode=='erase'?'destination-out':'source-over';
 octx.fillStyle='#fff';octx.beginPath();
 octx.arc(x,y,b/2,0,7);octx.fill();
 octx.globalCompositeOperation='source-over'}
function clearAll(){octx.clearRect(0,0,ov.width,ov.height);
 pts=[];labs=[]}
async function runSam(){
 const st=document.getElementById('status');st.textContent='running...';
 const r=await fetch('/api/mask/sam3',{method:'POST',
  body:JSON.stringify({image:img.toDataURL('image/png'),
   text:document.getElementById('kw').value||null,
   points:pts.length?pts:null,labels:labs.length?labs:null})});
 const o=await r.json();st.textContent=o.error||'done';
 if(o.mask){const m=new Image();m.onload=()=>octx.drawImage(m,0,0);
  m.src=o.mask}}
function exportMask(){const a=document.createElement('a');
 a.download='mask.png';a.href=ov.toDataURL('image/png');a.click()}
async function runVideo(){
 const st=document.getElementById('status');st.textContent='running...';
 const r=await fetch('/api/mask/video',{method:'POST',
  body:JSON.stringify({video:document.getElementById('vid').value,
   keywords:document.getElementById('kw').value.split(',')})});
 const o=await r.json();
 st.innerHTML=o.error||('mask video: <a href="/outputs/'+o.file+'">'
  +o.file+'</a>')}
</script></body></html>"""


def _decode_image_b64(data: str) -> np.ndarray:
    """data-URL or raw base64 PNG -> [H, W, 3] uint8."""
    from PIL import Image
    if "," in data and data.lstrip().startswith("data:"):
        data = data.split(",", 1)[1]
    img = Image.open(io.BytesIO(base64.b64decode(data)))
    return np.asarray(img.convert("RGB"))


def _encode_mask_png(mask: np.ndarray) -> str:
    """[H, W] bool -> data-URL PNG (white = selected)."""
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray((mask.astype(np.uint8)) * 255, "L").save(
        buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()


class MaskBackend:
    """Lazy SAM3 predictors shared by the editor routes."""

    def __init__(self, save_path: str = "outputs",
                 config: Optional[Any] = None, threshold: float = 0.5):
        self.save_path = save_path
        self._config = config
        self.threshold = threshold
        # RLock: video_predictor() builds on image_predictor() under
        # the same lock
        self._lock = threading.RLock()
        self._image_pred = None
        self._video_pred = None

    def _cfg(self):
        from ..preprocessing.sam3 import Sam3Config
        if self._config is not None:
            return self._config
        if os.environ.get("WAN2GP_SAM3", "").lower() == "tiny":
            return Sam3Config.tiny()
        return Sam3Config()

    def _params(self, cfg):
        import jax
        from ..preprocessing.sam3 import init_sam3
        # checkpoint loading is stubbed in this environment (zero
        # egress); production path would come through io/downloads.py
        return init_sam3(jax.random.PRNGKey(0), cfg)

    def image_predictor(self):
        with self._lock:
            if self._image_pred is None:
                from ..preprocessing.sam3 import Sam3ImagePredictor
                cfg = self._cfg()
                self._image_pred = Sam3ImagePredictor(
                    self._params(cfg), cfg, threshold=self.threshold)
            return self._image_pred

    def video_predictor(self):
        with self._lock:
            if self._video_pred is None:
                from ..preprocessing.sam3.video import Sam3VideoPredictor
                cfg = self._cfg()
                pred = self.image_predictor()
                self._video_pred = Sam3VideoPredictor(
                    pred.params, cfg, threshold=self.threshold,
                    tokenizer=pred.tokenizer)
            return self._video_pred

    # -- route handlers ----------------------------------------------------

    def segment_image(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        img = _decode_image_b64(payload["image"])
        pred = self.image_predictor()
        pts = payload.get("points")
        labs = payload.get("labels")
        out = pred(img, text=payload.get("text"),
                   points=None if pts is None else np.asarray(
                       pts, np.float32),
                   point_labels=None if labs is None else np.asarray(
                       labs, np.float32))
        union = np.any(out["masks"], axis=0)
        return {"mask": _encode_mask_png(union),
                "scores": [float(s) for s in out["scores"]]}

    def segment_video(self, payload: Dict[str, Any]) -> Dict[str, Any]:
        from ..preprocessing.sam3.video import run_sam3_video
        from ..utils.media import read_mjpeg_avi, save_video
        if "frames" in payload:
            video = np.stack([_decode_image_b64(f)
                              for f in payload["frames"]])
        else:
            name = os.path.basename(str(payload["video"]))
            path = os.path.join(self.save_path, name)
            if not os.path.isfile(path):
                raise ValueError(f"no such video: {name}")
            video = read_mjpeg_avi(path)
        keywords = [k for k in payload.get("keywords", []) if str(k).strip()]
        mask = run_sam3_video(video, keywords, self.video_predictor())
        out_name = "mask_" + os.path.splitext(
            os.path.basename(str(payload.get("video", "frames"))))[0] \
            + ".avi"
        os.makedirs(self.save_path, exist_ok=True)
        frames = np.repeat(mask[..., None].astype(np.uint8) * 255, 3,
                           axis=-1)
        save_video(frames, os.path.join(self.save_path, out_name))
        return {"file": out_name, "frames": int(mask.shape[0]),
                "coverage": float(mask.mean())}


def handle_mask_route(backend: MaskBackend, route: str, method: str,
                      payload: Dict[str, Any]):
    """Dispatch for webui.handle; returns (status, ctype, bytes) or
    None if the route is not a mask route."""
    ok = lambda obj: (200, "application/json",
                      json.dumps(obj).encode("utf-8"))
    if route == "/mask" and method == "GET":
        return 200, "text/html; charset=utf-8", _MASK_PAGE.encode()
    if route == "/api/mask/sam3" and method == "POST":
        return ok(backend.segment_image(payload))
    if route == "/api/mask/video" and method == "POST":
        return ok(backend.segment_video(payload))
    return None
