"""Minimal web UI + HTTP API over the generation queue.

The TPU stand-in for the reference's Gradio app (wgp.py `create_ui`,
shared/api.py server surface): a stdlib http.server serving a single-page
queue console plus a JSON API.  Gradio isn't in the image, and the heavy
UI layer is orthogonal to the TPU compute path — the API surface is the
part tools integrate against (mirrors the MCP tool set in mcp_server.py).

Endpoints:
  GET  /                      single-page UI
  GET  /api/models            model types
  GET  /api/defaults?model=T  default settings for a model
  GET  /api/queue             task list (id/status/settings/outputs/error)
  POST /api/generate          body: settings JSON -> {"id": task_id}
  POST /api/queue/remove      body: {"id": N}
  POST /api/queue/move        body: {"id": N, "delta": +-1}
  GET  /api/queue/save        download queue.zip (reference manifest format)
  POST /api/queue/load        body: {"path": "..."} load queue.zip/json
  GET  /outputs/<name>        serve a generated media file
  GET  /api/gallery?type=T    generated-media gallery records (newest
                              first; type: any|video|image|audio)
  GET  /api/gallery/meta?file=N  embedded generation settings of a file
  GET  /api/thumb?file=N      JPEG thumbnail (first video frame / image)
  GET  /api/models/inventory  checkpoint inventory + storage tree +
                              missing-file report (models manager)
  GET  /mask                  canvas mask editor (runtime/mask_editor.py)
  POST /api/mask/sam3         SAM3 image mask  {image, text?, points?}
  POST /api/mask/video        SAM3 keyword mask video {video, keywords}

The gallery trio is the HTTP counterpart of the reference's output
galleries (wgp.py refresh_gallery:4332, shared/gradio/gallery.py
AdvancedMediaGallery) including settings recall into the form.
"""
from __future__ import annotations

import io
import json
import os
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

from .api import Session

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Wan2GP-TPU</title>
<style>
body{font-family:system-ui,sans-serif;margin:2em;max-width:60em}
fieldset{border:1px solid #ccc;margin-bottom:1em}
table{border-collapse:collapse;width:100%}
td,th{border:1px solid #ddd;padding:4px 8px;text-align:left;font-size:14px}
.done{color:#080}.error{color:#b00}.running{color:#06c}
textarea{width:100%}button{margin-right:.5em}
</style></head><body>
<h2>Wan2GP-TPU</h2>
<p><a href="/mask">mask editor</a>
<a href="/plugin/models_manager">models manager</a>
<a href="/plugin/guides">guides</a></p>
<fieldset><legend>New task</legend>
<p>Model: <select id="model" onchange="loadForm()"></select>
<span id="modeldesc" style="color:#666;font-size:13px"></span></p>
<div id="form"></div>
<p><button onclick="submitTask()">Generate</button>
<button onclick="saveQueue()">Save queue.zip</button></p>
</fieldset>
<table id="queue"><tr><th>id</th><th>status</th><th>prompt</th>
<th>outputs</th><th></th></tr></table>
<fieldset><legend>Gallery</legend>
<p>
<button onclick="setTab('any')">All</button>
<button onclick="setTab('video')">Videos</button>
<button onclick="setTab('image')">Images</button>
<button onclick="setTab('audio')">Audio</button>
</p>
<div id="gallery" style="display:flex;flex-wrap:wrap;gap:8px"></div>
</fieldset>
<script>
async function j(u,opt){const r=await fetch(u,opt);return r.json()}
async function loadModels(){const ms=await j('/api/models');
 const s=document.getElementById('model');
 s.innerHTML=ms.map(m=>`<option>${m}</option>`).join('');loadForm()}
let schema=null;
const GROUPS={basic:'Basic',inputs:'Media inputs',guidance:'Guidance',
 acceleration:'Acceleration',loras:'LoRAs',window:'Sliding window',
 post:'Postprocessing'};
async function loadForm(){
 const m=document.getElementById('model').value; if(!m)return;
 schema=await j('/api/form?model='+encodeURIComponent(m));
 document.getElementById('modeldesc').textContent=schema.description||'';
 const by={};schema.fields.forEach(f=>{(by[f.group]=by[f.group]||[]).push(f)});
 document.getElementById('form').innerHTML=schema.groups.filter(g=>by[g])
  .map(g=>`<details ${g=='basic'||g=='inputs'?'open':''}>
   <summary>${GROUPS[g]||g}</summary><p>`+by[g].map(f=>{
   const id='f_'+f.key;
   if(f.type=='textarea')return `${f.label}<br>
    <textarea id="${id}" rows="2">${f.default||''}</textarea><br>`;
   if(f.type=='select')return `<label>${f.label}
    <select id="${id}">${(f.choices||[]).map(c=>
     `<option ${c==f.default?'selected':''}>${c}</option>`).join('')}
    </select></label> `;
   if(f.type=='multiselect')return `<label>${f.label}
    <select id="${id}" multiple size="3">${(f.choices||[]).map(c=>
     `<option>${c}</option>`).join('')}</select></label> `;
   if(f.type=='file'||f.type=='files')return `<label>${f.label}
    <input type="file" id="${id}" ${f.type=='files'?'multiple':''}
     data-media="1"></label> `;
   return `<label>${f.label} <input id="${id}"
    value="${f.default==null?'':f.default}" size="8"></label> `;
  }).join('')+'</p></details>').join('')}
async function uploadFile(file){
 const data=await new Promise(res=>{const r=new FileReader();
  r.onload=()=>res(r.result);r.readAsDataURL(file)});
 const out=await j('/api/upload',{method:'POST',
  body:JSON.stringify({name:file.name,data})});
 return out.file}
async function submitTask(){
 if(!schema)return;
 const s={model_type:document.getElementById('model').value};
 for(const f of schema.fields){
  const el=document.getElementById('f_'+f.key); if(!el)continue;
  if(f.type=='file'||f.type=='files'){
   if(!el.files.length)continue;
   const names=[];for(const fl of el.files)names.push(await uploadFile(fl));
   s[f.key]=f.type=='file'?names[0]:names;
  }else if(f.type=='multiselect'){
   const v=[...el.selectedOptions].map(o=>o.value);
   if(v.length)s[f.key]=v;
  }else if(f.type=='int'){s[f.key]=parseInt(el.value)||0}
  else if(f.type=='float'){s[f.key]=parseFloat(el.value)||0}
  else if(el.value!=='')s[f.key]=el.value}
 await j('/api/generate',{method:'POST',body:JSON.stringify(s)});
 refresh()}
async function removeTask(id){await j('/api/queue/remove',
 {method:'POST',body:JSON.stringify({id})});refresh()}
function saveQueue(){location.href='/api/queue/save'}
async function refresh(){const ts=await j('/api/queue');
 const rows=ts.map(t=>`<tr><td>${t.id}</td>
  <td class="${t.status}">${t.status}</td>
  <td>${(t.settings.prompt||'').slice(0,80)}</td>
  <td>${(t.outputs||[]).map(o=>`<a href="/outputs/${
    o.split('/').pop()}">${o.split('/').pop()}</a>`).join(' ')}
   ${t.error||''}</td>
  <td><button onclick="removeTask(${t.id})">x</button></td></tr>`);
 document.getElementById('queue').innerHTML=
  '<tr><th>id</th><th>status</th><th>prompt</th><th>outputs</th><th></th></tr>'
  +rows.join('')}
let tab='any';
function setTab(t){tab=t;refreshGallery()}
async function recallSettings(f){
 const m=await j('/api/gallery/meta?file='+encodeURIComponent(f));
 if(m.model_type){document.getElementById('model').value=m.model_type;
  await loadForm()}
 for(const [k,v] of Object.entries(m)){
  const el=document.getElementById('f_'+k);
  if(el&&el.type!=='file'&&v!==null&&v!==undefined)el.value=v}}
async function refreshGallery(){
 const rs=await j('/api/gallery?type='+tab+'&limit=48');
 document.getElementById('gallery').innerHTML=rs.map(r=>
  `<div style="width:200px;font-size:12px">
   <a href="/outputs/${r.file}">${r.type=='audio'?'&#127925; '+r.file:
    `<img src="/api/thumb?file=${r.file}" style="max-width:192px">`}
   </a><br>${r.file}<br><i>${r.prompt}</i><br>
   <button onclick="recallSettings('${r.file}')">&#8635; settings</button>
  </div>`).join('')}
loadModels();refresh();refreshGallery();
setInterval(refresh,2000);setInterval(refreshGallery,5000);
</script></body></html>"""

_MEDIA_TYPES = {".png": "image/png", ".jpg": "image/jpeg",
                ".avi": "video/x-msvideo", ".mp4": "video/mp4",
                ".json": "application/json", ".zip": "application/zip",
                ".wav": "audio/wav"}


class WebUI:
    def __init__(self, session: Optional[Session] = None,
                 save_path: str = "outputs", mcp: bool = False,
                 **session_kwargs):
        if session is None:
            # the gallery/outputs routes read save_path — generations
            # must land in the same directory
            session_kwargs.setdefault("output_dir", save_path)
        self.session = session or Session(**session_kwargs)
        self.save_path = save_path
        self._server: Optional[ThreadingHTTPServer] = None
        from .mask_editor import MaskBackend
        self.mask_backend = MaskBackend(save_path=save_path)
        # MCP over the same HTTP server (reference shared/mcp_server.py
        # sse/streamable-http transports): /mcp, /sse, /messages
        self.mcp = None
        if mcp:
            from .mcp_server import McpServer, McpHttp
            self.mcp = McpHttp(McpServer(self.session))
        # Deepy chat agent, built lazily on first /api/agent call; tests
        # or embedders may preinstall one via set_agent()
        self._agent_obj = None

    def set_agent(self, agent):
        self._agent_obj = agent

    def _agent(self):
        if self._agent_obj is not None:
            return self._agent_obj
        svc = self.session.service
        llm = getattr(svc, "agent_llm_generate", None)
        if llm is None:
            return None
        from ..agent import build_agent
        self._agent_obj = build_agent(self.session, llm)
        return self._agent_obj

    # -- request handling (returns (status, content_type, bytes)) ----------

    def handle(self, method: str, path: str, body: bytes = b""):
        url = urllib.parse.urlparse(path)
        route = url.path.rstrip("/") or "/"
        qs = urllib.parse.parse_qs(url.query)
        plugin_routes = getattr(self.session.service, "plugins", None)
        if plugin_routes is not None and route in plugin_routes.routes:
            try:
                payload = json.loads(body.decode("utf-8")) if body else {}
                return plugin_routes.routes[route](method, payload)
            except Exception as e:
                return 500, "application/json", json.dumps(
                    {"error": str(e)}).encode()
        try:
            if route == "/mask" or route.startswith("/api/mask/"):
                from .mask_editor import handle_mask_route
                payload = json.loads(body.decode("utf-8")) if body else {}
                resp = handle_mask_route(self.mask_backend, route, method,
                                         payload)
                if resp is not None:
                    return resp
            if method == "GET":
                return self._get(route, qs)
            if method == "POST":
                payload = json.loads(body.decode("utf-8")) if body else {}
                return self._post(route, payload)
        except (KeyError, ValueError) as e:
            return 400, "application/json", json.dumps(
                {"error": str(e)}).encode()
        return 405, "text/plain", b"method not allowed"

    def _get(self, route, qs):
        ok = lambda obj: (200, "application/json",
                          json.dumps(obj).encode("utf-8"))
        if route == "/":
            return 200, "text/html; charset=utf-8", _PAGE.encode()
        if route == "/api/models":
            return ok(self.session.list_models())
        if route == "/api/defaults":
            return ok(self.session.default_settings(qs["model"][0]))
        if route == "/api/form":
            # per-model dynamic form schema (the reference's generated
            # Gradio form, wgp.py:11067 — runtime/forms.py)
            from .forms import form_schema
            model = qs["model"][0]
            schema = form_schema(self.session.service.registry, model)
            svc = self.session.service
            if hasattr(svc, "list_loras"):
                loras = svc.list_loras(model)
                for f in schema["fields"]:
                    if f["key"] == "activated_loras":
                        f["choices"] = loras.get("loras", [])
            return ok(schema)
        if route == "/api/queue":
            return ok([{"id": t.id, "status": t.status,
                        "settings": t.settings, "outputs": t.outputs,
                        "error": t.error}
                       for t in self.session.queue.tasks()])
        if route == "/api/stats":
            from ..utils.diagnostics import device_stats
            return ok(device_stats())
        if route == "/api/models/inventory":
            # models-manager tree (runtime/models_manager.py; the
            # reference plugins/models_manager tab)
            from .models_manager import inventory, storage_tree, \
                missing_report
            reg = self.session.service.registry
            model = (qs.get("model") or [None])[0]
            inv = inventory(reg, model_types=[model] if model
                            else None)
            return ok({"inventory": {
                mt: {"complete": rec["complete"],
                     "size_bytes": rec["size_bytes"],
                     "missing": [m["filename"]
                                 for m in rec["missing"]]}
                for mt, rec in inv.items()},
                "storage": storage_tree(inv, reg),
                "missing": missing_report(inv)})
        if route == "/api/queue/save":
            path = os.path.join(self.save_path, "_ui_queue.zip")
            os.makedirs(self.save_path, exist_ok=True)
            if not self.session.queue.save_zip(path):
                return 404, "text/plain", b"queue is empty"
            with open(path, "rb") as f:
                return 200, "application/zip", f.read()
        if route == "/api/loras":
            model = (qs.get("model") or [""])[0]
            svc = self.session.service
            if hasattr(svc, "list_loras"):
                return ok(svc.list_loras(model))
            return ok({"dir": "", "loras": [], "presets": []})
        if route == "/api/gallery":
            mtype = (qs.get("type") or ["any"])[0]
            limit = int((qs.get("limit") or ["60"])[0])
            return ok(self._gallery_records(mtype, limit))
        if route == "/api/gallery/meta":
            name = os.path.basename(qs["file"][0])
            return ok(self._file_metadata(
                os.path.join(self.save_path, name)) or {})
        if route == "/api/thumb":
            name = os.path.basename(qs["file"][0])
            data = self._thumbnail(os.path.join(self.save_path, name))
            if data is None:
                return 404, "text/plain", b"no thumbnail"
            return 200, "image/jpeg", data
        if route.startswith("/outputs/"):
            name = os.path.basename(route[len("/outputs/"):])
            fpath = os.path.join(self.save_path, name)
            if not os.path.isfile(fpath):
                return 404, "text/plain", b"not found"
            ctype = _MEDIA_TYPES.get(os.path.splitext(name)[1],
                                     "application/octet-stream")
            with open(fpath, "rb") as f:
                return 200, ctype, f.read()
        return 404, "text/plain", b"not found"

    def _post(self, route, payload: Dict[str, Any]):
        ok = lambda obj: (200, "application/json",
                          json.dumps(obj).encode("utf-8"))
        if route == "/api/upload":
            # media upload for the dynamic form's file fields:
            # {"name": ..., "data": base64} -> saved into outputs, the
            # returned name becomes the settings value (the reference
            # uploads through Gradio's file widgets)
            import base64
            name = os.path.basename(str(payload["name"])) or "upload.bin"
            data = payload["data"]
            if isinstance(data, str) and data.startswith("data:"):
                data = data.split(",", 1)[1]
            os.makedirs(self.save_path, exist_ok=True)
            path = os.path.join(self.save_path, name)
            with open(path, "wb") as f:
                f.write(base64.b64decode(data))
            return ok({"file": name, "size": os.path.getsize(path)})
        if route == "/api/agent":
            # Deepy chat over HTTP (the reference's Gradio chat panel,
            # shared/deepy/controller.py): {"message": ...} -> {"reply"}
            agent = self._agent()
            if agent is None:
                return (503, "application/json",
                        b'{"error": "no agent LLM available"}')
            return ok({"reply": agent.chat(str(payload["message"]))})
        if route == "/api/generate":
            if not isinstance(payload, dict) or "model_type" not in payload:
                raise ValueError("settings must include model_type")
            return ok({"id": self.session.submit_task(payload)})
        if route == "/api/queue/remove":
            return ok({"removed": self.session.queue.remove(
                int(payload["id"]))})
        if route == "/api/queue/move":
            return ok({"moved": self.session.queue.move(
                int(payload["id"]), int(payload.get("delta", 0)))})
        if route == "/api/queue/load":
            self.session.queue.load(payload["path"])
            if self.session.queue.pending_count():
                self.session._ensure_worker()
            return ok({"tasks": len(self.session.queue.tasks())})
        return 404, "text/plain", b"not found"

    # -- gallery ------------------------------------------------------------

    def _gallery_records(self, media_type: str = "any", limit: int = 60):
        """Newest-first records of generated files in save_path."""
        from ..media_registry import detect_media_type
        if not os.path.isdir(self.save_path):
            return []
        recs = []
        for name in os.listdir(self.save_path):
            if name.startswith("_") or name.endswith(".json"):
                continue
            path = os.path.join(self.save_path, name)
            if not os.path.isfile(path):
                continue
            mtype = detect_media_type(path)
            if mtype == "any" or \
                    (media_type not in ("any", "") and mtype != media_type):
                continue
            meta = self._file_metadata(path) or {}
            recs.append({"file": name, "type": mtype,
                         "size": os.path.getsize(path),
                         "mtime": os.path.getmtime(path),
                         "prompt": str(meta.get("prompt", ""))[:160],
                         "model_type": meta.get("model_type", "")})
        recs.sort(key=lambda r: -r["mtime"])
        return recs[:limit]

    def _file_metadata(self, path):
        from ..utils import media
        if not os.path.isfile(path):
            return None
        ext = os.path.splitext(path)[1].lower()
        try:
            if ext == ".avi":
                return media.read_video_metadata(path)
            if ext in (".png", ".jpg", ".jpeg", ".webp"):
                return media.read_image_metadata(path)
            return media._read_sidecar(path)
        except Exception:
            return None

    def _thumbnail(self, path, size: int = 192):
        """JPEG thumbnail bytes for a video (first frame) or image."""
        from ..utils import media
        if not os.path.isfile(path):
            return None
        ext = os.path.splitext(path)[1].lower()
        frame = None
        if ext == ".avi":
            frame = media.read_first_frame(path)
        elif ext in (".png", ".jpg", ".jpeg", ".webp", ".bmp"):
            from PIL import Image
            import numpy as np
            frame = np.asarray(Image.open(path).convert("RGB"))
        if frame is None:
            return None
        from PIL import Image
        img = Image.fromarray(frame)
        img.thumbnail((size, size))
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=85)
        return buf.getvalue()

    # -- server lifecycle ---------------------------------------------------

    def serve(self, host: str = "127.0.0.1", port: int = 7860,
              background: bool = False):
        ui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):   # quiet
                pass

            def _dispatch(self, method):
                url = urllib.parse.urlparse(self.path)
                route = url.path.rstrip("/") or "/"
                if ui.mcp is not None and route in ui.mcp.ROUTES:
                    if route == "/sse" and method == "GET":
                        self.send_response(200)
                        self.send_header("Content-Type",
                                         "text/event-stream")
                        self.send_header("Cache-Control", "no-cache")
                        self.end_headers()
                        ui.mcp.write_sse_stream(self.wfile)
                        return
                    n = int(self.headers.get("Content-Length") or 0)
                    body = self.rfile.read(n) if n else b""
                    hdrs = dict(self.headers)
                    hdrs["_query"] = url.query
                    resp = ui.mcp.route(method, route, hdrs, body)
                    if resp is not None:
                        status, rhdrs, data = resp
                        self.send_response(status)
                        for k, v in rhdrs.items():
                            self.send_header(k, v)
                        self.send_header("Content-Length", str(len(data)))
                        self.end_headers()
                        self.wfile.write(data)
                        return
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                status, ctype, data = ui.handle(method, self.path, body)
                self.send_response(status)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_DELETE(self):
                self._dispatch("DELETE")

        self._server = ThreadingHTTPServer((host, port), Handler)
        if background:
            threading.Thread(target=self._server.serve_forever,
                             daemon=True).start()
            return self._server.server_address
        print(f"wan2gp-tpu web UI on http://{host}:{port}")
        try:
            self._server.serve_forever()
        except KeyboardInterrupt:
            pass

    def shutdown(self):
        if self._server is not None:
            self._server.shutdown()
            self._server.server_close()
            self._server = None


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser(description="wan2gp-tpu web UI")
    ap.add_argument("--listen", default="127.0.0.1")
    ap.add_argument("--server-port", type=int, default=7860)
    ap.add_argument("--save-path", default="outputs")
    ap.add_argument("--mcp", action="store_true",
                    help="also serve MCP at /mcp (streamable-http) and "
                         "/sse (legacy SSE)")
    args = ap.parse_args(argv)
    WebUI(save_path=args.save_path, mcp=args.mcp).serve(args.listen,
                                                        args.server_port)


if __name__ == "__main__":
    main()
