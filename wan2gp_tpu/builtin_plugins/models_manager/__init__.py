"""Models Manager — built-in plugin (a real tenant of plugins.py).

Port of the reference's plugins/models_manager (plugin.py, 3,236 LoC of
Gradio tab UI) onto this framework's plugin contract: the same
capabilities — per-model checkpoint inventory, storage tree, missing-file
report, shared-file-aware deletion — exposed as an HTML page + JSON
actions under `/plugin/models_manager` and a `models_manager.*` tool set,
backed by runtime/models_manager.py.
"""
from __future__ import annotations

import json

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Models Manager</title>
<style>body{font-family:system-ui,sans-serif;margin:2em;max-width:70em}
table{border-collapse:collapse;width:100%}
td,th{border:1px solid #ddd;padding:4px 8px;font-size:13px;text-align:left}
.ok{color:#080}.miss{color:#b00}</style></head><body>
<h2>Models Manager</h2>
<p><input id="filter" placeholder="filter models" oninput="render()">
<button onclick="load()">Refresh</button></p>
<table id="tbl"><tr><th>model</th><th>status</th><th>size</th>
<th>missing</th><th></th></tr></table>
<script>
let inv = {};
async function load(){
 const r = await fetch('/plugin/models_manager',{method:'POST',
  body: JSON.stringify({action:'inventory'})});
 inv = (await r.json()).inventory; render()}
function fmt(n){return n>1e9?(n/1e9).toFixed(1)+' GB':
 n>1e6?(n/1e6).toFixed(1)+' MB':n+' B'}
async function del(mt){
 if(!confirm('Delete checkpoint files of '+mt+'?'))return;
 await fetch('/plugin/models_manager',{method:'POST',
  body: JSON.stringify({action:'delete', model_type:mt})}); load()}
function render(){
 const f = document.getElementById('filter').value.toLowerCase();
 const rows = Object.entries(inv).filter(([k])=>k.includes(f)).map(
  ([k,v])=>`<tr><td>${k}</td>
   <td class="${v.complete?'ok':'miss'}">${v.complete?'complete':
    'missing '+v.missing.length}</td>
   <td>${fmt(v.size_bytes)}</td><td>${v.missing.join(' ')}</td>
   <td><button onclick="del('${k}')">delete</button></td></tr>`);
 document.getElementById('tbl').innerHTML =
  '<tr><th>model</th><th>status</th><th>size</th><th>missing</th><th></th></tr>'
  + rows.join('')}
load();
</script></body></html>"""


def register(api):
    from wan2gp_tpu.runtime.models_manager import (
        inventory, storage_tree, missing_report, delete_model_files,
        shared_file_owners)

    def _registry():
        svc = api.service
        if svc is None:
            raise RuntimeError("models_manager needs a service context")
        return svc.registry

    def handle(method, payload):
        if method == "GET":
            return 200, "text/html; charset=utf-8", _PAGE.encode()
        reg = _registry()
        action = payload.get("action", "inventory")
        model = payload.get("model_type")
        inv = inventory(reg, model_types=[model] if model
                        and action != "delete" else None)
        if action == "inventory":
            out = {"inventory": {
                mt: {"complete": rec["complete"],
                     "size_bytes": rec["size_bytes"],
                     "missing": [m["filename"] for m in rec["missing"]]}
                for mt, rec in inv.items()}}
        elif action == "storage":
            out = {"storage": storage_tree(inv, reg)}
        elif action == "missing":
            out = {"missing": missing_report(inv)}
        elif action == "shared":
            out = {"shared": {f: sorted(o) for f, o in
                              shared_file_owners(inv).items()}}
        elif action == "delete":
            if not model:
                return (400, "application/json",
                        b'{"error": "delete needs model_type"}')
            deleted, kept = delete_model_files(
                reg, model,
                delete_shared=bool(payload.get("delete_shared", False)))
            out = {"deleted": deleted, "kept_shared": kept}
        else:
            return (400, "application/json",
                    json.dumps({"error": f"unknown action {action}"})
                    .encode())
        return 200, "application/json", json.dumps(out).encode()

    api.register_route("/plugin/models_manager", handle)
    api.register_tool(
        "models_manager.inventory",
        lambda model_type=None: inventory(
            _registry(),
            model_types=[model_type] if model_type else None))
    api.register_tool(
        "models_manager.delete",
        lambda model_type, delete_shared=False: delete_model_files(
            _registry(), model_type, delete_shared=delete_shared))
