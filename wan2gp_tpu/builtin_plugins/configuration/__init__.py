"""Configuration — built-in plugin (a real tenant of plugins.py).

Port of the reference's plugins/configuration (725 LoC Gradio settings
tab) onto this framework's plugin contract: view/edit the server config
(wgp_config.json keys — runtime/server_config.py) at
`/plugin/configuration`, persisted to disk, plus `config.get/set`
tools.  Changes that affect pipeline loading take effect for the next
load (pipelines are keyed in the service cache).
"""
from __future__ import annotations

import json
import os

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Configuration</title>
<style>body{font-family:system-ui,sans-serif;margin:2em;max-width:50em}
table{border-collapse:collapse;width:100%}
td,th{border:1px solid #ddd;padding:4px 8px;font-size:13px}
input{width:95%}</style></head><body>
<h2>Server configuration</h2>
<table id="tbl"><tr><th>key</th><th>value</th></tr></table>
<p><button onclick="save()">Save</button> <span id="msg"></span></p>
<script>
let cfg={};
async function load(){
 const r=await fetch('/plugin/configuration',{method:'POST',
  body:JSON.stringify({action:'get'})});
 cfg=(await r.json()).config;
 document.getElementById('tbl').innerHTML=
  '<tr><th>key</th><th>value</th></tr>'+Object.entries(cfg).map(
  ([k,v])=>`<tr><td>${k}</td><td><input id="c_${k}"
   value='${JSON.stringify(v).replace(/'/g,"&#39;")}'></td></tr>`).join('')}
async function save(){
 const upd={};
 for(const k of Object.keys(cfg)){
  try{upd[k]=JSON.parse(document.getElementById('c_'+k).value)}
  catch(e){upd[k]=document.getElementById('c_'+k).value}}
 const r=await fetch('/plugin/configuration',{method:'POST',
  body:JSON.stringify({action:'set', values:upd})});
 document.getElementById('msg').textContent=
  (await r.json()).saved?'saved':'error'; load()}
load();
</script></body></html>"""


def register(api):
    from wan2gp_tpu.runtime.server_config import (load_server_config,
                                                  save_server_config)

    def _path():
        svc = api.service
        return getattr(svc, "config_path", None) or "wgp_config.json"

    def get_config() -> dict:
        return load_server_config(_path())

    def set_config(values: dict) -> dict:
        cfg = load_server_config(_path())
        cfg.update(values or {})
        save_server_config(cfg, _path())
        return {"saved": True, "config": cfg}

    def handle(method, payload):
        if method == "GET":
            return 200, "text/html; charset=utf-8", _PAGE.encode()
        action = payload.get("action", "get")
        if action == "get":
            out = {"config": get_config()}
        elif action == "set":
            values = payload.get("values")
            if not isinstance(values, dict):
                return (400, "application/json",
                        b'{"error": "set needs a values object"}')
            out = set_config(values)
        else:
            return (400, "application/json",
                    json.dumps({"error": f"unknown action {action}"})
                    .encode())
        return 200, "application/json", json.dumps(out).encode()

    api.register_route("/plugin/configuration", handle)
    api.register_tool("config.get", get_config)
    api.register_tool("config.set", set_config)
