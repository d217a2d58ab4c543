"""Guides — built-in plugin (a real tenant of plugins.py).

Port of the reference's plugins/guides (a Gradio docs browser over the
repo's markdown guides, 132 LoC) onto this framework's plugin contract:
`/plugin/guides` lists and serves the docs/ markdown files as a minimal
HTML reader, plus a `guides.read` tool for the agent.
"""
from __future__ import annotations

import json
import os

def _docs_dir() -> str:
    # anchored to the installed package (not __file__): an installed
    # COPY of this plugin in a user plugins dir must still find docs/
    import wan2gp_tpu
    return os.path.join(
        os.path.dirname(os.path.dirname(wan2gp_tpu.__file__)), "docs")


_DOCS_DIR = _docs_dir()

_PAGE = """<!doctype html>
<html><head><meta charset="utf-8"><title>Guides</title>
<style>body{font-family:system-ui,sans-serif;margin:2em;max-width:60em}
pre{background:#f6f6f6;padding:1em;overflow-x:auto;white-space:pre-wrap}
a{margin-right:1em}</style></head><body>
<h2>Guides</h2><div id="list"></div><pre id="doc"></pre>
<script>
async function load(){
 const r = await fetch('/plugin/guides',{method:'POST',
  body:JSON.stringify({action:'list'})});
 const docs = (await r.json()).guides;
 document.getElementById('list').innerHTML = docs.map(d=>
  `<a href="#" onclick="show('${d}');return false">${d}</a>`).join('')}
async function show(name){
 const r = await fetch('/plugin/guides',{method:'POST',
  body:JSON.stringify({action:'read', name})});
 document.getElementById('doc').textContent = (await r.json()).text}
load();
</script></body></html>"""


def _list_guides():
    if not os.path.isdir(_DOCS_DIR):
        return []
    return sorted(f for f in os.listdir(_DOCS_DIR) if f.endswith(".md"))


def _read_guide(name: str) -> str:
    base = os.path.basename(str(name))
    if base not in _list_guides():
        raise FileNotFoundError(f"no such guide: {base}")
    with open(os.path.join(_DOCS_DIR, base), "r", encoding="utf-8") as f:
        return f.read()


def register(api):
    def handle(method, payload):
        if method == "GET":
            return 200, "text/html; charset=utf-8", _PAGE.encode()
        action = payload.get("action", "list")
        try:
            if action == "list":
                out = {"guides": _list_guides()}
            elif action == "read":
                out = {"name": payload["name"],
                       "text": _read_guide(payload["name"])}
            else:
                return (400, "application/json",
                        json.dumps({"error": f"unknown action {action}"})
                        .encode())
        except (KeyError, FileNotFoundError) as e:
            return (404, "application/json",
                    json.dumps({"error": str(e)}).encode())
        return 200, "application/json", json.dumps(out).encode()

    api.register_route("/plugin/guides", handle)
    api.register_tool("guides.list", _list_guides)
    api.register_tool("guides.read", _read_guide)
