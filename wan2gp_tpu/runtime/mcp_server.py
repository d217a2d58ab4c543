"""MCP server: expose model listing / job submission over the Model Context
Protocol — stdio JSON-RPC 2.0 plus the two HTTP transports.

Mirrors the reference's FastMCP tool surface (shared/mcp_server.py:219
build_server — wangp_list_models:250, wangp_get_model:262, job submit /
status / events over a _JobStore:188) and its transport menu
(shared/mcp_server.py:28-45 stdio | sse | streamable-http) without
external dependencies:

  * stdio        — newline-delimited JSON-RPC on stdin/stdout.
  * streamable-http — POST /mcp with a JSON-RPC message; the response is
    a plain `application/json` body (permitted by the 2025-03-26 spec in
    place of an SSE stream).  An `Mcp-Session-Id` header is issued on
    `initialize` and echoed by clients.
  * sse (legacy) — GET /sse opens a text/event-stream whose first event
    is `endpoint` naming `/messages?session_id=...`; the client POSTs
    JSON-RPC there (202 Accepted) and reads responses as `message`
    events on the stream.

Both HTTP transports mount onto the web UI's ThreadingHTTPServer
(runtime/webui.py `WebUI(mcp=...)`) so one port serves UI + API + MCP,
or run standalone via `--transport http`.

Run: python -m wan2gp_tpu.runtime.mcp_server [--random-weights]
         [--transport stdio|http] [--port 7870]
"""
from __future__ import annotations

import json
import queue
import sys
import threading
import uuid
from typing import Any, Dict, List, Optional

from .api import Session, GenerationResult, ProgressUpdate

PROTOCOL_VERSION = "2024-11-05"

_TOOLS = [
    {
        "name": "wangp_list_models",
        "description": "List available model types with names/descriptions.",
        "inputSchema": {"type": "object", "properties": {}},
    },
    {
        "name": "wangp_get_model",
        "description": "Get a model definition and its default settings.",
        "inputSchema": {
            "type": "object",
            "properties": {"model_type": {"type": "string"}},
            "required": ["model_type"],
        },
    },
    {
        "name": "wangp_submit_job",
        "description": "Submit a generation job (settings dict: model_type, "
                       "prompt, resolution, video_length, "
                       "num_inference_steps, seed, ...).  Returns a job id.",
        "inputSchema": {
            "type": "object",
            "properties": {"settings": {"type": "object"}},
            "required": ["settings"],
        },
    },
    {
        "name": "wangp_job_status",
        "description": "Get job status and outputs.",
        "inputSchema": {
            "type": "object",
            "properties": {"job_id": {"type": "integer"}},
            "required": ["job_id"],
        },
    },
    {
        "name": "wangp_job_events",
        "description": "Drain progress/result events recorded for a job "
                       "since the last call (reference _JobStore events).",
        "inputSchema": {
            "type": "object",
            "properties": {"job_id": {"type": "integer"}},
            "required": ["job_id"],
        },
    },
]


class McpServer:
    def __init__(self, session: Optional[Session] = None, **session_kwargs):
        self.session = session or Session(**session_kwargs)
        # per-job event log fed by a pump thread over the session's event
        # queue (the reference's _JobStore event records,
        # shared/mcp_server.py:188) — started on first events request so
        # embedders that consume session.events() themselves are unaffected
        self._job_events: Dict[int, List[Dict[str, Any]]] = {}
        self._events_lock = threading.Lock()
        self._pump_started = False

    def _ensure_event_pump(self):
        if self._pump_started:
            return
        self._pump_started = True

        def pump():
            while True:
                for ev in self.session.events(timeout=1.0):
                    rec = {"type": type(ev).__name__}
                    rec.update({k: v for k, v in vars(ev).items()
                                if isinstance(v, (str, int, float, bool,
                                                  list, type(None)))})
                    job = int(getattr(ev, "task_id", getattr(ev, "id", -1)))
                    with self._events_lock:
                        self._job_events.setdefault(job, []).append(rec)

        threading.Thread(target=pump, daemon=True).start()

    # -- tool implementations ------------------------------------------

    def list_models(self) -> List[Dict[str, Any]]:
        reg = self.session.service.registry
        return [{"model_type": mt,
                 "name": reg.get(mt).get("name", mt),
                 "description": reg.get(mt).get("description", "")}
                for mt in reg.model_types()]

    def get_model(self, model_type: str) -> Dict[str, Any]:
        reg = self.session.service.registry
        model_def = {k: v for k, v in reg.get(model_type).items()
                     if isinstance(v, (str, int, float, bool, list, dict,
                                       type(None)))}
        return {"model_type": model_type, "definition": model_def,
                "default_settings": reg.default_settings(model_type)}

    def submit_job(self, settings: Dict[str, Any]) -> Dict[str, Any]:
        job_id = self.session.submit_task(settings)
        return {"job_id": job_id, "status": "queued"}

    def job_status(self, job_id: int) -> Dict[str, Any]:
        task = self.session.queue.get(job_id)
        if task is None:
            return {"job_id": job_id, "status": "unknown"}
        return {"job_id": job_id, "status": task.status,
                "outputs": task.outputs, "error": task.error}

    def job_events(self, job_id: int) -> Dict[str, Any]:
        self._ensure_event_pump()
        with self._events_lock:
            evs = self._job_events.pop(job_id, [])
        return {"job_id": job_id, "events": evs}

    def call_tool(self, name: str, args: Dict[str, Any]):
        if name == "wangp_list_models":
            return self.list_models()
        if name == "wangp_get_model":
            return self.get_model(args["model_type"])
        if name == "wangp_submit_job":
            self._ensure_event_pump()
            return self.submit_job(args["settings"])
        if name == "wangp_job_status":
            return self.job_status(int(args["job_id"]))
        if name == "wangp_job_events":
            return self.job_events(int(args["job_id"]))
        raise ValueError(f"unknown tool {name!r}")

    # -- JSON-RPC plumbing ------------------------------------------------

    def handle(self, msg: Dict[str, Any]) -> Optional[Dict[str, Any]]:
        method = msg.get("method")
        msg_id = msg.get("id")
        if method == "initialize":
            result = {
                "protocolVersion": PROTOCOL_VERSION,
                "capabilities": {"tools": {}},
                "serverInfo": {"name": "wan2gp_tpu", "version": "0.1.0"},
            }
        elif method == "notifications/initialized":
            return None
        elif method == "tools/list":
            result = {"tools": _TOOLS}
        elif method == "tools/call":
            try:
                out = self.call_tool(msg["params"]["name"],
                                     msg["params"].get("arguments", {}))
                result = {"content": [{"type": "text",
                                       "text": json.dumps(out)}]}
            except Exception as e:  # noqa: BLE001 — tool errors go to client
                result = {"content": [{"type": "text", "text": str(e)}],
                          "isError": True}
        elif method == "ping":
            result = {}
        else:
            if msg_id is None:
                return None
            return {"jsonrpc": "2.0", "id": msg_id,
                    "error": {"code": -32601,
                              "message": f"method not found: {method}"}}
        if msg_id is None:
            return None
        return {"jsonrpc": "2.0", "id": msg_id, "result": result}

    def serve_stdio(self, stdin=None, stdout=None):
        stdin = stdin or sys.stdin
        stdout = stdout or sys.stdout
        for line in stdin:
            line = line.strip()
            if not line:
                continue
            try:
                msg = json.loads(line)
            except json.JSONDecodeError:
                continue
            resp = self.handle(msg)
            if resp is not None:
                stdout.write(json.dumps(resp) + "\n")
                stdout.flush()


class McpHttp:
    """HTTP transports for an McpServer: streamable-http + legacy SSE.

    Stateless w.r.t. the tool layer; sessions only carry transport state
    (the SSE event queue, the streamable-http session id).  Designed to
    be mounted on any (method, path, headers, body) -> response router —
    the web UI's handler calls `route()` first (webui.py) and a
    standalone server is available via `serve()`.
    """

    ROUTES = ("/mcp", "/sse", "/messages")

    def __init__(self, server: McpServer):
        self.server = server
        self._sse_sessions: Dict[str, "queue.Queue[Optional[dict]]"] = {}
        self._http_sessions: set = set()
        self._lock = threading.Lock()

    # -- streamable-http ---------------------------------------------------

    def post_mcp(self, body: bytes, session_id: Optional[str]):
        """POST /mcp: one JSON-RPC message (or a batch) per request."""
        try:
            msg = json.loads(body.decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            return (400, {"Content-Type": "application/json"},
                    json.dumps({"jsonrpc": "2.0", "id": None,
                                "error": {"code": -32700,
                                          "message": "parse error"}})
                    .encode())
        headers = {"Content-Type": "application/json"}
        if isinstance(msg, dict) and msg.get("method") == "initialize":
            session_id = uuid.uuid4().hex
            with self._lock:
                self._http_sessions.add(session_id)
        if session_id:
            headers["Mcp-Session-Id"] = session_id
        msgs = msg if isinstance(msg, list) else [msg]
        resps = [r for r in (self.server.handle(m) for m in msgs
                             if isinstance(m, dict)) if r is not None]
        if not resps:          # notification(s) only
            return 202, headers, b""
        out = resps[0] if not isinstance(msg, list) else resps
        return 200, headers, json.dumps(out).encode()

    def delete_mcp(self, session_id: Optional[str]):
        with self._lock:
            self._http_sessions.discard(session_id)
        return 200, {"Content-Type": "application/json"}, b"{}"

    # -- legacy SSE ----------------------------------------------------------

    def open_sse(self):
        """Register an SSE session; returns (session_id, event_queue).

        The caller streams: first an `endpoint` event pointing at
        /messages?session_id=..., then `message` events as they arrive
        on the queue (None terminates the stream)."""
        sid = uuid.uuid4().hex
        q: "queue.Queue[Optional[dict]]" = queue.Queue()
        with self._lock:
            self._sse_sessions[sid] = q
        return sid, q

    def close_sse(self, session_id: str):
        with self._lock:
            q = self._sse_sessions.pop(session_id, None)
        if q is not None:
            q.put(None)

    def post_message(self, session_id: str, body: bytes):
        """POST /messages?session_id=...: enqueue the response onto the
        session's SSE stream and acknowledge with 202."""
        with self._lock:
            q = self._sse_sessions.get(session_id)
        if q is None:
            return (404, {"Content-Type": "application/json"},
                    b'{"error": "unknown session"}')
        try:
            msg = json.loads(body.decode("utf-8"))
        except (json.JSONDecodeError, UnicodeDecodeError):
            return (400, {"Content-Type": "application/json"},
                    b'{"error": "parse error"}')
        resp = self.server.handle(msg)
        if resp is not None:
            q.put(resp)
        return 202, {"Content-Type": "application/json"}, b"{}"

    # -- generic router (non-streaming part) ---------------------------------

    def route(self, method: str, route: str, headers, body: bytes):
        """Handle /mcp and /messages (plain request/response).  Returns
        (status, headers_dict, bytes) or None if not an MCP route.
        GET /sse must be handled by the HTTP layer itself (it streams) —
        see `write_sse_stream`."""
        if route == "/mcp":
            sid = headers.get("Mcp-Session-Id") if headers else None
            if method == "POST":
                return self.post_mcp(body, sid)
            if method == "DELETE":
                return self.delete_mcp(sid)
            if method == "GET":
                # no server-initiated messages: 405 per spec
                return (405, {"Content-Type": "application/json"},
                        b'{"error": "SSE GET stream not offered"}')
        if route == "/messages" and method == "POST":
            import urllib.parse
            # session id arrives in the query string
            qs = urllib.parse.parse_qs(headers.get("_query", "")
                                       if headers else "")
            sid = (qs.get("session_id") or [""])[0]
            return self.post_message(sid, body)
        return None

    def write_sse_stream(self, wfile, host_prefix: str = ""):
        """Drive a legacy-SSE connection over an open socket file.

        Blocks until the session is closed (client disconnect surfaces
        as a write error and tears the session down)."""
        sid, q = self.open_sse()
        try:
            endpoint = f"{host_prefix}/messages?session_id={sid}"
            wfile.write(f"event: endpoint\ndata: {endpoint}\n\n"
                        .encode())
            wfile.flush()
            while True:
                try:
                    item = q.get(timeout=15.0)
                except queue.Empty:
                    wfile.write(b": keepalive\n\n")
                    wfile.flush()
                    continue
                if item is None:
                    break
                wfile.write(b"event: message\ndata: "
                            + json.dumps(item).encode() + b"\n\n")
                wfile.flush()
        except (BrokenPipeError, ConnectionResetError, OSError):
            pass
        finally:
            self.close_sse(sid)

    # -- standalone server -----------------------------------------------

    def serve(self, host: str = "127.0.0.1", port: int = 7870,
              background: bool = False):
        from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
        import urllib.parse
        mcp = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):
                pass

            def _dispatch(self, method):
                url = urllib.parse.urlparse(self.path)
                route = url.path.rstrip("/") or "/"
                if route == "/sse" and method == "GET":
                    self.send_response(200)
                    self.send_header("Content-Type", "text/event-stream")
                    self.send_header("Cache-Control", "no-cache")
                    self.end_headers()
                    mcp.write_sse_stream(self.wfile)
                    return
                n = int(self.headers.get("Content-Length") or 0)
                body = self.rfile.read(n) if n else b""
                hdrs = dict(self.headers)
                hdrs["_query"] = url.query
                resp = mcp.route(method, route, hdrs, body)
                if resp is None:
                    resp = (404, {"Content-Type": "text/plain"},
                            b"not found")
                status, rhdrs, data = resp
                self.send_response(status)
                for k, v in rhdrs.items():
                    self.send_header(k, v)
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                self._dispatch("GET")

            def do_POST(self):
                self._dispatch("POST")

            def do_DELETE(self):
                self._dispatch("DELETE")

        srv = ThreadingHTTPServer((host, port), Handler)
        self._server = srv
        if background:
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            return srv.server_address
        print(f"wan2gp-tpu MCP (streamable-http /mcp, sse /sse) on "
              f"http://{host}:{port}")
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            pass

    def shutdown(self):
        srv = getattr(self, "_server", None)
        if srv is not None:
            srv.shutdown()
            srv.server_close()
            self._server = None


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("wan2gp_tpu-mcp")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--transport", choices=["stdio", "http"],
                   default="stdio")
    p.add_argument("--listen", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7870)
    args = p.parse_args(argv)
    server = McpServer(init_random_weights=args.random_weights,
                       output_dir=args.output_dir)
    if args.transport == "http":
        McpHttp(server).serve(args.listen, args.port)
    else:
        server.serve_stdio()


if __name__ == "__main__":
    main()
