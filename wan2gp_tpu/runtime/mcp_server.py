"""MCP server: expose model listing / job submission over the Model Context
Protocol (stdio JSON-RPC 2.0).

Mirrors the reference's FastMCP tool surface (shared/mcp_server.py:219
build_server — wangp_list_models:250, wangp_get_model:262, job submit /
status / events over a _JobStore:188) without external dependencies: a
minimal MCP implementation good for `initialize`, `tools/list`,
`tools/call`.

Run: python -m wan2gp_tpu.runtime.mcp_server [--random-weights]
"""
from __future__ import annotations

import json
import sys
import threading
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
]


class McpServer:
    def __init__(self, session: Optional[Session] = None, **session_kwargs):
        self.session = session or Session(**session_kwargs)

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

    def call_tool(self, name: str, args: Dict[str, Any]):
        if name == "wangp_list_models":
            return self.list_models()
        if name == "wangp_get_model":
            return self.get_model(args["model_type"])
        if name == "wangp_submit_job":
            return self.submit_job(args["settings"])
        if name == "wangp_job_status":
            return self.job_status(int(args["job_id"]))
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


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("wan2gp_tpu-mcp")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--output-dir", default="outputs")
    args = p.parse_args(argv)
    McpServer(init_random_weights=args.random_weights,
              output_dir=args.output_dir).serve_stdio()


if __name__ == "__main__":
    main()
