"""MCP server protocol tests (in-process, no stdio)."""
import json

from wan2gp_tpu.runtime.mcp_server import McpServer


def _server():
    return McpServer(init_random_weights=True, output_dir="/tmp/mcp_out")


def _call(server, method, params=None, msg_id=1):
    return server.handle({"jsonrpc": "2.0", "id": msg_id, "method": method,
                          "params": params or {}})


def test_initialize_and_tools_list():
    s = _server()
    resp = _call(s, "initialize")
    assert resp["result"]["serverInfo"]["name"] == "wan2gp_tpu"
    resp = _call(s, "tools/list")
    names = [t["name"] for t in resp["result"]["tools"]]
    assert "wangp_list_models" in names and "wangp_submit_job" in names


def test_list_and_get_model():
    s = _server()
    resp = _call(s, "tools/call", {"name": "wangp_list_models"})
    models = json.loads(resp["result"]["content"][0]["text"])
    types = [m["model_type"] for m in models]
    assert "t2v_1.3B" in types
    resp = _call(s, "tools/call", {"name": "wangp_get_model",
                                   "arguments": {"model_type": "t2v_1.3B"}})
    info = json.loads(resp["result"]["content"][0]["text"])
    assert info["definition"]["architecture"] == "t2v_1.3B"
    assert info["default_settings"]["model_type"] == "t2v_1.3B"


def test_submit_and_status():
    s = _server()
    resp = _call(s, "tools/call", {
        "name": "wangp_submit_job",
        "arguments": {"settings": {"model_type": "nonexistent_model"}}})
    job = json.loads(resp["result"]["content"][0]["text"])
    assert job["job_id"] >= 1
    # status eventually resolves to error (unknown model)
    import time
    for _ in range(100):
        resp = _call(s, "tools/call", {"name": "wangp_job_status",
                                       "arguments": {"job_id": job["job_id"]}})
        st = json.loads(resp["result"]["content"][0]["text"])
        if st["status"] in ("error", "done"):
            break
        time.sleep(0.1)
    assert st["status"] == "error"


def test_unknown_method():
    s = _server()
    resp = _call(s, "bogus/method")
    assert "error" in resp


def test_job_events_tool():
    """wangp_job_events drains the per-job event log (the reference's
    _JobStore events, shared/mcp_server.py:188)."""
    s = _server()
    resp = _call(s, "tools/call", {"name": "wangp_submit_job",
                                   "arguments": {"settings": {
                                       "model_type": "bogus_model"}}})
    job = json.loads(resp["result"]["content"][0]["text"])["job_id"]
    import time
    evs = []
    for _ in range(100):
        resp = _call(s, "tools/call", {"name": "wangp_job_events",
                                       "arguments": {"job_id": job}})
        out = json.loads(resp["result"]["content"][0]["text"])
        evs += out["events"]
        if any(e["type"] == "GenerationResult" for e in evs):
            break
        time.sleep(0.1)
    types = [e["type"] for e in evs]
    assert "GenerationResult" in types
    final = next(e for e in evs if e["type"] == "GenerationResult")
    assert final["error"]          # unknown model errors out
    # drained: a second call returns nothing new for this job
    resp = _call(s, "tools/call", {"name": "wangp_job_events",
                                   "arguments": {"job_id": job}})
    assert json.loads(resp["result"]["content"][0]["text"])["events"] == []
