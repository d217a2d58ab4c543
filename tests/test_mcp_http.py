"""MCP HTTP transports: streamable-http (/mcp) and legacy SSE
(/sse + /messages), standalone and mounted on the web UI server.

Reference: shared/mcp_server.py:28-45 (FastMCP transport selection
stdio | sse | streamable-http).  These tests act as a real network
client (http.client over a loopback socket).
"""
import http.client
import json
import threading

import pytest

from wan2gp_tpu.runtime.mcp_server import McpServer, McpHttp


@pytest.fixture(scope="module")
def http_server():
    srv = McpHttp(McpServer(init_random_weights=True,
                            output_dir="/tmp/mcp_http_out"))
    host, port = srv.serve(port=0, background=True)
    yield host, port
    srv.shutdown()


def _rpc(method, params=None, msg_id=1):
    return json.dumps({"jsonrpc": "2.0", "id": msg_id, "method": method,
                       "params": params or {}})


def test_streamable_http_initialize_and_call(http_server):
    host, port = http_server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", "/mcp", _rpc("initialize"),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 200
    sid = r.getheader("Mcp-Session-Id")
    assert sid
    body = json.loads(r.read())
    assert body["result"]["serverInfo"]["name"] == "wan2gp_tpu"

    conn.request("POST", "/mcp",
                 _rpc("tools/call", {"name": "wangp_list_models"}, 2),
                 {"Content-Type": "application/json",
                  "Mcp-Session-Id": sid})
    r = conn.getresponse()
    assert r.status == 200
    models = json.loads(json.loads(r.read())["result"]["content"][0]["text"])
    assert any(m["model_type"] == "t2v_1.3B" for m in models)

    # notifications get 202 with no body
    conn.request("POST", "/mcp",
                 json.dumps({"jsonrpc": "2.0",
                             "method": "notifications/initialized"}),
                 {"Content-Type": "application/json",
                  "Mcp-Session-Id": sid})
    r = conn.getresponse()
    assert r.status == 202
    r.read()

    # session teardown
    conn.request("DELETE", "/mcp", headers={"Mcp-Session-Id": sid})
    assert conn.getresponse().status == 200
    conn.close()


def test_streamable_http_parse_error(http_server):
    host, port = http_server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", "/mcp", b"{not json",
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 400
    assert json.loads(r.read())["error"]["code"] == -32700
    conn.close()


def test_streamable_http_get_is_405(http_server):
    host, port = http_server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("GET", "/mcp")
    assert conn.getresponse().status == 405
    conn.close()


def _sse_handshake(host, port, results):
    """Open /sse, record the endpoint, then collect message events."""
    conn = http.client.HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/sse")
    r = conn.getresponse()
    results["status"] = r.status
    buf = b""
    while True:
        chunk = r.read1(4096)
        if not chunk:
            break
        buf += chunk
        while b"\n\n" in buf:
            event, buf = buf.split(b"\n\n", 1)
            lines = event.decode().splitlines()
            etype = next((ln[7:] for ln in lines
                          if ln.startswith("event: ")), "")
            data = next((ln[6:] for ln in lines
                         if ln.startswith("data: ")), "")
            if etype == "endpoint":
                results["endpoint"] = data
                results["got_endpoint"].set()
            elif etype == "message":
                results["messages"].append(json.loads(data))
                results["got_message"].set()
                conn.close()
                return


def test_sse_transport_round_trip(http_server):
    host, port = http_server
    results = {"messages": [], "got_endpoint": threading.Event(),
               "got_message": threading.Event()}
    t = threading.Thread(target=_sse_handshake, args=(host, port, results),
                         daemon=True)
    t.start()
    assert results["got_endpoint"].wait(10), "no endpoint event"
    assert results["status"] == 200
    endpoint = results["endpoint"]
    assert endpoint.startswith("/messages?session_id=")

    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", endpoint, _rpc("tools/list", msg_id=7),
                 {"Content-Type": "application/json"})
    r = conn.getresponse()
    assert r.status == 202
    r.read()
    conn.close()

    assert results["got_message"].wait(10), "no message event on stream"
    msg = results["messages"][0]
    assert msg["id"] == 7
    names = [tl["name"] for tl in msg["result"]["tools"]]
    assert "wangp_submit_job" in names


def test_sse_unknown_session_404(http_server):
    host, port = http_server
    conn = http.client.HTTPConnection(host, port, timeout=10)
    conn.request("POST", "/messages?session_id=deadbeef", _rpc("ping"),
                 {"Content-Type": "application/json"})
    assert conn.getresponse().status == 404
    conn.close()


def test_mcp_mounted_on_webui():
    """One port serves the UI, the JSON API, and MCP."""
    from wan2gp_tpu.runtime.webui import WebUI
    ui = WebUI(init_random_weights=True, save_path="/tmp/mcp_webui_out",
               mcp=True)
    host, port = ui.serve(port=0, background=True)
    try:
        conn = http.client.HTTPConnection(host, port, timeout=10)
        conn.request("POST", "/mcp", _rpc("initialize"),
                     {"Content-Type": "application/json"})
        r = conn.getresponse()
        assert r.status == 200
        assert json.loads(r.read())["result"]["protocolVersion"]
        # the plain API still works on the same server
        conn.request("GET", "/api/models")
        r = conn.getresponse()
        assert r.status == 200
        assert "t2v_1.3B" in json.loads(r.read())
        conn.close()
    finally:
        ui.shutdown()
