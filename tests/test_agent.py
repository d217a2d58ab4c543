"""Deepy agent: tool-call parsing, execution loop, service tools."""
import json

from wan2gp_tpu.agent import (DeepyAgent, Tool, build_service_tools,
                              extract_tool_calls, strip_tool_calls)


def test_extract_tool_calls():
    txt = ('Let me check. <tool_call>{"name": "list_models", '
           '"arguments": {}}</tool_call> and also '
           '<tool_call>{"name": "gen_image", "arguments": '
           '{"prompt": "a cat"}}</tool_call>')
    calls = extract_tool_calls(txt)
    assert [c["name"] for c in calls] == ["list_models", "gen_image"]
    assert calls[1]["arguments"]["prompt"] == "a cat"
    assert "tool_call" not in strip_tool_calls(txt)
    # malformed JSON ignored
    assert extract_tool_calls("<tool_call>{oops}</tool_call>") == []


def test_tool_schema_from_signature():
    def f(prompt: str, width: int = 512) -> dict:
        return {}
    t = Tool("f", "test tool", f)
    s = t.schema["function"]
    assert s["parameters"]["properties"]["width"]["type"] == "integer"
    assert s["parameters"]["required"] == ["prompt"]


def test_agent_tool_loop():
    log = []

    def add(a: int, b: int) -> dict:
        log.append((a, b))
        return {"sum": a + b}

    script = iter([
        '<tool_call>{"name": "add", "arguments": {"a": 2, "b": 3}}'
        '</tool_call>',
        'The sum is 5.',
    ])
    seen_prompts = []

    def fake_llm(prompt):
        seen_prompts.append(prompt)
        return next(script)

    agent = DeepyAgent(fake_llm, tools=[Tool("add", "adds", add)])
    answer = agent.chat("what is 2+3?")
    assert answer == "The sum is 5."
    assert log == [(2, 3)]
    # the tool response was fed back into the second prompt
    assert '<tool_response>' in seen_prompts[1]
    assert '"sum": 5' in seen_prompts[1]
    # tools are advertised in the system turn
    assert '"name": "add"' in seen_prompts[0]


def test_agent_unknown_tool_and_error():
    def boom() -> dict:
        raise RuntimeError("nope")

    script = iter([
        '<tool_call>{"name": "missing", "arguments": {}}</tool_call>',
        '<tool_call>{"name": "boom", "arguments": {}}</tool_call>',
        'done',
    ])
    agent = DeepyAgent(lambda p: next(script),
                       tools=[Tool("boom", "fails", boom)])
    assert agent.chat("go") == "done"
    responses = [m["content"] for m in agent.messages
                 if "tool_response" in m["content"]]
    assert "unknown tool" in responses[0]
    assert "RuntimeError" in responses[1]


def test_agent_max_turns():
    agent = DeepyAgent(
        lambda p: '<tool_call>{"name": "x", "arguments": {}}</tool_call>',
        tools=[Tool("x", "loops", lambda: {"ok": 1})], max_turns=3)
    out = agent.chat("loop forever")
    assert out == "(max tool turns reached)"


def test_service_tools():
    class FakeSession:
        def __init__(self):
            self.tasks = []

        def submit(self, task):
            self.tasks.append(task)
            return f"t{len(self.tasks)}"

        def manifest(self):
            return {"t2v": {"num_inference_steps": 30}}

    sess = FakeSession()
    tools = {t.name: t for t in build_service_tools(sess)}
    out = tools["gen_video"].fn(prompt="a dog", num_frames=49)
    assert out["task_id"] == "t1"
    assert sess.tasks[0]["video_length"] == 49
    assert tools["list_models"].fn() == {"models": ["t2v"]}
    assert tools["get_default_settings"].fn("t2v")[
        "num_inference_steps"] == 30
