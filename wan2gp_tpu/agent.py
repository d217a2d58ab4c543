"""Deepy-equivalent assistant agent: tool-calling loop on the local LLM.

Compact TPU-native counterpart of the reference Deepy agent
(/root/reference/shared/deepy/{controller.py,engine.py,
default_system_prompt.txt}): an LLM session that plans with tools in the
Qwen tool-calling format (``<tool_call>{"name": ..., "arguments": ...}
</tool_call>``), executes them against the framework's generation
service, and feeds ``<tool_response>`` blocks back until it produces a
plain answer.

The LLM backend is any ``generate_fn(prompt_text) -> str`` — the handler
wires qwen_lm_generate (models/qwen/text_encoder.py) over the shared
Qwen checkpoint, and tests inject scripted fakes.  Tool schemas are
derived from Python signatures like engine.py:111-130.
"""
from __future__ import annotations

import dataclasses
import inspect
import json
import os
import re
from typing import Any, Callable, Dict, List, Optional

_TOOL_CALL_RE = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>",
                           re.DOTALL)

_TYPE_MAP = {int: "integer", float: "number", bool: "boolean",
             str: "string", list: "array", dict: "object"}

SYSTEM_PROMPT = (
    "You are Deepy, the assistant of a TPU video/image generation "
    "framework. Help the user create images, videos and audio. Use tools "
    "when they are the best next action; emit tool calls in the format "
    '<tool_call>{"name": "...", "arguments": {...}}</tool_call>. '
    "Only pass settings the user explicitly asked for. After a tool "
    "responds, either call another tool or answer in plain text.")


@dataclasses.dataclass
class Tool:
    name: str
    description: str
    fn: Callable[..., Any]

    @property
    def schema(self) -> Dict[str, Any]:
        sig = inspect.signature(self.fn)
        props, required = {}, []
        for pname, p in sig.parameters.items():
            ann = p.annotation if p.annotation is not inspect.Parameter.empty \
                else str
            props[pname] = {"type": _TYPE_MAP.get(ann, "string")}
            if p.default is inspect.Parameter.empty:
                required.append(pname)
        return {"type": "function",
                "function": {"name": self.name,
                             "description": self.description,
                             "parameters": {"type": "object",
                                            "properties": props,
                                            "required": required}}}


def extract_tool_calls(text: str) -> List[Dict[str, Any]]:
    """Parse every well-formed <tool_call> JSON block (engine.py
    extract_tool_calls)."""
    calls = []
    for m in _TOOL_CALL_RE.finditer(text):
        try:
            payload = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        if isinstance(payload, dict) and "name" in payload:
            calls.append({"name": str(payload["name"]),
                          "arguments": payload.get("arguments", {}) or {}})
    return calls


def strip_tool_calls(text: str) -> str:
    return _TOOL_CALL_RE.sub("", text).strip()


class DeepyAgent:
    """generate_fn(prompt_text) -> completion string."""

    def __init__(self, generate_fn, tools: Optional[List[Tool]] = None,
                 system_prompt: str = SYSTEM_PROMPT, max_turns: int = 6):
        self.generate_fn = generate_fn
        self.tools = {t.name: t for t in (tools or [])}
        self.system_prompt = system_prompt
        self.max_turns = max_turns
        self.messages: List[Dict[str, str]] = []

    def register(self, tool: Tool):
        self.tools[tool.name] = tool

    def _render_prompt(self) -> str:
        """Qwen chat-ML rendering with the tools block in the system turn."""
        tool_specs = "\n".join(json.dumps(t.schema)
                               for t in self.tools.values())
        sys_txt = self.system_prompt
        if tool_specs:
            sys_txt += ("\n\n# Tools\n<tools>\n" + tool_specs + "\n</tools>")
        parts = [f"<|im_start|>system\n{sys_txt}<|im_end|>"]
        for m in self.messages:
            parts.append(f"<|im_start|>{m['role']}\n{m['content']}"
                         f"<|im_end|>")
        parts.append("<|im_start|>assistant\n")
        return "\n".join(parts)

    def _execute(self, call: Dict[str, Any]) -> str:
        tool = self.tools.get(call["name"])
        if tool is None:
            return json.dumps({"error": f"unknown tool {call['name']}"})
        try:
            result = tool.fn(**call["arguments"])
        except Exception as exc:           # tool errors flow back as text
            return json.dumps({"error": f"{type(exc).__name__}: {exc}"})
        try:
            return json.dumps(result)
        except TypeError:
            return json.dumps({"result": str(result)})

    def chat(self, user_message: str) -> str:
        """One user turn: run the tool loop until a plain answer."""
        self.messages.append({"role": "user", "content": user_message})
        for _ in range(self.max_turns):
            completion = self.generate_fn(self._render_prompt())
            self.messages.append({"role": "assistant",
                                  "content": completion})
            calls = extract_tool_calls(completion)
            if not calls:
                return strip_tool_calls(completion)
            for call in calls:
                response = self._execute(call)
                self.messages.append({
                    "role": "user",
                    "content": f"<tool_response>\n{response}\n"
                               f"</tool_response>"})
        return "(max tool turns reached)"


def build_media_tools(registry=None,
                      transcribe_fn: Optional[Callable[[str], str]] = None
                      ) -> List[Tool]:
    """Media registry + video chore tools (reference shared/deepy/
    media_registry.py, video_tools.py, transcription.py).

    ``transcribe_fn(audio_path) -> text`` is a pluggable hook — the
    reference loads whisper-medium (transcription.py:40); here any
    speech-to-text callable can be injected, and the tool reports
    unavailability otherwise."""
    from .media_registry import MediaRegistry
    from .utils import video_tools as vt
    registry = registry if registry is not None else MediaRegistry()

    def list_media(media_type: str = "any", limit: int = 20) -> dict:
        return {"media": registry.list(media_type, limit)}

    def find_media(reference: str, media_type: str = "any") -> dict:
        return registry.resolve(reference, media_type)

    def get_video_info(path: str) -> dict:
        return vt.video_info(_resolve_path(path))

    def merge_videos(first: str, second: str, output_path: str) -> dict:
        out = vt.merge_videos(_resolve_path(first), _resolve_path(second),
                              output_path)
        return registry.register(out, "video",
                                 label=os.path.basename(out))

    def trim_video(source: str, output_path: str,
                   start_time: float = 0.0,
                   end_time: float = -1.0) -> dict:
        out = vt.extract_video(
            _resolve_path(source), output_path, start_time,
            None if end_time < 0 else end_time)
        return registry.register(out, "video")

    def extract_frame(source: str, output_path: str,
                      time_seconds: float = 0.0) -> dict:
        out = vt.extract_video_frame(_resolve_path(source), output_path,
                                     time_seconds=time_seconds)
        return registry.register(out, "image")

    def extract_audio(source: str, output_path: str) -> dict:
        out = vt.extract_audio(_resolve_path(source), output_path)
        return registry.register(out, "audio")

    def resize_video(source: str, output_path: str, width: int,
                     height: int) -> dict:
        out = vt.resize_video(_resolve_path(source), output_path,
                              height, width)
        return registry.register(out, "video")

    def transcribe(source: str) -> dict:
        nonlocal transcribe_fn
        if transcribe_fn is None:
            # built-in whisper decoder (utils/transcription.py); a
            # custom hook (e.g. checkpoint-backed) still overrides
            from .utils.transcription import make_transcribe_fn
            transcribe_fn = make_transcribe_fn()
        path = _resolve_path(source)
        if path.lower().endswith((".avi", ".mp4")):
            import tempfile
            tmp = tempfile.mktemp(suffix=".wav")
            path = vt.extract_audio(path, tmp)
        return {"text": transcribe_fn(path)}

    def _resolve_path(ref: str) -> str:
        if os.path.exists(ref):
            return ref
        hit = registry.resolve(ref)
        if hit.get("status") == "resolved":
            return hit["path"]
        return ref

    tools = [
        Tool("list_media", "List recently generated media items.",
             list_media),
        Tool("find_media",
             "Resolve a reference like 'the last video' or a media id "
             "to a concrete file.", find_media),
        Tool("get_video_info",
             "Frame count, fps, resolution and audio presence of a "
             "video.", get_video_info),
        Tool("merge_videos", "Concatenate two videos into one file.",
             merge_videos),
        Tool("trim_video",
             "Cut a video between start_time and end_time seconds "
             "(end_time -1 = to the end).", trim_video),
        Tool("extract_frame",
             "Save a single frame of a video as an image.",
             extract_frame),
        Tool("extract_audio", "Extract a video's audio track as WAV.",
             extract_audio),
        Tool("resize_video", "Resize a video to a new resolution.",
             resize_video),
        Tool("transcribe",
             "Transcribe speech from an audio or video file.",
             transcribe),
    ]
    return tools


def build_service_tools(session, registry=None) -> List[Tool]:
    """Default tool set over a runtime.api Session (submit/manifest)."""

    def _register_outputs(outputs, prompt, settings):
        if registry is None:
            return
        for p in outputs:
            try:
                registry.register(p, prompt=prompt, settings=settings)
            except Exception:
                pass

    def list_models() -> dict:
        if hasattr(session, "list_models"):
            return {"models": sorted(session.list_models())}
        return {"models": sorted(session.manifest().keys())
                if hasattr(session, "manifest") else []}

    def _submit(task):
        if hasattr(session, "submit_task"):
            return session.submit_task(task)
        return session.submit(task)

    def _maybe_wait(task):
        """If the session can block for results, do so and register the
        outputs in the media registry."""
        tid = _submit(task)
        if hasattr(session, "wait"):
            results = session.wait()
            outs = [p for r in results for p in getattr(r, "outputs", [])]
            _register_outputs(outs, task.get("prompt", ""), task)
            return {"task_id": tid, "status": "done", "outputs": outs}
        return {"task_id": tid, "status": "queued"}

    def gen_image(prompt: str, model: str = "", width: int = 1024,
                  height: int = 1024, seed: int = -1) -> dict:
        task = {"prompt": prompt, "resolution": f"{width}x{height}",
                "seed": seed}
        if model:
            task["model"] = model
        return _maybe_wait(task)

    def gen_video(prompt: str, model: str = "", width: int = 832,
                  height: int = 480, num_frames: int = 81,
                  seed: int = -1) -> dict:
        task = {"prompt": prompt, "resolution": f"{width}x{height}",
                "video_length": num_frames, "seed": seed}
        if model:
            task["model"] = model
        return _maybe_wait(task)

    def get_default_settings(model: str) -> dict:
        if hasattr(session, "default_settings"):
            return dict(session.default_settings(model) or {})
        man = session.manifest() if hasattr(session, "manifest") else {}
        return dict(man.get(model, {}))

    return [
        Tool("list_models", "List available generation models.",
             list_models),
        Tool("gen_image", "Generate an image from a text prompt.",
             gen_image),
        Tool("gen_video", "Generate a video from a text prompt.",
             gen_video),
        Tool("get_default_settings",
             "Inspect a model's default generation settings.",
             get_default_settings),
    ]


def build_framework_tools(session) -> List[Tool]:
    """Framework-control tools (the reference Deepy's wider registry,
    engine.py @assistant_tool set: queue control, settings forms,
    gallery search, plugin tools, postprocessing chores)."""
    svc = getattr(session, "service", None)

    def queue_status() -> dict:
        q = getattr(session, "queue", None)
        if q is None:
            return {"tasks": []}
        return {"tasks": [{"id": t.id, "status": t.status,
                           "prompt": str(t.settings.get("prompt", ""))[:80],
                           "outputs": t.outputs}
                          for t in q.tasks()]}

    def remove_task(task_id: int) -> dict:
        q = getattr(session, "queue", None)
        return {"removed": bool(q and q.remove(int(task_id)))}

    def get_model_form(model: str) -> dict:
        """Field schema of a model (what inputs it accepts)."""
        from .runtime.forms import form_schema
        s = form_schema(svc.registry, model)
        return {"fields": [{k: f.get(k) for k in
                            ("key", "type", "default", "group")}
                           for f in s["fields"]],
                "image_outputs": s["image_outputs"]}

    def search_gallery(query: str = "", media_type: str = "any",
                       limit: int = 10) -> dict:
        """Search generated outputs by prompt substring."""
        from .media_registry import detect_media_type
        from .utils import media as m
        out_dir = getattr(svc, "output_dir", "outputs")
        recs = []
        if os.path.isdir(out_dir):
            for name in sorted(os.listdir(out_dir)):
                path = os.path.join(out_dir, name)
                if not os.path.isfile(path) or name.endswith(".json"):
                    continue
                mt = detect_media_type(path)
                if media_type not in ("any", "") and mt != media_type:
                    continue
                try:
                    meta = (m.read_video_metadata(path)
                            if name.endswith(".avi")
                            else m.read_image_metadata(path)) or {}
                except Exception:
                    meta = {}
                prompt = str(meta.get("prompt", ""))
                if query and query.lower() not in prompt.lower():
                    continue
                recs.append({"file": name, "type": mt, "prompt": prompt})
        return {"results": recs[:limit]}

    def plugin_tool(name: str, arguments: dict = None) -> dict:
        """Call a plugin-registered tool (e.g.
        mask_creator.keyword_mask, guides.read,
        models_manager.inventory)."""
        tools = getattr(svc, "plugins", None)
        if tools is None or name not in tools.tools:
            avail = sorted(tools.tools) if tools else []
            return {"error": f"unknown plugin tool {name}",
                    "available": avail}
        out = tools.tools[name](**(arguments or {}))
        return out if isinstance(out, dict) else {"result": out}

    def list_plugin_tools() -> dict:
        tools = getattr(svc, "plugins", None)
        return {"tools": sorted(tools.tools) if tools else []}

    def interpolate_video(source: str, factor: int = 2) -> dict:
        """Temporal upsampling x2/x4 of an outputs video (the service's
        rife2/rife4 post path; linear-blend fallback without a RIFE
        checkpoint)."""
        import numpy as np
        from .runtime.service import _apply_temporal_upsampling
        from .utils.media import read_mjpeg_avi, save_video
        out_dir = getattr(svc, "output_dir", "outputs")
        path = os.path.join(out_dir, os.path.basename(source))
        frames = read_mjpeg_avi(path)
        mode = "rife4" if int(factor) >= 4 else "rife2"
        up, _fps = _apply_temporal_upsampling(
            frames, {"temporal_upsampling": mode}, 16)
        out = os.path.join(out_dir, "rife_" + os.path.basename(source))
        save_video(np.asarray(up), out)
        return {"file": os.path.basename(out), "frames": int(len(up))}

    def upscale_video(source: str, scale: float = 2.0) -> dict:
        """Lanczos spatial upscaling of an outputs video."""
        import numpy as np
        from .postprocessing.basic import lanczos_upscale
        from .utils.media import read_mjpeg_avi, save_video
        out_dir = getattr(svc, "output_dir", "outputs")
        path = os.path.join(out_dir, os.path.basename(source))
        frames = read_mjpeg_avi(path)
        up = lanczos_upscale(frames, float(scale))
        out = os.path.join(out_dir, "up_" + os.path.basename(source))
        save_video(np.asarray(up), out)
        return {"file": os.path.basename(out),
                "size": [int(up.shape[2]), int(up.shape[1])]}

    def enhance_prompt(prompt: str, model: str = "") -> dict:
        """Rewrite a prompt with the model-aware prompt enhancer (needs
        the service's enhancer LLM to be loaded)."""
        enh = getattr(svc, "prompt_enhancer", None)
        if enh is None:
            return {"error": "prompt enhancer model is not loaded",
                    "prompt": prompt}
        is_image = bool(model and svc.registry.get(model)
                        .get("image_outputs"))
        return {"prompt": enh.enhance([prompt], is_image=is_image)[0]}

    tools = [
        Tool("queue_status", "List generation queue tasks and statuses.",
             queue_status),
        Tool("remove_task", "Remove a queued task by id.", remove_task),
        Tool("search_gallery",
             "Search generated outputs by prompt text.", search_gallery),
        Tool("interpolate_video",
             "RIFE frame interpolation (x2/x4) of an outputs video.",
             interpolate_video),
        Tool("upscale_video",
             "Lanczos spatial upscaling of an outputs video.",
             upscale_video),
    ]
    if svc is not None:
        tools += [
            Tool("get_model_form",
                 "Inspect which inputs/settings a model accepts.",
                 get_model_form),
            Tool("list_plugin_tools",
                 "List tools provided by installed plugins.",
                 list_plugin_tools),
            Tool("plugin_tool",
                 "Call a plugin tool by name with a JSON arguments "
                 "object (masks, guides, model management).",
                 plugin_tool),
            Tool("enhance_prompt",
                 "Rewrite/expand a prompt with the prompt enhancer.",
                 enhance_prompt),
        ]
    return tools


def build_agent(session, generate_fn,
                transcribe_fn: Optional[Callable[[str], str]] = None,
                max_turns: int = 6) -> DeepyAgent:
    """Full-toolset agent over a Session: generation + media registry +
    video chores + framework control (the reference Deepy controller's
    default tool wiring, shared/deepy/engine.py:111-130)."""
    from .media_registry import MediaRegistry
    registry = MediaRegistry()
    tools = build_service_tools(session, registry=registry)
    tools += build_media_tools(registry, transcribe_fn=transcribe_fn)
    tools += build_framework_tools(session)
    agent = DeepyAgent(generate_fn, tools=tools, max_turns=max_turns)
    agent.media_registry = registry
    return agent


def run_console(agent: DeepyAgent, input_fn=input, print_fn=print):
    """Interactive REPL (reference deepy chat panel equivalent for a
    terminal).  'exit'/'quit'/EOF ends the session."""
    print_fn("Deepy agent console — type a request, 'exit' to quit.")
    while True:
        try:
            line = input_fn("you> ")
        except (EOFError, KeyboardInterrupt):
            break
        line = (line or "").strip()
        if line.lower() in ("exit", "quit", ""):
            if line.lower() in ("exit", "quit"):
                break
            continue
        print_fn("deepy> " + agent.chat(line))


def make_llm_generate_fn(params, cfg, tokenizer, max_new_tokens: int = 512,
                         eos_token_id: int = 151645,
                         temperature: float = 0.0, top_p: float = 1.0,
                         seed: int = 0):
    """Bind qwen_lm_generate as the agent backend.

    temperature/top_p: sampler options (greedy when temperature<=0) —
    the reference Deepy engine's sampling knobs
    (shared/llm_engines nanovllm sampler)."""
    from .models.qwen.text_encoder import qwen_lm_generate
    import jax
    import jax.numpy as jnp

    def generate(prompt_text: str) -> str:
        ids, mask = tokenizer([prompt_text], 4096)
        out = qwen_lm_generate(params, cfg, jnp.asarray(ids),
                               jnp.asarray(mask),
                               max_new_tokens=max_new_tokens,
                               eos_token_id=eos_token_id,
                               temperature=temperature, top_p=top_p,
                               sample_key=jax.random.key(seed))
        toks = [int(t) for t in out[0] if int(t) != eos_token_id]
        return tokenizer.decode(toks) if hasattr(tokenizer, "decode") \
            else ""
    return generate
