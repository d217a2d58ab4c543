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


def build_service_tools(session) -> List[Tool]:
    """Default tool set over a runtime.api Session (submit/manifest)."""

    def list_models() -> dict:
        return {"models": sorted(session.manifest().keys())
                if hasattr(session, "manifest") else []}

    def gen_image(prompt: str, model: str = "", width: int = 1024,
                  height: int = 1024, seed: int = -1) -> dict:
        task = {"prompt": prompt, "resolution": f"{width}x{height}",
                "seed": seed}
        if model:
            task["model"] = model
        tid = session.submit(task)
        return {"task_id": tid, "status": "queued"}

    def gen_video(prompt: str, model: str = "", width: int = 832,
                  height: int = 480, num_frames: int = 81,
                  seed: int = -1) -> dict:
        task = {"prompt": prompt, "resolution": f"{width}x{height}",
                "video_length": num_frames, "seed": seed}
        if model:
            task["model"] = model
        tid = session.submit(task)
        return {"task_id": tid, "status": "queued"}

    def get_default_settings(model: str) -> dict:
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


def make_llm_generate_fn(params, cfg, tokenizer, max_new_tokens: int = 512,
                         eos_token_id: int = 151645):
    """Bind qwen_lm_generate as the agent backend (greedy decode)."""
    from .models.qwen.text_encoder import qwen_lm_generate
    import jax.numpy as jnp

    def generate(prompt_text: str) -> str:
        ids, mask = tokenizer([prompt_text], 4096)
        out = qwen_lm_generate(params, cfg, jnp.asarray(ids),
                               jnp.asarray(mask),
                               max_new_tokens=max_new_tokens,
                               eos_token_id=eos_token_id)
        toks = [int(t) for t in out[0] if int(t) != eos_token_id]
        return tokenizer.decode(toks) if hasattr(tokenizer, "decode") \
            else ""
    return generate
