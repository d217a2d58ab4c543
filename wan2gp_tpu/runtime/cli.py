"""Headless CLI (the reference's `wgp.py --process` path, wgp.py:8488
process_tasks_cli + shared/cli_args.py flags).

Usage:
  python -m wan2gp_tpu --model t2v_1.3B --prompt "a cat" --steps 30
  python -m wan2gp_tpu --process queue.json
  python -m wan2gp_tpu --process queue.json --dry-run
  python -m wan2gp_tpu --list-models

Exit codes: 0 success, 1 task error, 130 interrupted (docs/CLI.md:76-81).
"""
from __future__ import annotations

import argparse
import json
import sys

from .queue import TaskQueue
from .service import GenerationService
from .api import Session, GenerationResult, ProgressUpdate


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("wan2gp_tpu",
                                description="TPU-native WanGP-class runner")
    p.add_argument("--process", metavar="QUEUE",
                   help="headless: process a queue .json and exit")
    p.add_argument("--dry-run", action="store_true",
                   help="validate the queue without generating")
    p.add_argument("--list-models", action="store_true")
    p.add_argument("--model", default=None, help="model type for one-shot")
    p.add_argument("--prompt", default=None)
    p.add_argument("--negative-prompt", default="")
    p.add_argument("--resolution", default=None, help="e.g. 832x480")
    p.add_argument("--frames", type=int, default=None)
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--guidance-scale", type=float, default=None)
    p.add_argument("--flow-shift", type=float, default=None)
    p.add_argument("--solver", default=None,
                   choices=["unipc", "dpm++", "euler", "causvid", "lcm"])
    p.add_argument("--seed", type=int, default=-1)
    p.add_argument("--output-dir", default="outputs")
    p.add_argument("--attention", default="auto",
                   help="attention mode: auto | pallas | xla | radial | "
                        "swa:W[:S] | ring:cp | ulysses:sp")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help="multi-chip mesh spec, e.g. 'dp=2,cp=2,tp=2' or "
                        "'auto' (shard weights/activations over all "
                        "visible devices)")
    p.add_argument("--quantize", default="", choices=["", "int8", "int4"],
                   help="quantize transformer linears on load (the "
                        "reference's transformer_quantization)")
    p.add_argument("--random-weights", action="store_true",
                   help="run with randomly initialized weights (smoke test)")
    p.add_argument("--checkpoints-dir", default="ckpts")
    p.add_argument("--verbose", type=int, default=1)
    p.add_argument("--server", action="store_true",
                   help="serve the web UI instead of running headless")
    p.add_argument("--listen", default="127.0.0.1",
                   help="web UI bind address (use 0.0.0.0 to share)")
    p.add_argument("--server-port", type=int, default=7860)
    p.add_argument("--plugins-dir", default=None,
                   help="load plugins (register(api) modules) from this dir")
    p.add_argument("--config", default=None, metavar="WGP_CONFIG",
                   help="wgp_config.json-compatible server config file")
    p.add_argument("--agent", action="store_true",
                   help="interactive Deepy agent console (needs a local "
                        "LLM checkpoint via --agent-llm)")
    p.add_argument("--agent-llm", default=None,
                   help="safetensors path of the Qwen-family LLM backing "
                        "the agent")
    return p


def _settings_from_args(args) -> dict:
    s = {"model_type": args.model or "t2v_1.3B"}
    if args.prompt is not None:
        s["prompt"] = args.prompt
    if args.negative_prompt:
        s["negative_prompt"] = args.negative_prompt
    if args.resolution:
        s["resolution"] = args.resolution
    if args.frames is not None:
        s["video_length"] = args.frames
    if args.steps is not None:
        s["num_inference_steps"] = args.steps
    if args.guidance_scale is not None:
        s["guidance_scale"] = args.guidance_scale
    if args.flow_shift is not None:
        s["flow_shift"] = args.flow_shift
    if args.solver:
        s["sample_solver"] = args.solver
    s["seed"] = args.seed
    return s


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    svc_kwargs = dict(output_dir=args.output_dir,
                      attn_backend=args.attention,
                      plugins_dir=args.plugins_dir,
                      mesh=args.mesh, quantize=args.quantize)
    if args.config:
        from .server_config import load_server_config, apply_server_config
        base = apply_server_config(load_server_config(args.config))
        for k, v in base.items():
            if svc_kwargs.get(k) in (None, "outputs", "auto"):
                svc_kwargs[k] = v
    service = GenerationService(init_random_weights=args.random_weights,
                                **svc_kwargs)

    if args.server:
        from .webui import WebUI
        from .api import Session
        WebUI(session=Session(service=service),
              save_path=args.output_dir).serve(args.listen, args.server_port)
        return 0

    if args.agent:
        from ..agent import build_agent, run_console, make_llm_generate_fn
        if not args.agent_llm:
            print("--agent needs --agent-llm <qwen checkpoint>",
                  file=sys.stderr)
            return 1
        from ..io.safetensors_reader import load_weights
        from ..models.qwen.text_encoder import (QwenLMConfig,
                                                load_qwen_lm_params,
                                                QWEN25_VL_7B_TEXT)
        from ..utils.tokenizer import load_tokenizer
        cfg = QwenLMConfig(**QWEN25_VL_7B_TEXT)
        params, _ = load_qwen_lm_params(load_weights(args.agent_llm), cfg)
        gen = make_llm_generate_fn(params, cfg, load_tokenizer(None))
        run_console(build_agent(Session(service=service), gen))
        return 0

    if args.list_models:
        for mt in service.registry.model_types():
            d = service.registry.get(mt)
            print(f"{mt:24s} {d.get('name', '')}")
        return 0

    q = TaskQueue()
    if args.process:
        q.load(args.process)
        if args.dry_run:
            errors = 0
            for t in q.tasks():
                mt = t.settings.get("model_type", "t2v_1.3B")
                if mt not in service.registry.models_def:
                    print(f"task {t.id}: unknown model_type {mt!r}")
                    errors += 1
            print(f"{len(q.tasks())} task(s), {errors} error(s)")
            return 1 if errors else 0
    else:
        if args.prompt is None and not args.random_weights:
            print("nothing to do: pass --prompt / --process / --list-models")
            return 0
        q.add(_settings_from_args(args))

    def on_event(kind, data):
        if args.verbose < 1:
            return
        if kind == "task_start":
            print(f"[task {data.id}] start: "
                  f"{data.settings.get('model_type')}")
        elif kind == "task_done":
            print(f"[task {data.id}] done -> {', '.join(data.outputs)}")
        elif kind == "task_error":
            print(f"[task {data.id}] ERROR: {data.error}", file=sys.stderr)
        elif kind == "status":
            print(f"  {data}")

    try:
        return service.process_queue(q, on_event=on_event)
    except KeyboardInterrupt:
        return 130


if __name__ == "__main__":
    sys.exit(main())
