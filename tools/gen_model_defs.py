"""Generate model-def JSONs for every reference default whose architecture
this framework implements.

Reads /root/reference/defaults/*.json as CONFIG DATA (names, checkpoint
URLs, numeric sampling settings — the facts needed to load the same
checkpoints), keeps only defs whose architecture is registered in
build_handler_map(), rewrites the description to a short factual line and
drops UI-only / unsupported keys.  Run from the repo root:

    python tools/gen_model_defs.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from wan2gp_tpu.families import build_handler_map  # noqa: E402

REF = "/root/reference/defaults"
OUT = "wan2gp_tpu/config/defaults"

# reference architecture -> implemented base type (same network dims; the
# def keeps the reference model_type name so queue files stay compatible)
ALIASES = {
    "flux": "flux_dev",
    "ace_step_v1": "ace_step",
    "hidream_o1_dev": "hidream_o1",
    "magi_human_distill": "magi_human",
    "minimax_h3_fl2va": "minimax_h3",
    "minimax_h3_fl2va_pruned": "minimax_h3",
    "kiwi_edit": "lucy_edit",
    "krea2_raw_edit": "krea2_raw",
    "krea2_turbo_edit": "krea2_turbo",
    "qwen_image_edit_plus_20B": "qwen_image_edit_20B",
    "qwen_image_edit_plus2_20B": "qwen_image_edit_20B",
    "ltx2_22B_msr": "ltx2_22B",
    "z_image_base": "z_image",
}

KEEP_KEYS = {
    "resolution", "video_length", "num_inference_steps", "guidance_scale",
    "guidance2_scale", "guidance3_scale", "guidance_phases", "flow_shift",
    "sample_solver", "seed", "fps", "audio_guidance_scale",
    "switch_threshold", "switch2_threshold", "model_switch_phase",
    "duration_seconds", "negative_prompt", "embedded_guidance_scale",
    "sliding_window_size", "sliding_window_overlap",
    "sliding_window_discard_last_frames", "RIFLEx_setting",
    "solver_order",
}
MODEL_KEYS = {"name", "architecture", "modules", "URLs", "URLs2",
              "preload_URLs", "group"}


def main():
    handlers = build_handler_map()
    written, skipped = [], []
    for fname in sorted(os.listdir(REF)):
        if not fname.endswith(".json"):
            continue
        try:
            src = json.load(open(os.path.join(REF, fname)))
        except Exception:
            continue
        model = src.get("model", {})
        arch = model.get("architecture", "")
        model_type = fname[:-5]
        if arch not in handlers:
            if arch in ALIASES:
                arch = ALIASES[arch]
                model = dict(model, architecture=arch)
            else:
                skipped.append((model_type, arch))
                continue
        out_model = {k: model[k] for k in MODEL_KEYS if k in model}
        out_model["description"] = (
            f"{model.get('name', model_type)} — reference-compatible "
            f"model definition (architecture {arch}).")
        out = {"model": out_model}
        for k in KEEP_KEYS:
            if k in src:
                out[k] = src[k]
        path = os.path.join(OUT, fname)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        written.append(model_type)
    print(f"written: {len(written)}")
    print(f"skipped (unimplemented arch): {len(skipped)}")
    uniq = sorted({a for _, a in skipped})
    print("missing archs:", ", ".join(uniq))


if __name__ == "__main__":
    main()
