"""Per-model dynamic form schemas — the headless contract behind the
reference's generated Gradio forms.

The reference builds a different input form for every model
(wgp.py:11067 generate_media_tab: field visibility from the model def's
capabilities, resolution choices from the shared buckets, LoRA
selectors, sliding-window group, guidance/acceleration accordions).
This module derives the SAME structure as a JSON schema the web UI
renders dynamically (`/api/form?model=T`) and API clients introspect —
each field: {key, label, type, default, choices?, group}.

Capability inference mirrors models/model_metadata.py:163
infer_capabilities: media-input fields appear per base-type/module
markers (i2v -> image_start, vace -> control video+mask+refs,
multitalk/fantasy/avatar -> audio, phantom/standin/lynx -> reference
images), image models drop the video group.
"""
from __future__ import annotations

from typing import Any, Dict, List

# base-type substring -> media-input capability markers
_IMAGE_START = ("i2v", "flf2v", "fun_inp", "ti2v", "ds_", "chrono",
                "svi2pro")
_IMAGE_END = ("flf2v", "fun_inp")
_AUDIO = ("multitalk", "infinitetalk", "fantasy", "avatar", "ovi",
          "audio", "steadydancer", "heartmula")
_DUAL_AUDIO = ("multitalk", "infinitetalk")
_REF_IMAGES = ("phantom", "standin", "lynx", "animate", "scail",
               "bernini", "vace", "uso", "umo", "kiwi")
_CONTROL_VIDEO = ("vace", "animate", "steadydancer", "recam", "vista",
                  "wanmove", "scail", "mocha", "df")

PREPROCESS_CHOICES = ["", "pose", "depth", "canny", "scribble", "gray",
                      "flow", "inpaint", "identity"]
ATTENTION_CHOICES = ["auto", "pallas", "xla", "radial", "sol", "dense"]
CACHE_CHOICES = ["", "tea", "mag"]


def _field(key: str, label: str, ftype: str, default: Any = None,
           group: str = "basic", choices: List = None, **extra):
    f = {"key": key, "label": label, "type": ftype, "default": default,
         "group": group}
    if choices is not None:
        f["choices"] = choices
    f.update(extra)
    return f


def _has(base: str, modules, markers) -> bool:
    text = base + " " + " ".join(str(m) for m in (modules or []))
    return any(m in text for m in markers)


def form_schema(registry, model_type: str) -> Dict[str, Any]:
    """JSON form schema for one model (groups: basic, inputs, guidance,
    acceleration, loras, window, post)."""
    model_def = registry.get(model_type)
    base = registry.base_model_type(model_type)
    defaults = registry.default_settings(model_type)
    modules = model_def.get("modules", [])
    image_outputs = bool(model_def.get("image_outputs"))

    from ..config.resolutions import global_choices, model_choices
    try:
        res_choices = [c[1] for c in model_choices(model_def)]
    except Exception:
        res_choices = [c[1] for c in global_choices()]

    fields: List[Dict[str, Any]] = [
        _field("prompt", "Prompt", "textarea",
               defaults.get("prompt", "")),
        _field("negative_prompt", "Negative prompt", "textarea",
               defaults.get("negative_prompt", "")),
        _field("resolution", "Resolution", "select",
               defaults.get("resolution", res_choices[0]
                            if res_choices else "832x480"),
               choices=res_choices),
        _field("num_inference_steps", "Steps", "int",
               defaults.get("num_inference_steps", 30), min=1, max=100),
        _field("seed", "Seed (-1 random)", "int",
               defaults.get("seed", -1)),
    ]
    if not image_outputs:
        fields += [
            _field("video_length", "Frames", "int",
                   defaults.get("video_length", 81), min=1, max=737),
            _field("fps", "FPS", "int", defaults.get("fps", 16)),
            _field("video_source", "Continue video (outputs file)",
                   "file", None, group="inputs", media="video"),
        ]

    # -- media inputs by capability --------------------------------------
    if _has(base, modules, _IMAGE_START):
        fields.append(_field("image_start", "Start image", "file", None,
                             group="inputs", media="image"))
    if _has(base, modules, _IMAGE_END):
        fields.append(_field("image_end", "End image", "file", None,
                             group="inputs", media="image"))
    if _has(base, modules, _CONTROL_VIDEO) and not image_outputs:
        fields += [
            _field("video_guide", "Control video", "file", None,
                   group="inputs", media="video"),
            _field("video_mask", "Mask video", "file", None,
                   group="inputs", media="video"),
            _field("video_prompt_type", "Control preprocessing",
                   "select", defaults.get("video_prompt_type", ""),
                   group="inputs", choices=PREPROCESS_CHOICES),
        ]
    if _has(base, modules, _REF_IMAGES):
        fields.append(_field("image_refs", "Reference images", "files",
                             None, group="inputs", media="image"))
    if _has(base, modules, _AUDIO):
        fields.append(_field("audio_guide", "Audio (voice/music)",
                             "file", None, group="inputs",
                             media="audio"))
        if _has(base, modules, _DUAL_AUDIO):
            fields.append(_field("audio_guide2",
                                 "Audio speaker 2", "file", None,
                                 group="inputs", media="audio"))

    # -- guidance (only settings the model declares get extra fields) ----
    fields.append(_field("guidance_scale", "Guidance",
                         "float", defaults.get("guidance_scale", 5.0),
                         group="guidance", min=0.0, max=20.0))
    for key, label in (
            ("guidance2_scale", "Guidance phase 2"),
            ("guidance_phases", "Guidance phases"),
            ("switch_threshold", "Expert switch threshold"),
            ("flow_shift", "Flow shift"),
            ("embedded_guidance_scale", "Embedded guidance"),
            ("audio_guidance_scale", "Audio guidance"),
            ("RIFLEx_setting", "RIFLEx")):
        if key in defaults:
            ftype = "int" if isinstance(defaults[key], int) else "float"
            fields.append(_field(key, label, ftype, defaults[key],
                                 group="guidance"))

    # -- acceleration ------------------------------------------------------
    fields += [
        _field("attention_mode", "Attention", "select",
               defaults.get("attention_mode", "auto"),
               group="acceleration", choices=ATTENTION_CHOICES),
        _field("cache_type", "Step-skip cache", "select",
               defaults.get("cache_type", ""), group="acceleration",
               choices=CACHE_CHOICES),
    ]

    # -- LoRAs --------------------------------------------------------------
    fields += [
        _field("activated_loras", "LoRAs", "multiselect", [],
               group="loras", choices=[]),
        _field("loras_multipliers", "LoRA multipliers", "text",
               defaults.get("loras_multipliers", ""), group="loras"),
    ]

    # -- sliding window (long-video models) --------------------------------
    if not image_outputs:
        for key, label, dv in (
                ("sliding_window_size", "Window size", 129),
                ("sliding_window_overlap", "Window overlap", 5),
                ("sliding_window_discard_last_frames",
                 "Discard last frames", 0)):
            fields.append(_field(key, label, "int",
                                 defaults.get(key, dv), group="window"))

    # -- postprocessing ------------------------------------------------------
    fields += [
        _field("temporal_upsampling", "Temporal upsampling", "select",
               defaults.get("temporal_upsampling", ""), group="post",
               choices=["", "rife2", "rife4"]),
        _field("spatial_upsampling", "Spatial upsampling", "select",
               defaults.get("spatial_upsampling", ""), group="post",
               choices=["", "lanczos1.5", "lanczos2"]),
        _field("film_grain_intensity", "Film grain", "float",
               defaults.get("film_grain_intensity", 0.0), group="post"),
    ]

    return {
        "model_type": model_type,
        "base_model_type": base,
        "name": model_def.get("name", model_type),
        "description": model_def.get("description", ""),
        "image_outputs": image_outputs,
        "groups": ["basic", "inputs", "guidance", "acceleration",
                   "loras", "window", "post"],
        "fields": fields,
    }
