"""Server configuration: wgp_config.json-compatible load/save/migration.

Mirrors the reference's server config handling (wgp.py:147,2493-2581 +
shared/utils/wgp_config_migration.py): a JSON dict of global settings with
defaults filled in, legacy keys migrated, and unknown keys preserved so a
reference config file round-trips.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

DEFAULTS: Dict[str, Any] = {
    # reference keys (wgp.py server_config defaults) that map onto this
    # runtime; TPU-specific additions at the bottom
    "attention_mode": "auto",
    "transformer_quantization": "bf16",
    "text_encoder_quantization": "bf16",
    "vae_precision": "32",
    "mixed_precision": "0",
    "save_path": "outputs",
    "image_save_path": "outputs",
    "checkpoints_dirs": ["ckpts"],
    "preload_model_policy": [],
    "clear_file_list": 5,
    "fit_canvas": 0,
    "enhancer_enabled": 0,
    "mmaudio_enabled": 0,
    "max_frames_multiplier": 1,
    "temporal_upsampling": "",
    "spatial_upsampling": "",
    # output codec policy (wgp.py:3289 video_output_codec default;
    # shared/utils/video_codecs.py tables).  Container "" keeps the
    # ffmpeg-free MJPEG-AVI writer.
    "video_output_codec": "libx264_8",
    "video_container": "",
    # TPU runtime additions
    "attn_backend": "auto",
    "plugins_dir": "",
    "mesh": "",          # "dp=2,cp=2,tp=2" | "auto" | "" (single chip)
}

# legacy-key migration (wgp_config_migration.py behavior: renames + drops)
_MIGRATIONS = {
    "quantize_transformer": "transformer_quantization",
    "attention": "attention_mode",
    "savePath": "save_path",
}
_DROPPED = {"profile", "compile", "boost", "gpu"}   # CUDA paging-era knobs


def load_server_config(path: str = "wgp_config.json") -> Dict[str, Any]:
    """Load + migrate + fill defaults.  Missing file -> pure defaults."""
    cfg = dict(DEFAULTS)
    if os.path.isfile(path):
        with open(path, "r", encoding="utf-8") as f:
            raw = json.load(f)
        for k, v in raw.items():
            if k in _MIGRATIONS:
                cfg[_MIGRATIONS[k]] = v
            elif k in _DROPPED:
                continue
            else:
                cfg[k] = v
    return cfg


def save_server_config(cfg: Dict[str, Any],
                       path: str = "wgp_config.json") -> None:
    with open(path, "w", encoding="utf-8") as f:
        json.dump(cfg, f, indent=4)


def apply_server_config(cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Translate a server config into GenerationService kwargs."""
    return {
        "output_dir": cfg.get("save_path", "outputs"),
        "attn_backend": cfg.get("attn_backend",
                                cfg.get("attention_mode", "auto")),
        "plugins_dir": cfg.get("plugins_dir") or None,
        "mesh": cfg.get("mesh") or None,
        "quantize": _QUANT_MAP.get(
            str(cfg.get("transformer_quantization", "")), ""),
        "video_codec": cfg.get("video_output_codec") or None,
        "video_container": cfg.get("video_container") or None,
    }


# reference transformer_quantization values -> loader modes
_QUANT_MAP = {"int8": "int8", "quanto_int8": "int8", "int4": "int4",
              "quanto_int4": "int4", "": "", "bf16": "", "fp16": ""}
