"""Video Mask Creator — built-in plugin (a real tenant of plugins.py).

Port of the reference's plugins/video_mask_creator (plugin.py:1-53: a
Gradio tab over the MatAnyone mask app) onto this framework's plugin
contract: keyword-driven SAM3 video masks plus MatAnyone mask
propagation from a first-frame mask, exposed as JSON actions under
`/plugin/mask_creator` and `mask_creator.*` tools.  Mask videos land in
the service's output dir so the gallery and VACE flows pick them up.
"""
from __future__ import annotations

import json
import os


def register(api):
    state = {"backend": None}

    def _backend():
        if state["backend"] is None:
            from wan2gp_tpu.runtime.mask_editor import MaskBackend
            save = (api.service.output_dir if api.service is not None
                    else "outputs")
            state["backend"] = MaskBackend(save_path=save)
        return state["backend"]

    def keyword_mask(video: str, keywords):
        """SAM3 keyword mask video -> {file, frames, coverage}."""
        return _backend().segment_video(
            {"video": video, "keywords": list(keywords)})

    def propagate_mask(video: str, mask_png_b64: str):
        """MatAnyone: propagate a first-frame mask through the clip
        (preprocessing/matanyone.py InferenceCore; the reference
        plugin's core capability)."""
        import jax
        import numpy as np
        from wan2gp_tpu.preprocessing.matanyone import (
            MatAnyoneConfig, init_matanyone, matanyone_matting)
        from wan2gp_tpu.runtime.mask_editor import _decode_image_b64
        from wan2gp_tpu.utils.media import read_mjpeg_avi, save_video
        be = _backend()
        name = os.path.basename(str(video))
        path = os.path.join(be.save_path, name)
        frames = read_mjpeg_avi(path).astype(np.float32) / 255.0
        first = _decode_image_b64(mask_png_b64)
        if first.ndim == 3:
            first = first[..., 0]
        mask0 = (first > 127).astype(np.float32)
        if state.get("matanyone") is None:
            # random-init params in this zero-egress env; production
            # loads the HF checkpoint via load_matanyone_params
            cfg = MatAnyoneConfig()
            state["matanyone"] = (init_matanyone(jax.random.PRNGKey(0),
                                                 cfg), cfg)
        params, cfg = state["matanyone"]
        masks = matanyone_matting(params, frames, mask0, cfg,
                                  n_warmup=2)
        out_name = "matte_" + os.path.splitext(name)[0] + ".avi"
        save_video(np.repeat((masks * 255).astype(np.uint8)[..., None],
                             3, axis=-1),
                   os.path.join(be.save_path, out_name))
        return {"file": out_name, "frames": int(masks.shape[0]),
                "coverage": float(masks.mean())}

    def handle(method, payload):
        try:
            action = payload.get("action", "keyword")
            if action == "keyword":
                out = keyword_mask(payload["video"],
                                   payload.get("keywords", []))
            elif action == "propagate":
                out = propagate_mask(payload["video"], payload["mask"])
            else:
                return (400, "application/json",
                        json.dumps({"error": f"unknown action {action}"})
                        .encode())
            return 200, "application/json", json.dumps(out).encode()
        except (KeyError, ValueError, FileNotFoundError) as e:
            return (400, "application/json",
                    json.dumps({"error": str(e)}).encode())

    api.register_route("/plugin/mask_creator", handle)
    api.register_tool("mask_creator.keyword_mask", keyword_mask)
    api.register_tool("mask_creator.propagate_mask", propagate_mask)
