"""ReCamMaster — camera-controlled re-rendering of a source video.

TPU-native re-implementation of the reference ReCamMaster support:
- camera embedding: shared/utils/cammmaster_tools.py:43-63
  (get_camera_embedding) — one relative 3x4 pose per latent frame
  (frames [::4] of 81), flattened to 12 numbers;
- per-block adapters: models/wan/modules/model.py:1196-1204 — every
  block gains a zero-init `cam_encoder` Linear(12 -> dim) whose output
  is ADDED to the modulated self-attn input, and an identity-init
  `projector` Linear(dim -> dim) applied to the self-attn output
  (model.py:634-650);
- generation: models/wan/any2video.py:928-943, 1152-1155, 1496 — the
  source video's latents are concatenated on TIME (2T frames), rope
  covers the doubled span, and the scheduler steps on the first T
  frames of the prediction.

The per-block Linears are stored stacked [L, ...] so the block loop
stays a single `lax.scan`.  Camera trajectories come from a
camera_extrinsics.json asset when available; otherwise procedural
stand-in trajectories implement the same 10 motion types.
"""
from __future__ import annotations

import json
import math
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

CAMERA_MODES = {
    1: "Pan Right", 2: "Pan Left", 3: "Tilt Up", 4: "Tilt Down",
    5: "Zoom In", 6: "Zoom Out", 7: "Translate Up (with rotation)",
    8: "Translate Down (with rotation)", 9: "Arc Left (with rotation)",
    10: "Arc Right (with rotation)",
}


def parse_matrix(matrix_str: str) -> np.ndarray:
    """'[a b c d] [e f g h] ...' -> [4, 4] (cammmaster_tools.py:14-20)."""
    rows = matrix_str.strip().split("] [")
    out = []
    for row in rows:
        row = row.replace("[", "").replace("]", "")
        out.append([float(v) for v in row.split()])
    return np.asarray(out, np.float64)


def _relative_pose(c2ws: np.ndarray) -> np.ndarray:
    """Poses of frames i relative to frame 0
    (cammmaster_tools.py:23-37 get_relative_pose)."""
    target = np.eye(4)
    abs2rel = target @ np.linalg.inv(c2ws[0])
    rel = np.stack([target] + [abs2rel @ c for c in c2ws[1:]])
    return rel.astype(np.float32)


def camera_embedding_from_json(cam_data: Dict[str, Any], cam_type: int,
                               num_frames: int = 81) -> np.ndarray:
    """Reference asset path (cammmaster_tools.py:43-63): parse the 4x4
    extrinsics of frames [::4], apply the axis permutation
    ([1,2,0,3] columns, negate y, translations /100), then per-frame
    relative pose vs frame 0 -> [T_lat, 12] fp32."""
    idx = list(range(num_frames))[::4]
    traj = np.stack([parse_matrix(cam_data[f"frame{i}"]
                                  [f"cam{int(cam_type):02d}"])
                     for i in idx]).transpose(0, 2, 1)
    c2ws = []
    for c2w in traj:
        c2w = c2w[:, [1, 2, 0, 3]].copy()
        c2w[:3, 1] *= -1.0
        c2w[:3, 3] /= 100.0
        c2ws.append(c2w)
    c2ws = np.stack(c2ws)
    rel = np.stack([_relative_pose(np.stack([c2ws[0], c2ws[i]]))[1]
                    for i in range(len(c2ws))])
    return rel[:, :3, :].reshape(len(c2ws), 12).astype(np.float32)


def _look_at(eye: np.ndarray, center: np.ndarray) -> np.ndarray:
    """c2w matrix for a camera at `eye` looking at `center` (y-up)."""
    fwd = center - eye
    fwd = fwd / (np.linalg.norm(fwd) + 1e-9)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(fwd, up)
    right = right / (np.linalg.norm(right) + 1e-9)
    up = np.cross(right, fwd)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up, fwd, eye
    return m


def synthetic_camera_c2ws(cam_type: int, n: int) -> np.ndarray:
    """Procedural stand-in trajectories for the 10 ReCamMaster motion
    types (used when the camera_extrinsics.json asset is absent)."""
    c2ws = []
    for i in range(n):
        s = i / max(n - 1, 1)
        eye = np.array([0.0, 0.0, -1.0])
        center = np.zeros(3)
        if cam_type == 1:        # pan right: yaw toward +x
            center = np.array([math.sin(0.35 * s), 0.0, 1.0])
            center += eye
        elif cam_type == 2:      # pan left
            center = np.array([-math.sin(0.35 * s), 0.0, 1.0]) + eye
        elif cam_type == 3:      # tilt up
            center = np.array([0.0, math.sin(0.3 * s), 1.0]) + eye
        elif cam_type == 4:      # tilt down
            center = np.array([0.0, -math.sin(0.3 * s), 1.0]) + eye
        elif cam_type == 5:      # zoom in
            eye = np.array([0.0, 0.0, -1.0 + 0.35 * s])
        elif cam_type == 6:      # zoom out
            eye = np.array([0.0, 0.0, -1.0 - 0.35 * s])
        elif cam_type == 7:      # translate up, keep looking at center
            eye = np.array([0.0, 0.3 * s, -1.0])
        elif cam_type == 8:      # translate down
            eye = np.array([0.0, -0.3 * s, -1.0])
        elif cam_type == 9:      # arc left around the subject
            a = 0.45 * s
            eye = np.array([-math.sin(a), 0.0, -math.cos(a)])
        elif cam_type == 10:     # arc right
            a = 0.45 * s
            eye = np.array([math.sin(a), 0.0, -math.cos(a)])
        else:
            raise ValueError(f"unknown camera mode {cam_type}")
        if cam_type in (1, 2, 3, 4):
            c2ws.append(_look_at(eye, center))
        else:
            c2ws.append(_look_at(eye, np.zeros(3)))
    return np.stack(c2ws)


def get_camera_embedding(cam_type: int, num_frames: int = 81,
                         extrinsics_json: Optional[str] = None
                         ) -> np.ndarray:
    """[T_lat, 12] relative-pose embedding for one of the 10 modes."""
    if extrinsics_json:
        with open(extrinsics_json) as f:
            return camera_embedding_from_json(json.load(f), cam_type,
                                              num_frames)
    n = len(range(num_frames)[::4])
    c2ws = synthetic_camera_c2ws(cam_type, n)
    rel = np.stack([_relative_pose(np.stack([c2ws[0], c2ws[i]]))[1]
                    for i in range(n)])
    return rel[:, :3, :].reshape(n, 12).astype(np.float32)


def init_recam_blocks(num_layers: int, dim: int) -> Dict[str, Any]:
    """Reference init (model.py:1199-1204): cam_encoder zeros,
    projector identity."""
    return {
        "cam_w": jnp.zeros((num_layers, 12, dim), jnp.float32),
        "cam_b": jnp.zeros((num_layers, dim), jnp.float32),
        "proj_w": jnp.broadcast_to(jnp.eye(dim, dtype=jnp.float32),
                                   (num_layers, dim, dim)),
        "proj_b": jnp.zeros((num_layers, dim), jnp.float32),
    }


def load_recam_blocks(sd: Dict[str, np.ndarray], num_layers: int):
    """Consume blocks.N.cam_encoder/projector keys -> stacked params."""
    cam_w, cam_b, proj_w, proj_b = [], [], [], []
    for i in range(num_layers):
        cam_w.append(np.asarray(sd.pop(f"blocks.{i}.cam_encoder.weight"),
                                np.float32).T)
        cam_b.append(np.asarray(sd.pop(f"blocks.{i}.cam_encoder.bias"),
                                np.float32))
        proj_w.append(np.asarray(sd.pop(f"blocks.{i}.projector.weight"),
                                 np.float32).T)
        proj_b.append(np.asarray(sd.pop(f"blocks.{i}.projector.bias"),
                                 np.float32))
    return {"cam_w": jnp.asarray(np.stack(cam_w)),
            "cam_b": jnp.asarray(np.stack(cam_b)),
            "proj_w": jnp.asarray(np.stack(proj_w)),
            "proj_b": jnp.asarray(np.stack(proj_b))}


def build_cam_frame_map(f_total: int, f_cam: int, h: int, w: int
                        ) -> np.ndarray:
    """Token -> camera-pose-row map for the doubled (target+source)
    latent stack (model.py:639-642: cam repeated x2 over frames then
    broadcast over the spatial grid)."""
    frames = np.arange(f_total) % f_cam
    return np.repeat(frames, h * w).astype(np.int32)
