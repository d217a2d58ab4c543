"""Vista4D — camera-controllable 4D re-rendering.

TPU-native re-implementation of the reference Vista4D integration:
- conditioning (models/wan/vista4d/preprocess.py:684-723): the source
  video's and the rendered point-cloud video's VAE latents each pass a
  dedicated patch embed (initialised from the main one) PLUS a
  zero-init mask patch embed over packed alpha+motion masks
  (preprocess.py:675-681: 2 channels folded 4x temporal / 8x8 spatial
  -> 512 latent channels); the token streams concatenate as
  [main | point | source] (modules/model.py:1661-1683);
- rope (any2video.py:56-65): three equal segments with temporal starts
  (0, offset, 2*offset), offset = max(31, grid_t)
  (vista4d_positional_embedding_offset, model.py:1075);
- camera (vista4d/camera.py:6-56): per-token 6-dim Plucker ray
  embeddings at the DiT token grid, tiled over the 3 streams and fed
  through the per-block cam_encoder Linear(6, dim) + projector
  (vista4d/runtime.py:19-27 — the ReCamMaster block adapters with a
  6-dim input);
- the extra tokens are dropped before the head (model.py:1682
  real_seq).

Scene preprocessing (depth -> point cloud -> render) accepts
prepared inputs; depth maps can come from preprocessing/depth_anything.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

from ...ops.rope import build_rope_3d


def get_plucker_embedding(intrinsics: np.ndarray, cam_c2w: np.ndarray,
                          height: int, width: int, height_dit: int,
                          width_dit: int) -> np.ndarray:
    """Per-token Plucker rays (camera.py:6-56).

    intrinsics: [B, F, 4] (fx, fy, cx, cy) in pixels at (height, width);
    cam_c2w: [B, F, 4, 4].  Returns [B, F, h_dit, w_dit, 6]
    (rays_o x rays_d || rays_d)."""
    b, f = intrinsics.shape[:2]
    patch_h = height / height_dit
    patch_w = width / width_dit
    jj, ii = np.meshgrid(np.arange(height_dit, dtype=np.float64),
                         np.arange(width_dit, dtype=np.float64),
                         indexing="ij")
    i = (ii.reshape(-1) + 0.5) * patch_w + patch_w / 2
    j = (jj.reshape(-1) + 0.5) * patch_h + patch_h / 2
    i = np.broadcast_to(i, (b, f, i.size))
    j = np.broadcast_to(j, (b, f, j.size))
    fx, fy, cx, cy = [intrinsics[..., k:k + 1] for k in range(4)]
    zs = np.ones_like(i)
    xs = (i - cx) / fx
    ys = (j - cy) / fy
    dirs = np.stack([xs, ys, zs], axis=-1)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    rot = cam_c2w[..., :3, :3]                 # [B, F, 3, 3]
    rays_d = np.einsum("bfnk,bfmk->bfnm", dirs, rot)
    rays_o = np.broadcast_to(cam_c2w[..., :3, 3][:, :, None],
                             rays_d.shape)
    rays_dxo = np.cross(rays_o, rays_d, axis=-1)
    pl = np.concatenate([rays_dxo, rays_d], axis=-1)
    return pl.reshape(b, f, height_dit, width_dit, 6).astype(np.float32)


def pack_masks(alpha_mask: np.ndarray, motion_mask: np.ndarray
               ) -> jnp.ndarray:
    """[T, H, W] alpha + motion pixel masks -> [1, 512, T_lat, h, w]
    (preprocess.py:675-681: frame-0 repeated 4x, then
    (c sf sh sw) channel fold with sf=4, sh=sw=8)."""
    m = np.stack([alpha_mask, motion_mask], axis=0)[None]  # [1,2,T,H,W]
    m = np.concatenate([np.repeat(m[:, :, :1], 4, axis=2), m[:, :, 1:]],
                       axis=2).astype(np.float32)
    b, c, t4, h8, w8 = m.shape
    t, h, w = t4 // 4, h8 // 8, w8 // 8
    m = m.reshape(b, c, t, 4, h, 8, w, 8)
    m = m.transpose(0, 1, 3, 5, 7, 2, 4, 6)   # b c sf sh sw f h w
    return jnp.asarray(m.reshape(b, c * 4 * 8 * 8, t, h, w))


def build_vista_rope(grid_t: int, h_tok: int, w_tok: int,
                     head_dim: int = 128
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Three temporally-offset segments (any2video.py:56-65)."""
    offset = max(31, grid_t)
    cos_parts, sin_parts = [], []
    for start in (0, offset, offset * 2):
        c, s = build_rope_3d((grid_t, h_tok, w_tok), head_dim=head_dim,
                             offsets=(start, 0, 0))
        cos_parts.append(c)
        sin_parts.append(s)
    return (jnp.concatenate(cos_parts, axis=0),
            jnp.concatenate(sin_parts, axis=0))


def init_vista_encoder(cfg_dim: int, patch_embedding: Dict,
                       mask_in: int = 512) -> Dict:
    """latent_encoder params (vista4d/latent_encoder.py:130-165):
    source/point rgb embeds cloned from the main patch embed, mask
    embeds zero-init."""
    def zero_mask():
        return {"w": jnp.zeros((mask_in * 4, cfg_dim), jnp.float32),
                "b": jnp.zeros((cfg_dim,), jnp.float32)}

    clone = {"w": patch_embedding["w"], "b": patch_embedding["b"]}
    return {"source_rgb": dict(clone), "source_mask": zero_mask(),
            "point_rgb": dict(clone), "point_mask": zero_mask()}


def load_vista_encoder(sd: Dict[str, np.ndarray]) -> Dict:
    """Consume latent_encoder.* keys -> dense params (Conv3d with
    kernel==stride==patch flattens to a matmul)."""
    out = {}
    names = {
        "source_rgb": "latent_encoder.source_patch_embedding."
                      "rgb_patchify.patch_embedding",
        "source_mask": "latent_encoder.source_patch_embedding."
                       "mask_patchify.patch_embedding",
        "point_rgb": "latent_encoder.point_cloud_patch_embedding."
                     "rgb_patchify.patch_embedding",
        "point_mask": "latent_encoder.point_cloud_patch_embedding."
                      "mask_patchify.patch_embedding",
    }
    for ours, theirs in names.items():
        w = np.asarray(sd.pop(f"{theirs}.weight"), np.float32)
        out[ours] = {"w": jnp.asarray(w.reshape(w.shape[0], -1).T),
                     "b": jnp.asarray(np.asarray(
                         sd.pop(f"{theirs}.bias"), np.float32))}
    return out
