"""ArcFace identity embedding + 5-point face alignment.

TPU-native replacement for the reference's face identity stack
(/root/reference/preprocessing/arc/face_encoder.py — insightface
`face_align.norm_crop` + an ArcFace recognition backbone producing the
normalized 512-d identity vector consumed by Lynx,
any2video.py:1055-1057; face_utils.py:31-62 alignment template):
- `estimate_norm` — Umeyama similarity transform from the detected
  5-point landmarks to the canonical ArcFace 112x112 template
  (insightface convention, re-derived from the least-squares similarity
  fit; no skimage dependency);
- `align_face` — affine warp to the 112x112 crop (cv2, which is baked
  into this image);
- IResNet (insightface iresnet18/34/50/100 family): 3x3 stem + PReLU,
  IBasicBlock = BN-conv-BN-PReLU-conv(stride)-BN with conv1x1+BN
  downsample, final BN -> fc 512 -> BN1d, L2-normalized output;
- `landmarks_5_from_face68` — derive the 5-point template from DWPose's
  68 face keypoints (in-repo detector; the reference uses insightface's
  RetinaFace).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

ARCFACE_DST = np.array(
    [[38.2946, 51.6963], [73.5318, 51.5014], [56.0252, 71.7366],
     [41.5493, 92.3655], [70.7299, 92.2041]], dtype=np.float32)


def estimate_norm(lmk: np.ndarray, image_size: int = 112) -> np.ndarray:
    """Similarity transform (rotation+scale+translation) mapping the 5
    landmarks onto the ArcFace template (face_utils.py estimate_norm:31
    — skimage SimilarityTransform.estimate, i.e. the Umeyama fit).
    Returns the 2x3 affine matrix."""
    assert lmk.shape == (5, 2)
    dst = ARCFACE_DST * (image_size / 112.0)
    src = np.asarray(lmk, np.float64)
    dstf = np.asarray(dst, np.float64)
    mu_s = src.mean(axis=0)
    mu_d = dstf.mean(axis=0)
    sc = src - mu_s
    dc = dstf - mu_d
    cov = dc.T @ sc / 5.0
    u, s, vt = np.linalg.svd(cov)
    d = np.ones(2)
    if np.linalg.det(cov) < 0:
        d[-1] = -1
    r = u @ np.diag(d) @ vt
    var_s = (sc ** 2).sum() / 5.0
    scale = (s * d).sum() / max(var_s, 1e-12)
    t = mu_d - scale * (r @ mu_s)
    m = np.zeros((2, 3), np.float64)
    m[:, :2] = scale * r
    m[:, 2] = t
    return m.astype(np.float32)


def align_face(image: np.ndarray, lmk: np.ndarray,
               image_size: int = 112) -> np.ndarray:
    """image: [H, W, 3] uint8/float RGB -> aligned [size, size, 3]."""
    import cv2
    m = estimate_norm(np.asarray(lmk, np.float32), image_size)
    return cv2.warpAffine(np.asarray(image), m, (image_size, image_size),
                          borderValue=0.0)


def landmarks_5_from_face68(face_kpts: np.ndarray) -> np.ndarray:
    """68-point face landmarks (DWPose layout) -> the 5 ArcFace points:
    eye centers, nose tip, mouth corners."""
    k = np.asarray(face_kpts, np.float32)
    left_eye = k[36:42].mean(axis=0)
    right_eye = k[42:48].mean(axis=0)
    nose = k[30]
    mouth_l = k[48]
    mouth_r = k[54]
    return np.stack([left_eye, right_eye, nose, mouth_l, mouth_r])


# ---------------------------------------------------------------------------
# IResNet backbone (insightface iresnet.py convention)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class IResNetConfig:
    layers: Tuple[int, ...] = (3, 4, 14, 3)     # iresnet50
    dim: int = 512
    width: int = 64
    fc_scale: int = 7 * 7
    eps: float = 1e-5


IRESNET18 = IResNetConfig(layers=(2, 2, 2, 2))
IRESNET50 = IResNetConfig(layers=(3, 4, 14, 3))
IRESNET100 = IResNetConfig(layers=(3, 13, 30, 3))


def _bn_p(c):
    return {"w": jnp.ones((c,)), "b": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def _conv_p(key, cin, cout, k):
    lim = math.sqrt(2.0 / (cin * k * k))
    return {"w": jax.random.normal(key, (cout, cin, k, k),
                                   jnp.float32) * lim}


def init_iresnet(key, cfg: IResNetConfig = IRESNET50) -> Dict[str, Any]:
    keys = iter(jax.random.split(key, 512))
    w = cfg.width
    p: Dict[str, Any] = {
        "conv1": _conv_p(next(keys), 3, w, 3), "bn1": _bn_p(w),
        "prelu": jnp.full((w,), 0.25, jnp.float32),
    }
    cin = w
    for stage, (n, cout) in enumerate(zip(cfg.layers,
                                          (w, w * 2, w * 4, w * 8))):
        blocks = []
        for i in range(n):
            stride = 2 if i == 0 else 1
            bp = {"bn1": _bn_p(cin), "conv1": _conv_p(next(keys), cin,
                                                      cout, 3),
                  "bn2": _bn_p(cout),
                  "prelu": jnp.full((cout,), 0.25, jnp.float32),
                  "conv2": _conv_p(next(keys), cout, cout, 3),
                  "bn3": _bn_p(cout)}
            if stride != 1 or cin != cout:
                bp["down_conv"] = _conv_p(next(keys), cin, cout, 1)
                bp["down_bn"] = _bn_p(cout)
            blocks.append(bp)
            cin = cout
        p[f"layer{stage + 1}"] = blocks
    p["bn2"] = _bn_p(cin)
    lim = math.sqrt(1.0 / (cin * cfg.fc_scale))
    p["fc"] = {"w": jax.random.uniform(
        next(keys), (cin * cfg.fc_scale, cfg.dim), jnp.float32,
        -lim, lim), "b": jnp.zeros((cfg.dim,), jnp.float32)}
    p["features"] = _bn_p(cfg.dim)
    return p


def _bn(x, p, eps):
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return ((x - p["mean"].reshape(shape))
            * jax.lax.rsqrt(p["var"].reshape(shape) + eps)
            * p["w"].reshape(shape) + p["b"].reshape(shape))


def _prelu(x, a):
    return jnp.where(x >= 0, x, a.reshape(1, -1, 1, 1) * x)


def _conv(x, p, stride=1):
    k = p["w"].shape[-1]
    pad = (k - 1) // 2
    return jax.lax.conv_general_dilated(
        x, p["w"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def iresnet_forward(params, cfg: IResNetConfig, x):
    """x: [B, 3, 112, 112] in [-1, 1] (BGR, the reference flips RGB ->
    BGR before the encoder, face_encoder.py:93).  Returns [B, 512]
    L2-normalized identity embeddings."""
    eps = cfg.eps
    h = _conv(x.astype(jnp.float32), params["conv1"])
    h = _prelu(_bn(h, params["bn1"], eps), params["prelu"])
    for stage in range(4):
        for i, bp in enumerate(params[f"layer{stage + 1}"]):
            stride = 2 if i == 0 else 1
            y = _bn(h, bp["bn1"], eps)
            y = _conv(y, bp["conv1"])
            y = _prelu(_bn(y, bp["bn2"], eps), bp["prelu"])
            y = _conv(y, bp["conv2"], stride=stride)
            y = _bn(y, bp["bn3"], eps)
            if "down_conv" in bp:
                sc = _bn(_conv(h, bp["down_conv"], stride=stride),
                         bp["down_bn"], eps)
            else:
                sc = h
            h = y + sc
    h = _bn(h, params["bn2"], eps)
    h = h.reshape(h.shape[0], -1)
    h = jnp.dot(h, params["fc"]["w"]) + params["fc"]["b"]
    f = params["features"]
    h = (h - f["mean"]) * jax.lax.rsqrt(f["var"] + eps) * f["w"] + f["b"]
    return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


def load_iresnet_params(sd: Dict[str, np.ndarray],
                        cfg: IResNetConfig = IRESNET50):
    """insightface iresnet torch keys (conv1, bn1, prelu, layerN.M.*,
    bn2, fc, features)."""
    sd = dict(sd)

    def bn(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32)),
                "b": jnp.asarray(np.asarray(sd.pop(f"{name}.bias"),
                                            np.float32)),
                "mean": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.running_mean"), np.float32)),
                "var": jnp.asarray(np.asarray(
                    sd.pop(f"{name}.running_var"), np.float32))}

    def conv(name):
        return {"w": jnp.asarray(np.asarray(sd.pop(f"{name}.weight"),
                                            np.float32))}

    p: Dict[str, Any] = {"conv1": conv("conv1"), "bn1": bn("bn1"),
                         "prelu": jnp.asarray(np.asarray(
                             sd.pop("prelu.weight"), np.float32))}
    for stage in range(4):
        blocks = []
        i = 0
        while f"layer{stage + 1}.{i}.conv1.weight" in sd:
            pre = f"layer{stage + 1}.{i}"
            bp = {"bn1": bn(f"{pre}.bn1"), "conv1": conv(f"{pre}.conv1"),
                  "bn2": bn(f"{pre}.bn2"),
                  "prelu": jnp.asarray(np.asarray(
                      sd.pop(f"{pre}.prelu.weight"), np.float32)),
                  "conv2": conv(f"{pre}.conv2"), "bn3": bn(f"{pre}.bn3")}
            if f"{pre}.downsample.0.weight" in sd:
                bp["down_conv"] = conv(f"{pre}.downsample.0")
                bp["down_bn"] = bn(f"{pre}.downsample.1")
            blocks.append(bp)
            i += 1
        p[f"layer{stage + 1}"] = blocks
    p["bn2"] = bn("bn2")
    p["fc"] = {"w": jnp.asarray(np.asarray(sd.pop("fc.weight"),
                                           np.float32).T),
               "b": jnp.asarray(np.asarray(sd.pop("fc.bias"),
                                           np.float32))}
    p["features"] = bn("features")
    leftover = [k for k in sd if "num_batches" not in k]
    return p, sorted(leftover)


def arcface_embed(params, cfg: IResNetConfig, image_rgb: np.ndarray,
                  landmarks: np.ndarray) -> np.ndarray:
    """Full reference path (face_encoder.py:69-96): align to 112, scale
    to [-1, 1], RGB->BGR flip, IResNet, L2 norm.  Returns [512]."""
    crop = align_face(image_rgb, landmarks, 112).astype(np.float32)
    if crop.max() > 2.0:
        crop = crop / 255.0
    crop = (crop - 0.5) / 0.5
    x = crop.transpose(2, 0, 1)[None][:, ::-1]      # RGB -> BGR
    emb = iresnet_forward(params, cfg, jnp.asarray(np.ascontiguousarray(x)))
    return np.asarray(emb[0])
