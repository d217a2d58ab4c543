"""DWPose whole-body pose estimation (pose control preprocessor).

Re-implementation of /root/reference/preprocessing/dwpose/ — the reference
runs two ONNX models (YOLOX-L person detector + RTMPose 'dw-ll_ucoco_384'
SimCC whole-body estimator) through onnxruntime; here the SAME .onnx files
are parsed and executed by io/onnx_reader.py (pure-python protobuf parse +
jax op graph, jit-compiled on the TPU), with the numpy pre/post-processing
(YOLOX grid decode + NMS, top-down affine crop, SimCC argmax decode,
mmpose->openpose joint remap with the synthetic neck) re-derived from
onnxdet.py / onnxpose.py / wholebody.py, and the OpenPose-style skeleton
rendering from util.py draw_bodypose/draw_handpose/draw_facepose.
"""
from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

# openpose 18-joint limb sequence + colors (util.py:70-111)
LIMB_SEQ = [[2, 3], [2, 6], [3, 4], [4, 5], [6, 7], [7, 8], [2, 9],
            [9, 10], [10, 11], [2, 12], [12, 13], [13, 14], [2, 1],
            [1, 15], [15, 17], [1, 16], [16, 18]]
COLORS = [[255, 0, 0], [255, 85, 0], [255, 170, 0], [255, 255, 0],
          [170, 255, 0], [85, 255, 0], [0, 255, 0], [0, 255, 85],
          [0, 255, 170], [0, 255, 255], [0, 170, 255], [0, 85, 255],
          [0, 0, 255], [85, 0, 255], [170, 0, 255], [255, 0, 255],
          [255, 0, 170], [255, 0, 85]]


# ---------------------------------------------------------------------------
# YOLOX detector post-processing (onnxdet.py)
# ---------------------------------------------------------------------------

def _nms(boxes, scores, thr):
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        wv = np.maximum(0.0, xx2 - xx1 + 1)
        hv = np.maximum(0.0, yy2 - yy1 + 1)
        ovr = wv * hv / (areas[i] + areas[order[1:]] - wv * hv)
        order = order[1:][ovr <= thr]
    return keep


def yolox_postprocess(raw, img_size=(640, 640), ratio=1.0,
                      nms_thr=0.45, score_thr=0.1, final_thr=0.3):
    """raw: [N, 4+1+classes] network output -> person boxes [K, 4]
    (demo_postprocess + multiclass_nms + the person/score filter,
    onnxdet.py:60-130)."""
    strides = [8, 16, 32]
    grids, exp_strides = [], []
    for s in strides:
        hs, ws = img_size[0] // s, img_size[1] // s
        xv, yv = np.meshgrid(np.arange(ws), np.arange(hs))
        grids.append(np.stack((xv, yv), 2).reshape(-1, 2))
        exp_strides.append(np.full((hs * ws, 1), s))
    grids = np.concatenate(grids, 0)
    exp_strides = np.concatenate(exp_strides, 0)
    pred = np.array(raw, np.float32)
    pred[:, :2] = (pred[:, :2] + grids) * exp_strides
    pred[:, 2:4] = np.exp(pred[:, 2:4]) * exp_strides

    boxes = pred[:, :4]
    scores = pred[:, 4:5] * pred[:, 5:]
    xyxy = np.stack([boxes[:, 0] - boxes[:, 2] / 2,
                     boxes[:, 1] - boxes[:, 3] / 2,
                     boxes[:, 0] + boxes[:, 2] / 2,
                     boxes[:, 1] + boxes[:, 3] / 2], axis=1) / ratio
    # person class only (cls 0)
    cls_scores = scores[:, 0]
    valid = cls_scores > score_thr
    if not valid.any():
        return np.zeros((0, 4), np.float32)
    vb, vs = xyxy[valid], cls_scores[valid]
    keep = _nms(vb, vs, nms_thr)
    vb, vs = vb[keep], vs[keep]
    return vb[vs > final_thr]


# ---------------------------------------------------------------------------
# RTMPose top-down affine + SimCC decode (onnxpose.py)
# ---------------------------------------------------------------------------

def bbox_xyxy2cs(bbox, padding=1.25):
    x1, y1, x2, y2 = bbox[:4]
    center = np.array([(x1 + x2) / 2, (y1 + y2) / 2], np.float32)
    scale = np.array([x2 - x1, y2 - y1], np.float32) * padding
    return center, scale


def _fix_aspect(scale, aspect):
    w, h = scale
    if w > h * aspect:
        return np.array([w, w / aspect], np.float32)
    return np.array([h * aspect, h], np.float32)


def _warp_matrix(center, scale, output_size):
    """get_warp_matrix (rot 0, onnxpose.py:203-255)."""
    import cv2
    src_w = scale[0]
    dst_w, dst_h = output_size
    src_dir = np.array([0, src_w * -0.5], np.float32)
    dst_dir = np.array([0, dst_w * -0.5], np.float32)
    src = np.zeros((3, 2), np.float32)
    src[0] = center
    src[1] = center + src_dir
    d = src[0] - src[1]
    src[2] = src[1] + np.array([-d[1], d[0]], np.float32)
    dst = np.zeros((3, 2), np.float32)
    dst[0] = [dst_w * 0.5, dst_h * 0.5]
    dst[1] = dst[0] + dst_dir
    d = dst[0] - dst[1]
    dst[2] = dst[1] + np.array([-d[1], d[0]], np.float32)
    return cv2.getAffineTransform(src, dst)


def pose_preprocess(img, bboxes, input_size=(288, 384)):
    """Affine-crop each box to the model input + imagenet-ish norm
    (onnxpose.py:9-52).  Returns (crops [K, H, W, 3], centers, scales)."""
    import cv2
    if len(bboxes) == 0:
        bboxes = [[0, 0, img.shape[1], img.shape[0]]]
    crops, centers, scales = [], [], []
    for bb in bboxes:
        center, scale = bbox_xyxy2cs(np.asarray(bb, np.float32))
        scale = _fix_aspect(scale, input_size[0] / input_size[1])
        m = _warp_matrix(center, scale, input_size)
        crop = cv2.warpAffine(img, m, input_size, flags=cv2.INTER_LINEAR)
        mean = np.array([123.675, 116.28, 103.53])
        std = np.array([58.395, 57.12, 57.375])
        crops.append((crop - mean) / std)
        centers.append(center)
        scales.append(scale)
    return (np.stack(crops).astype(np.float32), np.stack(centers),
            np.stack(scales))


def simcc_decode(simcc_x, simcc_y, split_ratio=2.0):
    """[K, J, Wx], [K, J, Wy] -> keypoints [K, J, 2], scores [K, J]
    (onnxpose.py get_simcc_maximum:290 + decode:335)."""
    x_loc = simcc_x.argmax(axis=-1)
    y_loc = simcc_y.argmax(axis=-1)
    x_val = simcc_x.max(axis=-1)
    y_val = simcc_y.max(axis=-1)
    scores = np.minimum(x_val, y_val)
    kpts = np.stack([x_loc, y_loc], axis=-1).astype(np.float32)
    kpts[scores <= 0] = -1
    return kpts / split_ratio, scores


def pose_postprocess(simcc_x, simcc_y, input_size, centers, scales):
    kpts, scores = simcc_decode(simcc_x, simcc_y)
    out = (kpts / np.asarray(input_size, np.float32)
           * scales[:, None] + centers[:, None] - scales[:, None] / 2)
    return out, scores


def mmpose_to_openpose(keypoints, scores):
    """COCO-wholebody (133) -> openpose layout with synthetic neck
    (wholebody.py:55-77)."""
    info = np.concatenate([keypoints, scores[..., None]], axis=-1)
    neck = info[:, [5, 6]].mean(axis=1)
    neck[:, 2] = np.logical_and(info[:, 5, 2] > 0.3,
                                info[:, 6, 2] > 0.3).astype(np.float32)
    info = np.insert(info, 17, neck, axis=1)
    mmpose_idx = [17, 6, 8, 10, 7, 9, 12, 14, 16, 13, 15, 2, 1, 4, 3]
    openpose_idx = [1, 2, 3, 4, 6, 7, 8, 9, 10, 12, 13, 14, 15, 16, 17]
    new = info.copy()
    new[:, openpose_idx] = info[:, mmpose_idx]
    return new[..., :2], new[..., 2]


# ---------------------------------------------------------------------------
# rendering (util.py draw_bodypose / draw_handpose / draw_facepose)
# ---------------------------------------------------------------------------

def draw_pose(keypoints, scores, h, w, use_hand=True, use_face=True,
              kpt_thr=0.3):
    """keypoints: [K, 134, 2] openpose-remapped, pixel coords; renders the
    control canvas [h, w, 3] uint8."""
    import cv2
    canvas = np.zeros((h, w, 3), np.uint8)
    stickwidth = 4
    for person, score in zip(keypoints, scores):
        # body limbs (joints 0..17, util.py:70-111; 1-based LIMB_SEQ)
        for (a, b), color in zip(LIMB_SEQ, COLORS[:len(LIMB_SEQ)]):
            ia, ib = a - 1, b - 1
            if score[ia] < kpt_thr or score[ib] < kpt_thr:
                continue
            y = person[[ia, ib], 0]
            x = person[[ia, ib], 1]
            mx, my = x.mean(), y.mean()
            length = math.hypot(x[0] - x[1], y[0] - y[1])
            angle = math.degrees(math.atan2(x[0] - x[1], y[0] - y[1]))
            poly = cv2.ellipse2Poly((int(my), int(mx)),
                                    (int(length / 2), stickwidth),
                                    int(angle), 0, 360, 1)
            cv2.fillConvexPoly(canvas, poly, color)
        canvas = (canvas * 0.6).astype(np.uint8)
        for j in range(18):
            if score[j] < kpt_thr:
                continue
            cv2.circle(canvas, (int(person[j, 0]), int(person[j, 1])), 4,
                       COLORS[j % len(COLORS)], thickness=-1)
        if use_face:
            for j in range(24, 92):            # 68 face landmarks
                if j < person.shape[0] and score[j] > kpt_thr:
                    cv2.circle(canvas,
                               (int(person[j, 0]), int(person[j, 1])), 3,
                               (255, 255, 255), thickness=-1)
        if use_hand:
            # hands: 21 points each (92..112, 113..133), edges per util.py
            edges = [[0, 1], [1, 2], [2, 3], [3, 4], [0, 5], [5, 6],
                     [6, 7], [7, 8], [0, 9], [9, 10], [10, 11], [11, 12],
                     [0, 13], [13, 14], [14, 15], [15, 16], [0, 17],
                     [17, 18], [18, 19], [19, 20]]
            for start in (92, 113):
                if person.shape[0] < start + 21:
                    continue
                pts = person[start:start + 21]
                sc = score[start:start + 21]
                for ie, (a, b) in enumerate(edges):
                    if sc[a] < kpt_thr or sc[b] < kpt_thr:
                        continue
                    hue = ie / len(edges)
                    rgb = tuple(int(255 * v) for v in _hsv(hue))
                    cv2.line(canvas,
                             (int(pts[a, 0]), int(pts[a, 1])),
                             (int(pts[b, 0]), int(pts[b, 1])), rgb, 2)
                for a in range(21):
                    if sc[a] > kpt_thr:
                        cv2.circle(canvas,
                                   (int(pts[a, 0]), int(pts[a, 1])), 4,
                                   (0, 0, 255), thickness=-1)
    return canvas


def _hsv(h):
    i = int(h * 6) % 6
    f = h * 6 - int(h * 6)
    q, t = 1 - f, f
    return [(1, t, 0), (q, 1, 0), (0, 1, t),
            (0, q, 1), (t, 0, 1), (1, 0, q)][i]


# ---------------------------------------------------------------------------
# full pipeline over the ONNX models
# ---------------------------------------------------------------------------

class DWPose:
    """Det + pose over the reference .onnx checkpoints executed with the
    in-repo ONNX runner (wholebody.py Wholebody equivalent)."""

    def __init__(self, det_path: str, pose_path: str,
                 pose_input=(288, 384)):
        from ..io.onnx_reader import load_onnx
        self.det_graph = load_onnx(det_path)
        self.pose_graph = load_onnx(pose_path)
        self.pose_input = pose_input

    def _detect(self, img):
        import cv2
        r = min(640 / img.shape[0], 640 / img.shape[1])
        padded = np.full((640, 640, 3), 114, np.uint8)
        rs = cv2.resize(img, (int(img.shape[1] * r), int(img.shape[0] * r)))
        padded[:rs.shape[0], :rs.shape[1]] = rs
        from ..io.onnx_reader import run_graph
        inp = padded.transpose(2, 0, 1)[None].astype(np.float32)
        (raw,) = run_graph(self.det_graph,
                           {self.det_graph.inputs[0]: inp})
        return yolox_postprocess(np.asarray(raw)[0], ratio=r)

    def __call__(self, img: np.ndarray):
        from ..io.onnx_reader import run_graph
        boxes = self._detect(img)
        crops, centers, scales = pose_preprocess(img, boxes,
                                                 self.pose_input)
        sx, sy = [], []
        for crop in crops:
            inp = crop.transpose(2, 0, 1)[None]
            out = run_graph(self.pose_graph,
                            {self.pose_graph.inputs[0]: inp})
            sx.append(np.asarray(out[0])[0])
            sy.append(np.asarray(out[1])[0])
        kpts, scores = pose_postprocess(np.stack(sx), np.stack(sy),
                                        self.pose_input, centers, scales)
        return mmpose_to_openpose(kpts, scores)


def make_pose_preprocessor(det_path: str, pose_path: str):
    """Registers the 'pose' control preprocessor (wgp.py:5198
    get_preprocessor 'pose' mode)."""
    from .filters import PREPROCESSORS
    model = DWPose(det_path, pose_path)

    def pose_fn(frame):
        kpts, scores = model(frame)
        return draw_pose(kpts, scores, frame.shape[0], frame.shape[1])

    PREPROCESSORS["pose"] = pose_fn
    return pose_fn
