"""DWPose tests: YOLOX decode/NMS, SimCC decode, affine crop geometry,
openpose remap, rendering — against inline re-derivations of the reference
numpy logic (preprocessing/dwpose/)."""
import numpy as np

from wan2gp_tpu.preprocessing.dwpose import (
    yolox_postprocess, _nms, simcc_decode, pose_preprocess,
    pose_postprocess, mmpose_to_openpose, draw_pose, bbox_xyxy2cs)


def test_nms_matches_reference():
    rng = np.random.default_rng(0)
    boxes = np.abs(rng.uniform(0, 100, (20, 4)))
    boxes[:, 2:] = boxes[:, :2] + np.abs(rng.uniform(5, 50, (20, 2)))
    scores = rng.uniform(0, 1, 20)
    keep = _nms(boxes, scores, 0.45)
    # reference nms (onnxdet.py:8-35)
    x1, y1, x2, y2 = boxes.T
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = scores.argsort()[::-1]
    ref = []
    while order.size > 0:
        i = order[0]
        ref.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inds = np.where(
            w * h / (areas[i] + areas[order[1:]] - w * h) <= 0.45)[0]
        order = order[inds + 1]
    assert keep == ref


def test_yolox_postprocess_grid_decode():
    """The grid/stride decode must invert the YOLOX encoding."""
    n = sum((640 // s) ** 2 for s in (8, 16, 32))
    raw = np.zeros((n, 6), np.float32)
    # one confident person at grid cell (2, 3) of the stride-8 level:
    idx = 3 * 80 + 2
    raw[idx, :2] = 0.5                 # offset within cell
    raw[idx, 2:4] = np.log([4.0, 6.0])  # wh = (32, 48) px
    raw[idx, 4] = 0.99
    raw[idx, 5] = 0.99
    boxes = yolox_postprocess(raw.copy(), ratio=1.0)
    assert boxes.shape == (1, 4)
    cx, cy = (2 + 0.5) * 8, (3 + 0.5) * 8
    np.testing.assert_allclose(
        boxes[0], [cx - 16, cy - 24, cx + 16, cy + 24], atol=1e-3)


def test_simcc_decode():
    k, j, wx, wy = 2, 5, 40, 30
    rng = np.random.default_rng(1)
    sx = rng.uniform(0, 1, (k, j, wx)).astype(np.float32)
    sy = rng.uniform(0, 1, (k, j, wy)).astype(np.float32)
    kpts, scores = simcc_decode(sx, sy)
    np.testing.assert_array_equal(kpts[..., 0] * 2, sx.argmax(-1))
    np.testing.assert_array_equal(kpts[..., 1] * 2, sy.argmax(-1))
    np.testing.assert_allclose(
        scores, np.minimum(sx.max(-1), sy.max(-1)))


def test_affine_crop_roundtrip():
    """A keypoint at the bbox center must decode back to the bbox center
    after the SimCC rescale (onnxpose.py postprocess:82-115)."""
    img = np.zeros((100, 120, 3), np.uint8)
    bbox = [20, 30, 80, 90]
    crops, centers, scales = pose_preprocess(img, [bbox],
                                             input_size=(32, 64))
    assert crops.shape == (1, 64, 32, 3)
    # a simcc response peaked at the crop center
    sx = np.zeros((1, 1, 32 * 2), np.float32)
    sy = np.zeros((1, 1, 64 * 2), np.float32)
    sx[0, 0, 32] = 1.0
    sy[0, 0, 64] = 1.0
    kpts, _ = pose_postprocess(sx, sy, (32, 64), centers, scales)
    np.testing.assert_allclose(kpts[0, 0], [(20 + 80) / 2, (30 + 90) / 2],
                               atol=1.0)


def test_mmpose_to_openpose_neck():
    k = np.zeros((1, 133, 2), np.float32)
    s = np.zeros((1, 133), np.float32)
    k[0, 5] = [10, 20]      # left shoulder
    k[0, 6] = [30, 40]      # right shoulder
    s[0, 5] = s[0, 6] = 0.9
    kk, ss = mmpose_to_openpose(k, s)
    assert kk.shape == (1, 134, 2)
    np.testing.assert_allclose(kk[0, 1], [20, 30])   # neck = mean
    assert ss[0, 1] == 1.0


def test_draw_pose_renders():
    rng = np.random.default_rng(2)
    kpts = rng.uniform(10, 50, (1, 134, 2)).astype(np.float32)
    scores = np.ones((1, 134), np.float32)
    canvas = draw_pose(kpts, scores, 64, 64)
    assert canvas.shape == (64, 64, 3)
    assert canvas.max() > 0


def test_dwpose_end_to_end_with_synthetic_onnx(tmp_path):
    """Full DWPose over tiny hand-encoded ONNX graphs: the det graph emits
    one confident box via a bias-only conv path; the pose graph emits
    fixed SimCC logits.  Exercises parse -> run -> decode -> draw."""
    import sys
    sys.path.insert(0, "tests")
    from test_onnx_reader import (model, node, tensor_proto, attr_ints,
                                  attr_int)
    from wan2gp_tpu.preprocessing.dwpose import DWPose

    n = sum((640 // s) ** 2 for s in (8, 16, 32))
    det_out = np.zeros((1, n, 6), np.float32)
    det_out[0, 42, :2] = 0.0
    det_out[0, 42, 2:4] = np.log([8.0, 8.0])
    det_out[0, 42, 4:6] = 5.0        # pre-sigmoid-ish constant (already probs)
    # det graph: ReduceMean(input) * 0 -> broadcast add constant output
    det_nodes = [
        node("ReduceMean", ["images"], ["m"],
             [attr_ints("axes", [1, 2, 3]), attr_int("keepdims", 0)]),
        node("Mul", ["m", "zero"], ["z"]),
        node("Add", ["z", "const_out"], ["out_flat"]),
        node("Reshape", ["out_flat", "shape"], ["output"]),
    ]
    det_inits = [
        tensor_proto("zero", np.zeros((1,), np.float32)),
        tensor_proto("const_out", det_out.reshape(1, -1)),
        tensor_proto("shape", np.asarray([1, n, 6], np.int64)),
    ]
    det_path = str(tmp_path / "det.onnx")
    open(det_path, "wb").write(model(det_nodes, det_inits, ["images"],
                                     ["output"]))

    j, wx, wy = 133, 288 * 2, 384 * 2
    sx = np.zeros((1, j, wx), np.float32)
    sy = np.zeros((1, j, wy), np.float32)
    sx[0, :, wx // 2] = 1.0
    sy[0, :, wy // 2] = 1.0
    pose_nodes = [
        node("ReduceMean", ["input"], ["m"],
             [attr_ints("axes", [1, 2, 3]), attr_int("keepdims", 0)]),
        node("Mul", ["m", "zero"], ["z"]),
        node("Add", ["z", "cx"], ["fx"]),
        node("Add", ["z", "cy"], ["fy"]),
        node("Reshape", ["fx", "shx"], ["simcc_x"]),
        node("Reshape", ["fy", "shy"], ["simcc_y"]),
    ]
    pose_inits = [
        tensor_proto("zero", np.zeros((1,), np.float32)),
        tensor_proto("cx", sx.reshape(1, -1)),
        tensor_proto("cy", sy.reshape(1, -1)),
        tensor_proto("shx", np.asarray([1, j, wx], np.int64)),
        tensor_proto("shy", np.asarray([1, j, wy], np.int64)),
    ]
    pose_path = str(tmp_path / "pose.onnx")
    open(pose_path, "wb").write(model(pose_nodes, pose_inits, ["input"],
                                      ["simcc_x", "simcc_y"]))

    dw = DWPose(det_path, pose_path)
    img = np.random.default_rng(0).integers(0, 255, (80, 96, 3),
                                            dtype=np.uint8)
    kpts, scores = dw(img)
    assert kpts.shape[1] == 134
    assert np.isfinite(kpts).all()
    canvas = draw_pose(kpts, scores, 80, 96)
    assert canvas.shape == (80, 96, 3)
