"""ONNX reader/executor tests: protobuf wire-format roundtrip through a
hand-encoded ModelProto, op parity against torch."""
import struct

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from wan2gp_tpu.io.onnx_reader import parse_onnx, run_graph


# --- minimal protobuf writer (test-side) -----------------------------------

def _vint(v):
    out = b""
    while True:
        b7 = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b7 | 0x80])
        else:
            out += bytes([b7])
            return out


def _tag(field, wt):
    return _vint((field << 3) | wt)


def _bytes_field(field, data):
    return _tag(field, 2) + _vint(len(data)) + data


def _str(field, s):
    return _bytes_field(field, s.encode())


def _int_field(field, v):
    return _tag(field, 0) + _vint(v & ((1 << 64) - 1))


def tensor_proto(name, arr):
    arr = np.asarray(arr)
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.int32): 6}[arr.dtype]
    msg = b""
    for d in arr.shape:
        msg += _int_field(1, d)
    msg += _int_field(2, dt)
    msg += _str(8, name)
    msg += _bytes_field(9, arr.tobytes())
    return msg


def attr_int(name, v):
    return _str(1, name) + _int_field(3, v) + _int_field(20, 2)


def attr_ints(name, vals):
    msg = _str(1, name)
    for v in vals:
        msg += _int_field(7, v)
    return msg + _int_field(20, 7)


def attr_float(name, v):
    return _str(1, name) + _tag(2, 5) + struct.pack("<f", v) \
        + _int_field(20, 1)


def attr_str(name, s):
    return _str(1, name) + _str(4, s) + _int_field(20, 3)


def node(op, inputs, outputs, attrs=()):
    msg = b""
    for i in inputs:
        msg += _str(1, i)
    for o in outputs:
        msg += _str(2, o)
    msg += _str(4, op)
    for a in attrs:
        msg += _bytes_field(5, a)
    return msg


def value_info(name):
    return _str(1, name)


def model(nodes, initializers, inputs, outputs):
    g = b""
    for n in nodes:
        g += _bytes_field(1, n)
    for t in initializers:
        g += _bytes_field(5, t)
    for i in inputs:
        g += _bytes_field(11, value_info(i))
    for o in outputs:
        g += _bytes_field(12, value_info(o))
    return _bytes_field(7, g)


def test_small_convnet_matches_torch():
    """conv(s2, pad1) -> relu -> maxpool -> global-avg -> gemm, hand-encoded
    protobuf, executed by the JAX graph runner vs torch."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
    w = (rng.standard_normal((8, 3, 3, 3)) * 0.2).astype(np.float32)
    b = rng.standard_normal(8).astype(np.float32)
    fc_w = (rng.standard_normal((5, 8)) * 0.2).astype(np.float32)
    fc_b = rng.standard_normal(5).astype(np.float32)

    nodes = [
        node("Conv", ["x", "w", "b"], ["c1"],
             [attr_ints("strides", [2, 2]), attr_ints("pads", [1, 1, 1, 1]),
              attr_ints("kernel_shape", [3, 3])]),
        node("Relu", ["c1"], ["r1"]),
        node("MaxPool", ["r1"], ["p1"],
             [attr_ints("kernel_shape", [2, 2]),
              attr_ints("strides", [2, 2])]),
        node("GlobalAveragePool", ["p1"], ["g1"]),
        node("Flatten", ["g1"], ["f1"], [attr_int("axis", 1)]),
        node("Gemm", ["f1", "fc_w", "fc_b"], ["y"],
             [attr_int("transB", 1)]),
        node("Softmax", ["y"], ["out"], [attr_int("axis", 1)]),
    ]
    inits = [tensor_proto("w", w), tensor_proto("b", b),
             tensor_proto("fc_w", fc_w), tensor_proto("fc_b", fc_b)]
    data = model(nodes, inits, ["x"], ["out"])

    g = parse_onnx(data)
    assert [n.op for n in g.nodes][0] == "Conv"
    assert set(g.initializers) == {"w", "b", "fc_w", "fc_b"}
    assert g.inputs == ["x"] and g.outputs == ["out"]
    (got,) = run_graph(g, {"x": x})

    with torch.no_grad():
        t = F.conv2d(torch.tensor(x), torch.tensor(w), torch.tensor(b),
                     stride=2, padding=1)
        t = F.relu(t)
        t = F.max_pool2d(t, 2, 2)
        t = t.mean(dim=(2, 3))
        t = t @ torch.tensor(fc_w).T + torch.tensor(fc_b)
        ref = torch.softmax(t, dim=1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_shape_ops_and_resize():
    """Shape/Gather/Concat-driven Reshape + nearest Resize stay static."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 6, 6)).astype(np.float32)
    nodes = [
        node("Resize", ["x", "", "scales"], ["up"],
             [attr_str("mode", "nearest")]),
        node("Shape", ["up"], ["shp"]),
        node("Gather", ["shp", "zero"], ["bdim"], [attr_int("axis", 0)]),
        node("Reshape", ["up", "newshape"], ["flat"]),
        node("ReduceMean", ["flat"], ["out"],
             [attr_ints("axes", [1]), attr_int("keepdims", 0)]),
    ]
    inits = [tensor_proto("scales", np.asarray([1, 1, 2, 2], np.float32)),
             tensor_proto("zero", np.asarray([0], np.int64)),
             tensor_proto("newshape", np.asarray([1, -1], np.int64))]
    data = model(nodes, inits, ["x"], ["out"])
    g = parse_onnx(data)
    (got,) = run_graph(g, {"x": x})
    up = np.repeat(np.repeat(x, 2, axis=2), 2, axis=3)
    np.testing.assert_allclose(np.asarray(got), up.reshape(1, -1).mean(1),
                               rtol=1e-5)


def test_split_slice_transpose_sigmoid():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 6, 4)).astype(np.float32)
    nodes = [
        node("Split", ["x"], ["a", "bb"],
             [attr_int("axis", 1), attr_ints("split", [2, 4])]),
        node("Sigmoid", ["a"], ["sa"]),
        node("Transpose", ["bb"], ["tb"], [attr_ints("perm", [0, 2, 1])]),
        node("Slice", ["tb", "st", "en", "ax"], ["sl"]),
        node("MatMul", ["sa", "sl"], ["out"]),
    ]
    inits = [tensor_proto("st", np.asarray([0], np.int64)),
             tensor_proto("en", np.asarray([2], np.int64)),
             tensor_proto("ax", np.asarray([2], np.int64))]
    data = model(nodes, inits, ["x"], ["out"])
    g = parse_onnx(data)
    (got,) = run_graph(g, {"x": x})
    a, b = x[:, :2], x[:, 2:]
    ref = (1 / (1 + np.exp(-a))) @ b.transpose(0, 2, 1)[:, :, :2]
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_negative_attr_ints():
    """Negative ints (e.g. axes=-1) survive the two's-complement varint."""
    x = np.asarray([[1.0, 2.0], [3.0, 4.0]], np.float32)
    nodes = [node("Softmax", ["x"], ["out"], [attr_int("axis", -1)])]
    data = model(nodes, [], ["x"], ["out"])
    g = parse_onnx(data)
    assert g.nodes[0].attrs["axis"] == -1
    (got,) = run_graph(g, {"x": x})
    ref = torch.softmax(torch.tensor(x), dim=-1).numpy()
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)
