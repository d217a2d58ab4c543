"""Minimal ONNX reader + JAX executor.

The reference ships DWPose as ONNX models executed with onnxruntime
(/root/reference/preprocessing/dwpose/onnxdet.py, onnxpose.py).  This
environment has neither onnx nor onnxruntime, so this module parses the
ONNX protobuf wire format directly (the same from-bytes approach as
io/gguf_reader.py for GGUF) and executes the graph with jax.numpy ops —
the graph trace jit-compiles onto the TPU.

Supported: the op set used by RTMDet/RTMPose-class convnets (Conv,
ConvTranspose, Gemm, MatMul, Relu, Sigmoid, HardSigmoid, Mul, Add, Sub,
Div, Pow, Sqrt, Exp, Tanh, Erf, Softmax, Concat, Split, Slice, Transpose,
Reshape, Flatten, MaxPool, AveragePool, GlobalAveragePool, Resize
(nearest/linear), ReduceMean/Sum/Max, Clip, Constant, Shape/Gather/
Unsqueeze/Squeeze/Cast/ConstantOfShape (host-evaluated), BatchNormalization,
LayerNormalization, Gelu, LeakyRelu, Pad, Expand, Where, Identity).

Layout: ONNX is NCHW; the executor keeps NCHW semantics with jnp (lax conv
handles NCHW natively), so node-for-node parity with onnxruntime holds.
"""
from __future__ import annotations

import math
import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# protobuf wire-format primitives
# ---------------------------------------------------------------------------

def _varint(buf: memoryview, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:                     # varint
            val, pos = _varint(buf, pos)
        elif wt == 1:                   # 64-bit
            val = bytes(buf[pos:pos + 8])
            pos += 8
        elif wt == 2:                   # length-delimited
            ln, pos = _varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:                   # 32-bit
            val = bytes(buf[pos:pos + 4])
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


_DTYPES = {1: np.float32, 2: np.uint8, 3: np.int8, 4: np.uint16,
           5: np.int16, 6: np.int32, 7: np.int64, 9: np.bool_,
           10: np.float16, 11: np.float64, 12: np.uint32, 13: np.uint64}


def _parse_tensor(buf: memoryview) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = 1
    name = ""
    raw = None
    f32: List[float] = []
    i64: List[int] = []
    i32: List[int] = []
    for field, wt, val in _fields(buf):
        if field == 1:
            dims.append(val)
        elif field == 2:
            dtype = val
        elif field == 8:
            name = bytes(val).decode()
        elif field == 9:
            raw = bytes(val)
        elif field == 4:
            if wt == 2:   # packed
                f32 += list(np.frombuffer(bytes(val), np.float32))
            else:
                f32.append(struct.unpack("<f", val)[0])
        elif field == 7:
            if wt == 2:
                arr, p = [], 0
                mv = memoryview(val)
                while p < len(mv):
                    v, p = _varint(mv, p)
                    arr.append(v)
                i64 += arr
            else:
                i64.append(val)
        elif field == 5:
            if wt == 2:
                arr, p = [], 0
                mv = memoryview(val)
                while p < len(mv):
                    v, p = _varint(mv, p)
                    arr.append(v)
                i32 += arr
            else:
                i32.append(val)
    np_dtype = _DTYPES.get(dtype, np.float32)
    if raw is not None:
        arr = np.frombuffer(raw, np_dtype)
    elif f32:
        arr = np.asarray(f32, np.float32)
    elif i64:
        arr = np.asarray(i64, np.int64)
    elif i32:
        arr = np.asarray(i32, np.int32)
    else:
        arr = np.zeros(0, np_dtype)
    # int64 stored as two's complement varints
    if np_dtype == np.int64 and not isinstance(arr, np.ndarray):
        arr = np.asarray(arr, np.int64)
    if np_dtype == np.int64:
        arr = arr.astype(np.int64)
    return name, arr.reshape(dims) if dims else arr


def _parse_attr(buf: memoryview) -> Tuple[str, Any]:
    name = ""
    out: Any = None
    floats: List[float] = []
    ints: List[int] = []
    for field, wt, val in _fields(buf):
        if field == 1:
            name = bytes(val).decode()
        elif field == 2:
            out = struct.unpack("<f", val)[0]
        elif field == 3:
            # two's-complement for negatives
            out = val - (1 << 64) if val >= (1 << 63) else val
        elif field == 4:
            out = bytes(val).decode(errors="replace")
        elif field == 5:
            out = _parse_tensor(val)[1]
        elif field == 6:
            floats.append(struct.unpack("<f", val)[0] if wt == 5
                          else float(val))
        elif field == 7:
            if wt == 2:
                p = 0
                mv = memoryview(val)
                while p < len(mv):
                    v, p = _varint(mv, p)
                    ints.append(v - (1 << 64) if v >= (1 << 63) else v)
            else:
                ints.append(val - (1 << 64) if val >= (1 << 63) else val)
    if floats:
        out = floats
    if ints:
        out = ints
    return name, out


class OnnxNode:
    __slots__ = ("op", "name", "inputs", "outputs", "attrs")

    def __init__(self):
        self.op = ""
        self.name = ""
        self.inputs: List[str] = []
        self.outputs: List[str] = []
        self.attrs: Dict[str, Any] = {}


class OnnxGraph:
    def __init__(self):
        self.nodes: List[OnnxNode] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.inputs: List[str] = []
        self.outputs: List[str] = []


def _parse_node(buf: memoryview) -> OnnxNode:
    n = OnnxNode()
    for field, wt, val in _fields(buf):
        if field == 1:
            n.inputs.append(bytes(val).decode())
        elif field == 2:
            n.outputs.append(bytes(val).decode())
        elif field == 3:
            n.name = bytes(val).decode()
        elif field == 4:
            n.op = bytes(val).decode()
        elif field == 5:
            k, v = _parse_attr(val)
            n.attrs[k] = v
    return n


def _value_info_name(buf: memoryview) -> str:
    for field, wt, val in _fields(buf):
        if field == 1:
            return bytes(val).decode()
    return ""


def parse_onnx(data: bytes) -> OnnxGraph:
    """Parse an ONNX ModelProto's graph (field 7)."""
    g = OnnxGraph()
    graph_buf = None
    for field, wt, val in _fields(memoryview(data)):
        if field == 7:
            graph_buf = val
    if graph_buf is None:
        raise ValueError("no graph in ONNX model")
    for field, wt, val in _fields(graph_buf):
        if field == 1:
            g.nodes.append(_parse_node(val))
        elif field == 5:
            name, arr = _parse_tensor(val)
            g.initializers[name] = arr
        elif field == 11:
            g.inputs.append(_value_info_name(val))
        elif field == 12:
            g.outputs.append(_value_info_name(val))
    g.inputs = [i for i in g.inputs if i not in g.initializers]
    return g


# ---------------------------------------------------------------------------
# executor
# ---------------------------------------------------------------------------

def _pads4(attrs, default=0):
    p = attrs.get("pads")
    if p is None:
        return [(default, default), (default, default)]
    half = len(p) // 2
    return [(p[i], p[i + half]) for i in range(half)]


def _conv(x, w, b, attrs):
    strides = tuple(attrs.get("strides", [1] * (w.ndim - 2)))
    dil = tuple(attrs.get("dilations", [1] * (w.ndim - 2)))
    groups = int(attrs.get("group", 1))
    if attrs.get("auto_pad", "NOTSET") in ("SAME_UPPER", "SAME_LOWER"):
        pads = "SAME"
    else:
        pads = _pads4(attrs)
    nd = w.ndim - 2
    dn = ("NCHW", "OIHW", "NCHW") if nd == 2 else ("NCW", "OIW", "NCW")
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), strides, pads, rhs_dilation=dil,
        dimension_numbers=dn, feature_group_count=groups)
    if b is not None:
        y = y + b.reshape((1, -1) + (1,) * nd).astype(y.dtype)
    return y


def _pool(x, attrs, kind):
    ks = tuple(attrs.get("kernel_shape"))
    strides = tuple(attrs.get("strides", ks))
    pads = _pads4(attrs)
    window = (1, 1) + ks
    strides4 = (1, 1) + strides
    pads4 = [(0, 0), (0, 0)] + pads
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, window,
                                     strides4, pads4)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, strides4, pads4)
    if int(attrs.get("count_include_pad", 0)):
        return s / math.prod(ks)
    ones = jnp.ones_like(x)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, strides4,
                                pads4)
    return s / cnt


def _resize(x, sizes, scales, attrs):
    mode = attrs.get("mode", "nearest")
    b, c, h, w = x.shape
    if sizes is not None:
        oh, ow = int(sizes[-2]), int(sizes[-1])
    else:
        oh, ow = int(round(h * scales[-2])), int(round(w * scales[-1]))
    if mode == "nearest":
        ih = (jnp.arange(oh) * (h / oh)).astype(jnp.int32)
        iw = (jnp.arange(ow) * (w / ow)).astype(jnp.int32)
        return x[:, :, ih][:, :, :, iw]
    # linear, half_pixel
    def axis_idx(o, i):
        pos = (jnp.arange(o) + 0.5) * (i / o) - 0.5
        pos = jnp.clip(pos, 0, i - 1)
        lo = jnp.floor(pos).astype(jnp.int32)
        hi = jnp.minimum(lo + 1, i - 1)
        return lo, hi, (pos - lo)
    lo_h, hi_h, fh = axis_idx(oh, h)
    lo_w, hi_w, fw = axis_idx(ow, w)
    top = x[:, :, lo_h]
    bot = x[:, :, hi_h]
    y = top * (1 - fh)[None, None, :, None] + bot * fh[None, None, :, None]
    left = y[:, :, :, lo_w]
    right = y[:, :, :, hi_w]
    return left * (1 - fw) + right * fw


def run_graph(graph: OnnxGraph, feeds: Dict[str, Any],
              outputs: Optional[List[str]] = None) -> List[jnp.ndarray]:
    """Execute the graph.  feeds: {input_name: array}.  Host-side shape
    ops (Shape/Gather/... on small int tensors) are evaluated eagerly in
    numpy so Reshape/Resize stay static under jit."""
    env: Dict[str, Any] = {}
    env.update({k: jnp.asarray(v) if v.dtype != np.int64 else v
                for k, v in graph.initializers.items()})
    for k, v in feeds.items():
        env[k] = jnp.asarray(v)

    def host(v):
        return np.asarray(v)

    for node in graph.nodes:
        op = node.op
        iv = [env.get(i) if i else None for i in node.inputs]
        a = node.attrs
        if op == "Conv":
            out = _conv(iv[0], jnp.asarray(iv[1]),
                        None if len(iv) < 3 else jnp.asarray(iv[2]), a)
        elif op == "Relu":
            out = jax.nn.relu(iv[0])
        elif op == "LeakyRelu":
            out = jax.nn.leaky_relu(iv[0], a.get("alpha", 0.01))
        elif op == "Sigmoid":
            out = jax.nn.sigmoid(iv[0])
        elif op == "HardSigmoid":
            out = jnp.clip(a.get("alpha", 0.2) * iv[0]
                           + a.get("beta", 0.5), 0, 1)
        elif op == "Tanh":
            out = jnp.tanh(iv[0])
        elif op == "Erf":
            out = jax.lax.erf(iv[0].astype(jnp.float32))
        elif op == "Gelu":
            out = jax.nn.gelu(iv[0], approximate=False)
        elif op in ("Add", "Sub", "Mul", "Div", "Pow"):
            f = {"Add": jnp.add, "Sub": jnp.subtract, "Mul": jnp.multiply,
                 "Div": jnp.divide, "Pow": jnp.power}[op]
            x0 = iv[0] if not isinstance(iv[0], np.ndarray) else \
                jnp.asarray(iv[0])
            x1 = iv[1] if not isinstance(iv[1], np.ndarray) else \
                jnp.asarray(iv[1])
            out = f(x0, x1)
        elif op == "Sqrt":
            out = jnp.sqrt(iv[0])
        elif op == "Exp":
            out = jnp.exp(iv[0])
        elif op == "MatMul":
            out = jnp.matmul(iv[0], jnp.asarray(iv[1]))
        elif op == "Gemm":
            x, w = iv[0], jnp.asarray(iv[1])
            if a.get("transA", 0):
                x = x.T
            if a.get("transB", 0):
                w = w.T
            out = a.get("alpha", 1.0) * jnp.matmul(x, w)
            if len(iv) > 2 and iv[2] is not None:
                out = out + a.get("beta", 1.0) * jnp.asarray(iv[2])
        elif op == "Softmax":
            out = jax.nn.softmax(iv[0], axis=a.get("axis", -1))
        elif op == "Concat":
            out = jnp.concatenate([jnp.asarray(v) for v in iv],
                                  axis=a["axis"])
        elif op == "Split":
            axis = a.get("axis", 0)
            if len(iv) > 1 and iv[1] is not None:
                sizes = host(iv[1]).tolist()
            else:
                sizes = a.get("split")
            if sizes:
                idx = np.cumsum(sizes)[:-1].tolist()
                parts = jnp.split(iv[0], idx, axis=axis)
            else:
                parts = jnp.split(iv[0], len(node.outputs), axis=axis)
            for name, p in zip(node.outputs, parts):
                env[name] = p
            continue
        elif op == "Slice":
            data = iv[0]
            starts = host(iv[1]).tolist() if len(iv) > 1 else a["starts"]
            ends = host(iv[2]).tolist() if len(iv) > 2 else a["ends"]
            axes = (host(iv[3]).tolist() if len(iv) > 3 and iv[3] is not None
                    else a.get("axes", list(range(len(starts)))))
            steps = (host(iv[4]).tolist()
                     if len(iv) > 4 and iv[4] is not None
                     else [1] * len(starts))
            sl = [slice(None)] * data.ndim
            for st, en, ax, sp in zip(starts, ends, axes, steps):
                sl[ax] = slice(st, None if en >= 2**31 else en, sp)
            out = data[tuple(sl)]
        elif op == "Transpose":
            out = jnp.transpose(iv[0], a.get("perm"))
        elif op in ("Reshape", "Flatten"):
            if op == "Flatten":
                ax = a.get("axis", 1)
                shp = iv[0].shape
                out = iv[0].reshape(
                    int(np.prod(shp[:ax])), int(np.prod(shp[ax:])))
            else:
                shape = host(iv[1]).tolist()
                cur = iv[0].shape
                shape = [cur[i] if s == 0 else s
                         for i, s in enumerate(shape)]
                out = iv[0].reshape(shape)
        elif op == "MaxPool":
            out = _pool(iv[0], a, "max")
        elif op == "AveragePool":
            out = _pool(iv[0], a, "avg")
        elif op == "GlobalAveragePool":
            out = iv[0].mean(axis=tuple(range(2, iv[0].ndim)),
                             keepdims=True)
        elif op == "Resize":
            sizes = host(iv[3]) if len(iv) > 3 and iv[3] is not None \
                else None
            scales = host(iv[2]) if len(iv) > 2 and iv[2] is not None \
                and np.asarray(iv[2]).size else None
            out = _resize(iv[0], sizes, scales, a)
        elif op in ("ReduceMean", "ReduceSum", "ReduceMax"):
            axes = a.get("axes")
            if axes is None and len(iv) > 1 and iv[1] is not None:
                axes = host(iv[1]).tolist()
            axes = tuple(axes) if axes else None
            keep = bool(a.get("keepdims", 1))
            f = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                 "ReduceMax": jnp.max}[op]
            out = f(iv[0], axis=axes, keepdims=keep)
        elif op == "Clip":
            lo = (float(host(iv[1])) if len(iv) > 1 and iv[1] is not None
                  else a.get("min", -np.inf))
            hi = (float(host(iv[2])) if len(iv) > 2 and iv[2] is not None
                  else a.get("max", np.inf))
            out = jnp.clip(iv[0], lo, hi)
        elif op == "Constant":
            out = a.get("value")
            if out is None:
                out = np.asarray(a.get("value_float",
                                       a.get("value_int", 0)))
        elif op == "Shape":
            out = np.asarray(iv[0].shape, np.int64)
        elif op == "Gather":
            idx = host(iv[1]) if isinstance(iv[1], (np.ndarray, jnp.ndarray)) \
                else iv[1]
            if isinstance(iv[0], np.ndarray):
                out = np.take(iv[0], idx, axis=a.get("axis", 0))
            else:
                out = jnp.take(iv[0], jnp.asarray(idx),
                               axis=a.get("axis", 0))
        elif op == "Unsqueeze":
            axes = (host(iv[1]).tolist() if len(iv) > 1 else a["axes"])
            out = iv[0]
            for ax in sorted(axes):
                out = (np.expand_dims(out, ax)
                       if isinstance(out, np.ndarray)
                       else jnp.expand_dims(out, ax))
        elif op == "Squeeze":
            axes = (host(iv[1]).tolist()
                    if len(iv) > 1 and iv[1] is not None
                    else a.get("axes"))
            out = (np.squeeze(iv[0], tuple(axes))
                   if isinstance(iv[0], np.ndarray)
                   else jnp.squeeze(iv[0],
                                    tuple(axes) if axes else None))
        elif op == "Cast":
            to = {1: jnp.float32, 6: jnp.int32, 7: jnp.int64,
                  10: jnp.float16, 11: jnp.float64, 9: jnp.bool_}[a["to"]]
            out = (np.asarray(iv[0]).astype(to)
                   if isinstance(iv[0], np.ndarray)
                   else iv[0].astype(to))
        elif op == "ConstantOfShape":
            shape = host(iv[0]).tolist()
            val = a.get("value")
            fill = float(np.asarray(val).reshape(-1)[0]) \
                if val is not None else 0.0
            out = jnp.full(shape, fill)
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = iv[:5]
            eps = a.get("epsilon", 1e-5)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = ((x - jnp.asarray(mean).reshape(shape))
                   * jax.lax.rsqrt(jnp.asarray(var).reshape(shape) + eps)
                   * jnp.asarray(scale).reshape(shape)
                   + jnp.asarray(bias).reshape(shape))
        elif op == "LayerNormalization":
            x = iv[0]
            ax = a.get("axis", -1)
            eps = a.get("epsilon", 1e-5)
            mu = x.mean(axis=ax, keepdims=True)
            var = x.var(axis=ax, keepdims=True)
            out = (x - mu) * jax.lax.rsqrt(var + eps)
            out = out * jnp.asarray(iv[1])
            if len(iv) > 2 and iv[2] is not None:
                out = out + jnp.asarray(iv[2])
        elif op == "Pad":
            pads = host(iv[1]).tolist() if len(iv) > 1 else a["pads"]
            half = len(pads) // 2
            cfgp = [(pads[i], pads[i + half]) for i in range(half)]
            out = jnp.pad(iv[0], cfgp)
        elif op == "Expand":
            shape = host(iv[1]).tolist()
            out = jnp.broadcast_to(iv[0], np.broadcast_shapes(
                iv[0].shape, tuple(shape)))
        elif op == "Where":
            out = jnp.where(jnp.asarray(iv[0]), jnp.asarray(iv[1]),
                            jnp.asarray(iv[2]))
        elif op == "Identity":
            out = iv[0]
        elif op == "ConvTranspose":
            w = jnp.asarray(iv[1])
            strides = tuple(a.get("strides", [1, 1]))
            pads = _pads4(a)
            kh, kw = w.shape[2], w.shape[3]
            wf = jnp.flip(w, axis=(2, 3)).transpose(1, 0, 2, 3)
            out = jax.lax.conv_general_dilated(
                iv[0], wf, (1, 1),
                [(kh - 1 - pads[0][0], kh - 1 - pads[0][1]),
                 (kw - 1 - pads[1][0], kw - 1 - pads[1][1])],
                lhs_dilation=strides,
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            if len(iv) > 2 and iv[2] is not None:
                out = out + jnp.asarray(iv[2]).reshape(1, -1, 1, 1)
        else:
            raise NotImplementedError(f"ONNX op {op} "
                                      f"(node {node.name!r})")
        env[node.outputs[0]] = out

    wanted = outputs or graph.outputs
    return [env[o] for o in wanted]


def load_onnx(path: str) -> OnnxGraph:
    with open(path, "rb") as f:
        return parse_onnx(f.read())
