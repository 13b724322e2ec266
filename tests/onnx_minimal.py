"""Minimal hand-rolled ONNX (protobuf) writer for test use.

cv2 5.x removed the darknet importer (`readNetFromDarknet` no longer
exists), so validating the detector against OpenCV-DNN — the engine the
reference actually runs (src/common_includes/yolo/detector.cpp:29-133) —
requires feeding cv2 an ONNX graph.  The environment has neither the
`onnx` package nor egress to fetch it, but the protobuf wire format is
tiny, so this module serializes ModelProto by hand: just enough of the
schema (opset 11) for the darknet layer vocabulary:

  Conv (+folded BN), LeakyRelu, MaxPool, Concat, Split (grouped route),
  ConvTranspose (exact nearest-neighbour 2x upsample: per-channel grouped
  2x2 ones kernel, stride 2).

Field numbers follow onnx/onnx.proto (stable since IR v3).
"""

import struct

import numpy as np


# -- protobuf primitives -----------------------------------------------------

def _varint(n):
    n &= (1 << 64) - 1
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field, wire):
    return _varint((field << 3) | wire)


def _len_field(field, payload):
    return _tag(field, 2) + _varint(len(payload)) + payload


def _str_field(field, s):
    return _len_field(field, s.encode())


def _uint_field(field, v):
    return _tag(field, 0) + _varint(v)


# -- ONNX messages -----------------------------------------------------------

def _attr_int(name, v):
    return _len_field(5, _str_field(1, name) + _uint_field(3, v)
                      + _uint_field(20, 2))            # type = INT


def _attr_float(name, v):
    return _len_field(5, _str_field(1, name)
                      + _tag(2, 5) + struct.pack("<f", v)
                      + _uint_field(20, 1))            # type = FLOAT


def _attr_ints(name, vs):
    body = _str_field(1, name)
    for v in vs:
        body += _uint_field(8, v)                      # ints (unpacked)
    return _len_field(5, body + _uint_field(20, 7))    # type = INTS


def node(op_type, inputs, outputs, **attrs):
    body = b""
    for i in inputs:
        body += _str_field(1, i)
    for o in outputs:
        body += _str_field(2, o)
    body += _str_field(4, op_type)
    for k, v in attrs.items():
        if isinstance(v, float):
            body += _attr_float(k, v)
        elif isinstance(v, (list, tuple)):
            body += _attr_ints(k, list(v))
        else:
            body += _attr_int(k, int(v))
    return _len_field(1, body)                         # GraphProto.node


def tensor(name, arr):
    arr = np.ascontiguousarray(arr, np.float32)
    body = b""
    for d in arr.shape:
        body += _uint_field(1, d)                      # dims
    body += _uint_field(2, 1)                          # data_type = FLOAT
    body += _str_field(8, name)
    body += _len_field(9, arr.tobytes())               # raw_data
    return _len_field(5, body)                         # GraphProto.initializer


def _value_info(field, name, shape):
    dims = b""
    for d in shape:
        dims += _len_field(1, _uint_field(1, d))       # Dimension.dim_value
    tensor_type = _uint_field(1, 1) + _len_field(2, dims)
    type_proto = _len_field(1, tensor_type)
    return _len_field(field, _str_field(1, name) + _len_field(2, type_proto))


def model(nodes, initializers, input_name, input_shape, outputs):
    """outputs: list of (name, shape).  Returns serialized ModelProto."""
    graph = b"".join(nodes)
    graph += _str_field(2, "g")
    graph += b"".join(initializers)
    graph += _value_info(11, input_name, input_shape)
    for name, shape in outputs:
        graph += _value_info(12, name, shape)
    opset = _len_field(8, _uint_field(2, 11))          # opset_import v11
    return (_uint_field(1, 7)                          # ir_version = 7
            + _str_field(2, "svtpu-test")              # producer_name
            + _len_field(7, graph)
            + opset)


# -- darknet cfg -> ONNX graph -------------------------------------------------

def export_darknet(sections, torch_params, size, path):
    """Serialize the conv backbone of a darknet cfg to ONNX.

    torch_params: {layer_idx: dict} from tests.test_yolo_oracle.TorchDarknet
    (raw darknet tensors; BN is folded here, independently of the package's
    loader).  The yolo heads are emitted as raw feature-map outputs.
    Returns the list of (output_name, (1, C, gh, gw)) head shapes.
    """
    nodes, inits = [], []
    chans, shapes, names = [], [], []
    c_in, hw = 3, size
    x = "images"
    for i, l in enumerate(sections[1:]):
        t = l["type"]
        out = f"l{i}"
        if t == "convolutional":
            p = torch_params[i]
            k, s, f = int(l["size"]), int(l["stride"]), int(l["filters"])
            w = p["w"].numpy()
            if "bn_g" in p:
                scale = (p["bn_g"] / np.sqrt(p["bn_v"] + 1e-5)).numpy()
                w = w * scale[:, None, None, None]
                b = (p["bn_b"] - p["bn_m"] * (p["bn_g"]
                     / np.sqrt(p["bn_v"] + 1e-5))).numpy()
            else:
                b = p["bias"].numpy()
            pad = k // 2 if l.get("pad") == "1" else 0
            inits += [tensor(out + "_w", w), tensor(out + "_b", b)]
            cname = out + ("_conv" if l["activation"] == "leaky" else "")
            nodes.append(node("Conv", [x, out + "_w", out + "_b"], [cname],
                              strides=[s, s], pads=[pad] * 4,
                              kernel_shape=[k, k], group=1))
            if l["activation"] == "leaky":
                nodes.append(node("LeakyRelu", [cname], [out], alpha=0.1))
            c, hw = f, hw // s
        elif t == "maxpool":
            k, s = int(l["size"]), int(l["stride"])
            nodes.append(node("MaxPool", [x], [out],
                              kernel_shape=[k, k], strides=[s, s]))
            c, hw = c_in, hw // s
        elif t == "upsample":
            s = int(l["stride"])
            ones = np.zeros((c_in, 1, s, s), np.float32) + 1.0
            inits.append(tensor(out + "_w", ones))
            nodes.append(node("ConvTranspose", [x, out + "_w"], [out],
                              strides=[s, s], kernel_shape=[s, s],
                              group=c_in))
            c, hw = c_in, hw * s
        elif t == "route":
            refs = [int(r) for r in l["layers"].split(",")]
            refs = [r if r >= 0 else i + r for r in refs]
            srcs = [names[r] for r in refs]
            if len(srcs) > 1:
                nodes.append(node("Concat", srcs, [out], axis=1))
                c = sum(chans[r] for r in refs)
            else:
                c = chans[refs[0]]
                if "groups" in l:
                    g, gid = int(l["groups"]), int(l["group_id"])
                    parts = [f"{out}_p{j}" for j in range(g)]
                    nodes.append(node("Split", srcs, parts, axis=1,
                                      split=[c // g] * g))
                    out = parts[gid]
                    c = c // g
                else:
                    out = srcs[0]
            hw = shapes[refs[0]]
        elif t == "yolo":
            out = x
            c = c_in
        else:
            raise ValueError(t)
        names.append(out)
        chans.append(c)
        shapes.append(hw)
        x, c_in = out, c

    heads = [(names[i], (1, chans[i], shapes[i], shapes[i]))
             for i, l in enumerate(sections[1:]) if l["type"] == "yolo"]
    with open(path, "wb") as f:
        f.write(model(nodes, inits, "images", (1, 3, size, size), heads))
    return heads
