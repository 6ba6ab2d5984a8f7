"""Minimal ONNX protobuf WRITER (test fixture only).

Produces a file whose ModelProto/GraphProto/TensorProto framing matches
what `wetts_tpu.utils.onnx_import.read_onnx_initializers` consumes — the
same subset torch's exporter emits for weight initializers (name + dims +
data_type + raw_data). Used to fabricate released-shape `final.onnx`
bundles offline; nothing here ships in the framework.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

_DTYPE_CODES = {
    np.dtype(np.float32): 1,
    np.dtype(np.uint8): 2,
    np.dtype(np.int8): 3,
    np.dtype(np.int32): 6,
    np.dtype(np.int64): 7,
    np.dtype(np.bool_): 9,
    np.dtype(np.float16): 10,
    np.dtype(np.float64): 11,
}


def _varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _key(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _varint(len(payload)) + payload


def _tensor(name: str, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    buf = bytearray()
    for d in arr.shape:
        buf += _key(1, 0) + _varint(d)  # dims (unpacked int64)
    buf += _key(2, 0) + _varint(_DTYPE_CODES[arr.dtype])  # data_type
    buf += _len_field(8, name.encode("utf-8"))  # name
    buf += _len_field(9, arr.tobytes())  # raw_data
    return bytes(buf)


def write_initializers_onnx(path: str, tensors: Dict[str, np.ndarray],
                            graph_name: str = "wetts") -> None:
    graph = bytearray()
    graph += _len_field(2, graph_name.encode("utf-8"))  # GraphProto.name
    for name, arr in tensors.items():
        graph += _len_field(5, _tensor(name, arr))  # initializer
    model = bytearray()
    model += _key(1, 0) + _varint(7)  # ir_version
    model += _len_field(7, bytes(graph))  # ModelProto.graph
    with open(path, "wb") as f:
        f.write(bytes(model))
