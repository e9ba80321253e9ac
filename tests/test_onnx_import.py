"""ONNX weight import (models/onnx_import.py) against generated
fixtures: the reference distributes perception weights as .onnx
(models/download.sh, global_descriptor_component.cpp:28-38); with no
onnx package in the image, fixtures are written with a minimal protobuf
encoder mirroring the wire format the parser reads."""

import struct

import numpy as np
import pytest

import jax.numpy as jnp
from flax.traverse_util import unflatten_dict

from cslam_tpu.models import convert, onnx_import


# ---------------------------------------------------------------------
# minimal ONNX writer (test fixture generator)
# ---------------------------------------------------------------------
def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _len_field(field: int, payload: bytes) -> bytes:
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _varint(field << 3 | 0) + _varint(value)


def tensor_proto(name: str, arr: np.ndarray) -> bytes:
    dtypes = {np.dtype("float32"): 1, np.dtype("float16"): 10,
              np.dtype("int64"): 7, np.dtype("int32"): 6}
    body = b""
    for d in arr.shape:
        body += _varint_field(1, d)
    body += _varint_field(2, dtypes[arr.dtype])
    body += _len_field(8, name.encode())
    body += _len_field(9, np.ascontiguousarray(arr).tobytes())
    return body


def node_proto(op_type: str, inputs, outputs, name="") -> bytes:
    body = b""
    for i in inputs:
        body += _len_field(1, i.encode())
    for o in outputs:
        body += _len_field(2, o.encode())
    body += _len_field(3, name.encode())
    body += _len_field(4, op_type.encode())
    return body


def write_onnx(path: str, initializers, nodes):
    graph = b""
    for n in nodes:
        graph += _len_field(1, n)
    for name, arr in initializers.items():
        graph += _len_field(5, tensor_proto(name, arr))
    model = _varint_field(1, 8)          # ir_version
    model += _len_field(7, graph)
    with open(path, "wb") as f:
        f.write(model)


# ---------------------------------------------------------------------
def _superpoint_state(rng):
    dims = [(64, 1), (64, 64), (64, 64), (64, 64), (128, 64), (128, 128),
            (128, 128), (128, 128), (256, 128), (65, 256), (256, 128),
            (256, 256)]
    names = ["conv1a", "conv1b", "conv2a", "conv2b", "conv3a", "conv3b",
             "conv4a", "conv4b", "convPa", "convPb", "convDa", "convDb"]
    state = {}
    for (o, i), name in zip(dims, names):
        k = 1 if name in ("convPb", "convDb") else 3
        state[f"{name}.weight"] = rng.standard_normal(
            (o, i, k, k)).astype(np.float32) * 0.05
        state[f"{name}.bias"] = rng.standard_normal(o).astype(
            np.float32) * 0.01
    return state, names


def test_roundtrip_initializers(tmp_path):
    rng = np.random.default_rng(0)
    arrs = {
        "w32": rng.standard_normal((4, 3, 2, 2)).astype(np.float32),
        "w16": rng.standard_normal((8,)).astype(np.float16),
        "shape": np.array([1, 2, 3], np.int64),
    }
    path = str(tmp_path / "t.onnx")
    write_onnx(path, arrs, [node_proto("Conv", ["x", "w32"], ["y"])])
    init, nodes = onnx_import.read_onnx(path)
    assert set(init) == set(arrs)
    for k in arrs:
        np.testing.assert_array_equal(init[k], arrs[k])
        assert init[k].dtype == arrs[k].dtype
    assert nodes[0].op_type == "Conv"
    assert nodes[0].inputs == ["x", "w32"]


def test_superpoint_onnx_name_based(tmp_path):
    rng = np.random.default_rng(1)
    state, names = _superpoint_state(rng)
    nodes = []
    prev = "image"
    for n in names:
        nodes.append(node_proto("Conv", [prev, f"{n}.weight", f"{n}.bias"],
                                [f"{n}_out"], name=n))
        prev = f"{n}_out"
    path = str(tmp_path / "superpoint.onnx")
    write_onnx(path, state, nodes)
    flat = onnx_import.convert_superpoint_onnx(path)
    want = convert.convert_superpoint(state)
    assert set(flat) == set(want)
    for k in want:
        np.testing.assert_allclose(flat[k], want[k])


def test_superpoint_onnx_graph_order_fallback(tmp_path):
    """Optimizer-mangled initializer names: recovery by walking Conv
    nodes in topological order (reference optimize.py fuses/renames)."""
    rng = np.random.default_rng(2)
    state, names = _superpoint_state(rng)
    mangled = {}
    nodes = []
    prev = "image"
    for i, n in enumerate(names):
        wname, bname = f"onnx::Conv_{100+i}", f"onnx::Conv_{200+i}"
        mangled[wname] = state[f"{n}.weight"]
        mangled[bname] = state[f"{n}.bias"]
        nodes.append(node_proto("Conv", [prev, wname, bname], [f"o{i}"]))
        prev = f"o{i}"
    path = str(tmp_path / "superpoint_opt.onnx")
    write_onnx(path, mangled, nodes)
    flat = onnx_import.convert_superpoint_onnx(path)
    want = convert.convert_superpoint(state)
    for k in want:
        np.testing.assert_allclose(flat[k], want[k])


def test_superpoint_onnx_weights_run(tmp_path):
    """Imported weights drive the Flax SuperPoint forward pass."""
    from cslam_tpu.models.superpoint import SuperPointNet

    rng = np.random.default_rng(3)
    state, names = _superpoint_state(rng)
    nodes = []
    prev = "image"
    for n in names:
        nodes.append(node_proto("Conv", [prev, f"{n}.weight", f"{n}.bias"],
                                [f"{n}_out"]))
        prev = f"{n}_out"
    path = str(tmp_path / "sp.onnx")
    write_onnx(path, state, nodes)
    flat = onnx_import.convert_superpoint_onnx(path)
    variables = unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
    model = SuperPointNet(dtype=jnp.float32)
    det, desc = model.apply(variables, jnp.zeros((1, 64, 64, 1)))
    assert det.shape == (1, 8, 8, 65)
    assert np.all(np.isfinite(np.asarray(det)))


def test_cosplace_onnx_prefix_strip(tmp_path):
    """export_cosplace.py wraps the model in NetEmbedding -> 'model.'
    prefix on every initializer; the importer strips it and reuses the
    torch converter."""
    pytest.importorskip("torch")
    from tests.test_convert import TorchCosPlace

    import torch
    torch.manual_seed(0)
    m = TorchCosPlace()
    state = {k: v.numpy() for k, v in m._resnet.state_dict().items()}
    state["gem.p"] = m.gem.p.detach().numpy()
    state["fc.weight"] = m.fc.weight.detach().numpy()
    state["fc.bias"] = m.fc.bias.detach().numpy()
    prefixed = {f"model.{k}": v for k, v in state.items()}
    path = str(tmp_path / "eigenplaces.onnx")
    write_onnx(path, prefixed, [node_proto("Conv", ["image"], ["out"])])
    flat = onnx_import.convert_cosplace_onnx(path)
    want = convert.convert_cosplace(state)
    assert set(flat) == set(want)
    for k in want:
        np.testing.assert_allclose(flat[k], want[k])
