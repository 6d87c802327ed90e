"""ONNX-level PTQ (quant/onnx_ptq.py — the PPQ-driver analog, reference
tools/quantization/ppq/ProgramEntrance.py): minmax calibration through the
numpy interpreter, the Quantized.json qparams contract, explicit-QDQ
insertion on an uninstrumented exported graph, and the TRT engine-build
mirror exercised with a fake tensorrt module."""

import json
import sys

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.export.onnx_numpy import OnnxRunner
from yolov6_tpu.export.onnx_proto import parse_model
from yolov6_tpu.quant.onnx_ptq import (
    build_trt_engine_with_qparams,
    calibrate_onnx,
    insert_activation_qdq,
    write_qparams_json,
)


@pytest.fixture(scope="module")
def conv_model():
    """A plain fp32 exported graph (conv->relu->conv), no quant tracing."""
    import flax.linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(8, (3, 3), padding="SAME")(x)
            x = nn.relu(x)
            return nn.Conv(4, (3, 3), padding="SAME")(x)

    net = Net()
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))

    def fwd(x):
        return net.apply(v, x)

    x = np.zeros((2, 16, 16, 3), np.float32)
    return export_onnx(fwd, (jnp.asarray(x),)), fwd


def test_calibrate_minmax(conv_model):
    data, fwd = conv_model
    rng = np.random.default_rng(0)
    batches = [rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
               for _ in range(4)]
    amax = calibrate_onnx(data, iter(batches), max_steps=4)
    # graph input range was observed and equals the batch max
    m = parse_model(data)
    in_name = m.inputs[0][0]
    want = max(float(np.abs(b).max()) for b in batches)
    assert amax[in_name] == pytest.approx(want)
    # every float intermediate got a positive range
    assert len(amax) > 2
    assert all(v >= 0 for v in amax.values())


def test_qparams_json_contract(conv_model, tmp_path):
    """The exact write_qparams_onnx2trt.py input layout:
    {"act_quant_info": {name: amax}} (reference :22-27)."""
    data, _ = conv_model
    amax = calibrate_onnx(
        data, iter([np.ones((2, 16, 16, 3), np.float32)]), max_steps=1)
    path = tmp_path / "Quantized.json"
    write_qparams_json(str(path), amax)
    loaded = json.loads(path.read_text())
    assert set(loaded) == {"act_quant_info"}
    assert loaded["act_quant_info"] == {k: float(v) for k, v in amax.items()}


def test_insert_qdq_runs_close_to_fp32(conv_model):
    data, fwd = conv_model
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 16, 16, 3)).astype(np.float32)
    amax = calibrate_onnx(data, iter([x]), max_steps=1)
    qdq = insert_activation_qdq(data, amax, num_bits=8)
    from collections import Counter

    ops = Counter(n.op_type for n in parse_model(qdq).nodes)
    assert ops["QuantizeLinear"] == 2  # both conv data inputs
    assert ops["DequantizeLinear"] == 4  # + per-channel weights
    got = OnnxRunner(qdq)(x)[0]
    want = np.asarray(fwd(jnp.asarray(x)))
    assert got.shape == want.shape
    # int8 grid error stays small on a 2-conv net
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 0.1, f"relative error {err}"


def test_trt_engine_mirror_with_fake_vendor(conv_model, tmp_path, monkeypatch):
    """write_qparams_onnx2trt mirror: dynamic ranges set from the JSON,
    int8 flag, engine serialized — verified against a fake tensorrt."""
    data, _ = conv_model
    onnx_path = tmp_path / "m.onnx"
    onnx_path.write_bytes(data)
    amax = calibrate_onnx(
        data, iter([np.ones((2, 16, 16, 3), np.float32)]), max_steps=1)
    qp = tmp_path / "q.json"
    write_qparams_json(str(qp), amax)

    calls = {"ranges": [], "int8": False}

    class _T:
        def __init__(self, name):
            self.name = name

        @property
        def dynamic_range(self):
            return None

        @dynamic_range.setter
        def dynamic_range(self, v):
            calls["ranges"].append((self.name, v))

    class _Layer:
        def __init__(self, name):
            self.num_outputs = 1
            self._n = name

        def get_output(self, j):
            return _T(self._n)

    class _Network:
        num_inputs = 1
        num_layers = 2

        def get_input(self, i):
            return _T(list(amax)[0])

        def get_layer(self, i):
            return _Layer(list(amax)[min(i + 1, len(amax) - 1)])

    class _Parser:
        def __init__(self, network, logger):
            pass

        def parse(self, b):
            return True

        def get_error(self, i):
            return "none"

    class _Engine:
        def serialize(self):
            return b"ENGINE"

    class _Config:
        max_workspace_size = 0

        def set_flag(self, f):
            calls["int8"] = True

    class _Builder:
        def __init__(self, logger):
            pass

        def create_network(self, flags):
            return _Network()

        def create_builder_config(self):
            return _Config()

        def build_engine(self, network, config):
            return _Engine()

    fake = type(sys)("tensorrt")
    fake.Logger = lambda: None
    fake.Builder = _Builder
    fake.OnnxParser = _Parser
    fake.NetworkDefinitionCreationFlag = type(
        "F", (), {"EXPLICIT_BATCH": 0})
    fake.BuilderFlag = type("B", (), {"INT8": 1})
    monkeypatch.setitem(sys.modules, "tensorrt", fake)

    engine_path = tmp_path / "m.engine"
    msg = build_trt_engine_with_qparams(str(onnx_path), str(qp), str(engine_path))
    assert engine_path.read_bytes() == b"ENGINE"
    assert calls["int8"]
    assert calls["ranges"]  # dynamic ranges were written
    for name, (lo, hi) in calls["ranges"]:
        assert lo == -hi and hi == pytest.approx(amax[name])
    assert "dynamic ranges" in msg


def test_missing_vendor_is_loud(conv_model, tmp_path, monkeypatch):
    data, _ = conv_model
    monkeypatch.setitem(sys.modules, "tensorrt", None)
    onnx_path = tmp_path / "m.onnx"
    onnx_path.write_bytes(data)
    qp = tmp_path / "q.json"
    qp.write_text('{"act_quant_info": {}}')
    with pytest.raises(RuntimeError, match="tensorrt is not installed"):
        build_trt_engine_with_qparams(str(onnx_path), str(qp), str(tmp_path / "e"))
