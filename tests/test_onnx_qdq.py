"""INT8 QDQ ONNX export (export/onnx_quant.py): the fake-quant -> QDQ
rewrite must be numerically exact and produce consumer-standard
QuantizeLinear/DequantizeLinear pairs (the reference's QAT QDQ-surgery
analog, reference: tools/qat/qat_export.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.export.onnx_numpy import OnnxRunner
from yolov6_tpu.export.onnx_proto import parse_model
from yolov6_tpu.export.onnx_quant import to_qdq
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.quant.fake_quant import fake_quant, set_quant_mode
from yolov6_tpu.quant.ptq import quantize_variables
from yolov6_tpu.utils.config import Config


def _ops(data):
    from collections import Counter

    return Counter(n.op_type for n in parse_model(data).nodes)


def test_qdq_rewrite_unit():
    """Exact parity on a hand-built fake-quant chain + a skipped (amax=0)
    branch folding to a passthrough."""

    def fn(x):
        q = fake_quant(x, jnp.float32(3.0))        # quantized branch
        p = fake_quant(x, jnp.float32(0.0))        # skipped: passthrough
        return q * 2.0 + p

    x = np.random.default_rng(0).normal(0, 2, (4, 64)).astype(np.float32)
    raw = export_onnx(fn, (jnp.asarray(x),))
    qdq = to_qdq(raw)
    ops = _ops(qdq)
    assert ops["QuantizeLinear"] == 1
    assert ops["DequantizeLinear"] == 1
    assert ops.get("Round", 0) == 0 and ops.get("Where", 0) == 0
    got = OnnxRunner(qdq)(x)[0]
    want = np.asarray(jax.jit(fn)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-6)


def test_qdq_model_parity():
    """Full PTQ deploy graph: calibrate amax, pre-quantize kernels, trace in
    quant mode, export, rewrite to QDQ — interpreter output must match the
    JAX fake-quant graph, with every conv carrying input+weight QDQ."""
    cfg = Config.fromfile("configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    try:
        set_quant_mode(True, calibrating=True)
        _, muts = model.apply(v, jnp.asarray(x), train=False, mutable=["quant"])
        variables = quantize_variables(dict(v), 8)
        variables["quant"] = muts["quant"]
        set_quant_mode(True)

        def fwd(img):
            head_out, _ = model.apply(variables, img, train=False)
            return model.apply(variables, head_out, method=model.decode)

        raw = export_onnx(fwd, (jnp.asarray(x),))
        want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    finally:
        set_quant_mode(False)

    qdq = to_qdq(raw)
    ops = _ops(qdq)
    n_conv = ops["Conv"]
    assert ops["QuantizeLinear"] == n_conv  # every conv input quantized
    assert ops["DequantizeLinear"] == 2 * n_conv  # + per-channel weights
    assert ops.get("Round", 0) == 0
    # int8 payloads actually shrink the artifact
    assert len(qdq) < 0.45 * len(raw)
    got = OnnxRunner(qdq)(x)[0]
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_qdq_dynamic_batch_compose():
    """--quant --dynamic-batch together: QDQ rewrite then batch rewrite."""
    from yolov6_tpu.export.onnx_export import make_dynamic_batch
    from yolov6_tpu.export.onnx_quant import encode_parsed

    cfg = Config.fromfile("configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    x2 = np.random.default_rng(1).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    try:
        set_quant_mode(True, calibrating=True)
        _, muts = model.apply(v, jnp.asarray(x2), train=False, mutable=["quant"])
        variables = quantize_variables(dict(v), 8)
        variables["quant"] = muts["quant"]
        set_quant_mode(True)

        def fwd(img):
            head_out, _ = model.apply(variables, img, train=False)
            return model.apply(variables, head_out, method=model.decode)

        raw = export_onnx(
            fwd, (jax.ShapeDtypeStruct((509, 64, 64, 3), jnp.float32),)
        )
        want = np.asarray(jax.jit(fwd)(jnp.asarray(x2)))
    finally:
        set_quant_mode(False)
    m = parse_model(to_qdq(raw))
    make_dynamic_batch(m, 509)
    data = encode_parsed(m)
    got = OnnxRunner(data)(x2)[0]
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_remove_qdq_and_calib_cache(tmp_path):
    """TRT implicit-int8 companions (reference tools/qat/onnx_utils.py:
    onnx_remove_qdqnode + save_calib_cache_file): stripping QDQ must leave a
    runnable plain-fp32 graph, and the cache must follow the documented TRT
    layout — header line, then `tensor: <big-endian float32 hex>` rows whose
    values are the QDQ activation scales (amax / 127)."""
    import struct

    from yolov6_tpu.export.onnx_quant import remove_qdq, save_calib_cache_file

    amax = 3.0

    def fn(x):
        q = fake_quant(x, jnp.float32(amax))
        return q * 2.0 + 1.0

    x = np.random.default_rng(0).normal(0, 2, (4, 64)).astype(np.float32)
    raw = export_onnx(fn, (jnp.asarray(x),))
    qdq = to_qdq(raw)

    plain, act_map = remove_qdq(qdq)
    ops = _ops(plain)
    assert ops.get("QuantizeLinear", 0) == 0
    assert ops.get("DequantizeLinear", 0) == 0
    # one activation scale, exactly amax/qmax, big-endian float32 hex
    assert len(act_map) == 1
    (name, hexv), = act_map.items()
    val = struct.unpack("!f", bytes.fromhex(hexv))[0]
    assert val == np.float32(amax / 127.0)
    # the stripped graph runs and equals the UNQUANTIZED math
    got = OnnxRunner(plain)(x)[0]
    np.testing.assert_allclose(got, x * 2.0 + 1.0, atol=1e-6, rtol=1e-6)

    cache = tmp_path / "calib.cache"
    save_calib_cache_file(str(cache), act_map)
    lines = cache.read_text().splitlines()
    assert lines[0] == "TRT-8XXX-EntropyCalibration2"
    assert lines[1] == f"{name}: {hexv}"
    assert len(hexv) == 8 and all(c in "0123456789abcdef" for c in hexv)


def test_remove_qdq_model_weights_roundtrip():
    """Per-channel int8 weight DQ folds back to fp32 initializers; the
    stripped conv graph matches the QDQ graph up to activation-quant noise."""
    from yolov6_tpu.export.onnx_quant import remove_qdq

    cfg = Config.fromfile("configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    try:
        set_quant_mode(True, calibrating=True)
        _, muts = model.apply(v, jnp.asarray(x), train=False, mutable=["quant"])
        variables = quantize_variables(dict(v), 8)
        variables["quant"] = muts["quant"]
        set_quant_mode(True)

        def fwd(img):
            head_out, _ = model.apply(variables, img, train=False)
            return model.apply(variables, head_out, method=model.decode)

        raw = export_onnx(fwd, (jnp.asarray(x),))
    finally:
        set_quant_mode(False)
    qdq = to_qdq(raw)
    plain, act_map = remove_qdq(qdq)
    ops = _ops(plain)
    assert ops.get("QuantizeLinear", 0) == 0
    assert ops.get("DequantizeLinear", 0) == 0
    assert ops["Conv"] == _ops(qdq)["Conv"]
    # one cache row per DISTINCT quantized tensor: a tensor feeding several
    # QDQ consumers max-merges into one entry (reference onnx_utils.py:215-220)
    q_inputs = {n.inputs[0] for n in parse_model(qdq).nodes
                if n.op_type == "QuantizeLinear"}
    assert len(act_map) == len(q_inputs)
    assert len(act_map) <= _ops(qdq)["QuantizeLinear"]
    want = OnnxRunner(qdq)(x)[0]
    got = OnnxRunner(plain)(x)[0]
    # same int8 weights, fp32 activations: close but not identical
    np.testing.assert_allclose(got, want, atol=0.1, rtol=0.2)
