"""ONNX export: serialization round-trip + execution parity vs the JAX graph.

The exporter (yolov6_tpu/export/onnx_export.py) converts the jitted deploy
fwd+decode jaxpr to an opset-13 ONNX graph with a hand-rolled protobuf
serializer (no ``onnx`` dependency); parity is established by executing the
serialized model with the in-repo pure-numpy ONNX interpreter
(export/onnx_numpy.py), which implements ONNX operator semantics
independently of the converter's mapping.

Reference contract: deploy/ONNX/export_onnx.py (model + decode, no NMS).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.export.onnx_numpy import OnnxRunner
from yolov6_tpu.export.onnx_proto import parse_model
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config


def _deploy_fwd(config, nc=16, img=96):
    cfg = Config.fromfile(config)
    model = build_model(cfg, num_classes=nc, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False
    )

    def fwd(images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    return fwd


def _parity(config, nc=16, img=96, batch=2, atol=5e-4):
    fwd = _deploy_fwd(config, nc=nc, img=img)
    x = np.random.default_rng(0).uniform(0, 1, (batch, img, img, 3)).astype(np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),),
                       input_names=["images"], output_names=["outputs"])
    got = OnnxRunner(data)(x)[0]
    want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)
    return data


def test_onnx_parity_yolov6n():
    """RepVGG deploy blocks + anchor-free decode (EfficientRep/RepPAN)."""
    data = _parity("configs/yolov6n.py")
    model = parse_model(data)
    assert model.opset == 13
    assert [n for n, _, _ in model.inputs] == ["images"]
    assert [n for n, _, _ in model.outputs] == ["outputs"]
    # the boundary-transpose peephole must leave no inverse pairs: a
    # Transpose whose input is another Transpose composing to identity
    produced = {}
    for node in model.nodes:
        for o in node.outputs:
            produced[o] = node
    for node in model.nodes:
        if node.op_type != "Transpose":
            continue
        prev = produced.get(node.inputs[0])
        if prev is not None and prev.op_type == "Transpose":
            comp = [prev.attrs["perm"][p] for p in node.attrs["perm"]]
            assert comp != sorted(comp), "uncancelled inverse Transpose pair"


def test_onnx_parity_yolov6m_dfl():
    """CSP backbone + DFL decode (reg_max=16: softmax projection path)."""
    _parity("configs/yolov6m.py", img=64, batch=1)


def test_onnx_parity_lite():
    """Lite family: depthwise (grouped) convs + lite head."""
    _parity("configs/yolov6_lite/yolov6_lite_s.py", img=96, batch=1)


def test_onnx_parity_p6():
    """P6 family: extra pyramid level, stride-64 head."""
    _parity("configs/yolov6n6.py", img=128, batch=1)


def test_onnx_preprocess_graph():
    """uint8 input with in-graph BGR->RGB + /255 (Cast + Slice + Div)."""
    fwd = _deploy_fwd("configs/yolov6n.py", nc=8, img=64)

    def serve(images):
        x = images.astype(jnp.float32)[..., ::-1] / 255.0
        return fwd(x)

    x = np.random.default_rng(1).integers(0, 256, (1, 64, 64, 3), np.uint8)
    data = export_onnx(serve, (jnp.asarray(x),))
    got = OnnxRunner(data)(x)[0]
    want = np.asarray(jax.jit(serve)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_onnx_initializer_roundtrip():
    """Serialized initializers parse back bit-exact (raw_data path)."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(3, 3, 3, 8)).astype(np.float32)  # HWIO

    def fn(x):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    x = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    data = export_onnx(fn, (jnp.asarray(x),))
    model = parse_model(data)
    convs = [n for n in model.nodes if n.op_type == "Conv"]
    assert len(convs) == 1
    w_onnx = model.initializers[convs[0].inputs[1]]
    # exporter pre-transposes HWIO -> OIHW
    np.testing.assert_array_equal(w_onnx, w.transpose(3, 2, 0, 1))
    got = OnnxRunner(data)(x)[0]
    np.testing.assert_allclose(got, np.asarray(jax.jit(fn)(jnp.asarray(x))),
                               atol=1e-5, rtol=1e-5)


def test_onnx_dynamic_batch():
    """--dynamic-batch analog: trace at a sentinel batch, rewrite shape
    constants (Reshape -1 / runtime Expand), then run at other batch sizes.
    yolov6m exercises the mid-vector batch position (upsample reshapes)."""
    from yolov6_tpu.export.onnx_export import make_dynamic_batch
    from yolov6_tpu.export.onnx_quant import encode_parsed

    for config in ("configs/yolov6n.py", "configs/yolov6m.py"):
        fwd = _deploy_fwd(config, nc=7, img=64)
        data = export_onnx(
            fwd, (jax.ShapeDtypeStruct((509, 64, 64, 3), jnp.float32),)
        )
        m = parse_model(data)
        make_dynamic_batch(m, 509)
        dyn = encode_parsed(m)
        parsed = parse_model(dyn)
        assert parsed.inputs[0][2][0] == "batch"
        assert parsed.outputs[0][2][0] == "batch"
        runner = OnnxRunner(dyn)
        for b in (1, 3):
            x = np.random.default_rng(b).uniform(0, 1, (b, 64, 64, 3)).astype(
                np.float32
            )
            got = runner(x)[0]
            want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
            np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_onnx_end2end_nms_tail_vs_oracle():
    """The ORT end2end tail (standard NonMaxSuppression + gather/sort,
    reference end2end.py:140-189) must reproduce reference NMS semantics:
    compare against the numpy oracle from test_nms on raw predictions
    (identity 'model' isolates the tail)."""
    from test_nms import _random_preds, oracle_nms

    preds = _random_preds(b=2, a=200, nc=6, seed=11)
    data = export_onnx(
        lambda p: p, (jnp.asarray(preds),),
        nms=dict(max_obj=1000, iou_thres=0.65, score_thres=0.3),
    )
    num_det, det_boxes, det_scores, det_classes = OnnxRunner(data)(preds)
    want = oracle_nms(preds, 0.3, 0.65, multi_label=True, max_det=10**9)
    assert num_det.shape == (2, 1)
    for i in range(2):
        n = int(num_det[i, 0])
        got = {
            (tuple(np.round(det_boxes[i, j], 3)), int(det_classes[i, j]),
             round(float(det_scores[i, j]), 5))
            for j in range(n)
        }
        ref = {
            (tuple(np.round(r[:4], 3)), int(r[5]), round(float(r[4]), 5))
            for r in want[i]
        }
        assert got == ref
        # scores sorted descending over the valid prefix; padding after
        assert (np.diff(det_scores[i, :n]) <= 1e-6).all()
        assert (det_scores[i, n:] <= 0).all()
        assert (det_classes[i, n:] == -1).all()


def test_onnx_end2end_with_model():
    """Full chain: deploy fwd + decode + in-graph NMS, parity vs the oracle
    applied to the JAX decode output."""
    from test_nms import oracle_nms

    fwd = _deploy_fwd("configs/yolov6n.py", nc=8, img=64)
    x = np.random.default_rng(3).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    # score_thres below the head's prior-prob bias init (~0.01) so the
    # untrained model yields detections and the check is non-vacuous
    data = export_onnx(
        fwd, (jnp.asarray(x),),
        nms=dict(max_obj=20, iou_thres=0.65, score_thres=0.005),
    )
    num_det, det_boxes, det_scores, det_classes = OnnxRunner(data)(x)
    assert int(num_det.sum()) > 0
    preds = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    want = oracle_nms(preds, 0.005, 0.65, multi_label=True, max_det=10**9)
    for i in range(x.shape[0]):
        n = int(num_det[i, 0])
        # per-class cap (max_obj=20) can bind on dense untrained outputs:
        # oracle rows must then be a superset of the kept set
        got = {
            (tuple(np.round(det_boxes[i, j], 2)), int(det_classes[i, j]))
            for j in range(n)
        }
        ref = {(tuple(np.round(r[:4], 2)), int(r[5])) for r in want[i]}
        assert got <= ref
        assert len(got) == n


def test_onnx_fp16_export():
    """to_fp16 halves the artifact and keeps loose numeric parity (the
    numpy oracle accumulates in fp16; real runtimes accumulate fp32)."""
    from yolov6_tpu.export.onnx_quant import encode_parsed, to_fp16

    fwd = _deploy_fwd("configs/yolov6n.py", nc=8, img=64)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),))
    m = parse_model(data)
    to_fp16(m)
    half = encode_parsed(m)
    assert len(half) < 0.6 * len(data)
    parsed = parse_model(half)
    from yolov6_tpu.export import onnx_proto as proto

    assert parsed.inputs[0][1] == proto.FLOAT16
    got = OnnxRunner(half)(x.astype(np.float16))[0].astype(np.float32)
    want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=0.5, rtol=0.05)


def test_onnx_unsupported_primitive_is_loud():
    def fn(x):
        return jnp.cumsum(x)  # no cumsum handler

    with pytest.raises(NotImplementedError, match="cumsum"):
        export_onnx(fn, (jnp.zeros((4,), jnp.float32),))


def _find_node(m, op_type):
    nodes = [n for n in m.nodes if n.op_type == op_type]
    assert len(nodes) == 1, f"{op_type}: {len(nodes)} nodes"
    return nodes[0]


def test_onnx_end2end_trt8_contract():
    """--end2end --trt-version 8 must emit the exact EfficientNMS_TRT node +
    attribute layout + output signature the reference exports for TensorRT
    consumers (reference: yolov6/models/end2end.py:30-76 symbolic(), the
    graph torch.onnx.export writes from ONNX_TRT8). Plugin ops cannot
    execute outside TensorRT, so the contract is asserted structurally."""
    from test_nms import _random_preds

    preds = _random_preds(b=2, a=200, nc=6, seed=11)
    data = export_onnx(
        lambda p: p, (jnp.asarray(preds),),
        nms=dict(max_obj=100, iou_thres=0.65, score_thres=0.3, trt_version=8),
    )
    m = parse_model(data)
    assert m.opsets.get("TRT") == 1
    node = _find_node(m, "EfficientNMS_TRT")
    assert node.domain == "TRT"
    assert node.attrs == {
        "background_class": -1,
        "box_coding": 1,
        "iou_threshold": pytest.approx(0.65),
        "max_output_boxes": 100,
        "plugin_version": "1",
        "score_activation": 0,
        "score_threshold": pytest.approx(0.3),
    }
    assert len(node.inputs) == 2 and len(node.outputs) == 4
    # boxes input is the raw xywh slice (box_coding=1): NO convert-matrix
    # MatMul anywhere in the graph (TRT8 path, end2end.py:247-249)
    assert not any(n.op_type == "MatMul" for n in m.nodes)
    # output signature: num_dets [b,1] i32, boxes [b,max,4] f32,
    # scores [b,max] f32, classes [b,max] i32 — det dim is FIXED
    from yolov6_tpu.export import onnx_proto as proto

    names = [n for n, _, _ in m.outputs]
    assert names == ["num_dets", "det_boxes", "det_scores", "det_classes"]
    types = [et for _, et, _ in m.outputs]
    assert types == [proto.INT32, proto.FLOAT, proto.FLOAT, proto.INT32]
    shapes = [sh for _, _, sh in m.outputs]
    assert shapes == [(2, 1), (2, 100, 4), (2, 100), (2, 100)]


def test_onnx_end2end_trt7_contract():
    """--end2end --trt-version 7: BatchedNMSDynamic_TRT with the reference's
    attribute set; boxes go xywh->xyxy (convert matrix) then gain the
    shared-location class axis [b,A,1,4]; classes output is Cast to int32
    (reference: yolov6/models/end2end.py:78-137,192-233)."""
    from test_nms import _random_preds

    preds = _random_preds(b=2, a=200, nc=6, seed=11)
    data = export_onnx(
        lambda p: p, (jnp.asarray(preds),),
        nms=dict(max_obj=50, iou_thres=0.5, score_thres=0.25, trt_version=7),
    )
    m = parse_model(data)
    assert m.opsets.get("TRT") == 1
    node = _find_node(m, "BatchedNMSDynamic_TRT")
    assert node.domain == "TRT"
    assert node.attrs == {
        "shareLocation": 1,
        "plugin_version": "1",
        "backgroundLabelId": -1,
        "numClasses": 6,
        "topK": 1000,
        "keepTopK": 50,
        "scoreThreshold": pytest.approx(0.25),
        "iouThreshold": pytest.approx(0.5),
        "isNormalized": 0,
        "clipBoxes": 0,
        "scoreBits": 16,
        "caffeSemantics": 1,
    }
    # boxes path: MatMul(convert matrix) -> Unsqueeze(axis 2) -> plugin
    producers = {o: n for n in m.nodes for o in n.outputs}
    unsq = producers[node.inputs[0]]
    assert unsq.op_type == "Unsqueeze"
    assert np.array_equal(m.initializers[unsq.inputs[1]], [2])
    assert producers[unsq.inputs[0]].op_type == "MatMul"
    # classes come back float from the plugin and are Cast to int32
    consumers = [n for n in m.nodes if node.outputs[3] in n.inputs]
    assert [n.op_type for n in consumers] == ["Cast"]
    from yolov6_tpu.export import onnx_proto as proto

    assert consumers[0].attrs["to"] == proto.INT32
    types = [et for _, et, _ in m.outputs]
    assert types == [proto.INT32, proto.FLOAT, proto.FLOAT, proto.INT32]
    shapes = [sh for _, _, sh in m.outputs]
    assert shapes == [(2, 1), (2, 50, 4), (2, 50), (2, 50)]


def test_onnx_conv_bias_fused_and_no_ones_broadcast():
    """Exporter peepholes (OpenCV<=4.6 compatibility + smaller graphs):
    conv biases ride the Conv node's B input (no Transpose->Add bias
    pattern), no binop carries a (1,..,1,C) leading-ones constant, and
    every MatMul keeps its constant on the RHS (parseMatMul contract)."""
    fwd = _deploy_fwd("configs/yolov6n.py", img=64)
    x = np.zeros((1, 64, 64, 3), np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),),
                       input_names=["images"], output_names=["outputs"])
    model = parse_model(data)
    consts = model.initializers
    produced = {o: n for n in model.nodes for o in n.outputs}

    def resolves_const(name, depth=6):
        if name in consts:
            return np.asarray(consts[name])
        n = produced.get(name)
        if n is None or depth == 0:
            return None
        if n.op_type == "Transpose":
            a = resolves_const(n.inputs[0], depth - 1)
            return None if a is None else np.transpose(a, n.attrs["perm"])
        if n.op_type == "Reshape":
            a = resolves_const(n.inputs[0], depth - 1)
            s = resolves_const(n.inputs[1], depth - 1)
            return None if a is None or s is None else a.reshape(
                [int(v) for v in s])
        return None

    n_conv_with_bias = 0
    for node in model.nodes:
        if node.op_type == "Conv" and len(node.inputs) == 3:
            n_conv_with_bias += 1
            assert np.asarray(consts[node.inputs[2]]).ndim == 1
        if node.op_type in ("Add", "Sub", "Mul", "Div"):
            for i in node.inputs:
                arr = resolves_const(i)
                if arr is not None and arr.ndim > 1:
                    # leading-ones consts must have been squeezed
                    assert not (arr.ndim > 1 and arr.shape[0] == 1
                                and np.prod(arr.shape[:-1]) == 1), (
                        f"{node.op_type} carries ones-broadcast const "
                        f"{arr.shape}")
        if node.op_type == "MatMul":
            assert resolves_const(node.inputs[0]) is None, \
                "MatMul with constant LHS survived the swap rewrite"
    assert n_conv_with_bias > 10  # deploy convs carry folded-BN biases
