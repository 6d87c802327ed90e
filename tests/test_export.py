"""End-to-end export: StableHLO serialization round-trip with in-graph NMS."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.models.end2end import export_stablehlo, load_exported, make_end2end_fn
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config


def test_end2end_export_roundtrip(tmp_path):
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    serve = make_end2end_fn(
        model, variables, conf_thres=0.005, iou_thres=0.65, max_det=20,
        with_preprocess=True, half=False,
    )
    path = str(tmp_path / "model.stablehlo")
    export_stablehlo(serve, batch=2, img_size=(64, 64), path=path, input_dtype=jnp.uint8)

    art = load_exported(path)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    num_dets, boxes, scores, classes = art.call(jnp.asarray(imgs))
    assert num_dets.shape == (2, 1)
    assert boxes.shape == (2, 20, 4)
    assert scores.shape == (2, 20)
    assert classes.shape == (2, 20)

    # artifact output must match the live function
    want = jax.jit(serve)(jnp.asarray(imgs))
    np.testing.assert_allclose(np.asarray(boxes), np.asarray(want[1]), rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(num_dets), np.asarray(want[0]))


def test_artifact_eval_adapter(tmp_path):
    """Evaler.init_artifact (the TRT-engine-eval analog) adapts the artifact
    outputs to the (dets, valid) interface."""
    from yolov6_tpu.core.evaler import Evaler

    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    serve = make_end2end_fn(
        model, variables, conf_thres=0.005, iou_thres=0.65, max_det=20,
        with_preprocess=False, half=False,
    )
    path = str(tmp_path / "m.stablehlo")
    export_stablehlo(serve, batch=2, img_size=(64, 64), path=path, input_dtype=jnp.float32)

    evaler = Evaler({"nc": 8, "names": list("abcdefgh"), "is_coco": False},
                    batch_size=2, img_size=64, max_det=20)
    evaler.init_artifact(path, num_classes=8)
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    dets, valid = evaler._infer(None, jnp.asarray(imgs))
    assert dets.shape == (2, 20, 6)
    assert valid.shape == (2, 20)
    # valid prefix equals reported num_dets
    want = jax.jit(serve)(jnp.asarray(imgs).astype(jnp.float32) / 255.0)
    np.testing.assert_array_equal(
        np.asarray(valid).sum(1), np.asarray(want[0])[:, 0]
    )


def test_sharded_gspmd_export_roundtrip(tmp_path):
    """GSPMD artifact (--shard-devices): batch sharded over the 8-device
    virtual mesh, outputs identical to the single-device artifact, and the
    Evaler adapter shards its input batches automatically."""
    from yolov6_tpu.core.evaler import Evaler
    from yolov6_tpu.parallel.mesh import batch_sharding, create_mesh

    n_dev = len(jax.devices())
    assert n_dev == 8, "tests expect the virtual 8-device CPU mesh"

    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    serve = make_end2end_fn(
        model, variables, conf_thres=0.005, iou_thres=0.65, max_det=20,
        with_preprocess=False, half=False,
    )
    path = str(tmp_path / "m8.stablehlo")
    export_stablehlo(serve, batch=8, img_size=(64, 64), path=path,
                     input_dtype=jnp.float32, shard_devices=n_dev)

    art = load_exported(path)
    assert art.nr_devices == n_dev

    imgs = np.random.default_rng(1).integers(0, 255, (8, 64, 64, 3), np.uint8)
    x = jnp.asarray(imgs, jnp.float32)
    sharded = jax.device_put(x, batch_sharding(create_mesh()))
    got = art.call(sharded)
    want = jax.jit(serve)(x)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), rtol=1e-5, atol=1e-5
    )

    evaler = Evaler({"nc": 8, "names": list("abcdefgh"), "is_coco": False},
                    batch_size=8, img_size=64, max_det=20)
    evaler.init_artifact(path, num_classes=8)
    assert evaler.mesh is not None
    dets, valid = evaler._infer(None, evaler._device_put(imgs))
    np.testing.assert_array_equal(
        np.asarray(valid).sum(1), np.asarray(want[0])[:, 0]
    )


def test_weights_as_args_export_roundtrip(tmp_path):
    """--weights-as-args artifact (module takes (variables, images) +
    weights sidecar): output-identical to the constants-embedded form, and
    load_serving/Evaler consume it transparently. This is the serving form
    for M6/L6-sized models whose constant-laden programs exceed
    remote-compile body limits (HTTP 413 through the axon tunnel;
    docs/Test_speed.md)."""
    from yolov6_tpu.core.evaler import Evaler
    from yolov6_tpu.models.end2end import load_serving

    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    serve_const = make_end2end_fn(
        model, variables, conf_thres=0.005, iou_thres=0.65, max_det=20,
        with_preprocess=False, half=False,
    )
    serve_args = make_end2end_fn(
        model, None, conf_thres=0.005, iou_thres=0.65, max_det=20,
        with_preprocess=False, half=False, weights_as_args=True,
    )
    path = str(tmp_path / "wa.stablehlo")
    export_stablehlo(serve_args, batch=2, img_size=(64, 64), path=path,
                     input_dtype=jnp.float32, weights=variables)
    assert (tmp_path / "wa.stablehlo.weights.msgpack").exists()

    art = load_serving(path)
    assert art.weights is not None
    assert len(art.exported.in_avals) > 1  # flattened weights + image
    imgs = np.random.default_rng(0).integers(0, 255, (2, 64, 64, 3), np.uint8)
    x = jnp.asarray(imgs, jnp.float32)
    got = art.call(x)
    want = jax.jit(serve_const)(x)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_allclose(
        np.asarray(got[1]), np.asarray(want[1]), rtol=1e-5, atol=1e-5
    )

    # a missing sidecar on a multi-input artifact must fail loudly
    import os

    os.rename(path + ".weights.msgpack", path + ".weights.msgpack.bak")
    with pytest.raises(FileNotFoundError):
        load_serving(path)
    os.rename(path + ".weights.msgpack.bak", path + ".weights.msgpack")

    # Evaler artifact eval (the TRT-engine-eval analog) loads the pair
    evaler = Evaler({"nc": 8, "names": list("abcdefgh"), "is_coco": False},
                    batch_size=2, img_size=64, max_det=20)
    evaler.init_artifact(path, num_classes=8)
    dets, valid = evaler._infer(None, jnp.asarray(imgs))
    np.testing.assert_array_equal(
        np.asarray(valid).sum(1), np.asarray(want[0])[:, 0]
    )
