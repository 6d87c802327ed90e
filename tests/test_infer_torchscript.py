"""NCNN-style TorchScript runner (tools/infer_torchscript.py): export a
deploy-mode yolov6n TorchScript artifact and run the full image -> ncnn-style
preproc -> torch.jit forward -> host NMS -> rescale flow end-to-end on the
repo sample images (reference flow: deploy/NCNN/infer-ncnn-model.py:103-262,
with stock torch standing in for the absent ncnn runtime)."""

import importlib.util
import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401  (forces the CPU backend)

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.export.torch_export import export_torchscript
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config

torch = pytest.importorskip("torch")

IMG = 128
NC = 8


def _load_runner():
    spec = importlib.util.spec_from_file_location(
        "infer_torchscript", "/root/repo/tools/infer_torchscript.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """Deploy-mode yolov6n (random init) exported to *.torchscript.pt."""
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=NC, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)

    def fwd(images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    x = np.zeros((1, IMG, IMG, 3), np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),),
                       input_names=["images"], output_names=["outputs"])
    path = str(tmp_path_factory.mktemp("ts") / "yolov6n.torchscript.pt")
    export_torchscript(data, (x,), path)
    return path, fwd


def test_runner_end_to_end(artifact, tmp_path):
    runner = _load_runner()
    path, fwd = artifact
    img_path = "/root/repo/data/images/image1.jpg"
    # untrained head: cls scores sit at the prior-prob init (~sigmoid(-4.6)
    # ≈ 0.01); conf below that makes the run non-vacuous
    dets = runner.run(img_path, path, (IMG, IMG), conf_thres=0.005,
                      iou_thres=0.65, out_dir=str(tmp_path))
    assert dets.shape[1] == 6
    assert len(dets) > 0, "no detections — the check is vacuous"
    import cv2

    src = cv2.imread(img_path)
    h, w = src.shape[:2]
    assert (dets[:, 0] >= 0).all() and (dets[:, 1] >= 0).all()
    assert (dets[:, 2] <= w).all() and (dets[:, 3] <= h).all()
    assert ((dets[:, 5] >= 0) & (dets[:, 5] < NC)).all()
    # the annotated image was written (reference runner writes to out-dir)
    assert osp.exists(osp.join(str(tmp_path), osp.basename(img_path)))

    # runtime parity: the torch graph must agree with the source JAX graph
    # on the exact preprocessed input the runner fed it
    x, *_ = runner.preprocess(src, IMG, IMG)
    want = np.asarray(fwd(jnp.asarray(x)))
    module = torch.jit.load(path)
    with torch.no_grad():
        got = module(torch.from_numpy(np.ascontiguousarray(x))).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_preprocess_matches_ncnn_semantics():
    """Long side -> net size, short side scaled + centered 114 pad
    (reference infer-ncnn-model.py:193-218)."""
    runner = _load_runner()
    img = np.full((60, 120, 3), 200, np.uint8)
    x, scale, wpad, hpad = runner.preprocess(img, 128, 128)
    assert x.shape == (1, 128, 128, 3)
    assert scale == pytest.approx(128 / 120)
    assert wpad == 0 and hpad == 128 - int(60 * 128 / 120)
    # pad rows are 114 (RGB of BGR(114,114,114)), content rows are not
    pad_val = 114 / 255.0
    assert np.allclose(x[0, 0], pad_val, atol=1e-6)
    assert not np.allclose(x[0, 64], pad_val, atol=1e-2)
