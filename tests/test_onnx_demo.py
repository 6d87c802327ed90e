"""Standalone OpenCV/numpy ONNX demo (tools/onnx_demo.py): image mode and
the per-frame video mode (reference deploy/ONNX/OpenCV/yolo.py:149 and
yolo_video.py:130 analogs) run end-to-end on an exported artifact."""

import importlib.util
import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config

IMG, NC = 96, 4


def _load_demo():
    spec = importlib.util.spec_from_file_location(
        "onnx_demo", "/root/repo/tools/onnx_demo.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def onnx_artifact(tmp_path_factory):
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=NC, deploy=True)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)

    def fwd(x):
        h, _ = model.apply(v, x, train=False)
        return model.apply(v, h, method=model.decode)

    data = export_onnx(fwd, (jnp.zeros((1, IMG, IMG, 3), jnp.float32),),
                       input_names=["images"], output_names=["outputs"])
    path = tmp_path_factory.mktemp("demo") / "m.onnx"
    path.write_bytes(data)
    return str(path)


def test_image_mode(onnx_artifact, tmp_path, monkeypatch, capsys):
    demo = _load_demo()
    out = tmp_path / "out.jpg"
    monkeypatch.setattr("sys.argv", [
        "onnx_demo", "--model", onnx_artifact,
        "--source", "/root/repo/data/images/image1.jpg",
        "--save", str(out),
        # untrained prior-prob scores ~0.01: low conf keeps it non-vacuous
        "--conf-thres", "0.005",
    ])
    demo.main()
    assert out.exists()
    text = capsys.readouterr().out
    n_dets = int(text.splitlines()[-2].split()[0])
    assert n_dets > 0, text.splitlines()[-2]


def test_video_mode(onnx_artifact, tmp_path, monkeypatch, capsys):
    import cv2

    src = tmp_path / "in.mp4"
    writer = cv2.VideoWriter(str(src), cv2.VideoWriter_fourcc(*"mp4v"),
                             10.0, (120, 80))
    rng = np.random.default_rng(0)
    for _ in range(5):
        writer.write(rng.integers(0, 255, (80, 120, 3), np.uint8))
    writer.release()

    demo = _load_demo()
    out = tmp_path / "out.mp4"
    monkeypatch.setattr("sys.argv", [
        "onnx_demo", "--model", onnx_artifact, "--source", str(src),
        "--save", str(out), "--conf-thres", "0.005", "--max-frames", "3",
    ])
    demo.main()
    text = capsys.readouterr().out
    assert "3 frames" in text
    assert out.exists() and out.stat().st_size > 0
    cap = cv2.VideoCapture(str(out))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 3
    cap.release()
