"""Inferer coverage: construction from a native checkpoint, the jitted
device path, and the full per-frame loop (reference: yolov6/core/inferer.py
+ tools/infer.py).

Also extends the no-weight-embedding regression (ROADMAP "axon caveat") to
the Inferer: its jitted ``_infer`` must take variables as an ARGUMENT, not
close over them as HLO constants.
"""

import os.path as osp

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov6_tpu.core.inferer import Inferer
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.checkpoint import save_checkpoint
from yolov6_tpu.utils.config import Config

IMG = 64
NC = 3


@pytest.fixture(scope="module")
def infer_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("inferer")
    # one synthetic image (blocky content so JPEG round-trips cleanly)
    rng = np.random.default_rng(0)
    img = np.kron(
        rng.integers(0, 255, (12, 16, 3), np.uint8), np.ones((8, 8, 1), np.uint8)
    )
    src_dir = root / "imgs"
    src_dir.mkdir()
    cv2.imwrite(str(src_dir / "a.jpg"), img)

    yaml_path = root / "data.yaml"
    yaml_path.write_text(f"nc: {NC}\nnames: ['a', 'b', 'c']\n")

    cfg_path = "configs/yolov6n.py"
    model = build_model(Config.fromfile(cfg_path), num_classes=NC, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False
    )
    ckpt_path = save_checkpoint(
        {"model": jax.device_get(variables)}, False, str(root), "tiny"
    )

    inferer = Inferer(
        source=str(src_dir), webcam=False, webcam_addr="0",
        weights=ckpt_path, config=cfg_path, yaml_path=str(yaml_path),
        img_size=IMG, half=False,
    )
    return inferer, root


def test_infer_jit_carries_no_weight_constants(infer_setup):
    inferer, _ = infer_setup
    n_bytes = sum(
        v.size * v.dtype.itemsize
        for v in jax.tree_util.tree_leaves(inferer.variables)
    )
    assert n_bytes > 4_000_000  # big enough that embedding would be visible
    lowered = inferer._infer.lower(
        inferer.variables,
        jax.ShapeDtypeStruct((1, IMG, IMG, 3), jnp.uint8),
        0.25, 0.45, 30, False, None,
    )
    text = lowered.as_text()
    assert len(text) < n_bytes, (
        f"lowered infer module is {len(text)} chars — weights appear to be "
        f"embedded as constants instead of passed as jit arguments"
    )


@pytest.mark.slow
def test_infer_end_to_end(infer_setup, tmp_path):
    inferer, _ = infer_setup
    save_dir = str(tmp_path)
    # conf below the head's prior-prob bias init (~0.01) so the untrained
    # model yields detections and the drawing/txt paths actually execute
    inferer.infer(
        conf_thres=0.005, iou_thres=0.45, classes=None, agnostic_nms=False,
        max_det=30, save_dir=save_dir, save_txt=True, save_img=True,
        hide_labels=False, hide_conf=False, view_img=False,
    )
    out_img = osp.join(save_dir, "a.jpg")
    assert osp.exists(out_img)
    assert cv2.imread(out_img) is not None
    txt = osp.join(save_dir, "labels", "a.txt")
    assert osp.exists(txt)
    rows = [l.split() for l in open(txt).read().strip().splitlines()]
    assert rows and all(len(r) == 6 for r in rows)
    for r in rows:
        cls, x, y, w, h, conf = map(float, r)
        assert 0 <= cls < NC and 0 <= conf <= 1
        assert 0 <= x <= 1 and 0 <= y <= 1


@pytest.mark.slow
def test_infer_video_file(infer_setup, tmp_path):
    """Video branch of the per-frame loop (reference: inferer.py:116-159):
    frame iteration, FPS overlay, VideoWriter output. Letterboxing to the
    same 64x64 input reuses the image test's compiled graph."""
    from yolov6_tpu.data.datasets import LoadData

    inferer, root = infer_setup
    vid_path = root / "clip.mp4"
    writer = cv2.VideoWriter(
        str(vid_path), cv2.VideoWriter_fourcc(*"mp4v"), 5, (80, 48)
    )
    if not writer.isOpened():
        pytest.skip("cv2 built without video IO")
    rng = np.random.default_rng(1)
    for _ in range(3):
        writer.write(np.kron(rng.integers(0, 255, (6, 10, 3), np.uint8),
                             np.ones((8, 8, 1), np.uint8)))
    writer.release()
    cap = cv2.VideoCapture(str(vid_path))
    ok = cap.isOpened() and cap.read()[0]
    cap.release()
    if not ok:
        pytest.skip("cv2 cannot read back the written video")

    inferer.files = LoadData(str(vid_path), False, "0")
    inferer.source = str(vid_path)
    save_dir = str(tmp_path)
    inferer.infer(
        conf_thres=0.005, iou_thres=0.45, classes=None, agnostic_nms=False,
        max_det=30, save_dir=save_dir, save_txt=False, save_img=True,
        hide_labels=False, hide_conf=False, view_img=False,
    )
    out = osp.join(save_dir, "clip.mp4")
    assert osp.exists(out)
    cap = cv2.VideoCapture(out)
    assert cap.isOpened() and cap.read()[0]
    cap.release()
