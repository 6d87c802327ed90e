"""Dataset scan robustness: EXIF-orientation shapes, corrupt-JPEG restore,
shape caching, and decode-free rect setup (reference: datasets.py:306-556)."""

import json
import os.path as osp

import cv2
import numpy as np
import pytest
import yaml
from PIL import Image

from yolov6_tpu.data.datasets import TrainValDataset, check_image


def _write_dataset(root, n=6, size=(64, 48), exif_orient=None, corrupt_idx=None):
    img_dir = root / "images" / "val"
    lb_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        w, h = size
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        path = img_dir / f"{i:03d}.jpg"
        im = Image.fromarray(arr)
        if exif_orient is not None and i == 0:
            exif = Image.Exif()
            exif[0x0112] = exif_orient
            im.save(str(path), exif=exif)
        else:
            im.save(str(path))
        if corrupt_idx is not None and i == corrupt_idx:
            data = path.read_bytes()
            assert data[-2:] == b"\xff\xd9"
            path.write_bytes(data[:-2])  # strip EOI marker
        (lb_dir / f"{i:03d}.txt").write_text("0 0.5 0.5 0.4 0.4\n")
    return str(img_dir)


def test_check_image_exif_shape_matches_cv2(tmp_path):
    """EXIF orientation 6/8 swaps the recorded (w, h) to what cv2.imread
    (which applies EXIF on decode) actually produces."""
    img_dir = _write_dataset(tmp_path, n=1, size=(64, 48), exif_orient=6)
    path = osp.join(img_dir, "000.jpg")
    shape, msg = check_image(path, full_check=True)
    decoded = cv2.imread(path)
    assert decoded.shape[:2] == (shape[1], shape[0])  # (h, w)
    assert shape == (48, 64)  # rotated: w/h swapped


def test_check_image_restores_corrupt_jpeg(tmp_path):
    img_dir = _write_dataset(tmp_path, n=1, corrupt_idx=0)
    path = osp.join(img_dir, "000.jpg")
    shape, msg = check_image(path, full_check=True)
    assert "restored" in msg
    with open(path, "rb") as f:
        f.seek(-2, 2)
        assert f.read() == b"\xff\xd9"
    assert cv2.imread(path) is not None
    # idempotent: second check is clean
    shape2, msg2 = check_image(path, full_check=True)
    assert msg2 == "" and shape2 == shape


def test_scan_caches_shapes_and_rect_needs_no_decode(tmp_path, monkeypatch):
    img_dir = _write_dataset(tmp_path, n=6, size=(64, 48))
    data_dict = {"nc": 1, "names": ["a"], "is_coco": True}
    ds = TrainValDataset(img_dir, img_size=64, batch_size=2, task="val",
                         data_dict=data_dict, check_images=True)
    assert ds.shapes.shape == (6, 2)
    assert (ds.shapes == np.array([64, 48], float)).all()

    cache = osp.join(str(tmp_path), "images", ".val.tpu_cache.json")
    with open(cache) as f:
        data = json.load(f)
    assert data["version"] == 2
    assert all("shape" in v for v in data["labels"].values())

    # warm start + rect: shapes come from the cache — ANY decode is a bug
    def boom(*a, **k):
        raise AssertionError("cv2.imread called during rect setup")

    monkeypatch.setattr(cv2, "imread", boom)
    ds2 = TrainValDataset(img_dir, img_size=64, batch_size=2, task="val",
                          rect=True, data_dict=dict(data_dict))
    assert ds2.batch_shapes is not None
    assert len(ds2.batch_shapes) == 3


def test_coco_gt_generation_uses_cached_shapes(tmp_path, monkeypatch):
    img_dir = _write_dataset(tmp_path, n=4, size=(40, 30))
    data_dict = {"nc": 1, "names": ["a"], "is_coco": False}
    ds = TrainValDataset(img_dir, img_size=64, batch_size=2, task="val",
                         data_dict=data_dict)
    with open(data_dict["anno_path"]) as f:
        gt = json.load(f)
    assert all(im["width"] == 40 and im["height"] == 30 for im in gt["images"])
    assert len(gt["annotations"]) == 4


def test_stale_v1_cache_invalidated(tmp_path):
    img_dir = _write_dataset(tmp_path, n=2)
    # fabricate an old-format cache with the right hash but no shapes
    from yolov6_tpu.data.datasets import get_hash, img2label_paths

    img_paths = sorted(
        osp.join(img_dir, f) for f in ("000.jpg", "001.jpg")
    )
    key = get_hash(img_paths + img2label_paths(img_paths))
    cache = osp.join(str(tmp_path), "images", ".val.tpu_cache.json")
    with open(cache, "w") as f:
        json.dump({"hash": key, "labels": {p: [[0, 0.5, 0.5, 0.4, 0.4]] for p in img_paths}}, f)
    ds = TrainValDataset(img_dir, img_size=64, batch_size=2, task="val",
                         data_dict={"nc": 1, "names": ["a"], "is_coco": True})
    assert ds.shapes.shape == (2, 2) and (ds.shapes > 0).all()


def test_prefetch_to_device_order_and_errors():
    """prefetch_to_device: preserves batch order and trailing fields in both
    the threaded (dedicated transfer thread — through the axon tunnel
    device_put blocks the caller) and inline modes, and re-raises producer
    exceptions in the consumer."""
    from yolov6_tpu.data.data_load import prefetch_to_device

    batches = [
        (np.full((2, 4, 4, 3), i, np.uint8),
         np.zeros((2, 3, 5), np.float32), f"p{i}", None, 2)
        for i in range(7)
    ]
    for mode in (True, False):
        out = list(prefetch_to_device(iter(batches), n_prefetch=2, thread=mode))
        assert len(out) == 7
        for i, item in enumerate(out):
            assert int(np.asarray(item[0])[0, 0, 0, 0]) == i
            assert item[2] == f"p{i}" and item[4] == 2

    def gen():
        yield batches[0]
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError, match="boom"):
        list(prefetch_to_device(gen(), thread=True))
