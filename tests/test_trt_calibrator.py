"""TRT int8 calibration stream + cache IO (quant/trt_calibrator.py,
reference deploy/TensorRT/calibrator.py:28-104): batch layout/exhaustion,
letterbox-NCHW preprocessing parity, cache round-trip against the QDQ
exporter's writer, and the vendor gate."""

import numpy as np
import pytest

import conftest  # noqa: F401

from yolov6_tpu.export.onnx_quant import save_calib_cache_file
from yolov6_tpu.quant.trt_calibrator import (
    CalibrationDataLoader,
    make_calibrator,
    process_image,
    read_calib_cache_file,
)


@pytest.fixture
def calib_dir(tmp_path):
    import cv2

    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (50 + 10 * i, 80, 3), np.uint8)
        cv2.imwrite(str(tmp_path / f"img{i}.jpg"), img)
    return str(tmp_path)


def test_stream_batches_and_exhaustion(calib_dir):
    dl = CalibrationDataLoader(batch_size=2, batch_num=3, calib_img_dir=calib_dir,
                               input_w=64, input_h=64)
    assert len(dl) == 3
    seen = 0
    while True:
        b = dl.next_batch()
        if not b.size:
            break
        assert b.shape == (2, 3, 64, 64) and b.dtype == np.float32
        assert 0.0 <= b.min() and b.max() <= 1.0
        seen += 1
    assert seen == 3
    dl.reset()
    assert dl.next_batch().size  # restartable


def test_stream_requires_enough_images(calib_dir):
    with pytest.raises(ValueError, match="at least 14 images"):
        CalibrationDataLoader(2, 7, calib_dir, 64, 64)


def test_process_image_matches_letterbox():
    """NCHW/RGB/255 of the reference letterbox output (calibrator.py:63-71)."""
    from yolov6_tpu.data.data_augment import letterbox

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (48, 70, 3), np.uint8)
    got = process_image(img, [64, 64])
    want = letterbox(img, [64, 64], auto=False)[0]
    want = want.transpose(2, 0, 1)[::-1].astype(np.float32) / 255.0
    np.testing.assert_array_equal(got, want)


def test_cache_roundtrip(tmp_path):
    """read_calib_cache_file inverts the QDQ exporter's writer, including
    names containing ': ' lookalikes."""
    import struct

    amap = {
        "conv1_out": struct.pack(">f", np.float32(0.0123)).hex(),
        "odd: name": struct.pack(">f", np.float32(2.5)).hex(),
    }
    path = tmp_path / "c.cache"
    save_calib_cache_file(str(path), amap)
    back = read_calib_cache_file(str(path))
    assert back["conv1_out"] == pytest.approx(np.float32(0.0123))
    assert back["odd: name"] == pytest.approx(2.5)
    assert path.read_text().startswith("TRT-8XXX-EntropyCalibration2\n")


def test_vendor_gate(calib_dir, monkeypatch):
    import sys

    monkeypatch.setitem(sys.modules, "tensorrt", None)
    dl = CalibrationDataLoader(2, 3, calib_dir, 64, 64)
    with pytest.raises(RuntimeError, match="not installed"):
        make_calibrator(dl, "x.cache")
