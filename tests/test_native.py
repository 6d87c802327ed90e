"""Native C++ host ops: build, and parity with the Python/cv2 reference paths."""

import numpy as np
import pytest

import conftest

from yolov6_tpu import native


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def test_native_nms_matches_python(lib_available):
    rng = np.random.default_rng(0)
    n = 300
    xy = rng.uniform(0, 200, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 60, (n, 2)).astype(np.float32)
    dets = np.concatenate(
        [xy, xy + wh, rng.uniform(0, 1, (n, 1)).astype(np.float32),
         rng.integers(0, 4, (n, 1)).astype(np.float32)], 1
    )
    for agnostic in (False, True):
        keep_c = native.nms_native(dets, 0.5, agnostic, 100)
        # force the Python fallback
        lib = native._lib
        native._lib = None
        orig_path = native._LIB_PATH
        native._LIB_PATH = "/nonexistent"
        try:
            keep_py = native.nms_native(dets, 0.5, agnostic, 100)
        finally:
            native._lib = lib
            native._LIB_PATH = orig_path
        np.testing.assert_array_equal(keep_c, keep_py)


def test_native_letterbox_matches_cv2(lib_available):
    from yolov6_tpu.data.data_augment import letterbox

    rng = np.random.default_rng(1)
    for (h, w) in [(480, 640), (640, 480), (123, 457)]:
        im = rng.integers(0, 255, (h, w, 3), np.uint8)
        out_c, r_c, pad_c = native.letterbox_native(im, (320, 320), scaleup=False)
        out_py, r_py, pad_py = letterbox(im, (320, 320), auto=False, scaleup=False)
        assert out_c.shape == out_py.shape
        assert abs(r_c - r_py) < 1e-6
        assert pad_c == pad_py
        # interpolation differs from cv2's fixed-point path by at most ~2 LSB
        diff = np.abs(out_c.astype(int) - out_py.astype(int))
        assert np.percentile(diff, 99) <= 2, f"p99 diff {np.percentile(diff, 99)}"


def test_native_normalize(lib_available):
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (32, 48, 3), np.uint8)
    out = native.normalize_rgb_native(im)
    np.testing.assert_allclose(out, im[..., ::-1].astype(np.float32) / 255.0, rtol=1e-6)


def test_native_jpeg_decode_matches_cv2(tmp_path):
    """libjpeg decode is pixel-identical to cv2's for baseline JPEGs."""
    import cv2
    import numpy as np

    from yolov6_tpu.native import available, decode_jpeg_native

    if not available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (123, 77, 3), np.uint8)
    p = str(tmp_path / "x.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 92])
    got = decode_jpeg_native(p)
    want = cv2.imread(p)[..., ::-1]  # BGR -> RGB
    np.testing.assert_array_equal(got, want)


def test_native_batch_decode_letterbox(tmp_path):
    """Threaded batch decode+letterbox == per-image native letterbox; failed
    paths fill with pad and are counted."""
    import cv2
    import numpy as np
    import pytest

    from yolov6_tpu.native import (
        available,
        batch_decode_letterbox_native,
        decode_jpeg_native,
        letterbox_native,
    )

    if not available():
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(1)
    paths = []
    for i in range(6):
        h, w = int(rng.integers(50, 200)), int(rng.integers(50, 200))
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, rng.integers(0, 255, (h, w, 3), np.uint8))
        paths.append(p)
    paths.append(str(tmp_path / "missing.jpg"))

    batch, ratios, pads, src_hw, failed = batch_decode_letterbox_native(
        paths, (128, 128), scaleup=False, n_threads=4
    )
    assert failed == 1
    assert batch.shape == (7, 128, 128, 3)
    assert (batch[-1] == 114).all()  # failed slot = pad
    for i in range(6):
        im = decode_jpeg_native(paths[i])
        want, r, (px, py) = letterbox_native(im, (128, 128), scaleup=False)
        np.testing.assert_array_equal(batch[i], want)
        assert ratios[i] == pytest.approx(r)
        assert tuple(pads[i]) == (px, py)
        assert tuple(src_hw[i]) == im.shape[:2]

