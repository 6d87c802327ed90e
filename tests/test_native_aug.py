"""Fused native train-augmentation kernel: parity with the Python/cv2 path.

The kernel (native/train_aug.cc) fuses mosaic compose + inverse-affine
bilinear warp + flips (+ optional HSV) into one pass; this file proves each
piece against the cv2 reference arithmetic the Python path uses
(data_augment.py — itself parity-tested against /root/reference in
tests/test_augment_parity.py), plus the __getitem__ routing of the native
path (data/native_aug.py, datasets.py).
"""

import os.path as osp
import random

import cv2
import numpy as np
import pytest
import yaml
from PIL import Image

import conftest  # noqa: F401

from yolov6_tpu import native
from yolov6_tpu.data.data_augment import (
    augment_hsv_rgb,
    get_transform_matrix,
    mosaic_placement,
)


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native library could not be built")
    return True


def _mosaic_canvas(imgs, place, th, tw):
    """The Python path's materialized 2Hx2W mosaic canvas (cv2 reference)."""
    canvas = np.full((th * 2, tw * 2, 3), 114, np.uint8)
    for i, im in enumerate(imgs):
        x1a, y1a, x2a, y2a, x1b, y1b = place[i]
        canvas[y1a:y2a, x1a:x2a] = im[y1b : y1b + (y2a - y1a), x1b : x1b + (x2a - x1a)]
    return canvas


def _random_mosaic_inputs(rng, th=96, tw=96):
    imgs, hs, ws = [], [], []
    for _ in range(4):
        h = int(rng.integers(th // 2, th + 1))
        w = int(rng.integers(tw // 2, tw + 1))
        imgs.append(rng.integers(0, 255, (h, w, 3), np.uint8))
        hs.append(h)
        ws.append(w)
    yc = int(rng.integers(th // 2, 3 * th // 2))
    xc = int(rng.integers(tw // 2, 3 * tw // 2))
    place = np.zeros((4, 6), np.int32)
    for i in range(4):
        x1a, y1a, x2a, y2a, x1b, y1b, _, _ = mosaic_placement(
            i, xc, yc, ws[i], hs[i], th, tw
        )
        place[i] = (x1a, y1a, x2a, y2a, x1b, y1b)
    return imgs, place


def test_warp_matches_cv2_on_mosaic(lib_available):
    """Fused mosaic+warp == cv2.warpAffine over the materialized canvas."""
    rng = np.random.default_rng(0)
    th = tw = 96
    for trial in range(5):
        imgs, place = _random_mosaic_inputs(rng, th, tw)
        M, _ = get_transform_matrix(
            (th * 2, tw * 2), (th, tw), degrees=10.0, scale=0.5, shear=2.0,
            translate=0.1,
        )
        canvas = _mosaic_canvas(imgs, place, th, tw)
        ref = cv2.warpAffine(canvas, M[:2], dsize=(tw, th), borderValue=(114, 114, 114))
        minv = np.linalg.inv(M)[:2].reshape(6)
        got = native.train_aug_native(imgs, place, minv, (th, tw))
        diff = np.abs(got.astype(int) - ref.astype(int))
        # cv2 warp uses 5-bit fixed-point interpolation; the kernel uses
        # float32 — they agree to the rounding grid
        assert np.percentile(diff, 99) <= 1, np.percentile(diff, 99)
        assert diff.max() <= 4, diff.max()


def test_identity_single_region_is_exact(lib_available):
    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, (64, 80, 3), np.uint8)
    place = np.array([[0, 0, 80, 64, 0, 0]], np.int32)
    minv = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    got = native.train_aug_native([im], place, minv, (64, 80))
    np.testing.assert_array_equal(got, im)


def test_flips_match_numpy(lib_available):
    rng = np.random.default_rng(2)
    im = rng.integers(0, 255, (64, 80, 3), np.uint8)
    place = np.array([[0, 0, 80, 64, 0, 0]], np.int32)
    minv = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    for flr, fud in [(True, False), (False, True), (True, True)]:
        got = native.train_aug_native(
            [im], place, minv, (64, 80), flip_lr=flr, flip_ud=fud
        )
        ref = im
        if fud:
            ref = np.flipud(ref)
        if flr:
            ref = np.fliplr(ref)
        np.testing.assert_array_equal(got, ref)


def test_hsv_rgb_matches_bgr_lut_reference(lib_available):
    """augment_hsv_rgb on an RGB buffer == the reference's BGR LUT pipeline
    (data_augment.py:13-26) on the same image in BGR order."""
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 255, (48, 64, 3), np.uint8)
    gains = (1.008, 1.35, 0.78)

    bgr = np.ascontiguousarray(rgb[:, :, ::-1])
    hue, sat, val = cv2.split(cv2.cvtColor(bgr, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=np.float64)
    lut_hue = ((x * gains[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * gains[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * gains[2], 0, 255).astype(np.uint8)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    ref_bgr = cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR)

    got = rgb.copy()
    augment_hsv_rgb(got, gains)
    np.testing.assert_array_equal(got, ref_bgr[:, :, ::-1])


def test_kernel_hsv_close_to_lut(lib_available):
    """The kernel's fused per-pixel HSV (float math) tracks the LUT path to
    the 8-bit rounding grid. (Production uses the LUT path after mixup; the
    fused path serves single-pass callers.)"""
    rng = np.random.default_rng(4)
    im = rng.integers(0, 255, (48, 64, 3), np.uint8)
    place = np.array([[0, 0, 64, 48, 0, 0]], np.int32)
    minv = np.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0])
    gains = (1.01, 0.8, 1.3)
    got = native.train_aug_native([im], place, minv, (48, 64), hsv_gains=gains)
    ref = im.copy()
    augment_hsv_rgb(ref, gains)
    diff = np.abs(got.astype(int) - ref.astype(int))
    # float HSV vs cv2's fixed-point LUT pipeline: agreement on the 8-bit
    # rounding grid for ~99% of pixels; hue-sector boundaries can disagree
    # by a few LSB under extreme gains like these (production gains are
    # drawn within ±1.5%/±70%/±40% of 1)
    assert np.percentile(diff, 99) <= 2, np.percentile(diff, 99)
    assert diff.mean() < 0.6, diff.mean()


def test_blend_matches_numpy_mixup(lib_available):
    rng = np.random.default_rng(5)
    a = rng.integers(0, 255, (32, 32, 3), np.uint8)
    b = rng.integers(0, 255, (32, 32, 3), np.uint8)
    r = 0.437
    ref = (a * r + b * (1 - r)).astype(np.uint8)
    got = a.copy()
    native.blend_native(got, b, r)
    np.testing.assert_array_equal(got, ref)


def test_decode_jpeg_resize_matches_cv2(lib_available, tmp_path):
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (97, 133, 3), np.uint8)
    # smooth it so JPEG ringing doesn't dominate the comparison
    arr = cv2.GaussianBlur(arr, (5, 5), 2)
    p = str(tmp_path / "t.jpg")
    cv2.imwrite(p, arr[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])

    ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    ref = cv2.resize(ref, (64, 48), interpolation=cv2.INTER_LINEAR)
    got = native.decode_jpeg_resize_native(p, 1, 48, 64)
    assert got is not None and got.shape == (48, 64, 3)
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert np.percentile(diff, 99) <= 2, np.percentile(diff, 99)

    # DCT-scaled decode: same content at 1/2 scale, then resized — agrees
    # with the full-resolution path to low-pass error
    got2 = native.decode_jpeg_resize_native(p, 2, 48, 64)
    assert got2 is not None and got2.shape == (48, 64, 3)
    assert np.abs(got2.astype(float) - ref.astype(float)).mean() < 6


def _write_train_dataset(root, n=8, size=(96, 72)):
    img_dir = root / "images" / "train"
    lb_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(7)
    for i in range(n):
        w, h = size
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(str(img_dir / f"{i:03d}.jpg"))
        (lb_dir / f"{i:03d}.txt").write_text("0 0.5 0.5 0.5 0.5\n1 0.3 0.3 0.2 0.2\n")
    return str(img_dir)


def _hyp(mosaic, mixup=0.0):
    return dict(
        mosaic=mosaic, mixup=mixup, hsv_h=0.015, hsv_s=0.7, hsv_v=0.4,
        degrees=5.0, translate=0.1, scale=0.5, shear=1.0, flipud=0.5, fliplr=0.5,
    )


@pytest.mark.parametrize("mosaic,mixup", [(1.0, 0.0), (1.0, 1.0), (0.0, 0.0)])
def test_getitem_native_path_valid(lib_available, tmp_path, mosaic, mixup):
    """__getitem__ through the fused native path: engages, and returns the
    same contract as the Python path (RGB u8 at target shape, labels
    normalized xywh in [0,1])."""
    from yolov6_tpu.data.datasets import TrainValDataset

    img_dir = _write_train_dataset(tmp_path)
    ds = TrainValDataset(
        img_dir, img_size=96, batch_size=4, augment=True, hyp=_hyp(mosaic, mixup),
        task="train", data_dict={"nc": 2, "names": ["a", "b"]},
    )
    assert ds._native_aug, "native path did not engage"
    random.seed(0)
    np.random.seed(0)
    for idx in range(4):
        img, labels, path, shapes = ds[idx]
        assert img.dtype == np.uint8 and img.shape == (96, 96, 3)
        if len(labels):
            assert labels[:, 1:].min() >= 0.0 and labels[:, 1:].max() <= 1.0
            assert set(np.unique(labels[:, 0])) <= {0.0, 1.0}


def test_getitem_native_off_matches_python_contract(tmp_path, monkeypatch):
    """YOLOV6_NATIVE_AUG=0 routes to the original cv2 path."""
    from yolov6_tpu.data.datasets import TrainValDataset

    monkeypatch.setenv("YOLOV6_NATIVE_AUG", "0")
    img_dir = _write_train_dataset(tmp_path)
    ds = TrainValDataset(
        img_dir, img_size=96, batch_size=4, augment=True, hyp=_hyp(1.0),
        task="train", data_dict={"nc": 2, "names": ["a", "b"]},
    )
    assert not ds._native_aug
    img, labels, _, _ = ds[0]
    assert img.dtype == np.uint8 and img.shape == (96, 96, 3)


def test_disk_cache_tier_roundtrip(lib_available, tmp_path):
    """cache_type='disk' fills per-image .npy blobs and serves identical
    pixels on the second read (mmap path)."""
    from yolov6_tpu.data.datasets import TrainValDataset

    img_dir = _write_train_dataset(tmp_path)
    ds = TrainValDataset(
        img_dir, img_size=96, batch_size=4, augment=True, hyp=_hyp(1.0),
        task="train", data_dict={"nc": 2, "names": ["a", "b"]},
        cache_type="disk",
    )
    first, hw0_a, hw_a = ds._load_image_rgb(0)
    first = np.array(first)
    assert osp.isdir(ds._disk_cache_dir)
    again, hw0_b, hw_b = ds._load_image_rgb(0)
    assert isinstance(again, np.memmap)
    np.testing.assert_array_equal(first, np.array(again))
    assert hw0_a == hw0_b and tuple(hw_a) == tuple(hw_b)
