"""Seeded-RNG parity of the random augmentations vs the reference: both
implementations consume python/numpy RNG in the same order, so identical
seeds must produce identical outputs."""

import random

import numpy as np
import pytest

import conftest

conftest.add_reference_to_path()
pytest.importorskip("torch")


def _img(h=120, w=160, seed=0):
    return np.random.default_rng(seed).integers(0, 255, (h, w, 3), np.uint8)


def test_random_affine_parity():
    from yolov6.data.data_augment import random_affine as ref_affine

    from yolov6_tpu.data.data_augment import random_affine

    img = _img()
    labels = np.array(
        [[0, 10, 20, 100, 90], [1, 40, 30, 150, 110]], np.float32
    )
    random.seed(7)
    got_img, got_lb = random_affine(
        img.copy(), labels.copy(), degrees=10, translate=0.1, scale=0.5,
        shear=2.0, new_shape=(128, 128),
    )
    random.seed(7)
    want_img, want_lb = ref_affine(
        img.copy(), labels.copy(), degrees=10, translate=0.1, scale=0.5,
        shear=2.0, new_shape=(128, 128),
    )
    np.testing.assert_array_equal(got_img, want_img)
    np.testing.assert_allclose(got_lb, want_lb, rtol=1e-6)


def test_augment_hsv_parity():
    from yolov6.data.data_augment import augment_hsv as ref_hsv

    from yolov6_tpu.data.data_augment import augment_hsv

    img1 = _img(seed=1)
    img2 = img1.copy()
    np.random.seed(3)
    augment_hsv(img1, 0.015, 0.7, 0.4)
    np.random.seed(3)
    ref_hsv(img2, 0.015, 0.7, 0.4)
    np.testing.assert_array_equal(img1, img2)


def test_mixup_parity():
    from yolov6.data.data_augment import mixup as ref_mixup

    from yolov6_tpu.data.data_augment import mixup

    a, b = _img(seed=2), _img(seed=3)
    la = np.array([[0, 1, 2, 3, 4]], np.float32)
    lb = np.array([[1, 5, 6, 7, 8]], np.float32)
    np.random.seed(11)
    gi, gl = mixup(a.copy(), la.copy(), b.copy(), lb.copy())
    np.random.seed(11)
    wi, wl = ref_mixup(a.copy(), la.copy(), b.copy(), lb.copy())
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_array_equal(gl, wl)


def test_mosaic_parity():
    from yolov6.data.data_augment import mosaic_augmentation as ref_mosaic

    from yolov6_tpu.data.data_augment import mosaic_augmentation

    imgs = [_img(100, 120, s) for s in range(4)]
    hs = [im.shape[0] for im in imgs]
    ws = [im.shape[1] for im in imgs]
    labels = [
        np.array([[s % 3, 0.5, 0.5, 0.4, 0.3]], np.float32) for s in range(4)
    ]
    hyp = dict(degrees=0.0, translate=0.1, scale=0.5, shear=0.0)
    random.seed(5)
    gi, gl = mosaic_augmentation(128, [i.copy() for i in imgs], hs, ws,
                                 [l.copy() for l in labels], hyp)
    random.seed(5)
    wi, wl = ref_mosaic(128, [i.copy() for i in imgs], hs, ws,
                        [l.copy() for l in labels], hyp)
    np.testing.assert_array_equal(gi, wi)
    np.testing.assert_allclose(gl, wl, rtol=1e-6)
