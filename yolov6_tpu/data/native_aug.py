"""Native fused train-augmentation path.

Pixel work (mosaic compose + affine warp + HSV jitter + flips) runs in ONE
pass in C++ (native/train_aug.cc); every random parameter is drawn HERE with
the reference's exact distributions (reference data_augment.py:99-208,
datasets.py general_augment), and label geometry is the same numpy math as
the cv2 path (shared helpers in data_augment.py) — so the native path is
distribution-identical and label-exact, while pixels match the cv2 path to
interpolation rounding (see tests/test_native_aug.py).

Color order: this path works in RGB end-to-end (the native decoder emits
RGB), removing the Python path's final BGR->RGB copy. HSV jitter uses proper
RGB formulas, which is equivalent to the reference's cv2 BGR<->HSV on BGR
buffers.
"""

from __future__ import annotations

import random
from typing import List, Optional, Tuple

import numpy as np

from yolov6_tpu import native
from yolov6_tpu.data.data_augment import (
    affine_labels,
    get_transform_matrix,
    mosaic_labels_shift,
    mosaic_placement,
)


def available() -> bool:
    return native.available()


def draw_hsv_gains(hyp: dict) -> Optional[Tuple[float, float, float]]:
    """The reference's HSV gain draw (data_augment.py:13-26)."""
    hgain = hyp.get("hsv_h", 0.015)
    sgain = hyp.get("hsv_s", 0.7)
    vgain = hyp.get("hsv_v", 0.4)
    if not (hgain or sgain or vgain):
        return None
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    return float(r[0]), float(r[1]), float(r[2])


def draw_flips(hyp: dict) -> Tuple[bool, bool]:
    """flipud/fliplr decisions (reference datasets.py general_augment)."""
    flip_ud = random.random() < hyp.get("flipud", 0.0)
    flip_lr = random.random() < hyp.get("fliplr", 0.5)
    return flip_lr, flip_ud


def mosaic_affine_native(
    shape,
    imgs: List[np.ndarray],
    hs: List[int],
    ws: List[int],
    labels: List[np.ndarray],
    hyp: dict,
    specific_shape: bool = False,
    target_height: int = 640,
    target_width: int = 640,
    hsv_gains: Optional[Tuple[float, float, float]] = None,
    flip_lr: bool = False,
    flip_ud: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused-native mosaic_augmentation analog (same parameter distributions
    as reference data_augment.py:146-208). imgs are RGB u8, pre-resized by
    load_image. Returns (img [th, tw, 3] RGB u8, labels absolute xyxy).

    HSV/flips are applied to PIXELS here (fused); the caller flips LABELS
    after normalization, exactly like the cv2 path's general_augment.
    """
    assert len(imgs) == 4, "mosaic requires 4 images"
    if not specific_shape:
        if isinstance(shape, (list, np.ndarray)):
            target_height, target_width = shape
        else:
            target_height = target_width = shape

    labels4 = []
    yc = int(random.uniform(target_height // 2, 3 * target_height // 2))
    xc = int(random.uniform(target_width // 2, 3 * target_width // 2))

    place = np.zeros((4, 6), np.int32)
    for i in range(4):
        h, w = hs[i], ws[i]
        x1a, y1a, x2a, y2a, x1b, y1b, _, _ = mosaic_placement(
            i, xc, yc, w, h, target_height, target_width
        )
        place[i] = (x1a, y1a, x2a, y2a, x1b, y1b)
        labels4.append(mosaic_labels_shift(labels[i], w, h, x1a - x1b, y1a - y1b))

    labels4 = np.concatenate(labels4, 0)
    labels4[:, 1::2] = np.clip(labels4[:, 1::2], 0, 2 * target_width)
    labels4[:, 2::2] = np.clip(labels4[:, 2::2], 0, 2 * target_height)

    # affine over the virtual 2x canvas (reference random_affine on img4)
    M, s = get_transform_matrix(
        (target_height * 2, target_width * 2),
        (target_height, target_width),
        hyp["degrees"], hyp["scale"], hyp["shear"], hyp["translate"],
    )
    minv = np.linalg.inv(M)[:2].reshape(6)

    img = native.train_aug_native(
        imgs, place, minv, (target_height, target_width),
        hsv_gains=hsv_gains, flip_lr=flip_lr, flip_ud=flip_ud,
    )
    out_labels = affine_labels(labels4, M, s, target_width, target_height)
    return img, out_labels


def affine_hsv_native(
    img: np.ndarray,
    labels: np.ndarray,
    degrees: float,
    translate: float,
    scale: float,
    shear: float,
    new_shape,
    hsv_gains: Optional[Tuple[float, float, float]] = None,
    flip_lr: bool = False,
    flip_ud: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Fused-native random_affine analog for the non-mosaic train branch
    (reference data_augment.py:77-113 + general_augment HSV/flips). img is
    RGB u8 (typically letterboxed); labels are absolute xyxy with class in
    col 0."""
    height, width = (new_shape, new_shape) if isinstance(new_shape, int) else new_shape
    M, s = get_transform_matrix(img.shape[:2], (height, width), degrees, scale, shear, translate)
    minv = np.linalg.inv(M)[:2].reshape(6)
    place = np.array([[0, 0, img.shape[1], img.shape[0], 0, 0]], np.int32)
    out = native.train_aug_native(
        [img], place, minv, (height, width),
        hsv_gains=hsv_gains, flip_lr=flip_lr, flip_ud=flip_ud,
    )
    labels = affine_labels(labels, M, s, width, height)
    return out, labels
