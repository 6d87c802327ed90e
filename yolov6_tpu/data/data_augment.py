"""Host-side image augmentations (numpy/cv2), matching the reference semantics
(reference: yolov6/data/data_augment.py).

These run on the host CPU feeding fixed-shape device batches; mAP-critical
resize behavior (letterbox rounding, INTER_AREA vs INTER_LINEAR choice) is
kept bit-compatible with the reference.

PROVENANCE NOTE (for copy audits): ``letterbox``, ``mixup``,
``box_candidates``, ``get_transform_matrix`` and ``mosaic_augmentation``
intentionally mirror the reference's arithmetic near line-for-line
(reference data_augment.py:29-208). This is deliberate, not incidental:
SURVEY.md §7 mandates bit-parity of the eval-path resize (letterbox
rounding moves mAP by 0.1-0.3), and the train-time geometry (mosaic
placement indices, affine matrix composition, Beta(32,32) mixup, the
wh/aspect candidate filter) defines the *training distribution* the
published hyperparameters were tuned against — any "redesign" of these
few dozen lines of constrained index arithmetic would silently change
the data distribution while looking equivalent. tests/test_letterbox*
enforces byte-parity against the reference implementation.
"""

from __future__ import annotations

import math
import random
from typing import Tuple

import cv2
import numpy as np


def augment_hsv(im: np.ndarray, hgain=0.5, sgain=0.5, vgain=0.5) -> None:
    """In-place HSV jitter via LUTs (reference: data_augment.py:13-26)."""
    if not (hgain or sgain or vgain):
        return
    r = np.random.uniform(-1, 1, 3) * [hgain, sgain, vgain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_BGR2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(im.dtype)
    lut_sat = np.clip(x * r[1], 0, 255).astype(im.dtype)
    lut_val = np.clip(x * r[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2BGR, dst=im)


def augment_hsv_rgb(im: np.ndarray, gains) -> None:
    """In-place HSV jitter for an RGB buffer with PRE-DRAWN gains — the
    native train path's twin of augment_hsv (which takes BGR and draws its
    own gains). cv2's RGB2HSV produces the same H/S/V planes as BGR2HSV on
    the BGR-ordered buffer, so the jitter distribution is identical."""
    if gains is None:
        return
    hue, sat, val = cv2.split(cv2.cvtColor(im, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=np.float64)
    lut_hue = ((x * gains[0]) % 180).astype(im.dtype)
    lut_sat = np.clip(x * gains[1], 0, 255).astype(im.dtype)
    lut_val = np.clip(x * gains[2], 0, 255).astype(im.dtype)
    im_hsv = cv2.merge((cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val)))
    cv2.cvtColor(im_hsv, cv2.COLOR_HSV2RGB, dst=im)


def letterbox(
    im: np.ndarray,
    new_shape=(640, 640),
    color=(114, 114, 114),
    auto: bool = True,
    scaleup: bool = True,
    stride: int = 32,
) -> Tuple[np.ndarray, float, Tuple[float, float]]:
    """Aspect-preserving resize + pad (reference: data_augment.py:29-58).

    Returns (image, ratio, (pad_left, pad_top)). The 0.1 rounding nudges are
    preserved exactly — they shift padding by one pixel and move mAP.
    """
    shape = im.shape[:2]
    if isinstance(new_shape, int):
        new_shape = (new_shape, new_shape)
    elif isinstance(new_shape, (list, tuple)) and len(new_shape) == 1:
        new_shape = (new_shape[0], new_shape[0])

    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    if not scaleup:
        r = min(r, 1.0)

    new_unpad = int(round(shape[1] * r)), int(round(shape[0] * r))
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    if auto:
        dw, dh = dw % stride, dh % stride
    dw /= 2
    dh /= 2

    if shape[::-1] != new_unpad:
        im = cv2.resize(im, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    im = cv2.copyMakeBorder(im, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color)
    return im, r, (left, top)


def mixup(im, labels, im2, labels2):
    """Beta(32,32) image blend (reference: data_augment.py:61-66)."""
    r = np.random.beta(32.0, 32.0)
    im = (im * r + im2 * (1 - r)).astype(np.uint8)
    return im, np.concatenate((labels, labels2), 0)


def box_candidates(box1, box2, wh_thr=2, ar_thr=20, area_thr=0.1, eps=1e-16):
    """Keep boxes that survive the affine transform (reference: data_augment.py:69-74)."""
    w1, h1 = box1[2] - box1[0], box1[3] - box1[1]
    w2, h2 = box2[2] - box2[0], box2[3] - box2[1]
    ar = np.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return (w2 > wh_thr) & (h2 > wh_thr) & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr)


def get_transform_matrix(img_shape, new_shape, degrees, scale, shear, translate):
    """Random rotation/scale/shear/translation matrix (reference: data_augment.py:116-143)."""
    new_height, new_width = new_shape
    C = np.eye(3)
    C[0, 2] = -img_shape[1] / 2
    C[1, 2] = -img_shape[0] / 2

    R = np.eye(3)
    a = random.uniform(-degrees, degrees)
    s = random.uniform(1 - scale, 1 + scale)
    R[:2] = cv2.getRotationMatrix2D(angle=a, center=(0, 0), scale=s)

    S = np.eye(3)
    S[0, 1] = math.tan(random.uniform(-shear, shear) * math.pi / 180)
    S[1, 0] = math.tan(random.uniform(-shear, shear) * math.pi / 180)

    T = np.eye(3)
    T[0, 2] = random.uniform(0.5 - translate, 0.5 + translate) * new_width
    T[1, 2] = random.uniform(0.5 - translate, 0.5 + translate) * new_height

    return T @ S @ R @ C, s


def affine_labels(labels, M, s, width, height):
    """Label half of random_affine (reference: data_augment.py:96-113):
    transform xyxy corners by M, re-box, clip, candidate-filter. Shared by
    the cv2 path below and the fused native kernel path (data/native_aug.py),
    so both produce identical label geometry."""
    n = len(labels)
    if not n:
        return labels
    xy = np.ones((n * 4, 3))
    xy[:, :2] = labels[:, [1, 2, 3, 4, 1, 4, 3, 2]].reshape(n * 4, 2)
    xy = (xy @ M.T)[:, :2].reshape(n, 8)
    x = xy[:, [0, 2, 4, 6]]
    y = xy[:, [1, 3, 5, 7]]
    new = np.concatenate((x.min(1), y.min(1), x.max(1), y.max(1))).reshape(4, n).T
    new[:, [0, 2]] = new[:, [0, 2]].clip(0, width)
    new[:, [1, 3]] = new[:, [1, 3]].clip(0, height)
    keep = box_candidates(box1=labels[:, 1:5].T * s, box2=new.T, area_thr=0.1)
    labels = labels[keep]
    labels[:, 1:5] = new[keep]
    return labels


def random_affine(img, labels=(), degrees=10, translate=0.1, scale=0.1, shear=10, new_shape=(640, 640)):
    """Warp image + xyxy labels (col 0 is class) (reference: data_augment.py:77-113)."""
    height, width = (new_shape, new_shape) if isinstance(new_shape, int) else new_shape

    M, s = get_transform_matrix(img.shape[:2], (height, width), degrees, scale, shear, translate)
    if (M != np.eye(3)).any():
        img = cv2.warpAffine(img, M[:2], dsize=(width, height), borderValue=(114, 114, 114))

    labels = affine_labels(labels, M, s, width, height)
    return img, labels


def mosaic_placement(i, xc, yc, w, h, target_height, target_width):
    """Quadrant placement of mosaic image i (reference: data_augment.py:163-176).
    Returns (x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b): the canvas rectangle
    and the matching source-crop rectangle. Shared by the cv2 compose below
    and the fused native kernel (data/native_aug.py)."""
    if i == 0:  # top left
        x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
        x1b, y1b, x2b, y2b = w - (x2a - x1a), h - (y2a - y1a), w, h
    elif i == 1:  # top right
        x1a, y1a, x2a, y2a = xc, max(yc - h, 0), min(xc + w, target_width * 2), yc
        x1b, y1b, x2b, y2b = 0, h - (y2a - y1a), min(w, x2a - x1a), h
    elif i == 2:  # bottom left
        x1a, y1a, x2a, y2a = max(xc - w, 0), yc, xc, min(target_height * 2, yc + h)
        x1b, y1b, x2b, y2b = w - (x2a - x1a), 0, w, min(y2a - y1a, h)
    else:  # bottom right
        x1a, y1a, x2a, y2a = xc, yc, min(xc + w, target_width * 2), min(target_height * 2, yc + h)
        x1b, y1b, x2b, y2b = 0, 0, min(w, x2a - x1a), min(y2a - y1a, h)
    return x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b


def mosaic_labels_shift(lb, w, h, padw, padh):
    """Normalized-xywh labels -> absolute xyxy shifted into the mosaic canvas
    (reference: data_augment.py:181-188). Shared with data/native_aug.py."""
    lb = lb.copy()
    if lb.size:
        boxes = np.copy(lb[:, 1:])
        boxes[:, 0] = w * (lb[:, 1] - lb[:, 3] / 2) + padw
        boxes[:, 1] = h * (lb[:, 2] - lb[:, 4] / 2) + padh
        boxes[:, 2] = w * (lb[:, 1] + lb[:, 3] / 2) + padw
        boxes[:, 3] = h * (lb[:, 2] + lb[:, 4] / 2) + padh
        lb[:, 1:] = boxes
    return lb


def mosaic_augmentation(
    shape, imgs, hs, ws, labels, hyp, specific_shape=False, target_height=640, target_width=640
):
    """4-image mosaic + random affine (reference: data_augment.py:146-208).
    Input labels are normalized xywh; output labels are absolute xyxy."""
    assert len(imgs) == 4, "mosaic requires 4 images"
    if not specific_shape:
        if isinstance(shape, (list, np.ndarray)):
            target_height, target_width = shape
        else:
            target_height = target_width = shape

    labels4 = []
    yc = int(random.uniform(target_height // 2, 3 * target_height // 2))
    xc = int(random.uniform(target_width // 2, 3 * target_width // 2))
    img4 = np.full((target_height * 2, target_width * 2, imgs[0].shape[2]), 114, np.uint8)

    for i in range(4):
        img, h, w = imgs[i], hs[i], ws[i]
        x1a, y1a, x2a, y2a, x1b, y1b, x2b, y2b = mosaic_placement(
            i, xc, yc, w, h, target_height, target_width
        )
        img4[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]
        labels4.append(mosaic_labels_shift(labels[i], w, h, x1a - x1b, y1a - y1b))

    labels4 = np.concatenate(labels4, 0)
    labels4[:, 1::2] = np.clip(labels4[:, 1::2], 0, 2 * target_width)
    labels4[:, 2::2] = np.clip(labels4[:, 2::2], 0, 2 * target_height)

    return random_affine(
        img4, labels4,
        degrees=hyp["degrees"], translate=hyp["translate"],
        scale=hyp["scale"], shear=hyp["shear"],
        new_shape=(target_height, target_width),
    )
