"""Synthetic detection dataset generator for the end-to-end learning gate.

Draws saturated colored shapes (circle / square / triangle / ring) on
low-frequency textured backgrounds, in YOLO-txt format with a data.yaml —
the same on-disk layout `TrainValDataset` scans (reference
yolov6/data/datasets.py:306-450). The task is deliberately easy: with a
working loader -> assigner -> loss -> optimizer -> EMA -> evaler chain,
yolov6n at reduced resolution reaches mAP50 well above chance within a few
hundred steps. This is the in-repo stand-in for the blocked real-COCO mAP
gate (no dataset/weights in this environment; see ROADMAP.md).
"""

from __future__ import annotations

import os
import os.path as osp

import cv2
import numpy as np

CLASS_NAMES = ["circle", "square", "triangle", "ring"]
# Saturated BGR fills, chosen to survive the default HSV jitter
# (hsv_h=0.015 barely moves hue; s/v gains keep colors distinct).
_COLORS = [(40, 40, 230), (40, 200, 40), (230, 80, 40), (40, 210, 230)]


def _background(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Smooth random gradient + mild noise: textured but featureless."""
    lo = rng.integers(40, 120, 3)
    hi = rng.integers(120, 220, 3)
    gy = np.linspace(0, 1, h)[:, None, None]
    gx = np.linspace(0, 1, w)[None, :, None]
    t = gy * rng.uniform() + gx * (1 - rng.uniform())
    img = lo + (hi - lo) * np.clip(t, 0, 1)
    img = img + rng.normal(0, 8, (h, w, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def _draw_shape(img: np.ndarray, cls: int, cx: int, cy: int, r: int) -> tuple:
    """Draw one shape; returns its tight xyxy box in pixels."""
    color = _COLORS[cls]
    if cls == 0:  # circle
        cv2.circle(img, (cx, cy), r, color, -1, cv2.LINE_AA)
        return cx - r, cy - r, cx + r, cy + r
    if cls == 1:  # axis-aligned square
        cv2.rectangle(img, (cx - r, cy - r), (cx + r, cy + r), color, -1)
        return cx - r, cy - r, cx + r, cy + r
    if cls == 2:  # upright triangle
        pts = np.array([[cx, cy - r], [cx - r, cy + r], [cx + r, cy + r]])
        cv2.fillPoly(img, [pts], color, cv2.LINE_AA)
        return cx - r, cy - r, cx + r, cy + r
    # ring (annulus): thick circle outline
    th = max(2, r // 3)
    cv2.circle(img, (cx, cy), r - th // 2, color, th, cv2.LINE_AA)
    return cx - r, cy - r, cx + r, cy + r


def _iou(a, b) -> float:
    ix = max(0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / max(ua, 1e-9)


def generate_split(img_dir: str, lb_dir: str, n: int, img_size: int,
                   nc: int, rng: np.random.Generator, prefix: str) -> None:
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lb_dir, exist_ok=True)
    for i in range(n):
        h = w = img_size
        img = _background(rng, h, w)
        boxes, rows = [], []
        for _ in range(int(rng.integers(1, 4))):
            cls = int(rng.integers(0, nc))
            r = int(rng.uniform(0.10, 0.22) * img_size)
            cx = int(rng.uniform(r + 2, w - r - 2))
            cy = int(rng.uniform(r + 2, h - r - 2))
            box = (cx - r, cy - r, cx + r, cy + r)
            if any(_iou(box, b) > 0.15 for b in boxes):
                continue
            box = _draw_shape(img, cls, cx, cy, r)
            boxes.append(box)
            x0, y0, x1, y1 = (max(0, box[0]), max(0, box[1]),
                              min(w, box[2]), min(h, box[3]))
            rows.append(
                f"{cls} {(x0 + x1) / 2 / w:.6f} {(y0 + y1) / 2 / h:.6f} "
                f"{(x1 - x0) / w:.6f} {(y1 - y0) / h:.6f}"
            )
        cv2.imwrite(osp.join(img_dir, f"{prefix}{i:05d}.jpg"), img,
                    [cv2.IMWRITE_JPEG_QUALITY, 95])
        with open(osp.join(lb_dir, f"{prefix}{i:05d}.txt"), "w") as f:
            f.write("\n".join(rows) + ("\n" if rows else ""))


def generate_synth_dataset(root: str, n_train: int = 256, n_val: int = 64,
                           img_size: int = 320, nc: int = 4,
                           seed: int = 0) -> str:
    """Generate train/val splits + data.yaml under ``root``; returns the
    data.yaml path. Layout mirrors the reference YOLO format
    (images/{train,val}, labels/{train,val})."""
    import yaml

    nc = min(nc, len(CLASS_NAMES))
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        generate_split(
            osp.join(root, "images", split), osp.join(root, "labels", split),
            n, img_size, nc, rng, split,
        )
    data_yaml = osp.join(root, "data.yaml")
    with open(data_yaml, "w") as f:
        yaml.safe_dump({
            "train": osp.join(root, "images", "train"),
            "val": osp.join(root, "images", "val"),
            "nc": nc, "names": CLASS_NAMES[:nc], "is_coco": False,
        }, f)
    return data_yaml
