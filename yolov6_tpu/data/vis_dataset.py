"""Dataset label visualizer (reference: yolov6/data/vis_dataset.py)."""

from __future__ import annotations

import argparse
import os
import os.path as osp

import cv2
import numpy as np


def visualize(img_dir: str, label_dir: str, out_dir: str, class_names=None, max_images=20):
    os.makedirs(out_dir, exist_ok=True)
    imgs = sorted(
        f for f in os.listdir(img_dir)
        if f.rsplit(".", 1)[-1].lower() in ("jpg", "jpeg", "png", "bmp")
    )[:max_images]
    rng = np.random.default_rng(0)
    colors = rng.integers(0, 255, (len(class_names or []) or 80, 3))
    for name in imgs:
        img = cv2.imread(osp.join(img_dir, name))
        h, w = img.shape[:2]
        lb_path = osp.join(label_dir, name.rsplit(".", 1)[0] + ".txt")
        if osp.exists(lb_path):
            with open(lb_path) as f:
                for line in f:
                    vals = line.split()
                    if len(vals) != 5:
                        continue
                    cls, cx, cy, bw, bh = float(vals[0]), *map(float, vals[1:])
                    x1, y1 = int((cx - bw / 2) * w), int((cy - bh / 2) * h)
                    x2, y2 = int((cx + bw / 2) * w), int((cy + bh / 2) * h)
                    color = tuple(int(c) for c in colors[int(cls) % len(colors)])
                    cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
                    label = class_names[int(cls)] if class_names else str(int(cls))
                    cv2.putText(img, label, (x1, max(y1 - 4, 10)),
                                cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
        cv2.imwrite(osp.join(out_dir, name), img)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--label_dir", required=True)
    parser.add_argument("--out_dir", default="vis_out")
    args = parser.parse_args()
    visualize(args.img_dir, args.label_dir, args.out_dir)


if __name__ == "__main__":
    main()
