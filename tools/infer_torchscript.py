"""NCNN-style runner for the exported TorchScript artifact.

Mirrors the reference's mobile-runtime inference flow
(reference: deploy/NCNN/infer-ncnn-model.py:103-262) with stock torch
standing in for the absent ncnn runtime: the same aspect-keeping resize +
centered 114-pad preprocessing (ncnn from_pixels_resize + copy_make_border),
graph execution via ``torch.jit.load`` on the ``*.torchscript.pt`` produced
by ``tools/export.py --format torchscript`` (the PNNX/NCNN entry point,
reference deploy/NCNN/export_torchscript.py), OpenCV NMSBoxes on the host,
and the reference's floor/ceil box clamping on rescale (:240-246).

One deliberate contract difference: the reference NCNN graph emits RAW
per-level maps and decodes them on the host (yolov6_decode, :103-149); our
TorchScript export already contains the decode tail (model+decode ->
[b, A, 5+nc], the reference TorchScript contract), so the host side starts
at the confidence filter. The traced graph is fixed-shape, so padding goes
to the full net square rather than the next stride multiple.

Usage:
    python tools/export.py --format torchscript --weights w.msgpack \
        --config configs/yolov6n.py --img-size 320
    python tools/infer_torchscript.py data/images/image1.jpg w.torchscript.pt
"""

from __future__ import annotations

import argparse
import math
import os
import os.path as osp
import sys

import cv2
import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

CONF_THRES = 0.45
IOU_THRES = 0.65


def parse_args():
    p = argparse.ArgumentParser("TorchScript NCNN-style runner")
    p.add_argument("img", help="image file")
    p.add_argument("model", help="TorchScript artifact (*.torchscript.pt)")
    p.add_argument("--out-dir", default="./output")
    p.add_argument("--img-size", nargs="+", type=int, default=[320, 320],
                   help="net input height and width (must match the export)")
    p.add_argument("--conf-thres", type=float, default=CONF_THRES)
    p.add_argument("--iou-thres", type=float, default=IOU_THRES)
    args = p.parse_args()
    if len(args.img_size) == 1:
        args.img_size = args.img_size * 2
    return args


def preprocess(img: np.ndarray, net_h: int, net_w: int):
    """ncnn-style preproc: scale the long side to net size, center-pad with
    114 (reference infer-ncnn-model.py:193-225). The traced graph is
    fixed-shape, so padding fills the full net square."""
    img_h, img_w = img.shape[:2]
    if img_w > img_h:
        scale = float(net_w) / img_w
        w, h = net_w, int(img_h * scale)
    else:
        scale = float(net_h) / img_h
        h, w = net_h, int(img_w * scale)
    resized = cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    wpad, hpad = net_w - w, net_h - h
    padded = cv2.copyMakeBorder(
        resized, hpad // 2, hpad - hpad // 2, wpad // 2, wpad - wpad // 2,
        cv2.BORDER_CONSTANT, value=(114, 114, 114))
    # BGR -> RGB, [0,1], NHWC float (the export contract)
    x = padded[:, :, ::-1].astype(np.float32) / 255.0
    return x[None], scale, wpad, hpad


def decode_predictions(preds: np.ndarray, conf_thres: float, iou_thres: float):
    """Confidence filter + class-aware OpenCV NMS on the decoded [A, 5+nc]
    output (reference NMSBoxesBatched flow, infer-ncnn-model.py:149-171)."""
    boxes_xywh = preds[:, :4]  # cx,cy,w,h in net pixels
    obj = preds[:, 4:5]
    cls = preds[:, 5:]
    scores_all = obj * cls
    labels = scores_all.argmax(-1)
    scores = scores_all.max(-1)
    m = scores > conf_thres
    if not m.any():
        return [], [], []
    boxes_xywh, scores, labels = boxes_xywh[m], scores[m], labels[m]
    # cv2 NMSBoxes wants x,y,w,h
    tl = boxes_xywh[:, :2] - boxes_xywh[:, 2:] / 2
    rects = [np.array([*tl[i], *boxes_xywh[i, 2:]], np.float32)
             for i in range(len(scores))]
    if hasattr(cv2.dnn, "NMSBoxesBatched"):
        keep = cv2.dnn.NMSBoxesBatched(
            rects, scores.tolist(), labels.tolist(), conf_thres, iou_thres)
    else:  # class-offset fallback for cv2 < 4.7
        off = max(1024.0, preds[:, 2:4].max() + 1.0)
        shifted = [r + np.array([labels[i] * off, labels[i] * off, 0, 0],
                                np.float32) for i, r in enumerate(rects)]
        keep = cv2.dnn.NMSBoxes(shifted, scores.tolist(), conf_thres, iou_thres)
    keep = np.asarray(keep).reshape(-1)
    out_boxes = []
    for i in keep:
        x0, y0, w, h = rects[i]
        out_boxes.append(np.array([x0, y0, x0 + w, y0 + h], np.float32))
    return out_boxes, [float(scores[i]) for i in keep], [int(labels[i]) for i in keep]


def run(img_path: str, model_path: str, img_size, conf_thres=CONF_THRES,
        iou_thres=IOU_THRES, out_dir: str | None = None):
    """Full single-image flow; returns [n, 6] xyxy/conf/cls in source pixels."""
    import torch

    net_h, net_w = img_size
    img = cv2.imread(img_path)
    if img is None:
        raise FileNotFoundError(img_path)
    img_h, img_w = img.shape[:2]
    x, scale, wpad, hpad = preprocess(img, net_h, net_w)

    module = torch.jit.load(model_path)
    with torch.no_grad():
        preds = module(torch.from_numpy(np.ascontiguousarray(x)))
    preds = np.asarray(preds[0] if isinstance(preds, (tuple, list)) else preds)
    boxes, scores, labels = decode_predictions(preds[0], conf_thres, iou_thres)

    dets = []
    draw = img.copy()
    for box, score, label in zip(boxes, scores, labels):
        # unpad + unscale with the reference's floor/ceil clamping (:240-246)
        x0 = math.floor(min(max((box[0] - wpad / 2) / scale, 1), img_w - 1))
        y0 = math.floor(min(max((box[1] - hpad / 2) / scale, 1), img_h - 1))
        x1 = math.ceil(min(max((box[2] - wpad / 2) / scale, 1), img_w - 1))
        y1 = math.ceil(min(max((box[3] - hpad / 2) / scale, 1), img_h - 1))
        dets.append([x0, y0, x1, y1, score, label])
        cv2.rectangle(draw, (x0, y0), (x1, y1), (0, 255, 0), 2)
        cv2.putText(draw, f"{label}: {score:.2f}", (x0, max(y0 - 5, 1)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 255), 2)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(osp.join(out_dir, osp.basename(img_path)), draw)
    return np.asarray(dets, np.float32).reshape(-1, 6)


def main(args):
    dets = run(args.img, args.model, args.img_size, args.conf_thres,
               args.iou_thres, args.out_dir)
    for x0, y0, x1, y1, score, label in dets:
        print(f"det class={int(label)} conf={score:.4f} "
              f"box={x0:.0f},{y0:.0f},{x1:.0f},{y1:.0f}")
    print(f"num_dets={len(dets)}")


if __name__ == "__main__":
    main(parse_args())
