#!/usr/bin/env python3
"""Standalone ONNX inference demo — zero framework deps at run time.

The analog of the reference's deploy/ONNX/OpenCV demos (reference:
deploy/ONNX/OpenCV/yolov6.py), showing that an exported ONNX artifact is a
complete, self-contained detector: numpy + cv2 only — no jax, no onnxruntime
(the in-repo pure-numpy interpreter executes the graph; swap `OnnxRunner`
for an `onnxruntime.InferenceSession` on machines that have it).

    python tools/export.py --weights best.msgpack --config configs/yolov6s.py \
        --format onnx --output model.onnx --cpu
    python tools/onnx_demo.py --model model.onnx --source img.jpg --save out.jpg
"""

from __future__ import annotations

import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import cv2
import numpy as np

from yolov6_tpu.core.inferer import Inferer
from yolov6_tpu.data.data_augment import letterbox
from yolov6_tpu.export.onnx_numpy import OnnxRunner


def numpy_nms(pred: np.ndarray, conf_thres: float, iou_thres: float,
              max_det: int = 300) -> np.ndarray:
    """Reference-semantics NMS on one image's [A, 5+nc] predictions
    (multi-label, class-offset greedy; reference utils/nms.py:31-105)."""
    scores = pred[:, 5:] * pred[:, 4:5]
    boxes = np.empty_like(pred[:, :4])
    boxes[:, 0] = pred[:, 0] - pred[:, 2] / 2
    boxes[:, 1] = pred[:, 1] - pred[:, 3] / 2
    boxes[:, 2] = pred[:, 0] + pred[:, 2] / 2
    boxes[:, 3] = pred[:, 1] + pred[:, 3] / 2
    ai, ci = np.nonzero(scores > conf_thres)
    if not len(ai):
        return np.zeros((0, 6), np.float32)
    rows = np.concatenate(
        [boxes[ai], scores[ai, ci][:, None], ci[:, None].astype(np.float32)], 1
    )
    off = rows[:, :4] + rows[:, 5:6] * 4096.0
    order = np.argsort(-rows[:, 4], kind="stable")
    areas = (off[:, 2] - off[:, 0]) * (off[:, 3] - off[:, 1])
    keep = []
    suppressed = np.zeros(len(rows), bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        if len(keep) >= max_det:
            break
        lt = np.maximum(off[i, :2], off[:, :2])
        rb = np.minimum(off[i, 2:], off[:, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
        suppressed |= inter / (areas[i] + areas - inter + 1e-12) > iou_thres
    return rows[keep]


def infer_frame(runner, img_src, h, w, conf_thres, iou_thres):
    """One frame through letterbox -> graph -> NMS -> source-pixel dets."""
    img = letterbox(img_src, (h, w), auto=False)[0]
    x = img[..., ::-1].astype(np.float32)[None] / 255.0  # BGR->RGB, NHWC
    outs = runner(x)
    if len(outs) == 4:  # end2end artifact: (num_dets, boxes, scores, classes)
        n = int(outs[0][0, 0])
        dets = np.concatenate(
            [outs[1][0, :n], outs[2][0, :n, None],
             outs[3][0, :n, None].astype(np.float32)], axis=1,
        )
    else:
        dets = numpy_nms(outs[0][0], conf_thres, iou_thres)
    if len(dets):
        dets[:, :4] = Inferer.rescale((h, w), dets[:, :4], img_src.shape[:2])
    return dets


def draw_dets(img_src, dets, names, verbose=True):
    for *xyxy, conf, cls in dets:
        label = (names[int(cls)] if names and int(cls) < len(names)
                 else f"class{int(cls)}")
        Inferer.plot_box_and_label(
            img_src, max(round(sum(img_src.shape) / 2 * 0.003), 2),
            np.asarray(xyxy), f"{label} {conf:.2f}",
            color=Inferer.generate_colors(int(cls), bgr=True),
        )
        if verbose:
            print(f"{label}: conf={conf:.3f} box={[round(float(v), 1) for v in xyxy]}")


def run_video(runner, h, w, args):
    """Per-frame video loop with FPS overlay + VideoWriter (the reference
    deploy/ONNX/OpenCV/yolo_video.py:60-130 analog)."""
    import time as _time

    cap = cv2.VideoCapture(args.source)
    assert cap.isOpened(), f"cannot open video {args.source}"
    fps = cap.get(cv2.CAP_PROP_FPS) or 25.0
    size = (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)))
    writer = None
    if args.save:
        writer = cv2.VideoWriter(
            args.save, cv2.VideoWriter_fourcc(*"mp4v"), fps, size)
    n_frames, n_dets, t0 = 0, 0, _time.perf_counter()
    while True:
        ok, frame = cap.read()
        if not ok or (args.max_frames and n_frames >= args.max_frames):
            break
        dets = infer_frame(runner, frame, h, w, args.conf_thres, args.iou_thres)
        draw_dets(frame, dets, args.class_names, verbose=False)
        cur_fps = (n_frames + 1) / (_time.perf_counter() - t0)
        cv2.putText(frame, f"FPS: {cur_fps:.1f}", (10, 25),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.7, (0, 255, 0), 2)
        if writer is not None:
            writer.write(frame)
        n_frames += 1
        n_dets += len(dets)
    cap.release()
    if writer is not None:
        writer.release()
        print(f"saved to {args.save}")
    print(f"{n_frames} frames, {n_dets} detections")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, help="ONNX file from tools/export.py")
    ap.add_argument("--source", required=True, help="input image or video")
    ap.add_argument("--save", default=None, help="output image/video path")
    ap.add_argument("--conf-thres", type=float, default=0.4)
    ap.add_argument("--iou-thres", type=float, default=0.45)
    ap.add_argument("--class-names", nargs="*", default=None)
    ap.add_argument("--video", action="store_true",
                    help="treat --source as a video: per-frame loop with "
                         "FPS overlay (reference yolo_video.py analog)")
    ap.add_argument("--max-frames", type=int, default=0,
                    help="video mode: stop after N frames (0 = all)")
    args = ap.parse_args()

    with open(args.model, "rb") as f:
        runner = OnnxRunner(f.read())
    _, _, in_shape = runner.model.inputs[0]
    h, w = int(in_shape[1]), int(in_shape[2])

    if args.video or osp.splitext(args.source)[-1].lower() in (
            ".mp4", ".avi", ".mov", ".mkv", ".webm"):
        run_video(runner, h, w, args)
        return

    img_src = cv2.imread(args.source)
    assert img_src is not None, f"cannot read {args.source}"
    dets = infer_frame(runner, img_src, h, w, args.conf_thres, args.iou_thres)
    draw_dets(img_src, dets, args.class_names)
    print(f"{len(dets)} detections")
    if args.save:
        cv2.imwrite(args.save, img_src)
        print(f"saved to {args.save}")


if __name__ == "__main__":
    main()
