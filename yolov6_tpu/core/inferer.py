"""Single-image/video/webcam inference + visualization
(reference: yolov6/core/inferer.py).

The device path (normalize -> forward -> decode -> NMS) is one jit function;
letterboxing and drawing stay on the host.
"""

from __future__ import annotations

import math
import os
import os.path as osp
from collections import deque
from pathlib import Path
from typing import Optional

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from yolov6_tpu.data.data_augment import letterbox
from yolov6_tpu.data.datasets import LoadData
from yolov6_tpu.models.effidehead import decode_eval
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.ops.nms import non_max_suppression
from yolov6_tpu.utils.checkpoint import load_checkpoint_variables
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER, load_yaml


class Inferer:
    def __init__(
        self,
        source: str,
        webcam: bool,
        webcam_addr: str,
        weights: str,
        config: str,
        yaml_path: str,
        img_size,
        half: bool,
    ):
        self.img_size = [img_size, img_size] if isinstance(img_size, int) else list(img_size)
        self.half = half

        data = load_yaml(yaml_path)
        self.class_names = data["names"]
        nc = data["nc"]

        cfg = Config.fromfile(config)
        self.model = build_model(cfg, num_classes=nc, deploy=True,
                                 dtype=jnp.bfloat16 if half else jnp.float32)
        self.variables = load_checkpoint_variables(
            weights, self.model, img_size=tuple(self.img_size), deploy=True,
            training_mode=cfg.get("training_mode", "repvgg"),
        )
        self.stride = max(self.model.strides)

        self.webcam = webcam
        self.webcam_addr = webcam_addr
        self.files = LoadData(source, webcam, webcam_addr)
        self.source = source

        dtype = jnp.bfloat16 if half else jnp.float32

        def _infer(variables, imgs_u8, conf_thres, iou_thres, max_det, agnostic, class_mask):
            x = imgs_u8.astype(dtype) / dtype(255.0)
            head_out, _ = self.model.apply(variables, x, train=False)
            preds = decode_eval(
                head_out, self.model.num_classes, self.model.strides,
                self.model.use_dfl, self.model.reg_max,
            )
            return non_max_suppression(
                preds, conf_thres, iou_thres, max_det=max_det, max_nms=2000,
                multi_label=False, agnostic=agnostic, class_mask=class_mask,
            )

        self._infer = jax.jit(_infer, static_argnames=("conf_thres", "iou_thres", "max_det", "agnostic"))

    def process_image(self, img_src):
        """Letterbox + RGB + uint8 NHWC (reference: inferer.py:161-171)."""
        image = letterbox(img_src, self.img_size, auto=False, stride=self.stride)[0]
        image = np.ascontiguousarray(image[:, :, ::-1])  # BGR->RGB, HWC
        return image[None]

    @staticmethod
    def rescale(ori_shape, boxes, target_shape):
        """Letterboxed boxes -> source-image coords (reference: inferer.py:173-188)."""
        ratio = min(ori_shape[0] / target_shape[0], ori_shape[1] / target_shape[1])
        padding = (ori_shape[1] - target_shape[1] * ratio) / 2, (ori_shape[0] - target_shape[0] * ratio) / 2
        boxes = boxes.copy()
        boxes[:, [0, 2]] -= padding[0]
        boxes[:, [1, 3]] -= padding[1]
        boxes[:, :4] /= ratio
        boxes[:, 0] = boxes[:, 0].clip(0, target_shape[1])
        boxes[:, 1] = boxes[:, 1].clip(0, target_shape[0])
        boxes[:, 2] = boxes[:, 2].clip(0, target_shape[1])
        boxes[:, 3] = boxes[:, 3].clip(0, target_shape[0])
        return boxes

    def infer(
        self,
        conf_thres: float,
        iou_thres: float,
        classes,
        agnostic_nms: bool,
        max_det: int,
        save_dir: str,
        save_txt: bool,
        save_img: bool,
        hide_labels: bool,
        hide_conf: bool,
        view_img: bool = False,
    ):
        """Per-frame loop (reference: inferer.py:70-159)."""
        class_mask = None
        if classes is not None:
            mask = np.zeros(len(self.class_names), np.float32)
            mask[np.asarray(classes)] = 1.0
            class_mask = jnp.asarray(mask)

        vid_path, vid_writer, windows = None, None, []
        fps_calculator = CalcFPS()
        for img_src, img_path, vid_cap in self.files:
            img = self.process_image(img_src)
            t1 = cv2.getTickCount()
            dets, valid = self._infer(
                self.variables, jnp.asarray(img), conf_thres, iou_thres, max_det,
                agnostic_nms, class_mask,
            )
            dets = np.asarray(dets[0])[np.asarray(valid[0])]
            t2 = cv2.getTickCount()
            fps_calculator.update(cv2.getTickFrequency() / (t2 - t1))
            avg_fps = fps_calculator.accumulate()

            if self.webcam:
                save_path = osp.join(save_dir, self.webcam_addr)
                txt_path = osp.join(save_dir, self.webcam_addr)
            else:
                rel_path = osp.relpath(osp.dirname(img_path), osp.dirname(self.source)) \
                    if not osp.isfile(self.source) else ""
                save_path = osp.join(save_dir, rel_path, osp.basename(img_path))
                txt_path = osp.join(save_dir, rel_path, "labels", osp.splitext(osp.basename(img_path))[0])
                os.makedirs(osp.dirname(save_path), exist_ok=True)

            gn = np.array(img_src.shape)[[1, 0, 1, 0]]
            img_ori = img_src.copy()
            if len(dets):
                dets[:, :4] = self.rescale(img.shape[1:3], dets[:, :4], img_src.shape[:2])
                for *xyxy, conf, cls in reversed(dets):
                    if save_txt:
                        xywh = (self.box_convert(np.array(xyxy).reshape(1, 4)) / gn).reshape(-1).tolist()
                        os.makedirs(osp.dirname(txt_path), exist_ok=True)
                        with open(txt_path + ".txt", "a") as f:
                            f.write(("%g " * 6).rstrip() % (cls, *xywh, conf) + "\n")
                    if save_img:
                        class_num = int(cls)
                        label = None if hide_labels else (
                            self.class_names[class_num] if hide_conf
                            else f"{self.class_names[class_num]} {conf:.2f}"
                        )
                        self.plot_box_and_label(
                            img_ori, max(round(sum(img_ori.shape) / 2 * 0.003), 2),
                            xyxy, label, color=self.generate_colors(class_num, True),
                        )
            if self.files.type == "video":
                self.draw_text(img_ori, f"FPS: {avg_fps:0.1f}", pos=(20, 20),
                               font_scale=1.0, text_color=(204, 85, 17),
                               text_color_bg=(255, 255, 255), font_thickness=2)
            if view_img:
                cv2.imshow(str(img_path), img_ori)
                cv2.waitKey(1)
            if save_img:
                if self.files.type == "image":
                    cv2.imwrite(save_path, img_ori)
                else:
                    if vid_path != save_path:
                        vid_path = save_path
                        if isinstance(vid_writer, cv2.VideoWriter):
                            vid_writer.release()
                        if vid_cap:
                            fps = vid_cap.get(cv2.CAP_PROP_FPS)
                            w = int(vid_cap.get(cv2.CAP_PROP_FRAME_WIDTH))
                            h = int(vid_cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
                        else:
                            fps, w, h = 30, img_ori.shape[1], img_ori.shape[0]
                        save_path = str(Path(save_path).with_suffix(".mp4"))
                        vid_writer = cv2.VideoWriter(
                            save_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
                        )
                    vid_writer.write(img_ori)

    @staticmethod
    def box_convert(x):
        y = np.copy(x)
        y[:, 0] = (x[:, 0] + x[:, 2]) / 2
        y[:, 1] = (x[:, 1] + x[:, 3]) / 2
        y[:, 2] = x[:, 2] - x[:, 0]
        y[:, 3] = x[:, 3] - x[:, 1]
        return y

    @staticmethod
    def draw_text(img, text, font=cv2.FONT_HERSHEY_SIMPLEX, pos=(0, 0), font_scale=1,
                  font_thickness=2, text_color=(0, 255, 0), text_color_bg=(0, 0, 0)):
        offset = (5, 5)
        x, y = pos
        text_size, _ = cv2.getTextSize(text, font, font_scale, font_thickness)
        text_w, text_h = text_size
        rec_start = tuple(x - y for x, y in zip(pos, offset))
        rec_end = tuple(x + y for x, y in zip((x + text_w, y + text_h), offset))
        cv2.rectangle(img, rec_start, rec_end, text_color_bg, -1)
        cv2.putText(img, text, (x, int(y + text_h + font_scale - 1)), font, font_scale,
                    text_color, font_thickness, cv2.LINE_AA)
        return text_size

    @staticmethod
    def plot_box_and_label(image, lw, box, label="", color=(128, 128, 128),
                           txt_color=(255, 255, 255), font=cv2.FONT_HERSHEY_COMPLEX):
        p1, p2 = (int(box[0]), int(box[1])), (int(box[2]), int(box[3]))
        cv2.rectangle(image, p1, p2, color, thickness=lw, lineType=cv2.LINE_AA)
        if label:
            tf = max(lw - 1, 1)
            w, h = cv2.getTextSize(label, 0, fontScale=lw / 3, thickness=tf)[0]
            outside = p1[1] - h - 3 >= 0
            p2 = p1[0] + w, p1[1] - h - 3 if outside else p1[1] + h + 3
            cv2.rectangle(image, p1, p2, color, -1, cv2.LINE_AA)
            cv2.putText(image, label, (p1[0], p1[1] - 2 if outside else p1[1] + h + 2),
                        font, lw / 3, txt_color, thickness=tf, lineType=cv2.LINE_AA)

    @staticmethod
    def generate_colors(i, bgr=False):
        hex_colors = (
            "FF3838", "FF9D97", "FF701F", "FFB21D", "CFD231", "48F90A", "92CC17",
            "3DDB86", "1A9334", "00D4BB", "2C99A8", "00C2FF", "344593", "6473FF",
            "0018EC", "8438FF", "520085", "CB38FF", "FF95C8", "FF37C7",
        )
        palette = []
        for c in hex_colors:
            palette.append(tuple(int(f"0x{c[i:i + 2]}", 16) for i in (0, 2, 4)))
        num = len(palette)
        color = palette[int(i) % num]
        return (color[2], color[1], color[0]) if bgr else color


class CalcFPS:
    """50-sample FPS EMA (reference: inferer.py:284-295)."""

    def __init__(self, nsamples: int = 50):
        self.framerate = deque(maxlen=nsamples)

    def update(self, duration: float):
        self.framerate.append(duration)

    def accumulate(self):
        if len(self.framerate) > 1:
            return float(np.average(self.framerate))
        return 0.0
