"""Box geometry ops as pure jnp functions.

Functional equivalents of the reference box math
(reference: yolov6/utils/general.py:32-86, yolov6/utils/figure_iou.py:7-127),
written shape-polymorphic over leading batch dims so they vmap/jit cleanly.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xywh2xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] center-size -> corner format."""
    cx, cy, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([cx - w * 0.5, cy - h * 0.5, cx + w * 0.5, cy + h * 0.5], -1)


def xyxy2xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] corner -> center-size format."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], -1)


def dist2bbox(distance: jnp.ndarray, anchor_points: jnp.ndarray, box_format: str = "xyxy") -> jnp.ndarray:
    """ltrb distances (from anchor point) -> boxes (reference: utils/general.py:32-43)."""
    lt, rb = jnp.split(distance, 2, axis=-1)
    x1y1 = anchor_points - lt
    x2y2 = anchor_points + rb
    if box_format == "xyxy":
        return jnp.concatenate([x1y1, x2y2], -1)
    if box_format == "xywh":
        return jnp.concatenate([(x1y1 + x2y2) * 0.5, x2y2 - x1y1], -1)
    raise ValueError(box_format)


def bbox2dist(anchor_points: jnp.ndarray, bbox: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """xyxy boxes -> clipped ltrb distances (reference: utils/general.py:46-52)."""
    x1y1, x2y2 = jnp.split(bbox, 2, axis=-1)
    dist = jnp.concatenate([anchor_points - x1y1, x2y2 - anchor_points], -1)
    return jnp.clip(dist, 0, reg_max - 0.01)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Pairwise IoU of [N,4] x [M,4] xyxy boxes -> [N,M] (reference: utils/general.py:64-86)."""
    lt = jnp.maximum(box1[..., :, None, :2], box2[..., None, :, :2])
    rb = jnp.minimum(box1[..., :, None, 2:], box2[..., None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
    union = box_area(box1)[..., :, None] + box_area(box2)[..., None, :] - inter
    return inter / (union + eps)


def pairwise_bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, box_format: str = "xywh") -> jnp.ndarray:
    """Pairwise IoU used by the fuse-AB loss (reference: utils/figure_iou.py:105-127)."""
    if box_format == "xywh":
        box1 = xywh2xyxy(box1)
        box2 = xywh2xyxy(box2)
    return box_iou(box1, box2)


def elementwise_box_iou(
    box1: jnp.ndarray,
    box2: jnp.ndarray,
    iou_type: str = "giou",
    box_format: str = "xyxy",
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Element-wise IoU menu: iou/giou/diou/ciou/siou over [..., 4] boxes.

    Numerically matches the reference ``IOUloss`` geometry, including its
    eps placement — eps is added to the *heights* and to the union
    (reference: utils/figure_iou.py:49-92). The returned value is the IoU
    variant itself (the loss is ``1 - value``).
    """
    if box_format == "xywh":
        box1 = xywh2xyxy(box1)
        box2 = xywh2xyxy(box2)
    b1x1, b1y1, b1x2, b1y2 = (box1[..., i] for i in range(4))
    b2x1, b2y1, b2x2, b2y2 = (box2[..., i] for i in range(4))

    iw = jnp.clip(jnp.minimum(b1x2, b2x2) - jnp.maximum(b1x1, b2x1), 0, None)
    ih = jnp.clip(jnp.minimum(b1y2, b2y2) - jnp.maximum(b1y1, b2y1), 0, None)
    inter = iw * ih
    w1, h1 = b1x2 - b1x1, b1y2 - b1y1 + eps
    w2, h2 = b2x2 - b2x1, b2y2 - b2y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    cw = jnp.maximum(b1x2, b2x2) - jnp.minimum(b1x1, b2x1)
    ch = jnp.maximum(b1y2, b2y2) - jnp.minimum(b1y1, b2y1)

    if iou_type == "iou":
        return iou
    if iou_type == "giou":
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    if iou_type in ("diou", "ciou"):
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2x1 + b2x2 - b1x1 - b1x2) ** 2 + (b2y1 + b2y2 - b1y1 - b1y2) ** 2) / 4
        if iou_type == "diou":
            return iou - rho2 / c2
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    if iou_type == "siou":
        # SIoU (reference: utils/figure_iou.py:75-92): angle, distance, shape costs.
        s_cw = (b2x1 + b2x2 - b1x1 - b1x2) * 0.5 + eps
        s_ch = (b2y1 + b2y2 - b1y1 - b1y2) * 0.5 + eps
        sigma = jnp.sqrt(s_cw**2 + s_ch**2)
        sin_alpha_1 = jnp.abs(s_cw) / sigma
        sin_alpha_2 = jnp.abs(s_ch) / sigma
        threshold = 2**0.5 / 2
        sin_alpha = jnp.where(sin_alpha_1 > threshold, sin_alpha_2, sin_alpha_1)
        angle_cost = jnp.cos(jnp.arcsin(sin_alpha) * 2 - math.pi / 2)
        rho_x = (s_cw / cw) ** 2
        rho_y = (s_ch / ch) ** 2
        gamma = angle_cost - 2
        distance_cost = 2 - jnp.exp(gamma * rho_x) - jnp.exp(gamma * rho_y)
        omiga_w = jnp.abs(w1 - w2) / jnp.maximum(w1, w2)
        omiga_h = jnp.abs(h1 - h2) / jnp.maximum(h1, h2)
        shape_cost = jnp.power(1 - jnp.exp(-omiga_w), 4) + jnp.power(1 - jnp.exp(-omiga_h), 4)
        return iou - 0.5 * (distance_cost + shape_cost)
    raise ValueError(f"unknown iou_type {iou_type!r}")


def iou_loss(pred: jnp.ndarray, target: jnp.ndarray, iou_type: str = "giou", box_format: str = "xyxy") -> jnp.ndarray:
    """1 - IoU-variant, element-wise (reference: utils/figure_iou.py IOUloss)."""
    return 1.0 - elementwise_box_iou(pred, target, iou_type=iou_type, box_format=box_format)
