"""Anchor-based auxiliary loss for fuse-AB training
(reference: yolov6/models/losses/loss_fuseab.py).

Differences from the main loss: 'ab' anchors (3 per cell), TAL topk=26, no
DFL, box decode = xywh offsets around anchor points, and the
target_scores_sum>0 denominator guard (the main loss uses >1)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov6_tpu.assigners.anchor_generator import generate_anchors
from yolov6_tpu.assigners.tal_assigner import task_aligned_assigner
from yolov6_tpu.losses.loss import varifocal_loss
from yolov6_tpu.ops.boxes import elementwise_box_iou, xywh2xyxy


class ComputeLossAB:
    def __init__(
        self,
        fpn_strides=(8, 16, 32),
        grid_cell_size=5.0,
        grid_cell_offset=0.5,
        num_classes=80,
        ori_img_size=640,
        iou_type="giou",
        anchors_init: Tuple = (),
        loss_weight={"class": 1.0, "iou": 2.5, "dfl": 0.5},
    ):
        self.fpn_strides = tuple(fpn_strides)
        self.grid_cell_size = grid_cell_size
        self.grid_cell_offset = grid_cell_offset
        self.num_classes = num_classes
        self.ori_img_size = ori_img_size
        self.iou_type = iou_type
        self.anchors_init = anchors_init
        self.loss_weight = dict(loss_weight)
        self.warmup_epoch = 0

    def __call__(
        self,
        feats_hw: Sequence[Tuple[int, int]],
        pred_scores: jnp.ndarray,   # [bs, 3A, nc]
        pred_distri: jnp.ndarray,   # [bs, 3A, 4] xywh (wh already anchor-decoded)
        targets: jnp.ndarray,
        batch_height: int,
        batch_width: int,
        use_atss: bool = False,     # unused; interface parity
    ):
        anchors, anchor_points, n_anchors_list, stride_tensor = generate_anchors(
            feats_hw, self.fpn_strides, self.grid_cell_size, self.grid_cell_offset, mode="ab"
        )

        gt_labels = targets[:, :, :1]
        scale = jnp.array([batch_width, batch_height, batch_width, batch_height], jnp.float32)
        gt_bboxes = xywh2xyxy(targets[:, :, 1:5] * scale)
        mask_gt = (jnp.sum(gt_bboxes, -1, keepdims=True) > 0).astype(jnp.float32)

        anchor_points_s = anchor_points / stride_tensor
        pred_scores = pred_scores.astype(jnp.float32)
        pred_distri = pred_distri.astype(jnp.float32)
        pred_xywh = jnp.concatenate(
            [pred_distri[..., :2] + anchor_points_s[None], pred_distri[..., 2:]], -1
        )
        pred_bboxes = xywh2xyxy(pred_xywh)

        target_labels, target_bboxes, target_scores, fg_mask = task_aligned_assigner(
            jax.lax.stop_gradient(pred_scores),
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor,
            anchor_points, gt_labels, gt_bboxes, mask_gt,
            topk=26, num_classes=self.num_classes, alpha=1.0, beta=6.0,
        )
        target_bboxes = jax.lax.stop_gradient(target_bboxes) / stride_tensor
        target_scores = jax.lax.stop_gradient(target_scores)
        fg_mask = jax.lax.stop_gradient(fg_mask)
        target_labels = jax.lax.stop_gradient(target_labels)

        target_labels = jnp.where(fg_mask, target_labels, self.num_classes)
        one_hot_label = jax.nn.one_hot(target_labels, self.num_classes + 1)[..., :-1]
        loss_cls = varifocal_loss(pred_scores, target_scores, one_hot_label)

        target_scores_sum = jnp.sum(target_scores)
        denom = jnp.where(target_scores_sum > 0, target_scores_sum, 1.0)
        loss_cls = loss_cls / denom

        bbox_weight = jnp.sum(target_scores, -1) * fg_mask.astype(jnp.float32)
        iou = elementwise_box_iou(
            pred_bboxes, target_bboxes, iou_type=self.iou_type, box_format="xyxy", eps=1e-10
        )
        loss_iou = jnp.sum((1.0 - iou) * bbox_weight) / denom
        loss_dfl = jnp.array(0.0, jnp.float32)

        loss = (
            self.loss_weight["class"] * loss_cls
            + self.loss_weight["iou"] * loss_iou
            + self.loss_weight["dfl"] * loss_dfl
        )
        components = jnp.stack(
            [
                self.loss_weight["iou"] * loss_iou,
                self.loss_weight["dfl"] * loss_dfl,
                self.loss_weight["class"] * loss_cls,
            ]
        )
        return loss, jax.lax.stop_gradient(components)
