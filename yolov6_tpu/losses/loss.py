"""Main detection loss: VarifocalLoss + IoU + DFL with ATSS/TAL assignment
(reference: yolov6/models/losses/loss.py).

TPU-native design notes:
* the reference masked-selects positive anchors into dynamic-length tensors
  (reference loss.py:229-251); here per-anchor losses are computed dense and
  weighted by fg_mask — identical sums, static shapes;
* the assigner runs inside the same jit as the loss (the reference hops to
  CPU on OOM, loss.py:105-152 — no host round-trip here);
* the epoch-based ATSS->TAL switch is a static argument (one recompile at
  the warmup boundary).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov6_tpu.assigners.anchor_generator import generate_anchors
from yolov6_tpu.assigners.atss_assigner import atss_assigner
from yolov6_tpu.assigners.tal_assigner import task_aligned_assigner
from yolov6_tpu.ops.boxes import bbox2dist, dist2bbox, elementwise_box_iou, xywh2xyxy


def varifocal_loss(pred_score, gt_score, label, alpha=0.75, gamma=2.0):
    """(reference: loss.py:201-211) — fp32 BCE on probabilities, weighted."""
    pred = pred_score.astype(jnp.float32)
    gt = gt_score.astype(jnp.float32)
    weight = alpha * jnp.power(pred, gamma) * (1 - label) + gt * label
    # torch binary_cross_entropy clamps log terms at -100
    bce = -(
        gt * jnp.clip(jnp.log(jnp.maximum(pred, 1e-44)), -100, None)
        + (1 - gt) * jnp.clip(jnp.log(jnp.maximum(1 - pred, 1e-44)), -100, None)
    )
    return jnp.sum(bce * weight)


def df_loss(pred_dist_logits, target, reg_max):
    """Distribution-focal loss: left/right CE interpolation
    (reference: loss.py:267-278). pred [.., 4, reg_max+1], target [.., 4]."""
    target_left = target.astype(jnp.int32)
    target_right = target_left + 1
    weight_left = target_right.astype(jnp.float32) - target
    weight_right = 1.0 - weight_left
    logp = jax.nn.log_softmax(pred_dist_logits.astype(jnp.float32), axis=-1)
    loss_left = -jnp.take_along_axis(logp, target_left[..., None], axis=-1)[..., 0] * weight_left
    right_idx = jnp.clip(target_right, 0, reg_max)
    loss_right = -jnp.take_along_axis(logp, right_idx[..., None], axis=-1)[..., 0] * weight_right
    return jnp.mean(loss_left + loss_right, axis=-1, keepdims=True)


def bbox_decode(anchor_points, pred_dist, use_dfl: bool, reg_max: int):
    """(reference: loss.py:194-198)"""
    if use_dfl:
        b, a, _ = pred_dist.shape
        logits = pred_dist.reshape(b, a, 4, reg_max + 1)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        pred_dist = probs @ jnp.arange(reg_max + 1, dtype=jnp.float32)
    return dist2bbox(pred_dist, anchor_points)


class ComputeLoss:
    """Loss over (feats_hw, cls_scores, reg_distri) + padded targets
    (reference: loss.py:14-198).

    Targets arrive already padded [bs, M, 5] (cls, cx, cy, w, h normalized;
    padding rows cls=-1, boxes=0) from the fixed-shape loader, replacing the
    reference's per-batch ragged preprocess (loss.py:184-192).
    """

    def __init__(
        self,
        fpn_strides=(8, 16, 32),
        grid_cell_size=5.0,
        grid_cell_offset=0.5,
        num_classes=80,
        ori_img_size=640,
        warmup_epoch=4,
        use_dfl=True,
        reg_max=16,
        iou_type="giou",
        loss_weight={"class": 1.0, "iou": 2.5, "dfl": 0.5},
        deterministic_assign=False,
    ):
        self.fpn_strides = tuple(fpn_strides)
        self.grid_cell_size = grid_cell_size
        self.grid_cell_offset = grid_cell_offset
        self.num_classes = num_classes
        self.ori_img_size = ori_img_size
        self.warmup_epoch = warmup_epoch
        self.use_dfl = use_dfl
        self.reg_max = reg_max
        self.iou_type = iou_type
        self.loss_weight = dict(loss_weight)
        self.deterministic_assign = deterministic_assign

    def _assign_input(self, x):
        """Assigner inputs are detached data, not a gradient path; with
        deterministic_assign they are rounded to the bf16 grid so the
        DISCRETE top-k assignment cannot flip on fp32 reduction-order noise
        (which differs between mesh shardings and between batch shapes —
        XLA tiles the anchor reductions differently). Keeps single-device
        and SPMD assignments bit-identical; default off to bit-match the
        reference's fp32 assignment."""
        if self.deterministic_assign:
            return x.astype(jnp.bfloat16).astype(jnp.float32)
        return x

    def __call__(
        self,
        feats_hw: Sequence[Tuple[int, int]],
        pred_scores: jnp.ndarray,   # [bs, A, nc] sigmoid scores
        pred_distri: jnp.ndarray,   # [bs, A, 4*(reg_max+1)]
        targets: jnp.ndarray,       # [bs, M, 5] padded (cls, cxcywh normalized)
        batch_height: int,
        batch_width: int,
        use_atss: bool,
    ):
        anchors, anchor_points, n_anchors_list, stride_tensor = generate_anchors(
            feats_hw, self.fpn_strides, self.grid_cell_size, self.grid_cell_offset
        )

        gt_labels = targets[:, :, :1]
        scale = jnp.array([batch_width, batch_height, batch_width, batch_height], jnp.float32)
        gt_bboxes = xywh2xyxy(targets[:, :, 1:5] * scale)
        mask_gt = (jnp.sum(gt_bboxes, -1, keepdims=True) > 0).astype(jnp.float32)

        anchor_points_s = anchor_points / stride_tensor
        pred_scores = pred_scores.astype(jnp.float32)
        pred_distri = pred_distri.astype(jnp.float32)
        pred_bboxes = bbox_decode(anchor_points_s[None], pred_distri, self.use_dfl, self.reg_max)

        detached_boxes = self._assign_input(
            jax.lax.stop_gradient(pred_bboxes) * stride_tensor)
        if use_atss:
            target_labels, target_bboxes, target_scores, fg_mask = atss_assigner(
                anchors, n_anchors_list, gt_labels, gt_bboxes, mask_gt,
                detached_boxes, topk=9, num_classes=self.num_classes,
            )
        else:
            target_labels, target_bboxes, target_scores, fg_mask = task_aligned_assigner(
                self._assign_input(jax.lax.stop_gradient(pred_scores)),
                detached_boxes,
                anchor_points, gt_labels, gt_bboxes, mask_gt,
                topk=13, num_classes=self.num_classes, alpha=1.0, beta=6.0,
            )
        target_labels = jax.lax.stop_gradient(target_labels)
        target_bboxes = jax.lax.stop_gradient(target_bboxes) / stride_tensor
        target_scores = jax.lax.stop_gradient(target_scores)
        fg_mask = jax.lax.stop_gradient(fg_mask)

        # cls loss (reference :160-169)
        target_labels = jnp.where(fg_mask, target_labels, self.num_classes)
        one_hot_label = jax.nn.one_hot(target_labels, self.num_classes + 1)[..., :-1]
        loss_cls = varifocal_loss(pred_scores, target_scores, one_hot_label)

        target_scores_sum = jnp.sum(target_scores)
        denom = jnp.where(target_scores_sum > 1, target_scores_sum, 1.0)
        loss_cls = loss_cls / denom

        loss_iou, loss_dfl = self._bbox_loss(
            pred_distri, pred_bboxes, anchor_points_s[None], target_bboxes,
            target_scores, denom, fg_mask,
        )

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

    def _bbox_loss(
        self, pred_dist, pred_bboxes, anchor_points, target_bboxes,
        target_scores, denom, fg_mask,
    ):
        """Dense-masked equivalent of reference BboxLoss (loss.py:214-265)."""
        fg = fg_mask.astype(jnp.float32)
        bbox_weight = jnp.sum(target_scores, -1) * fg  # [bs, A]

        iou = elementwise_box_iou(
            pred_bboxes, target_bboxes, iou_type=self.iou_type, box_format="xyxy", eps=1e-10
        )
        loss_iou = jnp.sum((1.0 - iou) * bbox_weight) / denom

        if self.use_dfl:
            b, a, _ = pred_dist.shape
            dist_logits = pred_dist.reshape(b, a, 4, self.reg_max + 1)
            target_ltrb = bbox2dist(anchor_points, target_bboxes, self.reg_max)
            per_anchor = df_loss(dist_logits, target_ltrb, self.reg_max)[..., 0]
            loss_dfl = jnp.sum(per_anchor * bbox_weight) / denom
        else:
            loss_dfl = jnp.array(0.0, jnp.float32)
        return loss_iou, loss_dfl
