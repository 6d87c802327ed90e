"""Self-distillation loss for M/L models
(reference: yolov6/models/losses/loss_distill.py).

Base VFL+IoU+DFL loss plus: class-KD (KL at temperature T, x T^2), DFL-KD
over the 17-bin distributions on positive anchors, optional channel-wise
feature KD on the 3 neck maps, all cosine-decayed over training."""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from yolov6_tpu.assigners.anchor_generator import generate_anchors
from yolov6_tpu.assigners.atss_assigner import atss_assigner
from yolov6_tpu.assigners.tal_assigner import task_aligned_assigner
from yolov6_tpu.losses.loss import bbox_decode, df_loss, varifocal_loss
from yolov6_tpu.models.effidehead import flatten_head_outputs
from yolov6_tpu.ops.boxes import bbox2dist, elementwise_box_iou, xywh2xyxy


def distill_loss_cls(logits_student, logits_teacher, num_classes, temperature):
    """KL(teacher || student) at temperature T, summed, x T^2
    (reference: loss_distill.py:213-222). Inputs are post-sigmoid scores —
    softmaxed again over classes exactly as the reference does."""
    s = logits_student.reshape(-1, num_classes).astype(jnp.float32)
    t = logits_teacher.reshape(-1, num_classes).astype(jnp.float32)
    log_p_s = jax.nn.log_softmax(s / temperature, axis=1)
    p_t = jax.nn.softmax(t / temperature, axis=1)
    kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-30)) - log_p_s))
    return kl * temperature**2


def distill_loss_dfl_per_anchor(student_dist, teacher_dist, temperature, reg_max):
    """Per-anchor mean KL over the 4 ltrb distributions
    (reference: loss_distill.py:352-362 computes per-position KL then means).
    Inputs [.., 4, reg_max+1]; returns [..] per-anchor values."""
    s = student_dist.astype(jnp.float32)
    t = teacher_dist.astype(jnp.float32)
    log_p_s = jax.nn.log_softmax(s / temperature, axis=-1)
    p_t = jax.nn.softmax(t / temperature, axis=-1)
    kl = jnp.sum(p_t * (jnp.log(jnp.maximum(p_t, 1e-30)) - log_p_s), axis=-1)  # [.., 4]
    return jnp.mean(kl, axis=-1) * temperature**2


def distill_loss_cw(s_feats, t_feats, temperature: float = 1.0):
    """Channel-wise feature KD over neck maps (reference: loss_distill.py:223-245).
    Our feats are NHWC; softmax runs over the spatial axis per channel."""
    total = jnp.float32(0.0)
    for s, t in zip(s_feats, t_feats):
        n, h, w, c = s.shape
        s2 = s.reshape(n, h * w, c).astype(jnp.float32) / temperature
        t2 = jax.lax.stop_gradient(t.reshape(n, h * w, c).astype(jnp.float32)) / temperature
        log_p_s = jax.nn.log_softmax(s2, axis=1)
        log_p_t = jax.nn.log_softmax(t2, axis=1)
        p_t = jnp.exp(log_p_t)
        total = total + jnp.sum(p_t * (log_p_t - log_p_s)) * (temperature**2) / (n * c)
    return total


class ComputeLossDistill:
    """(reference: loss_distill.py:15-362)"""

    def __init__(
        self,
        fpn_strides=(8, 16, 32),
        grid_cell_size=5.0,
        grid_cell_offset=0.5,
        num_classes=80,
        ori_img_size=640,
        warmup_epoch=0,
        use_dfl=True,
        reg_max=16,
        iou_type="giou",
        loss_weight={"class": 1.0, "iou": 2.5, "dfl": 0.5, "cwd": 10.0},
        distill_feat=False,
        distill_weight={"class": 1.0, "dfl": 1.0},
        max_epoch=300,
        temperature=20.0,
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
        self.distill_feat = distill_feat
        self.distill_weight = dict(distill_weight)
        self.max_epoch = max_epoch
        self.temperature = temperature
        self.deterministic_assign = deterministic_assign

    def _assign_input(self, x):
        """See ComputeLoss._assign_input: bf16-round the DETACHED assigner
        inputs so the discrete top-k assignment is invariant to fp32
        reduction-order noise across mesh shardings. Off by default."""
        if self.deterministic_assign:
            return x.astype(jnp.bfloat16).astype(jnp.float32)
        return x

    def _student_outputs(self, head_out):
        return flatten_head_outputs(head_out, self.num_classes)

    def _student_reg_dist(self, head_out):
        return jnp.concatenate(
            [r.reshape(r.shape[0], -1, r.shape[-1]) for r in head_out["reg"]], axis=1
        )

    def __call__(
        self,
        feats_hw: Sequence[Tuple[int, int]],
        head_out,            # student head dict
        t_head_out,          # teacher head dict
        s_featmaps,          # student neck maps (NHWC)
        t_featmaps,
        targets,
        epoch_num,
        batch_height,
        batch_width,
        use_atss: bool,
    ):
        anchors, anchor_points, n_anchors_list, stride_tensor = generate_anchors(
            feats_hw, self.fpn_strides, self.grid_cell_size, self.grid_cell_offset
        )
        pred_scores, pred_distri = self._student_outputs(head_out)
        pred_distri = self._pred_distri(head_out, pred_distri)
        t_pred_scores, t_pred_distri = flatten_head_outputs(t_head_out, self.num_classes)

        gt_labels = targets[:, :, :1]
        scale = jnp.array([batch_width, batch_height, batch_width, batch_height], jnp.float32)
        gt_bboxes = xywh2xyxy(targets[:, :, 1:5] * scale)
        mask_gt = (jnp.sum(gt_bboxes, -1, keepdims=True) > 0).astype(jnp.float32)

        anchor_points_s = anchor_points / stride_tensor
        pred_scores = pred_scores.astype(jnp.float32)
        pred_distri = pred_distri.astype(jnp.float32)
        t_pred_distri = jax.lax.stop_gradient(t_pred_distri.astype(jnp.float32))
        t_pred_scores = jax.lax.stop_gradient(t_pred_scores.astype(jnp.float32))

        pred_bboxes = bbox_decode(anchor_points_s[None], pred_distri, self.use_dfl, self.reg_max)
        iou_branch_bboxes = self._iou_branch_bboxes(head_out, anchor_points_s, pred_bboxes)

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
                detached_boxes, anchor_points,
                gt_labels, gt_bboxes, mask_gt, topk=13, num_classes=self.num_classes,
            )
        target_labels = jax.lax.stop_gradient(target_labels)
        target_bboxes = jax.lax.stop_gradient(target_bboxes) / stride_tensor
        target_scores = jax.lax.stop_gradient(target_scores)
        fg_mask = jax.lax.stop_gradient(fg_mask)

        target_labels = jnp.where(fg_mask, target_labels, self.num_classes)
        one_hot_label = jax.nn.one_hot(target_labels, self.num_classes + 1)[..., :-1]
        loss_cls = varifocal_loss(pred_scores, target_scores, one_hot_label)

        target_scores_sum = jnp.sum(target_scores)
        denom = jnp.where(target_scores_sum > 0, target_scores_sum, 1.0)
        loss_cls = loss_cls / denom

        fg = fg_mask.astype(jnp.float32)
        bbox_weight = jnp.sum(target_scores, -1) * fg
        loss_iou = jnp.float32(0.0)
        for branch_boxes in iou_branch_bboxes:
            iou = elementwise_box_iou(
                branch_boxes, target_bboxes, iou_type=self.iou_type,
                box_format="xyxy", eps=1e-10,
            )
            loss_iou = loss_iou + jnp.sum((1.0 - iou) * bbox_weight) / denom

        if self.use_dfl:
            b, a, _ = pred_distri.shape
            s_dist = pred_distri.reshape(b, a, 4, self.reg_max + 1)
            t_dist = t_pred_distri.reshape(b, a, 4, self.reg_max + 1)
            target_ltrb = bbox2dist(anchor_points_s[None], target_bboxes, self.reg_max)
            per_anchor = df_loss(s_dist, target_ltrb, self.reg_max)[..., 0]
            loss_dfl = jnp.sum(per_anchor * bbox_weight) / denom
            kd_per_anchor = distill_loss_dfl_per_anchor(
                s_dist, t_dist, self.temperature, self.reg_max
            )
            # reference distill_loss_dfl returns the SCALAR mean KL over all
            # positive anchors, then multiplies by the bbox_weight vector and
            # sums (loss_distill.py:320,352-362) — i.e. mean_kl * sum(weight)
            n_pos = jnp.maximum(jnp.sum(fg), 1.0)
            kd_mean = jnp.sum(kd_per_anchor * fg) / n_pos
            d_loss_dfl = kd_mean * jnp.sum(bbox_weight) / denom
        else:
            loss_dfl = jnp.float32(0.0)
            d_loss_dfl = jnp.float32(0.0)

        d_loss_cls = distill_loss_cls(
            pred_scores, t_pred_scores, self.num_classes, self.temperature
        )
        if self.distill_feat:
            d_loss_cw = distill_loss_cw(s_featmaps, t_featmaps)
        else:
            d_loss_cw = jnp.float32(0.0)

        decay = ((1 - jnp.cos(epoch_num * math.pi / self.max_epoch)) / 2) * (0.01 - 1) + 1
        d_loss_dfl = d_loss_dfl * decay
        d_loss_cls = d_loss_cls * decay
        d_loss_cw = d_loss_cw * decay

        loss_cls_all = loss_cls + d_loss_cls * self.distill_weight["class"]
        loss_dfl_all = loss_dfl + d_loss_dfl * self.distill_weight["dfl"]
        loss = (
            self.loss_weight["class"] * loss_cls_all
            + self.loss_weight["iou"] * loss_iou
            + self.loss_weight["dfl"] * loss_dfl_all
            + self.loss_weight["cwd"] * d_loss_cw
        )
        components = jnp.stack(
            [
                self.loss_weight["iou"] * loss_iou,
                self.loss_weight["dfl"] * loss_dfl_all,
                self.loss_weight["class"] * loss_cls_all,
                self.loss_weight["cwd"] * d_loss_cw,
            ]
        )
        return loss, jax.lax.stop_gradient(components)

    # hooks overridden by the NS variant
    def _pred_distri(self, head_out, pred_distri):
        return pred_distri

    def _iou_branch_bboxes(self, head_out, anchor_points_s, pred_bboxes):
        """List of decoded box tensors whose IoU losses are summed."""
        return [pred_bboxes]
