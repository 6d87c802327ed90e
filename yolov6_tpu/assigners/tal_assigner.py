"""Task-Aligned label assigner as a pure batched function
(reference: yolov6/assigners/tal_assigner.py).

TPU-native notes: the reference falls back to a per-sample Python loop when
max_gt > 100 and to CPU on OOM (reference tal_assigner.py:55-64,
losses/loss.py:105-152). Here everything is fixed-shape; for large max_gt the
b x M x A tensors are bounded by the loader's max_labels, and the whole
assignment is jit-fused with the loss (no host round-trips).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from yolov6_tpu.assigners.assigner_utils import (
    iou_calculator,
    scatter_topk_mask,
    select_candidates_in_gts,
    select_highest_overlaps,
)


def task_aligned_assigner(
    pd_scores: jnp.ndarray,   # [bs, A, nc] (post-sigmoid)
    pd_bboxes: jnp.ndarray,   # [bs, A, 4] xyxy (image scale)
    anc_points: jnp.ndarray,  # [A, 2]
    gt_labels: jnp.ndarray,   # [bs, M, 1]
    gt_bboxes: jnp.ndarray,   # [bs, M, 4] xyxy
    mask_gt: jnp.ndarray,     # [bs, M, 1]
    topk: int = 13,
    num_classes: int = 80,
    alpha: float = 1.0,
    beta: float = 6.0,
    eps: float = 1e-9,
):
    """Returns (target_labels [bs,A], target_bboxes [bs,A,4],
    target_scores [bs,A,nc], fg_mask [bs,A] bool)."""
    bs, A, nc = pd_scores.shape
    M = gt_bboxes.shape[1]

    # task-aligned metric: score(label)^alpha * IoU^beta (reference :117-133)
    gt_idx = jnp.clip(gt_labels[..., 0].astype(jnp.int32), 0, nc - 1)
    # bbox_scores[b,m,a] = pd_scores[b,a,gt_label[b,m]]
    bbox_scores = jnp.take_along_axis(pd_scores, gt_idx[:, None, :], axis=2)  # [bs, A, M]
    bbox_scores = jnp.swapaxes(bbox_scores, 1, 2)  # [bs, M, A]
    overlaps = iou_calculator(gt_bboxes, pd_bboxes)
    align_metric = jnp.power(bbox_scores, alpha) * jnp.power(overlaps, beta)

    mask_in_gts = select_candidates_in_gts(anc_points, gt_bboxes)
    mask_topk = scatter_topk_mask(align_metric * mask_in_gts, topk, mask_gt)
    mask_pos = mask_topk * mask_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, M)

    # gather targets (reference :152-173)
    flat_idx = target_gt_idx + jnp.arange(bs)[:, None] * M
    target_labels = jnp.reshape(gt_labels.astype(jnp.int32), (-1,))[flat_idx]
    target_bboxes = jnp.reshape(gt_bboxes, (-1, 4))[flat_idx]
    target_labels = jnp.maximum(target_labels, 0)
    target_scores = jax.nn.one_hot(target_labels, num_classes, dtype=pd_scores.dtype)
    target_scores = jnp.where(fg_mask[..., None] > 0, target_scores, 0.0)

    # normalize by per-gt max metric (reference :76-81)
    align_metric = align_metric * mask_pos
    pos_align_metrics = jnp.max(align_metric, axis=-1, keepdims=True)
    pos_overlaps = jnp.max(overlaps * mask_pos, axis=-1, keepdims=True)
    norm_align_metric = jnp.max(
        align_metric * pos_overlaps / (pos_align_metrics + eps), axis=-2
    )[..., None]
    target_scores = target_scores * norm_align_metric

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)
