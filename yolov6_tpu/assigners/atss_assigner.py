"""ATSS (Adaptive Training Sample Selection) assigner, batched/fixed-shape
(reference: yolov6/assigners/atss_assigner.py). Used for warmup epochs."""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from yolov6_tpu.assigners.assigner_utils import (
    dist_calculator,
    iou_calculator,
    select_candidates_in_gts,
    select_highest_overlaps,
)


def _pairwise_iou(gt_flat: jnp.ndarray, anchors: jnp.ndarray, eps: float = 1e-6):
    """[G,4] x [A,4] -> [G,A] IoU (reference: iou2d_calculator.py bbox_overlaps)."""
    lt = jnp.maximum(gt_flat[:, None, :2], anchors[None, :, :2])
    rb = jnp.minimum(gt_flat[:, None, 2:], anchors[None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), -1)
    area1 = jnp.prod(jnp.clip(gt_flat[:, 2:] - gt_flat[:, :2], 0, None), -1)
    area2 = jnp.prod(jnp.clip(anchors[:, 2:] - anchors[:, :2], 0, None), -1)
    union = jnp.maximum(area1[:, None] + area2[None, :] - inter, eps)
    return inter / union


def _per_level_topk(distances, n_level_bboxes: Sequence[int], topk: int, mask_gt):
    """Per-FPN-level topk-by-closeness candidates (reference: atss_assigner.py:88-115).
    Returns (is_in_candidate [bs,M,A] float, candidate_idxs [bs,M,sum_k] global)."""
    bs, M, A = distances.shape
    is_in_candidate = []
    candidate_idxs = []
    start = 0
    mask = mask_gt.astype(bool)  # [bs, M, 1]
    for n_level in n_level_bboxes:
        k = min(topk, n_level)
        level_dist = jax.lax.dynamic_slice_in_dim(distances, start, n_level, axis=2)
        _, idxs = jax.lax.top_k(-level_dist, k)  # smallest distances
        candidate_idxs.append(idxs + start)
        idxs = jnp.where(mask, idxs, 0)
        counts = jnp.zeros((bs, M, n_level), jnp.int32)
        b_idx = jnp.broadcast_to(jnp.arange(bs)[:, None, None], idxs.shape)
        m_idx = jnp.broadcast_to(jnp.arange(M)[None, :, None], idxs.shape)
        counts = counts.at[b_idx, m_idx, idxs].add(1)
        is_in_candidate.append(jnp.where(counts > 1, 0, counts).astype(distances.dtype))
        start += n_level
    return jnp.concatenate(is_in_candidate, -1), jnp.concatenate(candidate_idxs, -1)


def atss_assigner(
    anc_bboxes: jnp.ndarray,      # [A, 4]
    n_level_bboxes: Sequence[int],
    gt_labels: jnp.ndarray,       # [bs, M, 1]
    gt_bboxes: jnp.ndarray,       # [bs, M, 4] xyxy
    mask_gt: jnp.ndarray,         # [bs, M, 1]
    pd_bboxes: jnp.ndarray,       # [bs, A, 4] or None — soft-label IoU source
    topk: int = 9,
    num_classes: int = 80,
):
    """Returns (target_labels [bs,A], target_bboxes, target_scores, fg_mask bool)."""
    A = anc_bboxes.shape[0]
    bs, M, _ = gt_bboxes.shape
    bg_idx = num_classes

    gt_flat = gt_bboxes.reshape(-1, 4)
    overlaps = _pairwise_iou(gt_flat, anc_bboxes).reshape(bs, M, A)
    distances, ac_points = dist_calculator(gt_flat, anc_bboxes)
    distances = distances.reshape(bs, M, A)

    is_in_candidate, candidate_idxs = _per_level_topk(distances, n_level_bboxes, topk, mask_gt)

    # mean+std IoU threshold over candidates (reference :117-136)
    candidate_overlaps_map = jnp.where(is_in_candidate > 0, overlaps, 0.0)
    gathered = jnp.take_along_axis(candidate_overlaps_map, candidate_idxs, axis=2)
    mean = jnp.mean(gathered, axis=-1, keepdims=True)
    std = jnp.std(gathered, axis=-1, keepdims=True, ddof=1)
    thr = mean + std

    is_pos = jnp.where(candidate_overlaps_map > thr, is_in_candidate, 0.0)
    is_in_gts = select_candidates_in_gts(ac_points, gt_bboxes)
    mask_pos = is_pos * is_in_gts * mask_gt

    target_gt_idx, fg_mask, mask_pos = select_highest_overlaps(mask_pos, overlaps, M)

    # targets (reference :138-161)
    flat_idx = target_gt_idx + jnp.arange(bs)[:, None] * M
    target_labels = jnp.reshape(gt_labels.astype(jnp.int32), (-1,))[flat_idx]
    target_labels = jnp.where(fg_mask > 0, target_labels, bg_idx)
    target_bboxes = jnp.reshape(gt_bboxes, (-1, 4))[flat_idx]
    target_scores = jax.nn.one_hot(target_labels, num_classes + 1)[..., :num_classes]

    # soft label with predicted-box IoU (reference :81-84)
    if pd_bboxes is not None:
        ious = iou_calculator(gt_bboxes, pd_bboxes) * mask_pos
        ious = jnp.max(ious, axis=-2)[..., None]
        target_scores = target_scores * ious

    return target_labels, target_bboxes, target_scores, fg_mask.astype(bool)
