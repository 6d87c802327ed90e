"""N/S self-distillation loss (reference: yolov6/models/losses/loss_distill_ns.py).

Same as the M/L distillation loss except the student head has dual regression
branches: the IoU loss trains the plain ltrb branch (which ships), while
DFL + DFL-KD train the distribution branch (train-only) — "cost-free"
distillation. No ATSS warmup."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from yolov6_tpu.losses.loss_distill import ComputeLossDistill
from yolov6_tpu.ops.boxes import dist2bbox


class ComputeLossDistillNS(ComputeLossDistill):
    def _pred_distri(self, head_out, pred_distri):
        # the flattened "reg" is the plain ltrb branch; the DFL branch is reg_dist
        return jnp.concatenate(
            [r.reshape(r.shape[0], -1, r.shape[-1]) for r in head_out["reg_dist"]], axis=1
        )

    def _iou_branch_bboxes(self, head_out, anchor_points_s, pred_bboxes):
        # NS sums the IoU losses of BOTH regression branches: the DFL-decoded
        # distri branch and the deployed plain-ltrb branch
        # (reference: loss_distill_ns.py:283-292, 325 returns iou + iou_lrtb)
        pred_lrtb = jnp.concatenate(
            [r.reshape(r.shape[0], -1, r.shape[-1]) for r in head_out["reg"]], axis=1
        ).astype(jnp.float32)
        return [pred_bboxes, dist2bbox(pred_lrtb, anchor_points_s[None])]
