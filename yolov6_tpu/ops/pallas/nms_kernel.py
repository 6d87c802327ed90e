"""Pallas TPU kernel for the greedy NMS selection loop.

The XLA version (ops/nms.py) runs max_det fori_loop iterations of
argmax+IoU over the candidate set; each iteration is scheduled as separate
HLO ops. This kernel pins the candidate boxes/scores in VMEM for the whole
loop (K=2048 candidates ≈ 40 KB of planes) so the sequential steps run
entirely on-chip.

Grid: one program per image. Selection semantics identical to
ops/nms._single_image_nms's loop (class-offset geometry applied by caller).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref,
                out_ref, valid_ref, alive_ref, *, max_det, iou_thres):
    """Plane refs [1,1,K]; out [1,md_pad,128]; valid [1,1,md_pad] (float)."""
    x1 = x1_ref[0]  # [1, K]
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]
    scores = scores_ref[0]
    alive_ref[:] = scores > 0.0
    valid_ref[:] = jnp.zeros_like(valid_ref)
    lane_md = jax.lax.broadcasted_iota(jnp.int32, valid_ref.shape, 2)
    areas = (x2 - x1) * (y2 - y1)

    K = scores.shape[1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)

    def body(i, _):
        masked = jnp.where(alive_ref[:], scores, -1.0)  # [1, K]
        cur_score = jnp.max(masked)
        ok = cur_score > 0.0
        # first-argmax via iota tie-break, then scalar extraction as one-hot
        # reductions (dynamic_slice gathers don't lower on the TC pipeline)
        cur = jnp.min(jnp.where(masked == cur_score, lane_k, K))
        onehot = (lane_k == cur).astype(jnp.float32)
        cx1 = jnp.sum(x1 * onehot)
        cy1 = jnp.sum(y1 * onehot)
        cx2 = jnp.sum(x2 * onehot)
        cy2 = jnp.sum(y2 * onehot)
        iw = jnp.maximum(jnp.minimum(cx2, x2) - jnp.maximum(cx1, x1), 0.0)
        ih = jnp.maximum(jnp.minimum(cy2, y2) - jnp.maximum(cy1, y1), 0.0)
        inter = iw * ih
        area_cur = (cx2 - cx1) * (cy2 - cy1)
        iou = inter / (area_cur + areas - inter + 1e-12)
        suppress = jnp.logical_and(iou > iou_thres, ok)
        alive_ref[:] = jnp.logical_and(alive_ref[:], jnp.logical_not(suppress))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
        row = jnp.zeros((1, 128), jnp.float32)
        vals = [cx1, cy1, cx2, cy2, cur_score, cur.astype(jnp.float32)]
        for j, v in enumerate(vals):
            row = jnp.where(lane == j, jnp.where(ok, v, 0.0), row)
        out_ref[0, pl.ds(i, 1), :] = row
        valid_ref[:] = jnp.where(
            lane_md == i, jnp.where(ok, 1.0, 0.0), valid_ref[:]
        )
        return 0

    jax.lax.fori_loop(0, max_det, body, 0)


def pallas_greedy_nms(cand_boxes, cand_scores, max_det: int, iou_thres: float,
                      interpret: bool = False):
    """cand_boxes [B,K,4] (class-offset applied), cand_scores [B,K] (0 where
    below conf). Returns (rows [B,max_det,128] = xyxy/score/cand_idx/pad,
    valid [B,max_det] bool)."""
    B, K, _ = cand_boxes.shape
    md_pad = _round_up(max_det, 8)
    planes = [cand_boxes[..., i][:, None, :] for i in range(4)]  # [B,1,K]
    scores3 = cand_scores[:, None, :]

    kernel = partial(_nms_kernel, max_det=max_det, iou_thres=iou_thres)
    plane_spec = pl.BlockSpec((1, 1, K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    out, valid = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[plane_spec] * 5,
        out_specs=[
            pl.BlockSpec((1, md_pad, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, md_pad), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, md_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, md_pad), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, K), jnp.bool_)],
        interpret=interpret,
    )(*(p.astype(jnp.float32) for p in planes), scores3.astype(jnp.float32))
    return out[:, :max_det, :], valid[:, 0, :max_det] > 0.5
