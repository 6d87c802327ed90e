"""Fixed-shape batched NMS, jit-compiled end to end.

TPU-native redesign of the reference's dynamic-shape NMS
(reference: yolov6/utils/nms.py:31-105, which boolean-indexes candidates and
calls torchvision.ops.nms per image). Here every step is static-shape:

  1. conf = obj * cls; multi-label candidates are the flattened [A*nc] score
     grid (reference :76-77), masked below ``conf_thres``.
  2. top-k prefilter to ``max_nms`` candidates (reference caps at 30000, :90-91).
  3. class-offset trick: boxes shifted by class_idx * max_wh so one IoU
     geometry does per-class NMS (reference :94-96).
  4. greedy selection as a fori_loop of ``max_det`` steps: pick the highest
     alive score, emit it, suppress IoU > thresh. Identical keep-set to
     sequential NMS truncated at max_det.

Outputs are padded [b, max_det, 6] (xyxy, conf, cls) plus a validity mask —
static shapes keep XLA happy and make downstream COCO conversion trivial.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from yolov6_tpu.ops.boxes import xywh2xyxy

MAX_WH = 4096  # reference: utils/nms.py:54


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _iou_1_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one [4] xyxy box against [N,4]."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    area2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / (area1 + area2 - inter + 1e-12)


def _single_image_nms(
    pred: jnp.ndarray,
    conf_thres: float,
    iou_thres: float,
    max_det: int,
    max_nms: int,
    multi_label: bool,
    agnostic: bool,
    class_mask: Optional[jnp.ndarray],
    exact_topk: bool = False,
    anchor_topc: int = 8,
    recall_target: float = 0.95,
    bf16_select: bool = False,
    row_select: str = "grouped",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """pred [A, 5+nc] -> (detections [max_det, 6], valid [max_det]).
    XLA-loop fallback path (non-TPU backends)."""
    cand_boxes, nms_boxes, top_scores, cls_idx = _select_candidates(
        pred, conf_thres, max_nms, multi_label, agnostic, class_mask,
        exact_topk, anchor_topc, recall_target, bf16_select, row_select,
    )
    cand_valid = top_scores > conf_thres

    def body(i, carry):
        alive, out_boxes, out_scores, out_cls, out_valid = carry
        masked = jnp.where(alive, top_scores, -1.0)
        cur = jnp.argmax(masked)
        cur_ok = masked[cur] > 0.0
        cur_box = nms_boxes[cur]
        iou = _iou_1_to_many(cur_box, nms_boxes)
        alive = alive & ~((iou > iou_thres) & cur_ok)
        out_boxes = out_boxes.at[i].set(jnp.where(cur_ok, cand_boxes[cur], 0.0))
        out_scores = out_scores.at[i].set(jnp.where(cur_ok, top_scores[cur], 0.0))
        out_cls = out_cls.at[i].set(jnp.where(cur_ok, cls_idx[cur], 0.0))
        out_valid = out_valid.at[i].set(cur_ok)
        return alive, out_boxes, out_scores, out_cls, out_valid

    init = (
        cand_valid,
        jnp.zeros((max_det, 4), jnp.float32),
        jnp.zeros((max_det,), jnp.float32),
        jnp.zeros((max_det,), jnp.float32),
        jnp.zeros((max_det,), bool),
    )
    _, out_boxes, out_scores, out_cls, out_valid = jax.lax.fori_loop(0, max_det, body, init)
    dets = jnp.concatenate([out_boxes, out_scores[:, None], out_cls[:, None]], axis=-1)
    return dets, out_valid


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of [N,4] xyxy boxes against [M,4] -> [N,M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0, None), axis=-1)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / (area_a[:, None] + area_b[None, :] - inter + 1e-12)


def _tiled_keep(
    nms_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_thres: float,
    max_det: int = 300,
    tile: int = 512,
) -> jnp.ndarray:
    """Greedy-NMS keep mask over score-sorted candidates, exact for the
    first ``max_det`` kept boxes (all a caller can emit).

    Replaces the max_det-step sequential greedy loop with K/tile sequential
    steps of batched VPU work; per tile (score order):

      1. cross-tile: suppress against the *compacted buffer* of previously
         kept boxes (one [tile, C] IoU + reduce). The buffer caps at
         C >= max_det entries — a kept box beyond rank max_det can only
         suppress candidates that rank after max_det kept boxes and so can
         never be emitted; dropping it cannot change the top-max_det output.
      2. within-tile: resolve the greedy order by a Jacobi fixed-point on
         the [tile, tile] strict-upper-triangular overlap mask. Each sweep
         finalizes at least one more rank (rank r is final after r sweeps,
         by induction), and any fixed point satisfies the greedy recurrence
         ``keep[j] = valid[j] and no kept i<j overlaps j`` — so the
         early-exit on convergence is exact, not approximate.

    Args: nms_boxes [K,4] xyxy (class-offset applied), scores [K] descending,
    zeroed below conf. Returns kept [K] bool (exact up to max_det kept).
    """
    K = scores.shape[0]
    tile = min(tile, K)
    pad = (-K) % tile
    if pad:
        nms_boxes = jnp.pad(nms_boxes, ((0, pad), (0, 0)))
        scores = jnp.pad(scores, (0, pad))
        K = K + pad
    n_tiles = K // tile
    C = max(_round_up(max_det, 128), 128)
    valid = scores > 0.0
    rank_t = jnp.arange(tile)
    upper = rank_t[:, None] < rank_t[None, :]  # [T,T] i suppresses j only if i<j

    def step(carry):
        t, kept, buf, n_kept = carry
        t0 = t * tile
        boxes_t = jax.lax.dynamic_slice(nms_boxes, (t0, 0), (tile, 4))
        ok = jax.lax.dynamic_slice(valid, (t0,), (tile,))
        iou_buf = _pairwise_iou(boxes_t, buf)  # [T, C]
        buf_live = jnp.arange(C) < n_kept
        ok &= ~jnp.any((iou_buf > iou_thres) & buf_live[None, :], axis=1)
        over = _pairwise_iou(boxes_t, boxes_t)
        over = (over > iou_thres) & upper

        def sweep(state):
            k_cur, _, n = state
            k_new = ok & ~jnp.any(over & k_cur[:, None], axis=0)
            return k_new, jnp.any(k_new != k_cur), n + 1

        k_tile, _, _ = jax.lax.while_loop(
            lambda s: s[1] & (s[2] < tile), sweep, (ok, True, 0)
        )
        pos = n_kept + jnp.cumsum(k_tile.astype(jnp.int32)) - 1
        pos = jnp.where(k_tile, pos, C)  # OOB rows dropped by the scatter
        buf = buf.at[pos].set(boxes_t, mode="drop", unique_indices=True)
        n_kept = n_kept + jnp.sum(k_tile.astype(jnp.int32))
        kept = jax.lax.dynamic_update_slice(kept, k_tile, (t0,))
        return (t + 1, kept, buf, n_kept)

    # Tiles run under a while_loop with two exits: (a) max_det boxes kept —
    # dense eval-protocol scenes saturate within the first few tiles and
    # unprocessed tails can never be emitted; (b) candidates exhausted —
    # scores are sorted descending, so tiles past the last valid candidate
    # are all-invalid (sparse high-conf inference scenes run ~1 tile).
    # Under vmap the exit condition ORs across the batch.
    n_live_tiles = (jnp.sum(valid.astype(jnp.int32)) + tile - 1) // tile
    init = (jnp.int32(0), jnp.zeros((K,), bool),
            jnp.zeros((C, 4), jnp.float32), jnp.int32(0))
    _, kept, _, _ = jax.lax.while_loop(
        lambda c: (c[0] < jnp.minimum(n_tiles, n_live_tiles)) & (c[3] < max_det),
        step, init,
    )
    return kept[: scores.shape[0] - pad] if pad else kept


def _per_class_keep(
    nms_boxes: jnp.ndarray,
    scores: jnp.ndarray,
    cls_rank: jnp.ndarray,
    cls_int: jnp.ndarray,
    iou_thres: float,
    nc: int,
    cap: int,
) -> jnp.ndarray:
    """Greedy-NMS keep via per-class parallel Jacobi.

    The class-offset trick makes the suppression graph block-diagonal by
    class (reference: utils/nms.py:94-96) — so instead of one long greedy
    chain over K mixed-class candidates, scatter each class's candidates
    (score order preserved) into a [nc, cap] bucket grid and resolve ALL
    classes' greedy recurrences simultaneously with a Jacobi fixed-point on
    the [nc, cap, cap] strict-upper overlap mask. Sequential depth collapses
    from (live_tiles x sweeps) to just the max per-class chain depth.

    EXACT only when every class has <= cap candidates; the caller checks
    per-class counts and falls back to _tiled_keep otherwise (lax.cond with
    an unbatched predicate, so only one branch executes).

    Args: nms_boxes [K,4] (offsets irrelevant within a class), scores [K]
    descending (0 below conf), cls_rank [K] in-class rank, cls_int [K]
    int32 class (= nc for invalid rows). Returns kept [K] bool.
    """
    valid = scores > 0.0
    in_cap = valid & (cls_rank < cap)
    bucket_boxes = jnp.zeros((nc, cap, 4), jnp.float32).at[cls_int, cls_rank].set(
        nms_boxes, mode="drop"
    )
    bucket_valid = jnp.zeros((nc, cap), bool).at[cls_int, cls_rank].set(
        in_cap, mode="drop"
    )
    over = jax.vmap(_pairwise_iou)(bucket_boxes, bucket_boxes) > iou_thres
    rk = jnp.arange(cap)
    over &= (rk[:, None] < rk[None, :])[None]  # i suppresses j only if i<j
    over &= bucket_valid[:, :, None] & bucket_valid[:, None, :]

    def sweep(state):
        k_cur, _, n = state
        # greedy recurrence per class c: keep[c,j] = valid[c,j] and no kept
        # i<j overlaps j. Rank r is final after r sweeps; any fixed point
        # satisfies the recurrence, so early-exit on convergence is exact.
        k_new = bucket_valid & ~jnp.any(over & k_cur[:, :, None], axis=1)
        return k_new, jnp.any(k_new != k_cur), n + 1

    kept_b, _, _ = jax.lax.while_loop(
        lambda s: s[1] & (s[2] < cap), sweep, (bucket_valid, True, 0)
    )
    safe_c = jnp.minimum(cls_int, nc - 1)
    safe_r = jnp.minimum(cls_rank, cap - 1)
    return kept_b[safe_c, safe_r] & in_cap


def _class_ranks(scores: jnp.ndarray, cls_idx: jnp.ndarray, nc: int):
    """(cls_rank [K], cls_int [K], max_count scalar) for score-sorted
    candidates: in-class rank via a one-hot cumsum (invalid rows -> class
    nc, rank clamped out of range)."""
    valid = scores > 0.0
    cls_int = jnp.where(valid, cls_idx.astype(jnp.int32), nc)
    onehot = (cls_int[:, None] == jnp.arange(nc)[None, :]).astype(jnp.int32)
    csum = jnp.cumsum(onehot, axis=0)
    rank = jnp.take_along_axis(
        csum, jnp.minimum(cls_int, nc - 1)[:, None], axis=1
    )[:, 0] - 1
    rank = jnp.where(valid, rank, scores.shape[0])
    max_count = jnp.max(csum[-1])
    return rank, cls_int, max_count


def _emit_topk_kept(cand_boxes, scores, cls_idx, kept, max_det):
    """Scatter the first ``max_det`` kept candidates (score order) into
    fixed-shape outputs: (dets [max_det, 6], valid [max_det])."""
    pos = jnp.cumsum(kept.astype(jnp.int32)) - 1
    pos = jnp.where(kept, pos, max_det)  # OOB rows dropped by the scatter
    rows = jnp.concatenate(
        [cand_boxes, scores[:, None], cls_idx[:, None]], axis=-1
    )
    dets = jnp.zeros((max_det, 6), jnp.float32).at[pos].set(
        rows, mode="drop", unique_indices=True
    )
    valid = jnp.zeros((max_det,), bool).at[pos].set(
        kept, mode="drop", unique_indices=True
    )
    return dets, valid


def _single_image_nms_tiled(
    pred, conf_thres, iou_thres, max_det, max_nms, multi_label, agnostic,
    class_mask, exact_topk=False, anchor_topc=8, tile=512,
    recall_target=0.95, bf16_select=False, row_select="grouped",
):
    """Tiled exact-greedy path: same keep-set as _single_image_nms."""
    cand_boxes, nms_boxes, top_scores, cls_idx = _select_candidates(
        pred, conf_thres, max_nms, multi_label, agnostic, class_mask,
        exact_topk, anchor_topc, recall_target, bf16_select, row_select,
    )
    kept = _tiled_keep(nms_boxes, top_scores, iou_thres, max_det=max_det,
                       tile=tile)
    return _emit_topk_kept(cand_boxes, top_scores, cls_idx, kept, max_det)


def _select_candidates(
    pred, conf_thres, max_nms, multi_label, agnostic, class_mask,
    exact_topk=False, anchor_topc=8, recall_target=0.95, bf16_select=False,
    row_select="grouped",
):
    """Single-image candidate selection: (raw_boxes [K,4], nms_boxes [K,4],
    scores [K], cls [K]). Scores are zeroed below conf_thres.

    The max_nms prefilter uses approx_max_k by default (TPU-efficient
    bucketed reduction); exact_topk forces lax.top_k. In the multi-label
    path, a per-anchor pre-reduction first shrinks each anchor's nc class
    scores to ``anchor_topc`` survivors so the global top-k runs over A*C
    instead of A*nc elements — exact whenever no anchor has more than C
    classes above conf_thres (real detector heads are far below this; the
    reference keeps all A*nc, utils/nms.py:76-77). 0 disables. Two
    pre-reduction algorithms (``row_select``):

      - 'grouped' (default): classes are grouped by c % C via a pure
        reshape+transpose (NO gather) and each group keeps its max —
        a 2-pass VPU reduction instead of lax.top_k's ~28-stage sort
        network over the padded-to-128 class lanes (measured 10.6 vs
        15.9 ms/b32 full-NMS at the eval protocol, docs/nms_fidelity.md).
        Keeps ≤1 class per residue group rather than the true top-C:
        loses a candidate only when two same-anchor classes with
        c ≡ c' (mod C) both clear conf AND rank into the global top
        max_nms — measured 1.000 keep-set agreement on both synthetic
        scene families.
      - 'topk': exact per-anchor top-C via lax.top_k (the conservative
        superset of 'grouped'; ~5 ms/b32 slower).

    ``bf16_select`` ranks candidates on a bfloat16 score grid — the [A, nc]
    grid is the selection phase's dominant HBM traffic (86 MB/b32 fp32 at
    640), so halving it trades ~3 significand bits of ranking precision for
    bandwidth. Selected candidates are re-scored in fp32 from the raw head
    outputs, so EMITTED scores are bit-identical to the fp32 path — only
    which near-tied candidates make the max_nms cut (and their greedy
    order) can differ. Fidelity of all knobs vs the reference's 30000
    exact cap is measured in docs/nms_fidelity.md (tools/nms_sweep.py)."""
    nc = pred.shape[-1] - 5
    boxes = xywh2xyxy(pred[:, :4])
    cand_boxes = None  # set by the packed-gather branch, else boxes[box_idx]
    sel_dtype = jnp.bfloat16 if bf16_select else jnp.float32
    scores = pred[:, 5:].astype(sel_dtype) * pred[:, 4:5].astype(sel_dtype)
    if class_mask is not None:
        scores = scores * class_mask[None, :].astype(sel_dtype)

    def _topk(vals, k):
        if k >= vals.shape[0]:
            return jax.lax.top_k(vals, vals.shape[0])
        if exact_topk:
            return jax.lax.top_k(vals, k)
        return jax.lax.approx_max_k(vals, k, recall_target=recall_target)

    if multi_label and nc > 1:
        if 0 < anchor_topc < nc:
            if row_select == "grouped":
                # group classes by residue c % C with a reshape+transpose
                # (class c sits at (i=c//C, j=c%C) of [A, W, C]); keep each
                # group's max. Zero-pad when C doesn't divide nc — padded
                # cells are below conf and their (>= nc) class ids only
                # ever flow into zero-score (invalid) candidate rows.
                A = scores.shape[0]
                n_groups = anchor_topc
                width = -(-nc // n_groups)
                padded = n_groups * width - nc
                sc = jnp.pad(scores, ((0, 0), (0, padded))) if padded else scores
                grid = sc.reshape(A, width, n_groups).transpose(0, 2, 1)
                row_scores = jnp.max(grid, axis=-1)  # [A, C]
                local = jnp.argmax(grid, axis=-1)    # [A, C] in-group index
                row_cls = (
                    local * n_groups + jnp.arange(n_groups)[None, :]
                ).astype(jnp.float32)
            else:
                row_scores, row_cls = jax.lax.top_k(scores, anchor_topc)  # [A,C]
            flat = row_scores.reshape(-1)
            flat = jnp.where(flat > conf_thres, flat, 0.0)
            top_scores, top_idx = _topk(flat, min(max_nms, flat.shape[0]))
            box_idx = top_idx // anchor_topc
            # ONE fused row gather for (box, cls): two separate gathers from
            # [A,4] and [A*C] cost ~2x more on TPU (gather overhead is
            # per-op, not per-byte at this size — measured 6.7 -> 2.1 ms/b32
            # at K=8192); the repeat-expanded packed table fuses into the
            # gather producer and never round-trips HBM in full
            packed = jnp.concatenate(
                [jnp.repeat(boxes, anchor_topc, axis=0),
                 row_cls.reshape(-1, 1).astype(boxes.dtype)], axis=1
            )  # [A*C, 5]
            sel = packed[top_idx]
            cand_boxes = sel[:, :4]
            cls_idx = sel[:, 4].astype(jnp.float32)
        else:
            flat = scores.reshape(-1)
            flat = jnp.where(flat > conf_thres, flat, 0.0)
            top_scores, top_idx = _topk(flat, min(max_nms, flat.shape[0]))
            box_idx = top_idx // nc
            cls_idx = (top_idx % nc).astype(jnp.float32)
    else:
        best = jnp.max(scores, axis=-1)
        cls = jnp.argmax(scores, axis=-1).astype(jnp.float32)
        best = jnp.where(best > conf_thres, best, 0.0)
        top_scores, box_idx = _topk(best, min(max_nms, best.shape[0]))
        cls_idx = cls[box_idx]

    if cand_boxes is None:
        cand_boxes = boxes[box_idx]
    if bf16_select:
        # re-score the K selected candidates in fp32 from the raw head
        # outputs — emitted scores bit-match the fp32 path; bf16 only
        # influenced WHICH candidates were ranked into the top max_nms
        raw = pred[box_idx]
        cls_int = cls_idx.astype(jnp.int32)
        cls_p = jnp.take_along_axis(raw[:, 5:], cls_int[:, None], axis=1)[:, 0]
        top_scores = raw[:, 4] * cls_p
        if class_mask is not None:
            top_scores = top_scores * class_mask[cls_int]
    top_scores = jnp.where(top_scores > conf_thres, top_scores, 0.0)
    offset = 0.0 if agnostic else MAX_WH
    nms_boxes = cand_boxes + (cls_idx * offset)[:, None]
    return cand_boxes, nms_boxes, top_scores.astype(jnp.float32), cls_idx


@partial(
    jax.jit,
    static_argnames=(
        "conf_thres", "iou_thres", "max_det", "max_nms", "multi_label",
        "agnostic", "use_pallas", "exact_topk", "method", "anchor_topc",
        "tile", "recall_target", "class_cap", "bf16_select", "row_select",
    ),
)
def non_max_suppression(
    prediction: jnp.ndarray,
    conf_thres: float = 0.25,
    iou_thres: float = 0.45,
    max_det: int = 300,
    max_nms: int = 30000,
    multi_label: bool = False,
    agnostic: bool = False,
    class_mask: Optional[jnp.ndarray] = None,
    use_pallas: Optional[bool] = None,
    exact_topk: bool = False,
    method: Optional[str] = None,
    anchor_topc: int = 8,
    tile: int = 512,
    recall_target: float = 0.95,
    class_cap: int = 256,
    bf16_select: bool = False,
    row_select: str = "grouped",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NMS over [b, A, 5+nc] predictions.

    Returns (detections [b, max_det, 6] as xyxy/conf/cls, valid [b, max_det]).
    ``class_mask`` is an optional [nc] 0/1 vector implementing the reference's
    ``classes`` filter (reference :83-84) without a dynamic shape.

    Four keep backends produce identical keep-sets (tests/test_nms.py):
      - 'perclass' — per-class parallel Jacobi (_per_class_keep): the
                   class-offset suppression graph is block-diagonal, so all
                   classes resolve simultaneously; sequential depth = max
                   greedy chain depth. Falls back to 'tiled' in-graph
                   (lax.cond) when any class exceeds ``class_cap``
                   candidates, and statically for agnostic/1-class.
      - 'tiled'  — tile-parallel exact greedy (_tiled_keep): K/tile
                   sequential steps of batched IoU work; default.
      - 'pallas' — VMEM-resident sequential loop (ops/pallas/nms_kernel.py),
                   max_det sequential steps; TPU only.
      - 'loop'   — XLA fori_loop fallback, max_det sequential steps.
    ``use_pallas`` is the legacy knob: True -> 'pallas', False -> non-pallas
    default ('tiled').

    ``bf16_select`` ranks candidate selection on a bfloat16 score grid
    (halves the [A, nc] grid's HBM traffic) and re-scores the selected
    candidates in fp32 — emitted scores are exact; only near-tied ranking
    at the max_nms boundary can differ (measured in docs/nms_fidelity.md).
    """
    # Materialize the prediction tensor before any selection consumer reads
    # it. When NMS is fused into the same jit as the model forward (the
    # Evaler/Inferer single-dispatch design), XLA otherwise fuses the decode
    # tail into EACH of the several selection consumers (score grid, row
    # top-k, gathers) and recomputes it — measured +10.1 ms/b32 on S@640
    # (40.0 fused vs 29.2 with the barrier = fwd 15.5 + NMS 14.4 exactly).
    # Barriering a pre-sliced (boxes, obj, cls) tuple instead does NOT work
    # (the re-concat re-fuses, measured 40.2). No-op for standalone NMS jits.
    prediction = jax.lax.optimization_barrier(prediction)
    nc = prediction.shape[-1] - 5
    if method is None:
        if use_pallas:
            method = "pallas"
        else:
            method = "tiled"
    if method == "pallas" and jax.default_backend() != "tpu":
        method = "tiled"
    # per-class parallel keep needs class-independent suppression (not
    # agnostic) and a sane [nc, cap, cap] mask footprint
    if method == "perclass" and (agnostic or nc <= 1 or nc * class_cap ** 2 > 2 ** 24):
        method = "tiled"

    if method == "perclass":
        sel = partial(
            _select_candidates,
            conf_thres=conf_thres, max_nms=max_nms, multi_label=multi_label,
            agnostic=agnostic, class_mask=class_mask, exact_topk=exact_topk,
            anchor_topc=anchor_topc, recall_target=recall_target,
            bf16_select=bf16_select, row_select=row_select,
        )
        cand_boxes, nms_boxes, scores, cls_idx = jax.vmap(sel)(
            prediction.astype(jnp.float32)
        )
        ranks, cls_int, max_counts = jax.vmap(
            partial(_class_ranks, nc=nc)
        )(scores, cls_idx)
        # unbatched predicate -> lax.cond stays a branch (one side executes):
        # overflow anywhere in the batch falls the whole batch back to the
        # tiled exact path, keeping the keep-set exact in all cases
        overflow = jnp.any(max_counts > class_cap)
        kept = jax.lax.cond(
            overflow,
            lambda ops: jax.vmap(
                partial(_tiled_keep, iou_thres=iou_thres, max_det=max_det,
                        tile=tile)
            )(ops[0], ops[1]),
            lambda ops: jax.vmap(
                partial(_per_class_keep, iou_thres=iou_thres, nc=nc,
                        cap=class_cap)
            )(*ops),
            (nms_boxes, scores, ranks, cls_int),
        )
        return jax.vmap(partial(_emit_topk_kept, max_det=max_det))(
            cand_boxes, scores, cls_idx, kept
        )

    if method == "pallas":
        sel = partial(
            _select_candidates,
            conf_thres=conf_thres, max_nms=max_nms, multi_label=multi_label,
            agnostic=agnostic, class_mask=class_mask, exact_topk=exact_topk,
            anchor_topc=anchor_topc, recall_target=recall_target,
            bf16_select=bf16_select, row_select=row_select,
        )
        cand_boxes, nms_boxes, scores, cls_idx = jax.vmap(sel)(
            prediction.astype(jnp.float32)
        )
        from yolov6_tpu.ops.pallas.nms_kernel import pallas_greedy_nms

        rows, valid = pallas_greedy_nms(nms_boxes, scores, max_det, iou_thres)
        idx = rows[..., 5].astype(jnp.int32)
        out_boxes = jnp.take_along_axis(cand_boxes, idx[..., None], axis=1)
        out_scores = rows[..., 4]
        out_cls = jnp.take_along_axis(cls_idx, idx, axis=1)
        dets = jnp.concatenate(
            [out_boxes, out_scores[..., None], out_cls[..., None]], axis=-1
        )
        dets = jnp.where(valid[..., None], dets, 0.0)
        return dets, valid

    fn = partial(
        _single_image_nms_tiled if method == "tiled" else _single_image_nms,
        conf_thres=conf_thres,
        iou_thres=iou_thres,
        max_det=max_det,
        max_nms=max_nms,
        multi_label=multi_label,
        agnostic=agnostic,
        class_mask=class_mask,
        exact_topk=exact_topk,
        anchor_topc=anchor_topc,
        recall_target=recall_target,
        bf16_select=bf16_select, row_select=row_select,
    )
    if method == "tiled":
        fn = partial(fn, tile=tile)
    return jax.vmap(fn)(prediction.astype(jnp.float32))
