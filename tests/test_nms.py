"""Fixed-shape NMS parity vs a numpy oracle.

torchvision is unavailable in this image, so the oracle reimplements the
reference pipeline (yolov6/utils/nms.py:31-105) directly in numpy: candidate
mask, conf=obj*cls, multi-label expansion, class-offset greedy NMS, max_det.
"""

import numpy as np

import jax.numpy as jnp

from yolov6_tpu.ops.nms import non_max_suppression


def _xywh2xyxy(x):
    y = x.copy()
    y[:, 0] = x[:, 0] - x[:, 2] / 2
    y[:, 1] = x[:, 1] - x[:, 3] / 2
    y[:, 2] = x[:, 0] + x[:, 2] / 2
    y[:, 3] = x[:, 1] + x[:, 3] / 2
    return y


def _greedy_nms(boxes, scores, iou_thres):
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        lt = np.maximum(boxes[i, :2], boxes[:, :2])
        rb = np.minimum(boxes[i, 2:], boxes[:, 2:])
        inter = np.prod(np.clip(rb - lt, 0, None), axis=-1)
        iou = inter / (areas[i] + areas - inter + 1e-12)
        suppressed |= iou > iou_thres
    return np.array(keep, int)


def oracle_nms(pred, conf_thres, iou_thres, classes=None, agnostic=False, multi_label=True, max_det=300):
    """Reference-semantics NMS for one batch (returns list of [n,6])."""
    out = []
    for x in pred:
        scores = x[:, 5:] * x[:, 4:5]
        box = _xywh2xyxy(x[:, :4])
        if multi_label and scores.shape[1] > 1:
            bi, ci = np.nonzero(scores > conf_thres)
            rows = np.concatenate(
                [box[bi], scores[bi, ci][:, None], ci[:, None].astype(np.float32)], 1
            )
        else:
            ci = scores.argmax(1)
            sc = scores.max(1)
            m = sc > conf_thres
            rows = np.concatenate([box[m], sc[m, None], ci[m, None].astype(np.float32)], 1)
        if classes is not None:
            rows = rows[np.isin(rows[:, 5], classes)]
        if not len(rows):
            out.append(np.zeros((0, 6), np.float32))
            continue
        offset = 0 if agnostic else rows[:, 5:6] * 4096
        keep = _greedy_nms(rows[:, :4] + offset, rows[:, 4], iou_thres)[:max_det]
        out.append(rows[keep])
    return out


def _random_preds(b=2, a=400, nc=6, seed=0):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(40, 280, (b, a, 1))
    cy = rng.uniform(40, 280, (b, a, 1))
    w = rng.uniform(5, 80, (b, a, 1))
    h = rng.uniform(5, 80, (b, a, 1))
    obj = np.ones((b, a, 1))
    cls = rng.uniform(0, 1, (b, a, nc)) ** 3
    return np.concatenate([cx, cy, w, h, obj, cls], axis=-1).astype(np.float32)


def _check(preds, want, dets, valid):
    dets = np.asarray(dets)
    valid = np.asarray(valid)
    for i in range(preds.shape[0]):
        w, g = want[i], dets[i][valid[i]]
        assert g.shape[0] == w.shape[0], f"count mismatch {g.shape[0]} vs {w.shape[0]}"
        np.testing.assert_allclose(g[:, 4], w[:, 4], rtol=1e-5)
        np.testing.assert_allclose(g[:, :4], w[:, :4], rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(g[:, 5], w[:, 5])


def test_nms_multi_label():
    preds = _random_preds()
    want = oracle_nms(preds, 0.3, 0.65, multi_label=True)
    got = non_max_suppression(jnp.asarray(preds), 0.3, 0.65, multi_label=True)
    _check(preds, want, *got)


def test_nms_single_label():
    preds = _random_preds(seed=1)
    want = oracle_nms(preds, 0.3, 0.65, multi_label=False)
    got = non_max_suppression(jnp.asarray(preds), 0.3, 0.65, multi_label=False)
    _check(preds, want, *got)


def test_nms_agnostic():
    preds = _random_preds(seed=2)
    want = oracle_nms(preds, 0.3, 0.65, agnostic=True, multi_label=True)
    got = non_max_suppression(jnp.asarray(preds), 0.3, 0.65, multi_label=True, agnostic=True)
    _check(preds, want, *got)


def test_nms_low_conf_eval_protocol():
    """conf=0.03 / iou=0.65 — the published eval protocol (tools/eval.py:79-81)."""
    preds = _random_preds(b=1, a=800, seed=4)
    want = oracle_nms(preds, 0.03, 0.65, multi_label=True)
    got = non_max_suppression(jnp.asarray(preds), 0.03, 0.65, multi_label=True)
    _check(preds, want, *got)


def test_nms_perclass_backend_oracle():
    """'perclass' keep (block-diagonal Jacobi) matches the oracle on every
    protocol, on both of its runtime paths: the per-class fast path
    (class_cap ample) and the in-graph lax.cond fallback to tiled
    (class_cap=8 forces overflow)."""
    for cap in (512, 8):
        preds = _random_preds(seed=5)
        want = oracle_nms(preds, 0.3, 0.65, multi_label=True)
        got = non_max_suppression(
            jnp.asarray(preds), 0.3, 0.65, multi_label=True,
            method="perclass", class_cap=cap,
        )
        _check(preds, want, *got)
        # eval protocol: dense candidate load
        preds = _random_preds(b=1, a=800, seed=6)
        want = oracle_nms(preds, 0.03, 0.65, multi_label=True)
        got = non_max_suppression(
            jnp.asarray(preds), 0.03, 0.65, multi_label=True,
            method="perclass", class_cap=cap,
        )
        _check(preds, want, *got)
    # agnostic statically falls back to tiled (classes not independent)
    preds = _random_preds(seed=7)
    want = oracle_nms(preds, 0.3, 0.65, agnostic=True, multi_label=True)
    got = non_max_suppression(
        jnp.asarray(preds), 0.3, 0.65, multi_label=True, agnostic=True,
        method="perclass",
    )
    _check(preds, want, *got)


def test_nms_bf16_select():
    """bf16_select ranks candidates on a bf16 grid but re-scores the
    selected ones in fp32: every emitted score must be an exact fp32
    product from the score grid, the keep set must nearly match the fp32
    path (bf16 only reorders near-ties), and masked classes must never
    resurface through the fp32 re-score."""
    preds = _random_preds(b=2, a=400, seed=8)
    f32 = non_max_suppression(jnp.asarray(preds), 0.3, 0.65, multi_label=True)
    b16 = non_max_suppression(
        jnp.asarray(preds), 0.3, 0.65, multi_label=True, bf16_select=True
    )
    grid = preds[:, :, 5:] * preds[:, :, 4:5]
    for i in range(preds.shape[0]):
        kept = np.asarray(b16[0][i])[np.asarray(b16[1][i])]
        assert kept.shape[0] > 0
        for row in kept:
            assert np.any(grid[i] == row[4]), f"score {row[4]} not an exact fp32 product"

    def sets(dets, valid):
        dets, valid = np.asarray(dets), np.asarray(valid)
        return [
            {tuple(np.round(r[:4], 3)) + (int(r[5]),) for r in dets[i][valid[i]]}
            for i in range(dets.shape[0])
        ]

    a, b = sets(*f32), sets(*b16)
    inter = sum(len(x & y) for x, y in zip(a, b))
    total = sum(len(x) for x in a)
    assert inter / total >= 0.9, f"keep-set agreement {inter}/{total}"

    # class filter still binds under bf16 ranking (fp32 re-score is masked)
    mask = np.zeros(6, np.float32)
    mask[[1, 4]] = 1.0
    dets, valid = non_max_suppression(
        jnp.asarray(preds), 0.3, 0.65, multi_label=True,
        class_mask=jnp.asarray(mask), bf16_select=True,
    )
    kept_cls = np.asarray(dets)[np.asarray(valid)][:, 5]
    assert np.isin(kept_cls, [1, 4]).all()

    # single-label path compiles + stays sane under bf16 ranking
    dets, valid = non_max_suppression(
        jnp.asarray(preds), 0.3, 0.65, multi_label=False, bf16_select=True
    )
    assert np.asarray(valid).sum() > 0


def test_nms_class_filter():
    preds = _random_preds(seed=3)
    keep_classes = [1, 4]
    want = oracle_nms(preds, 0.3, 0.65, classes=keep_classes, multi_label=True)
    mask = np.zeros(6, np.float32)
    mask[keep_classes] = 1.0
    dets, valid = non_max_suppression(
        jnp.asarray(preds), 0.3, 0.65, multi_label=True, class_mask=jnp.asarray(mask)
    )
    _check(preds, want, dets, valid)


def test_nms_input_is_fusion_barriered():
    """The prediction tensor must pass through optimization_barrier before
    selection: without it, fusing NMS into the same jit as the model forward
    recomputes the decode tail per selection consumer (+10 ms/b32 on S@640,
    docs/nms_fidelity.md 'Fused-eval fusion penalty')."""
    import jax

    preds = jnp.zeros((1, 64, 11))
    jaxpr = jax.make_jaxpr(
        lambda p: non_max_suppression(p, 0.3, 0.65, multi_label=True)
    )(preds)
    assert "optimization_barrier" in str(jaxpr)
