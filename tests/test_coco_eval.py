"""Sanity tests of the self-contained COCO evaluator against hand-computed APs."""

import numpy as np

from yolov6_tpu.utils.coco_eval import COCOEvaluator


def _gt(images, anns, ncat=2):
    return {
        "images": [{"id": i} for i in images],
        "annotations": [
            {
                "id": j, "image_id": a[0], "category_id": a[1],
                "bbox": list(a[2]), "area": a[2][2] * a[2][3],
                "iscrowd": a[3] if len(a) > 3 else 0,
            }
            for j, a in enumerate(anns)
        ],
        "categories": [{"id": c} for c in range(1, ncat + 1)],
    }


def _det(image_id, cat, bbox, score):
    return {"image_id": image_id, "category_id": cat, "bbox": list(bbox), "score": score}


def test_perfect_detections():
    gt = _gt([1, 2], [(1, 1, (10, 10, 50, 50)), (2, 1, (20, 20, 40, 40)), (2, 2, (5, 5, 30, 60))])
    dets = [
        _det(1, 1, (10, 10, 50, 50), 0.9),
        _det(2, 1, (20, 20, 40, 40), 0.8),
        _det(2, 2, (5, 5, 30, 60), 0.95),
    ]
    stats = COCOEvaluator(gt).evaluate(dets)
    assert abs(stats["AP"] - 1.0) < 1e-6
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert abs(stats["AR100"] - 1.0) < 1e-6


def test_half_recall():
    gt = _gt([1], [(1, 1, (0, 0, 10, 10)), (1, 1, (50, 50, 10, 10))], ncat=1)
    dets = [_det(1, 1, (0, 0, 10, 10), 0.9)]
    stats = COCOEvaluator(gt).evaluate(dets)
    # precision 1 up to recall 0.5 -> 101-pt AP = 51/101
    assert abs(stats["AP"] - 51 / 101) < 1e-6
    assert abs(stats["AR100"] - 0.5) < 1e-6


def test_false_positive_before_tp():
    gt = _gt([1], [(1, 1, (0, 0, 10, 10))], ncat=1)
    dets = [
        _det(1, 1, (80, 80, 10, 10), 0.95),  # FP, higher score
        _det(1, 1, (0, 0, 10, 10), 0.9),     # TP
    ]
    stats = COCOEvaluator(gt).evaluate(dets)
    # precision at full recall is 0.5; envelope gives 0.5 everywhere
    assert abs(stats["AP"] - 0.5) < 1e-6


def test_crowd_is_ignored():
    gt = _gt([1], [(1, 1, (0, 0, 10, 10)), (1, 1, (50, 50, 20, 20), 1)], ncat=1)
    dets = [
        _det(1, 1, (0, 0, 10, 10), 0.9),
        _det(1, 1, (50, 50, 20, 20), 0.8),  # matches crowd -> ignored, not FP
    ]
    stats = COCOEvaluator(gt).evaluate(dets)
    assert abs(stats["AP"] - 1.0) < 1e-6


def test_localization_threshold():
    # det has IoU ~0.58 with gt: TP at 0.5, FP at 0.75
    gt = _gt([1], [(1, 1, (0, 0, 100, 10))], ncat=1)
    dets = [_det(1, 1, (25, 0, 100, 10), 0.9)]  # IoU = 75/125 = 0.6
    stats = COCOEvaluator(gt).evaluate(dets)
    assert abs(stats["AP50"] - 1.0) < 1e-6
    assert stats["AP75"] == 0.0
    # thresholds 0.5, 0.55, 0.6 are TPs -> AP = 3/10
    assert abs(stats["AP"] - 0.3) < 1e-6


def test_area_ranges():
    gt = _gt([1], [(1, 1, (0, 0, 10, 10)), (1, 1, (50, 50, 200, 200))], ncat=1)
    dets = [
        _det(1, 1, (0, 0, 10, 10), 0.9),
        _det(1, 1, (50, 50, 200, 200), 0.8),
    ]
    stats = COCOEvaluator(gt).evaluate(dets)
    assert abs(stats["AP_small"] - 1.0) < 1e-6
    assert abs(stats["AP_large"] - 1.0) < 1e-6
    assert stats["AP_medium"] == -1.0  # no medium gt
