"""Adversarial equivalence: yolov6_tpu.utils.coco_eval vs a literal
transcription of pycocotools' COCOeval (tests/cocoeval_oracle.py) on large
seeded random datasets exercising crowds, ignore flags, area-range edges,
score ties, maxDets truncation, empty images, and det-only/gt-only images.

The two implementations are structured differently (streaming per-category
vs per-image evalImg dicts), so agreement to ~1e-10 on all 12 COCO stats is
strong evidence both implement the published protocol.
"""

import numpy as np
import pytest

from cocoeval_oracle import COCOevalOracle
from yolov6_tpu.utils.coco_eval import COCOEvaluator


def _random_dataset(seed, n_images=60, n_cats=5, crowd_p=0.1, ignore_p=0.05,
                    tie_p=0.2, max_gt=12, max_dt=25):
    """Random boxes with areas spanning the small/medium/large boundaries,
    detections correlated with GT (jittered copies) plus pure noise."""
    rng = np.random.default_rng(seed)
    images = [{"id": i + 1, "width": 640, "height": 640} for i in range(n_images)]
    cats = [{"id": c + 1, "name": f"c{c}"} for c in range(n_cats)]
    anns, dets = [], []
    ann_id = 1
    tie_scores = np.round(rng.uniform(0.05, 0.95, 8), 2)  # shared pool -> ties
    for im in images:
        if rng.uniform() < 0.1:
            pass  # empty image: no gt (dets may still land here)
        else:
            for _ in range(rng.integers(0, max_gt)):
                # log-uniform size spanning 32^2 / 96^2 area boundaries
                w, h = np.exp(rng.uniform(np.log(4), np.log(300), 2))
                x = rng.uniform(0, 640 - min(w, 600))
                y = rng.uniform(0, 640 - min(h, 600))
                ann = {
                    "id": ann_id,
                    "image_id": im["id"],
                    "category_id": int(rng.integers(1, n_cats + 1)),
                    "bbox": [float(x), float(y), float(w), float(h)],
                    "area": float(w * h),
                    "iscrowd": int(rng.uniform() < crowd_p),
                }
                if rng.uniform() < ignore_p:
                    ann["ignore"] = 1
                anns.append(ann)
                ann_id += 1
                # 0-2 detections near this gt
                for _ in range(rng.integers(0, 3)):
                    jit = rng.normal(0, 0.15, 4) * [w, h, w, h]
                    score = (
                        float(rng.choice(tie_scores))
                        if rng.uniform() < tie_p
                        else float(rng.uniform(0.01, 1.0))
                    )
                    dets.append({
                        "image_id": im["id"],
                        "category_id": ann["category_id"]
                        if rng.uniform() < 0.85
                        else int(rng.integers(1, n_cats + 1)),
                        "bbox": [float(x + jit[0]), float(y + jit[1]),
                                 float(max(w + jit[2], 1)), float(max(h + jit[3], 1))],
                        "score": score,
                    })
        # noise detections (some on empty images)
        for _ in range(rng.integers(0, max_dt // 4)):
            w, h = np.exp(rng.uniform(np.log(4), np.log(300), 2))
            dets.append({
                "image_id": im["id"],
                "category_id": int(rng.integers(1, n_cats + 1)),
                "bbox": [float(rng.uniform(0, 600)), float(rng.uniform(0, 600)),
                         float(w), float(h)],
                "score": float(rng.uniform(0.01, 1.0)),
            })
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, dets


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_coco_eval_matches_pycocotools_oracle(seed):
    gt, dets = _random_dataset(seed)
    assert len(dets) > 300, "dataset too small to be adversarial"

    ours = COCOEvaluator(gt).evaluate(dets)
    oracle = COCOevalOracle(gt, dets)
    oracle.accumulate()
    theirs = oracle.summarize()

    for key in theirs:
        assert ours[key] == pytest.approx(theirs[key], abs=1e-9), (
            f"seed {seed}: stat {key}: ours={ours[key]} oracle={theirs[key]}"
        )


def test_coco_eval_matches_oracle_dense_overlaps():
    """Dense same-class overlapping boxes: many candidate matches per det,
    exercising the greedy tie-break and crowd re-match rules."""
    rng = np.random.default_rng(7)
    images = [{"id": 1, "width": 640, "height": 640}]
    cats = [{"id": 1, "name": "c"}]
    anns, dets = [], []
    for i in range(30):
        x, y = rng.uniform(100, 300, 2)
        w, h = rng.uniform(50, 150, 2)
        anns.append({
            "id": i + 1, "image_id": 1, "category_id": 1,
            "bbox": [float(x), float(y), float(w), float(h)],
            "area": float(w * h), "iscrowd": int(i % 5 == 0),
        })
    for _ in range(200):
        x, y = rng.uniform(80, 320, 2)
        w, h = rng.uniform(40, 170, 2)
        dets.append({
            "image_id": 1, "category_id": 1,
            "bbox": [float(x), float(y), float(w), float(h)],
            "score": float(np.round(rng.uniform(), 1)),  # heavy ties
        })
    gt = {"images": images, "annotations": anns, "categories": cats}
    ours = COCOEvaluator(gt).evaluate(dets)
    oracle = COCOevalOracle(gt, dets)
    oracle.accumulate()
    theirs = oracle.summarize()
    for key in theirs:
        assert ours[key] == pytest.approx(theirs[key], abs=1e-9), key
