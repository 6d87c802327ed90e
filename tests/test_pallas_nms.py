"""Pallas greedy-NMS kernel (interpret mode on CPU) vs a numpy oracle."""

import numpy as np

import conftest

import jax.numpy as jnp

from yolov6_tpu.ops.pallas.nms_kernel import pallas_greedy_nms


def test_pallas_kernel_matches_oracle():
    rng = np.random.default_rng(0)
    B, K, MD = 2, 256, 50
    xy = rng.uniform(0, 300, (B, K, 2)).astype(np.float32)
    wh = rng.uniform(5, 80, (B, K, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], -1)
    scores = (rng.uniform(0, 1, (B, K)) ** 2).astype(np.float32)
    scores[scores < 0.1] = 0.0

    rows, valid = pallas_greedy_nms(
        jnp.asarray(boxes), jnp.asarray(scores), MD, 0.5, interpret=True
    )
    rows, valid = np.asarray(rows), np.asarray(valid)

    for b in range(B):
        order = np.argsort(-scores[b], kind="stable")
        suppressed = np.zeros(K, bool)
        keep = []
        for i in order:
            if suppressed[i] or scores[b, i] <= 0 or len(keep) >= MD:
                continue
            keep.append(i)
            lt = np.maximum(boxes[b, i, :2], boxes[b, :, :2])
            rb = np.minimum(boxes[b, i, 2:], boxes[b, :, 2:])
            inter = np.prod(np.clip(rb - lt, 0, None), -1)
            a = np.prod(boxes[b, i, 2:] - boxes[b, i, :2])
            ar = np.prod(boxes[b, :, 2:] - boxes[b, :, :2], -1)
            iou = inter / (a + ar - inter + 1e-12)
            suppressed |= iou > 0.5
        got_idx = rows[b, valid[b], 5].astype(int)
        assert list(got_idx) == keep
        np.testing.assert_allclose(rows[b, valid[b], 4], scores[b, keep], rtol=1e-6)
