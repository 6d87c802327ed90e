"""PR/F1/P/R-curve and confusion-matrix plot rendering
(reference: utils/metrics.py plot_pr_curve/plot_mc_curve/ConfusionMatrix.plot)."""

import os

import numpy as np

from yolov6_tpu.utils.metrics import ConfusionMatrix, ap_per_class


def test_ap_per_class_plots(tmp_path):
    rng = np.random.default_rng(0)
    n = 200
    tp = rng.random((n, 10)) > 0.5
    conf = rng.random(n)
    pred_cls = rng.integers(0, 3, n)
    target_cls = rng.integers(0, 3, 120)

    p_plot = ap_per_class(tp, conf, pred_cls, target_cls, plot=True,
                          save_dir=str(tmp_path), names=("a", "b", "c"))
    p_noplot = ap_per_class(tp, conf, pred_cls, target_cls, plot=False)
    for got, want in zip(p_plot, p_noplot):
        np.testing.assert_allclose(got, want)  # plotting must not change metrics
    for f in ("PR_curve.png", "F1_curve.png", "P_curve.png", "R_curve.png"):
        assert (tmp_path / f).stat().st_size > 0


def test_confusion_matrix_plot(tmp_path):
    rng = np.random.default_rng(1)
    cm = ConfusionMatrix(nc=3)
    dets = np.concatenate(
        [rng.uniform(0, 100, (20, 4)), rng.random((20, 1)),
         rng.integers(0, 3, (20, 1)).astype(float)], 1)
    dets[:, 2:4] += dets[:, :2]
    labels = np.concatenate(
        [rng.integers(0, 3, (10, 1)).astype(float), rng.uniform(0, 100, (10, 4))], 1)
    labels[:, 3:5] += labels[:, 1:3]
    cm.process_batch(dets, labels)
    cm.plot(save_dir=str(tmp_path), names=("a", "b", "c"))
    assert (tmp_path / "confusion_matrix.png").stat().st_size > 0
