"""Golden parity: assigners and the full ComputeLoss vs the reference PyTorch
implementations (run on CPU; reference .cuda() calls are no-op patched)."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax.numpy as jnp  # noqa: E402

from yolov6_tpu.assigners.atss_assigner import atss_assigner  # noqa: E402
from yolov6_tpu.assigners.tal_assigner import task_aligned_assigner  # noqa: E402
from yolov6_tpu.losses.loss import ComputeLoss  # noqa: E402


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    yield


def _make_assignment_problem(bs=2, nc=8, img=64, max_gt=6, seed=0):
    """Random preds/gts over a 3-level anchor grid of an img x img image."""
    from yolov6.assigners.anchor_generator import generate_anchors as ref_anchors

    rng = np.random.default_rng(seed)
    feats = [torch.zeros(bs, 1, img // s, img // s) for s in (8, 16, 32)]
    anchors, anchor_points, n_anchors_list, stride_tensor = ref_anchors(
        feats, torch.tensor([8, 16, 32]), 5.0, 0.5
    )
    A = anchor_points.shape[0]
    pd_scores = rng.uniform(0, 1, (bs, A, nc)).astype(np.float32)
    # predicted boxes roughly around anchor points
    centers = anchor_points.numpy()
    wh = rng.uniform(4, 30, (bs, A, 2)).astype(np.float32)
    jitter = rng.uniform(-4, 4, (bs, A, 2)).astype(np.float32)
    cxy = centers[None] + jitter
    pd_bboxes = np.concatenate([cxy - wh / 2, cxy + wh / 2], -1).astype(np.float32)

    gt_labels = rng.integers(0, nc, (bs, max_gt, 1)).astype(np.float32)
    g_wh = rng.uniform(8, 40, (bs, max_gt, 2))
    g_xy = rng.uniform(0, img, (bs, max_gt, 2))
    gt_bboxes = np.concatenate(
        [np.clip(g_xy - g_wh / 2, 0, img), np.clip(g_xy + g_wh / 2, 0, img)], -1
    ).astype(np.float32)
    # mask out last rows of image 1 as padding
    mask_gt = np.ones((bs, max_gt, 1), np.float32)
    mask_gt[1, -2:] = 0
    gt_bboxes[1, -2:] = 0
    gt_labels[1, -2:] = -1
    return dict(
        anchors=anchors.numpy(), anchor_points=centers,
        n_anchors_list=n_anchors_list, stride=stride_tensor.numpy(),
        pd_scores=pd_scores, pd_bboxes=pd_bboxes,
        gt_labels=gt_labels, gt_bboxes=gt_bboxes, mask_gt=mask_gt,
    )


def test_tal_assigner_parity():
    from yolov6.assigners.tal_assigner import TaskAlignedAssigner

    p = _make_assignment_problem()
    ref = TaskAlignedAssigner(topk=13, num_classes=8, alpha=1.0, beta=6.0)
    tl, tb, ts, fg = ref(
        torch.from_numpy(p["pd_scores"]), torch.from_numpy(p["pd_bboxes"]),
        torch.from_numpy(p["anchor_points"]), torch.from_numpy(p["gt_labels"]),
        torch.from_numpy(p["gt_bboxes"]), torch.from_numpy(p["mask_gt"]),
    )
    gl, gb, gs, gf = task_aligned_assigner(
        jnp.asarray(p["pd_scores"]), jnp.asarray(p["pd_bboxes"]),
        jnp.asarray(p["anchor_points"]), jnp.asarray(p["gt_labels"]),
        jnp.asarray(p["gt_bboxes"]), jnp.asarray(p["mask_gt"]),
        topk=13, num_classes=8,
    )
    np.testing.assert_array_equal(np.asarray(gf), fg.numpy())
    np.testing.assert_allclose(np.asarray(gs), ts.numpy(), rtol=1e-5, atol=1e-6)
    fg_np = fg.numpy()
    np.testing.assert_array_equal(np.asarray(gl)[fg_np], tl.numpy()[fg_np])
    np.testing.assert_allclose(np.asarray(gb)[fg_np], tb.numpy()[fg_np], rtol=1e-5)


def test_atss_assigner_parity():
    from yolov6.assigners.atss_assigner import ATSSAssigner

    # img=128 keeps every level >= topk anchors (the reference requires it)
    p = _make_assignment_problem(seed=5, img=128)
    ref = ATSSAssigner(topk=9, num_classes=8)
    tl, tb, ts, fg = ref(
        torch.from_numpy(p["anchors"]), p["n_anchors_list"],
        torch.from_numpy(p["gt_labels"]), torch.from_numpy(p["gt_bboxes"]),
        torch.from_numpy(p["mask_gt"]), torch.from_numpy(p["pd_bboxes"]),
    )
    gl, gb, gs, gf = atss_assigner(
        jnp.asarray(p["anchors"]), p["n_anchors_list"],
        jnp.asarray(p["gt_labels"]), jnp.asarray(p["gt_bboxes"]),
        jnp.asarray(p["mask_gt"]), jnp.asarray(p["pd_bboxes"]),
        topk=9, num_classes=8,
    )
    np.testing.assert_array_equal(np.asarray(gf), fg.numpy())
    fg_np = fg.numpy()
    np.testing.assert_array_equal(np.asarray(gl)[fg_np], tl.numpy()[fg_np])
    np.testing.assert_allclose(np.asarray(gb)[fg_np], tb.numpy()[fg_np], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gs), ts.numpy(), rtol=1e-4, atol=1e-6)


def _targets_to_rows(targets_padded):
    """[bs,M,5] padded -> reference row format [n, 6] (img_idx, cls, xywh)."""
    rows = []
    for i, t in enumerate(targets_padded):
        for cls, cx, cy, w, h in t:
            if cls >= 0:
                rows.append([i, cls, cx, cy, w, h])
    return torch.tensor(rows, dtype=torch.float32)


@pytest.mark.parametrize("use_dfl,iou_type,epoch", [
    (True, "giou", 10), (False, "siou", 10), (True, "giou", 0), (False, "ciou", 0),
])
def test_compute_loss_parity(use_dfl, iou_type, epoch):
    from yolov6.models.losses.loss import ComputeLoss as RefComputeLoss

    rng = np.random.default_rng(42)
    bs, nc, img, M = 2, 8, 128, 5
    reg_max = 16 if use_dfl else 0
    A = (img // 8) ** 2 + (img // 16) ** 2 + (img // 32) ** 2

    pred_scores = rng.uniform(0.01, 0.99, (bs, A, nc)).astype(np.float32)
    pred_distri = rng.standard_normal((bs, A, 4 * (reg_max + 1))).astype(np.float32)
    if not use_dfl:
        pred_distri = np.abs(pred_distri) * 3

    targets = np.full((bs, M, 5), -1.0, np.float32)
    targets[..., 1:] = 0
    for i in range(bs):
        for j in range(3):
            w, h = rng.uniform(0.1, 0.4, 2)
            targets[i, j] = [
                rng.integers(0, nc),
                rng.uniform(w / 2, 1 - w / 2), rng.uniform(h / 2, 1 - h / 2), w, h,
            ]

    feats = [torch.zeros(bs, 1, img // s, img // s) for s in (8, 16, 32)]
    ref_loss = RefComputeLoss(
        num_classes=nc, ori_img_size=img, warmup_epoch=4, use_dfl=use_dfl,
        reg_max=reg_max, iou_type=iou_type,
    )
    want, want_components = ref_loss(
        (feats, torch.from_numpy(pred_scores), torch.from_numpy(pred_distri)),
        _targets_to_rows(targets), epoch, 1, img, img,
    )

    ours = ComputeLoss(
        num_classes=nc, ori_img_size=img, warmup_epoch=4, use_dfl=use_dfl,
        reg_max=reg_max, iou_type=iou_type,
    )
    got, got_components = ours(
        [(img // s, img // s) for s in (8, 16, 32)],
        jnp.asarray(pred_scores), jnp.asarray(pred_distri), jnp.asarray(targets),
        img, img, use_atss=epoch < 4,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_components), want_components.numpy(), rtol=2e-4, atol=1e-6
    )
