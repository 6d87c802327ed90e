"""Golden parity for the auxiliary losses: fuse-AB and distillation (M/L, N/S)
vs the reference implementations on CPU."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax.numpy as jnp  # noqa: E402

from yolov6_tpu.losses.loss_distill import ComputeLossDistill  # noqa: E402
from yolov6_tpu.losses.loss_distill_ns import ComputeLossDistillNS  # noqa: E402
from yolov6_tpu.losses.loss_fuseab import ComputeLossAB  # noqa: E402
from tests.test_losses import _targets_to_rows  # noqa: E402


@pytest.fixture(autouse=True)
def _no_cuda(monkeypatch):
    monkeypatch.setattr(torch.nn.Module, "cuda", lambda self, *a, **k: self)
    yield


def _problem(bs=2, nc=8, img=128, M=5, reg_max=16, na=1, seed=0):
    rng = np.random.default_rng(seed)
    A = sum((img // s) ** 2 for s in (8, 16, 32)) * na
    pred_scores = rng.uniform(0.01, 0.99, (bs, A, nc)).astype(np.float32)
    pred_distri = rng.standard_normal((bs, A, 4 * (reg_max + 1))).astype(np.float32)
    targets = np.full((bs, M, 5), -1.0, np.float32)
    targets[..., 1:] = 0
    for i in range(bs):
        for j in range(3):
            w, h = rng.uniform(0.1, 0.4, 2)
            targets[i, j] = [rng.integers(0, nc), rng.uniform(w / 2, 1 - w / 2),
                             rng.uniform(h / 2, 1 - h / 2), w, h]
    feats = [torch.zeros(bs, 1, img // s, img // s) for s in (8, 16, 32)]
    feats_hw = [(img // s, img // s) for s in (8, 16, 32)]
    return pred_scores, pred_distri, targets, feats, feats_hw, img, A


def test_fuseab_loss_parity():
    from yolov6.models.losses.loss_fuseab import ComputeLoss as RefLossAB

    nc, img = 8, 128
    anchors_init = ((10, 13, 19, 19, 33, 23), (30, 61, 59, 59, 59, 119),
                    (116, 90, 185, 185, 373, 326))
    rng = np.random.default_rng(1)
    A3 = sum((img // s) ** 2 for s in (8, 16, 32)) * 3
    pred_scores = rng.uniform(0.01, 0.99, (2, A3, nc)).astype(np.float32)
    # decoded ab predictions: xy offsets + positive wh
    pred_distri = np.concatenate(
        [rng.standard_normal((2, A3, 2)).astype(np.float32),
         rng.uniform(0.5, 6, (2, A3, 2)).astype(np.float32)], -1,
    )
    _, _, targets, feats, feats_hw, img, _ = _problem(nc=nc, img=img, seed=1)

    ref = RefLossAB(num_classes=nc, ori_img_size=img, use_dfl=False, reg_max=0,
                    iou_type="giou")
    want, want_c = ref(
        (feats, torch.from_numpy(pred_scores), torch.from_numpy(pred_distri.copy())),
        _targets_to_rows(targets), 5, 1, img, img,
    )

    ours = ComputeLossAB(num_classes=nc, ori_img_size=img, iou_type="giou",
                         anchors_init=anchors_init)
    got, got_c = ours(
        feats_hw, jnp.asarray(pred_scores), jnp.asarray(pred_distri), jnp.asarray(targets),
        img, img,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=3e-4)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), rtol=3e-4, atol=1e-6)


@pytest.mark.parametrize("ns", [False, True])
def test_distill_loss_parity(ns):
    if ns:
        from yolov6.models.losses.loss_distill_ns import ComputeLoss as RefLoss
    else:
        from yolov6.models.losses.loss_distill import ComputeLoss as RefLoss

    nc, img, reg_max, temperature, max_epoch, epoch = 8, 128, 16, 20, 10, 3
    pred_scores, pred_distri, targets, feats, feats_hw, img, A = _problem(
        nc=nc, img=img, reg_max=reg_max, seed=2
    )
    rng = np.random.default_rng(3)
    t_scores = rng.uniform(0.01, 0.99, pred_scores.shape).astype(np.float32)
    t_distri = rng.standard_normal(pred_distri.shape).astype(np.float32)
    s_featmaps_t = [torch.from_numpy(rng.standard_normal((2, 16, img // s, img // s)).astype(np.float32))
                    for s in (8, 16, 32)]
    t_featmaps_t = [torch.from_numpy(rng.standard_normal((2, 16, img // s, img // s)).astype(np.float32))
                    for s in (8, 16, 32)]
    pred_lrtb = np.abs(rng.standard_normal((2, A, 4)).astype(np.float32)) * 3

    ref = RefLoss(num_classes=nc, ori_img_size=img, warmup_epoch=0, use_dfl=True,
                  reg_max=reg_max, iou_type="giou", distill_feat=True,
                  distill_weight={"class": 1.0, "dfl": 1.0})
    if ns:
        outputs = (feats, torch.from_numpy(pred_scores), torch.from_numpy(pred_distri),
                   torch.from_numpy(pred_lrtb.copy()))
    else:
        outputs = (feats, torch.from_numpy(pred_scores), torch.from_numpy(pred_distri))
    t_outputs = (feats, torch.from_numpy(t_scores), torch.from_numpy(t_distri))
    want, want_c = ref(outputs, t_outputs, s_featmaps_t, t_featmaps_t,
                       _targets_to_rows(targets), epoch, max_epoch, temperature, 1, img, img)

    cls_fn = ComputeLossDistillNS if ns else ComputeLossDistill
    ours = cls_fn(num_classes=nc, ori_img_size=img, warmup_epoch=0, use_dfl=True,
                  reg_max=reg_max, iou_type="giou", distill_feat=True,
                  distill_weight={"class": 1.0, "dfl": 1.0},
                  max_epoch=max_epoch, temperature=temperature)

    # adapt flat tensors to our head-dict interface (single fused level)
    def level_maps(flat, ch):
        # split back into per-level NHWC maps
        out, start = [], 0
        for s in (8, 16, 32):
            n = (img // s) ** 2
            out.append(jnp.asarray(flat[:, start:start + n].reshape(2, img // s, img // s, ch)))
            start += n
        return out

    import scipy.special as sp

    head_out = {
        "cls": level_maps(sp.logit(pred_scores), nc),
        "reg": level_maps(pred_lrtb if ns else pred_distri, 4 if ns else 4 * (reg_max + 1)),
    }
    if ns:
        head_out["reg_dist"] = level_maps(pred_distri, 4 * (reg_max + 1))
    t_head = {
        "cls": level_maps(sp.logit(t_scores), nc),
        "reg": level_maps(t_distri, 4 * (reg_max + 1)),
    }
    s_feats = [jnp.asarray(np.transpose(f.numpy(), (0, 2, 3, 1))) for f in s_featmaps_t]
    t_feats = [jnp.asarray(np.transpose(f.numpy(), (0, 2, 3, 1))) for f in t_featmaps_t]

    got, got_c = ours(
        feats_hw, head_out, t_head, s_feats, t_feats, jnp.asarray(targets),
        float(epoch), img, img, use_atss=False,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_c), want_c.numpy(), rtol=2e-3, atol=1e-5)
