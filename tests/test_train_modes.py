"""fuse-AB and self-distillation training modes: one step runs, finite loss,
and (for distill) the KD term responds to the teacher."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train-step compiles: minutes each cold on 1 core

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.train_step import create_train_state, make_train_step
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.losses.loss_distill import ComputeLossDistill
from yolov6_tpu.losses.loss_distill_ns import ComputeLossDistillNS
from yolov6_tpu.losses.loss_fuseab import ComputeLossAB
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.solver.build import build_param_groups
from yolov6_tpu.utils.config import Config

IMG, NC, BATCH, MAX_GT = 64, 3, 4, 6
SOLVER = dict(
    lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
    warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
    lr_scheduler="Cosine",
)


def _batch():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, IMG, IMG, 3), np.uint8))
    targets = np.full((BATCH, MAX_GT, 5), -1.0, np.float32)
    targets[..., 1:] = 0.0
    for i in range(BATCH):
        targets[i, 0] = [i % NC, 0.5, 0.5, 0.4, 0.4]
    return images, jnp.asarray(targets)


def test_fuse_ab_step():
    cfg = Config.fromfile("/root/repo/configs/yolov6s.py")
    model = build_model(cfg, num_classes=NC, fuse_ab=True, deploy=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
    head = cfg.model.head
    loss_fn = ComputeLoss(num_classes=NC, ori_img_size=IMG, warmup_epoch=0,
                          use_dfl=False, reg_max=0, iou_type="giou")
    loss_ab = ComputeLossAB(num_classes=NC, ori_img_size=IMG, iou_type="giou",
                            anchors_init=tuple(map(tuple, head.anchors_init)))
    step_fn = make_train_step(
        model, loss_fn, build_param_groups(variables["params"]), SOLVER,
        max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
        img_size=(IMG, IMG), compute_loss_ab=loss_ab,
    )
    state = create_train_state(variables)
    images, targets = _batch()
    losses = []
    for _ in range(8):
        state, loss, comp = step_fn(state, images, targets, jnp.asarray(0.0), use_atss=False)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


# only the NS variant runs as a full train step: it exercises the dual-branch
# head wiring; the M/L distill loss math is golden-tested in test_losses_aux
# and shares the same step plumbing (teacher fwd in-graph).
@pytest.mark.parametrize("ns", [True])
def test_distill_step(ns):
    cfg = Config.fromfile("/root/repo/configs/yolov6s.py" if ns else "/root/repo/configs/yolov6m.py")
    if ns:
        # distillation requires the DFL branch (reference config comments:
        # "set to True if you want to further train with distillation")
        cfg.model.head.use_dfl = True
        cfg.model.head.reg_max = 16
    model = build_model(cfg, num_classes=NC, distill_ns=ns, deploy=False)
    # teacher: plain head with DFL
    t_model = build_model(cfg, num_classes=NC, deploy=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
    t_variables = t_model.init(jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)), train=False)

    loss_cls = ComputeLossDistillNS if ns else ComputeLossDistill
    # for ns the student's config use_dfl=False but the aux branch uses reg_max 16
    student_reg_max = model.detect.reg_max
    distill_loss = loss_cls(
        num_classes=NC, ori_img_size=IMG, warmup_epoch=0,
        use_dfl=True, reg_max=student_reg_max, iou_type="giou",
        distill_feat=True, max_epoch=10, temperature=20.0,
    )
    step_fn = make_train_step(
        model, None, build_param_groups(variables["params"]), SOLVER,
        max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
        img_size=(IMG, IMG), teacher=(t_model, t_variables, distill_loss),
    )
    state = create_train_state(variables)
    images, targets = _batch()
    for _ in range(3):
        state, loss, comp = step_fn(state, images, targets, jnp.asarray(1.0), use_atss=False)
    assert np.isfinite(float(loss))
    assert comp.shape[0] == 4  # iou, dfl(+kd), cls(+kd), cwd
    assert float(comp[3]) != 0.0  # feature KD active
