"""QAT: training steps run with fake-quant active (frozen calibrated ranges)
and straight-through gradients still learn."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.train_step import create_train_state, make_train_step
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.quant import set_quant_mode
from yolov6_tpu.quant.ptq import calibrate
from yolov6_tpu.solver.build import build_param_groups
from yolov6_tpu.utils.config import Config


@pytest.fixture(autouse=True)
def _reset():
    yield
    set_quant_mode(False)


def test_qat_train_step():
    img, nc, batch = 64, 3, 4
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=nc, deploy=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (batch, img, img, 3), np.uint8)
    qvars = calibrate(model, dict(variables), [imgs], num_bits=8)
    assert "quant" in qvars
    # quant mode is now enabled (non-calibrating)

    loss_fn = ComputeLoss(num_classes=nc, ori_img_size=img, warmup_epoch=0,
                          use_dfl=False, reg_max=0, iou_type="siou")
    solver_cfg = dict(lr0=0.02, lrf=0.01, momentum=0.937, weight_decay=0.0005,
                      warmup_epochs=0.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
                      lr_scheduler="Cosine")
    step_fn = make_train_step(
        model, loss_fn, build_param_groups(variables["params"]), solver_cfg,
        max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=1,
        img_size=(img, img), quant_collection=qvars["quant"],
    )
    state = create_train_state(
        {"params": qvars["params"], "batch_stats": qvars.get("batch_stats", {})}
    )

    targets = np.full((batch, 6, 5), -1.0, np.float32)
    targets[..., 1:] = 0.0
    targets[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    losses = []
    for _ in range(20):
        state, loss, _ = step_fn(
            state, jnp.asarray(imgs), jnp.asarray(targets), jnp.asarray(0.0), use_atss=False
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # STE gradients flow through fake-quant: the overfit loss must drop
    assert min(losses[10:]) < losses[0] * 0.95, losses
