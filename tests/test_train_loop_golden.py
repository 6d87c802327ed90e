"""3-step training-loop integration parity vs the reference Trainer.

Per-call parity (loss ✓, assigner ✓, SGD math ✓) leaves the integration
seams untested: warmup interp ordering, accumulate schedule, EMA update
count, BN running-stat flow. tests/ref_train_loop_worker.py runs the
REFERENCE update path (engine.update_optimizer warmup interp + accumulate
+ optimizer.step + EMA, reference: yolov6/core/engine.py:360-376,
solver/build.py:12-46, utils/ema.py:20-38) for 3 steps with torch autograd
in a clean subprocess (torch backward segfaults sharing a process with
XLA:CPU), and this test runs our jitted train_step on the SAME
weights/batches, then asserts:

- per-step LR/momentum/accumulate trajectories equal (host math),
- post-training params, BN running stats and EMA within fp tolerance,
  compared through the bit-tested torch->flax importer.
"""

import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.train_step import create_train_state, make_train_step
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.solver.build import (
    build_param_groups, group_lrs_host, warmup_accumulate,
)
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.torch_import import import_checkpoint

pytestmark = pytest.mark.slow  # compiles a full train step: minutes cold

REF_CFG = "/root/reference/configs/yolov6n.py"
NC = 3
IMG = 96  # (IMG/32)^2 >= 9: the reference ATSS requires topk anchors/level
BS = 4           # tensor batch
NOMINAL_BS = 16  # args.batch_size: accumulate target = round(64/16) = 4
WARMUP_STEPNUM = 4
EPOCHS = 2
MAX_STEPNUM = 6
STEPS = 3
SEED = 9
# keep in sync with the cfg.solver values in ref_train_loop_worker.py
SOLVER = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
              warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
              lr_scheduler="Cosine")


def _micro_cfg():
    cfg = Config.fromfile(REF_CFG)
    if not hasattr(cfg, "training_mode"):
        cfg.training_mode = "repvgg"
    cfg.model.depth_multiple = 0.1
    cfg.model.width_multiple = 0.05
    return cfg


def _batches(rng):
    images = rng.integers(0, 255, (BS, IMG, IMG, 3), np.uint8)
    targets = np.full((BS, 8, 5), -1.0, np.float32)
    targets[..., 1:] = 0.0
    for i in range(BS):
        for j in range(2):
            w, h = rng.uniform(0.2, 0.4, 2)
            targets[i, j] = [rng.integers(0, NC),
                             rng.uniform(w / 2, 1 - w / 2),
                             rng.uniform(h / 2, 1 - h / 2), w, h]
    return images, targets


def _run_reference_worker(tmp, images, targets):
    batches = osp.join(tmp, "batches.npz")
    np.savez(batches, images=images, targets=targets)
    worker = osp.join(osp.dirname(__file__), "ref_train_loop_worker.py")
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX")}
    res = subprocess.run(
        [sys.executable, worker, "--out", tmp, "--config", REF_CFG,
         "--img", str(IMG), "--nc", str(NC),
         "--nominal-bs", str(NOMINAL_BS),
         "--warmup-stepnum", str(WARMUP_STEPNUM),
         "--epochs", str(EPOCHS), "--max-stepnum", str(MAX_STEPNUM),
         "--steps", str(STEPS), "--seed", str(SEED),
         "--batches", batches],
        env=env, capture_output=True, text=True,
    )
    assert res.returncode == 0, f"worker failed:\n{res.stdout}\n{res.stderr}"
    load = lambda n: dict(np.load(osp.join(tmp, n)))  # noqa: E731
    return load("pre.npz"), load("post.npz"), load("ema.npz"), load("traj.npz")


def _ours_3steps(cfg, variables, images, targets):
    model = build_model(cfg, num_classes=NC, deploy=False)
    loss_fn = ComputeLoss(num_classes=NC, ori_img_size=IMG, warmup_epoch=4,
                          use_dfl=False, reg_max=0, iou_type="siou")
    step_fn = make_train_step(
        model, loss_fn, build_param_groups(variables["params"]), SOLVER,
        max_stepnum=MAX_STEPNUM, epochs=EPOCHS, batch_size=NOMINAL_BS,
        warmup_stepnum=WARMUP_STEPNUM, img_size=(IMG, IMG),
    )
    state = create_train_state(variables)
    for _ in range(STEPS):
        state, loss, _comp = step_fn(
            state, jnp.asarray(images), jnp.asarray(targets), jnp.asarray(0),
            use_atss=True,
        )
        assert np.isfinite(float(loss))
    return jax.device_get(state)


def _tree_close(got, want, atol, rtol, what):
    flat_g = jax.tree_util.tree_leaves_with_path(got)
    flat_w = dict(jax.tree_util.tree_leaves_with_path(want))
    assert len(flat_g) == len(flat_w)
    for path, g in flat_g:
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(flat_w[path]), atol=atol, rtol=rtol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


def test_train_loop_3step_golden(tmp_path):
    rng = np.random.default_rng(11)
    images, targets = _batches(rng)
    pre, post, ema_state, traj = _run_reference_worker(
        str(tmp_path), images, targets
    )

    our_cfg = _micro_cfg()
    model = build_model(our_cfg, num_classes=NC, deploy=False)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False),
        jnp.zeros((1, IMG, IMG, 3), jnp.float32),
    )
    variables = import_checkpoint(pre, spec, training_mode="repvgg", deploy=False)
    state = _ours_3steps(our_cfg, variables, images, targets)

    # --- LR / momentum / accumulate trajectories (host math vs torch) ---
    for step in range(STEPS):
        ours_lrs = group_lrs_host(step, 0, WARMUP_STEPNUM, SOLVER, EPOCHS)
        # torch group order: 0=bn, 1=weight, 2=bias — same as ours
        np.testing.assert_allclose(ours_lrs, traj["lrs"][step], rtol=1e-9,
                                   err_msg=f"lr trajectory @step {step}")
        frac = min(step / WARMUP_STEPNUM, 1.0)
        mom = SOLVER["warmup_momentum"] + frac * (
            SOLVER["momentum"] - SOLVER["warmup_momentum"])
        for m in traj["moms"][step]:
            if np.isfinite(m):
                np.testing.assert_allclose(mom, m, rtol=1e-9,
                                           err_msg=f"momentum @step {step}")
        ours_acc = int(warmup_accumulate(jnp.asarray(step), WARMUP_STEPNUM,
                                         NOMINAL_BS))
        assert ours_acc == traj["accs"][step], f"accumulate @step {step}"
    # the schedule must actually exercise both apply branches
    assert traj["applied"].tolist() == [True, False, True]

    # --- final params / BN stats / EMA through the importer ---
    ref_vars = import_checkpoint(post, spec, training_mode="repvgg", deploy=False)
    _tree_close(state.params, ref_vars["params"], 2e-5, 1e-3, "params")
    _tree_close(state.batch_stats, ref_vars["batch_stats"], 2e-5, 1e-3,
                "batch_stats")

    assert int(state.ema_updates) == int(traj["ema_updates"]) == 2
    ema_vars = import_checkpoint(ema_state, spec, training_mode="repvgg",
                                 deploy=False)
    _tree_close(state.ema_params, ema_vars["params"], 2e-5, 1e-3, "ema params")
    _tree_close(state.ema_batch_stats, ema_vars["batch_stats"], 2e-5, 1e-3,
                "ema batch_stats")
