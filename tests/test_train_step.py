"""Training-step integration tests: loss decreases on a tiny overfit task,
and the step runs SPMD over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train-step compiles: minutes each cold on 1 core

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.train_step import create_train_state, make_train_step
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.parallel.mesh import create_mesh, replicate_state, shard_batch
from yolov6_tpu.solver.build import build_param_groups
from yolov6_tpu.utils.config import Config


def _tiny_setup(batch=8, img=64, nc=3, max_gt=8):
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=nc, deploy=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False
    )
    loss_fn = ComputeLoss(
        num_classes=nc, ori_img_size=img, warmup_epoch=0,
        use_dfl=False, reg_max=0, iou_type="siou",
    )
    solver_cfg = dict(
        lr0=0.02, lrf=0.01, momentum=0.937, weight_decay=0.0005,
        warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
        lr_scheduler="Cosine",
    )
    group_ids = build_param_groups(variables["params"])
    # batch_size=64 -> accumulate=1, so every test iteration is an optimizer step
    step_fn = make_train_step(
        model, loss_fn, group_ids, solver_cfg,
        max_stepnum=10, epochs=10, batch_size=64,
        warmup_stepnum=5, img_size=(img, img),
    )
    state = create_train_state(variables)

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (batch, img, img, 3), np.uint8)
    targets = np.full((batch, max_gt, 5), -1.0, np.float32)
    targets[..., 1:] = 0.0
    for i in range(batch):
        targets[i, 0] = [i % nc, 0.5, 0.5, 0.4, 0.4]
        targets[i, 1] = [(i + 1) % nc, 0.25, 0.25, 0.2, 0.3]
    return step_fn, state, jnp.asarray(images), jnp.asarray(targets)


def test_loss_decreases_overfit():
    step_fn, state, images, targets = _tiny_setup()
    losses = []
    for it in range(30):
        state, loss, components = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, f"loss did not decrease: {losses[0]} -> {losses[-1]}"
    # EMA populated and optimizer stepped
    assert int(state.ema_updates) > 0
    assert int(state.step) == 30


def test_train_step_sharded_8dev():
    assert jax.device_count() >= 8, "tests require the virtual 8-device CPU mesh"
    step_fn, state, images, targets = _tiny_setup(batch=8)
    mesh = create_mesh()
    state = replicate_state(mesh, state)
    images, targets = shard_batch(mesh, (images, targets))
    state, loss1, _ = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
    state, loss2, _ = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
    assert np.isfinite(float(loss1)) and np.isfinite(float(loss2))


def test_sharded_matches_single_device():
    """SPMD step must produce the same loss trajectory as single-device."""
    step_fn, state, images, targets = _tiny_setup(batch=8)
    s1 = state
    l_single = []
    for _ in range(3):
        s1, loss, _ = step_fn(s1, images, targets, jnp.asarray(0), use_atss=False)
        l_single.append(float(loss))

    step_fn2, state2, _, _ = _tiny_setup(batch=8)
    mesh = create_mesh()
    s2 = replicate_state(mesh, state2)
    imgs_s, tgts_s = shard_batch(mesh, (images, targets))
    l_shard = []
    for _ in range(3):
        s2, loss, _ = step_fn2(s2, imgs_s, tgts_s, jnp.asarray(0), use_atss=False)
        l_shard.append(float(loss))
    np.testing.assert_allclose(l_single, l_shard, rtol=2e-3)


def test_nonfinite_step_does_not_brick_model():
    """A forward that produces non-finite activations must not poison the
    persistent state: the finite-guard keeps params AND BN batch statistics
    (torch's GradScaler only skips the optimizer step — a NaN forward there
    pollutes the running stats and permanently bricks train+eval; measured
    on the round-5 bf16 distill gate). After the bad step the state must be
    byte-identical on the guarded leaves and a clean step must run fine."""
    step_fn, state, images, targets = _tiny_setup()
    # settle one clean step so opt/EMA buffers are populated
    state, loss0, _ = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
    assert np.isfinite(float(loss0))

    good_params = jax.device_get(state.params)
    good_stats = jax.device_get(state.batch_stats)

    # poison ONE conv kernel with inf -> forward activations (and the BN
    # batch stats computed from them) go non-finite
    def poison(tree):
        flat, treedef = jax.tree_util.tree_flatten(tree)
        flat = list(flat)
        for i, leaf in enumerate(flat):
            if leaf.ndim == 4:  # first conv kernel
                bad = np.asarray(leaf).copy()
                bad[0, 0, 0, 0] = np.inf
                flat[i] = jnp.asarray(bad)
                break
        return jax.tree_util.tree_unflatten(treedef, flat)

    state = state._replace(params=poison(state.params))
    poisoned = jax.device_get(state.params)
    state, loss_bad, _ = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
    assert not np.isfinite(float(loss_bad))

    # params unchanged (skipped step), stats kept at the last finite values
    for a, b in zip(jax.tree_util.tree_leaves(poisoned),
                    jax.tree_util.tree_leaves(jax.device_get(state.params))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(good_stats),
                    jax.tree_util.tree_leaves(jax.device_get(state.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(state.batch_stats))

    # heal the weight: training proceeds finitely from the preserved state
    state = state._replace(params=jax.tree_util.tree_map(jnp.asarray, good_params))
    state, loss1, _ = step_fn(state, images, targets, jnp.asarray(0), use_atss=False)
    assert np.isfinite(float(loss1))
