"""SPMD parity for the REAL training modes (not just the easy one):
ATSS warmup, DFL/reg_max=16 (all M/L training), fuse-AB, and distill-NS
must produce the same loss trajectory over the 8-device mesh as on a single
device — the TPU-native analog of DDP gradient-allreduce correctness
(reference core/engine.py:463-466, loss*world_size :171-172)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # each mode compiles its step twice on 1 core

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.train_step import create_train_state, make_train_step
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.losses.loss_distill_ns import ComputeLossDistillNS
from yolov6_tpu.losses.loss_fuseab import ComputeLossAB
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.parallel.mesh import create_mesh, replicate_state, shard_batch
from yolov6_tpu.solver.build import build_param_groups
from yolov6_tpu.utils.config import Config

IMG, NC, BATCH, MAX_GT = 64, 3, 8, 6
SOLVER = dict(
    lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
    warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
    lr_scheduler="Cosine",
)


def _small(cfg):
    """Shrink width/depth: SPMD *numerics* of each training mode are
    width-independent (each test still compiles 2 full train programs on
    1 CPU core — full width took ~45 min/test). Real-width sharded
    compile+step is validated separately on TPU (tools/probe_spmd_real.py)."""
    cfg.model.depth_multiple = 0.33
    cfg.model.width_multiple = 0.125
    return cfg


def _batch(jitter: bool = False):
    """jitter=True draws asymmetric, per-image-unique box geometry. The
    regular grid below can put two anchors at EXACTLY the same TAL metric
    (top-k tie): GSPMD reduction-order noise then flips a discrete
    assignment and the gradient routes differently on the mesh — measured
    on distill-NS at seed 0 (round 4). Irregular boxes break the symmetry
    so every mode gets the strict per-element parity check."""
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 255, (BATCH, IMG, IMG, 3), np.uint8))
    targets = np.full((BATCH, MAX_GT, 5), -1.0, np.float32)
    targets[..., 1:] = 0.0
    if jitter:
        for i in range(BATCH):
            targets[i, 0] = [i % NC,
                             0.37 + 0.031 * i, 0.53 - 0.027 * i,
                             0.23 + 0.041 * i, 0.31 + 0.019 * i]
            targets[i, 1] = [(i + 1) % NC,
                             0.71 - 0.023 * i, 0.29 + 0.037 * i,
                             0.17 + 0.013 * i, 0.43 - 0.021 * i]
    else:
        for i in range(BATCH):
            targets[i, 0] = [i % NC, 0.5, 0.5, 0.4, 0.4]
            targets[i, 1] = [(i + 1) % NC, 0.25, 0.3, 0.2, 0.3]
    return images, jnp.asarray(targets)


def _run_trajectory(make_setup, n_steps, sharded, use_atss, epoch=0.0,
                    jitter=False):
    step_fn, state = make_setup()
    images, targets = _batch(jitter)
    if sharded:
        assert jax.device_count() >= 8
        mesh = create_mesh()
        state = replicate_state(mesh, state)
        images, targets = shard_batch(mesh, (images, targets))
    # host copy BEFORE the first (donating) call consumes the buffers
    params0 = jax.device_get(state.params)
    losses, params1 = [], None
    for i in range(n_steps):
        state, loss, _ = step_fn(
            state, images, targets, jnp.asarray(epoch), use_atss=use_atss)
        losses.append(float(loss))
        if i == 0:
            params1 = jax.device_get(state.params)
    return losses, params0, params1


def _update_vec(p0, p1):
    """Flattened global (params_after_step - params_init) vector, fp64."""
    leaves0 = jax.tree_util.tree_leaves(p0)
    leaves1 = jax.tree_util.tree_leaves(p1)
    return np.concatenate(
        [(np.asarray(b, np.float64) - np.asarray(a, np.float64)).ravel()
         for a, b in zip(leaves0, leaves1)])


def _assert_spmd_parity(make_setup, use_atss=False, epoch=0.0, n_steps=3,
                        traj_rtol=2e-3, chaotic=False, jitter=False):
    """SPMD == single-device: loss trajectory over n_steps AND the params
    after the first step. The param check is the rigorous collective test —
    from identical initial params, the only sharded-vs-single difference is
    fp32 reduction order (~1e-6 relative), so any wrong/missing gradient
    all-reduce (an 8x error) is unmissable.

    ``chaotic`` modes (measured: distill-NS) hit a TAL top-k tie INSIDE
    step 0 at this seed: reduction-order noise flips one discrete
    assignment, so the step-0 loss still agrees to ~4e-6 but the gradient
    ROUTES differently (~4-17% on some leaves) and later losses diverge —
    legitimate nondeterminism, not a collective bug (the jitted step is
    pure GSPMD; only reduction order can differ). For those modes the
    per-element check is replaced by two chaos-tolerant detectors on the
    global step-0 update vector: its norm ratio (a missing/doubled
    all-reduce scales it 8x / 2x) and its cosine (a sign or axis error
    flips it), plus the strict step-0 loss match."""
    l_single, p0_single, p_single = _run_trajectory(
        make_setup, n_steps, False, use_atss, epoch, jitter)
    l_shard, p0_shard, p_shard = _run_trajectory(
        make_setup, n_steps, True, use_atss, epoch, jitter)
    assert np.isfinite(l_single).all() and np.isfinite(l_shard).all()
    np.testing.assert_allclose(l_single[0], l_shard[0], rtol=1e-4)

    # params first: THE collective-correctness check. The trajectory check
    # below is a stability bonus — run the rigorous one unconditionally.
    flat_s, _ = jax.tree_util.tree_flatten(p_single)
    flat_m, _ = jax.tree_util.tree_flatten(p_shard)
    assert len(flat_s) == len(flat_m) and flat_s
    if chaotic:
        u_s = _update_vec(p0_single, p_single)
        u_m = _update_vec(p0_shard, p_shard)
        ns, nm = np.linalg.norm(u_s), np.linalg.norm(u_m)
        assert ns > 0 and nm > 0
        ratio = nm / ns
        cos = float(u_s @ u_m / (ns * nm))
        # window must exclude the one-dropped-shard signature: an all-reduce
        # that silently loses 1 of 8 shards scales the update by 7/8 = 0.875
        # (cosine stays ~1), so the bounds sit strictly inside (0.875, 8/7)
        assert 0.93 < ratio < 1.07, f"step-0 update norm ratio {ratio}"
        assert cos > 0.98, f"step-0 update cosine {cos}"
    else:
        for a, b in zip(flat_s, flat_m):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-6)
    np.testing.assert_allclose(l_single, l_shard, rtol=traj_rtol)


def test_spmd_parity_atss_warmup():
    """ATSS assigner (epoch < warmup) under the mesh == single device."""
    def setup():
        cfg = _small(Config.fromfile("/root/repo/configs/yolov6n.py"))
        model = build_model(cfg, num_classes=NC, deploy=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
        loss_fn = ComputeLoss(
            num_classes=NC, ori_img_size=IMG, warmup_epoch=4,
            use_dfl=False, reg_max=0, iou_type="siou")
        step_fn = make_train_step(
            model, loss_fn, build_param_groups(variables["params"]), SOLVER,
            max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
            img_size=(IMG, IMG))
        return step_fn, create_train_state(variables)

    _assert_spmd_parity(setup, use_atss=True, epoch=0.0)


def test_spmd_parity_dfl():
    """The DFL/reg_max=16 regression path (all M/L training) under the mesh."""
    def setup():
        cfg = _small(Config.fromfile("/root/repo/configs/yolov6m.py"))
        model = build_model(cfg, num_classes=NC, deploy=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
        head = cfg.model.head
        assert head.use_dfl and head.reg_max == 16
        loss_fn = ComputeLoss(
            num_classes=NC, ori_img_size=IMG, warmup_epoch=0,
            use_dfl=True, reg_max=16, iou_type=head.iou_type)
        step_fn = make_train_step(
            model, loss_fn, build_param_groups(variables["params"]), SOLVER,
            max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
            img_size=(IMG, IMG))
        return step_fn, create_train_state(variables)

    _assert_spmd_parity(setup, use_atss=False)


def test_spmd_parity_fuse_ab():
    """Anchor-aided training (af + ab losses) under the mesh."""
    def setup():
        cfg = _small(Config.fromfile("/root/repo/configs/yolov6s.py"))
        model = build_model(cfg, num_classes=NC, fuse_ab=True, deploy=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
        head = cfg.model.head
        loss_fn = ComputeLoss(
            num_classes=NC, ori_img_size=IMG, warmup_epoch=0,
            use_dfl=False, reg_max=0, iou_type="giou")
        loss_ab = ComputeLossAB(
            num_classes=NC, ori_img_size=IMG, iou_type="giou",
            anchors_init=tuple(map(tuple, head.anchors_init)))
        step_fn = make_train_step(
            model, loss_fn, build_param_groups(variables["params"]), SOLVER,
            max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
            img_size=(IMG, IMG), compute_loss_ab=loss_ab)
        return step_fn, create_train_state(variables)

    _assert_spmd_parity(setup, use_atss=False)


def _distill_setup(distill_feat: bool):
    def setup():
        cfg = _small(Config.fromfile("/root/repo/configs/yolov6s.py"))
        cfg.model.head.use_dfl = True
        cfg.model.head.reg_max = 16
        model = build_model(cfg, num_classes=NC, distill_ns=True, deploy=False)
        t_model = build_model(cfg, num_classes=NC, deploy=False)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), train=False)
        t_variables = t_model.init(
            jax.random.PRNGKey(1), jnp.zeros((1, IMG, IMG, 3)), train=False)
        distill_loss = ComputeLossDistillNS(
            num_classes=NC, ori_img_size=IMG, warmup_epoch=0,
            use_dfl=True, reg_max=model.detect.reg_max, iou_type="giou",
            distill_feat=distill_feat, max_epoch=10, temperature=20.0,
            deterministic_assign=True)
        step_fn = make_train_step(
            model, None, build_param_groups(variables["params"]), SOLVER,
            max_stepnum=10, epochs=10, batch_size=64, warmup_stepnum=5,
            img_size=(IMG, IMG), teacher=(t_model, t_variables, distill_loss))
        return step_fn, create_train_state(variables)
    return setup


def test_spmd_parity_distill_ns():
    """Self-distillation (teacher fwd in-graph, dual-reg student head), the
    production recipe: distill_feat defaults OFF in the reference
    (tools/train.py:51 store_true; engine.py:321) — and with it off this
    mode passes the same STRICT per-element param parity as the other three
    (round-5 measurement: worst grad leaf 5.5e-4 relative).
    deterministic_assign bf16-rounds the detached assigner inputs so a TAL
    top-13 boundary tie cannot flip on reduction-order noise either."""
    _assert_spmd_parity(_distill_setup(False), use_atss=False, epoch=1.0,
                        jitter=True)


def test_spmd_parity_distill_ns_cwd():
    """distill_feat=True adds the CWD feature loss — the one loss term that
    legitimately amplifies sharding noise past per-element tolerance, pinned
    by a round-5 decomposition probe, NOT a collective bug: the student's
    train-mode BN forward carries ~1e-4 relative fp32 reduction-order noise
    (teacher, running-stats: 3e-7), CWD's temperature-1 softmax over spatial
    positions amplifies it, and near-cancelling bias-grad sums turn it into
    ~5% on a few leaves while the LOSS still matches to 5e-6 and the CWD
    grad wrt the features matches at the fwd-noise level (1e-4..1e-3).
    Checked with the chaos-tolerant global-update detectors (window excludes
    the 7/8-dropped-shard signature 0.875) + strict step-0 loss."""
    _assert_spmd_parity(_distill_setup(True), use_atss=False, epoch=1.0,
                        jitter=True, chaotic=True, n_steps=1)
