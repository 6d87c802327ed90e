"""The jitted training step: forward, loss (+assignment), backward, SGD with
warmup/accumulation, and EMA — one device dispatch per batch.

Replaces the reference's Python-side step logic (reference:
core/engine.py:142-176, 360-376) with a pure function of a TrainState. Under
a data mesh the same program runs SPMD: inputs are batch-sharded, state is
replicated, and XLA inserts the gradient all-reduces (the reference's DDP
allreduce + loss*world_size dance, engine.py:171-172, disappears — loss math
is written over the global batch).

Note on BatchNorm: flax computes statistics over the *global* batch (syncBN
semantics). The reference uses per-replica BN; global stats are equal at
world_size=1 and slightly stronger statistically when sharded.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from yolov6_tpu.models.effidehead import flatten_head_outputs
from yolov6_tpu.solver.build import (
    SGDState,
    sgd_init,
    sgd_update,
    warmup_accumulate,
    warmup_lr_momentum,
)
from yolov6_tpu.utils.ema import ema_update


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt: SGDState
    grad_accum: Any
    accum_count: jnp.ndarray   # int32
    step: jnp.ndarray          # int32, per-batch counter
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jnp.ndarray   # int32


def create_train_state(variables) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt=sgd_init(params),
        grad_accum=jax.tree_util.tree_map(jnp.zeros_like, params),
        accum_count=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
        # copy=True: an aliasing no-op cast would break buffer donation
        ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, jnp.float32, copy=True), params),
        ema_batch_stats=jax.tree_util.tree_map(
            lambda x: jnp.array(x, jnp.float32, copy=True), batch_stats
        ),
        ema_updates=jnp.zeros((), jnp.int32),
    )


def state_to_dict(state: TrainState) -> dict:
    """Pure-dict view for msgpack checkpointing."""
    d = state._asdict()
    d["opt"] = {"momentum_buf": state.opt.momentum_buf}
    return d


def state_from_dict(d: dict) -> TrainState:
    d = dict(d)
    d["opt"] = SGDState(momentum_buf=d["opt"]["momentum_buf"])
    return TrainState(**d)


def make_train_step(
    model,
    compute_loss,
    group_ids,
    solver_cfg: dict,
    max_stepnum: int,
    epochs: int,
    batch_size: int,
    warmup_stepnum: int,
    img_size: Tuple[int, int],
    compute_loss_ab=None,
    teacher=None,
    grad_masks=None,
    quant_collection=None,
):
    """Build the jitted train step.

    compute_loss: ComputeLoss-like callable.
    compute_loss_ab: optional anchor-based aux loss (fuse-AB training).
    teacher: optional (teacher_model, teacher_variables, distill_loss) triple.
    """
    strides = model.strides
    feats_hw = [(img_size[0] // s, img_size[1] // s) for s in strides]

    def train_step(state: TrainState, images_u8, targets, epoch, use_atss: bool):
        images = images_u8.astype(jnp.float32) / 255.0

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if quant_collection is not None:
                # QAT: calibrated activation amax ranges (frozen during training)
                variables["quant"] = quant_collection
            (head_out, neck_feats), updates = model.apply(
                variables, images, train=True, mutable=["batch_stats"]
            )
            h, w = images.shape[1], images.shape[2]
            if teacher is not None:
                t_model, t_variables, distill_loss_fn = teacher
                t_out, t_feats = t_model.apply(t_variables, images, train=False)
                total, components = distill_loss_fn(
                    feats_hw, head_out, t_out, neck_feats, t_feats, targets,
                    epoch, h, w, use_atss,
                )
            elif compute_loss_ab is not None:
                from yolov6_tpu.models.heads.effidehead_fuseab import flatten_ab_outputs

                cls_af, reg_af = flatten_head_outputs(head_out, model.num_classes)
                loss_af, comp_af = compute_loss(
                    feats_hw, cls_af, reg_af, targets, h, w, use_atss
                )
                cls_ab, reg_ab = flatten_ab_outputs(
                    head_out, model.detect.anchors_init, model.strides
                )
                loss_ab, comp_ab = compute_loss_ab(
                    feats_hw, cls_ab, reg_ab, targets, h, w, False
                )
                total = loss_af + loss_ab
                components = comp_af + comp_ab
            else:
                cls_scores, reg_distri = flatten_head_outputs(head_out, model.num_classes)
                total, components = compute_loss(
                    feats_hw, cls_scores, reg_distri, targets, h, w, use_atss
                )
            return total, (components, updates.get("batch_stats", state.batch_stats))

        (loss, (components, new_batch_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)

        if grad_masks is not None:
            # RepOptimizer gradient re-parameterization (solver/repoptimizer.py)
            from yolov6_tpu.solver.repoptimizer import apply_gradient_masks

            grads = apply_gradient_masks(grads, grad_masks)

        lr_bn, lr_w, lr_b, momentum = warmup_lr_momentum(
            state.step, epoch, warmup_stepnum,
            solver_cfg["lr0"], solver_cfg["lrf"], epochs,
            solver_cfg["warmup_bias_lr"], solver_cfg["warmup_momentum"],
            solver_cfg["momentum"], solver_cfg.get("lr_scheduler", "Cosine"),
        )

        # the reference's AMP GradScaler skips optimizer steps whose grads
        # contain inf/nan (engine.py:371-372); replicate that guard — it is
        # what keeps early bf16 training from being destroyed by one bad step
        grads_finite = jax.tree_util.tree_reduce(
            lambda acc, g: acc & jnp.all(jnp.isfinite(g)), grads, jnp.bool_(True)
        )
        # ... and guard the BN batch statistics too: torch's GradScaler only
        # skips the OPTIMIZER step — a non-finite forward still pollutes the
        # BN running stats, after which every subsequent forward (train AND
        # eval) is NaN and the model is permanently bricked. Measured on the
        # bf16 distill gate (round 5): one NaN step at epoch 16 zeroed mAP
        # for the rest of the run. Keep the last finite stats instead.
        stats_finite = jax.tree_util.tree_reduce(
            lambda acc, s: acc & jnp.all(jnp.isfinite(s)),
            new_batch_stats, jnp.bool_(True),
        )
        new_batch_stats = jax.tree_util.tree_map(
            lambda n, o: jnp.where(stats_finite, n, o),
            new_batch_stats, state.batch_stats,
        )

        # with global batch >= the nominal 64 the accumulate count is 1 for
        # the whole run — skip the accumulation buffers and selects entirely
        single_step = round(64 / batch_size) <= 1

        if single_step:
            grads32 = jax.tree_util.tree_map(lambda g: g.astype(jnp.float32), grads)
            new_params, new_opt = sgd_update(
                grads32, state.opt, state.params, group_ids,
                lr_bn, lr_w, lr_b, momentum, solver_cfg["weight_decay"],
            )

            def selg(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(grads_finite, n, o), new, old
                )

            params = selg(new_params, state.params)
            opt = selg(new_opt, state.opt)
            grad_accum = state.grad_accum
            accum_count = state.accum_count
            ema_updates = state.ema_updates + grads_finite.astype(jnp.int32)
            ema_params = selg(ema_update(state.ema_params, params, ema_updates), state.ema_params)
            ema_batch_stats = selg(
                ema_update(state.ema_batch_stats, new_batch_stats, ema_updates),
                state.ema_batch_stats,
            )
        else:
            grad_accum = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32) * grads_finite, state.grad_accum, grads
            )
            accum_count = state.accum_count + 1
            acc_target = warmup_accumulate(state.step, warmup_stepnum, batch_size)
            do_apply = accum_count >= acc_target

            new_params, new_opt = sgd_update(
                grad_accum, state.opt, state.params, group_ids,
                lr_bn, lr_w, lr_b, momentum, solver_cfg["weight_decay"],
            )

            def sel(new, old):
                return jax.tree_util.tree_map(
                    lambda n, o: jnp.where(do_apply, n, o), new, old
                )

            params = sel(new_params, state.params)
            opt = sel(new_opt, state.opt)
            grad_accum = sel(jax.tree_util.tree_map(jnp.zeros_like, grad_accum), grad_accum)
            accum_count = jnp.where(do_apply, 0, accum_count)

            ema_updates = state.ema_updates + do_apply.astype(jnp.int32)
            new_ema_params = ema_update(state.ema_params, params, ema_updates)
            new_ema_stats = ema_update(state.ema_batch_stats, new_batch_stats, ema_updates)
            ema_params = sel(new_ema_params, state.ema_params)
            ema_batch_stats = sel(new_ema_stats, state.ema_batch_stats)

        new_state = TrainState(
            params=params,
            batch_stats=new_batch_stats,
            opt=opt,
            grad_accum=grad_accum,
            accum_count=accum_count,
            step=state.step + 1,
            ema_params=ema_params,
            ema_batch_stats=ema_batch_stats,
            ema_updates=ema_updates,
        )
        return new_state, loss, components

    jitted = partial(jax.jit, static_argnames=("use_atss",), donate_argnums=(0,))(
        train_step
    )
    # escape hatch for numeric cross-checks: the SAME step math, dispatched
    # op-by-op (no XLA program, no donation) — the driver dryrun compares the
    # sharded compiled step against this to catch silent collective bugs
    jitted.eager_fn = train_step
    return jitted
