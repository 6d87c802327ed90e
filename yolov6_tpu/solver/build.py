"""Optimizer + LR schedule (reference: yolov6/solver/build.py and the
warmup/accumulation logic of core/engine.py:360-376, 470-475).

The reference uses torch SGD with 3 param groups (BN gammas: no decay;
weights: decay; biases: no decay + separate warmup LR) and mutates group LR /
momentum per step during warmup. Here the same math is a pure function of the
step counter, evaluated inside the jitted train step — group membership is a
static pytree mask, LR/momentum are traced scalars.
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- partitions

GROUP_BN = 0      # BatchNorm gammas ('scale' leaves) — no weight decay
GROUP_WEIGHT = 1  # conv/transpose kernels, ScaleLayer weights — decayed
GROUP_BIAS = 2    # biases, BottleRep alphas — no decay, warmup_bias_lr


def param_group_id(path) -> int:
    leaf = path[-1]
    if leaf == "scale":
        return GROUP_BN
    if leaf in ("kernel", "weight"):
        return GROUP_WEIGHT
    return GROUP_BIAS


def build_param_groups(params) -> Any:
    """Pytree of group ids aligned with params (reference build_optimizer:12-33)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    groups = {k: param_group_id(k) for k in flat}
    return flax.traverse_util.unflatten_dict(groups)


# ----------------------------------------------------------------- schedule

def lr_lambda(epoch, epochs: int, lrf: float, scheduler: str = "Cosine"):
    """Per-epoch LR factor (reference build_lr_scheduler:36-46)."""
    if scheduler == "Cosine":
        return ((1 - jnp.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
    if scheduler == "Constant":
        return jnp.asarray(1.0)
    raise ValueError(f"unknown lr scheduler {scheduler!r}")


def warmup_lr_momentum(
    curr_step,
    epoch,
    warmup_stepnum: int,
    lr0: float,
    lrf: float,
    epochs: int,
    warmup_bias_lr: float,
    warmup_momentum: float,
    momentum: float,
    scheduler: str = "Cosine",
):
    """Per-step (lr_bn, lr_weight, lr_bias, momentum) with linear warmup
    (reference engine.update_optimizer:360-369)."""
    base = lr0 * lr_lambda(epoch, epochs, lrf, scheduler)
    frac = jnp.clip(curr_step / max(warmup_stepnum, 1), 0.0, 1.0)
    in_warmup = curr_step <= warmup_stepnum
    lr_main = jnp.where(in_warmup, frac * base, base)
    lr_bias = jnp.where(in_warmup, warmup_bias_lr + frac * (base - warmup_bias_lr), base)
    mom = jnp.where(in_warmup, warmup_momentum + frac * (momentum - warmup_momentum), momentum)
    return lr_main, lr_main, lr_bias, mom


def group_lrs_host(
    curr_step: int,
    epoch: float,
    warmup_stepnum: int,
    solver_cfg: Dict,
    epochs: int,
) -> tuple:
    """Host-side replica of warmup_lr_momentum for logging: the 3 group LRs
    (bn, weight, bias) as python floats at a given global step. Pure math —
    no device dispatch — so the train loop can surface the true in-graph
    warmup/cosine LR to TensorBoard (reference: utils/events.py:33-44 logs
    the torch group LRs)."""
    lrf = solver_cfg["lrf"]
    lr0 = solver_cfg["lr0"]
    sched = solver_cfg.get("lr_scheduler", "Cosine")
    if sched == "Cosine":
        factor = ((1 - math.cos(epoch * math.pi / epochs)) / 2) * (lrf - 1) + 1
    else:
        factor = 1.0
    base = lr0 * factor
    frac = min(max(curr_step / max(warmup_stepnum, 1), 0.0), 1.0)
    if curr_step <= warmup_stepnum:
        lr_main = frac * base
        lr_bias = solver_cfg["warmup_bias_lr"] + frac * (base - solver_cfg["warmup_bias_lr"])
    else:
        lr_main = lr_bias = base
    return float(lr_main), float(lr_main), float(lr_bias)


def warmup_accumulate(curr_step, warmup_stepnum: int, batch_size: int, nominal_batch: int = 64):
    """Gradient-accumulation count, interpolated during warmup
    (reference engine.py:362-364)."""
    target = max(1, round(nominal_batch / batch_size))
    frac = jnp.clip(curr_step / max(warmup_stepnum, 1), 0.0, 1.0)
    warm = jnp.round(1 + frac * (nominal_batch / batch_size - 1))
    acc = jnp.where(curr_step <= warmup_stepnum, jnp.maximum(warm, 1), target)
    return acc.astype(jnp.int32)


# ---------------------------------------------------------------- optimizer

class SGDState(NamedTuple):
    momentum_buf: Any


def sgd_init(params) -> SGDState:
    return SGDState(jax.tree_util.tree_map(jnp.zeros_like, params))


def sgd_update(
    grads,
    state: SGDState,
    params,
    group_ids,
    lr_bn,
    lr_weight,
    lr_bias,
    momentum,
    weight_decay: float,
    nesterov: bool = True,
):
    """torch-SGD-compatible update (decay added to grad; nesterov lookahead)."""

    def upd(g, buf, p, gid):
        g = g.astype(jnp.float32)
        if gid == GROUP_WEIGHT and weight_decay:
            g = g + weight_decay * p
        new_buf = momentum * buf + g
        step_dir = g + momentum * new_buf if nesterov else new_buf
        lr = {GROUP_BN: lr_bn, GROUP_WEIGHT: lr_weight, GROUP_BIAS: lr_bias}[gid]
        return p - lr * step_dir, new_buf

    flat_g, treedef = jax.tree_util.tree_flatten(grads)
    flat_b = jax.tree_util.tree_flatten(state.momentum_buf)[0]
    flat_p = jax.tree_util.tree_flatten(params)[0]
    flat_id = jax.tree_util.tree_flatten(group_ids)[0]
    new_p, new_b = [], []
    for g, b, p, gid in zip(flat_g, flat_b, flat_p, flat_id):
        np_, nb_ = upd(g, b, p, int(gid))
        new_p.append(np_)
        new_b.append(nb_)
    return (
        jax.tree_util.tree_unflatten(treedef, new_p),
        SGDState(jax.tree_util.tree_unflatten(treedef, new_b)),
    )


def scale_hyperparams_for_batch(solver_cfg: Dict, batch_size: int, world_batch: int | None = None):
    """lr/wd batch rescale (reference engine.get_optimizer:470-475)."""
    accumulate = max(1, round(64 / batch_size))
    out = dict(solver_cfg)
    out["weight_decay"] = solver_cfg["weight_decay"] * batch_size * accumulate / 64
    if world_batch:
        out["lr0"] = solver_cfg["lr0"] * batch_size / world_batch
    return out
