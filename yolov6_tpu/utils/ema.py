"""Exponential moving average of model variables (reference: yolov6/utils/ema.py).

Pure-functional: EMA state is just another pytree updated inside the jitted
train step; decay ramps as 0.9999 * (1 - exp(-updates/2000))."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay(updates, decay: float = 0.9999, tau: float = 2000.0):
    """(reference: ema.py:16-18)"""
    return decay * (1 - jnp.exp(-updates / tau))


def ema_update(ema_tree, model_tree, updates, decay: float = 0.9999):
    """ema = d * ema + (1-d) * model over all float leaves (reference: ema.py:25-34)."""
    d = ema_decay(updates, decay)

    def upd(e, m):
        if jnp.issubdtype(e.dtype, jnp.floating):
            return e * d + (1.0 - d) * m.astype(e.dtype)
        return m
    return jax.tree_util.tree_map(upd, ema_tree, model_tree)
