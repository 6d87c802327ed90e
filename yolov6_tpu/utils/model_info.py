"""Model params/FLOPs reporting (reference: yolov6/utils/torch_utils.py:97-111
uses thop; here XLA's own cost analysis provides FLOPs)."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def count_params(variables) -> int:
    params = variables.get("params", variables)
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


def get_model_info(model, variables, img_size: Tuple[int, int] = (640, 640)) -> str:
    """'Params: X M, GFLOPs: Y' for a single-image forward at img_size."""
    n_params = count_params(variables)

    def fwd(x):
        head_out, _ = model.apply(variables, x, train=False)
        return head_out

    x = jnp.zeros((1, img_size[0], img_size[1], 3), jnp.float32)
    flops = None
    try:
        compiled = jax.jit(fwd).lower(x).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        flops = analysis.get("flops")
    except Exception:
        pass
    info = f"Params: {n_params / 1e6:.2f}M"
    if flops:
        # XLA counts multiply+add separately on some backends; report as-is
        info += f", GFLOPs: {flops / 1e9:.2f} @ {img_size[0]}x{img_size[1]}"
    return info
