"""Regression: jitted serving paths must take weights as ARGUMENTS.

Closing variables over into a jitted function embeds every weight as an HLO
constant; for M6/L6 that makes compiles pathological through the axon
tunnel (ROADMAP "axon caveat"). The evaler/inferer/bench paths all pass
variables as jit arguments — this test pins that by lowering the evaler's
serving function and asserting the StableHLO text carries no weight-sized
constants (lower() only traces: no XLA compile, so this is cheap).
"""

import jax
import jax.numpy as jnp

from yolov6_tpu.core.evaler import Evaler
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config


def test_eval_jit_carries_no_weight_constants():
    cfg = Config.fromfile("configs/yolov6n.py")
    model = build_model(cfg, num_classes=4, deploy=False)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False
    )
    n_bytes = sum(
        v.size * v.dtype.itemsize for v in jax.tree_util.tree_leaves(variables)
    )
    assert n_bytes > 4_000_000  # the embedded-weights failure mode is visible

    ev = Evaler(
        data_dict={"names": ["a", "b", "c", "d"], "nc": 4},
        batch_size=8, img_size=64, data_parallel=False,
    )
    ev.init_model(model, variables)
    lowered = ev._infer.lower(
        variables, jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.uint8)
    )
    text = lowered.as_text()
    # weights-as-arguments keeps the module text small; embedding yolov6n's
    # ~18 MB of fp32 params would blow it up by an order of magnitude
    assert len(text) < n_bytes, (
        f"lowered eval module is {len(text)} chars — weights appear to be "
        f"embedded as constants instead of passed as jit arguments"
    )
