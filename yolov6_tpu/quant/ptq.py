"""Post-training quantization: activation calibration + weight fake-quant
(reference: tools/qat/qat_utils.py collect_stats/compute_amax/ptq_calibrate
and tools/partial_quantization/*).

Flow:
  1. ``calibrate`` runs batches through the model with the global quant mode
     in 'calibrating' state; every QConv records max|input| into the 'quant'
     collection (max-method calibration, the reference's default for convs).
  2. ``quantize_variables`` fake-quantizes conv kernels per-channel.
  3. eval/serving run with quant enabled uses the calibrated amax to
     fake-quantize activations.
Partial quantization: ``skip_patterns`` disables quant for sensitive layers
(reference: partial_quant.py skips top-k sensitive layers).
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import jax
import jax.numpy as jnp

from yolov6_tpu.quant.fake_quant import quantize_conv_params, set_quant_mode
from yolov6_tpu.utils.events import LOGGER


def calibrate(
    model,
    variables: dict,
    batches: Iterable,
    num_bits: int = 8,
    skip_patterns: Sequence[str] = (),
    max_batches: int = 32,
):
    """Collect per-conv-input amax over calibration batches.

    batches: iterable of uint8 NHWC image arrays (or (imgs, ...) tuples).
    Returns variables with a populated 'quant' collection.
    """
    set_quant_mode(True, calibrating=True, num_bits=num_bits, skip_patterns=skip_patterns)
    try:
        variables = dict(variables)
        for bi, batch in enumerate(batches):
            if bi >= max_batches:
                break
            imgs = batch[0] if isinstance(batch, (tuple, list)) else batch
            x = jnp.asarray(imgs).astype(jnp.float32)
            if x.dtype == jnp.float32 and float(x.max()) > 2.0:
                x = x / 255.0
            _, updates = model.apply(variables, x, train=False, mutable=["quant"])
            variables["quant"] = updates["quant"]
            LOGGER.info(f"calibration batch {bi + 1}")
    finally:
        set_quant_mode(True, calibrating=False, num_bits=num_bits, skip_patterns=skip_patterns)
    return variables


def quantize_variables(variables: dict, num_bits: int = 8, skip_patterns: Sequence[str] = ()):
    """Per-channel fake-quant of all conv kernels (PTQ weight step)."""
    out = dict(variables)
    out["params"] = quantize_conv_params(variables["params"], num_bits, skip_patterns)
    return out


def sensitivity_analyse(
    eval_fn,
    layer_paths: List[str],
    baseline_ap: float,
):
    """Per-layer quantization sensitivity sweep
    (reference: tools/partial_quantization/sensitivity_analyse.py): quantize
    one layer at a time via skip_patterns of everything else and record the
    mAP drop. ``eval_fn(skip_patterns) -> mAP``. Returns sorted
    [(drop, path)] most-sensitive first."""
    results = []
    for path in layer_paths:
        others = [p for p in layer_paths if p != path]
        ap = eval_fn(others)
        results.append((baseline_ap - ap, path))
        LOGGER.info(f"sensitivity {path}: drop {baseline_ap - ap:.4f}")
    return sorted(results, reverse=True)
