"""INT8 fake-quantization primitives for PTQ calibration and QAT
(reference: tools/qat/qat_utils.py + tools/partial_quantization — the
pytorch-quantization flow: per-tensor activation amax calibration, per-channel
weight quant, straight-through gradients for QAT).

Mechanism: layers/common.QConv consults the global ``quant_state``:
* disabled (default): byte-identical behavior to plain nn.Conv;
* calibrating: records running max|x| into a 'quant' flax collection;
* enabled: fake-quantizes conv inputs with the calibrated amax (and the
  caller fake-quantizes kernels via quantize_conv_params).
Gradients pass straight through (custom_vjp identity), enabling QAT with the
ordinary train step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp


@dataclass
class QuantState:
    enabled: bool = False
    calibrating: bool = False
    num_bits: int = 8
    skip_patterns: List[str] = field(default_factory=list)


quant_state = QuantState()


def set_quant_mode(enabled: bool, calibrating: bool = False, num_bits: int = 8,
                   skip_patterns: Optional[List[str]] = None):
    """Configure the global quant mode. Call BEFORE tracing/jitting —
    the flags are baked into the compiled graph."""
    quant_state.enabled = enabled
    quant_state.calibrating = calibrating
    quant_state.num_bits = num_bits
    quant_state.skip_patterns = list(skip_patterns or [])
    # flip-flopping the mode changes traced graphs; drop stale executables
    jax.clear_caches()


@jax.custom_vjp
def _ste_round(x):
    return jnp.round(x)


def _ste_round_fwd(x):
    return jnp.round(x), None


def _ste_round_bwd(_, g):
    return (g,)


_ste_round.defvjp(_ste_round_fwd, _ste_round_bwd)


def fake_quant(x: jnp.ndarray, amax, num_bits: int = 8) -> jnp.ndarray:
    """Symmetric per-tensor fake quantization with straight-through gradient.
    amax<=0 disables (returns x) — used for sensitive-layer skipping."""
    qmax = 2.0 ** (num_bits - 1) - 1
    scale = jnp.maximum(amax, 1e-12) / qmax
    q = _ste_round(jnp.clip(x / scale, -qmax - 1, qmax)) * scale
    return jnp.where(amax > 0, q.astype(x.dtype), x)


def fake_quant_per_channel(w: jnp.ndarray, num_bits: int = 8, axis: int = -1) -> jnp.ndarray:
    """Per-output-channel symmetric weight fake-quant (HWIO: axis=-1)."""
    qmax = 2.0 ** (num_bits - 1) - 1
    reduce_axes = tuple(i for i in range(w.ndim) if i != (axis % w.ndim))
    amax = jnp.max(jnp.abs(w), axis=reduce_axes, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / qmax
    return (_ste_round(jnp.clip(w / scale, -qmax - 1, qmax)) * scale).astype(w.dtype)


def quantize_conv_params(params, num_bits: int = 8, skip_patterns=()):
    """Fake-quantize every 4-D conv kernel in a params pytree (pure transform,
    the PTQ weight step). skip_patterns: substrings of 'a/b/c' paths to skip."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for k, v in flat.items():
        path = "/".join(k)
        if (
            k[-1] == "kernel"
            and getattr(v, "ndim", 0) == 4
            and not any(p in path for p in skip_patterns)
        ):
            out[k] = fake_quant_per_channel(jnp.asarray(v), num_bits)
        else:
            out[k] = v
    return flax.traverse_util.unflatten_dict(out)
