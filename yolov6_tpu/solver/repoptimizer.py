"""RepOptimizer: gradient re-parameterization for repopt training
(reference: yolov6/utils/RepOptimizer.py).

Two-stage RepOpt flow:
  1. hyper-search: train with LinearAddBlock (CSLA) blocks to learn
     per-channel branch scales;
  2. repopt: train plain RealVGGBlock convs with SGD whose gradients are
     multiplied by masks derived from those scales (scale^2 per branch, +1 on
     the center tap for the identity), after re-initializing the conv as the
     folded CSLA block.

TPU-native design: scales are keyed by *block path* (the hyper-search and
repopt models share module paths), masks are a params-aligned pytree, and the
mask multiply happens inside the jitted train step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def _is_linearadd_block(subtree: dict) -> bool:
    return isinstance(subtree, dict) and "scale_conv" in subtree and "conv_1x1" in subtree


def _is_realvgg_block(path, subtree: dict) -> bool:
    # RealVGGBlock params are exactly {conv: {kernel 3x3}, bn: {...}}; a
    # ConvModule has the same shape but always lives under a wrapper child
    # named 'block' (layers/common.py _conv_bn_act), which we exclude.
    return (
        isinstance(subtree, dict)
        and set(subtree.keys()) == {"conv", "bn"}
        and path[-1] != "block"
        and isinstance(subtree.get("conv"), dict)
        and "kernel" in subtree["conv"]
        and getattr(subtree["conv"]["kernel"], "ndim", 0) == 4
        and tuple(subtree["conv"]["kernel"].shape[:2]) == (3, 3)
    )


def _walk(tree, path=()):
    for k, v in tree.items():
        if isinstance(v, dict):
            yield path + (k,), v
            yield from _walk(v, path + (k,))


def extract_scales(params) -> Dict[Tuple[str, ...], tuple]:
    """Hyper-search checkpoint params -> {block_path: (id?, s1x1, sconv) scales}
    (reference: RepOptimizer.py:18-29)."""
    scales = {}
    for path, sub in _walk(params):
        if _is_linearadd_block(sub):
            s_conv = np.asarray(sub["scale_conv"]["weight"], np.float32)
            s_1x1 = np.asarray(sub["scale_1x1"]["weight"], np.float32)
            if "scale_identity" in sub:
                s_id = np.asarray(sub["scale_identity"]["weight"], np.float32)
                scales[path] = (s_id, s_1x1, s_conv)
            else:
                scales[path] = (s_1x1, s_conv)
    return scales


def find_repopt_blocks(params) -> Dict[Tuple[str, ...], dict]:
    """RealVGGBlock paths in a repopt-mode model's params."""
    return {path: sub for path, sub in _walk(params) if _is_realvgg_block(path, sub)}


def reinitialize(params, scales: Dict, rng, use_identity_scales: bool = True):
    """Re-init plain 3x3 convs as folded CSLA blocks
    (reference: RepOptimizer.py:117-134). HWIO layout; returns new params."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    blocks = find_repopt_blocks(params)
    for path, sub in blocks.items():
        if path not in scales:
            raise KeyError(f"no CSLA scales for block at {'/'.join(path)}")
        sc = scales[path]
        import zlib

        block_rng = jax.random.fold_in(rng, zlib.crc32("/".join(path).encode()) & 0x7FFFFFFF)
        w_key = path + ("conv", "kernel")
        w = np.asarray(flat[w_key], np.float32)  # (3,3,I,O)
        cin, cout = w.shape[2], w.shape[3]
        # torch default-init 1x1 kernel (kaiming_uniform a=sqrt(5))
        bound = 1.0 / np.sqrt(cin)
        k1 = np.asarray(
            jax.random.uniform(block_rng, (1, 1, cin, cout), jnp.float32, -bound, bound)
        )
        pad1 = np.zeros_like(w)
        if len(sc) == 2:
            s_1x1, s_conv = sc
            pad1[1, 1] = k1[0, 0]
            new_w = w * s_conv.reshape(1, 1, 1, -1) + pad1 * s_1x1.reshape(1, 1, 1, -1)
        else:
            s_id, s_1x1, s_conv = sc
            assert cin == cout
            pad1[1, 1] = k1[0, 0]
            new_w = w * s_conv.reshape(1, 1, 1, -1) + pad1 * s_1x1.reshape(1, 1, 1, -1)
            identity = np.zeros_like(w)
            eye = np.eye(cout, dtype=np.float32)
            if use_identity_scales:
                identity[1, 1] = eye * s_id.reshape(1, -1)
            else:
                identity[1, 1] = eye
            new_w = new_w + identity
        flat[w_key] = jnp.asarray(new_w)
    return flax.traverse_util.unflatten_dict(flat)


def generate_gradient_masks(params, scales: Dict):
    """Params-aligned pytree of gradient masks (ones where unmasked)
    (reference: RepOptimizer.py:136-152)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    masks = {k: None for k in flat}
    for path in find_repopt_blocks(params):
        sc = scales[path]
        w_key = path + ("conv", "kernel")
        w = np.asarray(flat[w_key])
        mask = np.ones_like(w, np.float32)
        if len(sc) == 2:
            s_1x1, s_conv = sc
            mask *= (s_conv**2).reshape(1, 1, 1, -1)
            mask[1, 1] += (s_1x1**2).reshape(1, -1)
        else:
            s_id, s_1x1, s_conv = sc
            mask *= (s_conv**2).reshape(1, 1, 1, -1)
            mask[1, 1] += (s_1x1**2).reshape(1, -1)
            ids = np.arange(w.shape[3])
            mask[1, 1, ids, ids] += 1.0
        masks[w_key] = jnp.asarray(mask)
    out = {
        k: (jnp.ones(flat[k].shape, jnp.float32) if m is None else m)
        for k, m in masks.items()
    }
    return flax.traverse_util.unflatten_dict(out)


def apply_gradient_masks(grads, masks):
    return jax.tree_util.tree_map(lambda g, m: g * m.astype(g.dtype), grads, masks)
