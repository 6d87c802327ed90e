"""Checkpoint IO (reference: yolov6/utils/checkpoint.py).

Two formats are supported:
* native ``.npz``-style msgpack checkpoints of flax pytrees (params,
  batch_stats, EMA, optimizer state, epoch) — fast, dependency-free;
* reference PyTorch ``.pt`` checkpoints via utils/torch_import (with
  re-parameterization folded at load when ``deploy=True``).
"""

from __future__ import annotations

import os
import os.path as osp
import shutil
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolov6_tpu.utils.events import LOGGER


def _to_numpy_tree(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(ckpt: Dict[str, Any], is_best: bool, save_dir: str, model_name: str = "last_ckpt"):
    """Serialize a checkpoint dict of pytrees (reference: checkpoint.py:35-43)."""
    from flax import serialization

    os.makedirs(save_dir, exist_ok=True)
    path = osp.join(save_dir, f"{model_name}.msgpack")
    data = serialization.msgpack_serialize(_to_numpy_tree(ckpt))
    with open(path, "wb") as f:
        f.write(data)
    if is_best:
        shutil.copyfile(path, osp.join(save_dir, "best_ckpt.msgpack"))
    return path


def load_native_checkpoint(path: str) -> Dict[str, Any]:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def strip_optimizer(ckpt_dir: str, epoch: int):
    """Keep only EMA weights in final checkpoints (reference: checkpoint.py:46-61)."""
    for name in ("best_ckpt", "last_ckpt"):
        path = osp.join(ckpt_dir, f"{name}.msgpack")
        if not osp.exists(path):
            continue
        ckpt = load_native_checkpoint(path)
        variables = ckpt.get("ema") or ckpt.get("model")
        out = {"model": variables, "epoch": ckpt.get("epoch", epoch)}
        from flax import serialization

        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(_to_numpy_tree(out)))


def load_checkpoint_variables(
    weights: str,
    model,
    img_size=(640, 640),
    deploy: bool = True,
    training_mode: str = "repvgg",
    prefer_ema: bool = True,
):
    """Load model variables from a native or reference checkpoint.

    For ``.pt`` files this performs the torch import with fold-at-load
    (the TPU-native replacement for reference load_checkpoint's fuse_model +
    switch_to_deploy flow, reference checkpoint.py:22-32).
    """
    spec = jax.eval_shape(
        lambda x: model.init(jax.random.PRNGKey(0), x, train=False),
        jnp.zeros((1, img_size[0], img_size[1], 3), jnp.float32),
    )
    if weights.endswith(".pt"):
        from yolov6_tpu.utils.torch_import import import_checkpoint, load_reference_checkpoint

        LOGGER.info(f"Importing reference checkpoint {weights} (deploy={deploy})")
        state = load_reference_checkpoint(weights, prefer_ema=prefer_ema)
        return import_checkpoint(state, spec, training_mode=training_mode, deploy=deploy)
    ckpt = load_native_checkpoint(weights)
    variables = dict(ckpt.get("ema") or ckpt.get("model") or ckpt)
    # PTQ/QAT checkpoints carry calibrated amax ranges in a 'quant'
    # collection (tools/quantize.py); it is not part of the model spec —
    # detach for the layout check and re-attach to whatever loads
    quant = variables.pop("quant", None)

    def _paths(tree, prefix=()):
        out = set()
        for k, v in tree.items():
            if isinstance(v, dict):
                out |= _paths(v, prefix + (k,))
            else:
                out.add(prefix + (k,))
        return out

    if _paths(variables) != _paths({k: dict(v) for k, v in spec.items()}):
        # train-layout native checkpoint loaded into a deploy graph: go
        # through the same fold-at-load path as reference .pt imports
        from yolov6_tpu.utils.torch_import import (
            import_checkpoint,
            native_variables_to_torch_state,
        )

        LOGGER.info(
            f"Folding train-layout native checkpoint {weights} to the target "
            f"graph (training_mode={training_mode}, deploy={deploy})"
        )
        state = native_variables_to_torch_state(variables)
        out = import_checkpoint(state, spec, training_mode=training_mode, deploy=deploy)
    else:
        out = jax.tree_util.tree_map(jnp.asarray, variables)
    if quant is not None:
        out = dict(out)
        out["quant"] = jax.tree_util.tree_map(jnp.asarray, quant)
    return out


def load_state_dict_partial(variables, target_spec):
    """Shape-matched partial load for finetuning (reference: checkpoint.py:11-19):
    keep leaves whose shapes match the target, re-init the rest."""
    import flax

    src = flax.traverse_util.flatten_dict(variables)
    dst = flax.traverse_util.flatten_dict(target_spec)
    out = {}
    n_match = 0
    for k, leaf in dst.items():
        v = src.get(k)
        if v is not None and tuple(np.shape(v)) == tuple(leaf.shape):
            out[k] = jnp.asarray(v)
            n_match += 1
        else:
            out[k] = None
    LOGGER.info(f"partial load: matched {n_match}/{len(dst)} tensors")
    return flax.traverse_util.unflatten_dict(out)
