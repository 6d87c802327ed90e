"""Native fold-at-load: a checkpoint trained in this framework (train-layout
multi-branch graph) must load into the deploy graph and produce the same
outputs (eval-mode BN) — the native analog of the reference's
``fuse_model()`` + ``switch_to_deploy()`` flow applied to its own training
checkpoints (reference: yolov6/utils/checkpoint.py:22-43).

Covers utils/torch_import.py:native_variables_to_torch_state +
utils/checkpoint.py:load_checkpoint_variables's structure-mismatch branch.
"""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.checkpoint import (
    load_checkpoint_variables,
    save_checkpoint,
)
from yolov6_tpu.utils.config import Config


def _randomized_variables(model, rng, img=64):
    variables = model.init(rng, jnp.zeros((1, img, img, 3), jnp.float32), train=False)
    # randomize params + BN stats so folds are non-trivial
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    out = []
    for leaf, k in zip(leaves, keys):
        if leaf.ndim >= 1:
            out.append(jax.random.normal(k, leaf.shape, jnp.float32) * 0.1)
        else:
            out.append(leaf)
    variables = jax.tree_util.tree_unflatten(treedef, out)
    # BN variances must be positive
    def fix_var(path, x):
        if any(getattr(p, "key", None) == "var" for p in path):
            return jnp.abs(x) + 0.5
        return x

    return jax.tree_util.tree_map_with_path(fix_var, variables)


@pytest.mark.parametrize("config,mode", [
    ("yolov6n.py", "repvgg"),
    ("qarepvgg/yolov6n_qa.py", "qarepvggv2"),
])
def test_native_train_ckpt_folds_to_deploy(tmp_path, config, mode):
    cfg = Config.fromfile(osp.join("/root/repo/configs", config))
    training_mode = cfg.get("training_mode", mode)
    img = 64

    train_model = build_model(cfg, num_classes=3, deploy=False)
    variables = _randomized_variables(train_model, jax.random.PRNGKey(0), img)

    ckpt_path = str(tmp_path / "weights")
    save_checkpoint({"model": jax.device_get(variables), "epoch": 0},
                    False, ckpt_path, "last_ckpt")

    deploy_model = build_model(cfg, num_classes=3, deploy=True)
    folded = load_checkpoint_variables(
        osp.join(ckpt_path, "last_ckpt.msgpack"), deploy_model,
        img_size=(img, img), deploy=True, training_mode=training_mode,
    )

    x = jax.random.uniform(jax.random.PRNGKey(3), (2, img, img, 3), jnp.float32)
    y_train, _ = train_model.apply(variables, x, train=False)
    y_deploy, _ = deploy_model.apply(folded, x, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(y_train), jax.tree_util.tree_leaves(y_deploy)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)


def test_deploy_layout_ckpt_passthrough(tmp_path):
    """A checkpoint already in deploy layout loads verbatim (no fold)."""
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    img = 64
    deploy_model = build_model(cfg, num_classes=3, deploy=True)
    variables = deploy_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32), train=False
    )
    ckpt_path = str(tmp_path / "weights")
    save_checkpoint({"model": jax.device_get(variables), "epoch": 0},
                    False, ckpt_path, "best_ckpt")
    loaded = load_checkpoint_variables(
        osp.join(ckpt_path, "best_ckpt.msgpack"), deploy_model,
        img_size=(img, img), deploy=True,
    )
    for a, b in zip(jax.tree_util.tree_leaves(variables), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
