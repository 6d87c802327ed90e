"""RepOptimizer: scale extraction, CSLA fold re-init, and the core
grad-mask equivalence theorem (reference: yolov6/utils/RepOptimizer.py)."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.solver.repoptimizer import (
    extract_scales,
    find_repopt_blocks,
    generate_gradient_masks,
    reinitialize,
)
from yolov6_tpu.utils.config import Config


def _build(cfg_path, mode, img=64):
    cfg = Config.fromfile(cfg_path)
    cfg["training_mode"] = mode
    model = build_model(cfg, num_classes=3, deploy=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False)
    return model, variables


def test_scales_match_repopt_blocks():
    _, hs_vars = _build("/root/repo/configs/repopt/yolov6s_hs.py", "hyper_search")
    _, ro_vars = _build("/root/repo/configs/repopt/yolov6s_hs.py", "repopt")
    scales = extract_scales(hs_vars["params"])
    blocks = find_repopt_blocks(ro_vars["params"])
    assert set(scales) == set(blocks), (
        f"missing={set(blocks) - set(scales)} extra={set(scales) - set(blocks)}"
    )
    assert len(scales) > 20  # every rep position in backbone+neck


def test_reinit_and_masks():
    _, hs_vars = _build("/root/repo/configs/repopt/yolov6s_hs.py", "hyper_search")
    _, ro_vars = _build("/root/repo/configs/repopt/yolov6s_hs.py", "repopt")
    # randomize scales so folds are non-trivial
    scales = extract_scales(hs_vars["params"])
    rng = np.random.default_rng(0)
    scales = {
        k: tuple(np.asarray(rng.uniform(0.5, 1.5, s.shape), np.float32) for s in v)
        for k, v in scales.items()
    }
    new_params = reinitialize(ro_vars["params"], scales, jax.random.PRNGKey(1))
    masks = generate_gradient_masks(ro_vars["params"], scales)

    import flax

    flat_old = flax.traverse_util.flatten_dict(ro_vars["params"])
    flat_new = flax.traverse_util.flatten_dict(new_params)
    flat_mask = flax.traverse_util.flatten_dict(masks)
    blocks = find_repopt_blocks(ro_vars["params"])
    changed = 0
    for k in flat_old:
        block_path = k[:-2]
        if block_path in blocks and k[-2:] == ("conv", "kernel"):
            changed += 1
            sc = scales[block_path]
            m = np.asarray(flat_mask[k])
            s_conv = sc[-1]
            s_1x1 = sc[-2] if len(sc) == 3 else sc[0]
            # off-center: s_conv^2; center adds s_1x1^2 (+1 on diag w/ identity)
            np.testing.assert_allclose(m[0, 0], np.broadcast_to((s_conv**2), m[0, 0].shape), rtol=1e-6)
            center_base = s_conv**2 + s_1x1**2
            if len(sc) == 3:
                diag = np.asarray(m[1, 1]).copy()
                ids = np.arange(diag.shape[0])
                np.testing.assert_allclose(diag[ids, ids], center_base[ids] + 1.0, rtol=1e-6)
            else:
                np.testing.assert_allclose(m[1, 1], np.broadcast_to(center_base, m[1, 1].shape), rtol=1e-6)
        else:
            np.testing.assert_array_equal(np.asarray(flat_old[k]), np.asarray(flat_new[k]))
    assert changed == len(blocks)


def test_csla_sgd_equivalence():
    """One plain-SGD step on CSLA branches == one masked-SGD step on the
    folded conv (the RepOpt theorem the reference relies on)."""
    rng = np.random.default_rng(0)
    cin = cout = 6
    x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.2, jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((1, 1, cin, cout)) * 0.2, jnp.float32)
    s_conv = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    s_1x1 = jnp.asarray(rng.uniform(0.5, 1.5, cout), jnp.float32)
    # the reference's gradient mask assumes an unscaled identity branch
    # (RepOptimizer.py:148 adds +1.0, not s_id^2)
    s_id = jnp.ones(cout, jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((2, 8, 8, cout)), jnp.float32)
    lr = 0.1

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(w.shape[0] // 2,) * 2, (w.shape[1] // 2,) * 2],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def csla_forward(w3, w1, sid, x):
        return conv(x, w3) * s_conv + conv(x, w1) * s_1x1 + x * sid

    def fold(w3, w1, sid):
        k = w3 * s_conv + jnp.pad(w1, ((1, 1), (1, 1), (0, 0), (0, 0))) * s_1x1
        ident = jnp.zeros((3, 3, cin, cout)).at[1, 1].set(jnp.eye(cin) * sid)
        return k + ident

    def csla_loss(params, x):
        return jnp.sum((csla_forward(*params, x) - tgt) ** 2)

    # the identity *scale* is trainable in the CSLA block — its gradient is
    # what the +1.0 diag term of the mask encodes
    g3, g1, gid = jax.grad(csla_loss)((w3, w1, s_id), x)
    folded_after_csla_step = fold(w3 - lr * g3, w1 - lr * g1, s_id - lr * gid)

    w_fold = fold(w3, w1, s_id)

    def plain_loss(w, x):
        return jnp.sum((conv(x, w) - tgt) ** 2)

    g = jax.grad(plain_loss)(w_fold, x)
    mask = jnp.ones_like(w_fold) * (s_conv**2)
    mask = mask.at[1, 1].add(jnp.broadcast_to(s_1x1**2, (cin, cout)))
    mask = mask.at[1, 1, jnp.arange(cin), jnp.arange(cout)].add(s_id**2)
    folded_after_masked_step = w_fold - lr * g * mask

    np.testing.assert_allclose(
        np.asarray(folded_after_csla_step), np.asarray(folded_after_masked_step),
        rtol=1e-4, atol=1e-5,
    )
