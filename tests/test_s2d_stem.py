"""Space-to-depth stem must be bit-exact vs the stride-2 3x3 conv."""

import numpy as np

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.ops.s2d_stem import convert_stem_kernel, s2d_stem_conv


def test_s2d_stem_exact():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 16)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.standard_normal(16).astype(np.float32) * 0.1)

    want = jax.lax.conv_general_dilated(
        x, k, (2, 2), [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias

    k2 = jnp.asarray(convert_stem_kernel(np.asarray(k)))
    got = s2d_stem_conv(x, k2, bias, dtype=jnp.float32)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5)


def test_packed_stem_model_parity():
    """build_model(packed_stem=True) on packed input == regular model on raw
    input, with the SAME parameter tree (layout-independent checkpoints)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.ops.s2d_stem import space_to_depth_numpy
    from yolov6_tpu.utils.config import Config

    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    m1 = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.float32)
    m2 = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.float32, packed_stem=True)
    x = np.random.default_rng(0).uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    v1 = m1.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    xp = space_to_depth_numpy(x)
    v2 = m2.init(jax.random.PRNGKey(0), jnp.asarray(xp), train=False)
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)

    o1, _ = m1.apply(v1, jnp.asarray(x), train=False)
    o2, _ = m2.apply(v1, jnp.asarray(xp), train=False)
    for a, b in zip(jax.tree_util.tree_leaves(o1), jax.tree_util.tree_leaves(o2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_packed_stem_guards():
    import jax.numpy as jnp
    import pytest

    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config

    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    with pytest.raises(ValueError):
        build_model(cfg, num_classes=80, deploy=False, dtype=jnp.float32, packed_stem=True)
