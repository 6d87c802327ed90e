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
