"""Space-to-depth stem: an exact, MXU-friendly rewrite of the stride-2 3x3
stem convolution.

The deploy stem convolves 3-channel input at 640x640 — at 3 input channels
the MXU runs at ~1% utilization and the stem alone costs ~15% of the S-model
forward. Packing 2x2 pixel blocks into channels (space-to-depth) turns the
same math into a 2x2/stride-1 conv over 12 channels.

Status: NOT wired in by default. Measured on v5e (b32@640, bf16):
- packing on device: 4.8 vs 2.3 ms/batch for the stem alone — a loss (XLA
  materializes the relayout in HBM).
- pre-packed host input (build_model(packed_stem=True), bit-exact vs the
  regular stem, same param tree): full fwd+decode S 14.60 vs 15.13 ms/b
  (+3.6%), N 10.86 vs 10.00 (-8%) — the stem conv is not the tiling
  bottleneck XLA-side, so the packed layout stays an opt-in serving option
  rather than the default.

  y[i,j,o] = ...:

  y[i,j,o] = sum_{ky,kx} W[ky,kx,c,o] x[2i+ky-1, 2j+kx-1, c]     (pad 1)
           = sum_{a,b,p,q} W2[a,b,(p,q,c),o] xp[i-1+a, j-1+b, (p,q,c)]

with W2[a,b,(p,q,c),o] = W[2a+p-1, 2b+q-1, c, o] (zero outside range) and
xp the packed input, left-padded by one packed pixel. Bit-exact by
construction; verified in tests.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [B, H/2, W/2, 4C]; channel order (p, q, c)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))  # b, H/2, W/2, p, q, c
    return x.reshape(b, h // 2, w // 2, 4 * c)


def convert_stem_kernel(kernel3x3: np.ndarray) -> np.ndarray:
    """(3,3,C,O) stride-2 kernel -> (2,2,4C,O) stride-1 kernel over packed input."""
    k = np.asarray(kernel3x3)
    assert k.shape[:2] == (3, 3)
    c, o = k.shape[2], k.shape[3]
    out = np.zeros((2, 2, 4 * c, o), k.dtype)
    for a in range(2):
        for b in range(2):
            for p in range(2):
                for q in range(2):
                    ky, kx = 2 * a + p - 1, 2 * b + q - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        out[a, b, (p * 2 + q) * c : (p * 2 + q + 1) * c, :] = k[ky, kx]
    return out


def s2d_stem_conv(x: jnp.ndarray, kernel2x2: jnp.ndarray, bias: jnp.ndarray, dtype=jnp.bfloat16):
    """Packed-stem conv: 2x2 conv with one packed pixel of top/left padding."""
    import jax

    xp = space_to_depth(x.astype(dtype))
    y = jax.lax.conv_general_dilated(
        xp, kernel2x2.astype(dtype), (1, 1), [(1, 0), (1, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def convert_stem_kernel_jnp(k: jnp.ndarray) -> jnp.ndarray:
    """jnp version of convert_stem_kernel for use inside the serving graph
    (tiny: runs once per dispatch on a [3,3,C,O] tensor)."""
    c, o = k.shape[2], k.shape[3]
    out = jnp.zeros((2, 2, 4 * c, o), k.dtype)
    for a in range(2):
        for b in range(2):
            for p in range(2):
                for q in range(2):
                    ky, kx = 2 * a + p - 1, 2 * b + q - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        out = out.at[a, b, (p * 2 + q) * c : (p * 2 + q + 1) * c, :].set(k[ky, kx])
    return out


def space_to_depth_numpy(x: np.ndarray) -> np.ndarray:
    """Host-side packing for the data pipeline: [..., H, W, C] ->
    [..., H/2, W/2, 4C], same channel order (p, q, c) as space_to_depth."""
    *lead, h, w, c = x.shape
    x = x.reshape(*lead, h // 2, 2, w // 2, 2, c)
    x = np.moveaxis(x, -4, -3)  # ..., H/2, W/2, p, q, c
    return np.ascontiguousarray(x).reshape(*lead, h // 2, w // 2, 4 * c)
