"""Anchor generation (reference: yolov6/assigners/anchor_generator.py:6-63).

TPU-native difference: anchors are computed from *static* feature shapes
(h, w) rather than live tensors, so generation is traced once per image size
and constant-folded by XLA.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def generate_anchors(
    feats_hw: Sequence[Tuple[int, int]],
    fpn_strides: Sequence[int],
    grid_cell_size: float = 5.0,
    grid_cell_offset: float = 0.5,
    is_eval: bool = False,
    mode: str = "af",
    dtype=jnp.float32,
):
    """Build per-level grid anchors.

    Args:
      feats_hw: list of (h, w) per FPN level (static Python ints).
      fpn_strides: stride per level.
      mode: 'af' anchor-free (1 anchor/cell) or 'ab' anchor-based (x3 repeat).

    Returns (eval): anchor_points [A,2], stride_tensor [A,1].
    Returns (train): anchors [A,4], anchor_points [A,2], num_anchors_list,
    stride_tensor [A,1] — matching the reference's return signature.
    """
    anchors = []
    anchor_points = []
    stride_tensor = []
    num_anchors_list = []
    rep = 3 if mode == "ab" else 1
    for (h, w), stride in zip(feats_hw, fpn_strides):
        sx = (np.arange(w, dtype=np.float32) + grid_cell_offset)
        sy = (np.arange(h, dtype=np.float32) + grid_cell_offset)
        if not is_eval:
            sx = sx * stride
            sy = sy * stride
        gy, gx = np.meshgrid(sy, sx, indexing="ij")
        pts = np.stack([gx, gy], axis=-1).reshape(-1, 2)
        if not is_eval:
            half = grid_cell_size * stride * 0.5
            boxes = np.concatenate([pts - half, pts + half], axis=-1)
            anchors.append(np.tile(boxes, (rep, 1)))
        anchor_points.append(np.tile(pts, (rep, 1)))
        num_anchors_list.append(h * w * rep)
        stride_tensor.append(np.full((h * w * rep, 1), stride, np.float32))

    anchor_points = jnp.asarray(np.concatenate(anchor_points), dtype)
    stride_tensor = jnp.asarray(np.concatenate(stride_tensor), dtype)
    if is_eval:
        return anchor_points, stride_tensor
    anchors = jnp.asarray(np.concatenate(anchors), dtype)
    return anchors, anchor_points, num_anchors_list, stride_tensor
