"""Lite decoupled head (reference: yolov6/models/heads/effidehead_lite.py).

Same decode scheme as the plain head but with 5x5 depthwise-separable convs
and no DFL."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import DPBlock, QConv
from yolov6_tpu.models.effidehead import cls_bias_init
from yolov6_tpu.utils.registry import HEADS


@HEADS.register()
class DetectLite(nn.Module):
    """Lite head over ``num_layers`` levels (reference: effidehead_lite.py:10-128)."""

    num_classes: int = 80
    num_layers: int = 4
    num_anchors: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    # kept for interface parity with Detect
    use_dfl: bool = False
    reg_max: int = 0

    @property
    def strides(self):
        return (8, 16, 32) if self.num_layers == 3 else (8, 16, 32, 64)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_outputs, reg_outputs, stem_feats = [], [], []
        for i, x in enumerate(feats):
            c = x.shape[-1]
            x = DPBlock(c, 5, 1, self.deploy, self.dtype, name=f"stems.{i}")(x, train)
            stem_feats.append(x)
            cls_feat = DPBlock(c, 5, 1, self.deploy, self.dtype, name=f"cls_convs.{i}")(x, train)
            cls_out = QConv(
                self.num_classes * self.num_anchors, (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=cls_bias_init,
                dtype=self.dtype, name=f"cls_preds.{i}",
            )(cls_feat)
            reg_feat = DPBlock(c, 5, 1, self.deploy, self.dtype, name=f"reg_convs.{i}")(x, train)
            reg_out = QConv(
                4 * self.num_anchors, (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                dtype=self.dtype, name=f"reg_preds.{i}",
            )(reg_feat)
            cls_outputs.append(cls_out)
            reg_outputs.append(reg_out)
        return {"cls": cls_outputs, "reg": reg_outputs, "stems": stem_feats}
