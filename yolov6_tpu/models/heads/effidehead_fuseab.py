"""Anchor-Aided Training head (reference: yolov6/models/heads/effidehead_fuseab.py).

Adds anchor-BASED auxiliary prediction convs per level alongside the
anchor-free branch; eval/export uses only the anchor-free branch, so the
deploy graph is identical to the plain head."""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import ConvBNSiLU, QConv
from yolov6_tpu.models.effidehead import cls_bias_init
from yolov6_tpu.utils.registry import HEADS


@HEADS.register()
class DetectFuseAB(nn.Module):
    """Decoupled head + AAT branch (reference: effidehead_fuseab.py:10-139)."""

    num_classes: int = 80
    num_layers: int = 3
    use_dfl: bool = True
    reg_max: int = 16
    anchors_init: Tuple = ()
    num_anchors: int = 3  # anchors per cell in the ab branch
    deploy: bool = False
    dtype: Any = jnp.float32

    @property
    def strides(self):
        return (8, 16, 32) if self.num_layers == 3 else (8, 16, 32, 64)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_outputs, reg_outputs, stem_feats = [], [], []
        cls_ab_outputs, reg_ab_outputs = [], []
        for i, x in enumerate(feats):
            c = x.shape[-1]
            x = ConvBNSiLU(c, 1, 1, deploy=self.deploy, dtype=self.dtype, name=f"stems.{i}")(x, train)
            stem_feats.append(x)
            cls_feat = ConvBNSiLU(c, 3, 1, deploy=self.deploy, dtype=self.dtype, name=f"cls_convs.{i}")(x, train)
            reg_feat = ConvBNSiLU(c, 3, 1, deploy=self.deploy, dtype=self.dtype, name=f"reg_convs.{i}")(x, train)

            cls_outputs.append(
                QConv(self.num_classes, (1, 1), use_bias=True,
                        kernel_init=nn.initializers.zeros, bias_init=cls_bias_init,
                        dtype=self.dtype, name=f"cls_preds.{i}")(cls_feat)
            )
            reg_outputs.append(
                QConv(4 * (self.reg_max + 1), (1, 1), use_bias=True,
                        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                        dtype=self.dtype, name=f"reg_preds.{i}")(reg_feat)
            )
            if not self.deploy:
                cls_ab_outputs.append(
                    QConv(self.num_classes * self.num_anchors, (1, 1), use_bias=True,
                            kernel_init=nn.initializers.zeros, bias_init=cls_bias_init,
                            dtype=self.dtype, name=f"cls_preds_ab.{i}")(cls_feat)
                )
                reg_ab_outputs.append(
                    QConv(4 * self.num_anchors, (1, 1), use_bias=True,
                            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                            dtype=self.dtype, name=f"reg_preds_ab.{i}")(reg_feat)
                )
        out = {"cls": cls_outputs, "reg": reg_outputs, "stems": stem_feats}
        if not self.deploy:
            out["cls_ab"] = cls_ab_outputs
            out["reg_ab"] = reg_ab_outputs
        return out


def flatten_ab_outputs(head_out, anchors_init, strides, num_anchors: int = 3):
    """Flatten + decode the anchor-based branch (reference:
    effidehead_fuseab.py:113-123): sigmoid cls, wh = (sigmoid*2)^2 * anchor_init.

    anchors_init: per-level flat tuples (len 2*num_anchors) in image pixels;
    divided by stride here (reference :34). Returns
    (cls_ab [b, 3A, nc], reg_ab [b, 3A, 4])."""
    cls_list, reg_list = [], []
    for i, (cls_map, reg_map) in enumerate(zip(head_out["cls_ab"], head_out["reg_ab"])):
        b, h, w, _ = cls_map.shape
        na = num_anchors
        anchors = (
            jnp.asarray(anchors_init[i], jnp.float32).reshape(na, 2) / strides[i]
        )
        cls = jax.nn.sigmoid(cls_map.reshape(b, h, w, na, -1).astype(jnp.float32))
        # torch layout is (b, na, h, w, c) flattened na-major; match it
        cls = jnp.transpose(cls, (0, 3, 1, 2, 4)).reshape(b, na * h * w, -1)
        reg = reg_map.reshape(b, h, w, na, 4).astype(jnp.float32)
        reg = jnp.transpose(reg, (0, 3, 1, 2, 4))
        wh = (jax.nn.sigmoid(reg[..., 2:4]) * 2) ** 2 * anchors[None, :, None, None, :]
        reg = jnp.concatenate([reg[..., :2], wh], -1).reshape(b, na * h * w, 4)
        cls_list.append(cls)
        reg_list.append(reg)
    return jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1)
