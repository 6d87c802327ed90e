"""Distill-NS head (reference: yolov6/models/heads/effidehead_distill_ns.py).

N/S self-distillation: a train-only DFL regression branch (reg_preds_dist)
beside the plain ltrb branch (reg_preds) that ships — "cost-free"
distillation. Eval/deploy uses only cls + plain ltrb (no DFL)."""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import ConvBNSiLU, QConv
from yolov6_tpu.models.effidehead import cls_bias_init
from yolov6_tpu.utils.registry import HEADS


@HEADS.register()
class DetectDistillNS(nn.Module):
    """(reference: effidehead_distill_ns.py:10-106)"""

    num_classes: int = 80
    num_layers: int = 3
    use_dfl: bool = True   # controls the train-only distri branch width
    reg_max: int = 16
    num_anchors: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @property
    def strides(self):
        return (8, 16, 32) if self.num_layers == 3 else (8, 16, 32, 64)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_outputs, reg_outputs, reg_dist_outputs, stem_feats = [], [], [], []
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
                QConv(4, (1, 1), use_bias=True,
                        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                        dtype=self.dtype, name=f"reg_preds.{i}")(reg_feat)
            )
            if not self.deploy:
                reg_dist_outputs.append(
                    QConv(4 * (self.reg_max + 1), (1, 1), use_bias=True,
                            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                            dtype=self.dtype, name=f"reg_preds_dist.{i}")(reg_feat)
                )
        out = {"cls": cls_outputs, "reg": reg_outputs, "stems": stem_feats}
        if not self.deploy:
            out["reg_dist"] = reg_dist_outputs
        return out
