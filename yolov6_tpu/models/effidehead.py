"""Efficient Decoupled Head, anchor-free (reference: yolov6/models/effidehead.py).

The head module emits raw per-level maps; the eval-time decode (DFL softmax
projection + dist2bbox + stride scaling, reference effidehead.py:93-139) is a
separate pure function so serving graphs can fuse it with NMS, and export
graphs can omit it.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.assigners.anchor_generator import generate_anchors
from yolov6_tpu.layers.common import ConvBNSiLU, QConv, conv_kernel_init
from yolov6_tpu.ops.boxes import dist2bbox
from yolov6_tpu.utils.registry import HEADS

PRIOR_PROB = 1e-2


def cls_bias_init(key, shape, dtype=jnp.float32):
    """Prior-probability bias init (reference: effidehead.py:49-57)."""
    return jnp.full(shape, -math.log((1 - PRIOR_PROB) / PRIOR_PROB), dtype)


@HEADS.register()
class Detect(nn.Module):
    """Decoupled head over ``num_layers`` FPN levels (reference: effidehead.py:10-139).

    __call__ returns a list of per-level dicts {"cls": [b,h,w,nc] logits,
    "reg": [b,h,w,4*(reg_max+1)]}; stem features are returned alongside for
    the distillation losses.
    """

    num_classes: int = 80
    num_layers: int = 3
    use_dfl: bool = True
    reg_max: int = 16
    num_anchors: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @property
    def strides(self) -> Tuple[int, ...]:
        return (8, 16, 32) if self.num_layers == 3 else (8, 16, 32, 64)

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        cls_outputs = []
        reg_outputs = []
        stem_feats = []
        for i, x in enumerate(feats):
            c = x.shape[-1]
            x = ConvBNSiLU(c, 1, 1, deploy=self.deploy, dtype=self.dtype, name=f"stems.{i}")(x, train)
            stem_feats.append(x)
            cls_feat = ConvBNSiLU(c, 3, 1, deploy=self.deploy, dtype=self.dtype, name=f"cls_convs.{i}")(x, train)
            cls_out = QConv(
                self.num_classes * self.num_anchors, (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=cls_bias_init,
                dtype=self.dtype, name=f"cls_preds.{i}",
            )(cls_feat)
            reg_feat = ConvBNSiLU(c, 3, 1, deploy=self.deploy, dtype=self.dtype, name=f"reg_convs.{i}")(x, train)
            reg_out = QConv(
                4 * (self.reg_max + self.num_anchors), (1, 1), use_bias=True,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.ones,
                dtype=self.dtype, name=f"reg_preds.{i}",
            )(reg_feat)
            cls_outputs.append(cls_out)
            reg_outputs.append(reg_out)
        return {"cls": cls_outputs, "reg": reg_outputs, "stems": stem_feats}


def flatten_head_outputs(outputs: dict, num_classes: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Train-branch flattening (reference: effidehead.py:72-92): concatenated
    per-anchor sigmoid class scores [b,A,nc] and raw reg distributions [b,A,4*(reg_max+1)]."""
    cls_list = [jax.nn.sigmoid(c.reshape(c.shape[0], -1, c.shape[-1])) for c in outputs["cls"]]
    reg_list = [r.reshape(r.shape[0], -1, r.shape[-1]) for r in outputs["reg"]]
    return jnp.concatenate(cls_list, axis=1), jnp.concatenate(reg_list, axis=1)


def dfl_project(reg_out: jnp.ndarray, reg_max: int) -> jnp.ndarray:
    """Distribution-focal decode: softmax over reg_max+1 bins, expectation
    (reference: effidehead.py:108-110 proj_conv with linspace weights)."""
    b, a = reg_out.shape[0], reg_out.shape[1]
    logits = reg_out.reshape(b, a, 4, reg_max + 1)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    proj = jnp.arange(reg_max + 1, dtype=jnp.float32)
    return probs @ proj


def decode_eval(
    outputs: dict,
    num_classes: int,
    strides: Sequence[int],
    use_dfl: bool,
    reg_max: int,
) -> jnp.ndarray:
    """Eval decode (reference: effidehead.py:93-139): returns [b, A, 5+nc]
    rows = [cx, cy, w, h, 1.0(obj), cls_scores...] in input-image pixels."""
    feats_hw = [c.shape[1:3] for c in outputs["cls"]]
    b = outputs["cls"][0].shape[0]

    cls_list, reg_list = [], []
    for c, r in zip(outputs["cls"], outputs["reg"]):
        c = c.reshape(b, -1, num_classes).astype(jnp.float32)
        r = r.reshape(b, -1, r.shape[-1]).astype(jnp.float32)
        cls_list.append(jax.nn.sigmoid(c))
        if use_dfl:
            reg_list.append(dfl_project(r, reg_max))
        else:
            reg_list.append(r)
    cls_scores = jnp.concatenate(cls_list, axis=1)
    reg_dists = jnp.concatenate(reg_list, axis=1)

    anchor_points, stride_tensor = generate_anchors(
        feats_hw, strides, is_eval=True, mode="af", dtype=jnp.float32
    )
    pred_bboxes = dist2bbox(reg_dists, anchor_points[None], box_format="xywh") * stride_tensor[None]
    obj = jnp.ones((b, pred_bboxes.shape[1], 1), jnp.float32)
    return jnp.concatenate([pred_bboxes, obj, cls_scores], axis=-1)
