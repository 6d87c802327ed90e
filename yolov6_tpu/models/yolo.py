"""Detector assembly (reference: yolov6/models/yolo.py, yolov6/models/yolo_lite.py).

``build_network`` resolves backbone/neck/head types through explicit
registries (the reference uses ``eval()`` on config strings,
yolo.py:70-71), applies depth/width multiples, and returns a single Flax
``Model`` whose ``__call__`` yields raw head outputs + neck feature maps.
Decoding to detections lives in effidehead.decode_eval so inference graphs
can fuse decode+NMS under one jit.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import ConvBNSiLU, get_block
from yolov6_tpu.models import effidehead
from yolov6_tpu.models.effidehead import Detect, decode_eval
from yolov6_tpu.models.heads.effidehead_lite import DetectLite
from yolov6_tpu.models import efficientrep as _efficientrep  # noqa: F401 (registry)
from yolov6_tpu.models import reppan as _reppan  # noqa: F401 (registry)
from yolov6_tpu.utils.registry import BACKBONES, NECKS


def make_divisible(x, divisor=8):
    """Reference yolo.py:50-52 (ceil variant, used by the P5/P6 families)."""
    return math.ceil(x / divisor) * divisor


def make_divisible_lite(v, divisor=16):
    """Reference yolo_lite.py:84-88 (round-to-nearest variant for lite models)."""
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class Model(nn.Module):
    """backbone -> neck -> head (reference: yolo.py:14-47)."""

    backbone: nn.Module
    neck: nn.Module
    detect: nn.Module
    num_classes: int
    use_dfl: bool
    reg_max: int

    @property
    def strides(self):
        return self.detect.strides

    def __call__(self, x, train: bool = False):
        feats = self.backbone(x, train)
        neck_feats = self.neck(feats, train)
        head_out = self.detect(neck_feats, train)
        return head_out, neck_feats

    def decode(self, head_out):
        """Raw head maps -> [b, A, 5+nc] predictions (eval branch)."""
        return decode_eval(head_out, self.num_classes, self.strides, self.use_dfl, self.reg_max)


def _is_lite(cfg) -> bool:
    return cfg.model.backbone.type == "Lite_EffiBackbone"


def build_network(
    cfg,
    num_classes: int,
    fuse_ab: bool = False,
    distill_ns: bool = False,
    deploy: bool = False,
    dtype: Any = jnp.float32,
    packed_stem: bool = False,
) -> Model:
    """Construct the detector from a config (reference: yolo.py:55-133).

    packed_stem=True (deploy-only, P5 rep backbones): the model consumes
    pre-packed space-to-depth input [b, H/2, W/2, 12] (ops/s2d_stem.py) —
    the MXU-friendly serving layout; parameters are unchanged."""
    if _is_lite(cfg):
        return _build_lite_network(cfg, num_classes, deploy=deploy, dtype=dtype)

    mcfg = cfg.model
    depth_mul = mcfg.depth_multiple
    width_mul = mcfg.width_multiple
    num_repeat = [
        (max(round(i * depth_mul), 1) if i > 1 else i)
        for i in (list(mcfg.backbone.num_repeats) + list(mcfg.neck.num_repeats))
    ]
    channels_list = [
        make_divisible(i * width_mul, 8)
        for i in (list(mcfg.backbone.out_channels) + list(mcfg.neck.out_channels))
    ]
    block = get_block(cfg.get("training_mode", "repvgg"))
    use_dfl = mcfg.head.use_dfl
    reg_max = mcfg.head.reg_max
    num_layers = mcfg.head.num_layers

    backbone_cls = BACKBONES.get(mcfg.backbone.type)
    neck_cls = NECKS.get(mcfg.neck.type)

    bb_kwargs = dict(
        channels_list=channels_list,
        num_repeats=num_repeat,
        block=block,
        fuse_P2=bool(mcfg.backbone.get("fuse_P2")),
        cspsppf=bool(mcfg.backbone.get("cspsppf")),
        deploy=deploy,
        dtype=dtype,
    )
    if packed_stem:
        if not deploy or mcfg.backbone.type not in ("EfficientRep", "CSPBepBackbone"):
            raise ValueError("packed_stem requires deploy=True and a P5 rep backbone")
        bb_kwargs.update(packed_stem=True)
    neck_kwargs = dict(
        channels_list=channels_list,
        num_repeats=num_repeat,
        block=block,
        deploy=deploy,
        dtype=dtype,
    )
    if "CSP" in mcfg.backbone.type:
        stage_block_type = mcfg.backbone.get("stage_block_type", "BepC3")
        bb_kwargs.update(csp_e=mcfg.backbone.csp_e, stage_block_type=stage_block_type)
        neck_kwargs.update(csp_e=mcfg.neck.csp_e, stage_block_type=stage_block_type)

    backbone = backbone_cls(**bb_kwargs)
    neck = neck_cls(**neck_kwargs)

    if distill_ns:
        from yolov6_tpu.models.heads.effidehead_distill_ns import DetectDistillNS

        if num_layers != 3:
            raise ValueError("distill_ns head only supports 3-layer (P5) models")
        head = DetectDistillNS(
            num_classes=num_classes, num_layers=num_layers, use_dfl=use_dfl,
            reg_max=reg_max, deploy=deploy, dtype=dtype,
        )
        # the deployed branch is plain ltrb — decode must not run DFL
        return Model(
            backbone=backbone, neck=neck, detect=head,
            num_classes=num_classes, use_dfl=False, reg_max=0,
        )
    elif fuse_ab:
        from yolov6_tpu.models.heads.effidehead_fuseab import DetectFuseAB

        head = DetectFuseAB(
            num_classes=num_classes, num_layers=num_layers, use_dfl=use_dfl,
            reg_max=reg_max, anchors_init=tuple(map(tuple, mcfg.head.anchors_init)),
            deploy=deploy, dtype=dtype,
        )
    else:
        head = Detect(
            num_classes=num_classes, num_layers=num_layers, use_dfl=use_dfl,
            reg_max=reg_max, deploy=deploy, dtype=dtype,
        )

    return Model(
        backbone=backbone, neck=neck, detect=head,
        num_classes=num_classes, use_dfl=use_dfl, reg_max=reg_max,
    )


def _build_lite_network(cfg, num_classes, deploy=False, dtype=jnp.float32) -> Model:
    """Lite assembly (reference: yolo_lite.py:48-77)."""
    mcfg = cfg.model
    width_mul = mcfg.width_multiple
    out_channels = [make_divisible_lite(i * width_mul) for i in mcfg.backbone.out_channels]
    mid_channels = [
        make_divisible_lite(int(i * mcfg.backbone.scale_size), divisor=8) for i in out_channels
    ]
    backbone = BACKBONES.get(mcfg.backbone.type)(
        in_channels=3,
        mid_channels=mid_channels,
        out_channels=out_channels,
        num_repeat=tuple(mcfg.backbone.num_repeats),
        deploy=deploy,
        dtype=dtype,
    )
    neck = NECKS.get(mcfg.neck.type)(
        unified_channels=mcfg.neck.unified_channels, deploy=deploy, dtype=dtype
    )
    head = DetectLite(
        num_classes=num_classes, num_layers=mcfg.head.num_layers, deploy=deploy, dtype=dtype
    )
    return Model(
        backbone=backbone, neck=neck, detect=head,
        num_classes=num_classes, use_dfl=False, reg_max=0,
    )


def build_model(
    cfg,
    num_classes: int,
    fuse_ab: bool = False,
    distill_ns: bool = False,
    deploy: bool = False,
    dtype: Any = jnp.float32,
    packed_stem: bool = False,
) -> Model:
    """Public entry (reference: yolo.py:136-138)."""
    return build_network(
        cfg, num_classes, fuse_ab=fuse_ab, distill_ns=distill_ns, deploy=deploy,
        dtype=dtype, packed_stem=packed_stem,
    )


def init_model_variables(model: Model, rng, img_size: Tuple[int, int] = (640, 640)):
    """Initialize parameter/batch-stat collections for a model."""
    x = jnp.zeros((1, img_size[0], img_size[1], 3), jnp.float32)
    return model.init(rng, x, train=False)
