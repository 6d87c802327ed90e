"""Rep-PAN neck family (reference: yolov6/models/reppan.py).

Nine variants: {RepPAN, RepBiFPAN} x {P5, P6} x {plain, CSP} plus the lite
neck. All NHWC Flax modules. Upsampling uses the MXU-native Transpose block
(matmul + depth-to-space) instead of ConvTranspose; the lite neck uses exact
nearest-neighbor 2x upsampling.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import (
    BepC3,
    BiFusion,
    ConvBNHS,
    ConvBNReLU,
    CSPBlock,
    DPBlock,
    MBLABlock,
    RepBlock,
    RepVGGBlock,
    Transpose,
)
from yolov6_tpu.utils.registry import NECKS


def upsample_nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    """Exact nearest-neighbor 2x upsample (reference: reppan.py:1147-1149)."""
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class _StageFactory:
    """Builds the per-variant stage block: plain RepBlock or CSP stage block
    with (n, e) args (reference: reppan.py 544-599 vs 24-50)."""

    def __init__(self, csp: bool, block, csp_e: float, stage_block_type: str, deploy, dtype):
        self.csp = csp
        self.block = block
        self.csp_e = csp_e
        self.stage_block = {"BepC3": BepC3, "MBLABlock": MBLABlock}[stage_block_type]
        self.deploy = deploy
        self.dtype = dtype

    def __call__(self, out_channels: int, n: int, name: str):
        if self.csp:
            return self.stage_block(
                out_channels, n=n, e=self.csp_e, block=self.block,
                deploy=self.deploy, dtype=self.dtype, name=name,
            )
        return RepBlock(
            out_channels, n=n, block=self.block, deploy=self.deploy, dtype=self.dtype, name=name
        )


class _PANNeckP5(nn.Module):
    """Concat-style PAN over 3 levels (reference: reppan.py:7-129 / 544-663)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp: bool = False
    csp_e: float = 0.5
    stage_block_type: str = "BepC3"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage = _StageFactory(self.csp, self.block, self.csp_e, self.stage_block_type, self.deploy, self.dtype)
        x2, x1, x0 = inputs

        fpn_out0 = ConvBNReLU(ch[5], 1, 1, name="reduce_layer0", **kw)(x0, train)
        up0 = Transpose(ch[5], dtype=self.dtype, name="upsample0")(fpn_out0, train)
        f_out0 = stage(ch[5], nr[5], "Rep_p4")(jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = ConvBNReLU(ch[6], 1, 1, name="reduce_layer1", **kw)(f_out0, train)
        up1 = Transpose(ch[6], dtype=self.dtype, name="upsample1")(fpn_out1, train)
        pan_out2 = stage(ch[6], nr[6], "Rep_p3")(jnp.concatenate([up1, x2], -1), train)

        down1 = ConvBNReLU(ch[7], 3, 2, name="downsample2", **kw)(pan_out2, train)
        pan_out1 = stage(ch[8], nr[7], "Rep_n3")(jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = ConvBNReLU(ch[9], 3, 2, name="downsample1", **kw)(pan_out1, train)
        pan_out0 = stage(ch[10], nr[8], "Rep_n4")(jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class _BiFPANNeckP5(nn.Module):
    """BiFusion PAN over 4 backbone levels (reference: reppan.py:132-237 / 666-785)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp: bool = False
    csp_e: float = 0.5
    stage_block_type: str = "BepC3"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage = _StageFactory(self.csp, self.block, self.csp_e, self.stage_block_type, self.deploy, self.dtype)
        x3, x2, x1, x0 = inputs

        fpn_out0 = ConvBNReLU(ch[5], 1, 1, name="reduce_layer0", **kw)(x0, train)
        f0 = BiFusion(ch[5], name="Bifusion0", **kw)([fpn_out0, x1, x2], train)
        f_out0 = stage(ch[5], nr[5], "Rep_p4")(f0, train)

        fpn_out1 = ConvBNReLU(ch[6], 1, 1, name="reduce_layer1", **kw)(f_out0, train)
        f1 = BiFusion(ch[6], name="Bifusion1", **kw)([fpn_out1, x2, x3], train)
        pan_out2 = stage(ch[6], nr[6], "Rep_p3")(f1, train)

        down1 = ConvBNReLU(ch[7], 3, 2, name="downsample2", **kw)(pan_out2, train)
        pan_out1 = stage(ch[8], nr[7], "Rep_n3")(jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = ConvBNReLU(ch[9], 3, 2, name="downsample1", **kw)(pan_out1, train)
        pan_out0 = stage(ch[10], nr[8], "Rep_n4")(jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out2, pan_out1, pan_out0]


class _PANNeckP6(nn.Module):
    """Concat-style PAN over 4 levels (reference: reppan.py:240-391 / 788-952)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp: bool = False
    csp_e: float = 0.5
    stage_block_type: str = "BepC3"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage = _StageFactory(self.csp, self.block, self.csp_e, self.stage_block_type, self.deploy, self.dtype)
        x3, x2, x1, x0 = inputs

        fpn_out0 = ConvBNReLU(ch[6], 1, 1, name="reduce_layer0", **kw)(x0, train)
        up0 = Transpose(ch[6], dtype=self.dtype, name="upsample0")(fpn_out0, train)
        f_out0 = stage(ch[6], nr[6], "Rep_p5")(jnp.concatenate([up0, x1], -1), train)

        fpn_out1 = ConvBNReLU(ch[7], 1, 1, name="reduce_layer1", **kw)(f_out0, train)
        up1 = Transpose(ch[7], dtype=self.dtype, name="upsample1")(fpn_out1, train)
        f_out1 = stage(ch[7], nr[7], "Rep_p4")(jnp.concatenate([up1, x2], -1), train)

        fpn_out2 = ConvBNReLU(ch[8], 1, 1, name="reduce_layer2", **kw)(f_out1, train)
        up2 = Transpose(ch[8], dtype=self.dtype, name="upsample2")(fpn_out2, train)
        pan_out3 = stage(ch[8], nr[8], "Rep_p3")(jnp.concatenate([up2, x3], -1), train)

        down2 = ConvBNReLU(ch[8], 3, 2, name="downsample2", **kw)(pan_out3, train)
        pan_out2 = stage(ch[9], nr[9], "Rep_n4")(jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = ConvBNReLU(ch[9], 3, 2, name="downsample1", **kw)(pan_out2, train)
        pan_out1 = stage(ch[10], nr[10], "Rep_n5")(jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = ConvBNReLU(ch[10], 3, 2, name="downsample0", **kw)(pan_out1, train)
        pan_out0 = stage(ch[11], nr[11], "Rep_n6")(jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class _BiFPANNeckP6(nn.Module):
    """BiFusion PAN over 5 backbone levels (reference: reppan.py:394-541 / 955-1116)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp: bool = False
    csp_e: float = 0.5
    stage_block_type: str = "BepC3"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage = _StageFactory(self.csp, self.block, self.csp_e, self.stage_block_type, self.deploy, self.dtype)
        x4, x3, x2, x1, x0 = inputs

        fpn_out0 = ConvBNReLU(ch[6], 1, 1, name="reduce_layer0", **kw)(x0, train)
        f0 = BiFusion(ch[6], name="Bifusion0", **kw)([fpn_out0, x1, x2], train)
        f_out0 = stage(ch[6], nr[6], "Rep_p5")(f0, train)

        fpn_out1 = ConvBNReLU(ch[7], 1, 1, name="reduce_layer1", **kw)(f_out0, train)
        f1 = BiFusion(ch[7], name="Bifusion1", **kw)([fpn_out1, x2, x3], train)
        f_out1 = stage(ch[7], nr[7], "Rep_p4")(f1, train)

        fpn_out2 = ConvBNReLU(ch[8], 1, 1, name="reduce_layer2", **kw)(f_out1, train)
        f2 = BiFusion(ch[8], name="Bifusion2", **kw)([fpn_out2, x3, x4], train)
        pan_out3 = stage(ch[8], nr[8], "Rep_p3")(f2, train)

        down2 = ConvBNReLU(ch[8], 3, 2, name="downsample2", **kw)(pan_out3, train)
        pan_out2 = stage(ch[9], nr[9], "Rep_n4")(jnp.concatenate([down2, fpn_out2], -1), train)

        down1 = ConvBNReLU(ch[9], 3, 2, name="downsample1", **kw)(pan_out2, train)
        pan_out1 = stage(ch[10], nr[10], "Rep_n5")(jnp.concatenate([down1, fpn_out1], -1), train)

        down0 = ConvBNReLU(ch[10], 3, 2, name="downsample0", **kw)(pan_out1, train)
        pan_out0 = stage(ch[11], nr[11], "Rep_n6")(jnp.concatenate([down0, fpn_out0], -1), train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]


class RepPANNeck(_PANNeckP5):
    pass


class CSPRepPANNeck(_PANNeckP5):
    csp: bool = True


class RepBiFPANNeck(_BiFPANNeckP5):
    pass


class CSPRepBiFPANNeck(_BiFPANNeckP5):
    csp: bool = True


class RepPANNeck6(_PANNeckP6):
    pass


class CSPRepPANNeck_P6(_PANNeckP6):
    csp: bool = True


class RepBiFPANNeck6(_BiFPANNeckP6):
    pass


class CSPRepBiFPANNeck_P6(_BiFPANNeckP6):
    csp: bool = True


for _cls in (
    RepPANNeck, CSPRepPANNeck, RepBiFPANNeck, CSPRepBiFPANNeck,
    RepPANNeck6, CSPRepPANNeck_P6, RepBiFPANNeck6, CSPRepBiFPANNeck_P6,
):
    NECKS.register(_cls.__name__)(_cls)


@NECKS.register()
class Lite_EffiNeck(nn.Module):
    """Mobile neck with nearest upsampling and a derived P6 level
    (reference: reppan.py:1118-1226)."""

    unified_channels: int
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        uc = self.unified_channels
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        x2, x1, x0 = inputs

        fpn_out0 = ConvBNHS(uc, 1, 1, 0, name="reduce_layer0", **kw)(x0, train)
        x1 = ConvBNHS(uc, 1, 1, 0, name="reduce_layer1", **kw)(x1, train)
        x2 = ConvBNHS(uc, 1, 1, 0, name="reduce_layer2", **kw)(x2, train)

        up0 = upsample_nearest2x(fpn_out0)
        f_out1 = CSPBlock(uc, 5, name="Csp_p4", **kw)(jnp.concatenate([up0, x1], -1), train)

        up1 = upsample_nearest2x(f_out1)
        pan_out3 = CSPBlock(uc, 5, name="Csp_p3", **kw)(jnp.concatenate([up1, x2], -1), train)

        down1 = DPBlock(uc, 5, 2, name="downsample2", **kw)(pan_out3, train)
        pan_out2 = CSPBlock(uc, 5, name="Csp_n3", **kw)(jnp.concatenate([down1, f_out1], -1), train)

        down0 = DPBlock(uc, 5, 2, name="downsample1", **kw)(pan_out2, train)
        pan_out1 = CSPBlock(uc, 5, name="Csp_n4", **kw)(jnp.concatenate([down0, fpn_out0], -1), train)

        top = DPBlock(uc, 5, 2, name="p6_conv_1", **kw)(fpn_out0, train)
        pan_out0 = top + DPBlock(uc, 5, 2, name="p6_conv_2", **kw)(pan_out1, train)

        return [pan_out3, pan_out2, pan_out1, pan_out0]
