"""Backbones (reference: yolov6/models/efficientrep.py).

All are NHWC Flax modules emitting the FPN pyramid as a tuple, lowest
resolution last, matching the reference output ordering.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.layers.common import (
    BepC3,
    ConvBNHS,
    ConvBNSiLU,
    CSPSPPF,
    Lite_EffiBlockS1,
    Lite_EffiBlockS2,
    MBLABlock,
    PackedRepVGGStem,
    RepBlock,
    RepVGGBlock,
    SimCSPSPPF,
    SimSPPF,
    SPPF,
)
from yolov6_tpu.utils.registry import BACKBONES


def _sppf_cls(block, cspsppf: bool):
    """Stage-5 channel-merge layer choice (reference: efficientrep.py:80-82)."""
    if cspsppf:
        return CSPSPPF if block is ConvBNSiLU else SimCSPSPPF
    return SPPF if block is ConvBNSiLU else SimSPPF


@BACKBONES.register()
class EfficientRep(nn.Module):
    """P5 rep-style backbone (reference: efficientrep.py:7-118)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    packed_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        outputs = []
        if self.packed_stem:
            x = PackedRepVGGStem(ch[0], dtype=self.dtype, name="stem")(x, train)
        else:
            x = self.block(ch[0], 3, 2, name="stem", **kw)(x, train)
        for i in (1, 2, 3, 4):
            x = self.block(ch[i], 3, 2, name=f"ERBlock_{i + 1}.0", **kw)(x, train)
            x = RepBlock(ch[i], n=nr[i], block=self.block, name=f"ERBlock_{i + 1}.1", **kw)(x, train)
            if i == 4:
                x = _sppf_cls(self.block, self.cspsppf)(
                    ch[4], kernel_size=5, name="ERBlock_5.2", **kw
                )(x, train)
            if i == 1 and self.fuse_P2:
                outputs.append(x)
            elif i >= 2:
                outputs.append(x)
        return tuple(outputs)


@BACKBONES.register()
class EfficientRep6(nn.Module):
    """P6 rep-style backbone (reference: efficientrep.py:121-247)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    fuse_P2: bool = False
    cspsppf: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        sppf = SimCSPSPPF if self.cspsppf else SimSPPF
        outputs = []
        x = self.block(ch[0], 3, 2, name="stem", **kw)(x, train)
        for i in (1, 2, 3, 4, 5):
            x = self.block(ch[i], 3, 2, name=f"ERBlock_{i + 1}.0", **kw)(x, train)
            x = RepBlock(ch[i], n=nr[i], block=self.block, name=f"ERBlock_{i + 1}.1", **kw)(x, train)
            if i == 5:
                x = sppf(ch[5], kernel_size=5, name="ERBlock_6.2", **kw)(x, train)
            if i == 1 and self.fuse_P2:
                outputs.append(x)
            elif i >= 2:
                outputs.append(x)
        return tuple(outputs)


@BACKBONES.register()
class CSPBepBackbone(nn.Module):
    """CSP backbone for M/L (reference: efficientrep.py:250-374)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    fuse_P2: bool = False
    cspsppf: bool = False
    stage_block_type: str = "BepC3"
    deploy: bool = False
    packed_stem: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage_block = {"BepC3": BepC3, "MBLABlock": MBLABlock}[self.stage_block_type]
        outputs = []
        if self.packed_stem:
            x = PackedRepVGGStem(ch[0], dtype=self.dtype, name="stem")(x, train)
        else:
            x = self.block(ch[0], 3, 2, name="stem", **kw)(x, train)
        for i in (1, 2, 3, 4):
            x = self.block(ch[i], 3, 2, name=f"ERBlock_{i + 1}.0", **kw)(x, train)
            x = stage_block(
                ch[i], n=nr[i], e=self.csp_e, block=self.block, name=f"ERBlock_{i + 1}.1", **kw
            )(x, train)
            if i == 4:
                x = _sppf_cls(self.block, self.cspsppf)(
                    ch[4], kernel_size=5, name="ERBlock_5.2", **kw
                )(x, train)
            if i == 1 and self.fuse_P2:
                outputs.append(x)
            elif i >= 2:
                outputs.append(x)
        return tuple(outputs)


@BACKBONES.register()
class CSPBepBackbone_P6(nn.Module):
    """CSP backbone with P6 stage (reference: efficientrep.py:377-516).
    Note: the reference's P6 CSP variant always emits 5 levels (incl. P2)."""

    channels_list: Sequence[int]
    num_repeats: Sequence[int]
    block: Any = RepVGGBlock
    csp_e: float = 0.5
    fuse_P2: bool = False
    cspsppf: bool = False
    stage_block_type: str = "BepC3"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        ch, nr = self.channels_list, self.num_repeats
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        stage_block = {"BepC3": BepC3, "MBLABlock": MBLABlock}[self.stage_block_type]
        outputs = []
        x = self.block(ch[0], 3, 2, name="stem", **kw)(x, train)
        for i in (1, 2, 3, 4, 5):
            x = self.block(ch[i], 3, 2, name=f"ERBlock_{i + 1}.0", **kw)(x, train)
            x = stage_block(
                ch[i], n=nr[i], e=self.csp_e, block=self.block, name=f"ERBlock_{i + 1}.1", **kw
            )(x, train)
            if i == 5:
                x = _sppf_cls(self.block, self.cspsppf)(
                    ch[5], kernel_size=5, name="ERBlock_6.2", **kw
                )(x, train)
            outputs.append(x)
        return tuple(outputs)


@BACKBONES.register()
class Lite_EffiBackbone(nn.Module):
    """Mobile ShuffleNet-style backbone (reference: efficientrep.py:518-582)."""

    in_channels: int
    mid_channels: Sequence[int]
    out_channels: Sequence[int]
    num_repeat: Sequence[int] = (1, 3, 7, 3)
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        out_ch = list(self.out_channels)
        out_ch[0] = 24  # reference hardcodes the stem width (efficientrep.py:526)
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        x = ConvBNHS(out_ch[0], 3, 2, 1, name="conv_0", **kw)(x, train)
        outputs = []
        for stage in range(4):
            for i in range(self.num_repeat[stage]):
                if i == 0:
                    x = Lite_EffiBlockS2(
                        self.mid_channels[stage + 1], out_ch[stage + 1], 2,
                        name=f"lite_effiblock_{stage + 1}.{i}", **kw,
                    )(x, train)
                else:
                    x = Lite_EffiBlockS1(
                        self.mid_channels[stage + 1], out_ch[stage + 1], 1,
                        name=f"lite_effiblock_{stage + 1}.{i}", **kw,
                    )(x, train)
            if stage >= 1:
                outputs.append(x)
        return tuple(outputs)
