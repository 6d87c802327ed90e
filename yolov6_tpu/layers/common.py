"""Primitive blocks of the YOLOv6-TPU model zoo, as Flax modules.

TPU-first re-design of the reference block set (reference:
yolov6/layers/common.py). Key differences from the PyTorch original:

* **NHWC layout** throughout — the native TPU convolution layout.
* **No runtime module surgery.** The reference mutates modules in place
  (``switch_to_deploy``, reference common.py:302-319). Here every block has a
  static ``deploy`` flag: deploy graphs contain only single fused convolutions
  (+ activation), and the 3-branch -> 1-conv re-parameterization happens as a
  pure parameter transform at checkpoint load (see layers/reparam.py).
* **ConvTranspose upsampling as matmul + depth-to-space** — maps onto the MXU
  instead of a grad-of-conv lowering.

Module/parameter names intentionally mirror the reference attribute paths
(``rbr_dense``, ``ERBlock_2`` …) so imported torch checkpoints map 1:1.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from yolov6_tpu.utils.registry import BLOCKS

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == variance_scaling(1/3, fan_in, uniform)
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class QConv(nn.Conv):
    """nn.Conv with optional INT8 input fake-quantization (quant/fake_quant.py).

    With quantization disabled (default) this is byte-identical to nn.Conv —
    same parameter names/paths, no extra collections. Under calibration it
    records running max|input| into a 'quant' collection; with quant enabled
    it fake-quantizes its input with the calibrated amax (the TPU-native
    analog of the reference's pytorch-quantization QuantConv swap,
    reference tools/qat/qat_utils.py:62-130).
    """

    @nn.compact
    def __call__(self, x):
        from yolov6_tpu.quant.fake_quant import fake_quant, quant_state

        if quant_state.enabled:
            skip = any(p in self.path_str for p in quant_state.skip_patterns)
            if not skip:
                amax = self.variable("quant", "amax", lambda: jnp.zeros((), jnp.float32))
                if quant_state.calibrating:
                    if not self.is_initializing():
                        amax.value = jnp.maximum(
                            amax.value, jnp.max(jnp.abs(x)).astype(jnp.float32)
                        )
                else:
                    x = fake_quant(x, amax.value, quant_state.num_bits)
        return super().__call__(x)

    @property
    def path_str(self) -> str:
        try:
            return "/".join(str(p) for p in self.scope.path)
        except Exception:
            return self.name or ""

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
    "hardswish": jax.nn.hard_swish,
}


def apply_act(x: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act is None:
        return x
    return ACTIVATIONS[act](x)


def _pad(p: int):
    return [(p, p), (p, p)]


class Conv2d(nn.Module):
    """Plain conv wrapper with torch-compatible padding semantics (NHWC)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: Optional[int] = None
    groups: int = 1
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel_size // 2 if self.padding is None else self.padding
        return QConv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad(p),
            feature_group_count=self.groups,
            use_bias=self.use_bias,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch's exact training semantics.

    torch.nn.BatchNorm2d normalizes with the BIASED batch variance but
    updates running_var with the UNBIASED one (Bessel N/(N-1)); flax's
    nn.BatchNorm updates with the biased variance, which skews running
    stats at small spatial sizes (caught by the 3-step integration golden,
    tests/test_train_loop_golden.py). Parameter/collection names match
    flax nn.BatchNorm, so checkpoints and the .pt importer are unchanged.
    Statistics kept in fp32."""

    use_running_average: bool = True
    momentum: float = 0.97
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        xf = x.astype(jnp.float32)
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axes)
            var = jnp.mean(jnp.square(xf), axes) - jnp.square(mean)
            if not self.is_initializing():
                n = 1
                for i in axes:
                    n *= x.shape[i]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * unbiased
        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(jnp.float32)


class BatchNorm(nn.Module):
    """BatchNorm with the reference's eps/momentum (reference: utils/torch_utils.py:38-47
    sets eps=1e-3, momentum=0.03 for every BN). Statistics kept in fp32."""

    momentum: float = 0.97
    epsilon: float = 1e-3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return TorchBatchNorm(
            use_running_average=not train,
            momentum=self.momentum,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            name="bn",
        )(x).astype(self.dtype)


@BLOCKS.register()
class ConvModule(nn.Module):
    """Conv + BN + activation (reference: common.py:26-54).

    deploy=True folds BN into the conv (bias on) — equals the reference's
    ``forward_fuse`` after ``fuse_conv_and_bn`` (reference: utils/torch_utils.py:50-82).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    act: Optional[str] = "relu"
    padding: Optional[int] = None
    groups: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.kernel_size // 2 if self.padding is None else self.padding
        x = QConv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad(p),
            feature_group_count=self.groups,
            use_bias=self.deploy,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.deploy:
            x = TorchBatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="bn",
            )(x).astype(self.dtype)
        return apply_act(x, self.act)


def _conv_bn_act(act):
    """Factory for the ConvBN{ReLU,SiLU,HS} wrappers; the inner module is named
    'block' to mirror the reference wrappers (reference: common.py:57-94)."""

    class _Wrapper(nn.Module):
        out_channels: int
        kernel_size: int = 3
        stride: int = 1
        padding: Optional[int] = None
        groups: int = 1
        deploy: bool = False
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, x, train: bool = False):
            return ConvModule(
                self.out_channels,
                self.kernel_size,
                self.stride,
                act,
                self.padding,
                self.groups,
                self.deploy,
                self.dtype,
                name="block",
            )(x, train)

    return _Wrapper


ConvBNReLU = BLOCKS.register("ConvBNReLU")(_conv_bn_act("relu"))
ConvBNReLU.__name__ = "ConvBNReLU"
ConvBNSiLU = BLOCKS.register("ConvBNSiLU")(_conv_bn_act("silu"))
ConvBNSiLU.__name__ = "ConvBNSiLU"
ConvBNHS = BLOCKS.register("ConvBNHS")(_conv_bn_act("hardswish"))
ConvBNHS.__name__ = "ConvBNHS"
ConvBN = BLOCKS.register("ConvBN")(_conv_bn_act(None))
ConvBN.__name__ = "ConvBN"


def max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k x k stride-1 same-padded max pool."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1), padding=_pad(p))


class SPPFModule(nn.Module):
    """Serial 5x5 max-pool pyramid (reference: common.py:97-113)."""

    out_channels: int
    kernel_size: int = 5
    block: Any = ConvBNReLU
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = x.shape[-1] // 2
        x = self.block(c_, 1, 1, deploy=self.deploy, dtype=self.dtype, name="cv1")(x, train)
        y1 = max_pool_same(x, self.kernel_size)
        y2 = max_pool_same(y1, self.kernel_size)
        y3 = max_pool_same(y2, self.kernel_size)
        out = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return self.block(self.out_channels, 1, 1, deploy=self.deploy, dtype=self.dtype, name="cv2")(out, train)


@BLOCKS.register()
class SimSPPF(nn.Module):
    """SPPF with ReLU (reference: common.py:115-122)."""

    out_channels: int
    kernel_size: int = 5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SPPFModule(self.out_channels, self.kernel_size, ConvBNReLU, self.deploy, self.dtype, name="sppf")(x, train)


@BLOCKS.register()
class SPPF(nn.Module):
    """SPPF with SiLU (reference: common.py:125-132)."""

    out_channels: int
    kernel_size: int = 5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return SPPFModule(self.out_channels, self.kernel_size, ConvBNSiLU, self.deploy, self.dtype, name="sppf")(x, train)


class CSPSPPFModule(nn.Module):
    """CSP-wrapped SPPF (reference: common.py:135-158)."""

    out_channels: int
    kernel_size: int = 5
    e: float = 0.5
    block: Any = ConvBNReLU
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        x1 = self.block(c_, 1, 1, name="cv1", **kw)(x, train)
        y0 = self.block(c_, 1, 1, name="cv2", **kw)(x, train)
        x1 = self.block(c_, 3, 1, name="cv3", **kw)(x1, train)
        x1 = self.block(c_, 1, 1, name="cv4", **kw)(x1, train)
        y1 = max_pool_same(x1, self.kernel_size)
        y2 = max_pool_same(y1, self.kernel_size)
        y3 = max_pool_same(y2, self.kernel_size)
        cat = jnp.concatenate([x1, y1, y2, y3], axis=-1)
        y3 = self.block(c_, 1, 1, name="cv5", **kw)(cat, train)
        y3 = self.block(c_, 3, 1, name="cv6", **kw)(y3, train)
        return self.block(self.out_channels, 1, 1, name="cv7", **kw)(
            jnp.concatenate([y0, y3], axis=-1), train
        )


@BLOCKS.register()
class SimCSPSPPF(nn.Module):
    """CSPSPPF with ReLU (reference: common.py:161-168)."""

    out_channels: int
    kernel_size: int = 5
    e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return CSPSPPFModule(self.out_channels, self.kernel_size, self.e, ConvBNReLU, self.deploy, self.dtype, name="cspsppf")(x, train)


@BLOCKS.register()
class CSPSPPF(nn.Module):
    """CSPSPPF with SiLU (reference: common.py:171-178)."""

    out_channels: int
    kernel_size: int = 5
    e: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        return CSPSPPFModule(self.out_channels, self.kernel_size, self.e, ConvBNSiLU, self.deploy, self.dtype, name="cspsppf")(x, train)


@BLOCKS.register()
class Transpose(nn.Module):
    """2x upsampling, parameter-compatible with a 2x2/stride-2 ConvTranspose
    (reference: common.py:181-194) but computed as a 1x1-matmul followed by
    depth-to-space — the MXU-native formulation (no grad-of-conv lowering).

    kernel layout: (kh, kw, in, out); y[2i+p, 2j+q, o] = sum_c x[i,j,c] K[p,q,c,o] + b[o].
    """

    out_channels: int
    kernel_size: int = 2
    stride: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size == 2 and self.stride == 2
        cin = x.shape[-1]
        kernel = self.param(
            "kernel", conv_kernel_init, (2, 2, cin, self.out_channels), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        b, h, w, _ = x.shape
        # (b,h,w,c) x (c,2,2,o) contraction over c -> depth-to-space
        y = jnp.einsum(
            "bhwc,cpqo->bhpwqo",
            x,
            kernel.astype(self.dtype).transpose(2, 0, 1, 3),
            preferred_element_type=self.dtype,
        )
        y = y.reshape(b, 2 * h, 2 * w, self.out_channels)
        return y + bias.astype(self.dtype)


@BLOCKS.register()
class RepVGGBlock(nn.Module):
    """Structural re-parameterization block (reference: common.py:197-319).

    train graph: 3x3 conv+BN  ||  1x1 conv+BN  ||  identity BN  -> sum -> ReLU
    deploy graph: single 3x3 conv + bias -> ReLU (fold math in layers/reparam.py).
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deploy: bool = False
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size == 3 and self.padding == 1
        if self.deploy:
            y = QConv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=_pad(1),
                feature_group_count=self.groups,
                use_bias=True,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="rbr_reparam",
            )(x)
            return apply_act(y, self.act)
        in_channels = x.shape[-1]
        y = ConvModule(
            self.out_channels, 3, self.stride, None, 1, self.groups, False, self.dtype, name="rbr_dense"
        )(x, train)
        y = y + ConvModule(
            self.out_channels, 1, self.stride, None, 0, self.groups, False, self.dtype, name="rbr_1x1"
        )(x, train)
        if self.out_channels == in_channels and self.stride == 1:
            y = y + TorchBatchNorm(
                use_running_average=not train,
                momentum=0.97,
                epsilon=1e-3,
                dtype=jnp.float32,
                name="rbr_identity",
            )(x).astype(self.dtype)
        return apply_act(y, self.act)


class PackedRepVGGStem(nn.Module):
    """Deploy stem over pre-packed space-to-depth input (ops/s2d_stem.py).

    The 3-channel stride-2 3x3 stem runs the MXU at ~1% occupancy; with the
    host pipeline delivering 2x2-packed [H/2, W/2, 12] input, the identical
    math becomes a stride-1 2x2 conv over 12 channels. Parameters are
    declared under the SAME path as the regular deploy stem
    (``stem/rbr_reparam/{kernel,bias}``, shape [3,3,3,O]) so checkpoints are
    layout-independent; the packed 2x2 kernel is derived in-graph.
    """

    out_channels: int
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from yolov6_tpu.ops.s2d_stem import convert_stem_kernel_jnp

        in_ch = x.shape[-1] // 4

        class _Params(nn.Module):
            out_channels: int

            @nn.compact
            def __call__(self_inner):
                k = self_inner.param(
                    "kernel", conv_kernel_init, (3, 3, in_ch, self_inner.out_channels)
                )
                b = self_inner.param(
                    "bias", nn.initializers.zeros, (self_inner.out_channels,)
                )
                return k, b

        kernel, bias = _Params(self.out_channels, name="rbr_reparam")()
        k2 = convert_stem_kernel_jnp(kernel).astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), k2, (1, 1), [(1, 0), (1, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y + bias.astype(self.dtype)
        return apply_act(y, self.act)


@BLOCKS.register()
class QARepVGGBlock(nn.Module):
    """Quantization-aware RepVGG variant (reference: common.py:322-393):
    1x1 branch has no BN, identity branch is a pure skip, and a shared BN sits
    after the branch sum. Deploy folds everything incl. the post-BN into one conv.
    """

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deploy: bool = False
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size == 3 and self.padding == 1
        if self.deploy:
            y = QConv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=_pad(1),
                feature_group_count=self.groups,
                use_bias=True,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="rbr_reparam",
            )(x)
            return apply_act(y, self.act)
        in_channels = x.shape[-1]
        y = ConvModule(
            self.out_channels, 3, self.stride, None, 1, self.groups, False, self.dtype, name="rbr_dense"
        )(x, train)
        y = y + QConv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            padding=_pad(0),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="rbr_1x1",
        )(x)
        if self.out_channels == in_channels and self.stride == 1:
            y = y + x
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(y).astype(self.dtype)
        return apply_act(y, self.act)


@BLOCKS.register()
class QARepVGGBlockV2(nn.Module):
    """QARepVGG V2: adds a 3x3 average-pool branch (reference: common.py:396-477)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    groups: int = 1
    deploy: bool = False
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert self.kernel_size == 3 and self.padding == 1
        if self.deploy:
            y = QConv(
                self.out_channels,
                (3, 3),
                strides=(self.stride, self.stride),
                padding=_pad(1),
                feature_group_count=self.groups,
                use_bias=True,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="rbr_reparam",
            )(x)
            return apply_act(y, self.act)
        in_channels = x.shape[-1]
        y = ConvModule(
            self.out_channels, 3, self.stride, None, 1, self.groups, False, self.dtype, name="rbr_dense"
        )(x, train)
        y = y + QConv(
            self.out_channels,
            (1, 1),
            strides=(self.stride, self.stride),
            padding=_pad(0),
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="rbr_1x1",
        )(x)
        if self.out_channels == in_channels and self.stride == 1:
            # identity + 3x3/stride-1 same-padded avg pool branches
            y = y + x
            y = y + nn.avg_pool(x, (3, 3), strides=(1, 1), padding=_pad(1), count_include_pad=True)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(y).astype(self.dtype)
        return apply_act(y, self.act)


@BLOCKS.register()
class RealVGGBlock(nn.Module):
    """Plain conv+BN+ReLU used by RepOpt training (reference: common.py:480-497)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    deploy: bool = False
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = QConv(
            self.out_channels,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=_pad(self.padding),
            use_bias=self.deploy,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        if not self.deploy:
            y = TorchBatchNorm(
                use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
            )(y).astype(self.dtype)
        return apply_act(y, self.act)


class ScaleLayer(nn.Module):
    """Per-channel scale (+optional bias) (reference: common.py:500-517)."""

    num_features: int
    use_bias: bool = True
    scale_init: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        weight = self.param(
            "weight", nn.initializers.constant(self.scale_init), (self.num_features,), jnp.float32
        )
        y = x * weight.astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.num_features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


@BLOCKS.register()
class LinearAddBlock(nn.Module):
    """CSLA hyper-search block for RepOpt (reference: common.py:521-548).
    ``is_csla`` freezes the scales (handled by the optimizer mask, not here)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    is_csla: bool = False
    conv_scale_init: float = 1.0
    deploy: bool = False  # LinearAddBlock is train-time only; flag kept for API parity
    act: Optional[str] = "relu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        y = QConv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride), padding=_pad(1),
            use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="conv",
        )(x)
        y = ScaleLayer(self.out_channels, False, self.conv_scale_init, self.dtype, name="scale_conv")(y)
        y1 = QConv(
            self.out_channels, (1, 1), strides=(self.stride, self.stride), padding=_pad(0),
            use_bias=False, kernel_init=conv_kernel_init, dtype=self.dtype, name="conv_1x1",
        )(x)
        y = y + ScaleLayer(self.out_channels, False, self.conv_scale_init, self.dtype, name="scale_1x1")(y1)
        if in_channels == self.out_channels and self.stride == 1:
            y = y + ScaleLayer(self.out_channels, False, 1.0, self.dtype, name="scale_identity")(x)
        y = TorchBatchNorm(
            use_running_average=not train, momentum=0.97, epsilon=1e-3, dtype=jnp.float32, name="bn"
        )(y).astype(self.dtype)
        return apply_act(y, self.act)


@BLOCKS.register()
class BottleRep(nn.Module):
    """Residual pair of rep blocks with learnable alpha (reference: common.py:590-608)."""

    out_channels: int
    basic_block: Any = RepVGGBlock
    weight: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        y = self.basic_block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv1")(x, train)
        y = self.basic_block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv2")(y, train)
        if in_channels == self.out_channels:
            if self.weight:
                alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
                return y + alpha.astype(self.dtype) * x
            return y + x
        return y


@BLOCKS.register()
class BottleRep3(nn.Module):
    """Residual triple of rep blocks (reference: common.py:611-631)."""

    out_channels: int
    basic_block: Any = RepVGGBlock
    weight: bool = False
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_channels = x.shape[-1]
        y = self.basic_block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv1")(x, train)
        y = self.basic_block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv2")(y, train)
        y = self.basic_block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv3")(y, train)
        if in_channels == self.out_channels:
            if self.weight:
                alpha = self.param("alpha", nn.initializers.ones, (1,), jnp.float32)
                return y + alpha.astype(self.dtype) * x
            return y + x
        return y


@BLOCKS.register()
class RepBlock(nn.Module):
    """Stage block: N sequential rep blocks (reference: common.py:569-587).
    When ``block`` is BottleRep the count is halved and blocks get residual alpha."""

    out_channels: int
    n: int = 1
    block: Any = RepVGGBlock
    basic_block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.block is BottleRep:
            x = BottleRep(
                self.out_channels, basic_block=self.basic_block, weight=True,
                deploy=self.deploy, dtype=self.dtype, name="conv1",
            )(x, train)
            n = self.n // 2
            for i in range(n - 1):
                x = BottleRep(
                    self.out_channels, basic_block=self.basic_block, weight=True,
                    deploy=self.deploy, dtype=self.dtype, name=f"block.{i}",
                )(x, train)
        else:
            x = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name="conv1")(x, train)
            for i in range(self.n - 1):
                x = self.block(self.out_channels, deploy=self.deploy, dtype=self.dtype, name=f"block.{i}")(x, train)
        return x


@BLOCKS.register()
class BepC3(nn.Module):
    """CSPStackRep block (reference: common.py:634-650)."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.out_channels * self.e)
        wrapper = ConvBNSiLU if self.block is ConvBNSiLU else ConvBNReLU
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        y1 = wrapper(c_, 1, 1, name="cv1", **kw)(x, train)
        y1 = RepBlock(
            c_, n=self.n, block=BottleRep, basic_block=self.block, name="m", **kw
        )(y1, train)
        y2 = wrapper(c_, 1, 1, name="cv2", **kw)(x, train)
        return wrapper(self.out_channels, 1, 1, name="cv3", **kw)(
            jnp.concatenate([y1, y2], axis=-1), train
        )


@BLOCKS.register()
class MBLABlock(nn.Module):
    """Multi-Branch Layer Aggregation block (reference: common.py:653-692)."""

    out_channels: int
    n: int = 1
    e: float = 0.5
    block: Any = RepVGGBlock
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = max(self.n // 2, 1)
        if n == 1:
            n_list = [0, 1]
        else:
            extra_branch_steps = 1
            while extra_branch_steps * 2 < n:
                extra_branch_steps *= 2
            n_list = [0, extra_branch_steps, n]
        branch_num = len(n_list)
        c_ = int(self.out_channels * self.e)
        act = "silu" if self.block is ConvBNSiLU else "relu"
        y = ConvModule(
            branch_num * c_, 1, 1, act, deploy=self.deploy, dtype=self.dtype, name="cv1"
        )(x, train)
        ys = list(jnp.split(y, branch_num, axis=-1))
        all_y = [ys[0]]
        for m_idx, n_steps in enumerate(n_list[1:]):
            all_y.append(ys[m_idx + 1])
            for j in range(n_steps):
                all_y.append(
                    BottleRep3(
                        c_, basic_block=self.block, weight=True,
                        deploy=self.deploy, dtype=self.dtype, name=f"m.{m_idx}.{j}",
                    )(all_y[-1], train)
                )
        return ConvModule(
            self.out_channels, 1, 1, act, deploy=self.deploy, dtype=self.dtype, name="cv2"
        )(jnp.concatenate(all_y, axis=-1), train)


@BLOCKS.register()
class BiFusion(nn.Module):
    """3-input bi-directional fusion for the BiFPAN necks (reference: common.py:695-718).
    x = [current(top), lateral, lower]; upsample current, 1x1 the lateral,
    downsample the lower, concat, 1x1."""

    out_channels: int
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: Sequence[jnp.ndarray], train: bool = False):
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        x0 = Transpose(self.out_channels, dtype=self.dtype, name="upsample")(x[0], train)
        x1 = ConvBNReLU(self.out_channels, 1, 1, name="cv1", **kw)(x[1], train)
        x2 = ConvBNReLU(self.out_channels, 1, 1, name="cv2", **kw)(x[2], train)
        x2 = ConvBNReLU(self.out_channels, 3, 2, name="downsample", **kw)(x2, train)
        return ConvBNReLU(self.out_channels, 1, 1, name="cv3", **kw)(
            jnp.concatenate([x0, x1, x2], axis=-1), train
        )


@BLOCKS.register()
class SEBlock(nn.Module):
    """Squeeze-and-excite with hard-sigmoid gate (reference: common.py:740-768)."""

    channel: int
    reduction: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        w = jnp.mean(x, axis=(1, 2), keepdims=True)
        w = QConv(self.channel // self.reduction, (1, 1), use_bias=True,
                    kernel_init=conv_kernel_init, dtype=self.dtype, name="conv1")(w)
        w = jax.nn.relu(w)
        w = QConv(self.channel, (1, 1), use_bias=True,
                    kernel_init=conv_kernel_init, dtype=self.dtype, name="conv2")(w)
        return x * jax.nn.hard_sigmoid(w)


def channel_shuffle(x: jnp.ndarray, groups: int) -> jnp.ndarray:
    """ShuffleNet channel shuffle, NHWC (reference: common.py:771-780)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h, w, groups, c // groups)
    x = jnp.swapaxes(x, 3, 4)
    return x.reshape(b, h, w, c)


@BLOCKS.register()
class Lite_EffiBlockS1(nn.Module):
    """Stride-1 shuffle block (reference: common.py:783-823)."""

    mid_channels: int
    out_channels: int
    stride: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        c = x.shape[-1]
        x1, x2 = jnp.split(x, 2, axis=-1)
        y = ConvBNHS(self.mid_channels, 1, 1, 0, name="conv_pw_1", **kw)(x2, train)
        y = ConvBN(self.mid_channels, 3, self.stride, 1, groups=self.mid_channels, name="conv_dw_1", **kw)(y, train)
        y = SEBlock(self.mid_channels, dtype=self.dtype, name="se")(y, train)
        y = ConvBNHS(self.out_channels // 2, 1, 1, 0, name="conv_1", **kw)(y, train)
        out = jnp.concatenate([x1, y], axis=-1)
        return channel_shuffle(out, 2)


@BLOCKS.register()
class Lite_EffiBlockS2(nn.Module):
    """Stride-2 dual-branch block (reference: common.py:826-897)."""

    mid_channels: int
    out_channels: int
    stride: int = 2
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        cin = x.shape[-1]
        x1 = ConvBN(cin, 3, self.stride, 1, groups=cin, name="conv_dw_1", **kw)(x, train)
        x1 = ConvBNHS(self.out_channels // 2, 1, 1, 0, name="conv_1", **kw)(x1, train)
        x2 = ConvBNHS(self.mid_channels // 2, 1, 1, 0, name="conv_pw_2", **kw)(x, train)
        x2 = ConvBN(self.mid_channels // 2, 3, self.stride, 1, groups=self.mid_channels // 2, name="conv_dw_2", **kw)(x2, train)
        x2 = SEBlock(self.mid_channels // 2, dtype=self.dtype, name="se")(x2, train)
        x2 = ConvBNHS(self.out_channels // 2, 1, 1, 0, name="conv_2", **kw)(x2, train)
        out = jnp.concatenate([x1, x2], axis=-1)
        out = ConvBNHS(self.out_channels, 3, 1, 1, groups=self.out_channels, name="conv_dw_3", **kw)(out, train)
        return ConvBNHS(self.out_channels, 1, 1, 0, name="conv_pw_3", **kw)(out, train)


@BLOCKS.register()
class DPBlock(nn.Module):
    """Depthwise-separable conv block with hardswish (reference: common.py:900-934)."""

    out_channels: int
    kernel_size: int = 3
    stride: int = 1
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = (self.kernel_size - 1) // 2
        x = QConv(
            self.out_channels, (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride), padding=_pad(p),
            feature_group_count=self.out_channels, use_bias=True,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="conv_dw_1",
        )(x)
        if not self.deploy:
            x = TorchBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=jnp.float32, name="bn_1")(x).astype(self.dtype)
        x = jax.nn.hard_swish(x)
        x = QConv(
            self.out_channels, (1, 1), use_bias=True,
            kernel_init=conv_kernel_init, dtype=self.dtype, name="conv_pw_1",
        )(x)
        if not self.deploy:
            x = TorchBatchNorm(use_running_average=not train, momentum=0.97, epsilon=1e-3,
                             dtype=jnp.float32, name="bn_2")(x).astype(self.dtype)
        return jax.nn.hard_swish(x)


@BLOCKS.register()
class DarknetBlock(nn.Module):
    """1x1 reduce + depthwise-sep conv (reference: common.py:937-961)."""

    out_channels: int
    kernel_size: int = 3
    expansion: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = int(self.out_channels * self.expansion)
        x = ConvBNHS(hidden, 1, 1, 0, deploy=self.deploy, dtype=self.dtype, name="conv_1")(x, train)
        return DPBlock(self.out_channels, self.kernel_size, 1, self.deploy, self.dtype, name="conv_2")(x, train)


@BLOCKS.register()
class CSPBlock(nn.Module):
    """Lite CSP block (reference: common.py:964-986)."""

    out_channels: int
    kernel_size: int = 3
    expand_ratio: float = 0.5
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        mid = int(self.out_channels * self.expand_ratio)
        kw = dict(deploy=self.deploy, dtype=self.dtype)
        x1 = ConvBNHS(mid, 1, 1, 0, name="conv_1", **kw)(x, train)
        x1 = DarknetBlock(mid, self.kernel_size, 1.0, self.deploy, self.dtype, name="blocks")(x1, train)
        x2 = ConvBNHS(mid, 1, 1, 0, name="conv_2", **kw)(x, train)
        return ConvBNHS(self.out_channels, 1, 1, 0, name="conv_3", **kw)(
            jnp.concatenate([x1, x2], axis=-1), train
        )


def get_block(mode: str):
    """training_mode string -> block class (reference: common.py:721-737)."""
    table = {
        "repvgg": RepVGGBlock,
        "qarepvgg": QARepVGGBlock,
        "qarepvggv2": QARepVGGBlockV2,
        "hyper_search": LinearAddBlock,
        "repopt": RealVGGBlock,
        "conv_relu": ConvBNReLU,
        "conv_silu": ConvBNSiLU,
    }
    if mode not in table:
        raise NotImplementedError(f"Undefined rep-block choice for mode {mode}")
    return table[mode]
