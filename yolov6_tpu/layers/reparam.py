"""Structural re-parameterization as pure parameter transforms.

The reference folds its multi-branch rep blocks into single 3x3 convs by
mutating modules at runtime (``switch_to_deploy``, reference:
yolov6/layers/common.py:257-319, 348-393, 427-477; conv+BN fusion in
yolov6/utils/torch_utils.py:50-82). Here the same math is expressed as pure
numpy functions over parameter arrays, applied once at checkpoint load; the
deploy graph itself never changes.

All kernels are in HWIO layout (the Flax/XLA native conv layout); output
channels are the last axis. All folds run in float64-free float32, before any
bfloat16 cast, to preserve bit-level fidelity with the reference fold.
"""

from __future__ import annotations

import numpy as np


def fuse_conv_bn(kernel, bias, gamma, beta, mean, var, eps):
    """Fold BatchNorm into a preceding conv.

    y = gamma * (conv(x) + bias - mean) / sqrt(var+eps) + beta
    Matches reference utils/torch_utils.py:50-82 and common.py:278-300.
    """
    kernel = np.asarray(kernel, np.float32)
    std = np.sqrt(np.asarray(var, np.float32) + np.float32(eps))
    t = np.asarray(gamma, np.float32) / std
    b = np.zeros(kernel.shape[-1], np.float32) if bias is None else np.asarray(bias, np.float32)
    fused_kernel = kernel * t.reshape((1,) * (kernel.ndim - 1) + (-1,))
    fused_bias = np.asarray(beta, np.float32) + (b - np.asarray(mean, np.float32)) * t
    return fused_kernel, fused_bias


def fuse_extra_bn(kernel, bias, gamma, beta, mean, var, eps):
    """Fold a *post*-conv BatchNorm into an already-biased conv
    (reference: common.py:362-371, QARepVGG keeps BN after the branch sum)."""
    kernel = np.asarray(kernel, np.float32)
    std = np.sqrt(np.asarray(var, np.float32) + np.float32(eps))
    t = np.asarray(gamma, np.float32) / std
    shifted_mean = np.asarray(mean, np.float32) - np.asarray(bias, np.float32)
    fused_kernel = kernel * t.reshape((1,) * (kernel.ndim - 1) + (-1,))
    fused_bias = np.asarray(beta, np.float32) - shifted_mean * t
    return fused_kernel, fused_bias


def pad_1x1_to_3x3(kernel_1x1):
    """Zero-pad a (1,1,I,O) kernel to (3,3,I,O) center tap (reference: common.py:272-276)."""
    k = np.asarray(kernel_1x1, np.float32)
    out = np.zeros((3, 3) + k.shape[2:], np.float32)
    out[1, 1] = k[0, 0]
    return out


def identity_kernel_3x3(channels: int, groups: int = 1) -> np.ndarray:
    """(3,3,I/groups,O) kernel implementing the identity (reference: common.py:286-291)."""
    input_dim = channels // groups
    k = np.zeros((3, 3, input_dim, channels), np.float32)
    for i in range(channels):
        k[1, 1, i % input_dim, i] = 1.0
    return k


def avg_kernel_3x3(channels: int, groups: int = 1, kernel_size: int = 3) -> np.ndarray:
    """(k,k,I/groups,O) kernel implementing k x k average pooling
    (reference: common.py:263-270)."""
    input_dim = channels // groups
    k = np.zeros((kernel_size, kernel_size, input_dim, channels), np.float32)
    for i in range(channels):
        k[:, :, i % input_dim, i] = 1.0 / kernel_size**2
    return k


def repvgg_fold(
    dense_kernel, dense_bn, onexone_kernel, onexone_bn, identity_bn, channels, groups=1
):
    """RepVGGBlock fold (reference: common.py:257-261).

    dense_bn / onexone_bn / identity_bn are dicts {gamma, beta, mean, var, eps}
    (identity_bn may be None). Returns (kernel3x3_hwio, bias).
    """
    k3, b3 = fuse_conv_bn(dense_kernel, None, **dense_bn)
    k1, b1 = fuse_conv_bn(onexone_kernel, None, **onexone_bn)
    kernel = k3 + pad_1x1_to_3x3(k1)
    bias = b3 + b1
    if identity_bn is not None:
        kid, bid = fuse_conv_bn(identity_kernel_3x3(channels, groups), None, **identity_bn)
        kernel = kernel + kid
        bias = bias + bid
    return kernel, bias


def qarepvgg_fold(
    dense_kernel, dense_bn, onexone_kernel, post_bn, has_identity, channels, groups=1,
    has_avg=False,
):
    """QARepVGGBlock / QARepVGGBlockV2 fold (reference: common.py:348-360, 427-442
    plus the post-BN fold of :362-371). Returns (kernel3x3_hwio, bias)."""
    k3, b3 = fuse_conv_bn(dense_kernel, None, **dense_bn)
    kernel = k3 + pad_1x1_to_3x3(np.asarray(onexone_kernel, np.float32))
    bias = b3
    if has_avg:
        kernel = kernel + avg_kernel_3x3(channels, groups)
    if has_identity:
        kernel = kernel + identity_kernel_3x3(channels, groups)
    if post_bn is not None:
        kernel, bias = fuse_extra_bn(kernel, bias, **post_bn)
    return kernel, bias


def linearadd_fold(conv_kernel, scale_conv, onexone_kernel, scale_1x1, scale_identity, channels):
    """LinearAddBlock (CSLA) fold used by RepOpt re-initialization
    (reference: utils/RepOptimizer.py:117-134): 3x3*s_conv + pad(1x1*s_1x1) + id*s_id."""
    k = np.asarray(conv_kernel, np.float32) * np.asarray(scale_conv, np.float32)
    k = k + pad_1x1_to_3x3(np.asarray(onexone_kernel, np.float32) * np.asarray(scale_1x1, np.float32))
    if scale_identity is not None:
        k = k + identity_kernel_3x3(channels) * np.asarray(scale_identity, np.float32)
    return k
