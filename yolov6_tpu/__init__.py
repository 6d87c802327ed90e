"""YOLOv6-TPU: a TPU-native object-detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of meituan/YOLOv6
(reference layout documented in SURVEY.md). The compute path is pure JAX
(NHWC, bf16 on the MXU); structural re-parameterization is performed as a
pure parameter transform at checkpoint-load time instead of runtime module
surgery; all eval/serving ops (anchor decode, NMS) are fixed-shape and
jit-compiled end to end.
"""

__version__ = "0.1.0"
