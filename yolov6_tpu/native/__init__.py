"""ctypes bindings for the native host library (letterbox, NMS, normalize).

The library builds on first use (``make -C yolov6_tpu/native``); every entry
point has a pure-Python fallback, so the framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = osp.dirname(osp.abspath(__file__))
_LIB_PATH = osp.join(_DIR, "libyolov6_native.so")
_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.yolov6_letterbox.restype = ctypes.c_float
    lib.yolov6_letterbox.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint8,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.yolov6_nms.restype = ctypes.c_int
    lib.yolov6_nms.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p,
    ]
    lib.yolov6_normalize_rgb.restype = None
    lib.yolov6_normalize_rgb.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.yolov6_decode_jpeg_file.restype = ctypes.c_int
    lib.yolov6_decode_jpeg_file.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_long,
    ]
    lib.yolov6_batch_decode_letterbox.restype = ctypes.c_int
    lib.yolov6_batch_decode_letterbox.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_uint8,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
    ]
    lib.yolov6_decode_jpeg_resize.restype = ctypes.c_int
    lib.yolov6_decode_jpeg_resize.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p,
    ]
    lib.yolov6_train_aug.restype = None
    lib.yolov6_train_aug.argtypes = [
        ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint8,
    ]
    lib.yolov6_blend.restype = None
    lib.yolov6_blend.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_long, ctypes.c_double,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def letterbox_native(
    im: np.ndarray, new_shape: Tuple[int, int], scaleup: bool = True, pad_value: int = 114
):
    """Native letterbox; same geometry as data_augment.letterbox(auto=False).
    Returns (image, ratio, (pad_left, pad_top))."""
    lib = _load()
    if lib is None:
        from yolov6_tpu.data.data_augment import letterbox

        return letterbox(im, new_shape, auto=False, scaleup=scaleup)
    im = np.ascontiguousarray(im, np.uint8)
    out = np.empty((new_shape[0], new_shape[1], 3), np.uint8)
    px, py = ctypes.c_int(0), ctypes.c_int(0)
    r = lib.yolov6_letterbox(
        im.ctypes.data, im.shape[0], im.shape[1],
        out.ctypes.data, new_shape[0], new_shape[1],
        int(scaleup), pad_value, ctypes.byref(px), ctypes.byref(py),
    )
    return out, float(r), (px.value, py.value)


def nms_native(
    dets: np.ndarray, iou_thres: float = 0.45, class_agnostic: bool = False, max_det: int = 300
) -> np.ndarray:
    """Greedy NMS over [n, 6] (xyxy, score, cls); returns kept row indices."""
    lib = _load()
    dets = np.ascontiguousarray(dets, np.float32)
    n = dets.shape[0]
    if lib is None or n == 0:
        order = np.argsort(-dets[:, 4], kind="stable")
        keep = []
        suppressed = np.zeros(n, bool)
        for i in order:
            if suppressed[i] or len(keep) >= max_det:
                continue
            keep.append(i)
            same = np.ones(n, bool) if class_agnostic else dets[:, 5] == dets[i, 5]
            lt = np.maximum(dets[i, :2], dets[:, :2])
            rb = np.minimum(dets[i, 2:4], dets[:, 2:4])
            inter = np.prod(np.clip(rb - lt, 0, None), -1)
            a = np.prod(np.clip(dets[i, 2:4] - dets[i, :2], 0, None))
            b = np.prod(np.clip(dets[:, 2:4] - dets[:, :2], 0, None), -1)
            iou = inter / (a + b - inter + 1e-12)
            suppressed |= (iou > iou_thres) & same
        return np.asarray(keep, np.int64)
    keep = np.empty(min(n, max_det), np.int32)
    kept = lib.yolov6_nms(dets.ctypes.data, n, iou_thres, int(class_agnostic), max_det, keep.ctypes.data)
    return keep[:kept].astype(np.int64)


def normalize_rgb_native(im_bgr_u8: np.ndarray) -> np.ndarray:
    """uint8 HWC BGR -> float32 HWC RGB /255."""
    lib = _load()
    im = np.ascontiguousarray(im_bgr_u8, np.uint8)
    if lib is None:
        return im[..., ::-1].astype(np.float32) / 255.0
    out = np.empty(im.shape, np.float32)
    lib.yolov6_normalize_rgb(im.ctypes.data, out.ctypes.data, im.shape[0] * im.shape[1])
    return out


def decode_jpeg_native(path: str, max_pixels: int = 0) -> Optional[np.ndarray]:
    """Decode a JPEG to RGB u8 via libjpeg (with DCT downscale when the
    image exceeds max_pixels). None on failure or when the lib is missing."""
    lib = _load()
    if lib is None:
        return None
    cap = 64 * 1024 * 1024 * 3
    buf = np.empty(cap, np.uint8)
    h, w = ctypes.c_int(0), ctypes.c_int(0)
    rc = lib.yolov6_decode_jpeg_file(
        path.encode(), buf.ctypes.data, cap, ctypes.byref(h), ctypes.byref(w),
        max_pixels,
    )
    if rc != 0:
        return None
    return buf[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def batch_decode_letterbox_native(
    paths,
    new_shape: Tuple[int, int],
    scaleup: bool = False,
    pad_value: int = 114,
    n_threads: int = 8,
):
    """Decode + letterbox a batch of JPEGs in parallel native threads
    (GIL-free). Returns (batch [n,H,W,3] RGB u8, ratios [n], pads [n,2],
    src_hw [n,2], n_failed) or None if the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, new_shape[0], new_shape[1], 3), np.uint8)
    ratios = np.empty(n, np.float32)
    pads = np.empty((n, 2), np.int32)
    src_hw = np.empty((n, 2), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failed = lib.yolov6_batch_decode_letterbox(
        arr, n, out.ctypes.data, new_shape[0], new_shape[1],
        int(scaleup), pad_value,
        ratios.ctypes.data, pads.ctypes.data, src_hw.ctypes.data, n_threads,
    )
    return out, ratios, pads, src_hw, failed


def decode_jpeg_resize_native(
    path: str, denom: int, dst_h: int, dst_w: int
) -> Optional[np.ndarray]:
    """Decode a JPEG at DCT scale 1/denom and bilinear-resize to
    (dst_h, dst_w). RGB u8 or None on failure/missing lib."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((dst_h, dst_w, 3), np.uint8)
    rc = lib.yolov6_decode_jpeg_resize(
        path.encode(), int(denom), dst_h, dst_w, out.ctypes.data
    )
    return out if rc == 0 else None


def train_aug_native(
    srcs,
    place: np.ndarray,
    minv: np.ndarray,
    out_shape: Tuple[int, int],
    hsv_gains=None,
    flip_lr: bool = False,
    flip_ud: bool = False,
    pad_value: int = 114,
) -> Optional[np.ndarray]:
    """Fused mosaic + inverse-affine warp + HSV jitter + flips (train_aug.cc).

    srcs: list of contiguous RGB u8 HxWx3 arrays (1..8 regions).
    place: int32 [n, 6] = (x1a, y1a, x2a, y2a, x1b, y1b) canvas placements.
    minv: float64 [6] inverse affine (output pixel -> canvas coords).
    Returns RGB u8 [out_h, out_w, 3] or None when the lib is unavailable.
    """
    lib = _load()
    if lib is None:
        return None
    n = len(srcs)
    srcs = [np.ascontiguousarray(s, np.uint8) for s in srcs]
    ptrs = (ctypes.c_void_p * n)(*[s.ctypes.data for s in srcs])
    src_hw = np.array([[s.shape[0], s.shape[1]] for s in srcs], np.int32)
    place = np.ascontiguousarray(place, np.int32)
    minv = np.ascontiguousarray(minv, np.float64).reshape(6)
    out = np.empty((out_shape[0], out_shape[1], 3), np.uint8)
    gh, gs, gv = (hsv_gains if hsv_gains is not None else (1.0, 1.0, 1.0))
    lib.yolov6_train_aug(
        ptrs, src_hw.ctypes.data, place.ctypes.data, n, minv.ctypes.data,
        out.ctypes.data, out_shape[0], out_shape[1],
        float(gh), float(gs), float(gv), int(hsv_gains is not None),
        int(flip_lr), int(flip_ud), pad_value,
    )
    return out


def blend_native(a: np.ndarray, b: np.ndarray, r: float) -> Optional[np.ndarray]:
    """In-place mixup blend a = trunc(a*r + b*(1-r)); returns a, or None
    when the lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    assert a.shape == b.shape and a.dtype == np.uint8
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b, np.uint8)
    lib.yolov6_blend(a.ctypes.data, b.ctypes.data, a.size, float(r))
    return a
