"""Hub-style model loaders (reference: hubconf.py).

Usage:
    import hubconf
    model, variables = hubconf.yolov6s(weights="weights/yolov6s.msgpack")
    dets = hubconf.predict(model, variables, "img.jpg")
"""

from __future__ import annotations

import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.abspath(__file__))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


def _create(name: str, weights: str | None = None, num_classes: int = 80,
            img_size: int = 640, half: bool = False):
    import jax
    import jax.numpy as jnp

    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.checkpoint import load_checkpoint_variables
    from yolov6_tpu.utils.config import Config

    cfg = Config.fromfile(osp.join(ROOT, "configs", f"{name}.py"))
    model = build_model(cfg, num_classes=num_classes, deploy=True,
                        dtype=jnp.bfloat16 if half else jnp.float32)
    if weights:
        variables = load_checkpoint_variables(
            weights, model, img_size=(img_size, img_size), deploy=True,
            training_mode=cfg.get("training_mode", "repvgg"),
        )
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)), train=False
        )
    return model, variables


def yolov6n(weights=None, **kw):
    return _create("yolov6n", weights, **kw)


def yolov6s(weights=None, **kw):
    return _create("yolov6s", weights, **kw)


def yolov6m(weights=None, **kw):
    return _create("yolov6m", weights, **kw)


def yolov6l(weights=None, **kw):
    return _create("yolov6l", weights, **kw)


def yolov6n6(weights=None, **kw):
    return _create("yolov6n6", weights, img_size=1280, **kw)


def yolov6s6(weights=None, **kw):
    return _create("yolov6s6", weights, img_size=1280, **kw)


def yolov6m6(weights=None, **kw):
    return _create("yolov6m6", weights, img_size=1280, **kw)


def yolov6l6(weights=None, **kw):
    return _create("yolov6l6", weights, img_size=1280, **kw)


def yolov6lite_s(weights=None, **kw):
    return _create("yolov6_lite/yolov6_lite_s", weights, img_size=320, **kw)


def yolov6lite_m(weights=None, **kw):
    return _create("yolov6_lite/yolov6_lite_m", weights, img_size=320, **kw)


def yolov6lite_l(weights=None, **kw):
    return _create("yolov6_lite/yolov6_lite_l", weights, img_size=320, **kw)


_PREDICT_CACHE = {}  # LRU, capped: each entry pins a model + compiled program
_PREDICT_CACHE_MAX = 8


def predict(model, variables, source, img_size: int = 640,
            conf_thres: float = 0.25, iou_thres: float = 0.45, max_det: int = 300):
    """One-shot inference on an image path/array; returns [n, 6] xyxy/conf/cls
    in source-image pixels (reference hubconf's model(img) + NMS flow)."""
    import cv2
    import jax.numpy as jnp

    from yolov6_tpu.core.inferer import Inferer
    from yolov6_tpu.data.data_augment import letterbox
    from yolov6_tpu.models.effidehead import decode_eval
    from yolov6_tpu.ops.nms import non_max_suppression

    img_src = cv2.imread(source) if isinstance(source, str) else source
    img = letterbox(img_src, (img_size, img_size), auto=False)[0]
    img = np.ascontiguousarray(img[:, :, ::-1])[None]

    # one jitted program per (model, thresholds): weights stay ARGUMENTS
    # (no HLO-constant embedding — the M6/L6 axon caveat, see ROADMAP)
    import jax

    key = (id(model), conf_thres, iou_thres, max_det)
    fn = _PREDICT_CACHE.pop(key, None)
    if fn is None:

        @jax.jit
        def fn(variables, x):
            head_out, _ = model.apply(variables, x, train=False)
            preds = decode_eval(
                head_out, model.num_classes, model.strides,
                model.use_dfl, model.reg_max,
            )
            return non_max_suppression(
                preds, conf_thres, iou_thres, max_det=max_det
            )

    _PREDICT_CACHE[key] = fn  # re-insert = move to MRU position
    while len(_PREDICT_CACHE) > _PREDICT_CACHE_MAX:
        _PREDICT_CACHE.pop(next(iter(_PREDICT_CACHE)))

    x = jnp.asarray(img).astype(jnp.float32) / 255.0
    dets, valid = fn(variables, x)
    dets = np.asarray(dets[0])[np.asarray(valid[0])]
    if len(dets):
        dets[:, :4] = Inferer.rescale(img.shape[1:3], dets[:, :4], img_src.shape[:2])
    return dets


def visualize_detections(source, dets, class_names, save_path: str | None = None):
    """Draw detections on the source image (reference hubconf visualize_detections)."""
    import cv2

    from yolov6_tpu.core.inferer import Inferer

    img = cv2.imread(source) if isinstance(source, str) else source.copy()
    for *xyxy, conf, cls in dets:
        Inferer.plot_box_and_label(
            img, max(round(sum(img.shape) / 2 * 0.003), 2), xyxy,
            f"{class_names[int(cls)]} {conf:.2f}",
            color=Inferer.generate_colors(int(cls), True),
        )
    if save_path:
        cv2.imwrite(save_path, img)
    return img
