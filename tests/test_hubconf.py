"""hubconf API: model loaders + one-shot predict (reference hubconf flow)."""

import importlib.util
import os.path as osp

import numpy as np
import pytest

import conftest  # noqa: F401


def _load_hubconf():
    """Import THE REPO's hubconf by path: golden tests put /root/reference
    on sys.path, whose own hubconf.py would otherwise shadow ours in
    full-suite runs."""
    path = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "hubconf.py")
    spec = importlib.util.spec_from_file_location("repo_hubconf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_hubconf_predict_roundtrip():
    hubconf = _load_hubconf()

    model, variables = hubconf.yolov6n(weights=None, num_classes=5)
    img = np.random.default_rng(0).integers(
        0, 255, (80, 100, 3), np.uint8
    )
    dets = hubconf.predict(
        model, variables, img, img_size=64, conf_thres=1e-4, iou_thres=0.5
    )
    assert dets.ndim == 2 and dets.shape[1] == 6
    assert len(dets) > 0  # 1e-4 threshold keeps some random-weight dets
    # boxes rescaled into source-image pixel space
    assert (dets[:, 0] >= -1).all() and (dets[:, 2] <= 101).all()
    assert (dets[:, 1] >= -1).all() and (dets[:, 3] <= 81).all()
    assert len(hubconf._PREDICT_CACHE) == 1

    dets2 = hubconf.predict(
        model, variables, img, img_size=64, conf_thres=1e-4, iou_thres=0.5
    )
    assert len(hubconf._PREDICT_CACHE) == 1  # jit program reused
    np.testing.assert_allclose(dets, dets2)


def test_hubconf_predict_jit_carries_no_weight_constants():
    import jax
    import jax.numpy as jnp

    hubconf = _load_hubconf()

    model, variables = hubconf.yolov6n(weights=None, num_classes=5)
    img = np.zeros((64, 64, 3), np.uint8)
    hubconf.predict(model, variables, img, img_size=64)
    fn = next(iter(hubconf._PREDICT_CACHE.values()))
    lowered = fn.lower(variables, jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32))
    text = lowered.as_text()
    assert len(text) < 3_000_000  # embedded weights would be ~18 MB of text

    viz = hubconf.visualize_detections(
        img, np.asarray([[4.0, 4.0, 30.0, 30.0, 0.9, 1.0]]),
        ["a", "b", "c", "d", "e"],
    )
    assert viz.shape == img.shape
