"""Third-party validation of the exported ONNX: OpenCV's DNN module.

The reference ships OpenCV-DNN inference demos consuming its ONNX exports
(reference: deploy/ONNX/OpenCV/yolov6.py:1-149). Here the in-env OpenCV
build parses our exporter's output — the first stock runtime to touch the
artifact (the numpy interpreter is in-repo) — and its forward pass must
match the JAX graph.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

cv2 = pytest.importorskip("cv2")

from yolov6_tpu.export.onnx_export import export_onnx  # noqa: E402
from yolov6_tpu.models.yolo import build_model  # noqa: E402
from yolov6_tpu.utils.config import Config  # noqa: E402

pytestmark = pytest.mark.skipif(
    not hasattr(cv2, "dnn") or not hasattr(cv2.dnn, "readNetFromONNX"),
    reason="cv2 built without dnn",
)


def _deploy_fwd(config, nc, img):
    cfg = Config.fromfile(config)
    model = build_model(cfg, num_classes=nc, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False
    )

    def fwd(images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    return fwd


def test_cv2_dnn_parses_and_matches(tmp_path):
    """cv2.dnn.readNetFromONNX must load the plain (non-end2end) export and
    produce the same decoded predictions as the JAX deploy graph."""
    img, nc = 64, 8
    fwd = _deploy_fwd("configs/yolov6n.py", nc=nc, img=img)
    x = np.random.default_rng(7).uniform(0, 1, (1, img, img, 3)).astype(np.float32)
    path = os.path.join(tmp_path, "model.onnx")
    export_onnx(fwd, (jnp.asarray(x),), path=path,
                input_names=["images"], output_names=["outputs"])

    net = cv2.dnn.readNetFromONNX(path)
    net.setInput(x, "images")
    got = net.forward()
    want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)
