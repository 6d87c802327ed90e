"""P6 (4-level) model parity vs the reference, and letterbox geometry parity."""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from yolov6_tpu.utils.config import Config  # noqa: E402
from yolov6_tpu.utils.torch_import import import_checkpoint, torch_state_to_numpy  # noqa: E402
from yolov6_tpu.models.yolo import build_model  # noqa: E402
from tests.test_model_parity import _build_reference, _reference_eval  # noqa: E402


def test_p6_model_parity():
    """yolov6n6: EfficientRep6 + RepBiFPANNeck6 + 4-level head @ stride 64."""
    cfg_path = "/root/reference/configs/yolov6n6.py"
    cfg, ref = _build_reference(cfg_path)
    x = np.random.default_rng(7).standard_normal((1, 128, 128, 3)).astype(np.float32) * 0.3
    want = _reference_eval(ref, x)

    cfg2 = Config.fromfile(cfg_path)
    state = torch_state_to_numpy(ref)
    model = build_model(cfg2, num_classes=80, deploy=True)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False), jnp.asarray(x)
    )
    variables = import_checkpoint(state, spec, training_mode="repvgg", deploy=True)
    head_out, _ = model.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(model.apply(variables, head_out, method=model.decode))
    assert got.shape == want.shape  # includes the stride-64 level
    # deeper net + random weights -> slightly more fp32 accumulation noise
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)


def test_letterbox_parity_vs_reference():
    from yolov6.data.data_augment import letterbox as ref_letterbox

    from yolov6_tpu.data.data_augment import letterbox

    rng = np.random.default_rng(0)
    for (h, w) in [(480, 640), (640, 480), (427, 640), (123, 77), (640, 640)]:
        im = rng.integers(0, 255, (h, w, 3), np.uint8)
        for auto, scaleup, shape in [
            (False, False, (640, 640)), (False, True, (320, 320)),
            (True, False, (640, 640)), (False, False, (416, 256)),
        ]:
            got, gr, gpad = letterbox(im.copy(), shape, auto=auto, scaleup=scaleup)
            want, wr, wpad = ref_letterbox(im.copy(), shape, auto=auto, scaleup=scaleup)
            assert got.shape == want.shape, (h, w, auto, scaleup, shape)
            assert abs(gr - wr) < 1e-9
            assert gpad == wpad
            np.testing.assert_array_equal(got, want)


def test_eval_resize_parity_vs_reference_load_image():
    """shrink_size resize path (reference: datasets.py:279-295)."""
    import cv2

    rng = np.random.default_rng(1)
    im = rng.integers(0, 255, (480, 640, 3), np.uint8)
    # replicate: ratio = (img_size - shrink) / max(h, w); INTER_AREA when shrinking
    img_size, shrink = 640, 6
    ratio = (img_size - shrink) / 640
    want = cv2.resize(im, (int(640 * ratio), int(480 * ratio)), interpolation=cv2.INTER_AREA)

    import tempfile, os.path as osp

    from yolov6_tpu.data.datasets import TrainValDataset

    with tempfile.TemporaryDirectory() as d:
        img_dir = osp.join(d, "images", "val")
        import os

        os.makedirs(img_dir)
        cv2.imwrite(osp.join(img_dir, "0001.jpg"), im)
        ds = TrainValDataset(img_dir, img_size=img_size, task="train")
        got, (h0, w0), (h, w) = ds.load_image(0, shrink_size=shrink)
        assert (h0, w0) == (480, 640)
        assert (h, w) == want.shape[:2]
