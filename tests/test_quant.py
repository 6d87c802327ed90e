"""INT8 PTQ: calibration populates amax, fake-quant output stays close to
fp32, and disabling quant restores byte-identical behavior."""

import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.quant import set_quant_mode
from yolov6_tpu.quant.ptq import calibrate, quantize_variables
from yolov6_tpu.utils.config import Config


@pytest.fixture(autouse=True)
def _reset_quant():
    yield
    set_quant_mode(False)


def test_ptq_calibrate_and_eval():
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    x0 = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 2, 64, 64, 3), np.uint8)

    head_fp32, _ = model.apply(variables, jnp.asarray(imgs[0]) / 255.0, train=False)
    dec_fp32 = np.asarray(model.apply(variables, head_fp32, method=model.decode))

    qvars = calibrate(model, variables, list(imgs), num_bits=8)
    assert "quant" in qvars
    import flax

    amaxes = flax.traverse_util.flatten_dict(qvars["quant"])
    assert len(amaxes) > 50
    assert all(float(v) > 0 for v in amaxes.values())

    qvars = quantize_variables(qvars, num_bits=8)
    head_q, _ = model.apply(qvars, jnp.asarray(imgs[0]) / 255.0, train=False)
    dec_q = np.asarray(model.apply(qvars, head_q, method=model.decode))

    # int8 should track fp32 closely on boxes (pixels) and scores
    box_err = np.abs(dec_q[..., :4] - dec_fp32[..., :4]).mean()
    score_err = np.abs(dec_q[..., 5:] - dec_fp32[..., 5:]).max()
    assert box_err < 2.0, f"mean box error {box_err}"
    assert score_err < 0.15, f"max score error {score_err}"

    # switching quant off restores exact fp32 behavior with original params
    set_quant_mode(False)
    head_off, _ = model.apply(variables, jnp.asarray(imgs[0]) / 255.0, train=False)
    dec_off = np.asarray(model.apply(variables, head_off, method=model.decode))
    np.testing.assert_array_equal(dec_off, dec_fp32)


def test_skip_patterns():
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=8, deploy=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 255, (1, 64, 64, 3), np.uint8)]
    qvars = calibrate(model, variables, imgs, skip_patterns=["detect"])
    import flax

    paths = ["/".join(k) for k in flax.traverse_util.flatten_dict(qvars["quant"])]
    assert paths and not any("detect" in p for p in paths)
