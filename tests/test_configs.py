"""Our configs/ zoo must build byte-identical parameter structures to the
reference's config files (both built through our build_model)."""

import os.path as osp

import flax
import jax
import jax.numpy as jnp
import pytest

import conftest

from yolov6_tpu.utils.config import Config
from yolov6_tpu.models.yolo import build_model

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))

PAIRS = [
    ("configs/yolov6n.py", "/root/reference/configs/yolov6n.py"),
    ("configs/yolov6s.py", "/root/reference/configs/yolov6s.py"),
    ("configs/yolov6m.py", "/root/reference/configs/yolov6m.py"),
    ("configs/yolov6l.py", "/root/reference/configs/yolov6l.py"),
    ("configs/yolov6n6.py", "/root/reference/configs/yolov6n6.py"),
    ("configs/yolov6s6.py", "/root/reference/configs/yolov6s6.py"),
    ("configs/yolov6m6.py", "/root/reference/configs/yolov6m6.py"),
    ("configs/yolov6l6.py", "/root/reference/configs/yolov6l6.py"),
    ("configs/mbla/yolov6l_mbla.py", "/root/reference/configs/mbla/yolov6l_mbla.py"),
    ("configs/mbla/yolov6x_mbla.py", "/root/reference/configs/mbla/yolov6x_mbla.py"),
    ("configs/base/yolov6n_base.py", "/root/reference/configs/base/yolov6n_base.py"),
    ("configs/base/yolov6s_base.py", "/root/reference/configs/base/yolov6s_base.py"),
    ("configs/base/yolov6m_base.py", "/root/reference/configs/base/yolov6m_base.py"),
    ("configs/base/yolov6l_base.py", "/root/reference/configs/base/yolov6l_base.py"),
    ("configs/qarepvgg/yolov6s_qa.py", "/root/reference/configs/qarepvgg/yolov6s_qa.py"),
    ("configs/yolov6_lite/yolov6_lite_s.py", "/root/reference/configs/yolov6_lite/yolov6_lite_s.py"),
    ("configs/yolov6_lite/yolov6_lite_m.py", "/root/reference/configs/yolov6_lite/yolov6_lite_m.py"),
    ("configs/yolov6_lite/yolov6_lite_l.py", "/root/reference/configs/yolov6_lite/yolov6_lite_l.py"),
    ("configs/repopt/yolov6s_hs.py", "/root/reference/configs/repopt/yolov6s_hs.py"),
    ("configs/repopt/yolov6s_opt.py", "/root/reference/configs/repopt/yolov6s_opt.py"),
]


def _shapes(cfg_path):
    cfg = Config.fromfile(cfg_path)
    model = build_model(cfg, num_classes=80, deploy=False)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False),
        jnp.zeros((1, 64, 64, 3)),
    )
    flat = flax.traverse_util.flatten_dict(spec)
    return {"/".join(k): tuple(v.shape) for k, v in flat.items()}


@pytest.mark.parametrize("ours,ref", PAIRS, ids=[p[0] for p in PAIRS])
def test_config_structure_parity(ours, ref):
    if not osp.exists(ref):
        pytest.skip("reference configs unavailable")
    assert _shapes(osp.join(REPO, ours)) == _shapes(ref)
