"""Full-model golden parity vs the reference PyTorch detector.

Builds the reference Model from its own config files with randomized weights
and BN statistics, imports the state into our Flax model (train structure and
deploy-folded), and compares the decoded eval outputs [b, A, 5+nc].
"""

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


def _randomize(module, seed=0):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
                if getattr(m, "_is_proj_conv", False):
                    continue
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.1)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    module.eval()
    return module


def _build_reference(cfg_path, num_classes=80, seed=0):
    from yolov6.models.yolo import Model as RefModel
    from yolov6.models import yolo_lite

    cfg = Config.fromfile(cfg_path)
    if not hasattr(cfg, "training_mode"):
        cfg.training_mode = "repvgg"
    if cfg.model.backbone.type == "Lite_EffiBackbone":
        ref = yolo_lite.Model(cfg, channels=3, num_classes=num_classes)
    else:
        ref = RefModel(cfg, channels=3, num_classes=num_classes)
    # tag the DFL projection conv so randomization keeps its fixed weights
    if hasattr(ref.detect, "proj_conv"):
        ref.detect.proj_conv._is_proj_conv = True
    _randomize(ref, seed)
    return cfg, ref


def _reference_eval(ref, x_nhwc):
    with torch.no_grad():
        out, _featmaps = ref(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return out.numpy()


@pytest.mark.parametrize(
    "cfg_path,mode",
    [
        ("/root/reference/configs/yolov6n.py", "repvgg"),
        ("/root/reference/configs/yolov6s.py", "repvgg"),
        ("/root/reference/configs/qarepvgg/yolov6s_qa.py", "qarepvggv2"),
        ("/root/reference/configs/yolov6_lite/yolov6_lite_s.py", "repvgg"),
    ],
)
def test_model_parity_small(cfg_path, mode):
    cfg, ref = _build_reference(cfg_path)
    x = np.random.default_rng(3).standard_normal((1, 96, 96, 3)).astype(np.float32) * 0.3
    want = _reference_eval(ref, x)

    cfg2 = Config.fromfile(cfg_path)
    if not hasattr(cfg2, "training_mode"):
        cfg2.training_mode = "repvgg"
    state = torch_state_to_numpy(ref)

    # train-structure import
    model = build_model(cfg2, num_classes=80, deploy=False)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False), jnp.asarray(x)
    )
    variables = import_checkpoint(state, spec, training_mode=mode, deploy=False)
    head_out, _ = model.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(model.apply(variables, head_out, method=model.decode))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    # deploy-folded import
    model_d = build_model(cfg2, num_classes=80, deploy=True)
    spec_d = jax.eval_shape(
        lambda a: model_d.init(jax.random.PRNGKey(0), a, train=False), jnp.asarray(x)
    )
    variables_d = import_checkpoint(state, spec_d, training_mode=mode, deploy=True)
    head_out_d, _ = model_d.apply(variables_d, jnp.asarray(x), train=False)
    got_d = np.asarray(model_d.apply(variables_d, head_out_d, method=model_d.decode))
    np.testing.assert_allclose(got_d, want, rtol=5e-3, atol=5e-3)


@pytest.mark.slow
def test_model_parity_l_dfl():
    """L config exercises CSPBep backbone, CSPRepBiFPAN neck, and the DFL head."""
    cfg_path = "/root/reference/configs/yolov6l.py"
    cfg, ref = _build_reference(cfg_path)
    x = np.random.default_rng(4).standard_normal((1, 96, 96, 3)).astype(np.float32) * 0.3
    want = _reference_eval(ref, x)

    cfg2 = Config.fromfile(cfg_path)
    state = torch_state_to_numpy(ref)
    model = build_model(cfg2, num_classes=80, deploy=True)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False), jnp.asarray(x)
    )
    variables = import_checkpoint(state, spec, training_mode=cfg2.training_mode, deploy=True)
    head_out, _ = model.apply(variables, jnp.asarray(x), train=False)
    got = np.asarray(model.apply(variables, head_out, method=model.decode))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
