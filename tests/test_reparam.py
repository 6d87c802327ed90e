"""Golden tests: block-level parity vs the reference PyTorch implementation.

The single highest-value invariant (SURVEY.md §4): our checkpoint-load fold
must match the reference ``switch_to_deploy`` fold bit-for-bit in fp32, and
train-mode(eval-BN) forward must match the torch forward.
"""

import numpy as np
import pytest

import conftest

torch = pytest.importorskip("torch")
conftest.add_reference_to_path()

import jax  # noqa: E402

from yolov6_tpu.utils.torch_import import import_checkpoint, torch_state_to_numpy  # noqa: E402


def _randomize(module: "torch.nn.Module", seed: int = 0):
    """Randomize weights AND BN running stats so folds are non-trivial."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.2)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
                # reference initialize_weights (utils/torch_utils.py:38-47) sets
                # these on every BN in a built model; our modules hardcode them
                m.eps = 1e-3
                m.momentum = 0.03
    module.eval()
    return module


def _torch_forward(module, x_nhwc):
    with torch.no_grad():
        y = module(torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2))))
    return np.transpose(y.numpy(), (0, 2, 3, 1))


def _flax_forward(flax_module, variables, x_nhwc):
    return np.asarray(flax_module.apply(variables, jax.numpy.asarray(x_nhwc), train=False))


def _spec(flax_module, x_nhwc):
    return jax.eval_shape(
        lambda x: flax_module.init(jax.random.PRNGKey(0), x, train=False),
        jax.numpy.asarray(x_nhwc),
    )


def _import(flax_module, torch_module, x, training_mode="repvgg", deploy=False):
    state = torch_state_to_numpy(torch_module)
    return import_checkpoint(state, _spec(flax_module, x), training_mode=training_mode, deploy=deploy)


def _rand_input(c=8, hw=16, b=2, seed=1):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, hw, hw, c), np.float32)


@pytest.mark.parametrize("mode,stride,cin,cout", [
    ("repvgg", 1, 8, 8), ("repvgg", 2, 8, 16),
    ("qarepvgg", 1, 8, 8), ("qarepvgg", 2, 8, 16),
    ("qarepvggv2", 1, 8, 8), ("qarepvggv2", 2, 8, 16),
])
def test_rep_block_train_and_fold(mode, stride, cin, cout):
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    ref_cls = {"repvgg": ref.RepVGGBlock, "qarepvgg": ref.QARepVGGBlock,
               "qarepvggv2": ref.QARepVGGBlockV2}[mode]
    our_cls = {"repvgg": ours.RepVGGBlock, "qarepvgg": ours.QARepVGGBlock,
               "qarepvggv2": ours.QARepVGGBlockV2}[mode]

    tm = _randomize(ref_cls(cin, cout, stride=stride))
    x = _rand_input(c=cin)

    # train-structure forward parity (BN in eval mode)
    ours_train = our_cls(out_channels=cout, stride=stride)
    variables = _import(ours_train, tm, x, training_mode=mode, deploy=False)
    got = _flax_forward(ours_train, variables, x)
    want = _torch_forward(tm, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # deploy-fold parity: our load-time fold vs the reference deploy pipeline
    # (fuse_model conv+BN fold, then switch_to_deploy — reference
    # utils/checkpoint.py:22-32 + Evaler.init_model)
    ours_deploy = our_cls(out_channels=cout, stride=stride, deploy=True)
    dep_vars = _import(ours_deploy, tm, x, training_mode=mode, deploy=True)
    from yolov6.utils.torch_utils import fuse_model

    tm = fuse_model(tm)
    tm.switch_to_deploy()
    got_d = _flax_forward(ours_deploy, dep_vars, x)
    want_d = _torch_forward(tm, x)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-5)

    # fold kernels bit-close in fp32 (QA variants keep a post-BN in the
    # reference deploy graph that we fold in, so compare repvgg only)
    if mode == "repvgg":
        our_kernel = np.transpose(dep_vars["params"]["rbr_reparam"]["kernel"], (3, 2, 0, 1))
        np.testing.assert_allclose(our_kernel, tm.rbr_reparam.weight.detach().numpy(), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", ["ConvBNReLU", "ConvBNSiLU", "ConvBNHS"])
def test_conv_bn_act(name):
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(getattr(ref, name)(8, 16, kernel_size=3, stride=2))
    x = _rand_input(c=8)
    m = getattr(ours, name)(out_channels=16, kernel_size=3, stride=2)
    variables = _import(m, tm, x)
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)

    m_dep = getattr(ours, name)(out_channels=16, kernel_size=3, stride=2, deploy=True)
    dep_vars = _import(m_dep, tm, x, deploy=True)
    np.testing.assert_allclose(_flax_forward(m_dep, dep_vars, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name,kw", [
    ("SimSPPF", {}), ("SPPF", {}), ("SimCSPSPPF", {}), ("CSPSPPF", {}),
])
def test_sppf_family(name, kw):
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(getattr(ref, name)(16, 16, **kw))
    x = _rand_input(c=16)
    m = getattr(ours, name)(out_channels=16)
    variables = _import(m, tm, x)
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)


def test_transpose_upsample():
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(ref.Transpose(8, 8))
    x = _rand_input(c=8)
    m = ours.Transpose(out_channels=8)
    variables = _import(m, tm, x)
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)


def test_bepc3_and_repblock():
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(ref.BepC3(16, 16, n=4))
    x = _rand_input(c=16)
    m = ours.BepC3(out_channels=16, n=4)
    variables = _import(m, tm, x)
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)

    tm2 = _randomize(ref.RepBlock(16, 16, n=3))
    m2 = ours.RepBlock(out_channels=16, n=3)
    v2 = _import(m2, tm2, x)
    np.testing.assert_allclose(_flax_forward(m2, v2, x), _torch_forward(tm2, x), rtol=1e-4, atol=1e-5)


def test_mbla_block():
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(ref.MBLABlock(16, 16, n=6))
    x = _rand_input(c=16)
    m = ours.MBLABlock(out_channels=16, n=6)
    variables = _import(m, tm, x)
    # deep aggregation block: allow slightly more accumulated fp32 noise
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-3, atol=1e-4)


def test_bifusion():
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    tm = _randomize(ref.BiFusion([16, 24], 8))
    x0 = _rand_input(c=8, hw=8)
    x1 = _rand_input(c=16, hw=16)
    x2 = _rand_input(c=24, hw=32)
    m = ours.BiFusion(out_channels=8)

    def to_t(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))

    with torch.no_grad():
        want = np.transpose(tm([to_t(x0), to_t(x1), to_t(x2)]).numpy(), (0, 2, 3, 1))
    spec = jax.eval_shape(
        lambda a, b, c: m.init(jax.random.PRNGKey(0), [a, b, c], train=False),
        *(jax.numpy.asarray(v) for v in (x0, x1, x2)),
    )
    variables = import_checkpoint(torch_state_to_numpy(tm), spec, deploy=False)
    got = np.asarray(m.apply(variables, [jax.numpy.asarray(v) for v in (x0, x1, x2)], train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lite_blocks():
    from yolov6.layers import common as ref
    from yolov6_tpu.layers import common as ours

    x = _rand_input(c=16)
    tm = _randomize(ref.Lite_EffiBlockS1(16, 8, 16, 1))
    m = ours.Lite_EffiBlockS1(mid_channels=8, out_channels=16, stride=1)
    variables = _import(m, tm, x)
    np.testing.assert_allclose(_flax_forward(m, variables, x), _torch_forward(tm, x), rtol=1e-4, atol=1e-5)

    tm2 = _randomize(ref.Lite_EffiBlockS2(16, 16, 32, 2))
    m2 = ours.Lite_EffiBlockS2(mid_channels=16, out_channels=32, stride=2)
    v2 = _import(m2, tm2, x)
    np.testing.assert_allclose(_flax_forward(m2, v2, x), _torch_forward(tm2, x), rtol=1e-4, atol=1e-5)

    tm3 = _randomize(ref.DPBlock(16, 16, 5, 1))
    m3 = ours.DPBlock(out_channels=16, kernel_size=5, stride=1)
    v3 = _import(m3, tm3, x)
    np.testing.assert_allclose(_flax_forward(m3, v3, x), _torch_forward(tm3, x), rtol=1e-4, atol=1e-5)

    m3d = ours.DPBlock(out_channels=16, kernel_size=5, stride=1, deploy=True)
    v3d = _import(m3d, tm3, x, deploy=True)
    np.testing.assert_allclose(_flax_forward(m3d, v3d, x), _torch_forward(tm3, x), rtol=1e-4, atol=1e-5)

    tm4 = _randomize(ref.CSPBlock(16, 16, 5))
    m4 = ours.CSPBlock(out_channels=16, kernel_size=5)
    v4 = _import(m4, tm4, x)
    np.testing.assert_allclose(_flax_forward(m4, v4, x), _torch_forward(tm4, x), rtol=1e-4, atol=1e-5)
