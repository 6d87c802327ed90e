"""TorchScript export: trace the ONNX deploy graph with torch ops.

Reference contract: deploy/NCNN/export_torchscript.py — a traced
deploy-mode model+decode graph (no NMS) saved as ``*.torchscript.pt``
for PNNX/NCNN conversion. Parity target: the traced torch module must
match the source JAX graph on random inputs — this also makes stock
torch the second independent runtime to execute our exported ONNX
(after OpenCV DNN, tests/test_cv2_dnn.py).
"""

import numpy as np
import pytest

import conftest  # noqa: F401  (forces the CPU backend)

import jax
import jax.numpy as jnp

from yolov6_tpu.export.onnx_export import export_onnx
from yolov6_tpu.export.torch_export import OnnxTorchModule, export_torchscript
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config

torch = pytest.importorskip("torch")


def _deploy_fwd(config, nc=16, img=96):
    cfg = Config.fromfile(config)
    model = build_model(cfg, num_classes=nc, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), train=False
    )

    def fwd(images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    return fwd


def _ts_parity(config, nc=16, img=96, batch=2, atol=5e-4, tmp_path=None):
    fwd = _deploy_fwd(config, nc=nc, img=img)
    x = np.random.default_rng(0).uniform(0, 1, (batch, img, img, 3)).astype(np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),),
                       input_names=["images"], output_names=["outputs"])
    want = np.asarray(jax.jit(fwd)(jnp.asarray(x)))

    out_path = str(tmp_path / "model.torchscript.pt") if tmp_path else None
    traced = export_torchscript(data, (x,), out_path)
    got = traced(torch.from_numpy(x)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=atol, rtol=1e-4)

    if out_path:
        # the saved artifact must be self-contained: fresh-process load path
        loaded = torch.jit.load(out_path)
        got2 = loaded(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got2, got, atol=0, rtol=0)
    return data


def test_torchscript_parity_yolov6n(tmp_path):
    """RepVGG deploy blocks + anchor-free decode; save/load round-trip."""
    _ts_parity("configs/yolov6n.py", tmp_path=tmp_path)


def test_torchscript_parity_dfl():
    """DFL decode (reg_max=16 softmax projection) traces correctly."""
    _ts_parity("configs/yolov6m.py", img=64, batch=1)


def test_torchscript_parity_lite():
    """Lite family: grouped (depthwise) convs map to torch groups."""
    _ts_parity("configs/yolov6_lite/yolov6_lite_s.py", img=96, batch=1)


def test_torchscript_generalizes_across_inputs():
    """The trace must be input-independent: different random input, same
    module — guards against baked-in data-dependent constants."""
    fwd = _deploy_fwd("configs/yolov6n.py", img=64)
    rng = np.random.default_rng(1)
    x0 = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    x1 = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    data = export_onnx(fwd, (jnp.asarray(x0),),
                       input_names=["images"], output_names=["outputs"])
    traced = export_torchscript(data, (x0,))
    want = np.asarray(jax.jit(fwd)(jnp.asarray(x1)))
    got = traced(torch.from_numpy(x1)).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)


def test_torch_module_unknown_op_is_loud():
    """Unknown ops must raise by name, not silently mis-execute."""
    from yolov6_tpu.export.onnx_proto import parse_model

    fwd = _deploy_fwd("configs/yolov6n.py", img=64)
    x = np.zeros((1, 64, 64, 3), np.float32)
    data = export_onnx(fwd, (jnp.asarray(x),),
                       input_names=["images"], output_names=["outputs"])
    parsed = parse_model(data)
    parsed.nodes[5].op_type = "NotARealOp"
    mod = OnnxTorchModule(parsed)
    with pytest.raises(NotImplementedError, match="NotARealOp"):
        mod(torch.from_numpy(x))


def test_torchscript_cli(tmp_path, monkeypatch):
    """tools/export.py --format torchscript end to end: checkpoint ->
    intermediate ONNX -> traced TorchScript on disk, --check green."""
    import os
    import sys

    from yolov6_tpu.utils.checkpoint import save_checkpoint

    cfg_path = "configs/yolov6n.py"
    model = build_model(Config.fromfile(cfg_path), num_classes=3, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), train=False
    )
    ckpt = save_checkpoint(
        {"model": jax.device_get(variables)}, False, str(tmp_path), "tiny"
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export as export_cli

    out = str(tmp_path / "tiny.torchscript.pt")
    monkeypatch.setattr(sys, "argv", [
        "export.py", "--weights", ckpt, "--config", cfg_path,
        "--format", "torchscript", "--img-size", "96", "--num-classes", "3",
        "--batch-size", "1", "--output", out, "--check",
    ])
    export_cli.main()
    assert os.path.exists(out)
    loaded = torch.jit.load(out)
    x = np.zeros((1, 96, 96, 3), np.float32)
    y = loaded(torch.from_numpy(x))
    assert tuple(y.shape[:1]) == (1,) and y.shape[-1] == 3 + 5


def test_torchscript_cli_rejects_end2end(tmp_path, monkeypatch):
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import export as export_cli

    monkeypatch.setattr(sys, "argv", [
        "export.py", "--weights", "w.msgpack", "--config", "configs/yolov6n.py",
        "--format", "torchscript", "--end2end",
    ])
    with pytest.raises(SystemExit, match="torchscript"):
        export_cli.main()
