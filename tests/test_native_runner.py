"""Native PJRT serving runner: artifact format + binary build.

The runner itself (yolov6_tpu/native/pjrt_runner.cc) needs a PJRT plugin
and real hardware; validated against the axon TPU plugin manually (output
parity with the jax.export round-trip). These tests cover the pieces that
run anywhere: the artifact directory written by write_native_artifact and
the C++ build.
"""

import json
import os.path as osp
import shutil
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov6_tpu.models.end2end import make_end2end_fn, write_native_artifact
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def artifact_dir(tmp_path_factory):
    cfg = Config.fromfile(osp.join(ROOT, "configs", "yolov6n.py"))
    model = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.float32)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    serve = make_end2end_fn(
        model, variables, conf_thres=0.01, iou_thres=0.45, max_det=10,
        with_preprocess=True, half=False,
    )
    out = str(tmp_path_factory.mktemp("artifact"))
    write_native_artifact(
        serve, 1, (64, 64), out, input_dtype=jnp.uint8,
        meta={"end2end": True, "with_preprocess": True, "conf_thres": 0.01,
              "iou_thres": 0.45, "max_det": 10, "num_classes": 80},
    )
    return out


def test_artifact_contents(artifact_dir):
    manifest = json.load(open(osp.join(artifact_dir, "manifest.json")))
    assert manifest["input"] == {"shape": [1, 64, 64, 3], "dtype": "uint8"}
    # end2end outputs: num_dets, boxes, scores, classes
    shapes = [o["shape"] for o in manifest["outputs"]]
    assert shapes == [[1, 1], [1, 10, 4], [1, 10], [1, 10]]
    dtypes = [o["dtype"] for o in manifest["outputs"]]
    assert dtypes == ["int32", "float32", "float32", "int32"]

    module = open(osp.join(artifact_dir, "module.stablehlo.bc"), "rb").read()
    assert module[:4] == b"ML\xefR"  # MLIR bytecode magic
    assert len(open(osp.join(artifact_dir, "compile_options.pb"), "rb").read()) > 0


def test_module_is_loadable_stablehlo(artifact_dir):
    """The sidecar bytecode must be exactly what PJRT_Client_Compile accepts:
    a deserializable, self-contained StableHLO module."""
    from jax._src.interpreters import mlir
    from jax._src.lib.mlir import ir

    data = open(osp.join(artifact_dir, "module.stablehlo.bc"), "rb").read()
    with mlir.make_ir_context() as ctx:
        module = ir.Module.parse(data, context=ctx)
        text = str(module.operation)
    # serialized as VHLO (versioned StableHLO) — the portable form PJRT takes
    assert "vhlo" in text and "main" in text


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_runner_builds():
    subprocess.run(
        ["make", "-C", osp.join(ROOT, "yolov6_tpu", "native"), "-s", "pjrt_runner"],
        check=True, capture_output=True, timeout=300,
    )
    binary = osp.join(ROOT, "yolov6_tpu", "native", "yolov6_pjrt_runner")
    assert osp.exists(binary)
    # no --artifact -> usage failure, but proves the binary runs
    proc = subprocess.run([binary], capture_output=True, timeout=60)
    assert proc.returncode != 0
    assert b"--artifact" in proc.stderr
