"""Vendor-toolchain export shims (OpenVINO `mo`, TensorRT `trtexec`).

The vendor binaries are not installable here, so these tests pin the two
halves we own: the clear not-found error pointing at the intermediate ONNX,
and the exact CLI invocation when the tool IS present (validated with a fake
executable that records its argv). Reference flows being mirrored:
deploy/OpenVINO/export_openvino.py:23-94, deploy/TensorRT/onnx_to_trt.py:59-127.
"""

import os
import stat
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from export import _export_openvino, _export_tensorrt  # noqa: E402


@pytest.fixture()
def fake_tool(tmp_path, monkeypatch):
    """Put a fake executable on PATH that appends its argv to a log file."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    log = tmp_path / "argv.log"

    def make(name: str):
        p = bindir / name
        p.write_text(f"#!/bin/sh\necho \"$@\" >> {log}\n")
        p.chmod(p.stat().st_mode | stat.S_IEXEC)
        return p

    monkeypatch.setenv("PATH", f"{bindir}:{os.environ['PATH']}")
    return make, log


def test_trtexec_missing_points_at_onnx(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))  # nothing on PATH
    with pytest.raises(SystemExit, match=r"trtexec.*model\.onnx"):
        _export_tensorrt(str(tmp_path / "model.onnx"), None, "fp16")


def test_mo_missing_points_at_onnx(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))
    with pytest.raises(SystemExit, match=r"mo.*model\.onnx"):
        _export_openvino(str(tmp_path / "model.onnx"), None)


def test_trtexec_invocation_fp16_and_int8(tmp_path, fake_tool):
    make, log = fake_tool
    make("trtexec")
    onnx = str(tmp_path / "m.onnx")

    _export_tensorrt(onnx, None, "fp16")
    _export_tensorrt(onnx, str(tmp_path / "q.engine"), "int8")
    _export_tensorrt(onnx, None, "fp32")

    lines = log.read_text().strip().splitlines()
    assert lines[0] == f"--onnx={onnx} --saveEngine={tmp_path}/m.trt --fp16"
    assert lines[1] == f"--onnx={onnx} --saveEngine={tmp_path}/q.engine --int8 --fp16"
    assert lines[2] == f"--onnx={onnx} --saveEngine={tmp_path}/m.trt"  # fp32: no flag


def test_trtexec_failure_propagates(tmp_path, fake_tool):
    make, _ = fake_tool
    p = make("trtexec")
    p.write_text("#!/bin/sh\nexit 3\n")
    with pytest.raises(SystemExit, match="rc=3"):
        _export_tensorrt(str(tmp_path / "m.onnx"), None, "fp16")


def test_mo_invocation_legacy_and_ovc(tmp_path, fake_tool):
    make, log = fake_tool
    make("mo")
    onnx = str(tmp_path / "m.onnx")
    _export_openvino(onnx, None)
    assert log.read_text().strip() == \
        f"--input_model {onnx} --output_dir {tmp_path}/m_openvino"

    log.write_text("")
    os.remove(str(tmp_path / "bin" / "mo"))
    make("ovc")  # OpenVINO >= 2023 converter: positional input, --output_model
    _export_openvino(onnx, str(tmp_path / "ir"))
    assert log.read_text().strip() == f"{onnx} --output_model {tmp_path}/ir/m"
