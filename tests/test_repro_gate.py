"""Wiring test for tools/repro_gate.py: pass/fail tolerance accounting and
the no-weights/no-egress skip path (the real gate needs COCO + weights,
absent in this environment — reference protocol: tools/eval.py:70-82)."""

import importlib.util
import json
import os.path as osp
import sys

import pytest
import yaml


def _load_gate():
    sys.path.insert(0, "/root/repo/tools")
    spec = importlib.util.spec_from_file_location("repro_gate", "/root/repo/tools/repro_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture
def fake_coco(tmp_path):
    (tmp_path / "images" / "val2017").mkdir(parents=True)
    (tmp_path / "annotations").mkdir()
    (tmp_path / "annotations" / "instances_val2017.json").write_text("{}")
    return str(tmp_path)


def test_gate_skips_without_weights(fake_coco, tmp_path, monkeypatch):
    gate = _load_gate()
    import yolov6_tpu.utils.general as general

    monkeypatch.setattr(general, "download_ckpt", lambda p, **k: False)
    args = gate.get_args_parser().parse_args([
        "--coco-root", fake_coco, "--weights-dir", str(tmp_path / "w"),
        "--models", "yolov6n", "--save-dir", str(tmp_path / "runs"),
    ])
    assert gate.main(args) == 2  # inconclusive, not pass


def test_gate_tolerance_accounting(fake_coco, tmp_path, monkeypatch):
    gate = _load_gate()
    wdir = tmp_path / "w"
    wdir.mkdir()
    for name in ("yolov6n", "yolov6s"):
        (wdir / f"{name}.msgpack").write_bytes(b"stub")

    fake_maps = {"yolov6n": 0.374, "yolov6s": 0.442}  # n within 0.2, s off by 0.8

    def fake_run(data, weights=None, config=None, **kw):
        name = osp.splitext(osp.basename(weights))[0]
        m = fake_maps[name]
        if kw.get("max_nms") == 30000:  # the exact-protocol second eval
            m -= 0.001
        return (0.5, m), []

    # the gate loads OUR tools/eval.py by explicit path (a bare tools.eval
    # import can resolve to the reference repo when it is on sys.path);
    # patch the loader rather than any tools.eval module object
    monkeypatch.setattr(gate, "_load_eval_run", lambda: fake_run)
    out = tmp_path / "gate.json"
    args = gate.get_args_parser().parse_args([
        "--coco-root", fake_coco, "--weights-dir", str(wdir),
        "--models", "yolov6n", "yolov6s", "--save-dir", str(tmp_path / "runs"),
        "--out-json", str(out),
    ])
    assert gate.main(args) == 1  # s fails
    rows = json.loads(out.read_text())
    by_model = {r["model"]: r for r in rows}
    assert by_model["yolov6n"]["status"].startswith("PASS")
    assert by_model["yolov6s"]["status"].startswith("FAIL")
    # approx-vs-exact NMS delta is measured and reported per model
    assert by_model["yolov6n"]["nms_delta"] == pytest.approx(0.1, abs=1e-6)

    args.models = ["yolov6n"]
    assert gate.main(args) == 0
