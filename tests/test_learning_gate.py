"""The synthetic end-to-end learning gate at test scale: the full
loader -> train_step -> EMA -> checkpoint -> Evaler -> coco_eval chain must
LEARN (mAP50 above chance and improving), not merely run. Full-scale runs
live in tools/learning_gate.py (see docs/learning_gate.md for measured
trajectories); this tier keeps the wiring + learning signal under pytest.
"""

import importlib.util
import json
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # trains a real (tiny) model: minutes on 1 core

import conftest  # noqa: F401  (forces CPU platform)


def _load_gate():
    spec = importlib.util.spec_from_file_location(
        "learning_gate", "/root/repo/tools/learning_gate.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_synth_dataset_generator(tmp_path):
    from yolov6_tpu.data.synth_detect import generate_synth_dataset

    yaml_path = generate_synth_dataset(
        str(tmp_path), n_train=6, n_val=3, img_size=128, nc=4, seed=1)
    assert osp.exists(yaml_path)
    import glob

    imgs = glob.glob(str(tmp_path / "images" / "train" / "*.jpg"))
    lbs = glob.glob(str(tmp_path / "labels" / "train" / "*.txt"))
    assert len(imgs) == 6 and len(lbs) == 6
    # labels are valid YOLO rows within [0,1]
    for lb in lbs:
        for row in open(lb).read().splitlines():
            vals = row.split()
            assert 0 <= int(vals[0]) < 4
            assert all(0.0 <= float(v) <= 1.0 for v in vals[1:])


def test_gate_threshold_tiers():
    """The TPU-recipe tier (epochs >= 30) must pin the tightened regression
    bar (0.75/0.20 — measured runs land at 0.88-0.94, docs/learning_gate.md);
    the CPU micro tier stays loose (0.50/0.10)."""
    gate = _load_gate()
    for epochs, want_map50, want_gain in ((40, 0.75, 0.20), (10, 0.50, 0.10)):
        args = gate.resolve_thresholds(gate.get_args_parser().parse_args(
            ["--out", "/tmp/x", "--epochs", str(epochs)]))
        assert args.min_map50 == want_map50 and args.min_gain == want_gain
    # explicit flags always win over the tier defaults
    args = gate.resolve_thresholds(gate.get_args_parser().parse_args(
        ["--out", "/tmp/x", "--epochs", "40", "--min-map50", "0.3",
         "--min-gain", "0.05"]))
    assert args.min_map50 == 0.3 and args.min_gain == 0.05


def test_learning_gate_learns(tmp_path):
    """Train a real yolov6n at tiny scale on trivially-easy single-shape
    images; mAP50 must clear chance and improve from first to last ckpt.
    Scale chosen so the whole gate stays ~10 min on the 1-core CPU host."""
    gate = _load_gate()
    args = gate.get_args_parser().parse_args([
        "--out", str(tmp_path),
        "--img-size", "96",
        "--n-train", "48",
        "--n-val", "16",
        "--epochs", "10",
        "--batch-size", "8",
        "--eval-points", "2",
        # thresholds scaled down for the micro run: above-chance + improving
        "--min-map50", "0.10",
        "--min-gain", "0.02",
        "--skip-exact-nms",
    ])
    rc = gate.main(args)
    result = json.load(open(tmp_path / "gate_result.json"))
    assert rc == 0, f"learning gate failed: {result}"
    traj = [p["map50"] for p in result["trajectory"]]
    assert result["final_map50"] >= 0.10
    assert traj[-1] >= traj[0]
    assert np.isfinite(traj).all()
