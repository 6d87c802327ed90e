"""End-to-end training smoke: tools/train.py main() on a tiny synthetic
dataset for 3 epochs incl. eval + checkpointing + strong-aug shutoff."""

import json
import os
import os.path as osp
import sys

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full train-step compiles: minutes each cold on 1 core
import yaml

import conftest


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("tinyds")
    rng = np.random.default_rng(0)
    names = ["a", "b", "c"]
    for split, n in (("train", 16), ("val", 4)):
        img_dir = root / "images" / split
        lb_dir = root / "labels" / split
        img_dir.mkdir(parents=True)
        lb_dir.mkdir(parents=True)
        for i in range(n):
            h, w = int(rng.integers(80, 160)), int(rng.integers(80, 160))
            img = rng.integers(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(str(img_dir / f"{split}{i:03d}.jpg"), img)
            rows = []
            for _ in range(int(rng.integers(1, 4))):
                bw, bh = rng.uniform(0.2, 0.5), rng.uniform(0.2, 0.5)
                cx = rng.uniform(bw / 2, 1 - bw / 2)
                cy = rng.uniform(bh / 2, 1 - bh / 2)
                rows.append(f"{int(rng.integers(0, 3))} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
            (lb_dir / f"{split}{i:03d}.txt").write_text("\n".join(rows) + "\n")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train": str(root / "images" / "train"),
        "val": str(root / "images" / "val"),
        "nc": 3, "names": names, "is_coco": False,
    }))
    return str(data_yaml)


def test_train_cli_end_to_end(tiny_dataset, tmp_path):
    sys.path.insert(0, "/root/repo/tools")
    import importlib.util

    spec = importlib.util.spec_from_file_location("train_cli", "/root/repo/tools/train.py")
    train_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_cli)

    args = train_cli.get_args_parser().parse_args([
        "--data-path", tiny_dataset,
        "--conf-file", "/root/repo/configs/yolov6n.py",
        "--img-size", "64",
        "--img-floor", "64",
        "--batch-size", "4",
        "--epochs", "3",
        "--workers", "2",
        "--eval-interval", "2",
        "--heavy-eval-range", "0",
        "--stop_aug_last_n_epoch", "1",
        "--output-dir", str(tmp_path),
        "--name", "smoke",
        "--max-labels", "8",
        "--log-interval", "2",
    ])
    train_cli.main(args)

    weights_dir = osp.join(args.save_dir, "weights")
    assert osp.exists(osp.join(weights_dir, "last_ckpt.msgpack"))
    # final epoch always evals; stripped checkpoint retains model weights
    from yolov6_tpu.utils.checkpoint import load_native_checkpoint

    ckpt = load_native_checkpoint(osp.join(weights_dir, "last_ckpt.msgpack"))
    assert "model" in ckpt
    assert osp.exists(osp.join(args.save_dir, "args.yaml"))


def test_train_resume(tiny_dataset, tmp_path):
    """Train 2 epochs, then resume for 1 more from last_ckpt
    (reference: tools/train.py:69-83, engine.py:78-89)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("train_cli2", "/root/repo/tools/train.py")
    train_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_cli)

    base = [
        "--data-path", tiny_dataset,
        "--conf-file", "/root/repo/configs/yolov6n.py",
        "--img-size", "64", "--img-floor", "64",
        "--batch-size", "4", "--workers", "2",
        "--eval-final-only", "--stop_aug_last_n_epoch", "0",
        "--output-dir", str(tmp_path), "--name", "resume_smoke",
        "--max-labels", "8",
    ]
    # per-epoch checkpoints keep full train state (last/best get stripped at
    # the end of a completed run, as in the reference)
    args = train_cli.get_args_parser().parse_args(
        base + ["--epochs", "2", "--save_ckpt_on_last_n_epoch", "2"]
    )
    train_cli.main(args)
    ckpt_path = osp.join(args.save_dir, "weights", "1_ckpt.msgpack")
    assert osp.exists(ckpt_path)

    # resume restores the run's args.yaml wholesale (reference
    # tools/train.py:69-83), so extending a run is done the reference-user
    # way: edit args.yaml, then bare --resume. An --epochs flag on the
    # resume command line is intentionally overridden by the stored args.
    from yolov6_tpu.utils.events import load_yaml, save_yaml

    args_yaml = osp.join(args.save_dir, "args.yaml")
    saved = load_yaml(args_yaml)
    saved["epochs"] = 3
    save_yaml(saved, args_yaml)

    args2 = train_cli.get_args_parser().parse_args(
        base + ["--epochs", "7", "--resume", ckpt_path]
    )
    train_cli.main(args2)
    assert args2.epochs == 3  # args.yaml wins over the CLI flag
    from yolov6_tpu.utils.checkpoint import load_native_checkpoint

    ckpt = load_native_checkpoint(osp.join(args.save_dir, "weights", "last_ckpt.msgpack"))
    assert int(ckpt["epoch"]) == 2  # resumed and ran the third epoch

    # resuming a finished run is a no-op that must not crash (epoch loop
    # runs zero times) and must leave the stripped checkpoint in place:
    # 1_ckpt holds epoch 1, so epochs=2 puts start_epoch == max_epoch
    saved["epochs"] = 2
    save_yaml(saved, args_yaml)
    args3 = train_cli.get_args_parser().parse_args(base + ["--resume", ckpt_path])
    train_cli.main(args3)
    ckpt = load_native_checkpoint(osp.join(args.save_dir, "weights", "last_ckpt.msgpack"))
    assert int(ckpt["epoch"]) == 2


def test_train_orbax_backend_and_resume(tiny_dataset, tmp_path):
    """--ckpt-backend orbax: async sharded checkpoints + resume from the
    orbax root + final stripped msgpack export (utils/orbax_ckpt.py)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("train_cli3", "/root/repo/tools/train.py")
    train_cli = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(train_cli)

    base = [
        "--data-path", tiny_dataset,
        "--conf-file", "/root/repo/configs/yolov6n.py",
        "--img-size", "64", "--img-floor", "64",
        "--batch-size", "4", "--workers", "2",
        "--eval-final-only", "--stop_aug_last_n_epoch", "0",
        "--output-dir", str(tmp_path), "--name", "orbax_smoke",
        "--max-labels", "8", "--ckpt-backend", "orbax",
    ]
    args = train_cli.get_args_parser().parse_args(base + ["--epochs", "2"])
    train_cli.main(args)

    orbax_root = osp.join(args.save_dir, "weights", "orbax")
    from yolov6_tpu.utils.orbax_ckpt import OrbaxCheckpointer, is_orbax_checkpoint

    assert is_orbax_checkpoint(orbax_root)
    ck = OrbaxCheckpointer(orbax_root, async_save=False)
    assert ck.latest_step() == 1
    ck.close()
    # strip_model exported a backend-agnostic msgpack of the EMA weights
    from yolov6_tpu.utils.checkpoint import load_native_checkpoint

    stripped = load_native_checkpoint(osp.join(args.save_dir, "weights", "best_ckpt.msgpack"))
    assert "params" in stripped["model"]

    # extend the run the reference way: edit args.yaml, then --resume
    # (restored args override resume-command flags; see test_train_resume)
    from yolov6_tpu.utils.events import load_yaml, save_yaml

    args_yaml = osp.join(args.save_dir, "args.yaml")
    saved = load_yaml(args_yaml)
    saved["epochs"] = 3
    save_yaml(saved, args_yaml)

    args2 = train_cli.get_args_parser().parse_args(base + ["--resume", orbax_root])
    train_cli.main(args2)
    ck = OrbaxCheckpointer(orbax_root, async_save=False)
    assert ck.latest_step() == 2  # resumed from epoch 1, ran the third epoch
    ck.close()
