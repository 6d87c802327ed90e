#!/usr/bin/env python3
"""Training CLI (reference: tools/train.py)."""

from __future__ import annotations

import argparse
import os
import os.path as osp
import random
import sys

import numpy as np

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER, save_yaml
from yolov6_tpu.utils.general import check_img_size, find_latest_checkpoint, increment_name


def get_args_parser(add_help=True):
    parser = argparse.ArgumentParser(description="YOLOv6-TPU Training", add_help=add_help)
    parser.add_argument("--data-path", default="./data/coco.yaml", type=str)
    parser.add_argument("--conf-file", default="./configs/yolov6n.py", type=str)
    parser.add_argument("--img-size", default=640, type=int)
    parser.add_argument("--rect", action="store_true")
    parser.add_argument("--batch-size", default=32, type=int, help="global batch size")
    parser.add_argument("--epochs", default=400, type=int)
    parser.add_argument("--workers", default=8, type=int)
    parser.add_argument("--eval-interval", default=20, type=int)
    parser.add_argument("--eval-final-only", action="store_true")
    parser.add_argument("--heavy-eval-range", default=50, type=int)
    parser.add_argument("--check-images", action="store_true")
    parser.add_argument("--check-labels", action="store_true")
    parser.add_argument("--output-dir", default="./runs/train", type=str)
    parser.add_argument("--name", default="exp", type=str)
    parser.add_argument("--dist_url", default="env://", type=str, help="unused; kept for parity")
    parser.add_argument("--gpu_count", type=int, default=0, help="unused; kept for parity")
    parser.add_argument("--resume", nargs="?", const=True, default=False)
    parser.add_argument("--write_trainbatch_tb", action="store_true")
    parser.add_argument("--stop_aug_last_n_epoch", default=15, type=int)
    parser.add_argument("--save_ckpt_on_last_n_epoch", default=-1, type=int)
    parser.add_argument("--distill", action="store_true")
    parser.add_argument("--distill_feat", action="store_true")
    parser.add_argument("--quant", action="store_true")
    parser.add_argument("--calib", action="store_true")
    parser.add_argument("--teacher_model_path", type=str, default=None)
    parser.add_argument("--temperature", type=int, default=20)
    parser.add_argument("--fuse_ab", action="store_true")
    parser.add_argument("--bs_per_device", default=None, type=int,
                        help="per-device batch used to rescale lr0 (reference --bs_per_gpu)")
    parser.add_argument("--specific-shape", action="store_true")
    parser.add_argument("--height", type=int, default=None)
    parser.add_argument("--width", type=int, default=None)
    parser.add_argument("--cache-ram", action="store_true")
    parser.add_argument("--cache", default=None, choices=["ram", "disk"],
                        help="decoded-image cache tier (disk = per-image .npy "
                             "served from the page cache; TPU-host extension)")
    parser.add_argument("--max-labels", type=int, default=120,
                        help="fixed per-image label padding for the jit step")
    parser.add_argument("--seed", type=int, default=1)
    parser.add_argument("--log-interval", type=int, default=50)
    parser.add_argument("--img-floor", type=int, default=256,
                        help="minimum training image size (reference floors at 256)")
    parser.add_argument("--profile", action="store_true",
                        help="write a jax.profiler trace to <save_dir>/profile")
    parser.add_argument("--ckpt-backend", default="msgpack",
                        choices=["msgpack", "orbax"],
                        help="orbax = async + sharded checkpointing "
                             "(multi-host; utils/orbax_ckpt.py)")
    parser.add_argument("--bf16", action="store_true",
                        help="bf16 activations (the reference's AMP analog)")
    return parser


def check_and_init(args):
    """(reference: tools/train.py:65-109)"""
    if args.resume:
        checkpoint_path = (
            args.resume if isinstance(args.resume, str) else find_latest_checkpoint()
        )
        assert os.path.exists(checkpoint_path), f"resume checkpoint {checkpoint_path} not found"
        save_dir = osp.dirname(osp.dirname(osp.normpath(checkpoint_path)))
        # Reload the run's saved args so a bare --resume reproduces the
        # original configuration (reference: tools/train.py:69-83). The
        # resume path itself wins over the stored one.
        args_yaml = osp.join(save_dir, "args.yaml")
        if osp.exists(args_yaml):
            from yolov6_tpu.utils.events import load_yaml

            saved = load_yaml(args_yaml)
            saved.pop("resume", None)
            vars(args).update(saved)
        else:
            LOGGER.warning(f"no args.yaml found under {save_dir}; using CLI args")
        args.save_dir = save_dir
        args.resume = checkpoint_path
        LOGGER.info(f"Resume training from checkpoint {checkpoint_path}")
    else:
        args.save_dir = str(increment_name(osp.join(args.output_dir, args.name)))
        os.makedirs(args.save_dir, exist_ok=True)

    cfg = Config.fromfile(args.conf_file)
    if "training_mode" not in cfg:
        cfg.training_mode = "repvgg"

    floor = getattr(args, "img_floor", 256)
    if args.specific_shape:
        args.height = check_img_size(args.height, 32, floor=floor)
        args.width = check_img_size(args.width, 32, floor=floor)
    else:
        args.img_size = check_img_size(args.img_size, 32, floor=floor)

    random.seed(args.seed)
    np.random.seed(args.seed)

    save_yaml(vars(args), osp.join(args.save_dir, "args.yaml"))
    return cfg


def main(args):
    from yolov6_tpu.core.engine import Trainer
    from yolov6_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()
    cfg = check_and_init(args)
    trainer = Trainer(args, cfg)
    if args.quant and args.calib:
        trainer.calibrate()
        return
    if getattr(args, "profile", False):
        import jax

        jax.profiler.start_trace(osp.join(args.save_dir, "profile"))
        try:
            trainer.train()
        finally:
            jax.profiler.stop_trace()
    else:
        trainer.train()


if __name__ == "__main__":
    main(get_args_parser().parse_args())
