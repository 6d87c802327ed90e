#!/usr/bin/env python3
"""Evaluation CLI (reference: tools/eval.py).

Also importable as ``tools.eval.run(...)`` — the in-training eval API used by
the trainer (reference: core/engine.py:224).
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax.numpy as jnp

from yolov6_tpu.core.evaler import Evaler
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.checkpoint import load_checkpoint_variables
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER
from yolov6_tpu.utils.general import increment_name


def get_args_parser(add_help=True):
    parser = argparse.ArgumentParser(description="YOLOv6-TPU COCO Evaluation", add_help=add_help)
    parser.add_argument("--data", type=str, default="./data/coco.yaml")
    parser.add_argument("--weights", type=str, default="./weights/yolov6s.msgpack")
    parser.add_argument("--config", type=str, default="./configs/yolov6s.py",
                        help="model config (needed to rebuild the graph)")
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--conf-thres", type=float, default=0.03)
    parser.add_argument("--iou-thres", type=float, default=0.65)
    parser.add_argument("--task", default="val", help="val, test or speed")
    parser.add_argument("--half", default=True, action="store_true", help="bf16 inference")
    parser.add_argument("--save_dir", type=str, default="runs/val/")
    parser.add_argument("--name", type=str, default="exp")
    parser.add_argument("--shrink_size", type=int, default=0)
    parser.add_argument("--infer_on_rect", default=False, action="store_true")
    parser.add_argument("--reproduce_640_eval", default=False, action="store_true")
    parser.add_argument("--eval_config_file", type=str,
                        default="./configs/experiment/eval_640_repro.py")
    parser.add_argument("--verbose", default=False, action="store_true")
    parser.add_argument("--specific-shape", action="store_true")
    parser.add_argument("--height", type=int, default=640)
    parser.add_argument("--width", type=int, default=640)
    parser.add_argument("--artifact", type=str, default=None,
                        help="evaluate an exported StableHLO end2end artifact "
                             "(the reference's TRT-engine eval analog)")
    parser.add_argument("--config-file", default="", type=str,
                        help="experiment config whose eval_params override CLI "
                             "args; lower priority than --reproduce_640_eval "
                             "(reference: tools/eval.py:52-67)")
    parser.add_argument("--max-nms", type=int, default=8192,
                        help="NMS candidate cap (fidelity measured in "
                             "docs/nms_fidelity.md)")
    parser.add_argument("--bf16-select", action="store_true",
                        help="rank NMS candidates on a bf16 score grid "
                             "(fp32 re-score; see docs/nms_fidelity.md)")
    parser.add_argument("--row-select", choices=("grouped", "topk"),
                        default="grouped",
                        help="per-anchor class pre-reduction: 'grouped' "
                             "(residue-group max, fastest) or 'topk' (exact "
                             "per-anchor top-C; see docs/nms_fidelity.md)")
    parser.add_argument("--do_pr_metric", action="store_true")
    parser.add_argument("--plot_curve", default=True,
                        type=lambda s: s.lower() not in ("false", "0", "no"),
                        help="save PR/F1/P/R curve PNGs with --do_pr_metric "
                             "(reference: tools/eval.py:42)")
    parser.add_argument("--plot_confusion_matrix", action="store_true")
    return parser


def run(
    data,
    weights=None,
    config=None,
    batch_size=32,
    img_size=640,
    conf_thres=0.03,
    iou_thres=0.65,
    task="val",
    half=True,
    model=None,
    variables=None,
    dataloader=None,
    save_dir="",
    shrink_size=0,
    infer_on_rect=False,
    verbose=False,
    do_coco_metric=True,
    do_pr_metric=False,
    plot_curve=False,
    plot_confusion_matrix=False,
    specific_shape=False,
    height=640,
    width=640,
    artifact=None,
    max_nms=8192,
    bf16_select=False,
    row_select="grouped",
):
    """Evaluate a model; mirrors reference tools/eval.py:run (:88-159)."""
    Evaler.check_task(task)
    if task == "train":
        save_dir = save_dir
    else:
        os.makedirs(save_dir, exist_ok=True)
    Evaler.check_thres(conf_thres, iou_thres, task)

    if not isinstance(data, dict):
        data = Evaler.reload_dataset(data, task) if isinstance(data, str) else data

    evaler = Evaler(
        data, batch_size, img_size, conf_thres, iou_thres, half, save_dir,
        shrink_size, infer_on_rect, verbose, specific_shape, height, width,
        max_nms=max_nms, bf16_select=bf16_select, row_select=row_select,
        do_coco_metric=do_coco_metric, do_pr_metric=do_pr_metric,
        plot_curve=plot_curve, plot_confusion_matrix=plot_confusion_matrix,
    )
    if artifact:
        model = evaler.init_artifact(artifact, num_classes=data["nc"])
    elif model is None:
        cfg = Config.fromfile(config)
        model = build_model(
            cfg, num_classes=data["nc"], deploy=True,
            dtype=jnp.bfloat16 if half else jnp.float32,
        )
        if weights and not os.path.exists(weights):
            # reference Evaler.init_model (core/evaler.py:64-66): missing
            # weights trigger a release-download attempt before loading
            from yolov6_tpu.utils.general import download_ckpt

            download_ckpt(weights)
        variables = load_checkpoint_variables(
            weights, model, img_size=(height, width) if specific_shape else (img_size, img_size),
            deploy=True, training_mode=cfg.get("training_mode", "repvgg"),
        )
        evaler.init_model(model, variables)
    else:
        evaler.init_model(model, variables)
    if task == "speed" and artifact is None:
        evaler.measure_speed(batch_size)
        return (0.0, 0.0), []
    dataloader = evaler.init_data(dataloader, task)
    pred_result = evaler.predict_model(model, dataloader, task)
    eval_result = evaler.eval_model(pred_result, model, dataloader, task)
    evaler.eval_speed(task)
    return eval_result, pred_result


def main(args):
    if args.config_file:
        # eval_params override CLI args; list values mean [train_eval, standalone]
        # and the STANDALONE slot (index 1) applies here — the trainer's
        # in-training eval takes index 0 (reference: tools/eval.py:52-67 vs
        # core/engine.py:237-242)
        assert os.path.exists(args.config_file), f"config file {args.config_file} not found"
        cfg = Config.fromfile(args.config_file)
        for key, value in (cfg.get("eval_params") or {}).items():
            if key not in args.__dict__:
                LOGGER.info(f"Unrecognized config {key}, continue")
                continue
            if isinstance(value, list):
                if value[1] is not None:
                    args.__dict__[key] = value[1]
            elif value is not None:
                args.__dict__[key] = value
    if args.reproduce_640_eval:
        cfg = Config.fromfile(args.eval_config_file)
        model_key = osp.splitext(osp.basename(args.config))[0]
        eval_params = cfg.eval_params.get(model_key, cfg.eval_params["default"])
        args.shrink_size = eval_params.get("shrink_size", args.shrink_size)
        args.infer_on_rect = eval_params.get("infer_on_rect", args.infer_on_rect)
        args.img_size = eval_params.get("img_size", args.img_size)
        # forced repro params (reference: tools/eval.py:78-82)
        args.conf_thres = 0.03
        args.iou_thres = 0.65
        args.task = "val"
    save_dir = str(increment_name(osp.join(args.save_dir, args.name)))
    os.makedirs(save_dir, exist_ok=True)
    run(
        args.data, args.weights, args.config, args.batch_size, args.img_size,
        args.conf_thres, args.iou_thres, args.task, args.half,
        save_dir=save_dir, shrink_size=args.shrink_size,
        infer_on_rect=args.infer_on_rect, verbose=args.verbose,
        do_pr_metric=args.do_pr_metric, plot_curve=args.plot_curve,
        plot_confusion_matrix=args.plot_confusion_matrix,
        specific_shape=args.specific_shape, height=args.height, width=args.width,
        artifact=args.artifact, max_nms=args.max_nms,
        bf16_select=args.bf16_select,
        row_select=args.row_select,
    )


if __name__ == "__main__":
    main(get_args_parser().parse_args())
