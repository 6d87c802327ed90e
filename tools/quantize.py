#!/usr/bin/env python3
"""PTQ calibration CLI (reference: tools/qat + tools/partial_quantization).

Calibrates INT8 activation ranges over training batches, fake-quantizes conv
weights per-channel, optionally evaluates, and saves a quantized checkpoint
(params + 'quant' amax collection)."""

from __future__ import annotations

import argparse
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax.numpy as jnp

from yolov6_tpu.data.data_load import create_dataloader
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.quant import set_quant_mode
from yolov6_tpu.quant.ptq import calibrate, quantize_variables
from yolov6_tpu.utils.checkpoint import load_checkpoint_variables, save_checkpoint
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER, load_yaml


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", required=True)
    parser.add_argument("--config", required=True)
    parser.add_argument("--data", required=True)
    parser.add_argument("--img-size", type=int, default=640)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--calib-batches", type=int, default=32)
    parser.add_argument("--num-bits", type=int, default=8)
    parser.add_argument("--skip-layers", nargs="*", default=[],
                        help="path substrings to keep in fp (sensitive layers)")
    parser.add_argument("--output", default=None)
    parser.add_argument("--eval", action="store_true", help="run COCO eval after PTQ")
    args = parser.parse_args()

    data_dict = load_yaml(args.data)
    cfg = Config.fromfile(args.config)
    model = build_model(cfg, num_classes=data_dict["nc"], deploy=True)
    variables = load_checkpoint_variables(
        args.weights, model, img_size=(args.img_size, args.img_size), deploy=True,
        training_mode=cfg.get("training_mode", "repvgg"),
    )

    loader, _ = create_dataloader(
        data_dict["train"], args.img_size, args.batch_size, data_dict=data_dict, task="train"
    )
    qvars = calibrate(
        model, variables, iter(loader), num_bits=args.num_bits,
        skip_patterns=args.skip_layers, max_batches=args.calib_batches,
    )
    qvars = quantize_variables(qvars, args.num_bits, args.skip_layers)

    output = args.output or args.weights.rsplit(".", 1)[0] + f"_ptq{args.num_bits}.msgpack"
    save_checkpoint({"model": qvars, "quant_bits": args.num_bits}, False,
                    osp.dirname(output) or ".", osp.splitext(osp.basename(output))[0])
    LOGGER.info(f"PTQ checkpoint saved to {output}")

    if args.eval:
        from yolov6_tpu.core.evaler import Evaler

        evaler = Evaler(data_dict, batch_size=args.batch_size, img_size=args.img_size,
                        save_dir=osp.dirname(output) or ".")
        evaler.init_model(model, qvars)
        dataloader = evaler.init_data(None, "val")
        preds = evaler.predict_model(model, dataloader, "val")
        evaler.eval_model(preds, model, dataloader, "val")
    set_quant_mode(False)


if __name__ == "__main__":
    main()
