#!/usr/bin/env python3
"""Export CLI: serialize a serving graph to StableHLO (default; preproc +
model + decode + optional NMS) or ONNX (--format onnx; model + decode, the
reference's standard export contract — reference: deploy/ONNX/export_onnx.py).
The ONNX path converts the same JAX graph that serves on TPU
(yolov6_tpu/export/onnx_export.py) with zero vendor dependencies."""

from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import jax.numpy as jnp

from yolov6_tpu.models.end2end import export_stablehlo, make_end2end_fn
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.checkpoint import load_checkpoint_variables
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER


def _export_openvino(onnx_path: str, output_dir: str | None) -> None:
    """ONNX -> OpenVINO IR via the model-optimizer CLI, mirroring the
    reference's subprocess flow (reference:
    deploy/OpenVINO/export_openvino.py:23-94: torch.onnx.export then
    ``mo --input_model ... --output_dir ...``). The optimizer itself is
    vendor tooling and not bundled; a clear error points at it."""
    import shutil
    import subprocess

    mo = shutil.which("mo") or shutil.which("ovc")
    if mo is None:
        raise SystemExit(
            "OpenVINO model optimizer (`mo`/`ovc`) not found on PATH — "
            "install the openvino-dev package on the deploy host and re-run, "
            f"or consume the ONNX file already written to {onnx_path}"
        )
    out_dir = output_dir or (onnx_path.rsplit(".", 1)[0] + "_openvino")
    if osp.basename(mo) == "ovc":  # OpenVINO >= 2023 converter
        cmd = [mo, onnx_path, "--output_model",
               osp.join(out_dir, osp.basename(onnx_path).rsplit(".", 1)[0])]
    else:
        cmd = [mo, "--input_model", onnx_path, "--output_dir", out_dir]
    LOGGER.info(f"Running: {' '.join(cmd)}")
    res = subprocess.run(cmd)
    if res.returncode != 0:
        raise SystemExit(f"model optimizer failed with rc={res.returncode}")
    LOGGER.info(f"Exported OpenVINO IR to {out_dir}")


def _export_tensorrt(onnx_path: str, output: str | None, dtype: str) -> None:
    """ONNX -> TensorRT engine via the ``trtexec`` CLI, mirroring the
    reference's builder flow (reference: deploy/TensorRT/onnx_to_trt.py:59-127
    builds an engine with fp16/int8 BuilderFlags from the exported ONNX).
    TensorRT is NVIDIA vendor tooling and not bundled; a clear error points
    at it. INT8 engines should come from a QDQ ONNX (--quant; the reference's
    QAT path, onnx_to_trt.py:69-80 with qat=True) — calibration-based PTQ
    lives in tools/quantize.py on the TPU side."""
    import shutil
    import subprocess

    trtexec = shutil.which("trtexec")
    if trtexec is None:
        raise SystemExit(
            "`trtexec` not found on PATH — install TensorRT on the deploy "
            "host (the engine must be built on the GPU that serves it) and "
            f"re-run, or consume the ONNX file already written to {onnx_path}"
        )
    engine = output or (onnx_path.rsplit(".", 1)[0] + ".trt")
    cmd = [trtexec, f"--onnx={onnx_path}", f"--saveEngine={engine}"]
    if dtype == "fp16":
        cmd.append("--fp16")
    elif dtype == "int8":
        cmd += ["--int8", "--fp16"]  # QDQ ranges drive int8; fp16 fallback
    LOGGER.info(f"Running: {' '.join(cmd)}")
    res = subprocess.run(cmd)
    if res.returncode != 0:
        raise SystemExit(f"trtexec failed with rc={res.returncode}")
    LOGGER.info(f"Built TensorRT engine {engine}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--weights", type=str, required=True)
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--img-size", nargs="+", type=int, default=[640, 640])
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--num-classes", type=int, default=80)
    parser.add_argument("--half", action="store_true", help="bf16 compute")
    parser.add_argument("--end2end", action="store_true", help="include NMS in graph")
    parser.add_argument("--trt-version", type=int, default=0, choices=(0, 7, 8),
                        help="ONNX --end2end: emit the TensorRT NMS plugin "
                             "contract instead of ORT NonMaxSuppression "
                             "(8 = EfficientNMS_TRT, 7 = BatchedNMSDynamic_TRT; "
                             "reference: yolov6/models/end2end.py:30-137)")
    parser.add_argument("--with-preprocess", action="store_true",
                        help="fold BGR->RGB + /255 into the graph")
    parser.add_argument("--conf-thres", type=float, default=0.25)
    parser.add_argument("--iou-thres", type=float, default=0.45)
    parser.add_argument("--max-det", type=int, default=100)
    parser.add_argument("--platforms", nargs="+", default=None,
                        help="e.g. tpu cpu — multi-platform artifact")
    parser.add_argument("--weights-as-args", action="store_true",
                        help="stablehlo only: export the module with the "
                             "weights as runtime arguments plus a "
                             "<output>.weights.msgpack sidecar instead of "
                             "embedding them as HLO constants. Required for "
                             "M6/L6-sized models on size-capped "
                             "remote-compile paths (HTTP 413 through the "
                             "axon tunnel; docs/Test_speed.md)")
    parser.add_argument("--shard-devices", type=int, default=1,
                        help="export a GSPMD artifact with the batch sharded "
                             "over an N-device data mesh (one artifact "
                             "serves a multi-chip batch)")
    parser.add_argument("--engine-dtype", choices=("fp32", "fp16", "int8"),
                        default="fp16",
                        help="--format tensorrt: engine precision (reference: "
                             "deploy/TensorRT/onnx_to_trt.py --dtype)")
    parser.add_argument("--format",
                        choices=("stablehlo", "onnx", "openvino", "tensorrt",
                                 "torchscript", "ncnn"),
                        default="stablehlo",
                        help="onnx = model+decode opset-13 graph "
                             "(--end2end adds in-graph NonMaxSuppression); "
                             "openvino = ONNX then OpenVINO model-optimizer "
                             "IR via `mo` (reference: "
                             "deploy/OpenVINO/export_openvino.py:23-94); "
                             "tensorrt = ONNX then a TRT engine via "
                             "`trtexec` (pair with --end2end "
                             "--trt-version 8; reference: "
                             "deploy/TensorRT/onnx_to_trt.py:59-127); "
                             "torchscript = traced torch graph for "
                             "PNNX/NCNN (reference: "
                             "deploy/NCNN/export_torchscript.py); "
                             "ncnn = direct .param/.bin emit for the lite "
                             "family (the artifacts the reference ships in "
                             "deploy/NCNN/Android app assets; --half stores "
                             "fp16 weights like the shipped assets)")
    parser.add_argument("--quant", action="store_true",
                        help="ONNX only: INT8 QDQ export from a PTQ/QAT "
                             "checkpoint (QuantizeLinear/DequantizeLinear "
                             "pairs + int8 weights; needs the 'quant' amax "
                             "collection written by tools/quantize.py)")
    parser.add_argument("--num-bits", type=int, default=8)
    parser.add_argument("--dynamic-batch", action="store_true",
                        help="ONNX only: export with a dynamic batch "
                             "dimension (reference export_onnx.py flag)")
    parser.add_argument("--check", action="store_true", help="round-trip sanity check")
    parser.add_argument("--cpu", action="store_true",
                        help="force the CPU backend (the axon TPU plugin "
                             "ignores JAX_PLATFORMS=cpu)")
    parser.add_argument("--runner-dir", type=str, default=None,
                        help="also write the raw-StableHLO artifact directory "
                             "for the native C++ PJRT runner")
    args = parser.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if len(args.img_size) == 1:
        args.img_size = args.img_size * 2

    onnx_half = False
    if args.format == "onnx" and args.half:
        # trace in fp32 (bf16 has no ONNX consumer story); convert the
        # serialized graph to fp16 post-hoc (reference: model.half() export)
        onnx_half, args.half = True, False
        if args.quant or args.end2end:
            raise SystemExit("--half (fp16 ONNX) is incompatible with "
                             "--quant (int8 QDQ) and --end2end "
                             "(NonMaxSuppression requires fp32 inputs)")

    ncnn_fp16 = False
    if args.format == "ncnn":
        if args.end2end or args.dynamic_batch or args.quant:
            raise SystemExit(
                "--format ncnn emits the raw-head lite graph consumed by "
                "the reference's yolo.cpp (decode+NMS live in the app) — "
                "incompatible with --end2end/--dynamic-batch/--quant")
        # --half selects fp16 WEIGHT STORAGE (like the shipped assets),
        # not bf16 compute
        ncnn_fp16, args.half = args.half, False

    if args.format == "torchscript" and (
        args.end2end or args.dynamic_batch or args.half
    ):
        raise SystemExit(
            "--format torchscript exports the plain model+decode graph "
            "(the reference TorchScript/NCNN contract, "
            "deploy/NCNN/export_torchscript.py) — it is incompatible with "
            "--end2end, --dynamic-batch and --half"
        )

    cfg = Config.fromfile(args.config)
    model = build_model(
        cfg, num_classes=args.num_classes, deploy=True,
        dtype=jnp.bfloat16 if args.half else jnp.float32,
    )
    variables = load_checkpoint_variables(
        args.weights, model, img_size=tuple(args.img_size), deploy=True,
        training_mode=cfg.get("training_mode", "repvgg"),
    )

    if args.format == "ncnn":
        import numpy as np

        from yolov6_tpu.export.ncnn_export import export_ncnn

        prefix = (args.output or args.weights).rsplit(".", 1)[0]
        t0 = time.time()
        param_path, bin_path = export_ncnn(
            model, variables, prefix, fp16=ncnn_fp16)
        LOGGER.info(f"Exported NCNN to {param_path} + {bin_path} in "
                    f"{time.time() - t0:.1f}s"
                    + (" (fp16 weights)" if ncnn_fp16 else ""))
        if args.check:
            import jax

            from yolov6_tpu.export.ncnn_numpy import NcnnRunner

            rng = np.random.default_rng(0)
            img = rng.uniform(0, 1, (*args.img_size, 3)).astype(np.float32)
            blobs = NcnnRunner(param_path, bin_path)(img.transpose(2, 0, 1))
            head_out, _ = model.apply(variables, jnp.asarray(img[None]),
                                      train=False)
            tol = 2e-2 if ncnn_fp16 else 2e-4
            for i in range(model.detect.num_layers):
                want = np.concatenate([
                    np.asarray(jax.nn.sigmoid(head_out["cls"][i][0])),
                    np.asarray(head_out["reg"][i][0]),
                ], -1).transpose(2, 0, 1)
                np.testing.assert_allclose(blobs[f"out{i}"], want,
                                           rtol=tol, atol=tol)
            LOGGER.info("Round-trip OK (ncnn numpy executor == model)")
        return

    if args.weights_as_args and (args.format != "stablehlo" or args.runner_dir):
        raise SystemExit(
            "--weights-as-args only applies to --format stablehlo without "
            "--runner-dir (the native PJRT runner consumes a single-input "
            "module with embedded weights)"
        )

    if args.end2end and args.format != "onnx":
        serve = make_end2end_fn(
            model, variables, args.conf_thres, args.iou_thres, args.max_det,
            with_preprocess=args.with_preprocess, half=args.half,
            weights_as_args=args.weights_as_args,
        )
    else:
        from yolov6_tpu.models.effidehead import decode_eval

        def _serve(vs, images):
            x = images.astype(jnp.bfloat16 if args.half else jnp.float32)
            if args.with_preprocess:
                x = x[..., ::-1] / 255.0
            head_out, _ = model.apply(vs, x, train=False)
            return decode_eval(
                head_out, model.num_classes, model.strides, model.use_dfl, model.reg_max
            )

        if args.weights_as_args:
            serve = _serve
        else:
            def serve(images):
                return _serve(variables, images)

    if args.format in ("onnx", "openvino", "tensorrt", "torchscript"):
        import numpy as np

        from yolov6_tpu.export.onnx_export import export_onnx

        # vendor targets consume an intermediate ONNX next to the weights;
        # --output then names the vendor artifact, not the ONNX
        vendor = args.format in ("openvino", "tensorrt", "torchscript")
        output = args.weights.rsplit(".", 1)[0] + ".onnx" if vendor \
            else (args.output or args.weights.rsplit(".", 1)[0] + ".onnx")
        in_dtype = jnp.uint8 if args.with_preprocess else jnp.float32
        if args.dynamic_batch and args.end2end:
            raise SystemExit("--dynamic-batch is not supported with --end2end "
                             "(the NMS tail bakes per-batch constants)")
        # dynamic batch: trace at a large prime sentinel so the batch dim is
        # uniquely identifiable in shape constants, then rewrite
        sentinel = 509
        import jax as _jax

        example = (
            _jax.ShapeDtypeStruct((sentinel, *args.img_size, 3), in_dtype)
            if args.dynamic_batch
            else jnp.zeros((args.batch_size, *args.img_size, 3), in_dtype)
        )
        nms = (
            dict(max_obj=args.max_det, iou_thres=args.iou_thres,
                 score_thres=args.conf_thres,
                 trt_version=args.trt_version or None)
            if args.end2end else None
        )
        t0 = time.time()
        if args.quant:
            from yolov6_tpu.quant.fake_quant import set_quant_mode

            if "quant" not in variables:
                raise SystemExit(
                    "--quant needs a PTQ/QAT checkpoint carrying the 'quant' "
                    "amax collection (produce one with tools/quantize.py)"
                )
            set_quant_mode(True, num_bits=args.num_bits)
        rng = np.random.default_rng(0)
        chk_shape = (
            (3, *args.img_size, 3) if args.dynamic_batch else example.shape
        )
        x_chk = rng.uniform(0, 255 if args.with_preprocess else 1,
                            chk_shape).astype(example.dtype)
        want = None
        try:
            data = export_onnx(
                serve, (example,),
                input_names=["images"],
                output_names=None if args.end2end else ["outputs"],
                nms=nms,
                graph_name=osp.basename(args.config).rsplit(".", 1)[0],
                doc=f"yolov6-tpu export of {args.weights}")
            if args.quant:
                from yolov6_tpu.export.onnx_quant import (
                    remove_qdq, save_calib_cache_file, to_qdq,
                )

                data = to_qdq(data, args.num_bits)
                # TRT implicit-int8 companion artifacts: a plain fp32 graph +
                # calibration cache (reference tools/qat/onnx_utils.py:280-288
                # get_remove_qdq_onnx_and_cache)
                plain, act_map = remove_qdq(data)
                base = output.rsplit(".", 1)[0]
                with open(base + "_remove_qdq.onnx", "wb") as f:
                    f.write(plain)
                save_calib_cache_file(
                    base + "_remove_qdq_calibration.cache", act_map)
                LOGGER.info(
                    f"Wrote implicit-int8 companions: {base}_remove_qdq.onnx "
                    f"+ calibration cache ({len(act_map)} activation scales)")
            if args.dynamic_batch or onnx_half:
                from yolov6_tpu.export.onnx_export import make_dynamic_batch
                from yolov6_tpu.export.onnx_proto import parse_model
                from yolov6_tpu.export.onnx_quant import encode_parsed, to_fp16

                m = parse_model(data)
                if args.dynamic_batch:
                    make_dynamic_batch(m, sentinel)
                if onnx_half:
                    to_fp16(m)
                data = encode_parsed(m, opset=m.opset or 13)
            with open(output, "wb") as f:
                f.write(data)
            if args.check and not args.end2end:
                # reference output from the SAME graph mode (quant incl.)
                import jax

                want = np.asarray(jax.jit(serve)(jnp.asarray(x_chk)))
        finally:
            if args.quant:
                set_quant_mode(False)
        e2e_kind = ""
        if nms:
            e2e_kind = (
                f" (end2end: TRT{args.trt_version} NMS plugin)"
                if args.trt_version else " (end2end: in-graph NonMaxSuppression)"
            )
        LOGGER.info(f"Exported ONNX to {output} in {time.time() - t0:.1f}s"
                    + e2e_kind
                    + (f" (INT8 QDQ, {args.num_bits}-bit)" if args.quant else ""))
        if args.check and args.end2end and args.trt_version:
            LOGGER.info("--check skipped: TRT plugin ops only execute inside "
                        "TensorRT (graph structure is covered by "
                        "tests/test_onnx_export.py)")
        elif args.check:
            from yolov6_tpu.export.onnx_numpy import OnnxRunner

            outs = OnnxRunner(data)(
                x_chk.astype(np.float16) if onnx_half else x_chk
            )
            if args.end2end:
                num_det, det_boxes, det_scores, det_classes = outs
                assert int(num_det.sum()) == int((det_scores > 0).sum())
                LOGGER.info(f"Round-trip OK (end2end): shapes "
                            f"{[tuple(o.shape) for o in outs]}, "
                            f"num_dets={num_det.ravel().tolist()}")
            else:
                # fp16 checks are loose: the numpy oracle accumulates conv
                # sums in fp16 (real runtimes accumulate fp32)
                atol, rtol = (0.5, 0.05) if onnx_half else (5e-4, 1e-4)
                np.testing.assert_allclose(
                    outs[0].astype(np.float32), want, atol=atol, rtol=rtol
                )
                LOGGER.info(f"Round-trip OK (numpy interpreter matches JAX); "
                            f"output {outs[0].shape}")
        if args.format == "openvino":
            _export_openvino(output, args.output)
        elif args.format == "tensorrt":
            _export_tensorrt(output, args.output, args.engine_dtype)
        elif args.format == "torchscript":
            from yolov6_tpu.export.torch_export import export_torchscript

            ts_out = args.output or (
                args.weights.rsplit(".", 1)[0] + ".torchscript.pt"
            )
            traced = export_torchscript(data, (x_chk,), ts_out)
            LOGGER.info(f"Exported TorchScript to {ts_out}")
            if args.check:
                import torch as _torch

                from yolov6_tpu.export.onnx_numpy import OnnxRunner

                got = traced(
                    _torch.from_numpy(np.ascontiguousarray(x_chk))
                ).numpy()
                ref = OnnxRunner(data)(x_chk)[0]
                np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
                LOGGER.info("Round-trip OK (TorchScript matches numpy oracle)")
        return

    output = args.output or args.weights.rsplit(".", 1)[0] + ".stablehlo"
    t0 = time.time()
    export_stablehlo(
        serve, args.batch_size, tuple(args.img_size), output,
        platforms=tuple(args.platforms) if args.platforms else None,
        input_dtype=jnp.uint8 if args.with_preprocess else jnp.float32,
        shard_devices=args.shard_devices,
        weights=variables if args.weights_as_args else None,
    )
    LOGGER.info(
        f"Exported to {output} in {time.time() - t0:.1f}s"
        + (f" (+ weights sidecar {output}.weights.msgpack)"
           if args.weights_as_args else "")
    )

    if args.runner_dir:
        from yolov6_tpu.models.end2end import write_native_artifact

        write_native_artifact(
            serve, args.batch_size, tuple(args.img_size), args.runner_dir,
            input_dtype=jnp.uint8 if args.with_preprocess else jnp.float32,
            meta={
                "end2end": bool(args.end2end),
                "with_preprocess": bool(args.with_preprocess),
                "conf_thres": args.conf_thres,
                "iou_thres": args.iou_thres,
                "max_det": args.max_det,
                "num_classes": args.num_classes,
            },
        )
        LOGGER.info(f"Native runner artifact written to {args.runner_dir}")

    if args.check:
        import numpy as np

        from yolov6_tpu.models.end2end import load_serving

        art = load_serving(output)
        dtype = np.uint8 if args.with_preprocess else np.float32
        dummy = np.zeros((args.batch_size, *args.img_size, 3), dtype)
        out = art.call(jnp.asarray(dummy))
        LOGGER.info(f"Round-trip OK; outputs: {[tuple(o.shape) for o in out]}")


if __name__ == "__main__":
    main()
