"""L6-sized export + reload + execute audit (the jit weight-closure audit).

The largest family member (yolov6l6 @1280, ~140M params) stresses the
artifact contract: with weights closed over, the StableHLO module embeds
them as constants and reaches ~560 MB — fine on a local PJRT plugin, but
size-capped remote-compile paths reject it (measured through the axon
tunnel: HTTP 413 after 728 s; docs/Test_speed.md "Large-model note").

This probe exercises the supported path at that size: a weights-as-args
artifact (tools/export.py --weights-as-args analog) whose module stays
small because the weights ride in the sidecar, reloaded via
load_serving() and executed b1 on the real device.

Reference analog: dynamic-batch ONNX export handles the same model sizes
(/root/reference/deploy/ONNX/export_onnx.py:106-112); the reference has no
artifact-size constraint because torch.onnx writes weights as external
tensors in the protobuf, which is exactly what the sidecar mirrors.

Usage:
  python tools/probe_l6_export.py [--embedded] [--img 1280] [--model yolov6l6]

--embedded additionally attempts the constants-embedded artifact call
(expected to 413 through the tunnel; ~12 min to fail — off by default).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="yolov6l6")
    ap.add_argument("--img", type=int, default=1280)
    ap.add_argument("--embedded", action="store_true",
                    help="also try the constants-embedded artifact "
                         "(expected HTTP 413 through the axon tunnel)")
    ap.add_argument("--out", default="/tmp/l6_e2e_wa.stablehlo")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov6_tpu.models.end2end import (
        export_stablehlo, load_exported, load_serving, make_end2end_fn,
    )
    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config

    print("devices:", jax.devices(), flush=True)
    cfg = Config.fromfile(f"/root/repo/configs/{args.model}.py")
    model = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.bfloat16)
    t0 = time.time()
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, args.img, args.img, 3)), train=False
    )
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    print(f"init {time.time()-t0:.1f}s, params {n_params/1e6:.1f}M", flush=True)

    serve_args = make_end2end_fn(
        model, None, conf_thres=0.25, iou_thres=0.45, max_det=100,
        half=True, weights_as_args=True,
    )
    t0 = time.time()
    export_stablehlo(serve_args, batch=1, img_size=(args.img, args.img),
                     path=args.out, weights=variables)
    mod_mb = os.path.getsize(args.out) / 1e6
    side_mb = os.path.getsize(args.out + ".weights.msgpack") / 1e6
    print(f"weights-as-args export {time.time()-t0:.1f}s: module "
          f"{mod_mb:.1f} MB + sidecar {side_mb:.1f} MB", flush=True)

    art = load_serving(args.out)
    img = jnp.asarray(np.random.default_rng(0).integers(
        0, 255, (1, args.img, args.img, 3), np.uint8))
    t0 = time.time()
    outs = [np.asarray(o) for o in art.call(img)]
    print(f"reload+call OK in {time.time()-t0:.1f}s: "
          f"shapes {[o.shape for o in outs]} num_dets={int(outs[0].sum())}",
          flush=True)

    if args.embedded:
        serve = make_end2end_fn(model, variables, conf_thres=0.25,
                                iou_thres=0.45, max_det=100, half=True)
        path = "/tmp/l6_e2e_embedded.stablehlo"
        t0 = time.time()
        export_stablehlo(serve, batch=1, img_size=(args.img, args.img), path=path)
        print(f"embedded export {time.time()-t0:.1f}s, "
              f"artifact {os.path.getsize(path)/1e6:.1f} MB", flush=True)
        t0 = time.time()
        try:
            outs = [np.asarray(o) for o in load_exported(path).call(img)]
            print(f"embedded call OK in {time.time()-t0:.1f}s "
                  f"num_dets={int(outs[0].sum())}", flush=True)
        except Exception as e:  # noqa: BLE001 — audit probe records the failure
            print(f"embedded call FAILED after {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
