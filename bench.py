#!/usr/bin/env python3
"""Benchmark: YOLOv6-S deploy-mode inference throughput on the local chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: published YOLOv6-S T4 TensorRT-fp16 b32 throughput = 484 imgs/s
(reference README.md:42; BASELINE.md). Protocol mirrors docs/Test_speed.md:
pre/post-processing excluded — pure device forward (backbone+neck+head+decode),
bf16, batch 32 @640.

Methodology note: the axon tunnel makes per-dispatch host timing unreliable,
so iterations run on-device inside one jit (fori_loop with an
iteration-dependent input perturbation to defeat CSE) and only a scalar
leaves the device.
"""

import json
import os
import sys
import time
from functools import partial

ROOT = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, ROOT)

BASELINES_B32 = {"yolov6n": 1187.0, "yolov6s": 484.0, "yolov6m": 226.0, "yolov6l": 116.0}


def main():
    import jax
    import jax.numpy as jnp

    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    img = int(os.environ.get("BENCH_IMG", "640"))
    model_name = os.environ.get("BENCH_MODEL", "yolov6s")
    iters = int(os.environ.get("BENCH_ITERS", "50"))

    cfg_path = os.path.join(ROOT, "configs", f"{model_name}.py")
    if not os.path.exists(cfg_path):
        # families live in subdirs (yolov6_lite/, mbla/, base/, repopt/, qarepvgg/)
        import glob as _glob

        hits = _glob.glob(os.path.join(ROOT, "configs", "**", f"{model_name}.py"), recursive=True)
        if not hits:
            raise FileNotFoundError(f"no config named {model_name}.py under configs/")
        cfg_path = hits[0]
    cfg = Config.fromfile(cfg_path)
    model = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32), train=False
    )

    def forward(variables, images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    def make_bench(close_over_weights: bool):
        # closure: weights embed as HLO constants — measured ~4% faster
        # (XLA pre-folds layouts) and it's what serving graphs look like.
        # argument: keeps the program small — required for M6/L6-sized
        # models, whose constant-laden HLO the axon remote-compile endpoint
        # rejects with HTTP 413.
        if close_over_weights:
            @partial(jax.jit, static_argnames="n")
            def bench_n(images, n):
                def body(i, acc):
                    out = forward(variables, images + i.astype(jnp.float32) * 1e-9)
                    return acc + jnp.sum(out) * 1e-9

                return jax.lax.fori_loop(0, n, body, jnp.float32(0))

            return lambda images, n: bench_n(images, n)

        @partial(jax.jit, static_argnames="n")
        def bench_n_args(vs, images, n):
            def body(i, acc):
                out = forward(vs, images + i.astype(jnp.float32) * 1e-9)
                return acc + jnp.sum(out) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return lambda images, n: bench_n_args(variables, images, n)

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, img, img, 3), jnp.float32)

    # BENCH_WEIGHTS_AS_ARGS=1 skips the closure attempt up front: large
    # models that squeeze under the 413 request limit (e.g. M6/L6 at b1)
    # otherwise sink into a pathologically slow constant-folding compile.
    bench_fn = make_bench(os.environ.get("BENCH_WEIGHTS_AS_ARGS", "0") != "1")
    try:
        jax.device_get(bench_fn(images, iters))  # compile + warm
    except Exception as e:  # noqa: BLE001 — oversized-program rejection
        if "413" not in str(e) and "length limit" not in str(e):
            raise
        bench_fn = make_bench(False)
        jax.device_get(bench_fn(images, iters))
    t0 = time.perf_counter()
    jax.device_get(bench_fn(images, iters))
    dt = time.perf_counter() - t0

    fps = batch * iters / dt
    baseline = BASELINES_B32.get(model_name)
    print(
        json.dumps(
            {
                "metric": f"{model_name}_b{batch}_{img} imgs/sec/chip (bf16, fwd+decode)",
                "value": round(fps, 2),
                "unit": "imgs/s",
                "vs_baseline": round(fps / baseline, 3) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()
