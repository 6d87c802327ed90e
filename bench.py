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

    cfg = Config.fromfile(os.path.join(ROOT, "configs", f"{model_name}.py"))
    model = build_model(cfg, num_classes=80, deploy=True, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3), jnp.float32), train=False
    )

    def forward(images):
        head_out, _ = model.apply(variables, images, train=False)
        return model.apply(variables, head_out, method=model.decode)

    @partial(jax.jit, static_argnames="n")
    def bench_n(images, n):
        def body(i, acc):
            out = forward(images + i.astype(jnp.float32) * 1e-9)
            return acc + jnp.sum(out) * 1e-9

        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    images = jax.random.uniform(jax.random.PRNGKey(1), (batch, img, img, 3), jnp.float32)

    jax.device_get(bench_n(images, iters))  # compile + warm
    t0 = time.perf_counter()
    jax.device_get(bench_n(images, iters))
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
