#!/bin/bash
# One-shot TPU measurement session (run when the axon tunnel is up; jobs are
# serialized — the host has one core and compiles are host-bound).
# Usage: nohup bash tools/tpu_measure.sh > /tmp/tpu_measure.log 2>&1 &
set -x
cd "$(dirname "$0")/.."

# 0. tunnel probe (fail fast if the lease is unavailable)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. tiled-keep tile-size sweep at the eval protocol (amortized one process)
timeout 3600 python -u tools/nms_sweep.py --scene mixed --approx-only \
    --max-nms 8000 --tile 128 256 512 --time --time-phases \
    --out-json /tmp/nms_tile_sweep.json

# 2. bf16 selection-phase ranking: fidelity + speed vs fp32
timeout 3600 python -u tools/nms_sweep.py --approx-only --max-nms 8000 \
    --bf16-select --time --time-phases --out-json /tmp/nms_bf16.json

# 3. headline bench (fwd+decode + extras: eval-NMS, train step, N/L)
timeout 5400 python -u bench.py
