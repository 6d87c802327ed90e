"""TPU probe: decompose the NMS *selection* phase cost (b32 @640 protocol).

Round-3 state (docs/nms_fidelity.md): full NMS ~9 ms/b32 = selection ~7 +
keep ~2. This times each selection sub-op on-device (bench.py fori_loop
methodology) to find where the 7 ms actually goes, and measures a
candidate optimization: the 'grouped' per-anchor class reduction done via
LANE-SLICE FOLDING instead of reshape+transpose. The reshape path turns
[A, nc] into [A, width, G] / [A, G, width] whose minor-2 dims pad to
(8,128) tiles — a large physical blowup; ten [:, w*G:(w+1)*G] lane slices
folded with elementwise max keep the original [A, 128-lane] layout and
should fuse into one HBM pass. Identical math -> identical keep sets.

Run ON TPU:  python tools/probe_nms_select.py [batch] [anchors] [nc]
"""

from __future__ import annotations

import json
import os.path as osp
import sys
import time
from functools import partial

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    A = int(sys.argv[2]) if len(sys.argv) > 2 else 8400
    nc = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    iters = 30
    conf, max_nms, G = 0.03, 8192, 8

    import jax
    import jax.numpy as jnp

    from tools.nms_sweep import dense_scenes
    from yolov6_tpu.ops.boxes import xywh2xyxy
    from yolov6_tpu.ops.nms import _select_candidates, non_max_suppression

    pred_np, n_cand = dense_scenes(batch, A, nc, seed=0, scene="mixed")
    pred = jnp.asarray(pred_np)
    print(f"candidates/img over {conf}: {n_cand.mean():.0f}", flush=True)

    def timed(name, fn, x, scale=1e-9):
        @partial(jax.jit, static_argnames="n")
        def bench(x, n):
            def body(i, acc):
                out = fn(x + i.astype(jnp.float32) * 1e-9)
                leaves = jax.tree_util.tree_leaves(out)
                return acc + sum(jnp.sum(l.astype(jnp.float32)) for l in leaves) * scale

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        jax.device_get(bench(x, iters))
        t0 = time.perf_counter()
        jax.device_get(bench(x, iters))
        ms = (time.perf_counter() - t0) / iters * 1000
        print(f"{name:>28}: {ms:7.2f} ms/b{batch}", flush=True)
        return ms

    results = {"batch": batch, "A": A, "nc": nc}

    # ---- full NMS + selection-only, current defaults
    results["full_nms"] = timed(
        "full NMS (defaults)",
        lambda p: non_max_suppression(p, conf_thres=conf, iou_thres=0.65,
                                      max_det=300, max_nms=max_nms,
                                      multi_label=True),
        pred)
    sel = partial(_select_candidates, conf_thres=conf, max_nms=max_nms,
                  multi_label=True, agnostic=False, class_mask=None)
    results["select_grouped"] = timed(
        "selection (grouped)", jax.vmap(lambda p: sel(p)), pred)
    results["select_topk"] = timed(
        "selection (row topk)",
        jax.vmap(lambda p: sel(p, row_select="topk")), pred)

    # ---- sub-op decomposition (grouped path)
    width = -(-nc // G)
    padded = G * width - nc

    def scores_of(p):
        sc = p[:, 5:] * p[:, 4:5]
        return jnp.pad(sc, ((0, 0), (0, padded))) if padded else sc

    def grouped_reduce(p):
        sc = scores_of(p)
        grid = sc.reshape(A, width, G).transpose(0, 2, 1)
        row_scores = jnp.max(grid, axis=-1)
        local = jnp.argmax(grid, axis=-1)
        return row_scores, local

    def slice_fold_reduce(p):
        sc = scores_of(p)
        m = sc[:, :G]
        loc = jnp.zeros((A, G), jnp.int32)
        for w in range(1, width):
            s = sc[:, w * G:(w + 1) * G]
            upd = s > m
            m = jnp.where(upd, s, m)
            loc = jnp.where(upd, w, loc)
        return m, loc

    results["reduce_grouped"] = timed(
        "row reduce (reshape+T)", jax.vmap(grouped_reduce), pred)
    results["reduce_slicefold"] = timed(
        "row reduce (slice fold)", jax.vmap(slice_fold_reduce), pred)

    # parity: identical math -> identical outputs
    a = jax.vmap(grouped_reduce)(pred)
    b = jax.vmap(slice_fold_reduce)(pred)
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    print("slice-fold == grouped: OK", flush=True)

    # ---- global top-k over [A*G] and the packed gather
    def topk_only(p):
        flat = grouped_reduce(p)[0].reshape(-1)
        flat = jnp.where(flat > conf, flat, 0.0)
        return jax.lax.approx_max_k(flat, max_nms, recall_target=0.95)

    results["approx_topk"] = timed(
        "approx_max_k 67k->8192", jax.vmap(topk_only), pred)

    def gather_only(p):
        boxes = xywh2xyxy(p[:, :4])
        row_scores, local = grouped_reduce(p)
        row_cls = (local * G + jnp.arange(G)[None, :]).astype(jnp.float32)
        flat = jnp.where(row_scores.reshape(-1) > conf,
                         row_scores.reshape(-1), 0.0)
        _, top_idx = jax.lax.approx_max_k(flat, max_nms, recall_target=0.95)
        packed = jnp.concatenate(
            [jnp.repeat(boxes, G, axis=0),
             row_cls.reshape(-1, 1).astype(boxes.dtype)], axis=1)
        return packed[top_idx]

    results["reduce_topk_gather"] = timed(
        "reduce+topk+gather", jax.vmap(gather_only), pred)

    print(json.dumps({k: round(v, 3) if isinstance(v, float) else v
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
