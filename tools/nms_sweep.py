#!/usr/bin/env python3
"""NMS fidelity/speed sweep: measure keep-set agreement of the max_nms
prefilter (2000/8000/30000) and approx_max_k-vs-exact top-k against the
reference protocol's 30000-exact cap (reference: utils/nms.py:55,90-96) on
dense synthetic scenes at the eval protocol (conf 0.03, multi-label).

Results are recorded in docs/nms_fidelity.md and pinned by
tests/test_nms_fidelity.py. Run on TPU to measure the real approx_max_k
lowering (CPU lowers it to an exact top-k, so approx==exact there).

Usage: python tools/nms_sweep.py [--batch 8] [--anchors 8400] [--time]
"""

from __future__ import annotations

import argparse
import json
import os.path as osp
import sys
import time
from functools import partial

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


def dense_scenes(batch=8, anchors=8400, nc=80, img=640, seed=0,
                 n_objects=120, conf_thres=0.03, scene="mixed"):
    """Adversarially dense predictions [b, A, 5+nc].

    scene='mixed': clusters of dozens of overlapping candidates per object
    plus a diffuse just-above-threshold background (realistic detector-like
    density, ~400k multi-label candidates over 0.03).

    scene='flood': the truncation worst case — a few HUGE same-class clusters
    (hundreds of candidates each, scores 0.3-1.0) flooding the top ranks, plus
    quiet single-anchor objects at ~0.1 that only enter the candidate list
    beyond rank ~6000. Under the reference's 30000 cap the greedy loop digs
    past the flood and keeps the quiet objects; an aggressive max_nms loses
    them. This bounds how bad truncation can get."""
    if scene == "flood":
        return _flood_scenes(batch, anchors, nc, img, seed)
    rng = np.random.default_rng(seed)
    pred = np.zeros((batch, anchors, 5 + nc), np.float32)
    for b in range(batch):
        # boxes everywhere (xywh in pixels)
        cx = rng.uniform(0, img, anchors)
        cy = rng.uniform(0, img, anchors)
        w = np.exp(rng.uniform(np.log(8), np.log(300), anchors))
        h = np.exp(rng.uniform(np.log(8), np.log(300), anchors))
        # background: low obj, diffuse class probs -> dense tail above 0.03
        obj = rng.uniform(0.05, 0.25, anchors)
        cls = rng.uniform(0.0, 0.35, (anchors, nc))
        # objects: clusters of overlapping high-score candidates
        n_assigned = 0
        for _ in range(n_objects):
            m = int(rng.integers(20, 60))
            if n_assigned + m > anchors:
                break
            sl = slice(n_assigned, n_assigned + m)
            ox, oy = rng.uniform(50, img - 50, 2)
            ow, oh = np.exp(rng.uniform(np.log(20), np.log(250), 2))
            cx[sl] = ox + rng.normal(0, 0.08 * ow, m)
            cy[sl] = oy + rng.normal(0, 0.08 * oh, m)
            w[sl] = ow * np.exp(rng.normal(0, 0.1, m))
            h[sl] = oh * np.exp(rng.normal(0, 0.1, m))
            obj[sl] = rng.uniform(0.3, 1.0, m)
            kcls = rng.integers(0, nc)
            cls[sl, kcls] = rng.uniform(0.4, 0.98, m)
            # secondary labels (multi-label path)
            cls[sl, rng.integers(0, nc)] = rng.uniform(0.1, 0.5, m)
            n_assigned += m
        pred[b, :, 0], pred[b, :, 1] = cx, cy
        pred[b, :, 2], pred[b, :, 3] = w, h
        pred[b, :, 4] = obj
        pred[b, :, 5:] = cls
    n_cand = ((pred[:, :, 5:] * pred[:, :, 4:5]) > conf_thres).sum(axis=(1, 2))
    return pred, n_cand


def _flood_scenes(batch, anchors, nc, img, seed):
    rng = np.random.default_rng(seed)
    pred = np.zeros((batch, anchors, 5 + nc), np.float32)
    for b in range(batch):
        cx = rng.uniform(0, img, anchors)
        cy = rng.uniform(0, img, anchors)
        w = np.exp(rng.uniform(np.log(8), np.log(200), anchors))
        h = np.exp(rng.uniform(np.log(8), np.log(200), anchors))
        obj = rng.uniform(0.01, 0.02, anchors)  # below threshold
        cls = rng.uniform(0.0, 1.0, (anchors, nc)) * 0.02
        i = 0
        # 25 flooding clusters x 250 candidates, one class each
        for _ in range(25):
            m = 250
            sl = slice(i, i + m)
            ox, oy = rng.uniform(80, img - 80, 2)
            ow, oh = np.exp(rng.uniform(np.log(60), np.log(200), 2))
            cx[sl] = ox + rng.normal(0, 0.05 * ow, m)
            cy[sl] = oy + rng.normal(0, 0.05 * oh, m)
            w[sl] = ow * np.exp(rng.normal(0, 0.05, m))
            h[sl] = oh * np.exp(rng.normal(0, 0.05, m))
            obj[sl] = rng.uniform(0.5, 1.0, m)
            cls[sl, rng.integers(0, nc)] = rng.uniform(0.6, 0.98, m)
            i += m
        # 200 quiet, isolated single-candidate objects at ~0.1
        for q in range(200):
            sl = slice(i, i + 1)
            gx, gy = (q % 20), (q // 20)
            cx[sl] = 16 + gx * 32 + rng.uniform(-4, 4)
            cy[sl] = 16 + gy * 32 + rng.uniform(-4, 4)
            w[sl] = rng.uniform(12, 24)
            h[sl] = rng.uniform(12, 24)
            obj[sl] = rng.uniform(0.3, 0.5)
            cls[sl, rng.integers(0, nc)] = rng.uniform(0.25, 0.35)
            i += 1
        pred[b, :, 0], pred[b, :, 1] = cx, cy
        pred[b, :, 2], pred[b, :, 3] = w, h
        pred[b, :, 4] = obj
        pred[b, :, 5:] = cls
    n_cand = ((pred[:, :, 5:] * pred[:, :, 4:5]) > 0.03).sum(axis=(1, 2))
    return pred, n_cand


def keep_sets(dets, valid):
    """Per-image set of kept detections keyed by exact (box, cls) floats,
    mapped to score (all configs draw boxes from the same candidate grid,
    so float identity is exact)."""
    out = []
    for i in range(dets.shape[0]):
        d = {}
        for row, v in zip(np.asarray(dets[i]), np.asarray(valid[i])):
            if v:
                d[tuple(np.round(row[:4], 4)) + (int(row[5]),)] = float(row[4])
        out.append(d)
    return out


def agreement(base_sets, test_sets):
    """(detection agreement, score-weighted agreement) vs baseline."""
    n_match = n_base = 0
    s_match = s_base = 0.0
    for base, test in zip(base_sets, test_sets):
        n_base += len(base)
        s_base += sum(base.values())
        for k, s in base.items():
            if k in test:
                n_match += 1
                s_match += s
    return n_match / max(n_base, 1), s_match / max(s_base, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--anchors", type=int, default=8400)
    ap.add_argument("--nc", type=int, default=80)
    ap.add_argument("--scene", choices=("mixed", "flood", "all"),
                    default="all")
    ap.add_argument("--method", choices=("tiled", "pallas", "loop", "perclass"),
                    default=None, help="selection backend (default: auto)")
    ap.add_argument("--anchor-topc", type=int, default=8,
                    help="per-anchor class pre-reduction (0 disables)")
    ap.add_argument("--tile", type=int, nargs="*", default=[512],
                    help="tiled-keep tile size(s) — multiple values sweep "
                         "in one process (amortizes scene gen + baseline)")
    ap.add_argument("--approx-only", action="store_true",
                    help="skip the exact-top-k arm of each config")
    ap.add_argument("--row-select", choices=("grouped", "topk"),
                    default="grouped",
                    help="per-anchor pre-reduction algorithm")
    ap.add_argument("--bf16-select", action="store_true",
                    help="rank candidate selection on a bf16 score grid "
                         "(fp32 re-score of the selected candidates)")
    ap.add_argument("--recall-target", type=float, default=0.95,
                    help="approx_max_k recall target")
    ap.add_argument("--class-cap", type=int, default=256,
                    help="perclass bucket capacity (overflow falls back)")
    ap.add_argument("--max-nms", type=int, nargs="*", default=None,
                    help="override the sweep's max_nms values")
    ap.add_argument("--time", action="store_true",
                    help="also measure per-config on-device time (TPU protocol)")
    ap.add_argument("--time-phases", action="store_true",
                    help="also time candidate selection alone (keep-phase "
                         "cost = ms_per_batch - ms_select)")
    ap.add_argument("--out-json", type=str, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin ignores "
                         "JAX_PLATFORMS=cpu)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from yolov6_tpu.ops.nms import non_max_suppression

    backend = jax.default_backend()
    scenes = [args.scene] if args.scene != "all" else ["mixed", "flood"]
    all_rows = {}
    for scene in scenes:
        pred_np, n_cand = dense_scenes(
            args.batch, args.anchors, args.nc, scene=scene
        )
        print(f"[{scene}] backend={backend}  candidates/image over conf 0.03: "
              f"min={n_cand.min()} mean={n_cand.mean():.0f} max={n_cand.max()}")
        pred = jnp.asarray(pred_np)

        def run(max_nms, exact, topc=None, tile=None, bf16=None):
            dets, valid = non_max_suppression(
                pred, conf_thres=0.03, iou_thres=0.65, max_det=300,
                max_nms=max_nms, multi_label=True, exact_topk=exact,
                method=args.method,
                anchor_topc=args.anchor_topc if topc is None else topc,
                row_select=args.row_select,
                tile=args.tile[0] if tile is None else tile,
                recall_target=args.recall_target,
                class_cap=args.class_cap,
                bf16_select=args.bf16_select if bf16 is None else bf16,
            )
            return jax.device_get(dets), jax.device_get(valid)

        # baseline = the reference protocol: all A*nc candidates, exact
        # top-k, fp32 ranking (bf16_select never applies to the baseline)
        base_sets = keep_sets(*run(30000, True, topc=0, bf16=False))
        print(f"[{scene}] baseline (30000, exact): "
              f"{sum(len(s) for s in base_sets)} kept dets")

        rows = []
        for max_nms in (args.max_nms or (2000, 8000, 30000)):
            for exact in ((False,) if args.approx_only else (False, True)):
              for tile in args.tile:
                sets = keep_sets(*run(max_nms, exact, tile=tile))
                det_agree, score_agree = agreement(base_sets, sets)
                row = {
                    "scene": scene,
                    "method": args.method or "auto",
                    "anchor_topc": args.anchor_topc,
                    "row_select": args.row_select,
                    "tile": tile,
                    "recall_target": args.recall_target,
                    "class_cap": args.class_cap,
                    "max_nms": max_nms,
                    "topk": "exact" if exact else "approx",
                    "bf16_select": args.bf16_select,
                    "det_agreement": round(det_agree, 5),
                    "score_agreement": round(score_agree, 5),
                }
                if args.time:
                    @partial(jax.jit, static_argnames=("n",))
                    def bench_n(p, n, _max_nms=max_nms, _exact=exact,
                                _tile=tile):
                        def body(i, acc):
                            d, v = non_max_suppression(
                                p + i.astype(jnp.float32) * 1e-9,
                                conf_thres=0.03, iou_thres=0.65, max_det=300,
                                max_nms=_max_nms, multi_label=True,
                                exact_topk=_exact, method=args.method,
                                anchor_topc=args.anchor_topc,
                                row_select=args.row_select,
                                tile=_tile,
                                recall_target=args.recall_target,
                                class_cap=args.class_cap,
                                bf16_select=args.bf16_select,
                            )
                            return acc + jnp.sum(d) * 1e-9
                        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

                    iters = 20
                    jax.device_get(bench_n(pred, iters))
                    t0 = time.perf_counter()
                    jax.device_get(bench_n(pred, iters))
                    row["ms_per_batch"] = round(
                        (time.perf_counter() - t0) / iters * 1000, 2
                    )
                if args.time_phases:
                    from yolov6_tpu.ops.nms import _select_candidates

                    sel = partial(
                        _select_candidates, conf_thres=0.03, max_nms=max_nms,
                        multi_label=True, agnostic=False, class_mask=None,
                        exact_topk=exact, anchor_topc=args.anchor_topc,
                        row_select=args.row_select,
                        recall_target=args.recall_target,
                        bf16_select=args.bf16_select,
                    )

                    @partial(jax.jit, static_argnames=("n",))
                    def sel_n(p, n):
                        def body(i, acc):
                            cb, nb, sc, ci = jax.vmap(sel)(
                                p + i.astype(jnp.float32) * 1e-9
                            )
                            return acc + (jnp.sum(nb) + jnp.sum(sc)) * 1e-9
                        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

                    iters = 20
                    jax.device_get(sel_n(pred, iters))
                    t0 = time.perf_counter()
                    jax.device_get(sel_n(pred, iters))
                    row["ms_select"] = round(
                        (time.perf_counter() - t0) / iters * 1000, 2
                    )
                rows.append(row)
                print(json.dumps(row))
        all_rows[scene] = {"candidates_mean": float(n_cand.mean()),
                           "rows": rows}

    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump({"backend": backend, "batch": args.batch,
                       "scenes": all_rows}, f, indent=2)


if __name__ == "__main__":
    main()
