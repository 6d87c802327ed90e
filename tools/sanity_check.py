#!/usr/bin/env python3
"""End-to-end learnability check: overfit YOLOv6-N on synthetic colored
rectangles and verify real mAP emerges through the full stack
(augment-free loader -> jitted train step -> EMA -> eval decode -> NMS ->
COCO evaluator). A fast stand-in for a COCO training run in environments
without the dataset.

Usage: python tools/sanity_check.py [--steps 300] [--img 128]
Exit 0 iff mAP50 >= --map-threshold.
"""

from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

import numpy as np


CLASS_COLORS = [(220, 40, 40), (40, 220, 40), (40, 40, 220)]  # BGR per class


def make_sample(rng, img_size):
    img = np.full((img_size, img_size, 3), 30, np.uint8)
    n = rng.integers(1, 4)
    labels = np.full((8, 5), -1.0, np.float32)
    labels[:, 1:] = 0.0
    for j in range(n):
        cls = int(rng.integers(0, len(CLASS_COLORS)))
        w = rng.uniform(0.2, 0.5)
        h = rng.uniform(0.2, 0.5)
        cx = rng.uniform(w / 2, 1 - w / 2)
        cy = rng.uniform(h / 2, 1 - h / 2)
        x1, y1 = int((cx - w / 2) * img_size), int((cy - h / 2) * img_size)
        x2, y2 = int((cx + w / 2) * img_size), int((cy + h / 2) * img_size)
        img[y1:y2, x1:x2] = CLASS_COLORS[cls]
        labels[j] = [cls, cx, cy, w, h]
    return img, labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=300)
    parser.add_argument("--img", type=int, default=128)
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--n-train", type=int, default=64)
    parser.add_argument("--n-val", type=int, default=16)
    parser.add_argument("--map-threshold", type=float, default=0.5)
    parser.add_argument("--bf16", action="store_true", default=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from yolov6_tpu.core.train_step import create_train_state, make_train_step
    from yolov6_tpu.losses.loss import ComputeLoss
    from yolov6_tpu.models.effidehead import decode_eval
    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.ops.nms import non_max_suppression
    from yolov6_tpu.solver.build import build_param_groups
    from yolov6_tpu.utils.config import Config
    from yolov6_tpu.utils.coco_eval import COCOEvaluator

    rng = np.random.default_rng(0)
    img_size, nc = args.img, len(CLASS_COLORS)
    train = [make_sample(rng, img_size) for _ in range(args.n_train)]
    val = [make_sample(rng, img_size) for _ in range(args.n_val)]

    cfg = Config.fromfile(osp.join(ROOT, "configs", "yolov6n.py"))
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model(cfg, num_classes=nc, deploy=False, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, img_size, img_size, 3)), train=False)
    loss_fn = ComputeLoss(num_classes=nc, ori_img_size=img_size, warmup_epoch=0,
                          use_dfl=False, reg_max=0, iou_type="siou")
    solver_cfg = dict(lr0=0.02, lrf=0.05, momentum=0.937, weight_decay=0.0005,
                      warmup_epochs=1.0, warmup_momentum=0.8, warmup_bias_lr=0.1,
                      lr_scheduler="Cosine")
    steps_per_epoch = max(args.n_train // args.batch, 1)
    epochs = max(args.steps // steps_per_epoch, 1)
    step_fn = make_train_step(
        model, loss_fn, build_param_groups(variables["params"]), solver_cfg,
        max_stepnum=steps_per_epoch, epochs=epochs, batch_size=64,
        warmup_stepnum=20, img_size=(img_size, img_size),
    )
    state = create_train_state(variables)

    t0 = time.time()
    order = np.arange(args.n_train)
    step = 0
    while step < args.steps:
        rng.shuffle(order)
        for s in range(steps_per_epoch):
            idx = order[s * args.batch : (s + 1) * args.batch]
            if len(idx) < args.batch:
                break
            imgs = jnp.asarray(np.stack([train[i][0] for i in idx]))
            tgts = jnp.asarray(np.stack([train[i][1] for i in idx]))
            epoch = jnp.asarray(step // steps_per_epoch, jnp.float32)
            state, loss, comp = step_fn(state, imgs, tgts, epoch, use_atss=False)
            if step % 25 == 0:
                print(f"step {step}: loss {float(loss):.4f}", flush=True)
            step += 1
            if step >= args.steps:
                break
    print(f"trained {step} steps in {time.time() - t0:.0f}s", flush=True)

    # ---- eval with EMA weights through decode + NMS + COCO evaluator
    eval_vars = {"params": state.ema_params}
    if state.ema_batch_stats:
        eval_vars["batch_stats"] = state.ema_batch_stats

    @jax.jit
    def infer(imgs):
        head_out, _ = model.apply(eval_vars, imgs.astype(jnp.float32) / 255.0, train=False)
        preds = decode_eval(head_out, nc, model.strides, model.use_dfl, model.reg_max)
        return non_max_suppression(preds, 0.03, 0.65, max_det=50, max_nms=1000, multi_label=True)

    gt = {"images": [], "annotations": [], "categories": [{"id": i} for i in range(nc)]}
    dets_json = []
    ann_id = 0
    for i, (img, labels) in enumerate(val):
        gt["images"].append({"id": i})
        for cls, cx, cy, w, h in labels[labels[:, 0] >= 0]:
            gt["annotations"].append({
                "id": ann_id, "image_id": i, "category_id": int(cls),
                "bbox": [(cx - w / 2) * img_size, (cy - h / 2) * img_size,
                         w * img_size, h * img_size],
                "area": float(w * h * img_size * img_size), "iscrowd": 0,
            })
            ann_id += 1
        dets, valid = infer(jnp.asarray(img[None]))
        d = np.asarray(dets[0])[np.asarray(valid[0])]
        for row in d:
            dets_json.append({
                "image_id": i, "category_id": int(row[5]),
                "bbox": [float(row[0]), float(row[1]),
                         float(row[2] - row[0]), float(row[3] - row[1])],
                "score": float(row[4]),
            })
    stats = COCOEvaluator(gt).evaluate(dets_json, verbose=True)
    print(f"mAP50={stats['AP50']:.3f} mAP={stats['AP']:.3f}", flush=True)
    ok = stats["AP50"] >= args.map_threshold
    print("SANITY", "PASS" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
