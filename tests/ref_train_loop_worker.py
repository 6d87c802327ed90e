"""Standalone (NO jax) worker: run the reference Trainer's update path for
3 steps on CPU and dump the pre/post/EMA states + schedule trajectory.

Run as a subprocess by tests/test_train_loop_golden.py — torch autograd
segfaults when it shares a process with XLA:CPU, so the reference side
executes in clean isolation (reference: yolov6/core/engine.py:360-376,
solver/build.py:12-46, utils/ema.py:20-38).
"""

import argparse
import os
import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"


def _shim_pkg_resources():
    if "pkg_resources" in sys.modules:
        return
    shim = types.ModuleType("pkg_resources")

    def parse_version(v):
        parts = []
        for piece in str(v).split("+")[0].split("."):
            num = "".join(ch for ch in piece if ch.isdigit())
            parts.append(int(num) if num else 0)
        return tuple(parts)

    shim.parse_version = parse_version
    sys.modules["pkg_resources"] = shim


def _randomize(module, seed):
    """Same procedure as tests/test_model_parity._randomize."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, (torch.nn.Conv2d, torch.nn.ConvTranspose2d)):
                if getattr(m, "_is_proj_conv", False):
                    continue
                m.weight.copy_(torch.randn(m.weight.shape, generator=g) * 0.1)
                if m.bias is not None:
                    m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
            elif isinstance(m, torch.nn.BatchNorm2d):
                m.weight.copy_(torch.rand(m.weight.shape, generator=g) + 0.5)
                m.bias.copy_(torch.randn(m.bias.shape, generator=g) * 0.1)
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    module.eval()
    return module


def _state_np(module):
    import torch

    return {
        k: v.detach().float().cpu().numpy()
        for k, v in module.state_dict().items()
        if isinstance(v, torch.Tensor)
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--img", type=int, required=True)
    ap.add_argument("--nc", type=int, required=True)
    ap.add_argument("--nominal-bs", type=int, required=True)
    ap.add_argument("--warmup-stepnum", type=int, required=True)
    ap.add_argument("--epochs", type=int, required=True)
    ap.add_argument("--max-stepnum", type=int, required=True)
    ap.add_argument("--steps", type=int, required=True)
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--batches", required=True, help="npz with images/targets")
    args = ap.parse_args()

    _shim_pkg_resources()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import torch

    torch.set_num_threads(1)
    from yolov6.models.yolo import Model as RefModel
    from yolov6.models.losses.loss import ComputeLoss as RefComputeLoss
    from yolov6.solver.build import build_optimizer, build_lr_scheduler
    from yolov6.utils.ema import ModelEMA
    # our Config is jax-free and schema-compatible (the reference's needs
    # the absent `addict` package)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from yolov6_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    if not hasattr(cfg, "training_mode"):
        cfg.training_mode = "repvgg"
    cfg.model.depth_multiple = 0.1
    cfg.model.width_multiple = 0.05
    # solver hyps shared with the test (keep in sync with SOLVER there)
    cfg.solver.lr0 = 0.01
    cfg.solver.lrf = 0.01
    cfg.solver.momentum = 0.937
    cfg.solver.weight_decay = 0.0005
    cfg.solver.warmup_momentum = 0.8
    cfg.solver.warmup_bias_lr = 0.1
    cfg.solver.optim = "SGD"
    cfg.solver.lr_scheduler = "Cosine"

    model = RefModel(cfg, channels=3, num_classes=args.nc)
    if hasattr(model.detect, "proj_conv"):
        model.detect.proj_conv._is_proj_conv = True
    _randomize(model, args.seed)
    print("worker: model built", flush=True)
    np.savez(os.path.join(args.out, "pre.npz"), **_state_np(model))
    print("worker: pre state saved", flush=True)

    data = np.load(args.batches)
    images, targets = data["images"], data["targets"]
    # ascontiguousarray is load-bearing: this torch CPU build segfaults
    # (heap corruption) in conv backward on non-contiguous input tensors
    imgs_t = torch.from_numpy(
        np.ascontiguousarray(np.transpose(images, (0, 3, 1, 2))).astype(np.float32)
        / 255.0
    )
    rows = []
    for i, t in enumerate(targets):
        for cls, cx, cy, w, h in t:
            if cls >= 0:
                rows.append([i, cls, cx, cy, w, h])
    rows = torch.tensor(rows, dtype=torch.float32)

    model.train()
    optimizer = build_optimizer(cfg, model)
    scheduler, lf = build_lr_scheduler(cfg, optimizer, args.epochs)
    ema = ModelEMA(model)
    loss_fn = RefComputeLoss(
        num_classes=args.nc, ori_img_size=args.img, warmup_epoch=4,
        use_dfl=False, reg_max=0, iou_type="siou",
    )

    epoch = 0
    last_opt_step = -1
    lrs, moms, accs, applied_list = [], [], [], []
    optimizer.zero_grad()
    for step in range(args.steps):
        preds, _featmaps = model(imgs_t)
        loss, _items = loss_fn(preds, rows, epoch, step, args.img, args.img)
        print(f"worker: step {step} loss {float(loss.detach()):.4f}", flush=True)
        loss.backward()
        print(f"worker: step {step} backward done", flush=True)

        # engine.update_optimizer (engine.py:360-376); CPU scaler = passthrough
        curr_step = step + args.max_stepnum * epoch
        accumulate = max(1, round(64 / args.nominal_bs))
        if curr_step <= args.warmup_stepnum:
            accumulate = max(1, np.interp(
                curr_step, [0, args.warmup_stepnum],
                [1, 64 / args.nominal_bs]).round())
            for k, param in enumerate(optimizer.param_groups):
                warmup_bias_lr = cfg.solver.warmup_bias_lr if k == 2 else 0.0
                param["lr"] = np.interp(
                    curr_step, [0, args.warmup_stepnum],
                    [warmup_bias_lr, param["initial_lr"] * lf(epoch)])
                if "momentum" in param:
                    param["momentum"] = np.interp(
                        curr_step, [0, args.warmup_stepnum],
                        [cfg.solver.warmup_momentum, cfg.solver.momentum])
        applied = curr_step - last_opt_step >= accumulate
        if applied:
            optimizer.step()
            optimizer.zero_grad()
            ema.update(model)
            last_opt_step = curr_step
        lrs.append([g["lr"] for g in optimizer.param_groups])
        moms.append([g.get("momentum", float("nan"))
                     for g in optimizer.param_groups])
        accs.append(int(accumulate))
        applied_list.append(bool(applied))

    model.eval()
    ema.ema.eval()
    np.savez(os.path.join(args.out, "post.npz"), **_state_np(model))
    np.savez(os.path.join(args.out, "ema.npz"), **_state_np(ema.ema))
    np.savez(
        os.path.join(args.out, "traj.npz"),
        lrs=np.asarray(lrs, np.float64),
        moms=np.asarray(moms, np.float64),
        accs=np.asarray(accs, np.int64),
        applied=np.asarray(applied_list, bool),
        ema_updates=np.asarray(ema.updates, np.int64),
    )
    print("worker done")


if __name__ == "__main__":
    main()
