"""End-to-end learning gate: prove the full loader -> train_step -> EMA ->
checkpoint -> Evaler -> coco_eval chain LEARNS detection, not just runs.

Generates a synthetic shapes dataset (yolov6_tpu/data/synth_detect.py),
trains through tools/train.py's main(), then evaluates saved checkpoints
through tools/eval.py's run() and asserts mAP50 rises far above chance and
improves across checkpoints. This is the in-repo stand-in for the blocked
real-COCO reproduction gate (reference analog: eval-during-training as the
CI signal, yolov6/core/engine.py:184-190); when real weights/data arrive,
tools/repro_gate.py takes over.

Also reports the NMS approx-vs-exact mAP delta on the final checkpoint
(default eval settings vs the reference 30000-candidate exact protocol),
exercising the fidelity comparison docs/nms_fidelity.md defers to real data.

Usage (defaults are sized for a ~15-min TPU run / slow CPU run):
    python tools/learning_gate.py --out /tmp/lgate --epochs 30
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import os.path as osp
import sys

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


def get_args_parser(add_help=True):
    p = argparse.ArgumentParser("yolov6-tpu synthetic learning gate", add_help=add_help)
    p.add_argument("--out", type=str, required=True, help="work dir (dataset + runs)")
    p.add_argument("--conf-file", type=str, default=osp.join(ROOT, "configs", "yolov6n.py"))
    p.add_argument("--img-size", type=int, default=160)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-val", type=int, default=64)
    p.add_argument("--nc", type=int, default=4)
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--workers", type=int, default=2)
    p.add_argument("--max-labels", type=int, default=8)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min-map50", type=float, default=None,
                   help="gate: final mAP50 must exceed this (chance ~ 0). "
                        "Default is tiered to the run size: 0.75 for the "
                        "TPU-recipe tier (epochs >= 30; measured runs land "
                        "at 0.88-0.94, docs/learning_gate.md), 0.50 below — "
                        "so a real assigner/loss/NMS regression fails the "
                        "gate instead of passing at chance+")
    p.add_argument("--min-gain", type=float, default=None,
                   help="gate: final mAP50 must beat the earliest ckpt by "
                        "this (default 0.20 for epochs >= 30, 0.10 below)")
    p.add_argument("--eval-points", type=int, default=3,
                   help="number of checkpoints (incl. final) to evaluate")
    p.add_argument("--skip-exact-nms", action="store_true",
                   help="skip the approx-vs-exact NMS delta eval")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--fuse-ab", action="store_true",
                   help="validate Anchor-Aided Training end-to-end: train "
                        "with the anchor-based aux branch + its loss "
                        "(reference engine.py:161-167) and assert the model "
                        "still learns through the full chain")
    p.add_argument("--distill", action="store_true",
                   help="validate self-distillation end-to-end: stage 1 "
                        "trains a fuse-AB teacher (the reference N/S recipe, "
                        "README training steps), stage 2 trains the "
                        "distill-NS student against it (reference "
                        "engine.py:153-159, tools/train.py:46-51)")
    p.add_argument("--teacher-epochs", type=int, default=0,
                   help="distill teacher pre-stage epochs (0 = same as "
                        "--epochs)")
    p.add_argument("--repopt", action="store_true",
                   help="validate the RepOptimizer recipe end-to-end: a CSLA "
                        "hyper-search pre-stage produces the scales ckpt, a "
                        "generated opt config consumes it, and the masked "
                        "single-branch training must still learn (the "
                        "recommended TPU recipe, docs/tutorial_repopt.md)")
    p.add_argument("--hs-conf-file", type=str,
                   default=osp.join(ROOT, "configs", "repopt", "yolov6n_hs.py"))
    p.add_argument("--opt-conf-file", type=str,
                   default=osp.join(ROOT, "configs", "repopt", "yolov6n_opt.py"))
    p.add_argument("--hs-epochs", type=int, default=0,
                   help="hyper-search stage epochs (0 = max(6, epochs//4))")
    return p


def resolve_thresholds(args):
    """Tiered gate bar: TPU-recipe runs (epochs >= 30) must clear 0.75/0.20
    (measured runs land at 0.88-0.94, docs/learning_gate.md) so a real
    assigner/loss/NMS regression FAILS instead of passing at chance+;
    the CPU micro tier stays loose at 0.50/0.10."""
    if args.min_map50 is None:
        args.min_map50 = 0.75 if args.epochs >= 30 else 0.50
    if args.min_gain is None:
        args.min_gain = 0.20 if args.epochs >= 30 else 0.10
    return args


def _repopt_prestage(args, data_yaml, train_cli, LOGGER):
    """RepOpt step 1: short CSLA hyper-search run -> scales ckpt -> write an
    opt-stage config pointing at it (reference flow: configs/repopt/*_hs.py
    trains the search model whose ckpt feeds RepVGGOptimizer via
    cfg.model.scales, reference yolov6/utils/RepOptimizer.py:150-167)."""
    import re

    hs_epochs = args.hs_epochs or max(6, args.epochs // 4)
    hs_args = train_cli.get_args_parser().parse_args([
        "--data-path", data_yaml,
        "--conf-file", args.hs_conf_file,
        "--img-size", str(args.img_size),
        "--img-floor", str(args.img_size),
        "--batch-size", str(args.batch_size),
        "--epochs", str(hs_epochs),
        "--workers", str(args.workers),
        "--eval-final-only",
        "--heavy-eval-range", "0",
        "--output-dir", osp.join(args.out, "train_hs"),
        "--name", "hs",
        "--max-labels", str(args.max_labels),
        "--seed", str(args.seed),
        "--log-interval", "20",
    ] + (["--bf16"] if args.bf16 else []))
    LOGGER.info(f"RepOpt stage 1/2: hyper-search for {hs_epochs} epochs")
    train_cli.main(hs_args)
    scales_ckpt = osp.join(hs_args.save_dir, "weights", "last_ckpt.msgpack")
    assert osp.exists(scales_ckpt), f"hyper-search ckpt missing: {scales_ckpt}"

    with open(args.opt_conf_file) as f:
        conf_src = f.read()
    conf_src, n_sub = re.subn(r"scales\s*=\s*'[^']*'",
                              f"scales='{scales_ckpt}'", conf_src, count=1)
    assert n_sub == 1, f"no scales= line found in {args.opt_conf_file}"
    gen_conf = osp.join(args.out, "repopt_opt_gate.py")
    with open(gen_conf, "w") as f:
        f.write(conf_src)
    LOGGER.info(f"RepOpt stage 2/2 config written: {gen_conf}")
    return gen_conf


def _distill_prestage(args, data_yaml, train_cli, LOGGER, conf_file):
    """Distill step 1: train the TEACHER with the anchor-based aux branch
    (the reference trains N/S with --fuse_ab, then self-distills against
    that checkpoint: engine.get_teacher_model:429-441 builds the teacher
    fuse_ab=True for 3-level heads). conf_file is the DFL-flipped config —
    the reference opens use_dfl/reg_max=16 for BOTH steps
    (reference docs/Train_coco_data.md:26,38). Returns the teacher ckpt."""
    t_epochs = args.teacher_epochs or args.epochs
    t_args = train_cli.get_args_parser().parse_args([
        "--data-path", data_yaml,
        "--conf-file", conf_file,
        "--img-size", str(args.img_size),
        "--img-floor", str(args.img_size),
        "--batch-size", str(args.batch_size),
        "--epochs", str(t_epochs),
        "--workers", str(args.workers),
        "--fuse_ab",
        "--eval-final-only",
        "--heavy-eval-range", "0",
        "--stop_aug_last_n_epoch", str(max(2, t_epochs // 6)),
        "--output-dir", osp.join(args.out, "train_teacher"),
        "--name", "teacher",
        "--max-labels", str(args.max_labels),
        "--seed", str(args.seed),
        "--log-interval", "20",
    ] + (["--bf16"] if args.bf16 else []))
    LOGGER.info(f"Distill stage 1/2: fuse-AB teacher for {t_epochs} epochs")
    train_cli.main(t_args)
    ckpt = osp.join(t_args.save_dir, "weights", "best_ckpt.msgpack")
    if not osp.exists(ckpt):
        ckpt = osp.join(t_args.save_dir, "weights", "last_ckpt.msgpack")
    assert osp.exists(ckpt), f"teacher ckpt missing: {ckpt}"
    return ckpt


def _eval_ckpt(data_yaml, ckpt, conf_file, img_size, batch_size, save_dir,
               **eval_kw):
    eval_mod = _load_tool("eval")
    (map50, map50_95), _ = eval_mod.run(
        data=data_yaml, weights=ckpt, config=conf_file,
        batch_size=batch_size, img_size=img_size,
        conf_thres=0.03, iou_thres=0.65, task="val", half=False,
        save_dir=save_dir, plot_curve=False, **eval_kw,
    )
    return float(map50), float(map50_95)


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        f"_lgate_{name}", osp.join(ROOT, "tools", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(args):
    from yolov6_tpu.data.synth_detect import generate_synth_dataset
    from yolov6_tpu.utils.events import LOGGER

    resolve_thresholds(args)

    os.makedirs(args.out, exist_ok=True)
    data_root = osp.join(args.out, "dataset")
    data_yaml = osp.join(data_root, "data.yaml")
    if not osp.exists(data_yaml):
        LOGGER.info(f"Generating synthetic dataset under {data_root}")
        generate_synth_dataset(
            data_root, n_train=args.n_train, n_val=args.n_val,
            img_size=args.img_size * 2, nc=args.nc, seed=args.seed,
        )

    train_cli = _load_tool("train")
    conf_file = args.conf_file
    extra_flags = []
    if args.fuse_ab and args.distill:
        raise ValueError("distill models turn off fuse_ab (reference "
                         "core/engine.py:153-167) — pick one gate mode")
    if args.fuse_ab:
        extra_flags.append("--fuse_ab")
    if args.repopt:
        conf_file = _repopt_prestage(args, data_yaml, train_cli, LOGGER)
    if args.distill:
        # the reference's distill contract: the N/S config is flipped to
        # use_dfl=True / reg_max=16 for BOTH steps ("Be sure to open
        # use_dfl mode in config file", reference docs/Train_coco_data.md:
        # 26,38; configs/yolov6s.py:32-33) — the fuse-AB teacher trains
        # with the DFL head, and the NS student trains the DFL branch
        # alongside the deployed plain-ltrb branch
        src = open(conf_file).read()
        assert "use_dfl=False" in src and "reg_max=0" in src, conf_file
        dfl_conf = osp.join(args.out, "distill_conf.py")
        with open(dfl_conf, "w") as f:
            f.write(src.replace("use_dfl=False", "use_dfl=True")
                       .replace("reg_max=0", "reg_max=16"))
        conf_file = dfl_conf
        teacher_ckpt = _distill_prestage(args, data_yaml, train_cli, LOGGER,
                                         conf_file)
        extra_flags += ["--distill", "--teacher_model_path", teacher_ckpt]
    train_args = train_cli.get_args_parser().parse_args([
        "--data-path", data_yaml,
        "--conf-file", conf_file,
        "--img-size", str(args.img_size),
        "--img-floor", str(args.img_size),
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.epochs),
        "--workers", str(args.workers),
        "--eval-final-only",
        "--heavy-eval-range", "0",
        "--stop_aug_last_n_epoch", str(max(2, args.epochs // 6)),
        "--save_ckpt_on_last_n_epoch", str(args.epochs),  # every epoch
        "--output-dir", osp.join(args.out, "train"),
        "--name", "gate",
        "--max-labels", str(args.max_labels),
        "--seed", str(args.seed),
        "--log-interval", "20",
    ] + extra_flags + (["--bf16"] if args.bf16 else []))
    train_cli.main(train_args)
    weights_dir = osp.join(train_args.save_dir, "weights")

    # distill ships the plain-ltrb branch: checkpoints are EVALUATED with
    # the original (use_dfl=False) config — fold-at-load drops the
    # train-only DFL branch ("cost-free" distillation, reference
    # effidehead_distill_ns.py)
    eval_conf = args.conf_file if args.distill else conf_file

    # evaluate an early / mid / final trajectory (per-epoch ckpts are
    # 0-indexed "<e>_ckpt.msgpack"; the stripped final is last_ckpt)
    pts = sorted({max(0, round((i + 1) * (args.epochs - 1) / args.eval_points))
                  for i in range(args.eval_points)})
    trajectory = []
    for e in pts:
        ckpt = osp.join(weights_dir, f"{e}_ckpt.msgpack")
        if not osp.exists(ckpt):
            ckpt = osp.join(weights_dir, "last_ckpt.msgpack")
        m50, m5095 = _eval_ckpt(
            data_yaml, ckpt, eval_conf, args.img_size, args.batch_size,
            osp.join(args.out, f"eval_e{e}"))
        trajectory.append({"epoch": e, "map50": m50, "map50_95": m5095})
        LOGGER.info(f"gate eval epoch {e}: mAP50={m50:.4f} mAP50-95={m5095:.4f}")

    final = trajectory[-1]
    result = {
        "trajectory": trajectory,
        "final_map50": final["map50"],
        "final_map50_95": final["map50_95"],
        "gain": final["map50"] - trajectory[0]["map50"],
        "min_map50": args.min_map50,
    }

    # NMS fidelity: default approx settings vs the reference exact protocol
    # (max_nms=30000, per-anchor exact top-k row selection)
    if not args.skip_exact_nms:
        ckpt = osp.join(weights_dir, f"{pts[-1]}_ckpt.msgpack")
        if not osp.exists(ckpt):
            ckpt = osp.join(weights_dir, "last_ckpt.msgpack")
        m50_exact, m5095_exact = _eval_ckpt(
            data_yaml, ckpt, eval_conf, args.img_size, args.batch_size,
            osp.join(args.out, "eval_exact"),
            max_nms=30000, row_select="topk",
        )
        result["exact_nms"] = {"map50": m50_exact, "map50_95": m5095_exact}
        result["nms_delta_map50_95"] = final["map50_95"] - m5095_exact
        LOGGER.info(
            f"NMS approx-vs-exact: mAP50-95 {final['map50_95']:.4f} vs "
            f"{m5095_exact:.4f} (delta {result['nms_delta_map50_95']:+.4f})")

    passed = (final["map50"] >= args.min_map50
              and result["gain"] >= args.min_gain)
    result["passed"] = bool(passed)
    print(json.dumps(result))
    with open(osp.join(args.out, "gate_result.json"), "w") as f:
        json.dump(result, f, indent=2)
    if not passed:
        LOGGER.error(
            f"LEARNING GATE FAILED: final mAP50 {final['map50']:.4f} "
            f"(need >= {args.min_map50}), gain {result['gain']:.4f} "
            f"(need >= {args.min_gain})")
        return 1
    LOGGER.info(f"LEARNING GATE PASSED: mAP50 {final['map50']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main(get_args_parser().parse_args()))
