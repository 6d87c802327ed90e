"""Generate the configs/ model zoo from a compact parameter matrix.

The schema (model/solver/data_aug dicts in a .py module) matches the
reference config surface (reference: configs/*.py) so user configs port
verbatim; values are the published hyperparameters of each family.
Run: python tools/gen_configs.py
"""

from __future__ import annotations

import os
import os.path as osp

ROOT = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "configs")

ANCHORS_INIT = "[[10,13, 19,19, 33,23],\n                      [30,61, 59,59, 59,119],\n                      [116,90, 185,185, 373,326]]"

SOLVER_SCRATCH = dict(lr0=0.01, lrf=0.01, momentum=0.937, weight_decay=0.0005,
                      warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1)
SOLVER_FINETUNE = dict(lr0=0.0032, lrf=0.12, momentum=0.843, weight_decay=0.00036,
                       warmup_epochs=2.0, warmup_momentum=0.5, warmup_bias_lr=0.05)
AUG_SCRATCH_05 = dict(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=0.0, translate=0.1,
                      scale=0.5, shear=0.0, flipud=0.0, fliplr=0.5, mosaic=1.0, mixup=0.0)
AUG_SCRATCH_09 = dict(AUG_SCRATCH_05, scale=0.9, mixup=0.1)
AUG_FINETUNE = dict(hsv_h=0.0138, hsv_s=0.664, hsv_v=0.464, degrees=0.373, translate=0.245,
                    scale=0.898, shear=0.602, flipud=0.00856, fliplr=0.5, mosaic=1.0, mixup=0.243)


def fmt_dict(d, indent=4):
    pad = " " * indent
    lines = []
    for k, v in d.items():
        lines.append(f"{pad}{k}={v!r},")
    return "\n".join(lines)


def p5_model(name, depth, width, backbone, neck, csp_e=None, fuse_P2=True, cspsppf=False,
             stage_block=None, iou="giou", dfl=True, nr_b="[1, 6, 12, 18, 6]",
             nr_n="[12, 12, 12, 12]", dw_cls=1.0, atss_warmup=0, pretrained=None,
             anchors=3):
    csp_b = f"\n        csp_e={csp_e}," if csp_e else ""
    sb = f"\n        stage_block_type=\"{stage_block}\"," if stage_block else ""
    csp_n = csp_b + sb
    csp_b = csp_b + (f"\n        fuse_P2=True," if fuse_P2 else "") + \
        (f"\n        cspsppf=True," if cspsppf else "") + sb
    anchor_lines = (f"        anchors={anchors},\n"
                    + (f"        anchors_init={ANCHORS_INIT},\n" if anchors > 1 else ""))
    return f"""model = dict(
    type='{name}',
    pretrained={pretrained!r},
    depth_multiple={depth},
    width_multiple={width},
    backbone=dict(
        type='{backbone}',
        num_repeats={nr_b},
        out_channels=[64, 128, 256, 512, 1024],{csp_b}
        ),
    neck=dict(
        type='{neck}',
        num_repeats={nr_n},
        out_channels=[256, 128, 128, 256, 256, 512],{csp_n}
        ),
    head=dict(
        type='EffiDeHead',
        in_channels=[128, 256, 512],
        num_layers=3,
        begin_indices=24,
{anchor_lines}        out_indices=[17, 20, 23],
        strides=[8, 16, 32],
        atss_warmup_epoch={atss_warmup},
        iou_type='{iou}',
        use_dfl={dfl},
        reg_max={16 if dfl else 0},
        distill_weight={{
            'class': {dw_cls},
            'dfl': 1.0,
        }},
    )
)"""


def p6_model(name, depth, width, backbone, neck, csp_e=None, cspsppf=False, iou="giou",
             dfl=False, pretrained=None):
    csp_b = f"\n        csp_e={csp_e}," if csp_e else ""
    extra_b = csp_b + "\n        fuse_P2=True," + ("\n        cspsppf=True," if cspsppf else "")
    return f"""model = dict(
    type='{name}',
    pretrained={pretrained!r},
    depth_multiple={depth},
    width_multiple={width},
    backbone=dict(
        type='{backbone}',
        num_repeats=[1, 6, 12, 18, 6, 6],
        out_channels=[64, 128, 256, 512, 768, 1024],{extra_b}
        ),
    neck=dict(
        type='{neck}',
        num_repeats=[12, 12, 12, 12, 12, 12],
        out_channels=[512, 256, 128, 256, 512, 1024],{csp_b}
        ),
    head=dict(
        type='EffiDeHead',
        in_channels=[128, 256, 512, 1024],
        num_layers=4,
        anchors=1,
        strides=[8, 16, 32, 64],
        atss_warmup_epoch=4,
        iou_type='{iou}',
        use_dfl={dfl},
        reg_max={16 if dfl else 0},
        distill_weight={{
            'class': 1.0,
            'dfl': 1.0,
        }},
    )
)"""


def lite_model(name, width, pretrained=None):
    return f"""model = dict(
    type='{name}',
    pretrained={pretrained!r},
    width_multiple={width},
    backbone=dict(
        type='Lite_EffiBackbone',
        num_repeats=[1, 3, 7, 3],
        out_channels=[24, 32, 64, 128, 256],
        scale_size=0.5,
        ),
    neck=dict(
        type='Lite_EffiNeck',
        in_channels=[256, 128, 64],
        unified_channels=96
        ),
    head=dict(
        type='Lite_EffideHead',
        in_channels=[96, 96, 96, 96],
        num_layers=4,
        anchors=1,
        strides=[8, 16, 32, 64],
        atss_warmup_epoch=4,
        iou_type='siou',
        use_dfl=False,
        reg_max=0
    )
)"""


def emit(path, model_str, solver, aug, training_mode=None, solver_extra=None, header=""):
    solver = dict(solver)
    if solver_extra:
        solver.update(solver_extra)
    body = f"""# {header}
{model_str}

solver = dict(
    optim='SGD',
    lr_scheduler='Cosine',
{fmt_dict(solver)}
)

data_aug = dict(
{fmt_dict(aug)}
)
"""
    if training_mode:
        body += f"\ntraining_mode = \"{training_mode}\"\n"
    full = osp.join(ROOT, path)
    os.makedirs(osp.dirname(full), exist_ok=True)
    with open(full, "w") as f:
        f.write(body)
    print("wrote", full)


def main():
    # ---- root P5 family
    n = dict(depth=0.33, width=0.25, backbone="EfficientRep", neck="RepBiFPANNeck",
             cspsppf=True, iou="siou", dfl=False)
    s = dict(depth=0.33, width=0.50, backbone="EfficientRep", neck="RepBiFPANNeck",
             cspsppf=True, iou="giou", dfl=False)
    m = dict(depth=0.60, width=0.75, backbone="CSPBepBackbone", neck="CSPRepBiFPANNeck",
             csp_e="float(2)/3", iou="giou", dfl=True, dw_cls=0.8)
    l = dict(depth=1.0, width=1.0, backbone="CSPBepBackbone", neck="CSPRepBiFPANNeck",
             csp_e="float(1)/2", iou="giou", dfl=True, dw_cls=2.0)
    lr_n = dict(lr0=0.02)
    for key, spec, aug, lr in [
        ("yolov6n", n, AUG_SCRATCH_05, lr_n), ("yolov6s", s, AUG_SCRATCH_05, None),
        ("yolov6m", m, AUG_SCRATCH_09, None), ("yolov6l", l, AUG_SCRATCH_09, None),
    ]:
        tm = "conv_silu" if key == "yolov6l" else None
        emit(f"{key}.py", p5_model(key.replace("yolov6", "YOLOv6"), **spec),
             SOLVER_SCRATCH, aug, training_mode=tm, solver_extra=lr,
             header=f"{key} model (published hyperparameters)")
        emit(f"{key}_finetune.py",
             p5_model(key.replace("yolov6", "YOLOv6"), **spec, pretrained=f"weights/{key}.pt"),
             SOLVER_FINETUNE, AUG_FINETUNE, training_mode=tm,
             header=f"{key} finetune recipe")

    # ---- P6 family @1280
    n6 = dict(depth=0.33, width=0.25, backbone="EfficientRep6", neck="RepBiFPANNeck6",
              cspsppf=True, iou="siou", dfl=False)
    s6 = dict(depth=0.33, width=0.50, backbone="EfficientRep6", neck="RepBiFPANNeck6",
              cspsppf=True, iou="giou", dfl=False)
    m6 = dict(depth=0.60, width=0.75, backbone="CSPBepBackbone_P6", neck="CSPRepBiFPANNeck_P6",
              csp_e="float(2)/3", iou="giou", dfl=True)
    l6 = dict(depth=1.0, width=1.0, backbone="CSPBepBackbone_P6", neck="CSPRepBiFPANNeck_P6",
              csp_e="float(1)/2", iou="giou", dfl=True)
    for key, spec, aug, lr in [
        ("yolov6n6", n6, AUG_SCRATCH_05, lr_n), ("yolov6s6", s6, AUG_SCRATCH_05, None),
        ("yolov6m6", m6, AUG_SCRATCH_09, None), ("yolov6l6", l6, AUG_SCRATCH_09, None),
    ]:
        tm = "conv_silu" if key == "yolov6l6" else None
        emit(f"{key}.py", p6_model(key.replace("yolov6", "YOLOv6"), **spec),
             SOLVER_SCRATCH, aug, training_mode=tm, solver_extra=lr, header=f"{key} model @1280")
        emit(f"{key}_finetune.py",
             p6_model(key.replace("yolov6", "YOLOv6"), **spec, pretrained=f"weights/{key}.pt"),
             SOLVER_FINETUNE, AUG_FINETUNE, training_mode=tm, header=f"{key} finetune recipe")

    # ---- lite family
    for key, width in [("yolov6_lite_s", 0.7), ("yolov6_lite_m", 1.1), ("yolov6_lite_l", 1.5)]:
        lite_solver = dict(SOLVER_SCRATCH, lr0=0.4, momentum=0.9, weight_decay=0.00004)
        emit(f"yolov6_lite/{key}.py", lite_model(key.replace("yolov6_lite_", "YOLOv6-lite-"), width),
             lite_solver, AUG_SCRATCH_05, header=f"{key} mobile model @320")
        emit(f"yolov6_lite/{key}_finetune.py",
             lite_model(key.replace("yolov6_lite_", "YOLOv6-lite-"), width,
                        pretrained=f"weights/{key}.pt"),
             SOLVER_FINETUNE, AUG_FINETUNE, header=f"{key} finetune recipe")

    # ---- base family (conv_relu, quantization-friendly)
    bn = dict(n, iou="giou", dfl=True, cspsppf=True)
    bs = dict(depth=0.70, width=0.50, backbone="CSPBepBackbone", neck="CSPRepBiFPANNeck",
              csp_e="float(1)/2", cspsppf=True, iou="giou", dfl=True)
    bm = dict(depth=0.80, width=0.75, backbone="CSPBepBackbone", neck="CSPRepBiFPANNeck",
              csp_e="float(1)/2", iou="giou", dfl=True, dw_cls=0.8)
    bl = dict(l, csp_e="float(1)/2")
    for key, spec, aug in [
        ("yolov6n_base", bn, AUG_SCRATCH_05), ("yolov6s_base", bs, AUG_SCRATCH_05),
        ("yolov6m_base", bm, AUG_SCRATCH_09), ("yolov6l_base", bl, AUG_SCRATCH_09),
    ]:
        lr = None
        emit(f"base/{key}.py", p5_model(key.replace("yolov6", "YOLOv6"), **spec),
             SOLVER_SCRATCH, aug, training_mode="conv_relu", solver_extra=lr,
             header=f"{key} (plain-conv base model)")
        emit(f"base/{key}_finetune.py",
             p5_model(key.replace("yolov6", "YOLOv6"), **spec, pretrained=f"weights/{key}.pt"),
             SOLVER_FINETUNE, AUG_FINETUNE, training_mode="conv_relu",
             header=f"{key} finetune recipe")

    # ---- MBLA family (conv_silu)
    mb = dict(backbone="CSPBepBackbone", neck="CSPRepBiFPANNeck", csp_e="float(1)/2",
              stage_block="MBLABlock", iou="giou", dfl=True, dw_cls=2.0,
              nr_b="[1, 4, 8, 8, 4]", nr_n="[8, 8, 8, 8]")
    for key, depth, width in [
        ("yolov6s_mbla", 0.5, 0.5), ("yolov6m_mbla", 0.5, 0.75),
        ("yolov6l_mbla", 0.5, 1.0), ("yolov6x_mbla", 1.0, 1.0),
    ]:
        emit(f"mbla/{key}.py", p5_model(key.replace("yolov6", "YOLOv6"), depth=depth, width=width, **mb),
             SOLVER_SCRATCH, AUG_SCRATCH_09, training_mode="conv_silu",
             header=f"{key} (multi-branch layer aggregation)")
        emit(f"mbla/{key}_finetune.py",
             p5_model(key.replace("yolov6", "YOLOv6"), depth=depth, width=width, **mb,
                      pretrained=f"weights/{key}.pt"),
             SOLVER_FINETUNE, AUG_FINETUNE, training_mode="conv_silu",
             header=f"{key} finetune recipe")

    # ---- QARepVGG family
    for key, spec, aug, lr in [
        ("yolov6n_qa", n, AUG_SCRATCH_05, lr_n), ("yolov6s_qa", s, AUG_SCRATCH_05, None),
        ("yolov6m_qa", m, AUG_SCRATCH_09, None),
    ]:
        emit(f"qarepvgg/{key}.py", p5_model(key.replace("yolov6", "YOLOv6").replace("_qa", ""), **spec),
             SOLVER_SCRATCH, aug, training_mode="qarepvggv2", solver_extra=lr,
             header=f"{key} (quantization-aware re-param blocks)")

    # ---- RepOpt family (hyper-search + repopt training)
    rn = dict(depth=0.33, width=0.25, backbone="EfficientRep", neck="RepPANNeck",
              fuse_P2=False, iou="siou", dfl=False)
    rs = dict(depth=0.33, width=0.50, backbone="EfficientRep", neck="RepPANNeck",
              fuse_P2=False, iou="giou", dfl=False)
    rt = dict(depth=0.33, width=0.375, backbone="EfficientRep", neck="RepPANNeck",
              fuse_P2=False, iou="siou", dfl=False)
    SENSITIVE_LAYERS = """[
        'detect.stems.0.conv', 'detect.stems.1.conv', 'detect.stems.2.conv',
        'detect.cls_convs.0.conv', 'detect.cls_convs.1.conv', 'detect.cls_convs.2.conv',
        'detect.reg_convs.0.conv', 'detect.reg_convs.1.conv', 'detect.reg_convs.2.conv',
        'detect.cls_preds.0', 'detect.cls_preds.1', 'detect.cls_preds.2',
        'detect.reg_preds.0', 'detect.reg_preds.1', 'detect.reg_preds.2',
    ]"""
    for key, spec, lr in [("yolov6_tiny", rt, None), ("yolov6n", rn, lr_n),
                          ("yolov6s", rs, None)]:
        mname = "YOLOv6t" if key == "yolov6_tiny" else key.replace("yolov6", "YOLOv6")
        emit(f"repopt/{key}_hs.py", p5_model(mname, **spec),
             SOLVER_SCRATCH, AUG_SCRATCH_05, training_mode="hyper_search", solver_extra=lr,
             header=f"{key} CSLA hyper-search stage (RepOpt step 1)")
        model_str = p5_model(mname, **spec).replace(
            "    pretrained=None,", f"    pretrained=None,\n    scales='assets/{key}_scale.msgpack',")
        emit(f"repopt/{key}_opt.py", model_str,
             SOLVER_SCRATCH, AUG_SCRATCH_05, training_mode="repopt", solver_extra=lr,
             header=f"{key} RepOptimizer training stage (RepOpt step 2)")
        # QAT stage (reference: configs/repopt/yolov6{n,s}_opt_qat.py,
        # yolov6_tiny_opt_qat.py): finetune the trained RepOpt model with
        # fake-quant active from a PTQ-calibrated checkpoint, tiny LR +
        # self-distillation. Recipe: docs/tutorial_quant.md.
        qat_model = p5_model(mname, **spec, pretrained=f"weights/{key}_opt.msgpack").replace(
            f"    pretrained='weights/{key}_opt.msgpack',",
            f"    pretrained='weights/{key}_opt.msgpack',\n"
            f"    scales='assets/{key}_scale.msgpack',")
        qat_solver = dict(lr0=0.00001, lrf=0.001, momentum=0.937, weight_decay=0.00005,
                          warmup_epochs=3.0, warmup_momentum=0.8, warmup_bias_lr=0.1)
        quant_block = f"""

ptq = dict(
    num_bits=8,
    calib_batches=32,
    calib_method='max',
    calib_output_path='./',
    sensitive_layers_skip=False,
    sensitive_layers_list={SENSITIVE_LAYERS},
)

qat = dict(
    calib_pt='weights/{key}_opt_calib.msgpack',
    sensitive_layers_skip=False,
    sensitive_layers_list={SENSITIVE_LAYERS},
)
"""
        emit(f"repopt/{key}_opt_qat.py", qat_model + quant_block,
             qat_solver, AUG_SCRATCH_05, training_mode="repopt",
             header=f"{key} QAT finetune stage (RepOpt step 3; "
                    f"reference configs/repopt/{key}_opt_qat.py)")

    # ---- experiment family
    t = dict(depth=0.33, width=0.375, backbone="EfficientRep", neck="RepPANNeck",
             fuse_P2=False, iou="siou", dfl=False)
    emit("experiment/yolov6t.py", p5_model("YOLOv6t", **t),
         SOLVER_SCRATCH, AUG_SCRATCH_05, header="yolov6t (0.375 width)")
    emit("experiment/yolov6t_finetune.py",
         p5_model("YOLOv6t", **t, pretrained="weights/yolov6t.pt"),
         SOLVER_FINETUNE, AUG_FINETUNE, header="yolov6t finetune recipe")
    s_csp = dict(depth=0.70, width=0.50, backbone="CSPBepBackbone", neck="CSPRepPANNeck",
                 csp_e="float(1)/2", fuse_P2=False, iou="giou", dfl=False)
    emit("experiment/yolov6s_csp_scaled.py", p5_model("YOLOv6s_csp", **s_csp),
         SOLVER_SCRATCH, AUG_SCRATCH_05, header="yolov6s csp-scaled experiment")
    # reference configs/experiment/yolov6t_csp_scaled.py: shallower CSP stack
    # (0.60/0.50), anchor-free head (anchors=1), strong-aug recipe
    t_csp = dict(depth=0.60, width=0.50, backbone="CSPBepBackbone", neck="CSPRepPANNeck",
                 csp_e="float(1)/2", fuse_P2=False, iou="giou", dfl=False, anchors=1)
    emit("experiment/yolov6t_csp_scaled.py", p5_model("YOLOv6t_csp", **t_csp),
         SOLVER_SCRATCH, AUG_SCRATCH_09, header="yolov6t csp-scaled experiment")
    n_eval = p5_model("YOLOv6n", **dict(n, fuse_P2=False, cspsppf=False))
    eval_params_block = """

eval_params = dict(
    batch_size=None,   # None -> per-device batch * 2
    img_size=None,     # None -> train image size
    conf_thres=0.03,
    iou_thres=0.65,
    shrink_size=None,  # None -> no shrink
    infer_on_rect=True,
    verbose=False,
    do_coco_metric=True,
    do_pr_metric=False,
    plot_curve=False,
    plot_confusion_matrix=False,
)
"""
    emit("experiment/yolov6n_with_eval_params.py", n_eval + eval_params_block,
         dict(SOLVER_SCRATCH, lr0=0.02), AUG_SCRATCH_05,
         header="yolov6n with in-training eval params")

    # ---- eval reproduction constants (reference: configs/experiment/eval_640_repro.py)
    repro = """# Per-model resize constants reproducing the published 640-eval protocol.
eval_params = dict(
    default=dict(img_size=640, shrink_size=2, infer_on_rect=False),
    yolov6n=dict(img_size=640, shrink_size=4, infer_on_rect=False),
    yolov6t=dict(img_size=640, shrink_size=6, infer_on_rect=False),
    yolov6s=dict(img_size=640, shrink_size=6, infer_on_rect=False),
    yolov6m=dict(img_size=640, shrink_size=4, infer_on_rect=False),
    yolov6l=dict(img_size=640, shrink_size=4, infer_on_rect=False),
    yolov6l_relu=dict(img_size=640, shrink_size=2, infer_on_rect=False),
    yolov6n6=dict(img_size=1280, shrink_size=17, infer_on_rect=False),
    yolov6s6=dict(img_size=1280, shrink_size=8, infer_on_rect=False),
    yolov6m6=dict(img_size=1280, shrink_size=64, infer_on_rect=False),
    yolov6l6=dict(img_size=1280, shrink_size=41, infer_on_rect=False),
    yolov6s_mbla=dict(img_size=640, shrink_size=7, infer_on_rect=False),
    yolov6m_mbla=dict(img_size=640, shrink_size=7, infer_on_rect=False),
    yolov6l_mbla=dict(img_size=640, shrink_size=7, infer_on_rect=False),
    yolov6x_mbla=dict(img_size=640, shrink_size=3, infer_on_rect=False),
)
"""
    os.makedirs(osp.join(ROOT, "experiment"), exist_ok=True)
    with open(osp.join(ROOT, "experiment", "eval_640_repro.py"), "w") as f:
        f.write(repro)
    print("wrote", osp.join(ROOT, "experiment", "eval_640_repro.py"))


if __name__ == "__main__":
    main()
