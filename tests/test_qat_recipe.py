"""End-to-end QAT recipe: FP train -> PTQ calibrate -> QAT finetune -> eval.

Integration analog of the reference QAT flow (reference:
tools/qat/qat_utils.py:53-130 and the repopt QAT recipe in
configs/repopt/*_opt_qat.py): a quant-friendly plain-conv model is trained
in fp, calibrated with `tools/train.py --quant --calib`, finetuned with
`--quant` (fake-quant active, frozen ranges), and evaluated at every stage.
Validates the whole surface, not the unit math (tests/test_qat.py does
that): config plumbing, calib checkpoint layout, eval-under-quant inside
the trainer, and quant ranges persisting into the QAT checkpoints.
"""

import importlib.util
import os.path as osp

import numpy as np
import pytest
import yaml

import conftest  # noqa: F401  (forces CPU platform)

import cv2
import flax
import jax

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def overfit_dataset(tmp_path_factory):
    """Tiny set whose val IS the train split — eval measures memorization.
    Objects are solid class-colored rectangles on gray so a few CPU epochs
    produce real detections (noise images train to zero AP)."""
    root = tmp_path_factory.mktemp("qatds")
    rng = np.random.default_rng(7)
    img_dir = root / "images" / "train"
    lb_dir = root / "labels" / "train"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    palette = [(40, 40, 230), (40, 230, 40), (230, 40, 40)]  # BGR per class
    for i in range(12):
        img = np.full((96, 96, 3), 114, np.uint8)
        rows = []
        for _ in range(int(rng.integers(1, 4))):
            bw, bh = rng.uniform(0.25, 0.5), rng.uniform(0.25, 0.5)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            k = int(rng.integers(0, 3))
            x0, y0 = int((cx - bw / 2) * 96), int((cy - bh / 2) * 96)
            x1, y1 = int((cx + bw / 2) * 96), int((cy + bh / 2) * 96)
            cv2.rectangle(img, (x0, y0), (x1, y1), palette[k], -1)
            rows.append(f"{k} {cx:.4f} {cy:.4f} {bw:.4f} {bh:.4f}")
        cv2.imwrite(str(img_dir / f"im{i:03d}.jpg"), img)
        (lb_dir / f"im{i:03d}.txt").write_text("\n".join(rows) + "\n")
    data_yaml = root / "data.yaml"
    data_yaml.write_text(yaml.safe_dump({
        "train": str(img_dir), "val": str(img_dir),
        "nc": 3, "names": ["a", "b", "c"], "is_coco": False,
    }))
    return str(data_yaml)


def _train_cli():
    spec = importlib.util.spec_from_file_location("qat_train_cli", "/root/repo/tools/train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _run_train(train_cli, data_yaml, conf_file, out_dir, name, epochs, extra=()):
    args = train_cli.get_args_parser().parse_args([
        "--data-path", data_yaml,
        "--conf-file", conf_file,
        "--img-size", "64", "--img-floor", "64",
        "--batch-size", "4",
        "--epochs", str(epochs),
        "--workers", "2",
        "--eval-interval", str(epochs),
        "--heavy-eval-range", "0",
        "--stop_aug_last_n_epoch", str(epochs),  # plain aug: memorize
        "--output-dir", out_dir, "--name", name,
        "--max-labels", "8", "--log-interval", "5",
        *extra,
    ])
    train_cli.main(args)
    return args.save_dir


def _eval_ap(data_yaml, conf_file, variables, img=64):
    """mAP50:95 with whatever quant mode is currently active."""
    from yolov6_tpu.core.evaler import Evaler
    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config
    from yolov6_tpu.utils.events import load_yaml

    data_dict = load_yaml(data_yaml)
    cfg = Config.fromfile(conf_file)
    model = build_model(cfg, num_classes=3, deploy=False)
    # conf 0.001: a briefly-trained tiny model's detections sit well below
    # the 0.03 eval default — AP must be nonzero for the stage comparison
    # to mean anything
    evaler = Evaler(data_dict, batch_size=4, img_size=img, conf_thres=0.001,
                    plot_curve=False)
    evaler.init_model(model, variables)
    loader = evaler.init_data(None, "val")
    preds = evaler.predict_model(model, loader, "val")
    return evaler.eval_model(preds, model, loader, "val")[1]


def test_qat_full_recipe(overfit_dataset, tmp_path):
    from yolov6_tpu.quant import set_quant_mode
    from yolov6_tpu.utils.checkpoint import load_native_checkpoint

    train_cli = _train_cli()
    base_conf = "/root/repo/configs/base/yolov6n_base.py"

    # ---- stage 1: FP training
    fp_dir = _run_train(train_cli, overfit_dataset, base_conf,
                        str(tmp_path), "fp", epochs=8)
    fp_ckpt = osp.join(fp_dir, "weights", "last_ckpt.msgpack")
    assert osp.exists(fp_ckpt)
    set_quant_mode(False)

    fp_vars = load_native_checkpoint(fp_ckpt)["model"]
    ap_fp = _eval_ap(overfit_dataset, base_conf, fp_vars)

    # ---- stage 2: PTQ calibration (tools/train.py --quant --calib)
    calib_out = str(tmp_path / "calib")
    ptq_conf = str(tmp_path / "qat_conf.py")
    with open(base_conf) as f:
        conf_body = f.read()
    conf_body = conf_body.replace(
        "    pretrained=None,", f"    pretrained={fp_ckpt!r},"
    )
    conf_body += f"""

ptq = dict(
    num_bits=8,
    calib_batches=3,
    calib_method='max',
    calib_output_path={calib_out!r},
    sensitive_layers_skip=False,
    sensitive_layers_list=[],
)

qat = dict(
    calib_pt={osp.join(calib_out, 'calib_ckpt.msgpack')!r},
    sensitive_layers_skip=False,
    sensitive_layers_list=[],
)
"""
    with open(ptq_conf, "w") as f:
        f.write(conf_body)

    _run_train(train_cli, overfit_dataset, ptq_conf, str(tmp_path), "calib",
               epochs=1, extra=["--quant", "--calib"])
    calib_ckpt_path = osp.join(calib_out, "calib_ckpt.msgpack")
    assert osp.exists(calib_ckpt_path)
    calib_vars = load_native_checkpoint(calib_ckpt_path)["model"]
    amaxes = [v for v in jax.tree_util.tree_leaves(calib_vars["quant"])]
    assert amaxes and all(np.asarray(a) > 0 for a in amaxes), \
        "calibration recorded no activation ranges"

    # PTQ eval: fake-quant active with calibrated ranges
    set_quant_mode(True, calibrating=False, num_bits=8)
    try:
        ap_ptq = _eval_ap(overfit_dataset, ptq_conf, calib_vars)
    finally:
        set_quant_mode(False)

    # ---- stage 3: QAT finetune (--quant; loads qat.calib_pt, evals in-loop)
    qat_dir = _run_train(train_cli, overfit_dataset, ptq_conf, str(tmp_path),
                         "qat", epochs=2, extra=["--quant"])
    qat_ckpt = load_native_checkpoint(osp.join(qat_dir, "weights", "last_ckpt.msgpack"))
    qat_vars = qat_ckpt["model"]
    assert "quant" in qat_vars, "QAT checkpoint must embed calibrated ranges"
    set_quant_mode(False)

    set_quant_mode(True, calibrating=False, num_bits=8)
    try:
        ap_qat = _eval_ap(overfit_dataset, ptq_conf, qat_vars)
    finally:
        set_quant_mode(False)

    print(f"AP fp={ap_fp:.4f} ptq={ap_ptq:.4f} qat={ap_qat:.4f}")
    for name, v in (("fp", ap_fp), ("ptq", ap_ptq), ("qat", ap_qat)):
        assert np.isfinite(v) and v >= 0, f"{name} AP invalid: {v}"
    # int8 QAT finetuning must not collapse the quantized model; allow noise
    # on the tiny synthetic set but catch wholesale breakage of the flow
    assert ap_qat >= ap_ptq - 0.1, f"QAT regressed: {ap_qat} vs PTQ {ap_ptq}"
