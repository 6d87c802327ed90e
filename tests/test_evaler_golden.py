"""End-to-end evaler-vs-evaler golden test.

The strongest mAP-parity proxy available without COCO/weights (zero-egress
env): run the REFERENCE Evaler's predict+convert path (torch CPU, reference
dataloader + letterbox + NMS + scale_coords + COCO json conversion,
reference: yolov6/core/evaler.py:100-228,361-384) and OUR Evaler on the
same synthetic dataset with the SAME weights (torch->flax importer), and
assert the produced COCO-format detections — and the mAP our evaluator
assigns them — are identical. Fails if ANY integration seam drifts:
letterbox/rect-batch shapes, scale_coords, image-id mapping, NMS protocol,
score/box rounding.

The reference's torchvision.ops.nms / pycocotools imports are shimmed
(absent in-env): NMS with an exact greedy numpy implementation of the
torchvision contract, pycocotools with inert stubs (predict_model never
touches them).
"""

import os
import os.path as osp
import shutil
import sys
import types

import cv2
import numpy as np
import pytest

import conftest

import jax
import jax.numpy as jnp

from yolov6_tpu.core.evaler import Evaler
from yolov6_tpu.data.data_load import create_dataloader
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.torch_import import import_checkpoint, torch_state_to_numpy

REF_CFG = "/root/reference/configs/yolov6n.py"
NC = 3
NAMES = ["a", "b", "c"]


def _install_reference_shims():
    """torchvision.ops.nms + pycocotools stubs so reference eval modules
    import on this image."""
    conftest.add_reference_to_path()
    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")

        def _nms(boxes, scores, iou_threshold):
            # exact greedy NMS with torchvision's IoU contract
            # (inter/union, no +1) — the op the reference NMS delegates to
            b = boxes.detach().cpu().numpy().astype(np.float64)
            s = scores.detach().cpu().numpy().astype(np.float64)
            order = np.argsort(-s, kind="stable")
            areas = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            keep = []
            while order.size:
                i = order[0]
                keep.append(int(i))
                if order.size == 1:
                    break
                rest = order[1:]
                x1 = np.maximum(b[i, 0], b[rest, 0])
                y1 = np.maximum(b[i, 1], b[rest, 1])
                x2 = np.minimum(b[i, 2], b[rest, 2])
                y2 = np.minimum(b[i, 3], b[rest, 3])
                inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
                iou = inter / (areas[i] + areas[rest] - inter + 1e-12)
                order = rest[iou <= iou_threshold]
            return torch.as_tensor(keep, dtype=torch.long)

        ops.nms = _nms
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops

    if "pycocotools" not in sys.modules:
        pct = types.ModuleType("pycocotools")
        coco_m = types.ModuleType("pycocotools.coco")
        cocoeval_m = types.ModuleType("pycocotools.cocoeval")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools stub: not available in-env")

        coco_m.COCO = _Unavailable
        cocoeval_m.COCOeval = _Unavailable
        pct.coco = coco_m
        pct.cocoeval = cocoeval_m
        sys.modules["pycocotools"] = pct
        sys.modules["pycocotools.coco"] = coco_m
        sys.modules["pycocotools.cocoeval"] = cocoeval_m


def _make_dataset(root):
    """Synthetic val split: varied aspect ratios exercise letterbox + rect
    bucketing; numeric stems exercise the image-id convention."""
    img_dir = osp.join(root, "images", "val")
    lb_dir = osp.join(root, "labels", "val")
    os.makedirs(img_dir)
    os.makedirs(lb_dir)
    rng = np.random.default_rng(0)
    sizes = [(480, 640), (640, 480), (500, 500), (720, 405),
             (333, 500), (405, 720), (640, 640), (200, 300)]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(osp.join(img_dir, f"{1000 + i}.jpg"), img)
        rows = []
        for _ in range(3):
            bw, bh = rng.uniform(0.15, 0.4), rng.uniform(0.15, 0.4)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            cls = int(rng.integers(0, NC))
            rows.append(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        with open(osp.join(lb_dir, f"{1000 + i}.txt"), "w") as f:
            f.write("\n".join(rows) + "\n")
    return img_dir


@pytest.fixture(scope="module")
def twin_datasets(tmp_path_factory):
    """Two byte-identical dataset copies (each side writes its own caches)."""
    ref_root = str(tmp_path_factory.mktemp("golden_ref"))
    our_root = str(tmp_path_factory.mktemp("golden_our"))
    ref_dir = _make_dataset(ref_root)
    shutil.rmtree(our_root)
    shutil.copytree(ref_root, our_root)
    return ref_dir, osp.join(our_root, "images", "val")


@pytest.fixture(scope="module")
def shared_weights():
    """One reference model with randomized weights + the flax import of the
    same state (the importer is bit-tested in test_model_parity)."""
    _install_reference_shims()
    import test_model_parity as tmp_mod

    _, ref_model = tmp_mod._build_reference(REF_CFG, num_classes=NC, seed=4)
    state = torch_state_to_numpy(ref_model)

    cfg = Config.fromfile(REF_CFG)
    if not hasattr(cfg, "training_mode"):
        cfg.training_mode = "repvgg"
    model = build_model(cfg, num_classes=NC, deploy=False)
    spec = jax.eval_shape(
        lambda a: model.init(jax.random.PRNGKey(0), a, train=False),
        jnp.zeros((1, 96, 96, 3), jnp.float32),
    )
    variables = import_checkpoint(state, spec, training_mode="repvgg", deploy=False)
    return ref_model, model, variables


def _reference_predictions(ref_model, img_dir, img_size, conf, iou,
                           shrink_size, rect):
    """The reference predict path, end to end (evaler.py:100-130,361-384)."""
    from yolov6.core.evaler import Evaler as RefEvaler

    data_dict = {"nc": NC, "names": NAMES, "is_coco": False, "val": img_dir}
    ev = RefEvaler(
        data_dict, batch_size=4, img_size=img_size, conf_thres=conf,
        iou_thres=iou, device="cpu", half=False, shrink_size=shrink_size,
        infer_on_rect=rect,
    )
    ev.stride = 32
    loader = ev.init_data(None, "val")
    pred_results, _vis_outputs, _vis_paths = ev.predict_model(
        ref_model, loader, "val"
    )
    return pred_results


def _our_predictions(model, variables, img_dir, img_size, conf, iou,
                     shrink_size, rect, tmp_dir):
    data_dict = {"nc": NC, "names": NAMES, "is_coco": False, "val": img_dir}
    ev = Evaler(
        data_dict, batch_size=4, img_size=img_size, conf_thres=conf,
        iou_thres=iou, half=False, save_dir=tmp_dir,
        shrink_size=shrink_size, infer_on_rect=rect, data_parallel=False,
    )
    loader = ev.init_data(None, "val")
    ev.init_model(model, variables)
    preds = ev.predict_model(model, loader, "val")
    return ev, loader, preds


def _norm(preds):
    """Sort + normalize image-id types (reference uses the raw str stem when
    not is_coco; we parse numeric stems to int — same id space)."""
    rows = [
        (str(p["image_id"]), p["category_id"], p["score"], tuple(p["bbox"]))
        for p in preds
    ]
    return sorted(rows, key=lambda r: (r[0], r[1], -r[2], r[3]))


def _assert_matching(ref_preds, our_preds):
    a, b = _norm(ref_preds), _norm(our_preds)
    assert len(a) == len(b), f"{len(a)} reference vs {len(b)} our detections"
    for ra, rb in zip(a, b):
        assert ra[0] == rb[0] and ra[1] == rb[1], (ra, rb)
        assert abs(ra[2] - rb[2]) < 1e-3, (ra, rb)  # scores (rounded to 5dp)
        np.testing.assert_allclose(ra[3], rb[3], atol=0.5, err_msg=str((ra, rb)))


def _run_protocol(shared_weights, twin_datasets, tmp_path, img_size, conf,
                  iou, shrink_size, rect):
    ref_model, model, variables = shared_weights
    ref_dir, our_dir = twin_datasets
    ref_preds = _reference_predictions(
        ref_model, ref_dir, img_size, conf, iou, shrink_size, rect
    )
    ev, loader, our_preds = _our_predictions(
        model, variables, our_dir, img_size, conf, iou, shrink_size, rect,
        str(tmp_path),
    )
    assert len(our_preds) > 0, "vacuous: no detections"
    _assert_matching(ref_preds, our_preds)

    # mAP: identical scores from OUR evaluator on both prediction sets
    # (pycocotools is absent, so the reference's own COCOeval can't run; the
    # evaluator itself is oracle-tested in test_coco_eval_oracle)
    def _as_ours(preds):
        return [
            {**p, "image_id": int(p["image_id"])}
            if str(p["image_id"]).isnumeric() else p
            for p in preds
        ]

    ap50_ref, ap_ref = ev.eval_model(_as_ours(ref_preds), model, loader)
    ap50_our, ap_our = ev.eval_model(_as_ours(our_preds), model, loader)
    assert abs(ap50_ref - ap50_our) < 1e-3
    assert abs(ap_ref - ap_our) < 1e-3


def test_evaler_golden_square(shared_weights, twin_datasets, tmp_path):
    """640-repro protocol shape at 96px: conf 0.03 / iou 0.65 / multi-label,
    square letterbox, no shrink."""
    _run_protocol(shared_weights, twin_datasets, tmp_path,
                  img_size=96, conf=0.03, iou=0.65, shrink_size=0, rect=False)


@pytest.mark.slow
def test_evaler_golden_rect_shrink(shared_weights, twin_datasets, tmp_path):
    """infer_on_rect + shrink_size variant (reference --reproduce_640_eval
    eval_params): rect buckets change batch shapes, shrink changes the
    load-time ratio — both must flow through identically."""
    _run_protocol(shared_weights, twin_datasets, tmp_path,
                  img_size=128, conf=0.03, iou=0.65, shrink_size=32, rect=True)
