"""End-to-end eval pipeline test on a synthetic dataset.

A mock detector that emits the ground-truth boxes (in letterboxed coords)
must score mAP ~= 1.0 after the full chain: dataset scan -> letterbox ->
label transform -> (mock) inference -> scale_coords -> COCO conversion ->
COCO evaluator. This pins the geometry of the whole eval path.
"""

import os
import os.path as osp

import cv2
import numpy as np
import pytest

import conftest

from yolov6_tpu.core.evaler import Evaler
from yolov6_tpu.data.data_load import create_dataloader


@pytest.fixture(scope="module")
def synthetic_dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth")
    img_dir = root / "images" / "val"
    lb_dir = root / "labels" / "val"
    img_dir.mkdir(parents=True)
    lb_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    sizes = [(480, 640), (640, 480), (500, 500), (720, 405)]
    for i, (h, w) in enumerate(sizes):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{1000 + i}.jpg"), img)
        # 2 boxes per image, normalized xywh
        rows = []
        for _ in range(2):
            bw, bh = rng.uniform(0.2, 0.4), rng.uniform(0.2, 0.4)
            cx = rng.uniform(bw / 2, 1 - bw / 2)
            cy = rng.uniform(bh / 2, 1 - bh / 2)
            cls = int(rng.integers(0, 3))
            rows.append(f"{cls} {cx:.6f} {cy:.6f} {bw:.6f} {bh:.6f}")
        (lb_dir / f"{1000 + i}.txt").write_text("\n".join(rows) + "\n")
    return str(img_dir)


def test_eval_pipeline_perfect_mock(synthetic_dataset, tmp_path):
    data_dict = {"nc": 3, "names": ["a", "b", "c"], "is_coco": False, "val": synthetic_dataset}
    loader, dataset = create_dataloader(
        synthetic_dataset, img_size=320, batch_size=2, data_dict=data_dict, task="val"
    )
    assert "anno_path" in data_dict  # auto-generated GT json

    evaler = Evaler(data_dict, batch_size=2, img_size=320, save_dir=str(tmp_path))
    max_det = 300

    class MockInfer:
        """Emit detections exactly at the letterboxed GT boxes."""

        def __call__(self, variables, imgs):
            imgs = np.asarray(imgs)
            b, h, w, _ = imgs.shape
            dets = np.zeros((b, max_det, 6), np.float32)
            valid = np.zeros((b, max_det), bool)
            labels = self._labels
            for i in range(b):
                lb = labels[i]
                lb = lb[lb[:, 0] >= 0]
                for j, (cls, cx, cy, bw, bh) in enumerate(lb):
                    dets[i, j] = [
                        (cx - bw / 2) * w, (cy - bh / 2) * h,
                        (cx + bw / 2) * w, (cy + bh / 2) * h,
                        0.9, cls,
                    ]
                    valid[i, j] = True
            return dets, valid

    mock = MockInfer()
    evaler._infer = mock
    evaler.variables = None

    pred_results = []
    for imgs, labels, paths, shapes, n_valid in loader:
        mock._labels = labels
        dets, valid = mock(None, imgs)
        pred_results.extend(
            evaler.convert_to_coco_format(dets[:n_valid], valid[:n_valid], paths, shapes)
        )
    assert len(pred_results) == 8  # 4 images x 2 boxes

    ap50, ap = evaler.eval_model(pred_results, None, loader)
    assert ap50 > 0.99, f"AP50={ap50}"
    assert ap > 0.95, f"AP={ap}"


def test_eval_pipeline_rect_mode(synthetic_dataset, tmp_path):
    """infer_on_rect: aspect-ratio-bucketed batch shapes still score mAP ~1
    with the GT-echo mock (exercises variable-shape batches + scale_coords)."""
    data_dict = {"nc": 3, "names": ["a", "b", "c"], "is_coco": False, "val": synthetic_dataset}
    loader, dataset = create_dataloader(
        synthetic_dataset, img_size=320, batch_size=2, data_dict=data_dict,
        task="val", rect=True, pad=0.5,
    )
    assert dataset.batch_shapes is not None
    evaler = Evaler(data_dict, batch_size=2, img_size=320, save_dir=str(tmp_path),
                    infer_on_rect=True)

    pred_results = []
    shapes_seen = set()
    for imgs, labels, paths, shapes, n_valid in loader:
        b, h, w, _ = imgs.shape
        shapes_seen.add((h, w))
        dets = np.zeros((b, 300, 6), np.float32)
        valid = np.zeros((b, 300), bool)
        for i in range(b):
            lb = labels[i]
            lb = lb[lb[:, 0] >= 0]
            for j, (cls, cx, cy, bw, bh) in enumerate(lb):
                dets[i, j] = [(cx - bw / 2) * w, (cy - bh / 2) * h,
                              (cx + bw / 2) * w, (cy + bh / 2) * h, 0.9, cls]
                valid[i, j] = True
        pred_results.extend(
            evaler.convert_to_coco_format(dets[:n_valid], valid[:n_valid], paths, shapes)
        )
    ap50, ap = evaler.eval_model(pred_results, None, loader)
    assert ap50 > 0.99 and ap > 0.95, (ap50, ap, shapes_seen)


def test_eval_pipeline_shifted_boxes_degrade(synthetic_dataset, tmp_path):
    """Shifting mock detections must lower strict-IoU AP but keep AP50."""
    data_dict = {"nc": 3, "names": ["a", "b", "c"], "is_coco": False, "val": synthetic_dataset}
    loader, _ = create_dataloader(
        synthetic_dataset, img_size=320, batch_size=2, data_dict=data_dict, task="val"
    )
    evaler = Evaler(data_dict, batch_size=2, img_size=320, save_dir=str(tmp_path))

    pred_results = []
    for imgs, labels, paths, shapes, n_valid in loader:
        b, h, w, _ = imgs.shape
        dets = np.zeros((b, 300, 6), np.float32)
        valid = np.zeros((b, 300), bool)
        for i in range(b):
            lb = labels[i]
            lb = lb[lb[:, 0] >= 0]
            for j, (cls, cx, cy, bw, bh) in enumerate(lb):
                shift = 0.1 * bw * w  # ~10% width shift
                dets[i, j] = [
                    (cx - bw / 2) * w + shift, (cy - bh / 2) * h,
                    (cx + bw / 2) * w + shift, (cy + bh / 2) * h,
                    0.9, cls,
                ]
                valid[i, j] = True
        pred_results.extend(
            evaler.convert_to_coco_format(dets[:n_valid], valid[:n_valid], paths, shapes)
        )
    ap50, ap = evaler.eval_model(pred_results, None, loader)
    assert ap50 > 0.99
    assert ap < 0.95


def test_eval_data_parallel_matches_single_device(synthetic_dataset, tmp_path):
    """Batch-sharded SPMD eval (8 virtual devices) must produce the same
    detections as single-device eval — validates Evaler's mesh path
    (init_model in_shardings + _device_put)."""
    import jax
    import jax.numpy as jnp

    from yolov6_tpu.models.yolo import build_model
    from yolov6_tpu.utils.config import Config

    assert jax.device_count() == 8  # conftest virtual mesh

    data_dict = {"nc": 3, "names": ["a", "b", "c"], "is_coco": False, "val": synthetic_dataset}
    cfg = Config.fromfile("/root/repo/configs/yolov6n.py")
    model = build_model(cfg, num_classes=3, deploy=True)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )

    def run(data_parallel):
        ev = Evaler(
            dict(data_dict), batch_size=8, img_size=64, conf_thres=0.01, half=False,
            save_dir=str(tmp_path), data_parallel=data_parallel,
        )
        ev.init_model(model, variables)
        if data_parallel:
            assert ev.mesh is not None
        loader = ev.init_data(None, "val")
        return ev.predict_model(model, loader, "val")

    preds_dp = run(True)
    preds_sd = run(False)
    assert len(preds_dp) == len(preds_sd)
    for a, b in zip(preds_dp, preds_sd):
        assert a["image_id"] == b["image_id"] and a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-3)
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-5)


def test_eval_pipeline_overlap_preserves_results(synthetic_dataset, tmp_path):
    """predict_model's one-batch software pipeline (batch i+1 dispatched
    before batch i's results are fetched) must produce exactly the results
    of a synchronous per-batch loop, in the same order."""
    import jax.numpy as jnp

    data_dict = {"nc": 3, "names": ["a", "b", "c"], "is_coco": False, "val": synthetic_dataset}
    loader, _ = create_dataloader(
        synthetic_dataset, img_size=320, batch_size=2, data_dict=data_dict, task="val"
    )
    assert len(loader) >= 2  # pipelining only engages with >1 batch

    evaler = Evaler(data_dict, batch_size=2, img_size=320, save_dir=str(tmp_path))

    def infer(variables, imgs):
        # deterministic function of the IMAGE CONTENT so a mixed-up
        # batch<->metadata pairing in the pipeline would change the output
        imgs = jnp.asarray(imgs, jnp.float32)
        b = imgs.shape[0]
        m = jnp.mean(imgs, axis=(1, 2, 3))
        one = jnp.ones((b,), jnp.float32)
        det = jnp.stack(
            [4 * one, 4 * one, 40 + m, 40 + m, 0.5 * one, 0 * one], axis=-1
        )
        dets = jnp.zeros((b, 300, 6), jnp.float32).at[:, 0].set(det)
        valid = jnp.zeros((b, 300), bool).at[:, 0].set(True)
        return dets, valid

    evaler._infer = infer
    evaler.variables = None

    class Shim:
        num_classes = 3

    got = evaler.predict_model(Shim(), loader, "val")

    want = []
    for imgs, labels, paths, shapes, n_valid in loader:
        dets, valid = infer(None, evaler._device_put(imgs))
        dets, valid = np.asarray(dets), np.asarray(valid)
        want.extend(
            evaler.convert_to_coco_format(dets[:n_valid], valid[:n_valid], paths, shapes)
        )
    assert len(got) == len(want) > 0
    for a, b in zip(got, want):
        assert a["image_id"] == b["image_id"] and a["category_id"] == b["category_id"]
        np.testing.assert_allclose(a["bbox"], b["bbox"], atol=1e-6)
        np.testing.assert_allclose(a["score"], b["score"], atol=1e-7)
