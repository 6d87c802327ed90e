"""COCO evaluation runtime (reference: yolov6/core/evaler.py).

The whole per-batch compute — uint8 normalize, backbone/neck/head forward,
DFL decode, and fixed-shape NMS — runs as ONE jit-compiled function, so eval
is a single device dispatch per batch (the reference runs model forward and
torchvision NMS as separate phases; we keep their 3-phase timing split for
the ``speed`` task by optionally splitting the dispatch).
"""

from __future__ import annotations

import json
import os.path as osp
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolov6_tpu.data.data_load import create_dataloader
from yolov6_tpu.models.effidehead import decode_eval
from yolov6_tpu.ops.nms import non_max_suppression
from yolov6_tpu.utils.coco_eval import COCOEvaluator, coco80_to_coco91_class
from yolov6_tpu.utils.events import LOGGER


class Evaler:
    def __init__(
        self,
        data_dict: dict,
        batch_size: int = 32,
        img_size: int = 640,
        conf_thres: float = 0.03,
        iou_thres: float = 0.65,
        half: bool = True,
        save_dir: str = "",
        shrink_size: int = 0,
        infer_on_rect: bool = False,
        verbose: bool = False,
        specific_shape: bool = False,
        height: int = 640,
        width: int = 640,
        max_det: int = 300,
        max_nms: int = 8192,
        bf16_select: bool = False,
        row_select: str = "grouped",
        do_coco_metric: bool = True,
        do_pr_metric: bool = False,
        plot_curve: bool = False,
        plot_confusion_matrix: bool = False,
        data_parallel: bool = True,
    ):
        self.data = data_dict
        self.batch_size = batch_size
        self.img_size = img_size
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.half = half
        self.save_dir = save_dir
        self.shrink_size = shrink_size
        self.infer_on_rect = infer_on_rect
        self.verbose = verbose
        self.specific_shape = specific_shape
        self.height = height
        self.width = width
        self.max_det = max_det
        # candidate cap fed to NMS. The reference uses 30000 exact
        # (utils/nms.py:55); 8192 + approx_max_k measures 0.9997 detection
        # agreement with that protocol on adversarially dense scenes at
        # ~13 ms/b32 via the tiled keep kernel (sweep: docs/nms_fidelity.md,
        # tools/nms_sweep.py). 2000 was 6 ms but only 0.915 agreement.
        self.max_nms = max_nms
        # bf16 candidate-ranking (fp32 re-score): opt-in until the mAP
        # impact is measured on real data (docs/nms_fidelity.md)
        self.bf16_select = bf16_select
        self.row_select = row_select
        self.is_coco = data_dict.get("is_coco", False)
        self.ids = coco80_to_coco91_class() if self.is_coco else list(range(1000))
        self.class_names = tuple(data_dict.get("names", ()) or ())
        self.speed_result = np.zeros(4)
        self.do_coco_metric = do_coco_metric
        self.do_pr_metric = do_pr_metric
        self.plot_curve = plot_curve
        self.plot_confusion_matrix = plot_confusion_matrix
        self.pr_results = None
        # ---- multi-chip: shard the eval batch across a 1-D data mesh (the
        # serving/eval analog of DDP inference; SPMD — one jit, XLA splits
        # the batch over ICI-connected chips, NMS included). The mesh covers
        # the LOCAL devices only: in multi-host training each host evals its
        # own dataset shard SPMD over its chips and the COCO rows are
        # host-gathered afterwards (gather_coco_predictions) — a global mesh
        # would reference non-addressable devices and hang the pod.
        self.mesh = None
        ndev = jax.local_device_count()
        if data_parallel and ndev > 1 and batch_size % ndev == 0:
            from yolov6_tpu.parallel.mesh import create_mesh

            self.mesh = create_mesh(local=True)
            LOGGER.info(f"eval: sharding batch {batch_size} across {ndev} devices")

    # ------------------------------------------------------------ model/data

    def init_model(self, model, variables):
        """Build the jitted serving function over (variables, uint8 imgs)."""
        dtype = jnp.bfloat16 if self.half else jnp.float32

        def _infer(variables, imgs_u8):
            x = imgs_u8.astype(dtype) / dtype(255.0)
            head_out, _ = model.apply(variables, x, train=False)
            preds = decode_eval(head_out, model.num_classes, model.strides, model.use_dfl, model.reg_max)
            return non_max_suppression(
                preds, self.conf_thres, self.iou_thres, max_det=self.max_det,
                max_nms=self.max_nms, multi_label=True,
                bf16_select=self.bf16_select,
                row_select=self.row_select,
            )

        def _forward(variables, imgs_u8):
            return model.apply(variables, imgs_u8.astype(dtype) / dtype(255.0), train=False)

        if self.mesh is not None:
            from yolov6_tpu.parallel.mesh import batch_sharding, replicate_state, replicated

            rep, shd = replicated(self.mesh), batch_sharding(self.mesh)
            variables = replicate_state(self.mesh, variables)
            self._infer = jax.jit(_infer, in_shardings=(rep, shd))
            self._forward_only = jax.jit(_forward, in_shardings=(rep, shd))
        else:
            self._infer = jax.jit(_infer)
            self._forward_only = jax.jit(_forward)
        self.model = model
        self.variables = variables
        return model

    def _device_put(self, imgs):
        """Host batch -> device array, batch-sharded across the mesh when
        data-parallel eval is active."""
        if self.mesh is not None:
            from yolov6_tpu.parallel.mesh import batch_sharding

            return jax.device_put(np.asarray(imgs), batch_sharding(self.mesh))
        return jnp.asarray(imgs)

    def init_artifact(self, path: str, num_classes: int = 80):
        """Evaluate an exported StableHLO end-to-end artifact instead of a
        live model — the analog of the reference's TensorRT-engine eval
        (reference: evaler.py:441-545 eval_trt).

        The artifact must be exported with --end2end and WITHOUT
        --with-preprocess (float RGB input).

        A GSPMD artifact (exported with --shard-devices N) is executed over
        an N-device ``data`` mesh with the batch sharded on axis 0; a plain
        single-device artifact runs unsharded — feeding it a mesh-sharded
        batch would raise a device-count mismatch, so the data-parallel
        path is disabled for it.

        An artifact exported with --weights-as-args (M6/L6-sized models;
        weights ride in the ``<path>.weights.msgpack`` sidecar instead of
        being embedded as HLO constants) loads transparently."""
        from yolov6_tpu.models.end2end import load_serving

        art = load_serving(path)
        nr = getattr(art, "nr_devices", 1)
        if nr > 1:
            if len(jax.devices()) < nr:
                raise RuntimeError(
                    f"artifact was exported for {nr} devices; "
                    f"only {len(jax.devices())} available"
                )
            if self.batch_size % nr:
                raise RuntimeError(
                    f"batch_size {self.batch_size} not divisible by the "
                    f"artifact's {nr}-device mesh"
                )
            from yolov6_tpu.parallel.mesh import create_mesh

            self.mesh = create_mesh(nr)
            LOGGER.info(f"artifact eval: GSPMD over {nr} devices")
        else:
            self.mesh = None

        max_det = self.max_det

        def _infer(_variables, imgs_u8):
            x = imgs_u8.astype(jnp.float32) / 255.0
            num_dets, boxes, scores, classes = art.call(x)
            dets = jnp.concatenate(
                [boxes, scores[..., None], classes[..., None].astype(jnp.float32)], -1
            )
            valid = (
                jnp.arange(dets.shape[1])[None, :] < num_dets.astype(jnp.int32)
            )
            return dets, valid

        self._infer = _infer
        self.variables = None

        class _Shim:
            pass

        shim = _Shim()
        shim.num_classes = num_classes
        self.model = shim
        return shim

    def init_data(self, dataloader=None, task: str = "val"):
        if task != "train" and dataloader is None:
            pad = 0.5 if self.infer_on_rect else 0.0
            eval_hyp = {"shrink_size": self.shrink_size} if self.shrink_size else {}
            dataloader, _ = create_dataloader(
                self.data[task if task in self.data else "val"],
                self.img_size,
                self.batch_size,
                hyp=eval_hyp,
                rect=self.infer_on_rect,
                pad=pad,
                data_dict=self.data,
                task=task,
                specific_shape=self.specific_shape,
                height=self.height,
                width=self.width,
            )
        return dataloader

    # --------------------------------------------------------------- predict

    def predict_model(self, model, dataloader, task: str = "val"):
        """Run inference over the loader; returns COCO-format detections
        (reference: evaler.py:100-228)."""
        self.speed_result = np.zeros(4)
        pred_results = []
        stats = []
        confusion = None
        iouv = np.linspace(0.5, 0.95, 10)
        if self.do_pr_metric and self.plot_confusion_matrix:
            from yolov6_tpu.utils.metrics import ConfusionMatrix

            confusion = ConfusionMatrix(nc=model.num_classes)

        n_batches = len(dataloader)
        t_loop = time.time()

        def drain(p):
            """Fetch + post-process one in-flight batch."""
            dets_dev, valid_dev, paths, shapes, labels, hw, n_valid = p
            dets = np.asarray(jax.device_get(dets_dev))
            valid = np.asarray(jax.device_get(valid_dev))
            pred_results.extend(
                self.convert_to_coco_format(dets[:n_valid], valid[:n_valid], paths, shapes)
            )
            if self.do_pr_metric:
                stats.extend(
                    self._pr_stats(dets, valid, labels, hw, n_valid, iouv, confusion)
                )

        # one-batch software pipeline: batch i+1's host->device transfer and
        # device forward are dispatched (JAX dispatch is async) BEFORE batch
        # i's results are fetched and post-processed on host, so transfer,
        # compute and host postproc overlap (the reference's loop is fully
        # synchronous per batch, evaler.py:100-137)
        pending = None
        for bi, (imgs, labels, paths, shapes, n_valid) in enumerate(dataloader):
            imgs_dev = self._device_put(imgs)
            dets_dev, valid_dev = self._infer(self.variables, imgs_dev)
            self.speed_result[0] += n_valid
            if pending is not None:
                drain(pending)
            pending = (dets_dev, valid_dev, paths, shapes, labels,
                       imgs.shape[1:3], n_valid)
            if bi % 20 == 0:
                LOGGER.info(f"eval batch {bi + 1}/{n_batches}")
        if pending is not None:
            drain(pending)
        # combined device+host wall time over the pipelined loop (per-batch
        # attribution is meaningless once stages overlap)
        self.speed_result[2] += time.time() - t_loop

        if self.do_pr_metric and stats:
            self._finish_pr_metric(stats, model)
        if confusion is not None and self.save_dir:
            names = getattr(self, "class_names", ()) or ()
            confusion.plot(save_dir=self.save_dir, names=tuple(names))
            LOGGER.info(f"Saved confusion matrix plot to {self.save_dir}")
        return pred_results

    def _pr_stats(self, dets, valid, labels, hw, n_valid, iouv, confusion):
        """Per-image TP stats in letterbox coords (reference: evaler.py:137-227)."""
        from yolov6_tpu.utils.metrics import process_batch

        h, w = hw
        out = []
        for i in range(n_valid):
            pred = dets[i][valid[i]]
            lb = labels[i]
            lb = lb[lb[:, 0] >= 0]
            gt = np.zeros((len(lb), 5), np.float32)
            if len(lb):
                gt[:, 0] = lb[:, 0]
                cx, cy, bw, bh = lb[:, 1] * w, lb[:, 2] * h, lb[:, 3] * w, lb[:, 4] * h
                gt[:, 1], gt[:, 2] = cx - bw / 2, cy - bh / 2
                gt[:, 3], gt[:, 4] = cx + bw / 2, cy + bh / 2
            correct = process_batch(pred, gt, iouv)
            if confusion is not None:
                confusion.process_batch(pred, gt)
            out.append((correct, pred[:, 4], pred[:, 5], gt[:, 0]))
        return out

    def _finish_pr_metric(self, stats, model):
        from yolov6_tpu.utils.metrics import ap_per_class

        tp = np.concatenate([s[0] for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pred_cls = np.concatenate([s[2] for s in stats])
        target_cls = np.concatenate([s[3] for s in stats])
        if tp.size == 0:
            self.pr_results = None
            return
        names = tuple(getattr(self, "class_names", ()) or ())
        p, r, ap, f1, classes = ap_per_class(
            tp, conf, pred_cls, target_cls,
            plot=self.plot_curve and bool(self.save_dir),
            save_dir=self.save_dir or ".", names=names,
        )
        ap50, ap_all = ap[:, 0].mean(), ap.mean()
        LOGGER.info(
            f"PR metric: P={p.mean():.4f} R={r.mean():.4f} F1={f1.mean():.4f} "
            f"mAP@0.5={ap50:.4f} mAP@0.5:0.95={ap_all:.4f}"
        )
        self.pr_results = (float(ap50), float(ap_all))

    @staticmethod
    def scale_coords(coords, img0_shape, ratio_pad):
        """Letterbox pixels -> original-image pixels (reference: evaler.py:340-359)."""
        gain, pad = ratio_pad
        coords = coords.copy()
        coords[:, [0, 2]] = (coords[:, [0, 2]] - pad[0]) / gain[1]
        coords[:, [1, 3]] = (coords[:, [1, 3]] - pad[1]) / gain[0]
        coords[:, [0, 2]] = coords[:, [0, 2]].clip(0, img0_shape[1])
        coords[:, [1, 3]] = coords[:, [1, 3]].clip(0, img0_shape[0])
        return coords

    def convert_to_coco_format(self, dets, valid, paths, shapes):
        """(reference: evaler.py:361-384)"""
        results = []
        for i in range(len(dets)):
            keep = valid[i]
            if not keep.any():
                continue
            pred = dets[i][keep]
            path = Path(paths[i])
            shape0, ratio_pad = shapes[i]
            boxes = self.scale_coords(pred[:, :4], shape0, ratio_pad)
            # match the dataset GT convention: numeric stems become int ids
            image_id = int(path.stem) if path.stem.isnumeric() else path.stem
            # xyxy -> xywh top-left
            wh = boxes[:, 2:4] - boxes[:, 0:2]
            xy = boxes[:, 0:2]
            for j in range(pred.shape[0]):
                results.append(
                    {
                        "image_id": image_id,
                        "category_id": self.ids[int(pred[j, 5])],
                        "bbox": [round(float(v), 3) for v in np.concatenate([xy[j], wh[j]])],
                        "score": round(float(pred[j, 4]), 5),
                    }
                )
        return results

    # ----------------------------------------------------------------- eval

    def eval_model(self, pred_results, model, dataloader, task: str = "val"):
        """COCO mAP via the built-in evaluator (reference: evaler.py:231-321)."""
        if not self.do_coco_metric:
            return self.pr_results or (0.0, 0.0)
        LOGGER.info(f"Evaluating mAP by our COCO-protocol evaluator...")
        anno_path = self.data.get(
            "anno_path",
            osp.join(
                self.data.get("path", "."), "annotations", "instances_val2017.json"
            ),
        )
        if self.save_dir:
            pred_json = osp.join(self.save_dir, "predictions.json")
            with open(pred_json, "w") as f:
                json.dump(pred_results, f)
        if not pred_results:
            LOGGER.warning("no detections produced; mAP = 0")
            return (0.0, 0.0)
        with open(anno_path) as f:
            gt = json.load(f)
        if self.is_coco:
            # restrict GT to evaluated images (subset evals)
            eval_ids = {d["image_id"] for d in pred_results}
            gt = dict(gt)
            gt["images"] = [im for im in gt["images"] if im["id"] in eval_ids]
            gt["annotations"] = [a for a in gt["annotations"] if a["image_id"] in eval_ids]
        evaluator = COCOEvaluator(gt)
        stats = evaluator.evaluate(pred_results, verbose=True)
        if self.verbose:
            names = {c["id"]: c.get("name", str(c["id"])) for c in gt["categories"]}
            LOGGER.info(f"{'class':<22}{'AP@0.5:0.95':>12}{'AP@0.5':>10}")
            for name, ap, ap50 in evaluator.per_class_ap(names):
                LOGGER.info(f"{name:<22}{ap:>12.4f}{ap50:>10.4f}")
        return (stats["AP50"], stats["AP"])

    def eval_speed(self, task: str = "speed"):
        """Print per-image latency (reference: evaler.py:323-329)."""
        if task != "train":
            n = max(1, self.speed_result[0])
            wall_time = 1000 * self.speed_result[2] / n
            LOGGER.info(
                "Average pipelined eval wall time (transfer+fwd+decode+NMS+"
                f"host postproc, overlapped): {wall_time:.2f} ms/img — "
                "use --task speed (measure_speed) for pure device latency"
            )

    def measure_speed(self, batch_size: int = 32, iters: int = 20):
        """Phase-split device timing on synthetic input (the reference's
        3-phase pre/infer/NMS split, evaler.py:118-135, adapted to the
        single-dispatch design): forward+decode vs full pipeline with NMS.

        Iterations run on-device inside one jit so tunnel latency does not
        pollute the numbers (see bench.py)."""
        import jax as _jax
        from functools import partial as _partial

        model = self.model
        dtype = jnp.bfloat16 if self.half else jnp.float32

        def fwd(variables, x):
            head_out, _ = model.apply(variables, x.astype(dtype) / dtype(255.0), train=False)
            return decode_eval(head_out, model.num_classes, model.strides, model.use_dfl, model.reg_max)

        def fwd_nms(variables, x):
            return non_max_suppression(
                fwd(variables, x), self.conf_thres, self.iou_thres, max_det=self.max_det,
                max_nms=self.max_nms, multi_label=True,
                bf16_select=self.bf16_select,
                row_select=self.row_select,
            )

        def timed(fn):
            # variables ride as a jit ARGUMENT: closing them over would embed
            # every weight as an HLO constant, which compiles pathologically
            # for M6/L6 through the axon tunnel (same fix as bench.py)
            @_partial(_jax.jit, static_argnames="n")
            def loop(variables, x, n):
                def body(i, acc):
                    out = fn(variables, x + i.astype(jnp.float32) * 1e-9)
                    return acc + _jax.tree_util.tree_reduce(
                        lambda a, o: a + jnp.sum(o).astype(jnp.float32) * 1e-9, out, jnp.float32(0)
                    )
                return _jax.lax.fori_loop(0, n, body, jnp.float32(0))

            x = _jax.random.uniform(
                _jax.random.PRNGKey(0),
                (batch_size, self.img_size, self.img_size, 3), jnp.float32, 0, 255,
            )
            _jax.device_get(loop(self.variables, x, iters))
            t0 = time.time()
            _jax.device_get(loop(self.variables, x, iters))
            return (time.time() - t0) / iters / batch_size * 1000  # ms/img

        t_fwd = timed(fwd)
        t_all = timed(fwd_nms)
        LOGGER.info(
            f"speed @b{batch_size}: fwd+decode {t_fwd:.3f} ms/img "
            f"({1000 / t_fwd:.0f} imgs/s), NMS {t_all - t_fwd:.3f} ms/img, "
            f"total {t_all:.3f} ms/img ({1000 / t_all:.0f} imgs/s)"
        )
        if self.save_dir:
            # CSV table like the reference's published speed recipes
            # (reference: docs/Test_speed.md tables)
            path = osp.join(self.save_dir, "speed.csv")
            write_header = not osp.exists(path)
            with open(path, "a") as f:
                if write_header:
                    f.write("batch_size,img_size,fwd_decode_ms_per_img,"
                            "nms_ms_per_img,total_ms_per_img,imgs_per_sec\n")
                f.write(f"{batch_size},{self.img_size},{t_fwd:.4f},"
                        f"{t_all - t_fwd:.4f},{t_all:.4f},{1000 / t_all:.1f}\n")
            LOGGER.info(f"Appended speed row to {path}")
        return t_fwd, t_all

    @staticmethod
    def check_task(task):
        if task not in ["train", "val", "test", "speed"]:
            raise Exception("task argument error: only support 'train' / 'val' / 'test' / 'speed'")

    @staticmethod
    def check_thres(conf_thres, iou_thres, task):
        """(reference: evaler.py:396-406)"""
        if task != "train":
            if task in ("val", "test") and conf_thres > 0.03:
                LOGGER.warning(
                    f"The best conf_thresh when evaluate the model is less than 0.03, while you set it to: {conf_thres}"
                )
            if task == "speed" and conf_thres < 0.4:
                LOGGER.warning(
                    f"The best conf_thresh when test the speed of the model is larger than 0.4, while you set it to: {conf_thres}"
                )

    @staticmethod
    def reload_dataset(data, task="val"):
        import yaml

        with open(data, errors="ignore") as f:
            data = yaml.safe_load(f)
        task = "test" if task == "test" else "val"
        path = data.get(task, "val")
        if not isinstance(path, list):
            path = [path]
        for p in path:
            if not osp.exists(p):
                raise Exception(f"Dataset path {p} not found.")
        return data


def _stem(path: str) -> str:
    return osp.splitext(osp.basename(path))[0]


def encode_pred_rows(pred_results, img_paths) -> np.ndarray:
    """COCO prediction dicts -> [n, 7] float64 rows for host gathering.

    image ids are encoded as the image's index in the dataset scan
    (``img_paths``), which is deterministic and identical on every host —
    string stems survive the numeric round-trip that way."""
    idx_of = {_stem(p): i for i, p in enumerate(img_paths)}
    rows = np.zeros((len(pred_results), 7), np.float64)
    for r, p in zip(rows, pred_results):
        r[0] = idx_of[str(p["image_id"])]
        r[1] = p["category_id"]
        r[2:6] = p["bbox"]
        r[6] = p["score"]
    return rows


def decode_pred_rows(rows: np.ndarray, img_paths) -> list:
    out = []
    for r in rows:
        stem = _stem(img_paths[int(r[0])])
        out.append({
            "image_id": int(stem) if stem.isnumeric() else stem,
            "category_id": int(r[1]),
            "bbox": [float(v) for v in r[2:6]],
            "score": float(r[6]),
        })
    return out


def gather_coco_predictions(pred_results, img_paths):
    """Multi-host: allgather every host's COCO prediction rows so process 0
    can run the (host-side) COCO evaluation over the full val set. Each
    host predicts its own loader shard SPMD over its local chips; this is
    the host-side reduce that replaces the reference's rank-0-only eval
    (reference: engine.py:184-190 runs eval only on rank 0 — here all
    hosts share the predict work). No-op in single-process runs."""
    if jax.process_count() == 1:
        return pred_results
    from jax.experimental import multihost_utils

    rows = encode_pred_rows(pred_results, img_paths)
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([len(rows)], np.int64))
    ).reshape(-1)
    cap = int(counts.max())
    padded = np.full((cap, 7), -1.0, np.float64)
    padded[: len(rows)] = rows
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(-1, cap, 7)
    out_rows = np.concatenate(
        [g[: int(n)] for g, n in zip(gathered, counts)], axis=0
    )
    return decode_pred_rows(out_rows, img_paths)
