"""Trainer: the full training state machine (reference: yolov6/core/engine.py).

Orchestration (epoch loop, eval cadence, checkpointing, strong-aug shutoff,
resume) stays on the host; everything per-batch runs inside the jitted train
step (core/train_step.py). Data parallelism is a 1-D mesh (parallel/mesh.py);
rank-0 concepts map to jax.process_index()==0.
"""

from __future__ import annotations

import os
import os.path as osp
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from yolov6_tpu.core.train_step import TrainState, create_train_state, make_train_step
from yolov6_tpu.data.data_load import create_dataloader, prefetch_to_device
from yolov6_tpu.losses.loss import ComputeLoss
from yolov6_tpu.models.yolo import build_model
from yolov6_tpu.parallel import mesh as pmesh
from yolov6_tpu.solver.build import build_param_groups, scale_hyperparams_for_batch
from yolov6_tpu.utils.checkpoint import (
    load_checkpoint_variables,
    load_native_checkpoint,
    save_checkpoint,
    strip_optimizer,
)
from yolov6_tpu.utils.config import Config
from yolov6_tpu.utils.events import LOGGER, load_yaml, write_tblog
from yolov6_tpu.utils.torch_import import import_checkpoint


class Trainer:
    def __init__(self, args, cfg, mesh=None):
        self.args = args
        self.cfg = cfg
        self.max_epoch = args.epochs
        self.save_dir = args.save_dir
        self.main_process = jax.process_index() == 0

        self.data_dict = load_yaml(args.data_path)
        self.num_classes = self.data_dict["nc"]
        if self.data_dict.get("is_coco"):
            from yolov6_tpu.utils.coco_eval import coco80_to_coco91_class

            self.ids_to_contig = {c: i for i, c in enumerate(coco80_to_coco91_class())}
        else:
            self.ids_to_contig = {i: i for i in range(self.num_classes)}
        self.img_size = args.img_size
        self.batch_size = args.batch_size

        if mesh is None:
            # batch must divide evenly across the data axis
            import math as _math

            n_dev = _math.gcd(args.batch_size, jax.device_count())
            mesh = pmesh.create_mesh(n_dev)
        self.mesh = mesh
        self.distill_ns = bool(
            args.distill and cfg.model.type in ("YOLOv6n", "YOLOv6s")
        )

        # ---- model (bf16 compute is the TPU analog of the reference's AMP,
        # engine.py:150; params/BN/loss stay fp32)
        compute_dtype = jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
        self.model = build_model(
            cfg, self.num_classes, fuse_ab=args.fuse_ab, distill_ns=self.distill_ns,
            deploy=False, dtype=compute_dtype,
        )
        rng = jax.random.PRNGKey(args.seed if hasattr(args, "seed") else 0)
        variables = self.model.init(
            rng, jnp.zeros((1, self.img_size, self.img_size, 3)), train=False
        )
        variables = {k: dict(v) for k, v in variables.items()}

        pretrained = cfg.model.get("pretrained")
        if pretrained:
            if not os.path.exists(pretrained):
                # reference engine.py:418-422: missing finetune weights
                # trigger a release-download attempt before loading
                from yolov6_tpu.utils.general import download_ckpt

                download_ckpt(pretrained)
            LOGGER.info(f"Loading state_dict from {pretrained} for fine-tuning...")
            loaded = load_checkpoint_variables(
                pretrained, self.model, img_size=(self.img_size, self.img_size),
                deploy=False, training_mode=cfg.get("training_mode", "repvgg"),
            )
            from yolov6_tpu.utils.checkpoint import load_state_dict_partial

            merged = load_state_dict_partial(loaded, variables)
            import flax

            flat_m = flax.traverse_util.flatten_dict(merged)
            flat_v = flax.traverse_util.flatten_dict(variables)
            for k, v in flat_m.items():
                if v is not None:
                    flat_v[k] = v
            variables = flax.traverse_util.unflatten_dict(flat_v)

        # ---- teacher for distillation
        self.teacher = None
        if args.distill:
            if args.fuse_ab:
                raise ValueError("Distill models should turn off fuse_ab")
            t_fuse_ab = cfg.model.head.num_layers == 3
            teacher_model = build_model(cfg, self.num_classes, fuse_ab=t_fuse_ab, deploy=False)
            if not os.path.exists(args.teacher_model_path):
                # reference get_teacher_model path does the same fetch
                from yolov6_tpu.utils.general import download_ckpt

                download_ckpt(args.teacher_model_path)
            t_vars = load_checkpoint_variables(
                args.teacher_model_path, teacher_model,
                img_size=(self.img_size, self.img_size), deploy=False,
                training_mode=cfg.get("training_mode", "repvgg"),
            )
            self.teacher = (teacher_model, t_vars)

        # ---- loaders
        self.train_loader, self.val_loader = self.get_data_loader(args, cfg, self.data_dict)
        self.max_stepnum = len(self.train_loader)

        # ---- solver
        self.solver_cfg = scale_hyperparams_for_batch(
            dict(cfg.solver), self.batch_size,
            world_batch=getattr(args, "bs_per_device", None)
            and args.bs_per_device * jax.device_count(),
        )
        self.solver_cfg.setdefault("lr_scheduler", cfg.solver.get("lr_scheduler", "Cosine"))
        self.warmup_stepnum = (
            max(round(self.solver_cfg["warmup_epochs"] * self.max_stepnum), 1000)
            if not args.quant else 0
        )

        # ---- QAT (reference: engine.quant_setup:578-594): load a calibrated
        # PTQ checkpoint and train with fake-quant active (straight-through
        # gradients; amax ranges frozen in the 'quant' collection)
        self.quant_collection = None
        if args.quant and not args.calib:
            from yolov6_tpu.quant import set_quant_mode

            qat_cfg = cfg.get("qat") or {}
            calib_pt = qat_cfg.get("calib_pt")
            if not calib_pt:
                raise ValueError("QAT needs a calibrated checkpoint (cfg.qat.calib_pt)")
            calib = load_native_checkpoint(calib_pt)
            calib_vars = calib.get("model", calib)
            variables["params"] = jax.tree_util.tree_map(jnp.asarray, calib_vars["params"])
            if "batch_stats" in calib_vars:
                variables["batch_stats"] = jax.tree_util.tree_map(
                    jnp.asarray, calib_vars["batch_stats"]
                )
            self.quant_collection = jax.tree_util.tree_map(
                jnp.asarray, calib_vars["quant"]
            )
            set_quant_mode(
                True, calibrating=False,
                num_bits=(cfg.get("ptq") or {}).get("num_bits", 8),
                skip_patterns=qat_cfg.get("sensitive_layers_list", [])
                if qat_cfg.get("sensitive_layers_skip") else [],
            )

        # ---- RepOpt: reinit plain convs from CSLA scales + gradient masks
        grad_masks = None
        if cfg.get("training_mode") == "repopt":
            from yolov6_tpu.solver.repoptimizer import (
                extract_scales,
                generate_gradient_masks,
                reinitialize,
            )

            scales_path = cfg.model.get("scales")
            if not scales_path:
                raise ValueError("No scales provided to init RepOptimizer!")
            if scales_path.endswith(".pt"):
                hs_model = build_model(cfg, self.num_classes, deploy=False)
                # the scales ckpt is a hyper-search model; rebuild with its mode
                hs_cfg = cfg.copy()
                hs_cfg["training_mode"] = "hyper_search"
                hs_model = build_model(hs_cfg, self.num_classes, deploy=False)
                hs_vars = load_checkpoint_variables(
                    scales_path, hs_model, img_size=(self.img_size, self.img_size),
                    deploy=False, training_mode="hyper_search",
                )
            else:
                hs_vars = load_native_checkpoint(scales_path)
                hs_vars = hs_vars.get("ema") or hs_vars.get("model") or hs_vars
            scales = extract_scales(hs_vars["params"])
            if not pretrained:
                variables["params"] = reinitialize(
                    variables["params"], scales, jax.random.PRNGKey(0)
                )
            grad_masks = generate_gradient_masks(variables["params"], scales)

        self.losses = self._build_losses(cfg)
        group_ids = build_param_groups(variables["params"])
        self.train_step = make_train_step(
            self.model,
            self.losses["main"],
            group_ids,
            self.solver_cfg,
            max_stepnum=self.max_stepnum,
            epochs=self.max_epoch,
            batch_size=self.batch_size,
            warmup_stepnum=self.warmup_stepnum,
            img_size=(self.img_size, self.img_size),
            compute_loss_ab=self.losses.get("ab"),
            teacher=self._make_teacher_triple(),
            grad_masks=grad_masks,
            quant_collection=self.quant_collection,
        )

        self.state = create_train_state(variables)
        self.start_epoch = 0
        self.best_ap = 0.0
        self.best_stop_strong_aug_ap = 0.0
        self.evaluate_results = (0.0, 0.0)

        # ---- checkpoint backend (msgpack: single-host sync;
        #      orbax: async + sharded for multi-host — utils/orbax_ckpt.py)
        self.ckpt_backend = getattr(args, "ckpt_backend", "msgpack")
        self.orbax = None
        # NOTE: created on EVERY process — orbax save/restore are collective
        # (each host writes/reads the shards it owns); only the msgpack
        # backend is main-process-only.
        if self.ckpt_backend == "orbax":
            from yolov6_tpu.utils.orbax_ckpt import OrbaxCheckpointer

            self.orbax = OrbaxCheckpointer(
                osp.join(self.save_dir, "weights", "orbax"),
                max_to_keep=max(3, getattr(args, "save_ckpt_on_last_n_epoch", 0) or 0),
                async_save=True,
            )

        # ---- resume (reference: engine.py:78-89)
        if args.resume:
            from yolov6_tpu.core.train_step import state_from_dict
            from yolov6_tpu.utils.orbax_ckpt import is_orbax_checkpoint

            if is_orbax_checkpoint(args.resume):
                from yolov6_tpu.utils.orbax_ckpt import OrbaxCheckpointer

                ck = OrbaxCheckpointer(args.resume, async_save=False)
                step = ck.latest_step()
                restored = ck.restore(step)
                ckpt = {
                    "train_state": restored["train_state"],
                    "epoch": step,
                    "results": tuple(np.asarray(restored.get("results", (0.0, 0.0)))),
                }
                ck.close()
            else:
                ckpt = load_native_checkpoint(args.resume)
            self.state = jax.tree_util.tree_map(jnp.asarray, state_from_dict(ckpt["train_state"]))
            self.start_epoch = int(ckpt["epoch"]) + 1
            self.evaluate_results = tuple(ckpt.get("results", (0.0, 0.0)))
            self.best_ap = self.evaluate_results[1]
            self.best_stop_strong_aug_ap = self.evaluate_results[1]
            if self.start_epoch > (self.max_epoch - args.stop_aug_last_n_epoch):
                self.cfg.data_aug.mosaic = 0.0
                self.cfg.data_aug.mixup = 0.0

        self.state = pmesh.replicate_state(self.mesh, self.state)

        self.tblogger = None
        if self.main_process and not getattr(args, "no_tensorboard", False):
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tblogger = SummaryWriter(self.save_dir)
            except Exception:
                pass

    # ------------------------------------------------------------- builders

    def _build_losses(self, cfg):
        head = cfg.model.head
        losses = {
            "main": ComputeLoss(
                fpn_strides=tuple(head.strides),
                num_classes=self.num_classes,
                ori_img_size=self.img_size,
                warmup_epoch=head.get("atss_warmup_epoch", 4),
                use_dfl=head.use_dfl,
                reg_max=head.reg_max,
                iou_type=head.iou_type,
            )
        }
        if self.args.fuse_ab:
            from yolov6_tpu.losses.loss_fuseab import ComputeLossAB

            losses["ab"] = ComputeLossAB(
                fpn_strides=tuple(head.strides),
                num_classes=self.num_classes,
                ori_img_size=self.img_size,
                iou_type=head.iou_type,
                anchors_init=tuple(map(tuple, head.anchors_init)),
            )
        if self.args.distill:
            if self.distill_ns:
                from yolov6_tpu.losses.loss_distill_ns import ComputeLossDistillNS as LossD
            else:
                from yolov6_tpu.losses.loss_distill import ComputeLossDistill as LossD

            losses["distill"] = LossD(
                fpn_strides=tuple(head.strides),
                num_classes=self.num_classes,
                ori_img_size=self.img_size,
                warmup_epoch=head.get("atss_warmup_epoch", 4),
                use_dfl=head.use_dfl,
                reg_max=head.reg_max,
                iou_type=head.iou_type,
                distill_weight=dict(head.distill_weight),
                distill_feat=self.args.distill_feat,
                max_epoch=self.max_epoch,
                temperature=self.args.temperature,
            )
        return losses

    def _make_teacher_triple(self):
        if self.teacher is None:
            return None
        teacher_model, t_vars = self.teacher
        return (teacher_model, t_vars, self.losses["distill"])

    def get_data_loader(self, args, cfg, data_dict):
        """(reference: engine.py:378-404)"""
        train_path, val_path = data_dict["train"], data_dict["val"]
        shard_id, num_shards = pmesh.process_shard_info()
        train_loader, _ = create_dataloader(
            train_path, args.img_size, self.batch_size // num_shards,
            hyp=dict(cfg.data_aug), augment=True, data_dict=data_dict, task="train",
            num_workers=args.workers, shuffle=True,
            check_images=args.check_images, check_labels=args.check_labels,
            specific_shape=args.specific_shape, height=args.height, width=args.width,
            cache_ram=args.cache_ram, cache_type=getattr(args, "cache", None),
            max_labels=args.max_labels,
            shard_id=shard_id, num_shards=num_shards,
        )
        # every host gets a val shard: in-training eval is collective — each
        # host predicts its shard SPMD over its local chips, the COCO rows
        # are host-gathered and process 0 scores them (the reference evals
        # on rank 0 only, engine.py:184-190 — here the predict work shards)
        val_loader, _ = create_dataloader(
            val_path, args.img_size, self.batch_size // num_shards, hyp={},
            data_dict=data_dict, task="val", num_workers=args.workers,
            shard_id=shard_id, num_shards=num_shards, pad_shards=False,
        )
        return train_loader, val_loader

    # ---------------------------------------------------------------- train

    def train(self):
        try:
            self.before_train_loop()
            # last completed epoch; stays valid when a resume of an already-
            # finished run makes the loop body run zero times
            self.epoch = self.start_epoch - 1
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.train_one_epoch(self.epoch)
                self.after_epoch()
            self.strip_model()
        except Exception:
            LOGGER.error("ERROR in training loop or eval/save model.")
            raise

    def before_train_loop(self):
        LOGGER.info("Training start...")
        self.start_time = time.time()

    def before_epoch(self):
        """Strong-aug shutoff tail (reference: engine.py:324-330)."""
        if self.epoch == self.max_epoch - self.args.stop_aug_last_n_epoch:
            self.cfg.data_aug.mosaic = 0.0
            self.cfg.data_aug.mixup = 0.0
            self.train_loader, self.val_loader = self.get_data_loader(
                self.args, self.cfg, self.data_dict
            )
        self.train_loader.set_epoch(self.epoch)
        self.mean_loss = None
        self._mean_loss_dev = None

    def plot_train_batch(self, imgs, labels, paths, max_size=1920, max_subplots=16):
        """Annotated train-batch mosaic for TensorBoard (reference: engine.py:483-536)."""
        import math as _math

        import cv2

        bs, h, w, _ = imgs.shape
        bs = min(bs, max_subplots)
        ns = int(np.ceil(bs**0.5))
        mosaic = np.full((ns * h, ns * w, 3), 255, np.uint8)
        for i in range(bs):
            x0, y0 = w * (i // ns), h * (i % ns)
            mosaic[y0:y0 + h, x0:x0 + w] = imgs[i][..., ::-1]  # RGB->BGR for cv2 draw
            cv2.rectangle(mosaic, (x0, y0), (x0 + w, y0 + h), (255, 255, 255), 2)
            cv2.putText(mosaic, os.path.basename(paths[i])[:40], (x0 + 5, y0 + 15),
                        cv2.FONT_HERSHEY_COMPLEX, 0.5, (220, 220, 220), 1)
            lb = labels[i]
            lb = lb[lb[:, 0] >= 0]
            for cls, cx, cy, bw, bh in lb:
                x1 = int((cx - bw / 2) * w) + x0
                y1 = int((cy - bh / 2) * h) + y0
                x2 = int((cx + bw / 2) * w) + x0
                y2 = int((cy + bh / 2) * h) + y0
                color = tuple(int(c) for c in np.random.default_rng(int(cls)).integers(64, 255, 3))
                cv2.rectangle(mosaic, (x1, y1), (x2, y2), color, 1)
                name = self.data_dict["names"][int(cls)]
                cv2.putText(mosaic, str(name), (x1, max(y1 - 5, 10)),
                            cv2.FONT_HERSHEY_COMPLEX, 0.5, color, 1)
        scale = max_size / ns / max(h, w)
        if scale < 1:
            mosaic = cv2.resize(
                mosaic, (int(ns * w * scale), int(ns * h * scale))
            )
        return mosaic[..., ::-1]  # back to RGB for TB

    def train_one_epoch(self, epoch_num):
        use_atss = epoch_num < self.losses["main"].warmup_epoch
        epoch_arr = jnp.asarray(epoch_num, jnp.float32)
        # transfers are issued up to 2 batches ahead of the consumer so the
        # host->device copy of batch i+1 rides under the step of batch i
        # (the torch analog: pin_memory + non_blocking H2D, reference
        # data_load.py:66-73 worker pool + engine.py prepro_data)
        batches = prefetch_to_device(
            self.train_loader, n_prefetch=2, sharding=pmesh.batch_sharding(self.mesh)
        )
        for step, (imgs, labels, paths, shapes, n_valid) in enumerate(batches):
            if (
                step == 0 and self.main_process and self.tblogger
                and getattr(self.args, "write_trainbatch_tb", False)
            ):
                from yolov6_tpu.utils.events import write_tbimg

                mosaic = self.plot_train_batch(np.asarray(imgs), np.asarray(labels), paths)
                write_tbimg(self.tblogger, mosaic,
                            step + self.max_stepnum * epoch_num, type="train")
            self.state, loss, components = self.train_step(
                self.state, imgs, labels, epoch_arr, use_atss=use_atss
            )
            # Running mean stays ON DEVICE (tiny async jnp ops): a per-step
            # np.asarray would block the host on every dispatch and stop it
            # from running ahead to hide data loading (reference hot loop:
            # engine.py:142-176 only syncs for the pbar print).
            self._mean_loss_dev = (
                components if self._mean_loss_dev is None
                else (self._mean_loss_dev * step + components) / (step + 1)
            )
            if step % getattr(self.args, "log_interval", 50) == 0:
                self.mean_loss = np.asarray(self._mean_loss_dev)
                LOGGER.info(
                    f"epoch {epoch_num}/{self.max_epoch - 1} step {step}/{self.max_stepnum} "
                    f"iou/dfl/cls: " + "/".join(f"{v:.4g}" for v in self.mean_loss[:3])
                )
        if self._mean_loss_dev is not None:
            self.mean_loss = np.asarray(self._mean_loss_dev)

    def after_epoch(self):
        """eval cadence + checkpointing (reference: engine.py:178-220).

        The eval-cadence decision and eval_model() run on EVERY process —
        in-training eval is collective (each host predicts its val shard,
        the COCO gather inside eval_model needs all participants);
        checkpoint writing and TB stay main-process (orbax saves are
        themselves collective)."""
        remaining_epochs = self.max_epoch - 1 - self.epoch
        eval_interval = (
            self.args.eval_interval
            if remaining_epochs >= self.args.heavy_eval_range
            else min(3, self.args.eval_interval)
        )
        is_val_epoch = (remaining_epochs == 0) or (
            not self.args.eval_final_only and (self.epoch + 1) % eval_interval == 0
        )
        self.ap = self.evaluate_results[1]
        did_eval = is_val_epoch and self.val_loader is not None
        if did_eval:
            self.eval_model()
            self.ap = self.evaluate_results[1]
            self.best_ap = max(self.ap, self.best_ap)

        if not self.main_process:
            if self.orbax is not None:
                self._orbax_save(did_eval=did_eval)  # collective; flag broadcast from 0
            return

        from yolov6_tpu.core.train_step import state_to_dict

        save_ckpt_dir = osp.join(self.save_dir, "weights")
        if self.orbax is not None:
            self._orbax_save(did_eval=did_eval)
        else:
            state_host = jax.device_get(self.state)
            ckpt = {
                "train_state": state_to_dict(state_host),
                "model": {"params": state_host.params, "batch_stats": state_host.batch_stats},
                "ema": {"params": state_host.ema_params, "batch_stats": state_host.ema_batch_stats},
                "epoch": self.epoch,
                "results": [float(v) for v in self.evaluate_results],
            }
            if self.quant_collection is not None:
                # persist the frozen calibrated ranges so the QAT checkpoint
                # deploys standalone (reference: qat ckpts embed the
                # pytorch-quantization observer state)
                q_host = jax.device_get(self.quant_collection)
                ckpt["model"]["quant"] = q_host
                ckpt["ema"]["quant"] = q_host
            save_checkpoint(
                ckpt, is_val_epoch and (self.ap == self.best_ap), save_ckpt_dir, "last_ckpt"
            )
            if self.epoch >= self.max_epoch - self.args.save_ckpt_on_last_n_epoch:
                save_checkpoint(ckpt, False, save_ckpt_dir, f"{self.epoch}_ckpt")
            if self.epoch >= self.max_epoch - self.args.stop_aug_last_n_epoch:
                if self.best_stop_strong_aug_ap < self.ap:
                    self.best_stop_strong_aug_ap = max(self.ap, self.best_stop_strong_aug_ap)
                    save_checkpoint(ckpt, False, save_ckpt_dir, "best_stop_aug_ckpt")

        if self.tblogger and self.mean_loss is not None:
            # true in-graph warmup/cosine group LRs at this epoch's last step
            # (reference logs the 3 torch group LRs, utils/events.py:33-44)
            from yolov6_tpu.solver.build import group_lrs_host

            lrs = group_lrs_host(
                (self.epoch + 1) * self.max_stepnum, float(self.epoch),
                self.warmup_stepnum, self.solver_cfg, self.max_epoch,
            )
            write_tblog(
                self.tblogger, self.epoch, self.evaluate_results,
                list(lrs), list(self.mean_loss[:3]),
            )

    def _orbax_save(self, did_eval: bool):
        """Collective async checkpoint — called on every host (each writes
        its own shards). evaluate_results + the did-eval flag are broadcast
        from process 0 so saved values, best-metric tracking, and retention
        pins are host-consistent. Metrics are attached ONLY on eval epochs —
        otherwise best_step() could pick a never-evaluated epoch carrying a
        stale AP. Retention mirrors the msgpack cadence: last-N epochs and
        the best epoch inside the stop-aug tail are pinned against pruning
        (reference: engine.py:202-211)."""
        from yolov6_tpu.core.train_step import state_to_dict

        results = np.asarray([*self.evaluate_results, float(did_eval)], np.float32)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            results = np.asarray(multihost_utils.broadcast_one_to_all(results))
        did_eval = bool(results[2])
        ap = float(results[1])
        self.orbax.save(
            self.epoch,
            {
                "train_state": state_to_dict(self.state),
                "results": jnp.asarray(results[:2]),
            },
            metrics={"ap": ap} if did_eval else None,
        )
        if self.epoch >= self.max_epoch - self.args.save_ckpt_on_last_n_epoch:
            self.orbax.pin(self.epoch)
        if (
            self.epoch >= self.max_epoch - self.args.stop_aug_last_n_epoch
            and did_eval and ap > self.best_stop_strong_aug_ap
        ):
            self.best_stop_strong_aug_ap = ap
            self.orbax.pin(self.epoch, tag="best_stop_aug")

    def eval_model(self):
        """In-training eval on the EMA weights (reference: engine.py:222-269);
        per-config eval_params override the defaults (reference :236-264)."""
        from yolov6_tpu.core.evaler import Evaler

        ema_variables = {"params": self.state.ema_params}
        if self.state.ema_batch_stats:
            ema_variables["batch_stats"] = self.state.ema_batch_stats
        if self.quant_collection is not None:
            # QAT: QConv reads its calibrated amax from the 'quant'
            # collection — eval with quant mode active needs it in variables
            ema_variables["quant"] = self.quant_collection

        ep = self.cfg.get("eval_params") or {}

        def val(key, default):
            v = ep.get(key)
            if isinstance(v, list):
                v = v[0]
            return default if v is None else v

        n_proc = jax.process_count()
        evaler = Evaler(
            self.data_dict,
            # per-host batch: every host predicts its own val shard SPMD
            # over its LOCAL chips (Evaler builds a local mesh)
            batch_size=val("batch_size", self.batch_size) // n_proc,
            img_size=val("img_size", self.img_size),
            conf_thres=val("conf_thres", 0.03),
            iou_thres=val("iou_thres", 0.65),
            save_dir=self.save_dir,
            shrink_size=val("shrink_size", 0) or 0,
            verbose=val("verbose", False),
            do_coco_metric=val("do_coco_metric", True),
            do_pr_metric=val("do_pr_metric", False),
        )
        evaler.init_model(self.model, ema_variables)
        preds = evaler.predict_model(self.model, self.val_loader, task="train")
        if n_proc > 1:
            # collective: gather every host's COCO rows, score on process 0,
            # broadcast the APs so best-ckpt tracking stays host-consistent
            from jax.experimental import multihost_utils

            from yolov6_tpu.core.evaler import gather_coco_predictions

            preds = gather_coco_predictions(
                preds, self.val_loader.dataset.img_paths
            )
            if self.main_process:
                results = evaler.eval_model(
                    preds, self.model, self.val_loader, task="train"
                )
            else:
                results = (0.0, 0.0)
            results = tuple(
                float(v) for v in np.asarray(
                    multihost_utils.broadcast_one_to_all(
                        np.asarray(results, np.float32)
                    )
                )
            )
        else:
            results = evaler.eval_model(preds, self.model, self.val_loader, task="train")
        LOGGER.info(
            f"Epoch: {self.epoch} | mAP@0.5: {results[0]} | mAP@0.50:0.95: {results[1]}"
        )
        self.evaluate_results = results[:2]
        if self.tblogger and self.main_process:
            self._plot_val_pred(preds)

    def _plot_val_pred(self, pred_results, vis_conf=0.3, vis_max_box_num=5, max_imgs=8):
        """Annotated val predictions to TensorBoard (reference: engine.py:538-556)."""
        import cv2

        from yolov6_tpu.core.inferer import Inferer
        from yolov6_tpu.utils.events import write_tbimg

        by_image = {}
        for d in pred_results:
            by_image.setdefault(d["image_id"], []).append(d)
        stem_to_path = {
            (int(osp.splitext(osp.basename(p))[0])
             if osp.splitext(osp.basename(p))[0].isnumeric()
             else osp.splitext(osp.basename(p))[0]): p
            for p in self.val_loader.dataset.img_paths
        }
        vis = []
        for image_id, dets in list(by_image.items())[:max_imgs]:
            path = stem_to_path.get(image_id)
            if path is None:
                continue
            img = cv2.imread(path)
            dets = sorted(dets, key=lambda d: -d["score"])[:vis_max_box_num]
            for d in dets:
                if d["score"] < vis_conf:
                    continue
                x, y, w, h = d["bbox"]
                cls_id = (
                    self.ids_to_contig.get(d["category_id"], 0)
                    if hasattr(self, "ids_to_contig") else int(d["category_id"]) % len(self.data_dict["names"])
                )
                color = Inferer.generate_colors(cls_id, True)
                cv2.rectangle(img, (int(x), int(y)), (int(x + w), int(y + h)), color, 1)
                cv2.putText(
                    img, f"{self.data_dict['names'][cls_id]}: {d['score']:.2f}",
                    (int(x), max(int(y) - 8, 10)), cv2.FONT_HERSHEY_COMPLEX, 0.5, color, 1,
                )
            vis.append(img[:, :, ::-1])
        if vis:
            write_tbimg(self.tblogger, vis, self.epoch, type="val")

    def calibrate(self):
        """In-train PTQ calibration (reference: engine.calibrate:559-577):
        run calibration batches, save a quantized checkpoint, evaluate."""
        assert self.args.quant and self.args.calib
        if not self.main_process:
            return
        from yolov6_tpu.quant.ptq import calibrate as ptq_calibrate
        from yolov6_tpu.quant.ptq import quantize_variables

        variables = {"params": self.state.params}
        if self.state.batch_stats:
            variables["batch_stats"] = self.state.batch_stats
        batches = (imgs for imgs, *_ in self.train_loader)
        ptq_cfg = self.cfg.get("ptq") or {}
        qvars = ptq_calibrate(
            self.model, variables, batches,
            num_bits=ptq_cfg.get("num_bits", 8),
            skip_patterns=ptq_cfg.get("sensitive_layers_list", [])
            if ptq_cfg.get("sensitive_layers_skip") else [],
            max_batches=ptq_cfg.get("calib_batches", 32),
        )
        qvars = quantize_variables(qvars, ptq_cfg.get("num_bits", 8))
        out_dir = ptq_cfg.get("calib_output_path", osp.join(self.save_dir, "weights"))
        save_checkpoint({"model": qvars}, False, out_dir, "calib_ckpt")
        LOGGER.info(f"calibrated checkpoint saved under {out_dir}")

    def strip_model(self):
        if self.main_process:
            LOGGER.info(
                f"\nTraining completed in {(time.time() - self.start_time) / 3600:.3f} hours."
            )
        if self.orbax is not None:
            # drain async writes, then export best/latest EMA as stripped
            # msgpack so eval/export/infer flows are backend-agnostic.
            # wait/restore are collective — every host participates; only
            # the msgpack write is main-only.
            self.orbax.wait_until_finished()
            step = self.orbax.best_step()
            if step is None:
                step = self.orbax.latest_step()
            if step is not None:
                restored = self.orbax.restore(step)
                ts = restored["train_state"]
                if self.main_process:
                    save_checkpoint(
                        {
                            "model": {"params": ts["ema_params"],
                                      "batch_stats": ts["ema_batch_stats"]},
                            "epoch": step,
                        },
                        False, osp.join(self.save_dir, "weights"), "best_ckpt",
                    )
            self.orbax.close()
        elif self.main_process:
            strip_optimizer(osp.join(self.save_dir, "weights"), self.epoch)
