"""Logging utilities (reference: yolov6/utils/events.py).

Provides a global LOGGER whose level is WARNING on non-primary hosts so that
multi-host runs only emit INFO logs once (reference gates on DDP rank;
we gate on ``jax.process_index()``).
"""

from __future__ import annotations

import logging
import os
import shutil


def _primary_process() -> bool:
    """True on the primary host — WITHOUT initializing a jax backend.

    Calling jax.process_index() here would initialize the platform at import
    time, before CLIs get a chance to force CPU (jax.config.update), and
    hangs every tool when the TPU tunnel is unreachable. Only consult jax if
    a backend already exists; otherwise assume primary — multi-host runs
    call refresh_log_level() after jax.distributed.initialize()
    (parallel/mesh.initialize_distributed)."""
    try:
        import jax
        from jax._src import xla_bridge

        if xla_bridge.backends_are_initialized():
            return jax.process_index() == 0
    except Exception:
        pass
    return True


def set_logging(name: str = "yolov6_tpu") -> logging.Logger:
    rank_ok = _primary_process() or os.environ.get("YOLOV6_TPU_LOG_ALL_HOSTS")
    level = logging.INFO if rank_ok else logging.WARNING
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("%(message)s"))
        logger.addHandler(handler)
    logger.setLevel(level)
    logger.propagate = False
    return logger


def refresh_log_level():
    """Re-evaluate the per-host log level once jax IS initialized (called
    from parallel.mesh.initialize_distributed): non-primary hosts drop to
    WARNING so multi-host runs emit INFO logs once."""
    set_logging()


LOGGER = set_logging()
NCOLS = min(100, shutil.get_terminal_size().columns)


def load_yaml(file_path: str) -> dict:
    """Load a dataset-description yaml file (nc, names, paths)."""
    import yaml

    with open(file_path, errors="ignore") as f:
        return yaml.safe_load(f)


def save_yaml(data_dict: dict, save_path: str) -> None:
    import yaml

    with open(save_path, "w") as f:
        yaml.safe_dump(data_dict, f, sort_keys=False)


def write_tblog(tblogger, epoch, results, lrs, losses) -> None:
    """Write scalar metrics to TensorBoard (reference: utils/events.py:33-44)."""
    tblogger.add_scalar("val/mAP@0.5", results[0], epoch + 1)
    tblogger.add_scalar("val/mAP@0.50:0.95", results[1], epoch + 1)
    tblogger.add_scalar("train/iou_loss", losses[0], epoch + 1)
    tblogger.add_scalar("train/dist_focalloss", losses[1], epoch + 1)
    tblogger.add_scalar("train/cls_loss", losses[2], epoch + 1)
    tblogger.add_scalar("x/lr0", lrs[0], epoch + 1)
    tblogger.add_scalar("x/lr1", lrs[1], epoch + 1)
    tblogger.add_scalar("x/lr2", lrs[2], epoch + 1)


def write_tbimg(tblogger, imgs, step, type="train") -> None:
    """Write images to TensorBoard (reference: utils/events.py:47-55)."""
    if type == "train":
        tblogger.add_image(f"train_batch", imgs, step + 1, dataformats="HWC")
    elif type == "val":
        for idx, img in enumerate(imgs):
            tblogger.add_image(f"val_img_{idx + 1}", img, step + 1, dataformats="HWC")
