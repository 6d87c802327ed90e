"""Path/size helpers (reference: yolov6/utils/general.py)."""

from __future__ import annotations

import glob
import math
import os
from pathlib import Path

from yolov6_tpu.utils.events import LOGGER


def increment_name(path):
    """Return a non-existing variant of ``path`` by appending a counter
    (reference: utils/general.py:12-23)."""
    path = Path(path)
    sep = ""
    if path.exists():
        path, suffix = (path.with_suffix(""), path.suffix) if path.is_file() else (path, "")
        for n in range(1, 9999):
            p = f"{path}{sep}{n}{suffix}"
            if not os.path.exists(p):
                break
        path = Path(p)
    return path


def find_latest_checkpoint(search_dir="."):
    """Most recent ``last*`` checkpoint under ``search_dir``
    (reference: utils/general.py:26-29)."""
    ckpts = glob.glob(f"{search_dir}/**/last*_ckpt*", recursive=True) + glob.glob(
        f"{search_dir}/**/last*.npz", recursive=True
    )
    # orbax roots (weights/orbax/<step>/...) count as resumable checkpoints
    ckpts += [
        d for d in glob.glob(f"{search_dir}/**/weights/orbax", recursive=True)
        if os.path.isdir(d)
    ]
    return max(ckpts, key=os.path.getctime) if ckpts else ""


def download_ckpt(path, release="0.4.0", timeout=60):
    """Fetch a pretrained reference checkpoint from the upstream release if
    it's missing (reference: utils/general.py:89-101). Returns True on
    success; False (with a warning) when there's no egress — callers should
    treat a False as 'weights unavailable', not an error."""
    if os.path.exists(path):
        return True
    basename = os.path.basename(path)
    os.makedirs(os.path.abspath(os.path.dirname(path)) or ".", exist_ok=True)
    url = f"https://github.com/meituan/YOLOv6/releases/download/{release}/{basename}"
    LOGGER.info(f"checkpoint {basename} not found locally, trying {url}")
    try:
        import urllib.request

        tmp = path + ".part"
        with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(tmp, path)
        LOGGER.info(f"checkpoint {basename} downloaded to {path}")
        return True
    except Exception as e:  # no egress / 404 / timeout
        LOGGER.warning(f"could not download {basename}: {e}")
        try:
            os.remove(path + ".part")
        except OSError:
            pass
        return False


def make_divisible(x, divisor):
    return math.ceil(x / divisor) * divisor


def check_img_size(imgsz, s=32, floor=0):
    """Round image size up to a multiple of the max stride
    (reference: utils/general.py:109-117)."""
    if isinstance(imgsz, int):
        new_size = max(make_divisible(imgsz, int(s)), floor)
    else:
        new_size = [max(make_divisible(x, int(s)), floor) for x in imgsz]
    if new_size != imgsz:
        LOGGER.warning(f"--img-size {imgsz} must be multiple of max stride {s}, updating to {new_size}")
    return new_size
