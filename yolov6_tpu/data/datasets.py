"""Dataset layer: YOLO-txt format scan/validation, train-time mosaic/mixup,
eval-time letterbox, COCO-GT generation, and streaming inference sources
(reference: yolov6/data/datasets.py).

Host-side only — produces numpy arrays; device batching/sharding happens in
data_load.py.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import os.path as osp
import random
import threading
from multiprocessing.pool import ThreadPool
from pathlib import Path
from typing import List, Optional, Tuple

import cv2
import numpy as np

from yolov6_tpu.data.data_augment import (
    augment_hsv,
    letterbox,
    mixup,
    mosaic_augmentation,
    random_affine,
)
from yolov6_tpu.utils.events import LOGGER

IMG_FORMATS = ["bmp", "jpg", "jpeg", "png", "tif", "tiff", "dng", "webp", "mpo"]
VID_FORMATS = ["mp4", "mov", "avi", "mkv"]

# EXIF orientation tag id (reference: datasets.py:30-34)
ORIENTATION = 0x0112


def check_image(im_file: str, full_check: bool = False):
    """Read an image's (w, h) from headers; with full_check, verify integrity,
    apply EXIF-orientation to the recorded shape, and restore corrupt JPEGs
    in place (reference: datasets.py:524-556).

    Returns (shape_wh or None, msg). shape is the size cv2.imread will
    produce: cv2 applies EXIF rotation on load, so rotations 6/8 swap w/h.
    """
    msg = ""
    try:
        from PIL import Image

        im = Image.open(im_file)
        if full_check:
            im.verify()  # PIL verify
            im = Image.open(im_file)  # reload after verify
        shape = (im.width, im.height)  # (w, h)
        try:
            im_exif = im._getexif()
            if im_exif and ORIENTATION in im_exif and im_exif[ORIENTATION] in (6, 8):
                shape = (shape[1], shape[0])
        except Exception:
            pass
        if full_check:
            assert shape[0] > 9 and shape[1] > 9, f"image size {shape} <10 pixels"
            assert im.format.lower() in IMG_FORMATS, f"invalid image format {im.format}"
            if im.format.lower() in ("jpg", "jpeg"):
                with open(im_file, "rb") as f:
                    f.seek(-2, 2)
                    if f.read() != b"\xff\xd9":  # corrupt JPEG: missing EOI
                        from PIL import ImageFile, ImageOps

                        prev = ImageFile.LOAD_TRUNCATED_IMAGES
                        ImageFile.LOAD_TRUNCATED_IMAGES = True  # decode what's there
                        try:
                            ImageOps.exif_transpose(Image.open(im_file)).save(
                                im_file, "JPEG", subsampling=0, quality=100
                            )
                        finally:
                            ImageFile.LOAD_TRUNCATED_IMAGES = prev
                        msg = f"WARNING: {im_file}: corrupt JPEG restored and saved"
        return shape, msg
    except Exception as e:
        try:  # PIL can't read some formats cv2 can (e.g. some tiffs)
            im = cv2.imread(im_file)
            if im is not None:
                return (im.shape[1], im.shape[0]), msg
        except Exception:
            pass
        return None, f"WARNING: {im_file}: ignoring corrupt image: {e}"


def img2label_paths(img_paths: List[str]) -> List[str]:
    """images/xxx.jpg -> labels/xxx.txt (reference convention)."""
    sa, sb = f"{os.sep}images{os.sep}", f"{os.sep}labels{os.sep}"
    return [sb.join(p.rsplit(sa, 1)).rsplit(".", 1)[0] + ".txt" for p in img_paths]


def get_hash(paths: List[str]) -> str:
    return hashlib.md5("".join(sorted(paths)).encode()).hexdigest()


class TrainValDataset:
    """YOLO-format dataset (reference: datasets.py:54-659).

    __getitem__ returns (img_rgb_hwc_uint8, labels [n,5] (cls, xywh-normalized),
    path, shapes-or-None).
    """

    def __init__(
        self,
        img_dir: str,
        img_size: int = 640,
        batch_size: int = 16,
        augment: bool = False,
        hyp: Optional[dict] = None,
        rect: bool = False,
        check_images: bool = False,
        check_labels: bool = False,
        stride: int = 32,
        pad: float = 0.0,
        data_dict: Optional[dict] = None,
        task: str = "train",
        specific_shape: bool = False,
        height: Optional[int] = None,
        width: Optional[int] = None,
        cache_ram: bool = False,
        cache_type: Optional[str] = None,
    ):
        self.img_dir = img_dir
        self.img_size = img_size
        self.batch_size = batch_size
        self.augment = augment
        self.hyp = hyp or {}
        self.rect = rect
        self.stride = stride
        self.pad = pad
        self.data_dict = data_dict or {}
        self.task = task
        self.specific_shape = specific_shape
        self.target_height = height
        self.target_width = width
        # cache tiers for the decoded+pre-resized image (decode is the
        # 1-core-host bottleneck; see docs/Test_speed.md train-pipeline
        # section): "ram" mirrors the reference --cache-ram
        # (reference datasets.py:116-160); "disk" is a TPU-host extension —
        # per-image .npy blobs served from the page cache, bounded RAM.
        if cache_type is None and cache_ram:
            cache_type = "ram"
        self.cache_type = cache_type
        self.cache_ram = cache_type == "ram"

        # fused native augmentation path (C++ mosaic/affine/flip kernel +
        # RGB HSV; data/native_aug.py). Distribution-identical to the cv2
        # path; disable with YOLOV6_NATIVE_AUG=0 for A/B runs.
        self._native_aug = False
        if augment and os.environ.get("YOLOV6_NATIVE_AUG", "1") != "0":
            from yolov6_tpu.data import native_aug as _na

            self._native_aug = _na.available()

        self.img_paths, self.labels, self.shapes = self._load_annotations(
            img_dir, check_images, check_labels
        )
        self.n = len(self.img_paths)
        if self.cache_type == "ram":
            self.imgs: List = [None] * self.n
            self.imgs_hw0: List = [None] * self.n
            self.imgs_hw: List = [None] * self.n
        elif self.cache_type == "disk":
            base = osp.dirname(osp.dirname(self.img_paths[0])) or "."
            tgt = (max(self.target_height or 0, self.target_width or 0)
                   if specific_shape else img_size)
            self._disk_cache_dir = osp.join(
                base, f".tpu_img_cache_{osp.basename(str(img_dir))}_{tgt}"
            )
            os.makedirs(self._disk_cache_dir, exist_ok=True)

        if self.rect:
            self._setup_rect_batches()
        else:
            self.batch_shapes = None
            self.batch_indices = None

        if self.task.lower() == "val" and self.data_dict.get("is_coco") is False:
            # non-COCO datasets get an auto-generated COCO-format GT json
            self.data_dict["anno_path"] = self.generate_coco_format_labels()

    # ------------------------------------------------------------------ scan

    def _scan_images(self, img_dir: str) -> List[str]:
        img_paths = []
        p = Path(img_dir)
        if p.is_file():
            with open(p) as f:
                entries = [line.strip() for line in f if line.strip()]
            img_paths = [e if osp.isabs(e) else str(p.parent / e) for e in entries]
        else:
            img_paths = sorted(
                x for x in glob.glob(str(p / "**" / "*"), recursive=True)
                if x.rsplit(".", 1)[-1].lower() in IMG_FORMATS
            )
        if not img_paths:
            raise FileNotFoundError(f"no images found in {img_dir}")
        return img_paths

    def _load_annotations(self, img_dir, check_images, check_labels):
        img_paths = self._scan_images(img_dir)
        label_paths = img2label_paths(img_paths)

        cache_path = osp.join(
            osp.dirname(osp.dirname(img_paths[0])) or ".", f".{osp.basename(img_dir)}.tpu_cache.json"
        )
        cache_key = get_hash(img_paths + label_paths)
        cached = None
        if osp.exists(cache_path):
            try:
                with open(cache_path) as f:
                    data = json.load(f)
                if data.get("hash") == cache_key and data.get("version") == 2:
                    cached = data["labels"]
            except Exception:
                cached = None

        if cached is None:
            def parse(args):
                """-> (img_path, label_rows, shape_wh) or None to drop.
                Shapes are read from headers (no decode) and stored in the
                cache so rect bucketing / COCO-GT need zero decodes on warm
                start (reference caches shapes the same way,
                datasets.py:306-450); check_images upgrades to a full
                verify + EXIF-aware shape + corrupt-JPEG restore."""
                img_path, lb_path = args
                shape, msg = check_image(img_path, full_check=check_images)
                if msg:
                    LOGGER.warning(msg)
                if shape is None:
                    if check_images:
                        return None
                    shape = (0, 0)  # resolved lazily at first decode
                if not osp.exists(lb_path):
                    return img_path, [], shape
                try:
                    rows = []
                    with open(lb_path) as f:
                        for line in f:
                            vals = line.split()
                            if len(vals) != 5:
                                continue
                            rows.append([float(v) for v in vals])
                    if check_labels and rows:
                        arr = np.array(rows)
                        assert (arr >= 0).all() and (arr[:, 1:] <= 1).all(), "label out of range"
                    return img_path, rows, shape
                except Exception as e:
                    LOGGER.warning(f"skipping {lb_path}: {e}")
                    return img_path, [], shape

            with ThreadPool(8) as pool:
                results = pool.map(parse, zip(img_paths, label_paths))
            results = [r for r in results if r is not None]
            cached = {p: {"labels": rows, "shape": list(shape)} for p, rows, shape in results}
            try:
                with open(cache_path, "w") as f:
                    json.dump({"hash": cache_key, "version": 2, "labels": cached}, f)
            except OSError:
                pass

        paths = [p for p in img_paths if p in cached]
        labels = [np.array(cached[p]["labels"], np.float32).reshape(-1, 5) for p in paths]
        shapes = np.array([cached[p]["shape"] for p in paths], np.float64)  # (w, h)
        return paths, labels, shapes

    def _resolve_shapes(self) -> np.ndarray:
        """Cached (w, h) per image; any unknown (0, 0) entries (image was
        unreadable by PIL during a no-check scan) are filled by a header
        read now."""
        shapes = np.asarray(self.shapes, np.float64)
        for i in np.flatnonzero((shapes <= 0).any(axis=1)):
            shape, _ = check_image(self.img_paths[int(i)])
            if shape is None:
                raise FileNotFoundError(f"unreadable image {self.img_paths[int(i)]}")
            shapes[i] = shape
        self.shapes = shapes
        return shapes

    # ------------------------------------------------------------ rect mode

    def _setup_rect_batches(self):
        """Aspect-ratio bucketing for rect eval (reference: datasets.py:497-522).
        Uses the shapes recorded in the scan cache — no decodes."""
        shapes = self._resolve_shapes()
        ar = shapes[:, 1] / shapes[:, 0]  # h / w
        order = np.argsort(ar)
        self.img_paths = [self.img_paths[i] for i in order]
        self.labels = [self.labels[i] for i in order]
        self.shapes = shapes[order]
        ar = ar[order]

        n_batches = int(np.ceil(self.n / self.batch_size))
        self.batch_indices = np.floor(np.arange(self.n) / self.batch_size).astype(int)
        batch_shapes = []
        for b in range(n_batches):
            ari = ar[self.batch_indices == b]
            mini, maxi = ari.min(), ari.max()
            shape = [1, 1]
            if maxi < 1:
                shape = [maxi, 1]
            elif mini > 1:
                shape = [1, 1 / mini]
            batch_shapes.append(
                np.ceil(np.array(shape) * self.img_size / self.stride + self.pad).astype(int)
                * self.stride
            )
        self.batch_shapes = batch_shapes

    # ------------------------------------------------------------- get item

    def __len__(self):
        return self.n

    def load_image(self, index, shrink_size: Optional[int] = None):
        """Ratio-keeping pre-resize (reference: datasets.py:257-295).

        Train-time fast path: when augmenting, JPEGs whose long side is
        >= 2x the target are decoded at reduced scale (libjpeg DCT scaling
        via cv2.IMREAD_REDUCED_COLOR_N) — a large decode-cost cut on the
        host pipeline. Pixels differ slightly from full-decode + INTER_AREA,
        so this NEVER applies to the eval path (whose letterbox resize is
        bit-parity-tested against the reference)."""
        if self.cache_ram and self.imgs[index] is not None:
            return self.imgs[index], self.imgs_hw0[index], self.imgs_hw[index]
        path = self.img_paths[index]
        im = None
        reduced = False
        if (
            self.augment and not shrink_size
            and path.lower().endswith((".jpg", ".jpeg"))
            and getattr(self, "shapes", None) is not None
        ):
            long_side = float(max(self.shapes[index]))
            target = (max(self.target_height, self.target_width)
                      if self.specific_shape else self.img_size)
            red, flag = 1, None
            for n, f in ((2, cv2.IMREAD_REDUCED_COLOR_2),
                         (4, cv2.IMREAD_REDUCED_COLOR_4),
                         (8, cv2.IMREAD_REDUCED_COLOR_8)):
                if long_side / n >= target:
                    red, flag = n, f
            if flag is not None:
                im = cv2.imread(path, flag)
                reduced = im is not None
        if im is None:
            im = cv2.imread(path)
        if im is None:
            from PIL import Image

            im = cv2.cvtColor(np.asarray(Image.open(path)), cv2.COLOR_RGB2BGR)
        h0, w0 = im.shape[:2]
        if reduced:
            # (h0, w0) is the 'original shape' contract; with a reduced-scale
            # decode the decoded dims are NOT the source dims — report the
            # true size from the scan cache (shapes stores (w, h)).
            w_true, h_true = self.shapes[index]
            if w_true > 0 and h_true > 0:
                h0, w0 = int(h_true), int(w_true)
        if self.specific_shape:
            ratio = min(self.target_width / w0, self.target_height / h0)
        elif shrink_size:
            ratio = (self.img_size - shrink_size) / max(h0, w0)
        else:
            ratio = self.img_size / max(h0, w0)
        if ratio != 1:
            im = cv2.resize(
                im,
                (int(w0 * ratio), int(h0 * ratio)),
                interpolation=cv2.INTER_AREA if ratio < 1 and not self.augment else cv2.INTER_LINEAR,
            )
        if self.cache_ram:
            self.imgs[index], self.imgs_hw0[index], self.imgs_hw[index] = im, (h0, w0), im.shape[:2]
        return im, (h0, w0), im.shape[:2]

    # ------------------------------------------------- native train path

    def _true_size(self, index) -> Tuple[int, int]:
        """(h0, w0) from the scan cache, header-read on (0, 0) misses."""
        w0, h0 = self.shapes[index]
        if w0 <= 0 or h0 <= 0:
            shape, _ = check_image(self.img_paths[index])
            if shape is None:
                raise FileNotFoundError(f"unreadable image {self.img_paths[index]}")
            self.shapes[index] = shape
            w0, h0 = shape
        return int(h0), int(w0)

    def _load_image_rgb(self, index):
        """load_image twin for the fused native augment path: decoded +
        pre-resized RGB u8 (the native decoder emits RGB; the fused kernel
        output feeds the model directly, no BGR pass anywhere). Serves from
        the RAM/disk cache tiers when enabled. Returns (im, (h0, w0), (h, w)).
        """
        if self.cache_type == "ram" and self.imgs[index] is not None:
            return self.imgs[index], self.imgs_hw0[index], self.imgs_hw[index]
        path = self.img_paths[index]
        cache_file = None
        if self.cache_type == "disk":
            stem = osp.splitext(osp.basename(path))[0]
            cache_file = osp.join(self._disk_cache_dir, stem + ".rgb.npy")
            if osp.exists(cache_file):
                try:
                    # mmap: the fused kernel gathers pixels straight out of
                    # the page cache — no per-image copy on the 1-core host
                    im = np.load(cache_file, mmap_mode="r")
                    h0, w0 = self._true_size(index)
                    return im, (h0, w0), im.shape[:2]
                except Exception:
                    pass  # torn/corrupt entry: fall through to re-decode

        h0, w0 = self._true_size(index)
        if self.specific_shape:
            ratio = min(self.target_width / w0, self.target_height / h0)
            target = max(self.target_height, self.target_width)
        else:
            ratio = self.img_size / max(h0, w0)
            target = self.img_size
        dst_h, dst_w = int(h0 * ratio), int(w0 * ratio)

        im = None
        if path.lower().endswith((".jpg", ".jpeg")):
            from yolov6_tpu import native

            denom = 1
            for n in (2, 4, 8):  # IMREAD_REDUCED rule (load_image above)
                if max(h0, w0) / n >= target:
                    denom = n
            im = native.decode_jpeg_resize_native(path, denom, dst_h, dst_w)
        if im is None:  # non-JPEG or decode failure: cv2/PIL fallback
            bgr = cv2.imread(path)
            if bgr is None:
                from PIL import Image

                im = np.asarray(Image.open(path).convert("RGB"))
            else:
                im = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            if im.shape[:2] != (dst_h, dst_w):
                im = cv2.resize(im, (dst_w, dst_h), interpolation=cv2.INTER_LINEAR)

        if self.cache_type == "ram":
            self.imgs[index] = im
            self.imgs_hw0[index] = (h0, w0)
            self.imgs_hw[index] = im.shape[:2]
        elif cache_file is not None:
            tmp = cache_file + f".tmp{os.getpid()}_{threading.get_ident()}"
            try:
                np.save(tmp, im)
                os.replace(tmp + ".npy", cache_file)
            except OSError:
                pass
        return im, (h0, w0), im.shape[:2]

    def _one_mosaic_native(self, index, shape, flip_lr, flip_ud, hsv_gains=None):
        """One fused-native mosaic draw (same index/param distributions as
        get_mosaic + mosaic_augmentation). Returns (img RGB, labels xyxy)."""
        from yolov6_tpu.data import native_aug as na

        indices = [index] + random.choices(range(self.n), k=3)
        random.shuffle(indices)
        imgs, hs, ws, lbs = [], [], [], []
        for i in indices:
            img, _, (h, w) = self._load_image_rgb(i)
            imgs.append(img)
            hs.append(h)
            ws.append(w)
            lbs.append(self.labels[i])
        return na.mosaic_affine_native(
            shape, imgs, hs, ws, lbs, self.hyp,
            specific_shape=self.specific_shape,
            target_height=self.target_height or self.img_size,
            target_width=self.target_width or self.img_size,
            hsv_gains=hsv_gains, flip_lr=flip_lr, flip_ud=flip_ud,
        )

    def _mosaic_native_sample(self, index, shape):
        """Native twin of the mosaic(+mixup)+HSV+flip train branch.

        Flips are drawn up front and fused into the warp kernel (they
        commute with HSV and mixup); HSV runs AFTER the optional mixup
        blend, like the reference (general_augment follows mixup), via the
        cv2 LUT pipeline. NOTE (measured, don't retry): routing HSV into
        the kernel's fused float path (hsv_gains=...) is ~3x SLOWER than
        this LUT pass on the 1-core host — cv2's fixed-point SIMD
        cvtColor+LUT beats scalar per-pixel float HSV (warm loader 79.6 ->
        52 imgs/s; kernel tottime 0.8 -> 2.6 s per 192 imgs). The fused
        path stays available for callers that need single-pass semantics.
        Label flips are applied by __getitem__ after normalization,
        matching general_augment's order.
        Returns (img, labels_xyxy, flip_lr, flip_ud).
        """
        from yolov6_tpu.data import native_aug as na
        from yolov6_tpu.data.data_augment import augment_hsv_rgb
        from yolov6_tpu import native

        flip_lr, flip_ud = na.draw_flips(self.hyp)
        img, labels = self._one_mosaic_native(index, shape, flip_lr, flip_ud)
        if random.random() < self.hyp.get("mixup", 0.0):
            img2, labels2 = self._one_mosaic_native(
                random.randint(0, self.n - 1), shape, flip_lr, flip_ud
            )
            r = np.random.beta(32.0, 32.0)  # reference data_augment.py:61-66
            native.blend_native(img, img2, r)
            labels = np.concatenate((labels, labels2), 0)
        augment_hsv_rgb(img, na.draw_hsv_gains(self.hyp))
        return img, labels, flip_lr, flip_ud

    def get_mosaic(self, index, shape):
        indices = [index] + random.choices(range(self.n), k=3)
        random.shuffle(indices)
        imgs, hs, ws, labels = [], [], [], []
        for i in indices:
            img, _, (h, w) = self.load_image(i)
            imgs.append(img)
            hs.append(h)
            ws.append(w)
            labels.append(self.labels[i])
        return mosaic_augmentation(
            shape, imgs, hs, ws, labels, self.hyp,
            specific_shape=self.specific_shape,
            target_height=self.target_height or self.img_size,
            target_width=self.target_width or self.img_size,
        )

    def general_augment(self, img, labels):
        """HSV + flips on normalized labels (reference: datasets.py general_augment)."""
        nl = len(labels)
        augment_hsv(img, self.hyp.get("hsv_h", 0.015), self.hyp.get("hsv_s", 0.7), self.hyp.get("hsv_v", 0.4))
        if random.random() < self.hyp.get("flipud", 0.0):
            img = np.flipud(img)
            if nl:
                labels[:, 2] = 1 - labels[:, 2]
        if random.random() < self.hyp.get("fliplr", 0.5):
            img = np.fliplr(img)
            if nl:
                labels[:, 1] = 1 - labels[:, 1]
        return np.ascontiguousarray(img), labels

    def __getitem__(self, index):
        target_shape = (
            (self.target_height, self.target_width) if self.specific_shape
            else self.batch_shapes[self.batch_indices[index]] if self.rect
            else self.img_size
        )
        shrink = self.hyp.get("shrink_size") if self.hyp else None
        # native path: fused C++ mosaic/affine/flip kernel + RGB-in HSV;
        # pixel flips already applied, label flips deferred to below
        native_flips = None

        if self.augment and random.random() < self.hyp.get("mosaic", 0.0):
            shapes = None
            if self._native_aug:
                img, labels, flip_lr, flip_ud = self._mosaic_native_sample(
                    index, target_shape
                )
                native_flips = (flip_lr, flip_ud)
            else:
                img, labels = self.get_mosaic(index, target_shape)
                if random.random() < self.hyp.get("mixup", 0.0):
                    img_other, labels_other = self.get_mosaic(
                        random.randint(0, self.n - 1), target_shape
                    )
                    img, labels = mixup(img, labels, img_other, labels_other)
        else:
            use_native = self._native_aug and self.augment and not shrink
            if use_native:
                from yolov6_tpu.native import letterbox_native

                img, (h0, w0), (h, w) = self._load_image_rgb(index)
                new_shape = (
                    (target_shape, target_shape) if isinstance(target_shape, int)
                    else tuple(target_shape)
                )
                img, ratio, pad = letterbox_native(img, new_shape, scaleup=True)
            else:
                img, (h0, w0), (h, w) = self.load_image(index, shrink)
                img, ratio, pad = letterbox(img, target_shape, auto=False, scaleup=self.augment)
            shapes = (h0, w0), ((h * ratio / h0, w * ratio / w0), pad)

            labels = self.labels[index].copy()
            if labels.size:
                w_r, h_r = w * ratio, h * ratio
                boxes = np.copy(labels[:, 1:])
                boxes[:, 0] = w_r * (labels[:, 1] - labels[:, 3] / 2) + pad[0]
                boxes[:, 1] = h_r * (labels[:, 2] - labels[:, 4] / 2) + pad[1]
                boxes[:, 2] = w_r * (labels[:, 1] + labels[:, 3] / 2) + pad[0]
                boxes[:, 3] = h_r * (labels[:, 2] + labels[:, 4] / 2) + pad[1]
                labels[:, 1:] = boxes

            if self.augment:
                aug_kw = dict(
                    degrees=self.hyp.get("degrees", 0.0),
                    translate=self.hyp.get("translate", 0.1),
                    scale=self.hyp.get("scale", 0.5),
                    shear=self.hyp.get("shear", 0.0),
                    new_shape=target_shape,
                )
                if use_native:
                    from yolov6_tpu.data import native_aug as na
                    from yolov6_tpu.data.data_augment import augment_hsv_rgb

                    flip_lr, flip_ud = na.draw_flips(self.hyp)
                    # HSV via the cv2 LUT pass, NOT the kernel's fused float
                    # path — measured 3x slower in-kernel (see
                    # _mosaic_native_sample docstring)
                    img, labels = na.affine_hsv_native(
                        img, labels, flip_lr=flip_lr, flip_ud=flip_ud, **aug_kw
                    )
                    augment_hsv_rgb(img, na.draw_hsv_gains(self.hyp))
                    native_flips = (flip_lr, flip_ud)
                else:
                    img, labels = random_affine(img, labels, **aug_kw)

        if len(labels):
            h, w = img.shape[:2]
            labels[:, [1, 3]] = labels[:, [1, 3]].clip(0, w - 1e-3)
            labels[:, [2, 4]] = labels[:, [2, 4]].clip(0, h - 1e-3)
            boxes = np.copy(labels[:, 1:])
            boxes[:, 0] = ((labels[:, 1] + labels[:, 3]) / 2) / w
            boxes[:, 1] = ((labels[:, 2] + labels[:, 4]) / 2) / h
            boxes[:, 2] = (labels[:, 3] - labels[:, 1]) / w
            boxes[:, 3] = (labels[:, 4] - labels[:, 2]) / h
            labels[:, 1:] = boxes

        if self.augment:
            if native_flips is not None:
                # pixels were flipped inside the kernel; mirror the labels
                # here, in general_augment's order (flipud then fliplr)
                flip_lr, flip_ud = native_flips
                if flip_ud and len(labels):
                    labels[:, 2] = 1 - labels[:, 2]
                if flip_lr and len(labels):
                    labels[:, 1] = 1 - labels[:, 1]
            else:
                img, labels = self.general_augment(img, labels)

        if native_flips is None:
            img = np.ascontiguousarray(img[:, :, ::-1])  # BGR -> RGB, keep HWC
        return img, labels.astype(np.float32), self.img_paths[index], shapes

    # --------------------------------------------------------- COCO GT json

    def generate_coco_format_labels(self) -> str:
        """Emit a COCO-format GT json for non-COCO datasets
        (reference: datasets.py:599-652)."""
        class_names = self.data_dict.get("names", [])
        out = {"info": {"description": "auto-generated by yolov6_tpu"}, "images": [],
               "annotations": [], "categories": []}
        for i, name in enumerate(class_names):
            out["categories"].append({"id": i, "name": str(name), "supercategory": str(name)})
        # COCO annotation ids must start at 1: pycocotools stores matches as
        # ids in dtm/gtm arrays where 0 means "unmatched", so an id-0
        # annotation silently breaks its TP accounting
        ann_id = 1
        save_path = osp.join(
            osp.dirname(osp.dirname(self.img_paths[0])) or ".",
            f".{osp.basename(str(self.img_dir))}_coco_gt.json",
        )
        shapes = self._resolve_shapes()
        for idx, (path, labels) in enumerate(zip(self.img_paths, self.labels)):
            w, h = (int(shapes[idx][0]), int(shapes[idx][1]))
            img_id = osp.splitext(osp.basename(path))[0]
            img_id = int(img_id) if img_id.isnumeric() else img_id
            out["images"].append(
                {"id": img_id, "file_name": osp.basename(path), "width": w, "height": h}
            )
            for cls, xc, yc, bw, bh in labels.tolist():
                x1 = (xc - bw / 2) * w
                y1 = (yc - bh / 2) * h
                out["annotations"].append(
                    {
                        "id": ann_id, "image_id": img_id, "category_id": int(cls),
                        "bbox": [x1, y1, bw * w, bh * h], "area": bw * w * bh * h,
                        "iscrowd": 0, "segmentation": [],
                    }
                )
                ann_id += 1
        with open(save_path, "w") as f:
            json.dump(out, f)
        LOGGER.info(f"COCO-format GT labels saved to {save_path}")
        return save_path


class LoadData:
    """Streaming source for inference: image/video files or webcam
    (reference: datasets.py:662-726)."""

    def __init__(self, path: str, webcam: bool = False, webcam_addr: str = "0"):
        self.webcam = webcam
        self.webcam_addr = webcam_addr
        if webcam:
            imgp, vidp = [], []
            self.nf = 1
        else:
            p = str(Path(path).resolve())
            if os.path.isdir(p):
                files = sorted(glob.glob(os.path.join(p, "**", "*.*"), recursive=True))
            elif os.path.isfile(p):
                files = [p]
            else:
                raise FileNotFoundError(f"Invalid path {p}")
            imgp = [f for f in files if f.split(".")[-1].lower() in IMG_FORMATS]
            vidp = [f for f in files if f.split(".")[-1].lower() in VID_FORMATS]
            self.nf = len(imgp) + len(vidp)
        self.files = imgp + vidp
        self.type = "image"
        self.cap = None
        if webcam:
            self.type = "video"
            self.cap = cv2.VideoCapture(int(webcam_addr) if webcam_addr.isdigit() else webcam_addr)
            self.files = [webcam_addr]

    @staticmethod
    def checkext(path):
        return "video" if path.split(".")[-1].lower() in VID_FORMATS else "image"

    def __iter__(self):
        self.count = 0
        return self

    def __next__(self):
        if self.count == self.nf:
            raise StopIteration
        path = self.files[self.count]
        if self.webcam:
            ret_val, img = self.cap.read()
            if not ret_val:
                raise StopIteration
            return img, path, self.cap
        if self.checkext(path) == "video":
            self.type = "video"
            if self.cap is None or not self.cap.isOpened():
                self.cap = cv2.VideoCapture(path)
            ret_val, img = self.cap.read()
            while not ret_val:
                self.count += 1
                self.cap.release()
                if self.count == self.nf:
                    raise StopIteration
                path = self.files[self.count]
                self.cap = cv2.VideoCapture(path)
                ret_val, img = self.cap.read()
        else:
            self.count += 1
            img = cv2.imread(path)
        return img, path, self.cap

    def __len__(self):
        return self.nf
