"""Batched host data pipeline (reference: yolov6/data/data_load.py).

TPU-native differences from the torch DataLoader original:

* fixed-shape batches — the last partial batch is padded (with a validity
  count) instead of dropped or ragged, so the jitted eval step never
  recompiles;
* per-host sharding by ``jax.process_index()`` replaces DistributedSampler;
* threaded prefetch (cv2/numpy release the GIL) instead of worker processes.
"""

from __future__ import annotations

import queue
import random
import threading
from typing import Iterator, Optional

import numpy as np

from yolov6_tpu.data.datasets import TrainValDataset


class DataLoader:
    """Iterates fixed-shape (imgs, labels, paths, shapes, n_valid) batches.

    imgs: uint8 [B, H, W, 3] RGB. labels: float32 [B, max_labels, 5]
    (cls, cx, cy, w, h normalized) padded with -1 class. n_valid: number of
    real samples in the batch (tail padding repeats the last sample).
    """

    def __init__(
        self,
        dataset: TrainValDataset,
        batch_size: int,
        shuffle: bool = False,
        num_workers: int = 4,
        max_labels: int = 120,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        drop_last: bool = False,
        prefetch: int = 4,
        pad_shards: bool = True,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.max_labels = max_labels
        self.seed = seed
        self.epoch = 0
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.pad_shards = pad_shards

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _indices(self):
        idx = list(range(len(self.dataset)))
        if self.shuffle:
            rng = random.Random(self.seed + self.epoch)
            rng.shuffle(idx)
        # contiguous per-host shard (matches DistributedSampler's padding).
        # pad_shards=False disables the wrap-around fill — required for eval
        # shards, where wrapped duplicates would double-count detections in
        # the gathered COCO scoring (training keeps padding so every host
        # runs the same number of steps between collectives).
        if self.num_shards > 1:
            per = int(np.ceil(len(idx) / self.num_shards))
            lo = self.shard_id * per
            idx = (idx * 2)[lo : lo + per] if self.pad_shards else idx[lo : lo + per]
        return idx

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return int(np.ceil(n / self.batch_size))

    def _collate(self, samples):
        n_valid = len(samples)
        while len(samples) < self.batch_size:
            samples.append(samples[-1])
        imgs = np.stack([s[0] for s in samples])
        labels = np.full((self.batch_size, self.max_labels, 5), -1.0, np.float32)
        labels[..., 1:] = 0.0
        for i, s in enumerate(samples):
            lb = s[1][: self.max_labels]
            if len(lb):
                labels[i, : len(lb)] = lb
        paths = [s[2] for s in samples]
        shapes = [s[3] for s in samples]
        return imgs, labels, paths, shapes, n_valid

    def __iter__(self) -> Iterator:
        indices = self._indices()
        batches = [
            indices[i : i + self.batch_size] for i in range(0, len(indices), self.batch_size)
        ]
        if self.drop_last and batches and len(batches[-1]) < self.batch_size:
            batches.pop()

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                from multiprocessing.pool import ThreadPool

                with ThreadPool(self.num_workers) as pool:
                    for batch_idx in batches:
                        if stop.is_set():
                            return
                        samples = pool.map(self.dataset.__getitem__, batch_idx)
                        q.put(self._collate(samples))
            except Exception as e:  # surface worker errors to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


def prefetch_to_device(batches, n_prefetch: int = 2, sharding=None,
                       thread: bool = True):
    """Overlap host->device transfer with the consumer's dispatch.

    Wraps a (imgs, labels, *rest) batch iterator: jax.device_put is issued
    for up to ``n_prefetch`` batches ahead of the consumer, so the (tunnel)
    transfer of batch i+1 rides under the device step of batch i. A bare
    jnp.asarray at consume time serializes transfer behind the step dispatch
    instead — measured as the train pipeline's 26% overlap loss in round 4
    (BENCH_r04 s_train_pipeline; the torch analog is DataLoader
    pin_memory+non_blocking copies, reference data_load.py:66-73).

    thread=True moves the device_put calls to a dedicated transfer thread:
    through the axon tunnel device_put BLOCKS the calling thread for a
    large fraction of the wire time (measured ~160 ms per 39 MB batch), so
    issuing it inline would stall the consumer's dispatch loop; on a real
    TPU-VM host the put is cheap either way and the thread just adds one
    queue hop.
    """
    import collections
    import queue as _queue
    import threading

    import jax

    def put(item):
        imgs, labels = item[0], item[1]
        if sharding is not None:
            return (jax.device_put(imgs, sharding), jax.device_put(labels, sharding)) + tuple(item[2:])
        return (jax.device_put(imgs), jax.device_put(labels)) + tuple(item[2:])

    if thread:
        q: _queue.Queue = _queue.Queue(maxsize=max(1, n_prefetch))
        _END = object()
        err = []

        def worker():
            try:
                for item in batches:
                    q.put(put(item))
            except BaseException as e:  # noqa: BLE001 — surface in consumer
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True,
                             name="device-prefetch")
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if err:
            raise err[0]
        return

    q2 = collections.deque()
    for item in batches:
        q2.append(put(item))
        if len(q2) > n_prefetch:
            yield q2.popleft()
    while q2:
        yield q2.popleft()


def create_dataloader(
    path: str,
    img_size: int,
    batch_size: int,
    stride: int = 32,
    hyp: Optional[dict] = None,
    augment: bool = False,
    check_images: bool = False,
    check_labels: bool = False,
    pad: float = 0.0,
    rect: bool = False,
    data_dict: Optional[dict] = None,
    task: str = "train",
    specific_shape: bool = False,
    height: Optional[int] = None,
    width: Optional[int] = None,
    cache_ram: bool = False,
    cache_type: Optional[str] = None,
    num_workers: int = 8,
    shuffle: Optional[bool] = None,
    max_labels: int = 120,
    seed: int = 0,
    shard_id: int = 0,
    num_shards: int = 1,
    pad_shards: bool = True,
):
    """Factory mirroring the reference signature (reference: data_load.py:15-93)."""
    if rect and shuffle:
        shuffle = False
    dataset = TrainValDataset(
        path,
        img_size=img_size,
        batch_size=batch_size,
        augment=augment,
        hyp=hyp,
        rect=rect,
        check_images=check_images,
        check_labels=check_labels,
        stride=stride,
        pad=pad,
        data_dict=data_dict,
        task=task,
        specific_shape=specific_shape,
        height=height,
        width=width,
        cache_ram=cache_ram,
        cache_type=cache_type,
    )
    loader = DataLoader(
        dataset,
        batch_size=batch_size,
        shuffle=augment if shuffle is None else shuffle,
        num_workers=num_workers,
        max_labels=max_labels,
        seed=seed,
        shard_id=shard_id,
        num_shards=num_shards,
        drop_last=augment,
        pad_shards=pad_shards,
    )
    return loader, dataset
