"""Collective multi-host in-training eval: host-gather plumbing.

Real multi-process runs aren't possible in this environment (single host);
these tests pin the single-process-verifiable pieces: the numeric COCO-row
encoding that rides multihost_utils.process_allgather, and the unpadded
val-shard slicing that prevents detection double-counting
(reference analog: rank-0-only eval at engine.py:184-190 — our redesign
shards predict work across hosts and reduces host-side).
"""

import numpy as np

from yolov6_tpu.core.evaler import (
    decode_pred_rows, encode_pred_rows, gather_coco_predictions,
)
from yolov6_tpu.data.data_load import DataLoader


def test_pred_row_roundtrip_numeric_and_str_stems():
    img_paths = ["/d/1000.jpg", "/d/1001.jpg", "/d/frame_a.jpg"]
    preds = [
        {"image_id": 1000, "category_id": 3,
         "bbox": [1.25, 2.5, 10.0, 20.125], "score": 0.91234},
        {"image_id": "frame_a", "category_id": 0,
         "bbox": [0.0, 0.0, 5.5, 5.5], "score": 0.03},
        {"image_id": 1001, "category_id": 2,
         "bbox": [7.0, 8.0, 9.0, 10.0], "score": 0.5},
    ]
    rows = encode_pred_rows(preds, img_paths)
    assert rows.shape == (3, 7)
    back = decode_pred_rows(rows, img_paths)
    assert back == preds  # rounded values survive float64 exactly


def test_gather_is_identity_single_process():
    img_paths = ["/d/7.jpg"]
    preds = [{"image_id": 7, "category_id": 1, "bbox": [1, 2, 3, 4], "score": 0.5}]
    assert gather_coco_predictions(preds, img_paths) is preds


class _FakeDataset(list):
    pass


def test_unpadded_shards_partition_without_duplicates():
    ds = _FakeDataset(range(10))

    def shard_indices(shard_id, pad):
        dl = DataLoader(ds, batch_size=4, shuffle=False, num_workers=1,
                        shard_id=shard_id, num_shards=3, pad_shards=pad)
        return dl._indices()

    unpadded = [shard_indices(i, False) for i in range(3)]
    flat = [i for s in unpadded for i in s]
    assert sorted(flat) == list(range(10))          # exact partition
    assert len(flat) == len(set(flat))              # no duplicates
    assert [len(s) for s in unpadded] == [4, 4, 2]  # short tail shard

    padded = [shard_indices(i, True) for i in range(3)]
    assert [len(s) for s in padded] == [4, 4, 4]    # DistributedSampler wrap
    assert sorted(set(i for s in padded for i in s)) == list(range(10))
