"""max_nms truncation fidelity + selection-backend equivalence.

Pins the properties measured by tools/nms_sweep.py (full-scale TPU numbers
in docs/nms_fidelity.md) on scaled-down scenes:

  - realistic candidate density: an aggressive max_nms cap is lossless
    (keep-set identical to the reference's 30000-exact cap,
    reference utils/nms.py:55);
  - the adversarial "flood" scene (few huge clusters burying quiet objects
    deep in the ranking) is where a small cap loses detections — this is why
    the eval default is 8192, not 2000;
  - the tiled exact-greedy backend (ops/nms._tiled_keep) returns keep-sets
    identical to the sequential loop backend on dense scenes.
"""

import sys
import os.path as osp

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tools"))

from nms_sweep import dense_scenes, keep_sets, agreement  # noqa: E402

from yolov6_tpu.ops.nms import non_max_suppression  # noqa: E402


def _run(pred, max_nms, method, exact=True, anchor_topc=16):
    dets, valid = non_max_suppression(
        jnp.asarray(pred), conf_thres=0.03, iou_thres=0.65, max_det=300,
        max_nms=max_nms, multi_label=True, exact_topk=exact, method=method,
        anchor_topc=anchor_topc,
    )
    return keep_sets(np.asarray(dets), np.asarray(valid))


def test_mixed_scene_truncation_lossless():
    """Realistic density: cap at 2048 == full exact candidate set."""
    pred, _ = dense_scenes(batch=2, anchors=2048, nc=20, n_objects=40,
                           seed=3, scene="mixed")
    base = _run(pred, 2048 * 20, "tiled")  # un-truncated
    cut = _run(pred, 2048, "tiled")
    det_agree, score_agree = agreement(base, cut)
    assert det_agree == 1.0 and score_agree == 1.0


def test_flood_scene_needs_large_cap():
    """Adversarial flood: 2048 loses the quiet objects, 8192 is lossless."""
    pred, n_cand = dense_scenes(batch=1, anchors=8400, nc=80, scene="flood")
    assert n_cand.max() <= 8192  # 8192 covers every candidate here
    base = _run(pred, 8192, "tiled")
    small = _run(pred, 2048, "tiled")
    det_small, _ = agreement(base, small)
    assert det_small < 0.7, f"flood scene unexpectedly survived: {det_small}"


def test_anchor_topc_prereduction_lossless():
    """The per-anchor top-C class pre-reduction (selection over A*C instead
    of A*nc elements) keeps the final detection set identical to the full
    A*nc path on both scene families — a dropped 17th-best class of an
    anchor never survives the global top-k + greedy keep + top-300 emit.
    The default (8) and the conservative 16 are both exact here."""
    for scene in ("mixed", "flood"):
        pred, _ = dense_scenes(batch=2, anchors=8400, nc=80, seed=5,
                               scene=scene)
        base = _run(pred, 8192, "tiled", anchor_topc=0)
        for topc in (8, 16):
            cut = _run(pred, 8192, "tiled", anchor_topc=topc)
            assert cut == base, (scene, topc)


def test_grouped_matches_topk_row_select():
    """The residue-group pre-reduction ('grouped', default) produces the
    same final detection set as the exact per-anchor top-C ('topk') on both
    scene families: a same-anchor class pair colliding mod C that BOTH
    matter for the final keep-set never occurs at realistic density."""
    for scene in ("mixed", "flood"):
        pred, _ = dense_scenes(batch=2, anchors=8400, nc=80, seed=5,
                               scene=scene)
        dets_g, valid_g = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.03, iou_thres=0.65, max_det=300,
            max_nms=8192, multi_label=True, exact_topk=True,
            anchor_topc=8, row_select="grouped")
        dets_t, valid_t = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.03, iou_thres=0.65, max_det=300,
            max_nms=8192, multi_label=True, exact_topk=True,
            anchor_topc=8, row_select="topk")
        assert keep_sets(np.asarray(dets_g), np.asarray(valid_g)) == \
            keep_sets(np.asarray(dets_t), np.asarray(valid_t)), scene


def test_grouped_collision_drops_weaker_same_residue_class():
    """Documented semantic difference: when one anchor carries TWO
    above-conf classes with c ≡ c' (mod C), 'grouped' keeps only the
    stronger (one slot per residue group) while 'topk' keeps both."""
    nc, topc = 20, 8
    pred = np.zeros((1, 64, 5 + nc), np.float32)
    pred[0, :, 0:2] = np.linspace(40, 600, 64)[:, None]  # isolated boxes
    pred[0, :, 2:4] = 20.0
    pred[0, :, 4] = 1.0
    # anchor 0: classes 3 and 11 (both ≡ 3 mod 8) above conf
    pred[0, 0, 5 + 3] = 0.9
    pred[0, 0, 5 + 11] = 0.8
    # anchor 1: classes 2 and 9 (different residues) above conf
    pred[0, 1, 5 + 2] = 0.7
    pred[0, 1, 5 + 9] = 0.6

    def classes_of(row_select):
        dets, valid = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.25, iou_thres=0.65, max_det=16,
            max_nms=64, multi_label=True, exact_topk=True,
            anchor_topc=topc, row_select=row_select)
        d, v = np.asarray(dets[0]), np.asarray(valid[0])
        return sorted(int(r[5]) for r, ok in zip(d, v) if ok)

    assert classes_of("topk") == [2, 3, 9, 11]
    assert classes_of("grouped") == [2, 3, 9]  # 11 lost to 3 (same residue)


def test_grouped_pads_indivisible_nc():
    """nc not divisible by the group count: the padded class columns must
    never surface (all emitted class ids < nc) and single-label-per-residue
    scenes match the topk path exactly."""
    nc, topc = 12, 8  # width 2, 4 padded columns
    rng = np.random.default_rng(11)
    pred = np.zeros((2, 128, 5 + nc), np.float32)
    pred[..., 0] = rng.uniform(30, 600, (2, 128))
    pred[..., 1] = rng.uniform(30, 600, (2, 128))
    pred[..., 2:4] = rng.uniform(10, 40, (2, 128, 2))
    pred[..., 4] = rng.uniform(0.2, 1.0, (2, 128))
    one_cls = rng.integers(0, nc, (2, 128))
    for b in range(2):
        pred[b, np.arange(128), 5 + one_cls[b]] = rng.uniform(0.3, 1.0, 128)

    outs = {}
    for row_select in ("grouped", "topk"):
        dets, valid = non_max_suppression(
            jnp.asarray(pred), conf_thres=0.1, iou_thres=0.65, max_det=64,
            max_nms=128, multi_label=True, exact_topk=True,
            anchor_topc=topc, row_select=row_select)
        d, v = np.asarray(dets), np.asarray(valid)
        assert (d[..., 5][v] < nc).all(), row_select
        outs[row_select] = keep_sets(d, v)
    assert outs["grouped"] == outs["topk"]


def test_row_select_plumbing():
    """--row-select reaches the Evaler and the eval CLI defaults to
    'grouped' (the measured-fastest lossless configuration)."""
    sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
    from tools.eval import get_args_parser
    from yolov6_tpu.core.evaler import Evaler

    args = get_args_parser().parse_args([])
    assert args.row_select == "grouped"
    ev = Evaler({"nc": 4, "names": list("abcd")}, row_select="topk",
                data_parallel=False)
    assert ev.row_select == "topk"


def test_tiled_matches_loop_backend():
    """Exact keep-set identity between the tiled and sequential backends,
    including truncated caps and the multi-tile path (K=2048 -> 4 tiles)."""
    for scene, anchors, nc in (("mixed", 2048, 20), ("flood", 8400, 80)):
        pred, _ = dense_scenes(batch=2, anchors=anchors, nc=nc,
                               n_objects=40, seed=7, scene=scene)
        for max_nms in (600, 2048):
            tiled = _run(pred, max_nms, "tiled")
            loop = _run(pred, max_nms, "loop")
            assert tiled == loop, (scene, max_nms)
            # perclass: the flood scene overflows class_cap (fallback path),
            # the mixed scene stays on the per-class Jacobi fast path
            perclass = _run(pred, max_nms, "perclass")
            assert perclass == loop, (scene, max_nms, "perclass")
