"""Literal numpy transcription of pycocotools' COCOeval bbox protocol,
kept deliberately close to cocoeval.py's own structure (per-image evalImg
dicts, global mergesort in accumulate) so it can serve as an independent
oracle for yolov6_tpu.utils.coco_eval — which is organised differently
(per-category streaming, fused area/maxDet loops).

Transcribed from the published pycocotools semantics
(pycocotools/cocoeval.py: computeIoU, evaluateImg, accumulate, summarize);
bbox-only, no segmentation.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [(0.0, 1e10), (0.0, 32.0**2), (32.0**2, 96.0**2), (96.0**2, 1e10)]
MAX_DETS = [1, 10, 100]


def _bbox_iou(d, g, iscrowd):
    """maskUtils.iou for bbox: crowd gt -> intersection over det area."""
    D, G = len(d), len(g)
    out = np.zeros((D, G))
    for i in range(D):
        dx, dy, dw, dh = d[i]
        da = dw * dh
        for j in range(G):
            gx, gy, gw, gh = g[j]
            ga = gw * gh
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = da if iscrowd[j] else da + ga - inter
            out[i, j] = inter / union
    return out


class COCOevalOracle:
    def __init__(self, gt_dict, detections):
        """gt_dict: COCO-format dict; detections: list of
        {image_id, category_id, bbox xywh, score}."""
        self.img_ids = [im["id"] for im in gt_dict["images"]]
        self.cat_ids = sorted(c["id"] for c in gt_dict["categories"])
        self._gts = {}
        self._dts = {}
        for img_id in self.img_ids:
            for cat_id in self.cat_ids:
                self._gts[img_id, cat_id] = []
                self._dts[img_id, cat_id] = []
        for ann in gt_dict["annotations"]:
            g = dict(ann)
            g.setdefault("iscrowd", 0)
            g.setdefault("area", g["bbox"][2] * g["bbox"][3])
            # upstream _prepare quirk: gt['ignore'] is normalized and then
            # OVERWRITTEN by iscrowd ("gt['ignore'] = 'iscrowd' in gt and
            # gt['iscrowd']"), so a user 'ignore' field has no effect on
            # bbox eval
            g["_ignore"] = 1 if g["iscrowd"] else 0
            self._gts[g["image_id"], g["category_id"]].append(g)
        for i, d in enumerate(detections):
            dd = dict(d)
            dd["id"] = i + 1  # loadRes assigns sequential det ids from 1
            dd["area"] = dd["bbox"][2] * dd["bbox"][3]
            self._dts[dd["image_id"], dd["category_id"]].append(dd)

    def _evaluate_img(self, img_id, cat_id, a_rng, max_det):
        gt = self._gts[img_id, cat_id]
        dt = self._dts[img_id, cat_id]
        if len(gt) == 0 and len(dt) == 0:
            return None
        for g in gt:
            g["_ignore_a"] = 1 if (g["_ignore"] or g["area"] < a_rng[0] or g["area"] > a_rng[1]) else 0
        gtind = np.argsort([g["_ignore_a"] for g in gt], kind="mergesort")
        gt = [gt[i] for i in gtind]
        dtind = np.argsort([-d["score"] for d in dt], kind="mergesort")
        dt = [dt[i] for i in dtind[:max_det]]
        iscrowd = [int(g["iscrowd"]) for g in gt]
        ious = _bbox_iou(
            np.array([d["bbox"] for d in dt], float).reshape(-1, 4),
            np.array([g["bbox"] for g in gt], float).reshape(-1, 4),
            iscrowd,
        )

        T = len(IOU_THRS)
        G = len(gt)
        D = len(dt)
        gtm = np.zeros((T, G))
        dtm = np.zeros((T, D))
        gt_ig = np.array([g["_ignore_a"] for g in gt])
        dt_ig = np.zeros((T, D))
        if len(ious) and G:
            for tind, t in enumerate(IOU_THRS):
                for dind, d in enumerate(dt):
                    iou = min(t, 1 - 1e-10)
                    m = -1
                    for gind, g in enumerate(gt):
                        if gtm[tind, gind] > 0 and not iscrowd[gind]:
                            continue
                        if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                            break
                        if ious[dind, gind] < iou:
                            continue
                        iou = ious[dind, gind]
                        m = gind
                    if m == -1:
                        continue
                    dt_ig[tind, dind] = gt_ig[m]
                    dtm[tind, dind] = gt[m]["id"]
                    gtm[tind, m] = d["id"]
        a = np.array(
            [d["area"] < a_rng[0] or d["area"] > a_rng[1] for d in dt]
        ).reshape(1, -1)
        dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
        return {
            "dtMatches": dtm,
            "dtScores": [d["score"] for d in dt],
            "gtIgnore": gt_ig,
            "dtIgnore": dt_ig,
        }

    def accumulate(self):
        T, R = len(IOU_THRS), len(REC_THRS)
        K, A, M = len(self.cat_ids), len(AREA_RNG), len(MAX_DETS)
        precision = -np.ones((T, R, K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat_id in enumerate(self.cat_ids):
            for a, a_rng in enumerate(AREA_RNG):
                for m, max_det in enumerate(MAX_DETS):
                    E = [
                        self._evaluate_img(img_id, cat_id, a_rng, max_det)
                        for img_id in self.img_ids
                    ]
                    E = [e for e in E if e is not None]
                    if len(E) == 0:
                        continue
                    dt_scores = np.concatenate([e["dtScores"][0:max_det] for e in E])
                    inds = np.argsort(-dt_scores, kind="mergesort")
                    dtm = np.concatenate(
                        [e["dtMatches"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    dt_ig = np.concatenate(
                        [e["dtIgnore"][:, 0:max_det] for e in E], axis=1
                    )[:, inds]
                    gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                    npig = np.count_nonzero(gt_ig == 0)
                    if npig == 0:
                        continue
                    tps = np.logical_and(dtm, np.logical_not(dt_ig))
                    fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
                    tp_sum = np.cumsum(tps, axis=1).astype(float)
                    fp_sum = np.cumsum(fps, axis=1).astype(float)
                    for t, (tp, fp) in enumerate(zip(tp_sum, fp_sum)):
                        nd = len(tp)
                        rc = tp / npig
                        pr = tp / (fp + tp + np.spacing(1))
                        q = np.zeros((R,))
                        recall[t, k, a, m] = rc[-1] if nd else 0
                        pr = pr.tolist()
                        q = q.tolist()
                        for i in range(nd - 1, 0, -1):
                            if pr[i] > pr[i - 1]:
                                pr[i - 1] = pr[i]
                        inds2 = np.searchsorted(rc, REC_THRS, side="left")
                        try:
                            for ri, pi in enumerate(inds2):
                                q[ri] = pr[pi]
                        except Exception:
                            pass
                        precision[t, :, k, a, m] = np.array(q)
        self.precision = precision
        self.recall = recall

    def summarize(self):
        def _s(ap=1, iouThr=None, areaRng=0, maxDets=100):
            m = MAX_DETS.index(maxDets)
            if ap == 1:
                s = self.precision[:, :, :, areaRng, m]
                if iouThr is not None:
                    t = int(np.where(np.isclose(IOU_THRS, iouThr))[0][0])
                    s = s[t : t + 1]
            else:
                s = self.recall[:, :, areaRng, m]
                if iouThr is not None:
                    t = int(np.where(np.isclose(IOU_THRS, iouThr))[0][0])
                    s = s[t : t + 1]
            vals = s[s > -1]
            return float(vals.mean()) if vals.size else -1.0

        return {
            "AP": _s(),
            "AP50": _s(iouThr=0.5),
            "AP75": _s(iouThr=0.75),
            "AP_small": _s(areaRng=1),
            "AP_medium": _s(areaRng=2),
            "AP_large": _s(areaRng=3),
            "AR1": _s(ap=0, maxDets=1),
            "AR10": _s(ap=0, maxDets=10),
            "AR100": _s(ap=0, maxDets=100),
            "AR_small": _s(ap=0, areaRng=1),
            "AR_medium": _s(ap=0, areaRng=2),
            "AR_large": _s(ap=0, areaRng=3),
        }
