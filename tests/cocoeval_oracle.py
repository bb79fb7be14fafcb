"""Test oracle: faithful transcription of the pycocotools COCOeval
keypoints protocol (xtcocotools/cocoeval.py semantics, as used by the
reference at /root/reference/utils/metrics.py:145-206).

pycocotools is not installable in this environment, so this module
re-states the published algorithm in its original per-image, id-matching,
dict-based form — deliberately structured like upstream (and unlike the
vectorized evaluator in eval/coco_eval.py) so the two implementations are
independent: loadRes-style detection areas, crowd rematching via gt ids,
per-threshold greedy matching, mergesort-stable score ordering, 101-point
interpolated precision.

Used by tests/test_coco_eval_golden.py to pin golden AP/AR vectors.
"""

from __future__ import annotations

import copy

import numpy as np

IOU_THRS = np.linspace(
    0.5, 0.95, int(np.round((0.95 - 0.5) / 0.05)) + 1)
REC_THRS = np.linspace(0.0, 1.00, int(np.round((1.00 - 0.0) / 0.01)) + 1)
AREA_RNG = [[0.0, 1e5**2], [32**2, 96**2], [96**2, 1e5**2]]
AREA_LBL = ["all", "medium", "large"]
MAX_DET = 20


def _load_res(predictions):
    """pycocotools COCO.loadRes semantics for keypoint results: assign id,
    and area/bbox from the tight extent over ALL predicted keypoints."""
    dts = []
    for i, p in enumerate(predictions):
        kp = np.asarray(p["keypoints"], np.float64).reshape(-1, 3)
        x, y = kp[:, 0], kp[:, 1]
        x0, x1, y0, y1 = x.min(), x.max(), y.min(), y.max()
        dts.append({
            "id": i + 1,
            "image_id": p["image_id"],
            "keypoints": kp.reshape(-1).tolist(),
            "score": float(p["score"]),
            "area": float((x1 - x0) * (y1 - y0)),
            "bbox": [x0, y0, x1 - x0, y1 - y0],
        })
    return dts


def _compute_oks(gts, dts, sigmas):
    """COCOeval.computeOks, transcribed."""
    ious = np.zeros((len(dts), len(gts)))
    variances = (np.asarray(sigmas, np.float64) * 2) ** 2
    k = len(sigmas)
    for j, gt in enumerate(gts):
        g = np.asarray(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.asarray(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx, dy = xd - xg, yd - yg
            else:
                z = np.zeros(k)
                dx = np.max((z, x0 - xd), axis=0) + np.max((z, xd - x1),
                                                           axis=0)
                dy = np.max((z, y0 - yd), axis=0) + np.max((z, yd - y1),
                                                           axis=0)
            e = ((dx**2 + dy**2) / variances
                 / (gt["area"] + np.spacing(1)) / 2)
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0]
    return ious


def _evaluate_img(gts, dts, ious_full, a_rng):
    """COCOeval.evaluateImg, transcribed (keypoints: maxDet=20)."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    gts = copy.deepcopy(gts)
    for g in gts:
        if g["_ignore_base"] or (g["area"] < a_rng[0]
                                 or g["area"] > a_rng[1]):
            g["_ignore"] = 1
        else:
            g["_ignore"] = 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[0:MAX_DET]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious = (ious_full[:, gtind] if len(ious_full) > 0 else ious_full)

    T = len(IOU_THRS)
    G, D = len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious) != 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
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
                dtm[tind, dind] = gts[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array([d["area"] < a_rng[0] or d["area"] > a_rng[1]
                  for d in dts]).reshape((1, len(dts)))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def evaluate_oracle(gt_dataset, predictions, sigmas):
    """Full COCOeval keypoints run -> the 10 summarize() stats, named."""
    gts_by_img = {}
    for ann in gt_dataset["annotations"]:
        g = copy.deepcopy(ann)
        g["_ignore_base"] = int(bool(g.get("iscrowd", 0))
                                or g.get("num_keypoints", 0) == 0)
        gts_by_img.setdefault(ann["image_id"], []).append(g)
    dts_by_img = {}
    for d in _load_res(predictions):
        dts_by_img.setdefault(d["image_id"], []).append(d)

    img_ids = sorted({img["id"] for img in gt_dataset.get("images", [])}
                     | set(gts_by_img) | set(dts_by_img))

    # computeIoU: dts sorted by -score, capped to maxDet, BEFORE matching
    ious_by_img = {}
    capped_dts = {}
    for img_id in img_ids:
        gts = gts_by_img.get(img_id, [])
        dts = dts_by_img.get(img_id, [])
        inds = np.argsort([-d["score"] for d in dts], kind="mergesort")
        dts = [dts[i] for i in inds]
        if len(dts) > MAX_DET:
            dts = dts[0:MAX_DET]
        capped_dts[img_id] = dts
        ious_by_img[img_id] = (_compute_oks(gts, dts, sigmas)
                               if len(gts) and len(dts)
                               else np.zeros((len(dts), len(gts))))

    T, R = len(IOU_THRS), len(REC_THRS)
    A = len(AREA_RNG)
    precision = -np.ones((T, R, A))
    recall = -np.ones((T, A))
    for a_idx, a_rng in enumerate(AREA_RNG):
        E = [_evaluate_img(gts_by_img.get(i, []), dts_by_img.get(i, []),
                           ious_by_img[i], a_rng) for i in img_ids]
        E = [e for e in E if e is not None]
        if len(E) == 0:
            continue
        dt_scores = np.concatenate(
            [np.asarray(e["dtScores"])[0:MAX_DET] for e in E])
        inds = np.argsort(-dt_scores, kind="mergesort")
        dtm = np.concatenate([e["dtMatches"][:, 0:MAX_DET] for e in E],
                             axis=1)[:, inds]
        dt_ig = np.concatenate([e["dtIgnore"][:, 0:MAX_DET] for e in E],
                               axis=1)[:, inds]
        gt_ig = np.concatenate([e["gtIgnore"] for e in E])
        npig = np.count_nonzero(gt_ig == 0)
        if npig == 0:
            continue
        tps = np.logical_and(dtm, np.logical_not(dt_ig))
        fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
        tp_sum = np.cumsum(tps, axis=1).astype(dtype=np.float64)
        fp_sum = np.cumsum(fps, axis=1).astype(dtype=np.float64)
        for t in range(T):
            tp, fp = tp_sum[t], fp_sum[t]
            nd = len(tp)
            rc = tp / npig
            pr = tp / (fp + tp + np.spacing(1))
            q = np.zeros((R,))
            recall[t, a_idx] = rc[-1] if nd else 0
            pr = pr.tolist()
            q = q.tolist()
            for i in range(nd - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            inds2 = np.searchsorted(rc, REC_THRS, side="left")
            try:
                for ri, pi in enumerate(inds2):
                    q[ri] = pr[pi]
            except IndexError:
                pass
            precision[t, :, a_idx] = np.array(q)

    def _summ_p(a_idx, iou_thr=None):
        s = precision[:, :, a_idx]
        if iou_thr is not None:
            t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
            s = s[t]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    def _summ_r(a_idx, iou_thr=None):
        s = recall[:, a_idx]
        if iou_thr is not None:
            t = np.where(np.isclose(IOU_THRS, iou_thr))[0]
            s = s[t]
        s = s[s > -1]
        return float(np.mean(s)) if s.size else -1.0

    return {
        "AP": _summ_p(0), "AP50": _summ_p(0, 0.5), "AP75": _summ_p(0, 0.75),
        "AP_M": _summ_p(1), "AP_L": _summ_p(2),
        "AR": _summ_r(0), "AR50": _summ_r(0, 0.5), "AR75": _summ_r(0, 0.75),
        "AR_M": _summ_r(1), "AR_L": _summ_r(2),
    }
