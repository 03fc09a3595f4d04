"""Evaluation metrics as partial (per-row) counts + driver-side finalization.

Reimplements the reference's aggregation semantics:
- recognition metrics ``eval_ocr_metric`` / ``count_matches``
  (``mmocr/core/evaluation/ocr_metric.py:28-133``): word accuracy at three
  normalization levels, char recall/precision via longest-common-subsequence
  matching, and 1 - normalized edit distance;
- detection metric ``eval_hmean_iou`` (``mmocr/core/evaluation/hmean_iou.py:
  7-116``): per-image greedy 1:1 IoU>=0.5 matching, dataset-level
  recall/precision/hmean from summed counts.

Everything per-row is embarrassingly parallel (map_batches); only small count
sums cross the wire (partial aggregation pattern).
"""
from __future__ import annotations

import re
from difflib import SequenceMatcher

import numpy as np

from .geometry import poly_iou

_NORM_RE = re.compile(r"[^A-Za-z0-9一-鿿]")


def _lcs_len(a: str, b: str) -> int:
    """Matched-char count a la difflib SequenceMatcher (reference uses
    ``SequenceMatcher`` matching blocks, ``ocr_metric.py:60-66``)."""
    return sum(m.size for m in SequenceMatcher(None, a, b).get_matching_blocks())


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, numpy DP (rapidfuzz stand-in)."""
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = np.arange(len(b) + 1)
    for i, ca in enumerate(a, 1):
        cur = np.empty(len(b) + 1, dtype=np.int64)
        cur[0] = i
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
        prev = cur
    return int(prev[-1])


def ocr_row_counts(pred: str, gt: str) -> dict:
    """Per-row partial counts for recognition metrics (``count_matches``).

    Three normalization levels: exact; ignore-case; ignore-case-and-symbol
    (strip non-alnum/CJK, ``ocr_metric.py:49-59``).
    """
    gt_lc, pred_lc = gt.lower(), pred.lower()
    gt_ics = _NORM_RE.sub("", gt_lc)
    pred_ics = _NORM_RE.sub("", pred_lc)
    norm_ed = (
        edit_distance(pred_ics, gt_ics) / max(len(gt_ics), len(pred_ics), 1)
        if (gt_ics or pred_ics)
        else 0.0
    )
    return {
        "match": int(pred == gt),
        "match_ignore_case": int(pred_lc == gt_lc),
        "match_ignore_case_symbol": int(pred_ics == gt_ics),
        "true_positive_char": _lcs_len(pred_ics, gt_ics),
        "gt_char": len(gt_ics),
        "pred_char": len(pred_ics),
        "norm_ed": norm_ed,
        "count": 1,
    }


def ocr_finalize(sums: dict, rounder=round) -> dict:
    """Dataset-level recognition metrics from summed partial counts
    (``ocr_metric.py:83-133``).  ``rounder`` lets oracle-checked callers
    substitute DuckDB-compatible half-away rounding (num.round_away_scalar)
    for Python's banker's round."""
    n = max(sums["count"], 1)
    return {
        "word_acc": rounder(sums["match"] / n, 4),
        "word_acc_ignore_case": rounder(sums["match_ignore_case"] / n, 4),
        "word_acc_ignore_case_symbol": rounder(sums["match_ignore_case_symbol"] / n, 4),
        "char_recall": rounder(sums["true_positive_char"] / max(sums["gt_char"], 1), 4),
        "char_precision": rounder(
            sums["true_positive_char"] / max(sums["pred_char"], 1), 4
        ),
        "1-N.E.D": rounder(1.0 - sums["norm_ed"] / n, 4),
    }


def hmean_iou_row_counts(
    pred_polys: list[list[float]], gt_polys: list[list[float]], iou_thr: float = 0.5
) -> dict:
    """Per-image greedy 1:1 matching counts (``hmean_iou.py:7-116``):
    each gt matched to at most one pred with IoU >= thr, greedy in
    (gt index, pred index) order."""
    matched_pred: set[int] = set()
    hits = 0
    for g in gt_polys:
        for pi, p in enumerate(pred_polys):
            if pi in matched_pred:
                continue
            if poly_iou(g, p) >= iou_thr:
                matched_pred.add(pi)
                hits += 1
                break
    return {"match": hits, "gt": len(gt_polys), "pred": len(pred_polys)}


def hmean_finalize(sums: dict, rounder=round) -> dict:
    recall = sums["match"] / max(sums["gt"], 1)
    precision = sums["match"] / max(sums["pred"], 1)
    h = (
        2 * recall * precision / (recall + precision)
        if (recall + precision) > 0
        else 0.0
    )
    return {
        "recall": rounder(recall, 4),
        "precision": rounder(precision, 4),
        "hmean": rounder(h, 4),
    }


def _centroid(poly: np.ndarray) -> np.ndarray:
    return poly.reshape(-1, 2).mean(axis=0)


def _box_diag(poly: np.ndarray) -> float:
    p = poly.reshape(-1, 2)
    return float(np.linalg.norm(p[0] - p[2]))


def hmean_ic13_row_counts(
    pred_polys: list[list[float]],
    gt_polys: list[list[float]],
    gt_ignored_polys: list[list[float]] | None = None,
    precision_thr: float = 0.4,
    recall_thr: float = 0.8,
    center_dist_thr: float = 1.0,
    one2one_score: float = 1.0,
    one2many_score: float = 0.8,
    many2one_score: float = 1.0,
) -> dict:
    """Per-image ICDAR2013 matching counts (``mmocr/core/evaluation/
    hmean_ic13.py:46-216`` + ``utils.py:211-349`` semantics): area-recall /
    area-precision matrices, then one2one (with normalized center-distance
    gate), one2many (score 0.8) and many2one matching passes, in that order,
    each consuming unmatched boxes. Predictions overlapping an ignored gt
    with precision > thr are ignored (``utils.py:7-54``)."""
    from .geometry import poly_intersection_area, polygon_area

    gt_ignored_polys = gt_ignored_polys or []
    care_gt_num = len(gt_polys)
    all_gt = [np.asarray(g, dtype=np.float64) for g in gt_polys] + [
        np.asarray(g, dtype=np.float64) for g in gt_ignored_polys
    ]
    gt_ignored_idx = set(range(care_gt_num, len(all_gt)))
    preds = [np.asarray(p, dtype=np.float64) for p in pred_polys]

    # ignore predictions that hit any ignored gt
    pred_ignored_idx: set[int] = set()
    for pi, p in enumerate(preds):
        area = polygon_area(p.reshape(-1, 2))
        for gi in gt_ignored_idx:
            inter = poly_intersection_area(p, all_gt[gi])
            prec = 0.0 if area == 0 else inter / area
            if prec > precision_thr:
                pred_ignored_idx.add(pi)
                break

    gt_num, pred_num = len(all_gt), len(preds)
    accum_recall = accum_precision = 0.0
    if gt_num and pred_num:
        recall_mat = np.zeros((gt_num, pred_num))
        precision_mat = np.zeros((gt_num, pred_num))
        for gi, g in enumerate(all_gt):
            g_area = polygon_area(g.reshape(-1, 2))
            for pi, p in enumerate(preds):
                inter = poly_intersection_area(g, p)
                p_area = polygon_area(p.reshape(-1, 2))
                if g_area:
                    recall_mat[gi, pi] = inter / g_area
                if p_area:
                    precision_mat[gi, pi] = inter / p_area

        gt_hit = np.zeros(gt_num, dtype=bool)
        pred_hit = np.zeros(pred_num, dtype=bool)
        above = (recall_mat > recall_thr) & (precision_mat > precision_thr)
        # pass 1: one-to-one (exactly one qualifying pair in row AND column)
        for gi in range(gt_num):
            for pi in range(pred_num):
                if (
                    gt_hit[gi] or pred_hit[pi]
                    or gi in gt_ignored_idx or pi in pred_ignored_idx
                ):
                    continue
                if (
                    above[gi].sum() == 1
                    and above[:, pi].sum() == 1
                    and above[gi, pi]
                ):
                    d = np.linalg.norm(_centroid(all_gt[gi]) - _centroid(preds[pi]))
                    denom = _box_diag(all_gt[gi]) + _box_diag(preds[pi])
                    if denom and 2.0 * d / denom < center_dist_thr:
                        gt_hit[gi] = pred_hit[pi] = True
                        accum_recall += one2one_score
                        accum_precision += one2one_score
        # pass 2: one gt to many preds (precision >= thr each, recalls sum)
        for gi in range(gt_num):
            if gi in gt_ignored_idx or gt_hit[gi]:
                continue
            cand = [
                pi
                for pi in range(pred_num)
                if not pred_hit[pi]
                and pi not in pred_ignored_idx
                and precision_mat[gi, pi] >= precision_thr
            ]
            if cand and recall_mat[gi, cand].sum() >= recall_thr:
                gt_hit[gi] = True
                pred_hit[cand] = True
                accum_recall += one2many_score
                accum_precision += one2many_score * len(cand)
        # pass 3: many gts to one pred (recall >= thr each, precisions sum)
        for pi in range(pred_num):
            if pi in pred_ignored_idx or pred_hit[pi]:
                continue
            cand = [
                gi
                for gi in range(gt_num)
                if not gt_hit[gi]
                and gi not in gt_ignored_idx
                and recall_mat[gi, pi] >= recall_thr
            ]
            if cand and precision_mat[cand, pi].sum() >= precision_thr:
                pred_hit[pi] = True
                gt_hit[cand] = True
                accum_recall += many2one_score * len(cand)
                accum_precision += many2one_score
    return {
        "hit_recall": accum_recall,
        "hit_precision": accum_precision,
        "gt_care": care_gt_num,
        "pred_care": pred_num - len(pred_ignored_idx),
    }


def hmean_ic13_finalize(sums: dict, rounder=round) -> dict:
    """Dataset-level IC13 recall/precision/hmean from summed per-image counts
    (``utils.py:56-95`` compute_hmean semantics, incl. the gt_num==0 edge)."""
    gt_num = int(sums["gt_care"])
    pred_num = int(sums["pred_care"])
    if gt_num == 0:
        recall = 1.0
        precision = 0.0 if pred_num > 0 else 1.0
    else:
        recall = float(sums["hit_recall"]) / gt_num
        precision = (
            0.0 if pred_num == 0 else float(sums["hit_precision"]) / pred_num
        )
    denom = recall + precision
    hmean = 0.0 if denom == 0 else 2.0 * precision * recall / denom
    return {
        "recall": rounder(recall, 4),
        "precision": rounder(precision, 4),
        "hmean": rounder(hmean, 4),
    }


def confusion_counts(preds, gts, n_classes: int) -> np.ndarray:
    """Per-row-partial confusion matrix via bincount
    (``compute_f1_score``, ``mmocr/core/evaluation/kie_metric.py:5-29``)."""
    p = np.asarray(preds, dtype=np.int64)
    g = np.asarray(gts, dtype=np.int64)
    return np.bincount(
        g * n_classes + p, minlength=n_classes * n_classes
    ).reshape(n_classes, n_classes)


def macro_f1(confusion: np.ndarray, ignore: tuple[int, ...] = ()) -> float:
    """Macro-averaged F1 over classes from a summed confusion matrix."""
    n = confusion.shape[0]
    f1s = []
    for c in range(n):
        if c in ignore:
            continue
        tp = confusion[c, c]
        fp = confusion[:, c].sum() - tp
        fn = confusion[c, :].sum() - tp
        denom = 2 * tp + fp + fn
        f1s.append(2 * tp / denom if denom else 0.0)
    return round(float(np.mean(f1s)) if f1s else 0.0, 4)
