"""Evaluation metrics (SURVEY §2.8 M1–M3) — original implementations
of the reference's notion of correctness.

* :func:`detection_eval` / :func:`combine_detection` — greedy 1-1
  IoU>0.5 matching with don't-care filtering, micro-averaged P/R/hmean
  (semantics of ``gluonocr/utils/detect_metric.py:12-195``).
* :func:`edit_distance` — Levenshtein DP (the reference uses the
  ``editdistance`` package; same function).
* :func:`recog_distance_eval` / :func:`combine_recog` — edit-distance
  based micro P/R/hmean (``gluonocr/utils/recog_metric.py:60-105``:
  correct = max(len) − dist).

Used driver-side in tests (collect + evaluate); fleet-level rollups
of per-doc metric columns are plain ``F.sum``/``F.avg`` aggregates.
"""

from __future__ import annotations

import numpy as np

from .geometry import intersection_area, iou, polygon_area


def detection_eval(
    gt_polys: list,
    pred_polys: list,
    ignore: list[bool] | None = None,
    iou_thresh: float = 0.5,
    area_precision_thresh: float = 0.5,
) -> dict:
    """Per-image greedy match. Returns the counters combine needs."""
    ignore = ignore or [False] * len(gt_polys)
    gts = [np.asarray(p, dtype=np.float64) for p in gt_polys]
    preds = [np.asarray(p, dtype=np.float64) for p in pred_polys]

    dont_care_gt = {i for i, ig in enumerate(ignore) if ig}
    # a prediction mostly inside a don't-care gt is itself don't-care
    dont_care_pred: set[int] = set()
    for j, pd in enumerate(preds):
        for i in dont_care_gt:
            a = polygon_area(pd)
            if a > 0 and intersection_area(gts[i], pd) / a > area_precision_thresh:
                dont_care_pred.add(j)
                break

    matched = 0
    gt_used = [False] * len(gts)
    pred_used = [False] * len(preds)
    pairs = []
    for i in range(len(gts)):
        for j in range(len(preds)):
            if gt_used[i] or pred_used[j] or i in dont_care_gt or j in dont_care_pred:
                continue
            if iou(preds[j], gts[i]) > iou_thresh:
                gt_used[i] = True
                pred_used[j] = True
                matched += 1
                pairs.append((i, j))

    gt_care = len(gts) - len(dont_care_gt)
    pred_care = len(preds) - len(dont_care_pred)
    if gt_care == 0:
        recall = 1.0
        precision = 0.0 if pred_care > 0 else 1.0
    else:
        recall = matched / gt_care
        precision = 0.0 if pred_care == 0 else matched / pred_care
    hmean = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {
        "matched": matched,
        "gt_care": gt_care,
        "pred_care": pred_care,
        "precision": precision,
        "recall": recall,
        "hmean": hmean,
        "pairs": pairs,
    }


def combine_detection(results: list[dict]) -> dict:
    """Micro-average across images (detect_metric.py combine_results)."""
    m = sum(r["matched"] for r in results)
    g = sum(r["gt_care"] for r in results)
    p = sum(r["pred_care"] for r in results)
    recall = 0.0 if g == 0 else m / g
    precision = 0.0 if p == 0 else m / p
    hmean = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "hmean": hmean}


def edit_distance(a: str, b: str) -> int:
    """Levenshtein distance, O(len(a)·len(b)) DP, O(min) memory.

    Quadratic: evaluate per LINE (the reference's per-crop granularity),
    never per multi-KB document — a 100 KB pair is ~10^10 cell updates."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def recog_distance_eval(gt_texts: list[str], pred_texts: list[str]) -> dict:
    """correct = max(len_gt, len_pred) − edit_distance, summed."""
    correct = pred_sum = gt_sum = 0
    for gt, pred in zip(gt_texts, pred_texts):
        d = edit_distance(gt, pred)
        correct += max(len(gt), len(pred)) - d
        pred_sum += len(pred)
        gt_sum += len(gt)
    precision = correct / pred_sum if pred_sum else 0.0
    recall = correct / gt_sum if gt_sum else 0.0
    hmean = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {
        "correct": correct,
        "pred_sum": pred_sum,
        "gt_sum": gt_sum,
        "precision": precision,
        "recall": recall,
        "hmean": hmean,
    }


def combine_recog(results: list[dict]) -> dict:
    c = sum(r["correct"] for r in results)
    p = sum(r["pred_sum"] for r in results)
    g = sum(r["gt_sum"] for r in results)
    precision = c / p if p else 0.0
    recall = c / g if g else 0.0
    hmean = 0.0 if precision + recall == 0 else 2 * precision * recall / (precision + recall)
    return {"precision": precision, "recall": recall, "hmean": hmean}


# ---------------------------------------------------------------------------
# M2: masked positional recognition accuracy
# (semantics of gluonocr/utils/recog_metric.py:8-42, RecogAccuracy)
# ---------------------------------------------------------------------------


def ctc_collapse_padded(preds: np.ndarray, blank: int, max_len: int = 100) -> np.ndarray:
    """Per-row greedy CTC collapse, -1-padded to ``max_len``.

    Reference ``RecogAccuracy.get_pred`` (recog_metric.py:13-26): keep
    frame j when it is not blank AND not equal to the RAW previous
    frame (repeat suppression happens before blank removal, the
    classic CTC rule)."""
    preds = np.asarray(preds)
    batch, seq_len = preds.shape[:2]
    out = -1 * np.ones((batch, max_len), dtype=np.int64)
    for i in range(batch):
        count = 0
        for j in range(seq_len):
            if count >= max_len:
                break
            if preds[i, j] != blank and not (j > 0 and preds[i, j - 1] == preds[i, j]):
                out[i, count] = preds[i, j]
                count += 1
    return out


def recog_accuracy(
    preds: np.ndarray,
    labels: np.ndarray,
    mask: np.ndarray,
    blank: int | None = None,
    eps: float = 1e-6,
) -> float:
    """Masked per-character positional accuracy, averaged over the
    batch (reference ``RecogAccuracy.update``, recog_metric.py:28-42).

    ``preds`` may be (batch, seq) class ids or (batch, seq, voc)
    scores (argmax taken); with ``blank`` set, predictions are
    CTC-collapsed first. Per row: sum((pred[:L] == label) * mask) /
    (sum(mask) + eps), L = label length; then mean over rows."""
    labels = np.asarray(labels).astype("int32")
    preds = np.asarray(preds)
    if preds.ndim != labels.ndim:
        preds = np.argmax(preds, axis=-1).astype("int32")
    mask = np.asarray(mask)
    seq_len = labels.shape[-1]
    if blank is not None:
        preds = ctc_collapse_padded(preds, blank)
    acc = preds[:, :seq_len] == labels
    per_row = np.sum(acc * mask, axis=-1) / (np.sum(mask, axis=-1) + eps)
    return float(np.mean(per_row))
