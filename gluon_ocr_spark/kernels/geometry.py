"""Polygon geometry + NMS kernels (SURVEY §2.4 D3, D12, D13, D16).

Original NumPy implementations of the geometric operators the
reference builds on shapely/cv2 (neither is available here, and the
engine only needs convex quads):

* shoelace area, Sutherland–Hodgman convex clipping → exact
  intersection / union / IoU for convex polygons
  (reference semantics: ``gluonocr/utils/locality_aware_nms.py:8-24``);
* canonical corner ordering TL,TR,BR,BL
  (``gluonocr/post_process/db_postprocess.py:128-148``);
* standard greedy NMS (``locality_aware_nms.py:54-68``);
* locality-aware NMS: row-scan score-weighted merge then standard NMS
  (``locality_aware_nms.py:45-51,172-192``) — an order-dependent fold,
  so the engine runs it per-document inside the UDF, never across
  partitions.

These are per-document library kernels: a page has O(10–100) regions,
so the O(n²) NMS is trivially cheap inside a UDF and never shuffles.
"""

from __future__ import annotations

import numpy as np


def polygon_area(poly: np.ndarray) -> float:
    """Shoelace area (absolute)."""
    p = np.asarray(poly, dtype=np.float64)
    x, y = p[:, 0], p[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))) / 2.0


def clip_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip `subject` polygon by convex `clip`.

    Exact for the convex quads the detection pipeline produces."""
    def is_inside(pt, a, b):
        return (b[0] - a[0]) * (pt[1] - a[1]) - (b[1] - a[1]) * (pt[0] - a[0]) >= 0

    def line_intersect(p1, p2, a, b):
        s = np.array(p2) - np.array(p1)
        d = np.array(b) - np.array(a)
        denom = s[0] * d[1] - s[1] * d[0]
        if denom == 0:
            return p2
        t = ((a[0] - p1[0]) * d[1] - (a[1] - p1[1]) * d[0]) / denom
        return [p1[0] + t * s[0], p1[1] + t * s[1]]

    clip = _ccw(np.asarray(clip, dtype=np.float64))
    output = [list(p) for p in np.asarray(subject, dtype=np.float64)]
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        inputs, output = output, []
        if not inputs:
            break
        prev = inputs[-1]
        for cur in inputs:
            if is_inside(cur, a, b):
                if not is_inside(prev, a, b):
                    output.append(line_intersect(prev, cur, a, b))
                output.append(cur)
            elif is_inside(prev, a, b):
                output.append(line_intersect(prev, cur, a, b))
            prev = cur
    return np.array(output, dtype=np.float64) if output else np.empty((0, 2))


def _ccw(poly: np.ndarray) -> np.ndarray:
    """Ensure counter-clockwise orientation (signed shoelace > 0)."""
    x, y = poly[:, 0], poly[:, 1]
    signed = (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) / 2.0
    return poly if signed >= 0 else poly[::-1]


def intersection_area(p: np.ndarray, q: np.ndarray) -> float:
    clipped = clip_convex(p, q)
    return polygon_area(clipped) if len(clipped) >= 3 else 0.0


def iou(p: np.ndarray, q: np.ndarray) -> float:
    """IoU of two convex polygons (reference `intersection`,
    locality_aware_nms.py:8-24)."""
    inter = intersection_area(p, q)
    union = polygon_area(p) + polygon_area(q) - inter
    return inter / union if union > 0 else 0.0


def order_points(pts: np.ndarray) -> np.ndarray:
    """Canonical TL,TR,BR,BL corner order (db_postprocess.py:128-148
    semantics): sort by x; within the left / right pairs the smaller y
    is the top corner."""
    p = np.asarray(pts, dtype=np.float64)
    xs = np.lexsort((p[:, 1], p[:, 0]))  # by x, tie-break y
    left, right = p[xs[:2]], p[xs[2:]]
    tl, bl = left[np.argsort(left[:, 1])]
    tr, br = right[np.argsort(right[:, 1])]
    return np.array([tl, tr, br, bl])


def _boxes_scores(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    a = np.asarray(arr, dtype=np.float64)
    return a[:, :8].reshape(-1, 4, 2), a[:, 8]


def standard_nms(boxes: np.ndarray, thresh: float = 0.3) -> list[int]:
    """Greedy score-descending suppression; returns kept row indices
    (reference standard_nms_inds, locality_aware_nms.py:71-85)."""
    if len(boxes) == 0:
        return []
    quads, scores = _boxes_scores(boxes)
    order = np.argsort(scores)[::-1]
    keep: list[int] = []
    while order.size > 0:
        i = int(order[0])
        keep.append(i)
        rest = order[1:]
        ious = np.array([iou(quads[i], quads[j]) for j in rest])
        order = rest[ious <= thresh] if rest.size else rest
    return keep


def weighted_merge(g: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Score-weighted coordinate average; scores add
    (locality_aware_nms.py:45-51)."""
    out = g.astype(np.float64).copy()
    out[:8] = (g[8] * g[:8] + p[8] * p[:8]) / (g[8] + p[8])
    out[8] = g[8] + p[8]
    return out


def locality_aware_nms(polys: np.ndarray, thresh: float = 0.3) -> np.ndarray:
    """Row-scan merge of overlapping neighbors, then standard NMS
    (nms_locality, locality_aware_nms.py:172-192). Input N×9
    (8 coords + score), assumed already in row-scan order."""
    merged: list[np.ndarray] = []
    cur: np.ndarray | None = None
    for g in np.asarray(polys, dtype=np.float64):
        if cur is not None and iou(g[:8].reshape(4, 2), cur[:8].reshape(4, 2)) > thresh:
            cur = weighted_merge(g, cur)
        else:
            if cur is not None:
                merged.append(cur)
            cur = g.copy()
    if cur is not None:
        merged.append(cur)
    if not merged:
        return np.empty((0, 9))
    arr = np.array(merged)
    return arr[standard_nms(arr, thresh)]


def soft_nms(
    boxes_in: np.ndarray,
    nt_thresh: float = 0.3,
    threshold: float = 0.8,
    sigma: float = 0.5,
    method: int = 2,
) -> np.ndarray:
    """Soft-NMS over N×9 (8 coords + score) boxes — semantics of the
    reference ``soft_nms`` (locality_aware_nms.py:105-169): greedy
    max-score selection with in-place swap; every remaining
    overlapping box's score decays by ``1 − iou`` (linear, method 1,
    only past ``nt_thresh``), ``exp(−iou²/σ)`` (gaussian, method 2),
    or a hard 0/1 cut (otherwise); boxes falling below ``threshold``
    are discarded by swap-with-last."""
    boxes = np.asarray(boxes_in, dtype=np.float64).copy()
    n = boxes.shape[0]
    if n < 1:
        return np.empty((0, 9))
    i = 0
    while i < n:
        maxpos = i + int(np.argmax(boxes[i:n, 8]))
        boxes[[i, maxpos]] = boxes[[maxpos, i]]
        tquad = boxes[i, :8].reshape(4, 2)
        pos = i + 1
        while pos < n:
            v = iou(tquad, boxes[pos, :8].reshape(4, 2))
            if v > 0:
                if method == 1:
                    weight = 1 - v if v > nt_thresh else 1.0
                elif method == 2:
                    weight = float(np.exp(-(v * v) / sigma))
                else:
                    weight = 0.0 if v > nt_thresh else 1.0
                boxes[pos, 8] *= weight
                if boxes[pos, 8] < threshold:
                    boxes[pos] = boxes[n - 1]
                    n -= 1
                    pos -= 1
            pos += 1
        i += 1
    return boxes[:n]
