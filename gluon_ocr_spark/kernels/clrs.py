"""CLRS corner-to-box post-process (SURVEY §2.4 D17) — cv2-free.

Semantics of ``gluonocr/post_process/clrs_postprocess.py:12-158``:
corner detections (4 classes: TL/TR/BR/BL center+size boxes) are
paired along each of the four box edges into candidate quads
(``gen_box`` modes 0-3), every candidate is scored by its four
position-sensitive QUADRANT masks against the 4-channel segmentation
map (any quadrant mean < 0.2 kills the box), survivors above
``seg_thresh`` go through standard NMS at ``box_thresh`` and are
rescaled.

Deviation (documented): the reference's mode-2 (left edge) angle is
``atan2(dy, c1x − c1x)`` — a constant zero denominator that collapses
every left-edge pairing to a vertical normal regardless of corner
geometry (clrs_postprocess.py:108; upstream corner/eval_all.py has the
same typo). This port uses the evidently intended ``c2x − c1x``, like
the other three modes. Not replicating the bug, per the engine's T2
precedent (COVERAGE §2.6).
"""

from __future__ import annotations

import math

import numpy as np

from .geometry import standard_nms
from .raster import fill_poly_mask

__all__ = ["corner2center", "gen_box", "clrs_scores", "clrs_boxes", "get_tight_rect", "clrs_targets"]


def corner2center(boxes: np.ndarray) -> np.ndarray:
    """(x1,y1,x2,y2) corner boxes → (cx, cy, w, h)."""
    b = np.asarray(boxes, dtype=np.float64)
    return np.stack(
        [(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2, b[:, 2] - b[:, 0], b[:, 3] - b[:, 1]],
        axis=-1,
    )


def _edge_len(x1, y1, x2, y2) -> float:
    return math.sqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)


def _is_right_box(box: list[float]) -> bool:
    e = [
        _edge_len(box[0], box[1], box[2], box[3]),
        _edge_len(box[2], box[3], box[4], box[5]),
        _edge_len(box[4], box[5], box[6], box[7]),
        _edge_len(box[6], box[7], box[0], box[1]),
    ]
    return all(v > 5 for v in e)


def gen_box(corner1: np.ndarray, corner2: np.ndarray, mode: int) -> list[list[float]]:
    """Pair corners of two classes along one edge into candidate quads
    (clrs_postprocess.py:69-122). Corners are (cx, cy, w, h) rows;
    pairing requires left-to-right order, sizes > 5 and size ratio
    < 1.5; the opposite edge is extrapolated at the mean corner size
    along the edge normal."""
    out: list[list[float]] = []

    def get_point(x1, y1, x2, y2, theta, side):
        return (
            x1 + math.cos(theta) * side,
            y1 + math.sin(theta) * side,
            x2 + math.cos(theta) * side,
            y2 + math.sin(theta) * side,
        )

    for c1 in corner1:
        for c2 in corner2:
            rat = max(c1[2], c2[2]) / min(c1[2], c2[2]) if min(c1[2], c2[2]) > 0 else np.inf
            if not (c1[0] < c2[0] and c1[2] > 5 and c2[2] > 5 and rat < 1.5):
                continue
            side = (c1[2] + c2[2]) / 2.0
            if mode == 0:  # top edge TL→TR, extrapolate downward
                theta = math.atan2(c2[1] - c1[1], c2[0] - c1[0]) + math.pi / 2
                x3, y3, x4, y4 = get_point(c2[0], c2[1], c1[0], c1[1], theta, side)
                box = [c1[0], c1[1], c2[0], c2[1], x3, y3, x4, y4]
            elif mode == 1:  # bottom edge BL→BR, extrapolate upward
                theta = math.atan2(c2[1] - c1[1], c2[0] - c1[0]) - math.pi / 2
                x2, y2, x1, y1 = get_point(c2[0], c2[1], c1[0], c1[1], theta, side)
                box = [x1, y1, x2, y2, c2[0], c2[1], c1[0], c1[1]]
            elif mode == 2:  # left edge TL→BL (reference typo fixed, see module doc)
                theta = math.atan2(c2[1] - c1[1], c2[0] - c1[0]) - math.pi / 2
                x3, y3, x2, y2 = get_point(c2[0], c2[1], c1[0], c1[1], theta, side)
                box = [c1[0], c1[1], x2, y2, x3, y3, c2[0], c2[1]]
            else:  # right edge TR→BR
                theta = math.atan2(c2[1] - c1[1], c2[0] - c1[0]) + math.pi / 2
                x4, y4, x1, y1 = get_point(c2[0], c2[1], c1[0], c1[1], theta, side)
                box = [x1, y1, c1[0], c1[1], c2[0], c2[1], x4, y4]
            if _is_right_box(box):
                out.append(box)
    return out


def clrs_scores(boxes: list[list[float]], seg_maps: np.ndarray) -> list[float]:
    """Position-sensitive scoring (clrs_postprocess.py:24-67): split
    each quad into TL/TR/BR/BL quadrant sub-quads via edge midpoints +
    centroid, score quadrant j against seg channel j; any quadrant
    mean < 0.2 zeroes the box, else score = mean of the four."""
    c, h, w = seg_maps.shape
    if not boxes:
        return []
    b = np.asarray(boxes, dtype=np.int32).astype(np.float64)
    b[:, ::2] = np.clip(b[:, ::2], 0, w)
    b[:, 1::2] = np.clip(b[:, 1::2], 0, h)
    c1 = np.stack([(b[:, 0] + b[:, 2]) / 2, (b[:, 1] + b[:, 3]) / 2], axis=1)
    c2 = np.stack([(b[:, 2] + b[:, 4]) / 2, (b[:, 3] + b[:, 5]) / 2], axis=1)
    c3 = np.stack([(b[:, 4] + b[:, 6]) / 2, (b[:, 5] + b[:, 7]) / 2], axis=1)
    c4 = np.stack([(b[:, 6] + b[:, 0]) / 2, (b[:, 7] + b[:, 1]) / 2], axis=1)
    ctr = np.stack([b[:, 0::2].mean(axis=1), b[:, 1::2].mean(axis=1)], axis=1)
    scores: list[float] = []
    for i in range(len(b)):
        pts = b[i].reshape(4, 2)
        min_x, max_x = int(pts[:, 0].min()), int(pts[:, 0].max())
        min_y, max_y = int(pts[:, 1].min()), int(pts[:, 1].max())
        if max_x - min_x < 4 or max_y - min_y < 4:
            scores.append(0.0)
            continue
        quads = [
            np.array([pts[0], c1[i], ctr[i], c4[i]]),
            np.array([c1[i], pts[1], c2[i], ctr[i]]),
            np.array([ctr[i], c2[i], pts[2], c3[i]]),
            np.array([c4[i], ctr[i], c3[i], pts[3]]),
        ]
        off = np.array([min_x, min_y], dtype=np.float64)
        score = 0.0
        for j in range(4):
            mask = fill_poly_mask((max_y - min_y, max_x - min_x), np.floor(quads[j]) - off)
            s = (mask * seg_maps[j, min_y:max_y, min_x:max_x]).sum() / (mask.sum() + 1)
            if s < 0.2:
                score = 0.0
                break
            score += s
        scores.append(score / 4.0)
    return scores


def clrs_boxes(
    ids: np.ndarray,
    boxes: np.ndarray,
    seg_maps: np.ndarray,
    ratio: float = 1.0,
    seg_thresh: float = 0.3,
    box_thresh: float = 0.6,
) -> np.ndarray:
    """Full D17 chain (clrs_postprocess.py:124-158): split corner
    detections by class, pair along the four edges, quadrant-score,
    threshold, standard-NMS, rescale. Returns (k, 4, 2)."""
    height, width = seg_maps.shape[1:3]
    centers = corner2center(boxes)
    ids = np.asarray(ids)
    groups = [centers[ids[:, 0] == k, :] for k in range(4)]
    if any(len(g) == 0 for g in groups):
        return np.empty((0, 4, 2))
    tls, trs, brs, bls = groups
    cand = (
        gen_box(tls, trs, 0) + gen_box(bls, brs, 1) + gen_box(tls, bls, 2) + gen_box(trs, brs, 3)
    )
    scores = clrs_scores(cand, seg_maps)
    keep = [c + [s] for c, s in zip(cand, scores) if s > seg_thresh]
    if not keep:
        return np.empty((0, 4, 2))
    arr = np.array(keep, dtype=np.float64)
    kept = arr[standard_nms(arr, box_thresh)]
    out = kept[:, :8].reshape(-1, 4, 2)
    out[:, :, 0] = np.clip(np.round(out[:, :, 0] * ratio), 0, width * ratio)
    out[:, :, 1] = np.clip(np.round(out[:, :, 1] * ratio), 0, height * ratio)
    return out


def get_tight_rect(points: np.ndarray) -> list[float]:
    """Min-area rect of a polygon, corners in TL,TR,BR,BL order —
    reference get_tight_rect (detect_dataset.py:280-308), built on the
    cv2-free min_area_rect + the x-sort/y-pair ordering rule."""
    from .geometry import order_points
    from .raster import min_area_rect

    corners, _ = min_area_rect(np.asarray(points, dtype=np.float64))
    return order_points(corners).reshape(8).tolist()


def clrs_targets(
    polygons: list[np.ndarray],
    ignore_tags: list[bool],
    img_size: tuple[int, int] = (512, 512),
    min_text_size: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """G6 geometric target generation (detect_dataset.py:310-358,
    gen_gt): per text polygon, the tight rect's four corners become
    four h-sized corner DETECTION boxes (class 0-3, h = mean of the
    opposite-edge pairs), and the four position-sensitive quadrant
    masks (midpoints + centroid) rasterize into the 4-channel seg gt;
    small/ignored texts zero the care mask. Returns (boxes (k,5:
    x1,y1,x2,y2,cls), seg_gt (4,H,W), mask (H,W)).

    The learning-side SSD anchor matching (CLRSTrainTransform,
    gluoncv-bound) stays out of slice; these geometric targets are the
    data-processing half — and the exact inverse of clrs_boxes (D17),
    which the round-trip test exploits."""
    import math

    from .raster import fill_poly_mask

    h_img, w_img = img_size
    boxes: list[np.ndarray] = []
    seg_gt = np.zeros((4, h_img, w_img), dtype=np.uint8)
    mask = np.ones((h_img, w_img), dtype=np.uint8)
    for polygon, ignored in zip(polygons, ignore_tags):
        p = np.asarray(polygon, dtype=np.float64).copy()
        p[:, 0] = np.clip(p[:, 0], 0, w_img)
        p[:, 1] = np.clip(p[:, 1], 0, h_img)
        x1, y1, x2, y2, x3, y3, x4, y4 = get_tight_rect(p)
        side1 = math.dist((x1, y1), (x2, y2))
        side2 = math.dist((x2, y2), (x3, y3))
        side3 = math.dist((x3, y3), (x4, y4))
        side4 = math.dist((x4, y4), (x1, y1))
        h = min(side1 + side3, side2 + side4) / 2.0
        if h < min_text_size or ignored:
            mask[fill_poly_mask((h_img, w_img), p)] = 0
            continue
        for k, (cx, cy) in enumerate(((x1, y1), (x2, y2), (x3, y3), (x4, y4))):
            boxes.append(np.array([cx - h / 2, cy - h / 2, cx + h / 2, cy + h / 2, k]))
        c1 = ((x1 + x2) / 2, (y1 + y2) / 2)
        c2 = ((x2 + x3) / 2, (y2 + y3) / 2)
        c3 = ((x3 + x4) / 2, (y3 + y4) / 2)
        c4 = ((x4 + x1) / 2, (y4 + y1) / 2)
        ctr = ((x1 + x2 + x3 + x4) / 4, (y1 + y2 + y3 + y4) / 4)
        quadrants = (
            ((x1, y1), c1, ctr, c4),
            (c1, (x2, y2), c2, ctr),
            (ctr, c2, (x3, y3), c3),
            (c4, ctr, c3, (x4, y4)),
        )
        for j, quad in enumerate(quadrants):
            seg_gt[j][fill_poly_mask((h_img, w_img), np.floor(np.array(quad)))] = 1
    if not boxes:
        return np.array([[-1, -1, -1, -1, -1]], dtype=np.float64), seg_gt, mask
    return np.array(boxes, dtype=np.float64), seg_gt, mask
