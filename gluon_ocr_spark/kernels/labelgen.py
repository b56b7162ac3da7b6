"""Training-label generation (SURVEY §2.7 G1/G2) — cv2/shapely/
pyclipper-free NumPy with the reference's semantics.

* :func:`make_shrink_map` — ``gluonocr/data/make_seg_data.py:14-119``
  (MakeShrinkMap): validate/clip polygons (outside-canvas → ignore,
  |area|<1 → ignore, positive signed area → reorder (0,3,2,1)),
  ignore small texts (min edge < min_text_size) by zeroing the mask,
  shrink each kept polygon inward by ``area·(1−r²)/perimeter``
  (r=0.4) and rasterize it into the gt map; optionally emit the EAST
  geometry map (8 per-pixel corner offsets + inverse-short-edge norm
  on channel 8, written over the SHRUNK region).
* :func:`make_border_map` — ``make_seg_data.py:121-230``
  (MakeBorderMap): pad each polygon outward by the same distance,
  write per-pixel ``1 − clip(min-edge-distance/d, 0, 1)`` into the
  canvas (max-combining overlaps), then normalize the whole canvas to
  ``[thresh_min, thresh_max]``; the mask marks padded regions.

The polygon offsets use :func:`raster.offset_convex` (miter) in place
of the pyclipper Vatti offset — identical on the convex quads label
generation consumes; a shrink that swallows the polygon returns None
exactly where pyclipper's ``Execute(-d)`` returns ``[]`` (same ignore
semantics). Point-to-edge distance reproduces the reference's
law-of-cosines formulation (make_seg_data.py:193-219) including its
endpoint fallback branch, so border maps match to float precision.
"""

from __future__ import annotations

import numpy as np

from .raster import fill_poly_mask, offset_convex

__all__ = ["validate_polygons", "make_shrink_map", "make_border_map"]


def _signed_area(p: np.ndarray) -> float:
    x, y = p[:, 0], p[:, 1]
    return float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) / 2.0


def _perimeter(p: np.ndarray) -> float:
    return float(np.linalg.norm(np.diff(np.vstack([p, p[:1]]), axis=0), axis=1).sum())


def _shrink_distance(p: np.ndarray, ratio: float) -> float:
    per = _perimeter(p)
    return abs(_signed_area(p)) * (1.0 - ratio**2) / per if per > 0 else 0.0


def validate_polygons(
    polygons: list[np.ndarray], ignore_tags: list[bool], h: int, w: int
) -> tuple[list[np.ndarray], list[bool]]:
    """Reference validate_polygons (make_seg_data.py:95-113): polygons
    fully outside the canvas → ignore; clip coords into the canvas;
    |area| < 1 → ignore; positive *reference-convention* area →
    reorder (0,3,2,1).

    The reference's polygon_area (make_seg_data.py:112-119) is the
    edge-sum ``Σ(x_{i+1}-x_i)(y_{i+1}+y_i)/2`` — the NEGATION of the
    standard shoelace :func:`_signed_area`.  A standard clockwise
    tl,tr,br,bl quad in image (y-down) coordinates has shoelace +A but
    reference area −A, so it is kept as-is; only reversed-wound quads
    trigger the (0,3,2,1) reorder.  (Round-2 shipped the test inverted
    — flagged by ADVICE r2 — which swapped geo_map corner channels
    2/3 and 6/7 for typical inputs; fixed and pinned by
    test_kernels_nets_raster.TestLabelGen winding tests.)"""
    polys = [np.asarray(p, dtype=np.float64).copy() for p in polygons]
    tags = list(ignore_tags)
    for i, p in enumerate(polys):
        if p[:, 0].max() < 0 or p[:, 0].min() > w or p[:, 1].max() < 0 or p[:, 1].min() > h:
            tags[i] = True
            continue
        p[:, 0] = np.clip(p[:, 0], 0, w - 1)
        p[:, 1] = np.clip(p[:, 1], 0, h - 1)
        area = -_signed_area(p)  # reference edge-sum convention
        if abs(area) < 1:
            tags[i] = True
        if area > 0:
            polys[i] = p[(0, 3, 2, 1), :]
        else:
            polys[i] = p
    return polys, tags


def make_shrink_map(
    shape: tuple[int, int],
    polygons: list[np.ndarray],
    ignore_tags: list[bool],
    min_text_size: int = 8,
    shrink_ratio: float = 0.4,
    gen_geometry: bool = False,
) -> dict:
    """G1: gt/mask (+ optional EAST geo) maps for one image."""
    h, w = shape
    polys, tags = validate_polygons(polygons, ignore_tags, h, w)
    gt = np.zeros((h, w), dtype=np.float32)
    mask = np.ones((h, w), dtype=np.float32)
    geo_map = np.zeros((h, w, 9), dtype=np.float32) if gen_geometry else None
    for i, polygon in enumerate(polys):
        height = min(
            np.linalg.norm(polygon[0] - polygon[3]), np.linalg.norm(polygon[1] - polygon[2])
        )
        width = min(
            np.linalg.norm(polygon[0] - polygon[1]), np.linalg.norm(polygon[2] - polygon[3])
        )
        if tags[i] or min(height, width) < min_text_size:
            mask[fill_poly_mask((h, w), polygon)] = 0
            tags[i] = True
            continue
        shrunk = offset_convex(polygon, -_shrink_distance(polygon, shrink_ratio))
        if shrunk is None:
            mask[fill_poly_mask((h, w), polygon)] = 0
            tags[i] = True
            continue
        inside = fill_poly_mask((h, w), shrunk)
        gt[inside] = 1
        if gen_geometry:
            ys, xs = np.nonzero(inside)
            for pno in range(4):
                geo_map[ys, xs, pno * 2] = xs - polygon[pno, 0]
                geo_map[ys, xs, pno * 2 + 1] = ys - polygon[pno, 1]
            geo_map[ys, xs, 8] = 1.0 / max(min(height, width), 1.0)
    out = {"gt": gt, "mask": mask, "ignore_tags": tags}
    if gen_geometry:
        out["geo_map"] = np.transpose(geo_map, (2, 0, 1))
    return out


def _edge_distance(xs: np.ndarray, ys: np.ndarray, p1: np.ndarray, p2: np.ndarray) -> np.ndarray:
    """Per-pixel distance to segment (p1, p2) — the reference's
    law-of-cosines form (make_seg_data.py:193-219): distance to the
    LINE while the pixel 'sees' the segment under an obtuse angle,
    else distance to the nearer endpoint."""
    sq1 = np.square(xs - p1[0]) + np.square(ys - p1[1])
    sq2 = np.square(xs - p2[0]) + np.square(ys - p2[1])
    sq_edge = np.square(p1[0] - p2[0]) + np.square(p1[1] - p2[1])
    cosin = (sq_edge - sq1 - sq2) / (2 * np.sqrt(sq1 * sq2) + 1e-6)
    sq_sin = np.clip(np.nan_to_num(1 - np.square(cosin)), 0, 1)
    result = np.sqrt(sq1 * sq2 * sq_sin / (sq_edge + 1e-6))
    near_end = cosin < 0
    result[near_end] = np.sqrt(np.fmin(sq1, sq2))[near_end]
    return result


def make_border_map(
    shape: tuple[int, int],
    polygons: list[np.ndarray],
    ignore_tags: list[bool],
    shrink_ratio: float = 0.4,
    thresh_min: float = 0.3,
    thresh_max: float = 0.7,
) -> dict:
    """G2: threshold (border) map + mask for one image."""
    h, w = shape
    canvas = np.zeros((h, w), dtype=np.float32)
    mask = np.zeros((h, w), dtype=np.float32)
    for polygon, ignored in zip(polygons, ignore_tags):
        if ignored:
            continue
        p = np.asarray(polygon, dtype=np.float64)
        distance = _shrink_distance(p, shrink_ratio)
        padded = offset_convex(p, distance)
        if padded is None:
            continue
        mask[fill_poly_mask((h, w), padded)] = 1.0
        xmin = int(padded[:, 0].min())
        xmax = int(padded[:, 0].max())
        ymin = int(padded[:, 1].min())
        ymax = int(padded[:, 1].max())
        width = xmax - xmin + 1
        height = ymax - ymin + 1
        local = p.copy()
        local[:, 0] -= xmin
        local[:, 1] -= ymin
        xs = np.broadcast_to(np.linspace(0, width - 1, num=width).reshape(1, width), (height, width))
        ys = np.broadcast_to(
            np.linspace(0, height - 1, num=height).reshape(height, 1), (height, width)
        )
        dist_map = np.zeros((len(local), height, width), dtype=np.float32)
        for i in range(len(local)):
            j = (i + 1) % len(local)
            dist_map[i] = np.clip(_edge_distance(xs, ys, local[i], local[j]) / distance, 0, 1)
        dist_min = dist_map.min(axis=0)
        xmin_v = min(max(0, xmin), w - 1)
        xmax_v = min(max(0, xmax), w - 1)
        ymin_v = min(max(0, ymin), h - 1)
        ymax_v = min(max(0, ymax), h - 1)
        canvas[ymin_v : ymax_v + 1, xmin_v : xmax_v + 1] = np.fmax(
            1
            - dist_min[
                ymin_v - ymin : ymax_v - ymax + height, xmin_v - xmin : xmax_v - xmax + width
            ],
            canvas[ymin_v : ymax_v + 1, xmin_v : xmax_v + 1],
        )
    canvas = canvas * (thresh_max - thresh_min) + thresh_min
    return {"thresh_map": canvas, "thresh_mask": mask}
