"""Text-avoiding random crop (SURVEY §2.7 G3) — the detection
augmenter's crop planner, seeded and NumPy-only.

Semantics of ``gluonocr/data/detect_augment.py:67-200``
(RandomCropData): project every care polygon onto each axis to build
occupancy arrays; the free (zero) runs are the legal cut positions;
sample two cuts per axis (region-wise when several free runs exist),
retry up to ``max_tries`` until the crop is at least
``min_crop_side_ratio`` of the image per side AND contains at least
one polygon; fall back to the full image. The crop is then scaled to
the target size (keep-ratio pad-to-canvas) and polygons are
translated/scaled, dropping those fully outside.

Determinism: the reference draws from global ``np.random``; here every
draw comes from a caller-supplied seeded Generator, so the same
(image, polys, seed) always yields the same crop — the property the
distributed pipeline needs (re-running a failed task must regenerate
identical training data).
"""

from __future__ import annotations

import numpy as np

__all__ = ["split_regions", "crop_area", "random_crop"]


def split_regions(axis: np.ndarray) -> list[np.ndarray]:
    """Consecutive runs of free positions (detect_augment.py:126-134)."""
    regions = []
    min_axis = 0
    for i in range(1, axis.shape[0]):
        if axis[i] != axis[i - 1] + 1:
            regions.append(axis[min_axis:i])
            min_axis = i
    if axis.shape[0]:
        regions.append(axis[min_axis:])
    return regions


def _is_poly_outside_rect(poly: np.ndarray, x: float, y: float, w: float, h: float) -> bool:
    poly = np.asarray(poly)
    if poly[:, 0].max() < x or poly[:, 0].min() > x + w:
        return True
    if poly[:, 1].max() < y or poly[:, 1].min() > y + h:
        return True
    return False


def crop_area(
    shape: tuple[int, int],
    polys: list[np.ndarray],
    rng: np.random.Generator,
    max_tries: int = 20,
    min_crop_side_ratio: float = 0.6,
) -> tuple[int, int, int, int]:
    """(x, y, w, h) of a text-avoiding crop (detect_augment.py:158-200)."""
    h, w = shape
    h_array = np.zeros(h, dtype=np.int32)
    w_array = np.zeros(w, dtype=np.int32)
    for points in polys:
        points = np.round(points, decimals=0).astype(np.int32)
        w_array[points[:, 0].min() : points[:, 0].max()] = 1
        h_array[points[:, 1].min() : points[:, 1].max()] = 1
    h_axis = np.where(h_array == 0)[0]
    w_axis = np.where(w_array == 0)[0]
    if len(h_axis) == 0 or len(w_axis) == 0:
        return 0, 0, w, h
    h_regions = split_regions(h_axis)
    w_regions = split_regions(w_axis)

    def select(axis, regions, max_size):
        if len(regions) > 1:
            idx = rng.choice(len(regions), size=2)
            vals = [int(rng.choice(regions[i], size=1)[0]) for i in idx]
            return min(vals), max(vals)
        xx = rng.choice(axis, size=2)
        lo, hi = int(xx.min()), int(xx.max())
        return int(np.clip(lo, 0, max_size - 1)), int(np.clip(hi, 0, max_size - 1))

    for _ in range(max_tries):
        xmin, xmax = select(w_axis, w_regions, w)
        ymin, ymax = select(h_axis, h_regions, h)
        if xmax - xmin < min_crop_side_ratio * w or ymax - ymin < min_crop_side_ratio * h:
            continue
        if any(not _is_poly_outside_rect(p, xmin, ymin, xmax - xmin, ymax - ymin) for p in polys):
            return xmin, ymin, xmax - xmin, ymax - ymin
    return 0, 0, w, h


def random_crop(
    image: np.ndarray,
    polygons: list[np.ndarray],
    ignore_tags: list[bool],
    rng: np.random.Generator,
    size: tuple[int, int] = (512, 512),
    keep_ratio: bool = True,
    max_tries: int = 20,
    min_crop_side_ratio: float = 0.6,
) -> dict:
    """Full G3: crop selection + keep-ratio scale/pad + polygon
    re-clip. ``image`` is (H, W) or (H, W, C) float."""
    from .nets import bilinear_resize

    im = np.asarray(image, dtype=np.float64)
    squeeze = im.ndim == 2
    if squeeze:
        im = im[:, :, None]
    h, w = im.shape[:2]
    care = [p for p, t in zip(polygons, ignore_tags) if not t]
    cx, cy, cw, ch = crop_area((h, w), care, rng, max_tries, min_crop_side_ratio)
    scale = min(size[0] / cw, size[1] / ch)
    nh, nw = int(ch * scale), int(cw * scale)
    crop = im[cy : cy + ch, cx : cx + cw]
    # NCHW bilinear (align_corners) — the resize kernel shared with the nets
    resized = bilinear_resize(crop.transpose(2, 0, 1)[None], nh, nw)[0].transpose(1, 2, 0)
    if keep_ratio:
        out = np.zeros((size[1], size[0], im.shape[2]), dtype=im.dtype)
        out[:nh, :nw] = resized
    else:
        out = bilinear_resize(crop.transpose(2, 0, 1)[None], size[1], size[0])[0].transpose(1, 2, 0)
    polys_out, tags_out = [], []
    for poly, tag in zip(polygons, ignore_tags):
        p = (np.asarray(poly, dtype=np.float64) - (cx, cy)) * scale
        if not _is_poly_outside_rect(p, 0, 0, nw, nh):
            polys_out.append(p)
            tags_out.append(tag)
    return {
        "image": out[:, :, 0] if squeeze else out,
        "polygons": polys_out,
        "ignore_tags": tags_out,
        "crop": (cx, cy, cw, ch),
        "scale": scale,
    }
