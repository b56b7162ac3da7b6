"""Perspective-warp line cropping (SURVEY §2.5 C1's pixel form) —
the reference's ``crop_patch`` (``gluonocr/data/data_utils.py:9-31``:
cv2.getPerspectiveTransform + warpPerspective) re-derived in NumPy.

* :func:`perspective_transform` — the 3×3 homography mapping four
  source points to four destination points (the 8-unknown DLT linear
  system cv2.getPerspectiveTransform solves).
* :func:`warp_perspective` — inverse-map bilinear resampling through
  the same zero-pad sampler the STN uses (cv2's default constant-0
  border). Documented deviation: cv2 interpolates in 5-bit fixed
  point; this float bilinear can differ by 1 LSB on exact .5 ties.
* :func:`crop_patch` — the reference's exact flow: int32-cast box,
  axis-aligned fast path (direct slice when the top edge is
  horizontal AND the left edge vertical), otherwise the TL,TR,BL,BR →
  (0,0),(w,0),(0,h),(w,h) warp with w=|p0−p1|, h=|p0−p3| (integer
  lengths, ref cal_len); >4-point inputs reduce through the minimum
  rotated rect (get_mini_boxes analog: min_area_rect+order_points).
"""

from __future__ import annotations

import numpy as np

from .geometry import order_points
from .raster import min_area_rect

__all__ = ["perspective_transform", "warp_perspective", "crop_patch"]


def perspective_transform(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """3×3 H with H·[x_src, y_src, 1]ᵀ ∝ [x_dst, y_dst, 1]ᵀ for the 4
    point pairs (h33 pinned to 1 — the non-degenerate case
    getPerspectiveTransform solves)."""
    src = np.asarray(src, dtype=np.float64)
    dst = np.asarray(dst, dtype=np.float64)
    a = np.zeros((8, 8))
    b = np.zeros(8)
    for i in range(4):
        x, y = src[i]
        u, v = dst[i]
        a[2 * i] = [x, y, 1, 0, 0, 0, -u * x, -u * y]
        a[2 * i + 1] = [0, 0, 0, x, y, 1, -v * x, -v * y]
        b[2 * i] = u
        b[2 * i + 1] = v
    h = np.linalg.solve(a, b)
    return np.array(
        [[h[0], h[1], h[2]], [h[3], h[4], h[5]], [h[6], h[7], 1.0]]
    )


def warp_perspective(img: np.ndarray, m: np.ndarray, size: tuple[int, int]) -> np.ndarray:
    """cv2.warpPerspective semantics: output pixel (x, y) samples the
    source at M⁻¹·(x, y, 1) with bilinear interpolation, zero border.
    ``size`` is (w, h) like cv2."""
    from .nets import bilinear_sampler

    w, h = size
    if w <= 0 or h <= 0:
        return np.zeros((max(h, 0), max(w, 0)) + img.shape[2:], dtype=img.dtype)
    inv = np.linalg.inv(np.asarray(m, dtype=np.float64))
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    denom = inv[2, 0] * xs + inv[2, 1] * ys + inv[2, 2]
    denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    sx = (inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]) / denom
    sy = (inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]) / denom
    ih, iw = img.shape[:2]
    gx = sx * 2.0 / max(iw - 1, 1) - 1.0
    gy = sy * 2.0 / max(ih - 1, 1) - 1.0
    grid = np.stack([gx, gy])[None]
    chw = (
        np.moveaxis(img.astype(np.float64), -1, 0)[None]
        if img.ndim == 3
        else img[None, None].astype(np.float64)
    )
    out = bilinear_sampler(chw, grid)[0]
    out = np.moveaxis(out, 0, -1) if img.ndim == 3 else out[0]
    if np.issubdtype(img.dtype, np.integer):
        return np.clip(np.rint(out), 0, 255).astype(img.dtype)
    return out.astype(img.dtype)


def crop_patch(img: np.ndarray, box) -> np.ndarray:
    """Reference crop_patch (data_utils.py:9-31): rectify one detected
    quad into an axis-aligned line crop for recognition."""
    box = np.asarray(box).astype(np.int32)
    if len(box) == 4:
        if box[0, 1] == box[1, 1] and box[0, 0] == box[-1, 0]:
            # axis-aligned fast path: a straight slice
            return img[box[0, 1] : box[2, 1], box[0, 0] : box[2, 0]].copy()
        w = int(np.sqrt(((box[0] - box[1]) ** 2).sum()))
        h = int(np.sqrt(((box[0] - box[-1]) ** 2).sum()))
        src = np.float64([box[0], box[1], box[3], box[2]])
        dst = np.float64([[0, 0], [w, 0], [0, h], [w, h]])
        m = perspective_transform(src, dst)
        return warp_perspective(img, m, (w, h))
    corners, _ = min_area_rect(np.asarray(box, dtype=np.float64))
    return crop_patch(img, order_points(corners))
