"""Perspective-warp line cropping (data_utils.py:9-31 crop_patch)."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.warp import crop_patch, perspective_transform, warp_perspective


class TestHomography:
    def test_identity(self):
        src = np.float64([[0, 0], [10, 0], [0, 5], [10, 5]])
        assert np.allclose(perspective_transform(src, src), np.eye(3))

    def test_maps_corners_exactly(self):
        src = np.float64([[3, 4], [40, 8], [5, 30], [44, 36]])
        dst = np.float64([[0, 0], [30, 0], [0, 12], [30, 12]])
        m = perspective_transform(src, dst)
        for s, d in zip(src, dst):
            v = m @ np.array([s[0], s[1], 1.0])
            assert np.allclose(v[:2] / v[2], d, atol=1e-9)

    def test_warp_inverse_roundtrip(self):
        # smooth content: bilinear resampling is near-exact on it
        # (noise content measures the interpolator's low-pass, not
        # correctness)
        base = np.linspace(0, 250, 48)[None, :] + np.linspace(0, 30, 32)[:, None]
        img = np.clip(base[:, :, None] + [[0.0, 10.0, 20.0]], 0, 255).astype(np.uint8)
        src = np.float64([[0, 0], [47, 0], [0, 31], [47, 31]])
        dst = np.float64([[2, 1], [45, 3], [1, 30], [46, 29]])
        m = perspective_transform(src, dst)
        there = warp_perspective(img, m, (48, 32))
        back = warp_perspective(there, np.linalg.inv(m), (48, 32))
        d = np.abs(back[6:-6, 6:-6].astype(int) - img[6:-6, 6:-6].astype(int))
        assert d.mean() < 2.0


class TestCropPatch:
    def test_axis_aligned_is_a_slice(self):
        img = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
        box = [[5, 7], [25, 7], [25, 19], [5, 19]]
        assert np.array_equal(crop_patch(img, box), img[7:19, 5:25])

    def test_rotated_quad_rectifies(self):
        ang = np.deg2rad(25)
        c, s = np.cos(ang), np.sin(ang)
        rect = np.array([[0, 0], [30, 0], [30, 10], [0, 10]], float) @ np.array(
            [[c, -s], [s, c]]
        ).T + [15, 12]
        big = np.zeros((60, 80, 3), np.uint8)
        for t in np.linspace(0, 1, 500):
            for u in np.linspace(0, 1, 180):
                p = (1 - t) * ((1 - u) * rect[0] + u * rect[3]) + t * (
                    (1 - u) * rect[1] + u * rect[2]
                )
                big[int(round(p[1])), int(round(p[0]))] = 200
        patch = crop_patch(big, rect)
        assert patch.shape[0] in (9, 10, 11) and patch.shape[1] in (29, 30, 31)
        assert patch[2:-2, 2:-2].mean() > 195  # interior fully painted

    def test_many_point_contour_reduces_to_min_rect(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (50, 70, 3)).astype(np.uint8)
        pts = np.array([[10, 10], [40, 12], [42, 25], [12, 27], [25, 18], [30, 20]], float)
        patch = crop_patch(img, pts)
        assert patch.ndim == 3 and patch.shape[0] > 0 and patch.shape[1] > 0

    def test_grayscale_input(self):
        img = np.arange(30 * 40, dtype=np.uint8).reshape(30, 40) % 256
        patch = crop_patch(img, [[2, 3], [20, 3], [20, 13], [2, 13]])
        assert np.array_equal(patch, img[3:13, 2:20])
