"""G4 seeded augmentation (detect_augment.py:10-65 MaskAugmenter/
PointAugmenter defaults, recog_augment.py:6-39 Augmenter defaults) —
pixel-op math, image↔polygon pairing, and determinism properties."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.augment import (
    add_bias,
    affine_rotate,
    augment_detect,
    augment_recog,
    fliplr,
    gaussian_blur,
    grayscale,
    linear_contrast,
    multiply_brightness,
    resize_scale,
)


def _img(seed=3, h=32, w=40):
    return np.random.default_rng(seed).integers(0, 256, size=(h, w, 3)).astype(np.uint8)


class TestPixelOps:
    def test_contrast_identity_and_direction(self):
        img = _img()
        assert np.array_equal(linear_contrast(img, 1.0), img)
        hi = linear_contrast(img, 1.2).astype(int)
        # contrast stretches distances from 127
        assert abs(hi - 127).sum() >= abs(img.astype(int) - 127).sum()

    def test_multiply_and_add_saturate(self):
        img = np.full((4, 4, 3), 250, np.uint8)
        assert multiply_brightness(img, 1.2).max() == 255
        assert add_bias(img, 10).max() == 255
        assert add_bias(img, -255).min() == 0

    def test_add_per_channel(self):
        img = np.full((4, 4, 3), 100, np.uint8)
        out = add_bias(img, np.array([-10.0, 0.0, 10.0]))
        assert out[0, 0].tolist() == [90, 100, 110]

    def test_blur_identity_at_zero_sigma_and_smooths(self):
        img = _img()
        assert np.array_equal(gaussian_blur(img, 0.0), img)
        out = gaussian_blur(img.astype(np.uint8), 1.0).astype(float)
        # blur reduces total variation
        tv = lambda a: np.abs(np.diff(a.astype(float), axis=0)).sum()  # noqa: E731
        assert tv(out) < tv(img)
        # constant image is a fixed point (kernel normalized, reflect pad)
        const = np.full((8, 8, 3), 77, np.uint8)
        assert np.array_equal(gaussian_blur(const, 1.5), const)

    def test_grayscale_full_alpha_equalizes_channels(self):
        out = grayscale(_img(), 1.0)
        assert np.array_equal(out[:, :, 0], out[:, :, 1])
        assert np.array_equal(out[:, :, 1], out[:, :, 2])


class TestGeometricOps:
    def test_fliplr_involution_and_poly(self):
        img = _img()
        poly = np.array([[5.0, 7.0], [15.0, 7.0], [15.0, 12.0], [5.0, 12.0]])
        f_img, (f_poly,) = fliplr(img, [poly])
        assert np.array_equal(fliplr(f_img, [f_poly])[0], img)
        assert f_poly[0, 0] == (img.shape[1] - 1) - 5.0
        # a pixel tracks its keypoint exactly
        y, x = 7, 5
        assert np.array_equal(f_img[y, int(f_poly[0, 0])], img[y, x])

    def test_rotate_keypoint_roundtrip(self):
        img = _img()
        poly = np.array([[10.0, 8.0], [25.0, 8.0], [25.0, 20.0], [10.0, 20.0]])
        r_img, (r_poly,) = affine_rotate(img, [poly], 9.0)
        assert r_img.shape == img.shape  # canvas kept
        _, (back,) = affine_rotate(r_img, [r_poly], -9.0)
        np.testing.assert_allclose(back, poly, atol=1e-9)

    def test_rotate_zero_is_identity(self):
        img = _img()
        out, _ = affine_rotate(img, [], 0.0)
        assert np.array_equal(out, img)

    def test_rotate_moves_bright_dot_with_keypoint(self):
        img = np.zeros((41, 41, 3), np.uint8)
        img[30, 8] = 255
        _, (kp,) = affine_rotate(img, [np.array([[8.0, 30.0]])], 30.0)
        out, _ = affine_rotate(img, [np.array([[8.0, 30.0]])], 30.0)
        xx, yy = int(round(kp[0, 0])), int(round(kp[0, 1]))
        # brightest region of the rotated image sits at the moved keypoint
        ys, xs, _ = np.nonzero(out > 100)
        assert abs(ys.mean() - yy) <= 1.0 and abs(xs.mean() - xx) <= 1.0

    def test_resize_scales_canvas_and_polys(self):
        img = _img(h=20, w=30)
        poly = np.array([[4.0, 4.0], [10.0, 4.0], [10.0, 8.0], [4.0, 8.0]])
        out, (p2,) = resize_scale(img, [poly], 2.0)
        assert out.shape[:2] == (40, 60)
        np.testing.assert_allclose(p2, poly * 2.0)


class TestPipelines:
    def test_detect_deterministic_per_seed(self):
        img = _img()
        polys = [np.array([[5.0, 5.0], [15.0, 5.0], [15.0, 11.0], [5.0, 11.0]])]
        a1, p1, ap1 = augment_detect(img, polys, np.random.default_rng(77))
        a2, p2, ap2 = augment_detect(img, polys, np.random.default_rng(77))
        assert np.array_equal(a1, a2)
        np.testing.assert_array_equal(p1[0], p2[0])
        assert ap1["geom_op"] == ap2["geom_op"]

    def test_detect_polys_stay_inside_canvas_when_flipped_or_resized(self):
        # flip/resize keep polys within the (scaled) canvas; rotation
        # may push corners out (imgaug keeps them too) so filter those
        img = _img()
        polys = [np.array([[5.0, 5.0], [15.0, 5.0], [15.0, 11.0], [5.0, 11.0]])]
        for seed in range(20):
            out, ps, applied = augment_detect(img, polys, np.random.default_rng(seed))
            if applied["geom_op"] == 0:  # rotation: pairing checked elsewhere
                continue
            h, w = out.shape[:2]
            for p in ps:
                assert p[:, 0].min() >= -1e-6 and p[:, 0].max() <= w - 1 + 1e-6
                assert p[:, 1].min() >= -1e-6 and p[:, 1].max() <= h - 1 + 1e-6

    def test_detect_draws_three_pixel_ops_and_one_geom(self):
        img = _img()
        _, _, applied = augment_detect(img, [], np.random.default_rng(5))
        assert len(applied["pixel_ops"]) == 3
        assert applied["geom_op"] in (0, 1, 2)

    def test_recog_draws_four_of_six(self):
        out, applied = augment_recog(_img(), np.random.default_rng(11))
        assert len(applied["ops"]) == 4
        assert len(set(applied["ops"])) == 4
        assert out.dtype == np.uint8

    def test_recog_deterministic_per_seed(self):
        img = _img()
        o1, _ = augment_recog(img, np.random.default_rng(123))
        o2, _ = augment_recog(img, np.random.default_rng(123))
        assert np.array_equal(o1, o2)

    def test_seed_variation_changes_output(self):
        img = _img()
        outs = {augment_recog(img, np.random.default_rng(s))[0].tobytes() for s in range(6)}
        assert len(outs) > 1


class TestMaskAugmenter:
    """MaskAugmenter class of G4: image + segmentation mask move
    through the same geometric draw; mask sampled nearest."""

    def test_mask_stays_binary_and_paired_on_flip(self):
        from gluon_ocr_spark.kernels.augment import augment_mask

        img = _img()
        mask = np.zeros(img.shape[:2], np.uint8)
        mask[8:14, 5:20] = 1
        for seed in range(12):
            rng = np.random.default_rng(seed)
            out_img, out_mask, applied = augment_mask(img, mask, rng)
            assert set(np.unique(out_mask)) <= {0, 1}  # nearest: no new labels
            assert out_img.shape[:2] == out_mask.shape[:2]  # stay paired

    def test_mask_flip_exact(self):
        from gluon_ocr_spark.kernels.augment import augment_mask

        img = _img()
        mask = np.zeros(img.shape[:2], np.uint8)
        mask[3:6, 0:4] = 1
        # find a seed that draws the flip branch
        for seed in range(40):
            rng = np.random.default_rng(seed)
            _, out_mask, applied = augment_mask(img, mask, rng)
            if applied.get("flipped"):
                assert np.array_equal(out_mask, mask[:, ::-1])
                return
        pytest.fail("no flip drawn in 40 seeds")

    def test_mask_area_roughly_preserved_under_rotation(self):
        from gluon_ocr_spark.kernels.augment import augment_mask

        img = _img(h=48, w=48)
        mask = np.zeros((48, 48), np.uint8)
        mask[16:32, 16:32] = 1
        for seed in range(40):
            rng = np.random.default_rng(seed)
            _, out_mask, applied = augment_mask(img, mask, rng)
            if applied["geom_op"] == 0:
                # centered square under ±10°: area within 15%
                assert abs(int(out_mask.sum()) - 256) <= 40
                return
        pytest.fail("no rotation drawn")

    def test_mask_deterministic(self):
        from gluon_ocr_spark.kernels.augment import augment_mask

        img = _img()
        mask = (np.random.default_rng(3).random(img.shape[:2]) > 0.8).astype(np.uint8)
        a = augment_mask(img, mask, np.random.default_rng(9))
        b = augment_mask(img, mask, np.random.default_rng(9))
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


class TestConfigDriven:
    def test_config_sequence_applies_all(self):
        from gluon_ocr_spark.kernels.augment import augment_from_config

        img = _img()
        out = augment_from_config(
            img,
            [("LinearContrast", (0.8, 1.2)), ("Multiply", (0.8, 1.2)), ("Add", (-10, 10))],
            np.random.default_rng(4),
        )
        assert out.shape == img.shape and out.dtype == np.uint8
        assert not np.array_equal(out, img)

    def test_config_rejects_unknown_op(self):
        from gluon_ocr_spark.kernels.augment import augment_from_config

        with pytest.raises(ValueError, match="unsupported"):
            augment_from_config(_img(), [("Fnord", 1)], np.random.default_rng(0))

    def test_config_fixed_scalar_param(self):
        from gluon_ocr_spark.kernels.augment import augment_from_config, linear_contrast

        img = _img()
        out = augment_from_config(img, [("LinearContrast", 1.1)], np.random.default_rng(0))
        assert np.array_equal(out, linear_contrast(img, 1.1))
