"""G3 text-avoiding random crop (detect_augment.py:67-200)."""

import numpy as np

from gluon_ocr_spark.kernels.cropping import crop_area, random_crop, split_regions


def test_split_regions():
    axis = np.array([0, 1, 2, 7, 8, 20])
    regs = [r.tolist() for r in split_regions(axis)]
    assert regs == [[0, 1, 2], [7, 8], [20]]


def test_crop_never_cuts_text():
    rng = np.random.default_rng(0)
    polys = [np.array([[30, 30], [60, 30], [60, 45], [30, 45]], float)]
    for seed in range(20):
        x, y, w, h = crop_area((100, 100), polys, np.random.default_rng(seed))
        # crop edges never fall inside the text span (31..59 / 31..44)
        assert x not in range(31, 60) and x + w not in range(31, 60)
        assert y not in range(31, 45) and y + h not in range(31, 45)
        # crop retains the polygon (the num_poly_in_rect>0 rule) or is full image
        assert (x <= 30 and x + w >= 30) or (x, y, w, h) == (0, 0, 100, 100)


def test_crop_full_image_when_no_free_axis():
    # text spans the whole width → w_axis empty → full image fallback
    polys = [np.array([[0, 40], [100, 40], [100, 60], [0, 60]], float)]
    assert crop_area((100, 100), polys, np.random.default_rng(1)) == (0, 0, 100, 100)


def test_random_crop_scales_polys_and_pads():
    rng = np.random.default_rng(3)
    img = np.ones((100, 100)) * 0.5
    polys = [np.array([[30, 30], [60, 30], [60, 45], [30, 45]], float)]
    out = random_crop(img, polys, [False], rng, size=(64, 64))
    assert out["image"].shape == (64, 64)
    assert len(out["polygons"]) == 1
    p = out["polygons"][0]
    cx, cy, cw, ch = out["crop"]
    s = out["scale"]
    assert np.allclose(p, (polys[0] - (cx, cy)) * s)
    # determinism: same seed → same crop
    out2 = random_crop(img, polys, [False], np.random.default_rng(3), size=(64, 64))
    assert out2["crop"] == out["crop"]
