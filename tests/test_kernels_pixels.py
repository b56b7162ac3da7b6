"""P1/P2/P5 real pixel preprocessing (detect_dataset.py:62,
recog_dataset.py:125-135, data/__init__.py:3-7)."""

import numpy as np

from gluon_ocr_spark.kernels.pixels import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    bgr_to_gray,
    bgr_to_rgb,
    gray_to_3ch,
    normalize_imagenet,
    preprocess_detect,
    preprocess_recog,
    rgb_to_gray,
    to_tensor,
)


def _img(seed=2, h=12, w=16):
    return np.random.default_rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


def test_bgr_rgb_involution_and_channel_swap():
    img = _img()
    assert np.array_equal(bgr_to_rgb(bgr_to_rgb(img)), img)
    assert np.array_equal(bgr_to_rgb(img)[:, :, 0], img[:, :, 2])


def test_gray_bt601_known_values():
    # pure channels: R→76, G→150, B→29 (0.299/0.587/0.114 × 255)
    img = np.zeros((1, 3, 3), np.uint8)
    img[0, 0] = [255, 0, 0]
    img[0, 1] = [0, 255, 0]
    img[0, 2] = [0, 0, 255]
    assert rgb_to_gray(img)[0].tolist() == [76, 150, 29]
    # bgr variant sees reversed channels
    assert bgr_to_gray(img)[0].tolist() == [29, 150, 76]


def test_gray_to_3ch_replicates():
    g = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = gray_to_3ch(g)
    assert out.shape == (3, 4, 3)
    for c in range(3):
        assert np.array_equal(out[:, :, c], g)


def test_to_tensor_layout_and_range():
    img = _img()
    t = to_tensor(img)
    assert t.shape == (3, 12, 16)
    assert t.dtype == np.float32
    assert 0.0 <= t.min() and t.max() <= 1.0
    assert t[1, 4, 5] == np.float32(img[4, 5, 1] / 255.0)


def test_normalize_imagenet_constants():
    chw = np.zeros((3, 2, 2))
    out = normalize_imagenet(chw)
    np.testing.assert_allclose(out[:, 0, 0], -IMAGENET_MEAN / IMAGENET_STD)
    # a pixel equal to the mean normalizes to zero
    chw2 = np.broadcast_to(IMAGENET_MEAN[:, None, None], (3, 2, 2))
    np.testing.assert_allclose(normalize_imagenet(chw2), 0.0, atol=1e-12)


def test_preprocess_detect_shapes_and_gray_input():
    assert preprocess_detect(_img()).shape == (3, 12, 16)
    g = np.random.default_rng(1).integers(0, 256, (8, 9)).astype(np.uint8)
    assert preprocess_detect(g).shape == (3, 8, 9)
    rgba = np.random.default_rng(1).integers(0, 256, (8, 9, 4)).astype(np.uint8)
    assert preprocess_detect(rgba).shape == (3, 8, 9)


def test_preprocess_recog_channels_equal():
    out = preprocess_recog(_img())
    assert out.shape == (3, 12, 16)
    # gray×3 then per-channel normalize: channels differ only by the
    # mean/std constants — un-normalize and they coincide
    un = out * IMAGENET_STD[:, None, None] + IMAGENET_MEAN[:, None, None]
    np.testing.assert_allclose(un[0], un[1], atol=1e-6)
    np.testing.assert_allclose(un[1], un[2], atol=1e-6)


def test_bgr_flag_changes_result():
    img = _img()
    a = preprocess_detect(img, assume_bgr=False)
    b = preprocess_detect(img, assume_bgr=True)
    assert not np.allclose(a, b)
    # un-normalize (the swap precedes the per-channel constants):
    # raw channel 0 of the RGB path equals raw channel 2 of the BGR path
    un = lambda t: t * IMAGENET_STD[:, None, None] + IMAGENET_MEAN[:, None, None]  # noqa: E731
    np.testing.assert_allclose(un(a)[0], un(b)[2], atol=1e-6)
