"""Resize arithmetic parity (SURVEY §5.2: ×32/divisor rounding, caps)."""

from gluon_ocr_spark.kernels.resize import (
    det_resize_dims,
    recog_resize_dims,
    recog_resize_dims_divisor,
    rot90_if_tall,
    width_sort_batches,
)


def test_det_resize_landscape():
    # 1000x2000 → short side 736, width ceil(736/1000*2000/32)*32 = 1472
    assert det_resize_dims(1000, 2000) == (736, 1472)


def test_det_resize_portrait():
    assert det_resize_dims(2000, 1000) == (1472, 736)


def test_det_resize_cap_rederives_short_side():
    # extreme aspect: width would exceed max_scale → cap + re-derive
    h, w = det_resize_dims(100, 10000)
    assert w == 3072
    assert h == int(__import__("math").ceil(3072 / 10000 * 100 / 32) * 32) == 32


def test_recog_resize_trunc_and_cap():
    assert recog_resize_dims(64, 320) == (32, 160)  # trunc(320*32/64)
    assert recog_resize_dims(32, 99999) == (32, 1024)  # cap


def test_recog_resize_divisor_variant():
    # 40x100 → w = ceil(32/40*100/4)*4 = 80
    assert recog_resize_dims_divisor(40, 100) == (32, 80)
    # very wide snaps to (short_side, max_scale)
    assert recog_resize_dims_divisor(10, 9000) == (32, 1440)


def test_rot90_if_tall():
    assert rot90_if_tall(100, 50) == (50, 100, True)  # h > 1.5w
    assert rot90_if_tall(60, 50) == (60, 50, False)


def test_width_sort_batches_roundtrip():
    widths = [300, 100, 200, 100, 400]
    order, batches, unsort = width_sort_batches(widths, batch_size=2)
    assert order == [1, 3, 2, 0, 4]  # stable on ties
    assert batches == [[1, 3], [2, 0], [4]]
    # unsort maps original index → position in sorted stream
    sorted_widths = [widths[i] for i in order]
    assert [sorted_widths[unsort[i]] for i in range(len(widths))] == widths


class TestPadToCanvas:
    """P6 pad-to-canvas pinned to detect_dataset.py:102-117: zero
    canvas, top-left anchor, float64 out (bare np.zeros), raise on
    unknown layout."""

    def test_three_layouts_anchor_and_zero_fill(self):
        import numpy as np

        from gluon_ocr_spark.kernels.resize import pad_to_canvas

        img = np.arange(24, dtype=np.uint8).reshape(2, 3, 4)
        out = pad_to_canvas(img, (5, 6), "CHW")
        assert out.shape == (2, 5, 6) and out.dtype == np.float64
        assert np.array_equal(out[:, :3, :4], img)
        assert out.sum() == img.sum()

        img = np.arange(24, dtype=np.float32).reshape(3, 4, 2)
        out = pad_to_canvas(img, (6, 5), "HWC")
        assert out.shape == (6, 5, 2)
        assert np.array_equal(out[:3, :4, :], img)

        img = np.arange(12).reshape(3, 4)
        out = pad_to_canvas(img, (3, 4), "HW")  # no-op canvas
        assert np.array_equal(out, img)

    def test_unknown_layout_raises(self):
        import numpy as np
        import pytest as _pytest

        from gluon_ocr_spark.kernels.resize import pad_to_canvas

        with _pytest.raises(ValueError):
            pad_to_canvas(np.zeros((2, 2)), (3, 3), "WHC")
