"""Seeded NumPy net forwards (N1/N2/N3) + raster post-process
(D1-D8 raster, D11, D15, D16) — reference-semantics tests.

Reference files: gluonocr/model_zoo/dbnet/db_net.py:43-75,
crnn/crnn.py:28-38, east/east.py:45-58,
post_process/db_postprocess.py:67-163, east_postprocess.py:15-74.
"""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.nets import CRNNNumpy, DBNetNumpy, EASTNumpy
from gluon_ocr_spark.kernels.raster import (
    boxes_from_bitmap,
    douglas_peucker,
    polygons_from_bitmap,
    trace_boundary,
    box_score_fast,
    connected_components,
    east_detect,
    fill_poly_mask,
    min_area_rect,
    restore_rectangle_quad,
    sort_poly,
    unclip_convex,
)


class TestNets:
    def test_dbnet_shapes_and_determinism(self):
        x = np.random.default_rng(0).normal(size=(1, 3, 64, 64))
        out1 = DBNetNumpy(seed=7).forward(x)
        out2 = DBNetNumpy(seed=7).forward(x)
        assert out1["binary"].shape == (1, 1, 64, 64)
        for k in ("binary", "thresh", "thresh_binary"):
            assert np.array_equal(out1[k], out2[k])  # bit-identical
        assert out1["binary"].min() >= 0 and out1["binary"].max() <= 1

    def test_dbnet_thresh_binary_formula(self):
        # thresh_binary = sigmoid(k·(binary − thresh)), k=10
        # (db_net.py:72: 1/(1+exp(-k(binary-thresh))))
        x = np.random.default_rng(1).normal(size=(1, 3, 32, 32))
        out = DBNetNumpy(seed=3).forward(x)
        expect = 1.0 / (1.0 + np.exp(-10.0 * (out["binary"] - out["thresh"])))
        assert np.abs(expect - out["thresh_binary"]).max() == 0.0

    def test_dbnet_seed_changes_output(self):
        x = np.random.default_rng(0).normal(size=(1, 3, 32, 32))
        a = DBNetNumpy(seed=7).forward(x)["binary"]
        b = DBNetNumpy(seed=8).forward(x)["binary"]
        assert not np.array_equal(a, b)

    def test_crnn_seq_axis_and_determinism(self):
        # H collapses to 1, W is the sequence axis at W/2 (asymmetric
        # strides, crnn.py:60-62); logits (N, T, voc)
        x = np.random.default_rng(2).normal(size=(2, 3, 32, 48))
        net = CRNNNumpy(seed=11, voc_size=37)
        lg = net.forward(x)
        assert lg.shape == (2, 24, 37)
        assert np.array_equal(lg, CRNNNumpy(seed=11, voc_size=37).forward(x))

    def test_crnn_feeds_ctc(self):
        from gluon_ocr_spark.kernels.ctc import ctc_greedy_decode

        x = np.random.default_rng(3).normal(size=(1, 3, 32, 64))
        lg = CRNNNumpy(seed=11, voc_size=5).forward(x)
        ids = np.argmax(lg[0], axis=-1).tolist()
        # decodes without error and is deterministic
        vocab = ["a", "b", "c", "d"]  # blank = voc_size-1 = 4
        txt1 = ctc_greedy_decode(ids, vocab, blank=4)
        txt2 = ctc_greedy_decode(ids, vocab, blank=4)
        assert txt1 == txt2

    def test_east_shapes_and_geo_range(self):
        x = np.random.default_rng(4).normal(size=(1, 3, 64, 64))
        score, geo = EASTNumpy(seed=13).forward(x)
        assert score.shape == (1, 1, 16, 16)  # /4 of input
        assert geo.shape == (1, 8, 16, 16)
        assert score.min() >= 0 and score.max() <= 1
        assert geo.min() >= -800 and geo.max() <= 800  # (σ−.5)·2·800


class TestRaster:
    def test_connected_components_8conn(self):
        m = np.zeros((5, 5), bool)
        m[0, 0] = m[1, 1] = True  # diagonal touch = one 8-conn comp
        m[4, 4] = True
        comps = connected_components(m)
        assert sorted(len(c) for c in comps) == [1, 2]

    def test_min_area_rect_rotated(self):
        ang = np.deg2rad(30)
        R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
        rect = np.array([[0, 0], [20, 0], [20, 8], [0, 8]], float) @ R.T + 30
        corners, wh = min_area_rect(rect)
        assert sorted(np.round(wh, 6)) == [8.0, 20.0]
        # corners enclose the rect within fp noise
        assert abs(abs(np.cross(corners[1] - corners[0], corners[3] - corners[0])) - 160) < 1e-6

    def test_unclip_square_exact_distance(self):
        # d = area·ratio/perimeter = 100·1.8/40 = 4.5 each side
        sq = np.array([[10, 10], [20, 10], [20, 20], [10, 20]], float)
        out = unclip_convex(sq, 1.8)
        assert np.allclose(sorted(out[:, 0]), [5.5, 5.5, 24.5, 24.5])
        assert np.allclose(sorted(out[:, 1]), [5.5, 5.5, 24.5, 24.5])

    def test_box_score_fast_mean_inside(self):
        pred = np.zeros((20, 20))
        pred[5:10, 5:15] = 0.8
        box = np.array([[5, 5], [14, 5], [14, 9], [5, 9]], float)
        s = box_score_fast(pred, box)
        assert 0.75 <= s <= 0.85

    def test_boxes_from_bitmap_two_rects(self):
        pred = np.zeros((64, 64))
        pred[10:20, 5:40] = 0.95
        pred[40:50, 30:60] = 0.9
        boxes, scores = boxes_from_bitmap(pred, 64, 64)
        assert boxes.shape == (2, 4, 2)
        assert np.allclose(sorted(scores.round(2)), [0.9, 0.95])
        # unclipped boxes still ordered TL,TR,BR,BL and inside canvas
        assert (boxes >= 0).all() and (boxes <= 64).all()

    def test_boxes_filters(self):
        # low score blob and tiny blob are dropped
        pred = np.zeros((64, 64))
        pred[5:7, 5:7] = 0.9  # tiny → min_size filter
        pred[30:40, 10:40] = 0.4  # low prob → box_thresh filter (score .4)
        boxes, scores = boxes_from_bitmap(pred, 64, 64, thresh=0.3, box_thresh=0.7)
        assert len(boxes) == 0

    def test_restore_rectangle_quad_identity(self):
        origin = np.array([[100.0, 60.0]])
        geo = np.array([[10.0, 5.0, -20.0, 5.0, -20.0, -15.0, 10.0, -15.0]])
        quad = restore_rectangle_quad(origin, geo)
        assert np.allclose(quad[0], [[90, 55], [120, 55], [120, 75], [90, 75]])

    def test_east_detect_recovers_quad(self):
        score = np.zeros((16, 16))
        score[4:6, 4:8] = 0.9
        geo = np.zeros((16, 16, 8))
        target = np.array([10, 10, 40, 10, 40, 25, 10, 25], float)
        for y, x in np.argwhere(score > 0.8):
            geo[y, x] = np.array([x * 4, y * 4] * 4) - target
        out = east_detect(score, np.transpose(geo, (2, 0, 1)))
        assert out.shape[0] == 1
        assert np.allclose(out[0, :8], target)

    def test_east_detect_cover_refilter(self):
        # a quad landing on a zero-score region is refiltered out
        score = np.zeros((16, 16))
        score[0, 0] = 0.9
        geo = np.zeros((16, 16, 8))
        far = np.array([40, 40, 60, 40, 60, 60, 40, 60], float)
        geo[0, 0] = np.array([0, 0] * 4, float) - far
        out = east_detect(score, np.transpose(geo, (2, 0, 1)), cover_thresh=0.1)
        assert out.shape[0] == 0

    def test_sort_poly_reference_cases(self):
        # horizontal-first quad: unchanged order from min-corner
        p = np.array([[0, 0], [10, 0], [10, 5], [0, 5]])
        assert sort_poly(p).tolist() == [[0, 0], [10, 0], [10, 5], [0, 5]]
        # vertical-first edge → traversal flipped (east_postprocess.py:70-74)
        q = np.array([[5, 0], [5, 10], [0, 10], [0, 0]])
        assert sort_poly(q).tolist() == [[0, 0], [5, 0], [5, 10], [0, 10]]

    def test_fill_poly_even_odd(self):
        tri = np.array([[0, 0], [8, 0], [0, 8]], float)
        m = fill_poly_mask((10, 10), tri)
        assert m[1, 1] and not m[8, 8]


def test_committed_fixtures_match_kernels():
    """fixtures/*.parquet (the DuckDB oracle side of the kernel-parity
    gate) must equal what the kernels compute NOW — a kernel edit
    without scripts/gen_kernel_fixtures.py regeneration fails here
    instead of at the driver."""
    import os

    import pyarrow.parquet as pq

    from gluon_ocr_spark.functions.fixture_cases import FAMILIES, rows_for
    from gluon_ocr_spark.operators.kernel_queries import FIXTURE_DIR

    for family in FAMILIES:
        path = os.path.join(FIXTURE_DIR, f"{family}.parquet")
        assert os.path.exists(path), f"missing fixture {path}; run scripts/gen_kernel_fixtures.py"
        stored = pq.read_table(path).to_pylist()
        live = rows_for(family)
        assert stored == live, f"stale fixture for {family}; regenerate and commit"


class TestPolygonMode:
    """D9 polygon mode (db_postprocess.polygons_from_bitmap:23-66)."""

    def test_trace_boundary_rect(self):
        m = np.zeros((20, 20), bool)
        m[5:10, 3:12] = True
        c = trace_boundary(m)
        # boundary of a 9x5 rect = 2*(9+5)-4 = 24 pixels
        assert len(c) == 24
        assert set(map(tuple, c)) == {
            (x, y)
            for x in range(3, 12)
            for y in range(5, 10)
            if x in (3, 11) or y in (5, 9)
        }

    def test_douglas_peucker_rect_to_4pts(self):
        m = np.zeros((20, 20), bool)
        m[5:10, 3:12] = True
        c = trace_boundary(m)
        dp = douglas_peucker(c.astype(float), 0.5)
        assert len(dp) == 4

    def test_polygons_from_bitmap_l_shape(self):
        pred = np.zeros((64, 64))
        pred[10:30, 10:18] = 0.9
        pred[22:30, 10:40] = 0.9
        polys, scores = polygons_from_bitmap(pred, 64, 64)
        assert len(polys) == 1
        assert 0.85 <= scores[0] <= 0.95
        # Douglas-Peucker keeps the L's 6 corners pre-unclip; after
        # hull+unclip the poly has >= 4 points and stays in canvas
        assert polys[0].shape[0] >= 4
        assert (polys[0] >= 0).all() and (polys[0] <= 64).all()

    def test_polygons_filters_low_score(self):
        pred = np.zeros((32, 32))
        pred[5:15, 5:25] = 0.4  # above thresh 0.3 but below box_thresh
        polys, _ = polygons_from_bitmap(pred, 32, 32, thresh=0.3, box_thresh=0.7)
        assert polys == []


class TestLabelGen:
    """G1/G2 label generation (make_seg_data.py:14-230) + D14 soft-NMS
    (locality_aware_nms.py:105-169)."""

    def test_shrink_map_rect_geometry(self):
        from gluon_ocr_spark.kernels.labelgen import make_shrink_map

        poly = np.array([[10, 20], [40, 20], [40, 32], [10, 32]], float)
        out = make_shrink_map((64, 64), [poly], [False], gen_geometry=True)
        # d = area(1-r^2)/per = 360*0.84/84 ≈ 3.6 → shrunk ≈ 22.8×4.8;
        # rasterized pixel count lands between 4x22 and 6x24
        assert 88 <= out["gt"].sum() <= 144
        assert out["mask"].sum() == 64 * 64  # nothing ignored
        assert not out["ignore_tags"][0]
        # geo channel 8 = 1/min(h,w) = 1/12 over the shrunk region
        ch8 = out["geo_map"][8]
        assert abs(ch8.max() - 1 / 12) < 1e-6
        # corner-offset channels: at a pixel inside, offset = pixel - corner.
        # The quad is standard clockwise tl,tr,br,bl — reference
        # polygon_area (edge-sum, make_seg_data.py:112-119) is NEGATIVE
        # for it, so validate_polygons must NOT reorder: corners 1-3
        # stay (40,20),(40,32),(10,32).  Pins the ADVICE-r2 winding fix.
        ys, xs = np.nonzero(out["gt"])
        y0, x0 = ys[0], xs[0]
        assert out["geo_map"][0, y0, x0] == x0 - 10  # corner 0 x
        assert out["geo_map"][1, y0, x0] == y0 - 20  # corner 0 y
        assert out["geo_map"][2, y0, x0] == x0 - 40  # corner 1 x (tr)
        assert out["geo_map"][3, y0, x0] == y0 - 20  # corner 1 y
        assert out["geo_map"][4, y0, x0] == x0 - 40  # corner 2 x (br)
        assert out["geo_map"][5, y0, x0] == y0 - 32  # corner 2 y
        assert out["geo_map"][6, y0, x0] == x0 - 10  # corner 3 x (bl)
        assert out["geo_map"][7, y0, x0] == y0 - 32  # corner 3 y

    def test_validate_polygons_winding_convention(self):
        """Reference edge-sum area = −shoelace: clockwise tl,tr,br,bl
        (ref area < 0) is kept verbatim; the reversed winding
        tl,bl,br,tr (ref area > 0) is reordered (0,3,2,1) back to
        standard order (make_seg_data.py:99-119)."""
        from gluon_ocr_spark.kernels.labelgen import validate_polygons

        cw = np.array([[10, 20], [40, 20], [40, 32], [10, 32]], float)
        rev = cw[(0, 3, 2, 1), :]  # tl,bl,br,tr
        polys, tags = validate_polygons([cw, rev], [False, False], 64, 64)
        assert tags == [False, False]
        np.testing.assert_array_equal(polys[0], cw)   # untouched
        np.testing.assert_array_equal(polys[1], cw)   # reordered back

    def test_shrink_map_small_text_ignored(self):
        from gluon_ocr_spark.kernels.labelgen import make_shrink_map

        tiny = np.array([[5, 5], [11, 5], [11, 9], [5, 9]], float)  # min edge 4 < 8
        out = make_shrink_map((64, 64), [tiny], [False])
        assert out["ignore_tags"][0]
        assert out["gt"].sum() == 0
        assert (out["mask"] == 0).sum() > 0  # zeroed under the ignored poly

    def test_validate_polygons_outside_and_degenerate(self):
        from gluon_ocr_spark.kernels.labelgen import validate_polygons

        outside = np.array([[100, 100], [120, 100], [120, 110], [100, 110]], float)
        degenerate = np.array([[5, 5], [5.4, 5], [5.4, 5.4], [5, 5.4]], float)  # area < 1
        _, tags = validate_polygons([outside, degenerate], [False, False], 64, 64)
        assert tags == [True, True]

    def test_border_map_range_and_mask(self):
        from gluon_ocr_spark.kernels.labelgen import make_border_map

        poly = np.array([[10, 20], [40, 20], [40, 32], [10, 32]], float)
        out = make_border_map((64, 64), [poly], [False])
        assert out["thresh_map"].min() == np.float32(0.3)
        assert abs(float(out["thresh_map"].max()) - 0.7) < 0.02  # peaks at the edge
        # mask covers the padded polygon only
        assert 0 < out["thresh_mask"].sum() < 64 * 64
        # border values DECAY moving inward from the polygon edge
        assert out["thresh_map"][26, 10] > out["thresh_map"][26, 25]

    def test_border_map_ignored_poly_skipped(self):
        from gluon_ocr_spark.kernels.labelgen import make_border_map

        poly = np.array([[10, 20], [40, 20], [40, 32], [10, 32]], float)
        out = make_border_map((64, 64), [poly], [True])
        assert out["thresh_mask"].sum() == 0
        assert (out["thresh_map"] == np.float32(0.3)).all()

    def test_soft_nms_gaussian_decay(self):
        from gluon_ocr_spark.kernels.geometry import soft_nms

        b = np.array(
            [
                [0, 0, 10, 0, 10, 10, 0, 10, 0.9],
                [1, 1, 11, 1, 11, 11, 1, 11, 0.85],
                [50, 50, 60, 50, 60, 60, 50, 60, 0.95],
            ],
            float,
        )
        # iou(b0,b1) ≈ 0.68 → gaussian weight exp(-0.68²/.5) ≈ 0.396 →
        # 0.85·0.396 ≈ 0.337 < 0.5 → dropped; far box untouched
        out = soft_nms(b, threshold=0.5)
        assert sorted(np.round(out[:, 8], 2)) == [0.9, 0.95]
        # linear method with low threshold keeps the decayed box
        out2 = soft_nms(b, threshold=0.1, method=1)
        assert len(out2) == 3
        decayed = sorted(out2[:, 8])[0]
        assert abs(decayed - 0.85 * (1 - 0.680672)) < 1e-3

    def test_offset_convex_collapse_and_windings(self):
        from gluon_ocr_spark.kernels.raster import offset_convex

        sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        assert offset_convex(sq, -6) is None  # past the inradius
        assert offset_convex(sq[::-1], -6) is None  # CW winding too
        got = offset_convex(sq[::-1], -2)
        assert sorted(map(tuple, got.tolist())) == [(2, 2), (2, 8), (8, 2), (8, 8)]


class TestAttEncoder:
    """N5 attention encoder (att_encoder.py:8-46)."""

    def test_encoder_shapes_and_determinism(self):
        from gluon_ocr_spark.kernels.nets import AttEncoderNumpy

        x = np.random.default_rng(5).normal(size=(1, 3, 32, 40))
        out, proj, mask = AttEncoderNumpy(seed=17).forward(x)
        assert out.shape == (1, 10, 48)  # W/4 timesteps, 2*hidden feats
        assert proj.shape == (1, 10, 32)  # match_dim keys
        assert (np.abs(proj) <= 1).all()  # tanh projection
        out2, proj2, _ = AttEncoderNumpy(seed=17).forward(x)
        assert np.array_equal(out, out2) and np.array_equal(proj, proj2)

    def test_encoder_feeds_decoder(self):
        from gluon_ocr_spark.kernels.attention import GreedyAttentionDecoder
        from gluon_ocr_spark.kernels.nets import AttEncoderNumpy

        x = np.random.default_rng(6).normal(size=(1, 3, 32, 40))
        _, proj, _ = AttEncoderNumpy(seed=17).forward(x)
        dec = GreedyAttentionDecoder(voc_size=38, seed=7)
        ids = dec.decode(proj[0].astype(np.float32), max_len=20)
        assert ids == dec.decode(proj[0].astype(np.float32), max_len=20)
        assert all(0 <= v < 38 for v in ids)

    def test_mask_zeroes_features(self):
        from gluon_ocr_spark.kernels.nets import AttEncoderNumpy

        x = np.random.default_rng(7).normal(size=(1, 3, 32, 40))
        enc = AttEncoderNumpy(seed=17)
        full, _, _ = enc.forward(x)
        mask = np.ones((1, 1, 2, 10))
        mask[:, :, :, 5:] = 0  # mask away the right half of the width
        masked, _, seq_mask = enc.forward(x, mask)
        assert not np.array_equal(full, masked)
        # per-TIMESTEP mask: (n, W)=(1, 10), one entry per BiLSTM step
        assert seq_mask.shape == (1, 10)
        assert seq_mask.sum() == 5  # 5 visible width steps
        assert list(seq_mask[0]) == [1, 1, 1, 1, 1, 0, 0, 0, 0, 0]


class TestCLRS:
    """D17 CLRS corner→box post-process (clrs_postprocess.py:12-158)."""

    @staticmethod
    def _setup(h=20):
        def corner_box(cx, cy, s):
            return [cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2]

        boxes = np.array(
            [
                corner_box(10, 10, h),
                corner_box(50, 10, h),
                corner_box(50, 30, h),
                corner_box(10, 30, h),
            ],
            float,
        )
        ids = np.array([[0], [1], [2], [3]])
        seg = np.zeros((4, 64, 64))
        seg[0, 10:20, 10:30] = 1
        seg[1, 10:20, 30:50] = 1
        seg[2, 20:30, 30:50] = 1
        seg[3, 20:30, 10:30] = 1
        return ids, boxes, seg

    def test_recovers_exact_box(self):
        from gluon_ocr_spark.kernels.clrs import clrs_boxes

        ids, boxes, seg = self._setup()
        out = clrs_boxes(ids, boxes, seg)
        assert out.shape == (1, 4, 2)
        assert out.reshape(8).tolist() == [10, 10, 50, 10, 50, 30, 10, 30]

    def test_position_sensitive_veto(self):
        # swapping two seg channels breaks the quadrant layout → no box
        from gluon_ocr_spark.kernels.clrs import clrs_boxes

        ids, boxes, seg = self._setup()
        seg = seg[[2, 1, 0, 3]]  # TL channel now carries BR evidence
        assert clrs_boxes(ids, boxes, seg).shape[0] == 0

    def test_missing_corner_class_returns_empty(self):
        from gluon_ocr_spark.kernels.clrs import clrs_boxes

        ids, boxes, seg = self._setup()
        assert clrs_boxes(ids[:3], boxes[:3], seg).shape[0] == 0

    def test_size_ratio_gate(self):
        # mismatched corner sizes (ratio ≥ 1.5) generate no top edge
        from gluon_ocr_spark.kernels.clrs import corner2center, gen_box

        a = corner2center(np.array([[0, 0, 20, 20]], float))
        b = corner2center(np.array([[40, 0, 80, 40]], float))  # 2× size
        assert gen_box(a, b, 0) == []


class TestCLRSTargets:
    """G6 geometric target gen (detect_dataset.py:280-358) and its
    duality with the D17 post-process."""

    def test_targets_shape_and_corner_boxes(self):
        from gluon_ocr_spark.kernels.clrs import clrs_targets

        poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], float)
        boxes, seg_gt, mask = clrs_targets([poly], [False], img_size=(64, 64))
        assert boxes.shape == (4, 5)
        # h = min(40+40, 20+20)/2 = 20 → corner boxes are 20-sized squares
        assert (boxes[:, 2] - boxes[:, 0] == 20).all()
        assert boxes[:, 4].tolist() == [0, 1, 2, 3]
        assert seg_gt.shape == (4, 64, 64) and seg_gt.sum() > 0
        assert mask.min() == 1  # nothing ignored

    def test_small_text_zeroes_mask(self):
        from gluon_ocr_spark.kernels.clrs import clrs_targets

        tiny = np.array([[5, 5], [11, 5], [11, 9], [5, 9]], float)
        boxes, seg_gt, mask = clrs_targets([tiny], [False], img_size=(64, 64))
        assert boxes.tolist() == [[-1, -1, -1, -1, -1]]
        assert (mask == 0).sum() > 0

    def test_roundtrip_targets_to_boxes(self):
        # G6 targets fed into the D17 detector recover the input rect
        from gluon_ocr_spark.kernels.clrs import clrs_boxes, clrs_targets

        poly = np.array([[10, 10], [50, 10], [50, 30], [10, 30]], float)
        boxes, seg_gt, _ = clrs_targets([poly], [False], img_size=(64, 64))
        out = clrs_boxes(boxes[:, 4:5].astype(int), boxes[:, :4], seg_gt.astype(np.float64))
        assert out.reshape(-1, 8).tolist() == [[10, 10, 50, 10, 50, 30, 10, 30]]


class TestSTN:
    """N7 spatial transformer (nn/stn.py:4-18, warp-mode grid)."""

    def test_zero_flow_is_identity(self):
        from gluon_ocr_spark.kernels.nets import bilinear_sampler, grid_generator_warp

        x = np.random.default_rng(8).normal(size=(1, 2, 6, 7))
        grid = grid_generator_warp(np.zeros((1, 2, 6, 7)))
        assert np.allclose(bilinear_sampler(x, grid), x)

    def test_integer_flow_shifts(self):
        from gluon_ocr_spark.kernels.nets import bilinear_sampler, grid_generator_warp

        x = np.zeros((1, 1, 5, 5))
        x[0, 0, 2, 2] = 1.0
        flow = np.zeros((1, 2, 5, 5))
        flow[:, 0] = 1.0  # sample one pixel to the right
        out = bilinear_sampler(x, grid_generator_warp(flow))
        assert out[0, 0, 2, 1] == 1.0 and out[0, 0, 2, 2] == 0.0

    def test_out_of_range_zero_padded(self):
        from gluon_ocr_spark.kernels.nets import bilinear_sampler, grid_generator_warp

        x = np.ones((1, 1, 4, 4))
        flow = np.zeros((1, 2, 4, 4))
        flow[:, 0] = 10.0  # everything samples far outside
        out = bilinear_sampler(x, grid_generator_warp(flow))
        assert out.sum() == 0.0

    def test_stn_forward_deterministic(self):
        from gluon_ocr_spark.kernels.nets import STNNumpy

        x = np.random.default_rng(9).normal(size=(1, 3, 16, 16))
        a = STNNumpy(seed=19).forward(x)
        b = STNNumpy(seed=19).forward(x)
        assert a.shape == x.shape and np.array_equal(a, b)


class TestCLRSNet:
    """N4 CLRS-topology forward (model_zoo/clrs/clrs.py)."""

    def test_shapes_and_determinism(self):
        from gluon_ocr_spark.kernels.nets import CLRSNumpy

        x = np.random.default_rng(3).normal(size=(1, 3, 64, 64))
        out = CLRSNumpy(seed=23).forward(x)
        # 5 scales (/4../64), k=4 anchors/pos: 4·(16²+8²+4²+2²+1) = 1364
        assert out["cls_preds"].shape == (1, 1364, 5)
        assert out["loc_preds"].shape == (1, 1364, 4)
        assert out["seg_maps"].shape == (1, 4, 64, 64)  # input res, 4 channels
        assert 0 <= out["seg_maps"].min() and out["seg_maps"].max() <= 1
        out2 = CLRSNumpy(seed=23).forward(x)
        assert all(np.array_equal(out[k], out2[k]) for k in out)

    def test_dm_gate_is_multiplicative(self):
        # zeroing the lateral input nulls the DM output (x1·x2 gate,
        # clrs.py:26-29) — a summing FPN would NOT null it
        from gluon_ocr_spark.kernels.nets import CLRSNumpy

        net = CLRSNumpy(seed=23)
        top = np.random.default_rng(0).normal(size=(1, 16, 2, 2))
        lateral = np.zeros((1, 16, 4, 4))
        assert np.abs(net._dm(0, top, lateral)).max() == 0.0

    def test_seg_maps_feed_d17(self):
        # the net's 4-channel seg output is shape-compatible with the
        # CLRS post-process quadrant scorer
        from gluon_ocr_spark.kernels.clrs import clrs_scores
        from gluon_ocr_spark.kernels.nets import CLRSNumpy

        x = np.random.default_rng(5).normal(size=(1, 3, 64, 64))
        seg = CLRSNumpy(seed=23).forward(x)["seg_maps"][0]
        scores = clrs_scores([[10, 10, 40, 10, 40, 30, 10, 30]], seg)
        assert len(scores) == 1 and 0 <= scores[0] <= 1


class TestMNv3Backbone:
    """N9 second backbone shape: MobileNetV3 inverted-residual stages
    (mobilenetv3.py:105-141) behind DBNetNumpy."""

    def test_shapes_match_conv_backbone(self):
        from gluon_ocr_spark.kernels.nets import DBNetNumpy

        x = np.random.default_rng(0).normal(size=(1, 3, 64, 64))
        conv = DBNetNumpy(seed=7).forward(x)
        mnv3 = DBNetNumpy(seed=7, backbone="mnv3").forward(x)
        for k in ("binary", "thresh", "thresh_binary"):
            assert mnv3[k].shape == conv[k].shape == (1, 1, 64, 64)
        # different dataflow, different function
        assert not np.allclose(mnv3["binary"], conv["binary"])

    def test_hard_activations(self):
        from gluon_ocr_spark.kernels.nets import hard_sigmoid, hard_swish

        x = np.array([-4.0, -3.0, 0.0, 3.0, 6.0])
        np.testing.assert_allclose(hard_sigmoid(x), [0, 0, 0.5, 1, 1])
        np.testing.assert_allclose(hard_swish(x), x * hard_sigmoid(x))

    def test_depthwise_groups_are_independent(self):
        from gluon_ocr_spark.kernels.nets import depthwise_conv2d

        x = np.zeros((1, 2, 6, 6))
        x[0, 0] = 1.0  # only channel 0 has signal
        w = np.ones((2, 1, 3, 3))
        out = depthwise_conv2d(x, w, stride=1, pad=1)
        assert out[0, 0].max() > 0
        assert np.all(out[0, 1] == 0)  # channel 1 never sees channel 0

    def test_deterministic_per_seed(self):
        from gluon_ocr_spark.kernels.nets import DBNetNumpy

        x = np.random.default_rng(1).normal(size=(1, 3, 32, 32))
        a = DBNetNumpy(seed=9, backbone="mnv3").forward(x)["thresh_binary"]
        b = DBNetNumpy(seed=9, backbone="mnv3").forward(x)["thresh_binary"]
        np.testing.assert_array_equal(a, b)
