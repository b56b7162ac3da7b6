"""Geometry / CTC / metric kernels vs the reference's own hand-computed
smoke examples (FIXTURES.md §6; reference __main__ blocks)."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.ctc import IC15_VOCAB, ctc_collapse, ctc_greedy_decode, load_vocab
from gluon_ocr_spark.kernels.geometry import (
    iou,
    locality_aware_nms,
    order_points,
    polygon_area,
    standard_nms,
    weighted_merge,
)
from gluon_ocr_spark.kernels.metrics import (
    combine_detection,
    combine_recog,
    detection_eval,
    edit_distance,
    recog_distance_eval,
)


def _sq(x0, y0, x1, y1):
    return [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]


# --- geometry ---------------------------------------------------------


def test_area_and_iou():
    assert polygon_area(_sq(0, 0, 2, 3)) == 6.0
    assert iou(np.array(_sq(0, 0, 1, 1)), np.array(_sq(0.5, 0, 1.5, 1))) == pytest.approx(1 / 3)
    assert iou(np.array(_sq(0, 0, 1, 1)), np.array(_sq(2, 2, 3, 3))) == 0.0
    assert iou(np.array(_sq(0, 0, 1, 1)), np.array(_sq(0, 0, 1, 1))) == pytest.approx(1.0)


def test_order_points_canonical():
    jumbled = np.array([(5, 4), (1, 0), (5, 0), (1, 4)])
    got = order_points(jumbled)
    assert got.tolist() == [[1, 0], [5, 0], [5, 4], [1, 4]]  # TL,TR,BR,BL


def test_standard_nms_suppresses_overlaps():
    rows = np.array(
        [
            list(np.array(_sq(0, 0, 10, 10)).ravel()) + [0.9],
            list(np.array(_sq(1, 1, 11, 11)).ravel()) + [0.8],  # big overlap → dropped
            list(np.array(_sq(50, 50, 60, 60)).ravel()) + [0.7],
        ]
    )
    keep = standard_nms(rows, thresh=0.3)
    assert sorted(keep) == [0, 2]


def test_weighted_merge_matches_reference_formula():
    g = np.array([0, 0, 1, 0, 1, 1, 0, 1, 0.75], dtype=np.float64)
    p = np.array([4, 4, 5, 4, 5, 5, 4, 5, 0.25], dtype=np.float64)
    m = weighted_merge(g, p)
    # score-weighted coords, scores add (locality_aware_nms.py:45-51)
    assert m[8] == 1.0
    assert m[0] == pytest.approx(0.75 * 0 + 0.25 * 4)
    assert m[2] == pytest.approx(0.75 * 1 + 0.25 * 5)


def test_locality_aware_nms_merges_row_neighbors():
    rows = np.array(
        [
            list(np.array(_sq(0, 0, 10, 2)).ravel()) + [1.0],
            list(np.array(_sq(0.2, 0, 10.2, 2)).ravel()) + [1.0],  # same row → merged
            list(np.array(_sq(0, 50, 10, 52)).ravel()) + [0.5],
        ]
    )
    out = locality_aware_nms(rows, thresh=0.3)
    assert len(out) == 2
    merged = out[np.argmax(out[:, 8])]
    assert merged[8] == 2.0  # scores added by the merge
    assert merged[0] == pytest.approx(0.1)  # weighted x


# --- CTC (reference demo.py:77-86 semantics; FIXTURES §6 cases) -------


def test_ctc_collapse_cases():
    blank = 3
    assert ctc_collapse([blank, blank, blank], blank) == []
    assert ctc_collapse([0, 0, 1], blank) == [0, 1]  # aab → ab
    assert ctc_collapse([0, blank, 0], blank) == [0, 0]  # a,blank,a → aa
    assert ctc_collapse([], blank) == []


def test_ctc_greedy_decode_with_vocab():
    vocab = list("abc")
    # blank defaults to len(vocab) == 3
    assert ctc_greedy_decode([0, 0, 3, 1, 1, 3, 2], vocab) == "abc"
    assert ctc_greedy_decode([3, 3], vocab) == ""


def test_vocab_loading_first_char_per_line():
    vocab = load_vocab(["a\n", "bx\n", "", "c\n"])
    assert vocab == ["a", "b", "c"]
    assert len(IC15_VOCAB) == 36 and IC15_VOCAB[0] == "0" and IC15_VOCAB[-1] == "z"


# --- detection metric (detect_metric.py:198-211 example) --------------


def test_detection_metric_reference_example():
    gts = [_sq(0, 0, 1, 1), _sq(2, 2, 3, 3)]
    preds = [[(0.1, 0.1), (1, 0), (1, 1), (0, 1)]]
    res = detection_eval(gts, preds, [False, False])
    combined = combine_detection([res])
    assert combined["recall"] == pytest.approx(0.5)
    assert combined["precision"] == pytest.approx(1.0)
    assert combined["hmean"] == pytest.approx(2 / 3)


def test_detection_dont_care_filtering():
    gts = [_sq(0, 0, 1, 1)]
    preds = [_sq(0.05, 0.05, 0.95, 0.95)]  # fully inside the ignored gt
    res = detection_eval(gts, preds, [True])
    # no care gt, pred absorbed by don't-care → perfect per-image scores
    # (combine_results over zero care counts yields 0 by reference
    # convention, detect_metric.py:176-180)
    assert res["recall"] == 1.0 and res["precision"] == 1.0
    assert res["gt_care"] == 0 and res["pred_care"] == 0


# --- recognition metric (recog_metric.py:107-116 example) -------------


def test_edit_distance():
    assert edit_distance("", "") == 0
    assert edit_distance("abc", "abc") == 0
    assert edit_distance("123", "122") == 1
    assert edit_distance("kitten", "sitting") == 3


def test_recog_distance_reference_example():
    res = recog_distance_eval(["123", "456", "789"], ["122", "456", "788"])
    combined = combine_recog([res])
    assert combined["precision"] == pytest.approx(7 / 9)
    assert combined["recall"] == pytest.approx(7 / 9)
    assert combined["hmean"] == pytest.approx(7 / 9)


class TestRecogAccuracy:
    """M2 masked positional accuracy (ref recog_metric.py:8-42)."""

    def test_ctc_collapse_padded(self):
        import numpy as np

        from gluon_ocr_spark.kernels.metrics import ctc_collapse_padded

        # raw frames: [1,1,2,0,2] blank=0 → repeat-suppress then
        # blank-drop → [1,2,2]
        out = ctc_collapse_padded(np.array([[1, 1, 2, 0, 2]]), blank=0, max_len=6)
        assert out.tolist() == [[1, 2, 2, -1, -1, -1]]

    def test_masked_positional_accuracy_hand_computed(self):
        import numpy as np

        from gluon_ocr_spark.kernels.metrics import recog_accuracy

        # no blank: direct positional compare under mask
        preds = np.array([[5, 7, 9], [1, 2, 3]])
        labels = np.array([[5, 7, 0], [1, 9, 3]])
        mask = np.array([[1, 1, 0], [1, 1, 1]])
        # row0: matches at masked positions 0,1 → 2/(2+eps)
        # row1: matches 0 and 2 → 2/(3+eps); mean ≈ (1.0 + 0.6667)/2
        got = recog_accuracy(preds, labels, mask)
        assert abs(got - (2 / (2 + 1e-6) + 2 / (3 + 1e-6)) / 2) < 1e-9

    def test_scores_argmax_and_blank_path(self):
        import numpy as np

        from gluon_ocr_spark.kernels.metrics import recog_accuracy

        # (batch, seq, voc) scores; argmax = [[1,1,2,0,2]] → collapse
        # blank=0 → [1,2,2]; labels [1,2,2] all masked → accuracy 1
        voc = 3
        ids = [1, 1, 2, 0, 2]
        scores = np.zeros((1, 5, voc))
        for j, k in enumerate(ids):
            scores[0, j, k] = 9.0
        labels = np.array([[1, 2, 2]])
        mask = np.ones((1, 3))
        got = recog_accuracy(scores, labels, mask, blank=0)
        assert abs(got - 3 / (3 + 1e-6)) < 1e-9
