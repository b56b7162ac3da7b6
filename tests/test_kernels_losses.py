"""G7–G9 loss kernels (base_loss.py:7-183, det_loss.py:9-79, CTC)."""

import math

import numpy as np

from gluon_ocr_spark.kernels.losses import (
    balance_ce_loss,
    balance_l1_loss,
    box_iou_loss,
    clrs_loss,
    ctc_loss,
    db_loss,
    dice_loss,
    east_loss,
    mask_l1_loss,
    mask_smooth_l1_loss,
    softmax_ce_loss,
)


def test_dice_loss_hand_computed():
    pred = np.array([[[0.8, 0.2], [0.6, 0.1]]])
    label = np.array([[[1.0, 0.0], [1.0, 0.0]]])
    mask = np.ones((1, 2, 2))
    # inter = .8+.6 = 1.4; union = (.8+.2+.6+.1) + (1+1) = 3.7
    got = dice_loss(pred, label, mask)[0]
    assert abs(got - (1 - 2 * 1.4 / (3.7 + 1e-6))) < 1e-9
    # perfect prediction → 0
    assert abs(dice_loss(label, label, mask)[0]) < 1e-6


def test_mask_l1_ignores_masked():
    pred = np.array([[[0.0, 5.0]]])
    label = np.array([[[1.0, 9.0]]])
    mask = np.array([[[1.0, 0.0]]])
    got = mask_l1_loss(pred, label, mask)[0]
    assert abs(got - 1.0 / (1 + 1e-6)) < 1e-9


def test_smooth_l1_quadratic_and_linear():
    pred = np.array([[[0.5, 3.0]]])
    label = np.zeros((1, 1, 2))
    mask = np.ones((1, 1, 2))
    # |0.5| < 1 → 0.5·0.25 = 0.125 ; |3| ≥ 1 → 3 − 0.5 = 2.5
    got = mask_smooth_l1_loss(pred, label, mask)[0]
    assert abs(got - (0.125 + 2.5) / (2 + 1e-6)) < 1e-9


def test_balance_ce_hard_negative_mining():
    # 1 positive, 4 negatives → keep top-3 hardest negatives only
    pred = np.array([[[0.9, 0.8, 0.6, 0.4, 0.2]]])  # first is the positive
    label = np.array([[[1.0, 0.0, 0.0, 0.0, 0.0]]])
    mask = np.ones((1, 1, 5))
    got = balance_ce_loss(pred, label, mask)[0]
    eps = 1e-6
    pos = -math.log(0.9 + eps)
    negs = sorted((-math.log(1 - p + eps) for p in (0.8, 0.6, 0.4, 0.2)), reverse=True)[:3]
    assert abs(got - (pos + sum(negs)) / (1 + 3 + eps)) < 1e-9


def test_balance_l1_counts():
    pred = np.array([[[0.0, 1.0, 0.5]]])
    label = np.array([[[1.0, 0.0, 0.0]]])
    mask = np.ones((1, 1, 3))
    # pos: |1−0|=1 ; negatives: |0−1|=1, |0−.5|=.5 → cap = 3·1 ≥ 2, keep both
    got = balance_l1_loss(pred, label, mask)[0]
    assert abs(got - (1 + 1 + 0.5) / (1 + 2 + 1e-6)) < 1e-9


def test_softmax_ce_ignore_label():
    out = np.array([[[2.0, 0.0], [0.0, 2.0], [1.0, 1.0]]])
    lab = np.array([[1, 0, -1]])  # third entry ignored
    got = softmax_ce_loss(out, lab)[0]
    p1 = math.exp(0) / (math.exp(2) + math.exp(0))  # class 1 of row 0
    p0 = math.exp(0) / (math.exp(2) + math.exp(0))  # class 0 of row 1
    exp = (-(math.log(p1 + 1e-5)) - math.log(p0 + 1e-5)) / (1 + 1e-5)
    assert abs(got - exp) < 1e-9


def test_box_iou_variants():
    p = np.array([[[0, 0, 2, 2]]], dtype=float)
    t = np.array([[[1, 1, 3, 3]]], dtype=float)
    m = np.ones((1, 1))
    # inter 1, union 7 → iou 1/7
    assert abs(box_iou_loss(p, t, m, "iou")[0] - (1 - 1 / 7)) < 1e-9
    # giou: enclose 9 → giou = 1/7 − (9−7)/9
    assert abs(box_iou_loss(p, t, m, "giou")[0] - (1 - (1 / 7 - 2 / 9))) < 1e-9
    # diou: centers (1,1),(2,2) → d²=2; diag²=18 → diou = 1/7 − 1/9
    assert abs(box_iou_loss(p, t, m, "diou")[0] - (1 - (1 / 7 - 2 / 18))) < 1e-9
    # identical boxes: every variant → 0
    for v in ("iou", "giou", "diou", "ciou"):
        assert abs(box_iou_loss(p, p, m, v)[0]) < 1e-9


def test_composites_positive_and_finite():
    rng = np.random.default_rng(0)
    gt = (rng.random((2, 1, 8, 8)) > 0.7).astype(float)
    mask = np.ones((2, 1, 8, 8))
    binary = np.clip(rng.random((2, 1, 8, 8)), 0.01, 0.99)
    thresh = rng.random((2, 1, 8, 8))
    tb = np.clip(rng.random((2, 1, 8, 8)), 0.01, 0.99)
    tmap = rng.random((2, 1, 8, 8))
    tmask = (rng.random((2, 1, 8, 8)) > 0.5).astype(float)
    out = db_loss(binary, thresh, tb, gt, mask, tmap, tmask)
    assert out.shape == (2,) and np.isfinite(out).all() and (out > 0).all()

    geo_gt9 = rng.random((2, 9, 8, 8))
    geo_pred = rng.random((2, 8, 8, 8))
    out = east_loss(binary, gt, mask, geo_pred, geo_gt9)
    assert out.shape == (2,) and np.isfinite(out).all()

    cls_pred = rng.random((2, 4, 3))
    cls_targ = rng.integers(-1, 3, size=(2, 4))
    box_pred = rng.random((2, 4, 4))
    box_targ = rng.random((2, 4, 4))
    box_mask = np.ones((2, 4, 4))
    seg = np.clip(rng.random((2, 4, 8, 8)), 0.01, 0.99)
    seg_gt = (rng.random((2, 4, 8, 8)) > 0.5).astype(float)
    out = clrs_loss(cls_pred, cls_targ, box_pred, box_targ, box_mask, seg, seg_gt, np.ones_like(seg_gt))
    assert out.shape == (2,) and np.isfinite(out).all()


class TestCTCLoss:
    def test_single_symbol_two_frames(self):
        # vocab {a=0, blank=1}; label "a" over T=2
        # paths: aa, a-, -a → P = p0a·p1a + p0a·p1b + p0b·p1a
        probs = np.array([[0.6, 0.4], [0.3, 0.7]])
        lp = np.log(probs)
        want = 0.6 * 0.3 + 0.6 * 0.7 + 0.4 * 0.3
        got = ctc_loss(lp, [0], blank=1)
        assert abs(got - (-math.log(want))) < 1e-9

    def test_repeat_needs_blank(self):
        # label "aa" over T=2 has NO valid path (needs a-a); T=3 does
        probs = np.full((2, 2), 0.5)
        assert ctc_loss(np.log(probs), [0, 0], blank=1) == float("inf")
        probs3 = np.full((3, 2), 0.5)
        # only path a,-,a → 0.5³
        got = ctc_loss(np.log(probs3), [0, 0], blank=1)
        assert abs(got - (-math.log(0.125))) < 1e-9

    def test_uniform_sums_to_all_paths(self):
        # uniform probs: loss = −log(n_valid_paths · p^T)
        probs = np.full((3, 3), 1 / 3)
        # label "a" T=3: count alignments of 'a' with blanks: sequences
        # over {a,-} collapsing to "a": ---? no; valid: a--, -a-, --a,
        # aa-, a-a? no (a-a collapses to "aa")... aa- → "a", -aa → "a",
        # aaa → "a": total 6? enumerate: strings s∈{a,-}³ with collapse(s)="a":
        # a--, -a-, --a, aa-, -aa, aaa = 6
        got = ctc_loss(np.log(probs), [0], blank=2)
        assert abs(got - (-math.log(6 * (1 / 3) ** 3))) < 1e-9
