"""Training losses (SURVEY §2.7 G7–G9) — NumPy with the reference's
semantics (``gluonocr/loss/base_loss.py:7-183``, ``det_loss.py:9-79``,
plus the CTC loss the CRNN trainer uses).

These are the deterministic MATH of the training side — the pieces a
data-quality pipeline also uses for scoring/validation. Optimizers,
autograd, and multi-GPU loops (G10) stay out of slice.

Per-sample reductions follow the reference exactly: every loss
reduces over all axes except the batch axis and returns a (batch,)
vector.

Known reference bugs NOT replicated (documented per the T2 precedent):
``BoxIOULoss`` ciou branch calls the nonexistent ``F.devide``/
``mx.nd.arctan`` on symbols (base_loss.py:176-178 — the branch crashes
if ever selected); the ciou here computes the published CIoU formula.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dice_loss",
    "mask_l1_loss",
    "mask_smooth_l1_loss",
    "balance_l1_loss",
    "balance_ce_loss",
    "softmax_ce_loss",
    "box_iou_loss",
    "db_loss",
    "east_loss",
    "clrs_loss",
    "ctc_loss",
]


def _sum_keep_batch(x: np.ndarray) -> np.ndarray:
    return x.reshape(x.shape[0], -1).sum(axis=1)


def dice_loss(pred, label, mask, eps: float = 1e-6) -> np.ndarray:
    """1 − 2·Σ(pred·label·mask) / (Σpred·mask + Σlabel·mask + eps)."""
    pred, label, mask = (np.asarray(a, dtype=np.float64) for a in (pred, label, mask))
    inter = _sum_keep_batch(pred * label * mask)
    union = _sum_keep_batch(pred * mask) + _sum_keep_batch(label * mask) + eps
    return 1.0 - 2.0 * inter / union


def mask_l1_loss(pred, label, mask, eps: float = 1e-6) -> np.ndarray:
    pred, label, mask = (np.asarray(a, dtype=np.float64) for a in (pred, label, mask))
    return _sum_keep_batch(np.abs(label - pred) * mask) / (mask.sum() + eps)


def _smooth_l1(x: np.ndarray, sigma: float = 1.0) -> np.ndarray:
    """MXNet smooth_l1 with scalar σ: 0.5(σx)² if |x|<1/σ² else |x|−0.5/σ²."""
    absx = np.abs(x)
    return np.where(absx < 1.0 / sigma**2, 0.5 * (sigma * x) ** 2, absx - 0.5 / sigma**2)


def mask_smooth_l1_loss(pred, label, mask, eps: float = 1e-6) -> np.ndarray:
    pred, label, mask = (np.asarray(a, dtype=np.float64) for a in (pred, label, mask))
    return _sum_keep_batch(_smooth_l1((pred - label) * mask)) / (mask.sum() + eps)


def _hard_negative_balance(loss, label, mask, negative_ratio, eps):
    """Shared OHEM core (base_loss.py:46-62): keep all positives and
    the top-k hardest negatives (k = min(#neg, ratio·#pos), counts
    GLOBAL over the batch like the reference), normalized by kept
    count.

    Reference bug NOT replicated (documented per the T2 precedent):
    base_loss.py:53 ranks with ``argsort(axis=1)`` after reshaping to
    (batch, C, H·W) — for the C=1 maps DB feeds it, a singleton-axis
    argsort returns all-zero ranks, so ``rank < negative_count`` keeps
    EVERY negative and the "online hard example mining" never mines.
    This implementation ranks descending within each batch sample's
    flattened negatives (the DB paper's intended selection)."""
    positive = label * mask
    negative = (1 - label) * mask
    positive_count = int(positive.sum())
    negative_count = min(int(negative.sum()), int(positive_count * negative_ratio))
    neg_loss = (loss * negative).reshape(loss.shape[0], -1)
    rank = np.argsort(np.argsort(-neg_loss, axis=1), axis=1)
    neg_loss = np.where(rank < negative_count, neg_loss, 0.0)
    pos_loss = loss * positive
    return (_sum_keep_batch(pos_loss) + neg_loss.sum(axis=1)) / (
        positive_count + negative_count + eps
    )


def balance_l1_loss(pred, label, mask, negative_ratio: float = 3.0, eps: float = 1e-6) -> np.ndarray:
    pred, label, mask = (np.asarray(a, dtype=np.float64) for a in (pred, label, mask))
    return _hard_negative_balance(np.abs(label - pred), label, mask, negative_ratio, eps)


def balance_ce_loss(pred, label, mask, negative_ratio: float = 3.0, eps: float = 1e-6) -> np.ndarray:
    pred, label, mask = (np.asarray(a, dtype=np.float64) for a in (pred, label, mask))
    loss = -(np.log(pred + eps) * label + np.log(1.0 - pred + eps) * (1.0 - label))
    return _hard_negative_balance(loss, label, mask, negative_ratio, eps)


def softmax_ce_loss(output, label) -> np.ndarray:
    """CLRS classification CE (base_loss.py:96-113): softmax, pick the
    label class, mean over non-ignore (label != −1) entries normalized
    by the positive count."""
    output = np.asarray(output, dtype=np.float64)
    label = np.asarray(label)
    nc = (label == 1).sum()
    e = np.exp(output - output.max(axis=-1, keepdims=True))
    soft = e / e.sum(axis=-1, keepdims=True)
    pj = np.take_along_axis(soft, np.maximum(label, 0)[..., None], axis=-1)[..., 0]
    loss = -np.log(pj + 1e-5) * (label != -1)
    return _sum_keep_batch(loss) / (nc + 1e-5)


def box_iou_loss(box_pred, box_lab, box_mask, iou_loss_type: str = "iou", eps: float = 1e-12) -> np.ndarray:
    """IoU-family box loss (base_loss.py:119-183): (batch, n, 4)
    corner boxes, (batch, n) mask; variants iou/giou/diou/ciou."""
    p = np.asarray(box_pred, dtype=np.float64)
    t = np.asarray(box_lab, dtype=np.float64)
    m = np.asarray(box_mask, dtype=np.float64)
    pw = np.maximum(p[..., 2] - p[..., 0], 0)
    ph = np.maximum(p[..., 3] - p[..., 1], 0)
    tw = np.maximum(t[..., 2] - t[..., 0], 0)
    th = np.maximum(t[..., 3] - t[..., 1], 0)
    inter_w = np.maximum(np.minimum(p[..., 2], t[..., 2]) - np.maximum(p[..., 0], t[..., 0]), 0)
    inter_h = np.maximum(np.minimum(p[..., 3], t[..., 3]) - np.maximum(p[..., 1], t[..., 1]), 0)
    inter = inter_w * inter_h
    union = np.maximum(pw * ph + tw * th - inter, eps)
    iou = inter / union
    if iou_loss_type == "iou":
        return _sum_keep_batch((1 - iou) * m)
    ex0 = np.minimum(p[..., 0], t[..., 0])
    ey0 = np.minimum(p[..., 1], t[..., 1])
    ex1 = np.maximum(p[..., 2], t[..., 2])
    ey1 = np.maximum(p[..., 3], t[..., 3])
    if iou_loss_type == "giou":
        enclose = np.maximum(np.maximum(ex1 - ex0, 0) * np.maximum(ey1 - ey0, 0), eps)
        giou = iou - (enclose - union) / enclose
        return _sum_keep_batch((1 - giou) * m)
    pc = np.stack([(p[..., 0] + p[..., 2]) / 2, (p[..., 1] + p[..., 3]) / 2], axis=-1)
    tc = np.stack([(t[..., 0] + t[..., 2]) / 2, (t[..., 1] + t[..., 3]) / 2], axis=-1)
    euclid2 = ((tc - pc) ** 2).sum(axis=-1)
    diag2 = np.maximum((ex1 - ex0) ** 2 + (ey1 - ey0) ** 2, eps)
    diou = iou - euclid2 / diag2
    if iou_loss_type == "diou":
        return _sum_keep_batch((1 - diou) * m)
    # ciou — the reference branch is dead code (F.devide typo); this is
    # the published formula the code intends
    v = (4 / np.pi**2) * np.square(
        np.arctan(pw / np.maximum(ph, eps)) - np.arctan(tw / np.maximum(th, eps))
    )
    alpha = v / np.maximum(1 - iou + v, eps)
    ciou = diou - alpha * v
    return _sum_keep_batch((1 - ciou) * m)


# -- composites (det_loss.py:9-79) --------------------------------------------


def db_loss(binary, thresh, thresh_binary, gt, mask, thresh_map, thresh_mask,
            l1_scale: float = 10.0, bce_scale: float = 5.0) -> np.ndarray:
    """DBLoss (det_loss.py:9-31):
    dice(thresh_binary, gt, mask) + l1_scale·maskL1(thresh, thresh_map,
    thresh_mask) + bce_scale·balanceBCE(binary, gt, mask)."""
    bce = balance_ce_loss(binary, gt, mask)
    l1 = mask_l1_loss(thresh, thresh_map, thresh_mask)
    dice = dice_loss(thresh_binary, gt, mask)
    return dice + l1_scale * l1 + bce_scale * bce


def east_loss(score_pred, score_gt, score_mask, geo_pred, geo_gt9,
              lambd: float = 1.0, rho: float = 1.0, eps: float = 1e-6) -> np.ndarray:
    """EASTLoss (det_loss.py:33-60): balanceBCE on the score map +
    per-pixel Huber(ρ) over the 8 geometry channels, channel-MEANed,
    weighted by the norm channel (geo_gt channel 8) and the positive
    mask (lab_mask·lab_score), normalized by the positive count.
    ``geo_gt9`` is (batch, 9, H, W) with the norm on channel 8."""
    score_pred = np.asarray(score_pred, dtype=np.float64)
    score_gt = np.asarray(score_gt, dtype=np.float64)
    score_mask = np.asarray(score_mask, dtype=np.float64)
    geo_pred = np.asarray(geo_pred, dtype=np.float64)
    geo_gt9 = np.asarray(geo_gt9, dtype=np.float64)
    seg = balance_ce_loss(score_pred, score_gt, score_mask)
    norm_w = geo_gt9[:, 8:9]
    geo_gt = geo_gt9[:, :8]
    mask = score_mask * score_gt
    l1 = np.abs(geo_gt - geo_pred)
    l1 = np.where(l1 > rho, l1 - 0.5 * rho, (0.5 / rho) * np.square(l1))
    l1 = norm_w * l1.mean(axis=1, keepdims=True) * mask
    l1 = _sum_keep_batch(l1) / (_sum_keep_batch(mask) + eps)
    return lambd * seg + l1


def clrs_loss(cls_pred, cls_targ, box_pred, box_targ, box_mask, seg_pred, seg_gt, mask,
              lambd1: float = 1.0, lambd2: float = 1.0) -> np.ndarray:
    """CLRSLoss (det_loss.py:62-79): softmaxCE + λ1·maskSmoothL1 +
    λ2·dice."""
    return (
        softmax_ce_loss(cls_pred, cls_targ)
        + lambd1 * mask_smooth_l1_loss(box_pred, box_targ, box_mask)
        + lambd2 * dice_loss(seg_pred, seg_gt, mask)
    )


# -- G9: CTC loss ---------------------------------------------------------------


def ctc_loss(log_probs: np.ndarray, labels: list[int], blank: int) -> float:
    """Negative log-likelihood of ``labels`` under the CTC alignment
    model (the gluon.loss.CTCLoss the CRNN trainer calls,
    train_crnn.py:52) — standard log-domain forward algorithm over the
    blank-interleaved label sequence. ``log_probs`` is (T, voc) log
    softmax."""
    lp = np.asarray(log_probs, dtype=np.float64)
    ext = [blank]
    for s in labels:
        ext += [s, blank]
    n = len(ext)
    neg_inf = -np.inf
    alpha = np.full(n, neg_inf)
    alpha[0] = lp[0, ext[0]]
    if n > 1:
        alpha[1] = lp[0, ext[1]]

    def logsumexp(vals):
        m = max(vals)
        if m == neg_inf:
            return neg_inf
        return m + np.log(sum(np.exp(v - m) for v in vals))

    for t in range(1, lp.shape[0]):
        prev = alpha
        alpha = np.full(n, neg_inf)
        for i in range(n):
            cands = [prev[i]]
            if i >= 1:
                cands.append(prev[i - 1])
            if i >= 2 and ext[i] != blank and ext[i] != ext[i - 2]:
                cands.append(prev[i - 2])
            alpha[i] = logsumexp(cands) + lp[t, ext[i]]
    total = logsumexp([alpha[n - 1]] + ([alpha[n - 2]] if n > 1 else []))
    return float(-total)
