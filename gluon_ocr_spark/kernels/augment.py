"""G4 training-data augmentation — seeded NumPy re-expression of the
reference's imgaug pipelines (``gluonocr/data/detect_augment.py:10-65``
MaskAugmenter/PointAugmenter defaults, ``recog_augment.py:6-39``
Augmenter defaults). No imgaug/cv2: the pixel ops are closed-form
array math, the geometric ops drive the same zero-pad bilinear
sampler the STN uses (:func:`.nets.bilinear_sampler`), and every
random draw comes from a caller-supplied ``numpy.random.Generator``
so a per-row md5-derived seed makes the whole pipeline reproducible
on any executor, any partitioning (the G3 RandomCropData pattern,
:mod:`.cropping`).

Semantics re-expressed (NOT a bit-for-bit imgaug port — imgaug's
internal sampling order is library detail, the DATA transform is
what the reference pipeline needs):

* LinearContrast(a):  ``127 + a·(x−127)`` per imgaug's contrast docs;
* Multiply(m), Add(v[, per-channel]): elementwise, uint8-saturated;
* GaussianBlur(σ): separable truncated-at-3σ normalized kernel,
  reflect padding; σ≈0 is the identity (imgaug draws σ from (0, s));
* Grayscale(α): blend toward ITU-R BT.601 luma;
* Affine rotate(θ): inverse-map about the image center through the
  zero-pad bilinear sampler, canvas size kept (imgaug default);
  keypoints take the forward map — image and polygons stay paired,
  the PointAugmenter ``to_deterministic()`` contract;
* Fliplr: ``x → w−1−x`` for pixels AND keypoints;
* Resize(s): bilinear scale, keypoints multiplied.

The detect pipeline draws SomeOf(3 of 4) pixel ops + SomeOf(1 of 3)
geometric ops in a random order; the recog pipeline SomeOf(4 of 6) —
the reference's default sequences, same op inventories, same
parameter ranges.
"""

from __future__ import annotations

import numpy as np

from .nets import bilinear_sampler

__all__ = [
    "linear_contrast",
    "multiply_brightness",
    "add_bias",
    "gaussian_blur",
    "grayscale",
    "affine_rotate",
    "fliplr",
    "resize_scale",
    "augment_detect",
    "augment_mask",
    "augment_from_config",
    "augment_recog",
]


def _u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# pixel ops (image (H, W, C) uint8)
# ---------------------------------------------------------------------------


def linear_contrast(img: np.ndarray, alpha: float) -> np.ndarray:
    """iaa.LinearContrast: scale distances from the uint8 midpoint."""
    return _u8(127.0 + alpha * (img.astype(np.float64) - 127.0))


def multiply_brightness(img: np.ndarray, m: float) -> np.ndarray:
    return _u8(img.astype(np.float64) * m)


def add_bias(img: np.ndarray, v: float | np.ndarray) -> np.ndarray:
    """iaa.Add; pass a (C,) array for the per-channel variant."""
    return _u8(img.astype(np.float64) + np.asarray(v, dtype=np.float64))


def _gauss_kernel(sigma: float) -> np.ndarray:
    radius = max(int(round(3.0 * sigma)), 1)
    xs = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(xs**2) / (2.0 * sigma * sigma))
    return k / k.sum()


def gaussian_blur(img: np.ndarray, sigma: float) -> np.ndarray:
    """Separable Gaussian, reflect padding; σ < 1e-3 → identity
    (imgaug draws σ from (0, s) so ~0 must be a no-op)."""
    if sigma < 1e-3:
        return img.copy()
    k = _gauss_kernel(sigma)
    r = len(k) // 2
    out = img.astype(np.float64)
    if out.ndim == 2:
        out = out[:, :, None]
    pad = np.pad(out, ((r, r), (0, 0), (0, 0)), mode="reflect")
    out = sum(k[i] * pad[i : i + out.shape[0]] for i in range(len(k)))
    pad = np.pad(out, ((0, 0), (r, r), (0, 0)), mode="reflect")
    out = sum(k[i] * pad[:, i : i + out.shape[1]] for i in range(len(k)))
    if img.ndim == 2:
        out = out[:, :, 0]
    return _u8(out)


def grayscale(img: np.ndarray, alpha: float) -> np.ndarray:
    """iaa.Grayscale: blend α of BT.601 luma into each channel."""
    luma = img.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    return _u8((1.0 - alpha) * img.astype(np.float64) + alpha * luma[:, :, None])


# ---------------------------------------------------------------------------
# geometric ops (image + polygons move together)
# ---------------------------------------------------------------------------


def _sample_affine(img: np.ndarray, inv: np.ndarray) -> np.ndarray:
    """Resample with the inverse map through the STN's zero-pad
    bilinear sampler: target pixel (i,j) reads source inv·(j,i,1)."""
    h, w = img.shape[:2]
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    sx = inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]
    sy = inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]
    # normalized grid for bilinear_sampler
    gx = sx * 2.0 / max(w - 1, 1) - 1.0
    gy = sy * 2.0 / max(h - 1, 1) - 1.0
    grid = np.stack([gx, gy])[None]
    chw = np.moveaxis(img.astype(np.float64), -1, 0)[None] if img.ndim == 3 else img[None, None].astype(np.float64)
    out = bilinear_sampler(chw, grid)[0]
    out = np.moveaxis(out, 0, -1) if img.ndim == 3 else out[0]
    return _u8(out)


def affine_rotate(
    img: np.ndarray, polys: list[np.ndarray], degrees: float
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Rotate about the image center, canvas size kept; polygons get
    the forward map so they track their pixels exactly."""
    h, w = img.shape[:2]
    t = np.deg2rad(degrees)
    c, s = np.cos(t), np.sin(t)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    fwd = np.array([[c, -s, cx - c * cx + s * cy], [s, c, cy - s * cx - c * cy]])
    inv = np.array([[c, s, cx - c * cx - s * cy], [-s, c, cy + s * cx - c * cy]])
    out = _sample_affine(img, inv)
    moved = [
        np.stack(
            [
                fwd[0, 0] * p[:, 0] + fwd[0, 1] * p[:, 1] + fwd[0, 2],
                fwd[1, 0] * p[:, 0] + fwd[1, 1] * p[:, 1] + fwd[1, 2],
            ],
            axis=1,
        )
        for p in (np.asarray(p, dtype=np.float64) for p in polys)
    ]
    return out, moved


def fliplr(img: np.ndarray, polys: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    w = img.shape[1]
    moved = []
    for p in polys:
        p = np.asarray(p, dtype=np.float64).copy()
        p[:, 0] = (w - 1) - p[:, 0]
        moved.append(p)
    return img[:, ::-1].copy(), moved


def resize_scale(
    img: np.ndarray, polys: list[np.ndarray], scale: float
) -> tuple[np.ndarray, list[np.ndarray]]:
    """Bilinear resize by ``scale`` (both axes); keypoints multiply."""
    h, w = img.shape[:2]
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    # inverse map: target (i,j) samples source (j/sx, i/sy)
    sx_f = (w - 1) / max(nw - 1, 1)
    sy_f = (h - 1) / max(nh - 1, 1)
    xs, ys = np.meshgrid(np.arange(nw, dtype=np.float64), np.arange(nh, dtype=np.float64))
    gx = (xs * sx_f) * 2.0 / max(w - 1, 1) - 1.0
    gy = (ys * sy_f) * 2.0 / max(h - 1, 1) - 1.0
    grid = np.stack([gx, gy])[None]
    chw = np.moveaxis(img.astype(np.float64), -1, 0)[None] if img.ndim == 3 else img[None, None].astype(np.float64)
    out = bilinear_sampler(chw, grid)[0]
    out = np.moveaxis(out, 0, -1) if img.ndim == 3 else out[0]
    moved = [np.asarray(p, dtype=np.float64) * scale for p in polys]
    return _u8(out), moved


# ---------------------------------------------------------------------------
# the reference default pipelines, seeded
# ---------------------------------------------------------------------------


def augment_detect(
    img: np.ndarray, polys: list[np.ndarray], rng: np.random.Generator
) -> tuple[np.ndarray, list[np.ndarray], dict]:
    """MaskAugmenter/PointAugmenter default sequence
    (detect_augment.py:35-47): SomeOf(3, [LinearContrast(.8-1.2),
    Multiply(.8-1.2), GaussianBlur(0-1), Add(±10, per_channel 0.2)])
    then SomeOf(1, [Affine(rotate ±10), Fliplr(.5), Resize(.5-3)]),
    the two groups in random order. Returns (img, polys, applied) —
    ``applied`` records the drawn ops/params for test assertions."""
    applied: dict = {}

    def pixel_group(im: np.ndarray) -> np.ndarray:
        chosen = sorted(rng.choice(4, size=3, replace=False).tolist())
        applied["pixel_ops"] = chosen
        for op in chosen:
            if op == 0:
                a = float(rng.uniform(0.8, 1.2))
                applied["contrast"] = a
                im = linear_contrast(im, a)
            elif op == 1:
                m = float(rng.uniform(0.8, 1.2))
                applied["multiply"] = m
                im = multiply_brightness(im, m)
            elif op == 2:
                s = float(rng.uniform(0.0, 1.0))
                applied["blur_sigma"] = s
                im = gaussian_blur(im, s)
            else:
                per_channel = bool(rng.random() < 0.2)
                v = (
                    rng.uniform(-10, 10, size=img.shape[2] if img.ndim == 3 else 1)
                    if per_channel
                    else float(rng.uniform(-10, 10))
                )
                applied["add"] = v
                im = add_bias(im, v)
        return im

    def geom_group(im: np.ndarray, ps: list[np.ndarray]):
        op = int(rng.integers(0, 3))
        applied["geom_op"] = op
        if op == 0:
            deg = float(rng.uniform(-10, 10))
            applied["rotate_deg"] = deg
            return affine_rotate(im, ps, deg)
        if op == 1:
            if rng.random() < 0.5:
                applied["flipped"] = True
                return fliplr(im, ps)
            applied["flipped"] = False
            return im, [np.asarray(p, dtype=np.float64) for p in ps]
        sc = float(rng.uniform(0.5, 3.0))
        applied["resize_scale"] = sc
        return resize_scale(im, ps, sc)

    pixel_first = bool(rng.random() < 0.5)
    applied["pixel_first"] = pixel_first
    if pixel_first:
        img = pixel_group(img)
        img, polys = geom_group(img, polys)
    else:
        img, polys = geom_group(img, polys)
        img = pixel_group(img)
    return img, polys, applied


def _nearest_affine_mask(mask: np.ndarray, inv: np.ndarray) -> np.ndarray:
    """Resample an integer label mask with the inverse map using
    NEAREST sampling (bilinear would invent fractional labels — the
    SegmentationMapsOnImage contract of MaskAugmenter)."""
    h, w = mask.shape[:2]
    xs, ys = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    sx = np.rint(inv[0, 0] * xs + inv[0, 1] * ys + inv[0, 2]).astype(int)
    sy = np.rint(inv[1, 0] * xs + inv[1, 1] * ys + inv[1, 2]).astype(int)
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    out = np.zeros_like(mask)
    out[valid] = mask[np.clip(sy, 0, h - 1), np.clip(sx, 0, w - 1)][valid]
    return out


def augment_mask(
    img: np.ndarray, mask: np.ndarray, rng: np.random.Generator
) -> tuple[np.ndarray, np.ndarray, dict]:
    """MaskAugmenter (detect_augment.py:10-47): the same default
    sequence as :func:`augment_detect`, but the paired label is a
    SEGMENTATION MASK (the gt/thresh maps of G1/G2), moved through
    the same geometric draw with nearest sampling — pixel ops touch
    the image only. Returns (img, mask, applied)."""
    applied: dict = {}
    h, w = img.shape[:2]

    def pixel_group(im: np.ndarray) -> np.ndarray:
        chosen = sorted(rng.choice(4, size=3, replace=False).tolist())
        applied["pixel_ops"] = chosen
        for op in chosen:
            if op == 0:
                im = linear_contrast(im, float(rng.uniform(0.8, 1.2)))
            elif op == 1:
                im = multiply_brightness(im, float(rng.uniform(0.8, 1.2)))
            elif op == 2:
                im = gaussian_blur(im, float(rng.uniform(0.0, 1.0)))
            else:
                im = add_bias(im, float(rng.uniform(-10, 10)))
        return im

    def geom_group(im: np.ndarray, mk: np.ndarray):
        op = int(rng.integers(0, 3))
        applied["geom_op"] = op
        if op == 0:
            deg = float(rng.uniform(-10, 10))
            applied["rotate_deg"] = deg
            t = np.deg2rad(deg)
            c, s = np.cos(t), np.sin(t)
            cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
            inv = np.array([[c, s, cx - c * cx - s * cy], [-s, c, cy + s * cx - c * cy]])
            out, _ = affine_rotate(im, [], deg)
            return out, _nearest_affine_mask(mk, inv)
        if op == 1:
            if rng.random() < 0.5:
                applied["flipped"] = True
                return im[:, ::-1].copy(), mk[:, ::-1].copy()
            applied["flipped"] = False
            return im, mk
        sc = float(rng.uniform(0.5, 3.0))
        applied["resize_scale"] = sc
        out, _ = resize_scale(im, [], sc)
        nh, nw = out.shape[:2]
        # nearest resize of the mask to the same canvas
        yi = np.clip(np.rint(np.arange(nh) * (h - 1) / max(nh - 1, 1)).astype(int), 0, h - 1)
        xi = np.clip(np.rint(np.arange(nw) * (w - 1) / max(nw - 1, 1)).astype(int), 0, w - 1)
        return out, mk[yi][:, xi]

    pixel_first = bool(rng.random() < 0.5)
    applied["pixel_first"] = pixel_first
    if pixel_first:
        img = pixel_group(img)
        img, mask = geom_group(img, mask)
    else:
        img, mask = geom_group(img, mask)
        img = pixel_group(img)
    return img, mask, applied


# op registry for the config-driven constructor (the reference's
# get_aug_seq accepts [(iaa_name, params)] lists — same surface here,
# limited to the ops the engine implements)
_CONFIG_OPS = {
    "LinearContrast": lambda im, rng, a: linear_contrast(im, _draw(rng, a)),
    "Multiply": lambda im, rng, a: multiply_brightness(im, _draw(rng, a)),
    "GaussianBlur": lambda im, rng, a: gaussian_blur(im, _draw(rng, a)),
    "Add": lambda im, rng, a: add_bias(im, _draw(rng, a)),
    "Grayscale": lambda im, rng, a: grayscale(im, _draw(rng, a)),
}


def _draw(rng: np.random.Generator, arg) -> float:
    if isinstance(arg, (tuple, list)):
        lo, hi = arg
        return float(rng.uniform(lo, hi))
    return float(arg)


def augment_from_config(
    img: np.ndarray, configs: list, rng: np.random.Generator
) -> np.ndarray:
    """Config-driven pixel sequence (detect_augment.py:22-33 /
    recog_augment.py:17-28 ``get_aug_seq``): ``configs`` is a list of
    ``(op_name, param)`` pairs applied in a seeded random order
    (``random_order=True`` in the reference). Unknown op names raise
    ValueError — same contract as the reference's getattr(iaa, ...)"""
    order = rng.permutation(len(configs))
    for idx in order:
        name, param = configs[int(idx)]
        if name not in _CONFIG_OPS:
            raise ValueError(f"unsupported augmenter {name!r}")
        img = _CONFIG_OPS[name](img, rng, param)
    return img


def augment_recog(img: np.ndarray, rng: np.random.Generator) -> tuple[np.ndarray, dict]:
    """recog_augment.py default sequence: SomeOf(4, [LinearContrast
    (.8-1.2), Grayscale(.5-1), GaussianBlur(0-2), Multiply(.8-1.2),
    Add(±15, per_channel .5), Affine(rotate ±5)], random_order).
    Line crops carry no polygons, so rotate moves pixels only."""
    applied: dict = {}
    chosen = rng.permutation(6)[:4].tolist()
    applied["ops"] = [int(o) for o in chosen]
    for op in chosen:
        if op == 0:
            a = float(rng.uniform(0.8, 1.2))
            applied["contrast"] = a
            img = linear_contrast(img, a)
        elif op == 1:
            g = float(rng.uniform(0.5, 1.0))
            applied["gray"] = g
            img = grayscale(img, g)
        elif op == 2:
            s = float(rng.uniform(0.0, 2.0))
            applied["blur_sigma"] = s
            img = gaussian_blur(img, s)
        elif op == 3:
            m = float(rng.uniform(0.8, 1.2))
            applied["multiply"] = m
            img = multiply_brightness(img, m)
        elif op == 4:
            per_channel = bool(rng.random() < 0.5)
            v = (
                rng.uniform(-15, 15, size=img.shape[2] if img.ndim == 3 else 1)
                if per_channel
                else float(rng.uniform(-15, 15))
            )
            applied["add"] = v
            img = add_bias(img, v)
        else:
            deg = float(rng.uniform(-5, 5))
            applied["rotate_deg"] = deg
            img, _ = affine_rotate(img, [], deg)
    return img, applied
