"""Pixel-space preprocessing (SURVEY §2.2 P1/P2/P5) — REAL channel /
tensor ops now that the engine decodes actual pixels (PNG/JPEG/BMP/
PPM via :mod:`.codecs`).

Round 1-2 carried these rows as text analogs (utf-8 decode
normalization); with the stdlib decoders landed they are the
reference's actual math:

* :func:`bgr_to_rgb` — detect path ``cv2.cvtColor(img,
  COLOR_BGR2RGB)`` (detect_dataset.py:62): channel reversal.
* :func:`rgb_to_gray` / :func:`bgr_to_gray` — recog path
  ``COLOR_BGR2GRAY`` (recog_dataset.py:129): ITU-R BT.601 luma
  ``0.299R + 0.587G + 0.114B`` rounded to uint8. (cv2 computes this
  in 14-bit fixed point — ``(R·4899 + G·9617 + B·1868 + 8192) >> 14``
  — which can differ from float rounding by 1 LSB on exact .5
  boundaries; this implementation uses the float form and documents
  the deviation.)
* :func:`gray_to_3ch` — ``np.stack([g, g, g], axis=2)``
  (recog_dataset.py:131): channel replicate so gray crops feed
  3-channel backbones.
* :func:`to_tensor` + :func:`normalize_imagenet` — the reference's
  ``normalize_fn`` (data/__init__.py:3-7): HWC uint8 → CHW float32
  /255, then per-channel ImageNet mean/std.
* :func:`preprocess_detect` / :func:`preprocess_recog` — the full
  per-image chains the two datasets run before batching.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "bgr_to_rgb",
    "rgb_to_gray",
    "bgr_to_gray",
    "gray_to_3ch",
    "to_tensor",
    "normalize_imagenet",
    "preprocess_detect",
    "preprocess_recog",
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float64)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float64)


def bgr_to_rgb(img: np.ndarray) -> np.ndarray:
    """P1 (detect): reverse the channel axis. Involution."""
    return img[:, :, ::-1].copy()


def rgb_to_gray(img: np.ndarray) -> np.ndarray:
    """BT.601 luma of an RGB image → (H, W) uint8."""
    y = img[:, :, 0] * 0.299 + img[:, :, 1] * 0.587 + img[:, :, 2] * 0.114
    return np.clip(np.rint(y), 0, 255).astype(np.uint8)


def bgr_to_gray(img: np.ndarray) -> np.ndarray:
    """P1 (recog): cv2.COLOR_BGR2GRAY semantics on a BGR image."""
    return rgb_to_gray(img[:, :, ::-1])


def gray_to_3ch(gray: np.ndarray) -> np.ndarray:
    """P2: replicate a (H, W) gray plane to (H, W, 3)."""
    g = gray if gray.ndim == 2 else gray[:, :, 0]
    return np.stack([g, g, g], axis=2)


def to_tensor(img: np.ndarray) -> np.ndarray:
    """mx ``ToTensor``: (H, W, C) uint8 → (C, H, W) float32 in [0,1]."""
    return (np.asarray(img, dtype=np.float32) / 255.0).transpose(2, 0, 1)


def normalize_imagenet(chw: np.ndarray) -> np.ndarray:
    """mx ``Normalize(mean, std)`` with the ImageNet constants the
    reference pins (data/__init__.py:5-6). Input CHW float."""
    return (chw - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]


def preprocess_detect(pixels: np.ndarray, assume_bgr: bool = False) -> np.ndarray:
    """Detect-path chain (detect_dataset.py:58-92): [BGR→RGB if the
    source decoder emits BGR — cv2 does, this engine's stdlib
    decoders emit RGB already] → ToTensor → ImageNet normalize.
    Returns (3, H, W) float."""
    img = pixels
    if img.ndim == 2 or img.shape[2] == 1:
        img = gray_to_3ch(img)
    elif img.shape[2] == 4:
        img = img[:, :, :3]
    if assume_bgr:
        img = bgr_to_rgb(img)
    return normalize_imagenet(to_tensor(img))


def preprocess_recog(pixels: np.ndarray, assume_bgr: bool = False) -> np.ndarray:
    """Recog-path chain (recog_dataset.py:125-135): gray → ×3 →
    ToTensor → normalize. Returns (3, H, W) float."""
    img = pixels
    if img.ndim == 3 and img.shape[2] >= 3:
        img = bgr_to_gray(img) if assume_bgr else rgb_to_gray(img[:, :, :3])
    elif img.ndim == 3:
        img = img[:, :, 0]
    return normalize_imagenet(to_tensor(gray_to_3ch(img)))
