"""Resize arithmetic (SURVEY §2.2 P3/P4, §2.5 C3) — exact formulas.

The reference scales detection boxes back through its resize math, so
the rounding rules are correctness-bearing (SURVEY §2.4 D10). Pinned
here as pure shape functions (no image libs needed — the engine's
payloads are HTML, but the formulas are part of the operator parity
surface and tested against hand-computed cases):

* :func:`det_resize_dims` — short side → ``min_scale``, other side
  ceil-rounded to a multiple of ``min_divisor``, capped at
  ``max_scale`` with re-derivation of the short side
  (``scripts/deploy/python_infer/demo.py:60-75``).
* :func:`recog_resize_dims` — height → ``short_side``; width scaled
  proportionally, ceil to ``divisor`` multiple or plain truncation
  with a cap, per the two reference variants
  (``scripts/recog/crnn/demo.py:51-59``;
  ``scripts/deploy/python_infer/demo.py:110-113``).
* :func:`rot90_if_tall` — rotate when h > 1.5·w (P7,
  ``demo.py:107-109``).
* :func:`width_sort_batches` — the C3 width-sort / fixed-batch /
  unsort bookkeeping (``demo.py:100-154``), returned as index plans.
"""

from __future__ import annotations

import math


def det_resize_dims(
    height: int, width: int, min_scale: int = 736, min_divisor: int = 32, max_scale: int = 3072
) -> tuple[int, int]:
    """(new_height, new_width) for the detection resize."""
    if height < width:
        new_height = min_scale
        new_width = int(math.ceil(new_height / height * width / min_divisor) * min_divisor)
        if new_width > max_scale:
            new_width = max_scale
            new_height = int(math.ceil(new_width / width * height / min_divisor) * min_divisor)
    else:
        new_width = min_scale
        new_height = int(math.ceil(new_width / width * height / min_divisor) * min_divisor)
        if new_height > max_scale:
            new_height = max_scale
            new_width = int(math.ceil(new_height / height * width / min_divisor) * min_divisor)
    return new_height, new_width


def recog_resize_dims(height: int, width: int, short_side: int = 32, max_scale: int = 1024) -> tuple[int, int]:
    """(new_height, new_width) for the recognition crop resize —
    deploy-demo variant: w' = trunc(w·short/h), capped."""
    new_w = int(width * short_side / height)
    if new_w > max_scale:
        new_w = max_scale
    return short_side, new_w


def recog_resize_dims_divisor(
    height: int, width: int, short_side: int = 32, min_divisor: int = 4, max_scale: int = 1440
) -> tuple[int, int]:
    """CRNN-demo variant: ceil width to a divisor multiple, or snap to
    (max_scale, short_side) for very wide crops."""
    if width / height > max_scale / short_side:
        return short_side, max_scale
    new_w = int(math.ceil(short_side / height * width / min_divisor) * min_divisor)
    return short_side, new_w


def rot90_if_tall(height: int, width: int, ratio: float = 1.5) -> tuple[int, int, bool]:
    """Rotate tall crops: returns (h, w, rotated)."""
    if height > width * ratio:
        return width, height, True
    return height, width, False


def width_sort_batches(widths: list[int], batch_size: int = 16) -> tuple[list[int], list[list[int]], list[int]]:
    """C3 batching plan: stable argsort by width asc, fixed-size
    batches, and the unsort permutation mapping batch outputs back to
    original crop order. Deterministic per document — the engine keeps
    this per-document so partitioning can never change batch
    composition (SURVEY §2.9.1)."""
    order = sorted(range(len(widths)), key=lambda i: (widths[i], i))
    batches = [order[i : i + batch_size] for i in range(0, len(order), batch_size)]
    unsort = [0] * len(order)
    for pos, original in enumerate(order):
        unsort[original] = pos
    return order, batches, unsort


def pad_to_canvas(img, size: tuple[int, int], layout: str = "CHW"):
    """P6 pad-to-canvas, reference-exact (detect_dataset.py:102-117
    ``padd_image``): a ZERO canvas of (size[0], size[1]) in the
    requested layout, the input copied top-left-anchored. The
    reference allocates with bare ``np.zeros`` — so the output dtype
    is float64 regardless of input dtype — and raises on unknown
    layouts; both behaviors are preserved. (Previously marked
    "subsumed by the C3 max-width plan": the batching plan sizes the
    canvas, this kernel actually builds it.)"""
    import numpy as np

    if layout == "CHW":
        c, h, w = img.shape
        new_img = np.zeros((c, size[0], size[1]))
        new_img[:, :h, :w] = img.copy()
    elif layout == "HWC":
        h, w, c = img.shape
        new_img = np.zeros((size[0], size[1], c))
        new_img[:h, :w, :] = img.copy()
    elif layout == "HW":
        h, w = img.shape
        new_img = np.zeros((size[0], size[1]))
        new_img[:h, :w] = img.copy()
    else:
        raise ValueError("Layout type is not support.")
    return new_img
