"""Bucket batching (SURVEY §2.7 G5) — the recognition dataloader's
bucket-key + bucketed-batch plan, re-expressed for the engine.

Reference: ``gluonocr/data/recog_dataset.py:150-220`` (BucketDataset.
_get_bucket_key / gen_bucket) and ``:295-361`` (BucketSampler).

* :func:`bucket_key` — the exact key math: tall crops swap h/w; crops
  wider than ``max_width/short_side`` aspect snap to the max bucket;
  width buckets are ``ceil(short·w/h / 128)·128``; text-length buckets
  are ``ceil((len+1)/10)·10``.
* :func:`bucket_key_sql` — the SAME math as a dual-dialect SQL
  expression (integer ceil via ``-floordiv(-a, b)``), so bucket
  assignment over a 10^12-row crop table is one JVM-side projection —
  at scale you ``repartition(bucket_key)`` or write
  ``bucketBy(bucket_key)`` and every training batch reads one bucket.
* :func:`bucket_batches` — the sampler as a deterministic plan:
  seeded shuffles within and across buckets, fixed-size batches,
  keep/discard last-batch semantics (random module seeded instead of
  global state — same algorithm, reproducible).
"""

from __future__ import annotations

import math
import random

__all__ = ["bucket_key", "bucket_key_sql", "bucket_batches"]


def bucket_key(
    h: int,
    w: int,
    text_len: int,
    short_side: int = 32,
    split_width_len: int = 128,
    split_text_len: int = 10,
    max_width: int = 1024,
) -> tuple[int, int, int]:
    """(short_side, bucketed_width, bucketed_text_len) — reference
    _get_bucket_key (recog_dataset.py:164-174)."""
    text_ratio = math.ceil((text_len + 1) / split_text_len)
    tl = split_text_len * text_ratio
    if h > w:
        w, h = h, w
    if w / h > max_width / short_side:
        return (short_side, max_width, tl)
    ratio = math.ceil(short_side * w / h / split_width_len)
    return (short_side, split_width_len * ratio, tl)


def bucket_key_sql(
    h: str,
    w: str,
    text_len: str,
    d: str,
    short_side: int = 32,
    split_width_len: int = 128,
    split_text_len: int = 10,
    max_width: int = 1024,
) -> tuple[str, str]:
    """(bucket_w, bucket_len) SQL expressions, identical in Spark SQL
    and DuckDB. Integer ceil(a/b) = -((-a) DIV b); the aspect test and
    width bucket run on the swapped (max, min) dims like the kernel."""
    div = "DIV" if d == "spark" else "//"
    big = f"greatest({h}, {w})"
    small = f"least({h}, {w})"
    tl = f"((({text_len}) + {split_text_len}) {div} {split_text_len}) * {split_text_len}"
    # ceil(short*w/h / split) * split on exact integers:
    # ceil(short*w, h*split) = (short*w + h*split - 1) DIV (h*split)
    ratio = f"(({short_side} * {big} + {small} * {split_width_len} - 1) {div} ({small} * {split_width_len}))"
    bw = (
        f"(CASE WHEN {short_side} * {big} > {max_width} * {small} "
        f"THEN {max_width} ELSE {split_width_len} * {ratio} END)"
    )
    return bw, tl


def bucket_batches(
    items: list[tuple[int, tuple[int, int, int]]],
    batch_size: int,
    seed: int = 0,
    last_batch: str = "discard",
) -> list[list[int]]:
    """BucketSampler as a deterministic plan (recog_dataset.py:295-347):
    group item ids by key, shuffle within each bucket and the bucket
    order, then repeatedly pick a random non-exhausted bucket and cut a
    fixed-size batch from it; a short final cut is kept or discarded.
    ``items`` = [(item_id, bucket_key)]."""
    rng = random.Random(seed)
    buckets: dict[tuple, list[int]] = {}
    order: list[tuple] = []
    for item_id, key in items:
        if key not in buckets:
            buckets[key] = []
            order.append(key)
        buckets[key].append(item_id)
    samplers = [buckets[k] for k in order]
    for s in samplers:
        rng.shuffle(s)
    rng.shuffle(samplers)
    starts = [0] * len(samplers)
    live = list(range(len(samplers)))
    out: list[list[int]] = []
    while live:
        si = rng.sample(live, 1)[0]
        sampler, start = samplers[si], starts[si]
        batch: list[int] = []
        while True:
            if len(batch) == batch_size:
                starts[si] = start
                break
            if start < len(sampler):
                batch.append(sampler[start])
                start += 1
            else:
                live.remove(si)
                if last_batch == "discard":
                    batch = []
                break
        if batch:
            out.append(batch)
    return out
