"""Streaming training-data generation — the G1/G2/G3 label pipeline
as a continuous job (the streaming twin of the batch label path, like
streaming/pipeline.py is for extraction).

The reference generates DBNet/EAST training targets inside a Dataset
``__getitem__`` (make_seg_data.py:14-230 via detect_dataset.py) — a
per-epoch batch loop. At lake scale, label corpora ARRIVE
continuously (new annotation drops, new crawls), so the engine lifts
the same kernels to Structured Streaming: ``readStream`` over the
label-row table → per-image ``applyInPandas`` computing shrink/border
maps (+ the seeded G3 crop plan) → ``foreachBatch`` parquet commits
keyed by epoch id. Restarts resume from the checkpoint: an epoch is
re-run only if its commit didn't finish, and the per-epoch output dir
is overwritten idempotently — the same exactly-once recipe as
``run_extract_stream_with_lineage``.

Everything is deterministic per (file, polygons): the G3 crop rng is
seeded from the md5 of the file name (the distributed-reproducibility
pattern of kernels/cropping.py), so a restart, a re-partitioning, or
a batch re-run all produce identical rows — pinned by
tests/test_streaming_labelgen.py against the batch oracle across a
mid-stream restart.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

LABEL_ROWS_SCHEMA = (
    "file string, x0 double, y0 double, x1 double, y1 double, "
    "x2 double, y2 double, x3 double, y3 double, text string, ignore boolean"
)

LABELGEN_SCHEMA = (
    "file string, n_polys int, n_ignored int, gt_pixels bigint, "
    "masked_out_pixels bigint, geo_norm_sum double, border_mean double, "
    "crop_x int, crop_y int, crop_w int, crop_h int"
)

CANVAS = (64, 64)


def _file_rng(file: str) -> np.random.Generator:
    digest = hashlib.md5(file.encode()).hexdigest()
    return np.random.default_rng(int(digest[:15], 16))


def _digest_one(file: str, pdf: pd.DataFrame) -> dict:
    from ..kernels.cropping import random_crop
    from ..kernels.labelgen import make_border_map, make_shrink_map

    polys = [
        np.array([[r.x0, r.y0], [r.x1, r.y1], [r.x2, r.y2], [r.x3, r.y3]])
        for r in pdf.itertuples()
    ]
    tags = [bool(v) for v in pdf["ignore"]]
    shrink = make_shrink_map(CANVAS, polys, tags, gen_geometry=True)
    border = make_border_map(CANVAS, polys, shrink["ignore_tags"])
    # G3: seeded crop plan over a deterministic pseudo-image (label
    # corpora carry no pixels; the crop GEOMETRY is the train-data
    # decision and is what must reproduce across restarts)
    rng = _file_rng(file)
    img = rng.normal(0.5, 0.1, size=(96, 96))
    crop = random_crop(img, polys, shrink["ignore_tags"], _file_rng(file + "#crop"), size=CANVAS)
    cx, cy, cw, ch = crop["crop"]
    return {
        "file": file,
        "n_polys": len(polys),
        "n_ignored": int(sum(shrink["ignore_tags"])),
        "gt_pixels": int(shrink["gt"].sum()),
        "masked_out_pixels": int((shrink["mask"] == 0).sum()),
        "geo_norm_sum": round(float(shrink["geo_map"][8].sum()), 6),
        "border_mean": round(float(border["thresh_map"].mean()), 6),
        "crop_x": int(cx),
        "crop_y": int(cy),
        "crop_w": int(cw),
        "crop_h": int(ch),
    }


def labelgen_digests(labels: DataFrame) -> DataFrame:
    """Batch transform label rows → per-image G1/G2/G3 digests.
    Grouped Arrow-batched applyInPandas: one group per image file —
    the label-row table shuffles once on the file key, maps stay
    whole-image local (they cannot be computed row-at-a-time)."""

    def per_file(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = [
            _digest_one(file, grp.sort_values(["x0", "y0", "x1", "y1"]))
            for file, grp in pdf.groupby("file", sort=True)
        ]
        return pd.DataFrame(rows)

    return labels.groupBy("file").applyInPandas(per_file, schema=LABELGEN_SCHEMA)


def run_labelgen_stream(
    spark: SparkSession,
    labels_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """readStream(label rows) → per-image digests → epoch-keyed
    parquet commits. Each epoch writes ``{out_dir}/epoch=<id>``
    with overwrite, so a replayed epoch (crash between sink write and
    checkpoint commit) is idempotent — no duplicate train rows."""
    labels = spark.readStream.schema(LABEL_ROWS_SCHEMA).parquet(labels_dir)

    def commit(batch_df: DataFrame, epoch_id: int) -> None:
        out = labelgen_digests(batch_df)
        out.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id:08d}")

    writer = labels.writeStream.foreachBatch(commit).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
