"""Label-corpus scans (SURVEY §2.1 S3/S4) — distributed readers for
the reference's annotation formats.

* Detection labels (``detect_dataset.py:131-150`` ``_load_ann``): one
  CSV line per box — the first 8 fields are the quad coords, the
  REMAINDER rejoined with ',' is the transcription (text may itself
  contain commas), ``###`` or empty text ⇒ ignore, unparseable
  coordinate lines are dropped. DOCUMENTED DEVIATION: lines with
  fewer than 8 coordinate fields are dropped too, whereas the
  reference keeps them as short (k,2) polygons with ignore=True —
  those rows crash the reference's own downstream label generation
  (make_seg_data.py indexes polygon[3] before consulting the ignore
  tag), so the reader refuses them instead of replicating a latent
  crash; the 8-coord row shape also keeps the scan a fixed-width
  columnar projection.
* Recognition label lists (``recog_dataset.py:48-70`` ``_get_items``):
  TSV ``img_path\\tlabel`` lines; rows with <2 fields, empty labels,
  ``###`` sentinels, or labels longer than ``max_len`` are dropped.
  (The reference also stat()s each image path; a lake reader defers
  existence to the payload join — documented deviation.)

Both readers are pure-expression DataFrames over ``spark.read.text``
(+ ``input_file_name``) — at 10^12 label lines this is an ordinary
columnar scan with pushdown, no Python in the loop. The kernel twins
(:func:`parse_detect_label_line`) exist for oracles/tests."""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["parse_detect_label_line", "read_detect_labels", "read_recog_labels"]


def parse_detect_label_line(line: str) -> tuple[np.ndarray, bool] | None:
    """Kernel twin of the Spark expressions below (reference
    _load_ann semantics for ONE line)."""
    lst = line.strip().split(",")
    try:
        points = [float(v) for v in lst[:8]]
    except ValueError:
        return None
    if len(points) < 8:
        return None
    text = ",".join(lst[8:])
    return np.array(points).reshape(4, 2), text == "###" or text == ""


def read_detect_labels(spark: SparkSession, path_glob: str) -> DataFrame:
    """Detection-label scan → (file, x0..y3 double, text, ignore)."""
    lines = spark.read.text(path_glob).select(
        F.input_file_name().alias("file"), F.trim(F.col("value")).alias("line")
    )
    parts = F.split(F.col("line"), ",")
    # try_cast: unparseable coords become NULL and are filtered (the
    # reference's try/except skip) — a plain cast THROWS under the
    # ANSI mode Spark 4 defaults to
    coords = [
        F.element_at(parts, i + 1).try_cast("double").alias(c)
        for i, c in enumerate(("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3"))
    ]
    # text = remainder REJOINED with ',' (transcriptions may contain commas)
    text = F.array_join(F.slice(parts, 9, F.greatest(F.size(parts) - 8, F.lit(0))), ",")
    df = lines.where(F.length("line") > 0).select("file", *coords, text.alias("text"))
    # unparseable coordinate lines are dropped, like the reference's try/except
    cond = None
    for c in ("x0", "y0", "x1", "y1", "x2", "y2", "x3", "y3"):
        cnd = F.col(c).isNotNull()
        cond = cnd if cond is None else (cond & cnd)
    return df.where(cond).withColumn(
        "ignore", (F.col("text") == "###") | (F.col("text") == "")
    )


def read_recog_labels(spark: SparkSession, path_glob: str, max_len: int = 60) -> DataFrame:
    """Recognition label-list scan → (file, img_path, label)."""
    lines = spark.read.text(path_glob).select(
        F.input_file_name().alias("file"), F.trim(F.col("value")).alias("line")
    )
    parts = F.split(F.col("line"), "\t")
    df = lines.select(
        "file",
        F.element_at(parts, 1).alias("img_path"),
        F.element_at(parts, 2).alias("label"),
        F.size(parts).alias("_n"),
    )
    return (
        df.where(
            (F.col("_n") >= 2)
            & (F.col("label") != "")
            & (F.col("label") != "###")
            & (F.length("label") <= max_len)
        )
        .drop("_n")
    )
