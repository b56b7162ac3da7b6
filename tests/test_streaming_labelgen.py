"""Streaming G1/G2/G3 training-data generation vs the batch oracle,
across a mid-stream restart (VERDICT r2 item 8)."""

import os

import pytest


def _label_rows(files, n_boxes=2):
    rows = []
    for fi, f in enumerate(files):
        for b in range(n_boxes):
            x0, y0 = 6 + 11 * b + fi, 8 + 13 * b
            w, h = 16 + 2 * b, 12 + 3 * b
            rows.append(
                (f, float(x0), float(y0), float(x0 + w), float(y0),
                 float(x0 + w), float(y0 + h), float(x0), float(y0 + h),
                 f"t{b}", b == 1 and fi % 2 == 0)
            )
    return rows


def _collect(spark, out_dir):
    df = spark.read.parquet(f"{out_dir}/epoch=*")
    return {r["file"]: r.asDict() for r in df.collect()}


def test_labelgen_stream_matches_batch_across_restart(spark, tmp_path):
    from gluon_ocr_spark.streaming.labelgen import (
        LABEL_ROWS_SCHEMA,
        labelgen_digests,
        run_labelgen_stream,
    )

    labels_dir = str(tmp_path / "labels")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(labels_dir)

    chunk1 = _label_rows(["img_a.txt", "img_b.txt"])
    spark.createDataFrame(chunk1, LABEL_ROWS_SCHEMA).coalesce(1).write.parquet(
        f"{labels_dir}/chunk1.parquet"
    )
    q = run_labelgen_stream(spark, f"{labels_dir}/*", out_dir, ckpt)
    q.awaitTermination(120)

    got1 = _collect(spark, out_dir)
    assert set(got1) == {"img_a.txt", "img_b.txt"}

    # second drop arrives; RESTART the stream from the same checkpoint
    chunk2 = _label_rows(["img_c.txt", "img_d.txt"], n_boxes=3)
    spark.createDataFrame(chunk2, LABEL_ROWS_SCHEMA).coalesce(1).write.parquet(
        f"{labels_dir}/chunk2.parquet"
    )
    q = run_labelgen_stream(spark, f"{labels_dir}/*", out_dir, ckpt)
    q.awaitTermination(120)

    got = _collect(spark, out_dir)
    assert set(got) == {"img_a.txt", "img_b.txt", "img_c.txt", "img_d.txt"}
    # restart did NOT reprocess chunk1 rows into duplicates
    total_rows = spark.read.parquet(f"{out_dir}/epoch=*").count()
    assert total_rows == 4

    # batch oracle over the full corpus: identical digests per file
    batch = {
        r["file"]: r.asDict()
        for r in labelgen_digests(
            spark.read.schema(LABEL_ROWS_SCHEMA).parquet(f"{labels_dir}/*")
        ).collect()
    }
    assert batch == got

    # digests are real: boxes produce nonzero maps, crop plan in canvas
    for row in got.values():
        assert row["gt_pixels"] > 0
        assert 0 <= row["crop_x"] and 0 <= row["crop_y"]
        assert row["crop_w"] > 0 and row["crop_h"] > 0


def test_labelgen_digests_partition_invariant(spark):
    from gluon_ocr_spark.streaming.labelgen import LABEL_ROWS_SCHEMA, labelgen_digests

    rows = _label_rows([f"im_{i}.txt" for i in range(6)], n_boxes=3)
    df1 = spark.createDataFrame(rows, LABEL_ROWS_SCHEMA).repartition(1)
    df8 = spark.createDataFrame(list(reversed(rows)), LABEL_ROWS_SCHEMA).repartition(8)
    a = {r["file"]: r.asDict() for r in labelgen_digests(df1).collect()}
    b = {r["file"]: r.asDict() for r in labelgen_digests(df8).collect()}
    assert a == b
