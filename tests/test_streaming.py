"""Structured Streaming: extraction parity with batch + windowed aggs."""

import pytest

from gluon_ocr_spark.kernels.extract import extract_document
from gluon_ocr_spark.sources.pages import make_pages, pages_dataframe
from gluon_ocr_spark.streaming.pipeline import hourly_event_counts, run_extract_stream


def test_stream_extract_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")

    pages_dataframe(spark, 30, seed=42, partitions=2).write.parquet(pages_dir)

    q = run_extract_stream(spark, pages_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)

    got = {r["url"]: r["text"] for r in spark.read.parquet(out_dir).select("url", "text").collect()}
    exp = {p["url"]: extract_document(p["html"]).text for p in make_pages(30, 42)}
    assert got == exp

    # restart with same checkpoint: no new data → no duplicates
    q2 = run_extract_stream(spark, pages_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 30


def test_hourly_event_counts_stream(spark, tmp_path, sf_dir):
    src = str(tmp_path / "events")
    spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", __import__("pyspark").sql.functions.col("ts").cast("timestamp")
    ).write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).parquet(src)
    agg = hourly_event_counts(stream)

    q = (
        agg.writeStream.format("memory")
        .queryName("hourly_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select sum(n_events) s from hourly_counts").collect()[0]["s"]
    exp = spark.read.parquet(src).count()
    assert got == exp
