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


def test_media_metadata_streams(spark, tmp_path):
    """The multimodal decode path runs unchanged under Structured
    Streaming (mapInPandas is streaming-capable): a file stream of
    binary payloads yields real stdlib decodes per micro-batch."""
    import numpy as np

    from gluon_ocr_spark.kernels.codecs import encode_png, encode_wav
    from gluon_ocr_spark.operators.multimodal import media_metadata

    src = str(tmp_path / "media")
    rows = [
        ("p1", encode_png(np.arange(300, dtype=np.uint8).reshape(10, 10, 3))),
        ("w1", encode_wav(np.arange(64, dtype=np.int16))),
        ("j1", b"\xff\xd8\xff\xe0junk"),
    ]
    spark.createDataFrame(rows, "media_id string, payload binary").write.parquet(src)

    stream = spark.readStream.schema("media_id string, payload binary").parquet(src)
    q = (
        media_metadata(stream)
        .writeStream.format("memory")
        .queryName("media_meta_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["media_id"]: r for r in spark.sql("select * from media_meta_stream").collect()}
    assert got["p1"]["decoder"] == "stdlib-png" and got["p1"]["width"] == 10
    assert got["w1"]["decoder"] == "stdlib-wav" and got["w1"]["n_frames"] == 64
    assert got["j1"]["decoder"] == "fake-deterministic"


def test_dedup_stream_drops_in_horizon_duplicates(spark, tmp_path):
    """Streaming exact dedup: duplicate urls arriving within the
    watermark horizon collapse to one row; state is keyed+bounded."""
    import datetime as dt

    from gluon_ocr_spark.streaming.pipeline import dedup_stream

    src = str(tmp_path / "docs_in")
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        ("http://a", base, "one"),
        ("http://a", base + dt.timedelta(minutes=5), "dup-in-horizon"),
        ("http://b", base + dt.timedelta(minutes=1), "two"),
        ("http://b", base + dt.timedelta(minutes=2), "dup2"),
        ("http://c", base + dt.timedelta(minutes=3), "three"),
    ]
    spark.createDataFrame(rows, "url string, warc_ts timestamp, text string").write.parquet(src)

    stream = spark.readStream.schema("url string, warc_ts timestamp, text string").parquet(src)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select url, count(*) n from dedup_stream_out group by url").collect()
    assert {r["url"]: r["n"] for r in got} == {"http://a": 1, "http://b": 1, "http://c": 1}
