"""Streaming corpus-prep: extract → quality gates → watermark exact
dedup as one continuous job, vs the batch pipeline across a restart."""

import datetime as dt
import os

from pyspark.sql import functions as F

from gluon_ocr_spark.sources.pages import wrap_text_as_page
from gluon_ocr_spark.streaming.pipeline import corpus_prep_stream

BASE = dt.datetime(2024, 5, 1, 9, 0, 0)

GOOD_A = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango"
)
GOOD_B = (
    "rivers lakes mountains valleys forests deserts plains glaciers "
    "islands deltas estuaries canyons plateaus ridges summits basins"
)
SHORT = "too short"  # fails the min_tokens gate
REPETITIVE = "spam spam " * 40  # fails the dup-bigram gate


def _chunk(spark, path, chunk, items):
    ts = BASE + dt.timedelta(minutes=10 * chunk)
    rows = [
        (url, ts, bytearray(wrap_text_as_page(i, text)), None, None)
        for i, (url, text) in enumerate(items)
    ]
    spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).coalesce(1).write.parquet(path)


def _run(spark, src, out, ckpt):
    stream = (
        spark.readStream.schema(
            "url string, warc_ts timestamp, html binary, text string, lang string"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        corpus_prep_stream(stream, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(180)


def test_corpus_prep_stream_matches_batch_across_restart(spark, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    _chunk(spark, f"{src}/c0.parquet", 0, [
        ("http://a", GOOD_A),
        ("http://short", SHORT),
        ("http://rep", REPETITIVE),
    ])
    _chunk(spark, f"{src}/c1.parquet", 1, [
        ("http://a-dup", GOOD_A),   # exact dup of A inside the horizon
        ("http://b", GOOD_B),
    ])
    _run(spark, f"{src}/*", out, ckpt)

    got1 = {r["url"]: r for r in spark.read.parquet(out).collect()}
    # dedup keeps the FIRST arrival; quality gates drop short+spam
    assert set(got1) == {"http://a", "http://b"}
    assert got1["http://a"]["text"] == GOOD_A  # extraction inverted the chrome
    assert got1["http://b"]["n_tokens"] == len(GOOD_B.split())

    # RESTART from the same checkpoint: another dup of A (still in
    # horizon → dropped) + one genuinely new doc
    _chunk(spark, f"{src}/c2.parquet", 2, [
        ("http://a-again", GOOD_A),
        ("http://c", GOOD_B.replace("rivers", "streams")),
    ])
    _run(spark, f"{src}/*", out, ckpt)

    got = {r["url"] for r in spark.read.parquet(out).collect()}
    assert got == {"http://a", "http://b", "http://c"}

    # batch-pipeline agreement on the final corpus content set: the
    # same pages through prepare_corpus (near_dedup off — the stream's
    # exact-dedup twin) keep the same CONTENT fingerprints
    from gluon_ocr_spark.pipeline import prepare_corpus

    pages = spark.read.schema(
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).parquet(f"{src}/*")
    bout = str(tmp_path / "batch")
    prepare_corpus(spark, pages, bout, num_partitions=2, near_dedup=False)
    batch_fps = {r["content_fp"] for r in spark.read.parquet(bout).collect()}
    stream_fps = {r["content_fp"] for r in spark.read.parquet(out).collect()}
    assert stream_fps == batch_fps
