"""Streaming incremental dedup: crawl stream filtered against a
static snapshot band table, bucket claims within the horizon,
batch-oracle agreement, restart continuity."""

import datetime as dt
import os

from gluon_ocr_spark.operators.dedup import snapshot_artifacts
from gluon_ocr_spark.streaming.pipeline import (
    incremental_dedup_stream,
    incremental_first_owner_batch,
)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)

_SNAP = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five"
)
_NEW = (
    "rivers lakes mountains valleys forests deserts plains glaciers "
    "islands deltas estuaries canyons plateaus ridges summits basins "
    "fjords lagoons marshes tundras steppes savannas prairies dunes"
)
_OTHER = (
    "printing presses journals letters archives manuscripts scrolls "
    "codices tablets inscriptions ledgers registries almanacs diaries "
    "chronicles gazettes bulletins circulars pamphlets newsletters posters"
)


def _rows(chunk: int, items):
    ts = BASE + dt.timedelta(minutes=10 * chunk)
    return [(url, ts, text) for url, text in items]


def _base_bands(spark):
    base = spark.createDataFrame(
        [(100, _SNAP)], "doc_id bigint, text string"
    )
    _, bands = snapshot_artifacts(base)
    return bands.persist()


def _run_stream(spark, src, out_dir, ckpt, base_bands):
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        incremental_dedup_stream(
            stream, base_bands, watermark="1 hour", window="1 minute"
        )
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination(180)


def _emitted(spark, out_dir):
    try:
        return {r["url"] for r in spark.read.parquet(out_dir).select("url").collect()}
    except Exception:
        return set()


def test_incremental_stream_vs_snapshot_and_restart(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    base_bands = _base_bands(spark)

    # chunk 0: an exact snapshot dup (every band collides -> dropped
    # with no fp lookup), a near-dup of the snapshot doc, and a
    # genuinely new doc
    spark.createDataFrame(
        _rows(
            0,
            [
                ("http://exact", _SNAP),
                ("http://near-snap", _SNAP.replace("five", "six")),
                ("http://new", _NEW),
            ],
        ),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk0.parquet")
    # chunk 1: an in-stream near-dup of the new doc (must lose the
    # bucket claim), and an unrelated doc
    spark.createDataFrame(
        _rows(
            1,
            [
                ("http://near-new", _NEW.replace("dunes", "cliffs")),
                ("http://other", _OTHER),
            ],
        ),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk1.parquet")

    out = str(tmp_path / "out")
    _run_stream(spark, f"{src}/*", out, ckpt, base_bands)

    # chunk 2 far in the future: pushes the watermark past the
    # earlier windows so their verdicts emit — run from the SAME
    # checkpoint (restart continuity: bucket claims and the
    # anti-join filter survive the restart)
    spark.createDataFrame(
        [
            (
                "http://late",
                BASE + dt.timedelta(hours=3),
                "completely fresh closing document about tides and moons today",
            )
        ],
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk2.parquet")
    _run_stream(spark, f"{src}/*", out, ckpt, base_bands)

    got = _emitted(spark, out)
    assert "http://exact" not in got  # all bands in snapshot
    assert "http://near-snap" not in got  # shares >= 1 band with snapshot
    assert "http://new" in got
    assert "http://near-new" not in got  # lost the in-stream claim
    assert "http://other" in got

    # batch oracle agrees on the emitted horizon
    stream_docs = spark.createDataFrame(
        _rows(0, [("http://exact", _SNAP), ("http://near-snap", _SNAP.replace("five", "six")), ("http://new", _NEW)])
        + _rows(1, [("http://near-new", _NEW.replace("dunes", "cliffs")), ("http://other", _OTHER)]),
        "url string, warc_ts timestamp, text string",
    )
    oracle = {
        r["url"] for r in incremental_first_owner_batch(stream_docs, base_bands).collect()
    }
    assert got - {"http://late"} == oracle
    base_bands.unpersist()
