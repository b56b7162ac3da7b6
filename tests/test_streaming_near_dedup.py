"""Streaming near-dup dedup: band blocking within the watermark,
batch-oracle agreement, transitive chain kill, restart continuity."""

import datetime as dt
import os

from pyspark.sql import functions as F

from gluon_ocr_spark.streaming.pipeline import (
    near_dedup_first_owner_batch,
    near_dedup_stream,
)

BASE = dt.datetime(2024, 3, 1, 12, 0, 0)

_TXT = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu one two three four five"
)
_OTHER = (
    "rivers lakes mountains valleys forests deserts plains glaciers "
    "islands deltas estuaries canyons plateaus ridges summits basins "
    "fjords lagoons marshes tundras steppes savannas prairies dunes"
)


def _rows(chunk: int, items: list[tuple[str, str]]):
    """Each chunk gets a later minute so stream arrival order (chunk
    order) equals event-time order — the batch oracle sorts by
    (ts, id)."""
    ts = BASE + dt.timedelta(minutes=10 * chunk)
    return [(url, ts, text) for url, text in items]


def _run_stream(spark, src, out_dir, ckpt):
    """File sink (memory sink cannot recover from a checkpoint).
    maxFilesPerTrigger=1: one micro-batch per chunk so bucket-claim
    order is chunk arrival order — in one big batch
    dropDuplicatesWithinWatermark picks an ARBITRARY claimant among
    same-batch colliders and the test's expected owner loses."""
    stream = (
        spark.readStream.schema("url string, warc_ts timestamp, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        near_dedup_stream(stream, watermark="1 hour", window="1 minute")
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
        return set()  # nothing emitted yet (no files)


def test_near_dedup_stream_kills_transitive_chain_across_restart(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # chunk 0: the original A and one unrelated doc
    spark.createDataFrame(
        _rows(0, [("http://a", _TXT), ("http://solo", _OTHER)]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk0.parquet")
    # chunk 1: B ~ A (one token edited)
    spark.createDataFrame(
        _rows(1, [("http://b", _TXT.replace("five", "six"))]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk1.parquet")

    out = str(tmp_path / "out")
    _run_stream(spark, f"{src}/*", out, ckpt)
    # append mode: the watermark has only reached chunk1 − horizon,
    # so no window is closed yet — nothing emitted, but the bucket
    # state is committed to the checkpoint
    got1 = _emitted(spark, out)
    assert "http://b" not in got1

    # chunk 2 arrives; RESTART from the same checkpoint.
    # C ~ B (edits B's edit further) — transitively a dup of A even
    # though C never collides with A's exact text; bucket state
    # claimed by the DROPPED B must still block C.
    # D pushes the watermark far enough to close all windows.
    spark.createDataFrame(
        _rows(2, [("http://c", _TXT.replace("five", "six").replace("alpha", "amended"))]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk2.parquet")
    spark.createDataFrame(
        _rows(200, [("http://later", "totally fresh content horizon push " * 5)]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/chunk3.parquet")

    _run_stream(spark, f"{src}/*", out, ckpt)
    emitted = _emitted(spark, out)
    assert "http://c" not in emitted  # killed by the DROPPED B's claimed buckets
    assert "http://b" not in emitted
    assert "http://a" in emitted  # chunk-0 verdicts finalized across the restart

    # batch-oracle agreement on the full corpus; the final push doc
    # ("later") sits beyond the closing watermark so its own window
    # never finalizes — compare the finalized set
    batch = {
        r["url"]
        for r in near_dedup_first_owner_batch(
            spark.read.schema("url string, warc_ts timestamp, text string").parquet(f"{src}/*")
        ).collect()
    }
    assert batch == {"http://a", "http://solo", "http://later"}
    assert (got1 | emitted) == batch - {"http://later"}


def test_near_dedup_stream_distinct_docs_all_kept(spark, tmp_path):
    src = str(tmp_path / "docs_in")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    words = _TXT.split() + _OTHER.split()
    docs = []
    for i in range(6):
        # rotate + unique-prefix so token sets are genuinely different
        toks = [f"d{i}x{w}" for w in words[i : i + 20]]
        docs.append((f"http://doc{i}", " ".join(toks)))
    spark.createDataFrame(
        _rows(0, docs[:3]), "url string, warc_ts timestamp, text string"
    ).coalesce(1).write.parquet(f"{src}/c0.parquet")
    spark.createDataFrame(
        _rows(1, docs[3:]) + _rows(100, [("http://push", "watermark push content")]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/c1.parquet")

    # a far-future chunk pushes the watermark so every doc window closes
    spark.createDataFrame(
        _rows(300, [("http://push2", "second watermark push content")]),
        "url string, warc_ts timestamp, text string",
    ).coalesce(1).write.parquet(f"{src}/c2.parquet")
    out = str(tmp_path / "out")
    _run_stream(spark, f"{src}/*", out, ckpt)
    got = _emitted(spark, out)
    assert {u for u, _ in docs} <= got
