"""IncrementalCorpus: exactly-once recurring-crawl ingestion —
increment chaining through stored artifacts, replay idempotency,
orphan invisibility."""

import os

from gluon_ocr_spark.pipeline import IncrementalCorpus
from gluon_ocr_spark.sources.pages import wrap_text_as_page

BOILER = (
    "subscribe to our newsletter for all the latest updates and "
    "exclusive offers delivered straight to your inbox today friends"
)
DOC_A = (
    "unique article about glaciers carving deep valleys through "
    "ancient mountain ranges over countless millennia of slow ice"
)
DOC_B = (
    "completely different report covering harvest yields across "
    "southern provinces after an unusually wet spring season there"
)


def _pages(spark, items):
    return spark.createDataFrame(
        [(url, bytearray(wrap_text_as_page(i, text))) for i, (url, text) in enumerate(items)],
        "url string, html binary",
    )


def test_two_increments_replay_and_orphans(spark, tmp_path):
    wh = IncrementalCorpus(str(tmp_path / "warehouse"))

    # increment 1: two distinct docs
    r1 = wh.ingest(spark, _pages(spark, [("page://a", DOC_A), ("page://b", DOC_B)]), "inc1")
    assert (r1["qualified"], r1["admitted"], r1["replayed"]) == (2, 2, False)

    # increment 2: exact dup of A, near-dup of B (one token), one new doc
    near_b = DOC_B.rsplit(" ", 1)[0] + " here"
    r2 = wh.ingest(
        spark,
        _pages(
            spark,
            [("page://a2", DOC_A), ("page://b2", near_b), ("page://c", BOILER)],
        ),
        "inc2",
    )
    assert r2["qualified"] == 3 and r2["replayed"] is False
    admitted2 = {r["url"] for r in spark.read.parquet(
        os.path.join(wh.docs_dir, "increment=inc2")
    ).collect()}
    assert "page://a2" not in admitted2  # exact vs snapshot
    assert "page://b2" not in admitted2  # near vs snapshot
    assert "page://c" in admitted2

    # reader sees the union of committed increments
    urls = {r["url"] for r in wh.read_docs(spark).select("url").collect()}
    assert urls == {"page://a", "page://b", "page://c"}

    # replay: committed increment id is final — counters from lineage,
    # nothing recomputed or overwritten
    r2b = wh.ingest(spark, _pages(spark, [("page://x", DOC_A)]), "inc2")
    assert r2b["replayed"] is True and r2b["admitted"] == r2["admitted"]
    assert {r["url"] for r in wh.read_docs(spark).select("url").collect()} == urls

    # orphan: a docs directory with NO lineage row is invisible
    orphan_dir = os.path.join(wh.docs_dir, "increment=crashed")
    spark.read.parquet(os.path.join(wh.docs_dir, "increment=inc1")).write.parquet(orphan_dir)
    assert {r["url"] for r in wh.read_docs(spark).select("url").collect()} == urls
    assert "crashed" not in wh.committed_ids(spark)


def test_first_increment_dedups_within_batch(spark, tmp_path):
    wh = IncrementalCorpus(str(tmp_path / "wh2"))
    r = wh.ingest(
        spark,
        _pages(spark, [("page://a", DOC_A), ("page://a-dup", DOC_A), ("page://b", DOC_B)]),
        "first",
    )
    assert r["qualified"] == 3 and r["admitted"] == 2
    urls = {r2["url"] for r2 in wh.read_docs(spark).select("url").collect()}
    assert urls == {"page://a", "page://b"}  # min-url keeps page://a


def test_crash_mid_ingest_then_retry(spark, tmp_path):
    """A crash AFTER the docs/artifact writes but BEFORE the lineage
    commit leaves orphan directories; retrying the same increment id
    must reprocess cleanly (overwrite the orphans) and commit once."""
    wh = IncrementalCorpus(str(tmp_path / "wh3"))
    wh.ingest(spark, _pages(spark, [("page://a", DOC_A)]), "inc1")

    # simulate the crash state for inc2: docs + fps written, NO lineage
    crashed = _pages(spark, [("page://b", DOC_B)])
    from gluon_ocr_spark.operators.extract import extract_docs

    partial = extract_docs(crashed).select("url", "text")
    partial.write.parquet(os.path.join(wh.docs_dir, "increment=inc2"))
    partial.selectExpr("md5(lower(text)) AS content_fp").write.parquet(
        os.path.join(wh.fps_dir, "increment=inc2")
    )
    # invisible to readers pre-retry
    assert {r["url"] for r in wh.read_docs(spark).select("url").collect()} == {"page://a"}

    r = wh.ingest(spark, crashed, "inc2")
    assert r["replayed"] is False and r["admitted"] == 1
    assert {r2["url"] for r2 in wh.read_docs(spark).select("url").collect()} == {
        "page://a",
        "page://b",
    }
    # exactly one lineage row for inc2
    lin = spark.read.parquet(wh.lineage_dir)
    assert lin.where("increment_id = 'inc2'").count() == 1
