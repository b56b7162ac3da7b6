"""Checkpoint/resume exactly-once semantics (SURVEY §5.5)."""

import os
import shutil

from gluon_ocr_spark.plans.lineage import ExtractionJob
from gluon_ocr_spark.sources.pages import pages_dataframe

N = 40
SEED = 42


def test_resume_exactly_once(spark, tmp_path):
    out = str(tmp_path / "out")
    job = ExtractionJob(out, num_partitions=3)
    pages = pages_dataframe(spark, N, SEED, partitions=3)

    # first run sees only half the corpus (stand-in for a crash after
    # a partial commit)
    first = job.run(spark, pages.limit(N // 2), run_id="run1")
    assert first["urls_processed"] == N // 2

    # second run over the full corpus extracts ONLY the remainder
    second = job.run(spark, pages, run_id="run2")
    assert second["urls_processed"] == N - N // 2

    docs = job.read_docs(spark)
    rows = docs.select("url").collect()
    assert len(rows) == N
    assert len({r["url"] for r in rows}) == N  # no duplicates

    # third run: nothing left to do
    third = job.run(spark, pages, run_id="run3")
    assert third["urls_processed"] == 0


def test_orphan_run_invisible_and_reprocessed(spark, tmp_path):
    out = str(tmp_path / "out2")
    job = ExtractionJob(out, num_partitions=2)
    pages = pages_dataframe(spark, 10, SEED, partitions=2)

    # simulate a crash AFTER the docs write but BEFORE the lineage
    # commit: run normally, then delete its lineage
    job.run(spark, pages.limit(5), run_id="crashed")
    shutil.rmtree(job.lineage_dir)
    assert job.read_docs(spark) is None  # orphan dir invisible
    assert os.path.isdir(os.path.join(job.docs_dir, "run_id=crashed"))

    # resume reprocesses everything exactly once into committed state
    res = job.run(spark, pages, run_id="recovery")
    assert res["urls_processed"] == 10
    assert job.read_docs(spark).count() == 10


def test_lineage_counters_match_docs(spark, tmp_path):
    out = str(tmp_path / "out3")
    job = ExtractionJob(out, num_partitions=2)
    pages = pages_dataframe(spark, 12, SEED, partitions=2)
    job.run(spark, pages, run_id="r1")

    lin = job.lineage(spark)
    docs = job.read_docs(spark)
    got = lin.groupBy().sum("url_count", "line_count").collect()[0]
    assert got["sum(url_count)"] == 12
    assert got["sum(line_count)"] == sum(r["n_lines"] for r in docs.select("n_lines").collect())


def test_committed_run_replay_is_noop(spark, tmp_path):
    """foreachBatch epoch replay: a run_id that already committed must
    never be recomputed — the old overwrite path recomputed todo as
    empty and clobbered the committed run dir with an empty dataset."""
    out = str(tmp_path / "out4")
    job = ExtractionJob(out, num_partitions=2)
    pages = pages_dataframe(spark, 8, SEED, partitions=2)

    first = job.run(spark, pages, run_id="epoch-000")
    assert first["urls_processed"] == 8

    # replay of the same epoch (same pages or ANY pages): idempotent
    replay = job.run(spark, pages, run_id="epoch-000")
    assert replay.get("replayed") is True
    assert replay["urls_processed"] == 8  # counters from lineage
    docs = job.read_docs(spark)
    assert docs.count() == 8  # data survived the replay intact
    assert docs.where("text IS NULL").count() == 0
