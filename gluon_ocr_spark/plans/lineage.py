"""Checkpoint / lineage / exactly-once resume (north-rule requirement).

The reference has no fault tolerance (SURVEY §4 "spill/fault" row:
LMDB batched writes only, ``gluonocr/data/data_utils.py:112-115``);
this is an engine addition. Semantics emulate Iceberg's
snapshot-commit on plain parquet so the sandbox needs no extra jars —
on a real deployment each ``run_id`` directory maps 1:1 onto an
Iceberg ``append`` snapshot and `_lineage` onto a metadata table:

* each run writes docs to an isolated ``docs/run_id=<id>/`` directory
  (never mutating prior runs);
* the run is COMMITTED only when its rows appear in the ``_lineage``
  table — written last, after the docs write has fully succeeded.
  Readers resolve committed run ids from lineage first, so a crash
  mid-write leaves an orphan directory that is invisible to readers
  and harmlessly re-processed on resume;
* resume = left-anti join of the input pages against the committed
  url set, so every url is extracted exactly once across any number
  of crash/retry cycles;
* lineage rows carry per-partition counters
  ``(run_id, partition_id, url_count, line_count, char_count,
  min_url, max_url, committed_at)`` — the SURVEY §1.3 lineage schema —
  computed from the data as written (not from the plan), so the
  metrics audit what actually committed.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.extract import extract_docs

LINEAGE_SCHEMA = (
    "run_id string, partition_id int, url_count bigint, line_count bigint, "
    "char_count bigint, min_url string, max_url string, committed_at timestamp"
)


class ExtractionJob:
    """Resumable distributed extraction over a pages table."""

    def __init__(self, out_dir: str, num_partitions: int | None = None):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.docs_dir = os.path.join(out_dir, "docs")
        self.lineage_dir = os.path.join(out_dir, "_lineage")

    # -- read side --------------------------------------------------
    def lineage(self, spark: SparkSession) -> DataFrame | None:
        try:
            return spark.read.parquet(self.lineage_dir)
        except Exception:
            return None  # no commits yet

    def committed_run_ids(self, spark: SparkSession) -> list[str]:
        lin = self.lineage(spark)
        if lin is None:
            return []
        return [r["run_id"] for r in lin.select("run_id").distinct().collect()]

    def read_docs(self, spark: SparkSession) -> DataFrame | None:
        """Union of committed runs only — orphan (uncommitted) run
        directories are invisible, like uncommitted Iceberg snapshots."""
        runs = self.committed_run_ids(spark)
        if not runs:
            return None
        paths = [os.path.join(self.docs_dir, f"run_id={r}") for r in runs]
        return spark.read.parquet(*paths)

    def committed_urls(self, spark: SparkSession) -> DataFrame | None:
        docs = self.read_docs(spark)
        return None if docs is None else docs.select("url")

    # -- write side ---------------------------------------------------
    def run(self, spark: SparkSession, pages: DataFrame, run_id: str | None = None) -> dict:
        """Extract all not-yet-committed pages; commit docs + lineage.

        Returns counters for observability. Safe to re-run after any
        crash; committed urls are never re-extracted (exactly-once).
        """
        run_id = run_id or uuid.uuid4().hex[:16]
        if run_id in self.committed_run_ids(spark):
            # Idempotent replay: foreachBatch re-delivers an epoch when
            # the STREAM's commit-log write crashed after OUR commit
            # (deterministic run_id = epoch). The old behavior
            # recomputed todo as empty via the anti-join and
            # overwrote the committed run dir with an empty dataset —
            # permanent data loss. A committed run_id is final: report
            # its counters from lineage and touch nothing.
            lin = (
                spark.read.parquet(self.lineage_dir)
                .where(F.col("run_id") == run_id)
                .agg(
                    F.coalesce(F.sum("url_count"), F.lit(0)).alias("n"),
                    F.coalesce(F.sum("line_count"), F.lit(0)).alias("l"),
                )
                .collect()[0]
            )
            return {"run_id": run_id, "urls_processed": lin["n"], "lines": lin["l"], "replayed": True}
        done = self.committed_urls(spark)
        todo = pages
        if done is not None:
            # resume: anti-join against committed urls. url is the
            # identity key (input_hint); both sides shuffle on it and
            # AQE handles skew.
            todo = pages.join(done, "url", "left_anti")

        docs = extract_docs(todo, num_partitions=self.num_partitions).withColumn(
            "partition_id", F.spark_partition_id()
        )
        run_dir = os.path.join(self.docs_dir, f"run_id={run_id}")
        docs.write.mode("overwrite").parquet(run_dir)

        # lineage from data-as-written (audit what actually committed)
        written = spark.read.parquet(run_dir)
        lineage = (
            written.groupBy("partition_id")
            .agg(
                F.count("*").alias("url_count"),
                F.sum("n_lines").alias("line_count"),
                F.sum("n_chars").alias("char_count"),
                F.min("url").alias("min_url"),
                F.max("url").alias("max_url"),
            )
            .select(
                F.lit(run_id).alias("run_id"),
                "partition_id",
                "url_count",
                "line_count",
                "char_count",
                "min_url",
                "max_url",
                F.current_timestamp().alias("committed_at"),
            )
        )
        # THE commit point. coalesce(1): one file per run so the append
        # is all-or-nothing — a multi-file append could crash half-way
        # and leave a partially-committed run (wrong counters on
        # replay). Lineage is one tiny row per partition, so a single
        # file costs nothing even at 10^5 partitions.
        lineage.coalesce(1).write.mode("append").parquet(self.lineage_dir)

        stats = written.agg(F.count("*").alias("n"), F.coalesce(F.sum("n_lines"), F.lit(0)).alias("l")).collect()[0]
        return {"run_id": run_id, "urls_processed": stats["n"], "lines": stats["l"]}
