"""Bucketed lake layout — the shuffle-elision half of the 100 TB plan.

PLANS.md's scale notes repeatedly say "write the corpus ``bucketBy``
the join key so candidate joins co-locate"; this module makes that
real instead of aspirational. ``write_bucketed`` persists a DataFrame
as a bucketed+sorted table (Spark's Hive-compatible bucketing — the
plain-parquet stand-in for an Iceberg bucket-partitioned table, same
honesty note as :mod:`.lineage`), and ``assert_colocated_join`` is
the *proof obligation*: it inspects the physical plan of a join
between two tables bucketed on the same key and fails if Catalyst
inserted a shuffle on either side.

Why it matters at 10^12 rows: every dedup/ANN candidate generator in
this engine ends in an equi-join on a derived key (band_id+band_key,
(mask_id, masked simhash), fingerprint, cell_id). Written unbucketed,
EVERY run of EVERY sketch re-shuffles the full corpus on that key;
written bucketed once at ingest, the joins read co-located buckets
and the per-query Exchange disappears — the difference between an
O(corpus) network move per query and none.

The reference (single-node, LMDB files) has no analog; this is engine
infrastructure the north rule's "partitioning / shuffle / skew
handled explicitly" clause demands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed
    table. Buckets = ``hash(bucket_col) % n_buckets`` file groups, so
    a later equi-join on ``bucket_col`` between tables with the SAME
    bucket count needs no Exchange on either side."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def colocated_join_plan(
    spark: SparkSession, left: str, right: str, key: str
) -> str:
    """Physical plan of the bucket-key equi-join between two saved
    tables (SortMergeJoin expected; bucketing supplies the hash
    distribution so no Exchange is needed).

    Broadcast is disabled while planning: co-location is the
    large ⋈ large strategy — at lake scale neither side fits in a
    broadcast, and a BroadcastExchange here would make the no-shuffle
    assertion pass/fail for the wrong reason."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left).join(spark.table(right), key)
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def assert_colocated_join(spark: SparkSession, left: str, right: str, key: str) -> str:
    """Raise if the bucket-key join of two same-bucketed tables still
    shuffles. Returns the plan string for logging/inspection."""
    plan = colocated_join_plan(spark, left, right, key)
    if "Exchange" in plan:
        raise AssertionError(
            f"bucketed join {left} ⋈ {right} on {key} still shuffles:\n{plan}"
        )
    return plan
