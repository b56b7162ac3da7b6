"""Skew-aware partitioning of payload-heavy page tables.

Page payload sizes are heavy-tailed (a few multi-MB pages among many
KB pages). Left alone, a naive scan partitioning can strand several
giant pages in one task → stragglers that destroy scaling efficiency
(the north rule's ≥0.8 bar). Two strategies, both pure DataFrame ops:

* :func:`salt_partition` — one shuffle; salt = ``pmod(xxhash64(url), n)``
  spreads pages uniformly at random, so expected bytes/partition are
  equal and giants land in different tasks with high probability.
  This is the default (cheapest, no global coordination), the analog
  of SURVEY §4's "salt/range-partition by length(html)" requirement.

* :func:`binpack_partition` — two shuffles; globally ranks pages by
  ``octet_length(html)`` descending and deals them round-robin, which
  bounds bytes/partition almost perfectly (longest-processing-time
  greedy). Worth it only when the tail is extreme; the global
  ``row_number`` window is a single-reducer sort at planning time, so
  at 10^12 rows prefer :func:`salt_partition` + AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salt_partition(df: DataFrame, num_partitions: int, key: str = "url") -> DataFrame:
    """Uniform salt-hash repartition; one shuffle, scales to any row count.

    The salt keeps the FULL xxhash64 range: reducing it to ``n``
    classes first (``pmod(hash, n)``) and then letting
    ``repartition(n, col)`` murmur-hash those n class values is
    balls-in-bins — ~1/e of the partitions come out empty and others
    carry 2-3 classes (the same trap `_class_representatives`
    documents for binpack). With full-range salts every row places
    independently, so per-partition row counts are multinomial-tight."""
    return (
        df.withColumn("__salt", F.xxhash64(F.col(key)))
        .repartition(num_partitions, "__salt")
        .drop("__salt")
    )


def _class_representatives(spark, num_partitions: int) -> list[int]:
    """Find integers v_0..v_{n-1} with pmod(hash(v_i), n) == i.

    ``repartition(n, col)`` places a row by the HASH of the column, so
    naive bucket ids 0..n-1 collide (balls-in-bins) and two giants can
    land in one task. Routing through representatives whose hashes
    cover every partition exactly restores deterministic placement —
    still pure DataFrame API, one tiny driver job to search."""
    probe = (
        spark.range(0, max(64, num_partitions * 20))
        .selectExpr("id", f"pmod(hash(cast(id as int)), {num_partitions}) as p")
        .collect()
    )
    reps: dict[int, int] = {}
    for r in probe:
        if r["p"] not in reps:
            reps[int(r["p"])] = int(r["id"])
        if len(reps) == num_partitions:
            break
    if len(reps) < num_partitions:  # pathological; extend the search
        raise RuntimeError(f"could not find hash representatives for n={num_partitions}")
    return [reps[i] for i in range(num_partitions)]


def binpack_partition(df: DataFrame, num_partitions: int, payload: str = "html") -> DataFrame:
    """Round-robin by descending payload size (LPT greedy bin-packing).

    Near-perfect byte balance — the k-th largest page lands in
    partition k mod n, guaranteed (not just in expectation). Costs a
    global sort; use for moderate row counts or when a measured run
    shows salt_partition stragglers.
    """
    from pyspark.sql import SparkSession, Window

    spark = SparkSession.getActiveSession() or df.sparkSession
    reps = _class_representatives(spark, num_partitions)
    rep_arr = F.array(*[F.lit(v).cast("int") for v in reps])

    w = Window.orderBy(F.octet_length(F.col(payload)).desc(), F.col("url"))
    ranked = df.withColumn("__rank", F.row_number().over(w))
    out = (
        ranked.withColumn(
            "__bucket",
            F.element_at(rep_arr, (F.pmod(F.col("__rank"), F.lit(num_partitions)) + 1).cast("int")),
        )
        .repartition(num_partitions, "__bucket")
        .drop("__rank", "__bucket")
    )
    return out
