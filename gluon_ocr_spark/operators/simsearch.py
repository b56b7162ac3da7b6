"""Similarity search over embedding columns, DataFrame API.

Exact top-k (brute force) as the correctness baseline and
hyperplane-LSH bucketing as the scale path — same exact-int64
arithmetic as the SQL battery (portable.py), so results are
deterministic and engine-portable.

Scale notes: brute force is O(Q·N) — fine when Q (queries) is small
and broadcastable; the LSH variant replaces the cross join with an
equi-join on bucket id, which shuffles each side once and keeps
per-bucket work bounded. For 100TB-scale: build buckets once,
write them bucketed-by(bucket) to the lake, and probe-side lookups
become partition-pruned scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions import portable as pt
from ..functions.portable import SPARK


def quantize(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("q", F.expr(pt.quantize_vec(vec_col, SPARK)))


def topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force inner-product top-k. The query side is broadcast —
    the plan is a broadcast nested-loop over the corpus scan, no
    shuffle of the (huge) corpus."""
    c = quantize(corpus, vec_col).select(F.col(id_col).alias("neighbor_id"), F.col("q").alias("cq"))
    qd = quantize(queries, vec_col).select(F.col(id_col).alias(query_id_col), F.col("q").alias("qq"))
    dot = pt.int_dot("qq", "cq", SPARK)
    scored = (
        c.crossJoin(F.broadcast(qd))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", F.expr(dot).alias("dot"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding", n_bits: int = pt.LSH_BITS) -> DataFrame:
    q = quantize(df, vec_col)
    return q.withColumn("bucket", F.expr(pt.lsh_bucket_expr("q", SPARK, n_bits)))


def topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    n_bits: int = pt.LSH_BITS,
) -> DataFrame:
    """ANN top-k within the query's LSH bucket: bucket equi-join
    (shuffle-key join) instead of a cross join."""
    c = with_lsh_bucket(corpus, vec_col, n_bits).select(
        F.col(id_col).alias("neighbor_id"), F.col("q").alias("cq"), "bucket"
    )
    qd = with_lsh_bucket(queries, vec_col, n_bits).select(
        F.col(id_col).alias(query_id_col), F.col("q").alias("qq"), F.col("bucket").alias("qbucket")
    )
    dot = pt.int_dot("qq", "cq", SPARK)
    scored = (
        c.join(F.broadcast(qd), F.col("bucket") == F.col("qbucket"))
        .where(F.col("neighbor_id") != F.col(query_id_col))
        .select(query_id_col, "neighbor_id", F.expr(dot).alias("dot"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dot").desc(), F.col("neighbor_id"))
    return scored.withColumn("rnk", F.row_number().over(w)).where(F.col("rnk") <= k)
