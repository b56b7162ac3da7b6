"""Skew partitioners: byte balance under a heavy-tailed corpus."""

import pandas as pd

from pyspark.sql import functions as F

from gluon_ocr_spark.operators.partitioning import binpack_partition, salt_partition


def _payload_per_partition(df):
    rows = (
        df.withColumn("part", F.spark_partition_id())
        .groupBy("part")
        .agg(F.sum(F.octet_length("html")).alias("bytes"))
        .collect()
    )
    return [r["bytes"] for r in rows]


def _skewed_df(spark, n_parts=4):
    # 60 small pages + 3 giants (1000x) — the straggler scenario
    rows = [(f"u{i:03d}", b"x" * 2000) for i in range(60)]
    rows += [(f"g{i}", b"y" * 2_000_000) for i in range(3)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["url", "html"])).repartition(1)


def test_binpack_bounds_partition_bytes(spark):
    df = _skewed_df(spark)
    sizes = _payload_per_partition(binpack_partition(df, 4))
    # LPT round-robin: each giant lands in a different partition
    assert len(sizes) <= 4
    assert max(sizes) <= 2_200_000  # one giant + some smalls, never two giants


def test_salt_spreads_giants_probabilistically(spark):
    df = _skewed_df(spark)
    sizes = _payload_per_partition(salt_partition(df, 8))
    # with 8 salt buckets, worst case is bounded by a couple of giants;
    # the invariant that matters: no partition carries ALL the bytes
    assert max(sizes) < sum(sizes)
    assert len(sizes) > 1


def test_partitioners_preserve_rows(spark):
    df = _skewed_df(spark)
    for out in (salt_partition(df, 5), binpack_partition(df, 5)):
        assert out.count() == 63
        assert out.select("url").distinct().count() == 63
