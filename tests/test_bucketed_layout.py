"""Bucketed lake layout: bucketBy writes + shuffle-elision proof."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from gluon_ocr_spark.plans.layout import (
    assert_colocated_join,
    colocated_join_plan,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "band_key": [i % 17 for i in range(200)],
                      "payload": [f"d{i}" for i in range(200)]})
    )
    bands = spark.createDataFrame(
        pd.DataFrame({"band_key": [i % 17 for i in range(60)], "sig": range(60)})
    )
    write_bucketed(docs, "t_docs_bucketed", "band_key", 8, sort_col="band_key")
    write_bucketed(bands, "t_bands_bucketed", "band_key", 8, sort_col="band_key")
    yield "t_docs_bucketed", "t_bands_bucketed"
    for t in ("t_docs_bucketed", "t_bands_bucketed"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_elides_exchange(spark, bucketed_tables):
    left, right = bucketed_tables
    plan = assert_colocated_join(spark, left, right, "band_key")
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert "Exchange" not in plan


def test_unbucketed_join_does_shuffle(spark, bucketed_tables):
    """Control: the same join against an UNbucketed side must show the
    Exchange the layout removes (guards against the assertion passing
    vacuously, e.g. via a broadcast join)."""
    left, _ = bucketed_tables
    plain = spark.createDataFrame(
        pd.DataFrame({"band_key": [i % 17 for i in range(60)], "sig": range(60)})
    )
    plain.createOrReplaceTempView("t_bands_plain")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.table(left).join(spark.table("t_bands_plain"), "band_key")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_rows_roundtrip(spark, bucketed_tables):
    left, right = bucketed_tables
    joined = spark.table(left).join(spark.table(right), "band_key")
    # 200 docs × (60 bands / 17 keys): keys 0..8 have 4 band rows, 9..16 have 3
    expected = sum((4 if (i % 17) <= 8 else 3) for i in range(200))
    assert joined.count() == expected
    assert spark.table(left).count() == 200


def test_colocated_assert_fires_on_shuffling_join(spark, bucketed_tables):
    left, _ = bucketed_tables
    mis = spark.createDataFrame(pd.DataFrame({"band_key": [1, 2], "z": [0, 1]}))
    write_bucketed(mis, "t_mismatch_buckets", "band_key", 4)  # different bucket count
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        with pytest.raises(AssertionError, match="still shuffles"):
            assert_colocated_join(spark, left, "t_mismatch_buckets", "band_key")
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_mismatch_buckets")
