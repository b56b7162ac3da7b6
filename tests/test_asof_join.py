"""Generic as-of join operator (union+window formulation)."""

import pandas as pd

from gluon_ocr_spark.operators.asof import asof_join


def test_asof_join_at_or_before(spark):
    trades = spark.createDataFrame(
        pd.DataFrame({"sym": ["A", "A", "A", "B"], "t": [5, 10, 3, 7], "qty": [1, 2, 3, 4]})
    )
    quotes = spark.createDataFrame(
        pd.DataFrame({"sym": ["A", "A", "B", "B"], "t": [4, 10, 8, 2], "bid": [99.0, 101.0, 50.0, 48.0]})
    )
    out = {(r["sym"], r["t"]): r["bid"] for r in asof_join(trades, quotes, "sym", "t", "t", ["bid"]).collect()}
    assert out[("A", 5)] == 99.0  # quote@4
    assert out[("A", 10)] == 101.0  # quote@10 (at-or-before includes equal ts)
    assert out[("A", 3)] is None  # nothing before
    assert out[("B", 7)] == 48.0  # quote@2 (quote@8 is later)


def test_asof_join_strict(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": ["x"], "t": [10], "v": [1]}))
    right = spark.createDataFrame(pd.DataFrame({"k": ["x", "x"], "t": [10, 9], "p": [5.0, 3.0]}))
    at_or_before = asof_join(left, right, "k", "t", "t", ["p"]).collect()[0]["p"]
    strictly_before = asof_join(left, right, "k", "t", "t", ["p"], strict=True).collect()[0]["p"]
    assert at_or_before == 5.0
    assert strictly_before == 3.0


def test_asof_join_subsecond(spark):
    """Sub-second ordering: a right row 500ms AFTER the left row must
    NOT join (the old second-granular long cast truncated both to the
    same tick and joined it)."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    left = spark.createDataFrame(
        pd.DataFrame({"k": ["x"], "t": [base], "v": [1]})
    )
    right = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["x", "x"],
                "t": [base + dt.timedelta(milliseconds=500), base - dt.timedelta(milliseconds=500)],
                "p": [9.0, 7.0],
            }
        )
    )
    got = asof_join(left, right, "k", "t", "t", ["p"]).collect()[0]["p"]
    assert got == 7.0  # the 500ms-later quote is ignored
