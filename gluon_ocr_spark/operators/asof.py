"""As-of join (point-in-time lookup) — an operator Spark lacks natively.

Scale-safe formulation (no per-group pandas, no range explosion):
union the probe and reference streams tagged by side, window-scan
``last_value(ref, ignorenulls)`` over (key, time) order, then keep
probe rows. One shuffle on the key, state O(1) per row — survives
10^12 rows, unlike ``pd.merge_asof`` per group (driver-bounded) or a
range cross-join.

    asof_join(trades, quotes, key="sym", left_ts="t", right_ts="t",
              value_cols=["bid", "ask"])

matches each left row with the most recent right row at-or-before its
timestamp (strict=True → strictly before).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = False,
) -> DataFrame:
    """Left as-of join; appends ``value_cols`` (from the latest right
    row ≤ / < left's timestamp) to every left row."""
    lcols = left.columns
    # unix_micros, NOT cast-to-long: the long cast truncates to whole
    # seconds, so a right row up to 999ms AFTER the left row would be
    # treated as at-or-before — wrong results on any sub-second data
    l = left.withColumn(
        "__ts", F.unix_micros(F.col(left_ts).cast("timestamp")) * 2 + 1
    ).withColumn("__side", F.lit(1))
    r = right.select(
        F.col(key),
        (F.unix_micros(F.col(right_ts).cast("timestamp")) * 2).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    # left rows sort AFTER right rows at the same timestamp via the
    # 2n / 2n+1 encoding; strict mode shifts right rows one tick later
    if strict:
        l = l.withColumn("__ts", F.col("__ts") - 2)

    for c in value_cols:
        l = l.withColumn(f"__v_{c}", F.lit(None).cast(r.schema[f"__v_{c}"].dataType))
    for c in lcols:
        if c not in (key,):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l.select(key, "__ts", "__side", *[f"__v_{c}" for c in value_cols], *[c for c in lcols if c != key]).unionByName(
        r.select(key, "__ts", "__side", *[f"__v_{c}" for c in value_cols], *[c for c in lcols if c != key])
    )
    w = Window.partitionBy(key).orderBy("__ts", "__side").rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.select(
        "*", *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in value_cols]
    )
    out = filled.where(F.col("__side") == 1).select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )
    return out
