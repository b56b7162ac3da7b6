"""Custom stateful streaming operator: applyInPandasWithState
sessionizer vs the batch sessionize oracle."""

from pyspark.sql import functions as F


def test_stateful_sessionizer_matches_batch(spark, tmp_path, sf_dir):
    from gluon_ocr_spark.streaming.pipeline import sessionize_stream

    src = str(tmp_path / "events_src")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.write.parquet(src)

    stream = spark.readStream.schema(
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    ).parquet(src)

    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start_us"], r["session_end_us"], r["n_events"])
        for r in spark.sql("select * from sessions_stream").collect()
    }

    # batch oracle: full sessionization, minus each user's final
    # (still-open) session — the stream keeps those in state
    batch = (
        events.select("user_id", F.unix_micros(F.col("ts").cast("timestamp")).alias("us"))
        .withColumn(
            "new_sess",
            F.expr(
                "case when lag(us) over (partition by user_id order by us) is null "
                "or us - lag(us) over (partition by user_id order by us) > 1800000000 then 1 else 0 end"
            ),
        )
        .withColumn(
            "session_id",
            F.expr(
                "sum(new_sess) over (partition by user_id order by us rows between unbounded preceding and current row)"
            ),
        )
        .groupBy("user_id", "session_id")
        .agg(F.min("us").alias("s"), F.max("us").alias("e"), F.count("*").alias("n"))
    )
    last = batch.groupBy("user_id").agg(F.max("session_id").alias("last_id"))
    closed = batch.join(last, "user_id").where(F.col("session_id") != F.col("last_id"))
    exp = {(r["user_id"], r["s"], r["e"], r["n"]) for r in closed.collect()}

    assert got == exp
    assert len(got) > 0
