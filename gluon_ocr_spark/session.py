"""SparkSession factory with the engine's scale-oriented defaults.

Centralizes the knobs that matter at 100 TB so every entry point
(tests, bench, driver contract) runs the same way:

* AQE on (runtime re-plan, skew-join splitting, partition coalescing);
* Arrow execution on, with a bounded ``maxRecordsPerBatch`` — each
  `pages` row carries a multi-KB..MB payload, so unbounded batches
  would blow executor memory at real page sizes (SURVEY §4 "async
  engine" row);
* broadcast threshold left at default but AQE may demote/promote.

On a real cluster the same builder is used by ``spark-submit
--py-files``; only ``master`` changes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ARROW_BATCH_ROWS = 256  # pages rows per Arrow batch (payload-heavy rows)


def make_session(
    app: str = "gluon-ocr-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32
    b = (
        SparkSession.builder.appName(app)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        # single-node sandbox: shuffle/spill on tmpfs (measured 2.4×
        # on the salt-shuffle path vs /tmp disk); real clusters point
        # this at executor-local NVMe instead
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
