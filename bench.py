#!/usr/bin/env python
"""Benchmark harness (driver-run each round; also usable standalone).

Measures:
1. **Extraction throughput + scaling efficiency** — the north-rule
   metric. The same pre-materialized synthetic pages corpus is
   extracted at two parallelism levels (local[8] vs local[N], the
   sandbox proxy for N vs 4N executors); reports docs/sec at each and
   efficiency = (docs_sec_hi / docs_sec_lo) / (hi/lo). Corpus
   generation is cached under .bench_cache/ (gitignored) so repeat
   runs only pay the extraction.
2. **Query battery wall times** at $SPARK_GRAFT_SF_DIR (default
   sf0.1) on local[$SPARK_GRAFT_CPUS]; results sunk via the noop
   writer (no driver collect skew).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "extraction": {...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "400000"))
LO_LEVEL = int(os.environ.get("SPARK_GRAFT_BENCH_LO", "8"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# headline queries only (full battery runs in the correctness gate);
# chosen to cover scan/agg, star join, window, sessionize, minhash
# join, ANN, and the flagship extraction round-trip
BENCH_QUERIES = (
    "q1_pricing_summary",
    "q5_region_revenue",
    "top_customers_window",
    "events_sessionize",
    "dedup_minhash_pairs",
    "text_fingerprint",
    "ann_topk",
    "ann_lsh_topk",
    "extract_roundtrip",
)


def ensure_pages_corpus(n: int) -> str:
    path = os.path.join(CACHE_DIR, f"pages_{n}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from gluon_ocr_spark.session import make_session
    from gluon_ocr_spark.sources.pages import pages_dataframe

    spark = make_session(app="bench-gen", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    try:
        # 128 input partitions → both parallelism levels see the same
        # file layout with enough tasks to saturate 32 cores
        pages_dataframe(spark, n, seed=42, partitions=128).write.mode("overwrite").parquet(path)
    finally:
        spark.stop()
    return path


def extraction_run(cores: int, pages_path: str) -> dict:
    from pyspark.sql import functions as F

    from gluon_ocr_spark.operators.extract import extract_docs
    from gluon_ocr_spark.session import make_session

    spark = make_session(app=f"bench-extract-{cores}", master=f"local[{cores}]", shuffle_partitions=cores)
    try:
        pages = spark.read.parquet(pages_path)
        t0 = time.time()
        docs = extract_docs(pages)
        row = docs.agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars")).collect()[0]
        dt = time.time() - t0
        return {"cores": cores, "docs": row["n"], "sec": round(dt, 2), "docs_per_sec": round(row["n"] / dt, 1)}
    finally:
        spark.stop()


def main() -> None:
    from gluon_ocr_spark.session import make_session
    from gluon_ocr_spark import queries as qmod

    t_start = time.time()

    # -- extraction scaling (north-rule metric) --------------------
    pages_path = ensure_pages_corpus(N_PAGES)
    lo = extraction_run(LO_LEVEL, pages_path)
    hi = extraction_run(CPUS, pages_path)
    eff = (hi["docs_per_sec"] / lo["docs_per_sec"]) / (CPUS / LO_LEVEL)
    extraction = {
        "pages": N_PAGES,
        "lo": lo,
        "hi": hi,
        "scaling_efficiency": round(eff, 3),
    }

    # -- query battery ----------------------------------------------
    spark = make_session(app="bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qtimes: dict[str, float] = {}
    try:
        allq = qmod.queries()
        for name in BENCH_QUERIES:
            fn = allq[name]
            t0 = time.time()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            qtimes[name] = round(time.time() - t0, 3)
    finally:
        spark.stop()

    total = round(time.time() - t_start, 2)
    print(
        json.dumps(
            {
                "metric": "extraction docs/sec @ local[%d] + query battery wall" % CPUS,
                "value": total,
                "unit": "sec",
                "queries": qtimes,
                "sf": SF_DIR.rstrip("/").split("sf")[-1],
                "extraction": extraction,
            }
        )
    )


if __name__ == "__main__":
    main()
