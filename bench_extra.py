#!/usr/bin/env python
"""Round-6 optimization harness (bench.py is FROZEN for measurement;
this file exists so the optimization work can time individual battery
queries, repeat them, and dump plans without touching the driver's
methodology).

Mirrors bench.py's battery loop exactly: one session on
local[$SPARK_GRAFT_CPUS], shuffle_partitions=$SPARK_GRAFT_CPUS,
$SPARK_GRAFT_SF_DIR data, fn(spark, SF_DIR) → noop sink. By default
caches are NOT cleared between queries — Spark's CacheManager
substitutes by canonicalized plan, so in the real battery later
queries legitimately hit frames persisted by earlier ones (e.g.
dedup_clusters reuses dedup_minhash_pairs' band cache); clearing
would mis-state the driver-visible cost. --isolate clears the cache
after every query for attribution work.

Usage:
  python bench_extra.py [--repeat N] [--isolate] [--plans DIR] [query ...]

With --plans DIR, writes DIR/<query>.txt containing
explain("formatted") for each query (the judge-checkable plan
evidence for plans/r06/).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--isolate", action="store_true", help="clearCache between queries")
    ap.add_argument("--plans", default=None, help="dump explain('formatted') per query to DIR")
    args = ap.parse_args()

    from gluon_ocr_spark import queries as qmod
    from gluon_ocr_spark.session import make_session

    allq = qmod.queries()
    names = args.queries or [
        "q1_pricing_summary", "q5_region_revenue", "top_customers_window",
        "events_sessionize", "events_asof_signup", "dedup_minhash_pairs",
        "dedup_shingle_minhash", "dedup_simhash_hamming", "dedup_clusters",
        "text_winnow_pairs", "recog_bucket_keys", "text_fingerprint",
        "ann_topk", "ann_lsh_topk", "ann_ivf_topk", "extract_roundtrip",
        "extract_pdf_roundtrip", "web_url_dedup", "text_bm25", "ann_pq_topk",
        "text_dedup_spans", "dedup_semantic", "dedup_incremental",
        "text_dedup_spans_sa",
    ]
    spark = make_session(app="bench-extra", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    results: dict[str, list[float]] = {n: [] for n in names}
    try:
        # same warmups as bench.py's battery
        spark.range(0, 100000, 1, CPUS).selectExpr("md5(cast(id as string)) h").where(
            "h like 'a%'"
        ).count()

        def _noop_batches(batches):
            for b in batches:
                yield b

        spark.range(0, CPUS * 64, 1, CPUS).mapInPandas(_noop_batches, schema="id long").count()

        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            for name in names:
                df = allq[name](spark, SF_DIR)
                plan = df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
                with open(os.path.join(args.plans, f"{name}.txt"), "w") as fh:
                    fh.write(plan)
                spark.catalog.clearCache()

        for rep in range(args.repeat):
            for name in names:
                spark.sparkContext.setJobDescription(f"{name} rep{rep}")
                fn = allq[name]
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                results[name].append(round(time.time() - t0, 3))
                if args.isolate:
                    spark.catalog.clearCache()
            if not args.isolate:
                # between full battery repeats, reset to a cold start
                spark.catalog.clearCache()
    finally:
        spark.stop()
    summary = {
        n: {"min": min(v), "samples": v} for n, v in results.items() if v
    }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
