#!/usr/bin/env python
"""Benchmark harness (driver-run each round; also usable standalone).

Measures:
1. **Extraction throughput + scaling efficiency** — the north-rule
   metric. The same pre-materialized synthetic pages corpus is
   extracted at two parallelism levels (local[4] vs local[16] by
   default — SPARK_GRAFT_BENCH_LO/HI — the sandbox proxy for N vs 4N
   executors); reports docs/sec at each and
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
N_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "100000"))
# headline N→4N pair: 4→16 stays within this box's ~16 PHYSICAL cores,
# so it measures scaling; 8→32 crosses into SMT and measures the
# hyperthread ceiling instead (reported as the secondary pair)
LO_LEVEL = int(os.environ.get("SPARK_GRAFT_BENCH_LO", "4"))
HI_LEVEL = int(os.environ.get("SPARK_GRAFT_BENCH_HI", "16"))
CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# headline queries only (full battery runs in the correctness gate);
# chosen to cover scan/agg, star join, window, sessionize, minhash
# join, ANN, and the flagship extraction round-trip
BENCH_QUERIES = (
    "q1_pricing_summary",
    "q5_region_revenue",
    "top_customers_window",
    "events_sessionize",
    "events_asof_signup",
    "dedup_minhash_pairs",
    "dedup_shingle_minhash",
    "dedup_simhash_hamming",
    "dedup_clusters",
    "text_winnow_pairs",
    "recog_bucket_keys",
    "text_fingerprint",
    "ann_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "extract_roundtrip",
    "extract_pdf_roundtrip",
    "web_url_dedup",
    # round-4 additions: ranked retrieval, PQ codebook+ADC, and the
    # span-removal dedup (corpus_prep_dedup stays out — its CC cost
    # is already represented by dedup_clusters)
    "text_bm25",
    "ann_pq_topk",
    "text_dedup_spans",
    # round-5 addition: cluster-bucketed SemDeDup (the embedding
    # dedup scale path)
    "dedup_semantic",
    # round-5 stretch additions: batch-vs-snapshot dedup and the
    # suffix-array span-dedup path (Arrow SA per shard vs the k-gram
    # seed table of text_dedup_spans above)
    "dedup_incremental",
    "text_dedup_spans_sa",
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


def hw_payloads(n_pages: int = 8000) -> list:
    """Deterministic (seed 42) — cached on disk so the 4-6 extraction
    subprocesses per bench run don't each regenerate 8000 pages."""
    import pickle

    cache = os.path.join(CACHE_DIR, f"hw_payloads_{n_pages}.pkl")
    if os.path.exists(cache):
        try:
            with open(cache, "rb") as fh:
                return pickle.load(fh)
        except Exception:
            pass  # stale/corrupt cache: regenerate
    import multiprocessing as mp

    with mp.Pool(16) as pool:
        step = 500
        parts = pool.map(_mp_generate, [(i, min(i + step, n_pages)) for i in range(0, n_pages, step)])
    payloads = [p for part in parts for p in part]
    os.makedirs(CACHE_DIR, exist_ok=True)
    tmp = cache + ".tmp"
    with open(tmp, "wb") as fh:
        pickle.dump(payloads, fh)
    os.replace(tmp, cache)
    return payloads


def hw_run(workers: int, payloads: list) -> float:
    """Raw-kernel multiprocessing throughput at `workers` — the box's
    instantaneous ceiling at that parallelism. Measured ADJACENT to
    each Spark run because this host's throughput swings >2x over
    minutes (shared/throttled); the efficiency that matters is
    Spark's ratio relative to the hardware's ratio in the same
    window."""
    import multiprocessing as mp

    chunks = [payloads[i : i + 200] for i in range(0, len(payloads), 200)]
    t0 = time.time()
    with mp.Pool(workers) as pool:
        pool.map(_mp_extract, chunks, chunksize=1)
    return len(payloads) / (time.time() - t0)


def _mp_shuffle_map(args) -> int:
    """Map side of the raw-Python shuffle: GENERATE the chunk's
    tokens (the parallel-scan analog — shipping materialized chunks
    through the parent pickles 100s of MB single-threaded and caps
    scaling at 1x), md5 every token, partition into buckets, SPILL
    each bucket to tmpfs — the bands job's hash pass + shuffle
    write."""
    chunk_id, start, end, n_buckets, spill_dir = args
    import hashlib
    import pickle

    buckets = [[] for _ in range(n_buckets)]
    append = [b.append for b in buckets]
    md5 = hashlib.md5
    for i in range(start, end):
        t = md5(b"tok%d" % i).digest()
        h = int.from_bytes(md5(t).digest()[:8], "big")
        append[h % n_buckets](h)
    for b, lst in enumerate(buckets):
        with open(os.path.join(spill_dir, f"m{chunk_id}_b{b}"), "wb") as fh:
            pickle.dump(lst, fh, protocol=pickle.HIGHEST_PROTOCOL)
    return end - start


def _mp_shuffle_reduce(args) -> int:
    """Reduce side: fetch the bucket's spill files, merge,
    distinct-count — shuffle read + aggregation."""
    bucket, n_chunks, spill_dir = args
    import pickle

    s = set()
    for m in range(n_chunks):
        with open(os.path.join(spill_dir, f"m{m}_b{bucket}"), "rb") as fh:
            s.update(pickle.load(fh))
    return len(s)


def hw_shuffle_run(workers: int, n_tokens: int = 16_000_000, n_chunks: int = 64) -> float:
    """Raw multiprocessing SHUFFLE throughput (tokens/sec) at
    ``workers`` — the box's ceiling for the hash→partition→exchange→
    aggregate shape the bands job executes, measured adjacent to each
    Spark shuffle run (same bracket protocol as :func:`hw_run`; this
    host's throughput swings >2x across multi-minute windows, so only
    an in-window ceiling is meaningful). The exchange goes through
    per-bucket spill files on tmpfs — the same write/read path
    Spark's local shuffle uses (spark.local.dir is /dev/shm here) —
    NOT through the parent process, which would serialize the
    exchange and cap scaling at 1x regardless of workers."""
    import multiprocessing as mp
    import shutil
    import tempfile

    n_buckets = workers * 2
    step = n_tokens // n_chunks
    spill_dir = tempfile.mkdtemp(prefix="hw_shuffle_", dir="/dev/shm")
    try:
        t0 = time.time()
        with mp.Pool(workers) as pool:
            pool.map(
                _mp_shuffle_map,
                [
                    (i, s, min(s + step, n_tokens), n_buckets, spill_dir)
                    for i, s in enumerate(range(0, n_tokens, step))
                ],
                chunksize=1,
            )
            total = sum(
                pool.map(
                    _mp_shuffle_reduce,
                    [(b, n_chunks, spill_dir) for b in range(n_buckets)],
                    chunksize=1,
                )
            )
        assert total > 0
        return n_tokens / (time.time() - t0)
    finally:
        shutil.rmtree(spill_dir, ignore_errors=True)


def _mp_generate(rng: tuple) -> list:
    from gluon_ocr_spark.sources.pages import make_page

    return [make_page(i, 42)["html"] for i in range(rng[0], rng[1])]


def _mp_extract(payloads) -> int:
    from gluon_ocr_spark.kernels.extract import extract_document

    n = 0
    for p in payloads:
        n += len(extract_document(p).text)
    return n


def _extraction_run_inproc(cores: int, pages_path: str, salted: bool = True) -> dict:
    """One parallelism level, measured with its OWN hardware-ceiling
    brackets: raw-kernel multiprocessing throughput at the same worker
    count immediately before the session and after it stops. This host
    drifts >2x over minutes, so a ceiling measured in a different
    window (round 1 measured it a JVM-startup away) is meaningless;
    the bracket pair bounds what the box could do DURING the trials."""
    from pyspark.sql import functions as F

    from gluon_ocr_spark.operators.extract import extract_docs
    from gluon_ocr_spark.session import make_session

    payloads = hw_payloads()
    hw_before = hw_run(cores, payloads)

    spark = make_session(
        app=f"bench-extract-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 3,
        extra={"spark.sql.files.maxPartitionBytes": "4m"},  # payload-heavy rows: small splits
    )
    try:
        pages = spark.read.parquet(pages_path)
        # Warm up EVERY python worker + JIT + parquet footers: the old
        # limit(256) warmup collapsed to one partition and warmed ONE
        # worker, so trial 1 paid ~2x cold-start at high core counts
        # (measured 33s vs 12s steady-state at local[16]). repartition
        # spreads the warmup batch across all workers.
        extract_docs(pages.limit(cores * 512).repartition(cores * 2)).count()
        best = None
        n_docs = 0
        # best-of-3: single trials on this host swing >2x (shared
        # tenancy); the min time is the steady-state capability
        for _ in range(3):
            t0 = time.time()
            # salted=True: per-job salt-repartition to cores*3 (the
            # skew defense for FOREIGN inputs of unknown layout).
            # salted=False: scan-direct extraction over the
            # layout-salted corpus (pages were hash-distributed at
            # ingest; maxPartitionBytes bounds per-task bytes) — at
            # 1000 executors this is the production shape: salt ONCE
            # at ingest, never re-shuffle 100 TB of payloads per job.
            docs = extract_docs(pages, num_partitions=cores * 3 if salted else None)
            row = docs.agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars")).collect()[0]
            dt = time.time() - t0
            n_docs = row["n"]
            if best is None or dt < best:
                best = dt
    finally:
        spark.stop()
    hw_after = hw_run(cores, payloads)
    return {
        "cores": cores,
        "salted": salted,
        "docs": n_docs,
        "sec": round(best, 2),
        "docs_per_sec": round(n_docs / best, 1),
        # peak of the two brackets = the window's achievable ceiling
        "hw_docs_per_sec": round(max(hw_before, hw_after), 1),
        "hw_bracket": [round(hw_before, 1), round(hw_after, 1)],
    }


def _run_level_subprocess(argv_tail: list[str]) -> dict:
    """Run one measurement in a FRESH subprocess: a second SparkSession
    inside an already-used JVM measures 2-3x slower (lingering
    daemons/heap state), which inverts scaling numbers. Each level
    gets its own interpreter + JVM, like separate spark-submit runs.
    On failure the child's stderr is surfaced (check=True alone hides
    the Spark traceback inside a CalledProcessError)."""
    import subprocess

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "16g")
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__)] + argv_tail,
        capture_output=True,
        text=True,
        env=env,
    )
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench subprocess {argv_tail} failed (rc={out.returncode}):\n"
            + out.stderr[-4000:]
        )
    return json.loads(lines[-1])


def extraction_run(cores: int, pages_path: str, salted: bool = True) -> dict:
    return _run_level_subprocess(
        ["--extract-level", str(cores), pages_path, "salted" if salted else "presalted"]
    )


def _query_run_inproc(cores: int, name: str, replicate: int = 48) -> dict:
    """One parallelism level of the SHUFFLE scaling job (extraction is
    map-dominated; this pair shows how the engine's shuffles scale).

    The raw sf0.1 documents table (5 000 rows) finishes in fixed
    overhead at any core count — a scaling pair on it reads as "flat"
    no matter how good the plan is — so the corpus is replicated
    ``replicate``× with per-replica-distinct tokens (every token is
    prefixed with the replica id, so the md5 work grows linearly and
    replicas never collide into shared band buckets — a weak perturb
    lets replicas cross-match and the self-join blows up
    quadratically, measured >3 min at 4 cores). The measured job is
    the minhash hash pass + band build + one band-bucket count
    shuffle — the shuffle-bound portion whose scaling the extraction
    pair can't show. Best-of-3 (this host throttles in multi-minute
    windows; the min is the steady-state capability)."""
    from pyspark.sql import functions as F

    from gluon_ocr_spark.operators.dedup import minhash_bands
    from gluon_ocr_spark.session import make_session

    if name != "minhash_bands_scaled":
        raise ValueError(f"unknown scaling job {name!r} (only minhash_bands_scaled exists)")
    hw_before = hw_shuffle_run(cores)
    spark = make_session(
        app=f"bench-q-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores * 2,
        # batch-throughput GC: the md5 token pass is allocation-heavy
        # (split → token array → md5 per token) and G1's concurrent
        # cycles cost ~5% here; measured with ParallelGC the pass
        # scales slightly better at 16 cores. -Xms pre-sizes the heap
        # so the first full-size trial doesn't pay incremental heap
        # growth (measured 15 s vs 6 s steady on trial 1 without it).
        extra={"spark.driver.extraJavaOptions": "-XX:+UseParallelGC -Xms12g"},
    )
    try:
        spark.range(0, 100000, 1, cores).selectExpr("md5(cast(id as string)) h").where(
            "h like 'a%'"
        ).count()
        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text")
            .crossJoin(spark.range(replicate).withColumnRenamed("id", "rep"))
            .select(
                (F.col("doc_id") * replicate + F.col("rep")).alias("doc_id"),
                F.regexp_replace(
                    F.concat(F.col("rep").cast("string"), F.lit("_"), F.col("text")),
                    " ",
                    F.concat(F.lit(" "), F.col("rep").cast("string"), F.lit("_")),
                ).alias("text"),
            )
            .repartition(cores * 2)
            .persist()
        )
        docs.count()  # materialize the replicated input OUTSIDE the timed job
        # same-shape warmup on a small slice: JIT-compiles the whole
        # bands plan (split/transform/md5/inline/hash-agg codegen)
        # before any timed trial — trial 1 otherwise pays ~2x cold
        warm = docs.limit(4000).persist()
        minhash_bands(warm, materialize_codes=True).groupBy("band_id", "band_key").count().count()
        warm.unpersist()
        # one UNTIMED full-size run: first contact with the full
        # working set still pays allocator/page-cache ramp the small
        # warmup can't reach; timing it would put a known-cold sample
        # into the trial spread and trip the suspect flag on every run
        minhash_bands(docs, materialize_codes=True).groupBy("band_id", "band_key").count().count()
        best = None
        trials: list[float] = []
        n_rows = 0
        # multiple trials per subprocess: single trials on this shared
        # host swing >2x; the spread is also the window-suspect signal
        for _ in range(2):
            # the timed job uses the ENGINE's plan (materialized codes
            # boundary — the un-materialized variant re-runs the md5
            # pass 16x and turns this into a map-CPU benchmark that
            # overstates shuffle scaling); clear the codes cache so
            # trial 2 re-pays the same work as trial 1
            spark.catalog.clearCache()
            docs.persist().count()  # re-pin the input after the clear
            t0 = time.time()
            n_rows = (
                minhash_bands(docs, materialize_codes=True)
                .groupBy("band_id", "band_key")
                .count()
                .count()
            )
            dt = time.time() - t0
            trials.append(round(dt, 2))
            if best is None or dt < best:
                best = dt
    finally:
        spark.stop()
    hw_after = hw_shuffle_run(cores)
    return {
        "cores": cores,
        "sec": round(best, 2),
        "trials": trials,
        "buckets": int(n_rows),
        "replicate": replicate,
        # raw-Python shuffle ceiling bracketing the Spark trials
        # (peak of before/after = the window's achievable ceiling)
        "hw_tokens_per_sec": round(max(hw_before, hw_after), 1),
        "hw_bracket": [round(hw_before, 1), round(hw_after, 1)],
    }


def query_run(cores: int, name: str) -> dict:
    return _run_level_subprocess(["--query-level", str(cores), name])


def main() -> None:
    from gluon_ocr_spark.session import make_session
    from gluon_ocr_spark import queries as qmod

    t_start = time.time()

    # -- extraction scaling (north-rule metric) --------------------
    pages_path = ensure_pages_corpus(N_PAGES)

    def _bracket_unstable(r):
        a, b = r["hw_bracket"]
        return max(a, b) > 1.5 * min(a, b)

    def _pair(lo, hi):
        factor = hi["cores"] / lo["cores"]
        hw_ratio = hi["hw_docs_per_sec"] / lo["hw_docs_per_sec"]
        spark_ratio = hi["docs_per_sec"] / lo["docs_per_sec"]
        return {
            "lo": lo,
            "hi": hi,
            "scaling_efficiency": round(spark_ratio / factor, 3),
            "hw_ceiling": {
                "lo_docs_per_sec": lo["hw_docs_per_sec"],
                "hi_docs_per_sec": hi["hw_docs_per_sec"],
                "ratio": round(hw_ratio, 3),
            },
            "hw_ceiling_efficiency": round(hw_ratio / factor, 3),
            # how much of the physically-achievable scaling Spark delivers
            "relative_efficiency": round(spark_ratio / hw_ratio, 3),
            # a shared host can starve the mp baseline itself; flag
            # windows where the "ceiling" is implausible (sub-1x
            # scaling) or per-level brackets disagree >1.5x
            "hw_window_suspect": hw_ratio < 1.0 or _bracket_unstable(lo) or _bracket_unstable(hi),
        }

    # HEADLINE: layout-salted corpus, scan-direct extraction — the
    # 100 TB production shape (salt once at ingest; re-shuffling the
    # whole payload table per job is exactly what a lake job avoids).
    # Measured on this box: the per-job salt shuffle costs ~2.5 s of
    # an ~7 s job at local[16] but HELPS at local[4] (better balance
    # at tiny parallelism), so it distorts the scaling ratio both ways.
    ps_lo = extraction_run(LO_LEVEL, pages_path, salted=False)
    ps_hi = extraction_run(HI_LEVEL, pages_path, salted=False)
    extraction = {"pages": N_PAGES, **_pair(ps_lo, ps_hi)}
    # SECONDARY: per-job salt shuffle (foreign-input path, always
    # available when the source layout is unknown/skewed).
    if os.environ.get("SPARK_GRAFT_BENCH_SALTED_PAIR", "1") == "1":
        s_lo = extraction_run(LO_LEVEL, pages_path, salted=True)
        s_hi = extraction_run(HI_LEVEL, pages_path, salted=True)
        extraction["salted_pair"] = _pair(s_lo, s_hi)

    # -- shuffle-job scaling pair (secondary two-level evidence) -----
    # dedup_minhash_pairs: hash pass + band shuffle + self-join —
    # the shuffle-bound complement to the map-bound extraction pair.
    if os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE_PAIR", "1") == "1":
        # ABBA order: this host throttles in multi-minute windows, and
        # a single lo→hi sequence can land hi in a throttled slice and
        # INVERT the pair (measured 7.6 s @4 vs 12.2 s @16 in one
        # window vs 2.3 s @16 steady-state). Two runs per level, best
        # wins; runs of the SAME level disagreeing >1.5x flag the
        # window suspect (the shuffle pair has no mp hardware bracket).
        # default AB (one subprocess per level) to bound total bench
        # wall; SPARK_GRAFT_BENCH_SHUFFLE_ABBA=1 doubles to ABBA for a
        # stronger receipt. Suspect signal: within-subprocess trial
        # spread >1.5x at either level, or a nonsensical ratio (this
        # host throttles in multi-minute windows that can invert a
        # single lo->hi sequence entirely — measured 2.3 s vs 24.9 s
        # for the SAME 16-core job in different windows).
        # ABBA default since round 4: this host throttles in multi-
        # minute windows and a single lo→hi sequence frequently lands
        # one leg in a throttled slice; two subprocesses per level
        # (best wins) double the chance each level sees one clean
        # window. SPARK_GRAFT_BENCH_SHUFFLE_ABBA=0 restores AB.
        order = (
            (LO_LEVEL, HI_LEVEL)
            if os.environ.get("SPARK_GRAFT_BENCH_SHUFFLE_ABBA", "1") == "0"
            else (LO_LEVEL, HI_LEVEL, HI_LEVEL, LO_LEVEL)
        )
        runs = {LO_LEVEL: [], HI_LEVEL: []}
        for level in order:
            runs[level].append(query_run(level, "minhash_bands_scaled"))
        q_lo = min(runs[LO_LEVEL], key=lambda r: r["sec"])
        q_hi = min(runs[HI_LEVEL], key=lambda r: r["sec"])
        factor = HI_LEVEL / LO_LEVEL
        eff = round((q_lo["sec"] / q_hi["sec"]) / factor, 3)
        # in-window hardware bracket (raw-Python hash→partition→
        # exchange→aggregate, hw_shuffle_run): what the BOX's own
        # shuffle scaled by in the same window. relative_efficiency
        # = Spark's ratio / the host's ratio — the honest number on
        # a host whose absolute throughput swings >2x between windows.
        hw_ratio = q_hi["hw_tokens_per_sec"] / q_lo["hw_tokens_per_sec"]
        spark_ratio = q_lo["sec"] / q_hi["sec"]

        def _disagree(rs):
            ss = [s for r in rs for s in r["trials"]]
            return max(ss) > 1.5 * min(ss)

        def _bracket_unstable(r):
            a, b = r["hw_bracket"]
            return max(a, b) > 1.5 * min(a, b)

        extraction["shuffle_pair"] = {
            "query": "minhash_bands_scaled",
            "lo": q_lo,
            "hi": q_hi,
            "scaling_efficiency": eff,
            "hw_ceiling_efficiency": round(hw_ratio / factor, 3),
            "relative_efficiency": round(spark_ratio / hw_ratio, 3),
            "window_suspect": _disagree(runs[LO_LEVEL])
            or _disagree(runs[HI_LEVEL])
            or _bracket_unstable(q_lo)
            or _bracket_unstable(q_hi)
            or hw_ratio < 1.0
            or eff > 1.15
            or eff < 0.25,
        }

    # -- query battery ----------------------------------------------
    spark = make_session(app="bench-queries", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    qtimes: dict[str, float] = {}
    try:
        # warm codegen AND the Python daemon workers (the md5 pass is
        # JVM-only — without a mapInPandas warmup the battery's FIRST
        # UDF query pays ~CPUS worker forks + pandas imports inside
        # its timed window, inflating extract_roundtrip vs the later
        # extract_pdf_roundtrip)
        spark.range(0, 100000, 1, CPUS).selectExpr("md5(cast(id as string)) h").where("h like 'a%'").count()

        def _noop_batches(batches):
            for b in batches:
                yield b

        spark.range(0, CPUS * 64, 1, CPUS).mapInPandas(_noop_batches, schema="id long").count()
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
    full = {
        "metric": "extraction docs/sec @ local[%d] + query battery wall" % HI_LEVEL,
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "extraction": extraction,
    }
    # full nested receipt (trials, hw brackets, probe spreads) goes to
    # a FILE; stdout gets a compact single-line summary as the LAST
    # line — round 4's driver failed to parse the receipt because the
    # fully-nested JSON line was long enough to be truncated in the
    # captured tail (BENCH_r04.json "parsed": null).
    os.makedirs(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH"), exist_ok=True)
    full_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "run_latest.json")
    with open(full_path, "w") as f:
        json.dump(full, f, indent=1)

    def _pair_summary(p):
        out = {
            "lo_docs_per_sec": p["lo"].get("docs_per_sec"),
            "hi_docs_per_sec": p["hi"].get("docs_per_sec"),
            "scaling_efficiency": p["scaling_efficiency"],
            "relative_efficiency": p.get("relative_efficiency"),
            "suspect": bool(p.get("hw_window_suspect") or p.get("window_suspect")),
        }
        if "sec" in p["lo"]:
            out["lo_sec"], out["hi_sec"] = p["lo"]["sec"], p["hi"]["sec"]
        return out

    compact = {
        "metric": full["metric"],
        "value": total,
        "unit": "sec",
        "queries": qtimes,
        "sf": full["sf"],
        "extraction": {
            "pages": extraction["pages"],
            "unsalted": _pair_summary(extraction),
            **(
                {"salted": _pair_summary(extraction["salted_pair"])}
                if "salted_pair" in extraction
                else {}
            ),
            **(
                {"shuffle": _pair_summary(extraction["shuffle_pair"])}
                if "shuffle_pair" in extraction
                else {}
            ),
            "full_receipt": "BENCH/run_latest.json",
        },
    }
    print(json.dumps(compact, separators=(",", ":")))


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "--extract-level":
        salted = len(sys.argv) < 5 or sys.argv[4] != "presalted"
        print(json.dumps(_extraction_run_inproc(int(sys.argv[2]), sys.argv[3], salted=salted)))
    elif len(sys.argv) >= 4 and sys.argv[1] == "--query-level":
        print(json.dumps(_query_run_inproc(int(sys.argv[2]), sys.argv[3])))
    else:
        main()
