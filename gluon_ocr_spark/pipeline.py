"""End-to-end training-corpus preparation pipeline.

The composite job a pre-training data pipeline runs over a crawl:

    pages (lake scan / WARC)
      → distributed extraction          (operators/extract, salt-partitioned)
      → quality gates                   (operators/textstats, JVM expressions)
      → exact dedup, canonical keep     (operators/dedup, hash window)
      → corpus write + counters

Each stage is a DataFrame transform — one Python (Arrow) stage for
extraction, everything downstream JVM-side, so Catalyst fuses the
quality filter + dedup window + projection into the post-UDF stages.
Stage counters come from a single pass (no double scans): Spark
``Observation`` metrics attached at stage boundaries are collected
during the one write action.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.dedup import drop_exact_dups, drop_near_dups
from .operators.extract import extract_docs
from .operators.textstats import (
    remove_dup_spans,
    with_fingerprint,
    with_quality,
    with_repetition,
    with_token_stats,
)


def prepare_corpus(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_partitions: int | None = None,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    max_dup_bigram_frac: float = 0.9,
    near_dedup: bool = True,
    cc_workdir: str | None = None,
    remove_spans: bool = False,
    span_method: str = "kgram",
    span_shards: int = 64,
) -> dict:
    """Run the full prep pipeline; returns stage counters.

    Counters ride the ONE write pass via ``Observation`` (Spark's
    query-metrics hook): pages_in is observed on the extraction output
    (one doc row per input page), corpus_out on the final projection.
    The previous version re-scanned the input with ``pages.count()``
    — a second full pass over the lake table at 100 TB."""
    from pyspark.sql import Observation

    obs_in = Observation("pages_in")
    obs_out = Observation("corpus_out")

    docs = extract_docs(pages, num_partitions=num_partitions)
    if remove_spans:
        # span-level exact-substring dedup BEFORE the gates: removal
        # changes token counts, so quality judges the cleaned text
        # (fully-duplicated docs empty out and fall to the n_chars
        # gate — stricter than the doc-level canonical keep alone).
        # The observation attaches AFTER this stage (row-preserving
        # left join) — inside it the docs node fans out into the
        # gram/token/rebuild branches and a CollectMetrics there
        # double-fires.
        #
        # span_method="sa" swaps in the sharded suffix-array operator
        # (kernels/suffix.py): arbitrary-length matches >= 16 tokens,
        # no gram table, exact string equality — recall is bounded by
        # the shard instead of the seed size (duplicates split across
        # shards survive; size shards so one shard's token stream
        # fits an executor).
        if span_method == "sa":
            from .operators.textstats import remove_dup_spans_sa

            docs = remove_dup_spans_sa(
                docs, id_col="url", text_col="text", n_shards=span_shards
            )
        else:
            docs = remove_dup_spans(docs, id_col="url", text_col="text")
    pages_in_count: int | None = None
    if remove_spans:
        # cut the lineage: the span stage fans the docs node into
        # gram/token/rebuild branches and the stages below self-
        # reference again — a CollectMetrics in that DAG is duplicated
        # across branches and Observation.get asserts; checkpoint
        # materialization also bypasses the listener that captures
        # observed metrics. So snapshot the cleaned docs once and
        # count the SNAPSHOT (no lake rescan). On a cluster prefer
        # reliable checkpoint()/a table write.
        docs = docs.localCheckpoint(eager=True)
        pages_in_count = docs.count()
    else:
        docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n"))
    docs = with_repetition(with_fingerprint(with_quality(with_token_stats(docs))))
    qualified = docs.where(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
        & (F.col("n_chars") > 0)
        # Gopher-rule repetition gate: boilerplate/spam drops here,
        # before the dedup shuffle ever sees it (pure expressions —
        # fused into the same codegen stage as the token gates)
        & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
    )
    deduped = drop_exact_dups(qualified, id_col="url", text_col="text")
    if near_dedup:
        # Transitive near-dup pruning: minhash bands → candidate
        # pairs → connected components → keep component-min docs.
        # Without it the corpus ships A~B~C chains of lightly-edited
        # boilerplate that exact hashing cannot see.
        #
        # MATERIALIZE the exact-deduped corpus first: the prune reads
        # it three times (candidate gen, Jaccard verify, final keep
        # join) and the CC loop runs several actions — without a
        # boundary every one re-executes extraction + gates from the
        # source. The snapshot count doubles as the stage counter
        # (an Observation threaded through a self-referencing
        # downstream is plan-shape fragile: the CollectMetrics node
        # duplicates across branches and `.get` asserts). On a
        # cluster use reliable checkpoint()/an intermediate table.
        deduped = deduped.localCheckpoint(eager=True)
        after_exact_count = deduped.count()
        # cc_workdir (object storage at the lake) makes the iterative
        # CC stage resumable: a failure mid-prune costs one star round
        deduped = drop_near_dups(deduped, id_col="url", text_col="text", cc_workdir=cc_workdir)
    else:
        after_exact_count = None
    keep = deduped.select(
        "url", "text", "n_lines", "n_chars", "n_tokens", "stop_ratio",
        "lexical_diversity", "dup_bigram_frac", "consec_dup_frac", "content_fp"
    )
    keep = keep.observe(obs_out, F.count(F.lit(1)).alias("n"))
    keep.write.mode("overwrite").parquet(out_dir)

    counters = {
        "pages_in": pages_in_count if pages_in_count is not None else obs_in.get["n"],
        "corpus_out": obs_out.get["n"],
        "out_dir": out_dir,
    }
    if after_exact_count is not None:
        counters["after_exact_dedup"] = after_exact_count
    return counters


class IncrementalCorpus:
    """Recurring-crawl corpus warehouse with exactly-once increment
    ingestion — the production loop around
    :func:`gluon_ocr_spark.operators.dedup.incremental_dedup`.

    Layout (plain-parquet emulation of Iceberg snapshots, same
    contract as :mod:`gluon_ocr_spark.plans.lineage`: an increment is
    COMMITTED only when its row appears in ``_lineage``, which is
    written last — orphan directories from crashes are invisible to
    readers and harmlessly re-processed on retry):

    * ``docs/increment=<id>/``  — admitted docs of that increment;
    * ``fps/increment=<id>/``   — their content fingerprints;
    * ``bands/increment=<id>/`` — their LSH band rows;
    * ``_lineage/``             — the commit log (one file per
      increment; the append is all-or-nothing).

    Each ``ingest`` reads the snapshot ONLY through the committed
    artifact tables (never re-hashing settled docs — at 10^12 docs
    the artifact read is the whole cost of history), extracts + gates
    the new pages with prepare_corpus' chain, admits survivors via
    the four-stage incremental dedup, and appends docs + artifacts +
    lineage. Re-running a committed increment_id is a no-op replay
    (idempotent under foreachBatch-style redelivery)."""

    #: commit-log row schema BEFORE the committed_at timestamp is
    #: appended at the commit point (single definition — used by the
    #: createDataFrame call in ingest)
    LINEAGE_ROW_SCHEMA = "increment_id string, qualified bigint, admitted bigint"

    def __init__(self, warehouse_dir: str):
        import os

        self.warehouse_dir = warehouse_dir
        self.docs_dir = os.path.join(warehouse_dir, "docs")
        self.fps_dir = os.path.join(warehouse_dir, "fps")
        self.bands_dir = os.path.join(warehouse_dir, "bands")
        self.lineage_dir = os.path.join(warehouse_dir, "_lineage")

    # -- read side ----------------------------------------------------
    def committed_ids(self, spark: SparkSession) -> list[str]:
        """Distinct committed increment ids from the commit log.

        ONLY a missing lineage directory maps to "no commits yet" — a
        transient read failure on an existing log must raise, not be
        mistaken for an empty warehouse (which would re-admit
        snapshot duplicates and double-commit the increment)."""
        import os

        if not os.path.isdir(self.lineage_dir):
            return []
        lin = spark.read.parquet(self.lineage_dir)
        return [r["increment_id"] for r in lin.select("increment_id").distinct().collect()]

    def _read_committed(
        self, spark: SparkSession, base_dir: str, ids: list[str]
    ) -> DataFrame | None:
        import os

        paths = [os.path.join(base_dir, f"increment={i}") for i in ids]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return None
        return spark.read.parquet(*paths)

    def read_docs(self, spark: SparkSession) -> DataFrame | None:
        """Union of committed increments only."""
        return self._read_committed(spark, self.docs_dir, self.committed_ids(spark))

    # -- write side ---------------------------------------------------
    def ingest(
        self,
        spark: SparkSession,
        pages: DataFrame,
        increment_id: str,
        min_tokens: int = 10,
        max_tokens: int = 100_000,
        max_dup_bigram_frac: float = 0.9,
        threshold: float = 0.8,
        num_partitions: int | None = None,
    ) -> dict:
        import os

        from .operators.dedup import incremental_dedup, snapshot_artifacts

        committed = self.committed_ids(spark)  # ONE commit-log read per ingest
        if increment_id in committed:
            lin = (
                spark.read.parquet(self.lineage_dir)
                .where(F.col("increment_id") == increment_id)
                .collect()[0]
            )
            return {
                "increment_id": increment_id,
                "qualified": lin["qualified"],
                "admitted": lin["admitted"],
                "replayed": True,
            }

        docs = with_repetition(with_quality(with_token_stats(
            extract_docs(pages, num_partitions=num_partitions)
        )))
        qualified = docs.where(
            (F.col("n_tokens") >= min_tokens)
            & (F.col("n_tokens") <= max_tokens)
            & (F.col("n_chars") > 0)
            & (F.col("dup_bigram_frac") <= max_dup_bigram_frac)
        ).select("url", "text", "n_lines", "n_chars", "n_tokens", "dup_bigram_frac")
        # one materialization of the gated batch: the dedup stages
        # read it repeatedly (same boundary as prepare_corpus)
        qualified = qualified.localCheckpoint(eager=True)
        n_qualified = qualified.count()

        base = self._read_committed(spark, self.docs_dir, committed)
        base_fps = self._read_committed(spark, self.fps_dir, committed)
        base_bands = self._read_committed(spark, self.bands_dir, committed)
        if base is None:
            # first increment: no snapshot — within-batch dedup only
            from .operators.dedup import drop_near_dups as _dnd

            admitted = _dnd(drop_exact_dups(qualified, id_col="url", text_col="text"),
                            id_col="url", text_col="text", threshold=threshold)
        else:
            admitted = incremental_dedup(
                qualified, base, id_col="url", text_col="text",
                threshold=threshold, base_fps=base_fps, base_bands=base_bands,
            )

        inc_docs_dir = os.path.join(self.docs_dir, f"increment={increment_id}")
        admitted.write.mode("overwrite").parquet(inc_docs_dir)
        written = spark.read.parquet(inc_docs_dir)
        fps, bands = snapshot_artifacts(written, id_col="url", text_col="text")
        fps.write.mode("overwrite").parquet(os.path.join(self.fps_dir, f"increment={increment_id}"))
        bands.write.mode("overwrite").parquet(
            os.path.join(self.bands_dir, f"increment={increment_id}")
        )
        n_admitted = written.count()
        lineage = spark.createDataFrame(
            [(increment_id, n_qualified, n_admitted)],
            self.LINEAGE_ROW_SCHEMA,
        ).withColumn("committed_at", F.current_timestamp())
        # THE commit point — one file, all-or-nothing append
        lineage.coalesce(1).write.mode("append").parquet(self.lineage_dir)
        return {
            "increment_id": increment_id,
            "qualified": n_qualified,
            "admitted": n_admitted,
            "replayed": False,
        }
