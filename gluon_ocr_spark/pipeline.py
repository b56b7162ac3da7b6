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
        obs_exact = Observation("after_exact_dedup")
        deduped = deduped.observe(obs_exact, F.count(F.lit(1)).alias("n"))
        # cc_workdir (object storage at the lake) makes the iterative
        # CC stage resumable: a failure mid-prune costs one star round
        deduped = drop_near_dups(deduped, id_col="url", text_col="text", cc_workdir=cc_workdir)
    else:
        obs_exact = None
    keep = deduped.select(
        "url", "text", "n_lines", "n_chars", "n_tokens", "stop_ratio",
        "lexical_diversity", "dup_bigram_frac", "consec_dup_frac", "content_fp"
    )
    keep = keep.observe(obs_out, F.count(F.lit(1)).alias("n"))
    keep.write.mode("overwrite").parquet(out_dir)

    counters = {
        "pages_in": obs_in.get["n"],
        "corpus_out": obs_out.get["n"],
        "out_dir": out_dir,
    }
    if obs_exact is not None:
        counters["after_exact_dedup"] = obs_exact.get["n"]
    return counters
