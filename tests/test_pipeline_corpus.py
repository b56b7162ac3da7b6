"""End-to-end corpus-prep pipeline: extract → quality → dedup → write."""

from pyspark.sql import functions as F

from gluon_ocr_spark.pipeline import prepare_corpus
from gluon_ocr_spark.sources.pages import pages_dataframe


def test_prepare_corpus_counts_and_dedup(spark, tmp_path):
    out = str(tmp_path / "corpus")
    pages = pages_dataframe(spark, 40, seed=42, partitions=2)
    # inject exact duplicates: same html under different urls
    dups = pages.limit(5).withColumn("url", F.concat(F.lit("zzdup-"), F.col("url")))
    all_pages = pages.unionAll(dups)

    stats = prepare_corpus(spark, all_pages, out, num_partitions=2)
    assert stats["pages_in"] == 45

    corpus = spark.read.parquet(out)
    n = corpus.count()
    assert stats["corpus_out"] == n
    assert n <= 40  # the 5 injected dups are gone (min-url canonical kept)
    assert n >= 30  # quality gate keeps the bulk of real pages

    # dedup invariant: content_fp unique
    assert corpus.select("content_fp").distinct().count() == n
    # quality invariant
    assert corpus.where(F.col("n_tokens") < 10).count() == 0
    # canonical keep: for duplicated html, the original (non-zzdup-) url wins
    assert corpus.where(F.col("url").startswith("zzdup-")).count() == 0
