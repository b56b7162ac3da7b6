"""Fleet-level extraction quality: reference metrics (M3) computed
driver-side over distributed extraction output (SURVEY §2.8
'Spark mapping': collect + pure-Python evaluate, plus relational
rollups of per-doc metric columns)."""

from pyspark.sql import functions as F

from gluon_ocr_spark.kernels.metrics import combine_recog, recog_distance_eval
from gluon_ocr_spark.operators.extract import extract_docs
from gluon_ocr_spark.sources.pages import make_pages, pages_dataframe


def test_corpus_extraction_quality_metrics(spark):
    truth = {p["url"]: p["text"] for p in make_pages(40, seed=42)}
    pages = pages_dataframe(spark, 40, seed=42, partitions=3)
    got = {r["url"]: r["text"] for r in extract_docs(pages).select("url", "text").collect()}
    assert set(got) == set(truth)

    # per-LINE like the reference's per-crop evaluation (edit distance
    # is O(len²); whole documents would be quadratic in page size)
    per_image = [
        recog_distance_eval(truth[u].split("\n"), got[u].split("\n")) for u in truth
    ]
    combined = combine_recog(per_image)
    # byte-identical extraction ⇒ perfect micro P/R/hmean
    assert combined["precision"] == 1.0
    assert combined["recall"] == 1.0
    assert combined["hmean"] == 1.0


def test_relational_metric_rollup(spark):
    """Per-doc metric columns aggregate relationally (fleet dashboards):
    n_chars/n_lines sums over the distributed output."""
    pages = pages_dataframe(spark, 30, seed=42, partitions=2)
    docs = extract_docs(pages)
    agg = docs.agg(
        F.sum("n_chars").alias("chars"),
        F.sum("n_lines").alias("lines"),
        F.count("*").alias("n"),
    ).collect()[0]
    exp = [p["text"] for p in make_pages(30, seed=42)]
    assert agg["n"] == 30
    assert agg["chars"] == sum(len(t) for t in exp)
    assert agg["lines"] == sum(t.count("\n") + 1 for t in exp)
