"""Streaming extraction through the batch lineage/commit protocol:
one audit trail, exactly-once across stream restarts."""

from gluon_ocr_spark.kernels.extract import extract_document
from gluon_ocr_spark.plans.lineage import ExtractionJob
from gluon_ocr_spark.sources.pages import make_pages, pages_dataframe
from gluon_ocr_spark.streaming.pipeline import run_extract_stream_with_lineage


def test_stream_lineage_exactly_once(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out = str(tmp_path / "warehouse")
    ckpt = str(tmp_path / "ckpt")

    pages_dataframe(spark, 24, seed=42, partitions=2).write.parquet(pages_dir)

    q = run_extract_stream_with_lineage(spark, pages_dir, out, ckpt, available_now=True)
    q.awaitTermination(180)

    job = ExtractionJob(out)
    docs = job.read_docs(spark)
    got = {r["url"]: r["text"] for r in docs.select("url", "text").collect()}
    exp = {p["url"]: extract_document(p["html"]).text for p in make_pages(24, 42)}
    assert got == exp

    lin = job.lineage(spark)
    assert lin.agg({"url_count": "sum"}).collect()[0][0] == 24
    assert all(r["run_id"].startswith("epoch-") for r in lin.select("run_id").collect())

    # restart with same checkpoint + new data: only the delta commits
    more = pages_dataframe(spark, 30, seed=42, partitions=2).where("url > ''")
    more.write.mode("overwrite").parquet(pages_dir + "_extra")
    # append 6 genuinely-new pages as an extra file in pages_dir
    extra = spark.createDataFrame(
        [(p["url"], p["warc_ts"], p["html"], p["text"], p["lang"]) for p in make_pages(30, 42)[24:]],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    extra.coalesce(1).write.mode("append").parquet(pages_dir)

    q2 = run_extract_stream_with_lineage(spark, pages_dir, out, ckpt, available_now=True)
    q2.awaitTermination(180)
    assert job.read_docs(spark).count() == 30
    assert job.read_docs(spark).select("url").distinct().count() == 30
