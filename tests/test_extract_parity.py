"""Byte-identical parity: Spark pipeline vs single-process oracle,
plus invariance under partitioning — the north-rule correctness gate."""

import pytest

from gluon_ocr_spark.kernels.extract import extract_document
from gluon_ocr_spark.operators.extract import docs_to_lines, extract_docs
from gluon_ocr_spark.operators.partitioning import binpack_partition, salt_partition
from gluon_ocr_spark.sources.pages import make_pages, pages_dataframe

N_PAGES = 120
SEED = 42


@pytest.fixture(scope="module")
def oracle_docs():
    return {p["url"]: extract_document(p["html"]) for p in make_pages(N_PAGES, SEED)}


def test_generator_round_trip(oracle_docs):
    """Oracle recovers the generator's ground-truth text exactly."""
    truth = {p["url"]: p["text"] for p in make_pages(N_PAGES, SEED)}
    assert {u: r.text for u, r in oracle_docs.items()} == truth


def test_spark_byte_identical_to_oracle(spark, oracle_docs):
    pages = pages_dataframe(spark, N_PAGES, SEED, partitions=4)
    got = {r["url"]: r["text"] for r in extract_docs(pages).select("url", "text").collect()}
    assert got == {u: r.text for u, r in oracle_docs.items()}


def test_partition_invariance(spark):
    """Same docs regardless of parallelism/partitioning (SURVEY §5.4)."""
    results = []
    for parts, salter in [(1, None), (3, salt_partition), (8, salt_partition), (4, binpack_partition)]:
        pages = pages_dataframe(spark, 60, SEED, partitions=parts)
        if salter is binpack_partition:
            pages = binpack_partition(pages, 4)
            docs = extract_docs(pages)
        elif salter:
            docs = extract_docs(pages, num_partitions=parts)
        else:
            docs = extract_docs(pages)
        results.append(sorted((r["url"], r["text"]) for r in docs.select("url", "text").collect()))
    assert all(r == results[0] for r in results[1:])


def test_lines_match_oracle_spans(spark, oracle_docs):
    pages = pages_dataframe(spark, 30, SEED, partitions=2)
    lines = docs_to_lines(extract_docs(pages)).collect()
    by_url = {}
    for r in lines:
        by_url.setdefault(r["url"], []).append(r)
    for url, rows in by_url.items():
        rows.sort(key=lambda r: r["line_id"])
        oracle = oracle_docs[url].lines
        assert len(rows) == len(oracle)
        for got, exp in zip(rows, oracle):
            assert (got["start"], got["end"], got["line_text"], got["tag"]) == (
                exp.start,
                exp.end,
                exp.text,
                exp.tag,
            )
            assert got["score"] == pytest.approx(exp.score, abs=0)


def test_empty_and_null_payloads(spark):
    import pandas as pd

    pdf = pd.DataFrame({"url": ["u1", "u2"], "html": [b"", None]})
    df = spark.createDataFrame(pdf)
    out = extract_docs(df).collect()
    assert sorted((r["url"], r["text"]) for r in out) == [("u1", ""), ("u2", "")]
