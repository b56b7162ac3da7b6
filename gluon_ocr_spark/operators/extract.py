"""Distributed main-content extraction (the flagship operator).

Spark lifecycle (SURVEY §3.1 "Spark lifecycle replacement"):

    pages scan → select(url, html)          # manual column prune: never
                                            # drag text/lang through Arrow
          → salt repartition (skew)         # operators.partitioning
          → mapInPandas(_extract_batches)   # kernels.extract per page
          → docs / lines DataFrames
          → sink + lineage commit           # plans.lineage

The UDF body is exactly :func:`gluon_ocr_spark.kernels.extract.
extract_document` — the same function the single-process oracle runs —
so per-url output is byte-identical to the oracle by construction and
independent of partitioning (each page is processed alone; no
cross-row state, unlike the reference's batch-composition-dependent
LSTM trap, SURVEY §2.9.1, which this engine deliberately avoids).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..kernels.extract import extract_document
from .partitioning import salt_partition

# docs: one row per page; spans carry the per-line offsets (FIXTURES §5)
DOCS_SCHEMA = (
    "url string, text string, n_lines int, n_chars int, "
    "spans array<struct<line_id:int, start:int, end:int, score:float, tag:string, dom_order:int, line_text:string>>"
)

LINES_SCHEMA = "url string, line_id int, start int, end int, score float, tag string, dom_order int, line_text string"


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = {"url": [], "text": [], "n_lines": [], "n_chars": [], "spans": []}
        for url, payload in zip(pdf["url"], pdf["html"]):
            res = extract_document(payload if payload is not None else b"")
            out["url"].append(url)
            out["text"].append(res.text)
            out["n_lines"].append(len(res.lines))
            out["n_chars"].append(len(res.text))
            out["spans"].append(
                [
                    {
                        "line_id": ln.line_id,
                        "start": ln.start,
                        "end": ln.end,
                        "score": ln.score,
                        "tag": ln.tag,
                        "dom_order": ln.order,
                        "line_text": ln.text,
                    }
                    for ln in res.lines
                ]
            )
        yield pd.DataFrame(out)


def extract_docs(pages: DataFrame, num_partitions: int | None = None, payload_col: str = "html") -> DataFrame:
    """pages(url, …, html, …) → docs(url, text, n_lines, n_chars, spans).

    Column-prunes to (url, html) BEFORE the UDF edge — Catalyst cannot
    see into the UDF, so the projection must be explicit (SURVEY §4
    predicate-ordering row).
    """
    pruned = pages.select("url", F.col(payload_col).alias("html"))
    if num_partitions:
        pruned = salt_partition(pruned, num_partitions)
    return pruned.mapInPandas(_extract_batches, schema=DOCS_SCHEMA)


def docs_to_lines(docs: DataFrame) -> DataFrame:
    """Explode docs.spans into the `lines` table (FIXTURES §5
    golden_lines shape) — pure relational, no second parse."""
    s = F.explode("spans").alias("s")
    return docs.select("url", s).select(
        "url",
        F.col("s.line_id").alias("line_id"),
        F.col("s.start").alias("start"),
        F.col("s.end").alias("end"),
        F.col("s.score").alias("score"),
        F.col("s.tag").alias("tag"),
        F.col("s.dom_order").alias("dom_order"),
        F.col("s.line_text").alias("line_text"),
    )


def extract_lines(pages: DataFrame, num_partitions: int | None = None) -> DataFrame:
    return docs_to_lines(extract_docs(pages, num_partitions))
