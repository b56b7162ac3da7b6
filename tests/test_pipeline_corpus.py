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


def test_prepare_corpus_near_dedup_collapses_chain(spark, tmp_path):
    """A~B~C lightly-edited near-dup chain collapses to ONE kept doc.

    Exact hashing cannot see these (all three texts differ), and a
    pairwise keep rule would leave the transitive end alive; the
    minhash-pairs → connected-components prune in prepare_corpus
    must keep only the min-url canonical."""
    from gluon_ocr_spark.sources.pages import wrap_text_as_page

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four "
        "five six seven eight nine ten eleven twelve thirteen fourteen"
    )
    texts = {
        "a": base + " fifteen",
        "b": base + " sixteen",            # ~ a (1 token differs)
        "c": "amended " + base + " sixteen",  # ~ b (1 token differs from b)
        "solo": (
            "entirely different document about rivers lakes mountains "
            "valleys forests deserts plains glaciers islands deltas "
            "estuaries canyons plateaus ridges summits basins fjords"
        ),
    }
    rows = [
        (f"page://{k}", bytearray(wrap_text_as_page(i, t)))
        for i, (k, t) in enumerate(sorted(texts.items()))
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")

    out = str(tmp_path / "near")
    stats = prepare_corpus(spark, pages, out, num_partitions=2)
    corpus = spark.read.parquet(out)
    kept = sorted(r["url"] for r in corpus.select("url").collect())
    assert kept == ["page://a", "page://solo"], kept
    assert stats["after_exact_dedup"] == 4  # exact dedup saw 4 distinct texts
    assert stats["corpus_out"] == 2

    # the exact-only pipeline ships all three near-dups — the gap
    # the near_dedup stage closes
    out2 = str(tmp_path / "exact_only")
    stats2 = prepare_corpus(spark, pages, out2, num_partitions=2, near_dedup=False)
    assert stats2["corpus_out"] == 4
    assert "after_exact_dedup" not in stats2


def test_prepare_corpus_near_dedup_resumable_cc(spark, tmp_path):
    """cc_workdir routes the near-dup prune through the durable
    connected_components_resumable: same kept set as the in-memory
    CC, with round snapshots on disk (the crash-resume surface)."""
    import os

    from gluon_ocr_spark.sources.pages import wrap_text_as_page

    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu one two three four"
    )
    texts = {
        "a": base + " five",
        "b": base + " six",
        "solo": (
            "entirely different document about rivers lakes mountains "
            "valleys forests deserts plains glaciers islands deltas "
            "estuaries canyons plateaus ridges summits basins fjords"
        ),
    }
    rows = [
        (f"page://{k}", bytearray(wrap_text_as_page(i, t)))
        for i, (k, t) in enumerate(sorted(texts.items()))
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    out = str(tmp_path / "corpus")
    ccdir = str(tmp_path / "cc_work")
    stats = prepare_corpus(spark, pages, out, num_partitions=2, cc_workdir=ccdir)
    kept = sorted(r["url"] for r in spark.read.parquet(out).select("url").collect())
    assert kept == ["page://a", "page://solo"]
    assert stats["corpus_out"] == 2
    # durable round snapshots exist (round=0000 at minimum)
    assert os.path.exists(os.path.join(ccdir, "round=0000", "_SUCCESS"))


def test_prepare_corpus_remove_spans(spark, tmp_path):
    """remove_spans=True strips cross-doc duplicated runs (the
    boilerplate riding INSIDE otherwise-unique pages) before the
    gates judge the cleaned text."""
    from gluon_ocr_spark.sources.pages import wrap_text_as_page

    boiler = (
        "subscribe to our newsletter for all the latest updates and "
        "exclusive offers delivered straight to your inbox today"
    )
    body_a = (
        "unique article about glaciers carving deep valleys through "
        "ancient mountain ranges over countless millennia of slow ice"
    )
    body_b = (
        "completely different report covering harvest yields across "
        "southern provinces after an unusually wet spring season there"
    )
    pages = spark.createDataFrame(
        [
            ("page://a", bytearray(wrap_text_as_page(0, body_a + " " + boiler))),
            ("page://b", bytearray(wrap_text_as_page(1, boiler + " " + body_b))),
        ],
        "url string, html binary",
    )
    out = str(tmp_path / "spanclean")
    stats = prepare_corpus(spark, pages, out, num_partitions=2, remove_spans=True)
    rows = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert stats["corpus_out"] == 2
    assert "subscribe" not in rows["page://a"] and "inbox" not in rows["page://a"]
    assert rows["page://a"].startswith("unique article about glaciers")
    assert "subscribe" not in rows["page://b"]
    assert rows["page://b"].endswith("wet spring season there")


def test_prepare_corpus_remove_spans_sa(spark, tmp_path):
    """span_method='sa' runs the sharded suffix-array removal: same
    boilerplate kill as the k-gram path when the dup pair lands in
    one shard (forced here with a tiny corpus), arbitrary length."""
    from gluon_ocr_spark.sources.pages import wrap_text_as_page

    boiler = (
        "subscribe to our newsletter for all the latest updates and "
        "exclusive offers delivered straight to your inbox today"
    )
    body_a = (
        "unique article about glaciers carving deep valleys through "
        "ancient mountain ranges over countless millennia of slow ice"
    )
    body_b = (
        "completely different report covering harvest yields across "
        "southern provinces after an unusually wet spring season there"
    )
    pages = spark.createDataFrame(
        [
            ("page://a", bytearray(wrap_text_as_page(0, body_a + " " + boiler))),
            ("page://b", bytearray(wrap_text_as_page(1, boiler + " " + body_b))),
        ],
        "url string, html binary",
    )
    out = str(tmp_path / "spanclean_sa")
    stats = prepare_corpus(
        spark, pages, out, num_partitions=2,
        remove_spans=True, span_method="sa", span_shards=1,
    )
    rows = {r["url"]: r["text"] for r in spark.read.parquet(out).collect()}
    assert stats["corpus_out"] == 2
    assert "subscribe" not in rows["page://a"] and "inbox" not in rows["page://a"]
    assert rows["page://a"].startswith("unique article about glaciers")
    assert "subscribe" not in rows["page://b"]
    assert rows["page://b"].endswith("wet spring season there")
