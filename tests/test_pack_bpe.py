"""BPE-fed packing/mix budgeting (VERDICT r4 item 5): the manifest's
token currency is the REAL corpus-trained broadcast-merges BPE count,
and the distributed two-phase prefix sum matches a single-threaded
driver recompute token-for-token."""

SF = "/root/testdata/sf0.001"


def _driver_counts(spark):
    from gluon_ocr_spark.kernels.bpe import build_ranks, build_vocab, encode_ids
    from gluon_ocr_spark.operators.textstats import train_bpe_on_corpus

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = train_bpe_on_corpus(docs, n_merges=50)
    ranks, vocab = build_ranks(merges), build_vocab(merges)
    return {
        r["doc_id"]: (r["lang"], len(encode_ids(r["text"], ranks, vocab)))
        for r in docs.select("doc_id", "lang", "text").collect()
    }


def test_pack_bpe_matches_driver_prefix_sum(spark):
    from gluon_ocr_spark.queries import corpus_pack_bpe_query

    rows = corpus_pack_bpe_query(spark, SF).orderBy("doc_id").collect()
    expect = _driver_counts(spark)
    assert len(rows) == len(expect)
    off = 0
    for r in rows:
        _, n = expect[r["doc_id"]]
        assert r["n_tokens"] == n
        assert r["start_off"] == off
        assert r["seq_first"] == off // 2048
        assert r["seq_last"] == (off + n - 1) // 2048
        assert r["straddles"] == (r["seq_first"] != r["seq_last"])
        off += n


def test_mix_bpe_sums_to_budget_and_uses_bpe_totals(spark):
    from gluon_ocr_spark.queries import corpus_mix_bpe_query

    rows = corpus_mix_bpe_query(spark, SF).collect()
    expect = _driver_counts(spark)
    totals: dict[str, int] = {}
    for lang, n in expect.values():
        totals[lang] = totals.get(lang, 0) + n
    assert {r["lang"]: r["lang_tokens"] for r in rows} == totals
    assert sum(r["alloc_tokens"] for r in rows) == 1_000_000
    assert all(r["alloc_tokens"] - r["floor_alloc"] in (0, 1) for r in rows)
