"""BPE merge tokenizer: hand-computed merges, losslessness, determinism."""

import pytest

from gluon_ocr_spark.kernels import bpe


def test_train_merges_hand_example():
    # corpus: "aa aa ab" → pre-tokens: "aa", " aa", " ab"
    # pair counts: (a,a)=2, (space,a)=2, (a,b)=1 — tie between
    # (a,a) and (space,a) broken by lexicographic min → (space, a)
    merges = bpe.train_merges(["aa aa ab"], n_merges=2)
    assert merges[0] == (b" ", b"a")
    # after merge 1: words are (a,a), ( a,a), ( a,b):
    # pairs: (a,a)=1, ( a,a)=1, ( a,b)=1 — all tied, lex min is ( a,a)
    assert merges[1] == (b" a", b"a")


def test_encode_matches_training_segmentation():
    merges = bpe.train_merges(["low lower lowest"], n_merges=6)
    ranks = bpe.build_ranks(merges)
    # "low" appears in every pre-token; after enough merges the common
    # stem merges into single symbols
    syms = bpe.encode("low lower", ranks)
    assert b"low" in syms or b"lo" in syms  # stem merged
    assert bpe.decode(syms) == "low lower"


@pytest.mark.parametrize(
    "text",
    [
        "the extraction pipeline's spark shuffle, 42 tokens!",
        "doesn't it? I'll we've they're",
        "naïve café — 中文文本 тест",
        "",
        "    leading and   multiple   spaces",
        "ALLCAPS MiXeD 123abc...",
    ],
)
def test_encode_lossless(text):
    ranks = bpe.default_ranks()
    assert bpe.decode(bpe.encode(text, ranks)) == text


def test_ids_bijective_with_symbols():
    ranks, vocab = bpe.default_ranks(), bpe.default_vocab()
    text = "the corpus token stream, 7 shuffles's worth"
    syms = bpe.encode(text, ranks)
    ids = bpe.encode_ids(text, ranks, vocab)
    assert len(syms) == len(ids)
    inv = {}
    for s, i in vocab.items():
        inv.setdefault(i, s)
    assert [inv[i] for i in ids] == syms


def test_default_merges_deterministic_across_calls():
    bpe.default_merges.cache_clear()
    a = bpe.default_merges()
    bpe.default_merges.cache_clear()
    b = bpe.default_merges()
    assert a == b and len(a) > 50


def test_merged_count_bounds():
    """pre-tokens <= merged tokens <= utf-8 bytes of the pre-token
    stream; in-vocab text merges far below the byte count."""
    ranks = bpe.default_ranks()
    text = "the extraction pipeline the corpus the token"
    pre = bpe.pre_tokenize(text)
    syms = bpe.encode(text, ranks)
    n_bytes = sum(len(t.encode()) for t in pre)
    assert len(pre) <= len(syms) <= n_bytes
    assert len(syms) < 0.5 * n_bytes  # in-vocab words actually merge


def test_encode_lossless_property():
    """Hypothesis: decode(encode(text)) == text for arbitrary
    unicode (any codepoint mix, any whitespace run) — byte-level BPE
    over the whitespace-complete pre-tokenizer loses nothing."""
    from hypothesis import given, settings, strategies as st

    ranks = bpe.default_ranks()
    vocab = bpe.default_vocab()

    @settings(max_examples=300, deadline=None)
    @given(st.text(max_size=120))
    def check(text):
        syms = bpe.encode(text, ranks)
        assert bpe.decode(syms) == text
        ids = bpe.encode_ids(text, ranks, vocab)
        assert len(ids) == len(syms)

    check()
