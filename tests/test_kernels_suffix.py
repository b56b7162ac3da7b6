"""Suffix-array kernel (kernels/suffix.py) + the sharded
remove_dup_spans_sa operator.

Pins: SA/LCP against naive reference sorts, the covered-set
equivalence with t-gram marking (the property the SQL oracle relies
on), Lee-et-al planted-duplicate behavior, and the operator's
case/byte-stability contract."""

from __future__ import annotations

import numpy as np
import pytest

from gluon_ocr_spark.kernels.suffix import (
    build_corpus,
    cross_doc_dup_starts,
    dedup_spans,
    lcp_array,
    longest_repeat,
    suffix_array,
)


def _naive_sa(s):
    return sorted(range(len(s)), key=lambda i: s[i:])


def _naive_lcp(s, sa):
    out = [0] * len(sa)
    for i in range(1, len(sa)):
        a, b = s[sa[i - 1] :], s[sa[i] :]
        l = 0
        while l < min(len(a), len(b)) and a[l] == b[l]:
            l += 1
        out[i] = l
    return out


def test_suffix_array_matches_naive_sort():
    rng = np.random.default_rng(7)
    for _ in range(100):
        n = int(rng.integers(1, 50))
        s = rng.integers(0, 4, size=n).tolist()
        assert suffix_array(s).tolist() == _naive_sa(s)


def test_lcp_matches_naive():
    rng = np.random.default_rng(11)
    for _ in range(100):
        n = int(rng.integers(1, 50))
        s = rng.integers(0, 3, size=n).tolist()
        sa = suffix_array(s)
        assert lcp_array(s, sa).tolist() == _naive_lcp(s, sa)


def test_empty_and_singleton():
    assert suffix_array([]).tolist() == []
    assert suffix_array([5]).tolist() == [0]
    assert lcp_array([], np.empty(0, dtype=np.int64)).tolist() == []
    assert longest_repeat([1, 2, 3]) == (0, 0)


def test_longest_repeat_known():
    # "banana"-style: [b,a,n,a,n,a] -> "ana" length 3 at position 1
    assert longest_repeat([0, 1, 2, 1, 2, 1]) == (3, 1)


def test_covered_set_equals_tgram_marking():
    """The oracle-equivalence property: SA dup starts == positions
    whose t-window occurs in >= 2 distinct docs."""
    from collections import defaultdict

    rng = np.random.default_rng(13)
    for _ in range(60):
        docs = [
            [f"w{int(x)}" for x in rng.integers(0, 5, size=int(rng.integers(0, 25)))]
            for _ in range(int(rng.integers(2, 6)))
        ]
        t = int(rng.integers(2, 5))
        gd = defaultdict(set)
        occ = defaultdict(list)
        for d, doc in enumerate(docs):
            for i in range(len(doc) - t + 1):
                g = tuple(doc[i : i + t])
                gd[g].add(d)
                occ[g].append((d, i))
        expected = set()
        for g, ds in gd.items():
            if len(ds) >= 2:
                expected.update(occ[g])
        seq, doc_of, pos_of = build_corpus(docs)
        got = {
            (int(doc_of[p]), int(pos_of[p]))
            for p in cross_doc_dup_starts(seq, doc_of, t)
        }
        assert got == expected


def test_planted_duplicates():
    boiler = [f"b{i}" for i in range(6)]
    docs = [
        ["x1", "x2"] + boiler + ["x3"],
        ["y1"] + boiler + ["y2", "y3"],
        ["z1", "z2", "z3"],
    ]
    out = dedup_spans(docs, 6)
    assert out[0] == (["x1", "x2", "x3"], 3)
    assert out[1] == (["y1", "y2", "y3"], 3)
    assert out[2] == (["z1", "z2", "z3"], 3)  # untouched
    # below threshold: survives
    out2 = dedup_spans(docs, 7)
    assert out2[0] == (docs[0], len(docs[0]))


def test_intra_doc_repeat_not_cross_doc():
    rep = ["r1", "r2", "r3"]
    docs = [rep + ["a"] + rep, ["b", "c", "d"]]
    out = dedup_spans(docs, 3)
    assert out[0] == (docs[0], 7)  # repeated only within one doc


@pytest.fixture(scope="module")
def sa_operator_out(spark):
    from pyspark.sql import Row, functions as F

    from gluon_ocr_spark.operators.textstats import remove_dup_spans_sa

    boiler = " ".join(f"Tok{i}" for i in range(16))
    rows = [
        Row(doc_id=0, text=f"Unique Alpha words {boiler} tail zero"),
        Row(doc_id=2, text=f"other Beta start {boiler} tail two"),
        Row(doc_id=4, text="Completely Untouched Document four"),
        # doc 1 shares the boiler but lives in the OTHER shard (odd)
        Row(doc_id=1, text=f"odd shard copy {boiler} tail one"),
    ]
    df = spark.createDataFrame(rows)
    out = remove_dup_spans_sa(
        df,
        min_len=16,
        n_shards=2,
        shard=F.pmod(F.col("doc_id"), F.lit(2)),
        counts_col="n_kept",
    )
    return {r.doc_id: r for r in out.collect()}


def test_operator_removes_cross_doc_boiler(sa_operator_out):
    # the shared run is boiler + " tail" (17 tokens), so "tail" goes
    # with it — arbitrary-length matching, not just the 16-seed
    assert sa_operator_out[0].text == "Unique Alpha words zero"
    assert sa_operator_out[0].n_kept == 4
    assert sa_operator_out[2].text == "other Beta start two"


def test_operator_case_preserved_and_untouched_identical(sa_operator_out):
    # detection is lowercase but the rebuild keeps original case
    assert "Alpha" in sa_operator_out[0].text
    assert sa_operator_out[4].text == "Completely Untouched Document four"
    assert sa_operator_out[4].n_kept == 4


def test_operator_shard_boundary_bound(sa_operator_out):
    # doc 1 shares the boiler but no same-shard partner: survives —
    # the documented cross-shard recall bound
    assert "Tok0" in sa_operator_out[1].text
