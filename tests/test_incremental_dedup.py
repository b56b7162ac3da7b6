"""Incremental corpus dedup: a new batch filtered against a settled
snapshot (operators.dedup.incremental_dedup).

Semantics under test (first-arrival wins):

* no admitted doc duplicates the snapshot, exactly or nearly;
* the admitted set is internally dedup-clean;
* every rejected doc has a concrete witness (an exact twin or a
  verified near-dup neighbor in snapshot ∪ admitted);
* chaining two increments extends the snapshot consistently (the
  second batch is filtered against snapshot + first admissions).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from gluon_ocr_spark.operators.dedup import (
    incremental_dedup,
    jaccard_verify,
    snapshot_artifacts,
)


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# 21-token docs: one changed token keeps Jaccard at 0.905 AND leaves
# >=1 of the 4 LSH bands intact (verified offline against the same
# md5 minhash math) — near-dup pairs here are real LSH candidates,
# not recall-lottery tickets.
_BASE2 = (
    "breaking news markets rallied today as investors cheered the quarterly "
    "earnings report beating all analyst expectations for the third consecutive time"
)
_B14 = (
    "a long form essay on the history of typography and print design movements "
    "across several european countries during the industrial era"
)

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, _BASE2),
    (3, "copyright footer all rights reserved contact us terms of service"),
]

BATCH = [
    # 10: exact duplicate of base doc 1 -> rejected (stage 1)
    (10, "the quick brown fox jumps over the lazy dog near the river bank"),
    # 11/12: exact duplicates of each other -> min id 11 admitted (stage 2)
    (11, "entirely fresh reporting about local sports results from saturday"),
    (12, "entirely fresh reporting about local sports results from saturday"),
    # 13: near-dup of base doc 2 (last token changed) -> rejected (stage 3)
    (13, _BASE2.rsplit(" ", 1)[0] + " period"),
    # 14/15: near-dups of each other, unrelated to base -> 14 admitted (stage 4)
    (14, _B14),
    (15, _B14.rsplit(" ", 1)[0] + " age"),
    # 16: genuinely new -> admitted
    (16, "totally unrelated content about gardening tips for early spring"),
]


@pytest.fixture(scope="module")
def admitted(spark):
    kept = incremental_dedup(_docs(spark, BATCH), _docs(spark, BASE))
    return sorted(r.doc_id for r in kept.select("doc_id").collect())


def test_stagewise_expected_set(admitted):
    assert admitted == [11, 14, 16]


def test_admitted_disjoint_from_snapshot_fps(spark, admitted):
    union = _docs(spark, BASE + [r for r in BATCH if r[0] in admitted])
    n_fps = union.select(F.md5(F.lower("text"))).distinct().count()
    assert n_fps == union.count()


def test_rejected_docs_have_a_witness(spark, admitted):
    """Every rejected batch doc is either an exact twin of a surviving
    doc or jaccard-verified (>= 0.8) against one."""
    rejected = [r for r in BATCH if r[0] not in admitted]
    survivors = _docs(spark, BASE + [r for r in BATCH if r[0] in admitted])
    rej = _docs(spark, rejected)
    exact = (
        rej.alias("r")
        .join(
            survivors.alias("s"),
            F.md5(F.lower(F.col("r.text"))) == F.md5(F.lower(F.col("s.text"))),
        )
        .select(F.col("r.doc_id").alias("doc_id"))
    )
    both = rej.unionByName(survivors)
    cand = (
        rej.select(F.col("doc_id").alias("doc_a"))
        .crossJoin(survivors.select(F.col("doc_id").alias("doc_b")))
    )
    near = jaccard_verify(both, cand).select(F.col("doc_a").alias("doc_id"))
    witnessed = {r.doc_id for r in exact.union(near).distinct().collect()}
    assert witnessed == {r[0] for r in rejected}


def test_two_increment_chaining(spark):
    """Admit batch1, extend the snapshot, then batch2 must be filtered
    against snapshot + batch1 admissions."""
    b20 = (
        "novel text about astronomy and the motion of outer planets observed "
        "through the new space telescope during its first operational year"
    )
    b1 = [(20, b20)]
    b2 = [
        # near-dup of the batch-1 admission -> must be rejected
        (30, b20.rsplit(" ", 1)[0] + " months"),
        (31, "independent recipe collection for slow cooked winter stews"),
    ]
    base = _docs(spark, BASE)
    a1 = incremental_dedup(_docs(spark, b1), base)
    assert [r.doc_id for r in a1.select("doc_id").collect()] == [20]
    base2 = base.unionByName(a1.select("doc_id", "text"))
    a2 = incremental_dedup(_docs(spark, b2), base2)
    assert sorted(r.doc_id for r in a2.select("doc_id").collect()) == [31]


def test_precomputed_artifacts_match_derived(spark):
    base = _docs(spark, BASE)
    batch = _docs(spark, BATCH)
    fps, bands = snapshot_artifacts(base)
    via_artifacts = incremental_dedup(batch, base, base_fps=fps, base_bands=bands)
    derived = incremental_dedup(batch, base)
    assert sorted(r.doc_id for r in via_artifacts.select("doc_id").collect()) == sorted(
        r.doc_id for r in derived.select("doc_id").collect()
    )
