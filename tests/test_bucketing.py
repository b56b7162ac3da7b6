"""G5 bucket batching (recog_dataset.py:150-220, 295-347)."""

import math

from gluon_ocr_spark.operators.bucketing import bucket_batches, bucket_key


def test_bucket_key_reference_cases():
    # 32x100 crop, 7-char text: ratio = ceil(32*100/32/128)=1 → (32,128,10)
    assert bucket_key(32, 100, 7) == (32, 128, 10)
    # tall crop swaps h/w first (rot90-equivalent bucketing)
    assert bucket_key(100, 32, 7) == (32, 128, 10)
    # very wide crop snaps to the max bucket
    assert bucket_key(32, 2000, 7) == (32, 1024, 10)
    # text length bucket: len 10 → ceil(11/10)*10 = 20
    assert bucket_key(32, 100, 10) == (32, 128, 20)
    # width bucket boundary: short*w/h = 256 → exactly 2 buckets
    assert bucket_key(32, 256, 3) == (32, 256, 10)


def test_bucket_key_sql_matches_kernel(spark):
    """The integer-exact SQL twin computes the same buckets as the
    float reference formula on a dense grid."""
    from gluon_ocr_spark.operators.bucketing import bucket_key_sql

    cases = [(h, w, L) for h in (8, 17, 32, 63, 100) for w in (8, 31, 128, 511, 2049) for L in (0, 3, 9, 10, 59)]
    bw, tl = bucket_key_sql("h", "w", "L", "spark")
    rows = spark.createDataFrame(cases, "h int, w int, L int").selectExpr(
        "h", "w", "L", f"{bw} AS bw", f"{tl} AS tl"
    ).collect()
    for r in rows:
        _, kw, kl = bucket_key(r["h"], r["w"], r["L"])
        assert (r["bw"], r["tl"]) == (kw, kl), (r["h"], r["w"], r["L"])


def test_bucket_batches_semantics():
    # 2 buckets: A has 5 items, B has 3; batch_size 2, discard
    items = [(i, ("A",)) for i in range(5)] + [(10 + i, ("B",)) for i in range(3)]
    batches = bucket_batches(items, 2, seed=42, last_batch="discard")
    # discard: floor(5/2) + floor(3/2) = 3 batches
    assert len(batches) == 3
    for b in batches:
        assert len(b) == 2
        # no batch mixes buckets
        assert all(x < 10 for x in b) or all(x >= 10 for x in b)
    # keep: the two short tails also emitted
    kept = bucket_batches(items, 2, seed=42, last_batch="keep")
    assert sorted(len(b) for b in kept) == [1, 1, 2, 2, 2]
    # determinism
    assert bucket_batches(items, 2, seed=42) == bucket_batches(items, 2, seed=42)
    assert bucket_batches(items, 2, seed=43) != bucket_batches(items, 2, seed=42)
