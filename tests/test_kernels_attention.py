"""Greedy attention decoder kernel (N6/T3): determinism, EOS stop,
max-len cap, shape validation."""

import numpy as np
import pytest

from gluon_ocr_spark.kernels.attention import GreedyAttentionDecoder


@pytest.fixture(scope="module")
def dec():
    return GreedyAttentionDecoder(voc_size=10, embed_dim=8, hidden=8, match_dim=8, seed=7)


def test_deterministic(dec):
    enc = np.random.default_rng(3).normal(size=(5, 8)).astype(np.float32)
    a = dec.decode(enc)
    b = dec.decode(enc)
    c = GreedyAttentionDecoder(10, 8, 8, 8, seed=7).decode(enc)
    assert a == b == c


def test_max_len_cap_and_eos_exclusive(dec):
    enc = np.random.default_rng(4).normal(size=(6, 8)).astype(np.float32)
    ids = dec.decode(enc, max_len=5)
    assert len(ids) <= 5
    assert dec.eos not in ids  # truncate-at-EOS (att_ids2text semantics)


def test_empty_and_bad_encoder(dec):
    assert dec.decode(np.zeros((0, 8), dtype=np.float32)) == []
    with pytest.raises(ValueError):
        dec.decode(np.zeros((3, 5), dtype=np.float32))


def test_decode_text_maps_vocab(dec):
    enc = np.random.default_rng(5).normal(size=(4, 8)).astype(np.float32)
    vocab = list("abcdefghij")
    txt = dec.decode_text(enc, vocab)
    assert isinstance(txt, str)
    assert all(ch in vocab for ch in txt)


def test_different_encoders_differ(dec):
    r = np.random.default_rng(6)
    outs = {tuple(dec.decode(r.normal(size=(5, 8)).astype(np.float32))) for _ in range(8)}
    assert len(outs) > 1  # the decoder actually reads its input
