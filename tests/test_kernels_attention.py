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


class TestAttentionCellZoo:
    """N8 cell zoo (attention_cell.py:30-509)."""

    def test_masked_softmax_zeroes_masked(self):
        import numpy as np

        from gluon_ocr_spark.kernels.attention import masked_softmax

        w = masked_softmax(np.array([[1.0, 2.0, 3.0]]), np.array([[1, 0, 1]]))
        assert w[0, 1] == 0.0
        assert abs(w.sum() - 1.0) < 1e-12
        # hand-computed: softmax over (1,3) = e1/(e1+e3), e3/(e1+e3)
        import math

        denom = math.e + math.e**3
        assert abs(w[0, 0] - math.e / denom) < 1e-12

    def test_dot_product_attention_hand_computed(self):
        import numpy as np

        from gluon_ocr_spark.kernels.attention import dot_product_attention

        q = np.array([[1.0, 0.0]])
        k = np.array([[1.0, 0.0], [0.0, 1.0]])
        v = np.array([[10.0], [20.0]])
        ctx, w = dot_product_attention(q, k, v, scaled=False)
        # scores = [1, 0] → weights e/(e+1), 1/(e+1)
        import math

        w0 = math.e / (math.e + 1)
        assert abs(w[0, 0] - w0) < 1e-12
        assert abs(ctx[0, 0] - (w0 * 10 + (1 - w0) * 20)) < 1e-9
        # scaled divides scores by sqrt(2)
        _, ws = dot_product_attention(q, k, v, scaled=True)
        assert ws[0, 0] < w[0, 0]

    def test_mlp_attention_matches_decoder_formula(self):
        import numpy as np

        from gluon_ocr_spark.kernels.attention import mlp_attention

        rng = np.random.default_rng(0)
        q = rng.normal(size=(1, 4))
        k = rng.normal(size=(5, 6))
        v = rng.normal(size=(5, 3))
        wq = rng.normal(size=(4, 8))
        wk = rng.normal(size=(6, 8))
        vv = rng.normal(size=8)
        ctx, w = mlp_attention(q, k, v, wq, wk, vv)
        expect = np.tanh((q @ wq)[0] + k @ wk) @ vv
        expect = np.exp(expect - expect.max())
        expect /= expect.sum()
        assert np.allclose(w[0], expect)
        assert np.allclose(ctx[0], expect @ v)

    def test_multi_head_shapes_and_determinism(self):
        import numpy as np

        from gluon_ocr_spark.kernels.attention import multi_head_attention

        rng = np.random.default_rng(1)
        q = rng.normal(size=(3, 8))
        k = rng.normal(size=(7, 8))
        v = rng.normal(size=(7, 8))
        wq, wk, wv = (rng.normal(size=(8, 8)) for _ in range(3))
        out = multi_head_attention(q, k, v, wq, wk, wv, n_heads=4)
        assert out.shape == (3, 8)
        out2 = multi_head_attention(q, k, v, wq, wk, wv, n_heads=4)
        assert np.array_equal(out, out2)
        # masking the last key changes the result
        m = np.ones((3, 7)); m[:, -1] = 0
        out3 = multi_head_attention(q, k, v, wq, wk, wv, n_heads=4, mask=m)
        assert not np.allclose(out, out3)
