"""T4: text2ids / teacher-forcing shift pinned to reference semantics
(recog_dataset.py:25,31-42,74-87,145-148)."""

from gluon_ocr_spark.kernels.ctc import (
    IC15_VOCAB,
    build_word2id,
    shift_targets,
    text2ids,
)


def test_word2id_symbol_layout():
    w2i, pad, add = build_word2id(IC15_VOCAB, 0, 1)
    assert add and pad == 1  # pad IS the end symbol
    assert w2i["<s>"] == 0 and w2i["</s>"] == 1
    assert w2i["0"] == 2 and w2i["a"] == 12  # chars from len({'<s>','</s>'})


def test_word2id_plain_layout():
    w2i, pad, add = build_word2id(IC15_VOCAB)
    assert not add and pad == -1
    assert w2i["0"] == 0 and w2i["a"] == 10
    assert "<s>" not in w2i


def test_text2ids_oov_leaves_pad_hole_with_consumed_position():
    """The reference's `continue` after the membership test: an OOV
    char keeps its POSITION (ids stay pad, mask 0) — it does not
    shift later chars left."""
    w2i, pad, add = build_word2id(IC15_VOCAB, 0, 1)
    ids, mask = text2ids("ab!c", 6, w2i, pad, add)
    assert ids == [12, 13, pad, 14, 1, pad]  # hole at 2; </s> at 4
    assert mask == [1, 1, 0, 1, 1, 0]


def test_text2ids_clips_beyond_text_len():
    w2i, pad, add = build_word2id(IC15_VOCAB, 0, 1)
    ids, mask = text2ids("abcdef", 3, w2i, pad, add)
    assert len(ids) == 3 and ids == [12, 13, 14]
    assert mask == [1, 1, 1]


def test_shift_targets_teacher_forcing():
    assert shift_targets([5, 6, 7, 1], 0) == [0, 5, 6, 7]
    # decoder input at step t is the label at t-1; the last label
    # symbol never becomes an input
    lab = [9, 8, 1, 1]
    assert shift_targets(lab, 0)[1:] == lab[:-1]
