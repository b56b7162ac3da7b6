"""CTC greedy decode + vocabulary handling (SURVEY §2.6 T1-T2, §2.1 S11).

The reference's recognition head emits per-timestep class ids; decode
collapses blanks and adjacent repeats then maps ids to chars
(``scripts/deploy/python_infer/demo.py:77-86``). Conventions pinned
here (SURVEY §2.9.2-traps):

* blank id = vocabulary size (the extra class appended at train time,
  ``scripts/recog/crnn/train_crnn.py:31``);
* a repeat separated by a blank is NOT collapsed (``a,blank,a → aa``);
* vocabulary file: one char per line, id = line index, first char of
  the line is taken (``scripts/recog/crnn/demo.py:40-49``);
* the known ``word_list[i]`` indexing bug in the reference's
  ``gluonocr/data/recog_dataset.py:89-98`` is deliberately NOT
  replicated (SURVEY §2.9.5).

In the HTML graft these kernels decode nothing on the hot path — text
arrives as text — but they are part of the engine's operator parity
surface and back the recognition-metric tests.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence


def ctc_collapse(ids: Sequence[int], blank: int) -> list[int]:
    """Greedy CTC collapse: drop blanks and adjacent duplicates."""
    out: list[int] = []
    prev: int | None = None
    for i in ids:
        if i != blank and i != prev:
            out.append(int(i))
        prev = i
    return out


def ids_to_text(ids: Iterable[int], vocab: Sequence[str]) -> str:
    return "".join(vocab[i] for i in ids if 0 <= i < len(vocab))


def ctc_greedy_decode(ids: Sequence[int], vocab: Sequence[str], blank: int | None = None) -> str:
    """Collapse then map to characters; blank defaults to len(vocab)."""
    if blank is None:
        blank = len(vocab)
    return ids_to_text(ctc_collapse(ids, blank), vocab)


def load_vocab(lines: Iterable[str]) -> list[str]:
    """One char per line; first char of each line; id = line index."""
    out: list[str] = []
    for line in lines:
        line = line.rstrip("\n")
        if line:
            out.append(line[0])
    return out


# the 36-char ic15 alphabet the reference ships
# (gluonocr/utils/ic15_dict.txt: digits then lowercase letters)
IC15_VOCAB: list[str] = list("0123456789abcdefghijklmnopqrstuvwxyz")


def build_word2id(
    vocab: list[str], start_sym: int | None = None, end_sym: int | None = None
) -> tuple[dict[str, int], int, bool]:
    """T4 vocabulary mapping (recog_dataset.py:31-42): with symbols,
    ``{'<s>': start_sym, '</s>': end_sym}`` seeds the dict and corpus
    chars take ids from ``len(dict)`` upward; without, chars from 0.
    Returns (word2id, pad_sym, add_symbol) — pad is the END symbol
    when symbols are on, −1 otherwise (recog_dataset.py:25)."""
    add_symbol = start_sym is not None and end_sym is not None
    word2id: dict[str, int] = {}
    if add_symbol:
        word2id = {"<s>": int(start_sym), "</s>": int(end_sym)}
    idx = len(word2id)
    for ch in vocab:
        word2id[ch] = idx
        idx += 1
    pad_sym = int(end_sym) if add_symbol else -1
    return word2id, pad_sym, add_symbol


def text2ids(
    text: str,
    text_len: int,
    word2id: dict[str, int],
    pad_sym: int,
    add_symbol: bool,
) -> tuple[list[int], list[int]]:
    """T4 text → (ids, mask) exactly as recog_dataset.py:74-87: ids
    start as pad everywhere, '</s>' is appended when symbols are on,
    and an out-of-vocabulary char leaves a PAD HOLE at its position
    with mask 0 — the position is still consumed (the reference's
    ``continue`` after the membership test). Chars beyond text_len
    are ignored by this port's ``break``; the reference never reaches
    that path (recog_dataset.py pre-filters labels to
    ``max_len - add_symbol``, and its NDArray indexing would raise
    IndexError if it did), so the clip is this port's own choice, not
    reference parity."""
    ids = [pad_sym] * text_len
    mask = [0] * text_len
    chars = list(text)
    if add_symbol:
        chars.append("</s>")
    for i, ch in enumerate(chars):
        if i >= text_len:
            break
        if ch in word2id:
            ids[i] = word2id[ch]
            mask[i] = 1
    return ids, mask


def shift_targets(lab: list[int], start_sym: int) -> list[int]:
    """T4 teacher-forcing shift (recog_dataset.py:145-148): decoder
    INPUT = [start_sym] + label[:-1] — each step is conditioned on
    the previous target symbol."""
    return [int(start_sym)] + [int(x) for x in lab[:-1]]
