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
