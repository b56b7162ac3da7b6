"""Suffix-array construction and arbitrary-length duplicated-span
removal (VERDICT r4 stretch item 9).

The true Lee et al. ("Deduplicating Training Data Makes Language
Models Better", 2021) span dedup builds a suffix array over the
corpus and removes every duplicated substring of length >= a
threshold t. The battery's ``text_dedup_spans`` approximates it with
K-gram seeds; this module is the real construction:

* :func:`suffix_array` — Manber–Myers prefix doubling, vectorized
  with ``np.lexsort`` (O(n log n) doubling rounds, each a lexsort);
* :func:`lcp_array` — Kasai's O(n) adjacent-LCP;
* :func:`cross_doc_dup_starts` — the positions whose t-token forward
  window occurs in >= 2 distinct documents, read off the SA as
  maximal runs of adjacent suffixes with LCP >= t;
* :func:`dedup_spans` — merge the covered [s, s+t) intervals per doc
  and drop the covered tokens (keeping everything else byte-stable).

Equivalence used by the SQL oracle: for any threshold t, "position
covered by a cross-doc repeat of length >= t" is IDENTICAL to
"position covered by a [s, s+t) mark at some s whose t-token window
occurs in >= 2 distinct docs" — a repeat of length L >= t marks every
start offset it contains, and the union of those t-windows is the
whole repeat. So the SA path computes exactly what a t-gram
group-by computes, without materializing or hashing a t-gram per
position: per shard it is one integer sort (plus log n doubling
rounds) in bounded memory, exact string equality (no hash-collision
false marks), and the LCP byproducts (longest repeated substring,
repeat histograms) come free.

Documents are concatenated with per-document UNIQUE sentinel codes,
so no window can match across a document boundary and suffixes
shorter than t never alias (the sentinel differs in every document).

Scale contract: these kernels run per SHARD inside
``applyInPandas`` (operators.textstats.remove_dup_spans_sa) — the
standard sharded deployment of Lee et al.; cross-shard duplicates
are out of a single kernel call's scope by construction (documented
recall bound of the sharded operator, same as the original's
sharded suffix arrays).
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq) -> np.ndarray:
    """Suffix array of an integer sequence via prefix doubling.

    Returns ``sa`` with ``sa[i]`` = start of the i-th smallest
    suffix. Comparison is plain lexicographic on the int codes, with
    "past the end" ranking below every real symbol (the classic
    rank -1 convention) — identical to comparing the suffixes as
    tuples, which the tests pin against a naive sort."""
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.unique(s, return_inverse=True)[1].astype(np.int64)
    k = 1
    while True:
        r2 = np.full(n, -1, dtype=np.int64)
        if k < n:
            r2[: n - k] = rank[k:]
        order = np.lexsort((r2, rank))
        if k >= n:
            return order
        changed = np.empty(n, dtype=np.int64)
        changed[0] = 0
        changed[1:] = (rank[order[1:]] != rank[order[:-1]]) | (
            r2[order[1:]] != r2[order[:-1]]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.cumsum(changed)
        rank = new_rank
        if rank[order[-1]] == n - 1:
            return order
        k *= 2


def lcp_array(seq, sa: np.ndarray) -> np.ndarray:
    """Kasai's algorithm: ``lcp[i]`` = longest common prefix of the
    suffixes at ``sa[i-1]`` and ``sa[i]`` (``lcp[0] = 0``)."""
    s = np.asarray(seq, dtype=np.int64)
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[r] = h
            if h > 0:
                h -= 1
        else:
            h = 0
    return lcp


def longest_repeat(seq) -> tuple[int, int]:
    """(length, smallest start) of the longest repeated substring
    (0, 0) if nothing repeats."""
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    if len(lcp) == 0 or lcp.max() == 0:
        return 0, 0
    best = int(lcp.max())
    at = np.flatnonzero(lcp == best)
    start = min(int(min(sa[i], sa[i - 1])) for i in at)
    return best, start


def build_corpus(token_lists: list[list[str]]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Concatenates per-doc token lists into one int-coded sequence
    with a unique sentinel code AFTER each document.

    Returns ``(seq, doc_of, pos_of)`` where sentinel positions carry
    ``doc_of = -1``. Codes: tokens map through a shard-local vocab
    (np.unique order — irrelevant to equality semantics), sentinels
    get codes past the vocab, one per document."""
    all_tokens = [t for doc in token_lists for t in doc]
    vocab, codes = (
        np.unique(np.asarray(all_tokens, dtype=object), return_inverse=True)
        if all_tokens
        else (np.empty(0, dtype=object), np.empty(0, dtype=np.int64))
    )
    v = len(vocab)
    seq_parts, doc_parts, pos_parts = [], [], []
    off = 0
    for d, doc in enumerate(token_lists):
        m = len(doc)
        seq_parts.append(codes[off : off + m])
        seq_parts.append(np.array([v + d], dtype=np.int64))
        doc_parts.append(np.full(m, d, dtype=np.int64))
        doc_parts.append(np.array([-1], dtype=np.int64))
        pos_parts.append(np.arange(m, dtype=np.int64))
        pos_parts.append(np.array([-1], dtype=np.int64))
        off += m
    return (
        np.concatenate(seq_parts) if seq_parts else np.empty(0, dtype=np.int64),
        np.concatenate(doc_parts) if doc_parts else np.empty(0, dtype=np.int64),
        np.concatenate(pos_parts) if pos_parts else np.empty(0, dtype=np.int64),
    )


def _lcp_ge(seq, sa: np.ndarray, t: int, chunk: int = 1 << 20) -> np.ndarray:
    """Vectorized ``lcp >= t`` for SA-adjacent suffix pairs —
    ``ge[i]`` ⟺ suffixes ``sa[i-1]`` and ``sa[i]`` share a ``t``-token
    prefix (``ge[0] = False``, mirroring ``lcp[0] = 0``).

    The dup-starts grouping only consumes the BOOLEAN ``lcp < t``,
    never the exact LCP values, so Kasai's inherently sequential
    Python loop (ADVICE r5: interpreter-bound at the recommended
    shard sizes) is replaced by direct window equality on a
    zero-copy ``sliding_window_view``: O(n·t) int compares, fully
    vectorized, chunked to bound the comparison buffer at
    ``chunk × t`` bytes."""
    s = np.asarray(seq, dtype=np.int64)
    n = len(sa)
    ge = np.zeros(n, dtype=bool)
    if n < 2 or len(s) < t:
        return ge
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(s, t)  # (len(s) - t + 1, t), zero-copy
    a, b = sa[1:], sa[:-1]
    last = len(s) - t
    idx = np.flatnonzero((a <= last) & (b <= last))
    for i0 in range(0, len(idx), chunk):
        ii = idx[i0 : i0 + chunk]
        ge[ii + 1] = (win[a[ii]] == win[b[ii]]).all(axis=1)
    return ge


def cross_doc_dup_starts(seq, doc_of, min_len: int, sa=None, lcp=None) -> np.ndarray:
    """Global positions whose ``min_len``-token forward window occurs
    in >= 2 DISTINCT documents (the battery's dup criterion).

    Maximal runs of SA-adjacent suffixes with pairwise LCP >=
    ``min_len`` are exactly the equality classes of the
    ``min_len``-window (two suffixes share a >= min_len prefix iff
    every suffix between them in SA order does); a class is
    duplicated iff it spans >= 2 docs, and then EVERY member is a
    duplicated start. Pass precomputed ``sa``/``lcp`` to reuse one
    construction across several derived products; when ``lcp`` is
    not supplied, only the vectorized ``lcp >= min_len`` boolean is
    computed (:func:`_lcp_ge`) — Kasai's Python loop never runs on
    the production path."""
    if sa is None:
        sa = suffix_array(seq)
    n = len(sa)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    if lcp is None:
        grp = np.cumsum(~_lcp_ge(seq, sa, min_len))  # ge[0]=False opens group 1
    else:
        grp = np.cumsum(lcp < min_len)  # lcp[0] = 0 opens group 1
    docs = np.asarray(doc_of, dtype=np.int64)[sa]
    # distinct docs per group (sentinel suffixes live in singleton
    # groups: their first symbol is unique, so lcp to any neighbor
    # is 0 and they never share a group)
    order = np.lexsort((docs, grp))
    g, d = grp[order], docs[order]
    first = np.ones(n, dtype=bool)
    first[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    uniq_g = g[first]
    counts = np.bincount(uniq_g, minlength=int(grp[-1]) + 1)
    dup_groups = counts >= 2
    return np.sort(sa[dup_groups[grp]])


def keep_masks(
    starts: np.ndarray, doc_of, pos_of, doc_lens: list[int], min_len: int
) -> list[np.ndarray]:
    """Per-doc boolean keep masks from the duplicated-start set: every
    ``[s, s+min_len)`` window at a dup start is cleared. The single
    mask builder shared by :func:`dedup_spans` and the sharded
    operator (operators.textstats.remove_dup_spans_sa) so the
    marking rule cannot diverge between the kernel/fixture and the
    production path. A dup window never crosses a sentinel (sentinels
    are unique), so the slice stays inside the document.

    Vectorized (ADVICE r5): one difference array over the
    concatenated doc positions — +1 at each window start, −1 at its
    clamped end, one cumsum, split per doc — instead of a Python
    loop writing ``min_len`` mask cells per start."""
    lens = np.asarray(doc_lens, dtype=np.int64)
    offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    diff = np.zeros(int(offs[-1]) + 1, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    if len(starts):
        d = np.asarray(doc_of, dtype=np.int64)[starts]
        s = np.asarray(pos_of, dtype=np.int64)[starts]
        np.add.at(diff, offs[d] + s, 1)
        np.add.at(diff, offs[d] + np.minimum(s + min_len, lens[d]), -1)
    keep = np.cumsum(diff[:-1]) == 0
    return [keep[offs[i] : offs[i + 1]] for i in range(len(lens))]


def dedup_spans(
    token_lists: list[list[str]], min_len: int, starts_out: list | None = None
) -> list[tuple[list[str], int]]:
    """Removes from every document the token positions covered by a
    cross-doc repeat of length >= ``min_len`` (all occurrences — the
    battery's text_dedup_spans keep rule). Returns per doc
    ``(kept_tokens, n_kept)``. ``starts_out``: optional list that
    receives the dup-start array (fixture introspection)."""
    seq, doc_of, pos_of = build_corpus(token_lists)
    starts = cross_doc_dup_starts(seq, doc_of, min_len)
    if starts_out is not None:
        starts_out.append(starts)
    masks = keep_masks(starts, doc_of, pos_of, [len(d) for d in token_lists], min_len)
    out = []
    for doc, mask in zip(token_lists, masks):
        kept = [t for t, m in zip(doc, mask) if m]
        out.append((kept, len(kept)))
    return out
