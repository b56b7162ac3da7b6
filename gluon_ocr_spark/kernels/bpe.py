"""Byte-pair-encoding tokenizer — real GPT-2-style merge loop.

From-scratch, public-knowledge design (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"; the byte-level
variant popularized by GPT-2): pre-tokenize with the same regex the
SQL battery's ``text_bpe_tokens`` counts (:data:`BPE_PATTERN`), map
each pre-token to its UTF-8 bytes, then repeatedly merge the adjacent
symbol pair with the LOWEST merge rank until no ranked pair remains.

Why this exists next to the regex counter: token counts are the
currency of training-data budgeting, and the pre-tokenizer regex
UNDER-approximates real tokenizer counts (one regex hit may be many
BPE tokens). The merge loop here produces the real count against a
deterministic merges table.

Everything is deterministic and executor-safe:

* training ties break by (count desc, pair bytes asc) — no dict-order
  or salted-hash dependence, so driver and every executor agree;
* the default merges table trains once per process from a seeded
  corpus (:func:`default_ranks`, memoized) — in production the table
  is a tiny artifact loaded once and BROADCAST to executors (the same
  weights-source pattern as the OCR nets, S10).

Reference parity note: the reference has no tokenizer (MXNet OCR
toolkit); this operator belongs to the training-data-pipeline tier
the brief adds on top (token counting: whitespace + BPE).
"""

from __future__ import annotations

import re
from functools import lru_cache

# the SQL battery's pre-tokenizer (queries._BPE_PAT with the SQL ''
# quote-escape undone): contractions, letter runs, digit runs,
# punctuation runs — each optionally space-prefixed, GPT-2 style —
# PLUS GPT-2's trailing-whitespace alternatives (` +(?!\S)| +`) so the
# encoding is lossless on multi-space text. The SQL pattern cannot
# carry the lookahead (RE2), so on multi-space text n_pre_tokens here
# exceeds the SQL text_bpe_tokens count by the bare space runs.
BPE_PATTERN = re.compile(
    r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +(?!\S)| +"
)

_INF = float("inf")


def pre_tokenize(text: str) -> list[str]:
    """Regex pre-tokens (group 0 of every match, in order)."""
    return [m.group(0) for m in BPE_PATTERN.finditer(text)]


def train_merges(corpus: list[str], n_merges: int = 200) -> list[tuple[bytes, bytes]]:
    """Greedy BPE training: repeatedly merge the most frequent
    adjacent symbol pair across the pre-tokenized corpus.

    Ties break by lexicographically smallest pair so the merges table
    is identical on every process regardless of counter iteration
    order. Returns the ordered merge list (rank = list index).
    """
    from collections import Counter

    word_counts: Counter = Counter()
    for text in corpus:
        for tok in pre_tokenize(text):
            word_counts[tok] += 1
    words: dict[tuple[bytes, ...], int] = {}
    for tok, c in word_counts.items():
        key = tuple(bytes([b]) for b in tok.encode("utf-8"))
        words[key] = words.get(key, 0) + c

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, c in words.items():
            for a, b in zip(w, w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[bytes, ...], int] = {}
        for w, c in words.items():
            out: list[bytes] = []
            i = 0
            while i < len(w):
                if i + 1 < len(w) and w[i] == best[0] and w[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + c
        words = nxt
    return merges


def build_ranks(merges: list[tuple[bytes, bytes]]) -> dict[tuple[bytes, bytes], int]:
    return {pair: rank for rank, pair in enumerate(merges)}


def build_vocab(merges: list[tuple[bytes, bytes]]) -> dict[bytes, int]:
    """Symbol → token id. Ids 0..255 are the single bytes; merged
    symbols get 256 + rank. A merge result that equals an earlier
    symbol keeps its FIRST id (dict setdefault)."""
    vocab: dict[bytes, int] = {bytes([b]): b for b in range(256)}
    for rank, (a, b) in enumerate(merges):
        vocab.setdefault(a + b, 256 + rank)
    return vocab


def _merge_word(
    word: tuple[bytes, ...], ranks: dict[tuple[bytes, bytes], int]
) -> tuple[bytes, ...]:
    """The GPT-2 encode loop: while any adjacent pair is ranked,
    merge every occurrence of the LOWEST-ranked pair."""
    while len(word) > 1:
        best = None
        best_rank = _INF
        for pair in zip(word, word[1:]):
            r = ranks.get(pair, _INF)
            if r < best_rank:
                best, best_rank = pair, r
        if best is None:
            break
        merged = best[0] + best[1]
        out: list[bytes] = []
        i = 0
        while i < len(word):
            if i + 1 < len(word) and word[i] == best[0] and word[i + 1] == best[1]:
                out.append(merged)
                i += 2
            else:
                out.append(word[i])
                i += 1
        word = tuple(out)
    return word


def encode(text: str, ranks: dict[tuple[bytes, bytes], int]) -> list[bytes]:
    """Text → merged byte symbols (concatenating them recovers the
    UTF-8 bytes of the pre-token stream exactly — lossless)."""
    out: list[bytes] = []
    for tok in pre_tokenize(text):
        word = tuple(bytes([b]) for b in tok.encode("utf-8"))
        out.extend(_merge_word(word, ranks))
    return out


def encode_ids(
    text: str,
    ranks: dict[tuple[bytes, bytes], int],
    vocab: dict[bytes, int],
) -> list[int]:
    return [vocab[s] for s in encode(text, ranks)]


def decode(symbols: list[bytes]) -> str:
    return b"".join(symbols).decode("utf-8")


# -- default seeded merges table ---------------------------------------------

_SEED_WORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "for", "it",
    "extraction", "pipeline", "spark", "shuffle", "partition", "table",
    "document", "corpus", "token", "merge", "band", "cluster", "join",
    "window", "stream", "batch", "filter", "quality", "crawl", "page",
    "text", "line", "detect", "recognize", "decode", "train", "data",
]


def seed_corpus(n_sentences: int = 400) -> list[str]:
    """Deterministic Zipf-ish corpus the default merges train on —
    md5-derived seeding (never Python ``hash()``: salted per process)."""
    import hashlib

    import numpy as np

    digest = hashlib.md5(b"bpe-seed-corpus").hexdigest()
    rng = np.random.default_rng(int(digest[:15], 16))
    # Zipf-ish weights over the word list
    w = 1.0 / (np.arange(len(_SEED_WORDS)) + 1.0)
    p = w / w.sum()
    out = []
    for _ in range(n_sentences):
        k = int(rng.integers(5, 15))
        idx = rng.choice(len(_SEED_WORDS), size=k, p=p)
        words = [_SEED_WORDS[int(j)] for j in idx]
        sent = " ".join(words)
        if rng.random() < 0.3:
            sent += "'s"
        if rng.random() < 0.5:
            sent += "."
        out.append(sent)
    return out


N_DEFAULT_MERGES = 200


@lru_cache(maxsize=1)
def default_merges() -> tuple[tuple[bytes, bytes], ...]:
    """The engine's default merges table (trained once per process;
    ~ms). Production twin: load a published merges artifact and
    broadcast it — the table, not the training, is what ships."""
    return tuple(train_merges(seed_corpus(), N_DEFAULT_MERGES))


@lru_cache(maxsize=1)
def default_ranks() -> dict[tuple[bytes, bytes], int]:
    return build_ranks(list(default_merges()))


@lru_cache(maxsize=1)
def default_vocab() -> dict[bytes, int]:
    return build_vocab(list(default_merges()))
