"""Greedy attention decoder (SURVEY §2.3 N6, §2.6 T3) — deterministic
NumPy implementation of the reference's sequential decode loop.

Semantics from ``gluonocr/model_zoo/att_recog/att_decoder.py:8-40``
and ``att_model.py:17-53``: at each step, embed the previous symbol,
score the encoder sequence with an additive (MLP/"Luong-mlp")
attention cell, blend the context with the embedding, advance a GRU,
project to vocab logits, take the argmax, feed it back; stop at EOS
or max_len. Truncation-at-EOS matches ``att_ids2text``
(``gluonocr/data/recog_dataset.py:100-109``).

This is the one operator in the inventory with NO vectorized form —
an order-dependent recurrence (SURVEY §7 "hard parts"). In the engine
it runs per-line inside the batched UDF, exactly like the reference
runs it per-crop; the kernel here is the library form with seeded
deterministic weights so tests can pin behavior.
"""

from __future__ import annotations

import numpy as np


def _xavier(rng: np.random.Generator, shape: tuple[int, ...]) -> np.ndarray:
    fan_in, fan_out = shape[0], shape[-1]
    bound = float(np.sqrt(6.0 / (fan_in + fan_out)))
    return rng.uniform(-bound, bound, size=shape).astype(np.float32)


class GreedyAttentionDecoder:
    """Seeded, deterministic single-layer GRU + additive attention."""

    def __init__(self, voc_size: int, embed_dim: int = 32, hidden: int = 32, match_dim: int = 32, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.voc_size = voc_size
        self.eos = voc_size - 1  # by convention: last symbol is </s>
        self.embed = _xavier(rng, (voc_size, embed_dim))
        # additive attention: score = v·tanh(Wq q + Wk k)
        self.wq = _xavier(rng, (embed_dim, match_dim))
        self.wk_dim = match_dim
        self.v = _xavier(rng, (match_dim,))
        # GRU cell weights (input = embed + encoder feature)
        self.h = hidden
        in_dim = embed_dim + match_dim
        self.wz = _xavier(rng, (in_dim + hidden, hidden))
        self.wr = _xavier(rng, (in_dim + hidden, hidden))
        self.wh = _xavier(rng, (in_dim + hidden, hidden))
        self.fc = _xavier(rng, (hidden, voc_size))

    def _attend(self, q: np.ndarray, keys: np.ndarray) -> np.ndarray:
        # keys: (T, match_dim) — pre-projected encoder states (en_proj)
        scores = np.tanh(q @ self.wq + keys) @ self.v  # (T,)
        scores = scores - scores.max()
        w = np.exp(scores)
        w /= w.sum()
        return w @ keys  # context (match_dim,)

    def _gru_step(self, x: np.ndarray, h: np.ndarray) -> np.ndarray:
        xh = np.concatenate([x, h])
        z = _sigmoid(xh @ self.wz)
        r = _sigmoid(xh @ self.wr)
        xrh = np.concatenate([x, r * h])
        cand = np.tanh(xrh @ self.wh)
        return (1 - z) * h + z * cand

    def decode(self, encoder_states: np.ndarray, max_len: int = 40, bos: int = 0) -> list[int]:
        """Greedy loop: argmax fed back, stop at EOS (exclusive), cap
        at max_len. Returns emitted symbol ids (EOS not included)."""
        keys = np.asarray(encoder_states, dtype=np.float32)
        if keys.ndim != 2 or keys.shape[0] == 0:
            return []
        if keys.shape[1] != self.wk_dim:
            raise ValueError(f"encoder feature dim {keys.shape[1]} != {self.wk_dim}")
        h = np.zeros(self.h, dtype=np.float32)
        prev = bos
        out: list[int] = []
        for _ in range(max_len):
            e = self.embed[prev]
            ctx = self._attend(e, keys)
            h = self._gru_step(np.concatenate([e, ctx]), h)
            logits = h @ self.fc
            prev = int(np.argmax(logits))
            if prev == self.eos:
                break  # att_ids2text truncates AT the end symbol
            out.append(prev)
        return out

    def decode_text(self, encoder_states: np.ndarray, vocab: list[str], max_len: int = 40) -> str:
        ids = self.decode(encoder_states, max_len=max_len)
        return "".join(vocab[i] for i in ids if 0 <= i < len(vocab))


def _sigmoid(x: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-x))


# ---------------------------------------------------------------------------
# Attention-cell zoo (SURVEY §2.3 N8) — semantics of
# gluonocr/nn/attention_cell.py:30-509
# ---------------------------------------------------------------------------


def masked_softmax(scores: np.ndarray, mask: np.ndarray | None = None) -> np.ndarray:
    """Softmax over the last axis; masked positions (mask==0) receive
    a large negative fill BEFORE the softmax and exactly zero weight
    after (attention_cell.py:30-80 _apply_mask/_masked_softmax)."""
    s = np.asarray(scores, dtype=np.float64)
    if mask is not None:
        s = np.where(np.asarray(mask) != 0, s, -1e18)
    s = s - s.max(axis=-1, keepdims=True)
    e = np.exp(s)
    if mask is not None:
        e = e * (np.asarray(mask) != 0)
    return e / np.maximum(e.sum(axis=-1, keepdims=True), 1e-30)


def dot_product_attention(
    query: np.ndarray,
    key: np.ndarray,
    value: np.ndarray,
    mask: np.ndarray | None = None,
    scaled: bool = True,
) -> tuple[np.ndarray, np.ndarray]:
    """(context, weights) for (Tq,D) query / (Tk,D) key / (Tk,Dv)
    value — DotProductAttentionCell (attention_cell.py:397-509):
    score = <q,k> / sqrt(D) when scaled."""
    q = np.asarray(query, dtype=np.float64)
    k = np.asarray(key, dtype=np.float64)
    v = np.asarray(value, dtype=np.float64)
    scores = q @ k.T
    if scaled:
        scores = scores / np.sqrt(q.shape[-1])
    w = masked_softmax(scores, mask)
    return w @ v, w


def mlp_attention(
    query: np.ndarray,
    key: np.ndarray,
    value: np.ndarray,
    wq: np.ndarray,
    wk: np.ndarray,
    v_vec: np.ndarray,
    mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """MLPAttentionCell (attention_cell.py:291-395): additive scores
    ``v · tanh(Wq q + Wk k)`` (the split-projection form of
    v·tanh(W[q,k]+b)); softmax; context. (Tq,Dq) query, (Tk,Dk) key."""
    q = np.asarray(query, dtype=np.float64) @ wq  # (Tq,U)
    k = np.asarray(key, dtype=np.float64) @ wk  # (Tk,U)
    scores = np.tanh(q[:, None, :] + k[None, :, :]) @ v_vec  # (Tq,Tk)
    w = masked_softmax(scores, mask)
    return w @ np.asarray(value, dtype=np.float64), w


def multi_head_attention(
    query: np.ndarray,
    key: np.ndarray,
    value: np.ndarray,
    wq: np.ndarray,
    wk: np.ndarray,
    wv: np.ndarray,
    n_heads: int,
    mask: np.ndarray | None = None,
    scaled: bool = True,
) -> np.ndarray:
    """MultiHeadAttentionCell (attention_cell.py:180-289): project
    q/k/v, split the unit axis into heads, run scaled dot-product
    attention per head, concatenate contexts."""
    q = np.asarray(query, dtype=np.float64) @ wq
    k = np.asarray(key, dtype=np.float64) @ wk
    v = np.asarray(value, dtype=np.float64) @ wv
    u = q.shape[-1] // n_heads
    uv = v.shape[-1] // n_heads
    outs = []
    for h in range(n_heads):
        ctx, _ = dot_product_attention(
            q[:, h * u : (h + 1) * u], k[:, h * u : (h + 1) * u], v[:, h * uv : (h + 1) * uv],
            mask=mask, scaled=scaled,
        )
        outs.append(ctx)
    return np.concatenate(outs, axis=-1)
