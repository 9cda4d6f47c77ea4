"""BM25 scoring math + Lucene SmallFloat norm quantization.

The reference sets no custom ``similarity`` in any index template (grep
over reference: source/lambda/deploy_es/command_index.txt -> 0 hits), so
the scoring contract is Lucene's default BM25Similarity with k1=1.2,
b=0.75:

    idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfn(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
    score    = sum_t idf(t) * tfn(t, d)          (per query-term occurrence)

Lucene stores the document length as a 1-byte norm via
``SmallFloat.intToByte4`` (4 significant bits: 3 stored + 1 implicit,
monotonic, exact below 16) and decodes it with ``byte4ToInt`` before the
formula — so two documents of length 100 and 103 score identically in
real Lucene.  We implement the same public quantization so the engine
can be *score*-identical under ``length_policy="lucene"``; the
``"exact"`` policy keeps true lengths (used by the SQL oracles, which
cannot easily express the quantization).  Both sides of every
rank-identity test pin one policy (SURVEY.md §7.5.1 / §7.6).
"""

from __future__ import annotations

import numpy as np

from . import B, K1

# ---------------------------------------------------------------------------
# SmallFloat byte4 (public Lucene algorithm: org.apache.lucene.util.SmallFloat)


def _byte4_to_int_scalar(b: int) -> int:
    bits = b & 0x07
    shift = (b >> 3) - 1
    if shift == -1:  # subnormal: values 0..7 stored exactly
        return bits
    return (bits | 0x08) << shift


# Monotonically increasing table of the 256 decodable lengths.
BYTE4_DECODE = np.array([_byte4_to_int_scalar(i) for i in range(256)], dtype=np.int64)
assert np.all(np.diff(BYTE4_DECODE) > 0)


def encode_norm(lengths: np.ndarray) -> np.ndarray:
    """int lengths -> uint8 norm bytes (Lucene intToByte4: truncating,
    i.e. the largest representable value <= length)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    idx = np.searchsorted(BYTE4_DECODE, lengths, side="right") - 1
    return np.clip(idx, 0, 255).astype(np.uint8)


def decode_norm(norms: np.ndarray) -> np.ndarray:
    """uint8 norm bytes -> quantized lengths (Lucene byte4ToInt)."""
    return BYTE4_DECODE[np.asarray(norms, dtype=np.uint8)]


def effective_length(lengths: np.ndarray, length_policy: str = "lucene") -> np.ndarray:
    """The doc length BM25 actually sees under the configured policy."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if length_policy == "exact":
        return lengths
    if length_policy == "lucene":
        return decode_norm(encode_norm(lengths))
    raise ValueError(f"unknown length_policy: {length_policy}")


# ---------------------------------------------------------------------------
# BM25


def round_half_away(x) -> np.ndarray:
    """Half-away-from-zero rounding, EXACTLY DuckDB ``round()``'s
    metric (np/python round are half-to-even).  The naive
    ``floor(abs(x)+0.5)`` is wrong in float64 — ``0.49999999999999994
    + 0.5`` rounds to 1.0, and magnitudes >= 2^52 gain spurious +1 —
    so this uses nearest-integer rounding (all methods agree off
    ties) and corrects only EXACT .5 remainders, which are the only
    disagreement class and are exactly representable."""
    x = np.asarray(x, np.float64)
    r = np.round(x)
    tie = np.abs(x - np.trunc(x)) == 0.5
    return np.where(tie, np.trunc(x) + np.copysign(1.0, x), r)


def idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def tf_norm(tf: np.ndarray, doc_len: np.ndarray, avgdl: float,
            k1: float = K1, b: float = B) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    doc_len = np.asarray(doc_len, dtype=np.float64)
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doc_len / avgdl))


def bm25_score(tf: np.ndarray, doc_len: np.ndarray, df: float, n_docs: int,
               avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    """Score contribution of one term across many docs (vectorized)."""
    return idf(df, n_docs) * tf_norm(tf, doc_len, avgdl, k1, b)


def tf_norm_upper_bound(max_tf: np.ndarray, min_len: np.ndarray, avgdl: float,
                        k1: float = K1, b: float = B) -> np.ndarray:
    """Block-max bound: tfn is increasing in tf and decreasing in dl, so
    tfn(max_tf, min_len) >= tfn(tf, dl) for every posting in the block.
    Stored per 128-posting block as (max_tf, min_norm) so the bound can
    be evaluated for any (k1, b, avgdl) at query time (SURVEY.md §7.1)."""
    return tf_norm(max_tf, min_len, avgdl, k1, b)
