"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

These extend the reference's per-record field derivations (the sf_*
transform mechanism, reference siem/sf_*.py / SURVEY.md M8) with the
operators a 100 TB corpus-curation pipeline needs.  All run as
vectorized ``map_batches`` stages; stateful pieces (compiled regexes,
stopword tables) live in actor ``__init__``.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

TOKEN_RE = re.compile(r"[a-z0-9_]+")
# BPE-ish sub-word split: word pieces, digits, punctuation runs
BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
PUNCT_RE = re.compile(r"[^\w\s]")

# tiny per-language stopword profiles (n-gram heuristic input);
# deterministic, self-contained — no external models in this container
STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es", "no", "por"},
    "fr": {"le", "la", "de", "et", "un", "est", "pas", "pour", "que"},
}


class LangId:
    """Heuristic language ID: stopword-hit ratio per language profile +
    character-class fallback (CJK detection). Rows-only oracle (no SQL
    equivalent) — scored in pytest on synthetic profiles."""

    def __init__(self, text_col: str = "text", out_col: str = "pred_lang"):
        self.text_col, self.out_col = text_col, out_col
        self.profiles = {k: frozenset(v) for k, v in STOPWORDS.items()}

    def _predict(self, text: str) -> str:
        if not text:
            return "und"
        if any("一" <= ch <= "鿿" for ch in text[:200]):
            return "zh"
        toks = TOKEN_RE.findall(text.lower())
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang, stop in sorted(self.profiles.items()):
            hits = sum(1 for t in toks if t in stop)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t or "")
                 for t in batch.column(self.text_col).to_pylist()]
        return batch.append_column(self.out_col, pa.array(preds, pa.string()))


class QualityScore:
    """Quality heuristics per doc: token count, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio.  All ratios are
    deterministic pure functions; SQL-expressible subset is
    oracle-checked via DuckDB."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = frozenset(STOPWORDS["en"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tokens, mean_len, punct_ratio, stop_ratio = [], [], [], []
        for t in batch.column(self.text_col).to_pylist():
            t = t or ""
            toks = TOKEN_RE.findall(t.lower())
            n = len(toks)
            n_tokens.append(n)
            mean_len.append(sum(map(len, toks)) / n if n else 0.0)
            punct_ratio.append(len(PUNCT_RE.findall(t)) / len(t) if t else 0.0)
            stop_ratio.append(sum(1 for x in toks if x in self.stop) / n if n else 0.0)
        return (batch
                .append_column("n_tokens", pa.array(n_tokens, pa.int64()))
                .append_column("mean_token_len", pa.array(mean_len, pa.float64()))
                .append_column("punct_ratio", pa.array(punct_ratio, pa.float64()))
                .append_column("stopword_ratio", pa.array(stop_ratio, pa.float64())))


def count_tokens(batch: pa.Table, text_col: str = "text",
                 out_col: str = "n_tokens", kind: str = "word") -> pa.Table:
    """Token counting: ``word`` = [a-z0-9_]+ runs (SQL-oracle
    compatible); ``bpe`` = BPE-ish regex pieces (letters / digits /
    punct runs — approximates sub-word tokenizer counts)."""
    rx = TOKEN_RE if kind == "word" else BPE_RE
    texts = batch.column(text_col).to_pylist()
    if kind == "word":
        counts = [len(rx.findall((t or "").lower())) for t in texts]
    else:
        counts = [len(rx.findall(t or "")) for t in texts]
    return batch.append_column(out_col, pa.array(counts, pa.int64()))


_FP_BASE = np.uint64(1_000_003)
_FP_MOD_MASK = np.uint64(0x7FFF_FFFF_FFFF_FFFF)  # 63-bit: int64-safe


def rolling_fingerprints(text: str, window: int = 8) -> np.ndarray:
    """Rolling (polynomial) hash fingerprints over byte windows —
    document fingerprinting primitive (winnowing-style selection takes
    the per-window minimum downstream)."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = data.size
    if n < window:
        return np.zeros(0, dtype=np.uint64)
    mask = int(_FP_MOD_MASK)
    base = int(_FP_BASE)
    pows = np.empty(window, dtype=np.uint64)
    p = 1
    for i in range(window):
        pows[i] = p
        p = (p * base) & mask
    # vectorized: hash(w) = sum(byte[i] * base^(window-1-i)); uint64
    # wraparound is the hash — silence numpy's overflow warning
    out = np.zeros(n - window + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for i in range(window):
            out = (out + data[i:n - window + 1 + i] * pows[window - 1 - i]) \
                & _FP_MOD_MASK
    return out


class Fingerprint:
    """map_batches stage: winnowed document fingerprint — the minimum
    rolling hash per position-window, then the doc's k smallest distinct
    fingerprints as a sketch column (list<uint64> as int64)."""

    def __init__(self, text_col: str = "text", window: int = 8, k: int = 16):
        self.text_col, self.window, self.k = text_col, window, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        sketches = []
        for t in batch.column(self.text_col).to_pylist():
            fps = rolling_fingerprints(t or "", self.window)
            if fps.size == 0:
                sketches.append([])
                continue
            smallest = np.unique(fps)[: self.k]
            sketches.append([int(x) for x in smallest.astype(np.int64)])
        return batch.append_column(
            "fingerprint", pa.array(sketches, pa.list_(pa.int64())))


class RepetitionSignals:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    "Scaling Language Models: Methods, Analysis & Insights from
    Training Gopher", App. A1.1 repetition filters), restated as
    integer-ratio deterministic functions so a DuckDB oracle can
    compute them exactly:

    - ``top2_e6``  — fraction of token-bigram positions held by the
      single most frequent bigram: ``max_bigram_count * 1e6 // (n-1)``
      (0 when n < 2).  Gopher's "fraction of characters in the most
      common 2-gram", token-position flavour.
    - ``dup3_e6``  — fraction of token-trigram positions whose trigram
      occurs at least twice in the doc:
      ``sum(c for trigram counts c >= 2) * 1e6 // (n-2)`` (0 when
      n < 3).  Gopher's "fraction of characters in duplicated
      3-grams", token-position flavour.
    - ``dupline_e6`` — fraction of line characters that sit inside a
      line whose exact text repeats within the doc:
      ``sum(len(l)*c for line counts c >= 2) * 1e6 // total_line_chars``
      (newlines excluded from both sides; 0 when the doc has no line
      characters).  Gopher's "fraction of characters in duplicate
      lines".

    Pure per-doc map — one ``map_batches`` stage, no shuffle; at
    100 TB this is embarrassingly parallel and the downstream filter
    (drop docs above a threshold) composes as a vectorized
    ``pc.less`` mask."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _signals(text: str) -> tuple[int, int, int, int]:
        from collections import Counter
        toks = TOKEN_RE.findall(text.lower())
        n = len(toks)
        top2 = 0
        if n >= 2:
            bc = Counter(zip(toks, toks[1:]))
            top2 = (max(bc.values()) * 1_000_000) // (n - 1)
        dup3 = 0
        if n >= 3:
            tc = Counter(zip(toks, toks[1:], toks[2:]))
            dup = sum(c for c in tc.values() if c >= 2)
            dup3 = (dup * 1_000_000) // (n - 2)
        lines = Counter(text.split("\n"))
        total = sum(len(ln) * c for ln, c in lines.items())
        dupl = sum(len(ln) * c for ln, c in lines.items() if c >= 2)
        dupline = (dupl * 1_000_000) // total if total else 0
        return n, top2, dup3, dupline

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_tok, top2, dup3, dupline = [], [], [], []
        for t in batch.column(self.text_col).to_pylist():
            a, b, c, d = self._signals(t or "")
            n_tok.append(a)
            top2.append(b)
            dup3.append(c)
            dupline.append(d)
        return (batch
                .append_column("n_tokens", pa.array(n_tok, pa.int64()))
                .append_column("top2_e6", pa.array(top2, pa.int64()))
                .append_column("dup3_e6", pa.array(dup3, pa.int64()))
                .append_column("dupline_e6", pa.array(dupline, pa.int64())))


# PII scrubbing: both patterns are RE2-compatible (no lookaround) so
# a DuckDB regexp_replace oracle can restate the masking exactly
EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
IPV4_RE = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")


class PIIScrub:
    """PII scrubbing for pre-training curation: mask email addresses
    to ``<email>`` and IPv4 literals to ``<ip>`` (emails first, so a
    dotted-numeric mail domain can't be half-eaten by the ip pass),
    and report per-doc match counts.  Pure per-doc map — one
    ``map_batches`` stage, no shuffle; patterns avoid lookaround so
    the DuckDB (RE2) oracle applies the identical replacement."""

    def __init__(self, text_col: str = "text", out_col: str = "masked"):
        self.text_col, self.out_col = text_col, out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        masked, n_em, n_ip = [], [], []
        for t in batch.column(self.text_col).to_pylist():
            t = t or ""
            t2, k_em = EMAIL_RE.subn("<email>", t)
            t3, k_ip = IPV4_RE.subn("<ip>", t2)
            masked.append(t3)
            n_em.append(k_em)
            n_ip.append(k_ip)
        return (batch
                .append_column(self.out_col, pa.array(masked, pa.string()))
                .append_column("n_emails", pa.array(n_em, pa.int64()))
                .append_column("n_ips", pa.array(n_ip, pa.int64())))


# categorize_text masking: a token containing any digit collapses to
# <n> (OpenSearch's categorize_text masks numbers the same way before
# its token-tree clustering; the deterministic variant here IS the
# category definition, so a SQL oracle can restate it exactly)
_CAT_SEP_RE = re.compile(r"[^a-z0-9_]+")
_CAT_NUM_RE = re.compile(r"(?<![a-z0-9_])[a-z0-9_]*[0-9][a-z0-9_]*"
                         r"(?![a-z0-9_])")


def categorize_template(batch: pa.Table, text_col: str = "text",
                        out_col: str = "category",
                        max_tokens: int = 10) -> pa.Table:
    """Per-row log template (the deterministic core of OpenSearch
    ``categorize_text``): lowercase, collapse separators, mask every
    digit-bearing token to ``<n>``, keep the first ``max_tokens``
    tokens.  Vectorized pandas str kernels over compiled regexes —
    one map_batches stage, no shuffle."""
    import pandas as pd
    s = pd.Series(batch.column(text_col).to_pylist(), dtype="object")
    s = s.fillna("").str.lower()
    s = s.str.replace(_CAT_SEP_RE, " ", regex=True).str.strip()
    s = s.str.replace(_CAT_NUM_RE, "<n>", regex=True)
    if max_tokens > 0:
        trunc = re.compile(r"^((?:\S+ ){0,%d}\S+).*$" % (max_tokens - 1))
        s = s.str.replace(trunc, r"\1", regex=True)
    return batch.append_column(out_col, pa.array(s.tolist(), pa.string()))


def categorize_text(ds, text_col: str = "text", max_tokens: int = 10):
    """OpenSearch ``categorize_text`` aggregation, Ray-Data-shaped:
    template each row (one vectorized map stage), then count per
    category with a partial pre-aggregation inside each block before
    the small groupby — at 100 TB only (category, partial_count) rows
    enter the shuffle, bounded by the distinct-template count per
    block.  Returns a Dataset[(category, n)]."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        t = categorize_template(batch, text_col, "category", max_tokens)
        g = t.group_by("category").aggregate([("category", "count")])
        return pa.table({"category": g.column("category"),
                         "n": pc.cast(g.column("category_count"),
                                      pa.int64())})

    from ray.data.aggregate import Sum
    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("category").aggregate(Sum("n", alias_name="n")))
    return out


def char_trigram_census(ds, text_col: str = "text"):
    """Corpus-wide character-trigram occurrence census (the model
    half of CCNet-style character-LM quality filtering — Wenzek et
    al. 2020 score text under a corpus LM; here the "LM" is the raw
    trigram frequency table, which keeps every count integer-exact
    and the SQL twin byte-stable).  Per block, one row per distinct
    trigram with its block-local OCCURRENCE count (not doc count);
    ``groupby(g).sum`` is exact because occurrences are additive.
    Text is lowercased; trigrams are overlapping codepoint windows.
    Returns Dataset[(g, c)]."""
    from collections import Counter

    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch.column(text_col).to_pylist():
            t = (t or "").lower()
            for i in range(len(t) - 2):
                c[t[i:i + 3]] += 1
        grams = sorted(c)
        return pa.table({"g": pa.array(grams, pa.string()),
                         "c": pa.array([c[x] for x in grams],
                                       pa.int64())})

    from ray.data.aggregate import Sum
    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("g").aggregate(Sum("c", alias_name="c")))


def charlm_typicality(ds, text_col: str = "text", rare_max: int = 1):
    """Character-LM typicality scoring: census -> one broadcast of
    the trigram frequency table (`ray.put`, read per actor/task, not
    re-shipped per batch) -> stream the corpus through a map that
    scores each doc with integer-exact signals:

    - ``n_tri``: trigram positions (len-2, floored at 0),
    - ``typicality``: sum over positions of the corpus-wide count of
      that trigram (high = the doc looks like the corpus; the
      integer-exact stand-in for summed log-probability),
    - ``n_rare``: positions whose trigram occurs <= ``rare_max``
      times corpus-wide (garbled/binary-ish text lights this up).

    The character-trigram vocabulary is bounded (~alphabet^3), so the
    broadcast table stays small at any corpus size — unlike the
    token-n-gram censuses, no hash-partitioned join fallback is ever
    needed."""
    import ray

    import pyarrow as pa

    rows = char_trigram_census(ds, text_col).take_all()
    ref = ray.put({r["g"]: int(r["c"]) for r in rows})

    def score(batch: pa.Table) -> pa.Table:
        freq = ray.get(ref)
        n_tri, typ, rare = [], [], []
        for t in batch.column(text_col).to_pylist():
            t = (t or "").lower()
            n = max(len(t) - 2, 0)
            s = r = 0
            for i in range(n):
                c = freq.get(t[i:i + 3], 0)
                s += c
                if c <= rare_max:
                    r += 1
            n_tri.append(n)
            typ.append(s)
            rare.append(r)
        return (batch
                .append_column("n_tri", pa.array(n_tri, pa.int64()))
                .append_column("typicality", pa.array(typ, pa.int64()))
                .append_column("n_rare", pa.array(rare, pa.int64())))

    return ds.map_batches(score, batch_format="pyarrow")
