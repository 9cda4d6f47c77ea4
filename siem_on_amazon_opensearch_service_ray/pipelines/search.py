"""Flat BM25 scorer — the index-free oracle path (SURVEY.md §7.2.2).

Scores every document directly with ``map_batches`` + a distributed
``sort(score desc, doc_id asc).limit(k)``; no postings, no WAND.  Used
as the rank-identity reference for the indexed path (both sides share
the analyzer, the BM25 constants, and the SmallFloat length policy —
§7.5.1), and as the SQL-oracle-comparable ``queries()`` entry.

Two streaming passes over the corpus:
  pass 1 — per-batch partial (n_docs, total_len, df per query term)
           reduced driver-side (tiny);
  pass 2 — per-batch scoring, then sort + limit.
Content never shuffles; only (doc_id, score) rows reach the sort.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

import ray.data as rd

from .. import B, K1
from ..analysis import ANALYZERS
from ..norms import effective_length, idf as idf_fn, tf_norm
from ..stages.docprep import compute_doc_ids
from .build_index import IndexConfig, _read_source, tokenize_concurrency


class _StatsPartial:
    def __init__(self, cfg: IndexConfig, col: str, analyzer: str,
                 q_terms: list[str]):
        self.cfg, self.col, self.analyzer = cfg, col, analyzer
        self.q_terms = sorted(set(q_terms))
        self.q_set = set(self.q_terms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        an = ANALYZERS[self.analyzer]
        n = batch.num_rows
        total_len = 0
        df = Counter()
        for text in batch.column(self.col).to_pylist():
            toks = an(text)
            total_len += len(toks)
            for t in set(toks) & self.q_set:
                df[t] += 1
        return pa.table({
            "n_docs": pa.array([n], pa.int64()),
            "total_len": pa.array([total_len], pa.int64()),
            **{f"df_{i}": pa.array([df[t]], pa.int64())
               for i, t in enumerate(self.q_terms)},
        })


def corpus_stats_and_df(source, cfg: IndexConfig, col: str, analyzer: str,
                        q_terms: list[str]) -> tuple[int, float, dict[str, int]]:
    ds = _read_source(source)
    uniq = sorted(set(q_terms))
    parts = ds.map_batches(_StatsPartial,
                           fn_constructor_kwargs=dict(cfg=cfg, col=col,
                                                      analyzer=analyzer,
                                                      q_terms=uniq),
                           batch_format="pyarrow",
                           batch_size=cfg.tokenize_batch_size,
                           concurrency=tokenize_concurrency(cfg))
    n_docs = 0
    total_len = 0
    df = {t: 0 for t in uniq}
    for b in parts.iter_batches(batch_format="pyarrow"):
        n_docs += int(np.sum(b.column("n_docs").to_numpy(zero_copy_only=False)))
        total_len += int(np.sum(b.column("total_len").to_numpy(zero_copy_only=False)))
        for i, t in enumerate(uniq):
            df[t] += int(np.sum(b.column(f"df_{i}").to_numpy(zero_copy_only=False)))
    avgdl = total_len / n_docs if n_docs else 0.0
    return n_docs, avgdl, df


class _FlatScore:
    def __init__(self, cfg: IndexConfig, col: str, analyzer: str,
                 q_terms: list[str], n_docs: int, avgdl: float,
                 df: dict[str, int], mode: str, length_policy: str,
                 filter_col: str | None, filter_value: str | None,
                 k1: float, b: float):
        self.cfg, self.col, self.analyzer = cfg, col, analyzer
        # ordered distinct query terms with multiplicities (fp-order pinned)
        self.terms = list(dict.fromkeys(q_terms))
        self.weights = Counter(q_terms)
        self.n_docs, self.avgdl, self.df = n_docs, avgdl, df
        self.mode, self.length_policy = mode, length_policy
        self.filter_col, self.filter_value = filter_col, filter_value
        self.k1, self.b = k1, b
        self.idf = {t: float(idf_fn(df.get(t, 0), n_docs)) if df.get(t, 0) else 0.0
                    for t in self.terms}

    def __call__(self, batch: pa.Table) -> pa.Table:
        an = ANALYZERS[self.analyzer]
        ids = compute_doc_ids(batch, self.cfg.id_cols, self.cfg.doc_id_col)
        if self.filter_col is not None:
            fmask = np.array([v == self.filter_value
                              for v in batch.column(self.filter_col).to_pylist()])
        else:
            fmask = np.ones(batch.num_rows, dtype=bool)
        out_ids: list[int] = []
        out_scores: list[float] = []
        for i, text in enumerate(batch.column(self.col).to_pylist()):
            if not fmask[i]:
                continue
            tf = Counter(an(text))
            dl = sum(tf.values())
            eff = float(effective_length(np.array([dl]), self.length_policy)[0])
            score = 0.0
            hits = 0
            for t in self.terms:  # same term order as the indexed scorer
                c = tf.get(t, 0)
                if c and self.df.get(t, 0):
                    hits += 1
                    score += self.weights[t] * self.idf[t] * float(
                        tf_norm(np.array([c]), np.array([eff]),
                                self.avgdl, self.k1, self.b)[0])
            required = len(self.terms) if self.mode == "and" else 1
            if hits >= required and score > 0.0:
                out_ids.append(int(ids[i]))
                out_scores.append(score)
        return pa.table({"doc_id": pa.array(out_ids, pa.int64()),
                         "score": pa.array(out_scores, pa.float64())})


def flat_bm25_topk(source, query: str, cfg: IndexConfig | None = None,
                   field: str = "content", k: int = 10, mode: str = "or",
                   length_policy: str = "lucene",
                   filter_col: str | None = None, filter_value: str | None = None,
                   stats_override: tuple[int, float, dict] | None = None,
                   k1: float = K1, b: float = B) -> rd.Dataset:
    """-> Dataset[(doc_id, score)] of the exact top-k, (score desc,
    doc_id asc).

    The self-computed pass-1 stats count *rows*; for inputs holding
    duplicate (key) rows pass ``stats_override`` (e.g. taken from the
    built index's manifest + df lookups) so both sides of a
    rank-identity check see the deduplicated N/avgdl/df."""
    cfg = cfg or IndexConfig()
    col, analyzer = next((c, a) for f, c, a in cfg.fields if f == field)
    q_terms = ANALYZERS[analyzer](query)
    if stats_override is not None:
        n_docs, avgdl, df = stats_override
    else:
        n_docs, avgdl, df = corpus_stats_and_df(source, cfg, col, analyzer, q_terms)
    ds = _read_source(source)
    scored = ds.map_batches(_FlatScore,
                            fn_constructor_kwargs=dict(
                                cfg=cfg, col=col, analyzer=analyzer,
                                q_terms=q_terms, n_docs=n_docs, avgdl=avgdl,
                                df=df, mode=mode, length_policy=length_policy,
                                filter_col=filter_col, filter_value=filter_value,
                                k1=k1, b=b),
                            batch_format="pyarrow",
                            batch_size=cfg.tokenize_batch_size,
                            concurrency=tokenize_concurrency(cfg))
    # exact dedup parity with the indexed path: duplicate (key) rows have
    # identical content, hence identical scores — keep one per doc_id
    from ray.data.aggregate import Max
    scored = scored.groupby("doc_id").aggregate(Max("score", alias_name="score"))
    return scored.sort(["score", "doc_id"], descending=[True, False]).limit(k)


def highlight(source, doc_ids: list[int], query: str,
              text_col: str = "content", doc_id_col: str = "doc_id",
              analyzer: str = "base", fragment_size: int = 120,
              pre_tag: str = "<em>", post_tag: str = "</em>"
              ) -> dict[int, str]:
    """Plain-highlighter parity (OpenSearch ``highlight`` on a stored
    field re-analyzes the source text at fetch time): fetch the hit
    docs' text from the source-of-record parquet (predicate pushdown —
    the index stores metadata + sha only, never the wide column), find
    the query terms' character spans, pick the ``fragment_size`` window
    containing the most matches (ties -> earliest), and wrap each match
    in ``pre_tag``/``post_tag``.  ``doc_ids`` is a top-k result — a
    handful of ids — so this is a driver-side point fetch, not a scan.

    Returns {doc_id: fragment} with docs that contain no match omitted
    (OpenSearch omits the ``highlight`` section for non-matching
    fields)."""
    import os
    import re

    import pyarrow.parquet as pq

    from ..corpus import corpus_paths

    if isinstance(source, str):
        paths = corpus_paths(source) if os.path.isdir(source) else [source]
    else:
        paths = list(source)
    toks = ANALYZERS[analyzer](query)
    if not toks or not doc_ids:
        return {}
    # one alternation over word-ish boundaries; longest token first so
    # e.g. 'sparkly' never half-matches a shorter 'spark' alternative
    alts = sorted(set(toks), key=len, reverse=True)
    rx = re.compile(
        r"(?<![A-Za-z0-9_])(?:" + "|".join(re.escape(t) for t in alts)
        + r")(?![A-Za-z0-9_])", re.IGNORECASE)
    ids = [int(d) for d in doc_ids]
    tables = [pq.read_table(p, columns=[doc_id_col, text_col],
                            filters=[(doc_id_col, "in", ids)])
              for p in paths]
    out: dict[int, str] = {}
    for t in tables:
        for row in t.to_pylist():
            text = row[text_col] or ""
            spans = [(m.start(), m.end()) for m in rx.finditer(text)]
            if not spans:
                continue
            # best window: anchored at a match start, most matches inside
            best_i, best_n = 0, -1
            for i, (s, _) in enumerate(spans):
                n = sum(1 for a, e in spans if a >= s and e <= s + fragment_size)
                if n > best_n:
                    best_i, best_n = i, n
            ws = spans[best_i][0]
            we = min(len(text), ws + fragment_size)
            parts: list[str] = []
            cur = ws
            for a, e in spans:
                if a < ws or e > we:
                    continue
                parts.append(text[cur:a])
                parts.append(pre_tag + text[a:e] + post_tag)
                cur = e
            parts.append(text[cur:we])
            out[int(row[doc_id_col])] = "".join(parts)
    return out
