"""Percolate: reverse search — registered queries matched against a
document STREAM (OpenSearch ``percolate`` query over a queries index;
the SIEM use is detection/alerting rules evaluated at ingest, cf. the
reference's per-logtype exclusion rules which are the same
match-rules-against-each-event shape, siem/__init__.py exclusion
checks).

Ray-Data-first: the rule set is parsed ONCE driver-side
(``state.querystring.parse_query_string`` — rules are admin-authored,
so the STRICT grammar applies), broadcast via ``ray.put``, and each
``map_batches`` task evaluates every rule against its batch with a
term→doc-incidence bitmap: tokenize the batch once, build one boolean
column per DISTINCT rule term (only rule terms — not the corpus
vocabulary), then every rule is a handful of numpy AND/OR/ANDNOT ops
over those columns.  Phrases match on the space-joined analyzed token
stream (exact token adjacency, == the SQL oracle's
``array_to_string(regexp_extract_all(...), ' ') LIKE`` probe).

Per batch the work is O(tokens + rules×docs/64) — no per-(doc, rule)
Python.  At 100 TB this is a pure streaming map stage: no shuffle, no
state, rules broadcast once per job.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..analysis import ANALYZERS
from ..state.querystring import (MUST, MUST_NOT, SHOULD, ParsedQuery,
                                 parse_query_string)

__all__ = ["compile_rules", "percolate_batch", "percolate_docs"]


def compile_rules(rules: list[tuple[str, str]], analyzer: str = "base"
                  ) -> list[tuple[str, ParsedQuery, list[list[str]]]]:
    """Parse each (rule_id, query_string) once, pre-analyzing every
    clause's terms.  Raises on invalid rules (strict grammar — a
    broken detection rule should fail REGISTRATION, not silently
    never match).  Returns [(rule_id, parsed, terms_per_clause)]."""
    an = ANALYZERS[analyzer]
    out = []
    for rule_id, qs in rules:
        parsed = parse_query_string(qs)
        if parsed.filters or parsed.ranges:
            raise ValueError(
                f"percolate rule {rule_id!r}: field filters/ranges need "
                "indexed fields; percolation evaluates the text stream "
                "only — express them as separate keyword columns")
        terms_per_clause = [
            an(c.text) if c.kind == "term" else []
            for c in parsed.clauses]
        for c in parsed.clauses:
            if c.kind not in ("term", "phrase"):
                raise ValueError(
                    f"percolate rule {rule_id!r}: {c.kind} clauses need "
                    "a term dictionary; percolation supports term and "
                    "phrase clauses")
        out.append((rule_id, parsed, terms_per_clause))
    return out


def percolate_batch(texts: list[str], compiled, analyzer: str = "base"
                    ) -> list[list[str]]:
    """Evaluate every compiled rule against a batch of raw texts.
    Returns, per text, the list of matching rule ids (rule order)."""
    an = ANALYZERS[analyzer]
    n = len(texts)
    tok_lists = [an(t) for t in texts]
    joined = [" " + " ".join(tl) + " " for tl in tok_lists]
    # incidence bitmap for every distinct rule term, built by walking
    # each doc's token SET once and intersecting with the rule-term
    # set (C-speed set ops) — O(Σ distinct tokens) instead of
    # O(rule_terms × docs), which matters when the rule set is a real
    # SIEM library (thousands of detections)
    need: set[str] = set()
    for _rid, _parsed, tpc in compiled:
        for ts in tpc:
            need.update(ts)
    has: dict[str, np.ndarray] = {t: np.zeros(n, dtype=bool)
                                  for t in need}
    for i, tl in enumerate(tok_lists):
        for t in set(tl) & need:
            has[t][i] = True
    matches: list[list[str]] = [[] for _ in range(n)]
    for rule_id, parsed, tpc in compiled:
        ok = np.ones(n, dtype=bool)
        any_should = np.zeros(n, dtype=bool)
        n_should = 0
        for c, ts in zip(parsed.clauses, tpc):
            if c.kind == "phrase":
                ph_terms = an(c.text)
                probe = " " + " ".join(ph_terms) + " "
                hit = np.fromiter((probe in j for j in joined), bool,
                                  count=n)
            else:
                if not ts:
                    hit = np.zeros(n, dtype=bool)
                else:
                    hit = has[ts[0]].copy()
                    for t in ts[1:]:     # multi-token term clause: all
                        hit &= has[t]
            if c.occur == MUST or (c.kind == "phrase"
                                   and c.occur != MUST_NOT):
                ok &= hit
            elif c.occur == MUST_NOT:
                ok &= ~hit
            else:
                any_should |= hit
                n_should += 1
        if n_should:
            has_must = any(
                c.occur == MUST or (c.kind == "phrase"
                                    and c.occur != MUST_NOT)
                for c in parsed.clauses)
            if not has_must:
                ok &= any_should
        for i in np.flatnonzero(ok):
            matches[i].append(rule_id)
    return matches


def percolate_docs(ds, rules: list[tuple[str, str]],
                   text_col: str = "text", id_col: str = "doc_id",
                   analyzer: str = "base"):
    """Percolate a Dataset: one output row per (doc, matching rule).
    Rules parse once driver-side and broadcast; each batch evaluates
    vectorized — a pure streaming map stage, no shuffle."""
    import ray
    compiled = compile_rules(rules, analyzer)
    ref = ray.put(compiled) if ray.is_initialized() else compiled

    def _percolate(batch: pa.Table) -> pa.Table:
        comp = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_pylist()
        hits = percolate_batch(texts, comp, analyzer)
        out_ids, out_rules = [], []
        for d, rs in zip(ids, hits):
            for r in rs:
                out_ids.append(d)
                out_rules.append(r)
        return pa.table({
            id_col: pa.array(out_ids, batch.column(id_col).type),
            "rule_id": pa.array(out_rules, pa.string()),
        })

    return ds.map_batches(_percolate, batch_format="pyarrow")
