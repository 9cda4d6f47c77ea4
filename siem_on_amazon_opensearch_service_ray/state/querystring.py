"""query_string mini-language: parse + execute.

The reference's primary interactive surface is OpenSearch
query_string / KQL typed into dashboards (reference dashboard saved
searches; OpenSearch query-string syntax).  This module implements the
subset a SIEM user actually types, with deterministic, documented
semantics:

  spark join                 two SHOULD term clauses (default OR)
  spark AND join             both MUST (AND binds its two neighbours)
  +spark -dup                '+' = MUST, '-'/'NOT' = MUST_NOT
  "merge sort"               quoted phrase — FILTER context: must
                             match, contributes no score (OpenSearch
                             bool.filter semantics)
  lang:en                    keyword-field filter
  n_chars:[200 TO 2000]      numeric range filter (inclusive)
  spar*  s?an                prefix / wildcard multi-term clause —
                             matches any dictionary expansion; the
                             matched expansions' BM25 scores sum
  jion~2                     fuzzy multi-term clause (Levenshtein)

Unsupported (raises ValueError, never guesses): parentheses, field
grouping ``f:(a b)``, boosts ``^2``, regex ``/…/``.

Scoring: term and multi-term clauses score BM25 exactly like
``search_bool`` (sum over matching scoring clauses); phrases, field
filters and ranges only constrain the match set.  Clause combination
is Lucene's flat BooleanQuery lowering: ``a AND b`` promotes both
neighbours to MUST; explicit ``+``/``-`` win over everything; with no
MUST clause at least one SHOULD clause must match.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

#: occurrence markers
MUST, SHOULD, MUST_NOT = "must", "should", "must_not"


@dataclass
class Clause:
    occur: str              # must | should | must_not
    kind: str               # term | prefix | wildcard | fuzzy | phrase
    text: str               # raw clause text (unanalyzed)
    fuzziness: int = 0
    slop: int = 0


@dataclass
class ParsedQuery:
    clauses: list[Clause] = dc_field(default_factory=list)
    filters: list[tuple[str, str]] = dc_field(default_factory=list)
    ranges: list[tuple[str, float, float]] = dc_field(default_factory=list)


_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<phrase>"(?P<ph>[^"]*)"(?:~(?P<phslop>\d+))?)
      | (?P<range>(?P<rf>[A-Za-z0-9_.]+):\[(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\])
      | (?P<kv>(?P<kf>[A-Za-z0-9_.]+):(?P<kv_v>[^\s()]+))
      | (?P<bare>[^\s()]+)
      | (?P<paren>[()])
    )""", re.VERBOSE)



def parse_query_string(qs: str) -> ParsedQuery:
    """Tokenize + lower a query string into occurrence-marked clauses
    and filter constraints.  AND promotes its two neighbour clauses to
    MUST; OR keeps SHOULD; NOT / leading ``-`` marks MUST_NOT; leading
    ``+`` marks MUST.  Raises ValueError on unsupported syntax."""
    out = ParsedQuery()
    pending_op: str | None = None
    pos = 0
    while pos < len(qs):
        m = _TOKEN_RX.match(qs, pos)
        if not m or m.end() == pos:
            break
        pos = m.end()
        if m.group("paren"):
            raise ValueError("query_string: parentheses/grouping are not "
                             "supported (compose via search_bool)")
        if m.group("phrase") is not None:
            c = Clause(SHOULD, "phrase", m.group("ph"),
                       slop=int(m.group("phslop") or 0))
            _attach(out, c, pending_op)
            if c.occur == SHOULD:
                c.occur = MUST        # phrases are filter-context: required
            pending_op = None
            continue
        if m.group("range") is not None:
            lo, hi = m.group("lo"), m.group("hi")
            out.ranges.append((m.group("rf"),
                               float("-inf") if lo == "*" else float(lo),
                               float("inf") if hi == "*" else float(hi)))
            pending_op = None
            continue
        if m.group("kv") is not None:
            if "^" in m.group("kv_v"):
                raise ValueError("query_string: boosts (^) are not supported")
            out.filters.append((m.group("kf"), m.group("kv_v")))
            pending_op = None
            continue
        tok = m.group("bare")
        if tok in ("AND", "&&"):
            if not out.clauses:
                raise ValueError("query_string: AND with no left operand")
            pending_op = "AND"
            continue
        if tok in ("OR", "||"):
            pending_op = None           # SHOULD is the default
            continue
        if tok == "NOT":
            if pending_op == "AND":
                raise ValueError("query_string: AND NOT is not supported")
            pending_op = "NOT"
            continue
        # unsupported-syntax checks are PER BARE TOKEN so that '/' or
        # '^' inside quoted phrases and field:value tokens stay legal
        # (e.g. path:/var/log, "a/b")
        if tok.startswith("/"):
            raise ValueError("query_string: regex (/…/) is not supported")
        if "^" in tok:
            raise ValueError("query_string: boosts (^) are not supported")
        occur_override = None
        if tok.startswith("+"):
            occur_override, tok = MUST, tok[1:]
        elif tok.startswith("-"):
            occur_override, tok = MUST_NOT, tok[1:]
        if not tok:
            raise ValueError("query_string: empty clause")
        fuzz = re.fullmatch(r"(.+)~(\d+)", tok)
        if fuzz:
            c = Clause(SHOULD, "fuzzy", fuzz.group(1),
                       fuzziness=int(fuzz.group(2)))
        elif "*" in tok or "?" in tok:
            if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
                c = Clause(SHOULD, "prefix", tok[:-1])
            else:
                c = Clause(SHOULD, "wildcard", tok)
        else:
            c = Clause(SHOULD, "term", tok)
        _attach(out, c, pending_op)
        if occur_override is not None:     # explicit +/- wins over AND/NOT
            c.occur = occur_override
        pending_op = None
    return out


def parse_simple_query_string(qs: str, default_operator: str = "or"
                              ) -> ParsedQuery:
    """OpenSearch ``simple_query_string``: the TOLERANT grammar —
    ``+`` (AND), ``|`` (OR), leading ``-`` (negate), quoted phrases
    (``"..."~N`` = slop), trailing ``*`` (prefix), ``term~N``
    (fuzzy; bare ``~`` = 2), and NOTHING else: no ``field:value``,
    no ranges, no AND/OR/NOT words (they are literal terms).  Parens
    are flattened and invalid syntax degrades to literal text —
    this parser NEVER raises, the query type's defining contract.
    ``default_operator`` sets the occurrence of bare terms."""
    out = ParsedQuery()
    default_and = default_operator.lower() == "and"
    pending: str | None = None
    for raw in re.findall(r'"[^"]*"(?:~\d+)?|\S+', qs):
        tok = raw.strip("()")
        if not tok or tok in ("-", "~", "*"):
            pending = None
            continue
        if tok == "+":
            pending = "AND"
            continue
        if tok == "|":
            pending = "OR"
            continue
        occur_override = None
        if tok.startswith("-"):
            occur_override = MUST_NOT
            tok = tok[1:]
            if not tok:
                continue
        op = pending if pending is not None else \
            ("AND" if default_and else None)
        if tok.startswith('"'):
            m = re.fullmatch(r'"([^"]*)"(?:~(\d+))?', tok)
            if m is not None:
                if m.group(1).strip():
                    c = Clause(MUST, "phrase", m.group(1),
                               slop=int(m.group(2) or 0))
                    out.clauses.append(c)
                    if occur_override is not None:
                        c.occur = occur_override
                pending = None
                continue
            tok = tok.strip('"')        # unbalanced quote: literal
            if not tok:
                pending = None
                continue
        fuzz = re.fullmatch(r"(.+?)~(\d*)", tok)
        if fuzz:
            c = Clause(SHOULD, "fuzzy", fuzz.group(1),
                       fuzziness=int(fuzz.group(2) or 2))
        elif tok.endswith("*") and "*" not in tok[:-1] \
                and "?" not in tok and len(tok) > 1:
            c = Clause(SHOULD, "prefix", tok[:-1])
        else:
            # any other wildcard char is LITERAL in simple syntax;
            # the analyzer strips punctuation, degrading gracefully
            c = Clause(SHOULD, "term", tok)
        _attach(out, c, "AND" if op == "AND" else None)
        if occur_override is not None:
            c.occur = occur_override
        pending = None
    return out


def _attach(out: ParsedQuery, c: Clause, pending_op: str | None) -> None:
    """Append a clause, applying the pending infix operator: AND
    promotes the clause AND its left scoring neighbour to MUST
    (Lucene query_string lowering); NOT marks MUST_NOT."""
    if pending_op == "AND":
        c.occur = MUST
        for prev in reversed(out.clauses):
            if prev.occur == SHOULD:
                prev.occur = MUST
            break
    elif pending_op == "NOT":
        c.occur = MUST_NOT
    out.clauses.append(c)
