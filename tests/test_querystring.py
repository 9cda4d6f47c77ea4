"""query_string parser + executor: grammar lowering checked clause by
clause, execution checked against the equivalent composed searcher
calls (search_bool / phrase filter / filters) on the same index."""

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_ray.state.querystring import (
    MUST, MUST_NOT, SHOULD, parse_query_string)


def _cl(p):
    return [(c.occur, c.kind, c.text, c.fuzziness, c.slop) for c in p.clauses]


def test_parse_default_or_and_operators():
    p = parse_query_string("spark join")
    assert _cl(p) == [(SHOULD, "term", "spark", 0, 0),
                      (SHOULD, "term", "join", 0, 0)]
    p = parse_query_string("spark AND join")
    assert _cl(p) == [(MUST, "term", "spark", 0, 0),
                      (MUST, "term", "join", 0, 0)]
    p = parse_query_string("spark AND join OR sort")
    assert _cl(p) == [(MUST, "term", "spark", 0, 0),
                      (MUST, "term", "join", 0, 0),
                      (SHOULD, "term", "sort", 0, 0)]
    p = parse_query_string("+spark -dup NOT table")
    assert _cl(p) == [(MUST, "term", "spark", 0, 0),
                      (MUST_NOT, "term", "dup", 0, 0),
                      (MUST_NOT, "term", "table", 0, 0)]


def test_parse_phrase_filters_ranges_multiterm():
    p = parse_query_string('"merge sort"~2 lang:en n_chars:[200 TO *] '
                           "spar* s?an jion~2")
    assert _cl(p) == [(MUST, "phrase", "merge sort", 0, 2),
                      (SHOULD, "prefix", "spar", 0, 0),
                      (SHOULD, "wildcard", "s?an", 0, 0),
                      (SHOULD, "fuzzy", "jion", 2, 0)]
    assert p.filters == [("lang", "en")]
    assert p.ranges == [("n_chars", 200.0, float("inf"))]
    # NOT "phrase" excludes
    p = parse_query_string('spark NOT "merge sort"')
    assert _cl(p)[1] == (MUST_NOT, "phrase", "merge sort", 0, 0)


def test_parse_rejects_unsupported():
    for bad in ["(a OR b)", "f:(a b)", "term^2", "/regex/", "AND x",
                "a AND NOT b", "f:v^2"]:
        with pytest.raises(ValueError):
            parse_query_string(bad)


def test_parse_allows_slash_in_kv_and_phrase():
    # the unsupported-syntax check is per bare token: '/' inside a
    # field:value token or a quoted phrase is legal (ADVICE r2)
    p = parse_query_string("path:/var/log")
    assert p.filters == [("path", "/var/log")]
    p = parse_query_string('"a/b" spark')
    assert _cl(p)[0][1:3] == ("phrase", "a/b")
    assert _cl(p)[1][1:3] == ("term", "spark")


def test_query_string_execution(dsl_index):
    s, _ = dsl_index
    # pure OR of terms == search(mode=or)
    assert s.query_string("spark join", k=15) == \
        s.search("spark join", k=15, method="taat")
    # AND == search(mode=and)
    assert s.query_string("spark AND join", k=15) == \
        s.search("spark join", k=15, mode="and", method="and")
    # bool composition == search_bool
    assert s.query_string("+spark join sort -table", k=15) == \
        s.search_bool(must=["spark"], should=["join", "sort"],
                      must_not=["table"], minimum_should_match=0, k=15)
    # keyword filter
    assert s.query_string("spark lang:py", k=15) == \
        s.search("spark", k=15, method="taat",
                 filter_field="lang", filter_value="py")
    # range filter
    assert s.query_string("spark n_chars:[100 TO 200]", k=15) == \
        s.search("spark", k=15, method="taat",
                 range_field="n_chars", range_lo=100, range_hi=200)
    # phrase is filter-context (a MUST): every phrase doc matches, and
    # the optional 'sort' should-clause adds score where it hits
    # (Lucene: should is optional once a must/filter exists)
    qhits = s.query_string('sort "spark sql"', k=10**6)
    phrase_docs = {d for _, d in s.phrase_search("spark sql", k=10**6)}
    assert {d for _, d in qhits} == phrase_docs
    term_scores = dict((d, sc) for sc, d in
                       s.search("sort", k=10**6, method="taat"))
    assert all(sc == term_scores.get(d, 0.0) for sc, d in qhits)
    # AND-ing the term makes it required
    qand = s.query_string('sort AND "spark sql"', k=10**6)
    assert {d for _, d in qand} == \
        {d for d in term_scores} & phrase_docs
    # prefix group clause scores like prefix_search
    assert s.query_string("spar*", k=12) == s.prefix_search("spar", k=12)
    # fuzzy clause
    assert s.query_string("jion~2", k=12) == s.fuzzy_search(
        "jion", fuzziness=2, k=12, max_expansions=1024)
    # filters-only query matches everything with that value, score 0
    hits = s.query_string("lang:py", k=10**6)
    assert all(sc == 0.0 for sc, _ in hits)
    assert {d for _, d in hits} == {d for d in range(300) if d % 4 == 0}
    with pytest.raises(ValueError, match="no scoring or filter"):
        s.query_string("   ")


# reuse the dsl_index fixture from test_query_dsl
from tests.test_query_dsl import dsl_index, ref  # noqa: E402,F401
