"""Full query DSL on the doc-sharded layout: every *_sharded method
(and the search() auto-route) must be rank-AND-score identical to the
term-partitioned driver path — global idf via the dfs round makes
per-doc scores equal, and doc shards are disjoint so the merged top-k
is exact.  Reference parity: OpenSearch executes every query per doc
shard (command_index.txt:8)."""

import dataclasses

import numpy as np
import pytest

from siem_on_amazon_opensearch_service_ray.pipelines.build_index import (
    IndexConfig, build_index)
from siem_on_amazon_opensearch_service_ray.state.searcher import Searcher

# term pinned so the term-vs-doc twin contrast below stays meaningful
# now that "doc" is the library default
CFG = IndexConfig(num_partitions=4, sample_mod=1, hot_df_threshold=500,
                  salt_unit=300, max_salts=4, store_positions=True,
                  store_source=True, partition_by="term")


@pytest.fixture(scope="module")
def pair(ray_session, small_corpus, tmp_path_factory):
    term_dir = str(tmp_path_factory.mktemp("dsl_term") / "idx")
    doc_dir = str(tmp_path_factory.mktemp("dsl_doc") / "idx")
    build_index(small_corpus, term_dir, CFG)
    build_index(small_corpus, doc_dir,
                dataclasses.replace(CFG, partition_by="doc"))
    s_term = Searcher(term_dir, use_actors=False)
    s_doc = Searcher(doc_dir, use_actors=True)
    yield s_term, s_doc
    s_doc.close()


def _same(got, want, scores=True):
    assert [d for _, d in got] == [d for _, d in want]
    if scores:
        np.testing.assert_allclose([s for s, _ in got],
                                   [s for s, _ in want], rtol=1e-12)
    else:
        assert [n for n, _ in got] == [n for n, _ in want]


def test_bool_sharded(pair):
    st, sd = pair
    kw = dict(must=["def"], should=["return", "import"],
              must_not=["needle_137"], minimum_should_match=1, k=25)
    _same(sd.search_bool_sharded(**kw), st.search_bool(**kw))
    # filter + range composition
    kw = dict(must=["def"], should=["class"], filter_field="lang",
              filter_value="go", k=25)
    _same(sd.search_bool_sharded(**kw), st.search_bool(**kw))


def test_phrase_sharded(pair):
    st, sd = pair
    _same(sd.phrase_search_sharded("def return", k=50),
          st.phrase_search("def return", k=50), scores=False)
    _same(sd.phrase_search_sharded("def return", k=50, slop=2),
          st.phrase_search("def return", k=50, slop=2), scores=False)
    _same(sd.phrase_search_scored_sharded("def return", k=25),
          st.phrase_search_scored("def return", k=25))


def test_phrase_prefix_sharded(pair):
    st, sd = pair
    _same(sd.match_phrase_prefix_sharded("def ret", k=30,
                                         max_expansions=512),
          st.match_phrase_prefix("def ret", k=30, max_expansions=512),
          scores=False)


def test_span_sharded(pair):
    st, sd = pair
    _same(sd.span_near_sharded(["def", "return"], slop=3, k=30),
          st.span_near(["def", "return"], slop=3, k=30), scores=False)
    _same(sd.span_near_sharded(["return", "def"], slop=4, k=30,
                               in_order=False),
          st.span_near(["return", "def"], slop=4, k=30, in_order=False),
          scores=False)
    expr = {"span_near": {"clauses": [
        "def", {"span_or": {"clauses": ["return", "import"]}}],
        "slop": 3, "in_order": True}}
    _same(sd.span_query_sharded(expr, k=30), st.span_query(expr, k=30),
          scores=False)


def test_mlt_sharded(pair):
    st, sd = pair
    like = "def return import class static void main"
    _same(sd.more_like_this_sharded(like_text=like, k=20),
          st.more_like_this(like_text=like, k=20))
    # stored-doc form (store_source covers content)
    _same(sd.more_like_this_sharded(doc_id=7, k=15),
          st.more_like_this(doc_id=7, k=15))


def test_multi_term_sharded(pair):
    st, sd = pair
    _same(sd.prefix_search_sharded("need", k=20),
          st.prefix_search("need", k=20))
    _same(sd.wildcard_search_sharded("ret?rn", k=20),
          st.wildcard_search("ret?rn", k=20))
    _same(sd.regexp_search_sharded("im[a-z]+t", k=20),
          st.regexp_search("im[a-z]+t", k=20))
    _same(sd.fuzzy_search_sharded("retrun", fuzziness=2, k=20),
          st.fuzzy_search("retrun", fuzziness=2, k=20))


def test_query_string_sharded(pair):
    st, sd = pair
    for qs in ('+def return -needle_137', '"def return" lang:go imp*'):
        _same(sd.query_string_sharded(qs, k=25), st.query_string(qs, k=25))


def test_search_auto_routes_doc_layout(pair):
    """search() on a doc-partitioned index with actors takes the
    per-shard path by default (no search_doc_sharded call needed) and
    stays identical to the term-partitioned ranking."""
    st, sd = pair
    for q in ("def return", "needle_137", "zz_no_such_term_zz"):
        _same(sd.search(q, k=20), st.search(q, k=20))
    _same(sd.search("def", k=20, filter_field="lang", filter_value="go"),
          st.search("def", k=20, filter_field="lang", filter_value="go"))


def test_gather_correct_on_doc_layout(pair):
    """The driver-gather methods (bool here) are also CORRECT on doc
    layout without actors — _gather broadcasts instead of crc-routing."""
    st, sd = pair
    s_local = Searcher(sd.index_dir, use_actors=False)
    kw = dict(must=["def"], should=["return"], k=20)
    _same(s_local.search_bool(**kw), st.search_bool(**kw))


def test_sharded_requires_doc_layout(pair):
    st, _ = pair
    with pytest.raises(ValueError):
        st.search_bool_sharded(must=["def"])
