"""Fuzzy retrieval: Lucene-FuzzyQuery-style dictionary expansion and
blended-max BM25 scoring (operators/query.py::fuzzy_expand/fuzzy_search).
Oracle value parity runs in test_entry_oracle.py; here: semantics the
SQL comparison can't pin — the prefix gate, the expansion cap, the
per-query-term MAX blend, and the empty-expansion path.
"""

from __future__ import annotations

import pytest

from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import (
    fuzzy_expand,
    fuzzy_search,
    score_bm25,
)
from search_engine_spark.operators.text_analytics import ws_tokens


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark engine"),
            (2, "sort order engine"),
            (3, "spark sort merge"),
            (4, "query plan cache"),
            (5, "quark physics"),
        ],
        "doc_id long, text string",
    )
    return build_index(docs, tokenizer=ws_tokens).cache()


def test_expand_prefix_gate_and_distance(index):
    rows = {
        (r["q"], r["term"]): r
        for r in fuzzy_expand(index, ["spork"], max_dist=2).collect()
    }
    # 1-edit and 2-edit same-prefix terms expand; 'order' (dist 4,
    # wrong prefix) and 'quark' (prefix 'q') never appear
    assert ("spork", "spark") in rows and rows[("spork", "spark")]["dist"] == 1
    assert ("spork", "sort") in rows and rows[("spork", "sort")]["dist"] == 2
    assert all(q == "spork" and t[0] == "s" for q, t in rows)


def test_expand_boost_decays_with_distance(index):
    rows = {r["term"]: r for r in fuzzy_expand(index, ["spork"]).collect()}
    assert rows["spark"]["boost"] == pytest.approx(1 - 1 / 5)
    assert rows["sort"]["boost"] == pytest.approx(1 - 2 / 5)


def test_expand_cap_keeps_closest_then_highest_df(index):
    got = [
        r["term"]
        for r in fuzzy_expand(index, ["spork"], max_expansions=1).collect()
    ]
    # dist 1 beats dist 2 regardless of df
    assert got == ["spark"]


def test_exact_term_expands_to_itself_with_unit_boost(index):
    rows = {r["term"]: r for r in fuzzy_expand(index, ["spark"]).collect()}
    assert rows["spark"]["dist"] == 0
    assert rows["spark"]["boost"] == 1.0


def test_blend_takes_max_not_sum(spark, index):
    # doc 3 contains BOTH expansions of 'spork' (spark and sort); its
    # score must be the max single contribution, not the sum of both
    top = {
        r["doc_id"]: r["score"]
        for r in fuzzy_search(index, ["spork"], k=10).collect()
    }
    qt = spark.createDataFrame(
        [(0, "spark"), (1, "sort")], "query_id int, term string"
    )
    per = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in score_bm25(index, qt, k=10, terms=["spark", "sort"]).collect()
    }
    spark_c = per.get((0, 3), 0.0) * (1 - 1 / 5)
    sort_c = per.get((1, 3), 0.0) * (1 - 2 / 5)
    assert top[3] == pytest.approx(max(spark_c, sort_c), abs=1e-6)
    assert top[3] < spark_c + sort_c


def test_multi_term_query_sums_per_term_maxima(index):
    # 'spork qeury': doc 3 matches only the spork side, doc 4 only the
    # qeury side; both retrieved under OR semantics
    docs = {r["doc_id"] for r in fuzzy_search(index, ["spork", "qeury"]).collect()}
    assert 3 in docs and 4 in docs


def test_no_expansion_returns_empty(index):
    out = fuzzy_search(index, ["zzzzzzzz"], k=10)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["query_id", "doc_id", "score"]


# ---------------------------------------------------------------------------
# autocomplete (prefix + fuzzy fallback)
# ---------------------------------------------------------------------------


def test_autocomplete_prefix_outranks_fuzzy(index):
    from search_engine_spark.operators.query import autocomplete

    out = autocomplete(index, "sp", n=10, max_dist=2).collect()
    srcs = [r["src"] for r in out]
    # all prefix rows come before any fuzzy row
    assert srcs == sorted(srcs, key=lambda s: 0 if s == "prefix" else 1)
    assert out[0]["suggestion"] == "spark" and out[0]["src"] == "prefix"


def test_autocomplete_caps_and_orders_by_popularity(spark):
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import autocomplete
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [(1, "aaa aab aab aac"), (2, "aab aad")], "doc_id long, text string"
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    out = [r["suggestion"] for r in autocomplete(idx, "aa", n=2).collect()]
    # aab has df 2, the others 1 -> popularity first, then lexicographic
    assert out == ["aab", "aaa"]


def test_autocomplete_pure_fuzzy_when_no_prefix_hit(index):
    from search_engine_spark.operators.query import autocomplete

    out = autocomplete(index, "sprak", n=5, max_dist=2).collect()
    assert out and all(r["src"] == "fuzzy" for r in out)
    assert "spark" in {r["suggestion"] for r in out}
