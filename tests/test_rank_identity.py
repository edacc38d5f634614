"""Rank-identity gate (BASELINE.json north_rule): Spark engine top-k
doc_ids + scores must be rank-identical to the single-node oracle on the
reference query set, for BOTH scorers, over the seeded synthetic corpus.

Also checks the per-row invariant: the corpus generator's stored `text`
column equals the engine's recomputation from `html` byte-for-byte.
"""

from __future__ import annotations

import pytest

from oracle import oracle as orc
from search_engine_spark.functions.textproc import extract_text
from search_engine_spark.operators.index_build import build_index, prepare_docs
from search_engine_spark.operators.query import queries_to_terms, score_bm25, score_tfidf_compat
from search_engine_spark.sources.corpus import synth_pages

N_PAGES = 400

# FIXTURES.md §3: reference query set
QUERIES = [
    "hippopotamus",
    "ladder",
    "pipe",
    "seagull",
    "elephant",
    "hello",
    "gumball",
    "persona 5 strikers",
    "hitman",
    "hippopotamus ladder",
    "ladder pipe seagull",
    "the hippopotamus is on a ladder",
    "café naïve",
    "nosuchtermanywhere",
    # treebank-tokenizer queries (reference app/main.py:53 — NLTK
    # word_tokenize): contractions split to do+n't / hitman+'s,
    # punctuation becomes searchable tokens — both sides must agree
    "don't",
    "hitman's ladder",
    "seagull, elephant!",
]


@pytest.fixture(scope="module")
def corpus(spark):
    pages = synth_pages(spark, N_PAGES, seed=42).cache()
    docs = prepare_docs(pages, id_method="dense").cache()
    docs.count()
    return pages, docs


@pytest.fixture(scope="module")
def oracle_index(corpus):
    _, docs = corpus
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    return orc.build_index(rows, html=False)


@pytest.fixture(scope="module")
def spark_index(corpus):
    _, docs = corpus
    return build_index(docs).cache()


def test_text_byte_identity(corpus):
    """input_hint per-row invariant: recomputed text == stored text per url."""
    pages, _ = corpus
    for r in pages.select("url", "html", "text").limit(50).collect():
        assert extract_text(bytes(r["html"]).decode("utf-8")) == r["text"], r["url"]


def test_corpus_is_deterministic(spark, corpus):
    pages, _ = corpus
    again = synth_pages(spark, N_PAGES, seed=42)
    a = {r["url"]: r["text"] for r in pages.select("url", "text").collect()}
    b = {r["url"]: r["text"] for r in again.select("url", "text").collect()}
    assert a == b


def test_index_stats_match_oracle(oracle_index, spark_index):
    assert spark_index.n_docs == oracle_index.n_docs
    assert spark_index.avgdl == pytest.approx(oracle_index.avgdl, rel=1e-12)
    spark_df = {r["term"]: r["df"] for r in spark_index.term_stats.collect()}
    oracle_df = {t: oracle_index.df(t) for t in oracle_index.postings}
    assert spark_df == oracle_df


@pytest.mark.parametrize("scorer", ["tfidf_compat", "bm25"])
def test_rank_identity(spark, oracle_index, spark_index, scorer):
    qt = queries_to_terms(spark, QUERIES)
    fn = score_tfidf_compat if scorer == "tfidf_compat" else score_bm25
    got = fn(spark_index, qt, k=10).collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))

    ofn = orc.search_tfidf_compat if scorer == "tfidf_compat" else orc.search_bm25
    for qid, q in enumerate(QUERIES):
        expected = ofn(oracle_index, q, k=10)
        actual = by_q.get(qid, [])
        assert [d for d, _ in actual] == [d for d, _ in expected], (
            f"rank mismatch for query {q!r}: {actual} vs {expected}"
        )
        for (_, sa), (_, se) in zip(actual, expected):
            assert sa == pytest.approx(se, rel=1e-6), f"score mismatch for {q!r}"
