"""Hypothesis-generated rank identity (SURVEY §5.3 #3): on ARBITRARY
small corpora and queries, the Spark engine's top-k (both scorers) must
be rank- and score-identical to the single-node oracle.

Spark round-trips are expensive, so examples are few but adversarial:
the vocabulary mixes plain words, stop words from both lists,
diacritics, digit-bearing tokens (dropped by the tokenizer), and
punctuation-only tokens (the ""-term, quirk Q8).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oracle import oracle as orc
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import queries_to_terms, score_bm25, score_tfidf_compat

VOCAB = [
    "zebra", "quill", "maple", "onyx", "fjord", "crisp",
    "the", "of", "we",            # ISO+NLTK stop words
    "café", "naïve",              # diacritics
    "123", "a1b2",                # digit-bearing → dropped
    "...", "?!",                  # punctuation-only → "" term
]

corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=12),
    min_size=2,
    max_size=12,
)
query_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=4).map(" ".join)


@pytest.fixture(scope="module")
def sparkref(spark):
    return spark


@given(corpus=corpus_st, query=query_st)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_rank_identity_on_generated_corpora(sparkref, corpus, query):
    spark = sparkref
    rows = [(i + 1, " ".join(words)) for i, words in enumerate(corpus)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    index = build_index(docs)
    oracle = orc.build_index(rows, html=False)

    qt = queries_to_terms(spark, [query])
    for scorer, sfn, ofn in [
        ("bm25", score_bm25, orc.search_bm25),
        ("tfidf_compat", score_tfidf_compat, orc.search_tfidf_compat),
    ]:
        got = [(r["doc_id"], r["score"]) for r in sfn(index, qt, k=10).collect()]
        exp = ofn(oracle, query, k=10)
        assert [d for d, _ in got] == [d for d, _ in exp], (
            f"{scorer} rank mismatch on corpus={rows} query={query!r}"
        )
        for (_, a), (_, b) in zip(got, exp):
            assert a == pytest.approx(b, rel=1e-6, abs=1e-9)
