"""Boolean query language (operators/boolquery.py): parser precedence,
set semantics against brute-force membership, ranking of survivors.
Oracle value parity for the fixed gate query runs in
test_entry_oracle.py (`boolean_topk`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.boolquery import (
    Node,
    boolean_search,
    parse_boolean,
)
from search_engine_spark.operators.index_build import build_index

WS = lambda c: F.split(c, " ")


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple banana"),
            (2, "apple cherry"),
            (3, "banana cherry"),
            (4, "apple banana cherry"),
            (5, "durian"),
        ],
        "doc_id long, text string",
    )
    return build_index(docs, tokenizer=WS).cache()


def test_parser_precedence_and_parens():
    t = parse_boolean("a OR b AND c")
    assert t.op == "or" and t.kids[1].op == "and"  # AND binds tighter
    t2 = parse_boolean("(a OR b) AND c")
    assert t2.op == "and" and t2.kids[0].op == "or"
    t3 = parse_boolean("NOT a AND b")
    assert t3.op == "and" and t3.kids[0].op == "not"  # NOT binds tightest
    assert parse_boolean("apple") == Node("term", term="apple")


@pytest.mark.parametrize("bad", ["a AND", "(a OR b", "a b", "AND a", ""])
def test_parser_rejects_malformed(bad):
    with pytest.raises(ValueError):
        parse_boolean(bad)


@pytest.mark.parametrize(
    "q,want",
    [
        ("apple AND banana", {1, 4}),
        ("apple OR durian", {1, 2, 4, 5}),
        ("apple AND NOT cherry", {1}),
        ("(apple OR banana) AND cherry", {2, 3, 4}),
        ("NOT apple", {3, 5}),
        ("apple AND NOT apple", set()),
    ],
)
def test_boolean_membership(spark, index, q, want):
    got = {r["doc_id"] for r in boolean_search(index, spark, q, k=10).collect()}
    assert got == want


def test_ranking_uses_positive_terms_and_zero_for_pure_not(spark, index):
    out = boolean_search(index, spark, "apple OR banana", k=10).collect()
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    # both-term docs (1, 4) outrank the single-term docs (2, 3)
    assert {r["doc_id"] for r in out[:2]} == {1, 4}
    pure_not = boolean_search(index, spark, "NOT apple", k=10).collect()
    # doc 3 matches banana? no positive terms in the query → all 0.0
    assert {r["score"] for r in pure_not} == {0.0}
    assert [r["doc_id"] for r in pure_not] == [3, 5]  # doc_id ASC tie-break


# ---------------------------------------------------------------------------
# quoted phrases in the boolean language
# ---------------------------------------------------------------------------


def test_phrase_leaf_parses_and_constrains(spark):
    from search_engine_spark.operators.boolquery import (
        boolean_search,
        parse_boolean,
    )
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.phrase import positional_postings
    from search_engine_spark.operators.text_analytics import ws_tokens

    tree = parse_boolean('"new york" AND pizza')
    assert tree.op == "and"
    assert tree.kids[0].op == "phrase" and tree.kids[0].term == "new york"

    docs = spark.createDataFrame(
        [
            (1, "new york pizza shop"),
            (2, "york new pizza"),       # words present, phrase absent
            (3, "new york bagels"),      # phrase present, no pizza
        ],
        "doc_id long, text string",
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    pidx = positional_postings(docs, ws_tokens)
    out = boolean_search(
        idx, spark, '"new york" AND pizza', k=10, pos_index=pidx
    ).collect()
    assert [r["doc_id"] for r in out] == [1]


def test_quoted_single_word_is_a_plain_term(spark):
    from search_engine_spark.operators.boolquery import parse_boolean

    t = parse_boolean('"pizza" OR pasta')
    assert t.op == "or" and t.kids[0].op == "term"
    assert t.kids[0].term == "pizza"


def test_phrase_without_pos_index_raises(spark):
    from search_engine_spark.operators.boolquery import boolean_search
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.text_analytics import ws_tokens
    import pytest as _pt

    docs = spark.createDataFrame(
        [(1, "a b")], "doc_id long, text string"
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    with _pt.raises(ValueError, match="pos_index"):
        boolean_search(idx, spark, '"a b"', k=5).collect()


def test_unbalanced_quote_raises_not_silently_mislexes():
    # '"new york AND city' used to tokenize '"new' as a lone token and
    # strip the quote into the plain term 'new', silently dropping the
    # phrase intent
    with pytest.raises(ValueError, match="unbalanced quotes"):
        parse_boolean('"new york AND city')
    with pytest.raises(ValueError, match="unbalanced quotes"):
        parse_boolean('a AND b"')


def test_parens_inside_quotes_stay_phrase_characters():
    t = parse_boolean('"a (b)" AND c')
    assert t.op == "and"
    assert t.kids[0].op == "phrase" and t.kids[0].term == "a (b)"
    # and grouping parens outside quotes still work alongside a phrase
    t2 = parse_boolean('("new york" OR boston) AND city')
    assert t2.op == "and" and t2.kids[0].op == "or"
