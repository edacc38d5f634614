"""TextRank keyword extraction (operators/keywords.py): algebraic
invariants the DuckDB oracle comparison (tests/test_entry_oracle.py,
entry `textrank_keywords`) can't express — hand-checked small graphs,
per-doc isolation, convergence floor for isolated terms, and the
paper's score ordering on an obvious hub term.
"""

from __future__ import annotations

import pytest

from search_engine_spark.operators.keywords import (
    cooccurrence_edges,
    textrank_keywords,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # doc 0: 'b' is the hub (co-occurs with everything, twice each)
        (0, "a b c b a b c d"),
        # doc 1: a two-token cycle — symmetric, scores must be equal
        (1, "x y x y x y"),
        # doc 2: a single repeated token — no edges (self-loops excluded)
        (2, "solo solo solo"),
        # doc 3: shares terms with doc 0 — must NOT leak across docs
        (3, "a d a d"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_edges_symmetric_weighted(docs):
    e = {
        (r["doc_id"], r["src"], r["dst"]): r["w"]
        for r in cooccurrence_edges(docs, window=2).collect()
    }
    # symmetry: every (doc, u, v) has the mirror with equal weight
    for (d, s, t), w in e.items():
        assert e[(d, t, s)] == w
    # doc 1 "x y x y x y" window=2: adjacent x-y pairs at distance 1
    # (5 of them); distance-2 pairs are x-x / y-y, excluded as self-pairs
    assert e[(1, "x", "y")] == 5
    # doc 2 has no edges at all
    assert not any(d == 2 for (d, _, _) in e)


def test_symmetric_doc_equal_scores(spark, docs):
    out = textrank_keywords(docs, k=5, window=2, iters=4).collect()
    d1 = {r["term"]: r["score"] for r in out if r["doc_id"] == 1}
    assert d1["x"] == d1["y"]


def test_hub_term_wins(docs):
    out = textrank_keywords(docs, k=1, window=2, iters=5).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    assert top[0] == "b"


def test_isolated_terms_keep_floor(docs):
    out = textrank_keywords(docs, k=3, window=2, iters=5).collect()
    d2 = [r for r in out if r["doc_id"] == 2]
    # single node, no edges: WS = (1-d) + d*0 after the first round
    assert len(d2) == 1 and d2[0]["score"] == pytest.approx(0.15, abs=1e-6)


def test_no_cross_doc_leakage(spark, docs):
    """Scores for doc 3 must equal running doc 3 alone — the joint
    iteration is keyed by (doc_id, term) and never mixes documents."""
    joint = {
        (r["doc_id"], r["term"]): r["score"]
        for r in textrank_keywords(docs, k=10, window=2, iters=4).collect()
    }
    alone = {
        (r["doc_id"], r["term"]): r["score"]
        for r in textrank_keywords(
            docs.filter("doc_id = 3"), k=10, window=2, iters=4
        ).collect()
    }
    assert alone == {k: v for k, v in joint.items() if k[0] == 3}
