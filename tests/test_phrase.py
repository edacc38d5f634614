"""Phrase + AND retrieval (operators/phrase.py, SURVEY §2.6 extension)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.phrase import (
    phrase_match,
    phrase_search,
    positional_postings,
)
from search_engine_spark.operators.text_analytics import ws_tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "red fish blue fish red fish"),
        (2, "blue fish red fish"),
        (3, "red red fish"),
        (4, "fish red"),
        (5, "red fish red fish red fish red fish"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_positional_postings(docs):
    idx = positional_postings(docs, ws_tokens)
    pos = {
        (r["doc_id"], r["term"]): r["positions"]
        for r in idx.filter(F.col("doc_id") == 1).collect()
    }
    assert pos[(1, "red")] == [0, 4]
    assert pos[(1, "fish")] == [1, 3, 5]
    assert pos[(1, "blue")] == [2]


def test_phrase_match_counts(docs):
    idx = positional_postings(docs, ws_tokens).cache()
    got = {r["doc_id"]: r["n_occurrences"]
           for r in phrase_match(idx, ["red", "fish"]).collect()}
    assert got == {1: 2, 2: 1, 3: 1, 5: 4}

    # 3-term phrase
    got3 = {r["doc_id"]: r["n_occurrences"]
            for r in phrase_match(idx, ["fish", "red", "fish"]).collect()}
    assert got3 == {1: 1, 2: 1, 5: 3}

    # overlapping self-phrase
    overlap = {r["doc_id"]: r["n_occurrences"]
               for r in phrase_match(idx, ["red", "red"]).collect()}
    assert overlap == {3: 1}


def test_phrase_search_ranks_by_count(docs):
    top = phrase_search(docs, ["red", "fish"], ws_tokens, k=3).collect()
    assert [(r["doc_id"], r["n_occurrences"]) for r in top] == [
        (5, 4), (1, 2), (2, 1)
    ]


def test_and_mode_engine(spark, docs):
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import score_bm25

    index = build_index(docs.select("doc_id", "text"), tokenizer=ws_tokens)
    qt = spark.createDataFrame(
        [(0, "red"), (0, "blue"), (1, "red"), (1, "fish")],
        "query_id int, term string",
    )
    or_hits = {
        (r["query_id"], r["doc_id"]) for r in score_bm25(index, qt, k=10).collect()
    }
    and_hits = {
        (r["query_id"], r["doc_id"])
        for r in score_bm25(index, qt, k=10, mode="and").collect()
    }
    # query 0 (red AND blue): only docs 1, 2 have both
    assert {d for q, d in and_hits if q == 0} == {1, 2}
    # query 1 (red AND fish): docs 1,2,3,4,5 all have both
    assert {d for q, d in and_hits if q == 1} == {1, 2, 3, 4, 5}
    assert and_hits <= or_hits


def test_proximity_boost_prefers_adjacent_terms(spark):
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.phrase import proximity_bm25
    from search_engine_spark.operators.text_analytics import ws_tokens

    # identical tf/dl for both docs → identical BM25; only proximity
    # separates them ("new york" adjacent vs separated by "pad")
    docs = spark.createDataFrame(
        [(0, "new york pad pad x"), (1, "new pad york pad x")],
        "doc_id long, text string",
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    qt = spark.createDataFrame(
        [(0, "new"), (0, "york")], "query_id int, term string"
    )
    out = {
        r["doc_id"]: r["score"]
        for r in proximity_bm25(
            idx, docs, qt, ws_tokens, k=10, terms=["new", "york"]
        ).collect()
    }
    assert out[0] > out[1]
    # boost magnitude: d=1 adds 1/2, d=2 adds 1/3 at lam=1
    assert abs((out[0] - out[1]) - (1 / 2 - 1 / 3)) < 1e-6


def test_proximity_boost_does_not_leak_across_queries(spark):
    """A pair of query 1's terms must not boost query 0's score for the
    same document (r3 review finding)."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.phrase import proximity_bm25
    from search_engine_spark.operators.text_analytics import ws_tokens

    # doc 0: 'machine learning' adjacent + a stray 'new'
    docs = spark.createDataFrame(
        [(0, "machine learning new x y"), (1, "new q q q york")],
        "doc_id long, text string",
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    all_terms = ["new", "york", "machine", "learning"]
    qt = spark.createDataFrame(
        [(0, "new"), (0, "york"), (1, "machine"), (1, "learning")],
        "query_id int, term string",
    )
    fused = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in proximity_bm25(
            idx, docs, qt, ws_tokens, k=10, terms=all_terms
        ).collect()
    }
    q0 = spark.createDataFrame(
        [(0, "new"), (0, "york")], "query_id int, term string"
    )
    solo = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in proximity_bm25(
            idx, docs, q0, ws_tokens, k=10, terms=["new", "york"]
        ).collect()
    }
    # query 0's scores are identical whether or not query 1 shares the batch
    assert {k: v for k, v in fused.items() if k[0] == 0} == solo


def test_materialized_index_serves_phrase_and_proximity(spark, docs, tmp_path):
    """Build/probe split parity: the materialized positional index must
    return byte-identical results to the inline (re-tokenize) path for
    both phrase_search and proximity_bm25."""
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.phrase import (
        proximity_bm25,
        read_positional_index,
        write_positional_index,
    )

    path = str(tmp_path / "posidx")
    write_positional_index(positional_postings(docs, ws_tokens), path)
    pidx = read_positional_index(spark, path)

    inline = phrase_search(docs, ["red", "fish"], ws_tokens, k=5).collect()
    served = phrase_search(None, ["red", "fish"], k=5, pos_index=pidx).collect()
    assert [tuple(r) for r in served] == [tuple(r) for r in inline]

    index = build_index(docs.select("doc_id", "text"), tokenizer=ws_tokens)
    qt = spark.createDataFrame(
        [(0, "red"), (0, "blue")], "query_id int, term string"
    )
    pin = proximity_bm25(
        index, docs, qt, ws_tokens, k=10, terms=["red", "blue"]
    ).collect()
    pse = proximity_bm25(
        index, None, qt, k=10, terms=["red", "blue"], pos_index=pidx
    ).collect()
    assert sorted(map(tuple, pse)) == sorted(map(tuple, pin))


def test_phrase_search_requires_an_index_source(docs):
    with pytest.raises(ValueError, match="pos_index"):
        phrase_search(None, ["red"], k=5)


def test_best_passage_picks_densest_window(spark):
    """Handcrafted corpus: the window covering more DISTINCT query
    terms wins over one with more raw matches; ties break to the
    earliest window; doc ranking puts fuller coverage first."""
    from search_engine_spark.operators.phrase import (
        best_passage,
        positional_postings,
    )
    from search_engine_spark.operators.text_analytics import ws_tokens

    filler = " ".join(["z"] * 16)
    rows = [
        # doc 0: window 0 has a+b (2 terms), window 1 has a a a (1 term)
        (0, "a b " + " ".join(["z"] * 14) + " a a a"),
        # doc 1: only 'a', twice, in window 0
        (1, "a a " + filler),
        # doc 2: a+b in window 1 only
        (2, filler + " a b"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    pidx = positional_postings(docs, ws_tokens)
    out = best_passage(pidx, ["a", "b"], passage_size=16, k=10).collect()
    got = {r["doc_id"]: (r["passage_start"], r["n_terms"], r["n_matches"]) for r in out}
    assert got[0] == (0, 2, 2)      # coverage beats the 3-match window
    assert got[1] == (0, 1, 2)
    assert got[2] == (16, 2, 2)
    # doc order: 2-term docs first (0 then 2 by doc_id), 1-term doc last
    assert [r["doc_id"] for r in out] == [0, 2, 1]


def test_passage_snippets_slice_exact_tokens(spark):
    from search_engine_spark.operators.phrase import (
        passage_snippets,
        positional_postings,
    )
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [(0, " ".join(f"w{i}" for i in range(40)) + " a b")],
        ["doc_id", "text"],
    )
    pidx = positional_postings(docs, ws_tokens)
    out = passage_snippets(docs, pidx, ["a", "b"], passage_size=16, k=5).collect()
    assert len(out) == 1
    r = out[0]
    # 'a b' sit at positions 40,41 → window 2 (tokens 32..41, only 10 left)
    assert r["passage_start"] == 32
    assert r["snippet"] == " ".join(f"w{i}" for i in range(32, 40)) + " a b"
    assert r["n_terms"] == 2 and r["n_matches"] == 2


# ---------------------------------------------------------------------------
# wildcard-slot (gap) phrases
# ---------------------------------------------------------------------------


def test_gap_phrase_matches_any_middle_token(spark):
    from search_engine_spark.operators.phrase import gap_phrase_search
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [
            (1, "big fat data here"),
            (2, "big slow data there"),
            (3, "big data direct"),
            (4, "data big gap big x data"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in gap_phrase_search(
            docs, ["big", None, "data"], tokenizer=ws_tokens
        ).collect()
    }
    # docs 1, 2 match with different middle tokens; doc 3 has no gap
    # token; doc 4 matches once via "big x data"
    assert out == {1: 1, 2: 1, 4: 1}


def test_gap_phrase_leading_gap_respects_doc_start(spark):
    from search_engine_spark.operators.phrase import gap_phrase_search
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [(1, "data first"), (2, "pre data second")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in gap_phrase_search(
            docs, [None, "data"], tokenizer=ws_tokens
        ).collect()
    }
    # doc 1 starts with 'data': no token can fill the leading gap
    assert out == {2: 1}


def test_gap_phrase_trailing_gap_respects_doc_end(spark):
    from search_engine_spark.operators.phrase import (
        gap_phrase_search,
        positional_postings,
    )
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [(1, "ends with data"), (2, "has data after")],
        "doc_id long, text string",
    )
    # without doc_lengths: pos_index fallback path
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in gap_phrase_search(
            docs, ["data", None], tokenizer=ws_tokens
        ).collect()
    }
    assert out == {2: 1}  # doc 1's 'data' is the last token
    # with doc_lengths: broadcast-join path, same answer
    dl = spark.createDataFrame([(1, 3), (2, 3)], "doc_id long, dl int")
    out2 = {
        r["doc_id"]: r["n_occurrences"]
        for r in gap_phrase_search(
            None, ["data", None],
            pos_index=positional_postings(docs, ws_tokens),
            doc_lengths=dl,
        ).collect()
    }
    assert out2 == out


def test_span_near_is_ordered_and_bounded_by_slop(spark):
    from search_engine_spark.operators.phrase import span_near_search
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.createDataFrame(
        [
            (1, "new york city"),          # gap 1: in
            (2, "new big apple york"),     # gap 3: in (slop 3)
            (3, "new a b c d york"),       # gap 5: out
            (4, "york comes before new"),  # wrong order: out
            (5, "new york and new x york"),  # two qualifying starts
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_spans"]
        for r in span_near_search(
            docs, "new", "york", slop=3, tokenizer=ws_tokens
        ).collect()
    }
    assert out == {1: 1, 2: 1, 5: 2}
