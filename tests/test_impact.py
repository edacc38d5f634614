"""Impact-quantized postings (operators/impact.py): bounds, degenerate
ranges, and rank fidelity vs exact BM25. Oracle value parity runs in
test_entry_oracle.py.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.impact import quantize_impacts, quantized_search
from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.query import score_bm25
from search_engine_spark.operators.text_analytics import ws_tokens

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    return build_index(docs, tokenizer=ws_tokens).cache()


def test_q_stays_in_bit_range_and_covers_extremes(index):
    qidx = quantize_impacts(index, bits=8)
    row = qidx.postings.agg(
        F.min("q").alias("mn"), F.max("q").alias("mx")
    ).first()
    # zero-anchored grid: the max impact lands exactly in the top
    # bucket; the min is wherever min_impact/step falls (>= 0)
    assert row["mn"] >= 0 and row["mx"] == 255
    assert qidx.step > 0
    assert qidx.lo == 0.0


def test_quantization_is_monotone_in_impact(spark):
    # two docs, same term, different tf -> higher impact gets >= q
    docs = spark.createDataFrame(
        [(1, "x x x x y"), (2, "x y y y y")], "doc_id long, text string"
    )
    idx = build_index(docs, tokenizer=ws_tokens)
    qidx = quantize_impacts(idx, bits=4)
    q = {
        (r["term"], r["doc_id"]): r["q"] for r in qidx.postings.collect()
    }
    assert q[("x", 1)] >= q[("x", 2)]
    assert q[("y", 2)] >= q[("y", 1)]
    assert all(0 <= v <= 15 for v in q.values())


def test_degenerate_uniform_corpus_maps_to_top_bucket(spark):
    # every impact equal: with the zero-anchored grid they all land in
    # the TOP bucket (impact == hi), and ranks are trivially preserved
    docs = spark.createDataFrame(
        [(1, "same"), (2, "same")], "doc_id long, text string"
    )
    qidx = quantize_impacts(build_index(docs, tokenizer=ws_tokens))
    assert qidx.step > 0.0
    assert {r["q"] for r in qidx.postings.collect()} == {255}


def test_empty_postings_yield_empty_index_not_typeerror(spark):
    docs = spark.createDataFrame([], "doc_id long, text string")
    qidx = quantize_impacts(build_index(docs, tokenizer=ws_tokens))
    assert qidx.step == 0.0 and qidx.lo == 0.0
    assert qidx.postings.count() == 0


def test_integer_rank_order_equals_dequantized_score_order(spark, index):
    # the ADVICE defect: with a min-anchored grid, ranking by sum_q
    # dropped the n_matched*lo term — a doc matching fewer terms could
    # outrank a doc with the higher dequantized score. Zero-anchored,
    # score is a positive multiple of sum_q, so the orders must agree.
    qidx = quantize_impacts(index, bits=8)
    rows = quantized_search(
        qidx, spark, ["spark", "merge", "batch"], k=50
    ).collect()
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # score is rounded to 6dp in quantized_search
        assert abs(r["score"] - r["sum_q"] * qidx.step) <= 5e-7


def test_rank_fidelity_vs_exact_bm25(spark, index):
    terms = ["spark", "merge", "batch"]
    qidx = quantize_impacts(index, bits=8)
    approx = [
        r["doc_id"] for r in quantized_search(qidx, spark, terms, k=10).collect()
    ]
    qt = spark.createDataFrame(
        [(0, t) for t in terms], "query_id int, term string"
    )
    exact = [
        r["doc_id"] for r in score_bm25(index, qt, k=10, terms=terms).collect()
    ]
    # 8-bit quantization: top-10 overlap must be near-total on a real
    # corpus (step/2 error per term can only swap near-ties)
    assert len(set(approx) & set(exact)) >= 8
    # dequantized score is within n_terms * step of the exact score
    sq = {r["doc_id"]: r["score"] for r in
          quantized_search(qidx, spark, terms, k=10).collect()}
    ex = {r["doc_id"]: r["score"] for r in
          score_bm25(index, qt, k=10, terms=terms).collect()}
    for d in set(sq) & set(ex):
        assert abs(sq[d] - ex[d]) <= len(terms) * qidx.step + 1e-9
