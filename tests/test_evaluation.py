"""Retrieval evaluation metrics (operators/evaluation.py): hand-built
runs/qrels with exactly computed TREC-convention values; oracle value
parity at sf0.01 runs in test_entry_oracle.py."""

from __future__ import annotations

import math

import pytest

from search_engine_spark.operators.evaluation import (
    ann_recall,
    eval_summary,
    rank_eval,
)


def _run(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, score double")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long, rel int")


def test_rank_eval_hand_computed_graded_query(spark):
    run = _run(spark, [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0)])
    # doc 9 is relevant but never retrieved; doc 2 judged non-relevant
    qrels = _qrels(spark, [(0, 1, 2), (0, 2, 0), (0, 3, 1), (0, 9, 1)])
    [m] = rank_eval(run, qrels, k=3).collect()
    assert m["precision_k"] == round(2 / 3, 6)
    assert m["recall_k"] == round(2 / 3, 6)  # R = 3 (doc 2's rel=0 ignored)
    assert m["rr"] == 1.0
    # hits_at: rank1→1, rank3→2 ⇒ AP = (1/1 + 2/3) / 3
    assert m["ap"] == round((1.0 + 2 / 3) / 3, 6)
    dcg = (2**2 - 1) / math.log2(2) + (2**1 - 1) / math.log2(4)
    idcg = 3 / math.log2(2) + 1 / math.log2(3) + 1 / math.log2(4)
    assert m["ndcg_k"] == round(dcg / idcg, 6)


def test_rank_eval_no_positive_judgments_is_all_zero(spark):
    run = _run(spark, [(1, 5, 2.0), (1, 6, 1.0)])
    qrels = _qrels(spark, [(1, 5, 0)])  # judged, but nothing relevant
    [m] = rank_eval(run, qrels, k=10).collect()
    assert (m["precision_k"], m["recall_k"], m["rr"], m["ap"], m["ndcg_k"]) == (
        0.0, 0.0, 0.0, 0.0, 0.0,
    )


def test_rank_eval_perfect_ranking_scores_one(spark):
    # run serves exactly the relevant docs in grade order
    run = _run(spark, [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0)])
    qrels = _qrels(spark, [(0, 1, 3), (0, 2, 2), (0, 3, 1)])
    [m] = rank_eval(run, qrels, k=3).collect()
    assert m["precision_k"] == 1.0
    assert m["recall_k"] == 1.0
    assert m["rr"] == 1.0
    assert m["ap"] == 1.0
    assert m["ndcg_k"] == 1.0


def test_rank_eval_cutoff_and_tie_break_match_serving_order(spark):
    # equal scores: Q7 tie-break doc_id ASC decides what k=1 keeps
    run = _run(spark, [(0, 7, 1.0), (0, 2, 1.0)])
    qrels = _qrels(spark, [(0, 7, 1)])
    [m] = rank_eval(run, qrels, k=1).collect()
    assert m["precision_k"] == 0.0  # doc 2 wins rank 1, judged nothing
    assert m["rr"] == 0.0


def test_eval_summary_macro_averages(spark):
    run = _run(
        spark,
        [(0, 1, 2.0), (0, 2, 1.0), (1, 1, 2.0), (1, 2, 1.0)],
    )
    qrels = _qrels(spark, [(0, 1, 1), (0, 2, 1), (1, 2, 1)])
    [s] = eval_summary(rank_eval(run, qrels, k=2)).collect()
    assert s["n_queries"] == 2
    # q0: P=1, RR=1, AP=1; q1: P=1/2, RR=1/2, AP=1/2
    assert s["p_at_k"] == round((1.0 + 0.5) / 2, 6)
    assert s["mrr"] == round((1.0 + 0.5) / 2, 6)
    assert s["map"] == round((1.0 + 0.5) / 2, 6)
    assert s["ndcg"] == round((1.0 + math.log2(2) / math.log2(3)) / 2, 6)


def test_ann_recall_overlap_and_short_reference(spark):
    exact = _run(spark, [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0)])
    approx = _run(spark, [(0, 1, 9.0), (0, 3, 8.0), (0, 99, 7.0)])
    [r] = ann_recall(approx, exact, k=3).collect()
    assert r["recall"] == round(2 / 3, 6)
    # reference shorter than k: denominator is its true size → 1.0
    exact1 = _run(spark, [(1, 4, 1.0)])
    approx1 = _run(spark, [(1, 4, 5.0), (1, 5, 4.0)])
    [r1] = ann_recall(approx1, exact1, k=10).collect()
    assert r1["recall"] == 1.0


def test_ann_recall_zero_overlap_query_is_reported(spark):
    exact = _run(spark, [(0, 1, 2.0), (0, 2, 1.0)])
    approx = _run(spark, [(0, 8, 2.0), (0, 9, 1.0)])
    [r] = ann_recall(approx, exact, k=2).collect()
    assert r["recall"] == 0.0


def _per(spark, rows):
    return spark.createDataFrame(rows, "query_id int, ndcg_k double")


def test_paired_delta_hand_computed_t(spark):
    from search_engine_spark.operators.evaluation import paired_delta

    a = _per(spark, [(0, 0.9), (1, 0.8), (2, 0.7)])
    b = _per(spark, [(0, 0.6), (1, 0.7), (2, 0.5)])
    [r] = paired_delta(a, b, metric="ndcg_k").collect()
    d = [0.3, 0.1, 0.2]
    n = 3
    md = sum(d) / n
    sd = (sum((x - md) ** 2 for x in d) / (n - 1)) ** 0.5
    t = md / (sd / n**0.5)
    assert r["n_queries"] == 3
    assert r["mean_a"] == round(sum([0.9, 0.8, 0.7]) / 3, 6)
    assert r["mean_delta"] == round(md, 6)
    assert r["t_stat"] == pytest.approx(round(t, 6), abs=2e-6)


def test_paired_delta_zero_variance_and_identical_runs(spark):
    from search_engine_spark.operators.evaluation import paired_delta

    a = _per(spark, [(0, 0.5), (1, 0.7)])
    # constant shift: sd = 0 → t defined as 0 (degenerate)
    b = _per(spark, [(0, 0.4), (1, 0.6)])
    [r] = paired_delta(a, b).collect()
    assert r["mean_delta"] == 0.1 and r["t_stat"] == 0.0
    [r2] = paired_delta(a, a).collect()
    assert r2["mean_delta"] == 0.0 and r2["t_stat"] == 0.0


# ---------------------------------------------------------------------------
# balanced interleaving and RBO
# ---------------------------------------------------------------------------


def test_interleave_alternates_disjoint_lists(spark):
    from search_engine_spark.operators.evaluation import interleave_balanced

    a = _run(spark, [(0, 1, 3.0), (0, 2, 2.0), (0, 3, 1.0)])
    b = _run(spark, [(0, 11, 3.0), (0, 12, 2.0), (0, 13, 1.0)])
    out = interleave_balanced(a, b, k=3, k_out=6).collect()
    assert [(r["doc_id"], r["team"]) for r in out] == [
        (1, "A"), (11, "B"), (2, "A"), (12, "B"), (3, "A"), (13, "B")
    ]


def test_interleave_identical_lists_credits_a(spark):
    from search_engine_spark.operators.evaluation import interleave_balanced

    a = _run(spark, [(0, 1, 3.0), (0, 2, 2.0)])
    out = interleave_balanced(a, a, k=2, k_out=10).collect()
    assert [(r["doc_id"], r["ipos"], r["team"]) for r in out] == [
        (1, 1, "A"), (2, 2, "A")
    ]


def test_interleave_union_prefix_property(spark):
    from search_engine_spark.operators.evaluation import interleave_balanced

    a = _run(spark, [(0, 1, 9.0), (0, 2, 8.0), (0, 3, 7.0), (0, 4, 6.0)])
    b = _run(spark, [(0, 3, 9.0), (0, 1, 8.0), (0, 5, 7.0), (0, 6, 6.0)])
    out = interleave_balanced(a, b, k=4, k_out=10).collect()
    got = [r["doc_id"] for r in out]
    # after the prefix absorbing rank-j of both lists, the set equals
    # top-j(A) U top-j(B) for every j
    ta, tb = [1, 2, 3, 4], [3, 1, 5, 6]
    for j in range(1, 5):
        expect = set(ta[:j]) | set(tb[:j])
        assert set(got[: len(expect)]) == expect


def test_rbo_identical_and_disjoint_runs(spark):
    from search_engine_spark.operators.evaluation import rbo_depths

    a = _run(spark, [(0, d, 10.0 - d) for d in range(1, 6)])
    same = rbo_depths(a, a, depth=5, p=0.9).collect()
    for r in same:
        assert r["overlap"] == r["d"]
        assert r["contrib"] == pytest.approx(
            0.1 * 0.9 ** (r["d"] - 1), abs=1e-6
        )
    b = _run(spark, [(0, 100 + d, 10.0 - d) for d in range(1, 6)])
    gone = rbo_depths(a, b, depth=5, p=0.9).collect()
    assert all(r["overlap"] == 0 and r["contrib"] == 0.0 for r in gone)
