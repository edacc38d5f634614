"""Learning-to-rank (operators/ltr.py): feature values against the
serving scorers, GD training on a separable signal, deterministic
replay, re-rank ordering. Oracle value parity runs in
test_entry_oracle.py (`ltr_weights`/`ltr_scores`/`ltr_topk`)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators.index_build import build_index
from search_engine_spark.operators.ltr import ltr_features, ltr_rerank, ltr_train
from search_engine_spark.operators.query import score_bm25
from search_engine_spark.operators.text_analytics import ws_tokens

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    return build_index(docs, tokenizer=ws_tokens).cache()


@pytest.fixture(scope="module")
def qt(spark):
    return spark.createDataFrame(
        [(0, "spark"), (0, "merge"), (1, "batch")], "query_id int, term string"
    )


def test_ltr_features_match_serving_scorers(spark, index, qt):
    feats = ltr_features(index, qt, terms=["spark", "merge", "batch"])
    rows = {(r["query_id"], r["doc_id"]): r for r in feats.collect()}
    # f_bm25 equals the BM25 serving score on the same grid
    bm = score_bm25(
        index, qt, k=10_000, terms=["spark", "merge", "batch"]
    ).collect()
    for r in bm:
        key = (r["query_id"], r["doc_id"])
        assert rows[key]["f_bm25"] == round(r["score"], 6)
    # structural invariants
    for (qid, _), r in rows.items():
        n_q = 2 if qid == 0 else 1
        assert 0 < r["f_match"] <= 1.0
        assert r["f_match"] * n_q == int(r["f_match"] * n_q)  # k/n_q grid
        assert r["f_tf"] >= 1.0
        assert r["f_idf"] > 0.0
        assert r["f_dl"] >= r["f_tf"] / n_q  # dl counts all terms


def test_ltr_train_learns_separable_signal(spark, index, qt):
    feats = ltr_features(index, qt, terms=["spark", "merge", "batch"])
    # oracle-world labels: docs whose BM25 is top-decile are 'relevant'
    w10 = feats.select("query_id", "doc_id", "f_bm25")
    cut = w10.approxQuantile("f_bm25", [0.9], 0.0)[0]
    qrels = w10.filter(F.col("f_bm25") >= cut).select(
        "query_id", "doc_id", F.lit(1).alias("rel")
    )
    w, scores = ltr_train(feats, qrels, iters=10, lr=1.0)
    assert len(w) == 6
    means = (
        scores.groupBy("y").agg(F.avg("s").alias("m")).collect()
    )
    by_y = {r["y"]: r["m"] for r in means}
    assert by_y[1] > by_y[0]  # positives score higher after training


def test_ltr_train_is_deterministic(spark, index, qt):
    feats = ltr_features(index, qt, terms=["spark", "merge", "batch"])
    qrels = spark.createDataFrame(
        [(0, 1, 1), (1, 2, 1)], "query_id int, doc_id long, rel int"
    )
    w1, _ = ltr_train(feats, qrels, iters=5)
    w2, _ = ltr_train(feats, qrels, iters=5)
    assert w1 == w2


def test_ltr_rerank_orders_by_learned_score(spark):
    scores = spark.createDataFrame(
        [(0, 1, 0.9, 1), (0, 2, 0.9, 0), (0, 3, 0.1, 0), (1, 7, 0.5, 1)],
        "query_id int, doc_id long, s double, y int",
    )
    out = ltr_rerank(scores, k=2).collect()
    assert [(r["query_id"], r["doc_id"]) for r in out] == [
        (0, 1),  # tie with doc 2 broken doc_id ASC
        (0, 2),
        (1, 7),
    ]
    assert out[0]["score"] == 0.9


def test_hard_negatives_excludes_positives_and_keeps_rank(spark, index, qt):
    from search_engine_spark.operators.ltr import hard_negatives

    terms = ["spark", "merge", "batch"]
    # positives: every 5th doc, per query
    qrels = (
        spark.range(0, 2000, 5)
        .select(F.col("id").alias("doc_id"))
        .crossJoin(spark.createDataFrame([(0,), (1,)], "query_id int"))
        .select("query_id", "doc_id")
    )
    out = hard_negatives(index, qt, qrels, k=20, n_neg=5, terms=terms)
    rows = out.collect()
    # no positives survive, at most n_neg per query
    assert all(r["doc_id"] % 5 != 0 for r in rows)
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) <= 5
        # ranks are the ORIGINAL serving ranks (gaps where positives
        # were removed), strictly increasing and bounded by k
        ranks = [r["rank"] for r in rs]
        assert ranks == sorted(ranks) and ranks[-1] <= 20
        assert len(set(ranks)) == len(ranks)
    # each kept rank matches the doc's true BM25 serving rank
    bm = score_bm25(index, qt, k=20, terms=terms).collect()
    true_rank = {}
    seen = {}
    for r in bm:  # topk output is ordered per query
        n = seen.get(r["query_id"], 0) + 1
        seen[r["query_id"]] = n
        true_rank[(r["query_id"], r["doc_id"])] = n
    for r in rows:
        assert true_rank[(r["query_id"], r["doc_id"])] == r["rank"]


def test_index_stats_one_row_summary(spark, index):
    from search_engine_spark.operators.index_build import index_stats

    row = index_stats(index).collect()
    assert len(row) == 1
    r = row[0]
    assert r["n_docs"] == index.n_docs
    assert r["vocab_size"] == index.term_stats.count()
    assert r["n_postings"] == index.postings.count()
    assert r["total_tokens"] == (
        index.postings.agg(F.sum("tf")).first()[0]
    )
    assert r["avgdl"] == round(index.avgdl, 6)
