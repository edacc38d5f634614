"""Bigram-LM quality gate (operators/lm.py), DSIR selection
(pipelines.dsir_*), and index deletion (index_build.delete_docs)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.lm import (
    bigram_counts,
    doc_bigram_logprob,
    perplexity_gate,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b a b a b", "en", "tgt"),
        (2, "a b a b c d", "en", "tgt"),
        (3, "q w e r t y", "en", "raw"),
        (4, "a b", "en", "raw"),
        (5, "z", "en", "raw"),  # single token: no bigrams
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).cache()


def test_bigram_counts(docs):
    pc, cc, v = bigram_counts(docs)
    pairs = {(r["w1"], r["w2"]): r["n"] for r in pc.collect()}
    # "a b" appears 3x in doc1, 2x in doc2, 1x in doc4
    assert pairs[("a", "b")] == 6
    assert pairs[("b", "a")] == 3  # doc1 x2, doc2 x1
    ctx = {r["w1"]: r["n1"] for r in cc.collect()}
    assert ctx["a"] == 6
    assert v == 11  # a b c d q w e r t y z


def test_doc_logprob_math_and_absent_singletons(docs):
    out = {r["doc_id"]: r for r in doc_bigram_logprob(docs, 0.5).collect()}
    assert 5 not in out  # no bigrams -> absent
    assert out[1]["n_bigrams"] == 5
    # hand-computed: C(a)=6 (always followed by b), C(b)=4 (3x ->a, 1x ->c)
    # p(b|a)=(6+.5)/(6+.5*11), p(a|b)=(3+.5)/(4+.5*11)
    pba = 6.5 / 11.5
    pab = 3.5 / 9.5
    expect = (3 * math.log(pba) + 2 * math.log(pab)) / 5
    assert out[1]["avg_logprob"] == pytest.approx(expect, abs=1e-6)
    # the repetitive doc is more predictable than the all-hapax doc
    assert out[1]["avg_logprob"] > out[3]["avg_logprob"]


def test_perplexity_gate_keeps_fluent_head(docs):
    kept = {r["doc_id"] for r in perplexity_gate(docs).collect()}
    # doc 3 (all unseen-once bigrams) is the perplexity tail; doc 1 the head
    assert 1 in kept
    assert 3 not in kept
    assert 5 not in kept  # no score -> not kept (CCNet's too-short bucket)


def test_dsir_prefers_target_looking_docs(spark):
    from search_engine_spark.operators.pipelines import dsir_topk, dsir_weights

    rows = (
        # target slice: vocabulary {alpha beta}
        [(i, "alpha beta alpha beta", "en", "tgt") for i in range(10)]
        # raw slice: mostly {x y}, two "target-looking" impostors
        + [(100 + i, "x y x y x y", "en", "raw") for i in range(10)]
        + [(200, "alpha beta alpha", "en", "raw"),
           (201, "beta alpha beta", "en", "raw")]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    w = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(docs, ["tgt"], n_buckets=64).collect()
    }
    # target-vocab docs (wherever they live) outweigh raw-vocab docs
    assert w[200] > w[100]
    assert w[0] > w[100]
    # selection surfaces the impostors among the top picks
    top = {r["doc_id"] for r in dsir_topk(docs, ["tgt"], k=12, n_buckets=64).collect()}
    assert {200, 201} <= top
    assert 100 not in top


def test_dsir_requires_targets(spark, docs):
    from search_engine_spark.operators.pipelines import dsir_weights

    with pytest.raises(ValueError, match="target_sources"):
        dsir_weights(docs, [])


def test_delete_docs_equals_rebuild(spark):
    """delete_docs(build(docs), ids) must equal build(docs \\ ids) in
    every relation — df/idf/N/avgdl/tf_norm all shift on deletion."""
    from search_engine_spark.operators.index_build import build_index, delete_docs
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    gone = docs.select("doc_id").filter(F.col("doc_id") % 7 == 0)
    pruned = delete_docs(build_index(docs, tokenizer=ws_tokens), gone)
    fresh = build_index(
        docs.join(gone, "doc_id", "left_anti"), tokenizer=ws_tokens
    )
    assert pruned.n_docs == fresh.n_docs
    assert pruned.avgdl == pytest.approx(fresh.avgdl, rel=1e-12)
    for a, b, keys in (
        (pruned.term_stats, fresh.term_stats, ["term"]),
        (pruned.doc_stats, fresh.doc_stats, ["doc_id"]),
        (pruned.postings, fresh.postings, ["term", "doc_id"]),
    ):
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb, keys


def test_dsir_sample_is_deterministic_and_tau_sensitive(spark):
    from search_engine_spark.operators.pipelines import dsir_sample, dsir_topk

    # distinct mixes of target/raw vocab -> distinct weights, so the
    # tau->0 comparison is not decided by tie-breaks
    rows = (
        [(i, "alpha beta " * (i + 1) + "x y " * (20 - i), "en", "tgt")
         for i in range(20)]
        + [(100 + i, "x y " * (i + 1) + "alpha " * (i % 3), "en", "raw")
           for i in range(20)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    a = [tuple(r) for r in dsir_sample(docs, ["tgt"], k=10, n_buckets=64).collect()]
    b = [tuple(r) for r in dsir_sample(docs, ["tgt"], k=10, n_buckets=64).collect()]
    assert a == b  # pure function of the data
    # tau -> 0 approaches the noiseless top-k selection
    sharp = {
        r["doc_id"]
        for r in dsir_sample(docs, ["tgt"], k=10, tau=1e-9, n_buckets=64).collect()
    }
    noiseless = {
        r["doc_id"] for r in dsir_topk(docs, ["tgt"], k=10, n_buckets=64).collect()
    }
    assert sharp == noiseless
    with pytest.raises(ValueError, match="tau"):
        dsir_sample(docs, ["tgt"], tau=0.0)
