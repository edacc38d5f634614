"""Block index: codec round-trip properties + the WAND-style exactness
property (SURVEY §5.3 #4/#5): block-max pruned top-k must equal the
exhaustive scorer's top-k on every (corpus, query) pair.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.blocks import (
    block_search,
    build_block_index,
    write_block_index,
)
from search_engine_spark.operators.compression import (
    decode_block,
    encode_block,
    varbyte_decode,
    varbyte_encode,
)
from search_engine_spark.operators.index_build import build_index, prepare_docs
from search_engine_spark.operators.query import search
from search_engine_spark.sources.corpus import synth_pages

QUERIES = [
    "hippopotamus",
    "hippopotamus ladder",
    "ladder pipe seagull",
    "castle meadow tundra glacier harbor lantern",
    "the hippopotamus is on a ladder",
    "nosuchterm",
]


class TestCodec:
    @given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=400))
    @settings(max_examples=200, deadline=None)
    def test_varbyte_roundtrip(self, vals):
        arr = np.array(vals, dtype=np.uint64)
        assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)

    @given(
        st.sets(
            st.integers(min_value=-(2**62), max_value=2**62), min_size=0, max_size=300
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_block_roundtrip(self, docs):
        d = np.array(sorted(docs), dtype=np.int64)
        t = (np.arange(len(d)) % 37 + 1).astype(np.int64)
        db, tb = encode_block(d, t)
        d2, t2 = decode_block(db, tb)
        assert np.array_equal(d2, d) and np.array_equal(t2, t)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    docs = prepare_docs(synth_pages(spark, 300, seed=11), id_method="hash")
    index = build_index(docs).cache()
    blocks = build_block_index(index, num_buckets=8, block_size=16)
    path = str(tmp_path_factory.mktemp("blockidx"))
    write_block_index(blocks, path)
    return index, spark.read.parquet(path)


@pytest.mark.parametrize("prune", [False, True])
def test_block_search_equals_exhaustive(spark, built, prune):
    index, blocks = built
    exhaustive = search(index, spark, QUERIES, k=10, scorer="bm25").collect()
    blocked = block_search(blocks, spark, dict(enumerate(QUERIES)), k=10, prune=prune).collect()
    exp = [(r["query_id"], r["doc_id"]) for r in exhaustive]
    got = [(r["query_id"], r["doc_id"]) for r in blocked]
    assert got == exp
    for a, b in zip(blocked, exhaustive):
        # block path stores f32 per-posting scores; exhaustive is f64
        assert a["score"] == pytest.approx(b["score"], rel=1e-5)


def test_block_search_small_k(spark, built):
    index, blocks = built
    exhaustive = search(index, spark, ["hippopotamus ladder"], k=3, scorer="bm25").collect()
    blocked = block_search(blocks, spark, ["hippopotamus ladder"], k=3).collect()
    assert [(r["query_id"], r["doc_id"]) for r in blocked] == [
        (r["query_id"], r["doc_id"]) for r in exhaustive
    ]


def test_block_search_dedups_duplicate_query_terms(spark, built):
    """A repeated query term must contribute once (ANY-filter semantics) —
    block path must agree with the deduping row path."""
    index, blocks = built
    single = block_search(blocks, spark, ["hippopotamus"], k=10).collect()
    doubled = block_search(blocks, spark, ["hippopotamus hippopotamus"], k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in doubled] == [
        (r["doc_id"], r["score"]) for r in single
    ]


def test_prior_blocks_equal_row_path_fused(spark):
    """Static-prior block search must equal the row-path additive fusion
    BM25 + w·prior exactly — including under TA pruning (the bound adds
    the exact prior, so pruning can never flip the fused order)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.blocks import block_search, build_block_index
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import _matched, topk
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    index = build_index(docs, tokenizer=ws_tokens)
    prior = docs.select(
        "doc_id", ((F.col("doc_id") % 7).cast("double") / 7.0).alias("prior")
    )
    blocks = build_block_index(
        index, num_buckets=4, score_dtype="float64", prior=prior
    ).persist()

    terms = ["spark", "merge", "batch"]
    qt = spark.createDataFrame(
        [(0, t) for t in terms], "query_id int, term string"
    )
    w = 0.5
    m = _matched(index, qt, terms)
    row_scored = (
        m.groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("bm25_idf") * F.col("tf_norm")).alias("bm"))
        .join(prior, "doc_id")
        .select(
            "query_id",
            "doc_id",
            (F.col("bm") + F.lit(w) * F.col("prior")).alias("score"),
        )
    )
    expect = [
        (r["doc_id"], round(r["score"], 9))
        for r in topk(row_scored, 10).collect()
    ]
    for prune in (False, True):
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in block_search(
                blocks, spark, [" ".join(terms)], k=10, prune=prune,
                prior_weight=w,
            ).collect()
        ]
        assert got == expect, (prune, got[:3], expect[:3])
    blocks.unpersist()


def test_bm25f_blocks_equal_row_path(spark):
    """Block-max pruned BM25F must equal query.score_bm25f's row path
    for every query — the stored per-posting contribution idf·x/(k1+x)
    is additive and non-negative, so per-block maxima are valid upper
    bounds and the TA pruning stays exact."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators import graph as g
    from search_engine_spark.operators.blocks import build_block_index_bm25f
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import score_bm25f
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    n = docs.count()
    # deterministic synthetic link graph (same trick as entry _graph)
    edges = docs.select(
        F.col("doc_id").alias("src"),
        ((F.col("doc_id") * 17 + 3) % n).alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    index = build_index(docs, tokenizer=ws_tokens)
    anchors = g.anchor_postings(docs, edges)
    blocks = build_block_index_bm25f(
        index, anchors, num_buckets=4, score_dtype="float64"
    ).persist()

    from search_engine_spark.functions.textproc import tokenize_query

    for query in ["spark merge batch", "the data", "nosuchterm"]:
        # same query-side tokenization block_search applies (stop words
        # dropped), so both paths score the same term set
        terms = list(dict.fromkeys(tokenize_query(query))) or ["nosuchterm"]
        qt = spark.createDataFrame(
            [(0, t) for t in terms], "query_id int, term string"
        )
        expect = [
            (r["doc_id"], round(r["score"], 6))
            for r in score_bm25f(index, anchors, qt, k=10, terms=terms).collect()
        ]
        for prune in (False, True):
            got = [
                (r["doc_id"], round(r["score"], 6))
                for r in block_search(
                    blocks, spark, [query], k=10, prune=prune, round_dp=6
                ).collect()
            ]
            assert got == expect, (query, prune, got, expect)


def test_lm_blocks_equal_row_path(spark):
    """Block-max pruned LM-Dirichlet must equal score_lm_dirichlet's
    row path: matched contributions in the block scores, the negative
    per-doc length penalty in the prior lane weighted by nq at query
    time — the penalty is exact in phase 1, so pruning stays exact."""
    from search_engine_spark.functions.textproc import tokenize_query
    from search_engine_spark.operators.blocks import build_block_index_lm
    from search_engine_spark.operators.index_build import build_index
    from search_engine_spark.operators.query import score_lm_dirichlet
    from search_engine_spark.operators.text_analytics import ws_tokens

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("doc_id", "text")
    index = build_index(docs, tokenizer=ws_tokens)
    blocks = build_block_index_lm(index, mu=2000.0, num_buckets=4).persist()

    for query in ["spark merge batch", "data pipeline", "nosuchterm"]:
        terms = list(dict.fromkeys(tokenize_query(query))) or ["nosuchterm"]
        qt = spark.createDataFrame(
            [(0, t) for t in terms], "query_id int, term string"
        )
        expect = [
            (r["doc_id"], round(r["score"], 9))
            for r in score_lm_dirichlet(
                index, qt, mu=2000.0, k=10, terms=terms
            ).collect()
        ]
        for prune in (False, True):
            got = [
                (r["doc_id"], round(r["score"], 9))
                for r in block_search(
                    blocks, spark, [query], k=10, prune=prune,
                    prior_weight="nq", round_dp=9,
                ).collect()
            ]
            assert got == expect, (query, prune, got[:3], expect[:3])
