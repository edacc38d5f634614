"""Hash-family equivalence for the dedup surface.

The engine default is Spark-native `xxhash64` (fast path); the
`portable` md5 family exists so the DuckDB oracle can recompute
signatures verbatim. These tests pin the contract that buys: on
dup-cluster data the two families produce the SAME labelings/pairs —
signatures within a dup cluster are equal under any hash, and the
exact-Jaccard verification stage filters borderline candidates
identically — so running the oracle on the portable family validates
the xxhash64 production path too.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from search_engine_spark.operators import dedup
from search_engine_spark.operators.hashing import h64

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_h64_xxhash64_range(spark):
    df = _docs(spark).select(h64(F.col("text"), "xxhash64").alias("h"))
    lo, hi = df.agg(F.min("h"), F.max("h")).first()
    assert lo >= 0 and hi < (1 << 60)


def test_h64_unknown_family_raises():
    import pytest

    with pytest.raises(ValueError, match="unknown hash family"):
        h64(F.col("x"), "fnv1a")


def test_minhash_dedup_family_equivalent(spark):
    docs = _docs(spark)
    fast = {
        (r.doc_id, r.keep_id)
        for r in dedup.minhash_dedup(docs, family="xxhash64").collect()
    }
    portable = {
        (r.doc_id, r.keep_id)
        for r in dedup.minhash_dedup(docs, family="portable").collect()
    }
    assert fast == portable


def test_minhash_lsh_pairs_family_equivalent(spark):
    docs = _docs(spark)
    fast = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.9, family="xxhash64"
        ).collect()
    }
    portable = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.9, family="portable"
        ).collect()
    }
    assert fast == portable


def test_simhash_pairs_family_contract(spark):
    # SimHash is an approximate 60-bit projection: hamming between
    # NEAR-dups depends on which terms land on which bits, so the pair
    # set at a hamming threshold is family-dependent at the boundary
    # (measured at sf0.001: 37 vs 25 pairs, overlapping core). The
    # family-independent contract is exact dups: identical token
    # multisets produce identical simhash under ANY hash, so every
    # same-text pair must appear in BOTH families at hamming 0.
    base = _docs(spark).filter(F.col("doc_id") < 60)
    ids = sorted(r.doc_id for r in base.select("doc_id").collect())
    # sf0.001 has no exact-dup clusters — synthesize them: an id-offset
    # copy of every doc (same text) makes each (d, d+OFFSET) an exact dup
    OFFSET = 1_000_000
    docs = base.unionByName(
        base.withColumn("doc_id", F.col("doc_id") + OFFSET)
    )
    exact_pairs = {(d, d + OFFSET) for d in ids}
    fast = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=3, family="xxhash64").collect()
    }
    portable = {
        (r.doc_a, r.doc_b): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=3, family="portable").collect()
    }
    for pair in exact_pairs:
        assert fast.get(pair) == 0, pair
        assert portable.get(pair) == 0, pair


def test_normalized_dedup_collapses_case_punct_ws(spark):
    from search_engine_spark.operators.dedup import normalized_dedup

    docs = spark.createDataFrame(
        [
            (1, "Hello, World!"),
            (2, "hello   world"),
            (3, "HELLO WORLD."),
            (4, "goodbye world"),
        ],
        ["doc_id", "text"],
    )
    out = {r["keep_id"]: r["n_copies"] for r in normalized_dedup(docs).collect()}
    assert out == {1: 3, 4: 1}


def test_select_representatives_keeps_best_not_first(spark):
    from search_engine_spark.operators.dedup import select_representatives

    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9)], "doc_id long, keep_id long"
    )
    scores = spark.createDataFrame(
        [(1, 0.1), (2, 0.9), (3, 0.9), (9, 0.5)], "doc_id long, score double"
    )
    out = {
        r["doc_id"]: r["rep_id"]
        for r in select_representatives(labels, scores).collect()
    }
    # group 1: docs 2 and 3 tie on score → doc_id ASC wins (2), NOT min-id 1
    assert out == {1: 2, 2: 2, 3: 2, 9: 9}
