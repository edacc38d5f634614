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


def _naive_lsh_pairs(spark, docs, threshold=0.9):
    """The pre-r5 per-band bucket self-join, kept as the parity oracle
    for the membership-deduped enumeration."""
    buckets = dedup.minhash_buckets(docs)
    l = buckets.alias("l")
    r = buckets.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )
    return dedup.verify_jaccard(cands, docs, threshold)


def test_membership_dedup_enumeration_is_exact(spark):
    # the r5 plan (bucket -> member list -> distinct memberships ->
    # pairs) must produce the IDENTICAL pair set as the naive per-band
    # bucket self-join it replaced
    docs = _docs(spark)
    new = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.9).collect()
    }
    old = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in _naive_lsh_pairs(spark, docs, threshold=0.9).collect()
    }
    assert new == old
    assert len(new) > 0


def test_max_bucket_cap_drops_only_giant_groups(spark):
    # plant a 6-doc exact-dup clique plus one isolated near-dup pair;
    # cap=4 must drop the clique's pairs (its buckets all have 6
    # members) while keeping the isolated pair intact
    clique_text = "alpha beta gamma delta epsilon zeta eta theta"
    pair_a = "iota kappa lamda mu nu xi omicron pi rho sigma"
    pair_b = "iota kappa lamda mu nu xi omicron pi rho tau"
    rows = [(i, clique_text) for i in range(6)] + [
        (10, pair_a), (11, pair_b)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    full = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    capped = {
        (r.doc_a, r.doc_b)
        for r in dedup.minhash_lsh_pairs(
            docs, threshold=0.5, max_bucket=4
        ).collect()
    }
    clique_pairs = {(a, b) for a in range(6) for b in range(6) if a < b}
    assert clique_pairs <= full
    assert capped & clique_pairs == set()
    if (10, 11) in full:  # the isolated pair rides small buckets
        assert (10, 11) in capped
