"""Similarity search over an embedding column (array<float>).

Two paths (the training-pipeline ANN requirement):

- cosine_topk: brute-force exact cosine top-k — JVM-side
  zip_with/aggregate column math in f64, no Python, no shuffle beyond
  the final TakeOrdered. The correctness baseline; O(n·d) per query.
- lsh_cosine_topk: random-hyperplane (sign) LSH — deterministic
  hyperplanes derived from xxhash64 (no RNG state to ship), signature
  via bit-majority dot products, candidates = same-bucket docs, then
  exact cosine re-rank of candidates only. The 10^12-row path: the
  bucket groupBy is the only full shuffle and its payload is one long
  per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col, lit


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(embeddings: DataFrame, query_vec_id: int) -> DataFrame:
    """(vec_id, cos) vs the given stored vector — exact, f64, rounded 6dp."""
    q = embeddings.filter(col("vec_id") == query_vec_id).select(
        col("embedding").alias("qe")
    )
    rest = embeddings.filter(col("vec_id") != query_vec_id)
    return rest.crossJoin(F.broadcast(q)).select(
        "vec_id",
        F.round(
            _dot(col("embedding"), col("qe")) / (_norm(col("embedding")) * _norm(col("qe"))),
            6,
        ).alias("cos"),
    )


def cosine_topk(embeddings: DataFrame, query_vec_id: int, k: int = 10) -> DataFrame:
    return cosine_scores(embeddings, query_vec_id).orderBy(
        col("cos").desc(), col("vec_id").asc()
    ).limit(k)


def _hyperplane_sig(emb_col, dim: int, n_planes: int):
    """n_planes sign bits; plane p component i = ±1 from xxhash64(p, i).

    Pure column expression → codegen; deterministic everywhere.
    """
    bits = []
    for p in range(n_planes):
        signs = F.array(
            *[
                F.when(F.xxhash64(lit(p), lit(i)) % 2 == 0, lit(1.0)).otherwise(lit(-1.0))
                for i in range(dim)
            ]
        )
        d = F.aggregate(
            F.zip_with(emb_col, signs, lambda x, s: x.cast("double") * s),
            lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(d > 0, F.shiftleft(lit(1).cast("long"), p)).otherwise(lit(0).cast("long")))
    sig = lit(0).cast("long")
    for b in bits:
        sig = sig.bitwiseOR(b)
    return sig


def lsh_cosine_topk(
    embeddings: DataFrame,
    query_vec_id: int,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
) -> DataFrame:
    """ANN: candidates share the query's hyperplane-sign bucket, then
    exact cosine re-rank. Recall tunes with n_planes (fewer planes →
    bigger buckets → higher recall, more work)."""
    with_sig = embeddings.withColumn("sig", _hyperplane_sig(col("embedding"), dim, n_planes))
    qsig = with_sig.filter(col("vec_id") == query_vec_id).select(
        col("sig").alias("qsig"), col("embedding").alias("qe")
    )
    cands = (
        with_sig.filter(col("vec_id") != query_vec_id)
        .join(F.broadcast(qsig), col("sig") == col("qsig"))
    )
    return (
        cands.select(
            "vec_id",
            F.round(
                _dot(col("embedding"), col("qe"))
                / (_norm(col("embedding")) * _norm(col("qe"))),
                6,
            ).alias("cos"),
        )
        .orderBy(col("cos").desc(), col("vec_id").asc())
        .limit(k)
    )
