"""Count-Min sketch: heavy-hitter term counts in sketch-sized state.

Cormode & Muthukrishnan (2005). At 10^8-term web vocabularies, an
exact per-term count is itself a vocabulary-sized relation; a CMS
answers "how often does term t occur?" within εN overcounting using a
FIXED depth×width counter grid — the state a streaming frequency
monitor or a per-executor pre-filter can actually hold. Estimates are
upper bounds: est(t) = min_j grid[j][h_j(t)] ≥ true(t), within
ε = e/width of the token mass with probability 1 − e^-depth.

The hash family reuses operators/hashing.h64 (row-salted inputs make
the depth rows independent), so family="portable" replays bit-exactly
in DuckDB/python for the oracle while family="xxhash64" is the
JVM-native production default — the same pluggable-family contract as
the MinHash/LSH ops.

Plan shape: ONE tokenize scan; each token emits its `depth` bucket ids
via a JVM posexplode over an array of hash columns, and the groupBy
(j, bucket) aggregate map-side combines to ≤ partitions·depth·width
rows before the shuffle — the sketch, not the corpus, crosses the
wire. Probes hash driver-side (h64_py) and broadcast-join the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.operators.hashing import h64, h64_py

__all__ = ["cms_build", "cms_estimate"]


def _salt(j: int) -> str:
    return f"cms{j}|"


def cms_build(
    documents: DataFrame,
    depth: int = 4,
    width: int = 256,
    family: str = "portable",
) -> DataFrame:
    """(j, bucket, cnt): the depth×width counter grid over the corpus's
    token stream (at most depth·width rows, independent of corpus and
    vocabulary size)."""
    from search_engine_spark.operators.text_analytics import tokens_df

    toks = tokens_df(documents)
    buckets = [
        (h64(F.concat(F.lit(_salt(j)), F.col("term")), family) % width)
        for j in range(depth)
    ]
    stacked = toks.select(
        F.posexplode(F.array(*buckets)).alias("j", "bucket")
    )
    return stacked.groupBy("j", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(term, est): CMS point estimates (min over rows; ≥ true count,
    0 for never-seen terms whose buckets are all empty). Probe terms
    hash DRIVER-side with the portable family — the probe relation is
    |terms|·depth rows broadcast against the grid, never a corpus op.
    Only family="portable" grids are probeable here (xxhash64 cannot
    be recomputed outside the JVM; probe those with a join on h64)."""
    spark = cms.sparkSession
    rows = [
        (t, j, h64_py(_salt(j) + t) % width)
        for t in dict.fromkeys(terms)
        for j in range(depth)
    ]
    probe = F.broadcast(
        spark.createDataFrame(rows, "term string, j int, bucket long")
    )
    j = probe.join(
        cms.withColumn("j", F.col("j").cast("int")), ["j", "bucket"], "left"
    )
    return (
        j.groupBy("term")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select("term", F.col("est").cast("long").alias("est"))
    )
