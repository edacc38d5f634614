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

__all__ = [
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "bloom_build",
    "bloom_probe",
    "hll_registers",
    "hll_estimate",
    "hll_merge",
]


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


def cms_merge(*grids: DataFrame) -> DataFrame:
    """Union CMS grids built over disjoint corpus slices into the grid
    of the union corpus — counters ADD. Mergeability is the whole scale
    story of a sketch: per-partition / per-epoch / per-datacenter grids
    combine with a sketch-sized union + sum, never a corpus reread —
    the same contract as a streaming state update (new epoch's grid +=
    delta grid). Identity (tested + oracle-gated): merge of slice grids
    == grid built over the whole corpus."""
    out = grids[0]
    for g in grids[1:]:
        out = out.unionByName(g)
    return out.groupBy("j", "bucket").agg(F.sum("cnt").alias("cnt"))


def hll_merge(*register_sets: DataFrame) -> DataFrame:
    """Union HLL register sets into the registers of the union corpus —
    registers take the MAX per bucket. Same mergeability contract as
    cms_merge (this is why HLL powers every distributed distinct-count:
    partial registers from anywhere, one tiny max-union at the end)."""
    out = register_sets[0]
    for r in register_sets[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def bloom_build(
    df: DataFrame,
    col: str,
    m: int = 1 << 16,
    k: int = 4,
    family: str = "portable",
) -> DataFrame:
    """(pos): the distinct set-bit positions of a Bloom filter over
    `df[col]` — the membership pre-filter the crawl frontier needs at
    10^9-URL scale ("was this URL ever queued?") without joining the
    full visited ledger. NO false negatives ever; false-positive rate
    ≈ (1 − e^(−kn/m))^k (k=4, m/n=16 → ~2.4 %).

    Represented relationally as the ≤ m distinct positions (at most
    m rows regardless of input size); a deployment packs them into
    m/64 longs with groupBy(pos div 64) + bit_or — same information,
    same plan shape. Build is one scan + a sketch-sized distinct."""
    posexprs = [
        (h64(F.concat(F.lit(f"bf{j}|"), F.col(col)), family) % m)
        for j in range(k)
    ]
    return (
        df.select(F.explode(F.array(*posexprs)).alias("pos"))
        .distinct()
    )


def bloom_probe(
    bloom: DataFrame,
    df: DataFrame,
    col: str,
    m: int = 1 << 16,
    k: int = 4,
    family: str = "portable",
) -> DataFrame:
    """df + maybe_present: true iff ALL k of the value's bit positions
    are set (semi-join against the positions relation + per-value
    match count) — false ⇒ DEFINITELY absent, the contract that lets a
    frontier skip the exact ledger join for the (vast) definite-miss
    majority. One shuffle of (value, pos) pairs, k rows per value."""
    posexprs = [
        (h64(F.concat(F.lit(f"bf{j}|"), F.col(col)), family) % m)
        for j in range(k)
    ]
    probe = df.select(
        F.col(col).alias("_v"), F.explode(F.array(*posexprs)).alias("pos")
    )
    hits = (
        probe.join(bloom, "pos", "left_semi")
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_nhit"))
    )
    return (
        df.join(hits, df[col] == hits["_v"], "left")
        .select(
            *df.columns,
            (F.coalesce(F.col("_nhit"), F.lit(0)) == k).alias("maybe_present"),
        )
    )


#: HLL bias-correction constant for m ≥ 128 buckets (Flajolet et al.
#: 2007): alpha_m = 0.7213 / (1 + 1.079/m).
def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(
    df: DataFrame, col: str, b: int = 8, family: str = "portable"
) -> DataFrame:
    """(bucket, rho): HyperLogLog registers over df[col] — bucket is
    the hash's low `b` bits, rho the 1-based position of the highest
    set bit COUNTED FROM THE TOP of the remaining 60−b hash bits (+1
    more when they are all zero), register = max rho per bucket. At
    most 2^b rows whatever the input cardinality — the distinct-count
    state a 100 TB profile job can afford per group.

    floor(log2(rest)) is exact for rest < 2^53 (the 52 remaining bits
    are exactly representable doubles), so the same arithmetic replays
    bit-identically in the SQL oracle.

    Any b is accepted HERE (registers are well-defined for small b and
    streaming state uses tiny grids in tests); the ESTIMATORS restrict
    b to [8, 16] — see hll_estimate."""
    m = 1 << b
    h = h64(F.col(col).cast("string"), family)
    # integer bit ops, NOT h/m: double division would shave bits off a
    # 60-bit hash (only 53 fit a double mantissa)
    bucket = h.bitwiseAND(F.lit(m - 1))
    rest = F.shiftright(h, b)  # the remaining 60-b bits
    width = 60 - b
    rho = F.when(
        rest > 0,
        F.lit(width) - F.floor(F.log2(rest.cast("double"))).cast("long"),
    ).otherwise(F.lit(width + 1))
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    df: DataFrame, col: str, b: int = 8, family: str = "portable"
) -> DataFrame:
    """One row (n_registers, estimate): the HLL cardinality estimate
    with the standard small-range (linear counting) correction.

    Determinism note: Σ 2^−rho is summed as the exact INTEGER
    Σ 2^(53−rho) (every addend a power of two ≤ 2^53, total < 2^61 —
    no FP addition order anywhere), then divided once in doubles, so
    engine and oracle agree to the last bit before the 3dp rounding.

    b is restricted to [8, 16]: below 8 the max rho (60−b+1) exceeds
    53, so Σ 2^(53−rho) would need a negative shift count — which the
    JVM masks mod 64 into 2^63 (Long.MIN_VALUE), corrupting the sum —
    and the hll_alpha constant is only valid for m ≥ 128 anyway; above
    16 the register relation stops being sketch-sized."""
    if not 8 <= b <= 16:
        raise ValueError(f"hll: b must be in [8, 16], got {b}")
    m = 1 << b
    regs = hll_registers(df, col, b=b, family=family)
    row = regs.agg(
        F.count(F.lit(1)).alias("nreg"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - rho AS INT))")).alias("i"),
    ).first()
    nreg = int(row["nreg"] or 0)
    i_obs = int(row["i"] or 0)
    zeros = m - nreg
    i_total = i_obs + zeros * (1 << 53)
    raw = _hll_alpha(m) * m * m * float(1 << 53) / float(i_total)
    if raw <= 2.5 * m and zeros > 0:
        import math

        est = m * math.log(m / zeros)
    else:
        est = raw
    from search_engine_spark.numerics import round_half_up

    spark = df.sparkSession
    return spark.createDataFrame(
        [(nreg, round_half_up(est, 3))], "n_registers int, estimate double"
    )


def hll_group_estimate(
    df: DataFrame,
    group_col: str,
    col: str,
    b: int = 8,
    family: str = "portable",
) -> DataFrame:
    """(group, n_registers, estimate): approximate distinct counts PER
    GROUP — the aggregation shape a 100 TB profile job actually runs
    ("distinct terms per source", "distinct users per event type")
    where an exact count-distinct shuffles every (group, value) pair.
    Here the shuffle carries at most |groups|·2^b register rows, and
    the whole estimate — including the Σ 2^(53−rho) exact-integer
    trick and the linear-counting small-range branch — is per-row
    COLUMN code over the per-group register relation, so there is no
    driver involvement per group and the plan is two hash aggregates.

    Spark's round() and DuckDB's are both HALF_UP on doubles, so the
    3dp estimates replay exactly (hll_estimate's driver-side twin uses
    numerics.round_half_up for the same reason). Same b ∈ [8, 16]
    restriction as hll_registers (negative-shift hazard below 8)."""
    if not 8 <= b <= 16:
        raise ValueError(f"hll: b must be in [8, 16], got {b}")
    m = 1 << b
    h = h64(F.col(col).cast("string"), family)
    bucket = h.bitwiseAND(F.lit(m - 1))
    rest = F.shiftright(h, b)
    width = 60 - b
    rho = F.when(
        rest > 0,
        F.lit(width) - F.floor(F.log2(rest.cast("double"))).cast("long"),
    ).otherwise(F.lit(width + 1))
    regs = (
        df.select(F.col(group_col).alias("g"), bucket.alias("bucket"),
                  rho.alias("rho"))
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    agg = regs.groupBy("g").agg(
        F.count(F.lit(1)).alias("nreg"),
        F.sum(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(53 - rho AS INT))")
        ).alias("i"),
    )
    alpha = _hll_alpha(m)
    two53 = float(1 << 53)
    zeros = F.lit(m) - F.col("nreg")
    i_total = F.col("i") + zeros * F.lit(1 << 53)
    raw = (
        F.lit((alpha * m) * m) * F.lit(two53) / i_total.cast("double")
    )
    est = F.when(
        (raw <= 2.5 * m) & (zeros > 0),
        F.lit(m) * F.log(F.lit(float(m)) / zeros.cast("double")),
    ).otherwise(raw)
    return agg.select(
        F.col("g").alias(group_col),
        F.col("nreg").cast("int").alias("n_registers"),
        F.round(est, 3).alias("estimate"),
    )


def histogram_quantiles(
    df: DataFrame,
    col: str,
    qs: list[float],
    bucket_width: int = 16,
    round_dp: int = 6,
) -> DataFrame:
    """(q, estimate, bucket_lo, bucket_hi): quantiles of a numeric
    column via a fixed-width histogram — the sketch-path answer to
    "p99 doc length over 10^12 docs", where an exact quantile needs a
    full sort and approx_percentile's internal sketch is not
    replayable outside the JVM. The histogram (value // width counts)
    is sketch-sized state with map-side combine; the estimate is the
    standard interpolated form: inside the first bucket whose
    cumulative count reaches q·N, position linearly by
    (q·N − cum_before)/bucket_count. Every input is an integer count,
    the interpolation is one fixed-order double expression, so the
    3-way (engine, oracle, by-hand) replay is exact at `round_dp`.

    Shape: one hash agg to ≤ range/width buckets, one cumulative
    window over that sketch-sized relation, one broadcast join of the
    |qs|-row quantile dimension. Nothing corpus-sized after the scan.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    hist = (
        df.select((F.col(col) / bucket_width).cast("long").alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    total = cum.agg(F.max("cum").alias("n"))
    qdf = F.broadcast(
        spark.createDataFrame([(float(q),) for q in qs], "q double")
    )
    # cum_before < q·n alone never matches when q·n == 0 (q = 0.0
    # would silently vanish from the output); the extra disjunct pins
    # q ≤ 0 to the first bucket, where the interpolation below
    # degenerates to its lower edge.
    target = F.col("q") * F.col("n")
    j = (
        cum.crossJoin(F.broadcast(total))
        .join(
            qdf,
            (F.col("cum") >= target)
            & (
                (F.col("cum_before") < target)
                | ((target <= 0) & (F.col("cum_before") == 0))
            ),
        )
    )
    est = (
        F.col("b") * bucket_width
        + bucket_width
        * (F.col("q") * F.col("n") - F.col("cum_before"))
        / F.col("cnt")
    )
    return j.select(
        "q",
        F.round(est, round_dp).alias("estimate"),
        (F.col("b") * bucket_width).cast("long").alias("bucket_lo"),
        ((F.col("b") + 1) * bucket_width).cast("long").alias("bucket_hi"),
    ).orderBy("q")


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
