"""Retrieval evaluation: graded relevance metrics over ranked runs.

Every search stack ships an evaluation harness next to its scorers —
the reference has none (its quality story is "look at the results",
app/main.py serves hits unmeasured), so this module adds the standard
TREC-style metric set as first-class distributed operators: given a
`run` relation (query_id, doc_id, score) and a `qrels` relation
(query_id, doc_id, rel) with graded judgments, compute per-query
precision@k, recall@k, reciprocal rank, average precision, and NDCG@k,
plus macro-averaged summaries and ANN recall-overlap between two runs.

Architecture note (the 100 TB / million-query shape): evaluation at
scale is a JOIN problem, not a loop — a production eval sweep scores
millions of logged queries against a judgment store. Everything here
is per-query grouped column math: the run is ranked by one per-query
window (Q7 tie-break: score DESC, doc_id ASC — the engine's serving
order, so measured rank == served rank), judgments attach by one
(query_id, doc_id) equi-join (qrels are typically ≪ run; AQE
broadcasts them when small), and the cumulative-hits window for AP
reuses the rank window's partitioning, so adding AP costs no extra
shuffle. No per-query driver loop, no collect of anything
query-count-sized.

Metric conventions (pinned so the DuckDB oracle replays exactly):
- rank is 1-based over the Q7 order, cut at `k` BEFORE metrics.
- precision@k divides by the CUTOFF k (trec_eval convention), not by
  the rows returned — an under-filled result page is penalized.
- recall@k and AP divide by R = |{rel > 0}| in qrels for that query
  (uncapped); both are 0.0 when R = 0.
- RR is 1/rank of the first rel > 0 hit within the cutoff, else 0.0.
- DCG@k = Σ (2^rel − 1) / log2(rank + 1); IDCG@k ranks the query's
  own judged rel > 0 docs by rel DESC (DCG over a multiset is
  tie-order-insensitive, so no tie-break leaks in); NDCG = DCG/IDCG,
  0.0 for queries with no positive judgments.
- every metric is rounded half-up to 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rank_eval", "eval_summary", "ann_recall", "paired_delta"]


def _ranked(run: DataFrame, k: int) -> DataFrame:
    """run → (query_id, doc_id, rank ≤ k) in the engine's serving order."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        run.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
    )


def rank_eval(run: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """Per-query IR metrics: (query_id, precision_k, recall_k, rr, ap,
    ndcg_k) for every query present in `run`, judged against `qrels`
    (query_id, doc_id, rel int ≥ 0; rel > 0 counts as relevant, grades
    feed NDCG's gain). See the module docstring for the exact
    conventions and the plan-shape argument.
    """
    rel_hit = F.col("rel") > 0
    ranked = _ranked(run, k)
    judged = ranked.join(qrels, ["query_id", "doc_id"], "left").withColumn(
        "rel", F.coalesce(F.col("rel"), F.lit(0)).cast("int")
    )
    # cumulative relevant count at each rank — AP's P@i numerator;
    # same partitioning as the rank window, no extra shuffle
    cw = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    judged = judged.withColumn(
        "hits_at", F.sum(rel_hit.cast("long")).over(cw)
    )
    per = judged.groupBy("query_id").agg(
        F.max("hits_at").alias("n_hits"),
        F.max(F.when(rel_hit, 1.0 / F.col("rank"))).alias("rr_raw"),
        F.sum(
            (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
            / F.log2(F.col("rank") + F.lit(1.0))
        ).alias("dcg"),
        F.sum(
            F.when(rel_hit, F.col("hits_at").cast("double") / F.col("rank"))
        ).alias("ap_num"),
    )
    r_tot = (
        qrels.filter(rel_hit)
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
    )
    iw = Window.partitionBy("query_id").orderBy(
        F.col("rel").desc(), F.col("doc_id").asc()
    )
    ideal = (
        qrels.filter(rel_hit)
        .withColumn("irank", F.row_number().over(iw))
        .filter(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rel")) - 1.0)
                / F.log2(F.col("irank") + F.lit(1.0))
            ).alias("idcg")
        )
    )
    zero = F.lit(0.0)
    return (
        per.join(r_tot, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.round(F.col("n_hits") / F.lit(float(k)), 6).alias("precision_k"),
            F.round(
                F.coalesce(F.col("n_hits") / F.col("n_rel"), zero), 6
            ).alias("recall_k"),
            F.round(F.coalesce(F.col("rr_raw"), zero), 6).alias("rr"),
            F.round(
                F.coalesce(F.col("ap_num") / F.col("n_rel"), zero), 6
            ).alias("ap"),
            F.round(
                F.coalesce(F.col("dcg") / F.col("idcg"), zero), 6
            ).alias("ndcg_k"),
        )
    )


def eval_summary(per_query: DataFrame) -> DataFrame:
    """Macro-average of rank_eval's per-query rows → ONE row
    (n_queries, p_at_k, recall_at_k, mrr, map, ndcg) — the headline
    numbers a retrieval change is judged by. Plain mean over queries
    (macro), the TREC convention: every query votes equally regardless
    of its judgment-set size."""
    return per_query.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.round(F.avg("precision_k"), 6).alias("p_at_k"),
        F.round(F.avg("recall_k"), 6).alias("recall_at_k"),
        F.round(F.avg("rr"), 6).alias("mrr"),
        F.round(F.avg("ap"), 6).alias("map"),
        F.round(F.avg("ndcg_k"), 6).alias("ndcg"),
    )


def ann_recall(run: DataFrame, reference: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, recall): top-k overlap of an approximate run against
    an exact reference run — THE acceptance metric for every ANN
    serving path (IVF nprobe, LSH bands, PQ ADC) before it replaces
    exact scoring. recall = |approx@k ∩ exact@k| / |exact@k| per query
    (the denominator is the reference's actual row count, so corpora
    smaller than k don't cap below 1.0). Two rank windows + one
    (query_id, doc_id) semi-join + one per-query agg; every relation
    is query-count-sized after the cut."""
    ref = _ranked(reference, k)
    got = _ranked(run, k)
    overlap = ref.join(
        got.select("query_id", "doc_id"), ["query_id", "doc_id"], "left_semi"
    )
    denom = ref.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_ref"))
    num = overlap.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        denom.join(num, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("n_hit") / F.col("n_ref"), F.lit(0.0)), 6
            ).alias("recall"),
        )
    )


def paired_delta(
    per_a: DataFrame, per_b: DataFrame, metric: str = "ndcg_k"
) -> DataFrame:
    """ONE row (n_queries, mean_a, mean_b, mean_delta, t_stat): paired
    comparison of two runs' per-query `metric` (rank_eval outputs) —
    the standard way a ranking change is accepted: same queries, same
    judgments, per-query deltas, paired t-statistic

        t = mean(d) / (sd(d) / sqrt(n)),  sd = sample std of deltas

    (compare |t| to the t_{n-1} critical value offline; the statistic
    itself is pure arithmetic so it stays oracle-replayable — no CDF,
    no libm beyond sqrt). t_stat is 0.0 when the deltas have zero
    variance (including the all-identical-runs case) or n < 2. One
    (query_id) join + one 4-scalar aggregate — works unchanged on a
    million-query eval sweep."""
    a = per_a.select("query_id", F.col(metric).alias("x"))
    b = per_b.select("query_id", F.col(metric).alias("y"))
    j = a.join(b, "query_id").select(
        "x", "y", (F.col("x") - F.col("y")).alias("d")
    )
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("ma"),
        F.avg("y").alias("mb"),
        F.avg("d").alias("md"),
        F.avg(F.col("d") * F.col("d")).alias("qd"),
    )
    n = F.col("n").cast("double")
    var = (F.col("qd") - F.col("md") * F.col("md")) * n / (n - F.lit(1.0))
    t = F.when(
        (F.col("n") > 1) & (F.col("qd") - F.col("md") * F.col("md") > 0),
        F.col("md") / (F.sqrt(var) / F.sqrt(n)),
    ).otherwise(F.lit(0.0))
    return s.select(
        F.col("n").alias("n_queries"),
        F.round("ma", 6).alias("mean_a"),
        F.round("mb", 6).alias("mean_b"),
        F.round("md", 6).alias("mean_delta"),
        F.round(t, 6).alias("t_stat"),
    )


def interleave_balanced(
    run_a: DataFrame, run_b: DataFrame, k: int = 10, k_out: int = 10
) -> DataFrame:
    """(query_id, doc_id, ipos, team): balanced interleaving (Joachims
    2003) of two rankers' top-k lists — the online-evaluation step
    before an A/B rollout: users see ONE merged list; clicks credit
    the `team` whose ranking contributed the doc, and the better
    ranker wins more credited clicks.

    Deterministic union-prefix formulation (A leads): after 2j picks
    the interleaved prefix is top-j(A) ∪ top-j(B), so a doc enters at
    j = min(pos_a, pos_b), A-entrants before B-entrants at equal j,
    residual ties by (pos_a, pos_b, doc_id) — a closed form with NO
    sequential picking loop, so the whole merge is two rank windows +
    one full-outer join + one window per query, the same join-problem
    shape as rank_eval (and exactly replayable in SQL). team = the
    list that ranks the doc strictly higher; ties credit A.
    """
    inf = 1 << 30
    a = _ranked(run_a, k).withColumnRenamed("rank", "pa")
    b = _ranked(run_b, k).withColumnRenamed("rank", "pb")
    j = (
        a.join(b, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("pa", F.lit(inf)).alias("pa"),
            F.coalesce("pb", F.lit(inf)).alias("pb"),
        )
    )
    enter = F.least("pa", "pb")
    from_b = (F.col("pa") > F.col("pb")).cast("int")
    w = Window.partitionBy("query_id").orderBy(
        enter.asc(), from_b.asc(), F.col("pa").asc(), F.col("pb").asc(),
        F.col("doc_id").asc(),
    )
    return (
        j.withColumn("ipos", F.row_number().over(w))
        .filter(F.col("ipos") <= k_out)
        .select(
            "query_id",
            "doc_id",
            "ipos",
            F.when(F.col("pa") <= F.col("pb"), "A").otherwise("B").alias("team"),
        )
        .orderBy("query_id", "ipos")
    )


def rbo_depths(
    run_a: DataFrame,
    run_b: DataFrame,
    depth: int = 10,
    p: float = 0.9,
    round_dp: int = 6,
) -> DataFrame:
    """(query_id, d, overlap, contrib): per-depth rank-biased-overlap
    decomposition (Webber et al. 2010) between two rankers — overlap_d
    = |top-d(A) ∩ top-d(B)| and contrib = (1−p)·p^(d−1)·overlap_d/d,
    whose sum over d is the truncated RBO score. Emitted as the table
    (not the scalar) so every row is independently integer-derived and
    order-free — summing 10 doubles has an addition-order hazard the
    table sidesteps, and the per-depth view is what a ranking-drift
    dashboard plots anyway.

    The p^(d−1) weights are computed ONCE driver-side and joined as a
    depth-literal dimension (d ≤ depth rows): libm pow differs by ulps
    across engines, so inlining identical doubles in engine and oracle
    is what makes the 6dp rounding safe.

    Shape: two rank windows, one (query_id, doc_id) inner join, a ≤
    depth-row broadcast, one (query_id, d) hash agg. Million-query
    sweeps run it unchanged.
    """
    spark = run_a.sparkSession
    a = _ranked(run_a, depth).withColumnRenamed("rank", "pa")
    b = _ranked(run_b, depth).withColumnRenamed("rank", "pb")
    m = a.join(b, ["query_id", "doc_id"]).select(
        "query_id", F.greatest("pa", "pb").alias("m")
    )
    weights = spark.createDataFrame(
        [(d, (1.0 - p) * (p ** (d - 1))) for d in range(1, depth + 1)],
        "d int, w double",
    )
    grid = (
        run_a.select("query_id").union(run_b.select("query_id")).distinct()
        .crossJoin(F.broadcast(weights))
    )
    ov = (
        m.join(F.broadcast(weights.select("d")), F.col("m") <= F.col("d"))
        .groupBy("query_id", "d")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    return (
        grid.join(ov, ["query_id", "d"], "left")
        .select(
            "query_id",
            "d",
            F.coalesce("overlap", F.lit(0)).cast("long").alias("overlap"),
            F.round(
                F.col("w") * F.coalesce("overlap", F.lit(0)) / F.col("d"),
                round_dp,
            ).alias("contrib"),
        )
        .orderBy("query_id", "d")
    )
