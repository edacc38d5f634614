"""Composed training-data pipeline: the cleaning pass a 100 TB corpus
gets before pretraining, built entirely from this engine's operators.

Stages (each individually tested/oracled elsewhere; this module is the
composition a pipeline user runs):

1. language filter (F8) — Catalyst predicate, pushed to the scan;
2. exact dedup — md5 groupBy, keep min doc_id per fingerprint;
3. near-dup dedup — MinHash-LSH label propagation (minhash_dedup),
   keep each group's representative;
4. quality filter — token-count and mean-token-length bounds
   (quality_stats).

Everything is one lazy DataFrame graph: Catalyst sees all four stages
at once, so column pruning reaches the scan and the two dedup shuffles
are the only wide dependencies. Returns (kept_docs, audit) where audit
counts drops per stage — a pipeline without drop accounting reads as
"covered everything" when it didn't.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.operators.dedup import exact_dedup, minhash_dedup
from search_engine_spark.operators.hashing import h64
from search_engine_spark.operators.text_analytics import quality_stats


@dataclass
class CleaningAudit:
    n_input: int
    n_after_lang: int
    n_after_exact: int
    n_after_near: int
    n_after_quality: int


def clean_corpus(
    documents: DataFrame,
    lang_prefix: str = "en",
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    min_avg_token_len: float = 2.0,
    family: str = "xxhash64",
) -> tuple[DataFrame, CleaningAudit]:
    """documents(doc_id, text, lang, ...) → (kept rows, per-stage audit).

    Drop stages are expressed as ANTI-joins against the docs each stage
    explicitly REJECTS, not semi-joins against its keeps: zero-token
    docs have no rows in the minhash/quality relations, and a semi-join
    would silently drop them in the wrong stage. A zero-token doc
    therefore survives dedup and is judged by the quality bounds
    (n_tokens=0), where its drop is correctly attributed. Intermediate
    frames are persisted — each feeds both an audit count and the next
    stage, and `kept` is returned persisted (caller unpersists).
    """
    n_input = documents.count()

    lang_ok = documents.filter(F.col("lang").startswith(lang_prefix))
    n_lang = lang_ok.count()

    exact_keep = exact_dedup(lang_ok).select(F.col("keep_id").alias("doc_id"))
    after_exact = lang_ok.join(exact_keep, "doc_id", "left_semi").persist()
    n_exact = after_exact.count()

    near_drop = (
        minhash_dedup(after_exact, family=family)
        .filter(F.col("keep_id") != F.col("doc_id"))
        .select("doc_id")
    )
    after_near = after_exact.join(near_drop, "doc_id", "left_anti").persist()
    n_near = after_near.count()

    q = quality_stats(after_near)
    bad = (
        after_near.select("doc_id")
        .join(q, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            F.coalesce(F.col("avg_token_len"), F.lit(0.0)).alias("avg_token_len"),
        )
        .filter(
            (F.col("n_tokens") < min_tokens)
            | (F.col("n_tokens") > max_tokens)
            | (F.col("avg_token_len") < min_avg_token_len)
        )
        .select("doc_id")
    )
    kept = after_near.join(bad, "doc_id", "left_anti").persist()
    n_quality = kept.count()
    after_exact.unpersist()
    after_near.unpersist()

    return kept, CleaningAudit(n_input, n_lang, n_exact, n_near, n_quality)


def sample_corpus(
    documents: DataFrame,
    rate: float,
    seed: int = 42,
    key: str = "doc_id",
    family: str = "xxhash64",
) -> DataFrame:
    """Deterministic hash-split sample: keep ~rate of the rows.

    df.sample() draws from a per-partition RNG, so membership changes
    with partitioning, task retries, and cluster size — useless for a
    train/eval split that must be reproducible across reruns of a
    100 TB job. This is the standard hash-split instead: a row is kept
    iff h(key ":" seed) mod 1e6 < rate·1e6, a pure function of the row,
    so membership is stable under any repartitioning, samples at
    different rates NEST (rate 0.1 ⊂ rate 0.2 at the same seed), and
    disjoint splits come from disjoint rate bands or different seeds.
    Pure Catalyst predicate — evaluated in the scan stage, no shuffle,
    and at parquet row-group granularity nothing survives the filter
    but the scan itself (no index can prune a hash predicate).

    `family="portable"` (md5-derived, hashing.h64) makes membership
    reproducible OUTSIDE Spark (DuckDB, Python) — the oracle gate runs
    that; the default xxhash64 stays entirely in codegen.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    u = h64(F.concat(F.col(key).cast("string"), F.lit(f":{seed}")), family)
    return documents.filter(u % F.lit(1_000_000) < int(rate * 1_000_000))


def split_corpus(
    documents: DataFrame,
    fractions: dict[str, float],
    seed: int = 42,
    key: str = "doc_id",
    family: str = "xxhash64",
) -> DataFrame:
    """documents + a `split` column: deterministic, DISJOINT named
    splits (train/val/test) from consecutive hash bands — the
    train/eval partition a 100 TB pretraining pipeline must be able to
    recompute byte-identically months later.

    Same mechanism and guarantees as `sample_corpus` (membership is a
    pure row function: h(key ":" seed) mod 1e6 lands in one cumulative
    band per split — stable under repartitioning/retries, and splits
    at the same seed are disjoint BY CONSTRUCTION, no anti-joins).
    Fractions must sum to ≤ 1.0; rows falling past the last band are
    dropped (a ≤-1.0 sum doubles as holdout carving). Pure scan-stage
    CASE — no shuffle, no second pass per split.
    """
    total = sum(fractions.values())
    if not 0.0 < total <= 1.0 + 1e-12:
        raise ValueError(f"fractions must sum to (0, 1], got {total}")
    u = h64(F.concat(F.col(key).cast("string"), F.lit(f":{seed}")), family)
    band = u % F.lit(1_000_000)
    expr = None
    hi = 0
    for name, frac in fractions.items():
        hi += int(frac * 1_000_000)
        cond = band < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return (
        documents.withColumn("split", expr)
        .filter(F.col("split").isNotNull())
    )


def resample_corpus(
    documents: DataFrame,
    temperature: float = 0.7,
    seed: int = 43,
    family: str = "xxhash64",
) -> DataFrame:
    """Temperature-weighted mixture resampling: keep a deterministic
    subsample whose per-source composition follows q_s ∝ p_s^τ (the
    multilingual-pretraining rebalancing rule; τ<1 flattens the head,
    τ=1 is a no-op, τ=0 targets uniform). Sampling is WITHOUT
    replacement, so the target is realized by scaling every source's
    acceptance rate by the binding constraint: the source with the
    largest required upsampling keeps rate 1.0 (exactly — its ratio
    divides itself, no float hazard) and everything else keeps
    rate_s = (q_s/p_s) / max_u(q_u/p_u).

    Membership uses the same hash-band rule as sample_corpus (h mod
    1e6 < floor(rate·1e6), a pure per-row function — stable under
    repartitioning and retries), so the selection composes with
    hash-split train/eval sampling at a different seed. Plan: one
    count-by-source aggregation (rows = #sources, driver-collected),
    then a scan-stage broadcast-join + modulo filter — nothing wide
    touches the corpus itself at 10^12 docs.
    """
    if temperature < 0.0:
        raise ValueError(f"temperature must be >= 0, got {temperature}")
    counts = documents.groupBy("source").agg(F.count(F.lit(1)).alias("ns")).collect()
    total = float(sum(r["ns"] for r in counts))
    p = {r["source"]: r["ns"] / total for r in counts}
    q_raw = {s: ps**temperature for s, ps in p.items()}
    z = sum(q_raw.values())
    ratio = {s: (q_raw[s] / z) / p[s] for s in p}
    mr = max(ratio.values())
    thresholds = [(s, int((ratio[s] / mr) * 1_000_000)) for s in sorted(ratio)]
    spark = documents.sparkSession
    thr = F.broadcast(
        spark.createDataFrame(thresholds, "source string, thr long")
    )
    u = h64(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")), family)
    return (
        documents.join(thr, "source")
        .filter(u % F.lit(1_000_000) < F.col("thr"))
        .drop("thr")
    )


def dsir_weights(
    documents: DataFrame,
    target_sources: list[str],
    n_buckets: int = 4096,
    alpha: float = 0.5,
    family: str = "xxhash64",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023):
    per-doc importance of matching a TARGET distribution, with hashed
    unigram features —

        w(d) = (1/|d|) · Σ_{t∈d} ln( p_target(b(t)) / p_raw(b(t)) )

    where b(t) = h(t) mod n_buckets and each p is an add-α-smoothed
    bucket frequency. Target = docs whose `source` is in
    target_sources (the trusted slice — DSIR's "formal text"), raw =
    everything else. Positive w = looks like the target.

    Plan shape at 100 TB: the two bucket histograms are ONE aggregate
    each over the token stream (n_buckets rows out — broadcastable by
    construction no matter the corpus size), the per-doc score is a
    broadcast join of the 2·n_buckets-row log-ratio table onto the
    token stream + one groupBy(doc_id) mean. Nothing wide ever carries
    more than (doc_id, bucket). Length-normalized so selection does not
    degenerate to short docs.

    `family="portable"` makes bucket membership replayable outside
    Spark (the oracle gate); default xxhash64 stays in codegen.
    """
    from search_engine_spark.operators.text_analytics import ws_tokens

    if not target_sources:
        raise ValueError("target_sources must be non-empty")
    toks = documents.select(
        "doc_id",
        "source",
        F.explode(ws_tokens(F.col("text"))).alias("term"),
    ).withColumn("b", h64(F.col("term"), family) % F.lit(n_buckets))
    is_tgt = F.col("source").isin(target_sources)
    hist = toks.groupBy("b").agg(
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("nt"),
        F.sum(F.when(is_tgt, 0).otherwise(1)).alias("nr"),
    )
    tot = hist.agg(
        F.sum("nt").alias("tt"), F.sum("nr").alias("tr")
    )
    # log-ratio table: n_buckets rows joined to the 1-row totals —
    # tiny by construction, broadcast back onto the token stream
    ratio = (
        hist.join(tot)
        .select(
            "b",
            (
                F.log(
                    (F.col("nt").cast("double") + F.lit(alpha))
                    / (F.col("tt").cast("double") + F.lit(alpha * n_buckets))
                )
                - F.log(
                    (F.col("nr").cast("double") + F.lit(alpha))
                    / (F.col("tr").cast("double") + F.lit(alpha * n_buckets))
                )
            ).alias("lr"),
        )
    )
    return (
        toks.select("doc_id", "b")
        .join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lr"), 6).alias("dsir_weight"),
        )
    )


def dsir_topk(
    documents: DataFrame,
    target_sources: list[str],
    k: int = 100,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    family: str = "xxhash64",
) -> DataFrame:
    """The deterministic selection step: top-k docs by DSIR importance
    weight (ties: doc_id asc). The paper samples ∝ exp(w/τ) with Gumbel
    noise; at pipeline scale the noiseless top-k is the reproducible
    variant (and Gumbel sampling is one extra hash-derived column away
    for callers who want it). TakeOrdered of k rows — not a global
    sort."""
    w = dsir_weights(documents, target_sources, n_buckets, alpha, family)
    return (
        w.join(documents.select("doc_id", "source"), "doc_id")
        .select("doc_id", "source", "dsir_weight")
        .orderBy(F.col("dsir_weight").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def dsir_sample(
    documents: DataFrame,
    target_sources: list[str],
    k: int = 100,
    tau: float = 1.0,
    seed: int = 47,
    n_buckets: int = 4096,
    alpha: float = 0.5,
    family: str = "xxhash64",
) -> DataFrame:
    """The paper's actual selection rule: sample k docs WITHOUT
    replacement with probability ∝ exp(w_d/τ), via the Gumbel-top-k
    trick — key_d = w_d/τ + G_d, keep the k largest keys, where
    G_d = −ln(−ln U_d) is Gumbel noise. U_d is hash-derived
    ((h(doc_id:seed) mod 1e6 + 0.5)/1e6), so the "randomness" is a pure
    per-row function: the same sample on every rerun, task retry, and
    cluster size — the only kind of randomness a 100 TB reproducible
    pipeline can afford. τ→0 degenerates to the noiseless top-k
    (dsir_topk); larger τ trades selection sharpness for diversity.

    Keys are 6dp-rounded BEFORE the top-k cut (doc_id tie-break) so the
    selection replays bit-identically outside Spark."""
    if tau <= 0.0:
        raise ValueError(f"tau must be > 0, got {tau}")
    w = dsir_weights(documents, target_sources, n_buckets, alpha, family)
    u = (
        h64(F.concat(F.col("doc_id").cast("string"), F.lit(f":{seed}")), family)
        % F.lit(1_000_000)
    ).cast("double")
    gumbel = -F.log(-F.log((u + F.lit(0.5)) / F.lit(1_000_000.0)))
    return (
        w.join(documents.select("doc_id", "source"), "doc_id")
        .select(
            "doc_id",
            "source",
            "dsir_weight",
            F.round(
                F.col("dsir_weight") / F.lit(tau) + gumbel, 6
            ).alias("sample_key"),
        )
        .orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
        .limit(k)
    )
