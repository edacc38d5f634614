"""End-to-end crawl loop: the reference's `Crawler::run` as BFS rounds.

Reference semantics (services/crawler/src/crawler.rs:53-131): pop a url
from the work queue → fetch (retry policy in sources/fetch.py) → reject
non-English pages (UrlHandler::is_english) → reject inappropriate pages
(url + extracted text) → persist (url, title, html) → extract, resolve
and normalize links → queue every link not already crawled-or-queued.
The single-node FIFO pop order (SURVEY W2) is the one part not carried
over: a distributed crawl is round-synchronous BFS, and within a round
order is politeness-driven, not FIFO.

Execution shape (designed for N executors, not a driver loop):

- One ROUND = a handful of Spark jobs over DataFrames; the driver never
  iterates urls, only rounds. Per round: a partition-pruned queue scan
  (S3), the domain-partitioned fetch (S2), Arrow-batched gate UDFs +
  pure-Catalyst policy predicate, two parquet sinks (K1/K2), one
  frontier dedup shuffle and one anti-join against the ever-queued set.
- STATE lives in three partitioned parquet ledgers under `out_dir`
  (`queued/round=r`, `pages/round=r`, `fetchlog/round=r`). `fetchlog`
  is written last and is the round's commit marker: a round with
  `queued` but no `fetchlog` was interrupted and is re-fetched wholly
  (writes are mode=overwrite → idempotent). With a deterministic
  transport a resumed crawl is bit-identical to an uninterrupted one
  (asserted in tests/test_crawl_loop.py).
- DEDUP contract is the reference's: a url ever QUEUED is never queued
  again (crawler.rs:112-126 inserts into the crawled-set at queue time,
  not at fetch time) — so `visited` = union of all queued rounds, and
  fetch failures are not retried in later rounds, exactly like the
  reference's warn-and-continue (crawler.rs:55-62).
- The per-round fetch cap (`batch_size`, reference S3 LIMIT 10000,
  services/crawler/src/db.rs:124-153) takes a DETERMINISTIC batch of
  exactly `batch_size` urls (hash-banded, see _capped_frontier); the
  remainder carries over to the next round's queue, preserving
  work-queue no-loss semantics. The reference's LIMIT with no ORDER BY
  pins no order either — only the cap and the no-loss carryover are
  contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions.crawl import (
    crawl_frontier,
    inappropriate,
    is_english_udf,
)
from search_engine_spark.functions.textproc import (
    extract_text_udf,
    extract_title_udf,
)
from search_engine_spark.sources.fetch import fetch_pages

FETCHLOG_SCHEMA = "url string, status int, attempts int, reject string"
PAGES_SCHEMA = "url string, title string, html binary"
QUEUED_SCHEMA = "url string"


def _try_read(spark: SparkSession, path: str, schema: str) -> DataFrame | None:
    try:
        df = spark.read.schema(schema).parquet(path)
        df.head(1)  # force a scan so a missing dir fails HERE, not lazily
        return df
    except Exception:
        return None


def gate_pages(fetched: DataFrame) -> DataFrame:
    """Fetch results → per-url verdict. Columns: url, status, attempts,
    title, html, reject — reject is NULL iff the page was accepted, else
    the reference's error-enum name (fetch errors pass through,
    NonEnglishPage before InappropriateSite, crawler.rs:85-97)."""
    text = extract_text_udf(F.col("html"))
    return fetched.select(
        "url",
        "status",
        "attempts",
        extract_title_udf(F.col("html")).alias("title"),
        "html",
        F.when(F.col("error").isNotNull(), F.col("error"))
        .when(~is_english_udf(F.col("html")), F.lit("NonEnglishPage"))
        .when(inappropriate(F.col("url"), text), F.lit("InappropriateSite"))
        .alias("reject"),
    )



def _capped_frontier(
    queued: DataFrame, batch_size: int, num_bands: int = 4096
) -> DataFrame:
    """Deterministic ≤batch_size cut of the queue WITHOUT a global
    TakeOrdered.

    `orderBy(url).limit(n)` compiles to TakeOrderedAndProject: every
    partition keeps an n-row heap and the driver merges partitions·n
    candidates — fine at n=10k, a driver chokepoint at a billion-URL
    queue. Instead, the sample_corpus mechanism (pipelines.py): band
    each url by a pure 60-bit hash, count the bands (ONE tiny
    aggregate, ≤num_bands rows to the driver), take every band below a
    threshold wholesale as a scan-stage filter (no sort anywhere), and
    TakeOrdered only WITHIN the single boundary band (~|queue|/num_bands
    rows) to fill the batch exactly. Membership is a pure function of
    the url set — stable under repartitioning, task retries, and
    cluster size, so resume replays bit-identically.
    """
    from search_engine_spark.operators.hashing import h64

    banded = queued.select(
        "url", (h64(F.col("url"), "xxhash64") % num_bands).alias("band")
    )
    hist = {
        r["band"]: r["n"]
        for r in banded.groupBy("band")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    cum, boundary = 0, None
    for b in sorted(hist):
        if cum + hist[b] > batch_size:
            boundary = b
            break
        cum += hist[b]
    if boundary is None:
        return queued.select("url")  # the whole queue fits in one batch
    full = banded.filter(F.col("band") < boundary).select("url")
    edge = (
        banded.filter(F.col("band") == boundary)
        .orderBy("url")
        .limit(batch_size - cum)
        .select("url")
    )
    return full.unionByName(edge)


def crawl(
    spark: SparkSession,
    seeds: DataFrame,
    out_dir: str,
    max_rounds: int = 3,
    batch_size: int = 10_000,
    transport=None,
    min_interval_s: float = 0.0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Run (or resume) up to `max_rounds` BFS rounds from `seeds`;
    returns the accepted-pages table (url, title, html binary, round).
    `seeds` is only consulted when `out_dir` holds no round-0 queue —
    a resumed crawl continues from its ledgers."""
    queued_hist: list[DataFrame] = []
    r = 0
    while True:
        q = _try_read(spark, f"{out_dir}/queued/round={r}", QUEUED_SCHEMA)
        if q is None:
            break
        queued_hist.append(q)
        r += 1
    if not queued_hist:
        seeds.select("url").dropDuplicates(["url"]).write.mode("overwrite").parquet(
            f"{out_dir}/queued/round=0"
        )
        queued_hist = [spark.read.schema(QUEUED_SCHEMA).parquet(f"{out_dir}/queued/round=0")]

    for rnd in range(max_rounds):
        if rnd >= len(queued_hist):
            break  # queue ran dry in an earlier round ("All done!")
        queued = queued_hist[rnd]
        if queued.head(1) == []:
            break
        if _try_read(spark, f"{out_dir}/fetchlog/round={rnd}", FETCHLOG_SCHEMA) is not None:
            continue  # round committed by a previous run — resume past it

        frontier = _capped_frontier(queued, batch_size)
        remainder = queued.join(frontier, "url", "left_anti")
        gated = gate_pages(
            fetch_pages(
                frontier,
                transport=transport,
                min_interval_s=min_interval_s,
                num_partitions=num_partitions,
            )
        ).persist()
        accepted = gated.filter(F.col("reject").isNull())
        accepted.select("url", "title", "html").write.mode("overwrite").parquet(
            f"{out_dir}/pages/round={rnd}"
        )

        # The next-round queue is persisted UNCONDITIONALLY (even when
        # this invocation stops at max_rounds): it is crawl state, and a
        # later crawl() with a larger max_rounds resumes from it.
        # ever-queued = rounds 0..rnd ONLY: an interrupted run may have
        # left a stale round=rnd+1 queue, and including it in `visited`
        # would anti-join away the links this re-run is about to queue.
        # ONE partition-pruned scan of the queued ledger — not a
        # per-round union chain, whose plan depth grows with the round
        # number (at round 1000 a 1000-way union is a planner problem;
        # a `round <= rnd` filter over the partitioned dir is not).
        visited = (
            spark.read.schema(QUEUED_SCHEMA + ", round int")
            .parquet(f"{out_dir}/queued")
            .filter(F.col("round") <= rnd)
            .select("url")
        )
        nxt = (
            crawl_frontier(accepted.select("url", "html"), visited=visited)
            .unionByName(remainder)
            .dropDuplicates(["url"])
        )
        nxt.write.mode("overwrite").parquet(f"{out_dir}/queued/round={rnd + 1}")
        reread = spark.read.schema(QUEUED_SCHEMA).parquet(
            f"{out_dir}/queued/round={rnd + 1}"
        )
        if rnd + 1 < len(queued_hist):
            queued_hist[rnd + 1] = reread  # replace a stale queue
        else:
            queued_hist.append(reread)

        # commit marker LAST: presence of fetchlog/round=r ⇒ the round
        # (pages + next queue) is complete and will not be re-fetched
        gated.select("url", "status", "attempts", "reject").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/fetchlog/round={rnd}")
        gated.unpersist()

    pages = _try_read(spark, f"{out_dir}/pages", PAGES_SCHEMA + ", round int")
    if pages is None:  # max_rounds=0 or nothing fetched yet
        return spark.createDataFrame([], PAGES_SCHEMA + ", round int")
    return pages


def fetch_log(spark: SparkSession, out_dir: str) -> DataFrame:
    """The full attempt ledger across rounds (url, status, attempts,
    reject, round) — the observability twin of the reference's
    log::warn on failed crawls."""
    log = _try_read(spark, f"{out_dir}/fetchlog", FETCHLOG_SCHEMA + ", round int")
    if log is None:
        return spark.createDataFrame([], FETCHLOG_SCHEMA + ", round int")
    return log
