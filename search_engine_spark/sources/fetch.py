"""Crawl sources: seed scan + distributed HTTP fetch (SURVEY §2.1 S1/S2).

S1 — seed scan. The reference reads `sites.txt`, one URL per line
(services/crawler/src/main.rs:55-66). `read_seeds` is the same contract
as a DataFrame: `spark.read.text` → trim → drop blanks/comments →
normalize → dedup.

S2 — HTTP fetch. The reference fetches one page at a time with reqwest
(services/crawler/src/crawler.rs:150-224; client config crawler.rs:
263-271; UA services/crawler/src/lib.rs:9-14): a GET with a package
User-Agent, gzip accepted, 15 s timeout; 200 → decode (an EMPTY body is
an error, not a page); 429 → honor an integer Retry-After header
(missing or non-integer header gives up; > 60 s gives up), sleep, then
re-GET until 200 or the attempt cap; any other status gives up.
`fetch_pages` re-expresses that POLICY as a DataFrame operator —
semantics from the reference, execution Spark-shaped:

- **Politeness by partitioning.** URLs are repartitioned on their
  registrable domain, so one domain's URLs land in ONE task and are
  fetched sequentially with `min_interval_s` spacing; different domains
  fetch in parallel across however many executors exist. This replaces
  the reference's single-node FIFO queue (SURVEY W2) with a shape that
  holds at 1000 executors: no driver-side queue, no cross-task lock —
  the partitioner IS the politeness domain lock.
- **Transport is pluggable.** A transport is a picklable callable
  `url -> (status, retry_after_header | None, body bytes)`. The
  retry/backoff/empty-page POLICY (the part the reference tests) runs
  in the operator and is unit-tested against scripted transports;
  `DeterministicTransport` (default) synthesizes hash-derived pages so
  the full crawl loop runs — and is testable — in this no-network
  sandbox; `UrllibTransport` is the real client (UA, gzip, timeout)
  for deployments, import-gated and excluded from sandbox tests.

Output schema: (url, status, attempts, html binary, error) — error is
NULL exactly when the fetch yielded a usable page; the error strings
mirror the reference's error enum (EmptyPage / RequestTimeout /
InvalidRetryAfterHeader / MalformedHttpStatus).
"""

from __future__ import annotations

import hashlib
import re
import time
from collections.abc import Iterator
from urllib.parse import urlparse

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# client config re-expressed from crawler.rs:263-271 / lib.rs:9-14
USER_AGENT = "search-engine-spark/0.1 (library re-expression)"
TIMEOUT_S = 15.0
# 429 policy constants (crawler.rs:165-166)
MAX_ATTEMPTS = 10
MAX_RETRY_AFTER_S = 60

FETCH_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("attempts", IntegerType()),
        StructField("html", BinaryType()),
        StructField("error", StringType()),
    ]
)


def read_seeds(spark: SparkSession, path: str) -> DataFrame:
    """S1: one URL per line → normalized, deduped frontier. Blank lines
    and '#' comments are dropped (a superset of the reference's file,
    which contains neither)."""
    from search_engine_spark.functions.crawl import normalize_url_udf

    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("url"))
        .filter((F.length("url") > 0) & ~F.col("url").startswith("#"))
        .select(normalize_url_udf(F.col("url")).alias("url"))
        .dropDuplicates(["url"])
    )


def _fetch_one(url: str, transport, sleep) -> tuple:
    """One URL through the reference's extract_html_from_page policy
    (crawler.rs:150-224). Returns (url, status, attempts, html, error).

    Quirk-exact retry count: the reference initializes attempts=0 and
    loops `while attempts <= MAX_ATTEMPTS`, so a stubborn 429 is
    re-requested MAX_ATTEMPTS + 1 times after the Retry-After sleep —
    mirrored here (asserted in tests/test_fetch.py).

    A transport-level exception (DNS failure, connect timeout, TLS
    error — the reference's Error::Request arm) becomes an error ROW,
    never a task failure: one dead host among a billion urls must not
    kill a partition.
    """
    try:
        status, retry_after, body = transport(url)
    except Exception as exc:  # noqa: BLE001 — any transport failure is data
        return (url, None, 1, None, f"RequestError({type(exc).__name__})")
    attempts = 1
    if status == 429:
        if retry_after is None:
            # "just give up. it's not worth it." (crawler.rs:218-221)
            return (url, status, attempts, None, "InvalidRetryAfterHeader")
        # Rust u64::parse semantics (crawler.rs:173-186): optional '+',
        # digits only — negatives and padded strings are invalid headers.
        s = str(retry_after)
        if not re.fullmatch(r"\+?\d+", s):
            return (url, status, attempts, None, "InvalidRetryAfterHeader")
        delay = int(s)
        if delay > MAX_RETRY_AFTER_S:
            return (url, status, attempts, None, "RequestTimeout")
        sleep(delay)
        retries = 0
        while retries <= MAX_ATTEMPTS and status != 200:
            try:
                status, retry_after, body = transport(url)
            except Exception as exc:  # noqa: BLE001
                return (url, status, attempts, None, f"RequestError({type(exc).__name__})")
            attempts += 1
            retries += 1
        if status != 200:
            return (url, status, attempts, None, "RequestTimeout")
    elif status != 200:
        return (url, status, attempts, None, f"MalformedHttpStatus({status})")
    if not body:
        return (url, status, attempts, None, "EmptyPage")
    return (url, status, attempts, bytes(body), None)


def fetch_pages(
    frontier: DataFrame,
    transport=None,
    min_interval_s: float = 0.0,
    num_partitions: int | None = None,
    sleep=time.sleep,
) -> DataFrame:
    """S2: frontier(url, ...) → FETCH_SCHEMA rows, one per input url.

    Plan shape: one narrow projection, one repartition on the
    registrable domain (politeness: each domain is sequential within a
    single task, `min_interval_s` apart; distinct domains parallelize
    across the cluster), one mapInPandas pass that carries the
    per-domain last-fetch clock in task-local state. No shuffle after
    the fetch; downstream filters/extraction stay pipelined.
    """
    if transport is None:
        transport = DeterministicTransport()
    from search_engine_spark.functions.presentation import domain_udf

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_hit: dict[str, float] = {}
        for pdf in batches:
            rows = []
            for url in pdf["url"]:
                dom = urlparse(url).netloc
                if min_interval_s > 0:
                    wait = min_interval_s - (time.monotonic() - last_hit.get(dom, float("-inf")))
                    if wait > 0:
                        sleep(wait)
                rows.append(_fetch_one(url, transport, sleep))
                last_hit[dom] = time.monotonic()
            yield pd.DataFrame(
                rows, columns=["url", "status", "attempts", "html", "error"]
            )

    keyed = frontier.select("url", domain_udf(F.col("url")).alias("_dom"))
    parts = num_partitions or frontier.sparkSession.sparkContext.defaultParallelism
    return keyed.repartition(parts, "_dom").drop("_dom").mapInPandas(run, FETCH_SCHEMA)


class DeterministicTransport:
    """Hash-derived synthetic HTTP server: status and body are pure
    functions of the url, so any executor — and any test — sees the
    same web. Pages carry a title, vocab-bearing paragraphs, and
    `n_links` anchors into the same synthetic url space, so
    fetch → crawl_frontier → fetch iterates a real BFS.

    `rate_limit_every=k` makes every k-th url (by hash) answer 429 with
    `Retry-After: 0` once per attempt sequence — exercising the retry
    path without wall-clock sleeps. `error_every=k` makes a disjoint
    hash class answer 500. `nonenglish_every=k` makes a third class
    serve `lang="de"` pages (rejected by the crawl loop's is_english
    gate), and `adult_every=k` a fourth whose body contains a blocked
    term (rejected by the inappropriate gate).
    """

    def __init__(
        self,
        n_links: int = 3,
        rate_limit_every: int = 0,
        error_every: int = 0,
        nonenglish_every: int = 0,
        adult_every: int = 0,
    ):
        self.n_links = n_links
        self.rate_limit_every = rate_limit_every
        self.error_every = error_every
        self.nonenglish_every = nonenglish_every
        self.adult_every = adult_every
        self._pending_429: dict[str, bool] = {}

    def _h(self, url: str) -> int:
        return int(hashlib.md5(url.encode()).hexdigest()[:12], 16)

    def __call__(self, url: str):
        h = self._h(url)
        if self.error_every and h % self.error_every == 1:
            return 500, None, b""
        if self.rate_limit_every and h % self.rate_limit_every == 0:
            if not self._pending_429.get(url):
                self._pending_429[url] = True
                return 429, "0", b""
            self._pending_429[url] = False
        lang = "de" if self.nonenglish_every and h % self.nonenglish_every == 2 else "en-US"
        words = ["hippopotamus", "ladder", "pipe", "seagull", "elephant",
                 "castle", "meadow", "lantern", "orchard", "harbor"]
        body_words = " ".join(words[(h >> i) % len(words)] for i in range(0, 24, 3))
        if self.adult_every and h % self.adult_every == 3:
            body_words += " xvideos"
        links = "".join(
            f'<a href="https://site{(h + 7 * j) % 40}.example/page{(h + 13 * j) % 97}">l</a>'
            for j in range(self.n_links)
        )
        html = (
            f'<html lang="{lang}"><head><title>page {h % 997}</title></head>'
            f"<body><p>{body_words}</p>{links}</body></html>"
        )
        return 200, None, html.encode()


class ScriptedTransport:
    """Test transport: `script[url]` is a list of (status, retry_after,
    body) responses consumed in order; the last response repeats. A url
    is fetched entirely within one task, so per-url consumption order
    is deterministic under any partitioning."""

    def __init__(self, script: dict[str, list[tuple]]):
        self.script = {u: list(rs) for u, rs in script.items()}

    def __call__(self, url: str):
        rs = self.script[url]
        return rs.pop(0) if len(rs) > 1 else rs[0]


class UrllibTransport:  # pragma: no cover — no network in this sandbox
    """Real client re-expressing crawler.rs:263-271: package UA, gzip
    accepted, 15 s timeout. HTTP errors surface as their status so the
    operator's policy (not the transport) decides retry/give-up."""

    def __call__(self, url: str):
        import gzip
        import urllib.error
        import urllib.request

        req = urllib.request.Request(
            url,
            headers={"User-Agent": USER_AGENT, "Accept-Encoding": "gzip"},
        )
        try:
            with urllib.request.urlopen(req, timeout=TIMEOUT_S) as resp:
                body = resp.read()
                if resp.headers.get("Content-Encoding") == "gzip":
                    body = gzip.decompress(body)
                return resp.status, resp.headers.get("Retry-After"), body
        except urllib.error.HTTPError as e:
            return e.code, e.headers.get("Retry-After"), b""
